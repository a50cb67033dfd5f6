"""Corpus-derived subword tokenizer: deterministic piece vocabulary +
greedy longest-match segmentation.

Real training pipelines tokenize with a LEARNED subword vocabulary;
the engine's packing/OOV/vocab queries previously stopped at
whitespace words. This module closes the gap engine-natively while
staying deterministic (no RNG, no EM): the vocabulary is the top-K
most frequent substrings (length ≤ 8) of the corpus's whitespace
words — the unigram-LM initialization step of SentencePiece, which is
itself a plain corpus statistic — and segmentation is classic
WordPiece greedy longest-match with a guaranteed single-character
fallback (every character observed in the corpus is in the vocab, so
coverage is total and the loop always advances).

Scale shape: piece counting is substring-explode → one hash-shuffled
partial-agg count → top-K via TakeOrderedAndProject (never a global
sort); the vocabulary is a BOUNDED driver collect (K + |alphabet|
strings — same class as the IVF training sample) broadcast to
executors; segmentation crosses into Python exactly once through an
Arrow-batched ``mapInPandas`` whose per-row work is O(word_len ·
max_piece_len) dict probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: vocabulary size (top-K pieces) and the longest piece considered.
VOCAB_K = 512
MAX_PIECE_LEN = 8


def word_occurrences(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per whitespace-word OCCURRENCE (column ``term``)."""
    from etl_pyspark_spark.functions import text as T

    return docs.select(
        F.explode(T.ws_tokens(F.col(text_col))).alias("term")
    )


def piece_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(piece, n_occ): every substring of length 1..MAX_PIECE_LEN of
    every word occurrence, counted. The double explode amplifies rows
    ~O(len·MAX_PIECE_LEN) per word BEFORE the exchange, but the
    partial (map-side) aggregation collapses them to distinct pieces
    per task, so the shuffle carries piece counts, not occurrences."""
    occ = word_occurrences(docs, text_col)
    s = occ.select(
        "term",
        F.explode(F.sequence(F.lit(1), F.length("term"))).alias("s"),
    )
    sl = s.select(
        "term",
        "s",
        F.explode(
            F.sequence(
                F.lit(1),
                F.least(
                    F.lit(MAX_PIECE_LEN),
                    F.length("term") - F.col("s") + 1,
                ),
            )
        ).alias("l"),
    )
    piece = F.col("term").substr(F.col("s"), F.col("l"))
    return (
        sl.select(piece.alias("piece"))
        .groupBy("piece")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )


def top_pieces(docs: DataFrame, k: int = VOCAB_K) -> DataFrame:
    """Top-k pieces by (count DESC, piece ASC) — a deterministic total
    order, planned as TakeOrderedAndProject."""
    return (
        piece_counts(docs)
        .orderBy(F.col("n_occ").desc(), F.col("piece").asc())
        .limit(k)
    )


def collect_vocab(docs: DataFrame, k: int = VOCAB_K) -> frozenset:
    """Driver-side vocabulary: top-k pieces ∪ every single character
    (total coverage — segmentation can always fall back to one char).
    Bounded collect: k + |alphabet| short strings. The substring
    aggregation is materialized once (persist) and probed by both
    branches — without it the double-explode count runs twice."""
    pc = piece_counts(docs).persist()
    try:
        pieces = {
            r["piece"]
            for r in pc.orderBy(
                F.col("n_occ").desc(), F.col("piece").asc()
            )
            .limit(k)
            .collect()
        }
        chars = {
            r["piece"]
            for r in pc.where(F.length("piece") == 1)
            .select("piece")
            .collect()
        }
    finally:
        pc.unpersist()
    return frozenset(pieces | chars)


def greedy_segment(word: str, vocab, max_len: int = MAX_PIECE_LEN):
    """WordPiece greedy longest-match. Single-char fallback keeps the
    loop advancing even for pieces outside the vocab (an unseen char
    segment becomes itself — flagged by callers as OOV if needed)."""
    out, i, n = [], 0, len(word)
    while i < n:
        piece = word[i]  # fallback: one char, always advances
        for ln in range(min(max_len, n - i), 1, -1):
            cand = word[i : i + ln]
            if cand in vocab:
                piece = cand
                break
        out.append(piece)
        i += len(piece)
    return out


def segment_documents(
    docs: DataFrame,
    vocab: frozenset,
    text_col: str = "text",
    max_len: int = MAX_PIECE_LEN,
) -> DataFrame:
    """Per-document segmentation stats via Arrow ``mapInPandas``:
    (doc_id, n_words, n_pieces). The vocab ships once per executor via
    a Spark broadcast; per-batch work is pure dict probing."""
    sc = docs.sparkSession.sparkContext
    bc = sc.broadcast(vocab)

    def seg(batches):
        import pandas as pd

        v = bc.value
        for pdf in batches:
            n_words, n_pieces = [], []
            for text in pdf["text"]:
                words = [w for w in (text or "").split(" ") if w]
                total = 0
                for w in words:
                    total += len(greedy_segment(w, v, max_len))
                n_words.append(len(words))
                n_pieces.append(total)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": n_words,
                    "n_pieces": n_pieces,
                }
            )

    return docs.select("doc_id", F.col(text_col).alias("text")).mapInPandas(
        seg, schema="doc_id bigint, n_words bigint, n_pieces bigint"
    )
