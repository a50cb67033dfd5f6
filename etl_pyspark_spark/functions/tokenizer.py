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
from etl_pyspark_spark.checkpoint import DISK_CKPT, FAMILY_CACHE

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
    pc = piece_counts(docs).persist(FAMILY_CACHE)
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


# ---------------------------------------------------------------------------
# BPE merge-rule learning (byte-pair encoding, Sennrich et al. 2016) —
# the iterative half of tokenizer training that the top-K piece
# vocabulary (above) approximates in one shot.
# ---------------------------------------------------------------------------


def _merge_fold(sym, left: str, right: str):
    """Apply ONE merge rule to a symbol array, left-to-right
    non-overlapping, entirely JVM-side: a fold (F.aggregate) whose
    accumulator replaces its last element with the merged token when
    (last, current) == (left, right). No Python per row."""
    merged = left + right
    return F.aggregate(
        sym,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_learn(docs: DataFrame, n_merges: int = 10, text_col: str = "text"):
    """Learn ``n_merges`` BPE merge rules from the corpus. Returns
    ``(rules, words)`` where rules is the driver-side list of
    ``(step, left, right, pair_count)`` (inherently tiny — the same
    bounded-artifact class as IVF centroids or the piece vocabulary)
    and words is the final symbolized word table (term, weight, sym).

    Deterministic: the argmax pair breaks ties by (count DESC, left
    ASC, right ASC); no RNG anywhere.

    Scale shape per iteration (the loop is driver-side, as for
    pagerank_int): adjacent-pair extraction is a JVM zip of the
    symbol array with its own tail (weights = word occurrence counts,
    so the pair table is over DISTINCT words — bounded by vocabulary,
    not corpus); counts collapse map-side; the argmax is a 1-row
    TakeOrdered collect; the merge application is a whole-stage
    codegen fold; localCheckpoint truncates the growing lineage."""
    from etl_pyspark_spark.functions import text as T

    words = (
        docs.select(F.explode(T.ws_tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("weight"))
        .select(
            "term",
            "weight",
            # split("abc", "(?!^)") yields a trailing "" in Spark —
            # drop empties so symbols == list(word) exactly
            F.filter(
                F.split(F.col("term"), "(?!^)"), lambda s: s != ""
            ).alias("sym"),
        )
        .localCheckpoint(storageLevel=DISK_CKPT)
    )
    rules = []
    for step in range(1, n_merges + 1):
        pairs = words.select(
            "weight",
            F.explode(
                F.zip_with(
                    F.slice(F.col("sym"), 1, F.size("sym") - 1),
                    F.slice(F.col("sym"), 2, F.size("sym") - 1),
                    lambda a, b: F.struct(
                        a.alias("left"), b.alias("right")
                    ),
                )
            ).alias("p"),
        ).select("weight", "p.left", "p.right")
        top = (
            pairs.groupBy("left", "right")
            .agg(F.sum("weight").alias("n"))
            .orderBy(
                F.col("n").desc(), F.col("left").asc(), F.col("right").asc()
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, n = top[0]["left"], top[0]["right"], int(top[0]["n"])
        rules.append((step, left, right, n))
        words = words.select(
            "term", "weight", _merge_fold(F.col("sym"), left, right).alias("sym")
        ).localCheckpoint(storageLevel=DISK_CKPT)
    return rules, words


def py_bpe_reference(word_counts: dict, n_merges: int = 10):
    """Pure-Python BPE twin of :func:`bpe_learn` for parity tests:
    identical counting, tie-break, and left-to-right merge walk."""
    words = {w: list(w) for w in word_counts}
    rules = []
    for step in range(1, n_merges + 1):
        counts: dict = {}
        for w, sym in words.items():
            wt = word_counts[w]
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + wt
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rules.append((step, left, right, n))
        merged = left + right
        for w, sym in words.items():
            out = []
            for s in sym:
                if out and out[-1] == left and s == right:
                    out[-1] = merged
                else:
                    out.append(s)
            words[w] = out
    return rules, words
