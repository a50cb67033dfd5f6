"""Invariants for the corpus-derived tokenizer (greedy segmentation
has no SQL twin — the vocab build does and is oracle-checked in the
registry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pyspark_spark.functions.tokenizer import (
    collect_vocab,
    greedy_segment,
    top_pieces,
)
from etl_pyspark_spark.registry import QUERIES
from etl_pyspark_spark.sources.io import read_table


def _corpus_words(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return [
        r["w"]
        for r in docs.select(
            F.explode(F.split("text", " ")).alias("w")
        )
        .where(F.col("w") != "")
        .distinct()
        .collect()
    ]


def test_segmentation_round_trips_and_covers(spark, oracle_sf_dir):
    docs = read_table(spark, oracle_sf_dir, "documents")
    vocab = collect_vocab(docs, 64)
    words = _corpus_words(spark, oracle_sf_dir)
    assert words
    for w in words:
        segs = greedy_segment(w, vocab)
        # round-trip: pieces rejoin to the word, in order
        assert "".join(segs) == w
        # total coverage: every piece is in the vocabulary (the
        # single-char fallback set is part of collect_vocab)
        assert all(p in vocab for p in segs), (w, segs)


def test_segmentation_is_greedy_longest_match(spark, oracle_sf_dir):
    docs = read_table(spark, oracle_sf_dir, "documents")
    vocab = collect_vocab(docs, 64)
    for w in _corpus_words(spark, oracle_sf_dir):
        i = 0
        for p in greedy_segment(w, vocab):
            # no longer vocab piece exists at this position
            for ln in range(len(w) - i, len(p), -1):
                if ln <= 8:
                    assert w[i : i + ln] not in vocab, (w, i, p)
            i += len(p)


def test_segment_query_matches_driver_recomputation(spark, oracle_sf_dir):
    out = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in QUERIES["tokenizer_segment"](
            spark, oracle_sf_dir
        ).collect()
    }
    docs = read_table(spark, oracle_sf_dir, "documents")
    vocab = collect_vocab(docs, 64)
    sample = docs.select("doc_id", "text").limit(50).collect()
    for r in sample:
        words = [w for w in (r["text"] or "").split(" ") if w]
        pieces = sum(len(greedy_segment(w, vocab)) for w in words)
        assert out[r["doc_id"]] == (len(words), pieces)
    # the fixture vocabulary is calibrated so segmentation COMPOSES:
    # strictly more pieces than words overall
    total_w = sum(v[0] for v in out.values())
    total_p = sum(v[1] for v in out.values())
    assert total_p > total_w


def test_vocab_is_deterministic_total_order(spark, oracle_sf_dir):
    docs = read_table(spark, oracle_sf_dir, "documents")
    a = [tuple(r) for r in top_pieces(docs, 64).collect()]
    b = [tuple(r) for r in top_pieces(docs, 64).collect()]
    assert a == b
    counts = [c for _, c in a]
    assert counts == sorted(counts, reverse=True)


def test_bpe_learn_matches_python_reference(spark, oracle_sf_dir):
    """The distributed BPE learner must match a pure-Python BPE run
    exactly: the 10 learned rules (with counts and tie-breaks) AND
    every word's final symbolization — this is the rows-only entry's
    de-facto oracle."""
    from etl_pyspark_spark.functions.tokenizer import (
        bpe_learn,
        py_bpe_reference,
    )

    docs = read_table(spark, oracle_sf_dir, "documents")
    rules, words = bpe_learn(docs, n_merges=10)
    assert len(rules) == 10
    wc = {
        r["term"]: r["weight"]
        for r in words.select("term", "weight").collect()
    }
    py_rules, py_words = py_bpe_reference(wc, 10)
    assert rules == py_rules
    got = {r["term"]: list(r["sym"]) for r in words.collect()}
    assert got == py_words
    # merges actually compose (multi-char tokens appear)
    assert any(len(left) > 1 or len(right) > 1 for _, left, right, _ in rules)
