"""Exact n-gram Jaccard similarity via a shingle inverted index.

Companion to MinHash (dedup/minhash.py): same word-3-gram shingles,
but candidates come from an *inverted index* self-join (any pair with
Jaccard > 0 shares >= 1 shingle, so the candidate set is complete and
the result is exact, unlike LSH). The join shuffles (shingle ->
doc list) postings; at 100 TB the standard refinements are a
document-frequency cap on ultra-common shingles and prefix filtering
(Chaudhuri et al., ICDE'06) — both drop only candidates that cannot
reach the threshold. Kept un-capped here because the driver fixtures
are synthetic-vocabulary text with no stop-shingle skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from etl_pyspark_spark.checkpoint import scoped_family_persist

from etl_pyspark_spark.dedup.minhash import hashed_shingles
from etl_pyspark_spark.functions.compat import pround


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    sh: DataFrame | None = None,
) -> DataFrame:
    """All (id_a < id_b, jaccard) pairs with exact shingle-set Jaccard
    >= threshold.

    Joins on the 60-bit shingle *hash* (int64), not the string — a
    ~10x cheaper shuffle key — and caches the hashed postings, which
    are read three times (sizes + both join sides). ``sh`` accepts a
    precomputed DISTINCT (id, h60) posting table (dedup/shared.py)."""
    if sh is None:
        sh = (
            hashed_shingles(df, text_col, id_col, n)
            .dropDuplicates([id_col, "h60"])
            .transform(scoped_family_persist)
        )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "h60")
    b = sh.select(F.col(id_col).alias("id_b"), "h60")
    inter = (
        a.join(b, "h60")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .where(jac >= threshold)
        .select(
            F.col("id_a").alias("doc_id_a"),
            F.col("id_b").alias("doc_id_b"),
            pround(jac, 6).alias("jaccard"),
        )
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    sets: DataFrame | None = None,
    corpus_bytes: int | None = None,
) -> DataFrame:
    """Same exact result as :func:`ngram_jaccard_pairs`, via **prefix
    filtering** (Chaudhuri et al. ICDE'06 / PPJoin): with tokens in a
    fixed global order, any pair with Jaccard >= t must share a token
    among each side's first ``|d| - ceil(t*|d|) + 1`` tokens — so only
    that prefix is indexed. At t=0.5 the postings halve and the
    candidate self-join shrinks ~4x; a length filter
    (t*|a| <= |b| <= |a|/t) prunes further. Both filters are lossless
    for ANY fixed global order, so verification against the full
    shingle sets returns exactly the inverted-index answer (shared
    oracle).

    Global order = ascending (document frequency, h60) — RAREST
    FIRST (Bayardo et al. WWW'07's canonical order). Hash order (the
    pre-r9 choice) is one aggregation cheaper but puts ultra-common
    shingles in prefixes, and on low-diversity corpora (code, logs,
    boilerplate web — or the 30-word native fixture, where it
    measured ~107x wall for 10x data) prefix postings then grow
    linearly and candidates quadratically. Rarest-first keeps prefix
    postings short precisely because a prefix shingle is, by
    construction, one few other docs carry. The df aggregation +
    h60-keyed join are linear in postings (dedup/shared.py
    ``doc_hash_sets_rarest`` memoizes them per session).

    Physical shape: each doc's shingle-hash set is collected ONCE into
    a df-ordered array (one groupBy); the prefix is then just the
    first ``|d| - ceil(t*|d|) + 1`` elements (``slice`` — no window,
    no re-join), and candidate verification intersects the two bundled
    arrays JVM-side (``array_intersect``, order-insensitive). Verify
    cost is O(candidates x doc size) with no exploded shuffle — an
    earlier version that re-joined the posting table per candidate was
    4x slower than the plain inverted index at sf0.1.

    Prefix length and length filter use INTEGER arithmetic on the
    threshold as a fraction p/q (``ceil(t*n) = floor((p*n + q-1)/q)``):
    a float ``ceil(0.7*n)`` can round past the true ceiling and
    silently shorten a prefix — which would drop pairs, not just
    prune less.
    """
    from fractions import Fraction

    fr = Fraction(threshold).limit_denominator(10**6)
    p, q = fr.numerator, fr.denominator

    if sets is not None:
        # precomputed (id, hs, n_sh) stage from dedup/shared.py —
        # hs must already be in a fixed global order (rarest-first
        # from doc_hash_sets_rarest is the intended feed)
        docs = sets
    else:
        posts = (
            hashed_shingles(df, text_col, id_col, n)
            .dropDuplicates([id_col, "h60"])
        )
        df_tbl = posts.groupBy("h60").agg(F.count(F.lit(1)).alias("df"))
        docs = (
            posts.join(df_tbl, "h60")
            .groupBy(id_col)
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("df", "h60"))),
                    lambda s: s["h60"],
                ).alias("hs")
            )
            .withColumn("n_sh", F.size("hs"))
            .transform(scoped_family_persist)
        )
    # ceil(t*n) = floor((p*n + q - 1) / q), exact in int64
    ceil_tn = F.floor((F.lit(p) * F.col("n_sh") + F.lit(q - 1)) / F.lit(q))
    plen = F.col("n_sh") - ceil_tn + 1
    prefix = docs.select(
        F.col(id_col),
        F.explode(F.slice(F.col("hs"), F.lit(1), plen)).alias("h60"),
        "n_sh",
    )
    a = prefix.select(
        F.col(id_col).alias("id_a"), "h60", F.col("n_sh").alias("n_a")
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"), "h60", F.col("n_sh").alias("n_b")
    )
    cand = (
        a.join(b, "h60")
        .where(
            (F.col("id_a") < F.col("id_b"))
            # length filter: t*|a| <= |b| and t*|b| <= |a|, in exact
            # integer form p*|a| <= q*|b|
            & (F.lit(p) * F.col("n_a") <= F.lit(q) * F.col("n_b"))
            & (F.lit(p) * F.col("n_b") <= F.lit(q) * F.col("n_a"))
        )
        .select("id_a", "id_b", "n_a", "n_b")
        .distinct()
    )
    # verify via lookups of the set dictionary: while the corpus is
    # small the dictionary rides a BROADCAST hint, so candidates (the
    # big side on low-diversity corpora) stream through both joins and
    # the intersect in one stage with no shuffle; dict_hint GATES the
    # hint on the measured corpus size (8 GB broadcast limit / driver
    # memory), falling back to a shuffled hash join on the sets table
    # above the cap — same asymptotics, only the transport changes
    from etl_pyspark_spark.dedup.shared import _scan_size_bytes, dict_hint

    if corpus_bytes is None and sets is None:
        # standalone path: df is (close to) a raw scan, whose Catalyst
        # size estimate equals file bytes — a reliable measurement
        corpus_bytes = _scan_size_bytes(df)
    inter = (
        cand.join(
            dict_hint(
                docs.select(
                    F.col(id_col).alias("id_a"), F.col("hs").alias("hs_a")
                ),
                corpus_bytes,
            ),
            "id_a",
        )
        .join(
            dict_hint(
                docs.select(
                    F.col(id_col).alias("id_b"), F.col("hs").alias("hs_b")
                ),
                corpus_bytes,
            ),
            "id_b",
        )
        .withColumn(
            "n_inter", F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b")))
        )
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return inter.where(jac >= threshold).select(
        F.col("id_a").alias("doc_id_a"),
        F.col("id_b").alias("doc_id_b"),
        pround(jac, 6).alias("jaccard"),
    )
