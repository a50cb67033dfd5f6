"""Query family: dedup_queries (mechanically split from registry.py — see core)."""

from __future__ import annotations

from etl_pyspark_spark.queries.core import (
    DataFrame,
    F,
    ORACLES,
    SparkSession,
    pround,
    query,
    read_table,
    sql_pround,
)

# ---------------------------------------------------------------------------
# LLM-pipeline: deduplication (exact; fuzzy variants in dedup/)
# ---------------------------------------------------------------------------


def _dedup_shared_build_oracle() -> str:
    from etl_pyspark_spark.dedup.components import sql_components_over_pairs
    from etl_pyspark_spark.dedup.minhash import (
        sql_minhash_pairs,
        sql_shingles_cte,
    )

    return (
        "WITH RECURSIVE "
        + sql_shingles_cte()
        + ", "
        + sql_minhash_pairs(final_name="pairs")
        + ", "
        + sql_components_over_pairs("pairs", final_name="comp")
        + """
    SELECT CAST((SELECT count(*) FROM hashed) AS BIGINT)
             AS n_shingle_hashes,
           CAST((SELECT count(DISTINCT doc_id) FROM hashed) AS BIGINT)
             AS n_docs_shingled,
           CAST((SELECT count(*) FROM pairs) AS BIGINT)
             AS n_verified_pairs,
           CAST((SELECT count(DISTINCT component_id) FROM comp) AS BIGINT)
             AS n_dup_clusters
    """
    )


@query("dedup_shared_build", oracle=_dedup_shared_build_oracle())
def q_dedup_shared_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the dedup family's shared intermediates (shingle
    hashes, per-doc hash sets, verified near-dup pairs, dup-cluster
    labels — dedup/shared.py) and return their summary counts.

    Registered AHEAD of the family so a sequential run (the driver's
    bench, or a production DAG) pays the derivation exactly once,
    visibly, HERE — and every downstream dedup query's number measures
    its own logic over the shared tables. This is the zorder_build /
    zorder_scan split applied to the dedup pipeline: at 100 TB these
    intermediates are checkpointed parquet between pipeline stages,
    and this entry is the stage that writes them. The summary counts
    are oracle-checked end-to-end (the DuckDB twin re-derives the
    whole chain, recursive-CTE components included), so the build is
    verified, not just timed."""
    from etl_pyspark_spark.dedup import shared

    sh = shared.shingle_hashes(spark, sf_dir)
    # the fused set stage (both orderings, r10 fold) is not an input
    # of the summary aggregates below, so force its cache here — the
    # whole point of this entry is that downstream family queries
    # measure their own logic, not stage derivation
    shared.doc_hash_sets_rarest(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    pairs = shared.verified_pairs(spark, sf_dir)
    comp = shared.dup_components(spark, sf_dir)
    a = sh.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingle_hashes"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs_shingled"),
    )
    b = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_verified_pairs")
    )
    c = comp.agg(
        F.countDistinct("component_id").cast("bigint").alias("n_dup_clusters")
    )
    return a.crossJoin(F.broadcast(b)).crossJoin(F.broadcast(c))


@query(
    "dedup_exact",
    oracle="""
    SELECT ('0x' || substr(md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')),
                           1, 15))::BIGINT AS fingerprint,
           min(doc_id) AS keep_doc_id,
           count(*) AS group_size
    FROM documents
    GROUP BY 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text fingerprint: one deterministic
    representative (min doc_id) per duplicate group. A hash group-by —
    the 100 TB shape (no sort, partial agg on the fingerprint)."""
    from etl_pyspark_spark.functions import text as T

    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(
            T.doc_fingerprint(F.col("text")).alias("fingerprint"), "doc_id"
        )
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


# ---------------------------------------------------------------------------
# LLM-pipeline: fuzzy deduplication (MinHash-LSH, exact n-gram Jaccard,
# SimHash). The full pipelines are deterministic md5 arithmetic, so the
# DuckDB oracles replay them bit-exactly (SQL generators in dedup/).
# ---------------------------------------------------------------------------


def _minhash_oracle() -> str:
    from etl_pyspark_spark.dedup.minhash import sql_minhash_pairs, sql_shingles_cte

    return f"WITH {sql_shingles_cte()}, {sql_minhash_pairs()}"


def _ngram_oracle() -> str:
    from etl_pyspark_spark.dedup.minhash import (
        sql_ngram_jaccard_pairs,
        sql_shingles_cte,
    )

    return f"WITH {sql_shingles_cte()}, {sql_ngram_jaccard_pairs()}"


@query("dedup_minhash_lsh", oracle=_minhash_oracle())
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (16 perms, 8 bands x 2 rows) with
    exact-Jaccard verification at threshold 0.5; candidate space is the
    LSH buckets, never the O(n^2) pair grid (dedup/minhash.py). The
    shingle/signature/pair stages are session-shared (dedup/shared.py)
    with components/canonical/ngram — each derived once, like
    checkpointed intermediate tables in a production dedup DAG."""
    from etl_pyspark_spark.dedup.shared import verified_pairs

    return verified_pairs(spark, sf_dir)


def _components_oracle() -> str:
    from etl_pyspark_spark.dedup.components import sql_components_over_pairs
    from etl_pyspark_spark.dedup.minhash import sql_minhash_pairs, sql_shingles_cte

    return (
        "WITH RECURSIVE "
        + sql_shingles_cte()
        + ", "
        + sql_minhash_pairs(final_name="pairs")
        + ", "
        + sql_components_over_pairs("pairs")
    )


@query("dedup_components", oracle=_components_oracle())
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster labeling: MinHash-LSH pairs -> connected
    components via distributed hash-min propagation (the keep-one-per-
    cluster step of corpus dedup); oracle replays it as a recursive
    CTE (dedup/components.py). Pairs and labels are session-shared
    stages (dedup/shared.py)."""
    from etl_pyspark_spark.dedup.shared import dup_components

    return dup_components(spark, sf_dir)


@query("dedup_ngram_jaccard", oracle=_ngram_oracle())
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard pairs >= 0.5 via the shingle inverted
    index (complete candidates: any positive-Jaccard pair shares a
    shingle). The exact-recall twin of dedup_minhash_lsh. Postings
    come from the session-shared hash-set stage (dedup/shared.py)."""
    from etl_pyspark_spark.dedup.ngram import ngram_jaccard_pairs
    from etl_pyspark_spark.dedup.shared import doc_hash_sets

    sh = doc_hash_sets(spark, sf_dir).select(
        "doc_id", F.explode("hs").alias("h60")
    )
    docs = read_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.5, sh=sh)


@query("dedup_ngram_prefix", oracle=_ngram_oracle())
def q_dedup_ngram_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered exact Jaccard (PPJoin-style): index only each
    doc's RAREST-FIRST prefix (ascending document frequency — the
    Bayardo WWW'07 order; lossless for any fixed order, so the oracle
    is shared with dedup_ngram_jaccard unchanged), add a length
    filter, verify candidates against full sets. Rarest-first keeps
    prefix postings short on low-diversity corpora, where the old
    hash order went quadratic (r8 native fixture: ~107x wall for 10x
    data)."""
    from etl_pyspark_spark.dedup.ngram import ngram_jaccard_pairs_prefix
    from etl_pyspark_spark.dedup.shared import (
        corpus_bytes_of,
        doc_hash_sets_rarest,
    )

    docs = read_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs_prefix(
        docs,
        threshold=0.5,
        sets=doc_hash_sets_rarest(spark, sf_dir),
        corpus_bytes=corpus_bytes_of(sf_dir),
    )


def _simhash_oracle() -> str:
    from etl_pyspark_spark.dedup.simhash import sql_simhash_cte

    return f"WITH {sql_simhash_cte()} SELECT doc_id, simhash FROM sig"


def _simhash_pairs_oracle() -> str:
    from etl_pyspark_spark.dedup.simhash import sql_simhash_cte, sql_simhash_pairs

    return f"WITH {sql_simhash_cte()} {sql_simhash_pairs()}"


@query("dedup_simhash", oracle=_simhash_oracle())
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprint per document (token-hash bit voting;
    dedup/simhash.py, session-shared stage)."""
    from etl_pyspark_spark.dedup.shared import simhash_sigs

    return simhash_sigs(spark, sf_dir)


@query("dedup_simhash_pairs", oracle=_simhash_pairs_oracle())
def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming distance <= 6, candidates from
    the 4-byte-band pigeonhole join (Manku et al., WWW'07); the
    fingerprint stage is session-shared with dedup_simhash."""
    from etl_pyspark_spark.dedup.shared import simhash_sigs
    from etl_pyspark_spark.dedup.simhash import simhash_pairs

    return simhash_pairs(simhash_sigs(spark, sf_dir))


# ---------------------------------------------------------------------------
# LLM-pipeline: similarity search over embeddings (similarity/)
# ---------------------------------------------------------------------------


def _sql_cos(a: str, b: str) -> str:
    from etl_pyspark_spark.similarity.cosine import sql_cosine

    return sql_pround(sql_cosine(a, b), 6)


@query(
    "embedding_norms",
    oracle=None,  # set below (needs similarity import)
)
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm + dimensionality per embedding — the sanity scan every
    vector pipeline starts with; dot/norm stay in whole-stage codegen."""
    from etl_pyspark_spark.similarity.cosine import as_double, l2_norm

    emb = read_table(spark, sf_dir, "embeddings")
    v = as_double(F.col("embedding"))
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        pround(l2_norm(v), 6).alias("l2_norm"),
    )


def _norms_oracle() -> str:
    from etl_pyspark_spark.similarity.cosine import sql_dot

    return f"""
    SELECT vec_id, label, len(embedding) AS dim,
           {sql_pround(f"sqrt({sql_dot('embedding', 'embedding')})", 6)} AS l2_norm
    FROM embeddings
    """


ORACLES["embedding_norms"] = _norms_oracle()


def _cosine_topk_oracle() -> str:
    cos = _sql_cos("q.embedding", "c.embedding")
    return f"""
    WITH sims AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {cos} AS cos_sim
      FROM (SELECT * FROM embeddings WHERE vec_id < 8) q
      JOIN embeddings c ON c.vec_id <> q.vec_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
      FROM sims)
    SELECT query_id, neighbor_id, cos_sim, rk FROM ranked WHERE rk <= 10
    """


@query("similarity_cosine_topk", oracle=_cosine_topk_oracle())
def q_similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-10 for 8 query vectors: broadcast
    nested-loop of the query set against the corpus scan (corpus never
    shuffles for the join), one window shuffle for the rank."""
    from etl_pyspark_spark.similarity.cosine import brute_force_topk

    emb = read_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, emb.where(F.col("vec_id") < 8), k=10)


def _assign_centroid_oracle() -> str:
    cos = _sql_cos("v.embedding", "c.embedding")
    return f"""
    WITH sims AS (
      SELECT v.vec_id, c.vec_id AS centroid_id, {cos} AS cos_sim
      FROM embeddings v
      JOIN (SELECT * FROM embeddings WHERE vec_id < 8) c ON true),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY cos_sim DESC, centroid_id ASC)
               AS rk
      FROM sims)
    SELECT vec_id, centroid_id, cos_sim FROM ranked WHERE rk = 1
    """


@query("embedding_assign_nearest_centroid", oracle=_assign_centroid_oracle())
def q_embedding_assign_nearest_centroid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic clustering assignment: every vector labeled with
    its nearest of 8 FIXED centroids (the first 8 vectors) by cosine —
    the assignment half of k-means, made oracle-checkable by pinning
    the centroids instead of fitting them (the fitted variant is
    similarity_ivf_topk's quantizer, recall-tested). Plan (r12): the
    8-row centroid set is inlined as a literal array and the argmax is
    a per-row array_max — ZERO exchanges and no 8x row expansion,
    where the old crossJoin + row_number window shuffled and sorted
    8n rows (similarity/semantic.assign_nearest_centroid; same
    tie/NULL semantics, gated to the window shape past 1024
    centroids)."""
    from etl_pyspark_spark.similarity.semantic import (
        assign_nearest_centroid,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    return assign_nearest_centroid(emb, emb.where(F.col("vec_id") < 8))


def _ann_pairs_oracle(threshold: float) -> str:
    from etl_pyspark_spark.similarity.lsh import sql_banded_cte

    cos = _sql_cos("a.embedding", "b.embedding")
    return f"""
    WITH banded AS ({sql_banded_cte('embeddings', 'vec_id', 'embedding')}),
    cand AS (SELECT DISTINCT l.vid AS id_a, r.vid AS id_b
             FROM banded l JOIN banded r
               ON l.band = r.band AND l.bucket = r.bucket
             WHERE l.vid < r.vid)
    SELECT c.id_a, c.id_b, {cos} AS cos_sim
    FROM cand c
    JOIN embeddings a ON a.vec_id = c.id_a
    JOIN embeddings b ON b.vec_id = c.id_b
    WHERE {cos} >= {threshold}
    """


@query("similarity_ann_lsh", oracle=_ann_pairs_oracle(0.2))
def q_similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate all-pairs similarity: random-hyperplane LSH buckets
    (2 bands, deterministic planes) generate candidates; exact
    cosine >= 0.2 verifies (threshold calibrated to the near-random
    fixture embeddings; a production near-dup run would use ~0.9).
    Pairs are computed per bucket group by one numpy triangle GEMM
    (applyInPandas) — vectors shuffle at most once per band and the
    candidate pair list is never materialized. The scale path — no
    cross join anywhere. Per-band bit width grows with corpus size
    (similarity/lsh.planes_per_band_for) to hold expected bucket size
    ~constant: the r11 adjudication of this query's 100x tail found
    the historical FIXED 4 bits made per-bucket GEMM work quadratic
    in n (2.5e9 pair evals, ~360 s warm at 200k); at every fixture
    <= 65k vectors the adaptive width IS the historical 2x4-bit
    scheme, which keeps the baked SQL oracle bit-exact."""
    from etl_pyspark_spark.similarity.lsh import bucket_cosine_pairs

    emb = read_table(spark, sf_dir, "embeddings")
    return bucket_cosine_pairs(emb, threshold=0.2)


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_sql_cos('a.embedding', 'b.embedding')} AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_sql_cos('a.embedding', 'b.embedding')} >= 0.4
    """,
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact: all (a < b) pairs
    with cosine >= 0.4 (fixture-calibrated; production semantic dedup
    uses ~0.9+). Computed with the block-partitioned BLAS algorithm
    (similarity/blockpairs.py) — exact O(n^2) coverage without a
    cross join, ~100x faster than per-pair expression eval; the LSH
    path (similarity_ann_lsh) is the approximate alternative and this
    exact twin measures its recall."""
    from etl_pyspark_spark.similarity.blockpairs import block_cosine_pairs

    emb = read_table(spark, sf_dir, "embeddings")
    return block_cosine_pairs(emb, threshold=0.4)


