"""Query family: round-11 extensions.

Closes the round-10 verdict's one ``weak`` cell and keeps widening
the LLM-data-pipeline surface (the reference — a linear taxi ETL,
nyc_taxi_etl.py:50-103 — has none of these surfaces; SURVEY.md §2.9
growth plan):

- **scale-safe hard-negative mining** (``mining_hardest_negative_ann``)
  — the exact miner (similarity/mining.py) is block-partitioned BLAS
  with fused argmax: memory-bounded and shuffle-linear, but n^2
  compute (630.8 s at 200k vectors; hours past 2M). This twin
  generates candidates through the IVF coarse quantizer with the
  same-label mask applied INSIDE the per-cell GEMM, so compute is
  linear in (n x probed fraction) — the declared 100 TB path, with
  the exact op kept as its recall-reference twin (the mutual-kNN
  playbook from round 10, one operator later).
- **graph modularity** (``graph_modularity``) — Newman modularity of
  an attribute partition (part brand) over the shared co-purchase
  graph: the one-number answer to "is this clustering real?" that
  gates every community-detection output before it ships.
- **cosine silhouette** (``embedding_silhouette``) — per-label mean
  silhouette against exact integer-sum label centroids: the
  clustering-quality diagnostic next to label_centroid_separation
  (separation measures centroids; silhouette measures every point's
  fit), O(n x labels), never O(n^2).
- **split covariate balance** (``split_covariate_balance``) — the
  standardized-mean-difference audit of the deterministic 95/5
  train/test split: per feature, does held-out data look like
  training data? (|SMD| > 0.1 is the classic imbalance flag.)
"""

from __future__ import annotations

from etl_pyspark_spark.functions.compat import pround, sql_pround
from etl_pyspark_spark.queries.core import (
    DataFrame,
    F,
    SparkSession,
    query,
    read_table,
)


@query("mining_hardest_negative_ann")  # no oracle: the k-means
# quantizer is estimator-specific; tests/test_round11.py pins exact
# equality with mining_hardest_negative at all-cells-probed fixture
# scale and recall >= 0.9 on the 20k-vector native fixture
def q_mining_hardest_negative_ann(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Approximate hardest-negative per anchor — the scale twin of
    ``mining_hardest_negative`` (r10 verdict #1): for every vector,
    the highest-cosine DIFFERENT-label vector among IVF-probed
    candidates, house tiebreak (cos DESC, id ASC).

    Physical shape at 100 TB: the corpus shuffles ONCE on cell id,
    anchors probe nprobe cells, per-cell GEMMs mask same-label
    columns and emit per-anchor top-k in-task (the post-GEMM shuffle
    is O(n*k), never O(n * cell width)); symmetric candidate
    generation rescues pairs one direction's probes missed. No
    driver collect, no corpus cap — the quantizer trains on a
    bounded hash-top-k sample (similarity/ivf.py)."""
    from etl_pyspark_spark.similarity.mining import hard_negative_mine_ann

    emb = read_table(spark, sf_dir, "embeddings")
    out = hard_negative_mine_ann(emb)
    return out.select(
        "vec_id",
        "label",
        "hard_neg_id",
        pround(F.col("cos_sim"), 6).alias("cos_sim"),
    )


# --- modularity of the brand partition over the co-purchase graph -------


def _modularity_oracle() -> str:
    from etl_pyspark_spark.queries._shared import _copurchase_edges_sql

    # q_contrib written with multiplications only (no pow/libm): all
    # inputs are exact integers, the double expression sequences
    # identically on both engines, pround(6) absorbs nothing but the
    # display cut
    return f"""
    WITH {_copurchase_edges_sql()},
    eb AS (SELECT e0.u, e0.v, pa.p_brand AS ba, pb.p_brand AS bb
           FROM e0
           JOIN part pa ON pa.p_partkey = e0.u
           JOIN part pb ON pb.p_partkey = e0.v),
    m AS (SELECT count(*) AS m FROM e0),
    ends AS (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0),
    deg AS (SELECT node, count(*) AS d FROM ends GROUP BY node),
    bdeg AS (SELECT p.p_brand AS brand,
                    count(*) AS n_nodes,
                    sum(d) AS degree_sum
             FROM deg JOIN part p ON p.p_partkey = deg.node GROUP BY 1),
    intra AS (SELECT ba AS brand, count(*) AS intra_edges
              FROM eb WHERE ba = bb GROUP BY 1)
    SELECT b.brand,
           CAST(b.n_nodes AS BIGINT) AS n_nodes,
           CAST(COALESCE(i.intra_edges, 0) AS BIGINT) AS intra_edges,
           CAST(b.degree_sum AS BIGINT) AS degree_sum,
           {sql_pround(
               "CAST(COALESCE(i.intra_edges, 0) AS DOUBLE)"
               " / CAST(m.m AS DOUBLE)"
               " - (CAST(b.degree_sum AS DOUBLE)"
               "    / (2.0 * CAST(m.m AS DOUBLE)))"
               " * (CAST(b.degree_sum AS DOUBLE)"
               "    / (2.0 * CAST(m.m AS DOUBLE)))",
               6,
           )} AS q_contrib
    FROM bdeg b LEFT JOIN intra i ON i.brand = b.brand, m
    """


@query("graph_modularity", oracle=_modularity_oracle())
def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the part-brand partition over the shared
    co-purchase graph, reported per community: Q = sum_c [e_c/m -
    (d_c/2m)^2] (Newman & Girvan 2004) — the standard one-number gate
    on any community structure (attribute partitions, label
    propagation, dedup clusters) before it drives downstream
    sampling. Each row is one brand's contribution; their sum is Q
    (~0 here: brands are assigned independently of co-purchase, the
    null case the measure is calibrated against).

    Scale shape: reuses the memoized checkpointed co-purchase edge
    list (queries/_shared: basket-capped self-join, built once per
    session for the whole graph family), one edge->brand broadcast-dim
    join, two map-side-combinable aggregations (per-node degree,
    per-brand rollup), a 1-row m broadcast. Everything after the
    edge build is bounded by |brands|. Exactness: every input to
    q_contrib is an exact integer count; the double expression is
    multiplication-only (no pow/libm) and sequences identically on
    both engines."""
    from etl_pyspark_spark.queries._shared import _copurchase_edges

    edges = _copurchase_edges(spark, sf_dir)
    part = read_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"), F.col("p_brand").alias("brand")
    )
    eb = (
        edges.join(
            F.broadcast(part.select(F.col("pk").alias("u"), F.col("brand").alias("ba"))),
            "u",
        )
        .join(
            F.broadcast(part.select(F.col("pk").alias("v"), F.col("brand").alias("bb"))),
            "v",
        )
    )
    m = edges.agg(F.count(F.lit(1)).alias("m"))
    ends = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    deg = ends.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    bdeg = (
        deg.join(F.broadcast(part.select(F.col("pk").alias("node"), "brand")), "node")
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("d").cast("bigint").alias("degree_sum"),
        )
    )
    intra = (
        eb.where(F.col("ba") == F.col("bb"))
        .groupBy(F.col("ba").alias("brand"))
        .agg(F.count(F.lit(1)).alias("intra_edges"))
    )
    md = F.col("m").cast("double")
    ratio = F.col("degree_sum").cast("double") / (F.lit(2.0) * md)
    return (
        bdeg.join(intra, "brand", "left")
        .withColumn("intra_edges", F.coalesce("intra_edges", F.lit(0)))
        .crossJoin(F.broadcast(m))
        .select(
            "brand",
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.col("intra_edges").cast("bigint").alias("intra_edges"),
            "degree_sum",
            pround(
                F.col("intra_edges").cast("double") / md - ratio * ratio, 6
            ).alias("q_contrib"),
        )
    )


# --- cosine silhouette against exact integer-sum label centroids --------


def _silhouette_oracle() -> str:
    from etl_pyspark_spark.queries.round6_extensions import (
        _label_centroid_sql,
    )
    from etl_pyspark_spark.similarity.cosine import sql_cosine

    cos = sql_pround(sql_cosine("e.embedding", "c.cv"), 6)
    s = (
        "CASE WHEN greatest(1.0 - cos_own, 1.0 - cos_other) > 0 THEN "
        + sql_pround(
            "(cos_own - cos_other)"
            " / greatest(1.0 - cos_own, 1.0 - cos_other)",
            6,
        )
        + " WHEN cos_own IS NOT NULL AND cos_other IS NOT NULL"
        " THEN 0.0 END"
    )
    return f"""
    WITH {_label_centroid_sql()},
    sc AS (SELECT e.vec_id, e.label, c.label AS clabel, {cos} AS cos
           FROM embeddings e CROSS JOIN cent c),
    g AS (SELECT vec_id, label,
                 max(CASE WHEN clabel = label THEN cos END) AS cos_own,
                 max(CASE WHEN clabel <> label THEN cos END) AS cos_other
          FROM sc GROUP BY 1, 2),
    sil AS (SELECT label, {s} AS s FROM g)
    SELECT label,
           CAST(count(s) AS BIGINT) AS n_vectors,
           {sql_pround(
               "CAST(sum(CAST(s AS DECIMAL(18,6))) AS DOUBLE)"
               " / count(s)",
               6,
           )} AS mean_silhouette
    FROM sil GROUP BY label
    """


@query("embedding_silhouette", oracle=_silhouette_oracle())
def q_embedding_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean COSINE silhouette against label centroids:
    a(i) = cosine distance to the own-label centroid, b(i) = distance
    to the nearest other centroid, s(i) = (b - a)/max(a, b) — the
    centroid form (Rousseeuw 1987's medoid variant) that costs
    O(n x labels) instead of the textbook O(n^2) pairwise form.
    Positive mean = labels cohere in embedding space; ~0 = entangled
    (this fixture's case — embeddings are label-independent noise);
    negative = systematically mislabeled. Complements
    label_centroid_separation (centroid-vs-centroid only) with a
    point-level fit measure.

    Scale shape: centroids are exact integer-sum vectors (quantized
    BEFORE summing, order-insensitive — label_centroid_separation's
    technique), |labels| rows broadcast; ONE corpus scan computes all
    n x k cosines (index-ordered fold, bit-identical cross-engine);
    the rest is |labels|-bounded. Exactness: s folds pround(6)
    cosines through pround(6), the mean folds DECIMAL(18,6) — no
    order-dependent double sum anywhere."""
    from etl_pyspark_spark.similarity.cosine import as_double, cosine

    emb = read_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "x")
    ).select(
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.floor(F.col("x") * F.lit(1e3) + F.lit(0.5))
        .cast("bigint")
        .alias("q"),
    )
    cent = (
        exploded.groupBy("label", "pos")
        .agg(F.sum("q").cast("bigint").alias("s"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))),
                lambda e: e["s"].cast("double"),
            ).alias("cv")
        )
        .select(F.col("label").alias("clabel"), "cv")
    )
    sc = (
        emb.select(
            "vec_id", "label", as_double(F.col("embedding")).alias("v")
        )
        .crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "label",
            "clabel",
            pround(cosine(F.col("v"), F.col("cv")), 6).alias("cos"),
        )
    )
    g = sc.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("clabel") == F.col("label"), F.col("cos"))).alias(
            "cos_own"
        ),
        F.max(F.when(F.col("clabel") != F.col("label"), F.col("cos"))).alias(
            "cos_other"
        ),
    )
    denom = F.greatest(F.lit(1.0) - F.col("cos_own"), F.lit(1.0) - F.col("cos_other"))
    s = F.when(
        denom > 0,
        pround((F.col("cos_own") - F.col("cos_other")) / denom, 6),
    ).when(
        F.col("cos_own").isNotNull() & F.col("cos_other").isNotNull(),
        F.lit(0.0),
    )
    return (
        g.select("label", s.alias("s"))
        .groupBy("label")
        .agg(
            F.count("s").cast("bigint").alias("n_vectors"),
            pround(
                F.sum(F.col("s").cast("decimal(18,6)")).cast("double")
                / F.count("s"),
                6,
            ).alias("mean_silhouette"),
        )
    )


# --- covariate balance of the deterministic train/test split ------------

# documents-table features whose sums are exact integers in any order:
# character length, whitespace-token count, digit count
_BAL_FEATS = [
    ("char_len", "length(text)"),
    ("n_tokens", "len(list_filter(string_split(text, ' '), t -> t <> ''))"),
    ("n_digits", "length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))"),
]


def _balance_oracle() -> str:
    sides = []
    for fname, fsql in _BAL_FEATS:
        smd_num = "(CAST(st AS DOUBLE) / nt - CAST(se AS DOUBLE) / ne)"
        vt = "(CAST(qt AS DOUBLE) / nt - (CAST(st AS DOUBLE) / nt) * (CAST(st AS DOUBLE) / nt))"
        ve = "(CAST(qe AS DOUBLE) / ne - (CAST(se AS DOUBLE) / ne) * (CAST(se AS DOUBLE) / ne))"
        sides.append(f"""
    SELECT '{fname}' AS feature,
           CAST(nt AS BIGINT) AS n_train, CAST(ne AS BIGINT) AS n_test,
           {sql_pround("CAST(st AS DOUBLE) / nt", 6)} AS mean_train,
           {sql_pround("CAST(se AS DOUBLE) / ne", 6)} AS mean_test,
           {sql_pround(
               f"{smd_num} / sqrt(({vt} + {ve}) / 2.0)", 6
           )} AS smd
    FROM (SELECT
            count(*) FILTER (WHERE bucket < 95) AS nt,
            count(*) FILTER (WHERE bucket >= 95) AS ne,
            sum(x) FILTER (WHERE bucket < 95) AS st,
            sum(x) FILTER (WHERE bucket >= 95) AS se,
            sum(x * x) FILTER (WHERE bucket < 95) AS qt,
            sum(x * x) FILTER (WHERE bucket >= 95) AS qe
          FROM (SELECT CAST({fsql} AS BIGINT) AS x,
                       ('0x' || substr(md5('split:'
                                            || CAST(doc_id AS VARCHAR)),
                                       1, 15))::BIGINT % 100 AS bucket
                FROM documents))""")
    return " UNION ALL ".join(sides)


@query("split_covariate_balance", oracle=_balance_oracle())
def q_split_covariate_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Covariate-balance audit of the deterministic 95/5 train/test
    split (same salted hash as train_test_split_assign): per feature,
    the standardized mean difference SMD = (mean_train - mean_test) /
    sqrt((var_train + var_test)/2) — the standard balance diagnostic
    (|SMD| > 0.1 flags imbalance); a held-out set that doesn't look
    like training data invalidates every eval number produced on it.
    Features are integer-valued document statistics (char length,
    token count, digit count), so all six sufficient statistics are
    exact integer sums in any order.

    Scale shape: ONE narrow corpus scan computes every feature's
    (n, sum, sum-of-squares) per side as a single map-side-combinable
    aggregate; the SMD arithmetic runs on a 1-row frame per feature.
    No shuffle carries more than the 1-row aggregates."""
    from etl_pyspark_spark.functions import text as T

    docs = read_table(spark, sf_dir, "documents")
    bucket = (
        T.portable_hash60(
            F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
        )
        % 100
    )
    feats = docs.select(
        bucket.alias("bucket"),
        F.length("text").cast("bigint").alias("char_len"),
        F.size(T.ws_tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
        (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), "[0-9]", ""))
        )
        .cast("bigint")
        .alias("n_digits"),
    )
    train = F.col("bucket") < 95
    aggs = []
    for fname in ("char_len", "n_tokens", "n_digits"):
        x = F.col(fname)
        aggs += [
            F.count(F.when(train, 1)).alias(f"{fname}_nt"),
            F.count(F.when(~train, 1)).alias(f"{fname}_ne"),
            F.sum(F.when(train, x)).alias(f"{fname}_st"),
            F.sum(F.when(~train, x)).alias(f"{fname}_se"),
            F.sum(F.when(train, x * x)).alias(f"{fname}_qt"),
            F.sum(F.when(~train, x * x)).alias(f"{fname}_qe"),
        ]
    one = feats.agg(*aggs)
    outs = []
    for fname in ("char_len", "n_tokens", "n_digits"):
        nt = F.col(f"{fname}_nt").cast("double")
        ne = F.col(f"{fname}_ne").cast("double")
        mt = F.col(f"{fname}_st").cast("double") / nt
        me = F.col(f"{fname}_se").cast("double") / ne
        vt = F.col(f"{fname}_qt").cast("double") / nt - mt * mt
        ve = F.col(f"{fname}_qe").cast("double") / ne - me * me
        outs.append(
            one.select(
                F.lit(fname).alias("feature"),
                F.col(f"{fname}_nt").cast("bigint").alias("n_train"),
                F.col(f"{fname}_ne").cast("bigint").alias("n_test"),
                pround(mt, 6).alias("mean_train"),
                pround(me, 6).alias("mean_test"),
                pround(
                    (mt - me) / F.sqrt((vt + ve) / F.lit(2.0)), 6
                ).alias("smd"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
