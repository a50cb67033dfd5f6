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
- **split embedding MMD** (``split_embedding_mmd``) — the same audit
  in embedding space: linear-kernel squared MMD (= squared distance
  between the two sides' mean embeddings), the one-number drift
  check between train and held-out distributions.
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


# --- embedding-space balance of the split: linear-kernel MMD^2 ----------


def _mmd_oracle() -> str:
    diff = (
        "(CAST(st AS DOUBLE) * CAST(ne AS DOUBLE)"
        " - CAST(se AS DOUBLE) * CAST(nt AS DOUBLE))"
        " / (CAST(nt AS DOUBLE) * CAST(ne AS DOUBLE))"
    )
    return f"""
    WITH q AS (
      SELECT ('0x' || substr(md5('split:' || CAST(vec_id AS VARCHAR)),
                             1, 15))::BIGINT % 100 AS bucket,
             g.i AS pos,
             CAST(floor(embedding[g.i] * 1000.0 + 0.5) AS BIGINT) AS qv
      FROM embeddings,
           UNNEST(generate_series(1, len(embedding))) AS g(i)),
    agg AS (SELECT pos,
                   CAST(sum(qv) FILTER (WHERE bucket < 95) AS BIGINT) AS st,
                   count(*) FILTER (WHERE bucket < 95) AS nt,
                   CAST(sum(qv) FILTER (WHERE bucket >= 95) AS BIGINT) AS se,
                   count(*) FILTER (WHERE bucket >= 95) AS ne
            FROM q GROUP BY pos),
    d AS (SELECT pos, nt, ne, {diff} AS diff FROM agg)
    SELECT CAST(max(nt) AS BIGINT) AS n_train,
           CAST(max(ne) AS BIGINT) AS n_test,
           CAST(count(*) AS BIGINT) AS n_dims,
           {sql_pround(
               "CAST(sum(CAST(diff * diff AS DECIMAL(18,6))) AS DOUBLE)"
               " / 1e6",
               9,
           )} AS mmd_sq
    FROM d
    """


@query("split_embedding_mmd", oracle=_mmd_oracle())
def q_split_embedding_mmd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-kernel squared MMD between the train and test sides of
    the deterministic 95/5 split, in embedding space: ||mean_train -
    mean_test||^2 — Gretton et al.'s maximum mean discrepancy with
    the linear kernel, the O(n) member of the two-sample-test family
    (the quadratic-kernel forms are n^2). Near 0 = the held-out set
    is drawn from the training distribution; large = the split is
    skewed and eval numbers won't transfer. Complements
    split_covariate_balance (scalar features) with the
    representation-space view.

    Exactness: elements quantize to bigint millis BEFORE the
    per-dimension sums (order-insensitive exact integers — the
    centroid technique), each dimension's mean difference is ONE
    double division of exact-in-double integer products, and the
    64-term sum of squares folds DECIMAL(18,6). Scale shape: one
    posexplode scan -> (pos)-keyed map-side-combinable aggregation
    (|dims| rows) -> a 1-row reduce. Nothing downstream of the first
    reduce depends on corpus size."""
    from etl_pyspark_spark.functions import text as T

    emb = read_table(spark, sf_dir, "embeddings")
    bucket = (
        T.portable_hash60(
            F.concat(F.lit("split:"), F.col("vec_id").cast("string"))
        )
        % 100
    )
    ex = emb.select(
        bucket.alias("bucket"), F.posexplode("embedding").alias("pos0", "x")
    ).select(
        "bucket",
        (F.col("pos0") + 1).alias("pos"),
        F.floor(F.col("x") * F.lit(1e3) + F.lit(0.5))
        .cast("bigint")
        .alias("qv"),
    )
    train = F.col("bucket") < 95
    agg = ex.groupBy("pos").agg(
        F.sum(F.when(train, F.col("qv"))).cast("bigint").alias("st"),
        F.count(F.when(train, 1)).alias("nt"),
        F.sum(F.when(~train, F.col("qv"))).cast("bigint").alias("se"),
        F.count(F.when(~train, 1)).alias("ne"),
    )
    diff = (
        F.col("st").cast("double") * F.col("ne").cast("double")
        - F.col("se").cast("double") * F.col("nt").cast("double")
    ) / (F.col("nt").cast("double") * F.col("ne").cast("double"))
    d = agg.select("nt", "ne", diff.alias("diff"))
    return d.agg(
        F.max("nt").cast("bigint").alias("n_train"),
        F.max("ne").cast("bigint").alias("n_test"),
        F.count(F.lit(1)).cast("bigint").alias("n_dims"),
        pround(
            F.sum((F.col("diff") * F.col("diff")).cast("decimal(18,6)")).cast(
                "double"
            )
            / F.lit(1e6),
            9,
        ).alias("mmd_sq"),
    )


# --- PSI drift between order-date eras ----------------------------------

# fixture order dates span 1995-01-01 .. 2001-08-01 (both the driver
# and the native generator): 1998 splits them into two populated eras
_PSI_SPLIT = "1998-01-01"


def _psi_oracle() -> str:
    # smoothed shares: p = (c + 0.5) / (n + 5) with 10 bins; each
    # ln-term is floor-scaled to an exact bigint at 1e-12 (the house
    # rule for libm terms crossing engines) and divided back out
    return f"""
    WITH pop AS (
      SELECT o_totalprice AS price, o_orderkey AS k,
             CASE WHEN o_orderdate < DATE '{_PSI_SPLIT}'
                  THEN 0 ELSE 1 END AS era
      FROM orders),
    ref AS (SELECT price, k FROM pop WHERE era = 0),
    nref AS (SELECT count(*) AS n FROM ref),
    ranked AS (SELECT price,
                      row_number() OVER (ORDER BY price, k) AS rnk
               FROM ref),
    edges AS (SELECT r.price AS e
              FROM ranked r, nref
              WHERE r.rnk IN (SELECT CAST(ceil(n * x / 10.0) AS BIGINT)
                              FROM nref, UNNEST([1,2,3,4,5,6,7,8,9])
                                   AS t(x))),
    binned AS (
      SELECT p.era,
             1 + (SELECT count(*) FROM edges e WHERE p.price > e.e)
               AS bin
      FROM pop p),
    hist AS (SELECT bin,
                    count(*) FILTER (WHERE era = 0) AS c_ref,
                    count(*) FILTER (WHERE era = 1) AS c_cur
             FROM binned GROUP BY bin),
    spine AS (SELECT x AS bin FROM UNNEST([1,2,3,4,5,6,7,8,9,10]) AS s(x)),
    tot AS (SELECT sum(c_ref) AS nr, sum(c_cur) AS nc FROM hist),
    terms AS (
      SELECT s.bin,
             COALESCE(h.c_ref, 0) AS c_ref, COALESCE(h.c_cur, 0) AS c_cur,
             (COALESCE(h.c_ref, 0) + 0.5) / (nr + 5.0) AS p,
             (COALESCE(h.c_cur, 0) + 0.5) / (nc + 5.0) AS q
      FROM spine s LEFT JOIN hist h ON h.bin = s.bin, tot)
    SELECT bin,
           CAST(c_ref AS BIGINT) AS n_ref,
           CAST(c_cur AS BIGINT) AS n_cur,
           CAST(floor((p - q) * ln(p / q) * 1e12 + 0.5) AS BIGINT) / 1e12
             AS psi_term
    FROM terms ORDER BY bin
    """


@query("drift_psi_price_deciles", oracle=_psi_oracle())
def q_drift_psi_price_deciles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Population Stability Index between order-date eras (pre/post
    1998): order totals binned by the REFERENCE era's price deciles,
    per-bin PSI terms (p - q) * ln(p / q) with Laplace smoothing —
    the standard production drift gate (PSI < 0.1 stable, > 0.25
    investigate); their sum is the PSI. Complements tv_distance_drift
    (which needs no binning) with the binned, reference-anchored form
    every model-monitoring stack reports.

    Scale shape: decile edges come from the distributed rank operator
    (range exchange + per-partition offsets — NEVER a global-sort
    window over the population), collected as NINE values and folded
    into a literal bin expression, so binning both eras is one
    scan-speed projection and the histogram one map-side-combinable
    aggregation. Cross-engine exactness: counts are integers, the
    smoothed shares are identically-sequenced double arithmetic, and
    each ln term floor-scales to an exact bigint at 1e-12 before the
    final division (the unigram-logprob rule)."""
    import math

    from etl_pyspark_spark.operators.ranks import with_global_rank

    orders = read_table(spark, sf_dir, "orders")
    pop = orders.select(
        F.col("o_totalprice").alias("price"),
        F.col("o_orderkey").alias("k"),
        F.when(
            F.col("o_orderdate") < F.lit(_PSI_SPLIT).cast("date"), 0
        )
        .otherwise(1)
        .alias("era"),
    )
    ref = pop.where(F.col("era") == 0)
    n_ref_pop = ref.count()
    targets = {math.ceil(n_ref_pop * x / 10.0) for x in range(1, 10)}
    ranked = with_global_rank(ref.select("price", "k"), ["price", "k"], "rnk")
    edges = sorted(
        r["price"] for r in ranked.where(F.col("rnk").isin(targets)).collect()
    )
    bin_expr = F.lit(1)
    for e in edges:
        bin_expr = bin_expr + F.when(F.col("price") > F.lit(e), 1).otherwise(0)
    hist = (
        pop.select(bin_expr.alias("bin"), "era")
        .groupBy("bin")
        .agg(
            F.count(F.when(F.col("era") == 0, 1)).alias("c_ref"),
            F.count(F.when(F.col("era") == 1, 1)).alias("c_cur"),
        )
    )
    spine = spark.range(1, 11).select(F.col("id").cast("int").alias("bin"))
    tot = hist.agg(
        F.sum("c_ref").alias("nr"), F.sum("c_cur").alias("nc")
    )
    terms = (
        spine.join(hist, "bin", "left")
        .select(
            "bin",
            F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
            F.coalesce("c_cur", F.lit(0)).alias("c_cur"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "c_ref",
            "c_cur",
            (
                (F.col("c_ref") + F.lit(0.5))
                / (F.col("nr") + F.lit(5.0))
            ).alias("p"),
            (
                (F.col("c_cur") + F.lit(0.5))
                / (F.col("nc") + F.lit(5.0))
            ).alias("q"),
        )
    )
    term = (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
    return terms.select(
        "bin",
        F.col("c_ref").cast("bigint").alias("n_ref"),
        F.col("c_cur").cast("bigint").alias("n_cur"),
        (
            F.floor(term * F.lit(1e12) + F.lit(0.5)).cast("bigint")
            / F.lit(1e12)
        ).alias("psi_term"),
    )


# --- t-closeness: the third leg of the privacy triad --------------------


def _tcloseness_oracle() -> str:
    return f"""
    WITH c AS (
      SELECT c_nationkey AS nation, c_mktsegment AS seg,
             CAST(floor(c_acctbal / 1000.0) AS INT) AS bin
      FROM customer),
    bins AS (SELECT x AS bin FROM UNNEST(generate_series(-1, 9)) AS t(x)),
    groups AS (SELECT DISTINCT nation, seg FROM c),
    gsize AS (SELECT nation, seg, count(*) AS ng FROM c GROUP BY 1, 2),
    gbin AS (SELECT nation, seg, bin, count(*) AS cg
             FROM c GROUP BY 1, 2, 3),
    tot AS (SELECT count(*) AS n FROM c),
    tbin AS (SELECT bin, count(*) AS ct FROM c GROUP BY 1),
    spine AS (SELECT g.nation, g.seg, b.bin FROM groups g CROSS JOIN bins b),
    dist AS (
      SELECT s.nation, s.seg, s.bin,
             CAST(COALESCE(gb.cg, 0) AS DOUBLE) / gs.ng
               - CAST(COALESCE(tb.ct, 0) AS DOUBLE) / t.n AS d
      FROM spine s
      JOIN gsize gs ON gs.nation = s.nation AND gs.seg = s.seg
      LEFT JOIN gbin gb ON gb.nation = s.nation AND gb.seg = s.seg
                       AND gb.bin = s.bin
      LEFT JOIN tbin tb ON tb.bin = s.bin, tot t),
    cum AS (
      SELECT nation, seg,
             abs(sum(d) OVER (PARTITION BY nation, seg
                              ORDER BY bin
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW)) AS acd
      FROM dist)
    SELECT c.nation, c.seg,
           CAST(gs.ng AS BIGINT) AS n_group,
           {sql_pround("CAST(sum(CAST(" + sql_pround("c.acd / 10.0", 9)
                       + " AS DECIMAL(18,9))) AS DOUBLE)", 6)} AS emd
    FROM cum c JOIN gsize gs ON gs.nation = c.nation AND gs.seg = c.seg
    GROUP BY c.nation, c.seg, gs.ng
    """


@query("privacy_t_closeness", oracle=_tcloseness_oracle())
def q_privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li et al., ICDE'07) — the third leg of the
    privacy triad next to k_anonymity_audit and l_diversity_audit:
    for every quasi-identifier group (nation x market segment), the
    Earth Mover's Distance between the group's distribution of the
    ordered sensitive attribute (account-balance bands) and the
    global distribution; a group with small EMD reveals nothing
    beyond the public marginal, a large one pinpoints its members'
    balances even when k-anonymity and l-diversity hold. Ordered-EMD
    = mean |cumulative difference| over the m=11 fixed bands.

    Scale shape: two map-side-combinable aggregations (per-group-band,
    per-band) + a groups x 11-band spine; the cumulative window
    partitions BY GROUP over 11 rows — never a single-partition
    window. Exactness: counts are integers, shares identically
    sequenced doubles, per-band terms pround(9)-quantized into
    DECIMAL(18,9) so the 11-term sum is order-insensitive, final
    pround(6)."""
    from pyspark.sql.window import Window

    cust = read_table(spark, sf_dir, "customer")
    c = cust.select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0))
        .cast("int")
        .alias("bin"),
    )
    bins = spark.range(-1, 10).select(F.col("id").cast("int").alias("bin"))
    groups = c.select("nation", "seg").distinct()
    gsize = c.groupBy("nation", "seg").agg(F.count(F.lit(1)).alias("ng"))
    gbin = c.groupBy("nation", "seg", "bin").agg(
        F.count(F.lit(1)).alias("cg")
    )
    tot = c.agg(F.count(F.lit(1)).alias("n"))
    tbin = c.groupBy("bin").agg(F.count(F.lit(1)).alias("ct"))
    spine = groups.crossJoin(F.broadcast(bins))
    dist = (
        spine.join(gsize, ["nation", "seg"])
        .join(gbin, ["nation", "seg", "bin"], "left")
        .join(F.broadcast(tbin), "bin", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "nation",
            "seg",
            "bin",
            "ng",
            (
                F.coalesce("cg", F.lit(0)).cast("double") / F.col("ng")
                - F.coalesce("ct", F.lit(0)).cast("double") / F.col("n")
            ).alias("d"),
        )
    )
    w = (
        Window.partitionBy("nation", "seg")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dist.select(
        "nation", "seg", "ng", F.abs(F.sum("d").over(w)).alias("acd")
    )
    return cum.groupBy("nation", "seg", F.col("ng")).agg(
        pround(
            F.sum(
                pround(F.col("acd") / F.lit(10.0), 9).cast("decimal(18,9)")
            ).cast("double"),
            6,
        ).alias("emd")
    ).select(
        "nation", "seg", F.col("ng").cast("bigint").alias("n_group"), "emd"
    )


# --- Cramer's V association matrix --------------------------------------


def _cramers_pair_sql(name, table, a, b):
    # each cell's chi-square term floor-scales to bigint at 1e-6, so
    # the cell sum is order-insensitive; V = sqrt(chi2/(n*min(r-1,c-1)))
    return f"""
    SELECT '{name}' AS pair,
           CAST(n AS BIGINT) AS n,
           CAST(dof AS BIGINT) AS dof_min,
           {sql_pround("chi2", 6)} AS chi2,
           {sql_pround("sqrt(chi2 / (n * dof))", 6)} AS cramers_v
    FROM (
      SELECT max(n) AS n,
             (count(DISTINCT va) - 1) AS ra, (count(DISTINCT vb) - 1) AS cb,
             least(count(DISTINCT va) - 1, count(DISTINCT vb) - 1) AS dof,
             CAST(sum(cq) AS DOUBLE) / 1e6 AS chi2
      FROM (
        SELECT o.va, o.vb,
               max(t.n) AS n,
               CAST(floor(
                 (o.obs - CAST(ra.rt AS DOUBLE) * ca.ct / t.n)
                 * (o.obs - CAST(ra.rt AS DOUBLE) * ca.ct / t.n)
                 / (CAST(ra.rt AS DOUBLE) * ca.ct / t.n) * 1e6 + 0.5
               ) AS BIGINT) AS cq
        FROM (SELECT {a} AS va, {b} AS vb, CAST(count(*) AS DOUBLE) AS obs
              FROM {table} GROUP BY 1, 2) o
        JOIN (SELECT {a} AS va, count(*) AS rt FROM {table} GROUP BY 1) ra
          ON ra.va = o.va
        JOIN (SELECT {b} AS vb, count(*) AS ct FROM {table} GROUP BY 1) ca
          ON ca.vb = o.vb,
             (SELECT CAST(count(*) AS DOUBLE) AS n FROM {table}) t
        GROUP BY o.va, o.vb, cq))
    """


def _cramers_oracle() -> str:
    pairs = [
        ("orders.status_x_priority", "orders", "o_orderstatus", "o_orderpriority"),
        ("customer.segment_x_nation", "customer", "c_mktsegment", "c_nationkey"),
        ("documents.lang_x_source", "documents", "lang", "source"),
    ]
    return " UNION ALL ".join(_cramers_pair_sql(*p) for p in pairs)


@query("stats_cramers_v", oracle=_cramers_oracle())
def q_stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V association strength for three categorical column
    pairs (order status x priority, customer segment x nation,
    document language x source) — the bounded [0, 1] effect-size twin
    of the chi-square drift tests already in the registry (a V near 0
    on lang x source says corpus language mix is balanced across
    sources; near 1 says sources are language-silos, which skews any
    source-stratified sample). V = sqrt(chi2 / (n * min(r-1, c-1))).

    Scale shape per pair: one contingency aggregation (map-side
    combinable, cells bounded by category cardinalities), marginals
    joined back onto cells, everything after the first reduce bounded
    by r x c. Exactness: observed/expected arise from integer counts
    with identically-sequenced double arithmetic; each cell's
    chi-square term floor-scales to a bigint at 1e-6 so the cell SUM
    is order-insensitive on both engines."""
    pairs = [
        ("orders.status_x_priority", "orders", "o_orderstatus", "o_orderpriority"),
        ("customer.segment_x_nation", "customer", "c_mktsegment", "c_nationkey"),
        ("documents.lang_x_source", "documents", "lang", "source"),
    ]
    outs = []
    for name, table, a, b in pairs:
        t = read_table(spark, sf_dir, table).select(
            F.col(a).cast("string").alias("va"),
            F.col(b).cast("string").alias("vb"),
        )
        cells = t.groupBy("va", "vb").agg(
            F.count(F.lit(1)).cast("double").alias("obs")
        )
        rowt = t.groupBy("va").agg(F.count(F.lit(1)).alias("rt"))
        colt = t.groupBy("vb").agg(F.count(F.lit(1)).alias("ct"))
        n = t.agg(F.count(F.lit(1)).cast("double").alias("n"))
        exp = (
            F.col("rt").cast("double") * F.col("ct") / F.col("n")
        )
        cq = F.floor(
            (F.col("obs") - exp) * (F.col("obs") - exp) / exp * F.lit(1e6)
            + F.lit(0.5)
        ).cast("bigint")
        per_cell = (
            cells.join(F.broadcast(rowt), "va")
            .join(F.broadcast(colt), "vb")
            .crossJoin(F.broadcast(n))
            .select("va", "vb", "n", cq.alias("cq"))
        )
        agg = per_cell.agg(
            F.max("n").alias("n"),
            F.least(
                F.countDistinct("va") - 1, F.countDistinct("vb") - 1
            ).alias("dof"),
            (F.sum("cq").cast("double") / F.lit(1e6)).alias("chi2"),
        )
        outs.append(
            agg.select(
                F.lit(name).alias("pair"),
                F.col("n").cast("bigint").alias("n"),
                F.col("dof").cast("bigint").alias("dof_min"),
                pround(F.col("chi2"), 6).alias("chi2"),
                pround(
                    F.sqrt(F.col("chi2") / (F.col("n") * F.col("dof"))), 6
                ).alias("cramers_v"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


# --- Flesch readability gate --------------------------------------------

# identical regexes on both engines: words = maximal ASCII-letter runs,
# sentence enders = maximal [.!?] runs, syllables ~ vowel groups per
# word (the standard cheap proxy)
_RX_WORD = "[A-Za-z]+"
_RX_SENT = "[.!?]+"
_RX_VOWEL = "[aeiouyAEIOUY]+"


def _flesch_oracle() -> str:
    fre = (
        "206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)"
        " - 84.6 * (CAST(n_syll AS DOUBLE) / n_words)"
    )
    return f"""
    WITH feats AS (
      SELECT source,
             len(regexp_extract_all(text, '{_RX_WORD}')) AS n_words,
             greatest(len(regexp_extract_all(text, '{_RX_SENT}')), 1)
               AS n_sents,
             len(regexp_extract_all(text, '{_RX_VOWEL}')) AS n_syll
      FROM documents),
    scored AS (
      SELECT source,
             CAST({sql_pround(fre, 6)} AS DECIMAL(18,6)) AS fre
      FROM feats WHERE n_words > 0)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           {sql_pround("CAST(sum(fre) AS DOUBLE) / count(*)", 6)}
             AS mean_flesch,
           CAST(sum(CASE WHEN fre < 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hard
    FROM scored GROUP BY source
    """


@query("quality_flesch_readability", oracle=_flesch_oracle())
def q_quality_flesch_readability(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Flesch Reading-Ease per source: 206.835 - 1.015(words/sentence)
    - 84.6(syllables/word), syllables approximated by vowel groups —
    the standard cheap readability gate next to the structural quality
    filters (C4/Gopher): a source whose mean drops under ~30
    ("very difficult") is usually boilerplate, legalese, or token
    soup rather than prose, and readability-stratified mixing is a
    common curriculum signal. Reported per source with the count of
    hard (< 30) documents.

    Scale shape: ONE scan computes the three regexp counts per
    document (JVM-side regexp_extract_all — no Python), then a
    per-source map-side-combinable rollup. Exactness: counts are
    integers, the score is identically-sequenced double arithmetic
    pround(6)-quantized into DECIMAL(18,6) per document, so the
    cross-document mean is order-insensitive on both engines."""
    docs = read_table(spark, sf_dir, "documents")
    n_words = F.size(F.regexp_extract_all(F.col("text"), F.lit(_RX_WORD), 0))
    n_sents = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_RX_SENT), 0)),
        F.lit(1),
    )
    n_syll = F.size(F.regexp_extract_all(F.col("text"), F.lit(_RX_VOWEL), 0))
    feats = docs.select(
        "source",
        n_words.alias("n_words"),
        n_sents.alias("n_sents"),
        n_syll.alias("n_syll"),
    ).where(F.col("n_words") > 0)
    fre = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("n_words").cast("double") / F.col("n_sents"))
        - F.lit(84.6) * (F.col("n_syll").cast("double") / F.col("n_words"))
    )
    scored = feats.select(
        "source", pround(fre, 6).cast("decimal(18,6)").alias("fre")
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        pround(
            F.sum("fre").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_flesch"),
        F.sum(F.when(F.col("fre") < 30, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hard"),
    )
