"""Query family: round-9 extensions.

Capabilities the registry genuinely lacked, each a first-class
LLM-data-pipeline operator (the reference — a linear taxi ETL,
nyc_taxi_etl.py:50-103 — has none of these surfaces; SURVEY.md §2.9
growth plan):

- **unigram-LM surprisal scoring** — the perplexity-proxy quality
  gate every corpus pipeline runs before training: score each doc by
  the mean negative log-probability of its tokens under the corpus's
  own unigram model. Garbled/boilerplate text scores high (rare-token
  soup) or suspiciously low (repeated stop-tokens); both tails get
  cut. The registry's quality scores (Gopher/C4 gates, stats) are all
  rule-based; this is the first model-based one.
- **within-doc token entropy** — Shannon entropy of each doc's token
  histogram: the repetition detector that catches "spam spam spam"
  degenerate text that length/ratio rules miss (text_repetition_ratio
  counts adjacent repeats; entropy catches global imbalance).
- **mutual k-NN graph** — edges where BOTH endpoints rank each other
  in their top-k by cosine: the standard graph for dedup clustering /
  diversity analysis, strictly stronger than one-directional kNN
  (hub vectors collect thousands of in-edges but reciprocate few).
- **two-pass nearest as-of join** — join_asof_nearest (widening_r3)
  ranks ALL of a user's signups per purchase (per-key candidates are
  unbounded: its own docstring concedes it needs time pre-binning at
  scale); this twin composes one backward + one forward as-of pass,
  so cost stays two window shuffles regardless of per-key history.
"""

from __future__ import annotations

from etl_pyspark_spark.functions.compat import pround
from etl_pyspark_spark.queries.core import (
    DataFrame,
    F,
    SparkSession,
    query,
    read_table,
)

# DuckDB twin of functions.text.ws_tokens (same rule as
# text_analysis._WS_TOKENS_SQL, inlined to keep this module
# import-order independent)
_WS = "list_filter(string_split({col}, ' '), t -> t <> '')"

# --- unigram-LM surprisal ---------------------------------------------

# ln() is allowed 1 ulp per libm, so every ln term is pre-rounded with
# the house pround at 12 digits and summed as an INTEGER of 1e-12
# units — both engines then aggregate bit-identically in any order
# (same discipline as registry.dec_sum for money sums).
_UNIGRAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, t.tok
  FROM documents, UNNEST({_WS.format(col="text")}) AS t(tok)),
vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
tot AS (SELECT sum(cnt) AS n_total FROM vocab),
surp AS (
  SELECT doc_id,
         CAST(floor((ln(CAST(n_total AS DOUBLE))
                     - ln(CAST(cnt AS DOUBLE))) * 1e12 + 0.5)
              AS BIGINT) AS s
  FROM toks JOIN vocab USING (tok), tot)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tok,
       floor(((CAST(sum(s) AS DOUBLE) / 1e12) / count(*)) * 1e6 + 0.5)
         / 1e6 AS avg_surprisal
FROM surp GROUP BY doc_id
"""


@query("quality_unigram_logprob", oracle=_UNIGRAM_ORACLE)
def q_quality_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: mean unigram surprisal
    -ln p(tok) per document, with p() the corpus's own token
    distribution — the model-based filter pass of a training-data
    pipeline (a KenLM in production; the unigram LM here keeps it
    exactly oracle-replayable).

    Plan shape at 100 TB: tokenize once (one explode), ONE token-keyed
    aggregation builds the LM (vocab is Heaps-law bounded, orders of
    magnitude smaller than the corpus), one join tokens->vocab that
    AQE turns into a broadcast once the aggregated vocab proves small,
    one doc-keyed aggregation. No collect, no UDF; the ln terms ride
    whole-stage codegen. Cross-engine exactness: each surprisal is
    pround(12)-scaled to integer 1e-12 units BEFORE summing, so the
    per-doc sums are order-independent integers on both engines."""
    from etl_pyspark_spark.functions.text import ws_tokens

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(ws_tokens(F.col("text"))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("n_total"))
    surp = (
        F.floor(
            (
                F.log(F.col("n_total").cast("double"))
                - F.log(F.col("cnt").cast("double"))
            )
            * F.lit(1e12)
            + F.lit(0.5)
        )
    ).cast("bigint")
    return (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", surp.alias("s"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            F.sum("s").alias("ssum"),
        )
        .select(
            "doc_id",
            "n_tok",
            pround(
                (F.col("ssum").cast("double") / F.lit(1e12))
                / F.col("n_tok"),
                6,
            ).alias("avg_surprisal"),
        )
    )


# --- within-doc token entropy -----------------------------------------

_ENTROPY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, t.tok
  FROM documents, UNNEST({_WS.format(col="text")}) AS t(tok)),
tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
agg AS (
  SELECT doc_id,
         sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1e12 + 0.5)
                      AS BIGINT)) AS clnc,
         sum(c) AS n
  FROM tc GROUP BY doc_id)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tok,
       floor((CAST(floor(ln(CAST(n AS DOUBLE)) * 1e12 + 0.5) AS BIGINT)
              / 1e12
              - (CAST(clnc AS DOUBLE) / 1e12) / n) * 1e6 + 0.5) / 1e6
         AS token_entropy
FROM agg
"""


@query("text_token_entropy", oracle=_ENTROPY_ORACLE)
def q_text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's token histogram,
    H = ln(n) - (1/n) * sum c_i*ln(c_i): the degenerate-repetition
    detector (a doc that is one token over and over has H = 0; a doc
    of all-distinct tokens has H = ln(n)). Complements
    text_repetition_ratio (adjacent repeats) with global imbalance.

    Two narrow aggregations (doc+token counts, then per-doc fold); the
    ln terms are pround(12)-scaled to integers before summation, so
    both engines fold bit-identically in any order. No UDF, no
    collect; the whole plan is codegen."""
    from etl_pyspark_spark.functions.text import ws_tokens

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(ws_tokens(F.col("text"))).alias("tok")
    )
    tc = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    lnc = F.floor(F.log(F.col("c").cast("double")) * F.lit(1e12) + F.lit(0.5)).cast(
        "bigint"
    )
    agg = tc.groupBy("doc_id").agg(
        F.sum(F.col("c") * lnc).alias("clnc"),
        F.sum("c").cast("bigint").alias("n"),
    )
    lnn = F.floor(
        F.log(F.col("n").cast("double")) * F.lit(1e12) + F.lit(0.5)
    ).cast("bigint")
    return agg.select(
        "doc_id",
        F.col("n").alias("n_tok"),
        pround(
            lnn / F.lit(1e12)
            - (F.col("clnc").cast("double") / F.lit(1e12)) / F.col("n"),
            6,
        ).alias("token_entropy"),
    )


# --- mutual k-NN graph -------------------------------------------------

_KNN_K = 5
# absolute ceiling on the corpus rows shipped into the GEMM closure —
# the blocking.MAX_BLOCK / _DECON_MAX_BENCH discipline: beyond this,
# brute force is the wrong tool and the IVF path (similarity_ann_ivf)
# is the scale answer; raising silently would OOM executors instead
_KNN_MAX_CORPUS = 262_144


def _knn_oracle() -> str:
    from etl_pyspark_spark.queries.dedup_queries import _sql_cos

    cos = _sql_cos("a.embedding", "b.embedding")
    # COALESCE(.., 0.0): sql_cosine yields NULL for a zero-norm vector
    # (which DuckDB would rank BELOW negative cosines under ORDER BY c
    # DESC) while the engine's guarded norm forces cosine 0.0 for the
    # same rows; coalescing the oracle to 0.0 makes both engines rank
    # zero vectors identically (no-op on fixtures with no zero vector)
    return f"""
    WITH sims AS (
      SELECT a.vec_id AS qa, b.vec_id AS qb, COALESCE({cos}, 0.0) AS c
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
    rk AS (
      SELECT qa, qb, c,
             row_number() OVER (PARTITION BY qa
                                ORDER BY c DESC, qb ASC) AS r
      FROM sims),
    knn AS (SELECT qa, qb, c FROM rk WHERE r <= {_KNN_K})
    SELECT x.qa AS vec_id_a, x.qb AS vec_id_b, x.c AS cos_sim
    FROM knn x JOIN knn y ON x.qa = y.qb AND x.qb = y.qa
    WHERE x.qa < x.qb
    """


@query("similarity_mutual_knn", oracle=_knn_oracle())
def q_similarity_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual k-NN graph over the embedding corpus: an edge (a, b)
    exists iff b is in a's cosine top-k AND a is in b's — the
    reciprocal filter that strips hub vectors (which collect thousands
    of one-way in-edges) and is the standard input graph for
    SemDeDup-style clustering and diversity audits.

    Physical shape: the corpus matrix ships ONCE into an Arrow-batched
    ``mapInPandas`` closure (hard-capped at ``_KNN_MAX_CORPUS`` rows —
    the MAX_BLOCK discipline; past the cap brute force is the wrong
    tool and similarity_ann_ivf is the scale path), each batch does
    one BLAS GEMM against it and emits its rows' top-k, so the kNN
    stage is embarrassingly parallel with zero shuffles. The mutual
    filter is then a self-join of the tiny (n*k)-row edge list. Ranks
    order by the pround(6)-rounded cosine with vec_id tiebreak, so
    BLAS summation order cannot flip a rank against the oracle."""
    import numpy as np
    from pyspark.sql import types as T

    emb = read_table(spark, sf_dir, "embeddings")
    rows = (
        emb.select("vec_id", "embedding")
        .limit(_KNN_MAX_CORPUS + 1)
        .collect()
    )
    if len(rows) > _KNN_MAX_CORPUS:
        raise ValueError(
            f"similarity_mutual_knn: corpus exceeds the "
            f"{_KNN_MAX_CORPUS}-row brute-force cap; use the IVF path"
        )
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    # the composite rank key round(cos*1e6)*2^42 - id is exact and
    # order-correct in int64 only for 0 <= id < 2^42 (|key| <= 2^62;
    # the 100x grow fixture's ids reach ~10^11, which already overflows
    # the float64 variant this replaced); past the bound the tiebreak
    # silently corrupts top-k order vs the oracle, so raise (same
    # raise-over-silent-degrade discipline as the corpus cap)
    if len(ids) and (
        int(ids.min()) < 0 or int(ids.max()) >= (1 << 42)
    ):
        raise ValueError(
            "similarity_mutual_knn: vec_id outside [0, 2^42) breaks "
            "the exact int64 composite rank key; remap ids first"
        )
    mat = np.stack([r["embedding"] for r in rows]).astype(np.float64)
    nrm = np.linalg.norm(mat, axis=1, keepdims=True)
    nrm[nrm == 0.0] = 1.0
    unit = mat / nrm
    order = np.argsort(ids)
    ids_s, unit_s = ids[order], unit[order]

    schema = T.StructType(
        [
            T.StructField("qa", T.LongType()),
            T.StructField("qb", T.LongType()),
            T.StructField("c", T.DoubleType()),
        ]
    )

    n_corpus = unit_s.shape[0]
    # sims/comp are (rows x corpus) float64 temporaries; an unchunked
    # 10k-row Arrow batch against the 2^18-row cap would be ~21 GB PER
    # ARRAY per worker — so slice each batch to keep every temporary
    # under ~2^25 elements (~256 MB), bounding worker RSS regardless
    # of Arrow batch size or corpus size under the cap
    _chunk = max(16, (1 << 25) // max(1, n_corpus))

    def topk(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            q = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0.0] = 1.0
            uq = q / qn
            qa_all = pdf["vec_id"].to_numpy()
            k = min(_KNN_K, n_corpus - 1)
            if k <= 0:  # single-vector corpus: no non-self neighbors
                continue
            for s0 in range(0, len(qa_all), _chunk):
                qa = qa_all[s0 : s0 + _chunk]
                sims = uq[s0 : s0 + _chunk] @ unit_s.T
                sims = np.floor(sims * 1e6 + 0.5) / 1e6  # pround BEFORE rank
                # fully vectorized top-k with the oracle's (cos DESC,
                # id ASC) tiebreak: composite key = round(cos*1e6)*2^42
                # - id, exact in int64 (|key| <= 2^62 for 0 <= id <
                # 2^42, guarded above), so argpartition+argsort on ONE
                # array reproduces lexsort without the per-row Python
                # loop (which measured 7 s at sf0.1 on a 20k corpus)
                comp = (
                    np.floor(sims * 1e6 + 0.5).astype(np.int64)
                    * (1 << 42)
                    - ids_s[None, :]
                )
                pos = np.searchsorted(ids_s, qa)
                rows_idx = np.arange(len(qa))
                self_rows = rows_idx[
                    ids_s[np.clip(pos, 0, n_corpus - 1)] == qa
                ]
                # mask self with -(2^62): strictly below every real
                # key (comp >= -1e6*2^42 - id > -2^62) and, unlike
                # int64 min, safe under the argpartition negation
                # (-int64_min overflows back to itself and would rank
                # the masked self FIRST)
                comp[self_rows, pos[self_rows]] = -(1 << 62)
                part = np.argpartition(-comp, kth=k - 1, axis=1)[:, :k]
                pc = np.take_along_axis(comp, part, axis=1)
                order = np.argsort(-pc, axis=1, kind="stable")
                sel = np.take_along_axis(part, order, axis=1)
                yield pd.DataFrame(
                    {
                        "qa": np.repeat(qa, k),
                        "qb": ids_s[sel].ravel(),
                        "c": np.take_along_axis(sims, sel, axis=1).ravel(),
                    }
                )

    # spread(): a single-row-group embeddings file is ONE input split,
    # which serializes the whole corpus GEMM onto one Python worker
    # (measured 221 s vs ~14 s on the native fixture's one-row-group
    # parquet); the guarded repartition restores data parallelism and
    # is a no-op on real many-file lakes
    from etl_pyspark_spark.sources.io import spread

    edges = spread(emb.select("vec_id", "embedding")).mapInPandas(
        topk, schema
    )
    rev = edges.select(
        F.col("qa").alias("qb"), F.col("qb").alias("qa")
    )
    return (
        edges.join(rev, ["qa", "qb"])  # reciprocal edges only
        .where(F.col("qa") < F.col("qb"))
        .select(
            F.col("qa").alias("vec_id_a"),
            F.col("qb").alias("vec_id_b"),
            F.col("c").alias("cos_sim"),
        )
    )


# --- nearest-direction as-of join --------------------------------------

_ASOF_NEAREST_ORACLE = """
WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS p_us
           FROM events WHERE event_type = 'purchase'),
s AS (SELECT user_id, epoch_us(ts) AS s_us
      FROM events WHERE event_type = 'signup'),
cand AS (
  SELECT p.event_id, p.user_id, s.s_us, abs(s.s_us - p.p_us) AS d
  FROM p JOIN s USING (user_id)),
best AS (
  SELECT event_id, s_us, d,
         row_number() OVER (PARTITION BY event_id
                            ORDER BY d ASC, s_us ASC) AS rk
  FROM cand)
SELECT p.event_id, p.user_id,
       b.s_us AS nearest_signup_epoch_us,
       b.d AS abs_delta_us
FROM p LEFT JOIN (SELECT * FROM best WHERE rk = 1) b USING (event_id)
"""


@query("join_asof_nearest_twopass", oracle=_ASOF_NEAREST_ORACLE)
def q_join_asof_nearest_twopass(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """As-of join, direction='nearest' (pandas merge_asof parity), as
    TWO as-of passes: each purchase takes the signup closest in time
    for the same user — before or after — ties to the earlier signup.

    The existing join_asof_nearest ranks every signup of the user per
    purchase (per-key candidate set is unbounded — its docstring
    concedes it needs time pre-binning at scale). This twin composes
    one backward and one forward as-of pass
    (operators/joins.asof_join — union + single window each, no UDF,
    both sides arbitrarily large), joined on the left key; the nearer
    candidate wins, equal distances resolve to the backward (earlier)
    one. Cost: two key-partitioned window shuffles — the same
    asymptotics as either single direction, never a per-key
    candidate blow-up."""
    from etl_pyspark_spark.operators.joins import asof_join

    ev = read_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.unix_micros("ts").alias("p_us")
    )
    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id", "ts", F.unix_micros("ts").alias("s_us")
    )
    bwd = asof_join(
        purchases,
        signups,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["s_us"],
        direction="backward",
    ).select("event_id", "user_id", "p_us", F.col("asof_s_us").alias("b_us"))
    fwd = asof_join(
        purchases,
        signups,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["s_us"],
        direction="forward",
    ).select("event_id", F.col("asof_s_us").alias("f_us"))
    both = bwd.join(fwd, "event_id")
    d_b = F.col("p_us") - F.col("b_us")  # >= 0 or NULL
    d_f = F.col("f_us") - F.col("p_us")  # >= 0 or NULL
    take_b = F.col("b_us").isNotNull() & (
        F.col("f_us").isNull() | (d_b <= d_f)  # tie -> earlier (backward)
    )
    nearest = F.when(take_b, F.col("b_us")).otherwise(F.col("f_us"))
    delta = F.when(take_b, d_b).otherwise(d_f)
    return both.select(
        "event_id",
        "user_id",
        nearest.alias("nearest_signup_epoch_us"),
        delta.alias("abs_delta_us"),
    )


# --- Poisson bootstrap confidence interval -----------------------------

_BOOT_R = 16
# Poisson(1) inverse CDF at 15-bit resolution, as INTEGER thresholds:
# a draw is 15 bits of an md5-derived 60-bit integer, and the weight
# is the count of thresholds t_k the draw reaches
# (t_k = ceil(cdf_k * 2^15) - 1, so P(w > k) = (2^15 - 1 - t_k)/2^15
# ~= 1 - cdf_k; quantization error < 2^-15 per class, mean 1.0002).
# Integer thresholds keep the whole weight derivation in int codegen —
# the double-math variant (conv per draw + double compares) measured
# ~1.2 s per replicate at sf0.1, ~20 s for 16 — and make cross-engine
# agreement trivial: no doubles exist anywhere before the final mean.
_POIS1_T15 = (12054, 24109, 30136, 32145, 32648, 32748, 32765, 32767, 32767)


def _boot_oracle() -> str:
    # one md5 -> one 60-bit integer -> FOUR 15-bit draws via bit
    # extraction; weight = count of integer thresholds reached
    cols = []
    for r in range(_BOOT_R):
        d, part = divmod(r, 4)
        h = (
            f"(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_' ||"
            f" CAST(l_linenumber AS VARCHAR) || '_h{d}'), 1, 15))::BIGINT)"
        )
        bits = f"(({h} >> {15 * part}) & 32767)"
        wr = (
            "("
            + " + ".join(
                f"CASE WHEN {bits} >= {t} THEN 1 ELSE 0 END"
                for t in _POIS1_T15
            )
            + ")"
        )
        cols.append(f"sum({wr}) AS n{r}")
        cols.append(
            f"sum({wr} * CAST(CAST(l_extendedprice AS DECIMAL(12,2))"
            f" * 100 AS BIGINT)) AS s{r}"
        )
    sel = ", ".join(cols)
    rows = " UNION ALL ".join(
        f"SELECT {r} AS replicate, CAST(n{r} AS BIGINT) AS n_eff, "
        f"floor(((CAST(s{r} AS DOUBLE) / 100.0) / n{r}) * 1e6 + 0.5)"
        f" / 1e6 AS mean_price FROM agg"
        for r in range(_BOOT_R)
    )
    return f"WITH agg AS (SELECT {sel} FROM lineitem) {rows}"


@query("stats_bootstrap_ci_poisson", oracle=_boot_oracle())
def q_stats_bootstrap_ci_poisson(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Poisson bootstrap (Chamandy et al., Google 2012 — 'Estimating
    Uncertainty for Massive Data Streams'): THE bootstrap that works
    at 100 TB. Classical resampling needs n draws WITH replacement per
    replicate (a shuffle per replicate, unusable at scale); the
    Poisson trick gives each row an independent Poisson(1) weight per
    replicate, so ALL R replicates are computed in ONE streaming pass
    as R weighted sums — map-side partial aggregation, zero extra
    shuffles, and n_eff fluctuates around n exactly as the bootstrap
    requires.

    Determinism AND codegen economy share one design: each digest of
    (orderkey, linenumber, digest-group) becomes ONE 60-bit integer
    (the portable conv), which yields FOUR 15-bit draws by bit
    extraction, and the Poisson(1) inverse CDF is hard-coded INTEGER
    thresholds — so weight derivation is pure int codegen (the
    double-math variant measured ~1.2 s per replicate at sf0.1; this
    runs all 16 in a fraction of that) and no floating point exists
    anywhere before the final mean, making cross-engine agreement
    structural rather than ulp-managed. Emits one row per replicate (replicate, n_eff,
    mean_price); the CI is any quantile of the 16 means — the
    expensive part, the resampled statistics, is what the operator
    computes."""
    from etl_pyspark_spark.sources.io import spread

    # the 4-md5-per-row draw derivation is the job; a single-row-group
    # fixture file is ONE scan task no matter the core count (parquet
    # splits only at row-group boundaries), so fan the scan out first —
    # spread() is a guarded no-op on any real many-file lake. The
    # shuffled payload is 3 narrow columns, ~2% of the md5 stage cost.
    li = spread(read_table(spark, sf_dir, "lineitem"))
    cents = (
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
    )
    key = F.concat_ws(
        "_",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    # one md5 -> one 60-bit int (projected ONCE; the multi-reference
    # aliases also keep CollapseProject from re-inlining the md5) ->
    # four 15-bit draws via shift/mask -> weight = count of integer
    # thresholds reached. Everything after the 4 convs is int codegen.
    from etl_pyspark_spark.functions.text import portable_hash60

    staged = li.select(
        cents.alias("cents"),
        *[
            portable_hash60(F.concat(key, F.lit(f"_h{d}"))).alias(f"h{d}")
            for d in range(_BOOT_R // 4)
        ],
    )
    weighted = []
    for r in range(_BOOT_R):
        d, part = divmod(r, 4)
        bits = F.shiftright(F.col(f"h{d}"), 15 * part).bitwiseAND(
            F.lit(32767)
        )
        w = None
        for t in _POIS1_T15:
            ind = F.when(bits >= t, 1).otherwise(0)
            w = ind if w is None else (w + ind)
        weighted.append(w.alias(f"w{r}"))
    staged = staged.select("cents", *weighted)
    aggs = []
    for r in range(_BOOT_R):
        aggs.append(F.sum(F.col(f"w{r}")).cast("bigint").alias(f"n{r}"))
        aggs.append(
            F.sum(F.col(f"w{r}") * F.col("cents")).cast("bigint").alias(f"s{r}")
        )
    one = staged.agg(*aggs)
    reps = F.array(
        *[
            F.struct(
                F.lit(r).alias("replicate"),
                F.col(f"n{r}").alias("n_eff"),
                pround(
                    (F.col(f"s{r}").cast("double") / F.lit(100.0))
                    / F.col(f"n{r}"),
                    6,
                ).alias("mean_price"),
            )
            for r in range(_BOOT_R)
        ]
    )
    return one.select(F.explode(reps).alias("x")).select(
        F.col("x.replicate").alias("replicate"),
        F.col("x.n_eff").alias("n_eff"),
        F.col("x.mean_price").alias("mean_price"),
    )
