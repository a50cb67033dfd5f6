"""Query family: text_analysis (mechanically split from registry.py — see core)."""

from __future__ import annotations

from etl_pyspark_spark.queries.core import (
    DataFrame,
    F,
    MAX_BASKET,
    SparkSession,
    pround,
    query,
    read_table,
    sql_pround,
)
from etl_pyspark_spark.queries._shared import _register_views  # noqa: F401

# ---------------------------------------------------------------------------
# LLM-pipeline: text analysis (BASELINE.json north star; SURVEY §2.9)
# ---------------------------------------------------------------------------

_WS_TOKENS_SQL = "list_filter(string_split({col}, ' '), t -> t <> '')"
_STOP_HITS_SQL = (
    "len(list_filter(list_filter(string_split(lower({col}), ' '), t -> t <> ''),"
    " t -> list_contains({stops}, t)))"
)


def _sql_str_list(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


@query(
    "text_stats",
    oracle=f"""
    SELECT doc_id, lang, source,
           length(text) AS n_chars_actual,
           len({_WS_TOKENS_SQL.format(col='text')}) AS n_words,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))
             AS n_bpe_tokens,
           length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS n_punct,
           len(list_distinct({_WS_TOKENS_SQL.format(col='text')}))
             AS n_unique_words
    FROM documents
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace words, BPE-ish regex tokens,
    punctuation chars, unique words — all JVM expressions."""
    from etl_pyspark_spark.functions import text as T

    docs = read_table(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.length(c).alias("n_chars_actual"),
        T.ws_token_count(c).alias("n_words"),
        T.bpe_token_count(c).alias("n_bpe_tokens"),
        T.punct_count(c).alias("n_punct"),
        F.size(F.array_distinct(T.ws_tokens(c))).alias("n_unique_words"),
    )


@query(
    "text_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(len({_WS_TOKENS_SQL.format(col='text')}) AS DOUBLE) AS n_words,
             CAST({_STOP_HITS_SQL.format(col='text',
                    stops=_sql_str_list(['the','and','of','to','a','in','is','that']))}
                  AS DOUBLE) AS n_stop,
             CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                  AS DOUBLE) AS n_punct
      FROM documents)
    SELECT doc_id,
           floor((0.3 * least(n_chars / 400.0, 1.0)
                + 0.3 * least(n_words / 60.0, 1.0)
                + 0.3 * least((CASE WHEN n_words > 0 THEN n_stop / n_words
                                    ELSE 0.0 END) * 8.0, 1.0)
                + 0.1 * (1.0 - CASE WHEN n_chars > 0 THEN n_punct / n_chars
                                    ELSE 0.0 END)) * 1000000.0 + 0.5)
             / 1000000.0 AS quality
    FROM t
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document quality score (length/word/stopword/punct
    signals), deterministic double arithmetic on both engines."""
    from etl_pyspark_spark.functions import text as T
    from etl_pyspark_spark.sources.io import spread

    docs = spread(read_table(spark, sf_dir, "documents"))
    staged = docs.select(
        "doc_id",
        "text",
        T.ws_tokens(F.col("text")).alias("__toks"),
        T.ws_tokens(F.lower(F.col("text"))).alias("__ltoks"),
    )
    return staged.select(
        "doc_id",
        pround(
            T.quality_score(
                F.col("text"), toks=F.col("__toks"), ltoks=F.col("__ltoks")
            ),
            6,
        ).alias("quality"),
    )


#: DuckDB twin of functions/text.word_ngrams (list comprehension over a
#: 1-based index series; empty list below n tokens)
_NGRAMS_SQL = (
    "CASE WHEN len({t}) >= {n} THEN "
    "[{expr} for i in generate_series(1, len({t}) - {n} + 1)] "
    "ELSE [] END"
)


def _ngram_sql(tok_expr: str, n: int) -> str:
    joined = " || ' ' || ".join(f"{tok_expr}[i+{j}]" if j else f"{tok_expr}[i]"
                                for j in range(n))
    return _NGRAMS_SQL.format(t=tok_expr, n=n, expr=joined)


@query(
    "text_repetition_ratio",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_WS_TOKENS_SQL.format(col='text')} AS toks
               FROM documents),
    g AS (SELECT doc_id, {_ngram_sql('toks', 3)} AS tri FROM t)
    SELECT doc_id, len(tri) AS n_trigrams,
           {sql_pround("CASE WHEN len(tri) > 0 THEN 1.0 - len(list_distinct(tri))*1.0/len(tri) ELSE 0.0 END")}
             AS repetition
    FROM g
    """,
)
def q_text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signal: fraction of duplicated word
    trigrams per document (templated/spammy text repeats phrases).
    Pure array expressions, no explode, no shuffle — and staged as
    tokenize-once -> grams-once projections (inlining the tokenizer
    into the gram lambda re-splits the text per element; measured 20x).
    ``spread`` fans the single-row-group fixture scan out to all cores
    — on a real many-file lake it is a no-op."""
    from etl_pyspark_spark.functions import text as T
    from etl_pyspark_spark.sources.io import spread

    docs = spread(read_table(spark, sf_dir, "documents"))
    toked = docs.select("doc_id", T.ws_tokens(F.col("text")).alias("toks"))
    gramd = toked.select(
        "doc_id", T.ngrams_from_tokens(F.col("toks"), 3).alias("tri")
    )
    return gramd.select(
        "doc_id",
        F.size("tri").alias("n_trigrams"),
        pround(T.repetition_from_grams(F.col("tri")), 6).alias("repetition"),
    )


@query(
    "ngram_corpus_top",
    oracle=f"""
    WITH t AS (SELECT {_WS_TOKENS_SQL.format(col='text')} AS toks
               FROM documents),
    g AS (SELECT unnest({_ngram_sql('toks', 2)}) AS bigram FROM t)
    SELECT bigram, count(*) AS n_docs_x_occurrences
    FROM g GROUP BY bigram
    ORDER BY n_docs_x_occurrences DESC, bigram
    LIMIT 30
    """,
)
def q_ngram_corpus_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level n-gram statistics (the classic training-data
    frequency table): explode per-doc bigrams, one partial+final
    count shuffle, global top-30 via TakeOrderedAndProject (never a
    full sort). At 100 TB the explode multiplies rows ~L-fold but the
    map-side partial aggregation collapses them before the exchange —
    the shuffle carries only distinct bigrams per partition."""
    from etl_pyspark_spark.functions import text as T
    from etl_pyspark_spark.sources.io import spread

    docs = spread(read_table(spark, sf_dir, "documents"))
    toked = docs.select(T.ws_tokens(F.col("text")).alias("toks"))
    return (
        toked.select(
            F.explode(T.ngrams_from_tokens(F.col("toks"), 2)).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_docs_x_occurrences"))
        .orderBy(F.col("n_docs_x_occurrences").desc(), F.col("bigram"))
        .limit(30)
    )


@query(
    "c4_quality_filter",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             len({_WS_TOKENS_SQL.format(col='text')}) AS n_words,
             len(list_distinct({_WS_TOKENS_SQL.format(col='text')}))
               AS n_unique
      FROM documents)
    SELECT doc_id, lang, n_words,
           {sql_pround("n_unique * 1.0 / n_words")} AS unique_ratio
    FROM t
    WHERE n_words >= 50 AND n_unique * 1.0 / n_words >= 0.45
    """,
)
def q_c4_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style rule-based corpus gate: minimum length (>= 50 words)
    plus lexical-diversity floor (unique-token ratio >= 0.45 — the
    cheap proxy for boilerplate). Keeps ~40% of the fixture corpus.
    Pure scan+filter: predicates are plain expressions, so the gate
    runs at scan speed and composes in front of any expensive dedup
    stage (cheapest-first gating, as in corpus_prep_pipeline)."""
    from etl_pyspark_spark.functions import text as T

    docs = read_table(spark, sf_dir, "documents")
    toks = T.ws_tokens(F.col("text"))
    sig = docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_words"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
    )
    ratio = F.col("n_unique").cast("double") / F.col("n_words")
    return sig.where(
        (F.col("n_words") >= 50) & (ratio >= 0.45)
    ).select(
        "doc_id",
        "lang",
        "n_words",
        pround(ratio, 6).alias("unique_ratio"),
    )


@query(
    "doc_chunk_packing",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_WS_TOKENS_SQL.format(col='text')} AS toks
               FROM documents),
    c AS (SELECT doc_id, toks,
                 unnest(generate_series(0,
                        CAST(ceil(len(toks)/32.0) AS INT) - 1)) AS chunk_id
          FROM t)
    SELECT doc_id, chunk_id,
           array_to_string(
             toks[chunk_id*32+1 : least((chunk_id+1)*32, len(toks))],
             ' ') AS chunk_text,
           least((chunk_id+1)*32, len(toks)) - chunk_id*32 AS n_tokens
    FROM c
    """,
)
def q_doc_chunk_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence chunking for training-sample prep: each document's
    token stream splits into fixed 32-token windows (doc_id, chunk_id,
    text, length) — the stage that turns a cleaned corpus into
    trainer-shaped rows. Narrow plan: tokenize once, explode a chunk
    index, slice — the only data growth is the chunk count and there
    is ZERO shuffle, so it streams at scan speed at any corpus size."""
    from etl_pyspark_spark.functions import text as T

    docs = read_table(spark, sf_dir, "documents")
    toks = T.ws_tokens(F.col("text"))
    chunked = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(
            F.sequence(
                F.lit(0),
                F.ceil(F.size(toks) / F.lit(32.0)).cast("int") - 1,
            )
        ).alias("chunk_id"),
    )
    width = F.least(
        (F.col("chunk_id") + 1) * 32, F.size("toks")
    ) - F.col("chunk_id") * 32
    return chunked.select(
        "doc_id",
        "chunk_id",
        F.concat_ws(
            " ", F.slice(F.col("toks"), F.col("chunk_id") * 32 + 1, width)
        ).alias("chunk_text"),
        width.cast("long").alias("n_tokens"),
    )


@query(
    "benchmark_decontaminate",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_WS_TOKENS_SQL.format(col='text')} AS toks
               FROM documents),
    g AS (SELECT doc_id, unnest({_ngram_sql('toks', 4)}) AS gram FROM t),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
    contaminated AS (
      SELECT DISTINCT doc_id FROM g
      WHERE doc_id % 97 <> 0 AND gram IN (SELECT gram FROM bench))
    SELECT d.doc_id, d.lang,
           (d.doc_id IN (SELECT doc_id FROM contaminated))
             AS is_contaminated
    FROM documents d WHERE d.doc_id % 97 <> 0
    """,
)
def q_benchmark_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word 4-gram with a held-out benchmark set (here the doc_id % 97
    slice stands in for the eval suite). The benchmark's distinct
    grams are TINY next to the corpus, so the membership probe is a
    broadcast semi-join against the exploded training grams — the
    fact side shuffles nothing, which is the only shape that survives
    a 100 TB corpus x benchmark-suite sweep."""
    from etl_pyspark_spark.functions import text as T
    from etl_pyspark_spark.sources.io import spread

    docs = spread(read_table(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id", T.ws_tokens(F.col("text")).alias("toks")
    ).select(
        "doc_id", F.explode(T.ngrams_from_tokens(F.col("toks"), 4)).alias("gram")
    )
    bench_grams = (
        grams.where(F.col("doc_id") % 97 == 0).select("gram").distinct()
    )
    train = docs.where(F.col("doc_id") % 97 != 0)
    contaminated = (
        grams.where(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench_grams), "gram", "semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_contaminated", F.lit(True))
    )
    return (
        train.join(contaminated, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("is_contaminated", F.lit(False)).alias(
                "is_contaminated"
            ),
        )
    )


@query(
    "basket_part_pairs",
    oracle="""
    WITH parts AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
              FROM parts a JOIN parts b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey)
    SELECT part_a, part_b, count(*) AS n_orders
    FROM pairs GROUP BY 1, 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
)
def q_basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence (the recommendation-mining
    primitive): part pairs appearing in the same order, counted and
    top-20 ranked. The pair explosion is a self-join keyed on
    l_orderkey, so work scales with sum(basket_size^2) — bounded by
    real basket sizes AND hard-capped at MAX_BASKET items per order
    (operators/baskets: WindowGroupLimit hash-rank truncation, so one
    pathological mega-basket costs O(cap^2), never O(n^2)) — and the
    two sides share one orderkey shuffle. Top-20 via
    TakeOrderedAndProject, never a global sort. The cap never binds
    on honest baskets (fixture orders carry <= 7 lines), so the
    oracle is cap-free."""
    from etl_pyspark_spark.operators.baskets import capped_basket_pairs

    li = read_table(spark, sf_dir, "lineitem")
    # ONE basket aggregate + in-row double explode (same pair set as
    # the old distinct + hash-rank window + self-join chain — see
    # capped_basket_pairs): one membership exchange instead of two
    # plus a join, no per-key sort
    pairs = capped_basket_pairs(
        li, "l_orderkey", "l_partkey", out_a="part_a", out_b="part_b"
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(20)
    )


@query(
    "basket_cap_audit",
    # f-string keeps the oracle's cap literal synchronized with the
    # engine-side operators/baskets.MAX_BASKET by construction.
    oracle=f"""
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    s AS (SELECT l_orderkey, count(*) AS basket_size FROM lp GROUP BY 1)
    SELECT count(*) AS n_baskets,
           CAST(sum(CASE WHEN basket_size > {MAX_BASKET} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_truncated,
           CAST(sum(CASE WHEN basket_size > {MAX_BASKET}
                         THEN basket_size - {MAX_BASKET} ELSE 0 END)
                AS BIGINT) AS n_items_dropped,
           CAST(max(basket_size) AS BIGINT) AS max_basket_size
    FROM s
    """,
)
def q_basket_cap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mega-basket truncation audit — the observability half of the
    shared MAX_BASKET cap (operators/baskets) that basket_part_pairs,
    pagerank_copurchase, item_item_cosine and the co-purchase graph
    family apply before pair expansion: one row reporting how many
    baskets exceed the cap and how many memberships the cap would
    drop. Runs on the UNCAPPED membership table (a single map-side
    combinable keyed count — linear, no pair expansion), so the
    release card can state the truncation instead of silently eating
    it. On the fixture every count is 0 truncated (orders carry <= 7
    lines); the synthetic mega-basket regression in
    tests/test_baskets.py exercises the binding case."""
    from etl_pyspark_spark.operators.baskets import (
        basket_truncation_audit,
    )

    li = read_table(spark, sf_dir, "lineitem")
    return basket_truncation_audit(li, "l_orderkey", "l_partkey")


@query(
    "concurrent_sessions_peak",
    oracle="""
    WITH iv AS (SELECT ts AS s, ts + INTERVAL 30 MINUTE AS e FROM events),
    seg AS (
      SELECT CAST(s AS DATE) AS day, s,
             least(e, CAST(CAST(s AS DATE) + 1 AS TIMESTAMP)) AS e
      FROM iv
      UNION ALL
      SELECT CAST(s AS DATE) + 1 AS day,
             CAST(CAST(s AS DATE) + 1 AS TIMESTAMP) AS s, e
      FROM iv WHERE e > CAST(CAST(s AS DATE) + 1 AS TIMESTAMP)
    ),
    pts AS (SELECT day, s AS t, 1 AS d FROM seg
            UNION ALL
            SELECT day, e AS t, -1 AS d FROM seg),
    sw AS (SELECT day, sum(d) OVER (PARTITION BY day ORDER BY t, d
                                    ROWS UNBOUNDED PRECEDING) AS conc
           FROM pts)
    SELECT day, CAST(max(conc) AS BIGINT) AS peak_concurrency
    FROM sw GROUP BY day
    """,
)
def q_concurrent_sessions_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency via the sweep-line pattern: each event opens a
    30-minute activity interval; interval starts are +1 points, ends
    are -1, and a running sum ordered by time gives the live count —
    max per day is the peak. Intervals are CLIPPED at midnight into
    per-day segments (an interval spans ≤ 2 days at this length), so
    each day's sweep starts seeded with the sessions still open at
    midnight — exact at day boundaries (advice r02: the unclipped
    per-day partition undercounted peaks near midnight). Each point
    carries its segment's owning day, so the window still partitions
    by DAY — no global single-partition sort at any scale. Ends sort
    before starts at a tie: half-open intervals."""
    ev = read_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    iv = ev.select(
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    day_end = F.date_add(F.to_date("s"), 1).cast("timestamp")
    seg = iv.select(
        F.to_date("s").alias("day"),
        F.col("s"),
        F.least(F.col("e"), day_end).alias("e"),
    ).unionAll(
        iv.where(F.col("e") > day_end).select(
            F.date_add(F.to_date("s"), 1).alias("day"),
            day_end.alias("s"),
            F.col("e"),
        )
    )
    pts = seg.select("day", F.col("s").alias("t"), F.lit(1).alias("d")).unionAll(
        seg.select("day", F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    w = (
        Window.partitionBy("day")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sw = pts.select("day", F.sum("d").over(w).alias("conc"))
    return sw.groupBy("day").agg(
        F.max("conc").cast("bigint").alias("peak_concurrency")
    )


@query(
    "sql_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE walk(part, node, depth) AS (
      SELECT p_partkey, p_partkey, 0 FROM part
      UNION ALL
      SELECT part, node // 2, depth + 1 FROM walk WHERE node > 1
    ),
    depths AS (SELECT part, max(depth) AS root_depth
               FROM walk GROUP BY part)
    SELECT root_depth, count(*) AS n_parts
    FROM depths GROUP BY root_depth
    """,
)
def q_sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE): walk each part up a
    binary ancestor chain (node -> node div 2) to the root and
    histogram the depths — the BOM-explosion / org-hierarchy shape
    that needed iterative driver loops before Spark 4. Iterations are
    internal unions driven until the frontier empties; per-round work
    is one hash aggregate, bounded by log2(max key) rounds here. The
    recursion-row guard is sized to the data: total walk rows are
    exactly |parts| * (floor(log2(max partkey)) + 1) + |parts|, which
    passes Spark's 1M default at fixture scale but not at the
    30x/100x grow smokes (block-shifted keys deepen the chain to ~35
    and parts grow with the facts). The guard is raised to 2x that
    measured need — NOT a blanket 1e9 (advice r06: that silently
    removed the runaway-recursion net for every later query on the
    shared session) — and never lowered below a value another query
    already requested. No try/finally restore: the returned DataFrame
    is lazy, so restoring before the caller executes it would re-trip
    the 1M default mid-walk."""
    _register_views(spark, sf_dir, "part")
    import math

    stats = spark.table("part").agg(
        F.count(F.lit(1)).alias("n"), F.max("p_partkey").alias("mx")
    ).first()
    depth = int(math.log2(max(int(stats["mx"] or 1), 1))) + 2
    need = 2 * int(stats["n"] or 0) * depth + 1_000_000
    cur = int(spark.conf.get("spark.sql.cteRecursionRowLimit", "1000000"))
    if need > cur:
        spark.conf.set("spark.sql.cteRecursionRowLimit", str(need))
    return spark.sql(
        """
        WITH RECURSIVE walk(part, node, depth) AS (
          SELECT p_partkey, p_partkey, 0 FROM part
          UNION ALL
          SELECT part, node DIV 2, depth + 1 FROM walk WHERE node > 1
        ),
        depths AS (SELECT part, max(depth) AS root_depth
                   FROM walk GROUP BY part)
        SELECT root_depth, count(*) AS n_parts
        FROM depths GROUP BY root_depth
        """
    )


@query(
    "dq_expectations",
    oracle="""
    SELECT 'orders_totalprice_positive' AS rule,
           count(*) FILTER (WHERE o_totalprice <= 0) AS n_violations,
           count(*) AS n_checked
    FROM orders
    UNION ALL
    SELECT 'orders_status_domain',
           count(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')),
           count(*)
    FROM orders
    UNION ALL
    SELECT 'lineitem_quantity_range',
           count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50),
           count(*)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_discount_range',
           count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1),
           count(*)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           (SELECT count(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem
             WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))),
           (SELECT count(DISTINCT l_orderkey) FROM lineitem)
    """,
)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (deequ-style, engine-
    native): domain, range, and referential-integrity rules evaluated
    as conditional aggregates — ONE pass per table for all row-level
    rules (no per-rule scans), plus one broadcast anti-join for the
    foreign-key rule. The violations table is the pipeline gate a
    100 TB ingest runs before publishing a partition."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    orders_rules = o.agg(
        F.lit("orders_totalprice_positive").alias("rule"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("n_violations"),
        F.count(F.lit(1)).alias("n_checked"),
    ).unionByName(
        o.agg(
            F.lit("orders_status_domain").alias("rule"),
            F.sum(
                (~F.col("o_orderstatus").isin("O", "F", "P")).cast("long")
            ).alias("n_violations"),
            F.count(F.lit(1)).alias("n_checked"),
        )
    )
    li_rules = li.agg(
        F.lit("lineitem_quantity_range").alias("rule"),
        F.sum(
            ((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).cast("long")
        ).alias("n_violations"),
        F.count(F.lit(1)).alias("n_checked"),
    ).unionByName(
        li.agg(
            F.lit("lineitem_discount_range").alias("rule"),
            F.sum(
                ((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).cast(
                    "long"
                )
            ).alias("n_violations"),
            F.count(F.lit(1)).alias("n_checked"),
        )
    )
    # the FK probe shuffles on orderkey (both sides are fact-sized at
    # scale — broadcasting the dim would lie about the 100 TB shape);
    # the distinct and the anti-join share the same key partitioning
    lkeys = li.select("l_orderkey").distinct()
    orphans = lkeys.join(
        o.select("o_orderkey"),
        lkeys.l_orderkey == o.o_orderkey,
        "left_anti",
    )
    fk_rule = orphans.agg(
        F.lit("lineitem_orphan_orderkey").alias("rule"),
        F.count(F.lit(1)).alias("n_violations"),
    ).crossJoin(
        lkeys.agg(F.count(F.lit(1)).alias("n_checked"))
    )
    return orders_rules.unionByName(li_rules).unionByName(fk_rule)


@query(
    "length_bucket_batching",
    oracle="""
    WITH b AS (
      SELECT doc_id, n_chars,
             ntile(8) OVER (ORDER BY n_chars, doc_id) AS bucket
      FROM documents)
    SELECT bucket, count(*) AS n_docs,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM b GROUP BY bucket
    """,
)
def q_length_bucket_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-quantile bucketing for training-batch packing: ntile(8)
    over (n_chars, doc_id) groups similar-length documents so padded
    batches waste minimal compute — the classic seq-len bucketing
    trick. Round 4: the ntile comes from
    operators/ranks.with_global_ntile — a range exchange plus
    per-partition offsets, NEVER a single-partition window — so the
    identical per-row labeling runs on 100 TB of rows; the ANSI tile
    formula matches the oracle's ntile exactly."""
    from etl_pyspark_spark.operators.ranks import with_global_ntile

    docs = read_table(spark, sf_dir, "documents")
    b = with_global_ntile(
        docs.select("doc_id", "n_chars"),
        ["n_chars", "doc_id"],
        8,
        tile_col="bucket",
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "text_normalize_clean",
    oracle=f"""
    SELECT doc_id,
           array_to_string(
             list_filter({_WS_TOKENS_SQL.format(col='lower(text)')},
                         t -> NOT list_contains(
                           ['the','and','of','to','a','in','is','that'], t)),
             ' ') AS clean_text
    FROM documents
    """,
)
def q_text_normalize_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization pass every corpus pipeline starts with: lowercase,
    whitespace-tokenize, strip (en) stopwords, re-join — pure array
    expressions, zero shuffle, scan-speed. The output column feeds
    shingling/fingerprinting so dedup keys ignore case and stopword
    noise."""
    from etl_pyspark_spark.functions import text as T
    from etl_pyspark_spark.sources.io import spread

    stops = F.array(
        *[F.lit(s) for s in T.LANG_STOPWORDS["en"]]
    )
    docs = spread(read_table(spark, sf_dir, "documents"))
    toks = T.ws_tokens(F.lower(F.col("text")))
    return docs.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.filter(toks, lambda t: ~F.array_contains(stops, t)),
        ).alias("clean_text"),
    )


@query(
    "train_test_split_assign",
    oracle="""
    WITH assigned AS (
      SELECT doc_id, source,
             ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                             1, 15))::BIGINT % 100 AS bucket
      FROM documents)
    SELECT source,
           count(*) FILTER (WHERE bucket < 95) AS n_train,
           count(*) FILTER (WHERE bucket >= 95) AS n_test
    FROM assigned GROUP BY source
    """,
)
def q_train_test_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 95/5 train/test split: the salted portable hash of
    the stable doc key picks the side, so membership never changes
    across runs, machines, or engines — the property a held-out set
    must have (a random() split silently leaks test docs into training
    on every re-run). Per-source counts verify the rate lands evenly;
    one narrow pass, one tiny aggregate."""
    from etl_pyspark_spark.functions import text as T

    docs = read_table(spark, sf_dir, "documents")
    bucket = (
        T.portable_hash60(
            F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
        )
        % 100
    )
    assigned = docs.select("doc_id", "source", bucket.alias("bucket"))
    return assigned.groupBy("source").agg(
        F.sum((F.col("bucket") < 95).cast("long")).alias("n_train"),
        F.sum((F.col("bucket") >= 95).cast("long")).alias("n_test"),
    )


@query(
    "event_dedup_time_window",
    oracle="""
    WITH seq AS (
      SELECT event_id, user_id, event_type, ts,
             lag(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events)
    SELECT event_id, user_id, event_type
    FROM seq
    WHERE prev_ts IS NULL OR ts - prev_ts > INTERVAL 60 SECOND
    """,
)
def q_event_dedup_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debounce: drop an event when the SAME (user, type)
    fired within the previous 60 seconds (lag-based throttle — the
    standard window-expressible form; exact keep-from-last-EMITTED
    needs sequential state, which is the streaming
    dropDuplicatesWithinWatermark path). One window shuffle keyed by
    (user, type)."""
    from pyspark.sql.window import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag("ts").over(w)
    )
    return (
        ev.select("event_id", "user_id", "event_type", "ts",
                  gap_us.alias("gap_us"))
        .where(F.col("gap_us").isNull() | (F.col("gap_us") > 60_000_000))
        .select("event_id", "user_id", "event_type")
    )


@query(
    "shard_assignment",
    oracle="""
    WITH s AS (
      SELECT doc_id, n_chars,
             ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)),
                             1, 15))::BIGINT % 8 AS shard_id
      FROM documents)
    SELECT shard_id, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY shard_id
    """,
)
def q_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard assignment: hash docs into 8 shards and report
    the balance (docs + chars per shard) — the pre-write check before
    a partitioned export feeds N data-loader workers. Hash placement
    gives even shards without a shuffle-heavy sort; the same shard_id
    expression would drive ``partitionBy`` on the export write."""
    from etl_pyspark_spark.functions import text as T

    docs = read_table(spark, sf_dir, "documents")
    shard = (
        T.portable_hash60(
            F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))
        )
        % 8
    )
    return (
        docs.select(shard.alias("shard_id"), "n_chars")
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "vocab_oov_rate",
    oracle=f"""
    WITH toks AS (SELECT doc_id,
                         unnest({_WS_TOKENS_SQL.format(col='text')}) AS tok
                  FROM documents),
    vocab AS (SELECT tok FROM toks GROUP BY tok
              ORDER BY count(*) DESC, tok LIMIT 20),
    flagged AS (SELECT t.doc_id,
                       (v.tok IS NULL) AS oov
                FROM toks t LEFT JOIN vocab v ON t.tok = v.tok)
    SELECT doc_id,
           count(*) AS n_tokens,
           count(*) FILTER (WHERE oov) AS n_oov,
           {sql_pround("count(*) FILTER (WHERE oov) * 1.0 / count(*)")}
             AS oov_rate
    FROM flagged GROUP BY doc_id
    """,
)
def q_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage: build the top-20 corpus vocabulary (count
    desc, token tiebreak — deterministic), then score every document's
    out-of-vocabulary token rate — the tokenizer-fit signal a training
    pipeline tracks when corpus and tokenizer drift apart. The vocab
    is aggregated output (tiny) so the membership probe broadcasts;
    the corpus-side explode never shuffles except the final per-doc
    count, which reuses the doc_id grouping."""
    from etl_pyspark_spark.functions import text as T
    from etl_pyspark_spark.sources.io import spread

    docs = spread(read_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(T.ws_tokens(F.col("text"))).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(20)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    flagged = toks.join(F.broadcast(vocab), "tok", "left")
    oov = F.col("in_vocab").isNull()
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(oov.cast("long")).alias("n_oov"),
        pround(
            F.sum(oov.cast("long")).cast("double") / F.count(F.lit(1)), 6
        ).alias("oov_rate"),
    )


@query(
    "dedup_incremental_ingest",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             ('0x' || substr(md5(regexp_replace(lower(trim(text)),
                                                ' +', ' ', 'g')),
                             1, 15))::BIGINT AS fingerprint
      FROM documents),
    hist AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id < 250),
    batch AS (SELECT * FROM fp WHERE doc_id >= 250
              QUALIFY row_number() OVER (PARTITION BY fingerprint
                                         ORDER BY doc_id) = 1)
    SELECT b.doc_id, b.fingerprint
    FROM batch b WHERE b.fingerprint NOT IN
      (SELECT fingerprint FROM hist)
    """,
)
def q_dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: a new batch (doc_id >= 250) dedupes
    within itself (keep lowest doc_id per fingerprint) and then
    anti-joins against the HISTORICAL accepted fingerprints (doc_id <
    250 stands in for the lake's fingerprint table). This is the
    every-day shape of production dedup at 100 TB: the history side is
    a narrow (fingerprint) table read from the lake, the join is keyed
    by the 60-bit fingerprint, and no document text crosses the
    shuffle — only hashes."""
    from pyspark.sql.window import Window

    from etl_pyspark_spark.functions import text as T

    docs = read_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", T.doc_fingerprint(F.col("text")).alias("fingerprint")
    )
    hist = fp.where(F.col("doc_id") < 250).select("fingerprint").distinct()
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    batch = (
        fp.where(F.col("doc_id") >= 250)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    return batch.join(hist, "fingerprint", "left_anti").select(
        "doc_id", "fingerprint"
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH e AS (SELECT * FROM events
               WHERE ts < TIMESTAMP '2024-01-02 00:00:00'),
    u AS (SELECT DISTINCT user_id FROM e),
    v AS (SELECT user_id, min(ts) AS t FROM e
          WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e2.user_id, min(e2.ts) AS t FROM e e2
          JOIN v ON e2.user_id = v.user_id AND e2.ts > v.t
          WHERE e2.event_type = 'click' GROUP BY 1),
    p AS (SELECT e2.user_id, min(e2.ts) AS t FROM e e2
          JOIN c ON e2.user_id = c.user_id AND e2.ts > c.t
          WHERE e2.event_type = 'purchase' GROUP BY 1)
    SELECT u.user_id,
           (v.user_id IS NOT NULL) AS reached_view,
           (c.user_id IS NOT NULL) AS reached_click,
           (p.user_id IS NOT NULL) AS reached_purchase
    FROM u LEFT JOIN v USING (user_id)
           LEFT JOIN c USING (user_id)
           LEFT JOIN p USING (user_id)
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view -> click -> purchase within day
    one): each stage's first-event time must follow the previous
    stage's. Three stage aggregations keyed by user_id share one
    partitioning, and every per-stage table is orders of magnitude
    smaller than the event log — the joins broadcast. The classic
    product-analytics query, expressed so the event scan happens
    once per stage with pushed predicates."""
    ev = read_table(spark, sf_dir, "events").where(
        F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp")
    )
    users = ev.select("user_id").distinct()
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_t"))
    )
    c = (
        ev.alias("e")
        .join(v, "user_id")
        .where((F.col("event_type") == "click") & (F.col("ts") > F.col("v_t")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_t"))
    )
    p = (
        ev.alias("e")
        .join(c, "user_id")
        .where(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("c_t"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_t"))
    )
    return (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.col("v_t").isNotNull().alias("reached_view"),
            F.col("c_t").isNotNull().alias("reached_click"),
            F.col("p_t").isNotNull().alias("reached_purchase"),
        )
    )


@query(
    "cohort_retention",
    oracle="""
    WITH f AS (SELECT user_id,
                      CAST(floor(epoch(min(ts)) / 604800) AS BIGINT) AS cw
               FROM events GROUP BY 1),
    a AS (SELECT DISTINCT user_id,
                 CAST(floor(epoch(ts) / 604800) AS BIGINT) AS w
          FROM events)
    SELECT f.cw AS cohort_week, a.w - f.cw AS week_offset,
           count(*) AS n_users
    FROM f JOIN a USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week,
    counted in every later week they stayed active. Two aggregations
    keyed by user_id reuse one partitioning; the per-user summary
    tables are tiny next to the event log, so the cohort join
    broadcasts. At 100 TB the event scan is the only heavy pass."""
    ev = read_table(spark, sf_dir, "events")
    week = lambda col: F.floor(F.unix_timestamp(col) / 604800).cast("bigint")
    first = ev.groupBy("user_id").agg(week(F.min("ts")).alias("cohort_week"))
    active = ev.select(
        "user_id", week(F.col("ts")).alias("w")
    ).distinct()
    return (
        first.join(active, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("w") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "feature_hashing_vectorize",
    oracle="""
    WITH toks AS (SELECT doc_id,
                         unnest(list_filter(string_split(text, ' '),
                                            x -> x <> '')) AS tok
                  FROM documents),
    b AS (SELECT doc_id,
                 ('0x' || substr(md5(tok), 1, 15))::BIGINT % 32 AS bucket,
                 count(*) AS cnt
          FROM toks GROUP BY doc_id, bucket)
    SELECT doc_id,
           string_agg(bucket || ':' || cnt, ',' ORDER BY bucket)
             AS features
    FROM b GROUP BY doc_id
    """,
)
def q_feature_hashing_vectorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the hashing trick): tokens hash into 32
    buckets, per-doc bucket counts form a fixed-width sparse vector —
    vocabulary-free featurization, the property that matters at
    100 TB where a global vocabulary is itself a big-data problem.
    Serialized as a canonical 'bucket:count' string so the sparse
    vector is hash-comparable across engines. Explode -> two
    aggregations on the same doc_id partitioning."""
    from etl_pyspark_spark.functions import text as T
    from etl_pyspark_spark.sources.io import spread

    docs = spread(read_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(T.ws_tokens(F.col("text"))).alias("tok")
    )
    b = (
        toks.select(
            "doc_id", (T.portable_hash60(F.col("tok")) % 32).alias("bucket")
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return b.groupBy("doc_id").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("bucket", "cnt"))
                ),
                lambda s: F.concat_ws(
                    ":", s["bucket"].cast("string"), s["cnt"].cast("string")
                ),
            ),
        ).alias("features")
    )


@query(
    "pii_scrub",
    oracle="""
    SELECT event_id,
           regexp_replace(props, '[0-9]+', '#', 'g') AS scrubbed,
           len(regexp_extract_all(props, '[0-9]+')) AS n_digit_runs
    FROM events
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style redaction pass: mask digit runs in the raw payload
    and count the redactions (the audit signal). Portable regex only
    ([0-9]+ means the same in Java regex and DuckDB's RE2); a real
    deployment swaps in the email/phone/SSN pattern set — the plan
    shape (scan -> regexp map, zero shuffles) is what matters at
    100 TB."""
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_replace(F.col("props"), "[0-9]+", "#").alias("scrubbed"),
        F.size(
            F.regexp_extract_all(F.col("props"), F.lit("[0-9]+"), 0)
        ).alias("n_digit_runs"),
    )


@query(
    "text_language_id",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang AS lang_meta,
        {_STOP_HITS_SQL.format(col='text', stops=_sql_str_list(['the','and','of','to','a','in','is','that']))} AS sc_en,
        {_STOP_HITS_SQL.format(col='text', stops=_sql_str_list(['der','die','das','und','ist','nicht','ein','zu']))} AS sc_de,
        {_STOP_HITS_SQL.format(col='text', stops=_sql_str_list(['el','la','de','que','y','en','un','es']))} AS sc_es,
        {_STOP_HITS_SQL.format(col='text', stops=_sql_str_list(['le','la','et','les','des','un','une','est']))} AS sc_fr
      FROM documents)
    SELECT doc_id, lang_meta,
           CASE WHEN sc_en = greatest(sc_en, sc_de, sc_es, sc_fr) AND sc_en > 0 THEN 'en'
                WHEN sc_de = greatest(sc_en, sc_de, sc_es, sc_fr) AND sc_de > 0 THEN 'de'
                WHEN sc_es = greatest(sc_en, sc_de, sc_es, sc_fr) AND sc_es > 0 THEN 'es'
                WHEN sc_fr = greatest(sc_en, sc_de, sc_es, sc_fr) AND sc_fr > 0 THEN 'fr'
                ELSE 'und' END AS lang_pred,
           sc_en, sc_de, sc_es, sc_fr
    FROM s
    """,
)
def q_text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-voting language ID (n-gram-free heuristic; ties resolve
    en > de > es > fr)."""
    from etl_pyspark_spark.functions import text as T
    from etl_pyspark_spark.sources.io import spread

    docs = spread(read_table(spark, sf_dir, "documents"))
    staged = docs.select(
        "doc_id",
        "lang",
        "text",
        T.ws_tokens(F.lower(F.col("text"))).alias("__ltoks"),
    )
    c = F.col("text")
    scores = T.language_scores(c, ltoks=F.col("__ltoks"))
    return staged.select(
        "doc_id",
        F.col("lang").alias("lang_meta"),
        T.language_id(c, ltoks=F.col("__ltoks")).alias("lang_pred"),
        scores["en"].alias("sc_en"),
        scores["de"].alias("sc_de"),
        scores["es"].alias("sc_es"),
        scores["fr"].alias("sc_fr"),
    )


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           ('0x' || substr(md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')),
                           1, 15))::BIGINT AS fingerprint
    FROM documents
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable 60-bit md5 fingerprint of normalized text (exact-dedup
    key; identical integer in Spark, DuckDB, Python)."""
    from etl_pyspark_spark.functions import text as T

    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.doc_fingerprint(F.col("text")).alias("fingerprint")
    )


