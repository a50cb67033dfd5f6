"""MinHash + LSH near-duplicate detection.

Classic Broder MinHash over word n-gram shingles with banded LSH
(Leskovec/Rajaraman/Ullman, *Mining of Massive Datasets* ch. 3),
expressed entirely in DataFrame operations:

1. shingle: distinct word n-grams per document (explode, no UDF)
2. hash each shingle with the portable 60-bit md5 hash, reduced
   mod ``P`` = 2^31-1
3. ``NUM_PERM`` universal-hash permutations ``(a*h + b) mod P`` with
   fixed odd constants — signature = min per permutation (single
   groupBy, 16 ``min`` aggregates)
4. band signatures into ``BANDS`` bands of ``ROWS_PER_BAND``;
   candidate pairs share any full band (self-join on the band key)
5. verify candidates with exact shingle-set Jaccard; keep pairs at or
   above the threshold

Scale shape: shuffles are keyed by shingle-hash / band-key (never by
raw text); candidate verification touches only colliding pairs, so the
O(n^2) comparison space is reduced to the LSH buckets. Every constant
is pinned so the computation is bit-reproducible in DuckDB SQL (the
registry's oracle) and at any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from etl_pyspark_spark.checkpoint import scoped_family_persist

from etl_pyspark_spark.functions.compat import pround
from etl_pyspark_spark.functions.text import portable_hash60

#: Mersenne prime 2^31 - 1; (a*h + b) stays < 2^62 — no int64 overflow
#: in either engine.
P = 2_147_483_647

NUM_PERM = 16
BANDS = 8
ROWS_PER_BAND = 2  # catch probability 1-(1-j^2)^8: j=0.5 -> 0.90, j=0.9 -> ~1


def _lcg_constants(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hashes, from a
    fixed LCG so the same literals are embedded in the oracle SQL."""
    state = seed
    out = []
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        a = (state % (P - 2)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        b = state % P
        out.append((a, b))
    return out


PERM_CONSTANTS: list[tuple[int, int]] = _lcg_constants(NUM_PERM)


def shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) rows: distinct word n-grams per document.

    Split ONCE into a projected column, then build grams from that
    column: higher-order-function lambdas get no common-subexpression
    elimination, so inlining the split re-tokenizes the text for every
    referenced element (3n times per gram; measured ~7x slower on the
    fixture corpus). Same staging rule as functions/text.
    ngrams_from_tokens."""
    from etl_pyspark_spark.sources.io import spread

    ts = F.col("__ts")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(ts) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(ts, i + j + 1) for j in range(n)]
            ),
        )
    )
    # no .distinct(): array_distinct already dedupes within the doc,
    # and a row-level distinct would add a full shuffle for nothing
    return (
        spread(df)
        .select(F.col(id_col), F.split(F.col(text_col), " ").alias("__ts"))
        .where(F.size(ts) >= n)
        .select(F.col(id_col), F.explode(grams).alias("shingle"))
    )


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One row per id with columns mh0..mh{NUM_PERM-1}."""
    h = portable_hash60(F.col("shingle")) % P
    hashed = sh.select(F.col(id_col), h.alias("h"))
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % P).alias(f"mh{i}")
        for i, (a, b) in enumerate(PERM_CONSTANTS)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def minhash_candidate_pairs(
    sig: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one LSH band.

    Band rows come from ONE ``explode`` of an inline (band, band_key)
    struct array — not a ``union`` of per-band projections. A union
    re-evaluates the upstream 16-aggregate signature groupBy once per
    branch per join side (16x at BANDS=8; measured 2x slower end-to-end
    at sf0.1); the explode evaluates it once per side.
    """
    # one row per doc with 17 ints — caching it keeps the two join
    # sides from re-running the signature aggregation
    sig = scoped_family_persist(sig)
    entries = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"mh{band * ROWS_PER_BAND + r}").cast("string")
                        for r in range(ROWS_PER_BAND)
                    ],
                ).alias("band_key"),
            )
            for band in range(BANDS)
        ]
    )
    exploded = sig.select(F.col(id_col), F.explode(entries).alias("e")).select(
        F.col(id_col), F.col("e.band").alias("band"), F.col("e.band_key").alias("band_key")
    )
    left = exploded.select(
        F.col(id_col).alias("id_a"), "band", F.col("band_key")
    )
    right = exploded.select(
        F.col(id_col).alias("id_b"), "band", F.col("band_key")
    )
    return (
        left.join(right, ["band", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# --- DuckDB oracle twins ---------------------------------------------
#
# Every stage above is deterministic integer arithmetic on md5 hashes,
# so the whole MinHash-LSH pipeline replays bit-exactly in DuckDB.
# These generators embed the same PERM_CONSTANTS literals.


def sql_shingles_cte(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> str:
    """CTEs ``toks`` + ``sh`` matching :func:`shingles` (split keeps
    empty tokens, 1-based list indexing, DISTINCT per doc)."""
    gram = " || ' ' || ".join(f"ts[i + {j}]" for j in range(n))
    return f"""
    toks AS (SELECT {id_col}, string_split({text_col}, ' ') AS ts
             FROM {table}),
    sh AS (SELECT DISTINCT {id_col}, {gram} AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - {n - 1})) AS g(i)
           WHERE len(ts) >= {n})
    """


def sql_minhash_pairs(
    id_col: str = "doc_id", threshold: float = 0.5, final_name: str | None = None
) -> str:
    """SELECT over the ``sh`` CTE producing verified near-dup pairs
    (doc_id_a, doc_id_b, jaccard) exactly like
    :func:`verified_near_duplicates`.

    With ``final_name``, the final SELECT is emitted as one more named
    CTE instead, so downstream oracles (e.g. connected components) can
    keep composing at the same WITH level."""
    from etl_pyspark_spark.functions.compat import sql_pround

    mins = ", ".join(
        f"min(({a} * h + {b}) % {P}) AS mh{i}"
        for i, (a, b) in enumerate(PERM_CONSTANTS)
    )
    bands = " UNION ALL ".join(
        f"SELECT {id_col}, {band} AS band, "
        + " || '_' || ".join(
            f"CAST(mh{band * ROWS_PER_BAND + r} AS VARCHAR)"
            for r in range(ROWS_PER_BAND)
        )
        + " AS band_key FROM sig"
        for band in range(BANDS)
    )
    jac = "CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE)"
    final = (
        f"SELECT id_a AS doc_id_a, id_b AS doc_id_b, {sql_pround(jac)} AS jaccard"
        f" FROM sized WHERE {jac} >= {threshold}"
    )
    ctes = f"""
    hashed AS (SELECT DISTINCT {id_col},
                      ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h60
               FROM sh),
    sig AS (SELECT {id_col}, {mins} FROM
            (SELECT {id_col}, h60 % {P} AS h FROM hashed) GROUP BY {id_col}),
    bands AS ({bands}),
    cand AS (SELECT DISTINCT l.{id_col} AS id_a, r.{id_col} AS id_b
             FROM bands l JOIN bands r
               ON l.band = r.band AND l.band_key = r.band_key
             WHERE l.{id_col} < r.{id_col}),
    sizes AS (SELECT {id_col}, count(*) AS n_sh FROM hashed GROUP BY {id_col}),
    inter AS (SELECT c.id_a, c.id_b, count(*) AS n_inter
              FROM cand c
              JOIN hashed a ON a.{id_col} = c.id_a
              JOIN hashed b ON b.{id_col} = c.id_b AND b.h60 = a.h60
              GROUP BY c.id_a, c.id_b),
    -- LEFT JOIN + COALESCE, not an inner join on inter: signatures run
    -- over h60 % P (P = 2^31-1, far below 2^60), so two DISTINCT h60
    -- shingle hashes can collide mod P and band two docs that share
    -- ZERO h60 shingles. The engine keeps such a candidate (jaccard 0
    -- via array_intersect); an inner join here would silently drop it
    -- and the candidate populations would diverge. Thresholded
    -- consumers are unaffected (jac = 0 never passes), but unfiltered
    -- audits (dedup_lsh_curve_audit) compare the FULL population.
    sized AS (SELECT c.id_a, c.id_b, COALESCE(i.n_inter, 0) AS n_inter,
                     na.n_sh AS n_a, nb.n_sh AS n_b
              FROM cand c
              LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
              JOIN sizes na ON na.{id_col} = c.id_a
              JOIN sizes nb ON nb.{id_col} = c.id_b)
    """
    if final_name is not None:
        return f"{ctes}, {final_name} AS ({final})"
    return f"{ctes} {final}"


def sql_ngram_jaccard_pairs(
    id_col: str = "doc_id", threshold: float = 0.5
) -> str:
    """SELECT over the ``sh`` CTE: exact inverted-index Jaccard pairs
    (twin of dedup/ngram.ngram_jaccard_pairs; same h60 join keys)."""
    from etl_pyspark_spark.functions.compat import sql_pround

    jac = "CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE)"
    return f"""
    hashed AS (SELECT DISTINCT {id_col},
                      ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h60
               FROM sh),
    sizes AS (SELECT {id_col}, count(*) AS n_sh FROM hashed GROUP BY {id_col}),
    inter AS (SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
                     count(*) AS n_inter
              FROM hashed a JOIN hashed b
                ON a.h60 = b.h60 AND a.{id_col} < b.{id_col}
              GROUP BY 1, 2),
    sized AS (SELECT i.id_a, i.id_b, i.n_inter, na.n_sh AS n_a, nb.n_sh AS n_b
              FROM inter i
              JOIN sizes na ON na.{id_col} = i.id_a
              JOIN sizes nb ON nb.{id_col} = i.id_b)
    SELECT id_a AS doc_id_a, id_b AS doc_id_b, {sql_pround(jac)} AS jaccard
    FROM sized WHERE {jac} >= {threshold}
    """


def hashed_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, h60) distinct 60-bit shingle hashes. Downstream stages
    (signatures, Jaccard) work on these hashes, never raw shingle
    strings — both engines derive identical md5 values, so hash-set
    Jaccard equals string-set Jaccard on each engine identically."""
    # per-doc uniqueness is guaranteed by shingles(); no shuffle needed
    return shingles(df, text_col, id_col, n).select(
        F.col(id_col), portable_hash60(F.col("shingle")).alias("h60")
    )


def minhash_signatures_hashed(hashed: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Signatures from pre-hashed shingles (one row per id, mh0..mhN)."""
    h = F.col("h60") % P
    aggs = [
        F.min((F.lit(a) * h + F.lit(b)) % P).alias(f"mh{i}")
        for i, (a, b) in enumerate(PERM_CONSTANTS)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def verified_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    sh: DataFrame | None = None,
    sets: DataFrame | None = None,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pairs with exact-Jaccard
    verification: (doc_id_a, doc_id_b, jaccard).

    Verification shape: each candidate pair pulls the two docs'
    *sorted hash arrays* (built once by a groupBy) and intersects them
    vectorized in numpy (``mapInPandas``) — the shingle table is never
    re-joined per candidate, so verify cost is O(candidates * doc
    shingle count), independent of corpus size.

    ``sh`` / ``sets`` accept precomputed (id, h60) shingle hashes and
    (id, hs) sorted hash-set stages (see dedup/shared.py) so a family
    of queries in one session derives them once."""
    from pyspark.sql import types as T

    if sh is None:
        sh = scoped_family_persist(hashed_shingles(df, text_col, id_col, n))
    sig = minhash_signatures_hashed(sh, id_col)
    cand = minhash_candidate_pairs(sig, id_col)

    if sets is None:
        sets = sh.groupBy(id_col).agg(
            F.sort_array(F.collect_set("h60")).alias("hs")
        )
    else:
        sets = sets.select(id_col, "hs")
    joined = (
        cand.join(sets.select(F.col(id_col).alias("id_a"), F.col("hs").alias("hs_a")), "id_a")
        .join(sets.select(F.col(id_col).alias("id_b"), F.col("hs").alias("hs_b")), "id_b")
    )

    schema = T.StructType(
        [
            T.StructField("doc_id_a", T.LongType()),
            T.StructField("doc_id_b", T.LongType()),
            T.StructField("jaccard", T.DoubleType()),
        ]
    )

    def jaccard_batches(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_a, out_b, out_j = [], [], []
            for ida, idb, hs_a, hs_b in zip(
                pdf["id_a"], pdf["id_b"], pdf["hs_a"], pdf["hs_b"]
            ):
                a = np.asarray(hs_a, dtype=np.int64)
                b = np.asarray(hs_b, dtype=np.int64)
                inter = np.intersect1d(a, b, assume_unique=True).size
                j = inter / float(a.size + b.size - inter)
                if j >= threshold:  # raw ratio, same as the oracle's WHERE
                    out_a.append(ida)
                    out_b.append(idb)
                    out_j.append(float(np.floor(j * 1e6 + 0.5) / 1e6))
            yield pd.DataFrame(
                {"doc_id_a": out_a, "doc_id_b": out_b, "jaccard": out_j}
            )

    return joined.mapInPandas(jaccard_batches, schema=schema)


def band_entries(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, band, band_key) LSH bucket entries from a signature table —
    the shared candidate-generation primitive for both self-join
    (minhash_candidate_pairs) and cross-batch (incremental) dedup.
    One explode of an inline struct array; see minhash_candidate_pairs
    for why not a per-band union."""
    entries = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"mh{band * ROWS_PER_BAND + r}").cast("string")
                        for r in range(ROWS_PER_BAND)
                    ],
                ).alias("band_key"),
            )
            for band in range(BANDS)
        ]
    )
    return sig.select(F.col(id_col), F.explode(entries).alias("e")).select(
        F.col(id_col),
        F.col("e.band").alias("band"),
        F.col("e.band_key").alias("band_key"),
    )


def sql_minhash_cross_pairs(
    new_pred: str,
    old_pred: str,
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> str:
    """SELECT over the ``sh`` CTE: incremental MinHash-LSH — new-batch
    docs (rows matching ``new_pred``) banded against the historical
    band index (``old_pred``), verified by exact Jaccard. Twin of the
    engine's band_entries cross join; emits
    (new_doc_id, dup_of, jaccard)."""
    from etl_pyspark_spark.functions.compat import sql_pround

    mins = ", ".join(
        f"min(({a} * h + {b}) % {P}) AS mh{i}"
        for i, (a, b) in enumerate(PERM_CONSTANTS)
    )
    bands = " UNION ALL ".join(
        f"SELECT {id_col}, {band} AS band, "
        + " || '_' || ".join(
            f"CAST(mh{band * ROWS_PER_BAND + r} AS VARCHAR)"
            for r in range(ROWS_PER_BAND)
        )
        + " AS band_key FROM sig"
        for band in range(BANDS)
    )
    jac = "CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE)"
    return f"""
    hashed AS (SELECT DISTINCT {id_col},
                      ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h60
               FROM sh),
    sig AS (SELECT {id_col}, {mins} FROM
            (SELECT {id_col}, h60 % {P} AS h FROM hashed) GROUP BY {id_col}),
    bands AS ({bands}),
    cand AS (SELECT DISTINCT l.{id_col} AS id_a, r.{id_col} AS id_b
             FROM (SELECT * FROM bands WHERE {new_pred}) l
             JOIN (SELECT * FROM bands WHERE {old_pred}) r
               ON l.band = r.band AND l.band_key = r.band_key),
    sizes AS (SELECT {id_col}, count(*) AS n_sh FROM hashed GROUP BY {id_col}),
    inter AS (SELECT c.id_a, c.id_b, count(*) AS n_inter
              FROM cand c
              JOIN hashed a ON a.{id_col} = c.id_a
              JOIN hashed b ON b.{id_col} = c.id_b AND b.h60 = a.h60
              GROUP BY c.id_a, c.id_b),
    sized AS (SELECT i.id_a, i.id_b, i.n_inter, na.n_sh AS n_a, nb.n_sh AS n_b
              FROM inter i
              JOIN sizes na ON na.{id_col} = i.id_a
              JOIN sizes nb ON nb.{id_col} = i.id_b)
    SELECT id_a AS new_doc_id, id_b AS dup_of, {sql_pround(jac)} AS jaccard
    FROM sized WHERE {jac} >= {threshold}
    """
