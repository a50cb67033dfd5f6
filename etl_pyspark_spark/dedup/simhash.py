"""SimHash near-duplicate fingerprints (Charikar 2002, as deployed in
Manku/Jain/Sarma, WWW'07).

32-bit SimHash over whitespace tokens (with multiplicity): bit *i* of
the fingerprint is 1 iff the sum of +-1 votes of bit *i* of each
token's portable 60-bit hash is positive. Near-duplicates are pairs
within a small Hamming distance, found at scale by the WWW'07 trick:
split the fingerprint into 4 byte-bands and self-join on band
equality, verifying candidates by ``bit_count(xor)``.

Recall contract (exact): the output is *band-sharing pairs with
Hamming <= MAX_HAMMING (6)*. By pigeonhole over 4 bands the candidate
set is COMPLETE only for Hamming <= 3 (4+ differing bits can touch
all 4 bytes); pairs at distance 4-6 are emitted iff their differing
bits happen to leave some byte untouched. Engine and oracle apply the
identical band rule, so they agree row-for-row; if true <= 6
completeness is ever needed, split into 7+ bands (d+1 bands pigeonhole
a shared band for Hamming <= d; WWW'07 composes block permutations
for the same reason).

Everything is integer arithmetic on md5-derived hashes — zero
randomness, so the DuckDB oracle replays it bit-exactly (SQL
generators below). One explode + one 32-aggregate groupBy per corpus;
the pair join shuffles only (band, byte) keys — the 100 TB shape.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_pyspark_spark.functions.text import portable_hash60, ws_tokens

BITS = 32
BAND_BYTES = 4
MAX_HAMMING = 6


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash) — one 32-bit fingerprint per document (docs with
    zero tokens get fingerprint 0 via the left join)."""
    from etl_pyspark_spark.sources.io import spread

    # hash staged as a projected column: all 32 vote expressions
    # reference it, and md5 must run once per token, not once per bit
    toks = spread(df).select(
        F.col(id_col), F.explode(ws_tokens(F.col(text_col))).alias("tok")
    ).select(F.col(id_col), portable_hash60(F.col("tok")).alias("h"))
    h = F.col("h")
    votes = [
        F.sum(
            F.when((F.shiftright(h, i).bitwiseAND(F.lit(1))) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(BITS)
    ]
    sums = toks.groupBy(id_col).agg(*votes)
    fp = reduce(
        lambda acc, i: acc
        + F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0)),
        range(BITS),
        F.lit(0),
    )
    fingerprints = sums.select(F.col(id_col), fp.cast("bigint").alias("simhash"))
    return (
        df.select(id_col)
        .join(fingerprints, id_col, "left")
        .select(F.col(id_col), F.coalesce("simhash", F.lit(0)).alias("simhash"))
    )


def simhash_pairs(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id_a < id_b, hamming) pairs sharing a byte band with Hamming
    distance <= 6 — same output as the naive all-docs band self-join,
    restructured around DISTINCT fingerprints so candidate work scales
    with the fingerprint population, not the document count squared:

    1. identical fingerprints (hamming 0) come from an equality
       self-join on the full 32-bit code — its size IS the output's
       hamming-0 section (output-bound, no band explosion);
    2. the byte-band candidate join runs on ``SELECT DISTINCT
       simhash`` only — on low-diversity corpora the fingerprint
       space saturates while documents keep growing (the r8 native
       fixture measured the doc-level join at ~51x wall for 10x
       data), so this side stops growing with corpus size;
    3. qualifying fingerprint PAIRS expand back to doc pairs via two
       hash joins — again output-bound.

    Both restructurings are lossless (a doc pair qualifies iff its
    fingerprint pair does), so the DuckDB oracle is unchanged."""
    docs = sig.select(F.col(id_col).alias("vid"), "simhash")
    # 1. equal fingerprints: every co-located doc pair, hamming 0
    same = (
        docs.select(F.col("vid").alias("id_a"), "simhash")
        .join(docs.select(F.col("vid").alias("id_b"), "simhash"), "simhash")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    # 2. band join over DISTINCT fingerprints only
    fps = docs.select("simhash").distinct()
    bands = [
        fps.select(
            F.col("simhash"),
            F.lit(b).alias("band"),
            (F.shiftright(F.col("simhash"), 8 * b).bitwiseAND(F.lit(255))).alias(
                "byte"
            ),
        )
        for b in range(BAND_BYTES)
    ]
    exploded = reduce(lambda a, c: a.unionByName(c), bands)
    left = exploded.select(F.col("simhash").alias("sh_a"), "band", "byte")
    right = exploded.select(F.col("simhash").alias("sh_b"), "band", "byte")
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    fpairs = (
        left.join(right, ["band", "byte"])
        .where(F.col("sh_a") < F.col("sh_b"))
        .select("sh_a", "sh_b", ham.cast("int").alias("hamming"))
        .where((F.col("hamming") >= 1) & (F.col("hamming") <= MAX_HAMMING))
        .distinct()
    )
    # 3. expand fingerprint pairs back to doc pairs (output-bound)
    cross = (
        fpairs.join(
            docs.select(F.col("vid").alias("va"), F.col("simhash").alias("sh_a")),
            "sh_a",
        )
        .join(
            docs.select(F.col("vid").alias("vb"), F.col("simhash").alias("sh_b")),
            "sh_b",
        )
        .select(
            F.least("va", "vb").alias("id_a"),
            F.greatest("va", "vb").alias("id_b"),
            "hamming",
        )
    )
    return same.unionByName(cross)


# --- DuckDB oracle twins ---------------------------------------------

_SQL_TOKENS = (
    "SELECT {id_col}, t.tok FROM {table}, "
    "UNNEST(list_filter(string_split({text_col}, ' '), x -> x <> ''))"
    " AS t(tok)"
)

_SQL_H = "('0x' || substr(md5(tok), 1, 15))::BIGINT"


def sql_simhash_cte(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """CTE body computing (id, simhash) identically to :func:`simhash`."""
    votes = ", ".join(
        f"sum(CASE WHEN (({_SQL_H} >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(BITS)
    )
    return f"""
    toks AS ({_SQL_TOKENS.format(table=table, text_col=text_col, id_col=id_col)}),
    votes AS (SELECT {id_col}, {votes} FROM toks GROUP BY {id_col}),
    fp AS (SELECT {id_col}, CAST({fp} AS BIGINT) AS simhash FROM votes),
    sig AS (SELECT d.{id_col}, coalesce(fp.simhash, 0) AS simhash
            FROM (SELECT {id_col} FROM {table}) d
            LEFT JOIN fp ON d.{id_col} = fp.{id_col})
    """


def sql_simhash_pairs(id_col: str = "doc_id") -> str:
    """SELECT over the ``sig`` CTE producing (id_a, id_b, hamming)."""
    bands = " UNION ALL ".join(
        f"SELECT {id_col} AS vid, simhash, {b} AS band, "
        f"(simhash >> {8 * b}) & 255 AS byte FROM sig"
        for b in range(BAND_BYTES)
    )
    return f"""
    SELECT DISTINCT l.vid AS id_a, r.vid AS id_b,
           bit_count(xor(l.simhash, r.simhash)) AS hamming
    FROM ({bands}) l JOIN ({bands}) r
      ON l.band = r.band AND l.byte = r.byte AND l.vid < r.vid
    WHERE bit_count(xor(l.simhash, r.simhash)) <= {MAX_HAMMING}
    """
