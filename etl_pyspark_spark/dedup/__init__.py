from etl_pyspark_spark.dedup.exact import exact_dedup
from etl_pyspark_spark.dedup.minhash import (
    minhash_candidate_pairs,
    minhash_signatures,
    shingles,
)
from etl_pyspark_spark.dedup.simhash import simhash_pairs, simhash_signature

__all__ = [
    "exact_dedup",
    "minhash_candidate_pairs",
    "minhash_signatures",
    "shingles",
    "simhash_pairs",
    "simhash_signature",
]
