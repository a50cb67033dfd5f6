from etl_pyspark_spark.dedup.exact import exact_dedup
from etl_pyspark_spark.dedup.minhash import (
    minhash_candidate_pairs,
    minhash_signatures,
    shingles,
)
from etl_pyspark_spark.dedup.ngram import ngram_jaccard_pairs
from etl_pyspark_spark.dedup.simhash import simhash, simhash_pairs

__all__ = [
    "exact_dedup",
    "minhash_candidate_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "shingles",
    "simhash",
    "simhash_pairs",
]
