"""Similarity search over embedding columns (ArrayType(FloatType)).

- :mod:`cosine` — exact dot/norm/cosine expressions + brute-force
  top-k (the correctness baseline).
- :mod:`lsh` — random-hyperplane LSH bucketing (the 100 TB scale
  path: candidates only within matching buckets).
"""
