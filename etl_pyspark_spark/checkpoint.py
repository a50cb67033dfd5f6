"""Checkpoint storage policy for iterative operators.

Every iterative operator (PageRank, hash-min components, BPE rounds,
BFS hops, gap-fill sweeps...) truncates lineage with
``localCheckpoint``. Spark's default level for those blocks is
MEMORY_AND_DISK **deserialized**, which has two scale problems the
round-8 100x full-registry run hit head-on:

1. checkpoint blocks from every finished query stay in the unified
   memory region until the ContextCleaner gets to them, so a long
   session's heap fills with dead blocks, and
2. when memory pressure pushes blocks to disk, every read-back goes
   through ``BlockManager.maybeCacheDiskValuesInMemory`` — which
   re-promotes the block into the heap as deserialized Java objects.
   With 32 tasks concurrently re-promoting 100x-sized rank tables the
   80 GB heap OOMed (GCLocker retry storm -> executor OOM -> the
   SparkContext shut down mid-run).

DISK_ONLY removes both: blocks never occupy heap, read-back streams
from disk per use, and the cost at fixture scale is milliseconds. On
a real cluster this is the same judgment as writing iterative
intermediates to local SSD instead of caching them deserialized —
predictable memory beats re-read latency for lineage-truncation
blocks that are each read a handful of times.
"""

from __future__ import annotations

import os

from pyspark.storagelevel import StorageLevel

#: storage level for every localCheckpoint in the engine.
#: SPARK_GRAFT_CKPT_LEVEL=mem_disk_ser switches to SERIALIZED
#: memory+disk for A/B runs (r08 verdict #6). The round-9 A/B settled
#: it: serialized blocks ARE cheaper to re-read (100x pagerank solo:
#: 265 s vs 385 s) and sf0.1 is a wash, but a FULL-registry 100x run
#: under mem_disk_ser died of java.lang.OutOfMemoryError (GCLocker
#: retry storm) ~90 min in — serialized bytes still re-promote into
#: the unified region on every disk read-back, and 240+ queries of
#: dead-block litter fill the heap exactly like the r8 deserialized
#: OOM. DISK_ONLY is the only level with a PROVEN clean full 100x
#: run; it stays the default (measured table in BASELINE.md round 9).
DISK_CKPT = (
    StorageLevel.MEMORY_AND_DISK
    if os.environ.get("SPARK_GRAFT_CKPT_LEVEL") == "mem_disk_ser"
    else StorageLevel.DISK_ONLY
)

#: storage level for reused family-stage caches (dedup shared builds,
#: minhash signatures, shingle tables, rank spines): SERIALIZED
#: memory+disk. ``df.cache()`` defaults to MEMORY_AND_DISK_DESER,
#: whose disk read-back goes through the same
#: ``maybeCacheDiskValuesInMemory`` re-promotion that OOMed the 100x
#: run; the serialized level stores compact bytes (~3-5x smaller),
#: evicts gracefully, and never re-deserializes into the store.
FAMILY_CACHE = StorageLevel.MEMORY_AND_DISK


# --- query-scoped cache registry (round-12 session-pressure fix) -----
# A 403-query session used to leave every within-query persist()
# registered in the CacheManager forever: ~60+ live InMemoryRelations
# by the tail of a full run, each holding storage blocks AND a large
# analyzed plan that every LATER query's compilation walks during
# cache lookup. Measured effect: late-session queries ran 1.5-5x their
# solo-warm times (r11 verdict #1). These caches are strictly
# within-query reuse (two join sides, a probe + totals fold), dead the
# moment the query's action finishes — so the query() decorator drains
# them at the NEXT query's entry. Session-lifetime memo caches (the
# dedup family's shared stages, the co-purchase edge cache) never
# register here and are untouched by construction.
_SCOPED: list = []


def scoped_persist(df, level=None):
    """persist() a within-query intermediate and register it for
    release at the next query boundary (see drain_scoped_caches).

    A plan that is ALREADY cached (a session memo stage, or a
    plan-identical cache from the current query) is returned as-is and
    NOT registered: draining it would yank a cache some later consumer
    legitimately shares."""
    try:
        if df.is_cached:
            return df
    except Exception:
        pass
    _SCOPED.append(df.persist(level) if level is not None else df.persist())
    return df


def scoped_family_persist(df):
    """Postfix form of :func:`scoped_persist` at the FAMILY_CACHE
    level, for ``.transform(scoped_family_persist)`` chains."""
    return scoped_persist(df, FAMILY_CACHE)


def drain_scoped_caches() -> int:
    """Unpersist every scoped cache registered since the last drain;
    returns how many were released. Safe at any time: unpersist never
    breaks correctness (consumers recompute from lineage), and the
    engine only calls it at query boundaries where the previous
    query's action has already consumed its caches. Disable with
    SPARK_GRAFT_NO_DRAIN=1 (A/B arm)."""
    if os.environ.get("SPARK_GRAFT_NO_DRAIN") == "1":
        _SCOPED.clear()
        return 0
    n = 0
    while _SCOPED:
        df = _SCOPED.pop()
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:
            pass
    return n


def release_dead_blocks(spark) -> None:
    """Nudge the ContextCleaner at a pipeline/query boundary — the
    SAFE capture of the r9 checkpoint-litter finding.

    A long session accumulates localCheckpoint blocks from finished
    queries; they are only reclaimed when the ContextCleaner's
    reference queue sees their RDD objects become unreachable, which
    on a driver that never pressures its own old-gen can lag hundreds
    of queries (the r9 100x A/B measured 31% on a storage-level change
    that was NOT safe — mem_disk_ser OOMed the full run). Explicitly
    unpersisting checkpoint RDDs is unsafe in general: lineage is
    truncated, so a later recompute of any still-referenced descendant
    (an evicted family cache, a retried task) would find neither data
    nor a recipe. Collecting the PYTHON garbage first (dropping py4j
    proxies) and then requesting a JVM GC makes exactly the
    UNREACHABLE blocks eligible — the cleaner then unpersists them
    asynchronously, and anything still referenced survives by
    construction.

    Cost: one driver JVM GC (~0.1-1 s on a large heap); gate behind
    ``SPARK_GRAFT_GC_BOUNDARY=1`` where latency matters (bench does).
    """
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
