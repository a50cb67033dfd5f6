"""Custom Python DataSource (Spark 4 DataSource API): synthetic
document generator.

The reference's only "connector" is an HTTP fetch + manual row-range
slicing staged through the filesystem (parquet-slicer-v1.0/app/
parquet_slicer.py:24-58). This module re-expresses that idea as a
first-class pluggable Spark source: the engine declares a schema and a
partition plan, and each TASK generates (or in a real connector,
fetches) only its own split — no driver-side download, no intermediate
files, no size limit.

The generator is a deterministic 64-bit LCG over the row id, so the
source's full output is reproducible in ANSI SQL (``generate_series``
+ identical modular arithmetic) and therefore DuckDB-oracle-checkable
end-to-end — connector plumbing verified by value hash, not just row
counts.
"""

from __future__ import annotations

#: vocabulary the LCG samples from; index arithmetic is pure modular
#: math so both engines pick identical words.
VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
    "golf", "hotel", "india", "juliet", "kilo", "lima",
]

#: Lehmer/MINSTD constants: 48271 * (2^31-1) ~ 1.0e14 stays far below
#: int64, so the same expression runs overflow-free under Spark ANSI
#: mode, DuckDB's checked arithmetic, and plain Python.
_M = 2**31 - 1
_A = 48271
_C = 11
WORDS_PER_DOC = 5


def lcg_word_index(doc_id: int, j: int) -> int:
    """Word index for position j of doc doc_id (shared math)."""
    x = (_A * (doc_id * WORDS_PER_DOC + j) + _C) % _M
    return x % len(VOCAB)


def sql_docgen_cte(n_docs: int, name: str = "gen") -> str:
    """DuckDB CTE replaying the generator: ``(doc_id, text)``."""
    word = (
        f"VOCAB[1 + CAST((({_A} * (i * {WORDS_PER_DOC} + {{j}}) + {_C}) "
        f"% {_M}) % {len(VOCAB)} AS INT)]"
    )
    words = ", ".join(word.format(j=j) for j in range(WORDS_PER_DOC))
    vocab = "[" + ", ".join(f"'{w}'" for w in VOCAB) + "]"
    return (
        f"{name} AS (SELECT i AS doc_id, "
        f"concat_ws(' ', {words}) AS text "
        f"FROM (SELECT {vocab} AS VOCAB), "
        f"generate_series(0, {n_docs - 1}) AS g(i))"
    )


def register_docgen(spark) -> bool:
    """Register the ``docgen`` Python DataSource; False if this Spark
    build lacks the Python DataSource API (pyspark < 4)."""
    try:
        from pyspark.sql.datasource import (
            DataSource,
            DataSourceReader,
            InputPartition,
        )
    except ImportError:  # pragma: no cover - Spark 4 everywhere here
        return False

    class _Split(InputPartition):
        def __init__(self, start: int, end: int):
            self.start, self.end = start, end

    class _DocGenReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 1000))
            self.num_partitions = int(options.get("numpartitions", 8))

        def partitions(self):
            # even row-range splits — the slicer's chunking, planned
            # by the source instead of materialized as files
            per = -(-self.n // self.num_partitions)
            return [
                _Split(lo, min(lo + per, self.n))
                for lo in range(0, self.n, per)
            ]

        def read(self, part):
            # one Arrow RecordBatch per split (vectorized LCG), not
            # per-row tuples: batch transfer is the scale pattern for
            # a Python connector — pickling cost per BATCH, not row
            import numpy as np
            import pyarrow as pa

            ids = np.arange(part.start, part.end, dtype=np.int64)
            vocab = np.asarray(VOCAB)
            cols = [
                vocab[(_A * (ids * WORDS_PER_DOC + j) + _C) % _M % len(VOCAB)]
                for j in range(WORDS_PER_DOC)
            ]
            text = cols[0]
            for c in cols[1:]:
                text = np.char.add(np.char.add(text, " "), c)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(text.astype(object))],
                names=["doc_id", "text"],
            )

    try:
        from pyspark.sql.datasource import SimpleDataSourceStreamReader
    except ImportError:  # pragma: no cover
        SimpleDataSourceStreamReader = None

    if SimpleDataSourceStreamReader is not None:

        class _DocGenStreamReader(SimpleDataSourceStreamReader):
            """Micro-batch reader: the 'remote feed' is the same LCG
            document space consumed ``batchrows`` docs per batch up to
            ``n``; offsets are plain row positions, so restarts resume
            exactly (the checkpoint stores the committed offset)."""

            def __init__(self, options):
                self.n = int(options.get("n", 1000))
                self.batch_rows = int(options.get("batchrows", 250))

            def initialOffset(self):
                return {"pos": 0}

            def latestOffset(self):
                # poll: advance by one batch until the feed is drained
                return {"pos": self.n}

            def read(self, start):
                pos = start["pos"]
                end = min(pos + self.batch_rows, self.n)
                # a list ITERATOR: Spark pickles the prefetched rows
                # for exactly-once replay (generators can't pickle) and
                # calls next() on it when the feed is drained (a bare
                # list fails that check)
                return (iter(self._rows(pos, end)), {"pos": end})

            def readBetweenOffsets(self, start, end):
                return self._rows(start["pos"], end["pos"])

            def _rows(self, lo, hi):
                return [
                    (
                        i,
                        " ".join(
                            VOCAB[lcg_word_index(i, j)]
                            for j in range(WORDS_PER_DOC)
                        ),
                    )
                    for i in range(lo, hi)
                ]

    class DocGenDataSource(DataSource):
        @classmethod
        def name(cls):
            return "docgen"

        def schema(self):
            return "doc_id bigint, text string"

        def reader(self, schema):
            return _DocGenReader(self.options)

        def simpleStreamReader(self, schema):
            if SimpleDataSourceStreamReader is None:  # pragma: no cover
                raise NotImplementedError("needs pyspark >= 4")
            return _DocGenStreamReader(self.options)

    spark.dataSource.register(DocGenDataSource)
    return True


def register_jsonl_sink(spark) -> bool:
    """Register the ``jsonlsink`` Python DataSource WRITER (Spark 4
    DataSource API, write path) — the sink half of the connector
    story: each TASK serializes its partition to one JSON-lines file
    and returns a commit message; the DRIVER finalizes by writing a
    manifest listing exactly the committed files (the standard
    two-phase commit that makes a distributed write all-or-nothing:
    readers trust the manifest, never the directory listing, so a
    failed/speculative task's orphan file is invisible).

    Local-FS paths are correct in local mode only; on a real cluster
    each task must target shared storage (object store / DFS) for the
    driver's manifest to reference readable files — the commit
    protocol (task tmp+rename, driver manifest) is the portable part
    and is exactly how object-store committers work.

    Returns False (and the registry entry self-skips) on pyspark < 4."""
    try:
        from pyspark.sql.datasource import (
            DataSource,
            DataSourceWriter,
            WriterCommitMessage,
        )
    except ImportError:  # pragma: no cover - pyspark < 4
        return False

    import json
    import os
    from dataclasses import dataclass

    @dataclass
    class _FileMsg(WriterCommitMessage):
        path: str
        n_rows: int
        partition_id: int

    class _JsonlWriter(DataSourceWriter):
        def __init__(self, options):
            self.path = options["path"]

        def write(self, iterator):
            from pyspark import TaskContext

            ctx = TaskContext.get()
            pid = ctx.partitionId()
            att = ctx.taskAttemptId()
            os.makedirs(self.path, exist_ok=True)
            # ATTEMPT-unique names end to end: a zombie/speculative
            # attempt writing `final + ".tmp"` could interleave bytes
            # into another attempt's tmp and then os.replace over an
            # already-committed file. With the attempt id in both the
            # tmp and the final name, attempts never share a path; the
            # driver's manifest picks exactly one winner per partition.
            final = os.path.join(
                self.path, f"part-{pid:05d}-{att}.jsonl"
            )
            tmp = final + ".tmp"
            n = 0
            with open(tmp, "w") as fh:
                for row in iterator:
                    fh.write(json.dumps(row.asDict(), sort_keys=True))
                    fh.write("\n")
                    n += 1
            os.replace(tmp, final)
            return _FileMsg(path=final, n_rows=n, partition_id=pid)

        def commit(self, messages):
            # One winner per partition: duplicate commit messages for a
            # partition (speculative attempts both reporting success)
            # must not double-list files or double-count rows. First
            # message per partition wins; losers' files are removed.
            by_pid: dict[int, _FileMsg] = {}
            for m in messages:
                if m.partition_id in by_pid and m.path != by_pid[m.partition_id].path:
                    try:
                        os.remove(m.path)
                    except OSError:
                        pass
                else:
                    by_pid[m.partition_id] = m
            winners = by_pid.values()
            manifest = {
                "files": sorted(m.path for m in winners),
                "n_rows": sum(m.n_rows for m in winners),
            }
            tmp = os.path.join(self.path, "_MANIFEST.tmp")
            with open(tmp, "w") as fh:
                json.dump(manifest, fh)
            os.replace(tmp, os.path.join(self.path, "_MANIFEST"))

        def abort(self, messages):  # pragma: no cover - failure path
            for m in messages or []:
                try:
                    os.remove(m.path)
                except OSError:
                    pass

    class JsonlSinkDataSource(DataSource):
        @classmethod
        def name(cls):
            return "jsonlsink"

        def writer(self, schema, overwrite):
            return _JsonlWriter(self.options)

    spark.dataSource.register(JsonlSinkDataSource)
    return True
