"""Custom stateful streaming via Spark 4's ``transformWithStateInPandas``.

The successor to ``applyInPandasWithState`` (SPARK-40434 ->
SPARK-46815 "Arbitrary State API v2"): a ``StatefulProcessor`` class
with typed, composable state primitives (ValueState / ListState /
MapState), timers, and TTL — instead of one opaque tuple per key.
Here a per-user ``MapState[event_type -> count]`` maintains running
per-type counts; replaying the bounded fixture emits a final state
equal to the batch ``GROUP BY user_id, event_type`` — which is what
the registry oracle checks, so the state machinery itself is
value-verified.

Scale notes: state lives in the state store keyed by the groupBy key
(one store per shuffle partition — sized by
``stream_shuffle_partitions``); MapState entries are individually
addressable so an update touches one (type,count) entry, not a
serialized blob of the whole user history. Reference has no streaming
(SURVEY.md TL;DR); §2.9 growth surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def v2_state_available() -> bool:
    """The v2 API's state server speaks protobuf between the JVM and
    the Python worker; without ``google.protobuf`` installed the query
    fails at state-schema validation. Gate callers on this (the
    ``applyInPandasWithState`` path — registry query
    ``stream_stateful_counter`` — has no such dependency and is the
    portable default)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False

from etl_pyspark_spark.streaming.windows import (
    run_to_memory_table,
    stream_events,
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _processor():
    """Build the StatefulProcessor class lazily (import-safe on
    environments without the v2 API)."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class TypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "type_counts", "event_type string", "n bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                for etype, n in pdf["event_type"].value_counts().items():
                    prev = (
                        self._counts.getValue((etype,))[0]
                        if self._counts.containsKey((etype,))
                        else 0
                    )
                    self._counts.updateValue((etype,), (prev + int(n),))
            user = key[0]
            items = [
                (user, k[0], v[0]) for k, v in self._counts.iterator()
            ]
            yield pd.DataFrame(
                items, columns=["user_id", "event_type", "n_events"]
            )

        def close(self) -> None:
            pass

    return TypeCounts()


def per_user_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-(user, event_type) counts through MapState; final
    emission == batch GROUP BY."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    sdf = stream_events(spark, sf_dir)
    counted = (
        sdf.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_processor(),
            outputStructType=OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
    mem = run_to_memory_table(counted, spark, mode="update")
    # update mode re-emits a key's rows each batch; keep the final
    # (largest-count) emission per (user, type)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("n_events").desc()
    )
    return (
        mem.select("*", F.row_number().over(w).alias("_rk"))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )
