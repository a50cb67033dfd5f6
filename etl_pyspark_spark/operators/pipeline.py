"""The reference's flagship transform, Spark-first.

The reference's entire query capability is one fixed 9-derived-column
pipeline over NYC taxi trips (reference nyc_taxi_etl.py:50-103):
null-drop -> timestamp casts -> duration/speed/tip%/cost-per-mile with
NULL-guarded division -> airport-membership and peak-hour predicates ->
hour extraction -> string trip summary. ``taxi_transform`` reproduces
those semantics verbatim on the TLC schema; ``events_pipeline`` maps
the same operator families onto the driver's ``events`` fixture
(FIXTURES.md §B maps the columns) so it runs on the test data.

Both are a single ``select`` — one Catalyst projection instead of the
reference's nine ``withColumn`` analysis passes — and collapse to one
scan->filter->project whole-stage-codegen stage with zero shuffles, so
they scale linearly with input splits on any cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_pyspark_spark.functions.compat import pround


def _guarded_div(num: Column, den: Column) -> Column:
    """NULL (not NaN/error) when the denominator is zero.

    Pins the semantics of the reference's three guarded divisions
    (nyc_taxi_etl.py:60-63,68-71,72-75) so the DuckDB oracle hashes
    match.
    """
    return F.when(den != 0, num / den).otherwise(F.lit(None))


def taxi_transform(df: DataFrame) -> DataFrame:
    """Reference ETL transform (nyc_taxi_etl.py:50-103) on the TLC
    yellow-taxi schema (FIXTURES.md §A), as one declarative projection.

    Derived columns (types match SURVEY.md §1.2): trip_duration double
    minutes, speed_mph/tip_percentage/cost_per_mile double nullable,
    is_airport_trip/is_peak_hour boolean, pickup_hour int, trip_summary
    string.
    """
    df = df.na.drop()  # P1: drop rows with any null (nyc_taxi_etl.py:53)
    pickup = F.to_timestamp("tpep_pickup_datetime")
    dropoff = F.to_timestamp("tpep_dropoff_datetime")
    duration_min = (F.unix_timestamp(dropoff) - F.unix_timestamp(pickup)) / 60.0
    pickup_hour = F.hour(pickup)
    is_airport = F.col("PULocationID").isin(1, 2, 3) | F.col("DOLocationID").isin(
        1, 2, 3
    )
    is_peak = F.when(
        pickup_hour.between(7, 9) | pickup_hour.between(17, 19), F.lit(True)
    ).otherwise(F.lit(False))
    summary = F.concat_ws(
        " ",
        F.lit("Trip from location"),
        F.col("PULocationID").cast("string"),
        F.lit("to location"),
        F.col("DOLocationID").cast("string"),
        F.lit("with"),
        F.col("passenger_count").cast("int").cast("string"),
        F.lit("passenger(s), covering"),
        F.col("trip_distance").cast("string"),
        F.lit("miles in"),
        duration_min.cast("string"),
        F.lit("minutes."),
    )
    return df.select(
        "*",
        pickup.alias("pickup_ts"),
        dropoff.alias("dropoff_ts"),
        duration_min.alias("trip_duration"),
        _guarded_div(F.col("trip_distance"), duration_min / 60.0).alias("speed_mph"),
        is_airport.alias("is_airport_trip"),
        _guarded_div(F.col("tip_amount") * 100.0, F.col("fare_amount")).alias(
            "tip_percentage"
        ),
        _guarded_div(F.col("total_amount"), F.col("trip_distance")).alias(
            "cost_per_mile"
        ),
        pickup_hour.alias("pickup_hour"),
        is_peak.alias("is_peak_hour"),
        summary.alias("trip_summary"),
    )


def events_pipeline(df: DataFrame) -> DataFrame:
    """The flagship pipeline adapted to the ``events`` fixture.

    Column mapping (FIXTURES.md §B): ``ts`` -> pickup time, ``value`` ->
    distance/amount analogue, ``user_id``/``event_type`` -> the
    categorical membership predicates, ``event_id`` parity -> peak-hour
    analogue. Exercises every operator family the reference has: P1
    null-drop, F1/F2 timestamp math, P4 guarded division, P2 isin, P3
    between, F3 hour, F5/F6 concat_ws + casts (SURVEY.md §2.2-2.3).

    Values are rounded to 6 decimals so the DuckDB oracle's float
    arithmetic hashes identically (FIXTURES.md §C).
    """
    df = df.na.drop()
    epoch_s = F.unix_timestamp(F.col("ts"))
    minute_of_hour = F.minute(F.col("ts"))
    event_hour = F.hour(F.col("ts"))
    is_key_user = F.col("user_id").isin(1, 2, 3)
    is_peak = F.when(
        event_hour.between(7, 9) | event_hour.between(17, 19), F.lit(True)
    ).otherwise(F.lit(False))
    value_per_minute = _guarded_div(F.col("value"), minute_of_hour.cast("double"))
    summary = F.concat_ws(
        " ",
        F.lit("Event"),
        F.col("event_id").cast("string"),
        F.lit("by user"),
        F.col("user_id").cast("string"),
        F.lit("type"),
        F.col("event_type"),
        F.lit("value"),
        F.round(F.col("value"), 2).cast("string"),
    )
    return df.select(
        "event_id",
        "user_id",
        "event_type",
        pround(F.col("value"), 6).alias("value"),
        epoch_s.alias("epoch_s"),
        event_hour.alias("event_hour"),
        is_key_user.alias("is_key_user"),
        is_peak.alias("is_peak_hour"),
        pround(value_per_minute, 6).alias("value_per_minute"),
        summary.alias("event_summary"),
    )
