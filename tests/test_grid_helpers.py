"""functions/grid.py: timestamp<->grid conversion and salted repartition."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from timeperiods_spark.functions.grid import (
    grid_to_timestamp,
    salted_repartition,
    timestamp_to_grid,
)


def test_timestamp_grid_roundtrip(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2020, 1, 1, 5, 30),), (dt.datetime(1969, 12, 31, 23, 59),)],
        "ts timestamp",
    )
    out = df.select(
        timestamp_to_grid("ts", "hour").alias("h"),
        grid_to_timestamp(timestamp_to_grid("ts", "hour"), "hour").alias("floor_ts"),
    ).collect()
    assert out[0]["h"] == 18262 * 24 + 5  # hours since epoch, floored
    assert out[0]["floor_ts"] == dt.datetime(2020, 1, 1, 5, 0)
    assert out[1]["h"] == -1  # pre-epoch floors toward -inf
    with pytest.raises(ValueError):
        timestamp_to_grid("ts", "fortnight")


def test_events_table_as_point_intervals(spark):
    """events.ts -> [h, h] point intervals feed the core operator."""
    from timeperiods_spark import interval_weighted_avg

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    x = ev.select(
        "event_type",
        timestamp_to_grid("ts", "day").cast("long").alias("s"),
        timestamp_to_grid("ts", "day").cast("long").alias("e"),
        F.col("value").alias("v"),
    ).dropDuplicates(["event_type", "s"])  # point intervals must not collide
    lo, hi = x.agg(F.min("s"), F.max("e")).first()
    y = x.select("event_type").distinct().crossJoin(
        spark.range(int(lo), int(hi) + 1, 7).select(
            F.col("id").alias("s"), (F.col("id") + 6).alias("e")
        )
    )
    out = interval_weighted_avg(
        x, y, ("s", "e"), ("v",), ("event_type",), required_percentage=0.0
    )
    assert out.count() == y.count()
    assert out.filter("xduration > yduration").count() == 0


def test_salted_repartition_spreads_hot_key(spark):
    from timeperiods_spark import token_table

    tok = token_table(spark, 4000).select("doc_id", "source")
    salted = salted_repartition(tok, ["source"], salt=8, num_partitions=16)
    assert salted.count() == 4000  # no rows lost
    sizes = (
        salted.withColumn("pid", F.spark_partition_id())
        .groupBy("pid").count().collect()
    )
    biggest = max(r["count"] for r in sizes)
    # src_9 holds ~50% of rows; unsalted it lands in ONE partition
    unsalted = tok.repartition(16, "source").withColumn(
        "pid", F.spark_partition_id()
    ).groupBy("pid").count().collect()
    biggest_unsalted = max(r["count"] for r in unsalted)
    assert biggest < biggest_unsalted * 0.5, (biggest, biggest_unsalted)
