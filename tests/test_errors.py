"""F8 — error paths (reference tests.R:382-429)."""

from __future__ import annotations

import warnings

import pytest

from timeperiods_spark import (
    DuplicateIntervalError,
    IntervalValidationError,
    OverlapError,
    RoleValidationError,
    interval_weighted_avg,
)


@pytest.fixture()
def xy(spark):
    x = spark.createDataFrame(
        [(1, 7, 1.0), (8, 14, 2.0)], "start int, end int, v double"
    )
    y = spark.createDataFrame([(0, 13)], "start int, end int")
    return x, y


def test_partial_overlap_raises(spark, xy):
    x, y = xy
    bad = x.union(spark.createDataFrame([(2, 8, 3.0)], x.schema))
    with pytest.raises(OverlapError):
        interval_weighted_avg(bad, y, ("start", "end"), ("v",))


def test_touching_endpoint_is_overlap(spark, xy):
    # closed intervals: [1,7] and [7,9] overlap at 7 (tests.R:13-14 analog)
    x, y = xy
    bad = x.union(spark.createDataFrame([(7, 7, 3.0)], x.schema))
    with pytest.raises(OverlapError):
        interval_weighted_avg(bad, y, ("start", "end"), ("v",))


def test_skip_overlap_check_suppresses(spark, xy):
    x, y = xy
    bad = x.union(spark.createDataFrame([(2, 8, 3.0)], x.schema))
    out = interval_weighted_avg(
        bad, y, ("start", "end"), ("v",), skip_overlap_check=True
    )
    assert out.count() == 1  # garbage-in tolerated, as in the reference


def test_exact_duplicate_x_raises(spark, xy):
    x, y = xy
    with pytest.raises(DuplicateIntervalError):
        interval_weighted_avg(x.union(x), y, ("start", "end"), ("v",))


def test_reversed_interval_vars_raises(spark, xy):
    x, y = xy
    with pytest.raises(IntervalValidationError):
        interval_weighted_avg(x, y, ("end", "start"), ("v",))


def test_reserved_names_raise(spark, xy):
    x, y = xy
    for bad_name in ("yduration", "xduration", "xminstart", "xmaxend"):
        with pytest.raises(RoleValidationError):
            interval_weighted_avg(
                x.withColumnRenamed("v", bad_name), y, ("start", "end"), (bad_name,)
            )


def test_missing_column_raises(spark, xy):
    x, y = xy
    with pytest.raises(RoleValidationError):
        interval_weighted_avg(x, y, ("start", "end"), ("nope",))


def test_role_overlap_raises(spark, xy):
    x, y = xy
    with pytest.raises(RoleValidationError):
        interval_weighted_avg(x, y, ("start", "end"), ("start",))


def test_null_interval_raises(spark):
    x = spark.createDataFrame(
        [(1, 7, 1.0), (None, 14, 2.0)], "start int, end int, v double"
    )
    y = spark.createDataFrame([(0, 13)], "start int, end int")
    with pytest.raises(IntervalValidationError):
        interval_weighted_avg(x, y, ("start", "end"), ("v",))


def test_type_mismatch_raises(spark):
    import datetime as dt

    x = spark.createDataFrame(
        [(dt.date(2020, 1, 1), dt.date(2020, 1, 7), 1.0)], "start date, end date, v double"
    )
    y = spark.createDataFrame([(0, 13)], "start int, end int")
    with pytest.raises(IntervalValidationError):
        interval_weighted_avg(x, y, ("start", "end"), ("v",))


def test_string_interval_raises(spark):
    x = spark.createDataFrame([("a", "b", 1.0)], "start string, end string, v double")
    y = spark.createDataFrame([("a", "b")], "start string, end string")
    with pytest.raises(IntervalValidationError):
        interval_weighted_avg(x, y, ("start", "end"), ("v",))


def test_duplicate_y_warns_and_dedups(spark, xy):
    x, y = xy
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = interval_weighted_avg(x, y.union(y), ("start", "end"), ("v",))
        assert out.count() == 1
    assert any("duplicate" in str(m.message) for m in w)
