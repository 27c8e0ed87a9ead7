"""Deterministic fixture builders for the differential suite.

Each builder mirrors a scenario from the reference test suite
(/root/reference/tests.R; see FIXTURES.md F2-F11). R is not available in
this sandbox, so random draws are reproduced with seeded numpy
default_rng rather than replayed — the differential property (fast
engine == explode oracle) is seed-independent.
"""

from __future__ import annotations

import datetime as dt

import numpy as np

EPOCH = dt.date(1970, 1, 1)


def _to_date(day: int) -> dt.date:
    return EPOCH + dt.timedelta(days=int(day))


def f2_ungrouped(spark):
    """tests.R:130-146 — 10 adjacent 10-unit intervals, one y period [1,25]."""
    rng = np.random.default_rng(180)
    rows = [
        (int(s), int(s + 9), float(v))
        for s, v in zip(range(1, 100, 10), rng.normal(size=10))
    ]
    x = spark.createDataFrame(rows, "start int, end int, value1 double")
    y = spark.createDataFrame([(1, 25)], "start int, end int")
    return x, y, ("start", "end"), ("value1",), None


def f3_date_panel(spark, n_id1=2, n_id2=8, n_years=6):
    """tests.R:149-179 — weekly date intervals, 2 group vars, 2 value
    vars, upsampled to calendar years (scaled-down panel)."""
    rng = np.random.default_rng(181)
    start0 = dt.date(1999, 1, 1).toordinal() - EPOCH.toordinal()
    last = dt.date(1999 + n_years - 1, 12, 31).toordinal() - EPOCH.toordinal()
    xrows = []
    for i1 in range(1, n_id1 + 1):
        for i2 in range(1, n_id2 + 1):
            s = start0
            while s <= last:
                xrows.append(
                    (
                        i1,
                        i2,
                        _to_date(s),
                        _to_date(s + 6),
                        float(rng.normal()),
                        float(rng.normal()),
                    )
                )
                s += 7
    x = spark.createDataFrame(
        xrows, "id1 int, id2 int, start date, end date, value1 double, value2 double"
    )
    yrows = []
    for i1 in range(1, n_id1 + 1):
        for i2 in range(1, n_id2 + 1):
            for yr in range(1999, 1999 + n_years):
                yrows.append((i1, i2, dt.date(yr, 1, 1), dt.date(yr, 12, 31)))
    y = spark.createDataFrame(yrows, "id1 int, id2 int, start date, end date")
    return x, y, ("start", "end"), ("value1", "value2"), ("id1", "id2")


def _f4_x(spark):
    """tests.R:202-230 x — 7-day intervals per (id, id2), ~30% of `value`
    nulled, value2 complete (nobs columns must diverge)."""
    rng = np.random.default_rng(182)
    starts = [-13, 1, 8, 15, 22, 29, 36]
    rows = []
    for id_ in (1, 2):
        for id2 in (1, 2):
            for s in starts:
                v = float(rng.binomial(5, 0.5))
                v2 = float(rng.binomial(5, 0.5))
                if rng.random() < 0.3:
                    v = None
                rows.append((id_, id2, int(s), int(s + 6), v, v2))
    return spark.createDataFrame(
        rows, "id int, id2 int, start int, end int, value double, value2 double"
    )


def f4_missingness(spark, required=100.0):
    """tests.R:202-230 / :257-276 — 7-day x onto 14-day y."""
    x = _f4_x(spark)
    yrows = [
        (id_, id2, s, s + 13)
        for id_ in (1, 2)
        for id2 in (1, 2)
        for s in (0, 14, 28, 42, 56)
    ]
    y = spark.createDataFrame(yrows, "id int, id2 int, start int, end int")
    return x, y, ("start", "end"), ("value", "value2"), ("id", "id2")


def f5_downsample(spark):
    """tests.R:283-309 — same x, 3-day y periods."""
    x = _f4_x(spark)
    yrows = [
        (id_, id2, s, s + 2)
        for id_ in (1, 2)
        for id2 in (1, 2)
        for s in range(0, 57, 3)
    ]
    y = spark.createDataFrame(yrows, "id int, id2 int, start int, end int")
    return x, y, ("start", "end"), ("value", "value2"), ("id", "id2")


def f6_per_group_schedules(spark):
    """tests.R:317-352 — each group gets a different y schedule, incl. a
    y interval overlapping nothing ([100,101] for group (2,2))."""
    x = _f4_x(spark)
    yrows = []
    for s in (0, 14, 28, 42, 56):
        yrows.append((1, 1, s, s + 13))
    for s in range(0, 57, 3):
        yrows.append((1, 2, s, s + 2))
    for s in range(3, 57, 20):
        yrows.append((2, 1, s, s + 19))
    yrows.append((2, 2, 5, 12))
    yrows.append((2, 2, 100, 101))
    y = spark.createDataFrame(yrows, "id int, id2 int, start int, end int")
    return x, y, ("start", "end"), ("value", "value2"), ("id", "id2")


def f7_overlapping_y(spark):
    """tests.R:356-379 — overlapping y periods are legal."""
    x, y, iv, vv, gv = f5_downsample(spark)
    extra = y.sparkSession.createDataFrame(
        [(id_, id2, 3, 18) for id_ in (1, 2) for id2 in (1, 2)],
        "id int, id2 int, start int, end int",
    )
    return x, y.unionByName(extra), iv, vv, gv


def f9_null_groups(spark):
    """tests.R:564-598 — NULL group keys, y groups absent from x,
    required_percentage=0."""
    xrows = [
        (1, 1, 1, 5, 1.0),
        (1, 1, 6, 10, 2.0),
        (1, 1, 11, 15, 3.0),
        (2, 1, 6, 10, 4.0),
        (3, 2, 11, 15, 5.0),
        (4, None, 1, 5, 6.0),
    ]
    x = spark.createDataFrame(
        xrows, "id1 int, region int, start int, end int, value double"
    )
    yrows = []
    for id1, s, e in ((1, 1, 7), (1, 50, 60), (200, 1, 7)):
        for region in (1, 2, None):
            yrows.append((id1, region, s, e))
    y = spark.createDataFrame(yrows, "id1 int, region int, start int, end int")
    return x, y, ("start", "end"), ("value",), ("id1", "region")


def f11_random_pipeline(spark, n=300, seed=184):
    """tests.R:476-511 (scaled down) — random non-overlapping x built by
    stacking random-length intervals per group; random y; 20% null values."""
    rng = np.random.default_rng(seed)
    xrows = []
    for g1 in range(4):
        for g2 in range(3):
            pos = int(rng.integers(0, 50))
            for _ in range(n // 12):
                length = int(rng.integers(1, 30))
                gap = int(rng.integers(0, 10))
                s = pos + gap
                e = s + length - 1
                v = float(rng.normal())
                if rng.random() < 0.2:
                    v = None
                v2 = float(rng.normal())
                xrows.append((g1, g2, s, e, v, v2))
                pos = e + 1
    x = spark.createDataFrame(
        xrows, "g1 int, g2 int, start int, end int, value double, value2 double"
    )
    yrows = []
    for g1 in range(4):
        for g2 in range(3):
            for _ in range(20):
                s = int(rng.integers(0, 900))
                e = s + int(rng.integers(1, 120))
                yrows.append((g1, g2, s, e))
    y = spark.createDataFrame(yrows, "g1 int, g2 int, start int, end int")
    return x, y, ("start", "end"), ("value", "value2"), ("g1", "g2")
