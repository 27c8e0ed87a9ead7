"""F1 — the README golden example, exact-value asserts.

Reference: /root/reference/README.md:138-189. x = five length-5
intervals with values (1,2,3,2,1) covering [1,25]; y = five periods
{[0,30],[0,6],[7,13],[14,20],[21,27]}. Expected outputs are hard-coded
below (fractions kept exact).
"""

from __future__ import annotations

import pytest

from timeperiods_spark import interval_weighted_avg


def _golden_frames(spark):
    x = spark.createDataFrame(
        [(1, 5, 1.0), (6, 10, 2.0), (11, 15, 3.0), (16, 20, 2.0), (21, 25, 1.0)],
        "start int, end int, value1 double",
    )
    y = spark.createDataFrame(
        [(0, 30), (0, 6), (7, 13), (14, 20), (21, 27)],
        "start int, end int",
    )
    return x, y


# rows keyed by (start, end), sorted:
# (0,6), (0,30), (7,13), (14,20), (21,27)
EXPECTED_REQ100 = [
    ((0, 6), None, 7.0, 6, 6, 1, 6),
    ((0, 30), None, 31.0, 25, 25, 1, 25),
    ((7, 13), 17.0 / 7.0, 7.0, 7, 7, 7, 13),
    ((14, 20), 16.0 / 7.0, 7.0, 7, 7, 14, 20),
    ((21, 27), None, 7.0, 5, 5, 21, 25),
]

EXPECTED_REQ08 = [7.0 / 6.0, 1.8, 17.0 / 7.0, 16.0 / 7.0, 1.0]


@pytest.mark.parametrize("strategy", ["group_equi", "broadcast_y", "broadcast_x", "bin"])
def test_golden_required_100(spark, strategy):
    x, y = _golden_frames(spark)
    kw = {"join_strategy": strategy}
    if strategy == "bin":
        kw["bin_width"] = 4
    out = interval_weighted_avg(
        x, y, ("start", "end"), ("value1",), required_percentage=100, **kw
    )
    assert out.columns == [
        "start",
        "end",
        "value1",
        "yduration",
        "xduration",
        "nobs_value1",
        "xminstart",
        "xmaxend",
    ]
    rows = {(r["start"], r["end"]): r for r in out.collect()}
    assert len(rows) == 5
    for (se, v, ydur, xdur, nobs, mins, maxe) in EXPECTED_REQ100:
        r = rows[se]
        if v is None:
            assert r["value1"] is None, (se, r)
        else:
            assert r["value1"] == pytest.approx(v)
        assert r["yduration"] == ydur
        assert r["xduration"] == xdur
        assert r["nobs_value1"] == nobs
        assert r["xminstart"] == mins
        assert r["xmaxend"] == maxe


def test_golden_required_0p8(spark):
    # README.md:178-189 — required=.8 means 0.8 PERCENT (0-100 scale)
    x, y = _golden_frames(spark)
    out = interval_weighted_avg(
        x, y, ("start", "end"), ("value1",), required_percentage=0.8
    )
    rows = {(r["start"], r["end"]): r["value1"] for r in out.collect()}
    order = [(0, 6), (0, 30), (7, 13), (14, 20), (21, 27)]
    expected = [7.0 / 6.0, 1.8, 17.0 / 7.0, 16.0 / 7.0, 1.0]
    for se, v in zip(order, expected):
        assert rows[se] == pytest.approx(v), se


def test_golden_bin_salted(spark):
    # salting must not change results
    x, y = _golden_frames(spark)
    out = interval_weighted_avg(
        x,
        y,
        ("start", "end"),
        ("value1",),
        required_percentage=100,
        join_strategy="bin",
        bin_width=7,
        skew_salt=4,
    )
    rows = {(r["start"], r["end"]): r for r in out.collect()}
    assert len(rows) == 5
    assert rows[(7, 13)]["value1"] == pytest.approx(17.0 / 7.0)
    assert rows[(0, 30)]["xduration"] == 25
