"""HLL distinct-count tiers: accuracy, cascade-exactness, grid bounds."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from timeperiods_spark import (
    distinct_cascade,
    distinct_rollup,
    finalize_distinct,
)
from timeperiods_spark.errors import RoleValidationError


def _events(spark, seed=0, n=20_000, users=3_000, days=14):
    rng = random.Random(seed)
    rows = [
        (rng.randrange(days * 24), rng.randrange(users), "g%d" % rng.randrange(2))
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, "t long, uid long, g string")


def test_distinct_rollup_estimate_accuracy(spark):
    ev = _events(spark)
    daily = distinct_rollup(ev, "t", "uid", ["g"], width=24, exact=True)
    out = finalize_distinct(daily, "uid", ["g"], width=24).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_distinct"] > 0
        rel = abs(r["n_distinct_est"] - r["n_distinct"]) / r["n_distinct"]
        assert rel < 0.05, (r["g"], r["period"], rel)
        # closed-interval grid bounds
        assert r["end"] - r["start"] + 1 == 24
        assert r["start"] == r["period"] * 24


def test_distinct_cascade_equals_direct_sketch(spark):
    ev = _events(spark, seed=3)
    daily = distinct_rollup(ev, "t", "uid", ["g"], width=24)
    weekly_via_cascade = finalize_distinct(
        distinct_cascade(daily, "uid", ["g"], fine_width=24, coarse_width=168),
        "uid", ["g"], width=168,
    )
    weekly_direct = finalize_distinct(
        distinct_rollup(ev, "t", "uid", ["g"], width=168),
        "uid", ["g"], width=168,
    )
    a = {(r["g"], r["period"]): r["n_distinct_est"]
         for r in weekly_via_cascade.collect()}
    b = {(r["g"], r["period"]): r["n_distinct_est"]
         for r in weekly_direct.collect()}
    # the union covers the same registers; estimates may differ only by
    # the HIP->composite estimator switch (a fraction of the ~1.6% RSE)
    assert a.keys() == b.keys()
    for k in a:
        assert abs(a[k] - b[k]) <= 0.03 * max(b[k], 1), (k, a[k], b[k])


def test_distinct_rollup_null_handling_and_guards(spark):
    ev = spark.createDataFrame(
        [(0, 1, "a"), (0, None, "a"), (None, 2, "a"), (1, 1, "a")],
        "t long, uid long, g string",
    )
    daily = distinct_rollup(ev, "t", "uid", ["g"], width=24, exact=True)
    r = finalize_distinct(daily, "uid", ["g"], width=24).collect()
    assert len(r) == 1 and r[0]["n_distinct"] == 1  # NULL key+time excluded
    with pytest.raises(RoleValidationError):
        distinct_rollup(ev, "t", "uid", width=0)
    with pytest.raises(RoleValidationError):
        distinct_cascade(daily, "uid", ["g"], fine_width=24, coarse_width=100)
    with pytest.raises(RoleValidationError):
        distinct_cascade(daily.drop("hll_uid"), "uid", ["g"],
                         fine_width=24, coarse_width=48)


def test_distinct_partials_roundtrip_parquet(spark, tmp_path):
    ev = _events(spark, seed=5, n=5_000)
    daily = distinct_rollup(ev, "t", "uid", ["g"], width=24)
    p = str(tmp_path / "daily_hll")
    daily.write.mode("overwrite").parquet(p)
    back = spark.read.parquet(p)
    a = {(r["g"], r["period"]): r["n_distinct_est"]
         for r in finalize_distinct(back, "uid", ["g"], width=24).collect()}
    b = {(r["g"], r["period"]): r["n_distinct_est"]
         for r in finalize_distinct(daily, "uid", ["g"], width=24).collect()}
    assert a == b  # sketches survive the tier file format


def test_hll_rides_additive_partials_through_cascade(spark):
    """Sketch columns joined onto an additive-partial frame survive
    merge_partials/cascade (hll_ prefix handled like sumsq_/sumxy_)."""
    from timeperiods_spark import cascade, rollup_regular
    from timeperiods_spark.operators.rollup import finalize_rollup

    ev = _events(spark, seed=9, n=8_000)
    x = ev.select(
        "g", F.col("t").alias("start"), F.col("t").alias("end"),
        (F.col("uid") % 100).cast("double").alias("v"),
        "uid",
    )
    addi = rollup_regular(x, ("start", "end"), ("v",), ("g",),
                          width=24, partial=True)
    hll = distinct_rollup(ev, "t", "uid", ["g"], width=24)
    combined = addi.join(hll, ["g", "period"], "inner")
    weekly = cascade(combined, ("v",), ("g",), fine_width=24, coarse_width=168)
    # distinct side: same register population as a direct weekly sketch
    # (estimates differ only by the union's composite-estimator switch)
    a = {(r["g"], r["period"]): r["n_distinct_est"]
         for r in finalize_distinct(weekly, "uid", ["g"], width=168).collect()}
    b = {(r["g"], r["period"]): r["n_distinct_est"]
         for r in finalize_distinct(
             distinct_rollup(ev, "t", "uid", ["g"], width=168),
             "uid", ["g"], width=168).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert abs(a[k] - b[k]) <= 0.03 * max(b[k], 1), (k, a[k], b[k])
    # and the cascaded path is identical to the dedicated distinct_cascade
    c = {(r["g"], r["period"]): r["n_distinct_est"]
         for r in finalize_distinct(
             distinct_cascade(hll, "uid", ["g"], fine_width=24,
                              coarse_width=168),
             "uid", ["g"], width=168).collect()}
    assert a == c
    # additive side unharmed: weekly means match a direct weekly rollup
    direct = rollup_regular(x, ("start", "end"), ("v",), ("g",),
                            width=168, partial=True)
    fa = {(r["g"], r["period"]): round(r["v"], 9)
          for r in finalize_rollup(weekly, ("v",), ("g",), width=168,
                                   required_percentage=0).collect()}
    fb = {(r["g"], r["period"]): round(r["v"], 9)
          for r in finalize_rollup(direct, ("v",), ("g",), width=168,
                                   required_percentage=0).collect()}
    assert fa == fb
