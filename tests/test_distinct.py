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
    # register-wise max: the union of fine sketches IS the coarse sketch
    assert a == b


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
