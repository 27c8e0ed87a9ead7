"""Trailing z-score anomaly flags and seasonal adjustment."""

from __future__ import annotations

import math
import random
import statistics

import pytest
from pyspark.sql import functions as F

from timeperiods_spark import seasonal_adjust, zscore_anomaly
from timeperiods_spark.errors import RoleValidationError


def test_zscore_anomaly_matches_slow_reference(spark):
    rng = random.Random(4)
    rows = []
    for g in ("a", "b"):
        for p in range(60):
            v = 100.0 + rng.uniform(-5, 5)
            if g == "a" and p == 40:
                v = 200.0  # planted spike
            rows.append((g, p, round(v, 3)))
    df = spark.createDataFrame(rows, "g string, p int, v double")
    k, zthr, min_obs = 10, 3.0, 3
    by = {}
    for g, p, v in rows:
        by.setdefault(g, {})[p] = v
    out = zscore_anomaly(df, "p", "v", ["g"], k=k, z=zthr).collect()
    assert len(out) == len(rows)
    flagged = {(r["g"], r["p"]) for r in out if r["is_anomaly"]}
    assert ("a", 40) in flagged
    for r in out:
        base = [by[r["g"]][q] for q in range(r["p"] - k, r["p"]) if q in by[r["g"]]]
        if len(base) < min_obs:
            assert r["zscore"] is None and r["is_anomaly"] is False
            continue
        mean = sum(base) / len(base)
        var = sum(b * b for b in base) / len(base) - mean * mean
        std = math.sqrt(max(var, 0.0))
        if round(std, 6) <= 0:
            assert r["zscore"] is None
            continue
        want = (r["v"] - mean) / std
        assert r["zscore"] == pytest.approx(want, abs=2e-5), (r["g"], r["p"])
        assert r["is_anomaly"] == (abs(round(want, 6)) > zthr)
    # the spike must not dilute its own baseline (strictly preceding
    # window): period 41's baseline INCLUDES the spike, so its mean
    # jumps; period 40's does not
    m40 = {r["p"]: r["base_mean"] for r in out if r["g"] == "a"}
    assert m40[41] > m40[40] + 5


def test_zscore_constant_baseline_and_validation(spark):
    df = spark.createDataFrame(
        [("a", p, 5.0) for p in range(10)] + [("a", 10, 9.0)],
        "g string, p int, v double",
    )
    out = {r["p"]: r for r in zscore_anomaly(df, "p", "v", ["g"], k=5).collect()}
    # zero-variance baseline: no zscore, not an anomaly (documented)
    assert out[10]["zscore"] is None and out[10]["is_anomaly"] is False
    assert out[10]["base_std"] == 0.0
    with pytest.raises(RoleValidationError):
        zscore_anomaly(df, "p", "v", ["g"], k=0)
    with pytest.raises(RoleValidationError):
        zscore_anomaly(df, "p", "v", ["g"], k=5, min_obs=1)
    # ADVICE r5: raw timestamps grid to MICROSECONDS — the [p-k, p-1]
    # baseline would always be empty; reject instead of silently
    # returning all-NULL zscores
    ts = df.select("g", F.timestamp_seconds(F.col("p") * 3600).alias("p"), "v")
    with pytest.raises(RoleValidationError, match="MICROSECONDS"):
        zscore_anomaly(ts, "p", "v", ["g"], k=5)


def test_seasonal_adjust_removes_weekly_shape(spark):
    rng = random.Random(9)
    rows = []
    weekly = [0.0, 10.0, 20.0, 5.0, -5.0, -15.0, -15.0]
    for g in ("x", None):
        for t in range(70):
            rows.append((g, t, 50.0 + weekly[t % 7] + rng.uniform(-0.5, 0.5)))
    df = spark.createDataFrame(rows, "g string, t int, v double")
    out = seasonal_adjust(df, "t", "v", ["g"], season_length=7).collect()
    assert len(out) == len(rows)
    for r in out:
        assert r["season"] == r["t"] % 7
        # the weekly shape is gone: everything lands near the base level
        assert abs(r["v_adj"] - 50.0) < 1.5, (r["g"], r["t"])
    # per-phase means are exact
    vals = [r for r in out if r["g"] == "x" and r["season"] == 2]
    exp = statistics.mean(
        v for g, t, v in rows if g == "x" and t % 7 == 2
    )
    assert vals[0]["seasonal_mean"] == pytest.approx(exp, abs=1e-6)
    # adjustment preserves the group mean
    ga = statistics.mean(r["v_adj"] for r in out if r["g"] == "x")
    gv = statistics.mean(v for g, t, v in rows if g == "x")
    assert ga == pytest.approx(gv, abs=1e-4)
    with pytest.raises(RoleValidationError):
        seasonal_adjust(df, "t", "v", ["g"], season_length=0)
