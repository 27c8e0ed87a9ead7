"""EWMA / CUSUM recurrence scans vs slow sequential references."""

from __future__ import annotations

import datetime
import math
import random

import pandas as pd
import pytest

from pyspark.sql import functions as F

from timeperiods_spark import cusum, ewma
from timeperiods_spark.errors import RoleValidationError


def _series(seed, n, groups=("a", "b", None)):
    rng = random.Random(seed)
    rows = []
    for g in groups:
        ts = rng.sample(range(n * 3), n)  # irregular spacing
        for t in ts:
            rows.append((g, t, round(rng.uniform(-50, 150), 3)))
    return rows


def _slow_ewma(rows, alpha, init="first"):
    """Sequential per-group recurrence, the definition itself."""
    out = {}
    by_g = {}
    for g, t, v in rows:
        if v is not None:
            by_g.setdefault(g, []).append((t, v))
    for g, tv in by_g.items():
        e = None
        for t, v in sorted(tv):
            if e is None:
                e = v if init == "first" else (1 - alpha) * 0.0 + alpha * v
            else:
                e = (1 - alpha) * e + alpha * v
            out[(g, t)] = e
    return out


def _slow_cusum(rows, target, slack):
    out = {}
    by_g = {}
    for g, t, v in rows:
        by_g.setdefault(g, []).append((t, v))
    for g, tv in by_g.items():
        sp = sn = 0.0
        for t, v in sorted(tv, key=lambda p: p[0]):
            if v is None:
                out[(g, t)] = (None, None)
                continue
            sp = max(0.0, sp + (v - target - slack))
            sn = max(0.0, sn - (v - target) - slack)
            out[(g, t)] = (sp, sn)
    return out


def test_ewma_matches_sequential_recurrence(spark):
    rows = _series(7, 120)
    df = spark.createDataFrame(rows, "g string, t int, v double")
    for init in ("first", "zero"):
        exp = _slow_ewma(rows, alpha=0.3, init=init)
        got = ewma(df, "t", "v", ["g"], alpha=0.3, init=init).collect()
        assert len(got) == len(exp)
        for r in got:
            assert r["ewma"] == pytest.approx(exp[(r["g"], r["t"])], abs=2e-6), (
                init, r["g"], r["t"])


def test_ewma_bucketed_equals_whole_group(spark):
    rows = _series(11, 200, groups=("x",))
    df = spark.createDataFrame(rows, "g string, t int, v double")
    a = ewma(df, "t", "v", ["g"], span=9).collect()
    # force the unbucketed path: claim a huge group count
    b = ewma(df, "t", "v", ["g"], span=9,
             carry_hints={"groups": 10_000_000}).collect()
    am = {(r["g"], r["t"]): r["ewma"] for r in a}
    bm = {(r["g"], r["t"]): r["ewma"] for r in b}
    assert am.keys() == bm.keys()
    for k in am:
        assert am[k] == pytest.approx(bm[k], abs=2e-6)


def test_ewma_skips_nulls_and_validates(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, None), ("a", 3, 20.0)],
        "g string, t int, v double",
    )
    got = {r["t"]: r["ewma"] for r in ewma(df, "t", "v", ["g"], alpha=0.5).collect()}
    # NULL row excluded; recurrence skips it: e(3) = 0.5*10 + 0.5*20
    assert sorted(got) == [1, 3]
    assert got[3] == pytest.approx(15.0)
    with pytest.raises(RoleValidationError):
        ewma(df, "t", "v", ["g"])  # neither alpha nor span
    with pytest.raises(RoleValidationError):
        ewma(df, "t", "v", ["g"], alpha=0.5, span=9)
    with pytest.raises(RoleValidationError):
        ewma(df, "t", "v", ["g"], alpha=1.5)
    with pytest.raises(Exception, match="duplicate"):
        dup = spark.createDataFrame(
            [("a", 1, 1.0), ("a", 1, 2.0)], "g string, t int, v double"
        )
        ewma(dup, "t", "v", ["g"], alpha=0.5).collect()


def test_ewma_alpha_one_is_identity(spark):
    rows = _series(3, 40, groups=("m",))
    df = spark.createDataFrame(rows, "g string, t int, v double")
    for r in ewma(df, "t", "v", ["g"], alpha=1.0).collect():
        assert r["ewma"] == pytest.approx(round(r["v"], 6))


def test_cusum_matches_sequential_recurrence(spark):
    rows = _series(13, 150)
    df = spark.createDataFrame(rows, "g string, t int, v double")
    exp = _slow_cusum(rows, target=50.0, slack=2.0)
    got = cusum(df, "t", "v", ["g"], target=50.0, slack=2.0).collect()
    assert len(got) == len(exp)
    for r in got:
        ep, en = exp[(r["g"], r["t"])]
        assert r["cusum_pos"] == pytest.approx(ep, abs=2e-6), (r["g"], r["t"])
        assert r["cusum_neg"] == pytest.approx(en, abs=2e-6), (r["g"], r["t"])


def test_cusum_nulls_threshold_and_dates(spark):
    d0 = datetime.date(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", d0, 5.0), ("a", d0 + datetime.timedelta(days=1), None),
         ("a", d0 + datetime.timedelta(days=2), 7.0)],
        "g string, t date, v double",
    )
    got = {r["t"].day: r for r in
           cusum(df, "t", "v", ["g"], target=1.0, threshold=9.0).collect()}
    assert got[2]["cusum_pos"] is None and got[2]["alarm"] is False
    assert got[1]["cusum_pos"] == pytest.approx(4.0)
    # s(3) = max(0, 4 + (7-1)) = 10 > 9 -> alarm
    assert got[3]["cusum_pos"] == pytest.approx(10.0)
    assert got[3]["alarm"] is True and got[1]["alarm"] is False
    assert got[3]["t"] == d0 + datetime.timedelta(days=2)  # dtype round-trip


def test_cusum_duplicate_t_raises(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 1, 2.0)], "g string, t int, v double"
    )
    with pytest.raises(Exception, match="duplicate"):
        cusum(df, "t", "v", ["g"]).collect()


def test_cusum_one_sided_and_null_group(spark):
    rows = _series(5, 80, groups=(None, "z"))
    df = spark.createDataFrame(rows, "g string, t int, v double")
    exp = _slow_cusum(rows, target=40.0, slack=0.0)
    out = cusum(df, "t", "v", ["g"], target=40.0, two_sided=False).collect()
    assert "cusum_neg" not in out[0].asDict()
    for r in out:
        assert r["cusum_pos"] == pytest.approx(exp[(r["g"], r["t"])][0], abs=2e-6)


def _slow_holt(rows, alpha, beta):
    out = {}
    by_g = {}
    for g, t, v in rows:
        if v is not None:
            by_g.setdefault(g, []).append((t, v))
    for g, tv in by_g.items():
        l = b = None
        for t, v in sorted(tv):
            if l is None:
                l, b = v, 0.0
            else:
                l_new = alpha * v + (1 - alpha) * (l + b)
                b = beta * (l_new - l) + (1 - beta) * b
                l = l_new
            out[(g, t)] = (l, b)
    return out


def test_holt_matches_sequential_recurrence(spark):
    from timeperiods_spark import holt

    rows = _series(17, 150)
    df = spark.createDataFrame(rows, "g string, t int, v double")
    for a, b in ((0.3, 0.2), (0.9, 0.9), (0.05, 1.0)):
        exp = _slow_holt(rows, a, b)
        got = holt(df, "t", "v", ["g"], alpha=a, beta=b, forecast=3).collect()
        assert len(got) == len(exp)
        for r in got:
            el, eb = exp[(r["g"], r["t"])]
            assert r["holt_level"] == pytest.approx(el, abs=5e-6), (a, b, r["g"], r["t"])
            assert r["holt_trend"] == pytest.approx(eb, abs=5e-6), (a, b, r["g"], r["t"])
            assert r["holt_forecast"] == pytest.approx(
                round(r["holt_level"] + 3 * r["holt_trend"], 5), abs=2e-5)


def test_holt_bucketed_equals_whole_group(spark):
    from timeperiods_spark import holt

    rows = _series(19, 300, groups=("x", None))
    df = spark.createDataFrame(rows, "g string, t int, v double")
    a = holt(df, "t", "v", ["g"], alpha=0.4, beta=0.3).collect()
    b = holt(df, "t", "v", ["g"], alpha=0.4, beta=0.3,
             carry_hints={"groups": 10_000_000}).collect()
    am = {(r["g"], r["t"]): (r["holt_level"], r["holt_trend"]) for r in a}
    bm = {(r["g"], r["t"]): (r["holt_level"], r["holt_trend"]) for r in b}
    assert am.keys() == bm.keys()
    for k in am:
        assert am[k][0] == pytest.approx(bm[k][0], abs=5e-6)
        assert am[k][1] == pytest.approx(bm[k][1], abs=5e-6)


def test_holt_large_magnitude_big_bucket_stays_on_grid(spark):
    """ADVICE r5: FFT convolution error is RELATIVE while the output
    contract is an absolute 6dp grid — a ≥2048-row bucket of |v|~1e7
    values must not diverge from the sequential recurrence. The
    magnitude gate routes such buckets to truncated direct
    convolution."""
    from timeperiods_spark import holt

    n = 2500
    rows = [("a", t, 1e7 * (1.0 + 0.3 * ((t * 7919) % 101) / 101.0))
            for t in range(n)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    # huge groups hint -> unbucketed whole-group scan: the full series
    # goes through one >=2048-row convolution batch
    got = holt(df, "t", "v", ["g"], alpha=0.3, beta=0.2,
               carry_hints={"groups": 10_000_000}).collect()
    exp = _slow_holt(rows, 0.3, 0.2)
    assert len(got) == n
    for r in got:
        el, eb = exp[(r["g"], r["t"])]
        assert r["holt_level"] == pytest.approx(el, rel=1e-9, abs=1e-4)
        assert r["holt_trend"] == pytest.approx(eb, rel=1e-9, abs=1e-4)


def test_conv_trunc_magnitude_gate_numpy():
    """Unit-level: the truncated direct fallback matches the full
    direct convolution to well under the 6dp grid at large magnitude,
    and the small-magnitude FFT path is unchanged."""
    import numpy as np

    from timeperiods_spark.operators.trend import _conv_trunc, _mat_powers

    a, b = 0.3, 0.2
    A = np.array([[1 - a, 1 - a], [-a * b, 1 - a * b]])
    c = np.array([a, a * b])
    n = 4096
    K = _mat_powers(A, n) @ c
    rng_v = np.cos(np.arange(n) * 0.37) + 1.5
    for scale in (1.0, 1e8):
        v = rng_v * scale
        got = _conv_trunc(v, K)
        ref = np.stack(
            [np.convolve(v, K[:, comp])[:n] for comp in range(2)], axis=1
        )
        assert np.max(np.abs(got - ref)) < 1e-7 * max(1.0, scale * 1e-6)


def test_holt_validates(spark):
    from timeperiods_spark import holt

    df = spark.createDataFrame([("a", 1, 1.0)], "g string, t int, v double")
    with pytest.raises(RoleValidationError):
        holt(df, "t", "v", ["g"], alpha=1.0, beta=0.5)
    with pytest.raises(RoleValidationError):
        holt(df, "t", "v", ["g"], alpha=0.5, beta=0.0)
    dup = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 1, 2.0)], "g string, t int, v double"
    )
    with pytest.raises(Exception, match="duplicate"):
        holt(dup, "t", "v", ["g"], alpha=0.5, beta=0.5).collect()
