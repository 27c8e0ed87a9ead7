"""As-of join: closed-at-tie matching, tolerance staleness, ungrouped
range-partitioned carry with boundary handoff, and plan shape."""

from __future__ import annotations

import pytest

from timeperiods_spark import asof_join
from timeperiods_spark.errors import RoleValidationError


@pytest.fixture(scope="module")
def obsq(spark):
    obs = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 5, 50.0), ("a", 9, 90.0), ("b", 4, 40.0)],
        "g string, t int, v double",
    )
    q = spark.createDataFrame(
        [("a", 0), ("a", 1), ("a", 6), ("a", 20), ("b", 3), ("b", 4), ("c", 7)],
        "g string, t int",
    )
    return obs, q


def test_asof_grouped_semantics(spark, obsq):
    obs, q = obsq
    rows = {
        (r["g"], r["t"]): (r["v"], r["asof_t"])
        for r in asof_join(q, obs, "t", ["v"], ["g"]).collect()
    }
    assert rows[("a", 0)] == (None, None)  # nothing at or before
    assert rows[("a", 1)] == (10.0, 1)  # observation AT query time matches
    assert rows[("a", 6)] == (50.0, 5)
    assert rows[("a", 20)] == (90.0, 9)
    assert rows[("b", 3)] == (None, None)
    assert rows[("b", 4)] == (40.0, 4)
    assert rows[("c", 7)] == (None, None)  # group absent from observations


def test_asof_tolerance_masks_stale(spark, obsq):
    obs, q = obsq
    rows = {
        (r["g"], r["t"]): (r["v"], r["asof_t"])
        for r in asof_join(q, obs, "t", ["v"], ["g"], tolerance=2).collect()
    }
    assert rows[("a", 6)] == (50.0, 5)  # within 2 units
    assert rows[("a", 20)] == (None, None)  # 11 units stale -> masked


def test_asof_ungrouped_boundary_handoff(spark):
    """With no groups the carry crosses range-partition boundaries: two
    observations, a thousand queries — every query left of 500 carries
    the first value, every one at/after carries the second."""
    from pyspark.sql import functions as F

    obs = spark.createDataFrame([(0, 1.0), (500, 2.0)], "t int, v double")
    q = spark.range(1000).select(F.col("id").cast("int").alias("t"))
    out = asof_join(q, obs, "t", ["v"]).collect()
    assert len(out) == 1000
    vals = {r["t"]: r["v"] for r in out}
    assert vals[0] == 1.0 and vals[499] == 1.0
    assert vals[500] == 2.0 and vals[999] == 2.0


def test_asof_plan_no_pair_join(spark, obsq):
    """As-of is a union + bucketed carry window — the only joins in the
    plan attach the tiny per-bucket carry frames; no theta/pair join
    (quadratic per group) and no nested loop may appear."""
    obs, q = obsq
    p = (
        asof_join(q, obs, "t", ["v"], ["g"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p
    # the carry window is keyed by (group, bucket), never a constant
    assert "hashpartitioning(1," not in p and "SinglePartition" not in p


def test_asof_validates_roles(spark, obsq):
    obs, q = obsq
    with pytest.raises(RoleValidationError):
        asof_join(q, obs, "t", [], ["g"])
    with pytest.raises(RoleValidationError):
        asof_join(q, obs, "t", ["missing"], ["g"])
    with pytest.raises(RoleValidationError):
        asof_join(q.withColumnRenamed("g", "v").withColumn("g", q["g"])
                  if False else q.selectExpr("g", "t", "t AS v"),
                  obs, "t", ["v"], ["g"])


def test_asof_null_observation_values_are_row_atomic(spark):
    """An observation with a NULL value must match AS ITSELF: the query
    gets (NULL value, that observation's time) — not an older
    observation's value stitched to the newer time (DuckDB ASOF /
    merge_asof row-atomicity; r2 advice finding)."""
    obs = spark.createDataFrame(
        [("a", 1, 10.0, 100.0), ("a", 5, None, 500.0), ("a", 9, 90.0, None)],
        "g string, t int, v double, u double",
    )
    q = spark.createDataFrame(
        [("a", 4), ("a", 6), ("a", 8), ("a", 12)], "g string, t int"
    )
    rows = {
        r["t"]: (r["v"], r["u"], r["asof_t"])
        for r in asof_join(q, obs, "t", ["v", "u"], ["g"]).collect()
    }
    assert rows[4] == (10.0, 100.0, 1)
    # t=6/8 match the t=5 obs: v must be NULL (not 10.0 carried from t=1)
    assert rows[6] == (None, 500.0, 5)
    assert rows[8] == (None, 500.0, 5)
    # t=12 matches t=9: u must be NULL (not 500.0 from t=5)
    assert rows[12] == (90.0, None, 9)


def test_asof_null_values_atomic_across_bucket_boundary(spark):
    """Same atomicity when the match crosses a carry-bucket boundary:
    the carried struct must be the latest observation even though its
    value field is NULL."""
    from pyspark.sql import functions as F

    obs = spark.createDataFrame(
        [(0, 1.0), (400, None), (900, 3.0)], "t int, v double"
    )
    q = spark.range(1000).select(F.col("id").cast("int").alias("t"))
    vals = {
        r["t"]: (r["v"], r["asof_t"])
        for r in asof_join(q, obs, "t", ["v"], n_buckets=16).collect()
    }
    assert vals[399] == (1.0, 0)
    assert vals[400] == (None, 400)
    assert vals[899] == (None, 400)
    assert vals[950] == (3.0, 900)


def test_asof_forward_and_nearest(spark):
    obs = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 20, 2.0), ("a", 40, 4.0)], "g string, t int, v double"
    )
    q = spark.createDataFrame(
        [("a", 5), ("a", 10), ("a", 16), ("a", 29), ("a", 50)], "g string, t int"
    )
    fwd = {
        r["t"]: (r["v"], r["asof_t"])
        for r in asof_join(q, obs, "t", ["v"], ["g"], direction="forward").collect()
    }
    assert fwd[5] == (1.0, 10)
    assert fwd[10] == (1.0, 10)  # observation AT query time matches
    assert fwd[16] == (2.0, 20)
    assert fwd[29] == (4.0, 40)
    assert fwd[50] == (None, None)  # nothing at or after

    near = {
        r["t"]: (r["v"], r["asof_t"])
        for r in asof_join(q, obs, "t", ["v"], ["g"], direction="nearest").collect()
    }
    assert near[5] == (1.0, 10)     # only forward exists
    assert near[10] == (1.0, 10)
    assert near[16] == (2.0, 20)    # 4 ahead beats 6 behind
    assert near[29] == (2.0, 20)    # tie at distance 9+... 29-20=9 vs 40-29=11 -> backward
    assert near[50] == (4.0, 40)    # only backward exists


def test_asof_nearest_tie_prefers_backward(spark):
    obs = spark.createDataFrame([("a", 10, 1.0), ("a", 20, 2.0)], "g string, t int, v double")
    q = spark.createDataFrame([("a", 15)], "g string, t int")
    r = asof_join(q, obs, "t", ["v"], ["g"], direction="nearest").collect()[0]
    assert (r["v"], r["asof_t"]) == (1.0, 10)


def test_asof_forward_tolerance(spark):
    obs = spark.createDataFrame([("a", 100, 1.0)], "g string, t int, v double")
    q = spark.createDataFrame([("a", 95), ("a", 50)], "g string, t int")
    rows = {
        r["t"]: (r["v"], r["asof_t"])
        for r in asof_join(
            q, obs, "t", ["v"], ["g"], direction="forward", tolerance=10
        ).collect()
    }
    assert rows[95] == (1.0, 100)
    assert rows[50] == (None, None)  # 50 units ahead > tolerance


def test_asof_duplicate_obs_times_deterministic(spark):
    """Duplicate observation times within a bucket must resolve by the
    same struct comparison the cross-bucket carry uses (max over the
    __obs struct), independent of input row order (round-4 ADVICE: the
    within-bucket window tied on (__t, __m) and picked arrival order)."""
    rows = [("a", 5, 1.0), ("a", 5, 9.0), ("a", 5, 4.0)]
    q = spark.createDataFrame([("a", 6)], "g string, t int")
    got = set()
    for perm in (rows, rows[::-1], [rows[1], rows[2], rows[0]]):
        obs = spark.createDataFrame(perm, "g string, t int, v double")
        # defeat any incidental ordering from createDataFrame slicing
        obs = obs.repartition(4)
        r = asof_join(q, obs, "t", ["v"], ["g"]).collect()[0]
        got.add((r["v"], r["asof_t"]))
    assert got == {(9.0, 5)}  # max struct: highest value at the tied time
