"""Managed cache lifecycle (VERDICT r3 item 6): operators that persist
intermediates must not grow the storage pool without bound across
repeated calls in a long-lived session."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from timeperiods_spark.plans import cachectl


def _n_cached(spark) -> int:
    """Number of RDDs currently holding cached blocks (DataFrame
    persist materializes through these)."""
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def _wait_cached_at_most(spark, n: int, timeout: float = 10.0) -> int:
    """unpersist(blocking=False) is async — poll briefly."""
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        c = _n_cached(spark)
        if c <= n:
            return c
        time.sleep(0.2)
    return _n_cached(spark)


@pytest.fixture()
def clean_caches(spark):
    cachectl.release()
    spark.catalog.clearCache()
    _wait_cached_at_most(spark, 0)
    yield
    cachectl.release()
    spark.catalog.clearCache()


def _intervals(spark, seed: int):
    return spark.range(200).select(
        (F.col("id") % 7).cast("int").alias("g"),
        ((F.col("id") * 13 + seed) % 500).cast("int").alias("s"),
        ((F.col("id") * 13 + seed) % 500 + 1 + (F.col("id") % 9)).cast("int").alias("e"),
        F.col("id").cast("double").alias("v"),
    )


def test_repeated_calls_bounded_storage(spark, clean_caches):
    """N repeated remove_overlaps + merge_intervals calls hold at most
    one cached intermediate per call-site, not N."""
    from timeperiods_spark.operators.interval_union import merge_intervals
    from timeperiods_spark.operators.overlaps import remove_overlaps

    high_water = 0
    for i in range(4):
        remove_overlaps(
            _intervals(spark, i), ["s", "e"], group_vars=["g"]
        ).count()
        merge_intervals(
            _intervals(spark, i), ["s", "e"], group_vars=["g"]
        ).count()
        high_water = max(high_water, _n_cached(spark))
    # three per-call FAMILIES (remove_overlaps.base, the r7
    # remove_overlaps.atomic sweep cache, merge_intervals.deltas), each
    # FIFO-bounded at keep=2 (r5 item 6: shared tags silently recompute
    # when a pipeline holds several lazy results); async unpersist may
    # briefly hold one stale frame per family
    assert high_water <= 9, f"storage pool grew to {high_water} cached RDDs"
    fams = {t.split("#")[0] for t in cachectl.managed_tags()}
    assert fams == {
        "merge_intervals.deltas",
        "remove_overlaps.base",
        "remove_overlaps.atomic",
    }
    assert len(cachectl.managed_tags()) <= 6  # keep=2 per family
    released = cachectl.release()
    assert 3 <= released <= 6
    assert cachectl.managed_tags() == []
    assert _wait_cached_at_most(spark, 0) == 0


def test_release_single_tag(spark, clean_caches):
    df = spark.range(10).select(F.col("id").alias("x"))
    cachectl.managed_persist(df, "t.a").count()
    cachectl.managed_persist(df.select("x"), "t.b").count()
    assert cachectl.release("t.a") == 1
    assert cachectl.managed_tags() == ["t.b"]
    assert cachectl.release() == 1


def test_managed_persist_replaces_previous(spark, clean_caches):
    a = spark.range(50).select(F.col("id").alias("x"))
    first = cachectl.managed_persist(a, "t.replace")
    first.count()
    second = cachectl.managed_persist(
        spark.range(60).select(F.col("id").alias("x")), "t.replace"
    )
    second.count()
    assert cachectl.managed_tags() == ["t.replace"]
    # the replaced frame is scheduled for unpersist; only the new one stays
    assert _wait_cached_at_most(spark, 1) == 1


def test_eviction_thrash_warns_once(spark, clean_caches):
    """Evicting the same tag repeatedly (concurrent or lazily-consumed
    same-tag pipelines) emits one warning — silent cache-benefit loss
    was the round-4 advice finding."""
    import warnings as w

    tag = "test/thrash"
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        for i in range(cachectl.EVICTION_WARN_THRESHOLD + 3):
            cachectl.managed_persist(_intervals(spark, i), tag)
        msgs = [str(x.message) for x in rec if "cachectl" in str(x.message)]
    assert len(msgs) == 1 and tag in msgs[0]
    # release() resets the accounting: a fresh burst warns again
    cachectl.release(tag)
    with w.catch_warnings(record=True) as rec2:
        w.simplefilter("always")
        for i in range(cachectl.EVICTION_WARN_THRESHOLD + 1):
            cachectl.managed_persist(_intervals(spark, 100 + i), tag)
        msgs2 = [str(x.message) for x in rec2 if "cachectl" in str(x.message)]
    assert len(msgs2) == 1


def test_percall_tags_fifo_bound(spark, clean_caches):
    """managed_persist_percall: each call holds its own tag under the
    family; the pool stays FIFO-bounded at `keep` frames."""
    frames = [
        cachectl.managed_persist_percall(_intervals(spark, i), "fam.x", keep=3)
        for i in range(5)
    ]
    for fr in frames:
        fr.count()
    tags = [t for t in cachectl.managed_tags() if t.startswith("fam.x#")]
    assert len(tags) == 3
    # oldest two evicted FIFO
    assert all(int(t.split("#")[1]) >= 3 for t in tags)
    assert _wait_cached_at_most(spark, 3) <= 3


def test_trend_two_call_pipeline_keeps_both_caches(spark, clean_caches):
    """VERDICT r5 finding 3: a pipeline building holt TWICE before
    collecting either must not silently recompute the first call's
    Arrow stage — per-call tags keep one materialization per call and
    no cachectl thrash warning fires."""
    import warnings as w

    from timeperiods_spark import holt

    df = _intervals(spark, 0).select("g", F.col("s").alias("t"), "v") \
        .dropDuplicates(["g", "t"])
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        h1 = holt(df, "t", "v", ["g"], alpha=0.3, beta=0.2)
        h2 = holt(df, "t", "v", ["g"], alpha=0.6, beta=0.4)
        # pin on the PRE-execution plans (the post-AQE printout repeats
        # the cached subtree's description per occurrence): both reads
        # of each call's Arrow stage come through its own cache
        for h in (h1, h2):
            plan = h._jdf.queryExecution().executedPlan().toString()
            assert plan.count("InMemoryTableScan") >= plan.count(
                "FlatMapGroupsInPandas"
            ), plan[:1500]
        n1, n2 = h1.count(), h2.count()
        assert n1 == n2 > 0
        msgs = [str(x.message) for x in rec if "cachectl" in str(x.message)]
    assert not msgs, msgs
    tags = [t for t in cachectl.managed_tags() if t.startswith("holt.local#")]
    assert len(tags) == 2
