"""Physical-plan assertions — the 100 TB safety net.

These tests pin the plan SHAPES that make the engine viable at scale;
a regression here (e.g. a range join degenerating to a nested-loop, or
a filter no longer reaching the parquet scan) is a performance bug even
while every value-level test stays green.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from timeperiods_spark import (
    TierCatalog,
    ingest_batch,
    interval_weighted_avg,
    rollup_regular,
    token_table,
)
from timeperiods_spark.operators.overlaps import remove_overlaps


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def xy(spark):
    x = spark.createDataFrame(
        [(1, 0, 9, 1.0), (2, 10, 19, 2.0)], "g int, s long, e long, v double"
    )
    y = spark.createDataFrame([(1, 0, 4), (2, 5, 9)], "g int, s long, e long")
    return x, y


def test_group_equi_is_hash_or_merge_join(xy):
    x, y = xy
    p = _plan(
        interval_weighted_avg(
            x, y, ("s", "e"), ("v",), ("g",), validate=False, assume_y_distinct=True
        )
    )
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or (
        "BroadcastHashJoin" in p
    )


def test_broadcast_y_uses_broadcast_hash_join(xy):
    x, y = xy
    p = _plan(
        interval_weighted_avg(
            x, y, ("s", "e"), ("v",), ("g",),
            validate=False, assume_y_distinct=True, join_strategy="broadcast_y",
        )
    )
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_auto_switches_to_bin_on_large_cross_estimate(xy):
    """auto is data-aware (sf1.0 regression: unconditional group_equi
    ran a 20-group x 750k-interval panel at 97x the sf0.1 wall): with
    a candidate-volume estimate above AUTO_BIN_PAIRS the plan must be
    the bin join (explode + equi join, no per-group cross). The
    explode node only exists on the bin path, so its presence pins the
    choice; results stay identical across strategies (test_golden)."""
    x, y = xy
    big = (10_000_000, 10_000_000, 2)  # 5e13 est. pairs >> threshold
    p = _plan(
        interval_weighted_avg(
            x, y, ("s", "e"), ("v",), ("g",),
            validate=False, assume_y_distinct=True, join_stats=big,
        )
    )
    assert "Generate" in p and "explode" in p.lower()
    assert "CartesianProduct" not in p
    small = (100, 100, 2)
    p2 = _plan(
        interval_weighted_avg(
            x, y, ("s", "e"), ("v",), ("g",),
            validate=False, assume_y_distinct=True, join_stats=small,
        )
    )
    assert "explode" not in p2.lower()


def test_bin_join_never_cartesian(spark):
    x = spark.createDataFrame([(0, 9, 1.0), (10, 19, 2.0)], "s long, e long, v double")
    y = spark.createDataFrame([(0, 4), (5, 9)], "s long, e long")
    p = _plan(
        interval_weighted_avg(
            x, y, ("s", "e"), ("v",), None,
            validate=False, assume_y_distinct=True,
            join_strategy="bin", bin_width=4,
        )
    )
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p


def test_remove_overlaps_bin_never_cartesian(spark):
    x = spark.createDataFrame([(1, 5), (3, 9), (8, 12)], "s long, e long")
    p = _plan(remove_overlaps(x, ("s", "e"), bin_width=4))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p


def test_rollup_has_single_exchange_and_partial_agg(spark):
    r = rollup_regular(
        token_table(spark, 1000),
        ("start_hour", "end_hour"),
        ("n_tok",),
        ("source",),
        width=24,
        partial=True,
    )
    p = _plan(r)
    # map-side partial + final aggregate around exactly one shuffle
    assert p.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in p
    # no join anywhere on the regular-grid path
    assert "Join" not in p


def test_catalog_read_pushes_down(spark, tmp_path):
    cat = TierCatalog(str(tmp_path / "c"), ("n_tok",), ("source",))
    ingest_batch(cat, token_table(spark, 2000), ("start_hour", "end_hour"), batch_id="b")
    fin = (
        cat.read_finished(spark, "daily", 0.0)
        .filter("period BETWEEN 100 AND 120")
        .select("source", "period", "n_tok")
    )
    p = _plan(fin)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", p)
    assert m and "period" in m.group(1), p[:800]
    m2 = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m2 is not None
    cols = {c.split(":")[0] for c in m2.group(1).split(",")}
    # only the columns the projection needs are read — min/max/xduration
    # must be pruned away
    assert "xminstart" not in cols and "xmaxend" not in cols, cols


def test_minhash_band_join_ships_no_arrays(spark):
    """The band self-join + pair dedup must shuffle only (id, band,
    bsig): carrying the shingle-hash arrays (~doc length) through the
    band exchange, multiplied by `bands`, is the shuffle-bloat
    anti-pattern this pins against. Shingle sets re-attach to unique
    candidate pairs via id-equi joins instead."""
    from timeperiods_spark.operators.dedup import minhash_candidate_pairs

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some shared text") for i in range(6)],
        "doc_id long, text string",
    )
    # hot_bucket_warn=False: the warn path's stats action materializes
    # the shingle cache, after which AQE broadcasts this tiny band join
    # and the exchange under inspection disappears — the pin is about
    # the lazy plan's shuffle payload
    out = minhash_candidate_pairs(
        docs, "doc_id", "text", verify_threshold=0.1, hot_bucket_warn=False
    )
    formatted = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # formatted explain lists every node's Input/Output columns: no
    # Exchange that partitions by the band signature may carry a
    # shingle-hashes array column
    exchanges = re.findall(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]\s*\n"
        r"Arguments: hashpartitioning\(([^)]*)\)",
        formatted,
    )
    band_exchanges = [cols for cols, keys in exchanges if "bsig" in keys]
    assert band_exchanges, formatted[:2000]  # the band join must exist
    for cols in band_exchanges:
        assert "hashes" not in cols, cols


def test_minhash_hot_bucket_probe_fills_banded_cache(spark):
    """The default-on hot-bucket skew probe is an eager action; the
    banded frame must be persisted FIRST so the probe materializes the
    cache and the self join's two sides read it back — otherwise the
    dominant shingle→minhash→banding stage runs once for the probe and
    again on consumption (~2x at corpus scale, ADVICE r5)."""
    from timeperiods_spark.operators.dedup import minhash_candidate_pairs

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some shared text") for i in range(6)],
        "doc_id long, text string",
    )
    out = minhash_candidate_pairs(docs, "doc_id", "text")
    plan = _plan(out)
    # both self-join sides come from the cache, and no live banding
    # (posexplode of the signature slices) survives outside it
    assert plan.count("InMemoryTableScan") >= 2, plan[:2000]


def test_ungrouped_validation_is_not_single_partition(spark):
    """With group_vars=[] the integrity scan must window by the
    deterministic start-bucket — not funnel everything through one
    Window.partitionBy(lit(1)) task. (The tiny per-bucket carry frame
    may use a constant window; the FULL-DATA window may not, which is
    what the __bk partitioning key pins.)"""
    from timeperiods_spark.operators.interval_avg import (
        _integrity_flags_frame,
    )

    xw = spark.createDataFrame(
        [(i * 10, i * 10 + 5) for i in range(100)], "__xs long, __xe long"
    )
    p = _plan(_integrity_flags_frame(xw, []))
    assert "hashpartitioning(__bk" in p, p[:1500]


def test_cosine_topk_preaggregates_before_rank_exchange(spark):
    """The rank window's exchange must sit ABOVE the per-partition
    top-k reduction (MapInPandas), so only |Q| x k x partitions rows are
    shuffled — never the full |Q| x |C| scored set."""
    from timeperiods_spark.operators.similarity import cosine_topk

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(50)], "vec_id long, embedding array<double>"
    )
    q = corpus.limit(2).selectExpr("vec_id AS query_id", "embedding")
    p = _plan(cosine_topk(corpus, q, k=3))
    i_exchange = p.index("Exchange hashpartitioning(query_id")
    i_map = p.index("MapInPandas")
    assert i_exchange < i_map, p[:1500]  # exchange consumes the reduced set


def test_srp_bucket_plan_is_compact_at_high_dim(spark):
    """dim=1024, n_planes=16 must compile to O(n_planes) plan nodes
    (array literals + zip_with dots), not an unrolled 16k-term sum of
    element_at calls that breaks codegen."""
    from timeperiods_spark.operators.similarity import srp_bucket

    df = spark.range(4).selectExpr(
        "transform(sequence(1, 1024), i -> CAST(i * (id + 1) AS DOUBLE)) AS v"
    )
    out = df.select(srp_bucket(F.col("v"), 1024, 16).alias("b"))
    analyzed = out._jdf.queryExecution().optimizedPlan().toString()
    assert "element_at" not in analyzed
    out.collect()  # and it actually runs


def test_iwa_projection_prunes_value_columns(spark, xy):
    """Selecting only coverage columns must prune the value column from
    the measurement scan (Catalyst column pruning through the operator)."""
    x, y = xy
    out = interval_weighted_avg(
        x, y, ("s", "e"), ("v",), ("g",), validate=False, assume_y_distinct=True
    ).select("g", "s", "e", "xduration")
    p = _plan(out)
    assert "CartesianProduct" not in p


def test_gap_fill_locf_buckets_large_domains(spark):
    """The LOCF window must partition by (group…, __bk) whenever the
    period domain is too large for per-group windows (VERDICT r2 item
    4); SMALL domains legitimately use per-group windows (the carry
    subtree costs ~1s of fixed stages — plans/carry.py domain gate).
    Plan-only: hints mean no jobs run for the huge span."""
    from timeperiods_spark.operators.rollup import gap_fill_locf

    t = token_table(spark, 300)
    daily = rollup_regular(
        t, ("start_hour", "end_hour"), ("n_tok",), ("source",), width=24,
        required_percentage=0.0,
    )
    big = gap_fill_locf(
        daily, ["n_tok"], ["source"], width=24,
        span=(0, 24 * (1 << 20)), group_count_hint=11,
    )
    assert "hashpartitioning(source" in _plan(big) and "__bk" in _plan(big)
    small = gap_fill_locf(
        daily, ["n_tok"], ["source"], width=24,
        span=(0, 24 * 366 - 1), group_count_hint=11,
    )
    # small domain: no carry-frame join (the scaffold join's broadcast
    # is legitimate and stays) — __hbk is the carry stitch's key
    assert "__hbk" not in _plan(small)


def test_sweep_rollup_buckets_large_domains(spark):
    """width-1 sweep's prefix-sum window partitions by (group…, __bk)
    for large period domains; the small tier domain stays per-group
    (domain gate). VERDICT r2 item 4 + r3 fixed-cost fix."""
    t = token_table(spark, 300)
    big = rollup_regular(
        t, ("start_hour", "end_hour"), ("n_tok",), ("source",), width=1,
        algorithm="sweep", required_percentage=0.0,
        carry_hints={"span": (0, 1 << 20), "groups": 11},
    )
    assert "__bk" in _plan(big)
    small = rollup_regular(
        t, ("start_hour", "end_hour"), ("n_tok",), ("source",), width=1,
        algorithm="sweep", required_percentage=0.0,
        carry_hints={"span": (0, 8824), "groups": 11},
    )
    assert "BroadcastExchange" not in _plan(small)


def test_auto_stats_near_threshold_triggers_recheck(xy):
    """VERDICT r4 item 8: a stale auto_stats hint whose estimate lands
    within AUTO_STATS_RECHECK_BAND of the bin cliff must trigger the
    real stats action instead of being trusted — the tiny test panel's
    TRUE volume is far below the cliff, so the recheck lands on
    group_equi (no explode) even though the naive hint-side arithmetic
    sits just under AUTO_BIN_PAIRS where a 10x-stale corpus would
    cross it."""
    from timeperiods_spark.plans.strategy import (
        AUTO_BIN_PAIRS,
        AUTO_STATS_RECHECK_BAND,
    )

    x, y = xy
    # estimate just inside the padding band (cliff/4 < est <= cliff)
    in_band = (AUTO_BIN_PAIRS // 2, 1, 1)
    p = _plan(
        interval_weighted_avg(
            x, y, ("s", "e"), ("v",), ("g",),
            validate=False, assume_y_distinct=True, join_stats=in_band,
        )
    )
    # recheck ran against the real (tiny) data: group_equi, not bin
    assert "explode" not in p.lower()

    # sanity on the band arithmetic itself
    assert AUTO_BIN_PAIRS // AUTO_STATS_RECHECK_BAND < AUTO_BIN_PAIRS // 2


def test_dedup_lines_no_cartesian_and_slim_election(spark):
    """dedup_lines: the election join must be an equi join on the line
    key (never BNLJ/cartesian), and with hash_lines=True the exchange
    must NOT carry the line text into the election aggregate side."""
    from timeperiods_spark import dedup_lines

    df = spark.createDataFrame(
        [(i, "a b\nc d\ne f") for i in range(10)], "id int, text string"
    )
    plan = _plan(dedup_lines(df, "id", "text", hash_lines=True))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_zscore_anomaly_two_exchanges_no_window_over_raw(spark):
    """zscore_anomaly: baseline via explode + hash agg — no window
    function over the raw rows (a RANGE window would serialize per
    group), and the join back is an equi join."""
    from timeperiods_spark import zscore_anomaly

    df = spark.createDataFrame(
        [("g", p, float(p)) for p in range(50)], "g string, p int, v double"
    )
    plan = _plan(zscore_anomaly(df, "p", "v", ["g"], k=7))
    assert "Window" not in plan  # pure agg+join formulation
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tokenize_distinct_words_before_python(spark):
    """tokenize_vocab: the Python stage (mapInPandas) must sit above a
    distinct (HashAggregate) over words — Python work is vocabulary-
    sized, never corpus-sized."""
    from timeperiods_spark import tokenize_vocab

    df = spark.createDataFrame(
        [(i, "hello world") for i in range(10)], "id int, text string"
    )
    plan = _plan(tokenize_vocab(df, "id", "text", {"hello": 1, "world": 2}))
    # exactly one Arrow eval, fed by an aggregate (the distinct)
    assert plan.count("MapInPandas") == 1
    pos_py = plan.find("MapInPandas")
    assert "HashAggregate" in plan[pos_py:] or "SortAggregate" in plan[pos_py:]


def test_holt_single_arrow_stage_and_broadcast_composition(spark):
    """holt (bucketed path): one FlatMapGroupsInPandas over the rows;
    the cross-bucket carry joins back via broadcast."""
    from timeperiods_spark import holt

    df = spark.createDataFrame(
        [("g", t, float(t % 13)) for t in range(4000)],
        "g string, t int, v double",
    )
    plan = _plan(holt(df, "t", "v", ["g"], alpha=0.3, beta=0.2))
    # the Arrow stage feeds two consumers (bucket stats + join-back);
    # both reads must come through the managed cache — every
    # FlatMapGroupsInPandas occurrence in the printout is the cached
    # plan's description under an InMemoryTableScan, never a live
    # recompute path
    assert plan.count("InMemoryTableScan") >= 2
    assert plan.count("InMemoryTableScan") >= plan.count("FlatMapGroupsInPandas")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_overlap_join_bin_never_nested_loop(spark):
    """overlap_join inherits the rollup's physical guarantees: the
    bucketized strategy is an equi join on (bin, groups) — never a
    BroadcastNestedLoop/cartesian, which a naive theta join becomes."""
    from timeperiods_spark import overlap_join

    x = spark.createDataFrame(
        [(1, 0, 9, 1.0), (2, 10, 19, 2.0)], "g int, s long, e long, v double"
    )
    y = spark.createDataFrame([(1, 0, 4), (2, 5, 9)], "g int, s long, e long")
    plan = _plan(overlap_join(x, y, ("s", "e"), ["g"], join_strategy="bin"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # ungrouped auto resolves to bin (no group keys to equi-join on)
    plan2 = _plan(overlap_join(x.drop("g"), y.drop("g"), ("s", "e")))
    assert "CartesianProduct" not in plan2
    assert "BroadcastNestedLoopJoin" not in plan2


def test_overlap_join_left_no_anti_join(spark):
    """how='left' is built INSIDE the strategy join (a preserved-x outer
    join; the bin shape resolves a first-bin NULL candidate with one
    max(matched) window) — never the dropDuplicates + left_anti rescan
    of x it once was: no anti join anywhere, and at most ONE exchange
    more than the inner plan (the bin variant's identity window)."""
    from timeperiods_spark import overlap_join

    x = spark.createDataFrame(
        [(i % 7, i, i + 3, float(i)) for i in range(200)],
        "g int, s long, e long, v double",
    )
    y = spark.createDataFrame(
        [(i % 7, i * 10, i * 10 + 5) for i in range(40)],
        "g int, s long, e long",
    )
    for strat in ("bin", "group_equi", "broadcast_y"):
        kw = dict(join_strategy=strat)
        if strat == "bin":
            kw["bin_width"] = 8
        inner = _plan(overlap_join(x, y, ("s", "e"), ["g"], how="inner", **kw))
        left = _plan(overlap_join(x, y, ("s", "e"), ["g"], how="left", **kw))
        assert "Anti" not in left, strat
        assert "CartesianProduct" not in left, strat
        assert "BroadcastNestedLoopJoin" not in left, strat
        assert left.count("Exchange") <= inner.count("Exchange") + 1, strat


def test_ohlc_single_aggregate_no_join_no_window(spark):
    """rollup_ohlc: ONE aggregate keyed (group, bucket) — the struct
    orderings put open/close INSIDE the aggregate, so there is no
    window, no join, and no sort of raw rows; exactly one shuffle."""
    from timeperiods_spark import rollup_ohlc

    df = spark.createDataFrame(
        [("g", i, float(i % 13)) for i in range(100)],
        "g string, p long, v double",
    )
    plan = _plan(rollup_ohlc(df, "p", "v", ["g"], bucket_width=10))
    assert "Join" not in plan
    assert "Window" not in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_xcorr_equi_join_no_range_predicate(spark):
    """cross_correlation: the lagged pairing must be an EQUI join
    (Catalyst extracts (series, period + lag) as plain keys) and the
    pair table must broadcast — never a nested-loop theta join."""
    from timeperiods_spark import cross_correlation

    df = spark.createDataFrame(
        [("a", t, float(t)) for t in range(50)]
        + [("b", t, float(t * 2)) for t in range(50)],
        "s string, p long, v double",
    )
    plan = _plan(
        cross_correlation(df, "p", "v", "s", pairs=[("a", "b")], lags=[0, 1])
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the literal pair table


def test_vocab_coverage_preaggregates_before_rank(spark):
    """vocab_coverage: the token explode collapses through a hash
    aggregate BEFORE any window (the rank runs over aggregated counts
    with the shared per-partition pre-top-k), and the totals attach by
    broadcast — no full-vocabulary global sort."""
    from timeperiods_spark import vocab_coverage

    df = spark.createDataFrame(
        [([f"t{i % 37}" for i in range(j, j + 20)],) for j in range(30)],
        "tokens array<string>",
    )
    plan = _plan(vocab_coverage(df, vocab_sizes=[5, 10]))
    assert "CartesianProduct" not in plan
    # the token explode feeds a PARTIAL hash aggregate before the
    # token-keyed exchange (map-side combine collapses the fan-out)
    assert re.search(
        r"HashAggregate\(keys=\[token[^\n]*partial_sum[\s\S]*?"
        r"Generate explode\(tokens",
        plan,
    )
    # the corpus-sized counts subtree is persisted and BOTH consumers
    # (rank + totals) read the cache — the plan string prints the
    # cached subtree per occurrence, so pin the InMemoryTableScan count
    # (2 = both reads hit the cache), not the explode count
    assert plan.count("InMemoryTableScan") == 2
    # pre-top-k prunes before the global rank (WindowGroupLimit both
    # sides of the partition exchange)
    assert "WindowGroupLimit" in plan
    # totals attach by broadcast (1-row side)
    assert "BroadcastExchange" in plan
