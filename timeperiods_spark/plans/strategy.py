"""Physical strategies for the interval overlap (range) join.

The reference gets its range join from data.table's binary-search
``foverlaps`` (/root/reference/timeperiod_functions.R:239-240;
README.md:199-209). OSS Catalyst has no native interval join: a pure
theta join plans as BroadcastNestedLoopJoin or a cartesian product, both
of which die at scale. This module rewrites the join at the API level —
no custom Catalyst rules — into one of four shapes:

``group_equi``
    Equi join on null-safe group keys with the range predicate applied
    as a join condition. Catalyst extracts the null-safe equalities as
    hash/sort-merge join keys, so the fan-out is bounded per group. The
    right default whenever group keys are selective (panel data).

``broadcast_y`` / ``broadcast_x``
    Same condition with the small side broadcast — the fast path when
    the period schedule (or the measurement set) fits on every executor,
    e.g. hourly/daily/weekly retention scaffolds.

``bin``
    Bucketized range join for the ungrouped / huge-group case (the
    10^12-sequence token table where one ``source`` is a single logical
    stream): explode each interval to the fixed-width time bins it
    touches, equi-join on (group, bin), re-check exact overlap, and keep
    each pair only in the FIRST bin the two intervals share
    (``bin == floor(max(x.start, y.start) / W)``) so no post-join
    deduplication is needed — the row-count invariant of SURVEY.md §4.4
    survives the fan-out by construction. Shuffle keys become
    (group, bin[, salt]), which partitions evenly and is skew-saltable.

``auto``
    Data-aware pick. Ungrouped → bin. Grouped → estimate the equi
    join's candidate volume ``|x| x |y| / groups`` (one bounded stats
    action: count + approx_count_distinct on x, count on y) and switch
    to bin above ``AUTO_BIN_PAIRS``. Rationale: group_equi's SMJ
    applies the range predicate AFTER the per-group cross, so its cost
    is the candidate volume, not the match volume — few groups x long
    panels degenerates quadratically (measured: the sf1.0 bench's
    20-group x 750k-interval panel ran 97x the sf0.1 wall under
    unconditional group_equi; the bin join is linear in actual
    overlaps). Callers that know their sizes pass
    ``auto_stats=(nx, ny, n_groups_distinct)`` to skip the stats
    action, or pick a strategy explicitly.

All null handling is null-safe (``eqNullSafe``): NULL group values are
legal join keys, matching data.table's NA-matching keyed joins
(reference tests.R:564-580) — a required deviation from Spark's default
null-dropping join.

Naming convention: the x side carries ``__g{i}, __xs, __xe, __v{i}``;
the y side carries ``__yg{i}, __ys, __ye``. Disjoint names keep the join
unambiguous even when y was derived from x (self-join lineage).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

#: auto switches group_equi -> bin when the estimated per-group cross
#: volume |x| * |y| / groups exceeds this. Calibrated on this host:
#: group_equi sustains ~1e8 candidate pairs/sec, and at ~2.6e8 pairs
#: (sf0.1 orders panel) bin already wins by 20-50%; by 2.6e10 (sf1.0)
#: group_equi is 97x slower. 1e8 puts the switch at the measured
#: crossover with margin against the estimate's approx_count_distinct
#: error.
AUTO_BIN_PAIRS = 100_000_000
#: stale-hint padding: an ``auto_stats`` hint whose estimate lands
#: within this factor BELOW the bin cliff triggers a real recheck — a
#: hint computed before a 10x append would otherwise silently keep
#: group_equi right where it becomes quadratic (the measured 97x sf1.0
#: blowout). Hints far below the cliff stay action-free; hints above
#: it pick bin, the direction that is safe even when stale.
AUTO_STATS_RECHECK_BAND = 4


def _group_cond(n_groups: int) -> Optional[Column]:
    cond = None
    for i in range(n_groups):
        c = F.col(f"__g{i}").eqNullSafe(F.col(f"__yg{i}"))
        cond = c if cond is None else (cond & c)
    return cond


def estimate_bin_width(xw: DataFrame, yw: DataFrame, sample_rows: int = 10_000) -> int:
    """Pick a bin width ≈ p90 interval length from a random sample.

    Uses sample()+limit on a 1-column projection: the limit still
    short-circuits the scan, and the Bernoulli sample decorrelates the
    estimate from input order (a head sample is biased whenever data is
    sorted by interval length). Any width is correct; width only tunes
    fan-out (intervals much longer than W explode to many bins; much
    shorter means many unrelated pairs share a bin). p90 of both sides'
    lengths balances the two.
    """
    lens: list[int] = []
    for df, s, e in ((xw, "__xs", "__xe"), (yw, "__ys", "__ye")):
        proj = df.select((F.col(e) - F.col(s) + F.lit(1)).alias("len"))
        rows = proj.sample(0.01, seed=42).limit(sample_rows).collect()
        if not rows:  # tiny input: the 1% sample may miss everything
            rows = proj.limit(sample_rows).collect()
        lens.extend(r["len"] for r in rows if r["len"] is not None)
    if not lens:
        return 1
    lens.sort()
    return max(1, int(lens[min(len(lens) - 1, int(len(lens) * 0.9))]))


def build_overlap_pairs(
    xw: DataFrame,
    yw: DataFrame,
    n_groups: int,
    strategy: str = "auto",
    bin_width: Optional[int] = None,
    skew_salt: Optional[int] = None,
    auto_stats: Optional[tuple] = None,
    how: str = "inner",
) -> DataFrame:
    """Join x intervals to y periods on closed-interval overlap.

    Output carries ``__yg*`` (y group keys), all x columns except its
    group keys, and ``__ys/__ye`` — one row per overlapping (x, y) pair:
    exactly the multiset ``foverlaps`` produces (reference
    timeperiod_functions.R:239-240) minus the unmatched y rows, which
    the caller restores with a completion join.

    ``how="left"`` additionally keeps every UNMATCHED x row exactly once
    with NULL ``__ys/__ye``/y-payload (data.table ``nomatch=NA``); the
    ``__yg*`` columns are then populated from x's own group keys (they
    are null-safe-equal on matched rows, so this is a pure widening).
    The left variant is built INSIDE each physical strategy — a direct
    left-outer join for the equi/broadcast shapes (zero extra
    exchanges) and, for the bin shape, a first-bin null candidate
    resolved by one ``max(matched)`` window over the x identity
    (group keys, start, end) — exactly one extra exchange, no
    dropDuplicates, no anti join, no second scan of x. x rows must be
    unique by (group keys, start, end); ``overlap_join`` documents
    that contract.

    ``auto_stats=(nx, ny, n_groups_distinct)`` feeds the auto picker
    without its stats action (hot paths that know their sizes; the
    numbers only steer the strategy choice, never correctness).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    overlap = (F.col("__xs") <= F.col("__ye")) & (F.col("__xe") >= F.col("__ys"))
    ygcols = [f"__yg{i}" for i in range(n_groups)]
    # for left output, y group keys come from the preserved x side
    out_g = (
        [F.col(f"__g{i}").alias(f"__yg{i}") for i in range(n_groups)]
        if how == "left"
        else [F.col(c) for c in ygcols]
    )
    x_payload = [c for c in xw.columns if not c.startswith("__g")]
    # y-side payload beyond (group keys, __ys, __ye) carries through —
    # empty for the rollup callers, populated by overlap_join
    y_payload = [
        c for c in yw.columns
        if not c.startswith("__yg") and c not in ("__ys", "__ye")
    ]

    if strategy == "auto":
        if not n_groups:
            strategy = "bin"
        else:
            if auto_stats is not None:
                nx, ny, g = auto_stats
                est = (
                    int(nx or 0) * int(ny or 0) // max(1, int(g or 0))
                )
                if AUTO_BIN_PAIRS // AUTO_STATS_RECHECK_BAND < est <= AUTO_BIN_PAIRS:
                    # hint says group_equi but sits inside the cliff's
                    # padding band — pay the one stats action to confirm
                    # against the data as it is NOW
                    auto_stats = None
            if auto_stats is None:
                row = xw.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.approx_count_distinct(
                        F.struct(*[f"__g{i}" for i in range(n_groups)])
                    ).alias("g"),
                ).first()
                nx, g = row["n"], row["g"]
                ny = yw.count()
            g = max(1, int(g or 0))
            strategy = (
                "bin"
                if int(nx or 0) * int(ny or 0) // g > AUTO_BIN_PAIRS
                else "group_equi"
            )

    if strategy in ("group_equi", "broadcast_y", "broadcast_x"):
        gc = _group_cond(n_groups)
        cond = overlap if gc is None else (gc & overlap)
        if how == "left":
            # x is the preserved side. broadcast_x keeps its broadcast by
            # flipping to a right-outer join (BroadcastHashJoin supports
            # BuildLeft + RightOuter, not BuildLeft + LeftOuter).
            if strategy == "broadcast_x":
                pairs = yw.join(F.broadcast(xw), cond, "right")
            else:
                right = F.broadcast(yw) if strategy == "broadcast_y" else yw
                pairs = xw.join(right, cond, "left")
        else:
            left, right = yw, xw
            if strategy == "broadcast_y":
                left = F.broadcast(yw)
            elif strategy == "broadcast_x":
                right = F.broadcast(xw)
            pairs = left.join(right, cond, "inner")
        return pairs.select(*out_g, *x_payload, "__ys", "__ye", *y_payload)

    if strategy == "bin":
        w = bin_width or estimate_bin_width(xw, yw)
        wl = F.lit(int(w))
        xbin = xw.withColumn(
            "__bin",
            F.explode(
                F.sequence(F.floor(F.col("__xs") / wl), F.floor(F.col("__xe") / wl))
            ),
        )
        ybin = yw.withColumn(
            "__ybin",
            F.explode(
                F.sequence(F.floor(F.col("__ys") / wl), F.floor(F.col("__ye") / wl))
            ),
        )
        cond = (
            (F.col("__ybin") == F.col("__bin"))
            & overlap
            # first-shared-bin: count each overlapping pair exactly once,
            # so no post-join dedup — the §4.4 row-count invariant holds
            # by construction.
            & (F.col("__ybin") == F.floor(F.greatest("__xs", "__ys") / wl))
        )
        if skew_salt and skew_salt > 1:
            # Salt hot (group, bin) keys: x rows pick a deterministic
            # salt; y rows replicate across all salts (y is the smaller
            # side for rollup workloads). Joining on (bin, salt) splits
            # a hot bin across skew_salt reducers.
            s = F.lit(int(skew_salt))
            xbin = xbin.withColumn("__salt", F.pmod(F.xxhash64("__xs", "__xe"), s))
            ybin = ybin.withColumn(
                "__ysalt", F.explode(F.sequence(F.lit(0), s - F.lit(1)))
            )
            cond = cond & (F.col("__ysalt") == F.col("__salt"))
        gc = _group_cond(n_groups)
        if gc is not None:
            cond = gc & cond
        if how == "left":
            # Preserve x: a left-outer join over the EXPLODED x emits one
            # NULL row per (x, bin) slot with no bin-local match, so
            # (a) keep NULL candidates only at x's FIRST bin (one
            # candidate per x row, mirroring the first-shared-bin dedup),
            # (b) resolve "matched somewhere else?" with a single
            # max(matched) window over the x identity — one extra
            # exchange vs the inner plan, no anti join, x scanned once.
            from pyspark.sql import Window

            joined = xbin.join(ybin, cond, "left")
            first_bin = F.col("__bin") == F.floor(F.col("__xs") / wl)
            matched = F.col("__ys").isNotNull()
            cand = joined.filter(matched | first_bin)
            wx = Window.partitionBy(
                *[f"__g{i}" for i in range(n_groups)], "__xs", "__xe"
            )
            keep = (
                cand.withColumn(
                    "__has", F.max(matched.cast("int")).over(wx)
                )
                .filter(matched | (F.col("__has") == 0))
            )
            return keep.select(*out_g, *x_payload, "__ys", "__ye", *y_payload)
        pairs = ybin.join(xbin, cond, "inner")
        return pairs.select(*out_g, *x_payload, "__ys", "__ye", *y_payload)

    raise ValueError(f"unknown join strategy: {strategy!r}")
