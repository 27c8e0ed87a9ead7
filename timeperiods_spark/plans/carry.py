"""Shared bucketed-carry machinery for running/prefix window scans.

Every full-data window partitioned by the group columns caps
parallelism at one task per group — one task TOTAL when ungrouped
(SURVEY.md §2 O2/O22/O26; measured hang on dense low-cardinality
panels). The cure used across the engine is the same three-step shape:

1. add a DETERMINISTIC bucket key ``__bk = floor((t - lo) / W)`` —
   a pure function of the row, unlike ``spark_partition_id`` over a
   range exchange whose sampled boundaries can differ between jobs;
2. run the window within ``(group…, __bk)`` (parallelism =
   groups x buckets);
3. stitch bucket boundaries from a tiny per-(group, bucket) aggregate
   frame — chained with a window over buckets and broadcast-joined
   back null-safely (group keys may be NULL, tests.R:564-580).

Round 2 hand-rolled this three times (interval_avg integrity scan,
remove_overlaps sweep, as-of carry); this module is the single shared
implementation, plus the GROUP-CARDINALITY GUARD the r2 verdict asked
for: the carry frame is one row per (group, bucket), so with many
groups the broadcast would be groups x buckets rows — while a plain
per-group window is ALREADY parallel when groups are many. The plan
therefore buckets only when the estimated group count is below
``4 x defaultParallelism``; above it, ``__bk`` is a constant and the
carry columns are NULL literals (same call-site code path, no carry
frame, no broadcast). The bucket count is additionally capped so the
carry frame never exceeds ``carry_cap_rows``.

The group-count estimate comes from ``approx_count_distinct`` folded
into the SAME action that computes the bucket bounds (no extra job);
callers that know their cardinality pass ``group_count_hint``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec, functions as F

#: bucket when estimated groups < GUARD_FACTOR * defaultParallelism
GUARD_FACTOR = 4
#: never build a carry frame larger than this many (group, bucket) rows
CARRY_CAP_ROWS = 1_000_000
#: skip bucketing entirely when the caller vouches the per-group window
#: input is bounded by the t-domain and that domain is at most this many
#: rows — a per-group window over so few rows beats the carry subtree's
#: extra stages (bucket agg + broadcast), which cost ~1s of fixed wall
#: per job (measured on the tier sweep)
SMALL_DOMAIN_ROWS = 1 << 18


@dataclass
class CarryPlan:
    """A bucketing decision over one frame: ``df`` carries ``__bk``.

    ``lo``/``hi``/``est_groups`` echo the stats the plan used (hinted
    or computed) so a second scan over the same keys can reuse them as
    hints instead of paying another stats action."""

    df: DataFrame
    gcols: list[str]
    bucketed: bool
    empty: bool
    n_buckets: int
    lo: Optional[int] = None
    hi: Optional[int] = None
    est_groups: Optional[int] = None


def plan_buckets(
    df: DataFrame,
    gcols: Sequence[str],
    t_col: str,
    *,
    n_buckets: Optional[int] = None,
    group_count_hint: Optional[int] = None,
    bounds_hint: Optional[tuple] = None,
    carry_cap_rows: int = CARRY_CAP_ROWS,
    rows_bounded_by_domain: bool = False,
) -> CarryPlan:
    """Decide bucketing for a running scan ordered by ``t_col``.

    Needs the t-range (for the bucket width) and the group cardinality
    (for the guard). When the caller supplies both as hints, NO eager
    action runs — important on hot paths where this frame is the
    unmaterialized output of a full source scan (a stats job there is
    a second full pass; measured +67% on the tier sweep). Otherwise
    one agg action computes exactly the missing stats. Hints need not
    be precise: any (lo, hi) roughly covering the data yields correct
    (deterministic, merely less balanced) buckets, and the group count
    only steers the bucket-vs-plain-window choice.

    ``rows_bounded_by_domain=True`` is a caller promise that the frame
    holds at most one row per (group, t) — true for frames already
    AGGREGATED by t (the sweep's delta frame, gap-fill scaffolds),
    false for raw event streams. With it, a known t-domain of at most
    SMALL_DOMAIN_ROWS skips bucketing: the per-group window over so few
    rows is faster than the carry subtree's extra stages.

    ``empty=True`` means no rows or every ``t_col`` NULL — only
    detected when bounds are computed here; callers with bounds hints
    flow through the bucketed path, which is also correct on empty
    frames (the carry frame is just empty).
    """
    gcols = list(gcols)
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    guard = GUARD_FACTOR * par
    if gcols and group_count_hint is not None and int(group_count_hint) >= guard:
        # many groups: per-group windows are already parallel, and a
        # groups x buckets carry frame would be broadcast poison —
        # decidable from the hint alone, no action
        return CarryPlan(
            df.withColumn("__bk", F.lit(0).cast("long")), gcols, False, False, 1,
            est_groups=int(group_count_hint),
        )
    need_bounds = bounds_hint is None
    need_groups = bool(gcols) and group_count_hint is None
    lo = hi = None
    est_groups = 0 if not gcols else group_count_hint
    if need_bounds or need_groups:
        aggs = []
        if need_bounds:
            aggs += [F.min(t_col).alias("__lo"), F.max(t_col).alias("__hi")]
        else:
            aggs += [F.count(F.lit(1)).alias("__n")]
        if need_groups:
            # struct(): approx_count_distinct over bare NULL-able
            # columns drops NULL-key rows; a struct row is never NULL
            aggs.append(F.approx_count_distinct(F.struct(*gcols)).alias("__ng"))
        row = df.agg(*aggs).first()
        if row is None or (need_bounds and row["__lo"] is None) or (
            not need_bounds and row["__n"] == 0
        ):
            return CarryPlan(
                df.withColumn("__bk", F.lit(0).cast("long")), gcols, False, True, 1
            )
        if need_bounds:
            lo, hi = int(row["__lo"]), int(row["__hi"])
        if need_groups:
            est_groups = int(row["__ng"])
    if lo is None:
        lo, hi = int(bounds_hint[0]), int(bounds_hint[1])
    est_groups = int(est_groups or 0)
    if rows_bounded_by_domain and (hi - lo + 1) <= SMALL_DOMAIN_ROWS:
        return CarryPlan(
            df.withColumn("__bk", F.lit(0).cast("long")), gcols, False, False, 1,
            lo=lo, hi=hi, est_groups=est_groups,
        )
    if gcols and est_groups >= guard:
        return CarryPlan(
            df.withColumn("__bk", F.lit(0).cast("long")), gcols, False, False, 1,
            lo=lo, hi=hi, est_groups=est_groups,
        )
    if n_buckets is None:
        n_buckets = max(2, par * 4)
    n_buckets = max(2, min(n_buckets, carry_cap_rows // max(1, est_groups)))
    width = max(1, (hi - lo) // n_buckets + 1)
    out = df.withColumn(
        "__bk", ((F.col(t_col) - F.lit(lo)) / F.lit(width)).cast("long")
    )
    return CarryPlan(
        out, gcols, True, False, n_buckets, lo=lo, hi=hi, est_groups=est_groups
    )


def attach_carry(
    plan: CarryPlan,
    bucket_aggs: Sequence[Column],
    carry_over: Callable[[WindowSpec], Sequence[Column]],
    df: Optional[DataFrame] = None,
) -> DataFrame:
    """Attach per-bucket carry columns to ``plan.df``.

    ``bucket_aggs``: aliased aggregates over ALL rows of each
    (group…, __bk) — use ``F.max(F.when(cond, F.struct(t, …)))`` for
    conditional latest-row carries (skips non-matching rows, orders by
    the leading time field) so every non-empty bucket keeps a frame row.

    ``carry_over(wg)``: aliased window columns over the bucket frame;
    ``wg`` is ordered by ``__bk`` within groups — apply
    ``.rowsBetween(Window.unboundedPreceding, -1)`` for backward
    (prefix) carries or ``F.lead`` for forward handoffs.

    When the plan is unbucketed (many groups / guard tripped), the
    carry columns are attached as typed NULL literals — the per-bucket
    window at the call site is then exactly the per-group window and
    coalescing with NULL carries is the identity. Same call-site code,
    no broadcast.

    ``df`` overrides the frame to aggregate/attach (must carry the
    plan's ``__bk`` column and group keys) — for multi-stage scans
    where a later carry aggregates columns derived after an earlier
    attach (e.g. sessionize: stage 1 carries the previous timestamp,
    stage 2 prefix-sums the session-start flags computed from it).
    """
    gcols = plan.gcols
    src = plan.df if df is None else df
    bdf = src.groupBy(*gcols, "__bk").agg(*bucket_aggs)
    wg = (
        Window.partitionBy(*gcols) if gcols else Window.partitionBy(F.lit(1))
    ).orderBy("__bk")
    carry_cols = list(carry_over(wg))
    carry_frame = bdf.select(
        *[F.col(g).alias(f"__h_{g}") for g in gcols],
        F.col("__bk").alias("__hbk"),
        *carry_cols,
    )
    key_names = {"__hbk"} | {f"__h_{g}" for g in gcols}
    carry_names = [
        f.name for f in carry_frame.schema.fields if f.name not in key_names
    ]
    if not plan.bucketed:
        # typed NULLs, types read off the (never-executed) carry plan
        types = {f.name: f.dataType for f in carry_frame.schema.fields}
        out = src
        for name in carry_names:
            out = out.withColumn(name, F.lit(None).cast(types[name]))
        return out
    cond = F.col("__bk") == F.col("__hbk")
    for g in gcols:
        cond = cond & F.col(g).eqNullSafe(F.col(f"__h_{g}"))
    return (
        src.join(F.broadcast(carry_frame), cond, "left")
        .drop("__hbk", *[f"__h_{g}" for g in gcols])
    )
