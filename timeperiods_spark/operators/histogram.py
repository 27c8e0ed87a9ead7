"""Additive histogram partials and exact quantiles per tier.

Beyond the reference's surface (means only): retention-tier consumers
ask for P50/P95/P99 next, and classic quantiles don't merge — but a
LONG-FORM histogram ``(group…, period, bin, count)`` is additive by
construction: merging tiers or batches is just summing counts, exactly
like the engine's other partials (SURVEY.md §2 O7). For bounded-int
values (token counts) with ``bin_width=1`` the quantiles are EXACT at
every tier; for continuous values they are binned approximations with
a caller-chosen resolution.

Scale shape: one explode per interval (same fan-out as
``rollup_regular``), one hash aggregate keyed by (group, period, bin) —
high cardinality, naturally even, map-side combined. Quantile
extraction runs a cumulative window within (group, period): parallelism
is the number of (group, period) keys (the OUTPUT domain — already
many), and each window is at most the bin-domain size.

Counts are overlap-duration weighted (a measurement covering 7 grid
units contributes 7 to its bin), consistent with the engine's
time-weighted semantics.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

from ..errors import RoleValidationError


def rollup_histogram(
    x: DataFrame,
    interval_vars: Sequence[str],
    value_col: str,
    group_vars: Optional[Sequence[str]] = None,
    *,
    width: int,
    origin: int = 0,
    bin_width: float = 1.0,
) -> DataFrame:
    """Long-form histogram partials per (group…, period):
    ``bin = floor(value / bin_width)``, ``count`` = total overlapped
    grid units of rows in that bin. NULL values are excluded (they
    carry no bin). Additive: re-aggregate with ``merge_histograms``
    for cascades/batches."""
    group_vars = list(group_vars or [])
    if width <= 0 or bin_width <= 0:
        raise RoleValidationError("width and bin_width must be positive")
    s, e = interval_vars
    o = F.lit(int(origin))
    w = F.lit(int(width))
    xs = F.col(s).cast("long")
    xe = F.col(e).cast("long")
    exploded = x.filter(F.col(value_col).isNotNull()).select(
        *group_vars,
        xs.alias("__xs"),
        xe.alias("__xe"),
        F.floor(F.col(value_col).cast("double") / F.lit(float(bin_width)))
        .cast("long")
        .alias("bin"),
        F.explode(
            F.sequence(F.floor((xs - o) / w), F.floor((xe - o) / w))
        ).alias("period"),
    )
    ps = (o + F.col("period") * w).cast("long")
    pe = (o + (F.col("period") + 1) * w - 1).cast("long")
    dur = F.least(F.col("__xe"), pe) - F.greatest(F.col("__xs"), ps) + F.lit(1)
    return (
        exploded.select(*group_vars, "period", "bin", dur.alias("__d"))
        .groupBy(*group_vars, "period", "bin")
        .agg(F.sum("__d").cast("long").alias("count"))
    )


def merge_histograms(
    hist: DataFrame,
    group_vars: Optional[Sequence[str]] = None,
    *,
    period_expr=None,
) -> DataFrame:
    """Sum long-form histogram counts (optionally onto a coarser period
    via ``period_expr`` — the cascade operation)."""
    group_vars = list(group_vars or [])
    df = hist
    if period_expr is not None:
        df = df.withColumn("period", period_expr)
    return df.groupBy(*group_vars, "period", "bin").agg(
        F.sum("count").cast("long").alias("count")
    )


def histogram_quantiles(
    hist: DataFrame,
    probs: Sequence[float],
    group_vars: Optional[Sequence[str]] = None,
    *,
    bin_width: float = 1.0,
) -> DataFrame:
    """Quantiles from long-form histograms: for each (group…, period)
    and probability ``p``, the LOWER EDGE of the smallest bin whose
    cumulative count reaches ``ceil(p * total)`` (the inverted-CDF /
    type-1 quantile — exact for ``bin_width=1`` integer data).
    Output: ``group_vars…, period, p, value``."""
    group_vars = list(group_vars or [])
    probs = [float(p) for p in probs]
    if not probs or any(p <= 0 or p > 1 for p in probs):
        raise RoleValidationError("probs must be in (0, 1]")
    keys = group_vars + ["period"]
    w = Window.partitionBy(*keys).orderBy("bin")
    tot = Window.partitionBy(*keys)
    cum = hist.select(
        *keys,
        "bin",
        F.sum("count").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("__cum"),
        F.sum("count").over(tot).alias("__tot"),
    )
    out = cum.select(
        *keys,
        "bin",
        "__cum",
        "__tot",
        F.explode(F.array(*[F.lit(p) for p in probs])).alias("p"),
    ).filter(
        F.col("__cum") >= F.ceil(F.col("p") * F.col("__tot"))
    )
    return (
        out.groupBy(*keys, "p")
        .agg(F.min("bin").alias("__bin"))
        .select(
            *keys,
            "p",
            (F.col("__bin") * F.lit(float(bin_width))).alias("value"),
        )
    )
