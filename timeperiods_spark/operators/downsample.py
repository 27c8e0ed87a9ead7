"""M4 min/max downsampling of long series.

Beyond the reference's surface: the standard width-bounded reduction of
a huge series for plotting/preview (the M4 aggregation of Jugel et al.,
VLDB 2014 — first, last, min, max per time bucket reproduces the exact
pixel-perfect line at a fixed horizontal resolution). At 10^12 points a
raw series cannot leave the cluster; this reduces each (group, bucket)
to at most four rows with ONE hash aggregate — shuffle keyed by
(group, bucket), map-side combined, no window, no sort.

Determinism: within a bucket, value ties resolve to the EARLIEST
period (min-period-among-ties), so results are reproducible and the
DuckDB oracle can mirror the rule exactly.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from ..errors import RoleValidationError


def downsample_m4(
    df: DataFrame,
    period_col: str,
    value_col: str,
    group_vars: Optional[Sequence[str]] = None,
    *,
    bucket_width: int,
    origin: int = 0,
) -> DataFrame:
    """Reduce a series to its M4 skeleton: per (group…, bucket of
    ``bucket_width`` periods), the first, last, minimum-value and
    maximum-value points (deduplicated when they coincide).

    Output: ``group_vars…, bucket, period, value`` — at most 4 rows per
    non-empty bucket, each an ORIGINAL point of the series. NULL values
    are ignored (a bucket of only NULLs vanishes).
    """
    group_vars = list(group_vars or [])
    if bucket_width <= 0:
        raise RoleValidationError("bucket_width must be positive")
    o = F.lit(int(origin))
    p = F.col(period_col).cast("long")
    base = df.filter(F.col(value_col).isNotNull()).select(
        *group_vars,
        F.floor((p - o) / F.lit(int(bucket_width))).alias("bucket"),
        p.alias("__p"),
        F.col(value_col).cast("double").alias("__v"),
    )
    # one aggregate; struct orderings encode the deterministic picks:
    #   first/last  -> min/max over (period, value)   (period is unique
    #                  per series; value rides along)
    #   vmin        -> min over (value, period): earliest period wins
    #                  the value tie
    #   vmax        -> max over (value, -period): max value, then the
    #                  NEGATED period makes the earliest period win the
    #                  tie too (one tie rule everywhere)
    agg = base.groupBy(*group_vars, "bucket").agg(
        F.min(F.struct(F.col("__p"), F.col("__v"))).alias("first"),
        F.max(F.struct(F.col("__p"), F.col("__v"))).alias("last"),
        F.min(F.struct(F.col("__v"), F.col("__p"))).alias("vmin"),
        F.max(F.struct(F.col("__v"), (-F.col("__p")).alias("__np"))).alias("vmax"),
    )
    points = agg.select(
        *group_vars,
        "bucket",
        F.explode(
            F.array(
                F.struct(
                    F.col("first.__p").alias("period"),
                    F.col("first.__v").alias("value"),
                ),
                F.struct(
                    F.col("last.__p").alias("period"),
                    F.col("last.__v").alias("value"),
                ),
                F.struct(
                    F.col("vmin.__p").alias("period"),
                    F.col("vmin.__v").alias("value"),
                ),
                F.struct(
                    (-F.col("vmax.__np")).alias("period"),
                    F.col("vmax.__v").alias("value"),
                ),
            )
        ).alias("pt"),
    ).select(*group_vars, "bucket", "pt.period", "pt.value")
    return points.dropDuplicates(group_vars + ["bucket", "period"])


def rollup_ohlc(
    df: DataFrame,
    period_col: str,
    value_col: str,
    group_vars: Optional[Sequence[str]] = None,
    *,
    bucket_width: int,
    origin: int = 0,
) -> DataFrame:
    """OHLC bars: per (group…, bucket of ``bucket_width`` periods) the
    opening value (earliest period in the bucket), the closing value
    (latest period), the high and the low, plus ``n_obs`` and
    ``sum_value`` (the volume analogue when ``value_col`` is a size).

    The financial-bar reduction is the other canonical regular-grid
    rollup next to M4 (reference rollups cover means/extremes only,
    timeperiod_functions.R:300-347 — open/close need an order-aware
    pick the reference has no operator for). Same plan discipline as
    ``downsample_m4``: ONE hash aggregate keyed (group…, bucket) with
    map-side combine — no window, no sort, no join, so the shuffle
    carries one row per bar at any corpus size.

    Determinism under period ties (two observations on the same grid
    point): open resolves to the SMALLEST value among the tied earliest
    periods and close to the LARGEST value among the tied latest — the
    struct orderings (period, value) / max(period, value) encode both
    rules in the aggregate itself. NULL values are ignored; a bucket of
    only NULLs vanishes (matches M4).
    """
    group_vars = list(group_vars or [])
    if bucket_width <= 0:
        raise RoleValidationError("bucket_width must be positive")
    o = F.lit(int(origin))
    p = F.col(period_col).cast("long")
    base = df.filter(F.col(value_col).isNotNull()).select(
        *group_vars,
        F.floor((p - o) / F.lit(int(bucket_width))).alias("bucket"),
        p.alias("__p"),
        F.col(value_col).cast("double").alias("__v"),
    )
    agg = base.groupBy(*group_vars, "bucket").agg(
        F.min(F.struct(F.col("__p"), F.col("__v"))).alias("__open"),
        F.max(F.struct(F.col("__p"), F.col("__v"))).alias("__close"),
        F.max(F.col("__v")).alias("high"),
        F.min(F.col("__v")).alias("low"),
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col("__v")).alias("sum_value"),
    )
    return agg.select(
        *group_vars,
        "bucket",
        F.col("__open.__v").alias("open"),
        F.col("high"),
        F.col("low"),
        F.col("__close.__v").alias("close"),
        F.col("n_obs"),
        F.col("sum_value"),
    )
