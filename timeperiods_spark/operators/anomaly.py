"""Baseline-relative diagnostics: trailing z-score anomaly flags and
seasonal adjustment.

Beyond the reference's surface — the monitoring layer a tier store
feeds: "flag periods that sit k sigmas off their own trailing
baseline" and "remove the weekly shape before comparing days".

Scale shapes (both pure DataFrame ops, no windows over raw data):

* ``zscore_anomaly`` reuses the rolling-family fan-out: each
  observation contributes to the k FOLLOWING periods' baselines
  (map-side ``explode(sequence(p+1, p+k))``), one hash aggregate
  builds sum/sumsq/count per (group, period), and an equi join back
  attaches the baseline to each observed row. The baseline window is
  strictly PRECEDING (``[p-k, p-1]``), so a spike never dilutes its
  own detection. Two shuffles keyed by (group, period) at any group
  cardinality.

* ``seasonal_adjust`` is two hash aggregates (per-(group, season) and
  per-group means) broadcast back — the classical additive
  decomposition ``v - seasonal_mean + group_mean``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F, types as T

from ..errors import RoleValidationError
from .trend import _order_long


def zscore_anomaly(
    df: DataFrame,
    period_col: str,
    value_col: str,
    group_vars: Optional[Sequence[str]] = None,
    *,
    k: int,
    z: float = 3.0,
    min_obs: int = 3,
) -> DataFrame:
    """Flag observations more than ``z`` standard deviations from the
    mean of their own trailing baseline (the ``k`` periods strictly
    before, ``[p-k, p-1]``).

    Output: ``group_vars…, period_col, value_col, base_mean,
    base_std, zscore, is_anomaly`` — statistics rounded to 6dp, the
    flag computed on the ROUNDED zscore (cross-engine stable). Rows
    whose baseline has fewer than ``min_obs`` observations (or zero
    variance) get NULL ``zscore`` and ``is_anomaly = false`` — warmup
    and constant stretches are not anomalies. NULL periods/values are
    excluded.

    ``period_col`` must already be ON the period grid (consecutive
    periods differ by 1): an integer period index or a DATE for daily
    grids. A raw TimestampType is REJECTED — its long form is epoch
    MICROSECONDS, so the trailing ``[p-k, p-1]`` baseline would span k
    microseconds, every baseline would be silently empty, and every
    zscore NULL (ADVICE r5). Grid timestamps explicitly first, e.g.
    ``F.unix_timestamp(ts) / 3600`` floor-divided for hourly periods
    or ``rollup_regular``'s tier outputs.
    """
    if k <= 0:
        raise RoleValidationError("k must be a positive number of periods")
    if min_obs < 2:
        raise RoleValidationError("min_obs must be at least 2")
    if isinstance(df.schema[period_col].dataType, T.TimestampType):
        raise RoleValidationError(
            f"zscore_anomaly: {period_col} is a timestamp; the trailing "
            f"baseline [p-{k}, p-1] would span {k} MICROSECONDS and every "
            "baseline would be empty. Convert to the period grid first "
            "(e.g. floor(unix_timestamp(ts) / 3600) for hourly periods, "
            "or a date column for daily ones)."
        )
    gcols = list(group_vars or [])
    base = df.filter(
        F.col(period_col).isNotNull() & F.col(value_col).isNotNull()
    )
    base = base.select(
        *gcols,
        F.col(period_col).alias("__pv"),
        _order_long(base, period_col, "zscore_anomaly").alias("__p"),
        F.col(value_col).cast("double").alias("__v"),
    )
    # NOTE: two consumers re-run the upstream (baseline fan-out
    # aggregate + join-back row stream); a per-call persist was
    # measured and WITHDRAWN (frozen-oracle 6dp-boundary interference,
    # OPTIMIZATION_r07.md) — persist the rollup input upstream instead.
    contrib = base.select(
        *gcols,
        F.col("__v"),
        F.explode(F.sequence(F.col("__p") + 1, F.col("__p") + F.lit(int(k))))
        .alias("__tp"),
    )
    stats = contrib.groupBy(*gcols, "__tp").agg(
        F.sum("__v").alias("__s"),
        F.sum(F.col("__v") * F.col("__v")).alias("__ss"),
        F.count(F.lit(1)).alias("__n"),
    )
    cond = F.col("__p") == F.col("__tp")
    for g in gcols:
        cond = cond & F.col(g).eqNullSafe(F.col(f"__h_{g}"))
    stats = stats.select(
        *[F.col(g).alias(f"__h_{g}") for g in gcols], "__tp", "__s", "__ss", "__n"
    )
    j = base.join(stats, cond, "left").drop(
        "__tp", *[f"__h_{g}" for g in gcols]
    )
    n = F.coalesce(F.col("__n"), F.lit(0))
    mean = F.col("__s") / n
    var = F.col("__ss") / n - mean * mean
    # clamp tiny negative cancellation noise; a TRUE zero-variance
    # baseline yields NULL zscore below
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    ok = (n >= int(min_obs)) & (F.round(std, 6) > 0.0)
    zs = F.when(ok, F.round((F.col("__v") - mean) / std, 6))
    return j.select(
        *gcols,
        F.col("__pv").alias(period_col),
        F.col("__v").alias(value_col),
        F.when(n > 0, F.round(mean, 6)).alias("base_mean"),
        F.when(n > 0, F.round(std, 6)).alias("base_std"),
        zs.alias("zscore"),
        F.coalesce(F.abs(zs) > F.lit(float(z)), F.lit(False)).alias("is_anomaly"),
    )


def seasonal_adjust(
    df: DataFrame,
    t_col: str,
    value_col: str,
    group_vars: Optional[Sequence[str]] = None,
    *,
    season_length: int,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Additive seasonal adjustment: subtract the (group, phase) mean
    and re-center on the group mean, where phase = ``t mod
    season_length`` (day-of-week for daily data with
    ``season_length=7``). Output adds ``season`` (the phase),
    ``seasonal_mean``, and ``<value>_adj`` (rounded to 6dp).

    Two hash aggregates over the OUTPUT domain (groups x phases, then
    groups) broadcast back onto the rows — no window, no sort, scales
    with any group cardinality. NULL times/values pass through with
    NULL adjustments.
    """
    if season_length <= 0:
        raise RoleValidationError("season_length must be positive")
    out_col = out_col or f"{value_col}_adj"
    gcols = list(group_vars or [])
    t_type = df.schema[t_col].dataType
    if isinstance(t_type, T.DateType):
        t_long = F.unix_date(F.col(t_col)).cast("long")
    elif isinstance(t_type, T.TimestampType):
        t_long = F.unix_micros(F.col(t_col))
    else:
        t_long = F.col(t_col).try_cast("long")
    season = F.pmod(t_long, F.lit(int(season_length)))
    src = df.withColumn("__season", season)
    # NOTE deliberately NOT persisted despite three consumers (seasonal
    # means, group means, the adjusted row stream): caching changes the
    # partition layout feeding the avg() aggregates, which reorders the
    # float partial sums — measured flipping a 6dp-boundary seasonal
    # mean in-session (avgs of 6dp-rounded inputs land exactly on
    # rounding boundaries). Recomputing the upstream twice more is the
    # price of cross-run 6dp stability here; callers can pre-persist
    # their own input when they don't need boundary-exact rounding.
    smean = src.groupBy(*gcols, "__season").agg(
        F.avg(F.col(value_col).cast("double")).alias("__smean")
    ).select(
        *[F.col(g).alias(f"__h_{g}") for g in gcols],
        F.col("__season").alias("__season2"),
        "__smean",
    )
    gmean = src.groupBy(*gcols).agg(
        F.avg(F.col(value_col).cast("double")).alias("__gmean")
    ).select(
        *[F.col(g).alias(f"__g_{g}") for g in gcols], "__gmean"
    )
    cond_s = F.col("__season") == F.col("__season2")
    for g in gcols:
        cond_s = cond_s & F.col(g).eqNullSafe(F.col(f"__h_{g}"))
    cond_g = F.lit(True)
    for g in gcols:
        cond_g = cond_g & F.col(g).eqNullSafe(F.col(f"__g_{g}"))
    # mean frames are OUTPUT-domain sized (groups x phases / groups);
    # leave broadcast to AQE — tiny panels broadcast, huge ones SMJ
    out = src.join(smean, cond_s, "left").join(gmean, cond_g, "left")
    adj = F.col(value_col).cast("double") - F.col("__smean") + F.col("__gmean")
    return out.select(
        *df.columns,
        F.col("__season").alias("season"),
        F.round("__smean", 6).alias("seasonal_mean"),
        F.round(adj, 6).alias(out_col),
    )
