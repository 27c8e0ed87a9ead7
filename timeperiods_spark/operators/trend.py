"""Trend and change-detection scans: EWMA smoothing and CUSUM charts.

Beyond the reference's surface (reference timeperiod_functions.R keeps
no recurrence operators — its consumers smooth tier rollups after the
fact); these are the standard feature-engineering companions to the
rollup/rolling family for a 100 TB series store.

Both statistics are first-order recurrences — the one scan shape a
Catalyst window function cannot express (the weight of each input
depends on its distance from the current row). They take two very
different Spark-first treatments:

* ``cusum`` has an exact closed prefix form —
  ``s_i = max(0, s_{i-1} + x_i)`` telescopes to
  ``P_i - min(0, min_{j<=i} P_j)`` over the prefix sums ``P`` — so it
  stays 100% native: one bucketed-carry prefix sum, one chained
  bucketed-carry running min (both through ``plans.carry``; no
  per-group window ceiling, no Python).

* ``ewma`` does not: the rescaled-window-sum trick
  (``e_i = r^i * sum v_j r^-j``) overflows float64 beyond
  ``~700/|ln r|`` rows, and chunking it re-introduces a scan at every
  level. This is the canonical "drop to pandas" case: an Arrow-batched
  ``ewm`` recurrence within each (group, carry-bucket) — C-vectorized,
  shuffled by (group, bucket) so parallelism is bucket count, never
  group count — composed EXACTLY across buckets by a higher-order
  ``aggregate`` scan over the tiny per-group bucket frame
  (``e_i = local_i + r^(m+1) * chain``, where ``chain`` folds each
  bucket's end-value and decay ``r^n_b`` left to right).

Numeric note shared with the rolling/interp oracles: bucketed
composition reorders float additions vs a sequential recurrence, so
both operators emit statistics ROUNDED to 6dp; EWMA's formulation
error is O(eps / alpha) (old terms decay), far below that grid.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F, types as T

from ..errors import RoleValidationError
from ..plans.carry import attach_carry, plan_buckets


def _order_long(df: DataFrame, t_col: str, op: str):
    """Order column as a non-NULL long (epoch days for dates,
    microseconds for timestamps), with a row-local raise on NULL — a
    NULL order key would silently corrupt the prefix scans (same
    contract as pack_sequences / running_max)."""
    t_type = df.schema[t_col].dataType
    if isinstance(t_type, T.DateType):
        # DATE->BIGINT casts are forbidden under ANSI; unix_date gives
        # the epoch-day grid the bucket function needs
        expr = F.unix_date(F.col(t_col)).cast("long")
    elif isinstance(t_type, T.TimestampType):
        expr = F.unix_micros(F.col(t_col))
    else:
        expr = F.col(t_col).try_cast("long")
    return F.when(
        expr.isNull(),
        F.raise_error(
            F.concat(
                F.lit(f"{op}: {t_col} must be a non-NULL orderable "
                      "(numeric/date/timestamp) column; got "),
                F.coalesce(F.col(t_col).cast("string"), F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(expr)


def cusum(
    df: DataFrame,
    t_col: str,
    value_col: str,
    group_vars: Optional[Sequence[str]] = None,
    *,
    target: float = 0.0,
    slack: float = 0.0,
    threshold: Optional[float] = None,
    two_sided: bool = True,
    carry_hints: Optional[dict] = None,
) -> DataFrame:
    """Tabular CUSUM control statistics per group, ordered by ``t_col``.

    ``cusum_pos_i = max(0, cusum_pos_{i-1} + (v_i - target - slack))``
    accumulates upward shifts; with ``two_sided``, ``cusum_neg``
    symmetrically accumulates downward ones. Computed in closed form:
    with ``x_i = v_i - target - slack`` and prefix sums ``P``,
    ``cusum_pos_i = P_i - min(0, min_{j<=i} P_j)``. Exact semantics,
    zero Python, two slim exchanges at any group cardinality.

    ``threshold`` adds an ``alarm`` flag (a statistic ROUNDED to 6dp
    exceeds it — rounded so engines differing in last-bit float sums
    flag identically). NULL values pass through with NULL statistics
    (they don't advance the chart). Duplicate ``t`` within a group
    raise row-locally (the recurrence order would be nondeterministic);
    the raise is threaded through the output ``t`` column so Catalyst
    cannot prune it.
    """
    gcols = list(group_vars or [])
    hints = dict(carry_hints or {})
    base = (
        df.withColumn("__t", _order_long(df, t_col, "cusum"))
        .select(
            *gcols,
            F.col(t_col).alias("__tv"),
            "__t",
            F.col(value_col).cast("double").alias("__v"),
        )
        .withColumn(
            "__x", F.col("__v") - F.lit(float(target)) - F.lit(float(slack))
        )
    )
    if two_sided:
        base = base.withColumn(
            "__xn",
            -(F.col("__v") - F.lit(float(target))) - F.lit(float(slack)),
        )
    xcols = ["__x"] + (["__xn"] if two_sided else [])

    plan = plan_buckets(
        base, gcols, "__t",
        group_count_hint=hints.get("groups"), bounds_hint=hints.get("span"),
    )
    wb = Window.partitionBy(*plan.gcols, "__bk").orderBy("__t")
    w01 = wb.rowsBetween(Window.unboundedPreceding, 0)

    # stage 1: prefix sum of each x stream (sum skips NULLs but NULL
    # rows keep their position in the order)
    stitched = attach_carry(
        plan,
        [F.sum(c).alias(f"__bs_{c}") for c in xcols],
        lambda wg: [
            F.sum(f"__bs_{c}")
            .over(wg.rowsBetween(Window.unboundedPreceding, -1))
            .alias(f"__cs_{c}")
            for c in xcols
        ],
    )
    for c in xcols:
        stitched = stitched.withColumn(
            f"__P{c}",
            F.sum(c).over(w01) + F.coalesce(F.col(f"__cs_{c}"), F.lit(0.0)),
        )
    stitched = stitched.drop(*[f"__cs_{c}" for c in xcols])

    # stage 2: running min of each prefix stream — a chained scan over
    # the SAME buckets (attach_carry(df=) aggregates stage-1 output)
    stage2 = attach_carry(
        plan,
        [F.min(f"__P{c}").alias(f"__bm_{c}") for c in xcols],
        lambda wg: [
            F.min(f"__bm_{c}")
            .over(wg.rowsBetween(Window.unboundedPreceding, -1))
            .alias(f"__cm_{c}")
            for c in xcols
        ],
        df=stitched,
    )
    # duplicate-order guard: equal t values always share a bucket
    # (buckets are pure value functions of t), so a within-bucket lag
    # sees every duplicate; threading the raise through the OUTPUT t
    # column keeps it un-prunable
    dup = F.lag("__t").over(wb) == F.col("__t")
    guarded_t = F.when(
        dup,
        F.raise_error(F.concat(
            F.lit(f"cusum: duplicate {t_col} within a group at order value "),
            F.col("__t").cast("string"),
        )).cast(df.schema[t_col].dataType),
    ).otherwise(F.col("__tv"))

    out_cols = [*gcols, guarded_t.alias(t_col), F.col("__v").alias(value_col)]
    names = [("__x", "cusum_pos")] + ([("__xn", "cusum_neg")] if two_sided else [])
    for c, out in names:
        runmin = F.least(
            F.min(f"__P{c}").over(w01),
            F.coalesce(F.col(f"__cm_{c}"), F.lit(0.0)),
            F.lit(0.0),
        )
        stat = F.round(F.col(f"__P{c}") - runmin, 6)
        stage2 = stage2.withColumn(out, F.when(F.col("__v").isNotNull(), stat))
        out_cols.append(F.col(out))
    if threshold is not None:
        alarm = F.col("cusum_pos") > F.lit(float(threshold))
        if two_sided:
            alarm = alarm | (F.col("cusum_neg") > F.lit(float(threshold)))
        stage2 = stage2.withColumn("alarm", F.coalesce(alarm, F.lit(False)))
        out_cols.append(F.col("alarm"))
    return stage2.select(*out_cols)


def ewma(
    df: DataFrame,
    t_col: str,
    value_col: str,
    group_vars: Optional[Sequence[str]] = None,
    *,
    alpha: Optional[float] = None,
    span: Optional[float] = None,
    init: str = "first",
    out_col: str = "ewma",
    carry_hints: Optional[dict] = None,
) -> DataFrame:
    """Exponentially weighted moving average per group, ordered by
    ``t_col`` (pandas ``ewm(adjust=False)`` recurrence).

    ``init="first"`` seeds with the first observation (``e_0 = v_0``,
    the pandas default); ``init="zero"`` seeds with 0
    (``e_i = alpha * sum v_j r^(i-j)``). ``span`` is the pandas
    convenience (``alpha = 2/(span+1)``). Rows with NULL values are
    EXCLUDED (the recurrence skips them — pandas ``ignore_na=True``);
    duplicate ``t`` within a group raise inside the batch.

    Scale shape: the within-bucket recurrence runs as one Arrow batch
    per (group, carry-bucket) — work distributes by bucket, so a
    5-group 100 TB panel still fans out; the cross-bucket composition
    is an exact higher-order-function scan over the per-group bucket
    frame (#buckets entries, broadcast back). When the carry planner
    decides buckets don't pay (many groups / tiny domain), each group
    is one Arrow batch and the composition stage vanishes.
    """
    if (alpha is None) == (span is None):
        raise RoleValidationError("ewma: pass exactly one of alpha= or span=")
    if span is not None:
        alpha = 2.0 / (float(span) + 1.0)
    alpha = float(alpha)
    if not (0.0 < alpha <= 1.0):
        raise RoleValidationError(f"ewma: alpha must be in (0, 1], got {alpha}")
    if init not in ("first", "zero"):
        raise RoleValidationError("ewma: init must be 'first' or 'zero'")
    r = 1.0 - alpha
    gcols = list(group_vars or [])
    hints = dict(carry_hints or {})

    base = (
        df.withColumn("__t", _order_long(df, t_col, "ewma"))
        .filter(F.col(value_col).isNotNull())
        .select(*gcols, F.col(t_col).alias("__tv"), "__t",
                F.col(value_col).cast("double").alias("__v"))
    )
    plan = plan_buckets(
        base, gcols, "__t",
        group_count_hint=hints.get("groups"), bounds_hint=hints.get("span"),
    )
    src = plan.df
    whole_group = not plan.bucketed  # each batch is a full group chain

    in_schema = src.schema
    out_schema = T.StructType(
        [in_schema[g] for g in gcols]
        + [
            T.StructField("__bk", T.LongType()),
            in_schema["__tv"],
            T.StructField("__t", T.LongType()),
            T.StructField("__v", T.DoubleType()),
            T.StructField("__local", T.DoubleType()),
            T.StructField("__decay0", T.DoubleType()),
        ]
    )
    a_, r_, tname, init_ = alpha, r, t_col, init

    def _batch(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__t", kind="mergesort").reset_index(drop=True)
        if pdf["__t"].duplicated().any():
            d = int(pdf["__t"][pdf["__t"].duplicated()].iloc[0])
            raise ValueError(
                f"ewma: duplicate {tname} within a group (order value {d})"
            )
        v = pdf["__v"].to_numpy(dtype="float64")
        if whole_group and init_ == "first":
            local = pd.Series(v).ewm(alpha=a_, adjust=False).mean().to_numpy()
        else:
            # zero-seeded: prepend a 0 so e_(-1) = 0, drop it after
            seeded = np.concatenate(([0.0], v))
            local = (
                pd.Series(seeded).ewm(alpha=a_, adjust=False).mean().to_numpy()[1:]
            )
        pdf["__local"] = local
        # r^m; underflow to 0.0 is correct (those carry contributions
        # are below float64 resolution by construction)
        with np.errstate(under="ignore"):
            pdf["__decay0"] = np.power(r_, np.arange(len(v), dtype="float64"))
        return pdf[[*gcols, "__bk", "__tv", "__t", "__v", "__local", "__decay0"]]

    local = src.groupBy(*gcols, "__bk").applyInPandas(_batch, out_schema)

    if whole_group:
        # init handled inside the batch; no cross-bucket composition
        return local.select(
            *gcols, F.col("__tv").alias(t_col), F.col("__v").alias(value_col),
            F.round("__local", 6).alias(out_col),
        )

    # ---- cross-bucket composition (bucketed plan: frame is tiny) ----
    # per-bucket facts: end-of-bucket zero-seed value, bucket decay
    # r^n_b, and the bucket's first value (for init="first")
    bstats = local.groupBy(*gcols, "__bk").agg(
        F.max(F.struct("__t", "__local")).getField("__local").alias("__e_end"),
        F.count(F.lit(1)).alias("__n"),
        F.min(F.struct("__t", "__v")).getField("__v").alias("__vf"),
    ).withColumn("__D", F.pow(F.lit(r), F.col("__n").cast("double")))
    # HOF left scan over the per-group bucket list:
    # state = (chain value so far, r^(rows before), emitted entries)
    per_group = bstats.groupBy(*gcols).agg(
        F.array_sort(
            F.collect_list(F.struct(
                F.col("__bk").alias("bk"), F.col("__e_end").alias("e_end"),
                F.col("__D").alias("D"), F.col("__vf").alias("vf"),
            ))
        ).alias("__bl")
    )
    scan_state = (
        "struct<chain: double, rb: double, "
        "out: array<struct<bk: bigint, cin: double, rbef: double>>>"
    )
    scanned = per_group.withColumn(
        "__scan",
        F.aggregate(
            "__bl",
            F.expr(
                "named_struct('chain', cast(0.0 as double), 'rb', "
                "cast(1.0 as double), 'out', cast(array() as "
                "array<struct<bk: bigint, cin: double, rbef: double>>))"
            ).cast(scan_state),
            lambda acc, b: F.struct(
                (b["e_end"] + b["D"] * acc["chain"]).alias("chain"),
                (acc["rb"] * b["D"]).alias("rb"),
                F.concat(
                    acc["out"],
                    F.array(F.struct(
                        b["bk"].alias("bk"), acc["chain"].alias("cin"),
                        acc["rb"].alias("rbef"),
                    )),
                ).alias("out"),
            ),
        ),
    ).select(
        *[F.col(g).alias(f"__h_{g}") for g in gcols],
        F.element_at("__bl", 1).getField("vf").alias("__v0"),
        F.explode("__scan.out").alias("__s"),
    ).select(
        *[f"__h_{g}" for g in gcols], "__v0",
        F.col("__s.bk").alias("__hbk"), F.col("__s.cin").alias("__cin"),
        F.col("__s.rbef").alias("__rbef"),
    )
    cond = F.col("__bk") == F.col("__hbk")
    for g in gcols:
        cond = cond & F.col(g).eqNullSafe(F.col(f"__h_{g}"))
    joined = local.join(F.broadcast(scanned), cond, "left")
    # e_zero = local + r^(m+1) * chain-before-bucket
    e = F.col("__local") + F.lit(r) * F.col("__decay0") * F.coalesce(
        F.col("__cin"), F.lit(0.0)
    )
    if init == "first":
        # first-seeding adds (1-alpha) * v_0 * r^(global row index)
        e = e + F.lit(r) * F.col("__v0") * F.col("__rbef") * F.col("__decay0")
    return joined.select(
        *gcols, F.col("__tv").alias(t_col), F.col("__v").alias(value_col),
        F.round(e, 6).alias(out_col),
    )
