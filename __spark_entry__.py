"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry pairs a timeperiods_spark operator invocation
with an independent ANSI-SQL formulation of the same semantics in
``oracle_sql()`` (DuckDB). Inputs are constructed deterministically
from the driver's parquet tables with identical window/arithmetic
expressions on both sides; every float output is rounded to 6 dp on
both sides so summation order cannot flip the value hash.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timeperiods_spark import (  # noqa: E402
    cascade,
    compress_series,
    decompress_series,
    gap_fill_locf,
    grouped_cartesian,
    interval_weighted_avg,
    remove_overlaps,
    rollup_regular,
    finalize_rollup,
)
from timeperiods_spark.sources.tokens import (  # noqa: E402
    H1,
    N_TOK,
    VOCAB,
    token_table,
    token_table_oracle_sql,
)

N_TOKEN_DOCS = 2000  # fixed so the token queries are sf-independent

_R = 6  # rounding digits for double outputs (both engines)


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --------------------------------------------------------------------
# shared deterministic input constructions (Spark side)
# --------------------------------------------------------------------


def _x_orders(spark, sf_dir):
    """Non-overlapping weekly intervals per group from orders:
    row_number within g = o_custkey % 20 -> [7rn-6, 7rn]."""
    o = _orders(spark, sf_dir)
    w = Window.partitionBy("g").orderBy("o_orderkey")
    return (
        o.select(
            (F.col("o_custkey") % 20).cast("int").alias("g"),
            "o_orderkey",
            "o_totalprice",
        )
        .withColumn("rn", F.row_number().over(w))
        .select(
            "g",
            (7 * F.col("rn") - 6).cast("long").alias("s"),
            (7 * F.col("rn")).cast("long").alias("e"),
            F.col("o_totalprice").alias("v"),
        )
    )


def _y_regular(spark, groups_df, n_periods: int, width: int):
    per = spark.range(n_periods).select(
        (F.col("id") * width).cast("long").alias("s"),
        (F.col("id") * width + width - 1).cast("long").alias("e"),
    )
    return groups_df.crossJoin(per)


def _finish(df, value_cols, int_cols=("xduration",), ivl_cols=("s", "e")):
    """Round doubles, normalize integer widths for stable hashing."""
    out = df
    for c in value_cols:
        out = out.withColumn(c, F.round(F.col(c).cast("double"), _R))
    for c in ivl_cols:
        out = out.withColumn(c, F.col(c).cast("long"))
    return out


# --------------------------------------------------------------------
# queries
# --------------------------------------------------------------------


def q_iwa_grouped(spark, sf_dir):
    x = _x_orders(spark, sf_dir)
    y = _y_regular(spark, x.select("g").distinct(), 200, 30)
    out = interval_weighted_avg(
        x, y, ("s", "e"), ("v",), ("g",), required_percentage=50.0, validate=False
    )
    return _finish(out, ["v", "yduration"]).select(
        "g",
        "s",
        "e",
        "v",
        "yduration",
        F.col("xduration").cast("long").alias("xduration"),
        F.col("nobs_v").cast("long").alias("nobs_v"),
        F.col("xminstart").cast("long").alias("xminstart"),
        F.col("xmaxend").cast("long").alias("xmaxend"),
    )


SQL_IWA_CORE = """
WITH x AS (
  SELECT CAST(o_custkey % 20 AS INT) AS g,
         CAST(7*ROW_NUMBER() OVER (PARTITION BY o_custkey % 20 ORDER BY o_orderkey) - 6 AS BIGINT) AS s,
         CAST(7*ROW_NUMBER() OVER (PARTITION BY o_custkey % 20 ORDER BY o_orderkey) AS BIGINT) AS e,
         o_totalprice AS v
  FROM orders
),
y AS (
  SELECT g, CAST(30*p AS BIGINT) AS s, CAST(30*p + 29 AS BIGINT) AS e
  FROM (SELECT DISTINCT CAST(o_custkey % 20 AS INT) AS g FROM orders)
  CROSS JOIN (SELECT range AS p FROM range(200))
),
j AS (
  SELECT y.g, y.s AS ys, y.e AS ye,
         CASE WHEN x.s IS NULL THEN NULL ELSE GREATEST(x.s, y.s) END AS cs,
         CASE WHEN x.e IS NULL THEN NULL ELSE LEAST(x.e, y.e) END AS ce, x.v
  FROM y LEFT JOIN x ON x.g = y.g AND x.s <= y.e AND x.e >= y.s
),
a AS (
  SELECT g, ys, ye,
         COALESCE(SUM(ce - cs + 1), 0) AS xdur,
         COALESCE(SUM(CASE WHEN v IS NOT NULL THEN ce - cs + 1 END), 0) AS nobs,
         SUM(v * (ce - cs + 1)) AS sumprod,
         MIN(cs) AS mn, MAX(ce) AS mx
  FROM j GROUP BY g, ys, ye
)
SELECT g, ys AS s, ye AS e,
       ROUND(CASE WHEN 100.0*nobs/(ye - ys + 1) < 50 OR nobs = 0 THEN NULL
                  ELSE sumprod/nobs END, 6) AS v,
       ROUND(CAST(ye - ys + 1 AS DOUBLE), 6) AS yduration,
       CAST(xdur AS BIGINT) AS xduration,
       CAST(nobs AS BIGINT) AS nobs_v,
       CAST(mn AS BIGINT) AS xminstart,
       CAST(mx AS BIGINT) AS xmaxend
FROM a
"""


def q_iwa_dates(spark, sf_dir):
    o = _orders(spark, sf_dir)
    w = Window.partitionBy("g").orderBy("o_orderkey")
    base = F.lit("1994-01-01").cast("date")
    x = (
        o.select(
            (F.col("o_custkey") % 10).cast("int").alias("g"),
            "o_orderkey",
            "o_totalprice",
        )
        .withColumn("rn", F.row_number().over(w))
        .select(
            "g",
            F.date_add(base, (7 * (F.col("rn") - 1)).cast("int")).alias("s"),
            F.date_add(base, (7 * F.col("rn") - 1).cast("int")).alias("e"),
            F.col("o_totalprice").alias("v"),
        )
    )
    per = spark.range(60).select(
        F.date_add(base, (F.col("id") * 91).cast("int")).alias("s"),
        F.date_add(base, (F.col("id") * 91 + 90).cast("int")).alias("e"),
    )
    y = x.select("g").distinct().crossJoin(per)
    out = interval_weighted_avg(
        x, y, ("s", "e"), ("v",), ("g",), required_percentage=100.0, validate=False
    )
    return out.select(
        "g",
        "s",
        "e",
        F.round(F.col("v").cast("double"), _R).alias("v"),
        F.round(F.col("yduration").cast("double"), _R).alias("yduration"),
        F.col("xduration").cast("long").alias("xduration"),
        F.col("nobs_v").cast("long").alias("nobs_v"),
        "xminstart",
        "xmaxend",
    )


SQL_IWA_DATES = """
WITH x AS (
  SELECT CAST(o_custkey % 10 AS INT) AS g,
         DATE '1994-01-01' + CAST(7*(ROW_NUMBER() OVER (PARTITION BY o_custkey % 10 ORDER BY o_orderkey) - 1) AS INT) AS s,
         DATE '1994-01-01' + CAST(7*ROW_NUMBER() OVER (PARTITION BY o_custkey % 10 ORDER BY o_orderkey) - 1 AS INT) AS e,
         o_totalprice AS v
  FROM orders
),
y AS (
  SELECT g, DATE '1994-01-01' + CAST(91*p AS INT) AS s,
            DATE '1994-01-01' + CAST(91*p + 90 AS INT) AS e
  FROM (SELECT DISTINCT CAST(o_custkey % 10 AS INT) AS g FROM orders)
  CROSS JOIN (SELECT range AS p FROM range(60))
),
j AS (
  SELECT y.g, y.s AS ys, y.e AS ye,
         CASE WHEN x.s IS NULL THEN NULL ELSE GREATEST(x.s, y.s) END AS cs,
         CASE WHEN x.e IS NULL THEN NULL ELSE LEAST(x.e, y.e) END AS ce, x.v
  FROM y LEFT JOIN x ON x.g = y.g AND x.s <= y.e AND x.e >= y.s
),
a AS (
  SELECT g, ys, ye,
         COALESCE(SUM(ce - cs + 1), 0) AS xdur,
         COALESCE(SUM(CASE WHEN v IS NOT NULL THEN ce - cs + 1 END), 0) AS nobs,
         SUM(v * (ce - cs + 1)) AS sumprod,
         MIN(cs) AS mn, MAX(ce) AS mx
  FROM j GROUP BY g, ys, ye
)
SELECT g, ys AS s, ye AS e,
       ROUND(CASE WHEN 100.0*nobs/(ye - ys + 1) < 100 OR nobs = 0 THEN NULL
                  ELSE sumprod/nobs END, 6) AS v,
       ROUND(CAST(ye - ys + 1 AS DOUBLE), 6) AS yduration,
       CAST(xdur AS BIGINT) AS xduration,
       CAST(nobs AS BIGINT) AS nobs_v,
       mn AS xminstart, mx AS xmaxend
FROM a
"""


def q_iwa_multivalue_nulls(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem")
    w = Window.partitionBy("g").orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    x = (
        li.select(
            (F.col("l_suppkey") % 10).cast("int").alias("g"),
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            F.when(F.col("l_orderkey") % 10 < 3, F.lit(None))
            .otherwise(F.col("l_extendedprice"))
            .alias("v1"),
            F.col("l_quantity").alias("v2"),
        )
        .withColumn("rn", F.row_number().over(w))
        .select(
            "g",
            (3 * F.col("rn") - 2).cast("long").alias("s"),
            (3 * F.col("rn")).cast("long").alias("e"),
            "v1",
            "v2",
        )
    )
    y = _y_regular(spark, x.select("g").distinct(), 220, 100)
    out = interval_weighted_avg(
        x, y, ("s", "e"), ("v1", "v2"), ("g",), required_percentage=50.0, validate=False
    )
    return _finish(out, ["v1", "v2", "yduration"]).select(
        "g",
        "s",
        "e",
        "v1",
        "v2",
        "yduration",
        F.col("xduration").cast("long").alias("xduration"),
        F.col("nobs_v1").cast("long").alias("nobs_v1"),
        F.col("nobs_v2").cast("long").alias("nobs_v2"),
        F.col("xminstart").cast("long").alias("xminstart"),
        F.col("xmaxend").cast("long").alias("xmaxend"),
    )


SQL_IWA_MULTIVALUE = """
WITH x AS (
  SELECT CAST(l_suppkey % 10 AS INT) AS g,
         CAST(3*ROW_NUMBER() OVER (PARTITION BY l_suppkey % 10 ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice) - 2 AS BIGINT) AS s,
         CAST(3*ROW_NUMBER() OVER (PARTITION BY l_suppkey % 10 ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice) AS BIGINT) AS e,
         CASE WHEN l_orderkey % 10 < 3 THEN NULL ELSE l_extendedprice END AS v1,
         l_quantity AS v2
  FROM lineitem
),
y AS (
  SELECT g, CAST(100*p AS BIGINT) AS s, CAST(100*p + 99 AS BIGINT) AS e
  FROM (SELECT DISTINCT CAST(l_suppkey % 10 AS INT) AS g FROM lineitem)
  CROSS JOIN (SELECT range AS p FROM range(220))
),
j AS (
  SELECT y.g, y.s AS ys, y.e AS ye,
         CASE WHEN x.s IS NULL THEN NULL ELSE GREATEST(x.s, y.s) END AS cs,
         CASE WHEN x.e IS NULL THEN NULL ELSE LEAST(x.e, y.e) END AS ce, x.v1, x.v2
  FROM y LEFT JOIN x ON x.g = y.g AND x.s <= y.e AND x.e >= y.s
),
a AS (
  SELECT g, ys, ye,
         COALESCE(SUM(ce - cs + 1), 0) AS xdur,
         COALESCE(SUM(CASE WHEN v1 IS NOT NULL THEN ce - cs + 1 END), 0) AS nobs1,
         COALESCE(SUM(CASE WHEN v2 IS NOT NULL THEN ce - cs + 1 END), 0) AS nobs2,
         SUM(v1 * (ce - cs + 1)) AS sp1,
         SUM(v2 * (ce - cs + 1)) AS sp2,
         MIN(cs) AS mn, MAX(ce) AS mx
  FROM j GROUP BY g, ys, ye
)
SELECT g, ys AS s, ye AS e,
       ROUND(CASE WHEN 100.0*nobs1/(ye - ys + 1) < 50 OR nobs1 = 0 THEN NULL ELSE sp1/nobs1 END, 6) AS v1,
       ROUND(CASE WHEN 100.0*nobs2/(ye - ys + 1) < 50 OR nobs2 = 0 THEN NULL ELSE sp2/nobs2 END, 6) AS v2,
       ROUND(CAST(ye - ys + 1 AS DOUBLE), 6) AS yduration,
       CAST(xdur AS BIGINT) AS xduration,
       CAST(nobs1 AS BIGINT) AS nobs_v1,
       CAST(nobs2 AS BIGINT) AS nobs_v2,
       CAST(mn AS BIGINT) AS xminstart,
       CAST(mx AS BIGINT) AS xmaxend
FROM a
"""


def q_iwa_ungrouped_bin(spark, sf_dir):
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy(F.lit(1)).orderBy("event_id")
    x = ev.select("event_id", "value").withColumn("rn", F.row_number().over(w)).select(
        (5 * F.col("rn") - 4).cast("long").alias("s"),
        (5 * F.col("rn")).cast("long").alias("e"),
        F.col("value").alias("v"),
    )
    y = spark.range(120).select(
        (F.col("id") * 500).cast("long").alias("s"),
        (F.col("id") * 500 + 499).cast("long").alias("e"),
    )
    out = interval_weighted_avg(
        x,
        y,
        ("s", "e"),
        ("v",),
        None,
        required_percentage=50.0,
        validate=False,
        join_strategy="bin",
        bin_width=64,
        skew_salt=4,
    )
    return _finish(out, ["v", "yduration"]).select(
        "s",
        "e",
        "v",
        "yduration",
        F.col("xduration").cast("long").alias("xduration"),
        F.col("nobs_v").cast("long").alias("nobs_v"),
        F.col("xminstart").cast("long").alias("xminstart"),
        F.col("xmaxend").cast("long").alias("xmaxend"),
    )


SQL_IWA_UNGROUPED = """
WITH x AS (
  SELECT CAST(5*ROW_NUMBER() OVER (ORDER BY event_id) - 4 AS BIGINT) AS s,
         CAST(5*ROW_NUMBER() OVER (ORDER BY event_id) AS BIGINT) AS e,
         value AS v
  FROM events
),
y AS (
  SELECT CAST(500*p AS BIGINT) AS s, CAST(500*p + 499 AS BIGINT) AS e
  FROM (SELECT range AS p FROM range(120))
),
j AS (
  SELECT y.s AS ys, y.e AS ye,
         CASE WHEN x.s IS NULL THEN NULL ELSE GREATEST(x.s, y.s) END AS cs,
         CASE WHEN x.e IS NULL THEN NULL ELSE LEAST(x.e, y.e) END AS ce, x.v
  FROM y LEFT JOIN x ON x.s <= y.e AND x.e >= y.s
),
a AS (
  SELECT ys, ye,
         COALESCE(SUM(ce - cs + 1), 0) AS xdur,
         COALESCE(SUM(CASE WHEN v IS NOT NULL THEN ce - cs + 1 END), 0) AS nobs,
         SUM(v * (ce - cs + 1)) AS sumprod,
         MIN(cs) AS mn, MAX(ce) AS mx
  FROM j GROUP BY ys, ye
)
SELECT ys AS s, ye AS e,
       ROUND(CASE WHEN 100.0*nobs/(ye - ys + 1) < 50 OR nobs = 0 THEN NULL ELSE sumprod/nobs END, 6) AS v,
       ROUND(CAST(ye - ys + 1 AS DOUBLE), 6) AS yduration,
       CAST(xdur AS BIGINT) AS xduration,
       CAST(nobs AS BIGINT) AS nobs_v,
       CAST(mn AS BIGINT) AS xminstart,
       CAST(mx AS BIGINT) AS xmaxend
FROM a
"""


def q_iwa_null_groups(spark, sf_dir):
    c = _read(spark, sf_dir, "customer")
    g = F.when(F.col("c_nationkey") % 5 == 0, F.lit(None)).otherwise(
        (F.col("c_nationkey") % 5).cast("int")
    )
    w = Window.partitionBy("g").orderBy("c_custkey")
    x = (
        c.select(g.alias("g"), "c_custkey", "c_acctbal")
        .withColumn("rn", F.row_number().over(w))
        .select(
            "g",
            (4 * F.col("rn") - 3).cast("long").alias("s"),
            (4 * F.col("rn")).cast("long").alias("e"),
            F.col("c_acctbal").alias("v"),
        )
    )
    y = _y_regular(spark, x.select("g").distinct(), 60, 25)
    out = interval_weighted_avg(
        x, y, ("s", "e"), ("v",), ("g",), required_percentage=0.0, validate=False
    )
    return _finish(out, ["v", "yduration"]).select(
        "g",
        "s",
        "e",
        "v",
        "yduration",
        F.col("xduration").cast("long").alias("xduration"),
        F.col("nobs_v").cast("long").alias("nobs_v"),
        F.col("xminstart").cast("long").alias("xminstart"),
        F.col("xmaxend").cast("long").alias("xmaxend"),
    )


SQL_IWA_NULL_GROUPS = """
WITH x AS (
  SELECT CASE WHEN c_nationkey % 5 = 0 THEN NULL ELSE CAST(c_nationkey % 5 AS INT) END AS g,
         CAST(4*ROW_NUMBER() OVER (
             PARTITION BY CASE WHEN c_nationkey % 5 = 0 THEN NULL ELSE CAST(c_nationkey % 5 AS INT) END
             ORDER BY c_custkey) - 3 AS BIGINT) AS s,
         CAST(4*ROW_NUMBER() OVER (
             PARTITION BY CASE WHEN c_nationkey % 5 = 0 THEN NULL ELSE CAST(c_nationkey % 5 AS INT) END
             ORDER BY c_custkey) AS BIGINT) AS e,
         c_acctbal AS v
  FROM customer
),
y AS (
  SELECT g, CAST(25*p AS BIGINT) AS s, CAST(25*p + 24 AS BIGINT) AS e
  FROM (SELECT DISTINCT g FROM x)
  CROSS JOIN (SELECT range AS p FROM range(60))
),
j AS (
  SELECT y.g, y.s AS ys, y.e AS ye,
         CASE WHEN x.s IS NULL THEN NULL ELSE GREATEST(x.s, y.s) END AS cs,
         CASE WHEN x.e IS NULL THEN NULL ELSE LEAST(x.e, y.e) END AS ce, x.v
  FROM y LEFT JOIN x ON x.g IS NOT DISTINCT FROM y.g AND x.s <= y.e AND x.e >= y.s
),
a AS (
  SELECT g, ys, ye,
         COALESCE(SUM(ce - cs + 1), 0) AS xdur,
         COALESCE(SUM(CASE WHEN v IS NOT NULL THEN ce - cs + 1 END), 0) AS nobs,
         SUM(v * (ce - cs + 1)) AS sumprod,
         MIN(cs) AS mn, MAX(ce) AS mx
  FROM j GROUP BY g, ys, ye
)
SELECT g, ys AS s, ye AS e,
       ROUND(CASE WHEN nobs = 0 THEN NULL ELSE sumprod/nobs END, 6) AS v,
       ROUND(CAST(ye - ys + 1 AS DOUBLE), 6) AS yduration,
       CAST(xdur AS BIGINT) AS xduration,
       CAST(nobs AS BIGINT) AS nobs_v,
       CAST(mn AS BIGINT) AS xminstart,
       CAST(mx AS BIGINT) AS xmaxend
FROM a
"""


def q_remove_overlaps(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem")
    w = Window.partitionBy("g").orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    x = (
        li.select(
            (F.col("l_suppkey") % 5).cast("int").alias("g"),
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
        )
        .withColumn("rn", F.row_number().over(w))
        .select(
            "g",
            F.col("rn").cast("long").alias("s"),
            (F.col("rn") + (F.col("l_quantity").cast("long") % 5) + 1).alias("e"),
        )
    )
    out = remove_overlaps(x, ("s", "e"), ("g",))
    return out.select(
        "g",
        F.col("s").cast("long").alias("s"),
        F.col("e").cast("long").alias("e"),
        F.col("o_s").cast("long").alias("o_s"),
        F.col("o_e").cast("long").alias("o_e"),
    )


SQL_REMOVE_OVERLAPS = """
WITH x AS (
  SELECT CAST(l_suppkey % 5 AS INT) AS g,
         CAST(ROW_NUMBER() OVER (PARTITION BY l_suppkey % 5 ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice) AS BIGINT) AS s,
         CAST(ROW_NUMBER() OVER (PARTITION BY l_suppkey % 5 ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice)
              + CAST(l_quantity AS BIGINT) % 5 + 1 AS BIGINT) AS e
  FROM lineitem
),
m AS (
  SELECT g, s AS val, FALSE AS is_end FROM x
  UNION ALL
  SELECT g, e AS val, TRUE AS is_end FROM x
),
sw AS (
  SELECT g, val, is_end,
         LEAD(is_end) OVER w AS next_end,
         LEAD(val) OVER w AS next_val
  FROM m WINDOW w AS (PARTITION BY g ORDER BY val, is_end)
),
atomic AS (
  SELECT g,
         CASE WHEN NOT is_end THEN val ELSE val + 1 END AS a_s,
         CASE WHEN NOT next_end THEN next_val - 1 ELSE next_val END AS a_e
  FROM sw WHERE next_end IS NOT NULL
)
SELECT x.g, a.a_s AS s, a.a_e AS e, x.s AS o_s, x.e AS o_e
FROM atomic a JOIN x ON a.g = x.g AND a.a_s <= x.e AND a.a_e >= x.s
WHERE a.a_e >= a.a_s
"""


def q_grouped_cartesian(spark, sf_dir):
    part = _read(spark, sf_dir, "part").select(
        (F.col("p_size") % 3).cast("int").alias("g"),
        F.col("p_partkey").alias("pk"),
        F.col("p_retailprice").alias("pprice"),
    )
    sup = _read(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") % 3).cast("int").alias("g"),
        F.col("s_suppkey").alias("sk"),
        F.col("s_acctbal").alias("sbal"),
    )
    return grouped_cartesian([part, sup], ["g"]).select(
        "g", "pk", F.round("pprice", _R).alias("pprice"), "sk",
        F.round("sbal", _R).alias("sbal"),
    )


SQL_GROUPED_CARTESIAN = """
SELECT CAST(p_size % 3 AS INT) AS g, p_partkey AS pk,
       ROUND(p_retailprice, 6) AS pprice,
       s_suppkey AS sk, ROUND(s_acctbal, 6) AS sbal
FROM part JOIN supplier ON p_size % 3 = s_suppkey % 3
"""


def q_token_table(spark, sf_dir):
    t = token_table(spark, N_TOKEN_DOCS)
    return t.select(
        "doc_id",
        F.aggregate("tokens", F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "tokens_sum"
        ),
        F.size("tokens").alias("tokens_len"),
        F.col("n_tok").cast("long").alias("n_tok"),
        "source",
        F.col("start_hour").cast("long").alias("start_hour"),
        F.col("end_hour").cast("long").alias("end_hour"),
    )


SQL_TOKEN_TABLE = f"""
SELECT doc_id,
       CAST(list_aggregate(tokens, 'sum') AS BIGINT) AS tokens_sum,
       CAST(len(tokens) AS INT) AS tokens_len,
       CAST(n_tok AS BIGINT) AS n_tok,
       source,
       CAST(start_hour AS BIGINT) AS start_hour,
       CAST(end_hour AS BIGINT) AS end_hour
FROM ({token_table_oracle_sql(N_TOKEN_DOCS)})
"""


def _token_rollup_sql(width: int) -> str:
    return f"""
WITH tok AS ({token_table_oracle_sql(N_TOKEN_DOCS)}),
p AS (
  SELECT range AS period,
         CAST({width}*range AS BIGINT) AS ps,
         CAST({width}*range + {width} - 1 AS BIGINT) AS pe
  FROM range(CAST(CEIL(8784.0 / {width}) AS BIGINT))
),
j AS (
  SELECT t.source, p.period, p.ps, p.pe,
         GREATEST(t.start_hour, p.ps) AS cs,
         LEAST(t.end_hour, p.pe) AS ce,
         CAST(t.n_tok AS DOUBLE) AS v
  FROM tok t JOIN p ON t.start_hour <= p.pe AND t.end_hour >= p.ps
)
SELECT source, CAST(period AS BIGINT) AS period,
       ROUND(SUM(v * (ce - cs + 1)) / SUM(ce - cs + 1), 6) AS n_tok,
       CAST(SUM(ce - cs + 1) AS BIGINT) AS xduration,
       CAST(SUM(ce - cs + 1) AS BIGINT) AS nobs_n_tok,
       CAST(MIN(cs) AS BIGINT) AS xminstart,
       CAST(MAX(ce) AS BIGINT) AS xmaxend
FROM j GROUP BY source, period
"""


def _q_token_rollup(spark, width: int):
    t = token_table(spark, N_TOKEN_DOCS)
    out = rollup_regular(
        t,
        ("start_hour", "end_hour"),
        ("n_tok",),
        ("source",),
        width=width,
        required_percentage=0.0,
    )
    return out.select(
        "source",
        F.col("period").cast("long").alias("period"),
        F.round(F.col("n_tok"), _R).alias("n_tok"),
        F.col("xduration").cast("long").alias("xduration"),
        F.col("nobs_n_tok").cast("long").alias("nobs_n_tok"),
        F.col("xminstart").cast("long").alias("xminstart"),
        F.col("xmaxend").cast("long").alias("xmaxend"),
    )


def q_rollup_daily(spark, sf_dir):
    return _q_token_rollup(spark, 24)


def q_rollup_weekly_cascade(spark, sf_dir):
    """Weekly tier derived by cascading hourly partials — the oracle
    computes weekly DIRECTLY in SQL, so this cross-checks cascade
    exactness through an independent engine."""
    t = token_table(spark, N_TOKEN_DOCS)
    hourly = rollup_regular(
        t, ("start_hour", "end_hour"), ("n_tok",), ("source",), width=1, partial=True
    )
    weekly = cascade(hourly, ("n_tok",), ("source",), fine_width=1, coarse_width=168)
    out = finalize_rollup(
        weekly, ("n_tok",), ("source",), width=168, required_percentage=0.0
    )
    return out.select(
        "source",
        F.col("period").cast("long").alias("period"),
        F.round(F.col("n_tok"), _R).alias("n_tok"),
        F.col("xduration").cast("long").alias("xduration"),
        F.col("nobs_n_tok").cast("long").alias("nobs_n_tok"),
        F.col("xminstart").cast("long").alias("xminstart"),
        F.col("xmaxend").cast("long").alias("xmaxend"),
    )


def q_gap_fill_locf(spark, sf_dir):
    t = token_table(spark, N_TOKEN_DOCS)
    daily = rollup_regular(
        t,
        ("start_hour", "end_hour"),
        ("n_tok",),
        ("source",),
        width=24,
        required_percentage=0.0,
    )
    filled = gap_fill_locf(
        daily, ("n_tok",), ("source",), width=24, span=(0, 24 * 366 - 1)
    )
    return filled.select(
        "source",
        F.col("period").cast("long").alias("period"),
        F.round(F.col("n_tok_filled"), _R).alias("n_tok_filled"),
        F.col("gap_filled"),
        F.col("xduration").cast("long").alias("xduration"),
    )


SQL_GAP_FILL = f"""
WITH daily AS ({_token_rollup_sql(24)}),
scaffold AS (
  SELECT s.source, CAST(p.range AS BIGINT) AS period
  FROM (SELECT DISTINCT source FROM daily) s
  CROSS JOIN range(366) p
),
joined AS (
  SELECT sc.source, sc.period, d.n_tok, d.xduration
  FROM scaffold sc LEFT JOIN daily d
    ON sc.source = d.source AND sc.period = d.period
)
SELECT source, period,
       ROUND(last_value(n_tok IGNORE NULLS) OVER (
           PARTITION BY source ORDER BY period
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS n_tok_filled,
       (xduration IS NULL OR xduration = 0) AS gap_filled,
       CAST(COALESCE(xduration, 0) AS BIGINT) AS xduration
FROM joined
"""


def q_gap_fill_interp(spark, sf_dir):
    """Linear interpolation between neighboring observations (the
    gap-fill family's second mode; TimescaleDB `interpolate` analog) —
    NULL outside the observed range, exact value at observed periods."""
    from timeperiods_spark.operators.rollup import gap_fill_interpolate

    t = token_table(spark, N_TOKEN_DOCS)
    daily = rollup_regular(
        t,
        ("start_hour", "end_hour"),
        ("n_tok",),
        ("source",),
        width=24,
        required_percentage=0.0,
    )
    # anchor parity with the oracle: the SQL twin's daily n_tok is
    # ROUND(.., 6); interpolating from unrounded anchors differs in the
    # 6th decimal, so round the Spark anchors identically first
    daily = daily.withColumn("n_tok", F.round("n_tok", 6))
    filled = gap_fill_interpolate(
        daily, ("n_tok",), ("source",), width=24, span=(0, 24 * 366 - 1)
    )
    return filled.select(
        "source",
        F.col("period").cast("long").alias("period"),
        F.round(F.col("n_tok_interp"), _R).alias("n_tok_interp"),
        F.col("gap_filled"),
    )


SQL_GAP_FILL_INTERP = f"""
WITH daily AS ({_token_rollup_sql(24)}),
scaffold AS (
  SELECT s.source, CAST(p.range AS BIGINT) AS period
  FROM (SELECT DISTINCT source FROM daily) s
  CROSS JOIN range(366) p
),
joined AS (
  SELECT sc.source, sc.period, d.n_tok, d.xduration
  FROM scaffold sc LEFT JOIN daily d
    ON sc.source = d.source AND sc.period = d.period
),
anchored AS (
  SELECT source, period, n_tok, xduration,
         MAX(CASE WHEN n_tok IS NOT NULL THEN period END) OVER (
             PARTITION BY source ORDER BY period
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_p,
         last_value(n_tok IGNORE NULLS) OVER (
             PARTITION BY source ORDER BY period
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
         MIN(CASE WHEN n_tok IS NOT NULL THEN period END) OVER (
             PARTITION BY source ORDER BY period
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_p,
         first_value(n_tok IGNORE NULLS) OVER (
             PARTITION BY source ORDER BY period
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v
  FROM joined
)
SELECT source, period,
       ROUND(CASE
         WHEN n_tok IS NOT NULL THEN n_tok
         WHEN prev_v IS NULL OR next_v IS NULL THEN NULL
         ELSE prev_v + (next_v - prev_v) * (period - prev_p)
              / CAST(next_p - prev_p AS DOUBLE)
       END, 6) AS n_tok_interp,
       (xduration IS NULL OR xduration = 0) AS gap_filled
FROM anchored
"""


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization of the events stream: per-user session
    ordinal with a 30-minute inactivity gap. The carry-bucketed
    prefix-sum must reproduce the plain windowed formulation the DuckDB
    twin uses."""
    from timeperiods_spark import sessionize

    ev = _read(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("tsec"),
    )
    out = sessionize(
        ev, "tsec", 1800, ["user_id"], tiebreak=["event_id"]
    )
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("session_id").cast("long").alias("session_id"),
    )


SQL_SESSIONIZE = """
WITH e AS (
  SELECT user_id, event_id, CAST(epoch(ts) AS BIGINT) AS tsec FROM events
),
flagged AS (
  SELECT user_id, event_id, tsec,
         CASE WHEN lag(tsec) OVER w IS NULL
                   OR tsec - lag(tsec) OVER w > 1800
              THEN 1 ELSE 0 END AS f
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)
)
SELECT user_id, event_id,
       CAST(SUM(f) OVER (PARTITION BY user_id ORDER BY tsec, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS session_id
FROM flagged
"""


#: non-leap calendar months as day offsets/lengths — the irregular
#: schedule the regular-grid tiers cannot express
_MONTH_CUM = [0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334]
_MONTH_LEN = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def q_iwa_monthly(spark, sf_dir):
    """Calendar-month tier over the token table via the GENERAL
    interval_weighted_avg path: months are irregular (28-31 days), so
    rollup_regular can't express them — this is the pattern for
    arbitrary calendars at scale (tiny broadcast-able y schedule
    against the huge measurement table)."""
    t = token_table(spark, N_TOKEN_DOCS)
    x = t.select(
        "source",
        F.col("start_hour").alias("s"),
        F.col("end_hour").alias("e"),
        F.col("n_tok").cast("double").alias("v"),
    )
    months = spark.createDataFrame(
        [
            (c * 24, (c + l) * 24 - 1)
            for c, l in zip(_MONTH_CUM, _MONTH_LEN)
        ],
        "s int, e int",
    )
    y = spark.range(11).selectExpr("concat('src_', id) AS source").crossJoin(months)
    # doc intervals within a source overlap freely — the reference's
    # skip_overlap_check escape hatch (timeperiod_functions.R:213-220)
    # is exactly for duration-weighted means over overlapping inputs;
    # validate=False additionally skips the x-duplicate scan (docs can
    # legitimately share an interval here)
    out = interval_weighted_avg(
        x, y, ("s", "e"), ("v",), ("source",), 0.0,
        skip_overlap_check=True, validate=False,
        join_strategy="broadcast_y", assume_y_distinct=True,
    )
    return out.select(
        "source",
        F.col("s").cast("long").alias("s"),
        F.col("e").cast("long").alias("e"),
        F.round("v", _R).alias("v"),
        F.col("xduration").cast("long").alias("xduration"),
        F.col("nobs_v").cast("long").alias("nobs_v"),
    )


_MONTHS_SQL = ", ".join(
    f"({c * 24}, {(c + l) * 24 - 1})" for c, l in zip(_MONTH_CUM, _MONTH_LEN)
)

SQL_IWA_MONTHLY = f"""
WITH tok AS ({{tok}}),
months(ms, me) AS (VALUES {_MONTHS_SQL}),
y AS (
  SELECT concat('src_', r.range) AS source, ms, me
  FROM range(11) r CROSS JOIN months
),
j AS (
  SELECT y.source, y.ms, y.me,
         CASE WHEN t.start_hour IS NULL THEN NULL
              ELSE GREATEST(t.start_hour, y.ms) END AS cs,
         CASE WHEN t.end_hour IS NULL THEN NULL
              ELSE LEAST(t.end_hour, y.me) END AS ce,
         CAST(t.n_tok AS DOUBLE) AS v
  FROM y LEFT JOIN tok t
    ON t.source = y.source AND t.start_hour <= y.me AND t.end_hour >= y.ms
),
a AS (
  SELECT source, ms, me,
         COALESCE(SUM(ce - cs + 1), 0) AS xdur,
         COALESCE(SUM(CASE WHEN v IS NOT NULL THEN ce - cs + 1 END), 0) AS nobs,
         SUM(v * (ce - cs + 1)) AS sumprod
  FROM j GROUP BY source, ms, me
)
SELECT source, CAST(ms AS BIGINT) AS s, CAST(me AS BIGINT) AS e,
       ROUND(CASE WHEN nobs = 0 THEN NULL ELSE sumprod/nobs END, 6) AS v,
       CAST(xdur AS BIGINT) AS xduration,
       CAST(nobs AS BIGINT) AS nobs_v
FROM a
"""
SQL_IWA_MONTHLY = SQL_IWA_MONTHLY.format(tok=token_table_oracle_sql(N_TOKEN_DOCS))


def q_downsample_m4(spark, sf_dir):
    """M4 min/max downsampling (Jugel et al., VLDB 2014): first/last/
    min/max per 32-day bucket of the daily token series — at most 4
    original points per bucket, one hash aggregate, no window."""
    from timeperiods_spark.operators.downsample import downsample_m4

    t = token_table(spark, N_TOKEN_DOCS)
    daily = rollup_regular(
        t, ("start_hour", "end_hour"), ("n_tok",), ("source",),
        width=24, required_percentage=0.0,
    # round the anchors exactly as the oracle's daily CTE does — the
    # min/max PICKS compare values, so both engines must compare the
    # same rounded numbers
    ).withColumn("n_tok", F.round("n_tok", 6))
    out = downsample_m4(daily, "period", "n_tok", ["source"], bucket_width=32)
    return out.select(
        "source",
        F.col("bucket").cast("long").alias("bucket"),
        F.col("period").cast("long").alias("period"),
        F.round("value", _R).alias("value"),
    )


SQL_DOWNSAMPLE_M4 = f"""
WITH daily AS ({{daily}}),
b AS (
  SELECT source, CAST(FLOOR(period / 32) AS BIGINT) AS bucket,
         period, n_tok AS value
  FROM daily WHERE n_tok IS NOT NULL
),
stats AS (
  SELECT source, bucket, MIN(period) AS p_first, MAX(period) AS p_last,
         MIN(value) AS v_min, MAX(value) AS v_max
  FROM b GROUP BY source, bucket
),
picks AS (
  SELECT s.source, s.bucket, s.p_first, s.p_last,
         MIN(CASE WHEN b.value = s.v_min THEN b.period END) AS p_vmin,
         MIN(CASE WHEN b.value = s.v_max THEN b.period END) AS p_vmax
  FROM stats s JOIN b ON b.source = s.source AND b.bucket = s.bucket
  GROUP BY s.source, s.bucket, s.p_first, s.p_last
),
pts AS (
  SELECT source, bucket, p_first AS period FROM picks
  UNION SELECT source, bucket, p_last FROM picks
  UNION SELECT source, bucket, p_vmin FROM picks
  UNION SELECT source, bucket, p_vmax FROM picks
)
SELECT p.source, p.bucket, CAST(p.period AS BIGINT) AS period,
       ROUND(b.value, 6) AS value
FROM pts p JOIN b ON b.source = p.source AND b.bucket = p.bucket
                 AND b.period = p.period
"""
SQL_DOWNSAMPLE_M4 = SQL_DOWNSAMPLE_M4.format(daily=_token_rollup_sql(24))


def q_gorilla_roundtrip(spark, sf_dir):
    """Compression round-trip audit (non-SQL-expressible: bit-packed
    binary codec → rows-only driver check). n_mismatch must be 0."""
    t = token_table(spark, N_TOKEN_DOCS)
    daily = rollup_regular(
        t,
        ("start_hour", "end_hour"),
        ("n_tok",),
        ("source",),
        width=24,
        required_percentage=0.0,
    ).select("source", "period", F.col("n_tok").alias("value"))
    comp = compress_series(daily, ["source"])
    back = decompress_series(comp, ["source"]).withColumnRenamed("value", "value_rt")
    joined = daily.join(back, ["source", "period"], "full")
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(
                F.when(
                    ~(
                        F.col("value").eqNullSafe(F.col("value_rt"))
                        | (F.isnan(F.coalesce("value_rt", F.lit(0.0))) & F.col("value").isNull())
                    ),
                    1,
                ).otherwise(0)
            ).alias("n_mismatch"),
        )
        .orderBy("source")
    )


def q_running_max(spark, sf_dir):
    """O26 (reference cummax.Date, timeperiod_functions.R:52)
    generalized: grouped running max over an explicit order."""
    from timeperiods_spark.operators.overlaps import running_max

    ev = _read(spark, sf_dir, "events")
    df = ev.select(
        (F.col("user_id") % 7).cast("int").alias("g"),
        "event_id",
        F.col("value").alias("v"),
    )
    out = running_max(df, "v", ["event_id"], ["g"], out_col="v_cummax")
    return out.select(
        "g",
        "event_id",
        F.round("v", _R).alias("v"),
        F.round("v_cummax", _R).alias("v_cummax"),
    )


SQL_RUNNING_MAX = """
SELECT CAST(user_id % 7 AS INT) AS g, event_id,
       ROUND(value, 6) AS v,
       ROUND(MAX(value) OVER (PARTITION BY user_id % 7 ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_cummax
FROM events
"""


def q_iwa_sorted_validated(spark, sf_dir):
    """O14 (sorted output, reference setkeyv) + the eager validation
    path (O2/O11/O15): x is clean by construction, so validate=True
    runs the duplicate/overlap window scans and passes. The driver's
    hash is order-insensitive; this query's value is that the sorted,
    validated plan executes and matches the same oracle."""
    x = _x_orders(spark, sf_dir)
    y = _y_regular(spark, x.select("g").distinct(), 200, 30)
    out = interval_weighted_avg(
        x, y, ("s", "e"), ("v",), ("g",),
        required_percentage=80.0,
        validate=True,
        skip_overlap_check=False,
        sort_output=True,
    )
    return _finish(out, ["v", "yduration"]).select(
        "g", "s", "e", "v", "yduration",
        F.col("xduration").cast("long").alias("xduration"),
        F.col("nobs_v").cast("long").alias("nobs_v"),
        F.col("xminstart").cast("long").alias("xminstart"),
        F.col("xmaxend").cast("long").alias("xmaxend"),
    )


SQL_IWA_SORTED = SQL_IWA_CORE.replace(
    "100.0*nobs/(ye - ys + 1) < 50", "100.0*nobs/(ye - ys + 1) < 80"
)


def q_asof_events(spark, sf_dir):
    """As-of join: for each regular query time per group, the latest
    event value at or before it. The oracle is DuckDB's NATIVE
    ASOF LEFT JOIN — a fully independent implementation of the
    semantics (the Spark side is a union + carry-forward window,
    not a join at all)."""
    from timeperiods_spark.operators.asof import asof_join

    ev = _read(spark, sf_dir, "events")
    obs = ev.select(
        (F.col("user_id") % 7).cast("int").alias("g"),
        F.col("event_id").alias("t"),
        F.col("value").alias("v"),
    )
    q = obs.select("g").distinct().crossJoin(
        spark.range(200).select((F.col("id") * 37).cast("long").alias("t"))
    )
    out = asof_join(q, obs, "t", ["v"], ["g"])
    return out.select(
        "g",
        F.col("t").cast("long").alias("t"),
        F.round("v", _R).alias("v"),
        F.col("asof_t").cast("long").alias("asof_t"),
    )


SQL_ASOF_EVENTS = """
WITH obs AS (
  SELECT CAST(user_id % 7 AS INT) AS og, event_id AS ot, value AS v FROM events
),
q AS (
  SELECT g, CAST(37*p AS BIGINT) AS t
  FROM (SELECT DISTINCT CAST(user_id % 7 AS INT) AS g FROM events)
  CROSS JOIN (SELECT range AS p FROM range(200))
)
SELECT q.g, q.t, ROUND(o.v, 6) AS v, o.ot AS asof_t
FROM q ASOF LEFT JOIN obs o ON q.g = o.og AND q.t >= o.ot
"""


def q_asof_tolerance(spark, sf_dir):
    """Backward as-of with a max-staleness window (tolerance=50):
    matches older than t-50 are masked to NULL. Oracle = bounded
    GROUP BY arg-max (obs times are unique event ids, so no ties)."""
    from timeperiods_spark.operators.asof import asof_join

    ev = _read(spark, sf_dir, "events")
    obs = ev.select(
        (F.col("user_id") % 7).cast("int").alias("g"),
        F.col("event_id").alias("t"),
        F.col("value").alias("v"),
    )
    q = obs.select("g").distinct().crossJoin(
        spark.range(200).select((F.col("id") * 37).cast("long").alias("t"))
    )
    out = asof_join(q, obs, "t", ["v"], ["g"], tolerance=50)
    return out.select(
        "g",
        F.col("t").cast("long").alias("t"),
        F.round("v", _R).alias("v"),
        F.col("asof_t").cast("long").alias("asof_t"),
    )


SQL_ASOF_TOLERANCE = """
WITH obs AS (
  SELECT CAST(user_id % 7 AS INT) AS og, event_id AS ot, value AS v FROM events
),
q AS (
  SELECT g, CAST(37*p AS BIGINT) AS t
  FROM (SELECT DISTINCT CAST(user_id % 7 AS INT) AS g FROM events)
  CROSS JOIN (SELECT range AS p FROM range(200))
)
SELECT q.g, q.t, ROUND(MAX_BY(o.v, o.ot), 6) AS v, MAX(o.ot) AS asof_t
FROM q LEFT JOIN obs o
  ON q.g IS NOT DISTINCT FROM o.og
 AND o.ot <= q.t AND o.ot >= q.t - 50
GROUP BY q.g, q.t
"""


def q_asof_forward(spark, sf_dir):
    """Forward as-of join (earliest observation at or after each query
    time) — DuckDB ASOF only supports the backward inequality, so the
    twin negates both time axes, which is also exactly how the Spark
    side reduces forward to its backward carry (one pass)."""
    from timeperiods_spark.operators.asof import asof_join

    ev = _read(spark, sf_dir, "events")
    obs = ev.select(
        (F.col("user_id") % 7).cast("int").alias("g"),
        F.col("event_id").alias("t"),
        F.col("value").alias("v"),
    )
    q = obs.select("g").distinct().crossJoin(
        spark.range(200).select((F.col("id") * 37).cast("long").alias("t"))
    )
    out = asof_join(q, obs, "t", ["v"], ["g"], direction="forward")
    return out.select(
        "g",
        F.col("t").cast("long").alias("t"),
        F.round("v", _R).alias("v"),
        F.col("asof_t").cast("long").alias("asof_t"),
    )


SQL_ASOF_FORWARD = """
WITH obs AS (
  SELECT CAST(user_id % 7 AS INT) AS og, -event_id AS ot, value AS v FROM events
),
q AS (
  SELECT g, CAST(37*p AS BIGINT) AS t
  FROM (SELECT DISTINCT CAST(user_id % 7 AS INT) AS g FROM events)
  CROSS JOIN (SELECT range AS p FROM range(200))
)
SELECT q.g, q.t, ROUND(o.v, 6) AS v, -o.ot AS asof_t
FROM q ASOF LEFT JOIN obs o ON q.g = o.og AND -q.t >= o.ot
"""


def q_rolling_7d(spark, sf_dir):
    """Trailing 7-day rolling statistics over the daily token series —
    the fan-out + hash-agg formulation (no RANGE window, no per-group
    task ceiling) must equal the oracle's RANGE window exactly."""
    from timeperiods_spark.operators.rolling import rolling_window_agg

    t = token_table(spark, N_TOKEN_DOCS)
    daily = rollup_regular(
        t, ("start_hour", "end_hour"), ("n_tok",), ("source",),
        width=24, required_percentage=0.0,
    ).select(
        "source", "period",
        # same anchor-rounding parity as the other derived queries
        F.round("n_tok", 6).alias("value"),
    )
    out = rolling_window_agg(daily, "period", "value", ["source"], k=7)
    return out.select(
        "source",
        F.col("period").cast("long").alias("period"),
        F.round("value", _R).alias("value"),
        F.round("roll_sum", _R).alias("roll_sum"),
        F.col("roll_count").cast("long").alias("roll_count"),
        # mean re-derived from the 6dp-rounded sum on BOTH engines: the
        # raw sums differ in low bits by summation order, and a
        # division of near-.5-boundary floats flips the 6th decimal
        F.round(F.round("roll_sum", _R) / F.col("roll_count"), _R).alias(
            "roll_mean"
        ),
        F.round("roll_min", _R).alias("roll_min"),
        F.round("roll_max", _R).alias("roll_max"),
    )


SQL_ROLLING_7D = f"""
WITH daily AS ({_token_rollup_sql(24)}),
s AS (SELECT source, period, n_tok AS value FROM daily)
SELECT source, CAST(period AS BIGINT) AS period,
       ROUND(value, 6) AS value,
       ROUND(SUM(value) OVER w, 6) AS roll_sum,
       CAST(COUNT(value) OVER w AS BIGINT) AS roll_count,
       ROUND(ROUND(SUM(value) OVER w, 6) / COUNT(value) OVER w, 6)
         AS roll_mean,
       ROUND(MIN(value) OVER w, 6) AS roll_min,
       ROUND(MAX(value) OVER w, 6) AS roll_max
FROM s
WINDOW w AS (PARTITION BY source ORDER BY period
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def q_tier_variance(spark, sf_dir):
    """Exact time-weighted variance at the daily tier from ADDITIVE
    second-moment partials (sumsq) — cascade-exact like every other
    partial, so variance is available at any tier without rescanning
    raw data. Values rounded to 4dp: var = E[x^2]-E[x]^2 cancels ~10
    digits at these magnitudes, and the two engines' summation orders
    differ in the low bits."""
    t = token_table(spark, N_TOKEN_DOCS)
    daily = rollup_regular(
        t, ("start_hour", "end_hour"), ("n_tok",), ("source",),
        width=24, required_percentage=0.0, partial=True, extra_stats=True,
    )
    from timeperiods_spark.operators.rollup import finalize_rollup

    out = finalize_rollup(
        daily, ("n_tok",), ("source",), width=24, required_percentage=0.0
    )
    return out.select(
        "source",
        F.col("period").cast("long").alias("period"),
        F.round("n_tok", 4).alias("n_tok"),
        F.round("n_tok_var", 4).alias("n_tok_var"),
        F.col("xduration").cast("long").alias("xduration"),
    )


SQL_TIER_VARIANCE = f"""
WITH tok AS ({{tok}}),
p AS (
  SELECT range AS period, CAST(24*range AS BIGINT) AS ps,
         CAST(24*range + 23 AS BIGINT) AS pe
  FROM range(CAST(CEIL(8784.0 / 24) AS BIGINT))
),
j AS (
  SELECT t.source, p.period,
         GREATEST(t.start_hour, p.ps) AS cs, LEAST(t.end_hour, p.pe) AS ce,
         CAST(t.n_tok AS DOUBLE) AS v
  FROM tok t JOIN p ON t.start_hour <= p.pe AND t.end_hour >= p.ps
),
a AS (
  SELECT source, CAST(period AS BIGINT) AS period,
         SUM(ce - cs + 1) AS nobs,
         SUM(v * (ce - cs + 1)) AS sumprod,
         SUM(v * v * (ce - cs + 1)) AS sumsq,
         SUM(ce - cs + 1) AS xdur
  FROM j GROUP BY source, period
)
SELECT source, period,
       ROUND(sumprod / nobs, 4) AS n_tok,
       ROUND(sumsq / nobs - (sumprod / nobs) * (sumprod / nobs), 4)
         AS n_tok_var,
       CAST(xdur AS BIGINT) AS xduration
FROM a
"""
SQL_TIER_VARIANCE = SQL_TIER_VARIANCE.format(tok=token_table_oracle_sql(N_TOKEN_DOCS))


def q_tier_quantiles(spark, sf_dir):
    """Exact daily P50/P90/P99 of token counts from additive long-form
    histogram partials (bin_width=1 over integer n_tok): quantiles that
    MERGE across tiers/batches, unlike classic quantile state."""
    from timeperiods_spark import histogram_quantiles, rollup_histogram

    t = token_table(spark, N_TOKEN_DOCS)
    daily = rollup_histogram(
        t, ("start_hour", "end_hour"), "n_tok", ("source",), width=24
    )
    out = histogram_quantiles(daily, [0.5, 0.9, 0.99], ("source",))
    return out.select(
        "source",
        F.col("period").cast("long").alias("period"),
        F.round("p", 2).alias("p"),
        F.round("value", 6).alias("value"),
    )


SQL_TIER_QUANTILES = f"""
WITH tok AS ({{tok}}),
per AS (
  SELECT range AS period, CAST(24*range AS BIGINT) AS ps,
         CAST(24*range + 23 AS BIGINT) AS pe
  FROM range(CAST(CEIL(8784.0 / 24) AS BIGINT))
),
j AS (
  SELECT t.source, per.period, CAST(t.n_tok AS BIGINT) AS bin,
         LEAST(t.end_hour, per.pe) - GREATEST(t.start_hour, per.ps) + 1 AS dur
  FROM tok t JOIN per ON t.start_hour <= per.pe AND t.end_hour >= per.ps
),
h AS (
  SELECT source, CAST(period AS BIGINT) AS period, bin, SUM(dur) AS cnt
  FROM j GROUP BY source, period, bin
),
c AS (
  SELECT source, period, bin,
         SUM(cnt) OVER (PARTITION BY source, period ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER (PARTITION BY source, period) AS tot
  FROM h
)
SELECT source, period, ROUND(CAST(pr.p AS DOUBLE), 2) AS p,
       ROUND(CAST(MIN(bin) AS DOUBLE), 6) AS value
FROM c CROSS JOIN (VALUES (0.5), (0.9), (0.99)) pr(p)
WHERE cum >= CEIL(pr.p * tot)
GROUP BY source, period, pr.p
"""
SQL_TIER_QUANTILES = SQL_TIER_QUANTILES.format(
    tok=token_table_oracle_sql(N_TOKEN_DOCS)
)


def q_merge_intervals(spark, sf_dir):
    """Interval union (gaps-and-islands coverage): merge overlapping or
    closed-grid-adjacent measurement intervals per group. The Spark
    side is a boundary sweep with carried prefix sums; the twin is the
    classic running-max island SQL."""
    from timeperiods_spark import merge_intervals

    ev = _read(spark, sf_dir, "events")
    iv = ev.select(
        (F.col("user_id") % 7).cast("int").alias("g"),
        ((F.col("event_id") * 7) % 10007).cast("int").alias("s"),
        (
            (F.col("event_id") * 7) % 10007
            + (F.col("event_id") % 13) * 3
            + 2
        ).cast("int").alias("e"),
    )
    out = merge_intervals(iv, ("s", "e"), ["g"])
    return out.select(
        "g",
        F.col("s").cast("long").alias("s"),
        F.col("e").cast("long").alias("e"),
        F.col("n_source_intervals").cast("long").alias("n_source_intervals"),
    )


SQL_MERGE_INTERVALS = """
WITH iv AS (
  SELECT CAST(user_id % 7 AS INT) AS g,
         CAST((event_id * 7) % 10007 AS BIGINT) AS s,
         CAST((event_id * 7) % 10007 + (event_id % 13) * 3 + 2 AS BIGINT) AS e
  FROM events
),
ord AS (
  SELECT g, s, e,
         MAX(e) OVER (PARTITION BY g ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM iv
),
flg AS (
  SELECT g, s, e,
         CASE WHEN prev_max IS NULL OR s > prev_max + 1 THEN 1 ELSE 0 END AS brk
  FROM ord
),
isl AS (
  SELECT g, s, e,
         SUM(brk) OVER (PARTITION BY g ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM flg
)
SELECT g, MIN(s) AS s, MAX(e) AS e,
       CAST(COUNT(*) AS BIGINT) AS n_source_intervals
FROM isl GROUP BY g, island
"""


def q_interval_difference(spark, sf_dir):
    """Coverage subtraction (x minus y): event activity minus regular
    maintenance windows. The twin materializes both cell sets, EXCEPTs
    them, and re-forms islands with the c - row_number() trick."""
    from timeperiods_spark import interval_difference

    ev = _read(spark, sf_dir, "events")
    base = (F.col("event_id") * 7) % 10007
    x = ev.select(
        (F.col("user_id") % 7).cast("int").alias("g"),
        base.cast("int").alias("s"),
        (base + (F.col("event_id") % 13) * 3 + 2).cast("int").alias("e"),
    )
    y = x.select("g").distinct().crossJoin(
        spark.range(21).select(
            (F.col("id") * 500).cast("int").alias("s"),
            (F.col("id") * 500 + 99).cast("int").alias("e"),
        )
    )
    out = interval_difference(x, y, ("s", "e"), ["g"])
    return out.select(
        "g",
        F.col("s").cast("long").alias("s"),
        F.col("e").cast("long").alias("e"),
    )


SQL_INTERVAL_DIFFERENCE = """
WITH x AS (
  SELECT CAST(user_id % 7 AS INT) AS g,
         CAST((event_id * 7) % 10007 AS BIGINT) AS s,
         CAST((event_id * 7) % 10007 + (event_id % 13) * 3 + 2 AS BIGINT) AS e
  FROM events
),
y AS (
  SELECT g, CAST(500 * k AS BIGINT) AS s, CAST(500 * k + 99 AS BIGINT) AS e
  FROM (SELECT DISTINCT CAST(user_id % 7 AS INT) AS g FROM events)
  CROSS JOIN (SELECT range AS k FROM range(21))
),
cx AS (SELECT DISTINCT g, unnest(generate_series(s, e)) AS c FROM x),
cy AS (SELECT DISTINCT g, unnest(generate_series(s, e)) AS c FROM y),
cells AS (SELECT g, c FROM cx EXCEPT SELECT g, c FROM cy),
isl AS (
  SELECT g, c, c - ROW_NUMBER() OVER (PARTITION BY g ORDER BY c) AS grp
  FROM cells
)
SELECT g, CAST(MIN(c) AS BIGINT) AS s, CAST(MAX(c) AS BIGINT) AS e
FROM isl GROUP BY g, grp
"""


def q_tier_covariance(spark, sf_dir):
    """Exact time-weighted covariance between two value columns at the
    daily tier from the additive sumxy partial (cross_stats=) — the
    cross-moment member of the mergeable-statistics family. 4dp
    rounding for the same E[xy]-E[x]E[y] cancellation reason as the
    variance query."""
    from timeperiods_spark.operators.rollup import finalize_rollup

    t = token_table(spark, N_TOKEN_DOCS).withColumn(
        "m", (F.col("n_tok") % 97).cast("double")
    )
    daily = rollup_regular(
        t, ("start_hour", "end_hour"), ("n_tok", "m"), ("source",),
        width=24, required_percentage=0.0, partial=True,
        cross_stats=[("n_tok", "m")],
    )
    out = finalize_rollup(
        daily, ("n_tok", "m"), ("source",), width=24, required_percentage=0.0
    )
    return out.select(
        "source",
        F.col("period").cast("long").alias("period"),
        F.round("cov_n_tok_m", 4).alias("cov_n_tok_m"),
        F.col("xduration").cast("long").alias("xduration"),
    )


SQL_TIER_COVARIANCE = f"""
WITH tok AS ({{tok}}),
p AS (
  SELECT range AS period, CAST(24*range AS BIGINT) AS ps,
         CAST(24*range + 23 AS BIGINT) AS pe
  FROM range(CAST(CEIL(8784.0 / 24) AS BIGINT))
),
j AS (
  SELECT t.source, p.period,
         LEAST(t.end_hour, p.pe) - GREATEST(t.start_hour, p.ps) + 1 AS dur,
         CAST(t.n_tok AS DOUBLE) AS x,
         CAST(t.n_tok % 97 AS DOUBLE) AS y
  FROM tok t JOIN p ON t.start_hour <= p.pe AND t.end_hour >= p.ps
),
a AS (
  SELECT source, CAST(period AS BIGINT) AS period,
         SUM(dur) AS n,
         SUM(x * dur) AS sx, SUM(y * dur) AS sy,
         SUM(x * y * dur) AS sxy
  FROM j GROUP BY source, period
)
SELECT source, period,
       ROUND(sxy / n - (sx / n) * (sy / n), 4) AS cov_n_tok_m,
       CAST(n AS BIGINT) AS xduration
FROM a
"""
SQL_TIER_COVARIANCE = SQL_TIER_COVARIANCE.format(
    tok=token_table_oracle_sql(N_TOKEN_DOCS)
)


N_MEDIA = 200


def q_multimodal_features(spark, sf_dir):
    """Numeric check of the multimodal plumbing: stub-codec features
    (byte-histogram embedding, L2-normalized float32) over the
    deterministic synthetic payloads (sha256 of the decimal media id,
    repeated 8 + id % 8 times). The oracle recomputes the same digest
    bytes, histogram, norm and float32 rounding in SQL."""
    from timeperiods_spark.operators.multimodal import (
        extract_features,
        synthetic_media,
    )

    media = synthetic_media(spark, N_MEDIA, kind="image")
    feats = extract_features(media, dim=16)
    checksum = F.aggregate(
        F.zip_with(
            F.col("feature").cast("array<double>"),
            F.sequence(F.lit(1), F.lit(16)).cast("array<double>"),
            lambda x, d: x * d,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return feats.select(
        F.col("media_id").cast("long").alias("media_id"),
        F.col("n_bytes").cast("int").alias("n_bytes"),
        F.round(checksum, _R).alias("feature_checksum"),
        F.round(F.element_at(F.col("feature").cast("array<double>"), 1), _R).alias("f0"),
    )


SQL_MULTIMODAL = f"""
WITH ids AS (SELECT range AS i FROM range({N_MEDIA})),
dig AS (SELECT i, sha256(CAST(i AS VARCHAR)) AS h, 8 + i % 8 AS reps FROM ids),
bytes AS (
  SELECT i, reps, list_transform(range(32), j ->
    (strpos('0123456789abcdef', substr(h, CAST(2*j+1 AS INT), 1)) - 1) * 16 +
    (strpos('0123456789abcdef', substr(h, CAST(2*j+2 AS INT), 1)) - 1)) AS bl
  FROM dig
),
hist AS (
  SELECT i, reps, list_transform(range(16), d ->
    CAST(reps * len(list_filter(bl, b -> b % 16 = d)) AS DOUBLE)) AS hl
  FROM bytes
),
feat AS (
  SELECT i, reps,
         list_transform(hl, x ->
           CAST(x / sqrt(list_sum(list_transform(hl, y -> y * y))) AS REAL)) AS f
  FROM hist
)
SELECT CAST(i AS BIGINT) AS media_id,
       CAST(32 * reps AS INT) AS n_bytes,
       ROUND(list_sum(list_transform(range(16), d ->
             CAST(f[CAST(d + 1 AS INT)] AS DOUBLE) * (d + 1))), 6) AS feature_checksum,
       ROUND(CAST(f[1] AS DOUBLE), 6) AS f0
FROM feat
"""


# --------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_iwa_grouped(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "iwa_grouped_req50": q_iwa_grouped,
        "iwa_dates_req100": q_iwa_dates,
        "iwa_multivalue_nulls_req50": q_iwa_multivalue_nulls,
        "iwa_ungrouped_bin_salted": q_iwa_ungrouped_bin,
        "iwa_null_groups_req0": q_iwa_null_groups,
        "remove_overlaps_sweep": q_remove_overlaps,
        "grouped_cartesian": q_grouped_cartesian,
        "token_table_deterministic": q_token_table,
        "rollup_daily_tokens": q_rollup_daily,
        "rollup_weekly_cascade": q_rollup_weekly_cascade,
        "gap_fill_locf_daily": q_gap_fill_locf,
        "gap_fill_interp_daily": q_gap_fill_interp,
        "iwa_monthly_schedule": q_iwa_monthly,
        "downsample_m4_daily": q_downsample_m4,
        "sessionize_events": q_sessionize,
        "gorilla_roundtrip": q_gorilla_roundtrip,
        "running_max_events": q_running_max,
        "asof_events": q_asof_events,
        "asof_events_forward": q_asof_forward,
        "rolling_7d_stats": q_rolling_7d,
        "tier_variance_daily": q_tier_variance,
        "tier_quantiles_daily": q_tier_quantiles,
        "tier_covariance_daily": q_tier_covariance,
        "merge_intervals_events": q_merge_intervals,
        "interval_difference_events": q_interval_difference,
        "iwa_sorted_validated": q_iwa_sorted_validated,
        "multimodal_features": q_multimodal_features,
        **_PIPELINE_QUERIES,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "iwa_grouped_req50": SQL_IWA_CORE,
        "iwa_dates_req100": SQL_IWA_DATES,
        "iwa_multivalue_nulls_req50": SQL_IWA_MULTIVALUE,
        "iwa_ungrouped_bin_salted": SQL_IWA_UNGROUPED,
        "iwa_null_groups_req0": SQL_IWA_NULL_GROUPS,
        "remove_overlaps_sweep": SQL_REMOVE_OVERLAPS,
        "grouped_cartesian": SQL_GROUPED_CARTESIAN,
        "token_table_deterministic": SQL_TOKEN_TABLE,
        "rollup_daily_tokens": _token_rollup_sql(24),
        "rollup_weekly_cascade": _token_rollup_sql(168),
        "gap_fill_locf_daily": SQL_GAP_FILL,
        "gap_fill_interp_daily": SQL_GAP_FILL_INTERP,
        "iwa_monthly_schedule": SQL_IWA_MONTHLY,
        "downsample_m4_daily": SQL_DOWNSAMPLE_M4,
        "sessionize_events": SQL_SESSIONIZE,
        # gorilla_roundtrip: bit-packed binary codec, not SQL-expressible
        "running_max_events": SQL_RUNNING_MAX,
        "asof_events": SQL_ASOF_EVENTS,
        "asof_events_forward": SQL_ASOF_FORWARD,
        "rolling_7d_stats": SQL_ROLLING_7D,
        "tier_variance_daily": SQL_TIER_VARIANCE,
        "tier_quantiles_daily": SQL_TIER_QUANTILES,
        "tier_covariance_daily": SQL_TIER_COVARIANCE,
        "merge_intervals_events": SQL_MERGE_INTERVALS,
        "interval_difference_events": SQL_INTERVAL_DIFFERENCE,
        "iwa_sorted_validated": SQL_IWA_SORTED,
        "multimodal_features": SQL_MULTIMODAL,
        **_PIPELINE_ORACLES,
    }


# --------------------------------------------------------------------
# training-data pipeline queries (documents / embeddings tables)
# --------------------------------------------------------------------

from timeperiods_spark.functions import texthash as _TH  # noqa: E402
from timeperiods_spark.operators import textops as _TX  # noqa: E402
from timeperiods_spark.operators.dedup import (  # noqa: E402
    connected_components,
    exact_dedup,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_frame,
    simhash_pairs,
)
from timeperiods_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    cosine_topk_lsh,
    srp_bucket_sql,
    srp_probe_buckets_sql,
)


def q_exact_dedup(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    return exact_dedup(docs, ["text"], order_cols=["doc_id"]).select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    )


SQL_EXACT_DEDUP = """
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
FROM documents
QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
"""


def q_ngram_jaccard(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(docs, "doc_id", "text", k=5, threshold=0.4)
    return out.select("id_a", "id_b", F.round("jaccard", _R).alias("jaccard"))


SQL_NGRAM_JACCARD = f"""
WITH sh AS (
  SELECT doc_id, {_TH.shingle_hashes_sql('text', 5)} AS hashes FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(len(list_intersect(a.hashes, b.hashes)) /
             (CASE WHEN len(list_distinct(a.hashes || b.hashes)) > 0
                   THEN len(list_distinct(a.hashes || b.hashes)) END), 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.hashes, b.hashes)) /
      (CASE WHEN len(list_distinct(a.hashes || b.hashes)) > 0
            THEN len(list_distinct(a.hashes || b.hashes)) END) >= 0.4
"""


def q_minhash_pairs(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    out = minhash_candidate_pairs(
        docs, "doc_id", "text", k=5, n_hashes=12, bands=4, verify_threshold=0.4
    )
    return out.select("id_a", "id_b", F.round("jaccard", _R).alias("jaccard"))


SQL_MINHASH_PAIRS = f"""
WITH sh AS (
  SELECT doc_id, {_TH.shingle_hashes_sql('text', 5)} AS hashes FROM documents
),
nz AS (SELECT * FROM sh WHERE len(hashes) > 0),
sig AS (
  SELECT doc_id, hashes,
         {_TH.minhash_signature_sql('hashes', 12)} AS sig
  FROM nz
),
banded AS (
  SELECT doc_id, hashes, band, sig[band*3+1 : band*3+3] AS bsig
  FROM sig CROSS JOIN (SELECT CAST(range AS INT) AS band FROM range(4))
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
),
withsets AS (
  SELECT c.id_a, c.id_b, sa.hashes AS h_a, sb.hashes AS h_b
  FROM cand c JOIN sh sa ON sa.doc_id = c.id_a JOIN sh sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b,
       ROUND(len(list_intersect(h_a, h_b)) /
             (CASE WHEN len(list_distinct(h_a || h_b)) > 0
                   THEN len(list_distinct(h_a || h_b)) END), 6) AS jaccard
FROM withsets
WHERE len(list_intersect(h_a, h_b)) /
      (CASE WHEN len(list_distinct(h_a || h_b)) > 0
            THEN len(list_distinct(h_a || h_b)) END) >= 0.4
"""


def q_minhash_dedup_cc(spark, sf_dir):
    """Connected-components canonicalization over the verified MinHash
    pairs: every document labeled with the min doc_id of its duplicate
    component (its own id when unpaired). The DuckDB twin walks the
    same pair graph with a recursive CTE."""
    docs = _read(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(
        docs, "doc_id", "text", k=5, n_hashes=12, bands=4, verify_threshold=0.4
    )
    cc = connected_components(pairs)
    out = docs.select("doc_id").join(
        cc.select(F.col("id").alias("doc_id"), F.col("comp").alias("component")),
        "doc_id",
        "left",
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.coalesce("component", F.col("doc_id")).cast("long").alias("component"),
    )


SQL_MINHASH_CC = f"""
WITH RECURSIVE p AS (
  SELECT id_a, id_b FROM ({SQL_MINHASH_PAIRS}) t
),
e AS (
  SELECT id_a AS a, id_b AS b FROM p
  UNION
  SELECT id_b AS a, id_a AS b FROM p
),
walk(id, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b AS id, w.comp FROM walk w JOIN e ON e.a = w.id
)
SELECT CAST(id AS BIGINT) AS doc_id, CAST(MIN(comp) AS BIGINT) AS component
FROM walk GROUP BY id
"""


def q_simhash(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    return simhash_frame(docs, "doc_id", "text", k=5, bits=64).select(
        F.col("id").alias("doc_id"), F.col("simhash").cast("long").alias("simhash")
    )


SQL_SIMHASH = f"""
SELECT doc_id, {_TH.simhash_sql(_TH.shingle_hashes_sql('text', 5), 64)} AS simhash
FROM documents
"""


def q_simhash_pairs(spark, sf_dir):
    """Banded SimHash join at the 64-bit default: recall for hamming <
    bands is guaranteed by pigeonhole, so with max_hamming = bands - 1
    the output is EXACTLY the set of pairs within that distance — which
    the oracle states as a brute-force O(n^2) SQL (fine at oracle
    scale; the Spark path never materializes the n^2 space)."""
    docs = _read(spark, sf_dir, "documents")
    out = simhash_pairs(
        docs, "doc_id", "text", k=5, bits=64, bands=8, max_hamming=7
    )
    return out.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


SQL_SIMHASH_PAIRS = f"""
WITH s AS (
  SELECT doc_id, {_TH.simhash_sql(_TH.shingle_hashes_sql('text', 5), 64)} AS sh
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 7
"""


def q_cosine_topk(spark, sf_dir):
    emb = _read(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk(emb, queries_df, k=10)
    return out.select(
        "query_id", "vec_id", F.round("cosine", _R).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


SQL_COSINE_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, c.vec_id,
         list_dot_product(CAST(c.embedding AS DOUBLE[]), q.qv) /
         (CASE WHEN sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(q.qv, q.qv)) > 0
               THEN sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(q.qv, q.qv)) END) AS cosine
  FROM embeddings c CROSS JOIN q
)
SELECT query_id, vec_id, ROUND(cosine, 6) AS cosine,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= 10
"""


def q_cosine_lsh(spark, sf_dir):
    emb = _read(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # probes=2 is the (measured-recall) library default — stated
    # explicitly so the oracle's probe set below can never drift
    out = cosine_topk_lsh(emb, queries_df, k=10, dim=64, n_planes=6, probes=2)
    return out.select(
        "query_id", "vec_id", F.round("cosine", _R).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


SQL_COSINE_LSH = f"""
WITH c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {srp_bucket_sql('CAST(embedding AS DOUBLE[])', 64, 6)} AS bucket
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, v AS qv, bucket FROM c WHERE vec_id < 5
),
qp AS (
  SELECT query_id, qv, unnest({srp_probe_buckets_sql('bucket', 6, 2)}) AS pb FROM q
),
scored AS (
  SELECT DISTINCT q.query_id, c.vec_id,
         list_dot_product(c.v, q.qv) /
         (CASE WHEN sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.qv, q.qv)) > 0
               THEN sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.qv, q.qv)) END) AS cosine
  FROM c JOIN qp q ON c.bucket = q.pb
)
SELECT query_id, vec_id, ROUND(cosine, 6) AS cosine,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= 10
"""


def _wide_embeddings(spark, sf_dir):
    """Deterministic 1024-dim vectors: 16 integer-scaled copies of the
    64-dim embedding, tiled — exact in both engines (x * j for small
    int j is exact float arithmetic)."""
    emb = _read(spark, sf_dir, "embeddings")
    wide = emb.select(
        "vec_id",
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.lit(16)),
                lambda j: F.transform(
                    F.col("embedding").cast("array<double>"), lambda x: x * j
                ),
            )
        ).alias("embedding"),
    )
    # materialize the synthetic widening through an exchange: without
    # it CollapseProject inlines the flatten/transform into every
    # downstream consumer (16 plane dots + cosine + norms re-derive the
    # 1024-array per use — measured 4x slower). A real pipeline reads
    # the wide column from storage and has no such artifact.
    return wide.repartition("vec_id")


def q_cosine_lsh_highdim(spark, sf_dir):
    """SRP LSH at real embedding width (dim=1024, n_planes=16): pins
    that the plane expressions stay O(n_planes) plan nodes (array
    literals + zip_with dots), not an unrolled 16k-term sum."""
    wide = _wide_embeddings(spark, sf_dir)
    queries_df = wide.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # probes=0 explicitly: this query pins the O(n_planes) plan shape
    # at real width, not recall (the library default is probes=2)
    out = cosine_topk_lsh(wide, queries_df, k=10, dim=1024, n_planes=16, probes=0)
    return out.select(
        "query_id", "vec_id", F.round("cosine", _R).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


_WIDE_SQL = (
    "SELECT vec_id, flatten(list_transform(range(1, 17), "
    "j -> list_transform(CAST(embedding AS DOUBLE[]), x -> x * j))) AS v "
    "FROM embeddings"
)

SQL_COSINE_LSH_HIGHDIM = f"""
WITH w AS ({_WIDE_SQL}),
c AS (
  SELECT vec_id, v, {srp_bucket_sql('v', 1024, 16)} AS bucket FROM w
),
q AS (
  SELECT vec_id AS query_id, v AS qv, bucket FROM c WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, c.vec_id,
         list_dot_product(c.v, q.qv) /
         (CASE WHEN sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.qv, q.qv)) > 0
               THEN sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.qv, q.qv)) END) AS cosine
  FROM c JOIN q ON c.bucket = q.bucket
)
SELECT query_id, vec_id, ROUND(cosine, 6) AS cosine,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= 10
"""


def q_cosine_ivf(spark, sf_dir):
    """IVF approximate top-k: one deterministic-centroid cell per corpus
    vector, n_probe nearest cells scanned per query. The oracle derives
    the same cells/probes from the identical centroid arithmetic via
    unnest + window ranking."""
    from timeperiods_spark.operators.similarity import cosine_topk_ivf

    emb = _read(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk_ivf(
        emb, queries_df, k=10, dim=64, n_centroids=16, n_probe=8
    )
    return out.select(
        "query_id", "vec_id", F.round("cosine", _R).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def _ivf_sql(dim: int, n_centroids: int, n_probe: int) -> str:
    from timeperiods_spark.operators.similarity import (
        _ivf_centroid,
        _ivf_centroid_norm,
    )

    cents = "[" + ", ".join(
        "[" + ", ".join(repr(v) for v in _ivf_centroid(c, dim)) + "]"
        for c in range(n_centroids)
    ) + "]"
    norms = "[" + ", ".join(
        repr(_ivf_centroid_norm(c, dim)) for c in range(n_centroids)
    ) + "]"
    return f"""
WITH c0 AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cs AS (
  SELECT vec_id, v, CAST(cl AS INT) AS cell,
         list_dot_product(v, ({cents})[CAST(cl AS INT) + 1]) /
         (({norms})[CAST(cl AS INT) + 1]) AS s
  FROM c0, unnest(range({n_centroids})) AS t(cl)
),
c AS (
  SELECT vec_id, v, cell FROM cs
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cell ASC) = 1
),
q AS (
  SELECT vec_id AS query_id, v, cell FROM cs
  WHERE vec_id < 5
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cell DESC) <= {n_probe}
),
scored AS (
  SELECT q.query_id, c.vec_id,
         list_dot_product(c.v, q.v) /
         (CASE WHEN sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.v, q.v)) > 0
               THEN sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.v, q.v)) END) AS cosine
  FROM c JOIN q ON c.cell = q.cell
)
SELECT query_id, vec_id, ROUND(cosine, 6) AS cosine,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= 10
"""


SQL_COSINE_IVF = _ivf_sql(64, 16, 8)


def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (the fifth dedup mode): the
    corpus plus exact scaled copies (cosine 1.0 by construction) of the
    first 20 vectors; SRP multi-probe candidates verified by exact
    cosine. The oracle replays the identical bucket/probe arithmetic."""
    from timeperiods_spark.operators.dedup import embedding_neardup_pairs

    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    copies = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 2).alias("embedding"),
    )
    allv = emb.unionByName(copies)
    out = embedding_neardup_pairs(
        allv, "vec_id", "embedding", dim=64, n_planes=8, threshold=0.6, probes=1
    )
    return out.select("id_a", "id_b", F.round("cosine", _R).alias("cosine"))


SQL_EMBEDDING_NEARDUP = f"""
WITH allv AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS id,
         list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2) AS v
  FROM embeddings WHERE vec_id < 20
),
b AS (SELECT id, v, {srp_bucket_sql('v', 64, 8)} AS bk FROM allv),
probed AS (
  SELECT id AS id_a, unnest({srp_probe_buckets_sql('bk', 8)}) AS pb FROM b
),
cand AS (
  SELECT DISTINCT p.id_a, r.id AS id_b
  FROM probed p JOIN b r ON p.pb = r.bk AND p.id_a < r.id
),
wv AS (
  SELECT c.id_a, c.id_b,
         list_dot_product(a.v, bb.v) /
         (CASE WHEN sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(bb.v, bb.v)) > 0
               THEN sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(bb.v, bb.v)) END) AS cos
  FROM cand c JOIN b a ON a.id = c.id_a JOIN b bb ON bb.id = c.id_b
)
SELECT id_a, id_b, ROUND(cos, 6) AS cosine FROM wv WHERE cos >= 0.6
"""


def q_simhash_incremental(spark, sf_dir):
    """Incremental SimHash dedup against a persisted chunk index
    (VERDICT r3 item 5 family): docs below 250 bootstrap the index;
    the batch above probes it plus itself. With max_hamming=7 <
    bands=8 the banded candidate join is EXACT (pigeonhole), so the
    DuckDB twin states whole-corpus survivors brute-force over full
    fingerprints (union formulation, monotone ids)."""
    from timeperiods_spark.operators.dedup import (
        build_simhash_index,
        simhash_dedup_incremental,
    )

    docs = _read(spark, sf_dir, "documents")
    idx_c, idx_f = build_simhash_index(
        docs.filter(F.col("doc_id") < 250), "doc_id", "text",
        k=5, bits=64, bands=8,
    )
    r = simhash_dedup_incremental(
        docs.filter(F.col("doc_id") >= 250), "doc_id", "text",
        index_chunks=idx_c, index_fingerprints=idx_f,
        k=5, bits=64, bands=8, max_hamming=7, broadcast_batch=True,
    )
    return r["deduped"].select(F.col("doc_id").cast("long").alias("doc_id"))


SQL_SIMHASH_INCREMENTAL = f"""
WITH pr AS ({SQL_SIMHASH_PAIRS})
SELECT CAST(doc_id AS BIGINT) AS doc_id
FROM documents
WHERE doc_id >= 250
  AND doc_id NOT IN (SELECT id_b FROM pr)
"""


def q_embedding_incremental(spark, sf_dir):
    """Incremental embedding dedup against a persisted SRP index
    (VERDICT r3 item 5, the embedding mirror of
    minhash_dedup_incremental): originals below vec_id 250 bootstrap
    the index (ALL buckets+vectors, survivors and dropped); the batch
    (originals >= 250 plus scaled near-dup copies at +100000) probes
    it plus itself. With monotone ids this reproduces EXACTLY the
    whole-corpus embedding_neardup_pairs single-hop survivor set —
    which is what the DuckDB twin computes (union formulation: all
    pairs over the full corpus, batch ids minus pair losers)."""
    from timeperiods_spark.operators.dedup import (
        build_embedding_index,
        embedding_dedup_incremental,
    )

    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    copies = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 2).alias("embedding"),
    )
    idx_b, idx_v = build_embedding_index(
        emb.filter(F.col("vec_id") < 250), "vec_id", "embedding",
        dim=64, n_planes=8,
    )
    batch = emb.filter(F.col("vec_id") >= 250).unionByName(copies)
    r = embedding_dedup_incremental(
        batch, "vec_id", "embedding",
        index_buckets=idx_b, index_vectors=idx_v,
        dim=64, n_planes=8, threshold=0.6, probes=1,
        broadcast_batch=True,
    )
    return r["deduped"].select(F.col("vec_id").cast("long").alias("vec_id"))


SQL_EMBEDDING_INCREMENTAL = f"""
WITH pr AS ({SQL_EMBEDDING_NEARDUP})
SELECT CAST(bid AS BIGINT) AS vec_id FROM (
  SELECT vec_id AS bid FROM embeddings WHERE vec_id >= 250
  UNION ALL
  SELECT vec_id + 100000 AS bid FROM embeddings WHERE vec_id < 20
)
WHERE bid NOT IN (SELECT id_b FROM pr)
"""


def q_textops(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        _TX.whitespace_token_count(t).cast("long").alias("ws_tokens"),
        _TX.bpe_token_count(t).cast("long").alias("bpe_tokens"),
        F.round(_TX.quality_score(t), _R).alias("quality"),
        _TX.lang_id(t).alias("lang_pred"),
        _TX.fingerprint(t).alias("fingerprint"),
    )


SQL_TEXTOPS = f"""
SELECT doc_id,
       CAST({_TX.whitespace_token_count_sql('text')} AS BIGINT) AS ws_tokens,
       CAST({_TX.bpe_token_count_sql('text')} AS BIGINT) AS bpe_tokens,
       ROUND({_TX.quality_score_sql('text')}, 6) AS quality,
       {_TX.lang_id_sql('text')} AS lang_pred,
       {_TX.fingerprint_sql('text')} AS fingerprint
FROM documents
"""

def _docs_with_lines(spark, sf_dir):
    """Line-broken documents scaffold: the synthetic corpus is
    single-line, so both engines deterministically break lines before
    the word 'table' and append a shared boilerplate footer — giving
    every doc multiple lines and the corpus guaranteed cross-doc
    duplicate lines."""
    docs = _read(spark, sf_dir, "documents")
    t = F.concat(
        F.regexp_replace(F.col("text"), F.lit(" table"), F.lit("\ntable")),
        F.lit("\nthe common footer boilerplate"),
    )
    return docs.select(F.col("doc_id").cast("long").alias("doc_id"), t.alias("text"))


_SQL_DOCS_WITH_LINES = """
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         replace(text, ' table', chr(10) || 'table')
         || chr(10) || 'the common footer boilerplate' AS text
  FROM documents
"""


def q_filter_lines(spark, sf_dir):
    """C4-style rule filtering over line-broken docs: keep lines with
    >= 3 words that don't mention 'footer'. Pure map-side projection
    (split -> HOF filter -> reassemble), zero shuffle."""
    from timeperiods_spark import filter_lines

    return filter_lines(
        _docs_with_lines(spark, sf_dir), "text",
        min_words=3, deny_substrings=["footer"],
    ).select("doc_id", "text_filtered", "lines_kept", "lines_dropped")


_DUCK_KEEP = (
    "list_filter(ls, x -> len(string_split_regex(trim(x), '\\s+')) >= 3 "
    "AND length(trim(x)) > 0 AND NOT contains(lower(x), 'footer'))"
)

SQL_FILTER_LINES = f"""
WITH base AS ({_SQL_DOCS_WITH_LINES}),
parts AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM base)
SELECT doc_id,
       array_to_string({_DUCK_KEEP}, chr(10)) AS text_filtered,
       CAST(len({_DUCK_KEEP}) AS BIGINT) AS lines_kept,
       CAST(len(ls) - len({_DUCK_KEEP}) AS BIGINT) AS lines_dropped
FROM parts
"""


def q_dedup_lines(spark, sf_dir):
    """Exact cross-corpus line dedup (keep-first) over line-broken
    docs: every repeated line survives only at its smallest
    (doc_id, line index). Two exchanges: the election hash-agg keyed
    by line and the join-back; reassembly is bounded per doc."""
    from timeperiods_spark import dedup_lines

    return dedup_lines(_docs_with_lines(spark, sf_dir), "doc_id", "text")


SQL_DEDUP_LINES = f"""
WITH base AS ({_SQL_DOCS_WITH_LINES}),
lines AS (
  SELECT doc_id, ln, idx - 1 AS idx, trim(ln) AS key,
         length(trim(ln)) >= 1 AS cand
  FROM (
    SELECT doc_id,
           unnest(string_split(text, chr(10))) AS ln,
           generate_subscripts(string_split(text, chr(10)), 1) AS idx
    FROM base
  )
),
first AS (
  SELECT key, doc_id AS fid, idx AS fidx,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY doc_id, idx) AS rn
  FROM lines WHERE cand
),
keep AS (
  SELECT l.doc_id, l.idx, l.ln
  FROM lines l
  LEFT JOIN (SELECT key, fid, fidx FROM first WHERE rn = 1) f
    ON l.key = f.key
  WHERE NOT l.cand OR (l.doc_id = f.fid AND l.idx = f.fidx)
),
agg AS (
  SELECT doc_id, string_agg(ln, chr(10) ORDER BY idx) AS txt,
         COUNT(*) AS n
  FROM keep GROUP BY doc_id
),
totals AS (SELECT doc_id, COUNT(*) AS total FROM lines GROUP BY doc_id)
SELECT t.doc_id,
       COALESCE(a.txt, '') AS text_deduped,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS lines_kept,
       CAST(t.total - COALESCE(a.n, 0) AS BIGINT) AS lines_dropped
FROM totals t LEFT JOIN agg a ON t.doc_id = a.doc_id
"""


def _daily_means(spark, sf_dir):
    """Shared scaffold for the recurrence queries: one row per
    (event_type, day) with the 6dp-rounded daily mean — rounded BEFORE
    the recurrence so both engines feed bit-identical inputs."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.round(F.avg("value"), _R).alias("v"))
    )


_SQL_DAILY_MEANS = """
  SELECT event_type, CAST(ts AS DATE) AS day, ROUND(AVG(value), 6) AS v
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
"""


def q_ewma_daily(spark, sf_dir):
    """EWMA (pandas adjust=False recurrence, init=first) over daily
    event means. Spark computes the two-level scan (per-bucket Arrow
    `ewm` + exact HOF composition across buckets); the oracle computes
    the same statistic via the O(n^2) closed-form weighted sum — tiny
    at oracle scale, and the float gap between the two assemblies is
    O(eps/alpha), far below the shared 6dp output grid."""
    from timeperiods_spark import ewma

    return ewma(
        _daily_means(spark, sf_dir), "day", "v", ["event_type"], alpha=0.3
    )


SQL_EWMA_DAILY = f"""
WITH daily AS ({_SQL_DAILY_MEANS}),
idx AS (
  SELECT event_type, day, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) - 1 AS i
  FROM daily
)
SELECT a.event_type, a.day, a.v,
       ROUND(SUM(CASE WHEN b.i = 0 THEN POWER(0.7, a.i - b.i) * b.v
                 ELSE 0.3 * POWER(0.7, a.i - b.i) * b.v END), 6) AS ewma
FROM idx a JOIN idx b
  ON a.event_type IS NOT DISTINCT FROM b.event_type AND b.i <= a.i
GROUP BY a.event_type, a.day, a.v
"""


def q_holt_daily(spark, sf_dir):
    """Holt linear-trend smoothing (alpha=.3, beta=.2, h=7 forecast)
    over daily event means. Spark runs the generalized 2-dim linear
    recurrence scan (matrix-kernel convolution per bucket + exact
    matrix composition); the oracle is the recurrence ITSELF via a
    recursive CTE — sequential per group, fine at oracle scale."""
    from timeperiods_spark import holt

    return holt(
        _daily_means(spark, sf_dir), "day", "v", ["event_type"],
        alpha=0.3, beta=0.2, forecast=7,
    )


SQL_HOLT_DAILY = f"""
WITH RECURSIVE daily AS ({_SQL_DAILY_MEANS}),
idx AS (
  SELECT event_type, day, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM daily
),
rec AS (
  SELECT event_type, day, v, i, v AS l, CAST(0.0 AS DOUBLE) AS b
  FROM idx WHERE i = 1
  UNION ALL
  SELECT idx.event_type, idx.day, idx.v, idx.i,
         0.3 * idx.v + 0.7 * (rec.l + rec.b) AS l,
         0.2 * (0.3 * idx.v + 0.7 * (rec.l + rec.b) - rec.l) + 0.8 * rec.b AS b
  FROM idx JOIN rec
    ON idx.event_type IS NOT DISTINCT FROM rec.event_type
   AND idx.i = rec.i + 1
)
SELECT event_type, day, v,
       ROUND(l, 6) AS holt_level,
       ROUND(b, 6) AS holt_trend,
       ROUND(l + 7 * b, 6) AS holt_forecast
FROM rec
"""


def q_cusum_daily(spark, sf_dir):
    """Two-sided tabular CUSUM over daily event means (target 50,
    slack 1, alarm threshold 25) — exact closed prefix form
    (P_i - min(0, running min P)) via two chained bucketed-carry
    scans; the oracle is the identical arithmetic as window sums."""
    from timeperiods_spark import cusum

    return cusum(
        _daily_means(spark, sf_dir), "day", "v", ["event_type"],
        target=50.0, slack=1.0, threshold=25.0,
    )


SQL_CUSUM_DAILY = f"""
WITH daily AS ({_SQL_DAILY_MEANS}),
p AS (
  SELECT event_type, day, v,
         SUM(v - 50.0 - 1.0) OVER w AS P,
         SUM(-(v - 50.0) - 1.0) OVER w AS Pn
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, day, v,
       ROUND(P - LEAST(0, MIN(P) OVER w2), 6) AS cusum_pos,
       ROUND(Pn - LEAST(0, MIN(Pn) OVER w2), 6) AS cusum_neg,
       (ROUND(P - LEAST(0, MIN(P) OVER w2), 6) > 25.0
        OR ROUND(Pn - LEAST(0, MIN(Pn) OVER w2), 6) > 25.0) AS alarm
FROM p
WINDOW w2 AS (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def _events_days(spark, sf_dir):
    ev = _read(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "event_type",
            F.unix_date(F.col("ts").cast("date")).cast("long").alias("day"),
            "user_id",
        )
    )


_SQL_EVENTS_DAYS = """
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
         user_id
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
"""


def q_distinct_daily(spark, sf_dir):
    """Daily distinct users per event type through the HLL tier path.
    The sketch itself has no cross-engine twin, so the query is
    self-auditing: it emits the EXACT count (oracle-comparable) plus
    ``est_ok`` = |HLL estimate − exact| / exact <= 5% computed in-band
    (the oracle emits literal TRUE — a drifting sketch flips the flag
    and fails the hash compare)."""
    from timeperiods_spark import distinct_rollup, finalize_distinct

    ev = _events_days(spark, sf_dir)
    daily = distinct_rollup(ev, "day", "user_id", ["event_type"],
                            width=1, exact=True)
    fin = finalize_distinct(daily, "user_id", ["event_type"], width=1)
    return fin.select(
        "event_type",
        F.col("period").alias("day"),
        F.col("n_distinct").cast("long").alias("n_users"),
        (
            F.abs(F.col("n_distinct_est") - F.col("n_distinct"))
            <= 0.05 * F.col("n_distinct")
        ).alias("est_ok"),
    )


SQL_DISTINCT_DAILY = f"""
WITH ev AS ({_SQL_EVENTS_DAYS})
SELECT event_type, day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       TRUE AS est_ok
FROM ev GROUP BY event_type, day
"""


def q_distinct_weekly(spark, sf_dir):
    """Weekly distinct users derived by CASCADING the daily HLL
    partials (hll_union_agg — no raw rescan), audited in-band against
    the exact weekly distinct count."""
    from timeperiods_spark import (
        distinct_cascade,
        distinct_rollup,
        finalize_distinct,
    )

    ev = _events_days(spark, sf_dir)
    daily = distinct_rollup(ev, "day", "user_id", ["event_type"], width=1)
    weekly = finalize_distinct(
        distinct_cascade(daily, "user_id", ["event_type"],
                         fine_width=1, coarse_width=7),
        "user_id", ["event_type"], width=7,
    )
    exact = (
        ev.withColumn("period", F.floor(F.col("day") / 7).cast("long"))
        .groupBy("event_type", "period")
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )
    j = weekly.join(exact, ["event_type", "period"], "inner")
    return j.select(
        "event_type",
        F.col("period").alias("week"),
        "n_users",
        (
            F.abs(F.col("n_distinct_est") - F.col("n_users"))
            <= 0.05 * F.col("n_users")
        ).alias("est_ok"),
    )


SQL_DISTINCT_WEEKLY = f"""
WITH ev AS ({_SQL_EVENTS_DAYS})
SELECT event_type,
       CAST(FLOOR(day / 7) AS BIGINT) AS week,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       TRUE AS est_ok
FROM ev GROUP BY event_type, FLOOR(day / 7)
"""


def q_zscore_anomaly(spark, sf_dir):
    """Trailing z-score anomaly flags over daily event means: baseline
    = the 7 strictly-preceding days (fan-out + hash agg in Spark; a
    RANGE window in the oracle — same arithmetic)."""
    from timeperiods_spark import zscore_anomaly

    return zscore_anomaly(
        _daily_means(spark, sf_dir), "day", "v", ["event_type"], k=7, z=2.0
    )


_ZN = "SUM(v) OVER win"
_ZSS = "SUM(v*v) OVER win"
_ZC = "COUNT(v) OVER win"
_ZMEAN = f"({_ZN}) / ({_ZC})"
_ZSTD = f"sqrt(greatest(({_ZSS}) / ({_ZC}) - ({_ZMEAN}) * ({_ZMEAN}), 0.0))"
_ZSCORE = (
    f"CASE WHEN ({_ZC}) >= 3 AND ROUND({_ZSTD}, 6) > 0.0 "
    f"THEN ROUND((v - ({_ZMEAN})) / ({_ZSTD}), 6) END"
)

SQL_ZSCORE_ANOMALY = f"""
WITH daily AS ({_SQL_DAILY_MEANS}),
d2 AS (
  SELECT event_type, day, v,
         CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT) AS dl
  FROM daily
)
SELECT event_type, day, v,
       CASE WHEN ({_ZC}) > 0 THEN ROUND({_ZMEAN}, 6) END AS base_mean,
       CASE WHEN ({_ZC}) > 0 THEN ROUND({_ZSTD}, 6) END AS base_std,
       {_ZSCORE} AS zscore,
       COALESCE(ABS({_ZSCORE}) > 2.0, FALSE) AS is_anomaly
FROM d2
WINDOW win AS (PARTITION BY event_type ORDER BY dl
               RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
"""


def q_seasonal_adjust(spark, sf_dir):
    """Additive day-of-week adjustment of daily event means: subtract
    the (type, weekday) mean, re-center on the type mean."""
    from timeperiods_spark import seasonal_adjust

    return seasonal_adjust(
        _daily_means(spark, sf_dir), "day", "v", ["event_type"],
        season_length=7,
    )


SQL_SEASONAL_ADJUST = f"""
WITH daily AS ({_SQL_DAILY_MEANS}),
d2 AS (
  SELECT event_type, day, v,
         CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT) AS dl
  FROM daily
)
SELECT event_type, day, v,
       CAST(((dl % 7) + 7) % 7 AS BIGINT) AS season,
       ROUND(AVG(v) OVER (PARTITION BY event_type, ((dl % 7) + 7) % 7), 6)
         AS seasonal_mean,
       ROUND(v - AVG(v) OVER (PARTITION BY event_type, ((dl % 7) + 7) % 7)
             + AVG(v) OVER (PARTITION BY event_type), 6) AS v_adj
FROM d2
"""


#: greedy-tokenizer vocab for the driver query — multi-char pieces
#: exercise longest-match; single letters are fallbacks; letters
#: outside the list emit unk (0)
_TOKVOCAB = {
    "ta": 1, "ble": 2, "val": 3, "ue": 4, "row": 5, "scan": 6,
    "key": 7, "agg": 8, "ha": 9, "sh": 10, "mer": 11, "ge": 12,
    "ba": 13, "tch": 14, "win": 15, "dow": 16, "spark": 17, "or": 18,
    "der": 19, "da": 20, "col": 21, "umn": 22, "jo": 23, "in": 24,
    "a": 25, "e": 26, "s": 27, "t": 28, "l": 29, "m": 30, "n": 31,
    "r": 32, "u": 33, "c": 34, "d": 35, "o": 36, "p": 37, "q": 38,
    "b": 39, "f": 40, "w": 41,
}


def q_tokenize(spark, sf_dir):
    """Greedy longest-match vocab tokenization of the documents
    corpus. Spark tokenizes DISTINCT words only (Zipf: vocabulary-
    sized Python, corpus-sized JVM) and joins back; the oracle runs
    the identical greedy semantics as a recursive CTE over word
    positions. Token ids compare as a CSV string (array columns
    sidestep the driver's value-hash ordering)."""
    from timeperiods_spark import tokenize_vocab

    docs = _read(spark, sf_dir, "documents")
    out = tokenize_vocab(docs, "doc_id", "text", _TOKVOCAB)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_tok"),
        F.concat_ws(",", F.transform("tokens", lambda t: t.cast("string")))
        .alias("toks_csv"),
    )


_VOCAB_VALUES = ",".join(f"('{p}',{i})" for p, i in _TOKVOCAB.items())

SQL_TOKENIZE = f"""
WITH RECURSIVE vocab(piece, id) AS (VALUES {_VOCAB_VALUES}),
docw AS (
  SELECT doc_id, w, idx FROM (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS idx
    FROM documents
  ) WHERE LEN(w) > 0
),
words0 AS (SELECT DISTINCT w FROM docw),
steps AS (
  SELECT w, 0 AS pos, CAST('' AS VARCHAR) AS toks FROM words0
  UNION ALL
  SELECT s.w,
         s.pos + COALESCE((SELECT MAX(LEN(v.piece)) FROM vocab v
                           WHERE v.piece = substr(s.w, s.pos + 1, LEN(v.piece))), 1) AS pos,
         (CASE WHEN s.toks = '' THEN '' ELSE s.toks || ',' END) ||
         COALESCE(CAST((SELECT v.id FROM vocab v
                        WHERE v.piece = substr(s.w, s.pos + 1, LEN(v.piece))
                        ORDER BY LEN(v.piece) DESC LIMIT 1) AS VARCHAR), '0') AS toks
  FROM steps s WHERE s.pos < LEN(s.w)
),
final AS (SELECT w, toks FROM steps WHERE pos >= LEN(w)),
joined AS (
  SELECT d.doc_id, d.idx, f.toks,
         LEN(string_split(f.toks, ',')) AS n
  FROM docw d JOIN final f ON d.w = f.w
),
agg AS (
  SELECT doc_id,
         string_agg(toks, ',' ORDER BY idx) AS toks_csv,
         SUM(n) AS n
  FROM joined GROUP BY doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_tok,
       COALESCE(a.toks_csv, '') AS toks_csv
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


def q_cosine_ivf_via_index(spark, sf_dir):
    """IVF top-k against the PERSISTED index path (build_ivf_index +
    cosine_topk_ivf_index): same semantics as cosine_topk_ivf, so the
    SAME oracle SQL pins both — at 100 TB the index is written
    partitioned by cell and the probe filter prunes at the file level
    (pinned in tests)."""
    from timeperiods_spark import build_ivf_index, cosine_topk_ivf_index

    emb = _read(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = build_ivf_index(emb, dim=64, n_centroids=16)
    out = cosine_topk_ivf_index(
        idx, queries_df, k=10, dim=64, n_centroids=16, n_probe=8
    )
    return out.select(
        "query_id", "vec_id", F.round("cosine", _R).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_overlap_join(spark, sf_dir):
    """Public foverlaps surface: 3-day measurement intervals joined to
    even-week target periods per event type, left-outer (unmatched
    measurements keep NULL y columns — data.table nomatch=NA)."""
    from timeperiods_spark import overlap_join

    d = _daily_means(spark, sf_dir).select(
        "event_type", F.unix_date("day").cast("long").alias("dl"), "v"
    )
    x = d.select("event_type", F.col("dl").alias("s"),
                 (F.col("dl") + 2).alias("e"), "v")
    y = d.select(
        "event_type",
        (F.floor(F.col("dl") / 7) * 7).cast("long").alias("s"),
        (F.floor(F.col("dl") / 7) * 7 + 6).cast("long").alias("e"),
    ).filter(F.pmod(F.floor(F.col("s") / 7), F.lit(2)) == 0).distinct()
    out = overlap_join(x, y, ("s", "e"), ["event_type"], how="left")
    return out.select(
        "event_type", "s_x", "e_x", "s_y", "e_y", "v",
        "overlap_start", "overlap_end", "overlap_duration",
    )


SQL_OVERLAP_JOIN = f"""
WITH daily AS ({_SQL_DAILY_MEANS}),
d2 AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT) AS dl, v
  FROM daily
),
x AS (SELECT event_type, dl AS s, dl + 2 AS e, v FROM d2),
y AS (
  SELECT DISTINCT event_type,
         CAST(FLOOR(dl / 7) * 7 AS BIGINT) AS ys,
         CAST(FLOOR(dl / 7) * 7 + 6 AS BIGINT) AS ye
  FROM d2
  WHERE CAST(FLOOR(dl / 7) AS BIGINT) % 2 = 0
)
SELECT x.event_type,
       x.s AS s_x, x.e AS e_x, y.ys AS s_y, y.ye AS e_y, x.v,
       CASE WHEN y.ys IS NULL THEN NULL
            ELSE GREATEST(x.s, y.ys) END AS overlap_start,
       CASE WHEN y.ys IS NULL THEN NULL
            ELSE LEAST(x.e, y.ye) END AS overlap_end,
       CASE WHEN y.ys IS NULL THEN NULL
            ELSE CAST(LEAST(x.e, y.ye) - GREATEST(x.s, y.ys) + 1 AS BIGINT)
       END AS overlap_duration
FROM x LEFT JOIN y
  ON x.event_type IS NOT DISTINCT FROM y.event_type
 AND x.s <= y.ye AND x.e >= y.ys
"""


def q_overlap_join_bin_left(spark, sf_dir):
    """Left-how twin on the BUCKETIZED strategy: the bin join preserves
    x inside the join (first-bin NULL candidate + one max(matched)
    window over the x identity) instead of the old dropDuplicates +
    left_anti rescan — pinned in tests/test_plans.py as <= inner
    exchanges + 1 and anti-join-free. Odd weeks only, so a third of the
    measurements come back unmatched with NULL y columns."""
    from timeperiods_spark import overlap_join

    d = _daily_means(spark, sf_dir).select(
        "event_type", F.unix_date("day").cast("long").alias("dl"), "v"
    )
    x = d.select("event_type", F.col("dl").alias("s"),
                 (F.col("dl") + 2).alias("e"), "v")
    y = d.select(
        "event_type",
        (F.floor(F.col("dl") / 7) * 7).cast("long").alias("s"),
        (F.floor(F.col("dl") / 7) * 7 + 6).cast("long").alias("e"),
    ).filter(F.pmod(F.floor(F.col("s") / 7), F.lit(2)) == 1).distinct()
    out = overlap_join(
        x, y, ("s", "e"), ["event_type"], how="left",
        join_strategy="bin", bin_width=7,
    )
    return out.select(
        "event_type", "s_x", "e_x", "s_y", "e_y", "v",
        "overlap_start", "overlap_end", "overlap_duration",
    )


SQL_OVERLAP_JOIN_BIN_LEFT = f"""
WITH daily AS ({_SQL_DAILY_MEANS}),
d2 AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT) AS dl, v
  FROM daily
),
x AS (SELECT event_type, dl AS s, dl + 2 AS e, v FROM d2),
y AS (
  SELECT DISTINCT event_type,
         CAST(FLOOR(dl / 7) * 7 AS BIGINT) AS ys,
         CAST(FLOOR(dl / 7) * 7 + 6 AS BIGINT) AS ye
  FROM d2
  WHERE CAST(FLOOR(dl / 7) AS BIGINT) % 2 = 1
)
SELECT x.event_type,
       x.s AS s_x, x.e AS e_x, y.ys AS s_y, y.ye AS e_y, x.v,
       CASE WHEN y.ys IS NULL THEN NULL
            ELSE GREATEST(x.s, y.ys) END AS overlap_start,
       CASE WHEN y.ys IS NULL THEN NULL
            ELSE LEAST(x.e, y.ye) END AS overlap_end,
       CASE WHEN y.ys IS NULL THEN NULL
            ELSE CAST(LEAST(x.e, y.ye) - GREATEST(x.s, y.ys) + 1 AS BIGINT)
       END AS overlap_duration
FROM x LEFT JOIN y
  ON x.event_type IS NOT DISTINCT FROM y.event_type
 AND x.s <= y.ye AND x.e >= y.ys
"""


def q_gopher_quality(spark, sf_dir):
    """Gopher Appendix-A quality rules over documents (thresholds
    lowered to fit the short synthetic docs so both branches of every
    rule are exercised)."""
    from timeperiods_spark import gopher_quality

    docs = _read(spark, sf_dir, "documents")
    out = gopher_quality(
        docs, "text", min_words=40, min_stopword_hits=1,
        min_mean_word_len=3.0, max_mean_word_len=6.0,
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "words_ok", "word_len_ok", "symbol_ok", "alpha_ok",
        "stopword_ok", "bullet_ok", "ellipsis_ok", "gopher_keep",
    )


def _gopher_sql():
    from timeperiods_spark.operators.textops import gopher_quality_sql

    r = gopher_quality_sql("text", dict(
        min_words=40, min_stopword_hits=1,
        min_mean_word_len=3.0, max_mean_word_len=6.0,
    ))
    keep = " AND ".join(r.values())
    cols = ",\n       ".join(f"{v} AS {k}" for k, v in r.items())
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       {cols},
       ({keep}) AS gopher_keep
FROM documents
"""


SQL_GOPHER_QUALITY = _gopher_sql()


def q_pii_scrub(spark, sf_dir):
    """PII detect + scrub over the documents table. The synthetic
    corpus carries no organic emails/IPs, so the query PLANTS
    deterministic PII spans first (email on doc_id%7, IPv4 on %11,
    phone on %13) — the DuckDB twin plants byte-identical spans —
    then counts each pattern on the original text and emits the
    scrubbed text. Pure map-side projection: zero shuffle; the three
    regexes are RE2-safe so the twin runs them verbatim."""
    docs = _read(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("long")
    txt = F.concat(
        F.col("text"),
        F.when(did % 7 == 0,
               F.format_string(" mail user%d@example.com", did))
         .otherwise(F.lit("")),
        F.when(did % 11 == 0,
               F.format_string(" from 10.0.%d.9", did % 200))
         .otherwise(F.lit("")),
        F.when(did % 13 == 0,
               F.format_string(" call +1 (555) 010-%04d", did % 10000))
         .otherwise(F.lit("")),
    )
    base = docs.select(did.alias("doc_id"), txt.alias("text"))
    out = _TX.scrub_pii(base, "text", out_col="scrubbed")
    return out.select(
        "doc_id",
        F.col("email_count").cast("long").alias("email_count"),
        F.col("ipv4_count").cast("long").alias("ipv4_count"),
        F.col("phone_count").cast("long").alias("phone_count"),
        "scrubbed",
    )


SQL_PII_SCRUB = f"""
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN printf(' mail user%d@example.com', doc_id) ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN printf(' from 10.0.%d.9', doc_id % 200) ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN printf(' call +1 (555) 010-%04d', doc_id % 10000) ELSE '' END
         AS text
  FROM documents
)
SELECT doc_id,
       CAST({_TX.pii_count_sql('text', _TX.PII_PATTERNS[0][1])} AS BIGINT) AS email_count,
       CAST({_TX.pii_count_sql('text', _TX.PII_PATTERNS[1][1])} AS BIGINT) AS ipv4_count,
       CAST({_TX.pii_count_sql('text', _TX.PII_PATTERNS[2][1])} AS BIGINT) AS phone_count,
       {_TX.scrub_text_sql('text')} AS scrubbed
FROM base
"""


def q_minhash_incremental(spark, sf_dir):
    """Incremental dedup against a persisted band index (VERDICT r2
    item 5): docs below the split bootstrap the index (ALL signatures,
    survivors and dropped); the batch above the split probes it plus
    itself. With monotone doc ids this reproduces EXACTLY the
    whole-corpus single_hop survivor set — which is what the DuckDB
    twin computes (union formulation: all pairs over the full corpus,
    batch docs minus pair losers)."""
    from timeperiods_spark.operators.dedup import (
        build_minhash_index,
        minhash_dedup_incremental,
    )

    docs = _read(spark, sf_dir, "documents")
    split = 250
    idx_b, idx_s = build_minhash_index(
        docs.filter(F.col("doc_id") < split), "doc_id", "text",
        k=5, n_hashes=12, bands=4,
    )
    r = minhash_dedup_incremental(
        docs.filter(F.col("doc_id") >= split), "doc_id", "text",
        index_bands=idx_b, index_shingles=idx_s,
        k=5, n_hashes=12, bands=4, verify_threshold=0.4,
        broadcast_batch=True,
    )
    return r["deduped"].select(F.col("doc_id").cast("long").alias("doc_id"))


SQL_MINHASH_INCREMENTAL = f"""
WITH pr AS ({SQL_MINHASH_PAIRS})
SELECT CAST(doc_id AS BIGINT) AS doc_id
FROM documents
WHERE doc_id >= 250
  AND doc_id NOT IN (SELECT id_b FROM pr)
"""


def q_pack_spans(spark, sf_dir):
    """Concat-and-chunk span table over the deterministic token table:
    each document's token interval [offset, offset+n_tok) clipped to
    the 512-token training-window grid. The offset prefix-sum rides
    the bucketed carry planner (no global window task); the oracle is
    the same arithmetic as a DuckDB window sum + range unnest."""
    from timeperiods_spark.operators.packing import pack_sequences

    t = token_table(spark, N_TOKEN_DOCS, with_interval=False)
    out = pack_sequences(t, "doc_id", "n_tok", chunk_len=512)
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("seq_start").cast("long").alias("seq_start"),
        F.col("seq_len").cast("long").alias("seq_len"),
        F.col("chunk_off").cast("long").alias("chunk_off"),
    )


SQL_PACK_SPANS = f"""
WITH tok AS ({token_table_oracle_sql(N_TOKEN_DOCS)}),
o AS (
  SELECT doc_id, n_tok,
         COALESCE(SUM(CAST(n_tok AS BIGINT)) OVER (
           ORDER BY CAST(doc_id AS BIGINT)
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM tok
),
s AS (
  SELECT doc_id, n_tok, off,
         unnest(range(CAST(off // 512 AS BIGINT),
                      CAST((off + n_tok - 1) // 512 + 1 AS BIGINT))) AS chunk_id
  FROM o WHERE n_tok > 0
)
SELECT doc_id,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(GREATEST(0, chunk_id * 512 - off) AS BIGINT) AS seq_start,
       CAST(LEAST(n_tok, (chunk_id + 1) * 512 - off)
            - GREATEST(0, chunk_id * 512 - off) AS BIGINT) AS seq_len,
       CAST(off + GREATEST(0, chunk_id * 512 - off)
            - chunk_id * 512 AS BIGINT) AS chunk_off
FROM s
"""


def q_pack_chunks(spark, sf_dir):
    """Assembled 256-token training windows packed PER SOURCE (grouped
    independent streams). Array columns don't ship to the comparator:
    the window content is pinned by its token sum, first/last token,
    length, and contributing-doc count."""
    from timeperiods_spark.operators.packing import pack_chunks

    t = token_table(spark, N_TOKEN_DOCS, with_interval=False)
    out = pack_chunks(
        t, "doc_id", "tokens", "n_tok", chunk_len=256, group_by=["source"]
    )
    return out.select(
        "source",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.aggregate("tokens", F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "tok_sum"
        ),
        F.element_at("tokens", 1).cast("long").alias("first_tok"),
        F.element_at("tokens", -1).cast("long").alias("last_tok"),
        F.col("n_tok").cast("long").alias("n_tok"),
        F.col("n_docs").cast("long").alias("n_docs"),
    )


SQL_PACK_CHUNKS = f"""
WITH tok AS ({token_table_oracle_sql(N_TOKEN_DOCS)}),
o AS (
  SELECT source, doc_id, n_tok, tokens,
         COALESCE(SUM(CAST(n_tok AS BIGINT)) OVER (
           PARTITION BY source ORDER BY CAST(doc_id AS BIGINT)
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM tok
),
s AS (
  SELECT source, doc_id, n_tok, tokens, off,
         unnest(range(CAST(off // 256 AS BIGINT),
                      CAST((off + n_tok - 1) // 256 + 1 AS BIGINT))) AS chunk_id
  FROM o WHERE n_tok > 0
),
sp AS (
  SELECT source, chunk_id,
         CAST(GREATEST(0, chunk_id * 256 - off) AS BIGINT) AS seq_start,
         CAST(LEAST(n_tok, (chunk_id + 1) * 256 - off)
           - GREATEST(0, chunk_id * 256 - off) AS BIGINT) AS seq_len,
         CAST(off + GREATEST(0, chunk_id * 256 - off)
           - chunk_id * 256 AS BIGINT) AS chunk_off,
         tokens
  FROM s
)
SELECT source, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(SUM(list_aggregate(tokens[(seq_start + 1):(seq_start + seq_len)],
                               'sum')) AS BIGINT) AS tok_sum,
       CAST(arg_min(tokens[seq_start + 1], chunk_off) AS BIGINT) AS first_tok,
       CAST(arg_max(tokens[seq_start + seq_len],
                    chunk_off + seq_len) AS BIGINT) AS last_tok,
       CAST(SUM(seq_len) AS BIGINT) AS n_tok,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM sp
GROUP BY source, chunk_id
"""


def q_token_histogram(spark, sf_dir):
    """Vocab frequency per source (map-side explode + one combined
    hash-agg exchange); the comparator sees the token<500 slice so the
    row volume stays bounded while the counts still pin the corpus."""
    from timeperiods_spark.operators.tokenstats import token_histogram

    t = token_table(spark, N_TOKEN_DOCS, with_interval=False).withColumn(
        # fold the vocab to 101 buckets so frequencies are meaningful
        # (raw generator tokens are near-unique) and rows stay bounded
        "tokens", F.transform("tokens", lambda x: x % 101)
    )
    out = token_histogram(t, "tokens", group_by=["source"])
    return out.select(
        "source",
        F.col("token").cast("long").alias("token"),
        F.col("count").cast("long").alias("count"),
    )


SQL_TOKEN_HISTOGRAM = f"""
WITH tok AS ({token_table_oracle_sql(N_TOKEN_DOCS)})
SELECT source, CAST(token AS BIGINT) AS token,
       CAST(COUNT(*) AS BIGINT) AS count
FROM (SELECT source, unnest(list_transform(tokens, x -> x % 101)) AS token
      FROM tok)
GROUP BY source, token
"""


def q_ngram_logprob(spark, sf_dir):
    """CCNet-style LM quality signal from corpus self-statistics:
    per-doc average add-1-smoothed bigram log-likelihood + perplexity.
    Tokens folded to 101 buckets so counts are meaningful (same
    convention as the histogram query)."""
    from timeperiods_spark import ngram_logprob

    t = token_table(spark, N_TOKEN_DOCS, with_interval=False).withColumn(
        "tokens", F.transform("tokens", lambda x: x % 101)
    )
    out = ngram_logprob(t, "doc_id", "tokens", n=2)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_scored", "avg_logp", "ppl",
    )


SQL_NGRAM_LOGPROB = f"""
WITH tok AS ({token_table_oracle_sql(N_TOKEN_DOCS)}),
t AS (SELECT doc_id, list_transform(tokens, x -> x % 101) AS toks FROM tok),
dg AS (
  SELECT doc_id, list_slice(toks, i, i + 1) AS g, list_slice(toks, i, i) AS p
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        FROM t WHERE len(toks) >= 2)
),
cn AS (SELECT g, COUNT(*) AS c FROM dg GROUP BY g),
cp AS (
  SELECT list_slice(toks, i, i) AS p, COUNT(*) AS c
  FROM (SELECT toks, unnest(range(1, len(toks) + 1)) AS i
        FROM t WHERE len(toks) >= 1)
  GROUP BY p
),
v AS (SELECT COUNT(DISTINCT x) AS vs FROM (SELECT unnest(toks) AS x FROM t)),
scored AS (
  SELECT dg.doc_id,
         ln((cn.c + 1.0) / (cp.c + 1.0 * v.vs)) AS lp
  FROM dg JOIN cn ON dg.g = cn.g JOIN cp ON dg.p = cp.p CROSS JOIN v
),
agg AS (SELECT doc_id, COUNT(*) AS n_scored, AVG(lp) AS a
        FROM scored GROUP BY doc_id)
SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
       CAST(COALESCE(agg.n_scored, 0) AS BIGINT) AS n_scored,
       ROUND(agg.a, 6) AS avg_logp,
       ROUND(EXP(-agg.a), 6) AS ppl
FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id
"""


def q_tfidf(spark, sf_dir):
    """Top-5 characteristic tokens per doc by smoothed TF-IDF (the
    sklearn formula); rank on the ROUNDED score with token-id
    tie-break so both engines order identically."""
    from timeperiods_spark import tfidf_topk

    t = token_table(spark, N_TOKEN_DOCS, with_interval=False).withColumn(
        "tokens", F.transform("tokens", lambda x: x % 101)
    )
    out = tfidf_topk(t, "doc_id", "tokens", k=5)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("token").cast("long").alias("token"),
        "tf", "idf", "tfidf", "rank",
    )


SQL_TFIDF = f"""
WITH tok AS ({token_table_oracle_sql(N_TOKEN_DOCS)}),
t AS (SELECT doc_id, list_transform(tokens, x -> x % 101) AS toks FROM tok),
b AS (SELECT doc_id, unnest(toks) AS tkn FROM t),
pd AS (SELECT doc_id, tkn, COUNT(*) AS c FROM b GROUP BY doc_id, tkn),
dl AS (SELECT doc_id, SUM(c) AS len FROM pd GROUP BY doc_id),
dfreq AS (SELECT tkn, CAST(COUNT(*) AS DOUBLE) AS dfc FROM pd GROUP BY tkn),
nn AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS N FROM t),
s AS (
  SELECT pd.doc_id, pd.tkn,
         pd.c / CAST(dl.len AS DOUBLE) AS tf,
         ln((nn.N + 1.0) / (dfreq.dfc + 1.0)) + 1.0 AS idf,
         ROUND(pd.c / CAST(dl.len AS DOUBLE)
               * (ln((nn.N + 1.0) / (dfreq.dfc + 1.0)) + 1.0), 6) AS tfidf
  FROM pd JOIN dl USING (doc_id) JOIN dfreq ON pd.tkn = dfreq.tkn CROSS JOIN nn
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, tkn) AS rnk
  FROM s
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(tkn AS BIGINT) AS token,
       ROUND(tf, 6) AS tf, ROUND(idf, 6) AS idf, tfidf,
       CAST(rnk AS BIGINT) AS rank
FROM r WHERE rnk <= 5
"""


def q_ohlc_weekly(spark, sf_dir):
    """OHLC bars per (event_type, 7-day bucket of epoch seconds): one
    hash aggregate, struct orderings encode the deterministic open
    (earliest second, value tie -> min) / close (latest second, tie ->
    max) picks — the oracle mirrors both rules with two row_number
    windows. Values round to 6dp BEFORE aggregation so both engines
    feed identical inputs; the order-sensitive sum reports at 4dp."""
    from timeperiods_spark import rollup_ohlc

    ev = _read(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    base = ev.select(
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("sec"),
        F.round(F.col("value"), _R).alias("v"),
    )
    out = rollup_ohlc(base, "sec", "v", ["event_type"], bucket_width=604800)
    return out.select(
        "event_type",
        "bucket",
        F.round("open", _R).alias("open"),
        F.round("high", _R).alias("high"),
        F.round("low", _R).alias("low"),
        F.round("close", _R).alias("close"),
        "n_obs",
        F.round("sum_value", 4).alias("sum_value"),
    )


SQL_OHLC_WEEKLY = """
WITH base AS (
  SELECT event_type,
         CAST(epoch(ts) AS BIGINT) AS sec,
         ROUND(value, 6) AS v
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
b AS (
  SELECT event_type, CAST(FLOOR(sec / 604800.0) AS BIGINT) AS bucket, sec, v
  FROM base
),
r AS (
  SELECT event_type, bucket, v,
         ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                            ORDER BY sec ASC, v ASC) AS rn_open,
         ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                            ORDER BY sec DESC, v DESC) AS rn_close
  FROM b
)
SELECT event_type, bucket,
       ROUND(MAX(CASE WHEN rn_open = 1 THEN v END), 6) AS open,
       ROUND(MAX(v), 6) AS high,
       ROUND(MIN(v), 6) AS low,
       ROUND(MAX(CASE WHEN rn_close = 1 THEN v END), 6) AS close,
       COUNT(*) AS n_obs,
       ROUND(SUM(v), 4) AS sum_value
FROM r GROUP BY 1, 2
"""


def q_xcorr_daily(spark, sf_dir):
    """Lagged cross-correlation between event-type daily-mean series
    (lead/lag discovery; the (error, error) pair is the ACF). The
    lagged pairing is an EQUI join — (series, period + lag) keys — so
    the plan is one shuffle join + one tiny hash aggregate; the twin
    spells the identical join. Inputs round to 6dp first; Pearson on
    ~30 shared points compares clean at 6dp."""
    from timeperiods_spark import cross_correlation

    base = _daily_means(spark, sf_dir).select(
        "event_type", F.unix_date("day").alias("p"), "v"
    )
    out = cross_correlation(
        base,
        "p",
        "v",
        "event_type",
        pairs=[("click", "purchase"), ("view", "click"), ("error", "error")],
        lags=[-3, -1, 0, 1, 3],
    )
    return out.select(
        "series_a",
        "series_b",
        F.col("lag").cast("int").alias("lag"),
        "n_overlap",
        F.round("xcorr", _R).alias("xcorr"),
    )


SQL_XCORR_DAILY = f"""
WITH daily AS ({_SQL_DAILY_MEANS}),
g AS (
  SELECT event_type, date_diff('day', DATE '1970-01-01', day) AS p, v
  FROM daily
),
pairs(series_a, series_b) AS (
  VALUES ('click', 'purchase'), ('view', 'click'), ('error', 'error')
),
lags(lag) AS (VALUES (-3), (-1), (0), (1), (3))
SELECT pr.series_a, pr.series_b, CAST(l.lag AS INTEGER) AS lag,
       COUNT(*) AS n_overlap,
       ROUND(CORR(a.v, b.v), 6) AS xcorr
FROM pairs pr
CROSS JOIN lags l
JOIN g a ON a.event_type = pr.series_a
JOIN g b ON b.event_type = pr.series_b AND b.p = a.p + l.lag
GROUP BY 1, 2, 3
HAVING COUNT(*) >= 2
"""


def q_vocab_coverage(spark, sf_dir):
    """Tokenizer-sizing curve: corpus coverage of the top-v vocabulary
    for four sizes. Tie-robust by construction — equal-count tokens at
    a rank boundary contribute the same count whichever side wins, so
    the covered SUM (and the coverage ratio of two exact longs) is
    engine-order independent even where binary collations differ."""
    from timeperiods_spark import vocab_coverage

    docs = _read(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("tokens")
    )
    out = vocab_coverage(docs, "tokens", vocab_sizes=[10, 50, 200, 1000])
    return out.select(
        F.col("vocab_size").cast("int").alias("vocab_size"),
        "tokens_covered",
        "total_tokens",
        "distinct_tokens",
        F.round("coverage", _R).alias("coverage"),
    )


SQL_VOCAB_COVERAGE = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
counts AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY 1),
tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS total_tokens,
         COUNT(*) AS distinct_tokens
  FROM counts
),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, token ASC) AS rn
  FROM counts
),
sizes(vocab_size) AS (VALUES (10), (50), (200), (1000))
SELECT s.vocab_size,
       CAST(COALESCE(SUM(r.c), 0) AS BIGINT) AS tokens_covered,
       (SELECT total_tokens FROM tot) AS total_tokens,
       (SELECT distinct_tokens FROM tot) AS distinct_tokens,
       ROUND(CAST(COALESCE(SUM(r.c), 0) AS BIGINT)
             / CAST((SELECT total_tokens FROM tot) AS DOUBLE), 6) AS coverage
FROM sizes s LEFT JOIN ranked r ON r.rn <= s.vocab_size
GROUP BY 1
"""


def q_topk_tokens(spark, sf_dir):
    """Exact per-source heavy hitters (two-phase rank: per-partition
    pre-top-k then the output-domain window)."""
    from timeperiods_spark.operators.tokenstats import (
        token_histogram,
        topk_per_group,
    )

    t = token_table(spark, N_TOKEN_DOCS, with_interval=False).withColumn(
        "tokens", F.transform("tokens", lambda x: x % 101)
    )
    hist = token_histogram(t, "tokens", group_by=["source"])
    out = topk_per_group(
        hist, ["token"], F.sum("count"), group_by=["source"], k=5
    )
    return out.select(
        "source",
        F.col("token").cast("long").alias("token"),
        F.col("measure").cast("long").alias("measure"),
        F.col("rank").cast("long").alias("rank"),
    )


SQL_TOPK_TOKENS = f"""
WITH tok AS ({token_table_oracle_sql(N_TOKEN_DOCS)}),
hist AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT source, unnest(list_transform(tokens, x -> x % 101)) AS token
        FROM tok)
  GROUP BY source, token
)
SELECT source, CAST(token AS BIGINT) AS token, cnt AS measure,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY source ORDER BY cnt DESC, token) AS BIGINT) AS rank
FROM hist
QUALIFY rank <= 5
"""


def q_contamination(spark, sf_dir):
    """Train/test 8-gram decontamination (docs < 1500 train). The raw
    generator can't exercise this: all docs share one token step, so
    an 8-gram is determined by its start value and 1500 train docs
    saturate the 50257-value space (everything reads contaminated).
    The test split is therefore constructed: did%4==0 docs are EXACT
    train-doc copies (frac_hit 1.0), did%4==1 docs take their first 16
    tokens from a train doc and scramble the rest (partial hits), the
    rest are fully scrambled (position-quadratic + doc-keyed, so no
    arithmetic-progression gram can match: ~0 hits). Both engines
    build the identical split from the same integer arithmetic."""
    from timeperiods_spark.operators.tokenstats import ngram_contamination

    t = token_table(spark, N_TOKEN_DOCS, with_interval=False).withColumn(
        "did", F.col("doc_id").cast("long")
    )
    train = t.filter(F.col("did") < 1500)
    src_tok = (
        f"transform(sequence(1, {N_TOK}), "
        f"i -> CAST((({H1}) + i * 69621) % {VOCAB} AS INT))"
    ).replace("doc_id", "src_did")
    scr = (
        "transform(sequence(1, CAST(n_tok AS INT)), "
        "i -> CAST((CAST(element_at(tokens, i) AS BIGINT) * 7 + i * i + did)"
        " % 50257 AS INT))"
    )
    test = (
        t.filter(F.col("did") >= 1500)
        .withColumn("src_did", F.col("did") - 1400)
        .selectExpr(
            "doc_id",
            f"CASE WHEN did % 4 = 0 THEN {src_tok} "
            f"WHEN did % 4 = 1 THEN concat(slice({src_tok}, 1, 16), "
            f"slice({scr}, 17, CAST(n_tok AS INT))) "
            f"ELSE {scr} END AS tokens",
        )
    )
    out = ngram_contamination(test, train, "tokens", "doc_id", n=8)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_hit").cast("long").alias("n_hit"),
        F.round("frac_hit", _R).alias("frac_hit"),
    )


_DUCK_SRC_TOK = (
    f"list_transform(range(1, {N_TOK} + 1), "
    f"i -> CAST((({H1}) + i * 69621) % {VOCAB} AS INT))"
).replace("doc_id", "src_did")
_DUCK_SCR = (
    "list_transform(range(1, CAST(n_tok AS BIGINT) + 1), "
    "i -> CAST((CAST(tokens[i] AS BIGINT) * 7 + i * i + did)"
    " % 50257 AS INT))"
)

SQL_CONTAMINATION = f"""
WITH tok AS ({token_table_oracle_sql(N_TOKEN_DOCS)}),
tok2 AS (SELECT *, CAST(doc_id AS BIGINT) AS did FROM tok),
train AS (SELECT tokens FROM tok2 WHERE did < 1500),
test AS (
  SELECT doc_id,
         CASE WHEN did % 4 = 0 THEN {_DUCK_SRC_TOK}
              WHEN did % 4 = 1 THEN list_concat(
                  ({_DUCK_SRC_TOK})[1:16],
                  ({_DUCK_SCR})[17:CAST(n_tok AS BIGINT)])
              ELSE {_DUCK_SCR} END AS tokens
  FROM (SELECT *, did - 1400 AS src_did FROM tok2 WHERE did >= 1500)
),
tg AS (
  SELECT DISTINCT doc_id, tokens[g:(g + 7)] AS ngram
  FROM test, LATERAL unnest(range(1, CAST(len(tokens) AS BIGINT) - 6)) AS u(g)
  WHERE len(tokens) >= 8
),
trg AS (
  SELECT DISTINCT tokens[g:(g + 7)] AS ngram
  FROM train, LATERAL unnest(range(1, CAST(len(tokens) AS BIGINT) - 6)) AS u(g)
  WHERE len(tokens) >= 8
)
SELECT CAST(tg.doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN trg.ngram IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hit,
       ROUND(SUM(CASE WHEN trg.ngram IS NOT NULL THEN 1 ELSE 0 END)
             / COUNT(*)::DOUBLE, 6) AS frac_hit
FROM tg LEFT JOIN trg ON tg.ngram = trg.ngram
GROUP BY tg.doc_id
"""


def q_hash_sample(spark, sf_dir):
    """Deterministic partition-independent Bernoulli sample: the
    membership predicate is a pure row expression both engines compute
    bit-identically (portable MINSTD rounds, seed enters as a
    multiplier)."""
    from timeperiods_spark.operators.sampling import hash_sample

    docs = _read(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 0.3, seed=1).select(
        F.col("doc_id").cast("long").alias("doc_id"), "source"
    )


def _sampling_sql_parts():
    from timeperiods_spark.operators.sampling import hash_unit_sql

    return hash_unit_sql("doc_id", 1), hash_unit_sql("doc_id", 2)


_HU1, _HU2 = _sampling_sql_parts()

SQL_HASH_SAMPLE = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, source
FROM documents
WHERE {_HU1} < 0.3
"""


def q_hash_sample_n(spark, sf_dir):
    """Exact-count stratified sample: the 10 smallest-hash docs per
    source (two-phase rank in Spark; the oracle is the plain
    ROW_NUMBER formulation over the identical portable hash)."""
    from timeperiods_spark import hash_sample_n

    docs = _read(spark, sf_dir, "documents")
    return hash_sample_n(docs, "doc_id", 10, ["source"], seed=3).select(
        F.col("doc_id").cast("long").alias("doc_id"), "source"
    )


def _hu_sql(seed):
    from timeperiods_spark.operators.sampling import hash_unit_sql

    return hash_unit_sql("doc_id", seed)


SQL_HASH_SAMPLE_N = f"""
WITH u AS (SELECT doc_id, source, {_hu_sql(3)} AS uu FROM documents),
r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY uu, doc_id) AS rn
  FROM u
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source FROM r WHERE rn <= 10
"""


def q_source_mix(spark, sf_dir):
    """Token-budget data mixing: per-source rates = min(1,
    share*target/total) from one totals aggregate, then the row-pure
    hash predicate. src_9 (the dominant source) gets 2/3 of the
    budget, src_8 one third; every other source rate 0 — both rates
    land strictly inside (0, 1) so real Bernoulli selection runs."""
    from timeperiods_spark.operators.sampling import source_mix

    t = token_table(spark, N_TOKEN_DOCS, with_interval=False)
    out, _rates = source_mix(
        t, "doc_id", "n_tok", "source",
        target_total=100_000,
        mix_weights={"src_9": 2.0, "src_8": 1.0},
        seed=2,
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.col("n_tok").cast("long").alias("n_tok"),
    )


SQL_SOURCE_MIX = f"""
WITH tok AS ({token_table_oracle_sql(N_TOKEN_DOCS)}),
tot AS (
  SELECT source, CAST(SUM(n_tok) AS DOUBLE) AS total
  FROM tok GROUP BY source
),
rates AS (
  SELECT source,
         LEAST(1.0,
           (CASE source WHEN 'src_9' THEN 2.0/3.0
                        WHEN 'src_8' THEN 1.0/3.0
                        ELSE 0.0 END) * 100000 / total) AS rate
  FROM tot
)
SELECT CAST(t.doc_id AS BIGINT) AS doc_id, t.source,
       CAST(t.n_tok AS BIGINT) AS n_tok
FROM tok t JOIN rates r ON t.source = r.source
WHERE {_HU2} < r.rate
"""


def q_quality_sample(spark, sf_dir):
    """Per-row-rate deterministic sampling (curriculum / quality
    weighting): each document keeps with probability LEAST(1,
    n_chars/500) — longer docs survive more often — decided by the
    same portable row-pure hash as the fraction path."""
    from timeperiods_spark.operators.sampling import hash_sample

    docs = _read(spark, sf_dir, "documents").withColumn(
        "__rate", F.least(F.lit(1.0), F.col("n_chars") / F.lit(500.0))
    )
    return (
        hash_sample(docs, "doc_id", rate_col="__rate", seed=1)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
        )
    )


SQL_QUALITY_SAMPLE = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       CAST(n_chars AS BIGINT) AS n_chars
FROM documents
WHERE {_HU1} < LEAST(1.0, n_chars / 500.0)
"""


def q_duplicate_spans(spark, sf_dir):
    """Substring-level dedup (Lee et al. ACL'22 style, windowed-hash
    formulation): maximal duplicated >=k-token runs per document.
    Spark side = window explode + map-side-combined count + join-back
    + the merge_intervals carried sweep; twin = the same pipeline with
    the running-max island SQL. Exact window-text keys both sides
    (hash_windows=True is the at-scale variant; same results modulo
    2^-64 collisions)."""
    from timeperiods_spark import duplicate_spans

    docs = _read(spark, sf_dir, "documents")
    out = duplicate_spans(docs, "doc_id", "text", k=12, min_count=2)
    return out.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_windows").cast("long").alias("n_windows"),
    )


SQL_DUPLICATE_SPANS = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tok FROM documents
),
pos AS (
  SELECT doc_id, CAST(t.i - 1 AS BIGINT) AS pos,
         array_to_string(list_slice(tok, t.i, t.i + 11), chr(31)) AS win
  FROM toks, unnest(generate_series(1, len(tok) - 11)) AS t(i)
  WHERE len(tok) >= 12
),
dup AS (
  SELECT win FROM pos GROUP BY win HAVING COUNT(*) >= 2
),
dp AS (
  SELECT p.doc_id, p.pos AS s, p.pos + 11 AS e
  FROM pos p JOIN dup USING (win)
),
ord AS (
  SELECT doc_id, s, e,
         MAX(e) OVER (PARTITION BY doc_id ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM dp
),
isl AS (
  SELECT doc_id, s, e,
         SUM(CASE WHEN prev_max IS NULL OR s > prev_max + 1
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM ord
)
SELECT doc_id, MIN(s) AS span_start, MAX(e) AS span_end,
       CAST(MAX(e) - MIN(s) + 1 AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_windows
FROM isl GROUP BY doc_id, island
"""


def q_duplicate_span_stats(spark, sf_dir):
    """Per-document duplication dashboard over the span output:
    every doc emits a row, clean docs zero-filled."""
    from timeperiods_spark import duplicate_span_stats

    docs = _read(spark, sf_dir, "documents")
    out = duplicate_span_stats(docs, "doc_id", "text", k=12)
    return out.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.col("dup_tokens").cast("long").alias("dup_tokens"),
        F.round("dup_frac", 6).alias("dup_frac"),
    )


SQL_DUPLICATE_SPAN_STATS = f"""
WITH spans AS ({SQL_DUPLICATE_SPANS}),
per_doc AS (
  SELECT doc_id, SUM(n_tokens) AS dup_tokens FROM spans GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
       CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       ROUND(COALESCE(p.dup_tokens, 0)
             / GREATEST(len(string_split(d.text, ' ')), 1), 6) AS dup_frac
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


def q_ngram_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals (Rae et al. 2021
    SSA1.1), long format per (doc, n): top-n-gram token fraction and
    duplicated-n-gram coverage fraction. Coverage union rides the
    merge_intervals carried sweep; the twin re-forms the same islands
    with running-max SQL."""
    from timeperiods_spark import ngram_repetition

    docs = _read(spark, sf_dir, "documents")
    out = ngram_repetition(docs, "doc_id", text_col="text", ns=(2, 3, 5))
    return out.select(
        "doc_id",
        F.col("n").cast("int").alias("n"),
        F.col("n_tok").cast("long").alias("n_tok"),
        F.round("top_frac", 6).alias("top_frac"),
        F.round("dup_frac", 6).alias("dup_frac"),
    )


SQL_NGRAM_REPETITION = """
WITH ns AS (SELECT CAST(unnest([2,3,5]) AS INT) AS n),
toks AS (
  SELECT doc_id, string_split(text, ' ') AS tok,
         len(string_split(text, ' ')) AS ntok
  FROM documents
),
pos AS (
  SELECT t.doc_id, ns.n, CAST(g.i - 1 AS BIGINT) AS pos,
         array_to_string(list_slice(t.tok, g.i, g.i + ns.n - 1), chr(31))
           AS gram
  FROM toks t, ns, unnest(generate_series(1, t.ntok - ns.n + 1)) AS g(i)
  WHERE t.ntok >= ns.n
),
cnt AS (
  SELECT doc_id, n, gram, COUNT(*) AS c FROM pos GROUP BY doc_id, n, gram
),
top AS (SELECT doc_id, n, MAX(c) AS topc FROM cnt GROUP BY doc_id, n),
dp AS (
  SELECT p.doc_id, p.n, p.pos AS s, p.pos + p.n - 1 AS e
  FROM pos p JOIN cnt ON p.doc_id = cnt.doc_id AND p.n = cnt.n
                      AND p.gram = cnt.gram
  WHERE cnt.c >= 2
),
ord AS (
  SELECT doc_id, n, s, e,
         MAX(e) OVER (PARTITION BY doc_id, n ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM dp
),
isl AS (
  SELECT doc_id, n, s, e,
         SUM(CASE WHEN prev_max IS NULL OR s > prev_max + 1
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id, n ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM ord
),
mrg AS (
  SELECT doc_id, n, MIN(s) AS s, MAX(e) AS e
  FROM isl GROUP BY doc_id, n, island
),
cov AS (SELECT doc_id, n, SUM(e - s + 1) AS cov FROM mrg GROUP BY doc_id, n)
SELECT d.doc_id, ns.n, CAST(d.ntok AS BIGINT) AS n_tok,
       ROUND(COALESCE(t.topc, 0) * ns.n / GREATEST(d.ntok, 1), 6)
         AS top_frac,
       ROUND(COALESCE(c.cov, 0) / GREATEST(d.ntok, 1), 6) AS dup_frac
FROM toks d CROSS JOIN ns
LEFT JOIN top t ON d.doc_id = t.doc_id AND ns.n = t.n
LEFT JOIN cov c ON d.doc_id = c.doc_id AND ns.n = c.n
"""


_PIPELINE_QUERIES = {
    "exact_dedup_docs": q_exact_dedup,
    "ngram_jaccard_pairs": q_ngram_jaccard,
    "minhash_lsh_pairs": q_minhash_pairs,
    "minhash_dedup_cc": q_minhash_dedup_cc,
    "minhash_dedup_incremental": q_minhash_incremental,
    "simhash_fingerprints": q_simhash,
    "simhash_pairs": q_simhash_pairs,
    "simhash_dedup_incremental": q_simhash_incremental,
    "cosine_topk_bruteforce": q_cosine_topk,
    "cosine_topk_lsh": q_cosine_lsh,
    "cosine_topk_lsh_highdim": q_cosine_lsh_highdim,
    "cosine_topk_ivf": q_cosine_ivf,
    "embedding_neardup_pairs": q_embedding_neardup,
    "embedding_dedup_incremental": q_embedding_incremental,
    "text_analysis": q_textops,
    "pack_sequences_spans": q_pack_spans,
    "pack_chunks_by_source": q_pack_chunks,
    "token_histogram_by_source": q_token_histogram,
    "topk_tokens_per_source": q_topk_tokens,
    "ngram_contamination_check": q_contamination,
    "hash_sample_docs": q_hash_sample,
    "source_mix_tokens": q_source_mix,
    "duplicate_spans_docs": q_duplicate_spans,
    "duplicate_span_stats_docs": q_duplicate_span_stats,
    "ngram_repetition_docs": q_ngram_repetition,
    "quality_weighted_sample": q_quality_sample,
    "pii_scrub_docs": q_pii_scrub,
    "ewma_daily_events": q_ewma_daily,
    "cusum_daily_events": q_cusum_daily,
    "filter_lines_docs": q_filter_lines,
    "dedup_lines_docs": q_dedup_lines,
    "hash_sample_n_per_source": q_hash_sample_n,
    "distinct_users_daily": q_distinct_daily,
    "distinct_users_weekly_cascade": q_distinct_weekly,
    "holt_daily_events": q_holt_daily,
    "zscore_anomaly_daily": q_zscore_anomaly,
    "seasonal_adjust_daily": q_seasonal_adjust,
    "tokenize_vocab_docs": q_tokenize,
    "cosine_topk_ivf_index": q_cosine_ivf_via_index,
    "ngram_logprob_tokens": q_ngram_logprob,
    "gopher_quality_docs": q_gopher_quality,
    "overlap_join_weeks": q_overlap_join,
    "overlap_join_bin_left": q_overlap_join_bin_left,
    "asof_events_tolerance": q_asof_tolerance,
    "tfidf_topk_tokens": q_tfidf,
    "rollup_ohlc_weekly": q_ohlc_weekly,
    "xcorr_daily_events": q_xcorr_daily,
    "vocab_coverage_docs": q_vocab_coverage,
}

_PIPELINE_ORACLES = {
    "exact_dedup_docs": SQL_EXACT_DEDUP,
    "ngram_jaccard_pairs": SQL_NGRAM_JACCARD,
    "minhash_lsh_pairs": SQL_MINHASH_PAIRS,
    "minhash_dedup_cc": SQL_MINHASH_CC,
    "minhash_dedup_incremental": SQL_MINHASH_INCREMENTAL,
    "simhash_fingerprints": SQL_SIMHASH,
    "simhash_pairs": SQL_SIMHASH_PAIRS,
    "simhash_dedup_incremental": SQL_SIMHASH_INCREMENTAL,
    "cosine_topk_bruteforce": SQL_COSINE_TOPK,
    "cosine_topk_lsh": SQL_COSINE_LSH,
    "cosine_topk_lsh_highdim": SQL_COSINE_LSH_HIGHDIM,
    "cosine_topk_ivf": SQL_COSINE_IVF,
    "embedding_neardup_pairs": SQL_EMBEDDING_NEARDUP,
    "embedding_dedup_incremental": SQL_EMBEDDING_INCREMENTAL,
    "pack_sequences_spans": SQL_PACK_SPANS,
    "pack_chunks_by_source": SQL_PACK_CHUNKS,
    "token_histogram_by_source": SQL_TOKEN_HISTOGRAM,
    "topk_tokens_per_source": SQL_TOPK_TOKENS,
    "ngram_contamination_check": SQL_CONTAMINATION,
    "hash_sample_docs": SQL_HASH_SAMPLE,
    "source_mix_tokens": SQL_SOURCE_MIX,
    "text_analysis": SQL_TEXTOPS,
    "duplicate_spans_docs": SQL_DUPLICATE_SPANS,
    "duplicate_span_stats_docs": SQL_DUPLICATE_SPAN_STATS,
    "ngram_repetition_docs": SQL_NGRAM_REPETITION,
    "quality_weighted_sample": SQL_QUALITY_SAMPLE,
    "pii_scrub_docs": SQL_PII_SCRUB,
    "ewma_daily_events": SQL_EWMA_DAILY,
    "cusum_daily_events": SQL_CUSUM_DAILY,
    "filter_lines_docs": SQL_FILTER_LINES,
    "dedup_lines_docs": SQL_DEDUP_LINES,
    "hash_sample_n_per_source": SQL_HASH_SAMPLE_N,
    "distinct_users_daily": SQL_DISTINCT_DAILY,
    "distinct_users_weekly_cascade": SQL_DISTINCT_WEEKLY,
    "holt_daily_events": SQL_HOLT_DAILY,
    "zscore_anomaly_daily": SQL_ZSCORE_ANOMALY,
    "seasonal_adjust_daily": SQL_SEASONAL_ADJUST,
    "tokenize_vocab_docs": SQL_TOKENIZE,
    "cosine_topk_ivf_index": SQL_COSINE_IVF,
    "ngram_logprob_tokens": SQL_NGRAM_LOGPROB,
    "gopher_quality_docs": SQL_GOPHER_QUALITY,
    "overlap_join_weeks": SQL_OVERLAP_JOIN,
    "overlap_join_bin_left": SQL_OVERLAP_JOIN_BIN_LEFT,
    "asof_events_tolerance": SQL_ASOF_TOLERANCE,
    "tfidf_topk_tokens": SQL_TFIDF,
    "rollup_ohlc_weekly": SQL_OHLC_WEEKLY,
    "xcorr_daily_events": SQL_XCORR_DAILY,
    "vocab_coverage_docs": SQL_VOCAB_COVERAGE,
}
