"""Deterministic hash sampling and source mixing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timeperiods_spark.operators.sampling import hash_sample, source_mix
from timeperiods_spark.sources.tokens import token_table


def test_hash_sample_deterministic_and_partition_independent(spark):
    df = spark.range(10_000).select(F.col("id").alias("k"))
    a = {r["k"] for r in hash_sample(df, "k", 0.3, seed=5).collect()}
    b = {
        r["k"]
        for r in hash_sample(df.repartition(17), "k", 0.3, seed=5).collect()
    }
    assert a == b, "sample must not depend on partitioning"
    assert 0.25 < len(a) / 10_000 < 0.35
    # nested fractions: the 0.1 sample is a subset of the 0.3 sample
    c = {r["k"] for r in hash_sample(df, "k", 0.1, seed=5).collect()}
    assert c < a
    # different seed: a different (roughly independent) selection
    d = {r["k"] for r in hash_sample(df, "k", 0.3, seed=6).collect()}
    assert d != a
    overlap = len(a & d) / len(a)
    assert 0.15 < overlap < 0.45  # ~0.3 expected under independence


def test_hash_sample_bounds(spark):
    df = spark.range(100).select(F.col("id").alias("k"))
    assert hash_sample(df, "k", 0.0).count() == 0
    assert hash_sample(df, "k", 1.0).count() == 100
    with pytest.raises(ValueError):
        hash_sample(df, "k", 1.5)


def test_source_mix_hits_budget_and_weights(spark):
    tok = token_table(spark, 3000, with_interval=False)
    total = tok.agg(F.sum("n_tok")).first()[0]
    out, rates = source_mix(
        tok, "doc_id", "n_tok", "source", target_total=total // 4
    )
    got = out.agg(F.sum("n_tok")).first()[0]
    assert got == pytest.approx(total // 4, rel=0.1)
    # proportional mix: every source is sampled at ~ the same rate
    assert all(0.15 < r < 0.35 for r in rates.values())

    # explicit weights: all budget to one source, clamped visibly
    out2, rates2 = source_mix(
        tok, "doc_id", "n_tok", "source",
        target_total=total,  # more than src_9 alone can supply
        mix_weights={"src_9": 1.0},
    )
    assert rates2["src_9"] == 1.0           # clamped: take everything
    assert all(r == 0.0 for s, r in rates2.items() if s != "src_9")
    assert out2.select("source").distinct().collect()[0]["source"] == "src_9"


def test_source_mix_rerun_stable(spark):
    tok = token_table(spark, 500, with_interval=False)
    a, _ = source_mix(tok, "doc_id", "n_tok", target_total=10_000, seed=3)
    b, _ = source_mix(
        tok.repartition(13), "doc_id", "n_tok", target_total=10_000, seed=3
    )
    assert sorted(r["doc_id"] for r in a.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in b.select("doc_id").collect()
    )

def test_hash_sample_negative_and_large_keys(spark):
    """Negative keys (xxhash64-derived ids are negative ~half the time)
    must sample at ~fraction, not be always-selected; |k| beyond the
    old k*48271 overflow point must not raise under ANSI. Regression
    for the round-4 advice finding (plain % follows the dividend)."""
    df = spark.range(10_000).select(
        F.xxhash64(F.col("id").cast("string")).alias("k")
    )
    n_neg = df.filter(F.col("k") < 0).count()
    assert n_neg > 3000  # the fixture really exercises negative keys
    kept = hash_sample(df, "k", 0.3, seed=7)
    assert 0.25 < kept.count() / 10_000 < 0.35
    # negative-key rows specifically are NOT always selected
    kept_neg = kept.filter(F.col("k") < 0).count()
    assert 0.2 < kept_neg / n_neg < 0.4
    # and the predicate is still partitioning-independent
    a = {r["k"] for r in kept.collect()}
    b = {r["k"] for r in hash_sample(df.repartition(11), "k", 0.3, seed=7).collect()}
    assert a == b


def test_hash_unit_sql_parity_negative_keys(spark):
    """hash_unit_sql stays bit-identical to the Spark expression for
    negative and near-2^63 keys (the DuckDB twin is the oracle)."""
    import duckdb

    from timeperiods_spark.operators.sampling import _hash_unit, hash_unit_sql

    keys = [0, 1, -1, -48271, 2**62, -(2**62), 2**63 - 1, -(2**63),
            123456789123456789, -987654321987654321]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["u"]
        for r in df.select("k", _hash_unit(F.col("k"), 9).alias("u")).collect()
    }
    con = duckdb.connect()
    for k in keys:
        (want,) = con.execute(
            f"SELECT {hash_unit_sql(str(k), 9)}"
        ).fetchone()
        assert got[k] == want, f"divergence at key {k}"
        assert 0.0 <= want < 1.0
    con.close()


def test_source_mix_null_source_gets_budget(spark):
    """A NULL source group is a real group (groupBy keeps it); its
    allocated budget must flow back through the null-safe rate join
    instead of being silently dropped."""
    rows = [(i, 100, None if i % 2 else "a") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long, source string")
    out, rates = source_mix(
        df, "doc_id", "n_tok", "source", target_total=50_000, seed=1
    )
    assert None in rates and rates[None] > 0
    null_kept = out.filter(F.col("source").isNull()).agg(F.sum("n_tok")).first()[0]
    assert null_kept == pytest.approx(25_000, rel=0.2)
    a_kept = out.filter(F.col("source") == "a").agg(F.sum("n_tok")).first()[0]
    assert a_kept == pytest.approx(25_000, rel=0.2)


def test_hash_sample_rate_col(spark):
    rows = [
        (i, 1.0 if i < 100 else (0.0 if i < 200 else None))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, rate double")
    kept = hash_sample(df, "doc_id", rate_col="rate").collect()
    ids = {r["doc_id"] for r in kept}
    assert ids == set(range(100))  # rate 1 keeps, rate 0 and NULL drop

    # a constant rate column selects exactly the fraction-mode rows
    df2 = spark.createDataFrame(
        [(i, 0.3) for i in range(2000)], "doc_id long, rate double"
    )
    a = {r["doc_id"] for r in hash_sample(df2, "doc_id", rate_col="rate",
                                          seed=3).collect()}
    b = {r["doc_id"] for r in hash_sample(df2, "doc_id", 0.3,
                                          seed=3).collect()}
    assert a == b

    with pytest.raises(ValueError):
        hash_sample(df, "doc_id")
    with pytest.raises(ValueError):
        hash_sample(df, "doc_id", 0.5, rate_col="rate")


def test_source_mix_temperature(spark):
    rows = [(i, 10, "big" if i < 1800 else "small") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long, source string")
    _, nat = source_mix(df, "doc_id", "n_tok", target_total=10_000)
    _, smooth = source_mix(
        df, "doc_id", "n_tok", target_total=10_000, temperature=0.5
    )
    # alpha=1 is a no-op relative to natural shares
    _, one = source_mix(
        df, "doc_id", "n_tok", target_total=10_000, temperature=1.0
    )
    assert one == pytest.approx(nat)
    # smoothing boosts the small source's rate, shrinks the big one's
    assert smooth["small"] > nat["small"]
    assert smooth["big"] < nat["big"]
    # smoothed shares: 0.9^0.5 / 0.1^0.5 normalize to 0.75 / 0.25, so
    # the small source's 2500-token allocation exceeds its 2000-token
    # corpus and clamps to rate 1.0 (take everything, shortfall
    # visible); the big source still gets its full 7500 allocation
    tot = {"big": 18_000, "small": 2_000}
    assert smooth["small"] == 1.0
    spent = sum(smooth[s] * tot[s] for s in tot)
    assert spent == pytest.approx(0.75 * 10_000 + 2_000, rel=1e-6)

    with pytest.raises(ValueError):
        source_mix(df, "doc_id", "n_tok", target_total=1,
                   mix_weights={"big": 1.0}, temperature=0.5)
    with pytest.raises(ValueError):
        source_mix(df, "doc_id", "n_tok", target_total=1, temperature=0.0)


def test_hash_sample_n_exact_counts_and_stability(spark):
    from timeperiods_spark import hash_sample_n

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(300)], "k long, g string"
    )
    out = hash_sample_n(df, "k", 20, ["g"], seed=5)
    counts = {r["g"]: r["n"] for r in out.groupBy("g").count()
              .withColumnRenamed("count", "n").collect()}
    assert counts == {"g0": 20, "g1": 20, "g2": 20}
    # partition-independent: same selection at any layout
    again = hash_sample_n(df.repartition(7, "k"), "k", 20, ["g"], seed=5)
    assert sorted(r["k"] for r in out.collect()) == sorted(
        r["k"] for r in again.collect()
    )
    # different seed -> different selection
    other = hash_sample_n(df, "k", 20, ["g"], seed=6)
    assert sorted(r["k"] for r in other.collect()) != sorted(
        r["k"] for r in out.collect()
    )
    # ungrouped + small-group clamp + n=0
    assert hash_sample_n(df, "k", 25).count() == 25
    assert hash_sample_n(df.limit(5), "k", 99).count() == 5
    assert hash_sample_n(df, "k", 0, ["g"]).count() == 0
