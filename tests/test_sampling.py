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
