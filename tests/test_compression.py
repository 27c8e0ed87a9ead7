"""M6 — Gorilla compression: exact round-trips, numpy and Spark layers."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from timeperiods_spark.functions.compression import (
    compress_series,
    decompress_series,
    gorilla_decode,
    gorilla_encode,
)
from timeperiods_spark.operators.rollup import rollup_regular
from timeperiods_spark.sources.tokens import token_table


def _roundtrip(p, v):
    blob = gorilla_encode(np.asarray(p, dtype=np.int64), np.asarray(v, dtype=np.float64))
    p2, v2 = gorilla_decode(blob)
    assert np.array_equal(p2, np.asarray(p, dtype=np.int64))
    va = np.asarray(v, dtype=np.float64)
    assert np.array_equal(np.isnan(v2), np.isnan(va))
    assert np.array_equal(v2[~np.isnan(v2)], va[~np.isnan(va)])
    return blob


def test_empty_and_singleton():
    blob = gorilla_encode(np.array([], dtype=np.int64), np.array([], dtype=np.float64))
    p, v = gorilla_decode(blob)
    assert len(p) == 0 and len(v) == 0
    _roundtrip([42], [3.14])
    _roundtrip([42], [np.nan])


def test_regular_constant_series_compresses_hard():
    p = np.arange(0, 5000, dtype=np.int64)
    v = np.full(5000, 123.5)
    blob = _roundtrip(p, v)
    # regular grid + constant value: ~2 bits/point + header/bitmap
    assert len(blob) < 5000 * 16 / 20, len(blob)


def test_random_series_roundtrip():
    rng = np.random.default_rng(187)
    p = np.cumsum(rng.integers(1, 1000, size=2000)).astype(np.int64)
    v = rng.normal(size=2000) * 1e6
    v[rng.random(2000) < 0.1] = np.nan
    _roundtrip(p, v)


def test_pathological_cases():
    _roundtrip([-5, -4, -3, 100000000000], [0.0, -0.0, np.inf, -np.inf])
    _roundtrip([0, 1, 3, 6, 10, 15], [1e-308, 1e308, 0.0, 0.0, np.nan, 7.0])
    # dod exactly at bucket boundaries
    base = [0]
    for d in (1, 65, 1 + 64, 257, 2049, 100000, 1):
        base.append(base[-1] + d)
    _roundtrip(base, np.arange(len(base), dtype=float))
    # leading-null prefix
    _roundtrip([1, 2, 3], [np.nan, np.nan, 5.0])


def test_spark_compress_decompress_roundtrip(spark):
    tok = token_table(spark, 2000)
    hourly = rollup_regular(
        tok,
        ("start_hour", "end_hour"),
        ("n_tok",),
        ("source",),
        width=1,
        required_percentage=0.0,
    ).select("source", "period", F.col("n_tok").alias("value"))

    comp = compress_series(hourly, ["source"]).cache()
    stats = comp.agg(
        F.sum("n_points").alias("pts"),
        F.sum("raw_bytes").alias("raw"),
        F.sum(F.length("blob")).alias("enc"),
    ).first()
    assert stats["pts"] == hourly.count()
    assert stats["enc"] < stats["raw"]  # actually compresses

    back = decompress_series(comp, ["source"])
    a = hourly.orderBy("source", "period").collect()
    b = back.orderBy("source", "period").collect()
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra["source"] == rb["source"] and ra["period"] == rb["period"]
        if ra["value"] is None:
            assert rb["value"] is None or np.isnan(rb["value"])
        else:
            assert rb["value"] == ra["value"]
    comp.unpersist()


def test_multi_block_group_roundtrip(spark):
    """A group longer than block_size splits into bounded blocks (one
    per floor(period/B) bucket) and still round-trips bit-exact —
    VERDICT r2 item 1: no unbounded per-group pandas frame."""
    import pandas as pd

    rng = np.random.default_rng(303)
    n = 1000
    periods = np.sort(rng.choice(np.arange(0, 3000), size=n, replace=False)).astype(np.int64)
    vals = rng.normal(size=n) * 1e4
    vals[rng.random(n) < 0.08] = np.nan
    pdf = pd.DataFrame({"g": "s0", "period": periods, "value": vals})
    df = spark.createDataFrame(pdf)

    comp = compress_series(df, ["g"], block_size=64).cache()
    blocks = comp.orderBy("block").collect()
    # bounded: every block holds at most block_size integer periods
    assert all(r["n_points"] <= 64 for r in blocks)
    assert all(r["block"] == r["first_period"] // 64 for r in blocks)
    assert len(blocks) == len(np.unique(periods // 64))
    assert sum(r["n_points"] for r in blocks) == n

    back = decompress_series(comp, ["g"]).orderBy("period").collect()
    assert [r["period"] for r in back] == periods.tolist()
    for r, expect in zip(back, vals):
        if np.isnan(expect):
            assert r["value"] is None or np.isnan(r["value"])
        else:
            assert r["value"] == expect
    comp.unpersist()


def test_block_size_none_is_single_block(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {"g": ["a"] * 10, "period": range(0, 10000, 1000), "value": [1.5] * 10}
    )
    comp = compress_series(spark.createDataFrame(pdf), ["g"], block_size=None)
    rows = comp.collect()
    assert len(rows) == 1 and rows[0]["n_points"] == 10 and rows[0]["block"] == 0


def test_token_array_equality_through_compression_pipeline(spark):
    """F13 invariant: the token arrays themselves are untouched by the
    rollup+compression pipeline (it only reads n_tok)."""
    tok = token_table(spark, 500).cache()
    before = {r["doc_id"]: r["tokens"] for r in tok.collect()}
    # run the pipeline end to end, then re-read tok
    hourly = rollup_regular(
        tok, ("start_hour", "end_hour"), ("n_tok",), ("source",), width=1
    ).select("source", "period", F.col("n_tok").alias("value"))
    compress_series(hourly, ["source"]).count()
    after = {r["doc_id"]: r["tokens"] for r in tok.collect()}
    assert before == after
    tok.unpersist()
