"""Sequence packing (concat-and-chunk) and token statistics.

The packing invariant is BASELINE.json's per-row token-array equality:
flattening the assembled windows in chunk order must reproduce the
sequential concatenation of every document's tokens exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timeperiods_spark.errors import RoleValidationError  # noqa: F401
from timeperiods_spark.operators.packing import pack_chunks, pack_sequences
from timeperiods_spark.operators.tokenstats import (
    token_histogram,
    token_ngram_counts,
    topk_per_group,
)
from timeperiods_spark.sources.tokens import token_table


def _docs(spark, rows):
    """rows: list of (doc_id, tokens list, group)"""
    return spark.createDataFrame(
        [(i, t, len(t), g) for i, t, g in rows],
        "doc_id long, tokens array<int>, n_tok long, source string",
    )


def _sequential_pack(rows, w):
    """Driver-side reference: concat in doc order, chunk by w."""
    stream = []
    for _i, toks, _g in sorted(rows):
        stream.extend(toks)
    return [stream[i: i + w] for i in range(0, len(stream), w)]


def test_pack_sequences_spans_exact(spark):
    rows = [
        (0, [1, 2, 3], "a"),
        (1, [4, 5, 6, 7, 8], "a"),
        (2, [9], "a"),
        (3, [], "a"),          # zero-length: no span, no offset shift
        (4, [10, 11, 12, 13], "a"),
    ]
    out = pack_sequences(
        _docs(spark, rows), "doc_id", "n_tok", chunk_len=4
    ).orderBy("doc_id", "chunk_id").collect()
    got = [
        (r["doc_id"], r["chunk_id"], r["seq_start"], r["seq_len"], r["chunk_off"])
        for r in out
    ]
    # offsets: d0@0 len3, d1@3 len5, d2@8 len1, d4@9 len4 → 13 tokens, W=4
    assert got == [
        (0, 0, 0, 3, 0),       # tokens 0-2 in chunk 0
        (1, 0, 0, 1, 3),       # token 3 finishes chunk 0
        (1, 1, 1, 4, 0),       # tokens 4-7 fill chunk 1
        (2, 2, 0, 1, 0),       # token 8 starts chunk 2
        (4, 2, 0, 3, 1),       # tokens 9-11 finish chunk 2
        (4, 3, 3, 1, 0),       # token 12 in final (short) chunk
    ]
    # every chunk except the last is exactly full
    per_chunk = {}
    for _d, c, _s, ln, _o in got:
        per_chunk[c] = per_chunk.get(c, 0) + ln
    assert per_chunk == {0: 4, 1: 4, 2: 4, 3: 1}


def test_pack_chunks_token_equality(spark):
    rows = [
        (i, [int(i * 100 + j) for j in range(3 + (i * 7) % 11)], "a")
        for i in range(57)
    ]
    w = 16
    out = pack_chunks(
        _docs(spark, rows), "doc_id", "tokens", "n_tok", chunk_len=w
    ).orderBy("chunk_id").collect()
    expect = _sequential_pack(rows, w)
    assert [r["tokens"] for r in out] == expect
    assert all(r["n_tok"] == len(e) for r, e in zip(out, expect))
    assert all(r["n_tok"] == w for r in out[:-1])


def test_pack_chunks_grouped_independent_streams(spark):
    rows_a = [(i, [i, i + 1], "a") for i in range(0, 10, 2)]
    rows_b = [(i, [100 + i] * 3, "b") for i in range(1, 10, 2)]
    out = pack_chunks(
        _docs(spark, rows_a + rows_b), "doc_id", "tokens", "n_tok",
        chunk_len=4, group_by=["source"],
    ).orderBy("source", "chunk_id").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["source"], []).append(r["tokens"])
    assert by_g["a"] == _sequential_pack(rows_a, 4)
    assert by_g["b"] == _sequential_pack(rows_b, 4)


def test_pack_sequences_null_length_raises(spark):
    df = spark.createDataFrame(
        [(0, 3), (1, None)], "doc_id long, n_tok long"
    )
    with pytest.raises(Exception, match="NULL or negative"):
        pack_sequences(df, "doc_id", "n_tok", chunk_len=4).collect()


def test_pack_token_table_invariant(spark):
    """The token-table generator stream packs losslessly: window token
    arrays flatten back to the per-doc concat (per-row token-array
    equality, BASELINE.json invariant)."""
    tok = token_table(spark, 400, with_interval=False)
    df = tok.withColumn("doc_id", F.col("doc_id").cast("long"))
    w = 512
    chunks = pack_chunks(
        df, "doc_id", "tokens", "n_tok", chunk_len=w
    ).orderBy("chunk_id").collect()
    flat = [t for r in chunks for t in r["tokens"]]
    docs = df.orderBy("doc_id").select("tokens").collect()
    expect = [t for r in docs for t in r["tokens"]]
    assert flat == expect
    assert all(r["n_tok"] == w for r in chunks[:-1])
    # spans agree with chunks on totals
    spans = pack_sequences(df, "doc_id", "n_tok", chunk_len=w)
    tot = spans.agg(F.sum("seq_len")).first()[0]
    assert tot == len(expect)


def test_token_histogram_exact(spark):
    df = _docs(spark, [(0, [1, 2, 2], "a"), (1, [2, 3], "b")])
    got = {
        r["token"]: r["count"]
        for r in token_histogram(df, "tokens").collect()
    }
    assert got == {1: 1, 2: 3, 3: 1}
    grouped = {
        (r["source"], r["token"]): r["count"]
        for r in token_histogram(df, "tokens", group_by=["source"]).collect()
    }
    assert grouped == {("a", 1): 1, ("a", 2): 2, ("b", 2): 1, ("b", 3): 1}


def test_token_ngram_counts(spark):
    df = _docs(spark, [(0, [1, 2, 1, 2], "a"), (1, [9], "a")])
    got = {
        tuple(r["ngram"]): r["count"]
        for r in token_ngram_counts(df, "tokens", n=2).collect()
    }
    # [9] is shorter than n → contributes nothing
    assert got == {(1, 2): 2, (2, 1): 1}


def test_ngram_contamination(spark):
    from timeperiods_spark.operators.tokenstats import ngram_contamination

    train = _docs(spark, [(0, [1, 2, 3, 4, 5], "a"), (1, [7, 8, 9], "a")])
    test = _docs(
        spark,
        [
            (10, [2, 3, 4, 99], "a"),   # grams (2,3),(3,4) hit; (4,99) not
            (11, [50, 51], "a"),        # one gram, clean
            (12, [7], "a"),             # too short: no grams
        ],
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["n_hit"], r["frac_hit"])
        for r in ngram_contamination(test, train, "tokens", "doc_id", n=2).collect()
    }
    assert out[10] == (3, 2, pytest.approx(2 / 3))
    assert out[11] == (1, 0, 0.0)
    assert 12 not in out  # no grams -> no row (nothing to scrub on)


def test_ngram_contamination_hash_grams_equivalent(spark):
    """hash_grams=True (the production 8-byte-key setting) must agree
    with the exact-array formulation — collisions are ~2^-64 per gram
    pair and cannot occur on this corpus — and its exchanges must not
    carry the gram arrays."""
    import re

    from timeperiods_spark.operators.tokenstats import ngram_contamination

    train = _docs(
        spark,
        [(i, [i % 7, (i * 3) % 11, (i * 5) % 13, i % 4, (i + 1) % 9], "a")
         for i in range(40)],
    )
    test = _docs(
        spark,
        [(100 + i, [(i + 2) % 7, (i * 3) % 11, (i * 5) % 13, 99], "a")
         for i in range(15)],
    )

    def rows(hash_grams):
        return sorted(
            (r["doc_id"], r["n_grams"], r["n_hit"], round(r["frac_hit"], 9))
            for r in ngram_contamination(
                test, train, "tokens", "doc_id", n=3, hash_grams=hash_grams
            ).collect()
        )

    assert rows(True) == rows(False)

    hashed = ngram_contamination(
        test, train, "tokens", "doc_id", n=3, hash_grams=True
    )
    plan = hashed._sc._jvm.PythonSQLUtils.explainString(
        hashed._jdf.queryExecution(), "formatted"
    )
    # every exchange keyed by the gram key must carry the 8-byte hash,
    # never an ngram array column
    exchanges = re.findall(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", plan
    )
    assert exchanges, plan[:1500]
    for cols in exchanges:
        assert "ngram" not in cols, cols


def test_topk_per_group_exact_and_deterministic(spark):
    df = _docs(
        spark,
        [(0, [1, 1, 2], "a"), (1, [2, 2, 3], "a"), (2, [5, 5, 5], "b")],
    )
    hist = token_histogram(df, "tokens", group_by=["source"])
    top = topk_per_group(
        hist, ["token"], F.sum("count"), group_by=["source"], k=1
    ).collect()
    got = {(r["source"], r["token"], r["measure"], r["rank"]) for r in top}
    # group a ties 1:2 vs 2:3 → 2 wins; group b trivially 5
    assert got == {("a", 2, 3, 1), ("b", 5, 3, 1)}
    # ungrouped path (two-phase rank): same totals, k=2
    top2 = topk_per_group(
        token_histogram(df, "tokens"), ["token"], F.sum("count"), k=2
    ).orderBy("rank").collect()
    assert [(r["token"], r["measure"]) for r in top2] == [(2, 3), (5, 3)]


def test_pack_duplicate_order_values_deterministic(spark):
    """Duplicate order_col values must not make packing output depend
    on partitioning: id_col is the deterministic secondary sort key in
    the offset prefix-sum (round-4 advice finding)."""
    rows = [(i, 0, [int(i)] * 5, 5) for i in range(40)]  # ALL order ties
    df = spark.createDataFrame(
        rows, "doc_id long, ord long, tokens array<int>, n_tok long"
    )

    def run(d):
        return [
            (r["chunk_id"], tuple(r["tokens"]))
            for r in pack_chunks(
                d, "doc_id", "tokens", "n_tok", chunk_len=7, order_col="ord"
            ).orderBy("chunk_id").collect()
        ]

    a = run(df.repartition(1))
    b = run(df.repartition(13))
    c = run(df.repartition(32).sortWithinPartitions(F.desc("doc_id")))
    assert a == b == c
    # and the tie order is ascending doc_id: the stream is 0,0,0,0,0,1,...
    flat = [t for _, toks in a for t in toks]
    assert flat == sorted(flat)


def test_ngram_logprob_matches_slow_reference(spark):
    """Add-k bigram self-likelihood vs a dict-based reference."""
    import math
    from collections import Counter

    from timeperiods_spark import ngram_logprob

    seqs = {0: [1, 2, 3, 1, 2], 1: [2, 3, 2, 3, 9], 2: [7], 3: []}
    df = spark.createDataFrame(
        [(i, s) for i, s in seqs.items()], "doc_id long, tokens array<int>"
    )
    cn, cp = Counter(), Counter()
    for s in seqs.values():
        for i in range(len(s) - 1):
            cn[(s[i], s[i + 1])] += 1
        for t in s:
            cp[t] += 1
    V = len({t for s in seqs.values() for t in s})
    out = {r["doc_id"]: r for r in
           ngram_logprob(df, "doc_id", "tokens", n=2, k_smooth=1.0).collect()}
    for d, s in seqs.items():
        if len(s) < 2:
            assert out[d]["n_scored"] == 0 and out[d]["avg_logp"] is None
            continue
        lps = [math.log((cn[(s[i], s[i + 1])] + 1.0) / (cp[s[i]] + V))
               for i in range(len(s) - 1)]
        want = sum(lps) / len(lps)
        assert out[d]["n_scored"] == len(s) - 1
        assert out[d]["avg_logp"] == round(want, 6)
        assert out[d]["ppl"] == round(math.exp(-want), 6)
    # vocab_size pin skips the distinct subtree but changes the score
    pinned = ngram_logprob(df, "doc_id", "tokens", n=2, vocab_size=1000)
    r0 = {r["doc_id"]: r["avg_logp"] for r in pinned.collect()}
    assert r0[0] < out[0]["avg_logp"]  # larger V -> lower prob
    import pytest as _pt
    with _pt.raises(ValueError):
        ngram_logprob(df, "doc_id", "tokens", n=1)
    with _pt.raises(ValueError):
        ngram_logprob(df, "doc_id", "tokens", n=2, k_smooth=0.0)


def test_tfidf_topk_matches_slow_reference(spark):
    import math
    from collections import Counter

    from timeperiods_spark import tfidf_topk

    seqs = {0: [1, 1, 2, 3], 1: [1, 4, 4, 4], 2: [2, 2, 5]}
    df = spark.createDataFrame(
        [(i, s) for i, s in seqs.items()], "doc_id long, tokens array<int>"
    )
    dfreq = Counter(t for s in seqs.values() for t in set(s))
    N = len(seqs)
    out = tfidf_topk(df, "doc_id", "tokens", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, s in seqs.items():
        cnt = Counter(s)
        scored = sorted(
            (
                (-round((c / len(s)) * (math.log((N + 1) / (dfreq[t] + 1)) + 1), 6), t)
                for t, c in cnt.items()
            )
        )[:2]
        got = sorted(by_doc[d], key=lambda r: r["rank"])
        assert [r["token"] for r in got] == [t for _, t in scored], d
        for r, (neg, t) in zip(got, scored):
            assert r["tfidf"] == -neg
        assert [r["rank"] for r in got] == [1, 2]
    import pytest as _pt
    with _pt.raises(ValueError):
        tfidf_topk(df, "doc_id", "tokens", k=0)
