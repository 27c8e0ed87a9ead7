"""Substring-level span dedup (operators/spandedup.py).

Covers: planted cross-doc duplicates (offset-shifted), within-doc
repeats, clean corpora, winnowing's alignment robustness vs strided
exact mode, tokens_col input, hash_windows equivalence, and a
brute-force differential over a random template corpus.
"""

from __future__ import annotations

import random

import pytest

from timeperiods_spark import duplicate_span_stats, duplicate_spans
from timeperiods_spark.errors import RoleValidationError


def _doc(words):
    return " ".join(words)


def _brute_spans(docs, k, min_count=2):
    """Reference implementation: window counts + island merge
    (merge closed [p, p+k-1] windows when next.start <= cur.end+1)."""
    wins = {}
    pos_by_doc = {}
    for did, text in docs:
        toks = text.split(" ")
        ps = []
        for p in range(0, len(toks) - k + 1):
            w = "\x1f".join(toks[p : p + k])
            wins[w] = wins.get(w, 0) + 1
            ps.append((p, w))
        pos_by_doc[did] = ps
    out = []
    for did, ps in pos_by_doc.items():
        dup = sorted(p for p, w in ps if wins[w] >= min_count)
        if not dup:
            continue
        s = e = None
        n_win = 0
        for p in dup:
            if s is None:
                s, e, n_win = p, p + k - 1, 1
            elif p <= e + 1:
                e = max(e, p + k - 1)
                n_win += 1
            else:
                out.append((did, s, e, e - s + 1, n_win))
                s, e, n_win = p, p + k - 1, 1
        out.append((did, s, e, e - s + 1, n_win))
    return sorted(out)


def _collect(df):
    return sorted(
        tuple(r)
        for r in df.select(
            "doc_id", "span_start", "span_end", "n_tokens", "n_windows"
        ).collect()
    )


def test_cross_doc_duplicate_at_different_offsets(spark):
    shared = [f"dup{i}" for i in range(12)]
    a = [f"a{i}" for i in range(5)] + shared + [f"a{i}" for i in range(5, 11)]
    b = [f"b{i}" for i in range(9)] + shared + [f"b{i}" for i in range(9, 12)]
    docs = spark.createDataFrame(
        [(1, _doc(a)), (2, _doc(b))], "doc_id long, text string"
    )
    got = _collect(duplicate_spans(docs, k=6))
    # the shared 12-token run occupies tokens [5,16] in a and [9,20] in b
    assert got == [
        (1, 5, 16, 12, 7),
        (2, 9, 20, 12, 7),
    ]


def test_within_doc_repeat_counts_toward_min_count(spark):
    phrase = [f"p{i}" for i in range(8)]
    toks = phrase + ["x0", "x1", "x2"] + phrase + ["y0"]
    docs = spark.createDataFrame(
        [(7, _doc(toks))], "doc_id long, text string"
    )
    got = _collect(duplicate_spans(docs, k=8))
    assert got == [(7, 0, 7, 8, 1), (7, 11, 18, 8, 1)]


def test_clean_corpus_no_rows_and_zero_filled_stats(spark):
    docs = spark.createDataFrame(
        [(1, _doc([f"u{i}" for i in range(30)])),
         (2, _doc([f"v{i}" for i in range(4)]))],  # shorter than k
        "doc_id long, text string",
    )
    spans = duplicate_spans(docs, k=6)
    assert spans.count() == 0
    stats = {
        r["doc_id"]: (r["n_tok"], r["dup_tokens"], r["dup_frac"])
        for r in duplicate_span_stats(docs, k=6).collect()
    }
    assert stats == {1: (30, 0, 0.0), 2: (4, 0, 0.0)}


def test_stats_dup_frac(spark):
    shared = [f"s{i}" for i in range(10)]
    docs = spark.createDataFrame(
        [(1, _doc(shared + [f"a{i}" for i in range(10)])),
         (2, _doc([f"b{i}" for i in range(30)] + shared))],
        "doc_id long, text string",
    )
    stats = {
        r["doc_id"]: (r["n_tok"], r["dup_tokens"], round(r["dup_frac"], 6))
        for r in duplicate_span_stats(docs, k=10).collect()
    }
    assert stats == {1: (20, 10, 0.5), 2: (40, 10, 0.25)}


def test_winnow_finds_unaligned_duplicate_that_stride_misses(spark):
    # 20-token shared run, offsets 3 and 4: stride=3 windows never
    # align across the two copies, winnowing picks content-defined
    # positions so the collision survives the shift
    shared = [f"w{i}" for i in range(20)]
    a = ["a0", "a1", "a2"] + shared + ["a3"]
    b = ["b0", "b1", "b2", "b3"] + shared + ["b4", "b5"]
    docs = spark.createDataFrame(
        [(1, _doc(a)), (2, _doc(b))], "doc_id long, text string"
    )
    strided = duplicate_spans(docs, k=6, stride=3)
    assert strided.count() == 0
    winnowed = _collect(duplicate_spans(docs, k=6, mode="winnow", w=4))
    assert {r[0] for r in winnowed} == {1, 2}
    # winnow guarantee: a duplicated run of >= k+w-1 tokens is hit;
    # reported spans stay inside the true duplicated region
    for did, s, e, _, _ in winnowed:
        lo = 3 if did == 1 else 4
        assert s >= lo and e <= lo + 19


def test_winnow_rejects_stride(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(RoleValidationError):
        duplicate_spans(docs, k=2, mode="winnow", stride=2)


def test_tokens_col_and_hash_windows_match_text_path(spark):
    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(12)]
    boiler = ["shared0", "shared1", "shared2", "shared3", "shared4",
              "shared5", "shared6"]
    rows = [
        (
            i,
            [rng.choice(vocab) for _ in range(rng.randint(8, 40))]
            + (boiler if i % 5 == 0 else []),
        )
        for i in range(25)
    ]
    docs_tok = spark.createDataFrame(
        rows, "doc_id long, tokens array<string>"
    )
    docs_txt = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in rows], "doc_id long, text string"
    )
    a = _collect(duplicate_spans(docs_tok, text_col=None,
                                 tokens_col="tokens", k=5))
    b = _collect(duplicate_spans(docs_txt, k=5))
    c = _collect(duplicate_spans(docs_txt, k=5, hash_windows=True))
    assert a == b == c
    assert len(a) > 0  # template corpus: duplication must exist


def test_differential_vs_brute_force(spark):
    rng = random.Random(23)
    vocab = [f"v{i}" for i in range(15)]
    docs_py = [
        (i, _doc([rng.choice(vocab) for _ in range(rng.randint(3, 60))]))
        for i in range(40)
    ]
    docs = spark.createDataFrame(docs_py, "doc_id long, text string")
    for k, mc in ((4, 2), (6, 3)):
        got = _collect(duplicate_spans(docs, k=k, min_count=mc))
        assert got == _brute_spans(docs_py, k, mc)


def test_arg_validation(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    for kw in (
        {"k": 0},
        {"min_count": 1},
        {"mode": "nope"},
        {"text_col": None},
        {"tokens_col": "text"},  # both set
    ):
        with pytest.raises(RoleValidationError):
            duplicate_spans(docs, **kw)
