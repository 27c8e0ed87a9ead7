"""Gopher-style n-gram repetition signals (tokenstats.ngram_repetition)."""

from __future__ import annotations

import random

import pytest

from timeperiods_spark import ngram_repetition


def _brute(docs, ns):
    out = []
    for did, toks in docs:
        ntok = len(toks)
        for n in ns:
            if ntok < n:
                out.append((did, n, ntok, 0.0, 0.0))
                continue
            grams: dict = {}
            for p in range(ntok - n + 1):
                grams.setdefault(tuple(toks[p : p + n]), []).append(p)
            topc = max(len(v) for v in grams.values())
            covered: set = set()
            for v in grams.values():
                if len(v) >= 2:
                    for p in v:
                        covered.update(range(p, p + n))
            out.append(
                (did, n, ntok, topc * n / ntok, len(covered) / ntok)
            )
    return sorted(out)


def _collect(df):
    return sorted(
        (r["doc_id"], r["n"], r["n_tok"],
         round(r["top_frac"], 9), round(r["dup_frac"], 9))
        for r in df.collect()
    )


def test_planted_repeats_and_short_docs(spark):
    docs_py = [
        (1, ["a", "a", "a", "a", "b", "a", "a"]),
        (2, ["x", "y", "z"]),            # no repeats at n=2
        (3, ["q"]),                      # shorter than every n
    ]
    docs = spark.createDataFrame(docs_py, "doc_id long, tokens array<string>")
    got = _collect(ngram_repetition(docs, ns=(2, 3)))
    want = [
        (k[0], k[1], k[2], round(k[3], 9), round(k[4], 9))
        for k in _brute(docs_py, (2, 3))
    ]
    assert got == want
    by_key = {(r[0], r[1]): r for r in got}
    # doc1 n=2: "a a" occurs 4x (pos 0,1,2,5) -> top_frac 8/7 > 1, a
    # deliberate property of the published formula
    assert by_key[(1, 2)][3] == round(8 / 7, 9)
    # (a,a) occurrences cover positions {0,1,2,3} u {5,6}; the lone
    # "b" bridge at position 4 stays uncovered -> 6/7
    assert by_key[(1, 2)][4] == round(6 / 7, 9)
    assert by_key[(2, 2)] == (2, 2, 3, round(2 / 3, 9), 0.0)
    assert by_key[(3, 2)] == (3, 2, 1, 0.0, 0.0)


def test_differential_vs_brute(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(6)]
    docs_py = [
        (i, [rng.choice(vocab) for _ in range(rng.randint(1, 50))])
        for i in range(30)
    ]
    docs = spark.createDataFrame(docs_py, "doc_id long, tokens array<string>")
    got = _collect(ngram_repetition(docs, ns=(2, 4, 7)))
    want = [
        (k[0], k[1], k[2], round(k[3], 9), round(k[4], 9))
        for k in _brute(docs_py, (2, 4, 7))
    ]
    assert got == want


def test_text_path_matches_tokens_path_and_int_tokens(spark):
    docs_txt = spark.createDataFrame(
        [(1, "a b a b a"), (2, "c c c")], "doc_id long, text string"
    )
    docs_tok = spark.createDataFrame(
        [(1, ["a", "b", "a", "b", "a"]), (2, ["c", "c", "c"])],
        "doc_id long, tokens array<string>",
    )
    a = _collect(ngram_repetition(docs_txt, text_col="text", ns=(2,)))
    b = _collect(ngram_repetition(docs_tok, ns=(2,)))
    assert a == b
    ints = spark.createDataFrame(
        [(5, [1, 2, 1, 2, 1])], "doc_id long, tokens array<int>"
    )
    got = _collect(ngram_repetition(ints, ns=(2,)))
    assert got == [(5, 2, 5, round(4 / 5, 9), 1.0)]


def test_bad_ns(spark):
    docs = spark.createDataFrame([(1, ["a"])], "doc_id long, tokens array<string>")
    for ns in ((), (0,), (2, 2)):
        with pytest.raises(ValueError):
            ngram_repetition(docs, ns=ns)
