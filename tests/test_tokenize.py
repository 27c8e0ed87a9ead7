"""Greedy longest-match vocab tokenization."""

from __future__ import annotations

import pytest

from timeperiods_spark import tokenize_vocab
from timeperiods_spark.errors import RoleValidationError
from timeperiods_spark.operators.tokenize import tokenize_word

VOCAB = {
    "hel": 1, "hello": 2, "lo": 3, "wor": 4, "ld": 5, "o": 6,
    "w": 7, "r": 8, "un": 9, "break": 10, "able": 11, "un break": 12,
}


def test_tokenize_word_kernel():
    # longest match wins: "hello" (5) beats "hel" (3)
    assert tokenize_word("hello", VOCAB, 0, 8) == [2]
    assert tokenize_word("helloworld", VOCAB, 0, 8) == [2, 4, 5]
    # unk advances one char: 'x' then 'able'
    assert tokenize_word("xable", VOCAB, 0, 8) == [0, 11]
    assert tokenize_word("", VOCAB, 0, 8) == []
    # greedy is NOT optimal and that's the contract: "unbreakable"
    # -> un, break, able
    assert tokenize_word("unbreakable", VOCAB, 0, 8) == [9, 10, 11]


def test_tokenize_vocab_dataframe(spark):
    df = spark.createDataFrame(
        [
            (0, "hello world"),
            (1, "unbreakable  hello"),  # double space: empty word skipped
            (2, None),
            (3, ""),
            (4, "zzz"),
        ],
        "id int, text string",
    )
    out = {r["id"]: r for r in tokenize_vocab(df, "id", "text", VOCAB).collect()}
    assert out[0]["tokens"] == [2, 4, 5] and out[0]["n_tok"] == 3
    # words tokenize independently: the "un break" piece can never
    # match across the separator
    assert out[1]["tokens"] == [9, 10, 11, 2]
    assert out[2]["tokens"] == [] and out[2]["n_tok"] == 0
    assert out[3]["tokens"] == []
    assert out[4]["tokens"] == [0, 0, 0]  # all-unk
    assert len(out) == 5
    # lowercase option folds case before matching
    up = spark.createDataFrame([(0, "HELLO")], "id int, text string")
    assert tokenize_vocab(up, "id", "text", VOCAB, lowercase=True).collect()[0][
        "tokens"] == [2]
    with pytest.raises(RoleValidationError):
        tokenize_vocab(df, "id", "text", {})
    with pytest.raises(RoleValidationError):
        tokenize_vocab(df, "id", "text", {"": 1})


def test_tokenize_vocab_distinct_word_reuse(spark):
    # many docs, few distinct words — the join-back path must produce
    # identical sequences for identical words at any partitioning
    rows = [(i, "hello world " * (i % 3 + 1)) for i in range(200)]
    df = spark.createDataFrame(rows, "id int, text string").repartition(13)
    out = {r["id"]: r["tokens"] for r in
           tokenize_vocab(df, "id", "text", VOCAB).collect()}
    for i in range(200):
        assert out[i] == [2, 4, 5] * (i % 3 + 1)
