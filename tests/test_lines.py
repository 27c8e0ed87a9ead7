"""Line-level hygiene: filter_lines rules and cross-corpus dedup_lines."""

from __future__ import annotations

import pytest

from timeperiods_spark import dedup_lines, filter_lines


def test_filter_lines_rules(spark):
    df = spark.createDataFrame(
        [
            (0, "this line is long enough.\nno\nanother good line here!\n"
                "click here to subscribe now.\nends without punct though"),
            (1, None),
            (2, ""),
        ],
        "id int, text string",
    )
    out = {r["id"]: r for r in filter_lines(
        df, "text", min_words=3, require_terminal_punct=True,
        deny_substrings=["subscribe"],
    ).collect()}
    assert out[0]["text_filtered"] == (
        "this line is long enough.\nanother good line here!"
    )
    assert out[0]["lines_kept"] == 2 and out[0]["lines_dropped"] == 3
    assert out[1]["text_filtered"] == "" and out[1]["lines_kept"] == 0
    assert out[2]["lines_kept"] == 0 and out[2]["lines_dropped"] == 1
    # punctuation rule off: the last line survives too
    loose = filter_lines(df, "text", min_words=3).collect()
    l0 = {r["id"]: r for r in loose}[0]
    assert "ends without punct though" in l0["text_filtered"]
    assert "click here" in l0["text_filtered"]  # deny list off


def test_dedup_lines_keep_first_and_reassembly(spark):
    df = spark.createDataFrame(
        [
            (10, "alpha beta\ncommon footer\nunique one"),
            (11, "common footer\nunique two\ncommon footer"),
            (12, "common footer"),
            (13, ""),
        ],
        "id int, text string",
    )
    for hash_lines in (False, True):
        out = {r["id"]: r for r in
               dedup_lines(df, "id", "text", hash_lines=hash_lines).collect()}
        # first occurrence = (10, idx 1); every other copy removed
        assert out[10]["text_deduped"] == "alpha beta\ncommon footer\nunique one"
        assert out[11]["text_deduped"] == "unique two"
        assert out[11]["lines_kept"] == 1 and out[11]["lines_dropped"] == 2
        assert out[12]["text_deduped"] == "" and out[12]["lines_dropped"] == 1
        # empty doc: its empty line is below min_chars -> always kept
        assert out[13]["text_deduped"] == "" and out[13]["lines_kept"] == 1
        assert len(out) == 4


def test_dedup_lines_normalize_and_min_chars(spark):
    df = spark.createDataFrame(
        [(0, "Hello World\nok"), (1, "hello world\nok")],
        "id int, text string",
    )
    plain = {r["id"]: r["text_deduped"]
             for r in dedup_lines(df, "id", "text").collect()}
    # case differs: both survive without normalize; "ok" dedupes
    assert plain[0] == "Hello World\nok" and plain[1] == "hello world"
    norm = {r["id"]: r["text_deduped"]
            for r in dedup_lines(df, "id", "text", normalize=True).collect()}
    assert norm[0] == "Hello World\nok" and norm[1] == ""
    # min_chars high: short lines never dedup
    keep = {r["id"]: r["text_deduped"]
            for r in dedup_lines(df, "id", "text", min_chars=20).collect()}
    assert keep[1] == "hello world\nok"


def test_dedup_lines_blank_lines_survive(spark):
    df = spark.createDataFrame(
        [(0, "a a a\n\nb b b"), (1, "c c c\n\nd d d")],
        "id int, text string",
    )
    out = {r["id"]: r["text_deduped"]
           for r in dedup_lines(df, "id", "text").collect()}
    # the blank separator line is not a candidate: kept in BOTH docs
    assert out[0] == "a a a\n\nb b b" and out[1] == "c c c\n\nd d d"
