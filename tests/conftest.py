"""Shared pytest fixtures: one local SparkSession per test run."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from timeperiods_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="timeperiods-tests",
        master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[4]"),
        shuffle_partitions=8,
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    )
    yield s


def rows_sorted(df, keys):
    """Collect to a list of plain tuples sorted by the given key columns."""
    out = [tuple(r) for r in df.orderBy(*keys).collect()]
    return out


def assert_df_equal(actual, expected, keys, rel=1e-9, abs_=1e-9):
    """Order-insensitive frame comparison with float tolerance.

    Both frames must share a schema; rows are sorted by `keys`.
    """
    import math

    assert actual.columns == expected.columns, (
        f"column mismatch: {actual.columns} vs {expected.columns}"
    )
    a = rows_sorted(actual, keys)
    e = rows_sorted(expected, keys)
    assert len(a) == len(e), f"row count {len(a)} != {len(e)}"
    for ra, re_ in zip(a, e):
        for ca, ce, name in zip(ra, re_, actual.columns):
            if isinstance(ca, float) and isinstance(ce, float):
                if math.isnan(ca) and math.isnan(ce):
                    continue
                assert ca == pytest.approx(ce, rel=rel, abs=abs_), (
                    f"{name}: {ca} != {ce} in row {ra} vs {re_}"
                )
            else:
                assert ca == ce, f"{name}: {ca!r} != {ce!r} in row {ra} vs {re_}"
