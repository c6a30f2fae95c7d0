"""Quantified row-pattern matching (view (click)+ purchase): Spark vs
the DuckDB oracle run in-test (operator queued for round-6
registration), plus closed-form pattern-semantics checks on synthetic
sequences where the expected counts are computable by hand.
"""

from __future__ import annotations

import pytest

import re

import duckdb

from gotsdb_spark.operators.timeseries import (
    QUANTIFIED_PATTERN_ORACLE,
    ts_pattern_quantified_funnels,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    return con


def test_quantified_pattern_matches_oracle(spark, duck):
    got = sorted(
        (r["user_id"], r["n_events"], r["n_matches"], r["longest_click_run"])
        for r in ts_pattern_quantified_funnels(spark, SF).collect()
    )
    want = sorted(
        (int(a), int(b), int(c), int(d))
        for a, b, c, d in duck.execute(QUANTIFIED_PATTERN_ORACLE).fetchall()
    )
    assert got == want and got
    # the quantifier must fire somewhere in the fixture
    assert any(r[2] > 0 for r in got)


@pytest.mark.parametrize(
    ("seq", "n_matches", "longest_run"),
    [
        ("vcp", 1, 1),  # minimal match
        ("vccccp", 1, 4),  # quantifier absorbs the run
        ("vcpvcp", 2, 1),  # non-overlapping repeats
        ("vp", 0, 0),  # zero clicks: B+ requires >= 1
        ("cvpc", 0, 1),  # clicks exist but not inside the pattern
        ("vcvcp", 1, 1),  # restart: leftmost v fails, second succeeds
    ],
)
def test_pattern_semantics_closed_form(seq, n_matches, longest_run):
    """The regex semantics both engines must implement: leftmost,
    non-overlapping, greedy — pinned against hand-computed counts."""
    assert len(re.findall("vc+p", seq)) == n_matches
    runs = re.findall("c+", seq)
    assert (max(map(len, runs)) if runs else 0) == longest_run
