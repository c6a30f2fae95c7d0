"""Differential window-frame fuzzing: random ROWS/RANGE frame
specifications executed as IDENTICAL SQL text by Spark and DuckDB over
the same parquet must agree.

Extends the predicate/set-op/scalar fuzzers to the window surface —
frame-bound semantics (preceding/following, unbounded, current row,
RANGE vs ROWS) are exactly where engines historically disagree. The
frames run over `orders` ORDERed BY the UNIQUE o_orderkey so ROWS
frames are well-defined: with tied sort keys a ROWS frame depends on
physical sort order and no cross-engine guarantee exists. (The first
cut ordered lineitem by l_orderkey*8+l_linenumber, assuming TPC-H's
(orderkey, linenumber) primary key — the fuzzer immediately found 499
duplicate pairs in the synthetic fixture and an 11-row frame
divergence: exactly the tie nondeterminism this suite exists to keep
out of shipped operators, which all order windows by keys that are
unique IN THIS DATA.)
"""

from __future__ import annotations

import pytest

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"
PARQUET = f"{SF}/orders.parquet"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{PARQUET}')")
    return con


@pytest.fixture(scope="module")
def spark_orders(spark):
    from gotsdb_spark.sources.registry import load_table

    df = load_table(spark, "orders", SF)
    df.createOrReplaceTempView("orders")
    return df


_PARTITIONS = st.sampled_from(["o_orderstatus", "o_orderpriority", "o_custkey % 7"])
# Integer-exact measures ONLY: the first cut used a raw-DOUBLE sum and
# the fuzzer found a 1e-6-relative mismatch — running-frame float sums
# accumulate in engine-specific order, which is precisely why every
# shipped operator integer-scales before summing. The fuzzer pins that
# convention instead of fighting it.
_MEASURES = st.sampled_from(
    [
        "sum(CAST(floor(o_totalprice * 100) AS BIGINT))",
        "min(o_orderkey)",
        "max(o_custkey)",
        "count(*)",
    ]
)


@st.composite
def frame(draw):
    """A random ROWS frame with lo <= hi (both in [-5, 5], or unbounded)."""
    lo = draw(st.integers(-5, 5) | st.none())  # None = UNBOUNDED PRECEDING
    hi = draw(st.integers(-5, 5) | st.none())  # None = UNBOUNDED FOLLOWING
    if lo is not None and hi is not None and lo > hi:
        lo, hi = hi, lo

    def bound(v, default):
        if v is None:
            return default
        if v < 0:
            return f"{-v} PRECEDING"
        if v == 0:
            return "CURRENT ROW"
        return f"{v} FOLLOWING"

    return (
        f"ROWS BETWEEN {bound(lo, 'UNBOUNDED PRECEDING')}"
        f" AND {bound(hi, 'UNBOUNDED FOLLOWING')}"
    )


@given(part=_PARTITIONS, measure=_MEASURES, fr=frame())
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_rows_frames_agree(spark, spark_orders, duck, part, measure, fr):
    sql = (
        "SELECT coalesce(sum(w), 0) AS checksum, count(*) AS n FROM ("
        f"  SELECT {measure} OVER ("
        f"    PARTITION BY {part}"
        "     ORDER BY o_orderkey"
        f"    {fr}) AS w"
        "  FROM orders)"
    )
    s = spark.sql(sql).first()
    d = duck.execute(sql).fetchone()
    assert (s["checksum"], s["n"]) == (int(d[0]), int(d[1])), sql


@given(part=_PARTITIONS)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_range_interval_frames_agree(spark, spark_orders, duck, part):
    """RANGE frames over a numeric key: value-based bounds include ALL
    peers within the range regardless of row position — the semantic
    where RANGE and ROWS genuinely differ."""
    sql = (
        "SELECT coalesce(sum(w), 0) AS checksum FROM ("
        "  SELECT sum(CAST(floor(o_totalprice * 100) AS BIGINT)) OVER ("
        f"    PARTITION BY {part}"
        "     ORDER BY o_orderkey"
        "     RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING) AS w"
        "  FROM orders)"
    )
    s = spark.sql(sql).first()
    d = duck.execute(sql).fetchone()
    assert s["checksum"] == int(d[0]), sql
