"""Differential ORDER BY + LIMIT/OFFSET fuzzing: random total-order
sorts with random page windows executed as IDENTICAL SQL by Spark and
DuckDB must return the same page, row for row.

Pagination is where sort-tie semantics bite: a LIMIT boundary that
falls inside a tie group returns engine-dependent rows unless the
ORDER BY is total, so every generated sort ends in the unique
o_orderkey — the same contract every shipped top-k/keyset operator in
this repo follows (and the page checksum is position-SENSITIVE, so an
off-by-one at either page edge flips it). Page positions are
re-derived inside the page with a window over the SAME total order —
both engines agree on them independently of how the page rows happen
to be delivered.
"""

from __future__ import annotations

import pytest

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"
PARQUET = f"{SF}/orders.parquet"

# (select alias, expression) — expressions aliased through the page
# subquery so the outer position window can reuse the exact sort terms.
_SORT_COLS = [
    ("s0", "o_orderstatus"),
    ("s1", "o_orderpriority"),
    ("s2", "o_totalprice"),
    ("s3", "o_orderdate"),
    ("s4", "o_custkey % 9"),
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{PARQUET}')")
    return con


@pytest.fixture(scope="module")
def spark_orders(spark):
    from gotsdb_spark.sources.registry import load_table

    load_table(spark, "orders", SF).createOrReplaceTempView("orders")


@st.composite
def sort_spec(draw):
    n = draw(st.integers(0, 3))
    picked = draw(st.permutations(_SORT_COLS).map(lambda p: list(p)[:n]))
    dirs = [draw(st.sampled_from(["ASC", "DESC"])) for _ in picked]
    key_dir = draw(st.sampled_from(["ASC", "DESC"]))
    inner = ", ".join(
        [f"{expr} {d}" for (_, expr), d in zip(picked, dirs)]
        + [f"o_orderkey {key_dir}"]
    )
    outer = ", ".join(
        [f"{alias} {d}" for (alias, _), d in zip(picked, dirs)]
        + [f"o_orderkey {key_dir}"]
    )
    return inner, outer


@given(
    spec=sort_spec(),
    limit=st.integers(0, 60),
    offset=st.integers(0, 1200),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_pages_agree(spark, spark_orders, duck, spec, limit, offset):
    inner_order, outer_order = spec
    sel = ", ".join(f"{expr} AS {alias}" for alias, expr in _SORT_COLS)
    sql = (
        "SELECT count(*) AS n,"
        " coalesce(sum(CAST(HEXKEY AS BIGINT) * (pos + 7)), 0) AS checksum"
        " FROM ("
        f"   SELECT row_number() OVER (ORDER BY {outer_order}) AS pos,"
        "          md5(CAST(o_orderkey AS VARCHAR)) AS k"
        "   FROM ("
        f"    SELECT o_orderkey, {sel} FROM orders ORDER BY {inner_order}"
        f"    LIMIT {limit} OFFSET {offset}"
        "   ) page"
        " ) t"
    )
    duck_sql = sql.replace(
        "CAST(HEXKEY AS BIGINT)", "CAST('0x' || substr(k, 1, 12) AS BIGINT)"
    )
    spark_sql = sql.replace(
        "CAST(HEXKEY AS BIGINT)",
        "CAST(conv(substr(k, 1, 12), 16, 10) AS BIGINT)",
    ).replace("AS VARCHAR)", "AS STRING)")
    s = spark.sql(spark_sql).first()
    d = duck.execute(duck_sql).fetchone()
    assert (s["n"], s["checksum"]) == (int(d[0]), int(d[1])), (
        inner_order,
        limit,
        offset,
    )
