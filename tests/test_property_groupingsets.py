"""Differential GROUPING SETS / ROLLUP / CUBE fuzzing: random
multi-level grouping specifications executed as IDENTICAL SQL text by
Spark and DuckDB over the same parquet must agree.

Completes the fuzzer family (predicates, aggregations, window frames,
joins, set ops, scalars): multi-level grouping is its own semantic
surface — NULL super-aggregate markers, GROUPING() bit flags, and
duplicate-set handling are places engines have historically diverged.
Measures follow the integer-exact convention the window fuzzer
established (floor-to-cents before SUM) so float association order
can't manufacture a failure.

The checksum folds every output row — including the NULL markers and
grouping ids — into one order-insensitive integer, so a missing or
duplicated super-aggregate level flips it.
"""

from __future__ import annotations

import pytest

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"
PARQUET = f"{SF}/orders.parquet"

_COLS = ["o_orderstatus", "o_orderpriority", "o_custkey % 5"]


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


@st.composite
def grouping_spec(draw):
    """A random ROLLUP / CUBE / GROUPING SETS clause over 1-3 keys."""
    n = draw(st.integers(1, 3))
    cols = draw(
        st.permutations(_COLS).map(lambda p: list(p)[:n])
    )
    kind = draw(st.sampled_from(["ROLLUP", "CUBE", "GROUPING SETS"]))
    if kind == "GROUPING SETS":
        # random family of subsets (possibly with the empty set); the
        # full column list is always one member so every selected key
        # appears in some grouping set — Spark rejects grouping() over
        # a column no set references (GROUPING_COLUMN_MISMATCH), and
        # the full set keeps the SELECT list well-defined.
        subsets = draw(
            st.lists(
                st.lists(st.sampled_from(cols), unique=True, max_size=len(cols)),
                min_size=0,
                max_size=3,
            )
        )
        subsets.append(cols)
        body = ", ".join("(" + ", ".join(s) + ")" for s in subsets)
        return cols, f"GROUPING SETS ({body})"
    return cols, f"{kind} ({', '.join(cols)})"


@given(spec=grouping_spec())
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_grouping_sets_agree(spark, spark_orders, duck, spec):
    cols, clause = spec
    sel = ", ".join(cols)
    gflags = ", ".join(f"grouping({c})" for c in cols)
    # Fold each output row (keys, grouping flags, measures) into one
    # md5-derived integer and sum — order-insensitive, NULL-sensitive.
    inner = (
        f"SELECT {sel}, {gflags},"
        " count(*) AS n,"
        " sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents"
        f" FROM orders GROUP BY {clause}"
    )
    row_key = " || '|' || ".join(
        f"coalesce(CAST(col{i} AS VARCHAR), '<null>')"
        for i in range(2 * len(cols) + 2)
    )
    aliased = ", ".join(
        f"c{i} AS col{i}" for i in range(2 * len(cols) + 2)
    )
    # normalize column names positionally on both engines
    renames = ", ".join(
        [f"{c} AS c{i}" for i, c in enumerate(cols)]
        + [f"grouping({c}) AS c{len(cols) + i}" for i, c in enumerate(cols)]
        + [f"count(*) AS c{2 * len(cols)}",
           f"sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS c{2 * len(cols) + 1}"]
    )
    sql = (
        "SELECT count(*) AS n_rows,"
        " coalesce(sum(CAST('0x' || substr(md5(k), 1, 12) AS BIGINT)), 0)"
        "   AS checksum"
        " FROM ("
        f"  SELECT {row_key} AS k FROM ("
        f"    SELECT {aliased} FROM ("
        f"      SELECT {renames} FROM orders GROUP BY {clause}"
        "     ) t0"
        "   ) t1"
        " ) t2"
    )
    # Spark: CAST('0x...' AS BIGINT) is NULL (no hex-literal cast);
    # use conv() there and the 0x form in DuckDB — same 48-bit value.
    spark_sql = sql.replace(
        "CAST('0x' || substr(md5(k), 1, 12) AS BIGINT)",
        "CAST(conv(substr(md5(k), 1, 12), 16, 10) AS BIGINT)",
    ).replace("AS VARCHAR)", "AS STRING)")  # Spark requires a length on VARCHAR
    s = spark.sql(spark_sql).first()
    d = duck.execute(sql).fetchone()
    assert (s["n_rows"], s["checksum"]) == (int(d[0]), int(d[1])), sql
