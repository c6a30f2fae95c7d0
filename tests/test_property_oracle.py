"""Differential predicate fuzzing: random filter expressions evaluated
by Spark and DuckDB over the same parquet must select identical rows.

This generalizes the per-query oracle gate: instead of fixed queries,
Hypothesis composes random AND/OR trees of comparisons over lineitem's
numeric/string/timestamp columns (a dialect-neutral subset) and
compares matching row counts plus an order-insensitive key checksum.
"""

import pytest
import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"
PARQUET = f"{SF}/lineitem.parquet"

# (column, literal strategy rendered to SQL)
_NUM_COLS = {
    "l_quantity": st.integers(1, 50),
    "l_extendedprice": st.integers(1000, 90000),
    "l_discount": st.sampled_from([0.01, 0.03, 0.05, 0.07, 0.09]),
    "l_orderkey": st.integers(0, 6000),
    "l_linenumber": st.integers(1, 7),
}
_STR_COLS = {
    "l_returnflag": st.sampled_from(["A", "N", "R"]),
    "l_linestatus": st.sampled_from(["O", "F"]),
}
_OPS = st.sampled_from(["<", "<=", ">", ">=", "=", "<>"])


@st.composite
def comparison(draw):
    if draw(st.booleans()):
        col = draw(st.sampled_from(sorted(_NUM_COLS)))
        lit = draw(_NUM_COLS[col])
        return f"({col} {draw(_OPS)} {lit})"
    col = draw(st.sampled_from(sorted(_STR_COLS)))
    lit = draw(_STR_COLS[col])
    return f"({col} {draw(_OPS)} '{lit}')"


@st.composite
def predicate(draw, depth=2):
    if depth == 0 or draw(st.integers(0, 2)) == 0:
        return draw(comparison())
    left = draw(predicate(depth=depth - 1))
    right = draw(predicate(depth=depth - 1))
    conj = draw(st.sampled_from(["AND", "OR"]))
    neg = "NOT " if draw(st.booleans()) else ""
    return f"{neg}({left} {conj} {right})"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{PARQUET}')")
    return con


@pytest.fixture(scope="module")
def spark_lineitem(spark):
    from gotsdb_spark.sources.registry import load_table

    df = load_table(spark, "lineitem", SF)
    df.createOrReplaceTempView("lineitem")
    return df


@given(pred=predicate())
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_predicates_agree(spark, spark_lineitem, duck, pred):
    sql = (
        "SELECT count(*) AS n, "
        "coalesce(sum(l_orderkey * 7 + l_linenumber), 0) AS checksum "
        f"FROM lineitem WHERE {pred}"
    )
    s = spark.sql(sql).first()
    d = duck.execute(sql).fetchone()
    assert (s["n"], s["checksum"]) == (d[0], d[1]), pred


_AGG_EXPRS = st.sampled_from(
    [
        "count(*)",
        "sum(l_quantity)",
        "min(l_extendedprice)",
        "max(l_discount)",
        "count(DISTINCT l_partkey)",
        "sum(l_extendedprice * (1 - l_discount))",
    ]
)
_GROUP_COLS = st.sampled_from(["l_returnflag", "l_linestatus", "l_linenumber"])


@given(agg=_AGG_EXPRS, group=_GROUP_COLS, pred=predicate(depth=1))
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_aggregations_agree(spark, spark_lineitem, duck, agg, group, pred):
    sql = (
        f"SELECT {group} AS g, {agg} AS m FROM lineitem "
        f"WHERE {pred} GROUP BY {group}"
    )
    s = {r["g"]: r["m"] for r in spark.sql(sql).collect()}
    d = dict(duck.execute(sql).fetchall())
    assert set(s) == set(d), (agg, group, pred)
    for k in s:
        sv, dv = s[k], d[k]
        if isinstance(sv, float):
            assert abs(sv - float(dv)) < 1e-6 * max(1.0, abs(sv)), (k, sv, dv, sql)
        else:
            assert sv == dv, (k, sv, dv, sql)


# Window-function fuzzing. Ordering is made total by suffixing the
# discriminating columns (the fixture contains full-duplicate
# (l_orderkey, l_linenumber) rows at larger SFs — a tie there swaps
# window values between engines; with a total order, or full-duplicate
# rows whose contributions are symmetric, the checksum is invariant).
_WIN_FNS = st.sampled_from(
    [
        "row_number()",
        "rank()",
        "dense_rank()",
        "ntile(4)",
        "lag(l_linenumber, 1, 0)",
        "sum(l_linenumber)",
        "count(*)",
    ]
)
_WIN_PART = st.sampled_from(["l_returnflag", "l_linestatus", "l_suppkey % 10"])
_WIN_ORDER = st.sampled_from(["l_shipdate", "l_extendedprice", "l_quantity"])
_TOTAL_SUFFIX = "l_orderkey, l_linenumber, l_extendedprice, l_discount, l_partkey"


@given(fn=_WIN_FNS, part=_WIN_PART, order=_WIN_ORDER)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_window_functions_agree(spark, spark_lineitem, duck, fn, part, order):
    frame = (
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        if fn.startswith(("sum", "count"))
        else ""
    )
    sql = (
        "WITH t AS (SELECT l_orderkey, l_linenumber, "
        f"{fn} OVER (PARTITION BY {part} "
        f"ORDER BY {order}, {_TOTAL_SUFFIX} {frame}) AS wv "
        "FROM lineitem) "
        "SELECT count(*) AS n, "
        "CAST(sum(wv * ((l_orderkey * 7 + l_linenumber) % 1000003)) AS BIGINT)"
        " AS checksum FROM t"
    )
    s = spark.sql(sql).first()
    d = duck.execute(sql).fetchone()
    assert (s["n"], s["checksum"]) == (d[0], int(d[1])), sql


# ---------------------------------------------------------------------------
# Differential JOIN fuzzing: random join type × random residual
# predicate over orders ⋈ customer must produce identical row counts
# and key checksums in both engines (NULL-extension rows included).
# ---------------------------------------------------------------------------

_JOIN_TYPES = st.sampled_from(["INNER", "LEFT", "RIGHT", "FULL"])
_CUST_PRED = st.sampled_from(
    [
        "c_acctbal > 0",
        "c_acctbal <= 5000",
        "c_mktsegment = 'BUILDING'",
        "c_mktsegment <> 'MACHINERY'",
        "c_nationkey < 13",
    ]
)
_ORD_PRED = st.sampled_from(
    [
        "o_totalprice > 50000",
        "o_orderstatus = 'O'",
        "o_orderpriority < '3'",
        "o_custkey % 3 = 0",
    ]
)


@pytest.fixture(scope="module")
def duck_join():
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def spark_join_views(spark):
    from gotsdb_spark.sources.registry import load_table

    load_table(spark, "orders", SF).createOrReplaceTempView("orders")
    load_table(spark, "customer", SF).createOrReplaceTempView("customer")


@given(jt=_JOIN_TYPES, cp=_CUST_PRED, op=_ORD_PRED)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_joins_agree(spark, spark_join_views, duck_join, jt, cp, op):
    sql = (
        "SELECT count(*) AS n, "
        "coalesce(sum(coalesce(o_orderkey, -1) * 13"
        " + coalesce(c_custkey, -7)), 0) AS checksum "
        f"FROM (SELECT * FROM orders WHERE {op}) o "
        f"{jt} JOIN (SELECT * FROM customer WHERE {cp}) c "
        "ON o.o_custkey = c.c_custkey"
    )
    got = spark.sql(sql).collect()[0]
    want = duck_join.execute(sql).fetchone()
    assert (got["n"], got["checksum"]) == (want[0], want[1]), sql


_SET_OPS = st.sampled_from(
    ["UNION", "UNION ALL", "INTERSECT", "EXCEPT", "EXCEPT ALL", "INTERSECT ALL"]
)


@given(p1=predicate(depth=1), p2=predicate(depth=1), op=_SET_OPS)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_random_set_ops_agree(spark, spark_lineitem, duck, p1, p2, op):
    """Set operations fuzz: the DATAFRAME set-op API (union/intersect/
    exceptAll and their distinct variants) over two random predicate
    subsets must equal DuckDB evaluating the same set-op in SQL —
    including multiset (ALL) semantics, which count duplicates."""
    from pyspark.sql import functions as F

    keys = ["l_orderkey", "l_linenumber"]
    a = spark_lineitem.where(p1).select(*keys)
    b = spark_lineitem.where(p2).select(*keys)
    sdf = {
        "UNION": lambda: a.union(b).distinct(),
        "UNION ALL": lambda: a.union(b),
        "INTERSECT": lambda: a.intersect(b),
        "INTERSECT ALL": lambda: a.intersectAll(b),
        # SQL EXCEPT = distinct rows of a absent from b
        "EXCEPT": lambda: a.distinct().join(b, keys, "left_anti"),
        "EXCEPT ALL": lambda: a.exceptAll(b),
    }[op]()
    s = sdf.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.col("l_orderkey") * 7 + F.col("l_linenumber")), F.lit(0)).alias(
            "checksum"
        ),
    ).first()
    sql = (
        "SELECT count(*) AS n, "
        "coalesce(sum(l_orderkey * 7 + l_linenumber), 0) AS checksum FROM ("
        f"SELECT l_orderkey, l_linenumber FROM lineitem WHERE {p1} "
        f"{op} "
        f"SELECT l_orderkey, l_linenumber FROM lineitem WHERE {p2})"
    )
    d = duck.execute(sql).fetchone()
    assert (s["n"], s["checksum"]) == (d[0], d[1]), f"{op}: {p1} / {p2}"


@st.composite
def scalar_expr(draw):
    """A dialect-neutral scalar expression over lineitem columns.

    Restricted to constructs with identical semantics in Spark SQL and
    DuckDB: 1-based substr with positive args, upper/lower/length,
    || concatenation, integer arithmetic, year/month/day extraction.
    """
    kind = draw(st.integers(0, 4))
    if kind == 0:
        start = draw(st.integers(1, 3))
        n = draw(st.integers(1, 5))
        return (
            "substr(l_returnflag || l_linestatus || "
            f"CAST(l_orderkey AS STRING), {start}, {n})"
        )
    if kind == 1:
        f = draw(st.sampled_from(["upper", "lower"]))
        return f"{f}(l_returnflag || l_linestatus)"
    if kind == 2:
        # integer-backed string: double→string formatting is not
        # dialect-neutral, but bigint→string is
        return "length(CAST(l_partkey AS STRING))"
    if kind == 3:
        a = draw(st.integers(2, 9))
        b = draw(st.integers(1, 99))
        return f"(l_orderkey * {a} + l_linenumber * {b}) % 1000"
    part = draw(st.sampled_from(["year", "month", "day"]))
    return f"{part}(l_shipdate)"


@given(expr=scalar_expr(), pred=predicate(depth=1))
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_scalar_functions_agree(spark, spark_lineitem, duck, expr, pred):
    """Scalar-function fuzz: random dialect-neutral expressions must
    produce identical value multisets (compared as sorted strings) in
    Spark and DuckDB over the same filtered rows."""
    sql = (
        f"SELECT CAST({expr} AS STRING) AS v FROM lineitem "
        f"WHERE {pred} ORDER BY v LIMIT 500"
    )
    s = [r["v"] for r in spark.sql(sql).collect()]
    d = [
        str(row[0]) if row[0] is not None else None
        for row in duck.execute(
            sql.replace("AS STRING", "AS VARCHAR")
        ).fetchall()
    ]
    assert s == d, f"{expr} WHERE {pred}"
