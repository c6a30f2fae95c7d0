"""Property-based differential tests for the statistical-inference
operators: the SHIPPED Spark construction (dictionary-trick KS, e6
G-test flooring, integer Pearson sufficient statistics) evaluated on
Hypothesis-generated data and compared against an independent
brute-force Python reference.

The oracle gate already proves Spark == DuckDB on the fixtures; this
proves both are computing the intended STATISTIC on arbitrary inputs —
a shared misconstruction (same wrong formula on both engines) would
pass the oracle gate but fail here.
"""

from __future__ import annotations

import pytest

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gotsdb_spark.operators.inference import ks_dnum_by_group

_SETTINGS = dict(
    max_examples=12,  # each example runs real Spark jobs
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _ks_reference(a: list[int], b: list[int]) -> int:
    """Brute-force exact KS numerator max|cdf_a*n_b - cdf_b*n_a|."""
    na, nb = len(a), len(b)
    best = 0
    for v in sorted(set(a) | set(b)):
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        best = max(best, abs(ca * nb - cb * na))
    return best


@settings(**_SETTINGS)
@given(
    a=st.lists(st.integers(0, 30), min_size=1, max_size=40),
    b=st.lists(st.integers(0, 30), min_size=1, max_size=40),
)
@pytest.mark.slow
def test_ks_matches_bruteforce(spark, a, b):
    pts = spark.createDataFrame(
        [("A", v) for v in a] + [("B", v) for v in b], "prio string, v long"
    )
    rows = {r["prio"]: r for r in ks_dnum_by_group(pts).collect()}
    ref = _ks_reference(a, b)
    for prio, mine, other in (("A", a, b), ("B", b, a)):
        r = rows[prio]
        assert r["n_in"] == len(mine) and r["n_out"] == len(other)
        # group-vs-complement of a 2-group frame IS the two-sample KS,
        # and it is symmetric
        assert r["d_num"] == ref
        assert r["d_e6"] == ref * 1_000_000 // (len(a) * len(b))


def _g_reference(pairs: list[tuple[str, str]]) -> tuple[int, int]:
    """(g_e6, n) with the query's own per-cell flooring convention."""
    n = len(pairs)
    cells = Counter(pairs)
    rows = Counter(x for x, _ in pairs)
    cols = Counter(y for _, y in pairs)
    g = 0
    for (x, y), o in cells.items():
        g += math.floor(
            2.0 * o * math.log((o * 1.0 * n) / (rows[x] * 1.0 * cols[y])) * 1e6
            + 0.5001
        )
    return g, n


@settings(**_SETTINGS)
@given(
    pairs=st.lists(
        st.tuples(st.sampled_from("pqr"), st.sampled_from("xyz")),
        min_size=2,
        max_size=60,
    )
)
@pytest.mark.slow
def test_gtest_matches_bruteforce(spark, pairs):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    df = spark.createDataFrame(pairs, "a string, b string")
    cells = df.groupBy("a", "b").agg(F.count("*").alias("o"))
    marg = cells.select(
        "o",
        F.sum("o").over(W.partitionBy("a")).alias("r"),
        F.sum("o").over(W.partitionBy("b")).alias("c"),
        F.sum("o").over(W.partitionBy()).alias("n"),
    )
    got = (
        marg.select(
            F.floor(
                2.0
                * F.col("o")
                * F.log((F.col("o") * 1.0 * F.col("n")) / (F.col("r") * 1.0 * F.col("c")))
                * 1e6
                + 0.5001
            )
            .cast("bigint")
            .alias("cell")
        )
        .agg(F.sum("cell"))
        .collect()[0][0]
    )
    ref_g, _ = _g_reference(pairs)
    # JVM ln vs libm ln can floor one ulp apart per cell; cells ≤ 9
    assert abs(got - ref_g) <= 9


def _pearson_e6_reference(xy: list[tuple[int, int]]) -> int | None:
    n = len(xy)
    sx = sum(x for x, _ in xy)
    sy = sum(y for _, y in xy)
    sxy = sum(x * y for x, y in xy)
    sxx = sum(x * x for x, _ in xy)
    syy = sum(y * y for _, y in xy)
    num = n * sxy - sx * sy
    denx, deny = n * sxx - sx * sx, n * syy - sy * sy
    if denx == 0 or deny == 0:
        return None
    return math.floor(num / math.sqrt(denx * deny) * 1e6 + 0.5001)


@settings(**_SETTINGS)
@given(
    xy=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)), min_size=3, max_size=50
    )
)
def test_pearson_suffstats_match_bruteforce(spark, xy):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(xy, "x long, y long")
    s = df.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).collect()[0]
    num = s["n"] * s["sxy"] - s["sx"] * s["sy"]
    denx = s["n"] * s["sxx"] - s["sx"] * s["sx"]
    deny = s["n"] * s["syy"] - s["sy"] * s["sy"]
    ref = _pearson_e6_reference(xy)
    if ref is None:
        assert denx == 0 or deny == 0
        return
    got = math.floor(num / math.sqrt(denx * deny) * 1e6 + 0.5001)
    assert got == ref
    assert num * num <= denx * deny  # Cauchy–Schwarz on exact integers
