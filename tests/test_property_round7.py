"""Property-based differential testing of the round-7 dictionary-
quantile and skyline machinery.

The fixture-backed reference tests (test_round7_ops.py) pin one data
shape; these fuzz the boundary algebra — tie-heavy value dictionaries,
single-element groups, all-equal columns — where an off-by-one in the
cc·k ≥ q·n order-statistic rule or the strict/non-strict dominance
split would hide. Operators are exercised through their registered
query functions with `load_table` patched to serve synthetic frames
(the heavy_hitters_spacesaving test convention)."""

from __future__ import annotations

import pytest

from contextlib import contextmanager

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"  # ignored by the patched loader


@contextmanager
def _patched(module, frame_by_table):
    orig = module.load_table

    def fake(spark_, name, sf_dir):
        return frame_by_table[name]

    module.load_table = fake
    try:
        yield
    finally:
        module.load_table = orig


# Tie-heavy price grids: few distinct cents values, 1..2 groups.
winsor_rows = st.lists(
    st.tuples(
        st.sampled_from(["A", "B"]),
        st.integers(min_value=0, max_value=12),  # cents/100 — heavy ties
    ),
    min_size=1,
    max_size=120,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=winsor_rows)
@pytest.mark.slow
def test_winsorized_mean_fuzz(spark, rows):
    import gotsdb_spark.operators.statistics as mod

    df = spark.createDataFrame(
        [(f, float(c)) for f, c in rows], "l_returnflag string, l_extendedprice double"
    )
    with _patched(mod, {"lineitem": df}):
        got = {
            r["flag"]: r
            for r in mod.stats_winsorized_mean(spark, SF).collect()
        }
    by_flag: dict = {}
    for f, c in rows:
        by_flag.setdefault(f, []).append(int(c * 100))
    assert set(got) == set(by_flag)
    for f, vals in by_flag.items():
        vals.sort()
        n = len(vals)
        lo = vals[(n + 19) // 20 - 1]
        hi = vals[(19 * n + 19) // 20 - 1]
        clamped = [min(max(v, lo), hi) for v in vals]
        row = got[f]
        assert row["n_rows"] == n
        assert (row["lo_cents"], row["hi_cents"]) == (lo, hi)
        assert row["winsorized_mean_cents"] == sum(clamped) // n
        assert row["n_clamped"] == sum(1 for v in vals if v < lo or v > hi)


skyline_rows = st.lists(
    st.tuples(
        st.sampled_from(["B1", "B2"]),
        st.integers(min_value=0, max_value=8),  # price — heavy ties
        st.integers(min_value=0, max_value=8),  # size — heavy ties
    ),
    min_size=1,
    max_size=120,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=skyline_rows)
def test_skyline_fuzz(spark, rows):
    import gotsdb_spark.operators.relational as mod

    df = spark.createDataFrame(
        [(b, float(p), s) for b, p, s in rows],
        "p_brand string, p_retailprice double, p_size int",
    )
    with _patched(mod, {"part": df}):
        got = {
            (r["p_brand"], r["price_cents"], r["best_size"], r["n_parts"])
            for r in mod.skyline_price_size_frontier(spark, SF).collect()
        }
    # quadratic truth over the dictionary
    by_brand: dict = {}
    for b, p, s in rows:
        by_brand.setdefault(b, []).append((int(p * 100), s))
    want = set()
    for b, xs in by_brand.items():
        dic: dict = {}
        for pc, sz in xs:
            best, n = dic.get(pc, (-1, 0))
            dic[pc] = (max(best, sz), n + 1)
        for pc, (sz, n) in dic.items():
            dominated = any(
                pc2 <= pc and sz2 >= sz and (pc2 < pc or sz2 > sz)
                for pc2, (sz2, _) in dic.items()
            )
            if not dominated:
                want.add((b, pc, sz, n))
    assert got == want


# Tie-heavy value dictionaries for the shared decile-edge helper
# (factored out of quality_snapshot_psi / stats_information_gain in
# round 8 — the verdict asked for the fuzzer to hit it directly).
decile_rows = st.lists(
    st.integers(min_value=0, max_value=15), min_size=1, max_size=200
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=decile_rows)
@pytest.mark.slow
def test_dictionary_decile_edges_fuzz(spark, vals):
    """Edges must equal the smallest value with cc·10 ≥ k·n (exact
    integer rule) and decile_bin_col must reproduce searchsorted-style
    binning — checked against a direct Python recomputation over
    tie-heavy grids, including the all-equal dictionary (all nine
    edges collapse to the single value, every row lands in bin 1)."""
    from pyspark.sql import functions as F

    from gotsdb_spark.operators.distrank import (
        decile_bin_col,
        dictionary_decile_edges,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v int")
    dic = df.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    tot = df.agg(F.count(F.lit(1)).cast("long").alias("n"))
    edges_row = dictionary_decile_edges(dic, "v", "c", tot, "n").collect()[0]

    svals = sorted(vals)
    n = len(svals)
    want_edges = {}
    for k in range(1, 10):
        # smallest value whose cumulative count cc satisfies cc*10 >= k*n
        cc = 0
        pick = None
        for v in sorted(set(svals)):
            cc += svals.count(v)
            if cc * 10 >= k * n:
                pick = v
                break
        want_edges[f"e{k}"] = pick
    for k in range(1, 10):
        assert edges_row[f"e{k}"] == want_edges[f"e{k}"], (k, vals)

    binned = (
        df.crossJoin(F.broadcast(spark.createDataFrame([edges_row])))
        .select("v", decile_bin_col("v").alias("bin"))
        .collect()
    )
    for r in binned:
        want_bin = 1 + sum(
            1 for k in range(1, 10) if r["v"] > want_edges[f"e{k}"]
        )
        assert r["bin"] == want_bin, (r["v"], vals)
