"""Round-11 fourth-window operator tests: independent Python reference
implementations for the new registered queries (the DuckDB hash gate
is the primary check; these pin semantics against a second, non-SQL
implementation — the round-7 convention)."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from gotsdb_spark.operators.registry import QUERIES
from gotsdb_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero (Spark DIV, DuckDB //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _daily_means(spark):
    agg = defaultdict(lambda: [0, 0])
    for r in (
        load_table(spark, "events", SF)
        .select(
            "event_type",
            F.datediff(F.col("ts").cast("date"),
                       F.lit("2025-01-01").cast("date")).alias("day"),
            F.floor(F.col("value") * 1000).cast("bigint").alias("v"),
        )
        .collect()
    ):
        a = agg[(r["event_type"], r["day"])]
        a[0] += r["v"]
        a[1] += 1
    series = defaultdict(dict)
    for (et, d), (s, c) in agg.items():
        series[et][d] = tdiv(s, c)
    return series


def _orders_daily(spark):
    daily = defaultdict(int)
    for r in (
        load_table(spark, "orders", SF)
        .select(
            F.datediff("o_orderdate", F.lit("2025-01-01").cast("date"))
            .alias("x"),
            F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        )
        .collect()
    ):
        daily[r["x"]] += r["c"]
    return daily


# ------------------------------------------------------- Durbin-Watson


def test_durbin_watson_matches_python_reference(spark):
    daily = _orders_daily(spark)
    xs = sorted(daily)
    n = len(xs)
    sx = sum(xs)
    sy = sum(daily.values())
    sxx = sum(x * x for x in xs)
    sxy = sum(x * daily[x] for x in xs)
    d = n * sxx - sx * sx
    b = n * sxy - sx * sy
    q = tdiv(n * d, 100)
    r = [
        tdiv(n * d * daily[x] - d * sy - b * (n * x - sx), q) for x in xs
    ]
    num = sum((r[i] - r[i - 1]) ** 2 for i in range(1, n))
    den = sum(v * v for v in r)
    got = QUERIES["stats_durbin_watson"](spark, SF).collect()[0]
    assert got["n_days"] == n
    assert got["dw_e6"] == tdiv(num * 10**6, den)
    # residuals of a fitted line should not be wildly autocorrelated
    # in either direction: DW must land strictly inside (0, 4)
    assert 0 < got["dw_e6"] < 4_000_000


# ------------------------------------------------------ turning points


def test_turning_points_matches_python_reference(spark):
    series = _daily_means(spark)
    got = {
        r["event_type"]: r
        for r in QUERIES["stats_turning_points_test"](spark, SF).collect()
    }
    assert set(got) == set(series)
    for et, days in series.items():
        ys = [days[d] for d in sorted(days)]
        n = len(ys)
        peaks = sum(
            1
            for i in range(1, n - 1)
            if ys[i - 1] < ys[i] and ys[i + 1] < ys[i]
        )
        troughs = sum(
            1
            for i in range(1, n - 1)
            if ys[i - 1] > ys[i] and ys[i + 1] > ys[i]
        )
        t = peaks + troughs
        r = got[et]
        assert r["n_days"] == n
        assert r["peaks"] == peaks and r["troughs"] == troughs
        assert r["turning_points"] == t
        assert r["expected_e6"] == tdiv(2 * (n - 2) * 10**6, 3)
        num = 3 * t - 2 * (n - 2)
        sign = 1 if num >= 0 else -1
        assert r["z2_signed_e6"] == tdiv(
            sign * num * num * 10 * 10**6, 9 * (16 * n - 29)
        )


# -------------------------------------------------------- Mann-Kendall


def test_mann_kendall_matches_python_reference(spark):
    series = _daily_means(spark)
    got = {
        r["event_type"]: r
        for r in QUERIES["stats_mann_kendall_trend"](spark, SF).collect()
    }
    for et, days in series.items():
        ys = [days[d] for d in sorted(days)]
        n = len(ys)
        s = 0
        for i in range(n):
            for j in range(i + 1, n):
                s += (ys[j] > ys[i]) - (ys[j] < ys[i])
        tie_counts = defaultdict(int)
        for y in ys:
            tie_counts[y] += 1
        tie_term = sum(
            t * (t - 1) * (2 * t + 5) for t in tie_counts.values() if t > 1
        )
        var_den = n * (n - 1) * (2 * n + 5) - tie_term
        r = got[et]
        assert r["n_days"] == n
        assert r["kendall_s"] == s
        assert r["var_s"] == tdiv(var_den, 18)
        sign = 1 if s >= 0 else -1
        assert r["z2_signed_e6"] == tdiv(sign * s * s * 18 * 10**6, var_den)


# --------------------------------------------------------- eccentricity


def test_eccentricity_matches_python_reference(spark):
    # rebuild the sparsified (top-3-partner) symmetric edge set
    o2c = {
        r["o_orderkey"]: r["o_custkey"]
        for r in load_table(spark, "orders", SF)
        .select("o_orderkey", "o_custkey")
        .collect()
    }
    c2n = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load_table(spark, "customer", SF)
        .select("c_custkey", "c_nationkey")
        .collect()
    }
    s2n = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in load_table(spark, "supplier", SF)
        .select("s_suppkey", "s_nationkey")
        .collect()
    }
    flows = defaultdict(int)
    for r in (
        load_table(spark, "lineitem", SF)
        .select("l_orderkey", "l_suppkey")
        .collect()
    ):
        src = c2n[o2c[r["l_orderkey"]]]
        dst = s2n[r["l_suppkey"]]
        if src != dst:
            flows[(src, dst)] += 1
    per_src = defaultdict(list)
    for (s, d), w in flows.items():
        per_src[s].append((-w, d))
    adj = defaultdict(set)
    for s, lst in per_src.items():
        for _, d in sorted(lst)[:3]:
            adj[min(s, d)].add(max(s, d))
    sym = defaultdict(set)
    for a, bs in adj.items():
        for b in bs:
            sym[a].add(b)
            sym[b].add(a)
    names = {
        r["n_nationkey"]: r["n_name"]
        for r in load_table(spark, "nation", SF).collect()
    }
    ecc = {}
    reach_n = {}
    for s in names:
        dist = {s: 0}
        frontier = [s]
        for lvl in range(1, 7):
            nxt = []
            for v in frontier:
                for u in sym.get(v, ()):
                    if u not in dist:
                        dist[u] = lvl
                        nxt.append(u)
            frontier = nxt
        ecc[s] = max(dist.values())
        reach_n[s] = len(dist)
    radius = min(ecc.values())
    diameter = max(ecc.values())
    got = {
        r["n_name"]: r
        for r in QUERIES["graph_eccentricity_nations"](spark, SF).collect()
    }
    assert set(got) == set(names.values())
    for s, e in ecc.items():
        r = got[names[s]]
        assert r["eccentricity"] == e
        assert r["n_reachable"] == reach_n[s]
        assert r["radius"] == radius and r["diameter"] == diameter
        assert r["is_center"] == (1 if e == radius else 0)
        assert r["is_peripheral"] == (1 if e == diameter else 0)


# ------------------------------------------------------ join fan-out


def test_join_fanout_matches_python_reference(spark):
    fo = defaultdict(int)
    for r in load_table(spark, "orders", SF).select("o_orderkey").collect():
        fo[r["o_orderkey"]] = 0
    for r in load_table(spark, "lineitem", SF).select("l_orderkey").collect():
        fo[r["l_orderkey"]] += 1
    hist = defaultdict(int)
    for f in fo.values():
        hist[f] += 1
    total_orders = sum(hist.values())
    total_rows = sum(f * n for f, n in hist.items())
    got = {r["fanout"]: r
           for r in QUERIES["quality_join_fanout_audit"](spark, SF).collect()}
    assert set(got) == set(hist)
    for f, n in hist.items():
        r = got[f]
        assert r["n_orders"] == n
        assert r["join_rows"] == f * n
        assert r["orders_share_e6"] == tdiv(n * 10**6, total_orders)
        assert r["rows_share_e6"] == tdiv(f * n * 10**6, total_rows)
    # the exact join cardinality the histogram implies must equal the
    # actual lineitem row count (every lineitem has exactly one order)
    assert total_rows == sum(
        1 for _ in load_table(spark, "lineitem", SF)
        .select("l_orderkey").collect()
    )
