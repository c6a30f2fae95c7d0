"""Round-11 third-window operator tests: independent Python reference
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


def _flows(spark):
    """Directed weighted nation flows {(src, dst): w} (Q7 shape)."""
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
        flows[(c2n[o2c[r["l_orderkey"]]], s2n[r["l_suppkey"]])] += 1
    return flows


def _backbone(spark):
    """Top-decile undirected weighted edges [(a, b, w)] (shared helper
    semantics: ties broken by (a, b), ceil(ne/10) kept)."""
    flows = _flows(spark)
    ue = defaultdict(int)
    for (s, d), w in flows.items():
        if s != d:
            ue[(min(s, d), max(s, d))] += w
    keep = sorted(ue.items(), key=lambda kv: (-kv[1], kv[0]))[
        : math.ceil(len(ue) / 10.0)
    ]
    return [(a, b, w) for (a, b), w in keep]


# --------------------------------------------- personalized PageRank


def test_personalized_pagerank_matches_python_reference(spark):
    flows = _flows(spark)
    nat = load_table(spark, "nation", SF).collect()
    names = {r["n_nationkey"]: r["n_name"] for r in nat}
    seeds = {r["n_nationkey"] for r in nat if r["n_regionkey"] == 2}
    out_w = defaultdict(int)
    for (s, d), w in flows.items():
        out_w[s] += w
    restart = {v: 1.0 / len(seeds) for v in seeds}
    pr = dict(restart)
    for _ in range(3):
        contrib = defaultdict(float)
        for (s, d), w in flows.items():
            if s in pr:
                contrib[d] += pr[s] * (w / out_w[s])
        pr = {
            v: math.floor(
                (0.15 * restart.get(v, 0.0) + 0.85 * contrib.get(v, 0.0))
                * 1e9
                + 0.5
            )
            / 1e9
            for v in names
        }
    expect = {names[v]: p for v, p in pr.items() if p > 0}
    got = {
        r["n_name"]: r["pr"]
        for r in QUERIES["graph_personalized_pagerank"](spark, SF).collect()
    }
    assert got == expect
    # seeded restart must concentrate mass relative to the uniform
    # teleport: every seed nation keeps nonzero rank
    assert {names[v] for v in seeds} <= set(got)


# ------------------------------------------ local clustering coefficient


def test_local_clustering_matches_python_reference(spark):
    edges = {(a, b) for a, b, _ in _backbone(spark)}
    names = {
        r["n_nationkey"]: r["n_name"]
        for r in load_table(spark, "nation", SF).collect()
    }
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    tri_at = defaultdict(int)
    es = sorted(edges)
    for a, b in es:
        for c in range(b + 1, 26):
            if (b, c) in edges and (a, c) in edges:
                for v in (a, b, c):
                    tri_at[v] += 1
    got = {
        r["n_name"]: r
        for r in QUERIES["graph_local_clustering"](spark, SF).collect()
    }
    assert set(got) == {names[v] for v in deg}
    for v, k in deg.items():
        r = got[names[v]]
        assert r["degree"] == k
        assert r["triangles"] == tri_at.get(v, 0)
        if k < 2:
            assert r["lcc_e6"] is None
        else:
            assert r["lcc_e6"] == tdiv(
                2 * tri_at.get(v, 0) * 10**6, k * (k - 1)
            )


# --------------------------------------------------- Page-Hinkley drift


def _daily(spark, mean=True):
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
        series[et][d] = tdiv(s, c) if mean else s
    return series


def test_page_hinkley_matches_python_reference(spark):
    series = _daily(spark, mean=True)
    got = {
        r["event_type"]: r
        for r in QUERIES["ts_page_hinkley_drift"](spark, SF).collect()
    }
    assert set(got) == set(series)
    for et, days in series.items():
        ordered = sorted(days.items())
        n = len(ordered)
        s = sum(y for _, y in ordered)
        best = None
        prefix = 0
        mn = None
        for t, (d, y) in enumerate(ordered, start=1):
            prefix += y
            ph = n * prefix - t * (s + n * 10)
            mn = ph if mn is None else min(mn, ph)
            stat = ph - mn
            if best is None or stat > best[1]:
                best = (d, stat)
        r = got[et]
        assert r["n_days"] == n
        assert r["alarm_day"] == best[0]
        assert r["ph_stat_scaled"] == best[1]


# ------------------------------------------------------ dispersion VMR


def test_dispersion_vmr_matches_python_reference(spark):
    cnt = defaultdict(int)
    for r in (
        load_table(spark, "events", SF)
        .select("event_type", F.col("ts").cast("date").alias("d"))
        .collect()
    ):
        cnt[(r["event_type"], r["d"])] += 1
    per = defaultdict(list)
    for (et, _), c in cnt.items():
        per[et].append(c)
    got = {
        r["event_type"]: r
        for r in QUERIES["stats_dispersion_vmr"](spark, SF).collect()
    }
    assert set(got) == set(per)
    for et, cs in per.items():
        n, s, ss = len(cs), sum(cs), sum(c * c for c in cs)
        r = got[et]
        assert r["n_days"] == n and r["total_events"] == s
        assert r["mean_e6"] == tdiv(s * 10**6, n)
        assert r["var_e6"] == tdiv((n * ss - s * s) * 10**6, n * (n - 1))
        assert r["vmr_e6"] == tdiv((n * ss - s * s) * 10**6, (n - 1) * s)


# -------------------------------------------------- Cook's distance


def test_cooks_distance_matches_python_reference(spark):
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
    xs = sorted(daily)
    n = len(xs)
    sx = sum(xs)
    sy = sum(daily.values())
    sxx = sum(x * x for x in xs)
    sxy = sum(x * daily[x] for x in xs)
    syy = sum(y * y for y in daily.values())
    d = n * sxx - sx * sx
    b = n * sxy - sx * sy
    sse_num = d * (n * syy - sy * sy) - b * b
    got = {r["day"]: r
           for r in QUERIES["stats_cooks_distance_days"](spark, SF).collect()}
    assert set(got) == set(xs)
    nd = float(n) * float(d)
    mse = float(sse_num) / (float(n) * float(d) * float(n - 2))
    for x in xs:
        enum = n * d * daily[x] - d * sy - b * (n * x - sx)
        e = float(enum) / nd
        h = 1.0 / float(n) + float((n * x - sx) ** 2) / nd
        r = got[x]
        assert r["revenue_cents"] == daily[x]
        assert r["resid_e2"] == math.floor(e * 1e2 + 0.5001)
        assert r["leverage_e9"] == math.floor(h * 1e9 + 0.5001)
        assert r["cooks_e9"] == math.floor(
            e * e * h / (2.0 * mse * (1.0 - h) * (1.0 - h)) * 1e9 + 0.5001
        )


# ----------------------------------------------------- seasonal strength


def test_seasonal_strength_matches_python_reference(spark):
    series = _daily(spark, mean=True)
    got = {
        r["event_type"]: r
        for r in QUERIES["ts_seasonal_strength"](spark, SF).collect()
    }
    for et, days in series.items():
        ordered = sorted(days)
        det = []
        for i in range(3, len(ordered) - 3):
            x = ordered[i]
            win = ordered[i - 3 : i + 4]
            # full 7-ROW frame (row-based, matches ROWS BETWEEN)
            tsum = sum(days[w] for w in win)
            det.append((((x % 7) + 7) % 7, 7 * days[x] - tsum))
        sidx = {}
        for dow in set(d for d, _ in det):
            vals = [v for d, v in det if d == dow]
            sidx[dow] = tdiv(sum(vals), len(vals))
        dvals = [v for _, v in det]
        rvals = [v - sidx[d] for d, v in det]
        nn = len(det)
        sd, sdd = sum(dvals), sum(v * v for v in dvals)
        sr, srr = sum(rvals), sum(v * v for v in rvals)
        den = nn * sdd - sd * sd
        r = got[et]
        assert r["n_days_used"] == nn
        if den == 0:
            assert r["resid_var_ratio_e6"] is None
        else:
            ratio = tdiv((nn * srr - sr * sr) * 10**6, den)
            assert r["resid_var_ratio_e6"] == ratio
            assert r["seasonal_strength_e6"] == max(0, 10**6 - ratio)


# ------------------------------------------------------ layout planner


def test_layout_planner_matches_python_reference(spark):
    cnt = defaultdict(int)
    for r in (
        load_table(spark, "events", SF)
        .select(F.col("ts").cast("date").alias("d"))
        .collect()
    ):
        cnt[r["d"]] += 1
    total = sum(cnt.values())
    n_days = len(cnt)
    got = {r["dt"]: r
           for r in QUERIES["scale_layout_planner"](spark, SF).collect()}
    assert set(got) == set(cnt)
    for d, n in cnt.items():
        r = got[d]
        assert r["n_rows"] == n
        assert r["files_recommended"] == (n + 100_000 - 1) // 100_000
        assert r["share_e6"] == tdiv(n * 10**6, total)
        assert r["skew_vs_mean_e6"] == tdiv(n * n_days * 10**6, total)
        assert r["is_hot"] == (1 if n * n_days > 2 * total else 0)
