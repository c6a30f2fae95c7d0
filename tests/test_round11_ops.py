"""Round-11 operator tests: independent Python reference
implementations for the new registered queries (the DuckDB hash gate
is the primary check; these pin semantics against a second, non-SQL
implementation — the round-7 convention)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from pyspark.sql import functions as F

from gotsdb_spark.operators.registry import QUERIES
from gotsdb_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


# ------------------------------------- reservoir-sampled group audit


def test_reservoir_group_audit_matches_python_reference(spark):
    rows = (
        load_table(spark, "events", SF)
        .select(
            "event_type",
            "event_id",
            F.floor(F.col("value") * 1000).cast("bigint").alias("v_e3"),
        )
        .collect()
    )
    by_type = defaultdict(list)
    for x in rows:
        hk = hashlib.md5(str(x["event_id"]).encode()).hexdigest()
        by_type[x["event_type"]].append((hk, x["event_id"], x["v_e3"]))
    got = {
        r["event_type"]: r
        for r in QUERIES["sample_reservoir_group_audit"](spark, SF).collect()
    }
    assert set(got) == set(by_type)
    for et, items in by_type.items():
        items.sort()
        n = len(items)
        k = min(64, n)
        sv = sum(v for _, _, v in items)
        ssv = sum(v for _, _, v in items[:k])
        exact = sv // n if sv >= 0 else -((-sv) // n)
        # Spark/DuckDB integer DIV truncates toward zero
        def tdiv(a, b):
            q = abs(a) // abs(b)
            return q if (a >= 0) == (b >= 0) else -q
        exact = tdiv(sv, n)
        est = tdiv(ssv, k)
        r = got[et]
        assert r["n"] == n and r["k_used"] == k
        assert r["exact_mean_e3"] == exact
        assert r["est_mean_e3"] == est
        assert r["err_e3"] == est - exact


# --------------------------------------------- alias-method sampler


def test_alias_table_matches_python_reference(spark):
    rows = (
        load_table(spark, "orders", SF)
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    w = {r["o_orderpriority"]: r["count"] for r in rows}
    n = len(w)
    assert n == 5
    wtot = sum(w.values())
    u = {pr: n * cnt for pr, cnt in w.items()}
    thr, al, done = {}, {}, set()
    for _ in range(n - 1):
        smalls = sorted(pr for pr in u if pr not in done and u[pr] < wtot)
        larges = sorted(pr for pr in u if pr not in done and u[pr] >= wtot)
        if not smalls:
            continue
        s, l = smalls[0], larges[0]
        thr[s], al[s] = u[s], l
        done.add(s)
        u[l] -= wtot - u[s]
    for pr in w:
        thr.setdefault(pr, wtot)
        al.setdefault(pr, pr)
    # conservation: every bucket's table mass equals its scaled weight
    mass = {pr: thr[pr] for pr in w}
    for pr in w:
        if al[pr] != pr:
            mass[al[pr]] += wtot - thr[pr]
    got = {
        r["priority"]: r
        for r in QUERIES["sample_alias_table_build"](spark, SF).collect()
    }
    assert set(got) == set(w)
    for pr in w:
        r = got[pr]
        assert r["w"] == w[pr]
        assert r["u0"] == n * w[pr]
        assert r["thr"] == thr[pr]
        assert r["alias_pr"] == al[pr]
        assert r["mass"] == mass[pr] == n * w[pr]
        assert r["mass_ok"]


# --------------------------------------- Girvan-Newman edge betweenness


def test_girvan_newman_matches_python_reference(spark):
    from collections import Counter

    li = load_table(spark, "lineitem", SF).select(
        "l_orderkey", "l_suppkey"
    ).collect()
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in load_table(spark, "orders", SF)
        .select("o_orderkey", "o_custkey")
        .collect()
    }
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load_table(spark, "customer", SF)
        .select("c_custkey", "c_nationkey")
        .collect()
    }
    supp = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in load_table(spark, "supplier", SF)
        .select("s_suppkey", "s_nationkey")
        .collect()
    }
    names = {
        r["n_nationkey"]: r["n_name"]
        for r in load_table(spark, "nation", SF)
        .select("n_nationkey", "n_name")
        .collect()
    }
    flows = Counter()
    for r in li:
        src = cust[orders[r["l_orderkey"]]]
        dst = supp[r["l_suppkey"]]
        if src != dst:
            flows[(src, dst)] += 1
    by_src = defaultdict(list)
    for (src, dst), w in flows.items():
        by_src[src].append((-w, dst))
    und = set()
    for src, lst in by_src.items():
        for _, dst in sorted(lst)[:3]:
            und.add((min(src, dst), max(src, dst)))
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    nodes = sorted(names)
    H = 6
    dist, sig = {}, {}
    for s in nodes:
        dist[(s, s)], sig[(s, s)] = 0, 1
        frontier = {s: 1}
        for lvl in range(1, H + 1):
            nxt = Counter()
            for v, k in frontier.items():
                for nb in adj[v]:
                    nxt[nb] += k
            frontier = {}
            for v, k in nxt.items():
                if (s, v) not in dist:
                    dist[(s, v)], sig[(s, v)] = lvl, k
                    frontier[v] = k
    ebc = Counter()
    for a, b in und:
        for (u, v) in ((a, b), (b, a)):
            for s in nodes:
                if (s, u) not in dist:
                    continue
                for t in nodes:
                    if t <= s:
                        continue
                    if (v, t) not in dist or (s, t) not in dist:
                        continue
                    if dist[(s, u)] + 1 + dist[(v, t)] == dist[(s, t)]:
                        ebc[(min(u, v), max(u, v))] += (
                            sig[(s, u)] * sig[(v, t)] * 10**9 // sig[(s, t)]
                        )
    ranked = sorted(ebc.items(), key=lambda kv: (-kv[1], kv[0]))
    top = ranked[:10]
    cut = top[0][0]
    expect = {
        (names[a], names[b]): (v, (a, b) == cut) for (a, b), v in top
    }
    got = {
        (r["a_name"], r["b_name"]): (r["ebc_e9"], r["is_first_cut"])
        for r in QUERIES["graph_girvan_newman_edges"](spark, SF).collect()
    }
    assert got == expect
    # exactly one first-cut edge, and betweenness must be nontrivial
    assert sum(1 for _, fc in got.values() if fc) == 1
    assert any(v > 0 for v, _ in got.values())


# ------------------------------------ STL-style robust decomposition


def test_stl_robust_decompose_matches_python_reference(spark):
    rows = (
        load_table(spark, "events", SF)
        .select(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2025-01-01").cast("date")
            ).alias("x"),
            F.floor(F.col("value") * 1000).cast("bigint").alias("v_e3"),
        )
        .groupBy("event_type", "x")
        .agg(F.expr("CAST(sum(v_e3) DIV count(*) AS BIGINT)").alias("y_e3"))
        .collect()
    )
    series = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["x"])):
        series.setdefault(r["event_type"], []).append((r["x"], r["y_e3"]))
    expect = {}
    for et, pts in series.items():
        det = []
        for i in range(len(pts)):
            lo, hi = i - 3, i + 3
            if lo < 0 or hi >= len(pts):
                continue
            frame = [pts[j][1] for j in range(lo, hi + 1)]
            det.append((pts[i][0] % 7, 7 * pts[i][1] - sum(frame)))
        raw, n_days = {}, {}
        by_dow = defaultdict(list)
        for dow, d in det:
            by_dow[dow].append(d)
        for dow, vals in by_dow.items():
            n_days[dow] = len(vals)
            raw[dow] = math.floor(sum(vals) / (7 * len(vals)) + 0.5001)
        ars = [(dow, d, abs(d - 7 * raw[dow])) for dow, d in det]
        mar = sum(a for _, _, a in ars) // len(ars)
        rob = {}
        wacc = defaultdict(lambda: [0, 0])
        for dow, d, a in ars:
            w = (mar * 1000) // max(a, max(mar // 1000, 1))
            wacc[dow][0] += w * d
            wacc[dow][1] += w
        for dow, (swd, sw) in wacc.items():
            rob[dow] = math.floor(swd / (7 * sw) + 0.5001)
        total_rob = sum(rob.values())
        for dow in raw:
            expect[(et, dow)] = (
                n_days[dow],
                raw[dow],
                rob[dow],
                7 * rob[dow] - total_rob,
            )
    got = {
        (r["event_type"], r["dow"]): (
            r["n_days"],
            r["seas_raw_e3"],
            r["seas_rob_e3"],
            r["rob_adj_x7_e3"],
        )
        for r in QUERIES["ts_stl_robust_decompose"](spark, SF).collect()
    }
    assert got == expect
    # robustness must actually move at least one index, or the
    # down-weighting (and this test) is vacuous
    assert any(g[1] != g[2] for g in got.values())


# ------------------------------------------ KMV Jaccard set operations


def test_kmv_jaccard_pairs_matches_python_reference(spark):
    rows = (
        load_table(spark, "events", SF)
        .select("event_type", "user_id")
        .distinct()
        .collect()
    )
    sets = defaultdict(set)
    for r in rows:
        sets[r["event_type"]].add(r["user_id"])
    K = 256
    sk = {
        t: sorted(hashlib.md5(str(u).encode()).hexdigest() for u in us)[:K]
        for t, us in sets.items()
    }
    expect = {}
    for t1 in sorted(sets):
        for t2 in sorted(sets):
            if t1 >= t2:
                continue
            n1, n2 = len(sets[t1]), len(sets[t2])
            inter = len(sets[t1] & sets[t2])
            s1, s2 = set(sk[t1]), set(sk[t2])
            kept = sorted(s1 | s2)[:K]
            both = sum(1 for h in kept if h in s1 and h in s2)
            k_eff = len(kept)
            exact_j = inter * 10**6 // (n1 + n2 - inter)
            kmv_j = both * 10**6 // k_eff
            expect[(t1, t2)] = (n1, n2, inter, exact_j, kmv_j, kmv_j - exact_j)
    got = {
        (r["t1"], r["t2"]): (
            r["n1"],
            r["n2"],
            r["exact_inter"],
            r["exact_jaccard_e6"],
            r["kmv_jaccard_e6"],
            r["err_e6"],
        )
        for r in QUERIES["sketch_kmv_jaccard_pairs"](spark, SF).collect()
    }
    assert got == expect
    # the estimator must be non-degenerate: some overlap exists and at
    # least one estimate is nonzero
    assert any(v[2] > 0 for v in expect.values())
    assert any(v[4] > 0 for v in expect.values())


# ------------------------------------------ binary segmentation cuts


def test_binseg_changepoints_matches_python_reference(spark):
    rows = (
        load_table(spark, "events", SF)
        .groupBy(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2025-01-01").cast("date")
            ).alias("day"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("x_e3")
        )
        .collect()
    )
    series = defaultdict(list)
    for r in rows:
        series[r["event_type"]].append((r["day"], r["x_e3"]))

    def best_cut(pts):
        n = len(pts)
        total = sum(x for _, x in pts)
        best = None
        pfx = 0
        for i, (day, x) in enumerate(pts, start=1):
            if i >= n:
                break
            pfx += x
            score = abs(n * pfx - i * total)
            # argmax, ties to the earliest index
            if best is None or score > best[0]:
                best = (score, i, day, n)
        return best

    expect = {}
    for et, pts in series.items():
        pts.sort()
        s, i, d, n = best_cut(pts)
        expect[(et, 1, "all")] = (d, i, s, n)
        for segname, seg in (("L", pts[:i]), ("R", pts[i:])):
            b = best_cut(seg)
            if b:
                s2, i2, d2, n2 = b
                expect[(et, 2, segname)] = (d2, i2, s2, n2)
    got = {
        (r["event_type"], r["level"], r["segment"]): (
            r["cut_day"],
            r["cut_i"],
            r["score_scaled"],
            r["seg_n"],
        )
        for r in QUERIES["ts_binseg_changepoints"](spark, SF).collect()
    }
    assert got == expect
    # every type must produce a level-1 cut and at least one level-2 cut
    types = {k[0] for k in expect}
    for et in types:
        assert (et, 1, "all") in got
        assert (et, 2, "L") in got or (et, 2, "R") in got
