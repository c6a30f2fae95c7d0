"""Round-10 operator tests: independent Python reference
implementations for the six new registered queries (the DuckDB hash
gate is the primary check; these pin semantics against a second,
non-SQL implementation — the round-7 convention)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict, deque

from pyspark.sql import functions as F

from gotsdb_spark.operators.registry import QUERIES
from gotsdb_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def _e6(v: float) -> int:
    return math.floor(v * 1e6 + 0.5001)


# ------------------------------------------------- Cochran-Armitage


def test_cochran_armitage_matches_python_reference(spark):
    rows = (
        load_table(spark, "orders", SF)
        .select(
            F.substring("o_orderpriority", 1, 1).cast("int").alias("w"),
            (F.col("o_orderstatus") == "F").alias("f"),
        )
        .collect()
    )
    n = len(rows)
    r = sum(1 for x in rows if x["f"])
    swr = sum(x["w"] for x in rows if x["f"])
    swn = sum(x["w"] for x in rows)
    swwn = sum(x["w"] * x["w"] for x in rows)
    a = n * swr - r * swn
    b = n * swwn - swn * swn
    z2 = n * a * a / (r * (n - r) * b)
    got = QUERIES["stats_cochran_armitage_trend"](spark, SF).collect()[0]
    assert got["n"] == n and got["r"] == r
    assert got["a_num"] == a and got["b_den"] == b
    assert got["z2_e6"] == _e6(z2)
    assert got["trend_positive"] == (a > 0)


# --------------------------------------------- Cochran's Q / McNemar


def test_cochran_q_mcnemar_matches_python_reference(spark):
    rows = load_table(spark, "documents", SF).select(
        "n_chars", "text", "lang"
    ).collect()
    flags = [
        (
            1 if x["n_chars"] >= 500 else 0,
            1 if len(x["text"].split(" ")) >= 80 else 0,
            1 if x["lang"] == "en" else 0,
        )
        for x in rows
    ]
    c = [sum(f[j] for f in flags) for j in range(3)]
    sr = sum(sum(f) for f in flags)
    sr2 = sum(sum(f) ** 2 for f in flags)
    q = 2.0 * (3 * sum(x * x for x in c) - sr * sr) / (3.0 * sr - sr2)
    n01 = sum(1 for f in flags if f[0] == 0 and f[1] == 1)
    n10 = sum(1 for f in flags if f[0] == 1 and f[1] == 0)
    mc = (n01 - n10) ** 2 / (n01 + n10)
    got = QUERIES["stats_cochran_q_mcnemar"](spark, SF).collect()[0]
    assert got["n_docs"] == len(rows)
    assert (got["c1"], got["c2"], got["c3"]) == tuple(c)
    assert got["q_e6"] == _e6(q)
    assert (got["n01"], got["n10"]) == (n01, n10)
    assert got["mcnemar_chi2_e6"] == _e6(mc)


# --------------------------------------------- seasonal decomposition


def _daily_series(spark):
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
    out: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["x"])):
        out.setdefault(r["event_type"], []).append((r["x"], r["y_e3"]))
    return out


def test_seasonal_decompose_matches_python_reference(spark):
    series = _daily_series(spark)
    expect = {}
    for et, pts in series.items():
        raw = {}
        det_by_dow = defaultdict(list)
        # ROWS frame is positional over the x-ordered series
        for i in range(len(pts)):
            lo, hi = i - 3, i + 3
            if lo < 0 or hi >= len(pts):
                continue
            frame = [pts[j][1] for j in range(lo, hi + 1)]
            det_by_dow[pts[i][0] % 7].append(7 * pts[i][1] - sum(frame))
        for dow, vals in det_by_dow.items():
            raw[dow] = (
                len(vals),
                math.floor(sum(vals) / (7 * len(vals)) + 0.5001),
            )
        total = sum(v[1] for v in raw.values())
        for dow, (n_days, r) in raw.items():
            expect[(et, dow)] = (n_days, r, 7 * r - total)
    got = {
        (r["event_type"], r["dow"]): (
            r["n_days"],
            r["seas_raw_e3"],
            r["seas_adj_x7_e3"],
        )
        for r in QUERIES["ts_seasonal_decompose"](spark, SF).collect()
    }
    assert got == expect


# ------------------------------------------------- quantile digest


def test_quantile_digest_matches_python_reference(spark):
    K = 32
    rows = (
        load_table(spark, "events", SF)
        .select(
            F.datediff(
                F.col("ts").cast("date"), F.lit("2025-01-01").cast("date")
            ).alias("d"),
            F.floor(F.col("value") * 1000).cast("bigint").alias("v"),
        )
        .collect()
    )
    per_day = defaultdict(Counter)
    for r in rows:
        per_day[r["d"]][r["v"]] += 1
    cents = []  # (mean_e3, d, cid, w, span)
    for d, cnt in per_day.items():
        n_day = sum(cnt.values())
        cc = 0
        agg = defaultdict(lambda: [0, 0, None, None])  # w, sv, mn, mx
        for v in sorted(cnt):
            c = cnt[v]
            cc += c
            cid = (cc - 1) * K // n_day
            a = agg[cid]
            a[0] += c
            a[1] += v * c
            a[2] = v if a[2] is None else min(a[2], v)
            a[3] = v if a[3] is None else max(a[3], v)
        for cid, (w, sv, mn, mx) in agg.items():
            cents.append((sv // w, d, cid, w, mx - mn))
    cents.sort(key=lambda t: (t[0], t[1], t[2]))
    tw = sum(c[3] for c in cents)
    max_span = max(c[4] for c in cents)
    gcnt = Counter()
    for cnt in per_day.values():
        gcnt.update(cnt)
    n = sum(gcnt.values())
    expect = {}
    for q in (50, 95):
        cum = 0
        est = None
        for m, d, cid, w, _ in cents:
            cum += w
            if cum * 100 >= q * tw:
                est = m
                break
        cc = 0
        exact = None
        for v in sorted(gcnt):
            cc += gcnt[v]
            if cc * 100 >= q * n:
                exact = v
                break
        expect[q] = (est, exact, est - exact, len(cents), max_span)
    got = {
        r["q_pct"]: (
            r["est_e3"],
            r["exact_e3"],
            r["err_e3"],
            r["n_centroids"],
            r["max_span_e3"],
        )
        for r in QUERIES["sketch_quantile_digest"](spark, SF).collect()
    }
    assert got == expect
    for r in QUERIES["sketch_quantile_digest"](spark, SF).collect():
        assert r["within_span"], r


# ----------------------------------------------- IRLS quantile reg


def test_irls_quantreg_matches_python_reference(spark):
    rows = (
        load_table(spark, "orders", SF)
        .select(
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1992-01-01").cast("date"),
            ).alias("x"),
            F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        )
        .collect()
    )
    daily = Counter()
    for r in rows:
        daily[r["x"]] += r["c"]
    xs = sorted(daily)
    n = len(xs)
    sx = sum(xs)
    sy = sum(daily.values())
    sxx = sum(x * x for x in xs)
    sxy = sum(x * daily[x] for x in xs)
    b = math.floor(
        (n * sxy - sx * sy) / (n * sxx - sx * sx) * 1e6 + 0.5001
    )
    a = math.floor((sy * 1000000 - b * sx) / n + 0.5001)
    ols_b = b
    for _ in range(2):
        rs = {x: abs(daily[x] * 1000000 - a - b * x) for x in xs}
        mar = sum(rs.values()) // n
        ws = {
            x: mar * 1000 // max(rs[x], max(mar // 1000, 1)) for x in xs
        }
        sw = sum(ws.values())
        swx = sum(w * x for x, w in ws.items())
        swy = sum(w * daily[x] for x, w in ws.items())
        swxx = sum(w * x * x for x, w in ws.items())
        swxy = sum(w * x * daily[x] for x, w in ws.items())
        b = math.floor(
            (sw * swxy - swx * swy) / (sw * swxx - swx * swx) * 1e6 + 0.5001
        )
        a = math.floor((swy * 1000000 - b * swx) / sw + 0.5001)
    got = QUERIES["stats_irls_quantile_regression"](spark, SF).collect()[0]
    assert got["n_days"] == n
    assert got["ols_b_e6"] == ols_b
    assert got["b_e6"] == b
    assert got["a_e6"] == a
    # the reweighted median fit must differ from OLS on this data
    # (otherwise the test proves nothing about the IRLS rounds)
    assert got["b_e6"] != got["ols_b_e6"] or got["a_e6"] != math.floor(
        (sy * 1000000 - ols_b * sx) / n + 0.5001
    )


# ------------------------------------------------- betweenness


def test_betweenness_matches_python_reference(spark):
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
    bc = Counter()
    for (s, v), d1 in dist.items():
        if v == s:
            continue
        for t in nodes:
            if t <= s or t == v:
                continue
            if (v, t) not in dist or (s, t) not in dist:
                continue
            if d1 + dist[(v, t)] == dist[(s, t)]:
                bc[v] += sig[(s, v)] * sig[(v, t)] * 10**9 // sig[(s, t)]
    got = {
        r["n_name"]: r["betweenness_e9"]
        for r in QUERIES["graph_betweenness_nations"](spark, SF).collect()
    }
    expect = {names[v]: bc.get(v, 0) for v in nodes}
    assert got == expect
    # the sparse trade graph must actually have brokers, or the test
    # (and the operator) is vacuous
    assert any(v > 0 for v in expect.values())


# ------------------------------------------------- Cucconi Q


def test_cucconi_matches_python_reference(spark):
    rows = (
        load_table(spark, "lineitem", SF)
        .where(F.col("l_returnflag").isin("A", "R"))
        .select(
            F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("v"),
            (F.col("l_returnflag") == "R").alias("b"),
        )
        .collect()
    )
    cnt = Counter(r["v"] for r in rows)
    cb = Counter(r["v"] for r in rows if r["b"])
    n = len(rows)
    n2 = sum(cb.values())
    cc = 0
    sb_x2 = s2b_x4 = 0
    for v in sorted(cnt):
        m2 = 2 * (cc + cnt[v]) - cnt[v] + 1
        sb_x2 += cb.get(v, 0) * m2
        s2b_x4 += cb.get(v, 0) * m2 * m2
        cc += cnt[v]
    d = math.sqrt((n - n2) * n2 * (n + 1) * (2 * n + 1) * (8 * n + 11) / 5)
    u = (6.0 * (s2b_x4 / 4) - n2 * 1.0 * (n + 1) * (2 * n + 1)) / d
    v_ = (
        6.0 * (n2 * 1.0 * (n + 1) * (n + 1) - (n + 1) * float(sb_x2) + s2b_x4 / 4)
        - n2 * 1.0 * (n + 1) * (2 * n + 1)
    ) / d
    r_ = 2.0 * (n * 1.0 * n - 4) / ((2 * n + 1) * 1.0 * (8 * n + 11)) - 1
    q = (u * u + v_ * v_ - 2.0 * r_ * u * v_) / (2.0 * (1 - r_ * r_))
    got = QUERIES["stats_cucconi_location_scale"](spark, SF).collect()[0]
    assert got["n"] == n and got["n2"] == n2 and got["n1"] == n - n2
    assert got["rank_sum_b_x2"] == sb_x2
    assert got["rank_sq_sum_b_x4"] == str(s2b_x4)
    assert got["q_e6"] == _e6(q)
