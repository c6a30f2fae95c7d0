"""Round-11 second-window operator tests: independent Python
reference implementations for the new registered queries (the DuckDB
hash gate is the primary check; these pin semantics against a second,
non-SQL implementation — the round-7 convention)."""

from __future__ import annotations

import hashlib
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


def _trade_edges(spark):
    """Undirected weighted nation-pair trade edges {(a, b): w}, a < b,
    self-loops dropped — the Python mirror of the Q7 join shape."""
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
    ue = defaultdict(int)
    for r in (
        load_table(spark, "lineitem", SF)
        .select("l_orderkey", "l_suppkey")
        .collect()
    ):
        src = c2n[o2c[r["l_orderkey"]]]
        dst = s2n[r["l_suppkey"]]
        if src != dst:
            ue[(min(src, dst), max(src, dst))] += 1
    return ue


# ------------------------------------------- region-partition modularity


def test_modularity_matches_python_reference(spark):
    ue = _trade_edges(spark)
    n2r = {
        r["n_nationkey"]: r["n_regionkey"]
        for r in load_table(spark, "nation", SF).collect()
    }
    rname = {
        r["r_regionkey"]: r["r_name"]
        for r in load_table(spark, "region", SF).collect()
    }
    m = sum(ue.values())
    deg = defaultdict(int)
    for (a, b), w in ue.items():
        deg[a] += w
        deg[b] += w
    comm_nodes = defaultdict(int)
    comm_deg = defaultdict(int)
    for v, k in deg.items():
        comm_nodes[n2r[v]] += 1
        comm_deg[n2r[v]] += k
    comm_in = defaultdict(int)
    for (a, b), w in ue.items():
        if n2r[a] == n2r[b]:
            comm_in[n2r[a]] += w
    got = QUERIES["graph_modularity_communities"](spark, SF).collect()
    assert len(got) == len(comm_nodes)
    for r in got:
        c = next(k for k, v in rname.items() if v == r["region"])
        iw = comm_in.get(c, 0)
        dw = comm_deg[c]
        assert r["n_nodes"] == comm_nodes[c]
        assert r["internal_w"] == iw
        assert r["degree_w"] == dw
        assert r["q_contrib_scaled"] == 4 * m * iw - dw * dw
        assert r["q_contrib_e9"] == math.floor(
            (4.0 * m * iw - 1.0 * dw * dw) / (4.0 * m * m) * 1e9 + 0.5001
        )
    # partition-wide sanity: contributions sum to 4*m^2*Q with |Q| <= 1
    total = sum(r["q_contrib_scaled"] for r in got)
    assert abs(total) <= 4 * m * m


# ------------------------------------------------- degree assortativity


def test_assortativity_matches_python_reference(spark):
    ue = _trade_edges(spark)
    ne = len(ue)
    keep = sorted(ue.items(), key=lambda kv: (-kv[1], kv[0]))[
        : math.ceil(ne / 10.0)
    ]
    deg = defaultdict(int)
    for (a, b), _ in keep:
        deg[a] += 1
        deg[b] += 1
    arcs = [(a, b) for (a, b), _ in keep] + [(b, a) for (a, b), _ in keep]
    n = len(arcs)
    sx = sum(deg[x] for x, _ in arcs)
    sxx = sum(deg[x] * deg[x] for x, _ in arcs)
    sxy = sum(deg[x] * deg[y] for x, y in arcs)
    r = QUERIES["graph_degree_assortativity"](spark, SF).collect()[0]
    assert r["n_arcs"] == n
    assert r["sum_k"] == sx
    assert r["sum_k2"] == sxx
    assert r["sum_kxky"] == sxy
    den = n * sxx - sx * sx
    if den == 0:
        assert r["assortativity_e6"] is None
    else:
        assert r["assortativity_e6"] == tdiv((n * sxy - sx * sx) * 10**6, den)


# --------------------------------------------- Wilcoxon signed-rank


def test_wilcoxon_matches_python_reference(spark):
    per = defaultdict(lambda: [0, 0, 0, 0])  # cs, cn, vs, vn
    for r in (
        load_table(spark, "events", SF)
        .where(F.col("event_type").isin("click", "view"))
        .select("user_id", "event_type", F.floor(F.col("value") * 1000)
                .cast("bigint").alias("v"))
        .collect()
    ):
        p = per[r["user_id"]]
        if r["event_type"] == "click":
            p[0] += r["v"]
            p[1] += 1
        else:
            p[2] += r["v"]
            p[3] += 1
    diffs = []
    for cs, cn, vs, vn in per.values():
        if cn > 0 and vn > 0:
            d = tdiv(cs, cn) - tdiv(vs, vn)
            if d != 0:
                diffs.append(d)
    dic = defaultdict(lambda: [0, 0])  # c, cpos
    for d in diffs:
        dic[abs(d)][0] += 1
        if d > 0:
            dic[abs(d)][1] += 1
    n = len(diffs)
    w_plus_x2 = 0
    tie3 = 0
    cc = 0
    for ad in sorted(dic):
        c, cpos = dic[ad]
        cc += c
        w_plus_x2 += cpos * (2 * cc - c + 1)
        tie3 += c * c * c - c
    got = QUERIES["stats_wilcoxon_signed_rank"](spark, SF).collect()[0]
    assert got["n"] == n
    assert got["w_plus_x2"] == w_plus_x2
    assert got["tie_term_div_n"] == tdiv(tie3, n)
    var48 = 2 * n * (n + 1) * (2 * n + 1) - tie3
    assert got["var_x48_div_n"] == tdiv(var48, n)
    num = 2 * w_plus_x2 - n * (n + 1)
    sign = 1 if num >= 0 else -1
    assert got["z2_signed_e6"] == tdiv(sign * 3 * num * num * 10**6, var48)


# ------------------------------------------------------ Friedman ranks


def test_friedman_matches_python_reference(spark):
    o2 = {
        r["o_orderkey"]: (r["o_orderdate"].month, r["o_orderpriority"])
        for r in load_table(spark, "orders", SF)
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
        .collect()
    }
    cells = defaultdict(int)
    for r in (
        load_table(spark, "lineitem", SF)
        .select("l_orderkey", F.floor(F.col("l_extendedprice") * 100)
                .cast("bigint").alias("cents"))
        .collect()
    ):
        blk, tr = o2[r["l_orderkey"]]
        cells[(blk, tr)] += r["cents"]
    blocks = sorted({b for b, _ in cells})
    treatments = sorted({t for _, t in cells})
    rank_sum = defaultdict(int)
    for b in blocks:
        row = sorted(
            (cells[(b, t)], t) for t in treatments if (b, t) in cells
        )
        for i, (_, t) in enumerate(row, start=1):
            rank_sum[t] += i
    n, k = len(blocks), len(treatments)
    ss = sum(v * v for v in rank_sum.values())
    chi2 = tdiv(12 * ss * 10**6, n * k * (k + 1)) - 3 * n * (k + 1) * 10**6
    got = QUERIES["stats_friedman_ranks"](spark, SF).collect()
    assert [r["treatment"] for r in got] == treatments
    for r in got:
        assert r["rank_sum"] == rank_sum[r["treatment"]]
        assert r["n_blocks"] == n and r["k_treatments"] == k
        assert r["chi2_e6"] == chi2


# ------------------------------------------------- Ljung-Box whiteness


def _daily_mean_series(spark):
    agg = defaultdict(lambda: [0, 0])
    for r in (
        load_table(spark, "events", SF)
        .select(
            "event_type",
            F.datediff(F.col("ts").cast("date"),
                       F.lit("2025-01-01").cast("date")).alias("x"),
            F.floor(F.col("value") * 1000).cast("bigint").alias("v"),
        )
        .collect()
    ):
        a = agg[(r["event_type"], r["x"])]
        a[0] += r["v"]
        a[1] += 1
    series = defaultdict(dict)
    for (et, x), (s, c) in agg.items():
        series[et][x] = tdiv(s, c)
    return series


def test_ljung_box_matches_python_reference(spark):
    series = _daily_mean_series(spark)
    expect = {}
    for et, days in series.items():
        nd = len(days)
        qcum = 0
        for lag in range(1, 8):
            pairs = [
                (days[x], days[x + lag]) for x in days if x + lag in days
            ]
            n = len(pairs)
            sa = sum(a for a, _ in pairs)
            sb = sum(b for _, b in pairs)
            sab = sum(a * b for a, b in pairs)
            saa = sum(a * a for a, _ in pairs)
            sbb = sum(b * b for _, b in pairs)
            acf = math.floor(
                (n * 1.0 * sab - sa * 1.0 * sb)
                / math.sqrt(
                    (n * 1.0 * saa - sa * 1.0 * sa)
                    * (n * 1.0 * sbb - sb * 1.0 * sb)
                )
                * 1e6
                + 0.5001
            )
            term = tdiv(nd * (nd + 2) * acf * acf, nd - lag)
            qcum += term
            expect[(et, lag)] = (nd, acf, term, qcum)
    got = QUERIES["ts_ljung_box_whiteness"](spark, SF).collect()
    assert len(got) == len(expect)
    for r in got:
        nd, acf, term, qcum = expect[(r["event_type"], r["lag"])]
        assert r["n_days"] == nd
        assert r["acf_e6"] == acf
        assert r["lb_term_e12"] == term
        assert r["lb_q_e12"] == qcum


# --------------------------------------------------- AMS F2 sketch


def test_ams_f2_matches_python_reference(spark):
    freq = defaultdict(int)
    for r in load_table(spark, "events", SF).select("user_id").collect():
        freq[r["user_id"]] += 1
    f2 = sum(f * f for f in freq.values())
    sums = [0] * 32
    for u, f in freq.items():
        h = hashlib.md5(str(u).encode()).hexdigest()
        for j in range(32):
            sums[j] += f * (1 - 2 * (int(h[j], 16) % 2))
    ests = sorted(s * s for s in sums)
    med_x2 = ests[15] + ests[16]
    got = QUERIES["sketch_ams_f2_moment"](spark, SF).collect()[0]
    assert got["n_users"] == len(freq)
    assert got["f2_exact"] == f2
    assert got["est_min"] == ests[0]
    assert got["est_max"] == ests[-1]
    assert got["est_median_x2"] == med_x2
    assert got["rel_err_signed_e6"] == tdiv((med_x2 - 2 * f2) * 10**6, 2 * f2)


# ------------------------------------------------------- FD violations


def test_fd_violations_matches_python_reference(spark):
    from gotsdb_spark.operators.quality import _FD_CANDIDATES

    got = {r["fd"]: r for r in QUERIES["quality_fd_violations"](spark, SF)
           .collect()}
    assert set(got) == {label for label, *_ in _FD_CANDIDATES}
    for label, table, lhs, rhs in _FD_CANDIDATES:
        groups = defaultdict(set)
        for r in load_table(spark, table, SF).select(lhs, rhs).collect():
            groups[r[lhs]].add(r[rhs])
        lg = len(groups)
        viol = sum(1 for s in groups.values() if len(s) > 1)
        mx = max(len(s) for s in groups.values())
        r = got[label]
        assert r["lhs_groups"] == lg
        assert r["violating_groups"] == viol
        assert r["max_rhs_distinct"] == mx
        assert r["violation_rate_e6"] == tdiv(viol * 10**6, lg)
        assert r["holds"] == (1 if mx == 1 else 0)
    # the audit must separate held from violated dependencies on the
    # fixture, or it tests nothing
    holds = {r["holds"] for r in got.values()}
    assert holds == {0, 1} or holds == {0}


# ---------------------------------------------------------- runs test


def test_runs_test_matches_python_reference(spark):
    agg = defaultdict(int)
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
        agg[(r["event_type"], r["day"])] += r["v"]
    series = defaultdict(dict)
    for (et, d), y in agg.items():
        series[et][d] = y
    got = {r["event_type"]: r
           for r in QUERIES["stats_runs_test_daily"](spark, SF).collect()}
    assert set(got) == set(series)
    for et, days in series.items():
        ordered = sorted(days.items(), key=lambda kv: (kv[1], kv[0]))
        nd = len(ordered)
        med = ordered[(nd + 1) // 2 - 1][1]
        signs = [
            1 if y > med else 0
            for _, y in sorted(days.items())
            if y != med
        ]
        n = len(signs)
        n1 = sum(signs)
        n2 = n - n1
        runs = sum(
            1
            for i, s in enumerate(signs)
            if i == 0 or s != signs[i - 1]
        )
        r = got[et]
        assert r["n"] == n and r["n1"] == n1 and r["n2"] == n2
        assert r["runs"] == runs
        assert r["expected_runs_e6"] == 10**6 + tdiv(2 * n1 * n2 * 10**6, n)
        num = n * (runs - 1) - 2 * n1 * n2
        den = 2 * n1 * n2 * (2 * n1 * n2 - n)
        if den == 0:
            assert r["z2_signed_e6"] is None
        else:
            sign = 1 if num >= 0 else -1
            assert r["z2_signed_e6"] == tdiv(
                sign * num * num * (n - 1) * 10**6, den
            )
