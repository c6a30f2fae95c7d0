"""Round-9 operator tests: independent Python reference
implementations for the five new registered queries (the DuckDB hash
gate is the primary check; these pin semantics against a second,
non-SQL implementation — the round-7 convention)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from gotsdb_spark.operators.registry import QUERIES
from gotsdb_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def _r9(v: float) -> float:
    return math.floor(v * 1e9 + 0.5) / 1e9


def _e6(v: float) -> int:
    return math.floor(v * 1e6 + 0.5001)


def _e9(v: float) -> int:
    return math.floor(v * 1e9 + 0.5001)


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
        out.setdefault(r["event_type"], []).append(r["y_e3"])
    return out


def test_hw_damped_seasonal_matches_python_reference(spark):
    series = _daily_series(spark)
    got = {
        r["event_type"]: r
        for r in QUERIES["ts_holt_winters_damped_seasonal"](
            spark, SF
        ).collect()
    }
    a, bt, g, ph, m = 0.5, 0.3, 0.2, 0.9, 7
    hsum = sum(ph**k for k in range(1, 8))
    for etype, ys in series.items():
        if len(ys) < 2 * m + 1:
            assert etype not in got
            continue
        l = _r9(sum(ys[:7]) / 7000.0)
        b = _r9((sum(ys[7:14]) - sum(ys[:7])) / 49000.0)
        seas = [_r9(v / 1000.0 - l) for v in ys[:7]]
        for y_e3 in ys[m:]:
            y = y_e3 / 1000.0
            s1 = seas[0]
            lnew = _r9(a * (y - s1) + (1 - a) * (l + ph * b))
            bnew = _r9(bt * (lnew - l) + (1 - bt) * ph * b)
            snew = _r9(g * (y - lnew) + (1 - g) * s1)
            l, b = lnew, bnew
            seas = seas[1:] + [snew]
        row = got[etype]
        assert row["n_days"] == len(ys)
        assert row["level_e6"] == _e6(l)
        assert row["trend_e6"] == _e6(b)
        assert row["season_e6"] == _e6(seas[0])
        assert row["forecast_e6"] == _e6(l + ph * b + seas[0])
        assert row["forecast_h7_e6"] == _e6(l + hsum * b + seas[0])
    # damping must pull the long-horizon forecast toward level+season
    # relative to the undamped seasonal twin when trend is nonzero
    assert got, "no series long enough at fixture scale?"


def test_psi_by_source_matches_python_reference(spark):
    docs = (
        load_table(spark, "documents", SF)
        .select("doc_id", "source", "n_chars")
        .collect()
    )
    per_src: dict = {}
    for r in docs:
        s = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:4], 16) % 2
        per_src.setdefault(r["source"], ([], []))[s].append(r["n_chars"])
    got = {
        r["source"]: r
        for r in QUERIES["quality_psi_by_source"](spark, SF).collect()
    }
    assert set(got) == set(per_src)
    for src, (ref, cur) in per_src.items():
        na, nb = len(ref), len(cur)
        # per-source decile edges from the REFERENCE half's dictionary
        from collections import Counter

        cnt = Counter(ref)
        edges = []
        for k in range(1, 10):
            cc = 0
            for v in sorted(cnt):
                cc += cnt[v]
                if cc * 10 >= k * na:
                    edges.append(v)
                    break
        bins_ref = Counter(1 + sum(1 for e in edges if v > e) for v in ref)
        bins_cur = Counter(1 + sum(1 for e in edges if v > e) for v in cur)
        psi = 0
        for b in range(1, 11):
            c_ref, c_cur = bins_ref.get(b, 0), bins_cur.get(b, 0)
            pa = (c_ref + 1.0) / (na + 10)
            pb = (c_cur + 1.0) / (nb + 10)
            lr = math.log(
                ((c_ref + 1.0) * (nb + 10)) / ((c_cur + 1.0) * (na + 10))
            )
            psi += _e9((pa - pb) * lr)
        row = got[src]
        assert (row["n_ref"], row["n_cur"]) == (na, nb)
        assert row["psi_e9"] == psi


def test_brown_forsythe_matches_python_reference(spark):
    rows = (
        load_table(spark, "lineitem", SF)
        .select(
            F.col("l_returnflag").alias("flag"),
            F.floor(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .collect()
    )
    groups: dict = {"A": [], "N": [], "R": []}
    for r in rows:
        groups[r["flag"]].append(r["cents"])

    def lower_median(vals):
        sv = sorted(vals)
        n = len(sv)
        cc = 0
        from collections import Counter

        cnt = Counter(sv)
        for v in sorted(cnt):
            cc += cnt[v]
            if cc * 2 >= n:
                return v

    med = {g: lower_median(v) for g, v in groups.items()}
    n = {g: len(v) for g, v in groups.items()}
    s = {g: sum(abs(x - med[g]) for x in v) for g, v in groups.items()}
    qq = sum(
        abs(x - med[g]) ** 2 for g, v in groups.items() for x in v
    )
    nn = sum(n.values())
    ss = sum(s.values())
    a = (
        float(s["A"]) * float(s["A"]) / float(n["A"])
        + float(s["N"]) * float(s["N"]) / float(n["N"])
        + float(s["R"]) * float(s["R"]) / float(n["R"])
    )
    grand = float(ss) * float(ss) / float(nn)
    f_stat = ((a - grand) / 2.0) / ((float(qq) - a) / (float(nn) - 3.0))
    row = QUERIES["stats_brown_forsythe"](spark, SF).collect()[0]
    assert row["n"] == nn
    assert (row["n_a"], row["n_n"], row["n_r"]) == (n["A"], n["N"], n["R"])
    assert (
        row["med_a_cents"],
        row["med_n_cents"],
        row["med_r_cents"],
    ) == (med["A"], med["N"], med["R"])
    assert row["f_e6"] == _e6(f_stat)


def _strong_undirected_edges(spark):
    lineitem = load_table(spark, "lineitem", SF)
    orders = load_table(spark, "orders", SF)
    customer = load_table(spark, "customer", SF)
    supplier = load_table(spark, "supplier", SF)
    rows = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count("*").alias("w"))
        .collect()
    )
    t = sum(r["w"] for r in rows)
    nf = len(rows)
    return {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in rows
        if r["src"] != r["dst"] and r["w"] * nf > t
    }


def test_kcore_matches_python_reference(spark):
    ue = _strong_undirected_edges(spark)
    K, ROUNDS = 8, 3
    nodes = {a for a, _ in ue} | {b for _, b in ue}
    deg0 = {v: sum(1 for a, b in ue if v in (a, b)) for v in nodes}
    alive = set(nodes)
    deg = dict(deg0)
    for _ in range(ROUNDS):
        live = [(a, b) for a, b in ue if a in alive and b in alive]
        deg = {
            v: sum(1 for a, b in live if v in (a, b)) for v in alive
        }
        alive = {v for v in alive if deg[v] >= K}
    got = {
        r["node"]: r for r in QUERIES["graph_kcore_nations"](spark, SF).collect()
    }
    assert set(got) == nodes
    for v in nodes:
        row = got[v]
        assert row["degree_initial"] == deg0[v]
        assert row["in_core"] == (1 if v in alive else 0)
        assert row["degree_final"] == (deg[v] if v in alive else 0)
    # the core is a genuine subgraph: every member keeps >= K members
    for v in alive:
        assert (
            sum(1 for a, b in ue if v in (a, b) and a in alive and b in alive)
            >= K
        )


def test_skyline_3d_matches_python_reference(spark):
    li = (
        load_table(spark, "lineitem", SF)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("dem"))
        .collect()
    )
    dem_by_part = {r["l_partkey"]: r["dem"] for r in li}
    parts = (
        load_table(spark, "part", SF)
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    )
    cells: dict = {}
    for r in parts:
        key = (math.floor(r["p_retailprice"]), r["p_size"])
        cells.setdefault(key, []).append(dem_by_part.get(r["p_partkey"], 0))
    best = {k: max(v) for k, v in cells.items()}
    want = {}
    for (d, s), m in best.items():
        dominated = any(
            d2 <= d and s2 >= s and m2 >= m and (d2, s2) != (d, s)
            for (d2, s2), m2 in best.items()
        )
        if not dominated:
            want[(d, s)] = (m, sum(1 for x in cells[(d, s)] if x == m))
    got = {
        (r["dollars"], r["p_size"]): (r["best_demand"], r["n_parts"])
        for r in QUERIES["skyline_3d_price_size_demand"](spark, SF).collect()
    }
    assert got == want and want
    # frontier sanity: strictly increasing demand along decreasing size
    # at equal price is impossible (would be dominated)
    for (d, s), (m, _) in want.items():
        for (d2, s2), (m2, _) in want.items():
            if (d, s) != (d2, s2) and d2 <= d and s2 >= s:
                assert m2 < m
