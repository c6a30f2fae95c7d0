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


# ---------------------------------------------------------------------------
# Round-9b operators (second half of the round).
# ---------------------------------------------------------------------------


def test_welch_ttest_matches_python_reference(spark):
    rows = (
        load_table(spark, "lineitem", SF)
        .where(F.col("l_returnflag").isin("A", "R"))
        .select(
            "l_returnflag",
            F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("c"),
        )
        .collect()
    )
    g = {"A": [], "R": []}
    for r in rows:
        g[r["l_returnflag"]].append(r["c"])
    n_a, n_r = len(g["A"]), len(g["R"])
    s_a, s_r = sum(g["A"]), sum(g["R"])
    q_a = sum(c * c for c in g["A"])
    q_r = sum(c * c for c in g["R"])
    # mirror the _WELCH_* shared expressions' operation order
    va = (float(q_a) - float(s_a) * float(s_a) / float(n_a)) / (
        float(n_a) - 1.0
    )
    vr = (float(q_r) - float(s_r) * float(s_r) / float(n_r)) / (
        float(n_r) - 1.0
    )
    se2 = va / float(n_a) + vr / float(n_r)
    t = (float(s_a) / float(n_a) - float(s_r) / float(n_r)) / math.sqrt(se2)
    df = (se2 * se2) / (
        (va / float(n_a)) * (va / float(n_a)) / (float(n_a) - 1.0)
        + (vr / float(n_r)) * (vr / float(n_r)) / (float(n_r) - 1.0)
    )
    row = QUERIES["stats_welch_ttest"](spark, SF).collect()[0]
    assert (row["n_a"], row["n_r"]) == (n_a, n_r)
    assert row["mean_a_c_e2"] == s_a * 100 // n_a
    assert row["mean_r_c_e2"] == s_r * 100 // n_r
    assert row["t_e6"] == _e6(t)
    assert row["df_e6"] == _e6(df)
    # Welch df must sit between min(n)-1 and n_a+n_r-2
    assert (min(n_a, n_r) - 1) * 10**6 <= row["df_e6"] <= (n_a + n_r - 2) * 10**6


def test_jarque_bera_matches_python_reference(spark):
    rows = (
        load_table(spark, "lineitem", SF)
        .select(
            "l_returnflag",
            F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("c"),
        )
        .collect()
    )
    groups: dict = {}
    for r in rows:
        groups.setdefault(r["l_returnflag"], []).append(r["c"])
    got = {r["flag"]: r for r in QUERIES["stats_jarque_bera"](spark, SF).collect()}
    assert set(got) == set(groups)
    for flag, cs in groups.items():
        n = len(cs)
        s1 = sum(cs)
        s2 = sum(c * c for c in cs)
        s3 = sum(c * c * c for c in cs)
        s4 = sum(c * c * c * c for c in cs)
        # mirror _JB_* operation order exactly
        mu = float(s1) / float(n)
        m2 = float(s2) / float(n) - mu * mu
        m3 = float(s3) / float(n) - 3.0 * mu * float(s2) / float(n) + 2.0 * mu * mu * mu
        m4 = (
            float(s4) / float(n)
            - 4.0 * mu * float(s3) / float(n)
            + 6.0 * mu * mu * float(s2) / float(n)
            - 3.0 * mu * mu * mu * mu
        )
        skew = m3 / math.sqrt(m2 * m2 * m2)
        kurt = m4 / (m2 * m2)
        jb = float(n) / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0)
        row = got[flag]
        assert row["n"] == n
        assert row["skew_e6"] == _e6(skew)
        assert row["kurt_e6"] == _e6(kurt)
        assert math.floor(jb * 1e3 + 0.5001) == row["jb_e3"]
        # lineitem prices are right-skewed-ish but platykurtic vs normal:
        # at minimum JB must be non-negative
        assert row["jb_e3"] >= 0


def _directed_flows(spark):
    lineitem = load_table(spark, "lineitem", SF)
    orders = load_table(spark, "orders", SF)
    customer = load_table(spark, "customer", SF)
    supplier = load_table(spark, "supplier", SF)
    return (
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


def test_hits_matches_python_reference(spark):
    flows = [(r["src"], r["dst"], r["w"]) for r in _directed_flows(spark)]
    nations = {
        r["n_nationkey"]: r["n_name"]
        for r in load_table(spark, "nation", SF).collect()
    }
    ONE = 1_000_000_000
    h = {v: ONE for v in nations}
    a = {v: 0 for v in nations}
    for _ in range(3):
        a = {v: 0 for v in nations}
        for s, d, w in flows:
            a[d] += w * h[s]
        sa = sum(a.values())
        a = {v: x * ONE // sa for v, x in a.items()}
        h = {v: 0 for v in nations}
        for s, d, w in flows:
            h[s] += w * a[d]
        sh = sum(h.values())
        h = {v: x * ONE // sh for v, x in h.items()}
    got = {
        r["n_name"]: r
        for r in QUERIES["graph_hits_nations"](spark, SF).collect()
    }
    assert set(got) == set(nations.values())
    for v, name in nations.items():
        assert got[name]["hub_e9"] == h[v]
        assert got[name]["auth_e9"] == a[v]
    # L1 normalization: integer-floored scores sum to <= 1e9 and
    # within 25 ulps of it
    assert ONE - 25 <= sum(r["hub_e9"] for r in got.values()) <= ONE
    assert ONE - 25 <= sum(r["auth_e9"] for r in got.values()) <= ONE


def test_candidate_keys_matches_python_reference(spark):
    rows = (
        load_table(spark, "orders", SF)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        .collect()
    )
    n = len(rows)
    combos = {
        "o_orderkey": {r["o_orderkey"] for r in rows},
        "o_custkey,o_orderdate": {
            (r["o_custkey"], r["o_orderdate"]) for r in rows
        },
        "o_orderdate": {r["o_orderdate"] for r in rows},
        "o_custkey,o_orderdate,o_totalprice": {
            (r["o_custkey"], r["o_orderdate"], r["cents"]) for r in rows
        },
    }
    got = {
        r["combo"]: r
        for r in QUERIES["quality_candidate_keys"](spark, SF).collect()
    }
    assert set(got) == set(combos)
    for combo, dset in combos.items():
        row = got[combo]
        d = len(dset)
        assert row["n_rows"] == n
        assert row["n_distinct"] == d
        assert row["dup_rows"] == n - d
        assert row["uniqueness_e6"] == d * 10**6 // n
        assert row["is_key"] == (1 if d == n else 0)
    # the declared primary key must actually be a key
    assert got["o_orderkey"]["is_key"] == 1
    # and the superset combo can never be LESS unique than its subset
    assert (
        got["o_custkey,o_orderdate,o_totalprice"]["n_distinct"]
        >= got["o_custkey,o_orderdate"]["n_distinct"]
    )


def test_sax_matches_python_reference(spark):
    series = _daily_series(spark)
    P, BP = 8, 0.6745
    got = {
        r["event_type"]: r
        for r in QUERIES["ts_sax_symbolic"](spark, SF).collect()
    }
    for etype, ys in series.items():
        if len(ys) < P:
            assert etype not in got
            continue
        n = len(ys)
        s1 = sum(ys)
        s2 = sum(y * y for y in ys)
        mu = float(s1) / float(n)
        sig = math.sqrt(float(s2) / float(n) - mu * mu)
        segsum: dict = {}
        segcnt: dict = {}
        for i, y in enumerate(ys):
            s = i * P // n
            segsum[s] = segsum.get(s, 0) + y
            segcnt[s] = segcnt.get(s, 0) + 1
        word = ""
        for s in sorted(segsum):
            z = (float(segsum[s]) / float(segcnt[s]) - mu) / sig
            word += (
                "a" if z < -BP else "b" if z < 0.0 else "c" if z < BP else "d"
            )
        row = got[etype]
        assert row["n_days"] == n
        assert row["mean_e3"] == s1 // n
        assert row["sax"] == word
        assert len(row["sax"]) == min(P, n)
