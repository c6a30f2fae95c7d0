"""Round-12b operator tests: independent Python reference
implementations for the three late-round-12 registered queries (the
DuckDB hash gate is the primary check; these pin semantics against a
second, non-SQL implementation — the round-7 convention)."""

from __future__ import annotations

import math
from collections import defaultdict

from gotsdb_spark.operators.registry import QUERIES
from gotsdb_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero (Spark DIV, DuckDB //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# --------------------------------------------- Levene (mean-centered)


def test_levene_mean_center_matches_python_reference(spark):
    cents: dict[str, list[int]] = defaultdict(list)
    for r in (
        load_table(spark, "lineitem", SF)
        .select("l_returnflag", "l_extendedprice")
        .collect()
    ):
        cents[r["l_returnflag"]].append(
            math.floor(r["l_extendedprice"] * 100)
        )
    n = {g: len(v) for g, v in cents.items()}
    s = {g: sum(v) for g, v in cents.items()}
    # u = |n_j*x - S_j| = n_j * z (exact integers)
    t = {g: sum(abs(n[g] * x - s[g]) for x in v) for g, v in cents.items()}
    q = {
        g: sum(abs(n[g] * x - s[g]) ** 2 for x in v)
        for g, v in cents.items()
    }
    # The shared double expression, replicated operation-for-operation.
    sz = {g: float(t[g]) / float(n[g]) for g in "ANR"}
    a_term = sum(sz[g] * sz[g] / float(n[g]) for g in "ANR")
    t_term = sum(sz[g] for g in "ANR")
    q_term = sum(float(q[g]) / (float(n[g]) * float(n[g])) for g in "ANR")
    nn = sum(n.values())
    w = ((a_term - t_term * t_term / float(nn)) / 2.0) / (
        (q_term - a_term) / (float(nn) - 3.0)
    )
    row = QUERIES["stats_levene_mean_center"](spark, SF).collect()
    assert len(row) == 1
    r = row[0]
    assert r["n"] == nn
    assert (r["n_a"], r["n_n"], r["n_r"]) == (n["A"], n["N"], n["R"])
    assert (r["sum_a_cents"], r["sum_n_cents"], r["sum_r_cents"]) == (
        s["A"],
        s["N"],
        s["R"],
    )
    assert r["w_e6"] == math.floor(w * 1e6 + 0.5001)
    # A variance test statistic is non-negative up to the e6 floor
    assert r["w_e6"] >= -1


# ------------------------------------------------ Good-Turing (trigrams)


def _trigrams(text: str) -> list[str]:
    ws = text.split(" ")
    hi = max(len(ws) - 2, 1)
    return [" ".join(ws[i : i + 3]) for i in range(hi)]


def test_good_turing_matches_python_reference(spark):
    freq: dict[str, int] = defaultdict(int)
    for r in load_table(spark, "documents", SF).select("text").collect():
        for g in _trigrams(r["text"]):
            freq[g] += 1
    fof: dict[int, int] = defaultdict(int)
    for f in freq.values():
        fof[f] += 1
    total = sum(freq.values())
    n_types = len(freq)
    n1 = fof.get(1, 0)
    rows = QUERIES["text_good_turing_unseen"](spark, SF).collect()
    expect_rs = sorted(f for f in fof if f <= 5)
    assert [r["r"] for r in rows] == expect_rs
    for r in rows:
        f = r["r"]
        assert r["n_types_r"] == fof[f]
        assert r["n_types_r1"] == fof.get(f + 1, 0)
        assert r["r_star_e6"] == tdiv(
            (f + 1) * fof.get(f + 1, 0) * 10**6, fof[f]
        )
        assert r["total_tokens"] == total
        assert r["n_types"] == n_types
        assert r["p_unseen_e6"] == tdiv(n1 * 10**6, total)
    # the synthetic corpus has a live trigram tail: singletons exist
    assert rows and rows[0]["r"] == 1 and rows[0]["n_types_r"] > 0


# --------------------------------------------------- Bridges (cut edges)


def _python_backbone(spark) -> list[tuple[int, int, int]]:
    """(a, b, w) backbone edges — the _backbone_edges contract."""
    li = (
        load_table(spark, "lineitem", SF)
        .select("l_orderkey", "l_suppkey")
        .collect()
    )
    okey = {
        r["o_orderkey"]: r["o_custkey"]
        for r in load_table(spark, "orders", SF)
        .select("o_orderkey", "o_custkey")
        .collect()
    }
    cnat = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load_table(spark, "customer", SF)
        .select("c_custkey", "c_nationkey")
        .collect()
    }
    snat = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in load_table(spark, "supplier", SF)
        .select("s_suppkey", "s_nationkey")
        .collect()
    }
    w: dict[tuple[int, int], int] = defaultdict(int)
    for r in li:
        src = cnat[okey[r["l_orderkey"]]]
        dst = snat[r["l_suppkey"]]
        if src != dst:
            w[(min(src, dst), max(src, dst))] += 1
    ranked = sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))
    keep = math.ceil(len(ranked) / 10.0)
    return [(a, b, ww) for (a, b), ww in ranked[:keep]]


def _n_components(nodes: set[int], edges: list[tuple[int, int]]) -> int:
    parent = {v: v for v in nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return len({find(v) for v in nodes})


def test_bridges_matches_python_reference(spark):
    bb = _python_backbone(spark)
    nodes = {a for a, _, _ in bb} | {b for _, b, _ in bb}
    all_edges = [(a, b) for a, b, _ in bb]
    base = _n_components(nodes, all_edges)
    names = {
        r["n_nationkey"]: r["n_name"]
        for r in load_table(spark, "nation", SF)
        .select("n_nationkey", "n_name")
        .collect()
    }
    expect = {}
    for a, b, w in bb:
        without = [(x, y) for x, y in all_edges if (x, y) != (a, b)]
        expect[(names[a], names[b])] = (
            w,
            _n_components(nodes, without),
            base,
        )
    rows = QUERIES["graph_bridges"](spark, SF).collect()
    assert len(rows) == len(bb)
    for r in rows:
        w, n_comp, base_comp = expect[(r["a_name"], r["b_name"])]
        assert r["w"] == w
        assert r["components_without"] == n_comp
        assert r["components_base"] == base_comp
        assert r["is_bridge"] == (n_comp > base_comp)
    # the sparsified backbone is a sparse graph: at least one bridge
    # exists at this sf (a known-positive canary for the detector)
    assert any(r["is_bridge"] for r in rows)
