"""Property-based differential testing of the round-12 operators.

The fixture-backed reference tests (test_round12_ops.py) pin one data
shape; these fuzz the boundary algebra — tie-heavy price grids where
the weighted-median crossing lands exactly on half the pair mass,
degenerate single-source corpora where the Heaps OLS denominator
vanishes to NULL, and random multigraphs whose top-decile backbone
sparsification interacts with the articulation fixpoint. Operators are
exercised through their registered query functions with `load_table`
patched to serve synthetic frames (the test_property_round7.py
convention)."""

from __future__ import annotations

import pytest

import math
from collections import defaultdict
from contextlib import contextmanager

from hypothesis import HealthCheck, assume, given, settings
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


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# ------------------------------------------------- Hodges-Lehmann shift

hl_rows = st.lists(
    st.tuples(
        st.sampled_from(["A", "R", "N"]),  # N rows must be ignored
        st.integers(min_value=0, max_value=40),  # $100-grid cell
        st.integers(min_value=0, max_value=99),  # within-cell cents
    ),
    min_size=2,
    max_size=80,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(hl_rows)
@pytest.mark.slow
def test_hodges_lehmann_fuzz(spark, rows):
    from gotsdb_spark.operators import inference
    from gotsdb_spark.operators.registry import QUERIES

    assume(any(f == "A" for f, _, _ in rows))
    assume(any(f == "R" for f, _, _ in rows))
    li = spark.createDataFrame(
        [(f, g * 100.0 + c / 100.0) for f, g, c in rows],
        "l_returnflag STRING, l_extendedprice DOUBLE",
    )
    ga: dict[int, int] = defaultdict(int)
    gr: dict[int, int] = defaultdict(int)
    for f, g, c in rows:
        cell = math.floor((g * 100.0 + c / 100.0) * 100) // 10000
        if f == "A":
            ga[cell] += 1
        elif f == "R":
            gr[cell] += 1
    diffs: dict[int, int] = defaultdict(int)
    for a, ca in ga.items():
        for b, cb in gr.items():
            diffs[a - b] += ca * cb
    n_a, n_r = sum(ga.values()), sum(gr.values())
    cum, hl = 0, None
    for d in sorted(diffs):
        cum += diffs[d]
        if 2 * cum >= n_a * n_r:
            hl = d
            break
    with _patched(inference, {"lineitem": li}):
        out = QUERIES["stats_hodges_lehmann_shift"](spark, SF).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_a"], r["n_r"], r["n_pairs"]) == (n_a, n_r, n_a * n_r)
    assert r["hl_shift_usd100"] == hl
    assert r["hl_shift_cents"] == hl * 10000


# ---------------------------------------------------- Heaps-law OLS

heaps_corpus = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2", "s3", "s4"]),
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
            min_size=1,
            max_size=8,
        ),
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(heaps_corpus)
@pytest.mark.slow
def test_heaps_law_fuzz(spark, docs):
    from gotsdb_spark.operators import text
    from gotsdb_spark.operators.registry import QUERIES

    frame = spark.createDataFrame(
        [(s, " ".join(ws)) for s, ws in docs], "source STRING, text STRING"
    )
    toks: dict[str, int] = defaultdict(int)
    types: dict[str, set] = defaultdict(set)
    for s, ws in docs:
        toks[s] += len(ws)
        types[s].update(ws)
    pts = [
        (
            math.floor(math.log(toks[s]) * 1e9 + 0.5001),
            math.floor(math.log(len(types[s])) * 1e9 + 0.5001),
        )
        for s in toks
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    den = n * sxx - sx * sx
    num = n * sxy - sx * sy
    with _patched(text, {"documents": frame}):
        out = QUERIES["text_heaps_law_fit"](spark, SF).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_sources"] == n
    assert r["sum_tokens"] == sum(toks.values())
    assert r["sum_types"] == sum(len(v) for v in types.values())
    if den == 0:
        # single source, or all sources the same token count on the e9
        # ln grid: the NULLIF guard must surface NULL, not divide
        assert r["beta_e6"] is None and r["lnk_e6"] is None
    else:
        assert r["beta_e6"] == tdiv(num * 10**6, den)
        assert r["lnk_e6"] == tdiv(sy * den - num * sx, n * den * 1000)


# ------------------------------------------------ articulation points

art_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=1, max_value=3),  # multiplicity (weight)
    ),
    min_size=1,
    max_size=14,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(art_edges)
@pytest.mark.slow
def test_articulation_fuzz(spark, edges):
    from gotsdb_spark.operators import graph
    from gotsdb_spark.operators.registry import QUERIES

    assume(any(a != b for a, b, _ in edges))
    # Synthesize the 4-table star so _backbone_edges sees exactly this
    # weighted nation multigraph: one customer and one supplier per
    # nation, one (order, lineitem) pair per unit of edge weight.
    cust = [(n, n) for n in range(6)]
    supp = [(n, n) for n in range(6)]
    orders, lineitem = [], []
    oid = 0
    for a, b, w in edges:
        for _ in range(w):
            orders.append((oid, a))
            lineitem.append((oid, b))
            oid += 1
    nation = [(n, f"N{n}") for n in range(6)]
    frames = {
        "customer": spark.createDataFrame(
            cust, "c_custkey LONG, c_nationkey LONG"
        ),
        "supplier": spark.createDataFrame(
            supp, "s_suppkey LONG, s_nationkey LONG"
        ),
        "orders": spark.createDataFrame(
            orders, "o_orderkey LONG, o_custkey LONG"
        ),
        "lineitem": spark.createDataFrame(
            lineitem, "l_orderkey LONG, l_suppkey LONG"
        ),
        "nation": spark.createDataFrame(
            nation, "n_nationkey LONG, n_name STRING"
        ),
    }
    # Python replica of the backbone: flows -> undirected weights ->
    # top-decile by (w DESC, a, b)
    flows: dict[tuple, int] = defaultdict(int)
    for a, b, w in edges:
        if a != b:
            flows[(min(a, b), max(a, b))] += w
    ranked = sorted(flows.items(), key=lambda kv: (-kv[1], kv[0]))
    keep = ranked[: math.ceil(len(ranked) / 10.0)]
    bb = [e for e, _ in keep]
    nodes = sorted({v for e in bb for v in e})
    adj = defaultdict(set)
    for a, b in bb:
        adj[a].add(b)
        adj[b].add(a)

    def n_comp(excluded):
        seen, comps = set(), 0
        for s in nodes:
            if s == excluded or s in seen:
                continue
            comps += 1
            stack = [s]
            seen.add(s)
            while stack:
                u = stack.pop()
                for v in adj[u]:
                    if v != excluded and v not in seen:
                        seen.add(v)
                        stack.append(v)
        return comps

    base = n_comp(None)
    want = {
        f"N{v}": (n_comp(v), base, n_comp(v) > base) for v in nodes
    }
    with _patched(graph, frames):
        got = {
            r["n_name"]: (
                r["components_without"],
                r["components_base"],
                r["is_articulation"],
            )
            for r in QUERIES["graph_articulation_points"](
                spark, SF
            ).collect()
        }
    assert got == want and want


# --------------------------------------------------------------- PACF

pacf_series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),  # day
        st.integers(min_value=0, max_value=9),  # value grid
    ),
    min_size=10,
    max_size=50,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(pacf_series)
@pytest.mark.slow
def test_pacf_fuzz(spark, rows):
    """Durbin-Levinson recursion vs a bit-for-bit Python replica of
    the identical expression trees, over fuzzed daily series; assumes
    away the degenerate inputs (missing lags, zero variances, vanishing
    recursion denominators) whose NULL/NaN surface is not the contract
    under test."""
    import datetime

    from gotsdb_spark.operators import inference
    from gotsdb_spark.operators.registry import QUERIES

    base = datetime.datetime(2025, 1, 1, 12, 0, 0)
    daily_sum: dict[int, list] = defaultdict(lambda: [0, 0])
    for d, v in rows:
        daily_sum[d][0] += math.floor(float(v) * 1000)
        daily_sum[d][1] += 1
    ys = {d: tdiv(s, c) for d, (s, c) in daily_sum.items()}

    rho = {}
    ok = True
    for lag in range(1, 6):
        pairs = [(ys[x], ys[x + lag]) for x in ys if (x + lag) in ys]
        n = len(pairs)
        if n < 3:
            ok = False
            break
        sa = sum(a for a, _ in pairs)
        sb = sum(b for _, b in pairs)
        sab = sum(a * b for a, b in pairs)
        saa = sum(a * a for a, _ in pairs)
        sbb = sum(b * b for _, b in pairs)
        var = (n * 1.0 * saa - sa * 1.0 * sa) * (
            n * 1.0 * sbb - sb * 1.0 * sb
        )
        if var <= 0:
            ok = False
            break
        rho[lag] = (
            math.floor(
                (n * 1.0 * sab - sa * 1.0 * sb) / math.sqrt(var) * 1e6
                + 0.5001
            )
            / 1e6
        )
    assume(ok)
    r1, r2, r3, r4, r5 = (rho[k] for k in range(1, 6))
    phi11 = r1
    den2 = 1.0 - phi11 * r1
    assume(abs(den2) > 1e-6)
    phi22 = (r2 - phi11 * r1) / den2
    phi21 = phi11 - phi22 * phi11
    den3 = 1.0 - (phi21 * r1 + phi22 * r2)
    assume(abs(den3) > 1e-6)
    phi33 = (r3 - (phi21 * r2 + phi22 * r1)) / den3
    phi31 = phi21 - phi33 * phi22
    phi32 = phi22 - phi33 * phi21
    den4 = 1.0 - (phi31 * r1 + phi32 * r2 + phi33 * r3)
    assume(abs(den4) > 1e-6)
    phi44 = (r4 - (phi31 * r3 + phi32 * r2 + phi33 * r1)) / den4
    phi41 = phi31 - phi44 * phi33
    phi42 = phi32 - phi44 * phi32
    phi43 = phi33 - phi44 * phi31
    den5 = 1.0 - (phi41 * r1 + phi42 * r2 + phi43 * r3 + phi44 * r4)
    assume(abs(den5) > 1e-6)
    phi55 = (
        r5 - (phi41 * r4 + phi42 * r3 + phi43 * r2 + phi44 * r1)
    ) / den5
    want = tuple(
        math.floor(p * 1e6 + 0.5001)
        for p in (phi11, phi22, phi33, phi44, phi55)
    )

    ev = spark.createDataFrame(
        [
            ("a", base + datetime.timedelta(days=d), float(v))
            for d, v in rows
        ],
        "event_type STRING, ts TIMESTAMP, value DOUBLE",
    )
    with _patched(inference, {"events": ev}):
        out = QUERIES["ts_pacf_daily"](spark, SF).collect()
    assert len(out) == 1
    got = tuple(out[0][f"pacf{k}_e6"] for k in range(1, 6))
    assert got == want


# -------------------------------------------------------------- bridges

br_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=1, max_value=3),  # multiplicity (weight)
    ),
    min_size=1,
    max_size=14,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(br_edges)
@pytest.mark.slow
def test_bridges_fuzz(spark, edges):
    from gotsdb_spark.operators import graph
    from gotsdb_spark.operators.registry import QUERIES

    assume(any(a != b for a, b, _ in edges))
    cust = [(n, n) for n in range(6)]
    supp = [(n, n) for n in range(6)]
    orders, lineitem = [], []
    oid = 0
    for a, b, w in edges:
        for _ in range(w):
            orders.append((oid, a))
            lineitem.append((oid, b))
            oid += 1
    nation = [(n, f"N{n}") for n in range(6)]
    frames = {
        "customer": spark.createDataFrame(
            cust, "c_custkey LONG, c_nationkey LONG"
        ),
        "supplier": spark.createDataFrame(
            supp, "s_suppkey LONG, s_nationkey LONG"
        ),
        "orders": spark.createDataFrame(
            orders, "o_orderkey LONG, o_custkey LONG"
        ),
        "lineitem": spark.createDataFrame(
            lineitem, "l_orderkey LONG, l_suppkey LONG"
        ),
        "nation": spark.createDataFrame(
            nation, "n_nationkey LONG, n_name STRING"
        ),
    }
    flows: dict[tuple, int] = defaultdict(int)
    for a, b, w in edges:
        if a != b:
            flows[(min(a, b), max(a, b))] += w
    ranked = sorted(flows.items(), key=lambda kv: (-kv[1], kv[0]))
    keep = ranked[: math.ceil(len(ranked) / 10.0)]
    bb = [e for e, _ in keep]
    bbw = dict(keep)
    nodes = sorted({v for e in bb for v in e})

    def n_comp(excluded_edge):
        adj = defaultdict(set)
        for a, b in bb:
            if (a, b) != excluded_edge:
                adj[a].add(b)
                adj[b].add(a)
        seen, comps = set(), 0
        for s in nodes:
            if s in seen:
                continue
            comps += 1
            stack = [s]
            seen.add(s)
            while stack:
                u = stack.pop()
                for v in adj[u]:
                    if v not in seen:
                        seen.add(v)
                        stack.append(v)
        return comps

    base = n_comp(None)
    want = {
        (f"N{a}", f"N{b}"): (bbw[(a, b)], n_comp((a, b)), base,
                             n_comp((a, b)) > base)
        for a, b in bb
    }
    with _patched(graph, frames):
        got = {
            (r["a_name"], r["b_name"]): (
                r["w"],
                r["components_without"],
                r["components_base"],
                r["is_bridge"],
            )
            for r in QUERIES["graph_bridges"](spark, SF).collect()
        }
    assert got == want and want


# ---------------------------------------------------------- Good-Turing

gt_docs = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(gt_docs)
@pytest.mark.slow
def test_good_turing_fuzz(spark, docs):
    """Random tiny corpora over a 4-letter alphabet: repeated docs
    drive trigram counts past the r <= 5 spine (the empty-result arm
    the sf1 fixture pins), single docs keep everything at f = 1; the
    short-doc arm (< 3 words) exercises the greatest(n-2, 1) partial
    shingle in BOTH engines — Spark is compared against the Python
    reference AND the DuckDB oracle is run on the same corpus, so the
    oracle's array_to_string partial-shingle arm (not just the
    fixture's all-long-docs path) is pinned here."""
    import duckdb
    import pandas as pd

    from gotsdb_spark.operators import text
    from gotsdb_spark.operators.registry import QUERIES

    texts = [" ".join(ws) for ws in docs]
    frame = spark.createDataFrame([(t,) for t in texts], "text STRING")

    freq: dict[str, int] = defaultdict(int)
    for t in texts:
        ws = t.split(" ")
        for i in range(max(len(ws) - 2, 1)):
            freq[" ".join(ws[i : i + 3])] += 1
    fof: dict[int, int] = defaultdict(int)
    for f in freq.values():
        fof[f] += 1
    total = sum(freq.values())
    n_types = len(freq)
    n1 = fof.get(1, 0)
    want = {
        f: (
            fof[f],
            fof.get(f + 1, 0),
            tdiv((f + 1) * fof.get(f + 1, 0) * 10**6, fof[f]),
            total,
            n_types,
            tdiv(n1 * 10**6, total),
        )
        for f in fof
        if f <= 5
    }
    with _patched(text, {"documents": frame}):
        rows = QUERIES["text_good_turing_unseen"](spark, SF).collect()
    got = {
        r["r"]: (
            r["n_types_r"],
            r["n_types_r1"],
            r["r_star_e6"],
            r["total_tokens"],
            r["n_types"],
            r["p_unseen_e6"],
        )
        for r in rows
    }
    assert got == want

    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"text": texts}))
    oracle = {
        r: (ntr, ntr1, rstar, tot_, ntyp, pun)
        for r, ntr, ntr1, rstar, tot_, ntyp, pun in con.execute(
            text.GOOD_TURING_ORACLE
        ).fetchall()
    }
    con.close()
    assert oracle == want
