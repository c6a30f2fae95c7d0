"""Property-based differential testing of the round-9 statistics,
graph, audit, and symbolization machinery.

The fixture-backed reference tests (test_round9_ops.py) pin one data
shape; these fuzz the boundary algebra — tie-heavy grids, minimal
groups, isolated graph nodes, self-loops, exact-duplicate key combos,
series exactly at the PAA segment count — where an off-by-one in the
lower-median rule, the integer L1 normalization, the Expand distinct,
or the i*P DIV n segment assignment would hide. Operators are
exercised through their registered query functions with `load_table`
patched to serve synthetic frames (the test_property_round7.py
convention)."""

from __future__ import annotations

import pytest

import datetime
import math
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


def _e6(v: float) -> int:
    return math.floor(v * 1e6 + 0.5001)


# --------------------------------------------------------------- Welch

welch_rows = st.lists(
    st.tuples(
        st.sampled_from(["A", "R", "N"]),
        st.integers(min_value=0, max_value=9),  # cents/100 — heavy ties
    ),
    min_size=4,
    max_size=100,
).filter(
    lambda rows: len({c for f, c in rows if f == "A"}) >= 2
    and len({c for f, c in rows if f == "R"}) >= 2
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=welch_rows)
def test_welch_fuzz(spark, rows):
    """t and the Welch-Satterthwaite df must match the direct Python
    evaluation of the shared expressions on exact integer moments —
    including groups of 2 (the df denominator's n-1 = 1 floor) and
    the N rows the A/R filter must drop."""
    import gotsdb_spark.operators.inference as mod

    df = spark.createDataFrame(
        [(f, float(c)) for f, c in rows],
        "l_returnflag string, l_extendedprice double",
    )
    with _patched(mod, {"lineitem": df}):
        row = mod.stats_welch_ttest(spark, SF).collect()[0]
    a = [c * 100 for f, c in rows if f == "A"]
    r = [c * 100 for f, c in rows if f == "R"]
    n_a, n_r, s_a, s_r = len(a), len(r), sum(a), sum(r)
    q_a, q_r = sum(x * x for x in a), sum(x * x for x in r)
    va = (float(q_a) - float(s_a) * float(s_a) / float(n_a)) / (float(n_a) - 1.0)
    vr = (float(q_r) - float(s_r) * float(s_r) / float(n_r)) / (float(n_r) - 1.0)
    se2 = va / float(n_a) + vr / float(n_r)
    t = (float(s_a) / float(n_a) - float(s_r) / float(n_r)) / math.sqrt(se2)
    dfree = (se2 * se2) / (
        (va / float(n_a)) * (va / float(n_a)) / (float(n_a) - 1.0)
        + (vr / float(n_r)) * (vr / float(n_r)) / (float(n_r) - 1.0)
    )
    assert (row["n_a"], row["n_r"]) == (n_a, n_r), rows
    assert row["mean_a_c_e2"] == s_a * 100 // n_a
    assert row["mean_r_c_e2"] == s_r * 100 // n_r
    assert row["t_e6"] == _e6(t)
    assert row["df_e6"] == _e6(dfree)


# --------------------------------------------------------- Jarque-Bera

jb_rows = st.lists(
    st.tuples(
        st.sampled_from(["A", "R"]),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=4,
    max_size=100,
).filter(
    lambda rows: all(
        len({c for f2, c in rows if f2 == f}) >= 2
        for f in {f for f, _ in rows}
    )
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=jb_rows)
def test_jarque_bera_fuzz(spark, rows):
    """Raw-to-central moment conversion must match the direct Python
    mirror on tie-heavy two-point-ish distributions, where m3 and m4
    cancellation is at its worst relative to magnitude."""
    import gotsdb_spark.operators.inference as mod

    df = spark.createDataFrame(
        [(f, float(c)) for f, c in rows],
        "l_returnflag string, l_extendedprice double",
    )
    with _patched(mod, {"lineitem": df}):
        got = {
            r["flag"]: r for r in mod.stats_jarque_bera(spark, SF).collect()
        }
    groups: dict = {}
    for f, c in rows:
        groups.setdefault(f, []).append(c * 100)
    assert set(got) == set(groups)
    for flag, cs in groups.items():
        n = len(cs)
        s1 = sum(cs)
        s2 = sum(c * c for c in cs)
        s3 = sum(c * c * c for c in cs)
        s4 = sum(c * c * c * c for c in cs)
        mu = float(s1) / float(n)
        m2 = float(s2) / float(n) - mu * mu
        m3 = (
            float(s3) / float(n)
            - 3.0 * mu * float(s2) / float(n)
            + 2.0 * mu * mu * mu
        )
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
        assert row["n"] == n, rows
        assert row["skew_e6"] == _e6(skew)
        assert row["kurt_e6"] == _e6(kurt)
        assert row["jb_e3"] == math.floor(jb * 1e3 + 0.5001)


# ---------------------------------------------------------------- HITS

hits_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # src nation
        st.integers(min_value=0, max_value=4),  # dst nation (self-loops OK)
        st.integers(min_value=1, max_value=3),  # weight (fact rows)
    ),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=hits_edges)
@pytest.mark.slow
def test_hits_fuzz(spark, edges):
    """The e9 integer fixed-point trajectory must match the Python
    integer mirror EXACTLY (no tolerance) — including isolated nations
    (score decays to 0), self-loops, and parallel edges (weights sum
    through the fact aggregation)."""
    import gotsdb_spark.operators.graph as mod

    nations = list(range(6))  # node 5 always isolated
    nation_df = spark.createDataFrame(
        [(v, f"N{v}") for v in nations], "n_nationkey bigint, n_name string"
    )
    customer_df = spark.createDataFrame(
        [(v, v) for v in nations], "c_custkey bigint, c_nationkey bigint"
    )
    supplier_df = spark.createDataFrame(
        [(v, v) for v in nations], "s_suppkey bigint, s_nationkey bigint"
    )
    orders_rows = [(k, src) for k, (src, _, _) in enumerate(edges)]
    lineitem_rows = [
        (k, dst)
        for k, (_, dst, w) in enumerate(edges)
        for _ in range(w)
    ]
    orders_df = spark.createDataFrame(
        orders_rows, "o_orderkey bigint, o_custkey bigint"
    )
    lineitem_df = spark.createDataFrame(
        lineitem_rows, "l_orderkey bigint, l_suppkey bigint"
    )
    with _patched(
        mod,
        {
            "nation": nation_df,
            "customer": customer_df,
            "supplier": supplier_df,
            "orders": orders_df,
            "lineitem": lineitem_df,
        },
    ):
        got = {
            r["n_name"]: r
            for r in mod.graph_hits_nations(spark, SF).collect()
        }
    flows: dict = {}
    for src, dst, w in edges:
        flows[(src, dst)] = flows.get((src, dst), 0) + w
    ONE = 1_000_000_000
    h = {v: ONE for v in nations}
    a = {v: 0 for v in nations}
    for _ in range(3):
        a = {v: 0 for v in nations}
        for (s, d), w in flows.items():
            a[d] += w * h[s]
        sa = sum(a.values())
        a = {v: x * ONE // sa for v, x in a.items()}
        h = {v: 0 for v in nations}
        for (s, d), w in flows.items():
            h[s] += w * a[d]
        sh = sum(h.values())
        h = {v: x * ONE // sh for v, x in h.items()}
    assert set(got) == {f"N{v}" for v in nations}, edges
    for v in nations:
        assert got[f"N{v}"]["hub_e9"] == h[v], edges
        assert got[f"N{v}"]["auth_e9"] == a[v], edges


# ------------------------------------------------------ candidate keys

ck_rows = st.lists(
    st.tuples(
        # custkey — heavy reuse, with NULLs: multi-column distinct must
        # count tuples containing NULL (DuckDB ROW semantics), which
        # Spark's bare countDistinct(a, b) silently drops — the struct
        # form under test keeps them.
        st.one_of(st.none(), st.integers(min_value=1, max_value=6)),
        st.integers(min_value=0, max_value=3),  # date offset
        st.integers(min_value=1, max_value=4),  # cents/100
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ck_rows)
def test_candidate_keys_fuzz(spark, rows):
    """Combination cardinalities from the single-scan Expand must match
    Python set sizes — with duplicate-heavy rows the superset-combo
    monotonicity and the is_key boundary are both exercised."""
    import gotsdb_spark.operators.quality as mod

    base = datetime.date(2025, 1, 1)
    data = [
        (i, ck, base + datetime.timedelta(days=d), float(c))
        for i, (ck, d, c) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "o_orderkey bigint, o_custkey bigint, o_orderdate date,"
        " o_totalprice double",
    )
    with _patched(mod, {"orders": df}):
        got = {
            r["combo"]: r
            for r in mod.quality_candidate_keys(spark, SF).collect()
        }
    n = len(rows)
    combos = {
        "o_orderkey": len({i for i in range(n)}),
        "o_custkey,o_orderdate": len({(ck, d) for ck, d, _ in rows}),
        "o_orderdate": len({d for _, d, _ in rows}),
        "o_custkey,o_orderdate,o_totalprice": len(set(rows)),
    }
    for combo, d in combos.items():
        row = got[combo]
        assert row["n_rows"] == n, rows
        assert row["n_distinct"] == d, (combo, rows)
        assert row["dup_rows"] == n - d
        assert row["uniqueness_e6"] == d * 10**6 // n
        assert row["is_key"] == (1 if d == n else 0)


# ----------------------------------------------------------------- SAX

sax_series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),  # day
        st.integers(min_value=0, max_value=50),  # value (integral -> exact)
    ),
    min_size=1,
    max_size=30,
).map(lambda pts: sorted({d: v for d, v in pts}.items()))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pts=sax_series)
def test_sax_fuzz(spark, pts):
    """PAA segment assignment (i*P DIV n), the n >= P cutoff, and the
    breakpoint CASE must match the Python mirror — series of exactly
    8, 9, and sub-8 days are the boundary the strategy hits often."""
    import gotsdb_spark.operators.timeseries as mod

    ys = [v for _, v in pts]
    if len({v for v in ys}) < 2:
        return  # constant series: sigma 0 — excluded by real data
    base = datetime.datetime(2025, 1, 1)
    data = [
        (i, base + datetime.timedelta(days=d), "E", float(v))
        for i, (d, v) in enumerate(pts)
    ]
    df = spark.createDataFrame(
        data, "event_id bigint, ts timestamp, event_type string, value double"
    )
    with _patched(mod, {"events": df}):
        got = mod.ts_sax_symbolic(spark, SF).collect()
    P, BP = 8, 0.6745
    n = len(ys)
    if n < P:
        assert got == [], pts
        return
    ys_e3 = [v * 1000 for v in ys]
    s1, s2 = sum(ys_e3), sum(y * y for y in ys_e3)
    mu = float(s1) / float(n)
    sig = math.sqrt(float(s2) / float(n) - mu * mu)
    segsum: dict = {}
    segcnt: dict = {}
    for i, y in enumerate(ys_e3):
        s = i * P // n
        segsum[s] = segsum.get(s, 0) + y
        segcnt[s] = segcnt.get(s, 0) + 1
    word = ""
    for s in sorted(segsum):
        z = (float(segsum[s]) / float(segcnt[s]) - mu) / sig
        word += "a" if z < -BP else "b" if z < 0.0 else "c" if z < BP else "d"
    assert len(got) == 1
    row = got[0]
    assert row["n_days"] == n, pts
    assert row["mean_e3"] == s1 // n
    assert row["sax"] == word, pts


# ------------------------------------------------------ Brown-Forsythe

bf_rows = st.lists(
    st.tuples(
        st.sampled_from(["A", "N", "R"]),
        st.integers(min_value=0, max_value=6),  # cents/100 — heavy ties
    ),
    min_size=6,
    max_size=100,
).filter(
    lambda rows: all(
        len({c for f2, c in rows if f2 == f}) >= 2 for f in ("A", "N", "R")
    )
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=bf_rows)
@pytest.mark.slow
def test_brown_forsythe_fuzz(spark, rows):
    """The lower-median rule (cc*2 >= n) and the deviation moments must
    match the sequential Python walk on tie-heavy grids — even-sized
    groups whose two middle values differ are the boundary where an
    upper/lower median mixup flips every deviation."""
    import gotsdb_spark.operators.statistics as mod

    df = spark.createDataFrame(
        [(f, float(c)) for f, c in rows],
        "l_returnflag string, l_extendedprice double",
    )
    with _patched(mod, {"lineitem": df}):
        row = mod.stats_brown_forsythe(spark, SF).collect()[0]
    groups: dict = {"A": [], "N": [], "R": []}
    for f, c in rows:
        groups[f].append(c * 100)

    def lower_median(vals):
        sv = sorted(vals)
        nn = len(sv)
        cc = 0
        seen: dict = {}
        for v in sv:
            seen[v] = seen.get(v, 0) + 1
        for v in sorted(seen):
            cc += seen[v]
            if cc * 2 >= nn:
                return v

    med = {g: lower_median(v) for g, v in groups.items()}
    n = {g: len(v) for g, v in groups.items()}
    s = {g: sum(abs(x - med[g]) for x in v) for g, v in groups.items()}
    qq = sum(abs(x - med[g]) ** 2 for g, v in groups.items() for x in v)
    nn = sum(n.values())
    ss = sum(s.values())
    a = (
        float(s["A"]) * float(s["A"]) / float(n["A"])
        + float(s["N"]) * float(s["N"]) / float(n["N"])
        + float(s["R"]) * float(s["R"]) / float(n["R"])
    )
    grand = float(ss) * float(ss) / float(nn)
    denom = (float(qq) - a) / (float(nn) - 3.0)
    if denom == 0.0:
        return  # degenerate: every group's deviations identical
    f_stat = ((a - grand) / 2.0) / denom
    assert row["n"] == nn, rows
    assert (row["med_a_cents"], row["med_n_cents"], row["med_r_cents"]) == (
        med["A"],
        med["N"],
        med["R"],
    )
    assert row["f_e6"] == _e6(f_stat), rows


# ---------------------------------------------------------- k-core peel

kc_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # src nation
        st.integers(min_value=0, max_value=9),  # dst nation
        st.integers(min_value=1, max_value=4),  # weight (fact rows)
    ),
    min_size=2,
    max_size=40,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=kc_edges)
@pytest.mark.slow
def test_kcore_fuzz(spark, edges):
    """The strong-edge cut (w*n > t), the three synchronous peel
    rounds, and the degree bookkeeping must match the Python walk on
    random graphs — including runs where the cut keeps nothing and
    runs where everything survives."""
    import gotsdb_spark.operators.graph as mod

    nations = list(range(10))
    frames = {
        "nation": spark.createDataFrame(
            [(v, f"N{v}") for v in nations],
            "n_nationkey bigint, n_name string",
        ),
        "customer": spark.createDataFrame(
            [(v, v) for v in nations], "c_custkey bigint, c_nationkey bigint"
        ),
        "supplier": spark.createDataFrame(
            [(v, v) for v in nations], "s_suppkey bigint, s_nationkey bigint"
        ),
        "orders": spark.createDataFrame(
            [(k, src) for k, (src, _, _) in enumerate(edges)],
            "o_orderkey bigint, o_custkey bigint",
        ),
        "lineitem": spark.createDataFrame(
            [(k, dst) for k, (_, dst, w) in enumerate(edges) for _ in range(w)],
            "l_orderkey bigint, l_suppkey bigint",
        ),
    }
    with _patched(mod, frames):
        got = {
            r["node"]: r for r in mod.graph_kcore_nations(spark, SF).collect()
        }
    flows: dict = {}
    for src, dst, w in edges:
        flows[(src, dst)] = flows.get((src, dst), 0) + w
    t = sum(flows.values())
    nf = len(flows)
    ue = {
        (min(s, d), max(s, d))
        for (s, d), w in flows.items()
        if s != d and w * nf > t
    }
    nodes = {a for a, _ in ue} | {b for _, b in ue}
    deg0 = {v: sum(1 for a, b in ue if v in (a, b)) for v in nodes}
    alive = set(nodes)
    deg = dict(deg0)
    K = mod._KC_K
    for _ in range(mod._KC_ROUNDS):
        live = [(a, b) for a, b in ue if a in alive and b in alive]
        deg = {v: sum(1 for a, b in live if v in (a, b)) for v in alive}
        alive = {v for v in alive if deg[v] >= K}
    assert set(got) == nodes, edges
    for v in nodes:
        assert got[v]["degree_initial"] == deg0[v], edges
        assert got[v]["in_core"] == (1 if v in alive else 0), edges
        assert got[v]["degree_final"] == (deg[v] if v in alive else 0), edges


# ----------------------------------------------------------- 3D skyline

sky_parts = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),  # retail dollars (exact)
        st.integers(min_value=1, max_value=5),  # size
        st.integers(min_value=0, max_value=6),  # demand (lineitems)
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(parts=sky_parts)
@pytest.mark.slow
def test_skyline_3d_fuzz(spark, parts):
    """The cell-grid sweep must return EXACTLY the non-dominated
    (dollar, size) cells of the quadratic definition — tie-heavy grids
    where several cells share a dollar or a best-demand value are the
    staircase boundary."""
    import gotsdb_spark.operators.relational as mod

    part_rows = [
        (i, float(d), s) for i, (d, s, _) in enumerate(parts)
    ]
    li_rows = [
        (i,) for i, (_, _, dem) in enumerate(parts) for _ in range(dem)
    ]
    frames = {
        "part": spark.createDataFrame(
            part_rows, "p_partkey bigint, p_retailprice double, p_size bigint"
        ),
        "lineitem": spark.createDataFrame(li_rows, "l_partkey bigint")
        if li_rows
        else spark.createDataFrame([], "l_partkey bigint"),
    }
    with _patched(mod, frames):
        got = {
            (r["dollars"], r["p_size"]): (r["best_demand"], r["n_parts"])
            for r in mod.skyline_3d_price_size_demand(spark, SF).collect()
        }
    dem_by_part = {}
    for i, (_, _, dem) in enumerate(parts):
        dem_by_part[i] = dem
    cells: dict = {}
    for i, (d, s, _) in enumerate(parts):
        cells.setdefault((d, s), []).append(dem_by_part[i])
    best = {k: max(v) for k, v in cells.items()}
    want = {}
    for (d, s), m in best.items():
        dominated = any(
            d2 <= d and s2 >= s and m2 >= m and (d2, s2) != (d, s)
            for (d2, s2), m2 in best.items()
        )
        if not dominated:
            want[(d, s)] = (m, sum(1 for x in cells[(d, s)] if x == m))
    assert got == want, parts


# ----------------------------------------- damped + seasonal Holt-Winters

hw_series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=24),  # day
        st.integers(min_value=0, max_value=40),  # value (integral)
    ),
    min_size=1,
    max_size=25,
).map(lambda pts: sorted({d: v for d, v in pts}.items()))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pts=hw_series)
@pytest.mark.slow
def test_hw_damped_seasonal_fuzz(spark, pts):
    """The struct fold must walk the identical (level, trend, seasonal
    ring) trajectory as the Python recursion on arbitrary day gaps —
    series AT the 2m+1 cutoff and just under it are the registration
    boundary."""
    import gotsdb_spark.operators.timeseries as mod

    base = datetime.datetime(2025, 1, 1)
    data = [
        (i, base + datetime.timedelta(days=d), "E", float(v))
        for i, (d, v) in enumerate(pts)
    ]
    df = spark.createDataFrame(
        data, "event_id bigint, ts timestamp, event_type string, value double"
    )
    with _patched(mod, {"events": df}):
        got = {
            r["event_type"]: r
            for r in mod.ts_holt_winters_damped_seasonal(spark, SF).collect()
        }
    ys = [v * 1000 for _, v in pts]  # y_e3 (one event/day -> exact mean)
    a, bt, g, ph, m = 0.5, 0.3, 0.2, 0.9, 7
    if len(ys) < 2 * m + 1:
        assert got == {}, pts
        return

    def r9(v):
        return math.floor(v * 1e9 + 0.5) / 1e9

    l = r9(sum(ys[:7]) / 7000.0)
    b = r9((sum(ys[7:14]) - sum(ys[:7])) / 49000.0)
    seas = [r9(v / 1000.0 - l) for v in ys[:7]]
    for y_e3 in ys[m:]:
        y = y_e3 / 1000.0
        s1 = seas[0]
        lnew = r9(a * (y - s1) + (1 - a) * (l + ph * b))
        bnew = r9(bt * (lnew - l) + (1 - bt) * ph * b)
        snew = r9(g * (y - lnew) + (1 - g) * s1)
        l, b = lnew, bnew
        seas = seas[1:] + [snew]
    hsum = sum(ph**k for k in range(1, 8))
    row = got["E"]
    assert row["n_days"] == len(ys), pts
    assert row["level_e6"] == _e6(l), pts
    assert row["trend_e6"] == _e6(b)
    assert row["season_e6"] == _e6(seas[0])
    assert row["forecast_e6"] == _e6(l + ph * b + seas[0])
    assert row["forecast_h7_e6"] == _e6(l + hsum * b + seas[0])


# ------------------------------------------------------- per-source PSI

psi_docs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),  # doc_id
        st.sampled_from(["web", "book"]),
        st.integers(min_value=1, max_value=12),  # n_chars — heavy ties
    ),
    min_size=8,
    max_size=80,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=psi_docs)
@pytest.mark.slow
def test_psi_by_source_fuzz(spark, docs):
    """Per-source decile edges, add-one smoothing, and the e9 term
    floor must match the Python mirror on tie-saturated length
    dictionaries — sources whose md5-parity halves are lopsided are the
    boundary the fixture rarely hits."""
    import hashlib

    import gotsdb_spark.operators.quality as mod

    per_src: dict = {}
    for did, src, nc in docs:
        half = int(hashlib.md5(str(did).encode()).hexdigest()[:4], 16) % 2
        per_src.setdefault(src, ([], []))[half].append(nc)
    # the operator (like the fixture) assumes both halves non-empty per
    # source; skip generated shapes that break that precondition
    per_src = {
        s: (ref, cur) for s, (ref, cur) in per_src.items() if ref and cur
    }
    if not per_src:
        return
    df = spark.createDataFrame(
        [
            (did, src, nc)
            for did, src, nc in docs
            if src in per_src
        ],
        "doc_id bigint, source string, n_chars bigint",
    )
    with _patched(mod, {"documents": df}):
        got = {
            r["source"]: r
            for r in mod.quality_psi_by_source(spark, SF).collect()
        }
    assert set(got) == set(per_src), docs
    from collections import Counter

    def e9(v):
        return math.floor(v * 1e9 + 0.5001)

    for src, (ref, cur) in per_src.items():
        na, nb = len(ref), len(cur)
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
            psi += e9((pa - pb) * lr)
        row = got[src]
        assert (row["n_ref"], row["n_cur"]) == (na, nb), docs
        assert row["psi_e9"] == psi, docs
