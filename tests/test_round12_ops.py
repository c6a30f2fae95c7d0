"""Round-12 operator tests: independent Python reference
implementations for the new registered queries (the DuckDB hash gate
is the primary check; these pin semantics against a second, non-SQL
implementation — the round-7 convention)."""

from __future__ import annotations

import pytest

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


# ------------------------------------------------------ Heaps-law fit


def test_heaps_law_matches_python_reference(spark):
    toks: dict[str, int] = defaultdict(int)
    types: dict[str, set] = defaultdict(set)
    for r in (
        load_table(spark, "documents", SF).select("source", "text").collect()
    ):
        ws = r["text"].split(" ")
        toks[r["source"]] += len(ws)
        types[r["source"]].update(ws)
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
    row = QUERIES["text_heaps_law_fit"](spark, SF).collect()
    assert len(row) == 1
    r = row[0]
    assert r["n_sources"] == n
    assert r["sum_tokens"] == sum(toks.values())
    assert r["sum_types"] == sum(len(v) for v in types.values())
    assert r["beta_e6"] == tdiv(num * 10**6, den)
    assert r["lnk_e6"] == tdiv(sy * den - num * sx, n * den * 1000)
    # Heaps exponent of real-ish text sits strictly inside (0, 1)
    assert 0 < r["beta_e6"] < 10**6


# --------------------------------------------- Hodges-Lehmann shift


def test_hodges_lehmann_matches_python_reference(spark):
    ga: dict[int, int] = defaultdict(int)
    gr: dict[int, int] = defaultdict(int)
    for r in (
        load_table(spark, "lineitem", SF)
        .where(F.col("l_returnflag").isin("A", "R"))
        .select("l_returnflag", "l_extendedprice")
        .collect()
    ):
        g = math.floor(r["l_extendedprice"] * 100) // 10000
        (ga if r["l_returnflag"] == "A" else gr)[g] += 1
    diffs: dict[int, int] = defaultdict(int)
    for a, ca in ga.items():
        for b, cb in gr.items():
            diffs[a - b] += ca * cb
    n_a, n_r = sum(ga.values()), sum(gr.values())
    w_total = n_a * n_r
    cum = 0
    hl = None
    for d in sorted(diffs):
        cum += diffs[d]
        if 2 * cum >= w_total:
            hl = d
            break
    row = QUERIES["stats_hodges_lehmann_shift"](spark, SF).collect()
    assert len(row) == 1
    r = row[0]
    assert r["n_a"] == n_a and r["n_r"] == n_r
    assert r["n_pairs"] == w_total
    assert r["hl_shift_usd100"] == hl
    assert r["hl_shift_cents"] == hl * 10000


# ------------------------------------------------------------- PACF


def test_pacf_matches_python_reference(spark):
    daily: dict[tuple, list] = defaultdict(lambda: [0, 0])
    for r in (
        load_table(spark, "events", SF)
        .select("event_type", F.col("ts").cast("date").alias("d"), "value")
        .collect()
    ):
        key = (r["event_type"], r["d"])
        daily[key][0] += math.floor(r["value"] * 1000)
        daily[key][1] += 1
    series: dict[str, dict] = defaultdict(dict)
    for (et, d), (s, c) in daily.items():
        series[et][d.toordinal()] = tdiv(s, c)
    want = {}
    for et, ys in series.items():
        rho = {}
        for lag in range(1, 6):
            pairs = [
                (ys[x], ys[x + lag]) for x in ys if (x + lag) in ys
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
            rho[lag] = acf / 1e6
        r1, r2, r3, r4, r5 = (rho[k] for k in range(1, 6))
        phi11 = r1
        phi22 = (r2 - phi11 * r1) / (1.0 - phi11 * r1)
        phi21 = phi11 - phi22 * phi11
        phi33 = (r3 - (phi21 * r2 + phi22 * r1)) / (
            1.0 - (phi21 * r1 + phi22 * r2)
        )
        phi31 = phi21 - phi33 * phi22
        phi32 = phi22 - phi33 * phi21
        phi44 = (r4 - (phi31 * r3 + phi32 * r2 + phi33 * r1)) / (
            1.0 - (phi31 * r1 + phi32 * r2 + phi33 * r3)
        )
        phi41 = phi31 - phi44 * phi33
        phi42 = phi32 - phi44 * phi32
        phi43 = phi33 - phi44 * phi31
        phi55 = (
            r5 - (phi41 * r4 + phi42 * r3 + phi43 * r2 + phi44 * r1)
        ) / (1.0 - (phi41 * r1 + phi42 * r2 + phi43 * r3 + phi44 * r4))
        want[et] = tuple(
            math.floor(p * 1e6 + 0.5001)
            for p in (phi11, phi22, phi33, phi44, phi55)
        )
    got = {
        r["event_type"]: tuple(r[f"pacf{k}_e6"] for k in range(1, 6))
        for r in QUERIES["ts_pacf_daily"](spark, SF).collect()
    }
    assert got == want and want


# ----------------------------------------------- articulation points


@pytest.mark.slow
def test_articulation_matches_python_reference(spark):
    from gotsdb_spark.operators.graph import _backbone_edges

    edges = [
        (r["a"], r["b"])
        for r in _backbone_edges(spark, SF).select("a", "b").collect()
    ]
    nodes = sorted({v for e in edges for v in e})
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)

    def n_components(excluded):
        seen = set()
        comps = 0
        for start in nodes:
            if start == excluded or start in seen:
                continue
            comps += 1
            stack = [start]
            seen.add(start)
            while stack:
                u = stack.pop()
                for v in adj[u]:
                    if v != excluded and v not in seen:
                        seen.add(v)
                        stack.append(v)
        return comps

    base = n_components(None)
    names = {
        r["n_nationkey"]: r["n_name"]
        for r in load_table(spark, "nation", SF).collect()
    }
    want = {
        names[v]: (n_components(v), base, n_components(v) > base)
        for v in nodes
    }
    got = {
        r["n_name"]: (
            r["components_without"],
            r["components_base"],
            r["is_articulation"],
        )
        for r in QUERIES["graph_articulation_points"](spark, SF).collect()
    }
    assert got == want and want


# ------------------------------------------ session eviction audit


@pytest.mark.slow
def test_eviction_audit_matches_python_reference(spark):
    import datetime

    rows = sorted(
        (
            (r["user_id"], r["ts"], r["event_id"])
            for r in load_table(spark, "events", SF)
            .where(F.col("event_type") == "purchase")
            .select("user_id", "ts", "event_id")
            .collect()
        ),
        key=lambda t: (t[0], t[1], t[2]),
    )
    gap = datetime.timedelta(minutes=30)
    sessions = []  # (user, start, end_ts_last, n)
    for u, ts, _eid in rows:
        if sessions and sessions[-1][0] == u and ts - sessions[-1][2] <= gap:
            user, start, _last, n = sessions[-1]
            sessions[-1] = (user, start, ts, n + 1)
        else:
            sessions.append((u, ts, ts, 1))
    cut = datetime.datetime(2024, 1, 15)
    delay = datetime.timedelta(hours=2)
    t1 = max(ts for _, ts, _e in rows if ts < cut) - delay
    t2 = max(ts for _, ts, _e in rows) - delay
    agg = defaultdict(lambda: [0, set(), 0, 0])
    for u, start, last, n in sessions:
        send = last + gap
        wave = 1 if send < t1 else (2 if send < t2 else 3)
        a = agg[wave]
        a[0] += 1
        a[1].add(u)
        a[2] += n
        a[3] = max(a[3], int((send - start).total_seconds() * 1_000_000))
    got = {
        r["eviction_wave"]: (
            r["n_sessions"],
            r["n_users"],
            r["total_events"],
            r["max_duration_us"],
        )
        for r in QUERIES["streaming_session_eviction_audit"](
            spark, SF
        ).collect()
    }
    want = {
        w: (a[0], len(a[1]), a[2], a[3]) for w, a in agg.items()
    }
    assert got == want
    assert set(got) == {1, 2, 3}
