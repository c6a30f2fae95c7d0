"""Round-13 fifth-batch operator tests: independent Python reference
implementations for the power-iteration principal direction and the
BTYD frequency/recency summary (the DuckDB hash gate is the primary
check; these pin semantics against a second, non-SQL implementation —
the round-7 convention)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
from pyspark.sql import functions as F

from gotsdb_spark.operators.registry import QUERIES
from gotsdb_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# ------------------------------------------- principal direction


def test_principal_direction_matches_python_reference(spark):
    vecs = [
        np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, "embeddings", SF)
        .select("embedding")
        .collect()
    ]
    d = len(vecs[0])
    g = np.zeros((d, d), dtype=object)
    for x in vecs:
        prods = np.floor(np.outer(x, x) * 1e6 + 0.5001).astype(np.int64)
        g += prods
    # integer power iteration, max-abs normalization, 3 steps
    v = [10**6] * d
    for _ in range(3):
        gv = [sum(int(g[i][j]) * v[j] for j in range(d)) for i in range(d)]
        mx = max(abs(c) for c in gv)
        v = [tdiv(c * 10**6, mx) for c in gv]
    gv = [sum(int(g[i][j]) * v[j] for j in range(d)) for i in range(d)]
    num = sum(v[i] * gv[i] for i in range(d))
    den = sum(c * c for c in v)
    ray = tdiv(num, den)

    rows = QUERIES["embed_principal_direction"](spark, SF).collect()
    assert len(rows) == d
    for r in rows:
        i = r["dim"] - 1
        assert r["direction_e6"] == v[i]
        assert r["rayleigh_gram_e6"] == ray
    # max-abs normalization leaves at least one full-scale component
    assert max(abs(r["direction_e6"]) for r in rows) == 10**6
    # Rayleigh quotient of a PSD Gram matrix is non-negative and
    # bounded by the trace
    assert 0 <= ray <= sum(int(g[i][i]) for i in range(d))


# ------------------------------------------- BTYD frequency/recency


def test_btyd_frequency_recency_matches_python_reference(spark):
    rows = (
        load_table(spark, "orders", SF)
        .select(
            "o_custkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("bigint")
            .alias("m"),
        )
        .collect()
    )
    per_cust = defaultdict(list)
    for r in rows:
        per_cust[r["o_custkey"]].append(r["m"])
    m_end = max(r["m"] for r in rows)
    groups = defaultdict(lambda: [0, 0, 0])  # n, sum_tx, sum_T
    for ms in per_cust.values():
        x = len(ms) - 1
        a = groups[x]
        a[0] += 1
        a[1] += max(ms) - min(ms)
        a[2] += m_end - min(ms)

    got = {
        r["repeat_count"]: r
        for r in QUERIES["ts_btyd_frequency_recency"](spark, SF).collect()
    }
    assert set(got) == set(groups)
    for x, (n, s_tx, s_t) in groups.items():
        r = got[x]
        assert r["n_customers"] == n
        assert r["mean_recency_months_e3"] == tdiv(s_tx * 1000, n)
        assert r["mean_horizon_months_e3"] == tdiv(s_t * 1000, n)
        # recency never exceeds the observation horizon
        assert (
            r["mean_recency_months_e3"] <= r["mean_horizon_months_e3"]
        )
    # zero-repeat customers have zero recency by definition
    if 0 in got:
        assert got[0]["mean_recency_months_e3"] == 0
