"""Round-13 sixth-batch operator tests: independent Python reference
implementations for the bivariate Theil-Sen estimator and the
second-principal-component deflation (the DuckDB hash gate is the
primary check; these pin semantics against a second, non-SQL
implementation — the round-7 convention)."""

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


# ------------------------------------------- bivariate Theil-Sen


def test_theil_sen_price_quantity_matches_python_reference(spark):
    rows = (
        load_table(spark, "lineitem", SF)
        .select(
            F.col("l_quantity").cast("bigint").alias("q"),
            F.floor(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .collect()
    )
    dic = defaultdict(int)
    for r in rows:
        dic[(r["q"], r["cents"] // 100000)] += 1
    cells = sorted(dic)
    slopes = defaultdict(int)
    for i, (qa, pa) in enumerate(cells):
        for qb, pb in cells:
            if qb > qa:
                s = tdiv((pb - pa) * 10**6, qb - qa)
                slopes[s] += dic[(qa, pa)] * dic[(qb, pb)]
    n_pairs = sum(slopes.values())
    cw = 0
    median = None
    for s in sorted(slopes):
        cw += slopes[s]
        if 2 * cw >= n_pairs:
            median = s
            break

    [r] = QUERIES["stats_theil_sen_price_quantity"](spark, SF).collect()
    assert r["n_points"] == len(rows)
    assert r["n_pairs"] == n_pairs
    assert r["theil_sen_slope_grid_e6"] == median


# -------------------------------------- second PC via deflation


def test_second_component_matches_python_reference(spark):
    vecs = [
        np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, "embeddings", SF)
        .select("embedding")
        .collect()
    ]
    d = len(vecs[0])
    g = np.zeros((d, d), dtype=object)
    for x in vecs:
        g += np.floor(np.outer(x, x) * 1e6 + 0.5001).astype(np.int64)

    def iterate(mat, iters):
        v = [10**6] * d
        for _ in range(iters):
            gv = [
                sum(int(mat[i][j]) * v[j] for j in range(d))
                for i in range(d)
            ]
            mx = max(abs(c) for c in gv)
            v = [tdiv(c * 10**6, mx) for c in gv]
        return v

    v1 = iterate(g, 3)
    gv = [sum(int(g[i][j]) * v1[j] for j in range(d)) for i in range(d)]
    den = sum(c * c for c in v1)
    lam = tdiv(sum(v1[i] * gv[i] for i in range(d)), den)
    g2 = np.array(
        [
            [int(g[i][j]) - tdiv(lam * v1[i] * v1[j], den) for j in range(d)]
            for i in range(d)
        ],
        dtype=object,
    )
    v2 = iterate(g2, 3)
    gw = [sum(int(g2[i][j]) * v2[j] for j in range(d)) for i in range(d)]
    ray2 = tdiv(
        sum(v2[i] * gw[i] for i in range(d)),
        sum(c * c for c in v2),
    )
    dot = sum(v1[i] * v2[i] for i in range(d))

    rows = QUERIES["embed_second_component"](spark, SF).collect()
    assert len(rows) == d
    for r in rows:
        i = r["dim"] - 1
        assert r["direction2_e6"] == v2[i]
        assert r["rayleigh2_gram_e6"] == ray2
        assert r["rayleigh1_gram_e6"] == lam
        assert r["dot_with_first"] == dot
    # spectrum ordering: the deflated Rayleigh quotient cannot exceed
    # the first (power iteration approximates the TOP eigenvalue)
    assert ray2 <= lam
    # deflation must leave the second direction far from parallel:
    # |v1.v2| / (|v1||v2|) < 0.2
    n1 = math.sqrt(sum(c * c for c in v1))
    n2 = math.sqrt(sum(c * c for c in v2))
    assert abs(dot) / (n1 * n2) < 0.2
