"""Round-13 second-batch operator tests: independent Python reference
implementations for the three round-14-backlog queries pulled forward
(Q-Q drift, cohort repeat-purchase curve, token-budget planner) — the
DuckDB hash gate is the primary check; these pin semantics against a
second, non-SQL implementation (the round-7 convention)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from gotsdb_spark.operators.registry import QUERIES
from gotsdb_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero (Spark DIV, DuckDB //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# ---------------------------------------------------- Q-Q drift score


def test_qq_drift_matches_python_reference(spark):
    rows = (
        load_table(spark, "events", SF)
        .select(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("day"),
            F.floor(F.col("value") * 1000).cast("bigint").alias("v"),
        )
        .collect()
    )
    dmin = min(r["day"] for r in rows)
    dmax = max(r["day"] for r in rows)
    halves = defaultdict(list)
    for r in rows:
        half = 0 if 2 * r["day"] <= dmin + dmax else 1
        halves[(r["event_type"], half)].append(r["v"])

    def deciles(vs):
        vs = sorted(vs)
        n = len(vs)
        # exact lower decile: smallest v with 10*cc >= k*n over the
        # value dictionary == element at 1-based position ceil(k*n/10)
        return {k: vs[(k * n + 9) // 10 - 1] for k in range(1, 10)}

    got = {
        r["event_type"]: r
        for r in QUERIES["stats_qq_drift_value"](spark, SF).collect()
    }
    types = {et for et, _ in halves}
    assert set(got) == types
    for et in types:
        first, second = halves[(et, 0)], halves[(et, 1)]
        q0, q1 = deciles(first), deciles(second)
        devs = {k: abs(q0[k] - q1[k]) for k in range(1, 10)}
        mx = max(devs.values())
        r = got[et]
        assert r["n_first"] == len(first)
        assert r["n_second"] == len(second)
        assert r["qq_sum_abs_dev_e3"] == sum(devs.values())
        assert r["qq_max_dev_e3"] == mx
        assert r["max_dev_decile"] == min(
            k for k, d in devs.items() if d == mx
        )


# ------------------------------------- cohort repeat-purchase curve


def test_cohort_repeat_matches_python_reference(spark):
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
    first = {}
    for r in rows:
        c, m = r["o_custkey"], r["m"]
        if c not in first or m < first[c]:
            first[c] = m
    sizes = defaultdict(int)
    for m0 in first.values():
        sizes[m0] += 1
    active = defaultdict(set)
    for r in rows:
        m0 = first[r["o_custkey"]]
        active[(m0, r["m"] - m0)].add(r["o_custkey"])

    got = {
        (r["cohort_year"], r["cohort_month"], r["month_offset"]): r
        for r in QUERIES["ts_cohort_repeat_purchase"](spark, SF).collect()
    }
    assert len(got) == len(active)
    for (m0, off), custs in active.items():
        r = got[(m0 // 12, m0 % 12 + 1, off)]
        assert r["cohort_size"] == sizes[m0]
        assert r["active_customers"] == len(custs)
        assert r["repeat_rate_e6"] == tdiv(len(custs) * 10**6, sizes[m0])
        if off == 0:
            # offset 0 is definitionally the full cohort
            assert len(custs) == sizes[m0]


# --------------------------------------- token-budget waterfilling


def test_token_budget_matches_python_reference(spark):
    rows = (
        load_table(spark, "documents", SF)
        .select(
            "source",
            F.size(F.split("text", " ")).cast("long").alias("ntok"),
        )
        .collect()
    )
    tok = defaultdict(int)
    ndocs = defaultdict(int)
    for r in rows:
        tok[r["source"]] += r["ntok"]
        ndocs[r["source"]] += 1
    order = sorted(tok, key=lambda s: (tok[s], s))
    s_cnt = len(order)
    total = sum(tok.values())
    budget = total // 2
    cum = 0
    jstar, cum_tj = 0, 0
    for j, srcname in enumerate(order, start=1):
        cum += tok[srcname]
        if tok[srcname] * (s_cnt - j) <= budget - cum:
            jstar, cum_tj = j, cum
    lvl = (budget - cum_tj) // (s_cnt - jstar)
    extra = (budget - cum_tj) % (s_cnt - jstar)

    got = {
        r["source"]: r
        for r in QUERIES["curate_token_budget_planner"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(tok)
    total_alloc = 0
    for rk, srcname in enumerate(order, start=1):
        r = got[srcname]
        assert r["tokens_total"] == tok[srcname]
        assert r["n_docs"] == ndocs[srcname]
        assert r["size_rank"] == rk
        if rk <= jstar:
            expect = tok[srcname]
        elif rk > s_cnt - extra:
            expect = lvl + 1
        else:
            expect = lvl
        assert r["tokens_alloc"] == expect
        assert r["capped"] == (rk > jstar)
        assert r["keep_rate_e6"] == expect * 10**6 // tok[srcname]
        assert r["budget_tokens"] == budget
        # the waterfilling contract: alloc never exceeds the source
        assert r["tokens_alloc"] <= r["tokens_total"]
        total_alloc += r["tokens_alloc"]
    # allocations hit the budget EXACTLY
    assert total_alloc == budget
