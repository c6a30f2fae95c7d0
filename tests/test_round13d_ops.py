"""Round-13 fourth-batch operator tests: independent Python reference
implementations for fill-time SLA bands, tail co-exceedance, and the
streaming gap/outage audit (the DuckDB hash gate is the primary check;
these pin semantics against a second, non-SQL implementation — the
round-7 convention)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from gotsdb_spark.operators.registry import QUERIES
from gotsdb_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# ----------------------------------------------- fill-time SLA bands


def test_fill_time_sla_bands_matches_python_reference(spark):
    li = (
        load_table(spark, "lineitem", SF)
        .groupBy("l_orderkey")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("done_day"))
    )
    orders = load_table(spark, "orders", SF).select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("order_day"),
    )
    rows = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).collect()
    lags = defaultdict(list)
    for r in rows:
        lags[r["o_orderpriority"]].append(
            (r["done_day"] - r["order_day"]).days
        )

    got = {
        r["priority"]: r
        for r in QUERIES["stats_fill_time_sla_bands"](spark, SF).collect()
    }
    assert set(got) == set(lags)
    for prio, vals in lags.items():
        vals.sort()
        n = len(vals)
        r = got[prio]
        assert r["n_orders"] == n
        # exact lower percentile: element at 1-based ceil(k*n/100)
        for k, nm in ((25, "p25_days"), (50, "p50_days"), (90, "p90_days")):
            assert r[nm] == vals[(k * n + 99) // 100 - 1]
        assert r["mean_days_e3"] == tdiv(sum(vals) * 1000, n)
        assert r["p25_days"] <= r["p50_days"] <= r["p90_days"]


# --------------------------------------------- tail co-exceedance


def test_tail_coexceedance_matches_python_reference(spark):
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
    daily = defaultdict(int)
    for r in rows:
        daily[(r["event_type"], r["day"])] += r["v"]
    by_type = defaultdict(dict)
    for (et, d), v in daily.items():
        by_type[et][d] = v
    tops = {}
    for et, days in by_type.items():
        ordered = sorted(days.items(), key=lambda kv: (kv[1], kv[0]))
        n = len(ordered)
        t90 = ordered[(9 * n + 9) // 10 - 1][1]
        tops[et] = {d for d, v in days.items() if v >= t90}
    n_days = len({d for days in by_type.values() for d in days})

    got = {
        (r["type_a"], r["type_b"]): r
        for r in QUERIES["stats_tail_coexceedance_types"](
            spark, SF
        ).collect()
    }
    types = sorted(by_type)
    expected_pairs = {
        (a, b) for i, a in enumerate(types) for b in types[i + 1 :]
    }
    assert set(got) == expected_pairs
    for (ta, tb), r in got.items():
        ka, kb = len(tops[ta]), len(tops[tb])
        co = len(tops[ta] & tops[tb])
        assert r["n_days"] == n_days
        assert r["k_a"] == ka
        assert r["k_b"] == kb
        assert r["co_exceed"] == co
        assert r["expected_co_e3"] == tdiv(ka * kb * 1000, n_days)
        assert r["lift_e6"] == tdiv(co * n_days * 10**6, ka * kb)


# --------------------------------------------- streaming gap audit


def test_streaming_gap_audit_matches_python_reference(spark):
    rows = (
        load_table(spark, "events", SF)
        .select(
            "event_type",
            F.date_trunc("minute", F.col("ts")).alias("m"),
        )
        .distinct()
        .collect()
    )
    minutes = defaultdict(set)
    for r in rows:
        minutes[r["event_type"]].add(r["m"])

    got = {
        r["event_type"]: r
        for r in QUERIES["streaming_gap_outage_audit"](spark, SF).collect()
    }
    assert set(got) == set(minutes)
    for et, ms in minutes.items():
        ordered = sorted(ms)
        gaps = [
            (int((b - a).total_seconds()) // 60, a)
            for a, b in zip(ordered, ordered[1:])
        ]
        r = got[et]
        assert r["n_minutes_active"] == len(ordered)
        if not gaps:
            assert r["max_gap_minutes"] is None
            continue
        mx = max(g for g, _ in gaps)
        assert r["max_gap_minutes"] == mx
        assert r["gap_start_minute"] == min(a for g, a in gaps if g == mx)
        # a gap between consecutive ACTIVE minutes is at least 1
        assert mx >= 1
