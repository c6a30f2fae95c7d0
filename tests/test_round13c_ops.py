"""Round-13 third-batch operator tests: independent Python reference
implementations for the lead-time control chart, segmented regression,
and HHI concentration drift (the DuckDB hash gate is the primary
check; these pin semantics against a second, non-SQL implementation —
the round-7 convention)."""

from __future__ import annotations

from collections import defaultdict
from datetime import date

from pyspark.sql import functions as F

from gotsdb_spark.operators.registry import QUERIES
from gotsdb_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero (Spark DIV, DuckDB //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _ship_lags(spark):
    li = load_table(spark, "lineitem", SF).select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("ship_day")
    )
    orders = load_table(spark, "orders", SF).select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("order_day")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("ship_day", "order_day")
        .collect()
    )


# -------------------------------------------- lead-time control chart


def test_leadtime_control_chart_matches_python_reference(spark):
    origin = date(1995, 1, 1)
    weeks = defaultdict(lambda: [0, 0, 0])  # n, S, SS
    for r in _ship_lags(spark):
        lag = (r["ship_day"] - r["order_day"]).days
        w = (r["ship_day"] - origin).days // 7
        a = weeks[w]
        a[0] += 1
        a[1] += lag
        a[2] += lag * lag
    big_n = sum(a[0] for a in weeks.values())
    big_s = sum(a[1] for a in weeks.values())
    big_ss = sum(a[2] for a in weeks.values())
    den_base = big_n * big_ss - big_s * big_s

    got = {
        r["week_idx"]: r
        for r in QUERIES["stats_leadtime_control_chart"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(weeks)
    n_ooc = 0
    for w, (n_w, s_w, _) in weeks.items():
        r = got[w]
        assert r["n_shipments"] == n_w
        assert r["mean_lag_e3"] == tdiv(s_w * 1000, n_w)
        diff = s_w * big_n - big_s * n_w
        den = n_w * den_base
        expect_z2 = tdiv(diff * diff * 10**6, den) if den else None
        assert r["z2_e6"] == expect_z2
        expect_ooc = bool(expect_z2 is not None and expect_z2 > 9 * 10**6)
        assert r["out_of_control"] == expect_ooc
        n_ooc += expect_ooc
    # the chart must separate: some weeks in control, and the 3-sigma
    # rule should not flag everything
    assert n_ooc < len(weeks)


# ------------------------------------------------ segmented regression


def _seg_sse_red(pts):
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    sxxc = n * sxx - sx * sx
    syyc = n * syy - sy * sy
    sxyc = n * sxy - sx * sy
    return (sxxc * syyc - sxyc * sxyc) // (sxxc * n * 1000), sxyc, sxxc


def test_segmented_regression_matches_python_reference(spark):
    rows = (
        load_table(spark, "lineitem", SF)
        .select(
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.lit("1995-01-01").cast("date"),
            ).alias("x"),
            F.floor(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .collect()
    )
    cents = defaultdict(int)
    for r in rows:
        cents[r["x"]] += r["cents"]
    pts = sorted((x, c // 10000) for x, c in cents.items())
    n = len(pts)
    best = None
    for i in range(2, n - 1):  # left has i points, right n-i >= 2
        sse_l, sxyc_l, sxxc_l = _seg_sse_red(pts[:i])
        sse_r, sxyc_r, sxxc_r = _seg_sse_red(pts[i:])
        score = (sse_l + sse_r, pts[i - 1][0])
        if best is None or score < best[:2]:
            best = (
                sse_l + sse_r,
                pts[i - 1][0],
                tdiv(sxyc_l * 10**6, sxxc_l),
                tdiv(sxyc_r * 10**6, sxxc_r),
            )
    sse_single, _, _ = _seg_sse_red(pts)

    [r] = QUERIES["stats_segmented_regression"](spark, SF).collect()
    assert r["n_days"] == n
    assert r["sse_break_red"] == best[0]
    assert r["break_day"] == best[1]
    assert r["slope_left_e6"] == best[2]
    assert r["slope_right_e6"] == best[3]
    assert r["sse_single_red"] == sse_single
    # the broken stick can never fit worse than the single line
    assert r["sse_break_red"] <= r["sse_single_red"]


# -------------------------------------------------- HHI drift


def test_hhi_drift_matches_python_reference(spark):
    rows = (
        load_table(spark, "events", SF)
        .select(
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("day"),
            "event_type",
        )
        .collect()
    )
    cnt = defaultdict(lambda: defaultdict(int))
    for r in rows:
        cnt[r["day"]][r["event_type"]] += 1
    hhi = {}
    for d, types in cnt.items():
        n_d = sum(types.values())
        hhi[d] = sum(c * c for c in types.values()) * 10**6 // (n_d * n_d)
    days = sorted(hhi)
    n = len(days)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += (hhi[days[j]] > hhi[days[i]]) - (
                hhi[days[j]] < hhi[days[i]]
            )
    tie_counts = defaultdict(int)
    for v in hhi.values():
        tie_counts[v] += 1
    tie_term = sum(
        t * (t - 1) * (2 * t + 5) for t in tie_counts.values() if t > 1
    )
    vnum = n * (n - 1) * (2 * n + 5) - tie_term

    [r] = QUERIES["stats_hhi_concentration_drift"](spark, SF).collect()
    assert r["n_days"] == n
    assert r["hhi_first_e6"] == hhi[days[0]]
    assert r["hhi_last_e6"] == hhi[days[-1]]
    assert r["hhi_mean_e6"] == tdiv(sum(hhi.values()), n)
    assert r["s_trend"] == s
    assert r["var_s"] == tdiv(vnum, 18)
    if vnum == 0:
        assert r["z2_signed_e6"] is None
    else:
        sign = 1 if s >= 0 else -1
        assert r["z2_signed_e6"] == tdiv(sign * s * s * 18 * 10**6, vnum)
    # HHI lower bound: 1e6/k for k observed types; upper bound 1e6
    k = len({t for types in cnt.values() for t in types})
    assert all(10**6 // k <= v <= 10**6 for v in hhi.values())
