"""Property-based differential testing of the round-11 rank/randomness
machinery.

The fixture-backed reference tests (test_round11b/d/e/f_ops.py) pin
one data shape; these fuzz the boundary algebra — tie-heavy value
grids, zero paired differences, all-above-median series, plateaus that
are neither peak nor trough, single-member quartile groups — where an
off-by-one in the midrank doubling, the discard-zeros rule, the strict
extremum comparisons, or the lower-quartile rank targets would hide.
Operators are exercised through their registered query functions with
`load_table` patched to serve synthetic frames (the
test_property_round7.py convention)."""

from __future__ import annotations

import pytest

import datetime
import math
from collections import defaultdict
from contextlib import contextmanager

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"  # ignored by the patched loader

BASE = datetime.datetime(2025, 1, 1, 12, 0, 0)


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


def _events_df(spark, rows):
    """rows: (event_type, day_offset, value, user_id, event_id)."""
    return spark.createDataFrame(
        [
            (et, BASE + datetime.timedelta(days=d), float(v), int(u), int(e))
            for et, d, v, u, e in rows
        ],
        "event_type STRING, ts TIMESTAMP, value DOUBLE, user_id LONG,"
        " event_id LONG",
    )


# ------------------------------------------------------------ runs test

runs_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=14),  # day
        st.integers(min_value=0, max_value=4),  # value grid — heavy ties
    ),
    min_size=6,
    max_size=60,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(runs_rows)
@pytest.mark.slow
def test_runs_test_fuzz(spark, rows):
    from gotsdb_spark.operators import inference
    from gotsdb_spark.operators.registry import QUERIES

    df = _events_df(
        spark, [(et, d, v, i, i) for i, (et, d, v) in enumerate(rows)]
    )
    with _patched(inference, {"events": df}):
        got = {
            r["event_type"]: r
            for r in QUERIES["stats_runs_test_daily"](spark, SF).collect()
        }
    daily = defaultdict(int)
    for et, d, v in rows:
        daily[(et, d)] += math.floor(v * 1000)
    series = defaultdict(dict)
    for (et, d), y in daily.items():
        series[et][d] = y
    # a type where every day equals its own median has no sign
    # sequence left after the discard-equal rule — the op (and its
    # oracle) emit no row for it
    expect_types = set()
    for et, days in series.items():
        ordered = sorted(days.items(), key=lambda kv: (kv[1], kv[0]))
        med = ordered[(len(ordered) + 1) // 2 - 1][1]
        if any(y != med for y in days.values()):
            expect_types.add(et)
    assert set(got) == expect_types
    for et in expect_types:
        days = series[et]
        ordered = sorted(days.items(), key=lambda kv: (kv[1], kv[0]))
        med = ordered[(len(ordered) + 1) // 2 - 1][1]
        signs = [
            1 if y > med else 0
            for _, y in sorted(days.items())
            if y != med
        ]
        n, n1 = len(signs), sum(signs)
        n2 = n - n1
        runs = sum(
            1 for i, s in enumerate(signs) if i == 0 or s != signs[i - 1]
        )
        r = got[et]
        assert (r["n"], r["n1"], r["n2"], r["runs"]) == (n, n1, n2, runs)
        if n > 0:
            assert r["expected_runs_e6"] == 10**6 + tdiv(
                2 * n1 * n2 * 10**6, n
            )
        den = 2 * n1 * n2 * (2 * n1 * n2 - n)
        if den == 0:
            assert r["z2_signed_e6"] is None
        else:
            num = n * (runs - 1) - 2 * n1 * n2
            sign = 1 if num >= 0 else -1
            assert r["z2_signed_e6"] == tdiv(
                sign * num * num * (n - 1) * 10**6, den
            )


# ----------------------------------------------------- Wilcoxon paired

wilcoxon_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),  # user
        st.sampled_from(["click", "view"]),
        st.integers(min_value=0, max_value=5),  # value — ties + zeros
    ),
    min_size=4,
    max_size=80,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(wilcoxon_rows)
@pytest.mark.slow
def test_wilcoxon_fuzz(spark, rows):
    from gotsdb_spark.operators import inference
    from gotsdb_spark.operators.registry import QUERIES

    df = _events_df(
        spark, [(et, 0, v, u, i) for i, (u, et, v) in enumerate(rows)]
    )
    with _patched(inference, {"events": df}):
        out = QUERIES["stats_wilcoxon_signed_rank"](spark, SF).collect()
    per = defaultdict(lambda: [0, 0, 0, 0])
    for u, et, v in rows:
        p = per[u]
        if et == "click":
            p[0] += math.floor(v * 1000)
            p[1] += 1
        else:
            p[2] += math.floor(v * 1000)
            p[3] += 1
    diffs = [
        tdiv(cs, cn) - tdiv(vs, vn)
        for cs, cn, vs, vn in per.values()
        if cn > 0 and vn > 0 and tdiv(cs, cn) != tdiv(vs, vn)
    ]
    n = len(diffs)
    got = out[0]
    if n == 0:
        # degenerate corpus: the scalar aggregate runs over an empty
        # dictionary, so every SUM (including n itself) is NULL in
        # both engines
        assert got["n"] is None and got["w_plus_x2"] is None
        return
    assert got["n"] == n
    dic = defaultdict(lambda: [0, 0])
    for d in diffs:
        dic[abs(d)][0] += 1
        if d > 0:
            dic[abs(d)][1] += 1
    w_plus_x2 = 0
    tie3 = 0
    cc = 0
    for ad in sorted(dic):
        c, cpos = dic[ad]
        cc += c
        w_plus_x2 += cpos * (2 * cc - c + 1)
        tie3 += c * c * c - c
    assert got["w_plus_x2"] == w_plus_x2
    var48 = 2 * n * (n + 1) * (2 * n + 1) - tie3
    assert got["var_x48_div_n"] == tdiv(var48, n)
    num = 2 * w_plus_x2 - n * (n + 1)
    if var48 == 0:
        assert got["z2_signed_e6"] is None
    else:
        sign = 1 if num >= 0 else -1
        assert got["z2_signed_e6"] == tdiv(
            sign * 3 * num * num * 10**6, var48
        )


# -------------------------------------------------------- turning points

tp_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=19),  # day
        st.integers(min_value=0, max_value=3),  # plateau-heavy values
    ),
    min_size=4,
    max_size=40,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(tp_rows)
def test_turning_points_fuzz(spark, rows):
    from gotsdb_spark.operators import inference
    from gotsdb_spark.operators.registry import QUERIES

    df = _events_df(
        spark, [("x", d, v, i, i) for i, (d, v) in enumerate(rows)]
    )
    with _patched(inference, {"events": df}):
        r = QUERIES["stats_turning_points_test"](spark, SF).collect()[0]
    ys = [
        math.floor(v * 1000) for _, v in sorted(rows, key=lambda t: t[0])
    ]
    n = len(ys)
    peaks = sum(
        1
        for i in range(1, n - 1)
        if ys[i - 1] < ys[i] and ys[i + 1] < ys[i]
    )
    troughs = sum(
        1
        for i in range(1, n - 1)
        if ys[i - 1] > ys[i] and ys[i + 1] > ys[i]
    )
    t = peaks + troughs
    assert (r["n_days"], r["peaks"], r["troughs"]) == (n, peaks, troughs)
    assert r["turning_points"] == t
    num = 3 * t - 2 * (n - 2)
    sign = 1 if num >= 0 else -1
    assert r["z2_signed_e6"] == tdiv(
        sign * num * num * 10 * 10**6, 9 * (16 * n - 29)
    )


# ------------------------------------------------------ Bowley quartiles

bowley_rows = st.lists(
    st.tuples(
        st.sampled_from(["1-URGENT", "2-HIGH"]),
        st.integers(min_value=0, max_value=6),  # price grid — heavy ties
    ),
    min_size=1,
    max_size=50,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(bowley_rows)
def test_bowley_fuzz(spark, rows):
    from gotsdb_spark.operators import statistics
    from gotsdb_spark.operators.registry import QUERIES

    df = spark.createDataFrame(
        [(grp, float(v)) for grp, v in rows],
        "o_orderpriority STRING, o_totalprice DOUBLE",
    )
    with _patched(statistics, {"orders": df}):
        got = {
            r["grp"]: r
            for r in QUERIES["stats_bowley_skewness"](spark, SF).collect()
        }
    groups = defaultdict(list)
    for grp, v in rows:
        groups[grp].append(math.floor(v * 100))
    assert set(got) == set(groups)
    for grp, vals in groups.items():
        vals.sort()
        n = len(vals)
        q1 = vals[(n + 3) // 4 - 1]
        q2 = vals[(n + 1) // 2 - 1]
        q3 = vals[(3 * n + 3) // 4 - 1]
        r = got[grp]
        assert (r["n"], r["q1_cents"], r["q2_cents"], r["q3_cents"]) == (
            n,
            q1,
            q2,
            q3,
        )
        if q3 == q1:
            assert r["bowley_e6"] is None
        else:
            assert r["bowley_e6"] == tdiv(
                (q3 + q1 - 2 * q2) * 10**6, q3 - q1
            )
