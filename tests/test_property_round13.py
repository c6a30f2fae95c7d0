"""Property-based differential testing of the round-13 second-session
operators.

The fixture-backed reference tests (test_round13b/c/d_ops.py) pin one
data shape; these fuzz the boundary algebra — waterfilling budgets
that land exactly on source boundaries (remainder distribution, the
all-sources-capped and one-source corpora), brute-forced segmented
regression over tiny tie-heavy series, and Q-Q deciles over value
grids dense with ties and empty-half layouts. Operators are exercised
through their registered query functions with `load_table` patched to
serve synthetic frames (the test_property_round7.py convention)."""

from __future__ import annotations

import pytest

from collections import defaultdict
from contextlib import contextmanager
from datetime import date, datetime, timedelta

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


# --------------------------------------------- token-budget waterfilling

wf_sources = st.lists(
    st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=4),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(wf_sources)
@pytest.mark.slow
def test_token_budget_waterfilling_fuzz(spark, per_source_doc_tokens):
    """sum(alloc) == budget exactly, alloc <= tokens everywhere, fully
    kept sources are exactly ranks 1..jstar, and the result equals an
    independent Python waterfilling."""
    from gotsdb_spark.operators import pipeline_ops
    from gotsdb_spark.operators.registry import QUERIES

    rows = []
    tok = {}
    for i, docs in enumerate(per_source_doc_tokens):
        src = f"s{i}"
        # n whitespace tokens == n words
        tok[src] = sum(docs)
        for j, n in enumerate(docs):
            rows.append((src, " ".join(["w"] * n)))
    total = sum(tok.values())
    assume(total >= 2)
    budget = total // 2
    docs_df = spark.createDataFrame(rows, "source STRING, text STRING")

    order = sorted(tok, key=lambda s: (tok[s], s))
    s_cnt = len(order)
    cum = 0
    jstar, cum_tj = 0, 0
    for j, src in enumerate(order, start=1):
        cum += tok[src]
        if tok[src] * (s_cnt - j) <= budget - cum:
            jstar, cum_tj = j, cum
    lvl = (budget - cum_tj) // (s_cnt - jstar)
    extra = (budget - cum_tj) % (s_cnt - jstar)

    with _patched(pipeline_ops, {"documents": docs_df}):
        got = {
            r["source"]: r
            for r in QUERIES["curate_token_budget_planner"](
                spark, SF
            ).collect()
        }
    assert set(got) == set(tok)
    total_alloc = 0
    for rk, src in enumerate(order, start=1):
        r = got[src]
        expect = (
            tok[src]
            if rk <= jstar
            else (lvl + 1 if rk > s_cnt - extra else lvl)
        )
        assert r["tokens_alloc"] == expect
        assert r["tokens_alloc"] <= r["tokens_total"]
        assert r["capped"] == (rk > jstar)
        assert r["size_rank"] == rk
        total_alloc += r["tokens_alloc"]
    assert total_alloc == budget


# ------------------------------------------------ segmented regression

seg_series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),  # day offset
        st.integers(min_value=0, max_value=50000),  # whole-dollar revenue
    ),
    min_size=4,
    max_size=14,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(seg_series)
@pytest.mark.slow
def test_segmented_regression_fuzz(spark, series):
    """The registered query equals a brute-force Python scan of every
    breakpoint, and the broken stick never fits worse than one line."""
    from gotsdb_spark.operators import statistics
    from gotsdb_spark.operators.registry import QUERIES

    origin = date(1995, 1, 1)
    rows = [
        (origin + timedelta(days=d), float(dollars))
        for d, dollars in series
    ]
    li = spark.createDataFrame(
        rows, "l_shipdate DATE, l_extendedprice DOUBLE"
    )

    pts = sorted((d, dollars * 100 // 10000) for d, dollars in series)

    def sse_red(seg):
        n = len(seg)
        sx = sum(x for x, _ in seg)
        sy = sum(y for _, y in seg)
        sxy = sum(x * y for x, y in seg)
        sxx = sum(x * x for x, _ in seg)
        syy = sum(y * y for _, y in seg)
        sxxc = n * sxx - sx * sx
        syyc = n * syy - sy * sy
        sxyc = n * sxy - sx * sy
        return (sxxc * syyc - sxyc * sxyc) // (sxxc * n * 1000), sxyc, sxxc

    n = len(pts)
    best = None
    for i in range(2, n - 1):
        sl, sxyc_l, sxxc_l = sse_red(pts[:i])
        sr, sxyc_r, sxxc_r = sse_red(pts[i:])
        key = (sl + sr, pts[i - 1][0])
        if best is None or key < best[:2]:
            best = (
                sl + sr,
                pts[i - 1][0],
                tdiv(sxyc_l * 10**6, sxxc_l),
                tdiv(sxyc_r * 10**6, sxxc_r),
            )
    single, _, _ = sse_red(pts)

    with _patched(statistics, {"lineitem": li}):
        [r] = QUERIES["stats_segmented_regression"](spark, SF).collect()
    assert r["n_days"] == n
    assert r["sse_break_red"] == best[0]
    assert r["break_day"] == best[1]
    assert r["slope_left_e6"] == best[2]
    assert r["slope_right_e6"] == best[3]
    assert r["sse_single_red"] == single
    assert r["sse_break_red"] <= r["sse_single_red"]


# ------------------------------------------------------- Q-Q drift

qq_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=13),  # day
        st.integers(min_value=0, max_value=8),  # integer value (ties!)
    ),
    min_size=4,
    max_size=60,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(qq_rows)
@pytest.mark.slow
def test_qq_drift_fuzz(spark, rows):
    """Registered query equals a Python reference on tie-heavy grids,
    including types entirely absent from one half (NULL devs)."""
    from gotsdb_spark.operators import statistics
    from gotsdb_spark.operators.registry import QUERIES

    base = datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (et, base + timedelta(days=d, hours=1), float(v))
            for et, d, v in rows
        ],
        "event_type STRING, ts TIMESTAMP, value DOUBLE",
    )
    dmin = min(d for _, d, _ in rows)
    dmax = max(d for _, d, _ in rows)
    halves = defaultdict(list)
    for et, d, v in rows:
        halves[(et, 0 if 2 * d <= dmin + dmax else 1)].append(v * 1000)

    def deciles(vs):
        vs = sorted(vs)
        n = len(vs)
        return {k: vs[(k * n + 9) // 10 - 1] for k in range(1, 10)}

    with _patched(statistics, {"events": ev}):
        got = {
            r["event_type"]: r
            for r in QUERIES["stats_qq_drift_value"](spark, SF).collect()
        }
    types = {et for et, _, _ in rows}
    assert set(got) == types
    for et in types:
        first = halves.get((et, 0))
        second = halves.get((et, 1))
        r = got[et]
        if not first or not second:
            # type missing from one half: NULL counts and NULL drift
            assert r["qq_sum_abs_dev_e3"] is None
            assert r["qq_max_dev_e3"] is None
            assert r["max_dev_decile"] is None
            continue
        q0, q1 = deciles(first), deciles(second)
        devs = {k: abs(q0[k] - q1[k]) for k in range(1, 10)}
        mx = max(devs.values())
        assert r["n_first"] == len(first)
        assert r["n_second"] == len(second)
        assert r["qq_sum_abs_dev_e3"] == sum(devs.values())
        assert r["qq_max_dev_e3"] == mx
        assert r["max_dev_decile"] == min(
            k for k, d in devs.items() if d == mx
        )
