"""Property-based differential testing of the round-8 rank/band
machinery.

The fixture-backed reference tests (test_round8_ops.py) pin one data
shape; these fuzz the boundary algebra — tie-heavy value grids, single
groups, all-equal columns — where an off-by-one in the doubled-midrank
rule (2cc - c + 1), the Pareto band cuts, or the transition marginals
would hide. Operators are exercised through their registered query
functions with `load_table` patched to serve synthetic frames (the
test_property_round7.py convention)."""

from __future__ import annotations

import pytest

import datetime
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


# Tie-heavy price grids split over the two tested flags plus a third
# ('N') that the operator must ignore.
mw_rows = st.lists(
    st.tuples(
        st.sampled_from(["A", "R", "N"]),
        st.integers(min_value=0, max_value=8),  # cents/100 — heavy ties
    ),
    min_size=2,
    max_size=100,
).filter(
    lambda rows: any(f == "A" for f, _ in rows)
    and any(f == "R" for f, _ in rows)
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=mw_rows)
@pytest.mark.slow
def test_mann_whitney_fuzz(spark, rows):
    """U_x2 must equal the QUADRATIC pairwise definition
    (2·#[a>r] + #[a==r] over all A x R pairs) — an independent route
    that never touches midranks, so a rank-rule off-by-one cannot
    cancel out."""
    import gotsdb_spark.operators.inference as mod

    df = spark.createDataFrame(
        [(f, float(c)) for f, c in rows],
        "l_returnflag string, l_extendedprice double",
    )
    with _patched(mod, {"lineitem": df}):
        row = mod.stats_mann_whitney_u(spark, SF).collect()[0]
    a = [c * 100 for f, c in rows if f == "A"]
    r = [c * 100 for f, c in rows if f == "R"]
    u_x2 = sum(2 * (x > y) + (x == y) for x in a for y in r)
    assert (row["n_a"], row["n_r"]) == (len(a), len(r))
    assert row["u_a_x2"] == u_x2, rows
    assert row["auc_e6"] == u_x2 * 1_000_000 // (2 * len(a) * len(r))
    from collections import Counter

    tie3 = sum(c**3 - c for c in Counter(a + r).values())
    assert row["tie_term_div_n"] == tie3 // (len(a) + len(r))


abc_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=12),  # partkey — few parts
        st.integers(min_value=1, max_value=50),  # cents/100
    ),
    min_size=1,
    max_size=80,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=abc_rows)
@pytest.mark.slow
def test_abc_pareto_fuzz(spark, rows):
    """Class assignment must match the sequential cumulative walk in
    (revenue DESC, partkey) order, including boundary ties where
    cum*5 == 4*t exactly."""
    import gotsdb_spark.operators.statistics as mod

    df = spark.createDataFrame(
        [(pk, float(c)) for pk, c in rows],
        "l_partkey bigint, l_extendedprice double",
    )
    with _patched(mod, {"lineitem": df}):
        got = {
            r["abc_class"]: r
            for r in mod.lineitem_abc_pareto(spark, SF).collect()
        }
    rev: dict = {}
    for pk, c in rows:
        rev[pk] = rev.get(pk, 0) + c * 100
    t = sum(rev.values())
    want: dict = {}
    cum = 0
    for pk in sorted(rev, key=lambda k: (-rev[k], k)):
        cum += rev[pk]
        cls = "A" if cum * 5 <= 4 * t else ("B" if cum * 20 <= 19 * t else "C")
        n, s = want.get(cls, (0, 0))
        want[cls] = (n + 1, s + rev[pk])
    assert set(got) == set(want)
    for cls, (n, s) in want.items():
        assert got[cls]["n_parts"] == n, rows
        assert got[cls]["revenue_cents"] == s
        assert got[cls]["share_e6"] == s * 1_000_000 // t


markov_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),  # user
        st.integers(min_value=0, max_value=30),  # minute offset
        st.sampled_from(["view", "click", "purchase"]),
    ),
    min_size=2,
    max_size=80,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=markov_rows)
def test_markov_fuzz(spark, rows):
    """Transition counts/marginals must match the per-user sequential
    walk with the (ts, event_id) tie-break — duplicate timestamps per
    user are the case the tie-break exists for."""
    import gotsdb_spark.operators.timeseries as mod

    base = datetime.datetime(2025, 1, 1)
    data = [
        (i, base + datetime.timedelta(minutes=m), u, t)
        for i, (u, m, t) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    with _patched(mod, {"events": df}):
        got = mod.events_markov_transitions(spark, SF).collect()
    seqs: dict = {}
    for i, (u, m, t) in enumerate(rows):
        seqs.setdefault(u, []).append((base + datetime.timedelta(minutes=m), i, t))
    trans: dict = {}
    for s in seqs.values():
        s.sort()
        for (_, _, cur), (_, _, nxt) in zip(s, s[1:]):
            trans[(cur, nxt)] = trans.get((cur, nxt), 0) + 1
    marg: dict = {}
    for (cur, _), n in trans.items():
        marg[cur] = marg.get(cur, 0) + n
    assert {(r["from_type"], r["to_type"]) for r in got} == set(trans), rows
    for r in got:
        key = (r["from_type"], r["to_type"])
        assert r["n_transitions"] == trans[key]
        assert r["p_e6"] == trans[key] * 1_000_000 // marg[key[0]]
