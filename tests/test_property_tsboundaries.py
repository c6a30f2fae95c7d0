"""Property-based differential testing of the round-1/2 time-series
boundary semantics: the as-of tie rule (an error at EXACTLY the
purchase timestamp is visible), the strict 30-minute session split
(gap == 1800 s stays in-session), and the gap-fill spine/flag algebra.

These operators predate the fuzzer convention; their oracles pin them
at fixture shape, and these fuzz the tie/edge geometry the fixture
rarely produces. Values are integral so double sums are exact and the
Python mirrors compare with ==."""

from __future__ import annotations

import pytest

import datetime
from contextlib import contextmanager

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"  # ignored by the patched loader

BASE = datetime.datetime(2025, 1, 1)


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


# ------------------------------------------------------------ as-of join

asof_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user
        st.integers(min_value=0, max_value=40),  # minute offset — many ties
        st.sampled_from(["purchase", "error", "view"]),
        st.integers(min_value=0, max_value=9),  # value
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=asof_rows)
def test_asof_join_fuzz(spark, rows):
    """For every purchase, last_error_ts must be the max error ts <=
    the purchase ts for that user — INCLUDING an error at exactly the
    purchase timestamp (the is_left sort-key tie rule), and NULL when
    no prior error exists."""
    import gotsdb_spark.operators.timeseries as mod

    data = [
        (i, BASE + datetime.timedelta(minutes=m), u, t, float(v))
        for i, (u, m, t, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double",
    )
    with _patched(mod, {"events": df}):
        got = {
            r["event_id"]: r
            for r in mod.ts_asof_join_last_error(spark, SF).collect()
        }
    purchases = [
        (i, u, m, v) for i, (u, m, t, v) in enumerate(rows) if t == "purchase"
    ]
    errors: dict = {}
    for i, (u, m, t, v) in enumerate(rows):
        if t == "error":
            errors.setdefault(u, []).append(m)
    assert set(got) == {i for i, *_ in purchases}, rows
    for i, u, m, v in purchases:
        eligible = [em for em in errors.get(u, []) if em <= m]
        want = (
            BASE + datetime.timedelta(minutes=max(eligible))
            if eligible
            else None
        )
        row = got[i]
        assert row["user_id"] == u and row["value"] == float(v)
        assert row["last_error_ts"] == want, rows


# ---------------------------------------------------------- sessionize

sess_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=2),  # user
        # second offsets with values AT the 1800 s boundary reachable:
        # multiples of 600 make exact 1800 gaps common
        st.integers(min_value=0, max_value=12) .map(lambda k: k * 600),
        st.integers(min_value=0, max_value=9),  # value
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=sess_rows)
def test_sessionize_fuzz(spark, rows):
    """Session splits are STRICTLY gap > 1800 s: a gap of exactly
    1800 s continues the session. The (ts, event_id) tie-break orders
    duplicate timestamps; counts, bounds, and integral value sums must
    match the sequential walk."""
    import gotsdb_spark.operators.timeseries as mod

    data = [
        (i, BASE + datetime.timedelta(seconds=s), u, "view", float(v))
        for i, (u, s, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double",
    )
    with _patched(mod, {"events": df}):
        got = {
            (r["user_id"], r["session_id"]): r
            for r in mod.ts_sessionize_users(spark, SF).collect()
        }
    per_user: dict = {}
    for i, (u, s, v) in enumerate(rows):
        per_user.setdefault(u, []).append((s, i, v))
    want = {}
    for u, evs in per_user.items():
        evs.sort()
        sid = 0
        prev = None
        cur: list = []
        for s, i, v in evs:
            if prev is None or s - prev > 1800:
                if cur:
                    want[(u, sid)] = cur
                sid += 1
                cur = []
            cur.append((s, v))
            prev = s
        want[(u, sid)] = cur
    assert set(got) == set(want), rows
    for key, evs in want.items():
        row = got[key]
        assert row["n_events"] == len(evs), rows
        assert row["session_start"] == BASE + datetime.timedelta(
            seconds=min(s for s, _ in evs)
        )
        assert row["session_end"] == BASE + datetime.timedelta(
            seconds=max(s for s, _ in evs)
        )
        assert row["session_value"] == float(sum(v for _, v in evs)), rows


# ------------------------------------------------------------- gap fill

gap_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=12),  # day
        st.integers(min_value=0, max_value=9),  # value
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=gap_rows)
def test_gap_fill_fuzz(spark, rows):
    """The dense spine must span the GLOBAL [min, max] day range for
    every type (a type with no events on the global min/max days still
    gets those spine rows), zero-fill exactly the missing days, and
    flag them — single-day ranges and types absent from range edges
    are the boundary."""
    import gotsdb_spark.operators.timeseries as mod

    data = [
        (i, BASE + datetime.timedelta(days=d, hours=3), t, float(v))
        for i, (t, d, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id bigint, ts timestamp, event_type string, value double"
    )
    with _patched(mod, {"events": df}):
        got = {
            (r["event_type"], r["day"]): r
            for r in mod.ts_gap_fill_daily(spark, SF).collect()
        }
    lo = min(d for _, d, _ in rows)
    hi = max(d for _, d, _ in rows)
    daily: dict = {}
    for t, d, v in rows:
        daily[(t, d)] = daily.get((t, d), 0) + v
    types = {t for t, _, _ in rows}
    want = {}
    for t in types:
        for d in range(lo, hi + 1):
            day = BASE + datetime.timedelta(days=d)
            want[(t, day)] = (
                float(daily.get((t, d), 0)),
                (t, d) not in daily,
            )
    assert set(got) == set(want), rows
    for key, (val, gap) in want.items():
        assert got[key]["day_value"] == val, rows
        assert got[key]["was_gap"] == gap, rows


# ------------------------------------------------------- counter resets

ctr_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=2),  # user (series key part)
        st.sampled_from(["cpu", "mem"]),  # event_type
        st.integers(min_value=0, max_value=30),  # minute offset
        st.integers(min_value=0, max_value=20),  # counter value
    ),
    min_size=1,
    max_size=50,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ctr_rows)
def test_counter_rate_fuzz(spark, rows):
    """PromQL reset semantics: a NEGATIVE delta contributes the current
    value (restart-from-zero), delta zero contributes zero, the first
    sample of a series contributes zero — and resets are counted.
    Random walks that go backwards often are exactly the shape the
    monotone fixture counter never produces."""
    import gotsdb_spark.operators.timeseries as mod

    data = [
        (i, BASE + datetime.timedelta(minutes=m), u, t, float(v))
        for i, (u, t, m, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double",
    )
    with _patched(mod, {"events": df}):
        got = {
            (r["event_type"], r["day"]): r
            for r in mod.ts_counter_rate(spark, SF).collect()
        }
    series: dict = {}
    for i, (u, t, m, v) in enumerate(rows):
        series.setdefault((u, t), []).append((m, i, v))
    per_day: dict = {}
    for (u, t), evs in series.items():
        evs.sort()
        prev = None
        for m, i, v in evs:
            day = BASE  # all offsets are < 1 day
            key = (t, day)
            n, resets, micros = per_day.get(key, (0, 0, 0))
            if prev is None:
                c, r = 0, 0
            elif v - prev < 0:
                c, r = v, 1
            elif v - prev == 0:
                c, r = 0, 0
            else:
                c, r = v - prev, 0
            per_day[key] = (n + 1, resets + r, micros + 1_000_000 * c)
            prev = v
    assert set(got) == set(per_day), rows
    for key, (n, resets, micros) in per_day.items():
        row = got[key]
        assert row["n_samples"] == n, rows
        assert row["n_resets"] == resets, rows
        assert row["increase_micros"] == micros, rows


# --------------------------------------------------------- M4 downsample

m4_rows = st.lists(
    st.tuples(
        st.sampled_from(["cpu", "mem"]),
        st.integers(min_value=0, max_value=50_400),  # seconds: ~2.3 buckets
        st.integers(min_value=0, max_value=9),  # value — heavy ties
    ),
    min_size=1,
    max_size=50,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=m4_rows)
def test_m4_downsample_fuzz(spark, rows):
    """Per (type, 6 h bucket): min, max, and the (ts, event_id)-ordered
    first/last values must match the sequential walk — duplicate
    timestamps where event_id alone decides first/last are the tie
    geometry under test."""
    import gotsdb_spark.operators.timeseries as mod

    data = [
        (i, BASE + datetime.timedelta(seconds=s), t, float(v))
        for i, (t, s, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id bigint, ts timestamp, event_type string, value double"
    )
    with _patched(mod, {"events": df}):
        got = {
            (r["event_type"], r["bucket_start"]): r
            for r in mod.ts_m4_downsample(spark, SF).collect()
        }
    epoch = int(BASE.timestamp())
    buckets: dict = {}
    for i, (t, s, v) in enumerate(rows):
        bsec = (epoch + s) // 21600 * 21600
        buckets.setdefault((t, bsec), []).append((s, i, v))
    want = {}
    for (t, bsec), evs in buckets.items():
        evs.sort()
        want[(t, datetime.datetime.fromtimestamp(bsec))] = (
            len(evs),
            min(v for _, _, v in evs),
            max(v for _, _, v in evs),
            evs[0][2],
            evs[-1][2],
        )
    assert set(got) == set(want), rows
    for key, (n, vmin, vmax, first, last) in want.items():
        row = got[key]
        assert row["n"] == n, rows
        assert (row["v_min"], row["v_max"]) == (vmin, vmax)
        assert (row["first_value"], row["last_value"]) == (first, last), rows


# ------------------------------------------------------- interpolation

interp_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),  # hour offset — many ties
        st.integers(min_value=0, max_value=9),  # value
    ),
    min_size=2,
    max_size=25,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pts=interp_rows)
@pytest.mark.slow
def test_linear_interpolate_fuzz(spark, pts):
    """Grid interpolation must match the sequential mirror — with
    DUPLICATE sample timestamps (the event_id tie-break: v0 takes the
    max-event_id sample at t0, v1 the min-event_id sample at t1), a
    sample exactly ON a grid point (interp == that sample), and
    cross-day flank carry."""
    import gotsdb_spark.operators.timeseries as mod

    data = [
        (i, BASE + datetime.timedelta(hours=h), "purchase", float(v))
        for i, (h, v) in enumerate(pts)
    ]
    df = spark.createDataFrame(
        data, "event_id bigint, ts timestamp, event_type string, value double"
    )
    with _patched(mod, {"events": df}):
        got = {
            r["grid_ts"]: r["interp"]
            for r in mod.ts_linear_interpolate(spark, SF).collect()
        }
    # mirror: samples sorted by (ts, event_id); grid every 6h from
    # trunc-hour(min) to trunc-hour(max)
    samples = sorted(
        (h * 3600, i, v) for i, (h, v) in enumerate(pts)
    )  # seconds
    lo = min(s for s, _, _ in samples) // 3600 * 3600
    hi = max(s for s, _, _ in samples) // 3600 * 3600
    want = {}
    for g in range(lo, hi + 1, 21600):
        before = [(s, i, v) for s, i, v in samples if s <= g]
        after = [(s, i, v) for s, i, v in samples if s > g]
        if not before:
            continue
        t0, _, v0 = before[-1]  # max (ts, event_id)
        if g == t0:
            # grid point coincides with a sample: forward window
            # starts at the grid row, which sorts AFTER the equal-ts
            # samples, so t1 is the next strictly-later sample
            pass
        if not after and t0 != g:
            # no strictly-later sample and no equal-ts sample: t1 of
            # the forward window is NULL -> row filtered
            if t0 < g:
                continue
        if after:
            t1, _, v1 = after[0]  # min (ts, event_id)
        else:
            # only reachable when t0 == g (equal-ts sample is its own
            # backward flank); forward flank NULL -> filtered
            continue
        if t1 == t0:
            interp = v0
        else:
            interp = v0 + (v1 - v0) * (g - t0) / (t1 - t0)
        want[BASE + datetime.timedelta(seconds=g)] = interp
    assert set(got) == set(want), pts
    for k, v in want.items():
        assert got[k] == v, (pts, k)


# ------------------------------------------------------------------ SCD2

scd_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=2),  # user
        st.integers(min_value=0, max_value=8),  # minute offset — many ties
        st.sampled_from(["X", "Y"]),
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=scd_rows)
def test_scd2_fuzz(spark, rows):
    """Validity intervals must match the sequential (ts, event_id) run
    walk — SAME-timestamp type flips (several change points sharing a
    ts, closed by each other's identical valid_to) are the geometry the
    event_id tie-break exists for."""
    import gotsdb_spark.operators.timeseries as mod

    data = [
        (i, BASE + datetime.timedelta(minutes=m), u, t)
        for i, (u, m, t) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    def _key(t):
        # valid_to may be None (open interval): sort None first so rows
        # that tie on (user, from, type) — same-ts same-type changes —
        # still order totally
        return (t[0], t[1], t[2], t[3] is not None, t[3] or BASE, t[4])

    with _patched(mod, {"events": df}):
        got = sorted(
            (
                (
                    r["user_id"],
                    r["valid_from"],
                    r["event_type"],
                    r["valid_to"],
                    r["is_current"],
                )
                for r in mod.scd2_user_event_history(spark, SF).collect()
            ),
            key=_key,
        )
    per_user: dict = {}
    for i, (u, m, t) in enumerate(rows):
        per_user.setdefault(u, []).append((m, i, t))
    want = []
    for u, evs in per_user.items():
        evs.sort()
        changes = []
        prev = None
        for m, i, t in evs:
            if prev is None or t != prev:
                changes.append((m, i, t))
            prev = t
        for k, (m, i, t) in enumerate(changes):
            nxt = (
                BASE + datetime.timedelta(minutes=changes[k + 1][0])
                if k + 1 < len(changes)
                else None
            )
            want.append(
                (
                    u,
                    BASE + datetime.timedelta(minutes=m),
                    t,
                    nxt,
                    1 if nxt is None else 0,
                )
            )
    assert got == sorted(want, key=_key), rows


# ------------------------------------------------------------- funnel

fun_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),  # user
        st.integers(min_value=0, max_value=6),  # minute — ties frequent
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=fun_rows)
def test_funnel_fuzz(spark, rows):
    """Stage gating is STRICT first-occurrence ordering: a first view
    at exactly the first click's timestamp does NOT count as
    clicked-after-view, and a missing stage NULLs the chain — the
    simultaneous-stage geometry under test."""
    import gotsdb_spark.operators.timeseries as mod

    data = [
        (i, BASE + datetime.timedelta(minutes=m), u, t)
        for i, (u, m, t) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    with _patched(mod, {"events": df}):
        row = mod.ts_funnel_view_click_purchase(spark, SF).collect()[0]
    firsts: dict = {}
    for u, m, t in rows:
        key = (u, t)
        firsts[key] = min(firsts.get(key, m), m)
    users = {u for u, _, _ in rows}
    n_viewed = n_clicked = n_full = 0
    for u in users:
        tv = firsts.get((u, "view"))
        tc = firsts.get((u, "click"))
        tb = firsts.get((u, "purchase"))
        if tv is not None:
            n_viewed += 1
        clicked = tv is not None and tc is not None and tv < tc
        if clicked:
            n_clicked += 1
        if clicked and tb is not None and tc < tb:
            n_full += 1
    assert row["n_users"] == len(users), rows
    assert row["n_viewed"] == n_viewed, rows
    assert row["n_clicked_after_view"] == n_clicked, rows
    assert row["n_full_funnel"] == n_full, rows


# ----------------------------------------------------------- retention

ret_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),  # user
        st.integers(min_value=0, max_value=10),  # day
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ret_rows)
@pytest.mark.slow
def test_retention_fuzz(spark, rows):
    """(cohort_day, day_offset) counts must match the Python mirror —
    day 0 membership equals cohort size, multiple same-day events
    collapse to one active row."""
    import gotsdb_spark.operators.timeseries as mod

    data = [
        (i, BASE + datetime.timedelta(days=d, hours=5), u, "view")
        for i, (u, d) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    with _patched(mod, {"events": df}):
        got = {
            (r["cohort_day"], r["day_offset"]): r["n_active"]
            for r in mod.ts_retention_cohorts(spark, SF).collect()
        }
    cohort = {}
    active = set()
    for u, d in rows:
        cohort[u] = min(cohort.get(u, d), d)
        active.add((u, d))
    want: dict = {}
    for u, d in active:
        key = (BASE + datetime.timedelta(days=cohort[u]), d - cohort[u])
        want[key] = want.get(key, 0) + 1
    assert got == want, rows
    # day-0 sanity: every cohort's offset-0 count equals its size
    sizes: dict = {}
    for u, c in cohort.items():
        sizes[c] = sizes.get(c, 0) + 1
    for c, n in sizes.items():
        assert got[(BASE + datetime.timedelta(days=c), 0)] == n


# ------------------------------------------------------------- streaks

streak_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user
        st.integers(min_value=0, max_value=12),  # day
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=streak_rows)
def test_streaks_fuzz(spark, rows):
    """The gaps-and-islands histogram must match the sequential
    consecutive-run walk — adjacent days merge, a 1-day gap splits,
    duplicate same-day events never lengthen a streak."""
    import gotsdb_spark.operators.timeseries as mod

    data = [
        (i, BASE + datetime.timedelta(days=d, hours=2), u, "view")
        for i, (u, d) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    with _patched(mod, {"events": df}):
        got = {
            r["streak_days"]: (r["n_streaks"], r["n_users"])
            for r in mod.ts_activity_streaks(spark, SF).collect()
        }
    per_user: dict = {}
    for u, d in rows:
        per_user.setdefault(u, set()).add(d)
    hist: dict = {}
    users_by_len: dict = {}
    for u, ds in per_user.items():
        sd = sorted(ds)
        run = 1
        runs = []
        for a, b in zip(sd, sd[1:]):
            if b == a + 1:
                run += 1
            else:
                runs.append(run)
                run = 1
        runs.append(run)
        for r in runs:
            hist[r] = hist.get(r, 0) + 1
            users_by_len.setdefault(r, set()).add(u)
    want = {
        r: (n, len(users_by_len[r])) for r, n in hist.items()
    }
    assert got == want, rows


# ------------------------------------------------------ origin buckets

tb_rows = st.lists(
    st.tuples(
        # seconds relative to 2023-06-01 — BEFORE the 2024-01-01 00:15
        # bucket origin, so negative epoch-diffs floor toward -inf
        st.integers(min_value=0, max_value=40_000_000),
        st.sampled_from(["cpu", "mem"]),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=40,
)

_TB_BASE = datetime.datetime(2023, 6, 1)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=tb_rows)
def test_time_bucket_origin_fuzz(spark, rows):
    """Arbitrary-origin bucketing must floor toward -infinity for
    timestamps BEFORE the origin (negative epoch diffs — the case
    date_trunc never sees and truncate-toward-zero silently breaks);
    counts and integer-micro sums per bucket must match the mirror."""
    import gotsdb_spark.operators.timeseries as mod

    data = [
        (i, _TB_BASE + datetime.timedelta(seconds=s), t, float(v))
        for i, (s, t, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id bigint, ts timestamp, event_type string, value double"
    )
    with _patched(mod, {"events": df}):
        got = {
            (r["bucket_start"], r["event_type"]): (r["n"], r["value_micros"])
            for r in mod.ts_time_bucket_origin(spark, SF).collect()
        }
    origin, width = mod._TB_ORIGIN, mod._TB_WIDTH
    epoch0 = int(_TB_BASE.replace(tzinfo=datetime.timezone.utc).timestamp())
    want: dict = {}
    for s, t, v in rows:
        e = epoch0 + s
        b = origin + (e - origin) // width * width  # Python // floors
        key = (
            datetime.datetime.fromtimestamp(b, tz=datetime.timezone.utc)
            .replace(tzinfo=None),
            t,
        )
        n, m = want.get(key, (0, 0))
        want[key] = (n + 1, m + v * 1_000_000)
    assert got == want, rows


# ------------------------------------------------- time-weighted average

twa_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=2),  # user
        st.integers(min_value=0, max_value=50),  # second offset — ties
        st.integers(min_value=0, max_value=9),  # value (integral -> exact)
    ),
    min_size=2,
    max_size=40,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=twa_rows)
def test_time_weighted_avg_fuzz(spark, rows):
    """Each sample is weighted by its holding duration under the
    (ts, event_id) total order — duplicate timestamps give zero-width
    holdings whose VALUE must not leak into the average, and which of
    the tied samples carries the forward duration is decided by
    event_id, not partition luck."""
    import gotsdb_spark.operators.timeseries as mod

    data = [
        (i, BASE + datetime.timedelta(seconds=s), u, "view", float(v))
        for i, (u, s, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double",
    )
    with _patched(mod, {"events": df}):
        got = {
            r["user_id"]: r["twa"]
            for r in mod.ts_time_weighted_avg(spark, SF).collect()
        }
    per_user: dict = {}
    for i, (u, s, v) in enumerate(rows):
        per_user.setdefault(u, []).append((s, i, v))
    want = {}
    for u, evs in per_user.items():
        evs.sort()
        num = den = 0
        for (s, _, v), (s2, _, _) in zip(evs, evs[1:]):
            num += v * (s2 - s)
            den += s2 - s
        if den > 0:
            want[u] = num / den
        elif len(evs) >= 2:
            # all samples share one timestamp: sum(dur)=0 -> NULL/NaN
            want[u] = None
    # engines may render 0/0 as NULL or NaN; treat both as "no average"
    got = {
        u: (None if v is None or v != v else v) for u, v in got.items()
    }
    assert got == want, rows
