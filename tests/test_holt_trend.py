"""Holt linear-trend smoothing: the Spark array-fold vs the DuckDB
recursive-CTE oracle (run in-test — operator queued for round-6
registration), plus a pure-Python recurrence check and a closed-form
property on a perfectly linear series.
"""

from __future__ import annotations

import pytest

import math

import duckdb

from gotsdb_spark.operators.timeseries import (
    _HOLT_ALPHA,
    _HOLT_BETA,
    HOLT_TREND_ORACLE,
    ts_holt_linear_trend,
)

SF = "/root/testdata/sf0.001"


def _r9(x: float) -> float:
    return math.floor(x * 1e9 + 0.5) / 1e9


def _holt_py(ys: list[float]) -> tuple[float, float]:
    l = _r9(ys[1])
    b = _r9(ys[1] - ys[0])
    for y in ys[2:]:
        nl = _r9(_HOLT_ALPHA * y + (1 - _HOLT_ALPHA) * (l + b))
        b = _r9(_HOLT_BETA * (nl - l) + (1 - _HOLT_BETA) * b)
        l = nl
    return l, b


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    return con


def test_holt_matches_recursive_oracle(spark, duck):
    got = sorted(
        (r["event_type"], r["n_days"], r["level_e6"], r["trend_e6"], r["forecast_e6"])
        for r in ts_holt_linear_trend(spark, SF).collect()
    )
    want = sorted(
        (a, int(b), int(c), int(d), int(e))
        for a, b, c, d, e in duck.execute(HOLT_TREND_ORACLE).fetchall()
    )
    assert got == want and got


def test_holt_matches_python_recurrence(spark, duck):
    """Third evaluation strategy: fold the identical recurrence in
    Python over the oracle's own daily frame."""
    daily = duck.execute(
        """
        SELECT event_type,
               datediff('day', DATE '2025-01-01', CAST(ts AS DATE)) AS x,
               CAST(sum(CAST(floor(value * 1000) AS BIGINT)) // count(*)
                    AS BIGINT) / 1000.0 AS y
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[float]] = {}
    for t, _, y in daily:
        series.setdefault(t, []).append(float(y))
    expect = {}
    for t, ys in series.items():
        l, b = _holt_py(ys)
        expect[t] = (
            len(ys),
            math.floor(l * 1e6 + 0.5001),
            math.floor(b * 1e6 + 0.5001),
            math.floor((l + b) * 1e6 + 0.5001),
        )
    got = {
        r["event_type"]: (
            r["n_days"],
            r["level_e6"],
            r["trend_e6"],
            r["forecast_e6"],
        )
        for r in ts_holt_linear_trend(spark, SF).collect()
    }
    assert got == expect


def test_holt_tracks_linear_series_exactly():
    """On y = 5 + 2t the recurrence is exact: level follows the line
    and the trend stays 2, so the forecast is the true next value."""
    ys = [5.0 + 2.0 * t for t in range(12)]
    l, b = _holt_py(ys)
    assert abs(b - 2.0) < 1e-6
    assert abs(l - ys[-1]) < 1e-6
    assert abs((l + b) - (ys[-1] + 2.0)) < 1e-6
