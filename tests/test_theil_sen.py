"""Theil–Sen robust slope: Spark vs the DuckDB oracle (run in-test —
the operator is queued for round-6 registration) plus a brute-force
Python median check and a robustness property OLS cannot satisfy.
"""

from __future__ import annotations

import pytest

import duckdb

from gotsdb_spark.operators.statistics import (
    THEIL_SEN_ORACLE,
    _TS_SLOPE_OFFSET,
    stats_theil_sen_slope,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    return con


def test_theil_sen_matches_oracle(spark, duck):
    got = sorted(
        (r["event_type"], r["n_pairs"], r["slope_e6"])
        for r in stats_theil_sen_slope(spark, SF).collect()
    )
    want = sorted(
        (a, int(b), int(c)) for a, b, c in duck.execute(THEIL_SEN_ORACLE).fetchall()
    )
    assert got == want and got


def test_theil_sen_median_is_pairwise_median(spark, duck):
    """Recompute the median slope in Python from the oracle's own daily
    frame — the lower-median order statistic of the offset slopes."""
    daily = duck.execute(
        """
        SELECT event_type,
               datediff('day', DATE '2025-01-01', CAST(ts AS DATE)) AS x,
               CAST(sum(CAST(floor(value * 1000) AS BIGINT)) // count(*)
                    AS BIGINT) AS y
        FROM events GROUP BY 1, 2
        """
    ).fetchall()
    by_type: dict[str, list[tuple[int, int]]] = {}
    for t, x, y in daily:
        by_type.setdefault(t, []).append((int(x), int(y)))
    expect = {}
    for t, pts in by_type.items():
        pts.sort()
        slopes = sorted(
            ((yb - ya) + _TS_SLOPE_OFFSET * (xb - xa)) * 1_000_000 // (xb - xa)
            for i, (xa, ya) in enumerate(pts)
            for (xb, yb) in pts[i + 1 :]
        )
        expect[t] = (
            len(slopes),
            slopes[(len(slopes) + 1) // 2 - 1] - _TS_SLOPE_OFFSET * 1_000_000,
        )
    got = {
        r["event_type"]: (r["n_pairs"], r["slope_e6"])
        for r in stats_theil_sen_slope(spark, SF).collect()
    }
    assert got == expect


def test_theil_sen_ignores_single_outlier_day():
    """Breakdown property on a synthetic series: one wild outlier day
    must not move the Theil–Sen median (while it would wreck OLS)."""
    pts = [(x, 10 * x) for x in range(10)]  # exact slope 10
    wild = pts[:5] + [(5, 10_000_000)] + pts[6:]

    def ts_slope(points):
        slopes = sorted(
            ((yb - ya) + _TS_SLOPE_OFFSET * (xb - xa)) * 1_000_000 // (xb - xa)
            for i, (xa, ya) in enumerate(points)
            for (xb, yb) in points[i + 1 :]
        )
        return slopes[(len(slopes) + 1) // 2 - 1] - _TS_SLOPE_OFFSET * 1_000_000

    assert ts_slope(pts) == 10_000_000  # 10 in e6 units
    assert ts_slope(wild) == 10_000_000  # unchanged by the outlier
