"""Semantic invariants + plan pins for the statistical-inference and
file-source operators (operators/inference.py, operators/filesources.py).

The oracle sweep proves cross-engine equality; these tests pin the
*mathematical* invariants (so a refactor that stays self-consistent
across engines but becomes wrong fails here) and the physical plan
properties that make the operators 100-TB-viable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gotsdb_spark.operators import QUERIES
from gotsdb_spark.plans import broadcast_join_count, plan_report, shuffle_count
from gotsdb_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Kolmogorov–Smirnov
# ---------------------------------------------------------------------------


def test_ks_bounds_and_partition_totals(spark):
    rows = QUERIES["stats_ks_priority_price"](spark, SF).collect()
    assert len(rows) == 5
    n_total = load_table(spark, "orders", SF).count()
    for r in rows:
        # each row splits the same population
        assert r["n_in"] + r["n_out"] == n_total
        # D is a probability: exact numerator within the denominator,
        # e6 within [0, 1e6]
        assert 0 <= r["d_num"] <= r["n_in"] * r["n_out"]
        assert 0 <= r["d_e6"] <= 1_000_000
        # exact rational consistency between the two encodings
        assert r["d_e6"] == r["d_num"] * 1_000_000 // (r["n_in"] * r["n_out"])


def test_ks_identical_distribution_is_zero(spark):
    """KS of a distribution against itself must be exactly 0 — feed a
    frame where in-group == out-group by duplicating every value."""
    from gotsdb_spark.operators.inference import ks_dnum_by_group

    df = spark.createDataFrame(
        [("A", v) for v in (100, 200, 300)] + [("B", v) for v in (100, 200, 300)],
        "prio string, v long",
    )
    assert all(r["d_num"] == 0 for r in ks_dnum_by_group(df).collect())


# ---------------------------------------------------------------------------
# G-test / mutual information
# ---------------------------------------------------------------------------


def test_mutual_info_shape_and_bounds(spark):
    row = QUERIES["stats_mutual_info_type_daypart"](spark, SF).collect()[0]
    assert row["n"] == load_table(spark, "events", SF).count()
    # 5 event types × 4 dayparts → dof = 12
    assert row["dof"] == 12
    # G is ≥ 0 up to per-cell flooring error (≤ 1e-6 × 20 cells)
    assert row["g_e6"] >= -20
    # MI in nats is bounded by ln(min(|rows|,|cols|)) = ln 4
    assert row["mi_e6"] <= int(1.3862944 * 1e6) + 1
    assert row["mi_e6"] == row["g_e6"] // (2 * row["n"])


# ---------------------------------------------------------------------------
# Poisson bootstrap
# ---------------------------------------------------------------------------


def test_bootstrap_ci_brackets_estimate(spark):
    rows = QUERIES["stats_bootstrap_ci_segment_price"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["lo_cents"] <= r["hi_cents"]
        # the point estimate sits inside (or at) the 95% band
        assert r["lo_cents"] <= r["mean_cents"] <= r["hi_cents"]
        assert r["n_orders"] > 0


def test_bootstrap_is_deterministic(spark):
    """Hash-derived resampling: two runs must agree bit-for-bit."""
    a = sorted(map(tuple, QUERIES["stats_bootstrap_ci_segment_price"](spark, SF).collect()))
    b = sorted(map(tuple, QUERIES["stats_bootstrap_ci_segment_price"](spark, SF).collect()))
    assert a == b


def test_bootstrap_plan_broadcasts_dim_no_cartesian(spark):
    # The r13 optimization checkpoints the shared orders⋈customer pass,
    # which hides the join from the registered query's final plan — pin
    # the join shape on the factored-out base frame instead.
    from gotsdb_spark.operators.inference import _bootstrap_base

    base = _bootstrap_base(spark, SF)
    assert broadcast_join_count(base) >= 1  # customer dim
    rep = plan_report(base)
    assert not rep["cartesian"] and not rep["nested_loop"]
    df = QUERIES["stats_bootstrap_ci_segment_price"](spark, SF)
    rep = plan_report(df)
    assert not rep["cartesian"] and not rep["nested_loop"]
    # explode collapses through partial aggregation: the plan past the
    # shared checkpoint stays a short chain (fan-out exchange → expand →
    # partial agg → exchange → window → final), not one shuffle per
    # replicate
    assert shuffle_count(df) <= 5


# ---------------------------------------------------------------------------
# Benford audit
# ---------------------------------------------------------------------------


def test_benford_exact_frequencies(spark):
    rows = QUERIES["quality_benford_price_audit"](spark, SF).collect()
    digits = {r["digit"] for r in rows}
    assert digits <= set(range(1, 10))
    n_total = sum(r["n_obs"] for r in rows)
    assert n_total == load_table(spark, "orders", SF).count()
    for r in rows:
        assert r["obs_freq_e6"] == r["n_obs"] * 1_000_000 // n_total
        assert r["dev_e6"] == r["obs_freq_e6"] - r["benford_e6"]
    # Benford expectation column is the precomputed constant table
    ref = {1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
           6: 66947, 7: 57992, 8: 51153, 9: 45757}
    for r in rows:
        assert r["benford_e6"] == ref[r["digit"]]


# ---------------------------------------------------------------------------
# Cross-correlation
# ---------------------------------------------------------------------------


def test_cross_correlation_shape_and_bounds(spark):
    rows = QUERIES["ts_cross_correlation_types"](spark, SF).collect()
    assert [r["lag"] for r in rows] == list(range(7))
    n0 = rows[0]["n"]
    for r in rows:
        # each +1 lag drops exactly one aligned pair off the grid
        assert r["n"] == n0 - r["lag"]
        assert -1_000_000 <= r["corr_e6"] <= 1_000_000
        # Cauchy–Schwarz on the exact integers
        assert r["num"] * r["num"] <= r["denx"] * r["deny"]


def test_cross_correlation_self_lag0_is_one(spark):
    """corr(x, x) at lag 0 must be exactly 1 under the query's own
    e6-flooring — pin the sufficient-statistics algebra on a tiny
    frame where y := x, so num == denx == deny."""
    import math

    hrs = spark.createDataFrame([(h, h * h % 7) for h in range(20)], "h long, x long")
    s = hrs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).collect()[0]
    num = s["n"] * s["sxx"] - s["sx"] * s["sx"]
    assert num > 0
    corr_e6 = math.floor(num / math.sqrt(num * num) * 1e6 + 0.5001)
    assert corr_e6 == 1_000_000


# ---------------------------------------------------------------------------
# File sources
# ---------------------------------------------------------------------------


def test_binaryfile_checksums_match_direct_compute(spark):
    """The binaryFile path must agree with hashing the table directly
    in Spark (engine-internal consistency, complementing the DuckDB
    oracle)."""
    got = {
        r["lang"]: (r["n_files"], r["total_bytes"], r["checksum"])
        for r in QUERIES["binaryfile_ingest_checksums"](spark, SF).collect()
    }
    direct = {
        r["lang"]: (r["n"], r["b"], r["c"])
        for r in (
            load_table(spark, "documents", SF)
            .where(F.col("doc_id") % 7 == 0)
            .groupBy("lang")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.octet_length(F.col("text"))).alias("b"),
                F.sum(
                    F.conv(F.substring(F.md5(F.encode("text", "utf-8")), 1, 8), 16, 10)
                    .cast("bigint")
                ).alias("c"),
            )
            .collect()
        )
    }
    assert got == direct


def test_textfile_roundtrip_counts(spark):
    rows = QUERIES["textfile_ingest_roundtrip"](spark, SF).collect()
    docs = load_table(spark, "documents", SF)
    assert sum(r["n_lines"] for r in rows) == docs.count()


def test_ks_window_is_partitioned_by_group(spark):
    """The KS cumulative windows must hash-partition on the group key —
    an unpartitioned (SinglePartition) window here would serialize the
    whole value domain through one task at scale."""
    from gotsdb_spark.plans import formatted_plan

    plan = formatted_plan(QUERIES["stats_ks_priority_price"](spark, SF))
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(prio" in plan


def test_binaryfile_single_shuffle_broadcast_meta(spark):
    """binaryFile ingestion: the only Exchange is the final lang groupBy;
    the doc-metadata join must broadcast (never shuffle the file scan)."""
    from gotsdb_spark.plans import broadcast_join_count, shuffle_count

    df = QUERIES["binaryfile_ingest_checksums"](spark, SF)
    assert shuffle_count(df) == 1
    assert broadcast_join_count(df) >= 1
