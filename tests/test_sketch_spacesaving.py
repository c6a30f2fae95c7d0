"""Misra–Gries two-pass heavy hitters: exactness and partitioning
invariance (operators/sketches.py:heavy_hitters_spacesaving —
registration deferred to round 6; the tests gate it now).

The key property under test: although the per-partition sketch content
depends on row order and partition boundaries, the FINAL output (exact
recount of candidates + integer HAVING) must equal the brute-force
group-by for any partitioning, because the candidate union provably
contains every key above the 1/capacity share threshold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gotsdb_spark.operators.sketches import heavy_hitters_spacesaving
from gotsdb_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"
CAP = 50  # low capacity at the tiny SF so the sketch actually evicts


def _brute(spark, capacity):
    ev = load_table(spark, "events", SF).select(
        F.col("user_id").cast("bigint").alias("key")
    )
    total = ev.count()
    return {
        (r["key"], r["cnt"])
        for r in (
            ev.groupBy("key")
            .agg(F.count("*").alias("cnt"))
            .where(F.col("cnt") * capacity > F.lit(total))
            .collect()
        )
    }


def test_spacesaving_equals_bruteforce(spark):
    got = {
        (r["key"], r["cnt"])
        for r in heavy_hitters_spacesaving(spark, SF, capacity=CAP).collect()
    }
    assert got == _brute(spark, CAP)
    assert got  # threshold chosen so the fixture has heavy hitters


def test_spacesaving_partitioning_invariant(spark):
    """Different physical partitionings change the sketch internals but
    must not change the exact output."""

    def run_with(n_parts: int):
        import gotsdb_spark.operators.sketches as sk
        from pyspark.sql import DataFrame

        orig = sk.load_table

        def repartitioned(spark_, name, sf_dir):
            df: DataFrame = orig(spark_, name, sf_dir)
            return df.repartition(n_parts)

        sk.load_table = repartitioned
        try:
            return {
                (r["key"], r["cnt"])
                for r in heavy_hitters_spacesaving(spark, SF, capacity=CAP).collect()
            }
        finally:
            sk.load_table = orig

    assert run_with(3) == run_with(17) == _brute(spark, CAP)


def test_spacesaving_share_algebra(spark):
    ev = load_table(spark, "events", SF)
    total = ev.count()
    for r in heavy_hitters_spacesaving(spark, SF, capacity=CAP).collect():
        assert r["cnt"] * CAP > total  # the guarantee threshold
        assert r["share_e6"] == r["cnt"] * 1_000_000 // total
