"""Rollup hierarchy: materialized hourly→daily must equal direct
aggregation of raw (merge losslessness)."""

from pyspark.sql import functions as F

from gotsdb_spark.operators.rollups import materialize_rollups, merge_up
from gotsdb_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def test_materialized_rollups_match_raw(spark, tmp_path):
    paths = materialize_rollups(spark, SF, str(tmp_path / "rollups"))
    daily = spark.read.parquet(paths["daily"])
    raw = load_table(spark, "events", SF)
    want = raw.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"), F.sum("value").alias("s"))

    got = {
        (r["day"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in daily.collect()
    }
    expect = {
        (r["day"], r["event_type"]): (r["n"], round(r["s"], 6)) for r in want.collect()
    }
    assert got == expect


def test_monthly_merge_from_daily(spark, tmp_path):
    paths = materialize_rollups(spark, SF, str(tmp_path / "rollups2"))
    daily = spark.read.parquet(paths["daily"])
    monthly = merge_up(daily, "day", "month", "month")
    raw = load_table(spark, "events", SF)
    want = raw.groupBy(F.date_trunc("month", "ts").alias("month")).agg(
        F.count("*").alias("n")
    )
    got = {
        r["month"]: r["n"]
        for r in monthly.groupBy("month").agg(F.sum("n").alias("n")).collect()
    }
    assert got == {r["month"]: r["n"] for r in want.collect()}
