"""Scale-technique tests: bucketed zero-shuffle joins, salted skew
joins, and the spark.sql entry point over registered views."""

import pytest
from pyspark.sql import functions as F

from gotsdb_spark.functions.skew import salted_join
from gotsdb_spark.plans import formatted_plan, shuffle_count
from gotsdb_spark.sources.bucketing import bucketed_join_lineitem_orders
from gotsdb_spark.sources.registry import load_table, register_views

SF = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_bucketed_join_has_no_shuffle(spark):
    joined = bucketed_join_lineitem_orders(spark, SF)
    assert shuffle_count(joined) == 0, formatted_plan(joined)
    # and it still computes the right thing
    li = load_table(spark, "lineitem", SF)
    assert joined.count() == li.count()


def test_salted_join_equals_plain_join(spark):
    # synthetic skew: one key owns 90% of the left side
    left = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("row_id"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    plain = left.join(right, ["k"]).select("row_id", "k", "v")
    salted = salted_join(left, right, ["k"], 8, ["row_id"]).select(
        "row_id", "k", "v"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_sql_entry_point_over_views(spark):
    register_views(spark, SF)
    out = spark.sql(
        """
        SELECT r_name, count(*) AS n_nations
        FROM region JOIN nation ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
        """
    ).collect()
    assert [r["n_nations"] for r in out] == [5, 5, 5, 5, 5]
