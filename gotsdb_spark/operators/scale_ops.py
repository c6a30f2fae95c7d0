"""Scale-technique operators under the oracle gate.

These queries exist to hash-verify that the scale machinery (salting,
etc.) is *semantics-preserving*: each one runs the production-shape
plan and must produce byte-identical results to the naive formulation
the DuckDB oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gotsdb_spark.functions.skew import salted_join
from gotsdb_spark.operators.registry import query
from gotsdb_spark.sources.registry import load_table


@query(
    "skew_salted_event_segment_counts",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def skew_salted_event_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join under the hash gate: events⋈customer on user_id with
    the left side's keys spread over 8 salts, aggregated per segment.

    events.user_id is a hot-key-prone fact key (few users, many events
    each); salting splits each user's rows across 8 tasks so no single
    straggler carries a hot key when AQE can't see the skew. The oracle
    is the UNSALTED join — proving the salt/explode/join/drop dance is
    result-identical, which is the entire point of the technique.
    Measures are integer counts, so the result is association-safe
    under any partitioning.
    """
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id")
    cust = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(
        ev, cust, on=["user_id"], n_salts=8, left_id_cols=["event_id"]
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
