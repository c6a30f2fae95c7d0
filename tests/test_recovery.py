"""Recovery semantics: streaming restart from checkpoint must not
duplicate sink output, and the KV engine must handle collections at
the distributed-path scale."""

import os

from pyspark.sql import functions as F

from gotsdb_spark.sources.registry import load_table
from gotsdb_spark.storage.engine import Engine
from gotsdb_spark.streaming import read_events_stream, stream_into_collection_log

SF = "/root/testdata/sf0.001"


def test_stream_restart_from_checkpoint_no_duplicates(spark, tmp_path):
    """Stop a foreachBatch stream mid-input, restart with the same
    checkpoint, finish — the KV log must contain each event exactly
    once (epoch tracking makes the sink idempotent across restarts)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    data_dir = tmp_path / "data"
    log_path = str(data_dir / "ckptlog")
    checkpoint = str(tmp_path / "ckpt")
    ev = load_table(spark, "events", SF)

    # phase 1: half the data, then stop the query
    ev.where(F.col("event_id") % 2 == 0).write.mode("append").parquet(src)
    q1 = stream_into_collection_log(
        read_events_stream(spark, src), log_path, checkpoint
    ).start()
    q1.processAllAvailable()
    q1.stop()

    # phase 2: rest of the data, new query instance, same checkpoint
    ev.where(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)
    q2 = stream_into_collection_log(
        read_events_stream(spark, src), log_path, checkpoint
    ).start()
    q2.processAllAvailable()
    q2.stop()

    engine = Engine(spark, str(data_dir))
    n_total = ev.count()
    assert engine.snapshot("ckptlog").count() == n_total
    raw_log = spark.read.parquet(log_path)
    assert raw_log.count() == n_total  # no replayed appends at all


def test_kv_large_collection_both_paths(spark, tmp_path):
    """A 150k-key collection through flush/promotion on both read paths
    (driver-dict materialized vs distributed cached view)."""
    data = str(tmp_path / "data")
    orders = load_table(spark, "orders", SF)
    log = orders.select(
        F.col("o_orderkey").cast("string").alias("key"),
        F.col("o_orderstatus").alias("value"),
        F.col("o_orderdate").alias("write_ts"),
        F.lit(0).cast("long").alias("seq"),
    )
    os.makedirs(data)
    log.write.mode("overwrite").parquet(os.path.join(data, "big"))

    sample = orders.orderBy("o_orderkey").limit(3).collect()
    # materialized path
    e1 = Engine(spark, data)
    for r in sample:
        assert e1.read_key("big", str(r["o_orderkey"])) == r["o_orderstatus"]
    # distributed path (threshold below collection size)
    e2 = Engine(spark, data, materialize_threshold=10)
    for r in sample:
        assert e2.read_key("big", str(r["o_orderkey"])) == r["o_orderstatus"]
    assert e1.snapshot("big").count() == orders.count()
