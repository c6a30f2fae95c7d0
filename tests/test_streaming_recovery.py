"""Streaming checkpoint-restart recovery: exactly-once across a query
restart.

The KV engine has crash-recovery tests (test_recovery.py); this is the
streaming twin. A production ingest job dies and restarts constantly —
correctness there means the checkpoint's offset log skips everything
already committed and the file sink's transaction log never exposes a
row twice, even though the restarted query sees the same source
directory (old files included) and an interrupted epoch may have
half-written data files.
"""

from pyspark.sql import functions as F

from gotsdb_spark.sources.registry import load_table
from gotsdb_spark.streaming import read_events_stream

SF = "/root/testdata/sf0.001"

COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _start(spark, src, out, ckpt):
    stream = read_events_stream(spark, src, 64).select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 1000).cast("long").alias("v_milli"),
    )
    return (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )


def test_checkpoint_restart_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    ev = load_table(spark, "events", SF)
    wave1 = ev.where(F.col("event_id") % 2 == 0)
    wave2 = ev.where(F.col("event_id") % 2 == 1)

    # Epoch 1: process wave 1, then stop the query (planned shutdown —
    # offsets and sink commits are durable in ckpt/out).
    wave1.select(COLS).repartition(1).write.mode("append").parquet(src)
    q1 = _start(spark, src, out, ckpt)
    q1.processAllAvailable()
    q1.stop()

    n1 = spark.read.parquet(out).count()
    assert n1 == wave1.count()

    # Epoch 2: wave 2 lands while the job is down; a NEW query instance
    # resumes from the same checkpoint. Wave-1 files are still in the
    # source directory — the offset log must skip them.
    wave2.select(COLS).repartition(1).write.mode("append").parquet(src)
    q2 = _start(spark, src, out, ckpt)
    q2.processAllAvailable()
    q2.stop()

    got = spark.read.parquet(out)
    total = ev.count()
    assert got.count() == total  # nothing lost, nothing duplicated
    assert got.select("event_id").distinct().count() == total
    # values survived the restart bit-exactly
    want_sum = ev.select(
        F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("s")
    ).collect()[0]["s"]
    assert got.agg(F.sum("v_milli").alias("s")).collect()[0]["s"] == want_sum


def test_restart_with_no_new_data_is_a_noop(spark, tmp_path):
    """Restarting against a fully-committed checkpoint must add zero
    rows — the degenerate case of at-least-once delivery that the sink
    transaction log turns into exactly-once."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    ev = load_table(spark, "events", SF).limit(200)
    ev.select(COLS).repartition(1).write.mode("append").parquet(src)

    q1 = _start(spark, src, out, ckpt)
    q1.processAllAvailable()
    q1.stop()
    n1 = spark.read.parquet(out).count()

    q2 = _start(spark, src, out, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(out).count() == n1
