"""Streaming tests (SURVEY.md §5.2): file-source replay of `events`,
batch↔stream equivalence of the same transform, watermark-bounded
dedup, and the foreachBatch → KV-log sink."""


import pytest
from pyspark.sql import functions as F

from gotsdb_spark.sources.registry import load_table
from gotsdb_spark.storage.engine import Engine
from gotsdb_spark.streaming import (
    dedup_events,
    read_events_stream,
    run_stream_to_memory,
    session_window_values,
    stream_into_collection_log,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def replay_dir(spark, tmp_path_factory):
    """Events re-written as many small parquet files, out of order by
    event_id so micro-batches see non-monotonic event time."""
    path = str(tmp_path_factory.mktemp("events_replay"))
    ev = load_table(spark, "events", SF)
    # 16 shuffled files → maxFilesPerTrigger=4 gives 4 micro-batches
    ev.orderBy(F.hash("event_id")).repartition(16).write.mode("overwrite").parquet(path)
    return path


def test_stream_batch_equivalence_windowed_counts(spark, replay_dir):
    stream = read_events_stream(spark, replay_dir)
    q = run_stream_to_memory(
        windowed_event_counts(stream), "win_counts", output_mode="complete"
    )
    try:
        got = {
            (r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
    finally:
        q.stop()
    batch = windowed_event_counts(spark.read.parquet(replay_dir))
    want = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in batch.collect()
    }
    assert got == want


def test_stream_batch_equivalence_session_windows(spark, replay_dir):
    # The replay is shuffled across ~30 days of event time, so session
    # fragments land in different micro-batches; a watermark shorter than
    # the replay disorder would (correctly) refuse to merge them. Use a
    # full-span watermark to assert pure batch↔stream equivalence.
    wm = "768 hours"
    stream = read_events_stream(spark, replay_dir)
    q = run_stream_to_memory(
        session_window_values(stream, watermark=wm), "sess_win", output_mode="complete"
    )
    try:
        got = {
            (r["session_start"], r["user_id"]): r["n_events"]
            for r in spark.sql("SELECT * FROM sess_win").collect()
        }
    finally:
        q.stop()
    batch = session_window_values(spark.read.parquet(replay_dir), watermark=wm)
    want = {(r["session_start"], r["user_id"]): r["n_events"] for r in batch.collect()}
    assert got == want


def test_streaming_dedup_drops_replayed_events(spark, tmp_path, replay_dir):
    """Duplicate the whole input: dedup must return each event_id once."""
    dup_dir = str(tmp_path / "dup")
    ev = spark.read.parquet(replay_dir)
    ev.unionAll(ev).repartition(8).write.mode("overwrite").parquet(dup_dir)
    stream = dedup_events(read_events_stream(spark, dup_dir))
    q = run_stream_to_memory(stream.select("event_id"), "dedup_out")
    try:
        rows = spark.sql("SELECT count(*) c, count(DISTINCT event_id) d FROM dedup_out").first()
    finally:
        q.stop()
    n_src = ev.count()
    assert rows["d"] == n_src
    assert rows["c"] == n_src  # every id exactly once despite the replay


def test_foreach_batch_kv_sink_feeds_engine(spark, tmp_path, replay_dir):
    """Stream → collection log → read through the KV engine."""
    data_dir = tmp_path / "data"
    log_path = str(data_dir / "evlog")
    checkpoint = str(tmp_path / "ckpt")
    stream = read_events_stream(spark, replay_dir)
    q = stream_into_collection_log(stream, log_path, checkpoint).start()
    q.processAllAvailable()
    q.stop()

    engine = Engine(spark, str(data_dir))
    assert "evlog" in engine.list_cold()
    ev = spark.read.parquet(replay_dir)
    some = ev.orderBy("event_id").select("event_id", "props").first()
    assert engine.read_key("evlog", str(some["event_id"])) == some["props"]
    assert engine.snapshot("evlog").count() == ev.count()


@pytest.mark.slow
def test_stream_stream_interval_join_matches_batch(spark, replay_dir):
    from gotsdb_spark.streaming.ingest import join_purchases_with_recent_errors

    def split(df):
        return (
            df.where(F.col("event_type") == "purchase"),
            df.where(F.col("event_type") == "error"),
        )

    sp, se = split(read_events_stream(spark, replay_dir))
    joined = join_purchases_with_recent_errors(sp, se, "720 hours")
    q = run_stream_to_memory(joined.select("p_id", "e_id"), "ss_join")
    try:
        got = {(r["p_id"], r["e_id"]) for r in spark.sql("SELECT * FROM ss_join").collect()}
    finally:
        q.stop()

    bp, be = split(spark.read.parquet(replay_dir))
    want = {
        (r["p_id"], r["e_id"])
        for r in join_purchases_with_recent_errors(bp, be, "720 hours")
        .select("p_id", "e_id")
        .collect()
    }
    assert got == want and len(want) > 0


def test_rate_source_smoke(spark):
    """Non-file streaming source: the built-in rate source drives the
    same transforms (production swaps in Kafka the same way)."""
    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 500).load()
        .select(
            F.col("value").alias("event_id"),
            F.col("timestamp").alias("ts"),
            (F.col("value") % 5).alias("user_id"),
            F.lit("view").alias("event_type"),
            (F.col("value") * 1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    q = (
        windowed_event_counts(rate, window="1 second", watermark="5 seconds")
        .writeStream.format("memory")
        .queryName("rate_out")
        .outputMode("complete")
        .start()
    )
    try:
        import time

        deadline = time.time() + 20
        while time.time() < deadline:
            q.processAllAvailable()
            if spark.sql("SELECT coalesce(sum(n),0) FROM rate_out").first()[0] > 0:
                break
            time.sleep(0.5)
        total = spark.sql("SELECT coalesce(sum(n),0) FROM rate_out").first()[0]
    finally:
        q.stop()
    assert total > 0


def test_stream_static_enrichment_matches_batch(spark, tmp_path):
    """Stream-static broadcast join: streamed events enriched with the
    customer dimension equal the batch join."""
    import os as _os

    from gotsdb_spark.streaming.ingest import (
        enrich_with_dimension,
        read_events_stream,
    )

    src = str(tmp_path / "src_enrich")
    _os.makedirs(src)
    ev = load_table(spark, "events", SF)
    dim = load_table(spark, "customer", SF).select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    ev.write.mode("append").parquet(src)

    q = (
        enrich_with_dimension(read_events_stream(spark, src), dim)
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["event_id"], r["c_mktsegment"])
            for r in spark.sql(
                "SELECT event_id, c_mktsegment FROM enriched"
            ).collect()
        }
    finally:
        q.stop()
    want = {
        (r["event_id"], r["c_mktsegment"])
        for r in ev.join(F.broadcast(dim), "user_id", "left")
        .select("event_id", "c_mktsegment")
        .collect()
    }
    assert got == want


def test_available_now_drains_and_stops(spark, tmp_path):
    """Trigger.availableNow processes the backlog then terminates on
    its own — the incremental-batch contract."""
    import os as _os

    from gotsdb_spark.streaming.ingest import (
        read_events_stream,
        run_available_now,
    )

    src = str(tmp_path / "src_avnow")
    _os.makedirs(src)
    ev = load_table(spark, "events", SF)
    ev.write.mode("append").parquet(src)

    q = run_available_now(read_events_stream(spark, src), "avnow_out")
    q.awaitTermination(120)
    assert not q.isActive  # drained the backlog and stopped itself
    assert (
        spark.sql("SELECT count(*) n FROM avnow_out").collect()[0]["n"]
        == ev.count()
    )


@pytest.mark.slow
def test_outer_stream_stream_join_emits_nulls_after_watermark(spark, tmp_path):
    """leftOuter stream-stream interval join: matched purchases carry
    their errors; unmatched purchases emit exactly once with NULL error
    columns after the watermark passes their window."""
    import os as _os

    from gotsdb_spark.streaming.ingest import (
        join_purchases_with_recent_errors,
        read_events_stream,
    )

    psrc, esrc = str(tmp_path / "p_out"), str(tmp_path / "e_out")
    for d in (psrc, esrc):
        _os.makedirs(d)
    ev = load_table(spark, "events", SF)
    purchases = ev.where(F.col("event_type") == "purchase")
    errors = ev.where(F.col("event_type") == "error")

    sp = read_events_stream(spark, psrc)
    se = read_events_stream(spark, esrc)
    q = (
        join_purchases_with_recent_errors(sp, se, "1 hour", how="leftOuter")
        .writeStream.format("memory")
        .queryName("outer_join_out")
        .outputMode("append")
        .start()
    )
    try:
        purchases.write.mode("append").parquet(psrc)
        errors.write.mode("append").parquet(esrc)
        q.processAllAvailable()
        # Advance both watermarks far past every window so unmatched
        # purchases are provably unmatched and must emit.
        sentinel = ev.limit(1).withColumn(
            "ts", F.to_timestamp(F.lit("2030-01-01 00:00:00"))
        ).withColumn("event_id", F.lit(999_999_999))
        sentinel.write.mode("append").parquet(psrc)
        sentinel.write.mode("append").parquet(esrc)
        q.processAllAvailable()
        got = {
            (r["p_id"], r["e_id"])
            for r in spark.sql(
                "SELECT p_id, e_id FROM outer_join_out WHERE p_id <> 999999999"
            ).collect()
        }
    finally:
        q.stop()

    p = purchases.select(
        F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts"),
        F.col("user_id").alias("p_user"),
    )
    e = errors.select(
        F.col("event_id").alias("e_id"), F.col("ts").alias("e_ts"),
        F.col("user_id").alias("e_user"),
    )
    want = {
        (r["p_id"], r["e_id"])
        for r in p.join(
            e,
            (F.col("p_user") == F.col("e_user"))
            & (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("e_ts") <= F.col("p_ts")),
            "left",
        ).collect()
    }
    assert got == want
    assert any(eid is None for _, eid in got)  # NULL emission really happened


def test_progress_metrics_account_for_all_input_rows(spark, tmp_path):
    """Operational observability: the query's progress log must account
    for every source row (sum of numInputRows) and expose state-store
    size for the stateful operator — the numbers an on-call engineer
    alarms on. Uses recentProgress (synchronous after
    processAllAvailable) rather than a listener, so the check is
    deterministic."""
    from pyspark.sql import functions as F

    from gotsdb_spark.sources.registry import load_table
    from gotsdb_spark.streaming import (
        read_events_stream,
        windowed_event_counts,
    )

    sf = "/root/testdata/sf0.001"
    src = str(tmp_path / "src")
    ev = load_table(spark, "events", sf).where(
        F.col("event_type").isin("purchase", "signup")
    )
    n_src = ev.count()
    ev.repartition(2).write.mode("append").parquet(src)

    stream = windowed_event_counts(
        read_events_stream(spark, src, 1), watermark="1 hour"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("obs_metrics")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        progress = q.recentProgress
        assert sum(p["numInputRows"] for p in progress) == n_src
        state_ops = [p for p in progress if p.get("stateOperators")]
        assert state_ops, "no state operator metrics reported"
        last_state = state_ops[-1]["stateOperators"][0]
        # state rows = number of open (window, event_type) groups
        got_rows = spark.table("obs_metrics").count()
        assert last_state["numRowsTotal"] == got_rows
    finally:
        q.stop()
