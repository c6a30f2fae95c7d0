"""Watermark semantics: events later than the watermark are dropped
from append-mode windowed aggregation (SURVEY.md §5.2 — the
late-data/watermark behavior test)."""

import datetime as dt

from gotsdb_spark.streaming import (
    read_events_stream,
    windowed_event_counts,
)


def _rows(spark, *ts_list, etype="click"):
    data = [
        (i, t, 1, etype, 1.0, "{}")
        for i, t in enumerate(ts_list)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def test_late_events_dropped_in_append_mode(spark, tmp_path):
    src = str(tmp_path / "src")
    import os

    os.makedirs(src)
    d = dt.datetime(2024, 1, 20)

    stream = read_events_stream(spark, src, max_files_per_trigger=100)
    agg = windowed_event_counts(stream, window="1 hour", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_out")
        .outputMode("append")
        .start()
    )
    try:
        # Batch 1: two on-time events at 10:xx → watermark → 09:30
        _rows(spark, d.replace(hour=10, minute=0), d.replace(hour=10, minute=30)).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        # Batch 2: advance watermark far past the 10:00 window (event at
        # 23:00 → watermark 22:00), closing and emitting it.
        _rows(spark, d.replace(hour=23)).write.mode("append").parquet(src)
        q.processAllAvailable()
        # Batch 3: a very late event at 08:00 (< watermark 22:00) must be
        # DROPPED — its window never appears. Also one more 23:xx event.
        _rows(spark, d.replace(hour=8), d.replace(hour=23, minute=30)).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM late_out").collect()
    finally:
        q.stop()

    emitted = {r["window_start"].hour: r["n"] for r in out}
    assert emitted.get(10) == 2, f"on-time window missing/wrong: {emitted}"
    assert 8 not in emitted, f"late event was not dropped: {emitted}"
