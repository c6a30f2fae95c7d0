"""End-to-end demo: everything a user of the reference does today, plus
what this engine adds.

The reference's entire documented workflow is "start the server on
port 8080 and hit it over HTTP" (reference README.md:11-34; routes
main.go:36-104). Part 1 reproduces exactly that against this engine.
Parts 2-4 run what the reference never had: SQL analytics, time-series
queries, and streaming ingest — over the same engine.

    python demo.py
"""

from __future__ import annotations

import json
import tempfile
import urllib.request

from gotsdb_spark.api import serve
from gotsdb_spark.session import get_spark
from gotsdb_spark.sources.registry import register_views
from gotsdb_spark.storage.engine import Engine
from gotsdb_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("gotsdb-demo")

    print("== 1. The reference workflow: KV over HTTP (port as in main.go:14) ==")
    engine = Engine(spark, tempfile.mkdtemp(prefix="gotsdb_demo_"))
    server = serve(engine, port=0)  # 8080 in production; ephemeral here
    base = f"http://127.0.0.1:{server.server_address[1]}"
    urllib.request.urlopen(f"{base}/collections/metrics/cpu0/0.93")
    urllib.request.urlopen(f"{base}/collections/metrics/cpu0/0.95")  # upsert
    with urllib.request.urlopen(f"{base}/collections/metrics/cpu0") as r:
        print("  read after overwrite:", r.read().decode())
    with urllib.request.urlopen(f"{base}/collections") as r:
        print("  collections:", r.read().decode())
    engine.flush_all_collections()  # durable — unlike the reference's
    server.shutdown()               # flush-only-on-crash (main.go:112-123)

    print("== 2. SQL analytics over the fixture warehouse ==")
    register_views(spark, SF)
    spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).show()

    print("== 3. Time-series: hourly rollup of the events stream ==")
    spark.sql(
        """
        SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
               round(sum(value), 2) AS total
        FROM events GROUP BY 1 ORDER BY 1 LIMIT 5
        """
    ).show()

    print("== 4. Structured Streaming: windowed counts from a replay ==")
    replay = tempfile.mkdtemp(prefix="gotsdb_demo_replay_")
    spark.table("events").repartition(8).write.mode("overwrite").parquet(replay)
    q = run_stream_to_memory(
        windowed_event_counts(read_events_stream(spark, replay)),
        "demo_counts",
        output_mode="complete",
    )
    spark.sql(
        "SELECT * FROM demo_counts ORDER BY window_start, event_type LIMIT 5"
    ).show()
    q.stop()
    print("done.")


if __name__ == "__main__":
    main()
