"""SparkSession factory.

Single place where execution-relevant configuration lives so every entry
point (tests, bench, driver contract) runs with the same, scale-aware
settings:

- AQE on (runtime join-strategy switch, skew-join splitting, partition
  coalescing) — at 100 TB the static plan is always wrong somewhere.
- shuffle.partitions sized to local cores for the test harness; on a real
  cluster AQE coalescing makes the initial number mostly a ceiling.
- UTC session timezone pinned so results hash-match the DuckDB oracle
  (DuckDB timestamps are UTC-naive).
- Arrow enabled for every pandas_udf / applyInPandas boundary.
"""

from __future__ import annotations

import atexit
import os
import shutil

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def _cleanup_warehouse(path: str) -> None:
    """Best-effort removal of this process's private warehouse dir.

    The per-PID default (see get_spark) fixes the concurrent-rmtree
    race but would otherwise leak a bucketed-table copy into /tmp per
    process; registered via atexit so the directory dies with the
    process that materialized it. An explicitly shared
    SPARK_GRAFT_WAREHOUSE is never touched — its lifecycle belongs to
    the user.
    """
    shutil.rmtree(path, ignore_errors=True)


def _warehouse_dir() -> str:
    """Warehouse path: explicit SPARK_GRAFT_WAREHOUSE wins; otherwise a
    per-PID /tmp dir with atexit cleanup (registered once)."""
    explicit = os.environ.get("SPARK_GRAFT_WAREHOUSE")
    if explicit:
        return explicit
    path = f"/tmp/spark_graft_warehouse_{os.getpid()}"
    if not getattr(_warehouse_dir, "_registered", False):
        atexit.register(_cleanup_warehouse, path)
        _warehouse_dir._registered = True  # type: ignore[attr-defined]
    return path


def get_spark(app_name: str = "gotsdb_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the configured SparkSession."""
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Let split sizing be purely byte-based (maxPartitionBytes):
        # the default floor (defaultParallelism) shreds small inputs
        # into per-file / empty-byte-range tasks — the dt-partitioned
        # events copy full-scanned as 30 one-file tasks (0.47 s vs
        # 0.31 s packed, sf0.1), and single-row-group fixtures spawned
        # 31 empty splits. At 100 TB the floor is irrelevant: splits =
        # bytes / maxPartitionBytes >> parallelism. CPU-heavy per-row
        # paths keep their parallelism via fan_out, which is the
        # explicit tool for that (sources/registry.py).
        .config("spark.sql.files.minPartitionNum", "1")
        # Fixture `events` carries parquet TIMESTAMP(NANOS); Spark has no
        # nanosecond timestamp type, so read as long and convert in
        # sources.registry.load_table (truncating to micros, matching the
        # DuckDB oracle's CAST(ts AS TIMESTAMP)).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Streaming state lives in RocksDB, not the executor heap: at
        # 100 TB/day the watermarked window/session/dedup state of a
        # long-running stream outgrows JVM memory; RocksDB spills to
        # local disk with changelog checkpointing and bounds GC pressure.
        # (Bundled with Spark — no extra dependency.)
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        # Warehouse is PER-PROCESS by default: bucketed-table
        # materialization (sources/bucketing.py) rewrites managed-table
        # directories, so two concurrent local processes sharing one
        # warehouse can rmtree a directory the other is mid-scan on
        # (observed as FAILED_READ_FILE when a sweep ran beside the
        # test suite). A shared path can still be opted into via
        # SPARK_GRAFT_WAREHOUSE for single-process runs; the per-PID
        # default is atexit-removed so repeated runs don't accumulate
        # unbounded /tmp disk.
        .config("spark.sql.warehouse.dir", _warehouse_dir())
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def configure_for_scale(spark: SparkSession, target_bytes: int) -> None:
    """Re-tune shuffle parallelism for a given input size.

    Rule of thumb: ~128 MiB per shuffle partition post-filter. With AQE
    coalescing enabled this sets a ceiling, not an exact count, so erring
    high is cheap. On a 1000-executor cluster reading 100 TB you'd want
    O(100k) shuffle partitions; locally the driver clamps to cores*4.
    """
    per_part = 128 * 1024 * 1024
    n = max(DEFAULT_CPUS, min(200_000, target_bytes // per_part))
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
