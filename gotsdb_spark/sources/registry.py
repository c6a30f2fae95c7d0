"""Batch sources: the fixture-table registry.

The reference's entire I/O surface is a whole-blob gob read/write per
collection (/root/reference/internal/storage/cold.go:111-154). Here the
cold tier is columnar Parquet read through `spark.read.parquet`, which
buys predicate pushdown, column pruning, min/max skipping and compression
for free — none of which the reference has.

`load_table` is the one choke point for scans so scan-level tuning
(schema pinning, partition discovery) happens in exactly one place.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that should always be broadcast in star joins. At any
# realistic scale factor these stay tiny (region=5, nation=25 rows) or
# grow far slower than the fact tables.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "customer", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one fixture table (columnar scan; pushdown-capable).

    `events.ts` is parquet TIMESTAMP(NANOS), which Spark reads as a long
    (spark.sql.legacy.parquet.nanosAsLong) — convert to a microsecond
    TIMESTAMP here so every downstream operator sees a real timestamp.
    The ns→µs truncation matches DuckDB's CAST(ts AS TIMESTAMP).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # Runtime-set (not only in our session factory): the driver may
        # hand us a session built without this flag, and without it the
        # TIMESTAMP(NANOS) column fails the read outright.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # Integer `div`, not `/`: float division of int64 nanos loses
        # precision (2^53 < 1.7e18) and corrupts microseconds.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def fan_out(df: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin repartition to the session's default parallelism.

    The fixture tables are single parquet files, which Spark scans as 1-2
    partitions — CPU-heavy row-local operators (hashing, vector math,
    Pandas UDF decode) would then run on 1-2 cores. On a real cluster the
    input is already thousands of splits and this is a cheap no-op-ish
    rebalance; locally it unlocks all cores. Use ONLY ahead of expensive
    per-row compute — a plain filter/agg doesn't warrant the shuffle.
    """
    sc = df.sparkSession.sparkContext
    return df.repartition(n or sc.defaultParallelism)


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view for spark.sql()."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
