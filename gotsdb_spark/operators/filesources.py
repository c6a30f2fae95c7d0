"""File-based ingestion sources beyond columnar formats: Spark's
``binaryFile`` reader for opaque per-object payloads (the multimodal
object-store pattern) and the line-oriented ``text`` source/sink pair
(the log-drop / TSV-feed pattern).

Both queries are ROUND TRIPS under the hash gate: the data leaves the
fixture table through a distributed writer, comes back through the
Spark source under test, and is aggregated; the DuckDB oracle computes
the same aggregates from the ORIGINAL table, so hash equality proves
the source loses nothing (bytes, for binaryFile, via md5 checksums;
fields, for text, via parse-back).

Scale design:
- The per-object writer runs as ``foreachPartition`` on executors —
  each task writes only its partition's objects (on a cluster this is
  the shared object store), no driver loop, no collect.
- ``binaryFile`` lists and reads files in parallel and exposes
  (path, length, content); the checksum aggregate is order-independent
  (an integer SUM of per-file md5-prefix values), so it is insensitive
  to listing order and partitioning — the same trick the anti-entropy
  table checksums use.
- The text pair uses Spark's built-in text sink/source (one string
  column per line, splittable files, trivially parallel on read).

Reference parity: the reference (j0shgrant/gotsdb) persists opaque
per-key payloads as files under a data dir (cold.go:72 — one file per
store) and has no other source formats; binaryFile is the Spark-native
generalization of that layout (SURVEY.md §2.3 row 2, sources/sinks).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gotsdb_spark.operators.registry import query
from gotsdb_spark.scratch import scratch_dir as _scratch_dir
from gotsdb_spark.sources.registry import load_table

# Bound the object count: one file per documents row with doc_id % 7 == 0
# (~1/7 of the corpus) so the roundtrip exercises many-small-files
# listing without writing thousands of inodes per bench run.
_DOC_MOD = 7

# NOTE: no cross-invocation memo of the object dir — every invocation
# re-materializes its own objects so timed runs (bench min-of-2, sweep)
# pay the full ingestion roundtrip, write included. mkdtemp creates
# under the GLOBAL /tmp, which Python never cleans (ADVICE r13:
# bench min-of-2 and repeated sweeps would leak dirs for the host's
# lifetime), so every dir is tracked and removed at process exit
# (gotsdb_spark.scratch.scratch_dir).


def _write_doc_objects(docs: DataFrame, root: str) -> None:
    """Write one `<doc_id>.bin` (utf-8 text bytes) per row, executor-side."""

    def write_partition(rows) -> None:
        os.makedirs(root, exist_ok=True)
        for row in rows:
            tmp = os.path.join(root, f".{row['doc_id']}.tmp")
            dst = os.path.join(root, f"{row['doc_id']}.bin")
            with open(tmp, "wb") as fh:
                fh.write(row["text"].encode("utf-8"))
            os.replace(tmp, dst)  # atomic: readers never see partial files

    docs.foreachPartition(write_partition)


@query(
    "binaryfile_ingest_checksums",
    oracle=f"""
    SELECT lang,
           count(*) AS n_files,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(sum(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT))
                AS BIGINT) AS checksum
    FROM documents
    WHERE doc_id % {_DOC_MOD} = 0
    GROUP BY lang
    """,
)
def binaryfile_ingest_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Object-store ingestion via the ``binaryFile`` source: documents
    are materialized as one binary object each (executor-side writer),
    read back with ``spark.read.format("binaryFile")``, joined to their
    metadata by the id parsed from the path, and checksummed per lang.

    The checksum is a commutative integer sum of each object's md5
    prefix, so it is independent of file listing order AND proves the
    content bytes round-tripped exactly (the oracle hashes the original
    utf-8 text). total_bytes cross-checks the source's `length` metadata
    column against the original byte counts.

    Scale: binaryFile parallelizes over files; the id comes from the
    path (regexp on the filename — no content parsing needed to join);
    the lang dimension joins broadcast from the metadata table. The
    per-file md5 is a JVM built-in over the content column. On a
    cluster the same code points at an object-store prefix.
    """
    docs = (
        load_table(spark, "documents", sf_dir)
        .where(F.col("doc_id") % _DOC_MOD == 0)
        .select("doc_id", "text", "lang")
    )
    root = _scratch_dir("gotsdb_binfiles_")
    _write_doc_objects(docs.select("doc_id", "text"), root)
    meta = docs.select("doc_id", "lang")
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(root)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("length").cast("bigint").alias("nbytes"),
            F.conv(F.substring(F.md5(F.col("content")), 1, 8), 16, 10)
            .cast("bigint")
            .alias("h"),
        )
    )
    return (
        files.join(meta, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("nbytes").cast("bigint").alias("total_bytes"),
            F.sum("h").cast("bigint").alias("checksum"),
        )
    )


@query(
    "textfile_ingest_roundtrip",
    oracle="""
    SELECT lang,
           count(*) AS n_lines,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM documents
    GROUP BY lang
    """,
)
def textfile_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented interchange under the hash gate: document metadata
    leaves as tab-separated lines through the built-in text sink and
    comes back through ``spark.read.text`` + split-and-cast — the
    contract needed before trusting TSV/log drops from external
    producers.

    The oracle aggregates the ORIGINAL table, so equality proves the
    serialize → line files → parse pipeline loses no fields and no rows
    (including that no field value injects a delimiter or newline —
    which is exactly what this gate would catch).

    Scale: the text sink writes one splittable file per partition; the
    text source reads them back in parallel with no schema inference
    pass; parsing is JVM-side split/cast (no Python). Shuffle is the
    single map-side-combinable groupBy on lang.
    """
    docs = load_table(spark, "documents", sf_dir)
    path = _scratch_dir("gotsdb_textlines_")
    lines = docs.select(
        F.concat_ws(
            "\t",
            F.col("doc_id").cast("string"),
            F.col("lang"),
            F.col("n_chars").cast("string"),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(path)
    back = spark.read.text(path).select(
        F.split(F.col("value"), "\t").alias("f")
    )
    parsed = back.select(
        F.col("f").getItem(0).cast("bigint").alias("doc_id"),
        F.col("f").getItem(1).alias("lang"),
        F.col("f").getItem(2).cast("bigint").alias("n_chars"),
    )
    return parsed.groupBy("lang").agg(
        F.count("*").alias("n_lines"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
        F.max("doc_id").cast("bigint").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# XML interchange roundtrip — round-6 queue.
#
# Spark 4 ships the (formerly external) spark-xml source in core; this
# completes the interchange-format set next to CSV/JSON/ORC/text.
# NOT yet registered (round-5 driver window at capacity);
# tests/test_xml_roundtrip.py runs the DuckDB oracle comparison, so
# round 6 only adds the @query decorator.
# ---------------------------------------------------------------------------

XML_ROUNDTRIP_ORACLE = """
    SELECT s_nationkey,
           count(*) AS n_suppliers,
           CAST(sum(CAST(floor(s_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS balance_cents,
           CAST(min(s_suppkey) AS BIGINT) AS first_key,
           CAST(max(s_suppkey) AS BIGINT) AS last_key
    FROM supplier
    GROUP BY s_nationkey
"""


@query("xml_interchange_roundtrip", oracle=XML_ROUNDTRIP_ORACLE)
def xml_interchange_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML interchange under the hash gate: supplier rows leave through
    Spark 4's built-in XML sink and come back through the XML source
    with an EXPLICIT schema (no inference pass), then aggregate; the
    oracle reads the original parquet, so equality proves the
    element-per-row encode/parse loses nothing — the B2B/legacy-feed
    contract, next to the CSV/JSON/ORC/text roundtrips.

    Money crosses as integer cents (text formatting of raw doubles is
    not ulp-guaranteed; integers always are — the CSV-roundtrip
    convention). Scale: the sink writes one splittable file per
    partition; the source parses rowTag elements in parallel JVM-side;
    the single shuffle is the map-side-combinable nation groupBy.
    """
    sup = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey",
        "s_nationkey",
        F.floor(F.col("s_acctbal") * 100).cast("bigint").alias("balance_cents"),
    )
    path = _scratch_dir("gotsdb_xml_itg_")
    (
        sup.write.format("xml")
        .option("rootTag", "suppliers")
        .option("rowTag", "supplier")
        .mode("overwrite")
        .save(path)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "supplier")
        .schema("s_suppkey bigint, s_nationkey bigint, balance_cents bigint")
        .load(path)
    )
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"),
        F.sum("balance_cents").cast("bigint").alias("balance_cents"),
        F.min("s_suppkey").cast("bigint").alias("first_key"),
        F.max("s_suppkey").cast("bigint").alias("last_key"),
    )
