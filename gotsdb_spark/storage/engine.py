"""KV-parity storage engine: the reference's two-tier hot/cold collection
store re-expressed Spark-first.

Reference model (j0shgrant/gotsdb, all citations into /root/reference):
- Collection = map[string]string (internal/storage/types.go:3).
- Hot tier = process-local maps (hot.go:8-10); cold tier = one
  whole-blob gob file per collection (cold.go:14-16, 111-154).
- Engine composes the tiers with read-through promotion
  (engine.go:139-173), write-to-hot-only durability (engine.go:175-185),
  auto-create (engine.go:187-222), explicit flush/evict
  (engine.go:111-126).

Spark-native design (SURVEY.md §1.3) — not a translation:
- A collection's cold form is a **Parquet append-log** of
  (key, value, write_ts, seq) under <data_dir>/<id>/, columnar and
  compressed where the reference rewrites an uncompressed gob blob
  (cold.go:140,152). Last-writer-wins upsert (hot.go:53) becomes
  log-compaction: row_number() over (partitionBy key, orderBy
  write_ts/seq desc) == 1 — the idiomatic immutable-storage upsert.
- The hot tier is Spark's block manager: promotion = read + compact +
  .cache() (engine.go:100-109 ≙ lazy cache materialization), eviction =
  .unpersist() (engine.go:121). A driver-side overlay dict holds
  unflushed writes so read-your-writes holds without re-shuffling the
  cached view on every point write.
- Flush appends only the pending delta as a new log segment instead of
  rewriting the collection (cold.go:136-154 rewrites everything) —
  at 100 TB a flush is O(delta), and `compact()` is the explicit
  log-rewrite maintenance job.

Deliberately NOT replicated (reference bugs/gaps, SURVEY.md §1.1):
unsynchronized concurrent map access, flush-only-on-crash durability,
the unanchored filename regex (cold.go:72), HTTP 500 for missing keys.

Error-message parity: the user-visible error strings match the
reference byte-for-byte (hot.go:43,47,65,84; engine.go:172,221).
"""

from __future__ import annotations

import os
import re
import shutil
import threading

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

LOG_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("write_ts", T.TimestampType(), True),
        T.StructField("seq", T.LongType(), False),
    ]
)

# Collection ids: alphanumeric, per the cold-listing regex (cold.go:72) —
# but anchored, unlike the reference's buggy unanchored pattern.
_ID_RE = re.compile(r"^[a-zA-Z0-9]+$")


class CollectionNotFoundError(KeyError):
    pass


class CollectionExistsError(ValueError):
    pass


class KeyNotFoundError(KeyError):
    pass


def _err_not_found_any(id: str) -> CollectionNotFoundError:
    # engine.go:172
    return CollectionNotFoundError(
        f"No collection found for collection id [{id}] in hot or cold storage"
    )


def _err_not_found_hot(id: str) -> CollectionNotFoundError:
    # hot.go:47
    return CollectionNotFoundError(
        f"No collection found for collection id [{id}] in hot storage."
    )


class Engine:
    """Two-tier collection engine over a SparkSession.

    API parity map (reference → here): ListCollections → list_collections
    (engine.go:39-66), CollectionExists → collection_exists
    (engine.go:69-82), IsHot → is_hot (engine.go:85-98), LoadCollection →
    load_collection (engine.go:100-109), FlushCollection →
    flush_collection (engine.go:111-126), FlushAllCollections →
    flush_all_collections (engine.go:128-137), ReadKey → read_key
    (engine.go:139-173), WriteKey → write_key (engine.go:175-185),
    auto-create (engine.go:187-222), CreateCollection/DropCollection
    (hot.go:62-85).
    """

    def __init__(
        self,
        spark: SparkSession,
        data_dir: str,
        auto_create_collection: bool = True,
        materialize_threshold: int = 1_000_000,
    ) -> None:
        self.spark = spark
        self.data_dir = os.path.abspath(data_dir)
        self.auto_create = auto_create_collection
        # Collections up to this many compacted keys are ALSO pulled into
        # a driver-side dict on promotion, giving O(1) point reads — the
        # reference's own semantics (it gob-decodes the whole collection
        # into process memory, engine.go:100-109). Larger collections
        # stay executor-side and point reads run as filters on the
        # cached view; at 100 TB that's the only possible mode.
        self.materialize_threshold = materialize_threshold
        os.makedirs(self.data_dir, exist_ok=True)  # cold.go:27-38
        # Hot tier: compacted base view (cached DataFrame or None for
        # empty/new collections) + unflushed-write overlay.
        self._hot_base: dict[str, DataFrame | None] = {}
        self._hot_dict: dict[str, dict[str, str] | None] = {}
        self._pending: dict[str, dict[str, str]] = {}
        # Durable per-collection sequence floor: the max `seq` present in
        # the cold log, discovered lazily and advanced on every flush.
        # Guarantees cross-segment (and cross-engine-generation) seqs are
        # strictly increasing, so the (write_ts, seq) LWW tie-break stays
        # correct even when two flushes land in the same timestamp tick.
        self._seq_floor: dict[str, int] = {}
        self._lock = threading.RLock()  # the reference races (hot.go:53); we don't

    # -- paths ----------------------------------------------------------

    def _path(self, id: str) -> str:
        if not _ID_RE.match(id):
            raise ValueError(f"invalid collection id [{id}]")
        return os.path.join(self.data_dir, id)

    def _log_seq_floor(self, id: str) -> int:
        """Max seq already persisted in the collection's log (0 if none).

        One parquet-stats scan of a single column per engine generation;
        cached and advanced locally afterwards."""
        if id in self._seq_floor:
            return self._seq_floor[id]
        path = self._path(id)
        floor = 0
        if os.path.isdir(path):
            row = (
                self.spark.read.schema(LOG_SCHEMA)
                .parquet(path)
                .agg(F.max("seq"))
                .first()
            )
            if row is not None and row[0] is not None:
                floor = int(row[0])
        self._seq_floor[id] = floor
        return floor

    # -- crash recovery -------------------------------------------------

    def _recover(self, id: str) -> None:
        """Finish or roll back an interrupted compact() swap.

        States after a crash: the live dir may be missing while either
        the fully-written replacement (``<id>.compact.tmp`` containing a
        parquet _SUCCESS marker) or the displaced original
        (``<id>.compact.old``) still exists. Promote the complete tmp if
        present, else restore the original; stale leftovers next to a
        live dir are deleted."""
        path = self._path(id)
        tmp, bak = path + ".compact.tmp", path + ".compact.old"
        if os.path.isdir(path):
            for leftover in (tmp, bak):
                if os.path.isdir(leftover):
                    shutil.rmtree(leftover)
            return
        if os.path.isdir(tmp) and os.path.isfile(os.path.join(tmp, "_SUCCESS")):
            os.rename(tmp, path)
            if os.path.isdir(bak):
                shutil.rmtree(bak)
            return
        if os.path.isdir(bak):
            os.rename(bak, path)
            if os.path.isdir(tmp):
                shutil.rmtree(tmp)

    def _cold_exists(self, id: str) -> bool:
        self._recover(id)
        return os.path.isdir(self._path(id))

    # -- tier inspection ------------------------------------------------

    def list_hot(self) -> list[str]:
        """Hot-tier ids (hot.go:20-27)."""
        with self._lock:
            return sorted(self._hot_base)

    def list_cold(self) -> list[str]:
        """Cold-tier ids from a warehouse dir scan (cold.go:50-84)."""
        if not os.path.isdir(self.data_dir):
            return []
        # Finish any compact() swap interrupted by a crash before listing.
        for e in os.listdir(self.data_dir):
            for suffix in (".compact.tmp", ".compact.old"):
                if e.endswith(suffix):
                    self._recover(e[: -len(suffix)])
        return sorted(
            e
            for e in os.listdir(self.data_dir)
            if _ID_RE.match(e) and os.path.isdir(os.path.join(self.data_dir, e))
        )

    def list_collections(self) -> list[str]:
        """hot ∪ cold, distinct, sorted (engine.go:39-66 — sorted here to
        fix the reference's Go-map-random ordering)."""
        return sorted(set(self.list_hot()) | set(self.list_cold()))

    def collection_exists(self, id: str) -> bool:
        """Hot first ('slower due to requiring filesystem io',
        engine.go:70-75), then cold."""
        with self._lock:
            if id in self._hot_base:
                return True
        return self._cold_exists(id)

    def is_hot(self, id: str) -> bool:
        """engine.go:85-98 — errors if the collection exists in neither
        tier."""
        with self._lock:
            if id in self._hot_base:
                return True
        if self._cold_exists(id):
            return False
        raise _err_not_found_any(id)

    # -- log compaction (the Spark-native upsert) -----------------------

    def _compacted(self, df: DataFrame) -> DataFrame:
        """Latest value per key: the log-compaction view.

        At 100 TB this is one shuffle on `key`; with the log bucketed by
        key (write path below) AQE keeps partitions balanced and the
        window never sees more than one key's history per task.
        """
        w = W.partitionBy("key").orderBy(F.desc("write_ts"), F.desc("seq"))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    def _overlay_df(self, id: str, start_seq: int = 0) -> DataFrame | None:
        """Pending (unflushed) writes as a DataFrame, or None.

        ``start_seq`` is the durable floor: persisted overlay rows get
        seqs strictly above every seq already in the log, keeping the
        (write_ts, seq) LWW tie-break valid across flush segments and
        engine generations."""
        pending = self._pending.get(id)
        if not pending:
            return None
        rows = [
            Row(key=k, value=v, write_ts=None, seq=start_seq + 1 + i)
            for i, (k, v) in enumerate(pending.items())
        ]
        return self.spark.createDataFrame(rows, LOG_SCHEMA).withColumn(
            "write_ts", F.current_timestamp()
        )

    def snapshot(self, id: str) -> DataFrame:
        """The collection's current latest-per-key view (base ⊎ pending).

        This is the DataFrame handle analytics run against — the KV API
        below is point lookups on top of it.
        """
        with self._lock:
            if id not in self._hot_base:
                self.load_collection_if_not_present(id)
            base = self._hot_base[id]
            overlay = self._overlay_df(id)
        parts = [p for p in (base, overlay) if p is not None]
        if not parts:
            return self.spark.createDataFrame([], LOG_SCHEMA)
        if len(parts) == 1:
            return parts[0]
        # Overlay wins over base at equal keys: give overlay rows a
        # higher seq than anything in the base (base seqs are finite).
        merged = parts[0].unionByName(
            parts[1].withColumn("seq", F.col("seq") + F.lit(2**62))
        )
        return self._compacted(merged)

    # -- load / flush (promotion / demotion) ----------------------------

    def load_collection(self, id: str) -> None:
        """Cold → hot promotion (engine.go:100-109): read the log,
        compact, cache. The cache materializes lazily on first action —
        the same read-through shape as the reference's load-on-miss."""
        if not self._cold_exists(id):
            raise _err_not_found_any(id)
        path = self._path(id)
        with self._lock:
            df = self._compacted(self.spark.read.schema(LOG_SCHEMA).parquet(path))
            df = df.cache()
            self._hot_base[id] = df
            self._pending.setdefault(id, {})
            # Reference-parity fast path: small collections live fully in
            # driver memory (as the reference's hot map does) → O(1)
            # reads with no per-read Spark job.
            sample = df.select("key", "value").limit(self.materialize_threshold + 1)
            rows = sample.collect()
            if len(rows) <= self.materialize_threshold:
                self._hot_dict[id] = {r["key"]: r["value"] for r in rows}
            else:
                self._hot_dict[id] = None

    def load_collection_if_not_present(self, id: str) -> None:
        """engine.go:187-222: hot → no-op; cold → promote; neither →
        auto-create (if enabled) else error (engine.go:221)."""
        with self._lock:
            if id in self._hot_base:
                return
            if self._cold_exists(id):
                self.load_collection(id)
                return
            if self.auto_create:
                self._hot_base[id] = None
                self._hot_dict[id] = {}
                self._pending[id] = {}
                return
        raise CollectionNotFoundError(
            f"Unable to find a collection to load into hot storage with id [{id}]."
        )

    def flush_collection(self, id: str) -> None:
        """Hot → cold + evict (engine.go:111-126).

        Unlike the reference's whole-collection rewrite (cold.go:140),
        this appends only the pending delta as a new log segment —
        O(unflushed writes), not O(collection). Eviction unpersists the
        cached base (engine.go:121 ≙ unpersist)."""
        with self._lock:
            if id not in self._hot_base:
                raise _err_not_found_hot(id)
            base = self._hot_base[id]
            path = self._path(id)
            overlay = None
            if self._pending.get(id):
                floor = self._log_seq_floor(id)
                overlay = self._overlay_df(id, start_seq=floor)
                self._seq_floor[id] = floor + len(self._pending[id])
            if overlay is not None:
                overlay.write.mode("append").parquet(path)
            elif base is None and not os.path.isdir(path):
                # Empty auto-created collection: materialize an empty log
                # so the collection exists cold (flush must persist it).
                self.spark.createDataFrame([], LOG_SCHEMA).write.mode(
                    "append"
                ).parquet(path)
            if base is not None:
                base.unpersist()
            del self._hot_base[id]
            del self._pending[id]
            self._hot_dict.pop(id, None)

    def flush_all_collections(self) -> list[Exception]:
        """engine.go:128-137 — collects errors, never short-circuits."""
        errors: list[Exception] = []
        for id in self.list_hot():
            try:
                self.flush_collection(id)
            except Exception as exc:  # noqa: BLE001 — parity: collect all
                errors.append(exc)
        return errors

    def compact(self, id: str) -> None:
        """Maintenance: rewrite the cold log as its compacted form.

        The reference implicitly 'compacts' by rewriting the whole blob
        on every flush; here compaction is explicit and schedulable
        (the usual Spark/lakehouse pattern for append-logs)."""
        if not self._cold_exists(id):
            raise _err_not_found_any(id)
        path = self._path(id)
        with self._lock:
            df = self._compacted(self.spark.read.schema(LOG_SCHEMA).parquet(path))
            # Crash-safe swap: every intermediate state is recoverable by
            # _recover() — tmp is only promoted once its _SUCCESS marker
            # exists, and the displaced original survives as .old until
            # the swap completes.
            tmp = path + ".compact.tmp"
            bak = path + ".compact.old"
            df.write.mode("overwrite").parquet(tmp)
            os.rename(path, bak)
            os.rename(tmp, path)
            shutil.rmtree(bak)
            if id in self._hot_base:  # refresh the cached view
                base = self._hot_base[id]
                if base is not None:
                    base.unpersist()
                self.load_collection(id)

    # -- point reads / writes ------------------------------------------

    def read_key(self, id: str, key: str) -> str:
        """Read-through point lookup (engine.go:139-173).

        Hot overlay (read-your-writes) → cached base filter → cold
        promotion on miss → error parity: missing key in a hot
        collection vs missing collection are distinct (hot.go:43 vs
        engine.go:172).

        The check-promote-lookup runs under ONE lock hold (RLock, so
        the nested load_collection re-acquires): dropping the lock
        between promotion and lookup let a concurrent flush demote the
        collection in the gap, and the lookup then misread "no hot
        dict, no base" as key-missing while the value sat in the cold
        log — a lost read-your-write under write/flush concurrency
        (caught by tests/test_property_kv.py's 8-thread hammer). Only
        the large-collection base probe (a Spark job over the promote-
        time file snapshot, which any later append only extends) runs
        outside the lock."""
        with self._lock:
            if id not in self._hot_base:
                if self._cold_exists(id):
                    self.load_collection(id)  # engine.go:150-169: promote all
                else:
                    raise _err_not_found_any(id)
            pending = self._pending.get(id, {})
            if key in pending:
                return pending[key]
            hot = self._hot_dict.get(id)
            if hot is not None:
                if key in hot:
                    return hot[key]
                raise KeyNotFoundError(
                    f"No value found for key [{key}] in hot collection [{id}]."
                )
            base = self._hot_base.get(id)
        if base is not None:
            row = base.where(F.col("key") == F.lit(key)).select("value").first()
            if row is not None:
                return row[0]
        # hot.go:43
        raise KeyNotFoundError(
            f"No value found for key [{key}] in hot collection [{id}]."
        )

    def write_key(self, id: str, key: str, value: str) -> None:
        """Write-through-to-hot (engine.go:175-185): ensure loaded /
        auto-create, then upsert the overlay. Durability deferred to
        flush, matching the reference (engine.go:184 writes memory
        only). Ensure-loaded and the overlay upsert happen under one
        lock hold — a flush sneaking between them strands the write in
        an orphaned pending entry for a demoted collection."""
        with self._lock:
            self.load_collection_if_not_present(id)
            self._pending.setdefault(id, {})[key] = value

    # -- create / drop --------------------------------------------------

    def create_collection(self, id: str) -> None:
        """hot.go:62-72 — error if present in the hot tier."""
        with self._lock:
            if id in self._hot_base:
                # hot.go:65
                raise CollectionExistsError(
                    f"Collection already exists with id [{id}] in hot storage."
                )
            self._hot_base[id] = None
            self._hot_dict[id] = {}
            self._pending[id] = {}

    def drop_collection(self, id: str) -> None:
        """hot.go:74-85 — hot-tier eviction without persisting."""
        with self._lock:
            if id not in self._hot_base:
                raise _err_not_found_hot(id)  # hot.go:84
            base = self._hot_base[id]
            if base is not None:
                base.unpersist()
            del self._hot_base[id]
            del self._pending[id]
            self._hot_dict.pop(id, None)
