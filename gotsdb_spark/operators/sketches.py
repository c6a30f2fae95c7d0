"""Probabilistic-sketch and storage-layout operators: Bloom-filter
pre-join, count-min heavy hitters, and z-order clustering audit.

The shuffle-avoidance toolkit for 100 TB joins and scans:

- A Bloom filter turns a semi-join against a selective build side into
  a *broadcastable bitset*: instead of shuffling the 100 TB fact table
  on the join key, every map task drops non-candidates at scan speed
  and only the tiny candidate stream reaches the real join. Spark's
  own runtime row-group filtering does this internally; the explicit
  operator makes the mechanism auditable (false-positive accounting).
- A count-min sketch answers "which keys are heavy?" with a fixed
  d x w counter grid: partial aggregation reduces every map task's
  contribution to <= d*w rows regardless of input size, so the shuffle
  is O(d*w * partitions), not O(rows) — the only way frequency
  estimation survives unbounded key cardinality.
- Z-order interleaving gives multi-dimensional data skipping: bucket
  files by interleaved bits of two columns and BOTH columns' min/max
  file ranges stay tight, so predicates on either prune files. The
  audit measures per-bucket extents against a single-column sort.

Every hash is md5 over an explicit string (portable across engines, no
seed state), so the DuckDB oracles reproduce the sketches bit-for-bit.

Reference parity: the reference (j0shgrant/gotsdb) has no sketches and
no layout control — its only index is the hot-tier hash map
(internal/storage/types.go:3); cold files are whole-collection gob
blobs (internal/storage/cold.go:128,152). This module is part of the
mandated [TARGET] scale surface (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from gotsdb_spark.operators.registry import query
from gotsdb_spark.sources.registry import load_table

# Bloom parameters: m bits, k hash functions.
_BLOOM_M = 4096
_BLOOM_K = 3
_BLOOM_PRICE = 475000.0

# Count-min parameters: d hash rows x w counters.
_CMS_D = 4
_CMS_W = 64


def _md5_pos(i: int, key: Column, mod: int) -> Column:
    """Deterministic hash position i: hex digits [1+4i, 4+4i] of ONE
    md5(key) as an integer, mod ``mod`` — k positions cost a single
    md5 per row (the probe side is the 100 TB fact table; hashing it
    k times was most of the query's CPU). Identical in DuckDB as
    ``('0x' || substr(md5(CAST(key AS VARCHAR)), 1+4i, 4))::BIGINT %
    mod``."""
    hex4 = F.substring(F.md5(key.cast("string")), 1 + 4 * i, 4)
    return (F.conv(hex4, 16, 10).cast("long") % mod).alias(f"p{i}")


def _duck_pos(i: int, key_sql: str, mod: int) -> str:
    return (
        f"('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), {1 + 4 * int(i)}, 4))::BIGINT % {mod}"
    )


@query(
    "bloom_semi_join_audit",
    oracle=f"""
    WITH build AS (
      SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_totalprice > {_BLOOM_PRICE}
    ), pos AS (
      SELECT DISTINCT
        ('0x' || substr(md5(CAST(k AS VARCHAR)), CAST(1 + 4 * i AS INT), 4))::BIGINT
          % {_BLOOM_M} AS p
      FROM build, range({_BLOOM_K}) t(i)
    ), bits AS (
      SELECT list(p ORDER BY p) AS bs FROM pos
    ), probe AS (
      SELECT l_orderkey AS k FROM lineitem
    ), pass AS (
      SELECT count(*) AS n FROM probe, bits
      WHERE list_contains(bs, {_duck_pos(0, 'k', _BLOOM_M)})
        AND list_contains(bs, {_duck_pos(1, 'k', _BLOOM_M)})
        AND list_contains(bs, {_duck_pos(2, 'k', _BLOOM_M)})
    ), tru AS (
      SELECT count(*) AS n FROM probe WHERE k IN (SELECT k FROM build)
    )
    SELECT (SELECT count(*) FROM build) AS n_build_keys,
           (SELECT count(*) FROM pos) AS n_bits_set,
           (SELECT count(*) FROM probe) AS n_probe_rows,
           (SELECT n FROM pass) AS n_bloom_pass,
           (SELECT n FROM tru) AS n_true_match,
           (SELECT n FROM pass) - (SELECT n FROM tru) AS n_false_positives
    """,
)
def bloom_semi_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filtered semi-join of lineitem against expensive orders,
    with exact false-positive accounting.

    Build side: orders with o_totalprice > {price} (selective). Its
    {k} md5 hash positions over an m={m}-bit space form the filter —
    collected as a sorted distinct-position array (<= m values, a few
    KB) and broadcast. Probe side: every lineitem row passes iff all
    {k} of its positions are set. Bloom guarantees no false negatives,
    so false positives = bloom_pass - true_match, measured here by
    running the exact join next to the filter (unhinted: the
    build side grows with orders, so the strategy is AQE's call).

    At 100 TB: the fact table never shuffles — the filter rides to the
    map tasks as a broadcast variable and candidates alone continue.
    Scan shape (round-10 audit fix): the build key set is computed
    once and checkpointed (it feeds the bit positions, the exact
    join, and the key count), and the probe side is ONE lineitem
    pass — the bloom flag and the exact-match flag are evaluated
    row-by-row in the same scan and counted in a single aggregate,
    instead of three separate probe passes.
    """
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    build = (
        orders.where(F.col("o_totalprice") > _BLOOM_PRICE)
        .select("o_orderkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    key = F.col("o_orderkey")
    # Pack set positions into a dense array of m/64 longs: the probe's
    # membership test becomes one element_at + one bit shift (O(1))
    # instead of a linear array_contains scan over up to m positions —
    # the difference between O(probe) and O(probe·m) total work.
    n_words = _BLOOM_M // 64
    pos = build.select(
        F.explode(
            F.array(*[_md5_pos(i, key, _BLOOM_M) for i in range(_BLOOM_K)])
        ).alias("p")
    ).distinct()
    words = pos.groupBy((F.col("p") / 64).cast("int").alias("word")).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT)))"
        ).alias("w")
    )
    bits = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "w"))).alias("wm"),
        F.sum(F.bit_count("w")).cast("long").alias("n_set"),
    ).select(
        F.expr(
            f"transform(sequence(0, {n_words - 1}),"
            " i -> coalesce(element_at(wm, i), CAST(0 AS BIGINT)))"
        ).alias("bs"),
        "n_set",
    )
    probe = lineitem.select(F.col("l_orderkey").alias("k"))
    pk = F.col("k")

    def _bit_set(i: int) -> Column:
        # SQL form: shiftrightunsigned takes a column shift amount
        # there (the Python wrapper insists on a literal).
        p = (
            f"(CAST(conv(substring(md5(CAST(k AS STRING)), {1 + 4 * i}, 4), 16, 10)"
            f" AS BIGINT) % {_BLOOM_M})"
        )
        return F.expr(
            f"(shiftrightunsigned(element_at(bs, CAST({p} DIV 64 AS INT) + 1),"
            f" CAST({p} % 64 AS INT)) & 1) = 1"
        )

    # build is distinct on the key, so a LEFT join marks exact matches
    # without duplication and the whole audit is one probe pass.
    counts = (
        probe.crossJoin(F.broadcast(bits.select("bs")))
        .join(
            build.select(F.col("o_orderkey"), F.lit(1).alias("hit")),
            pk == F.col("o_orderkey"),
            "left",
        )
        .agg(
            F.count("*").alias("n_probe_rows"),
            F.count(
                F.when(_bit_set(0) & _bit_set(1) & _bit_set(2), 1)
            ).alias("n_bloom_pass"),
            F.count("hit").alias("n_true_match"),
        )
    )
    meta = build.agg(F.count("*").alias("n_build_keys")).crossJoin(
        bits.select(F.col("n_set").alias("n_bits_set"))
    )
    return meta.crossJoin(F.broadcast(counts)).select(
        "n_build_keys",
        "n_bits_set",
        "n_probe_rows",
        "n_bloom_pass",
        "n_true_match",
        (F.col("n_bloom_pass") - F.col("n_true_match")).alias(
            "n_false_positives"
        ),
    )


bloom_semi_join_audit.__doc__ = bloom_semi_join_audit.__doc__.format(
    price=int(_BLOOM_PRICE), k=_BLOOM_K, m=_BLOOM_M
)


@query(
    "heavy_hitters_countmin",
    oracle=f"""
    WITH counters AS (
      SELECT i,
             ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)),
                             CAST(1 + 4 * i AS INT), 4))::BIGINT % {_CMS_W} AS pos,
             count(*) AS cnt
      FROM lineitem, range({_CMS_D}) t(i)
      GROUP BY 1, 2
    ), exact AS (
      SELECT l_partkey, count(*) AS exact_cnt FROM lineitem GROUP BY 1
    ), keyed AS (
      SELECT e.l_partkey, e.exact_cnt, t.i,
             ('0x' || substr(md5(CAST(e.l_partkey AS VARCHAR)),
                             CAST(1 + 4 * t.i AS INT), 4))::BIGINT % {_CMS_W} AS pos
      FROM exact e, range({_CMS_D}) t(i)
    ), est AS (
      SELECT k.l_partkey, k.exact_cnt, min(c.cnt) AS est_cnt
      FROM keyed k JOIN counters c ON c.i = k.i AND c.pos = k.pos
      GROUP BY 1, 2
    ), ranked AS (
      SELECT l_partkey, CAST(exact_cnt AS BIGINT) AS exact_cnt,
             CAST(est_cnt AS BIGINT) AS est_cnt,
             CAST(est_cnt - exact_cnt AS BIGINT) AS overcount,
             row_number() OVER (ORDER BY est_cnt DESC, exact_cnt DESC, l_partkey) AS rn
      FROM est
    )
    SELECT l_partkey, exact_cnt, est_cnt, overcount FROM ranked WHERE rn <= 10
    """,
)
def heavy_hitters_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters over lineitem part keys, with the
    exact counts alongside to exhibit the one-sided error (est >= exact).

    The sketch is a d={d} x w={w} counter grid: one scan computes all
    d positions per row and partially aggregates per map task, so each
    task ships <= d*w counter rows into the shuffle no matter how many
    input rows or distinct keys it saw — frequency estimation with a
    shuffle footprint independent of data size. Estimates join the
    (broadcast, {d}x{w}-row) grid and take the min across rows; the
    report is the top 10 by estimate with deterministic tie-breaks.
    """
    lineitem = load_table(spark, "lineitem", sf_dir)
    key = F.col("l_partkey")
    pos_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"), _md5_pos(i, key, _CMS_W).alias("pos")
            )
            for i in range(_CMS_D)
        ]
    )
    counters = (
        lineitem.select(F.explode(pos_structs).alias("ip"))
        .select("ip.i", "ip.pos")
        .groupBy("i", "pos")
        .agg(F.count("*").alias("cnt"))
    )
    exact = lineitem.groupBy("l_partkey").agg(F.count("*").alias("exact_cnt"))
    keyed = exact.select(
        "l_partkey", "exact_cnt", F.explode(pos_structs).alias("ip")
    ).select("l_partkey", "exact_cnt", "ip.i", "ip.pos")
    est = (
        keyed.join(F.broadcast(counters), on=["i", "pos"])
        .groupBy("l_partkey", "exact_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
    )
    # Top-10 via orderBy().limit() → TakeOrderedAndProject: each task
    # keeps its local top 10 and only those reach the driver — no
    # single-partition global window (which would haul every distinct
    # key to one executor for identical output).
    return (
        est.orderBy(F.desc("est_cnt"), F.desc("exact_cnt"), F.asc("l_partkey"))
        .limit(10)
        .select(
            "l_partkey",
            "exact_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("exact_cnt")).alias("overcount"),
        )
    )


heavy_hitters_countmin.__doc__ = heavy_hitters_countmin.__doc__.format(
    d=_CMS_D, w=_CMS_W
)


def _z_expr_spark(xcol: str, ycol: str, nbits: int = 8) -> Column:
    """Bit-interleave two columns (msb-aligned, y in the low lane) with
    pure arithmetic — `(v div 2^b) % 2` — so the same formula runs
    unchanged in DuckDB."""
    z = F.lit(0)
    for b in range(nbits):
        xbit = (F.col(xcol) / (1 << b)).cast("long") % 2
        ybit = (F.col(ycol) / (1 << b)).cast("long") % 2
        z = z + xbit * (1 << (2 * b + 1)) + ybit * (1 << (2 * b))
    return z


def _z_expr_duck(x: str, y: str, nbits: int = 8) -> str:
    terms = []
    for b in range(nbits):
        terms.append(f"(({x} // {1 << b}) % 2) * {1 << (2 * b + 1)}")
        terms.append(f"(({y} // {1 << b}) % 2) * {1 << (2 * b)}")
    return " + ".join(terms)


@query(
    "layout_zorder_clustering",
    oracle=f"""
    WITH t AS (
      SELECT o_custkey % 256 AS x, dayofyear(o_orderdate) % 256 AS y
      FROM orders
    ), z AS (
      SELECT x, y, {_z_expr_duck('x', 'y')} AS zval FROM t
    ), b AS (
      SELECT 'zorder' AS layout, CAST(zval * 16 // 65536 AS BIGINT) AS bucket, x, y FROM z
      UNION ALL
      SELECT 'xsort', CAST(x * 16 // 256 AS BIGINT), x, y FROM t
    )
    SELECT layout, bucket, count(*) AS n_rows,
           min(x) AS x_min, max(x) AS x_max,
           min(y) AS y_min, max(y) AS y_max,
           CAST(max(x) - min(x) AS BIGINT) AS x_span,
           CAST(max(y) - min(y) AS BIGINT) AS y_span
    FROM b GROUP BY layout, bucket
    """,
)
def layout_zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs single-column-sort file clustering audit over orders.

    Interleaves the low 8 bits of (customer key, day-of-year) into a
    16-bit z-value and buckets rows into 16 fixed z-ranges — the static
    analogue of `repartitionByRange(zval)` writing 16 files. The audit
    reports each bucket's min/max extent on BOTH dimensions next to the
    same audit for a plain x-sorted layout: under z-order both spans
    stay ~quarter-range (so min/max file skipping prunes on either
    column), while the x-sorted layout leaves y unclustered (full-range
    spans — scans on y read every file). Pure map + one small agg; the
    bucketing itself needs no sort and no shuffle.
    """
    orders = load_table(spark, "orders", sf_dir)
    t = orders.select(
        (F.col("o_custkey") % 256).alias("x"),
        (F.dayofyear("o_orderdate") % 256).cast("long").alias("y"),
    )
    z = t.select("x", "y", _z_expr_spark("x", "y").alias("zval"))
    zorder = z.select(
        F.lit("zorder").alias("layout"),
        (F.col("zval") * 16 / 65536).cast("long").alias("bucket"),
        "x",
        "y",
    )
    xsort = t.select(
        F.lit("xsort").alias("layout"),
        (F.col("x") * 16 / 256).cast("long").alias("bucket"),
        "x",
        "y",
    )
    return (
        zorder.unionByName(xsort)
        .groupBy("layout", "bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
            (F.max("x") - F.min("x")).alias("x_span"),
            (F.max("y") - F.min("y")).alias("y_span"),
        )
    )


# KMV (k-minimum-values) distinct sketch: keep the k smallest hash
# values; estimate = (k-1) / kth-smallest-normalized-hash.
_KMV_K = 64
_KMV_2_32 = 4294967296.0


@query(
    "sketch_kmv_distinct_users",
    oracle=f"""
    WITH hashes AS (
      SELECT DISTINCT date_trunc('day', ts) AS day,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM events
    ), ranked AS (
      SELECT day, h,
             row_number() OVER (PARTITION BY day ORDER BY h) AS rn,
             count(*)     OVER (PARTITION BY day) AS n_h
      FROM hashes
    ), kmin AS (
      SELECT day, h, rn, n_h FROM ranked WHERE rn <= {_KMV_K}
    ), per_day AS (
      SELECT day,
             CAST(max(n_h) AS BIGINT) AS exact_distinct,
             CAST(CASE WHEN max(n_h) >= {_KMV_K}
               THEN floor(({_KMV_K} - 1) / (max(h) / {_KMV_2_32}) * 1e3 + 0.5001)
               ELSE max(n_h) * 1000 END AS BIGINT) AS est_e3
      FROM kmin GROUP BY day
    ), merged_ranked AS (
      SELECT h, row_number() OVER (ORDER BY h) AS rn
      FROM (SELECT DISTINCT h FROM kmin)
    ), merged AS (
      SELECT CAST(NULL AS TIMESTAMP) AS day,
             (SELECT CAST(count(DISTINCT h) AS BIGINT) FROM hashes) AS exact_distinct,
             CAST(floor(({_KMV_K} - 1) / (max(h) / {_KMV_2_32}) * 1e3 + 0.5001)
                  AS BIGINT) AS est_e3
      FROM merged_ranked WHERE rn <= {_KMV_K}
    )
    SELECT day, exact_distinct, est_e3,
           abs(est_e3 / 1000.0 - exact_distinct) <= 0.5 * exact_distinct AS within_bound
    FROM (SELECT * FROM per_day UNION ALL SELECT * FROM merged) u
    """,
)
def sketch_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-user sketch per day, plus the merged-union row.

    The third distinct sketch in the module family (bitmaps are exact,
    HLL is constant-size): KMV keeps the k smallest distinct hash
    values and estimates distinct = (k−1)/h(k), h normalized to [0,1).
    Its killer property is *lossless mergeability* — the k smallest of
    a union is computable from each partition's k smallest, so per-day
    sketches (one shuffle of ≤k values per day) roll up to the global
    estimate without touching raw data again: exactly how a 100 TB
    scan hands distinct counts to a dashboard. The day=NULL row IS
    that merge, and `exact_distinct` rides along to show the estimate
    lands within the k=64 error envelope (σ≈1/√(k−1)≈13%; bound 50%).

    md5-prefix hashing makes the sketch bit-identical in DuckDB (no
    seeded hash state), so the oracle reproduces it exactly.
    """
    ev = load_table(spark, "events", sf_dir)
    from pyspark.sql.window import Window as W

    hashes = ev.select(
        F.date_trunc("day", "ts").alias("day"),
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()
    ranked = hashes.select(
        "day",
        "h",
        F.row_number().over(W.partitionBy("day").orderBy("h")).alias("rn"),
        F.count("*").over(W.partitionBy("day")).alias("n_h"),
    )
    kmin = ranked.where(F.col("rn") <= _KMV_K).localCheckpoint(eager=False)
    est = F.when(
        F.max("n_h") >= _KMV_K,
        F.floor((_KMV_K - 1) / (F.max("h") / _KMV_2_32) * 1e3 + 0.5001),
    ).otherwise(F.max("n_h") * 1000)
    per_day = kmin.groupBy("day").agg(
        F.max("n_h").cast("long").alias("exact_distinct"),
        est.cast("long").alias("est_e3"),
    )
    # Merge: k smallest of the union of per-day k-smallest sets.
    merged_kth = (
        kmin.select("h")
        .distinct()
        .select(F.row_number().over(W.orderBy("h")).alias("rn"), "h")
        .where(F.col("rn") <= _KMV_K)
        .agg(F.max("h").alias("hk"))
    )
    total = hashes.select("h").distinct().agg(
        F.count("*").cast("long").alias("exact_distinct")
    )
    merged = merged_kth.crossJoin(F.broadcast(total)).select(
        F.lit(None).cast("timestamp").alias("day"),
        "exact_distinct",
        F.floor((_KMV_K - 1) / (F.col("hk") / _KMV_2_32) * 1e3 + 0.5001)
        .cast("long")
        .alias("est_e3"),
    )
    out = per_day.unionByName(merged)
    return out.select(
        "day",
        "exact_distinct",
        "est_e3",
        (
            F.abs(F.col("est_e3") / 1000.0 - F.col("exact_distinct"))
            <= 0.5 * F.col("exact_distinct")
        ).alias("within_bound"),
    )


# Equi-width histogram sketch: bucket width 4.0 (exact in binary — the
# bucket assignment floor(value/4.0) is bit-identical across engines);
# estimates are reported in centi-units at the bucket midpoint, so the
# whole pipeline stays in integer arithmetic end to end.
_HIST_W = 4.0


@query(
    "sketch_histogram_quantiles",
    oracle="""
    WITH b AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(floor(value / 4.0) AS BIGINT) AS bucket,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ), merged AS (
      SELECT day, bucket, cnt FROM b
      UNION ALL
      SELECT CAST(NULL AS TIMESTAMP), bucket, sum(cnt) FROM b GROUP BY bucket
    ), cum AS (
      SELECT day, bucket, cnt,
             sum(cnt) OVER (PARTITION BY day ORDER BY bucket) AS c,
             sum(cnt) OVER (PARTITION BY day) AS n
      FROM merged
    )
    SELECT day,
           CAST(max(n) AS BIGINT) AS n,
           CAST(min(CASE WHEN c >= (n + 1) // 2 THEN bucket END) * 400 + 200
                AS BIGINT) AS p50_centi,
           CAST(min(CASE WHEN c >= (19 * n + 19) // 20 THEN bucket END) * 400
                + 200 AS BIGINT) AS p95_centi
    FROM cum GROUP BY day
    """,
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width histogram → per-day p50/p95 plus the merged
    global row (day = NULL), the quantile analog of the KMV sketch.

    Exact percentiles need a full sort (or all values in one place);
    a histogram sketch needs ONE shuffle of (day, bucket, count) rows —
    bounded by days x buckets no matter how many raw events exist, so
    it survives 100 TB unchanged. The killer property mirrors KMV:
    bucket counts merge losslessly by addition, so the global row is
    computed from the per-day SKETCHES, never re-touching raw data —
    while the DuckDB oracle derives the same global from the raw table,
    proving the merge exact. Estimates are step-function midpoints
    (bucket*400+200 centi-units) with integer target ranks
    ceil(q*n) = (q_num*n + q_den - 1) div q_den, so no float crosses
    an engine boundary.
    """
    from pyspark.sql.window import Window as W

    ev = load_table(spark, "events", sf_dir)
    sk = (
        ev.select(
            F.date_trunc("day", "ts").alias("day"),
            F.floor(F.col("value") / _HIST_W).cast("long").alias("bucket"),
        )
        .groupBy("day", "bucket")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    merged = (
        sk.groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .select(F.lit(None).cast("timestamp").alias("day"), "bucket", "cnt")
    )
    both = sk.unionByName(merged)
    wday = W.partitionBy("day")
    cum = both.select(
        "day",
        "bucket",
        F.sum("cnt").over(wday.orderBy("bucket")).alias("c"),
        F.sum("cnt").over(wday).alias("n"),
    )
    p50_target = F.expr("(n + 1) div 2")
    p95_target = F.expr("(19 * n + 19) div 20")
    return cum.groupBy("day").agg(
        F.max("n").cast("long").alias("n"),
        (F.min(F.when(F.col("c") >= p50_target, F.col("bucket"))) * 400 + 200)
        .cast("long")
        .alias("p50_centi"),
        (F.min(F.when(F.col("c") >= p95_target, F.col("bucket"))) * 400 + 200)
        .cast("long")
        .alias("p95_centi"),
    )


_KMV_JOIN_ORACLE = f"""
    WITH ha AS (
      SELECT DISTINCT
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM events
    ), hb AS (
      SELECT DISTINCT
             ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM customer
    ), ka AS (
      SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) rn FROM ha)
      WHERE rn <= {_KMV_K}
    ), kb AS (
      SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) rn FROM hb)
      WHERE rn <= {_KMV_K}
    ), ku AS (
      SELECT h FROM (
        SELECT h, row_number() OVER (ORDER BY h) rn
        FROM (SELECT h FROM ka UNION SELECT h FROM kb)
      ) WHERE rn <= {_KMV_K}
    ), ests AS (
      SELECT
        (SELECT CAST(floor(({_KMV_K}-1) / (max(h) / {_KMV_2_32}) * 1e3 + 0.5001)
                AS BIGINT) FROM ka) AS est_a_e3,
        (SELECT CAST(floor(({_KMV_K}-1) / (max(h) / {_KMV_2_32}) * 1e3 + 0.5001)
                AS BIGINT) FROM kb) AS est_b_e3,
        (SELECT CAST(floor(({_KMV_K}-1) / (max(h) / {_KMV_2_32}) * 1e3 + 0.5001)
                AS BIGINT) FROM ku) AS est_union_e3,
        (SELECT CAST(count(*) AS BIGINT) FROM ha) AS exact_a,
        (SELECT CAST(count(*) AS BIGINT) FROM hb) AS exact_b,
        (SELECT CAST(count(*) AS BIGINT)
         FROM ha JOIN hb USING (h)) AS exact_overlap
    )
    SELECT exact_a, exact_b, exact_overlap, est_a_e3, est_b_e3, est_union_e3,
           greatest(est_a_e3 + est_b_e3 - est_union_e3, 0) AS est_overlap_e3
    FROM ests
"""


@query("sketch_kmv_key_overlap", oracle=_KMV_JOIN_ORACLE)
def sketch_kmv_key_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join key-overlap estimation from mergeable KMV sketches —
    the planner-style cardinality probe you run BEFORE committing to a
    100 TB join strategy.

    Each side's distinct join keys are summarized by its k smallest
    hash values (k={_KMV_K}); the union sketch is computable from the
    two k-sets alone (KMV's lossless merge), and inclusion–exclusion
    |A∩B| ≈ |A|+|B|−|A∪B| prices the key overlap without either side
    shuffling raw keys to the other. Two tiny sketches answer "is this
    join selective, and which side is the subset?" — the input to
    broadcast-vs-shuffle and join-order decisions. Exact counts ride
    along to exhibit the estimate quality; the estimator can go
    negative on tiny overlaps, clamped at 0 (both engines).

    Scale: each sketch is one scan + one {_KMV_K}-row reduction;
    nothing else moves. md5-prefix hashing keeps the sketch
    bit-identical across engines (no seeded hash state).
    """

    def kmv(df: DataFrame, col: str) -> DataFrame:
        return (
            df.select(
                F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10)
                .cast("long")
                .alias("h")
            )
            .distinct()
        )

    ha = kmv(load_table(spark, "events", sf_dir), "user_id").localCheckpoint(
        eager=False
    )
    hb = kmv(load_table(spark, "customer", sf_dir), "c_custkey").localCheckpoint(
        eager=False
    )

    def ksmall(df: DataFrame) -> DataFrame:
        # orderBy+limit plans as TakeOrderedAndProject: each partition
        # keeps its k smallest, the driver merges — never a global sort
        # (a row_number window here would funnel every distinct hash
        # into one task).
        return df.orderBy("h").limit(_KMV_K)

    def est(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.floor((_KMV_K - 1) / (F.max("h") / _KMV_2_32) * 1e3 + 0.5001)
            .cast("long")
            .alias(name)
        )

    ka, kb = ksmall(ha), ksmall(hb)
    ku = ksmall(ka.unionByName(kb).distinct())
    ea, eb, eu = est(ka, "est_a_e3"), est(kb, "est_b_e3"), est(ku, "est_union_e3")
    xa = ha.agg(F.count("*").cast("long").alias("exact_a"))
    xb = hb.agg(F.count("*").cast("long").alias("exact_b"))
    xo = ha.join(hb, "h").agg(F.count("*").cast("long").alias("exact_overlap"))
    row = (
        xa.crossJoin(F.broadcast(xb))
        .crossJoin(F.broadcast(xo))
        .crossJoin(F.broadcast(ea))
        .crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
    )
    return row.select(
        "exact_a", "exact_b", "exact_overlap", "est_a_e3", "est_b_e3",
        "est_union_e3",
        F.greatest(
            F.col("est_a_e3") + F.col("est_b_e3") - F.col("est_union_e3"), F.lit(0)
        ).cast("long").alias("est_overlap_e3"),
    )


# ---------------------------------------------------------------------------
# SpaceSaving / Misra–Gries guaranteed heavy hitters (two-pass exact).
#
# Registered in round 6 (held back in round 5 while the driver
# verification window was at capacity).
# ---------------------------------------------------------------------------

_SS_CAPACITY = 1000  # sketch capacity K: guarantees items with share > 1/K

SPACESAVING_ORACLE = f"""
    WITH tot AS (SELECT count(*) AS n FROM events)
    SELECT CAST(user_id AS BIGINT) AS key,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(count(*) * 1000000 // (SELECT n FROM tot) AS BIGINT)
             AS share_e6
    FROM events
    GROUP BY user_id
    HAVING count(*) * {_SS_CAPACITY} > (SELECT n FROM tot)
"""


@query("heavy_hitters_spacesaving", oracle=SPACESAVING_ORACLE)
def heavy_hitters_spacesaving(
    spark: SparkSession, sf_dir: str, capacity: int = _SS_CAPACITY
) -> DataFrame:
    """EXACT guaranteed heavy hitters via a Misra–Gries candidate pass
    plus an exact recount — the two-pass pattern that finds every key
    with frequency share > 1/capacity without ever shuffling the full
    key domain.

    Why this shape at 100 TB: a plain groupBy(key) shuffles every
    distinct key (billions for user-ids/URLs). Misra–Gries per
    partition keeps only `capacity` counters; the union of per-
    partition candidate sets PROVABLY contains every item with global
    count > n/capacity (per-partition undercount is ≤ n_p/capacity;
    summed over partitions ≤ n/capacity, so a global heavy hitter
    survives with positive merged weight in ≥ 1 partition). The second
    pass recounts ONLY the candidates — a broadcast semi-join then a
    groupBy over candidate rows — and the final HAVING (count×capacity
    > n, integer cross-multiplication) makes the OUTPUT exact and
    independent of partitioning, file splits, and sketch tie-breaking,
    even though the intermediate sketch is not. That invariance is
    what lets a DuckDB GROUP BY/HAVING oracle hash-match it.

    Unlike heavy_hitters_countmin (estimates with bounded error), this
    returns exact counts with a completeness guarantee — the form a
    skew audit or a salting decision actually needs.
    """
    import pandas as pd

    ev = load_table(spark, "events", sf_dir).select(
        F.col("user_id").cast("bigint").alias("key")
    )

    def mg_partition(batches):
        # Mergeable-summary form of Misra–Gries (Agarwal et al.,
        # "Mergeable Summaries", PODS'12): each Arrow batch is an exact
        # MG summary of itself (value_counts), merged into the running
        # summary by vector addition; when the merged summary exceeds
        # `capacity` counters, subtract the (capacity+1)-th largest
        # count from all and drop the non-positive. Every prune
        # subtracts ≤ thresh from each key while ≥ capacity+1 counters
        # absorb ≥ thresh each, so total undercount over the partition
        # stays ≤ n_p/(capacity+1) — the same guarantee as per-element
        # MG, with zero per-row Python: value_counts / add / nlargest /
        # boolean mask are all C-vectorized over the whole batch.
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf["key"].value_counts()
            # NOT Series.add(fill_value=0): that promotes to float64
            # whenever the two indexes differ, so counts above 2^53
            # would merge inexactly. concat + index-groupby sum stays
            # int64 end-to-end and is equally C-vectorized.
            counters = pd.concat([counters, vc]).groupby(level=0).sum()
            if len(counters) > capacity:
                thresh = counters.nlargest(capacity + 1).iloc[-1]
                counters = counters[counters > thresh] - thresh
        yield pd.DataFrame({"key": counters.index.to_numpy(dtype="int64")})

    candidates = ev.mapInPandas(mg_partition, "key bigint").distinct()
    total = ev.count()
    exact = (
        ev.join(F.broadcast(candidates), "key")
        .groupBy("key")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") * capacity > F.lit(total))
        .select(
            "key",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.expr(f"CAST(cnt * 1000000 DIV {total} AS BIGINT)").alias("share_e6"),
        )
    )
    return exact


# ---------------------------------------------------------------------------
# Mergeable equal-count quantile digest (t-digest family) — round 10.
# ---------------------------------------------------------------------------

_QD_K = 32  # centroids per shard (day)

QUANTILE_DIGEST_ORACLE = f"""
    WITH base AS (
      SELECT datediff('day', DATE '2025-01-01', CAST(ts AS DATE)) AS d,
             CAST(floor(value * 1000) AS BIGINT) AS v
      FROM events
    ), dic AS (
      SELECT d, v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY d, v
    ), cum AS (
      SELECT d, v, c,
             CAST(sum(c) OVER (PARTITION BY d ORDER BY v) AS BIGINT) AS cc,
             CAST(sum(c) OVER (PARTITION BY d) AS BIGINT) AS n_day
      FROM dic
    ), cents AS (
      SELECT d, (cc - 1) * {_QD_K} // n_day AS cid,
             CAST(sum(c) AS BIGINT) AS w,
             CAST(sum(v * c) AS BIGINT) AS sv,
             CAST(min(v) AS BIGINT) AS mn,
             CAST(max(v) AS BIGINT) AS mx
      FROM cum GROUP BY d, (cc - 1) * {_QD_K} // n_day
    ), merged AS (
      SELECT sv // w AS m_e3, d, cid, w, mx - mn AS span,
             CAST(sum(w) OVER (ORDER BY sv // w, d, cid) AS BIGINT) AS cumw,
             CAST(sum(w) OVER () AS BIGINT) AS tw,
             CAST(count(*) OVER () AS BIGINT) AS n_cent,
             CAST(max(mx - mn) OVER () AS BIGINT) AS max_span
      FROM cents
    ), gdic AS (
      SELECT v, CAST(sum(c) AS BIGINT) AS c FROM dic GROUP BY v
    ), gcum AS (
      SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cc,
             CAST(sum(c) OVER () AS BIGINT) AS n
      FROM gdic
    ), q AS (SELECT unnest([50, 95]) AS q_pct), est AS (
      SELECT q.q_pct,
             arg_min(m.m_e3, CASE WHEN m.cumw * 100 >= q.q_pct * m.tw
                              THEN m.cumw END) AS est_e3,
             CAST(max(m.n_cent) AS BIGINT) AS n_centroids,
             CAST(max(m.max_span) AS BIGINT) AS max_span_e3
      FROM merged m CROSS JOIN q GROUP BY q.q_pct
    ), exact AS (
      SELECT q.q_pct,
             min(CASE WHEN g.cc * 100 >= q.q_pct * g.n THEN g.v END)
               AS exact_e3
      FROM gcum g CROSS JOIN q GROUP BY q.q_pct
    )
    SELECT e.q_pct, CAST(e.est_e3 AS BIGINT) AS est_e3,
           CAST(x.exact_e3 AS BIGINT) AS exact_e3,
           CAST(e.est_e3 - x.exact_e3 AS BIGINT) AS err_e3,
           e.n_centroids, e.max_span_e3,
           abs(e.est_e3 - x.exact_e3) <= e.max_span_e3 AS within_span
    FROM est e JOIN exact x USING (q_pct)
"""


@query("sketch_quantile_digest", oracle=QUANTILE_DIGEST_ORACLE)
def sketch_quantile_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equal-count quantile digest (the t-digest idea, made
    engine-deterministic): each DAY compresses its value distribution
    into {k} centroids of ~equal count — (weight, value-sum, min, max)
    tuples — and the global p50/p95 are read from the MERGED centroid
    stream, next to the exact quantiles and a hard error certificate
    (|estimate − exact| ≤ the widest centroid span, the q-digest/
    GK-style bound that holds because merging by centroid mean can
    displace a rank boundary by at most one centroid's width here).

    This is the complement of stats_equidepth_bins for domains that do
    NOT saturate: the equi-depth dictionary trick needs the value grid
    to stop growing, while per-shard digests stay {k} rows per shard
    FOREVER — the shard→merge algebra (persist per-day digests,
    re-merge to any coarser grain without touching raw data) is
    exactly how production percentile dashboards avoid re-scanning
    100 TB per refresh.

    Determinism: values are e3 integers; centroid assignment is the
    integer rank rule (cc−1)·{k} DIV n_day over the per-day value
    dictionary (each dictionary value lands wholly in one centroid);
    centroid means are integer floor-divisions of non-negative sums;
    the merge order is the total (mean, day, centroid) integer sort;
    quantile readout is the first centroid whose cumulative weight
    clears q·W — selected as min_by over the strictly-increasing
    integer cumulative weight, no float anywhere.

    Scale: one map-side-combinable shuffle to the per-day dictionary
    (checkpointed — the digest build and the exact-quantile baseline
    both read it), day-partitioned windows (calendar-bounded), then
    days×{k} centroid rows. The exact certification arm's cumulative
    count goes through dist_rank (no unpartitioned window — the value
    dictionary grows by premise); the only remaining global window is
    the merged centroid stream itself, bounded at days×{k} rows.
    Production keeps the digest alone.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    aggregation surface (internal/storage/types.go:3); this is
    [TARGET] sketch machinery.
    """
    from pyspark.sql.window import Window as W

    dic = (
        load_table(spark, "events", sf_dir)
        .select(
            F.datediff(
                F.col("ts").cast("date"), F.lit("2025-01-01").cast("date")
            ).alias("d"),
            F.floor(F.col("value") * 1000).cast("bigint").alias("v"),
        )
        .groupBy("d", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    cum = dic.select(
        "d",
        "v",
        "c",
        F.sum("c").over(W.partitionBy("d").orderBy("v")).cast("long").alias("cc"),
        F.sum("c").over(W.partitionBy("d")).cast("long").alias("n_day"),
    )
    cents = (
        cum.groupBy(
            "d",
            F.expr(f"(cc - 1) * {_QD_K} DIV n_day").alias("cid"),
        )
        .agg(
            F.sum("c").cast("long").alias("w"),
            F.sum(F.col("v") * F.col("c")).cast("long").alias("sv"),
            F.min("v").cast("long").alias("mn"),
            F.max("v").cast("long").alias("mx"),
        )
    )
    w_ord = W.orderBy(F.expr("sv DIV w"), "d", "cid")
    w_all = W.partitionBy()
    merged = cents.select(
        F.expr("sv DIV w").alias("m_e3"),
        "d",
        "cid",
        "w",
        F.sum("w").over(w_ord.rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("cumw"),
        F.sum("w").over(w_all).cast("long").alias("tw"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n_cent"),
        F.max(F.col("mx") - F.col("mn")).over(w_all).cast("long").alias("max_span"),
    )
    qs = spark.range(0, 2).select(
        F.when(F.col("id") == 0, 50).otherwise(95).cast("int").alias("q_pct")
    )
    est = (
        merged.crossJoin(F.broadcast(qs))
        .groupBy("q_pct")
        .agg(
            F.min_by(
                "m_e3",
                F.when(
                    F.col("cumw") * 100 >= F.col("q_pct") * F.col("tw"),
                    F.col("cumw"),
                ),
            ).alias("est_e3"),
            F.max("n_cent").cast("long").alias("n_centroids"),
            F.max("max_span").cast("long").alias("max_span_e3"),
        )
    )
    # Exact-quantile certification arm: the value dictionary does NOT
    # saturate (that's this op's premise), so its cumulative count is
    # routed through dist_rank (range-partition + partition-local
    # running sums + O(P) offsets) instead of an unpartitioned window —
    # same convention as stats_equidepth_bins.
    from gotsdb_spark.operators.distrank import dist_rank

    gdic = dic.groupBy("v").agg(F.sum("c").cast("long").alias("c"))
    gcum = dist_rank(gdic, ["v"], rank_col="_rnk", sum_cols={"cc": "c"}).drop(
        "_rnk"
    )
    gtot = gcum.agg(F.sum("c").cast("long").alias("n"))
    gcum = gcum.crossJoin(F.broadcast(gtot))
    exact = (
        gcum.crossJoin(F.broadcast(qs))
        .groupBy("q_pct")
        .agg(
            F.min(
                F.when(
                    F.col("cc") * 100 >= F.col("q_pct") * F.col("n"),
                    F.col("v"),
                )
            )
            .cast("long")
            .alias("exact_e3")
        )
    )
    return est.join(exact, "q_pct").select(
        "q_pct",
        F.col("est_e3").cast("long").alias("est_e3"),
        "exact_e3",
        (F.col("est_e3") - F.col("exact_e3")).cast("long").alias("err_e3"),
        "n_centroids",
        "max_span_e3",
        (
            F.abs(F.col("est_e3") - F.col("exact_e3")) <= F.col("max_span_e3")
        ).alias("within_span"),
    )


sketch_quantile_digest.__doc__ = sketch_quantile_digest.__doc__.format(k=_QD_K)


# ---------------------------------------------------------------------------
# KMV sketch set operations: pairwise Jaccard / intersection — round 11.
# ---------------------------------------------------------------------------

_KMVJ_K = 256

KMV_JACCARD_ORACLE = f"""
    WITH ut AS (
      SELECT DISTINCT event_type AS t, user_id FROM events
    ), hk AS (
      SELECT t, md5(CAST(user_id AS VARCHAR)) AS h FROM ut
    ), sk AS (
      SELECT t, h FROM (
        SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS rk
        FROM hk) x
      WHERE rk <= {_KMVJ_K}
    ), nt AS (
      SELECT t, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY t
    ), inter AS (
      SELECT a.t AS t1, b.t AS t2, CAST(count(*) AS BIGINT) AS ninter
      FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.t < b.t
      GROUP BY 1, 2
    ), sides AS (
      SELECT a.t AS t1, b.t AS t2, s.h, 1 AS in1, 0 AS in2
      FROM nt a JOIN nt b ON a.t < b.t JOIN sk s ON s.t = a.t
      UNION ALL
      SELECT a.t AS t1, b.t AS t2, s.h, 0 AS in1, 1 AS in2
      FROM nt a JOIN nt b ON a.t < b.t JOIN sk s ON s.t = b.t
    ), merged AS (
      SELECT t1, t2, h, max(in1) AS in1, max(in2) AS in2
      FROM sides GROUP BY t1, t2, h
    ), kept AS (
      SELECT t1, t2, in1, in2 FROM (
        SELECT t1, t2, in1, in2,
               row_number() OVER (PARTITION BY t1, t2 ORDER BY h) AS rk
        FROM merged) x
      WHERE rk <= {_KMVJ_K}
    ), est AS (
      SELECT t1, t2,
             CAST(sum(in1 * in2) AS BIGINT) AS both_in_k,
             CAST(count(*) AS BIGINT) AS k_eff
      FROM kept GROUP BY t1, t2
    )
    SELECT e.t1, e.t2, na.n AS n1, nb.n AS n2,
           COALESCE(i.ninter, 0) AS exact_inter,
           CAST(COALESCE(i.ninter, 0) * 1000000
                // (na.n + nb.n - COALESCE(i.ninter, 0)) AS BIGINT)
             AS exact_jaccard_e6,
           CAST(e.both_in_k * 1000000 // e.k_eff AS BIGINT)
             AS kmv_jaccard_e6,
           CAST(e.both_in_k * 1000000 // e.k_eff
                - COALESCE(i.ninter, 0) * 1000000
                  // (na.n + nb.n - COALESCE(i.ninter, 0)) AS BIGINT)
             AS err_e6
    FROM est e
    JOIN nt na ON na.t = e.t1
    JOIN nt nb ON nb.t = e.t2
    LEFT JOIN inter i ON i.t1 = e.t1 AND i.t2 = e.t2
"""


@query("sketch_kmv_jaccard_pairs", oracle=KMV_JACCARD_ORACLE)
def sketch_kmv_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k / theta-sketch-style) SET OPERATIONS: pairwise
    Jaccard and audience overlap between every pair of event types,
    estimated from k={k} bottom-hash sketches and certified against
    the exact values computed alongside. The audience-overlap matrix
    ("what fraction of clickers also purchase?") is the canonical
    sketch-union/intersection workload: at 100 TB the per-type
    distinct-user sets cannot be pairwise-joined per dashboard
    refresh, but their k-row sketches can — the KMV estimator takes
    the k smallest hashes of the UNION of two sketches and counts how
    many sit in both (Beyer et al.; the same mergeable-sketch algebra
    as sketch_kmv_distinct_users, extended from cardinality to set
    operations).

    Determinism: hashes are md5(user_id) hex strings (total order,
    engine-portable); the sketch is the k smallest DISTINCT hashes
    per type; estimates are exact integer arithmetic —
    both_in_k·1e6 DIV k_eff — so the estimate, the exact Jaccard,
    and their signed gap all hash-match cross-engine.

    Scale: ONE distinct shuffle to the (type, user) dictionary
    (checkpointed — the counts, the exact-intersection self-join,
    and the sketch build all consume it); the rank filter plans as
    WindowGroupLimit, so each task pre-trims to its k smallest
    hashes before the per-type sort (the sample_reservoir_per_group
    property, pinned in the plan test). The exact arm is quadratic
    only per-user (≤ types²/2 pair rows per user) and exists to
    certify the estimator at fixture scale; production keeps the
    k-row sketches and re-merges them at any grain.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    aggregation surface (internal/storage/types.go:3); this is
    [TARGET] sketch machinery.
    """
    from pyspark.sql.window import Window as W

    ut = (
        load_table(spark, "events", sf_dir)
        .select(F.col("event_type").alias("t"), "user_id")
        .distinct()
        # four consumers: per-type counts, exact self-join (both
        # sides), and the sketch build
        .localCheckpoint(eager=False)
    )
    hk = ut.select("t", F.md5(F.col("user_id").cast("string")).alias("h"))
    sk = (
        hk.withColumn(
            "rk", F.row_number().over(W.partitionBy("t").orderBy("h"))
        )
        .where(F.col("rk") <= _KMVJ_K)
        .select("t", "h")
        # two consumers: both sides of the pair fan-out
        .localCheckpoint(eager=False)
    )
    nt = (
        ut.groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        # three consumers: the pair spine (twice) and the final report
        .localCheckpoint(eager=False)
    )
    a = ut.select(F.col("t").alias("t1"), "user_id")
    b = ut.select(F.col("t").alias("t2"), "user_id")
    inter = (
        a.join(b, "user_id")
        .where(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).cast("long").alias("ninter"))
    )
    pairs = (
        nt.select(F.col("t").alias("t1"))
        .join(nt.select(F.col("t").alias("t2")))
        .where(F.col("t1") < F.col("t2"))
    )
    sides = pairs.join(
        sk.select(F.col("t").alias("t1"), "h"), "t1"
    ).select(
        "t1", "t2", "h", F.lit(1).alias("in1"), F.lit(0).alias("in2")
    ).unionByName(
        pairs.join(sk.select(F.col("t").alias("t2"), "h"), "t2").select(
            "t1", "t2", "h", F.lit(0).alias("in1"), F.lit(1).alias("in2")
        )
    )
    merged = sides.groupBy("t1", "t2", "h").agg(
        F.max("in1").alias("in1"), F.max("in2").alias("in2")
    )
    kept = (
        merged.withColumn(
            "rk",
            F.row_number().over(W.partitionBy("t1", "t2").orderBy("h")),
        )
        .where(F.col("rk") <= _KMVJ_K)
    )
    est = kept.groupBy("t1", "t2").agg(
        F.sum(F.col("in1") * F.col("in2")).cast("long").alias("both_in_k"),
        F.count(F.lit(1)).cast("long").alias("k_eff"),
    )
    exact_j = F.expr(
        "COALESCE(ninter, 0) * 1000000 DIV (n1 + n2 - COALESCE(ninter, 0))"
    )
    kmv_j = F.expr("both_in_k * 1000000 DIV k_eff")
    return (
        est.join(nt.select(F.col("t").alias("t1"), F.col("n").alias("n1")), "t1")
        .join(nt.select(F.col("t").alias("t2"), F.col("n").alias("n2")), "t2")
        .join(inter, ["t1", "t2"], "left")
        .select(
            "t1",
            "t2",
            "n1",
            "n2",
            F.coalesce("ninter", F.lit(0)).cast("long").alias("exact_inter"),
            exact_j.cast("long").alias("exact_jaccard_e6"),
            kmv_j.cast("long").alias("kmv_jaccard_e6"),
            (kmv_j - exact_j).cast("long").alias("err_e6"),
        )
    )


sketch_kmv_jaccard_pairs.__doc__ = sketch_kmv_jaccard_pairs.__doc__.format(
    k=_KMVJ_K
)


# ---------------------------------------------------------------------------
# AMS (Alon-Matias-Szegedy) F2 frequency-moment sketch — round 11.
# ---------------------------------------------------------------------------

_AMS_K = 32

AMS_F2_ORACLE = """
    WITH freq AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS f,
             md5(CAST(user_id AS VARCHAR)) AS h
      FROM events GROUP BY user_id
    ), sums AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CAST(f AS HUGEINT) * f) AS HUGEINT) AS f2,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 1, 1))::BIGINT % 2))) AS HUGEINT) AS s0,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 2, 1))::BIGINT % 2))) AS HUGEINT) AS s1,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 3, 1))::BIGINT % 2))) AS HUGEINT) AS s2,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 4, 1))::BIGINT % 2))) AS HUGEINT) AS s3,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 5, 1))::BIGINT % 2))) AS HUGEINT) AS s4,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 6, 1))::BIGINT % 2))) AS HUGEINT) AS s5,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 7, 1))::BIGINT % 2))) AS HUGEINT) AS s6,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 8, 1))::BIGINT % 2))) AS HUGEINT) AS s7,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 9, 1))::BIGINT % 2))) AS HUGEINT) AS s8,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 10, 1))::BIGINT % 2))) AS HUGEINT) AS s9,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 11, 1))::BIGINT % 2))) AS HUGEINT) AS s10,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 12, 1))::BIGINT % 2))) AS HUGEINT) AS s11,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 13, 1))::BIGINT % 2))) AS HUGEINT) AS s12,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 14, 1))::BIGINT % 2))) AS HUGEINT) AS s13,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 15, 1))::BIGINT % 2))) AS HUGEINT) AS s14,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 16, 1))::BIGINT % 2))) AS HUGEINT) AS s15,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 17, 1))::BIGINT % 2))) AS HUGEINT) AS s16,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 18, 1))::BIGINT % 2))) AS HUGEINT) AS s17,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 19, 1))::BIGINT % 2))) AS HUGEINT) AS s18,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 20, 1))::BIGINT % 2))) AS HUGEINT) AS s19,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 21, 1))::BIGINT % 2))) AS HUGEINT) AS s20,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 22, 1))::BIGINT % 2))) AS HUGEINT) AS s21,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 23, 1))::BIGINT % 2))) AS HUGEINT) AS s22,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 24, 1))::BIGINT % 2))) AS HUGEINT) AS s23,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 25, 1))::BIGINT % 2))) AS HUGEINT) AS s24,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 26, 1))::BIGINT % 2))) AS HUGEINT) AS s25,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 27, 1))::BIGINT % 2))) AS HUGEINT) AS s26,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 28, 1))::BIGINT % 2))) AS HUGEINT) AS s27,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 29, 1))::BIGINT % 2))) AS HUGEINT) AS s28,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 30, 1))::BIGINT % 2))) AS HUGEINT) AS s29,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 31, 1))::BIGINT % 2))) AS HUGEINT) AS s30,
             CAST(sum(f * (1 - 2 * (('0x' || substr(h, 32, 1))::BIGINT % 2))) AS HUGEINT) AS s31
      FROM freq
    ), est AS (
      SELECT n_users, f2,
             list_sort([s0 * s0, s1 * s1, s2 * s2, s3 * s3, s4 * s4, s5 * s5, s6 * s6, s7 * s7, s8 * s8, s9 * s9, s10 * s10, s11 * s11, s12 * s12, s13 * s13, s14 * s14, s15 * s15, s16 * s16, s17 * s17, s18 * s18, s19 * s19, s20 * s20, s21 * s21, s22 * s22, s23 * s23, s24 * s24, s25 * s25, s26 * s26, s27 * s27, s28 * s28, s29 * s29, s30 * s30, s31 * s31]) AS es
      FROM sums
    )
    SELECT n_users,
           CAST(f2 AS BIGINT) AS f2_exact,
           CAST(es[1] AS BIGINT) AS est_min,
           CAST(es[32] AS BIGINT) AS est_max,
           CAST(es[16] + es[17] AS BIGINT) AS est_median_x2,
           CAST((es[16] + es[17] - 2 * f2) * 1000000
                // (2 * f2) AS BIGINT) AS rel_err_signed_e6
    FROM est
"""


@query("sketch_ams_f2_moment", oracle=AMS_F2_ORACLE)
def sketch_ams_f2_moment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS (Alon-Matias-Szegedy) second-frequency-moment (F2)
    tug-of-war sketch over the events user-frequency vector, audited
    against the exact value — F2 = sum(f_u^2) is the self-join size /
    repeat-rate moment that prices every equi-join and skew decision,
    and AMS is THE classic sketch for it: 32 independent +/-1 hash
    projections, each an unbiased estimator (sum f_u * s_j(u))^2,
    pooled by the median (the sort-array trick — the 32-wide estimate
    vector lives in ONE row, so the median costs an in-row sort, not a
    window).

    Determinism: the 32 sign bits are the parity of one md5 hex char
    each — ONE md5 per user row serves all 32 estimators (the
    bloom-filter slicing idiom, sketches.py:49). Signed sums, their
    squares, the exact F2, and the signed e6 relative error are all
    exact integer arithmetic in HUGEINT/DECIMAL(38,0); the median of
    an even count is reported x2 so the half stays integral.

    Scale: one map-side-combinable shuffle to the user dictionary,
    then a single scalar aggregate computing all 32 signed sums in
    one pass — the sketch never materializes per-estimator rows, and
    at 100 TB the dictionary shuffle is the only data-sized stage.

    Reference parity: the reference (j0shgrant/gotsdb) has no sketch
    surface (internal/storage/types.go:3); this is [TARGET] sketch
    machinery.
    """
    dec = "decimal(38,0)"
    freq = (
        load_table(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
        .select(
            "f", F.md5(F.col("user_id").cast("string")).alias("h")
        )
    )
    sign_sums = [
        F.sum(
            F.col("f")
            * (
                F.lit(1)
                - F.lit(2)
                * (
                    F.conv(F.substring("h", j + 1, 1), 16, 10).cast("long")
                    % 2
                )
            )
        )
        .cast(dec)
        .alias(f"s{j}")
        for j in range(_AMS_K)
    ]
    sums = freq.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.col("f").cast(dec) * F.col("f")).alias("f2"),
        *sign_sums,
    )
    est = sums.select(
        "n_users",
        "f2",
        F.sort_array(
            F.array(
                *[F.col(f"s{j}") * F.col(f"s{j}") for j in range(_AMS_K)]
            )
        ).alias("es"),
    )
    med = F.element_at("es", _AMS_K // 2) + F.element_at("es", _AMS_K // 2 + 1)
    return est.select(
        "n_users",
        F.col("f2").cast("bigint").alias("f2_exact"),
        F.element_at("es", 1).cast("bigint").alias("est_min"),
        F.element_at("es", _AMS_K).cast("bigint").alias("est_max"),
        med.cast("bigint").alias("est_median_x2"),
        F.expr(
            "CAST((element_at(es, 16) + element_at(es, 17)"
            " - 2 * f2) * 1000000 DIV (2 * f2) AS BIGINT)"
        ).alias("rel_err_signed_e6"),
    )
