"""Additional TPC-H-shaped queries (Q2/Q8/Q9/Q11/Q12/Q13/Q15/Q16/Q17/
Q20/Q21/Q22 — completing shape coverage of all 22 with the rest of the
suite in operators.relational).

The fixture tables are a slimmed TPC-H (no partsupp; lineitem lacks
commit/receipt dates and shipmode), so each query keeps its canonical
TPC-H *shape* — the join topology, subquery structure, and aggregation
pattern that stress the optimizer — re-targeted at columns that exist.

Scale notes carried through from the relational module: dimensions
(nation/supplier/customer/part) broadcast; the fact tables shuffle once
on their join/group keys; conditional aggregation happens map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from gotsdb_spark.operators.registry import query
from gotsdb_spark.sources.registry import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


def _rev():
    # Column construction needs a live session; build lazily per query.
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q8_domestic_market_share",
    oracle="""
    SELECT CAST(date_part('year', o_orderdate) AS INT) AS o_year,
           sum(CASE WHEN s_nationkey = c_nationkey
                    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)) AS domestic_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN supplier ON l_suppkey  = s_suppkey
    GROUP BY 1
    """,
)
def q8_domestic_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: per-year market-share ratio over a 4-way join.

    'National market share' becomes the share of revenue where the
    supplier and customer sit in the same nation. One fact shuffle;
    customer and supplier broadcast; the CASE ratio folds map-side.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    domestic = F.when(F.col("s_nationkey") == F.col("c_nationkey"), _rev()).otherwise(
        F.lit(0.0)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(domestic) / F.sum(_rev())).alias("domestic_share"))
    )


@query(
    "q9_profit_by_nation_year",
    oracle="""
    SELECT n_name AS nation,
           CAST(date_part('year', o_orderdate) AS INT) AS o_year,
           sum(l_extendedprice * (1 - l_discount)) AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for one
    product family (LIKE-filtered part dim; no partsupp in fixtures so
    profit omits supply cost)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(_rev()).alias("profit"))
    )


@query(
    "q12_late_shipment_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
           count(*) AS n_lineitems
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def q12_late_shipment_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts per priority class (shipmode
    is absent from the fixture; 'late' = shipped >60 days after order)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), 1
    ).otherwise(0)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(late).alias("late_count"),
            F.count("*").alias("n_lineitems"),
        )
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two-level aggregation over a filtered outer
    join — how many customers placed how many (non-urgent) orders,
    including zero. count(o_orderkey) over the null-extended rows gives
    the 0 bucket exactly as in SQL."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q15_top_supplier_quarter",
    oracle="""
    WITH srev AS (
      SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN srev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM srev)
    """,
)
def q15_top_supplier_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view + scalar-max subquery (the 'view'
    is just the srev DataFrame reused on both sides)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    srev = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("total_rev"))
    max_rev = srev.agg(F.max("total_rev").alias("m"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        srev.join(F.broadcast(max_rev), F.col("total_rev") == F.col("m"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pavg AS (
      SELECT l_partkey AS avg_partkey, 0.5 * avg(l_quantity) AS qty_limit
      FROM lineitem GROUP BY l_partkey
    )
    SELECT sum(l_extendedprice) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pavg ON avg_partkey = l_partkey
    WHERE p_brand = 'Brand#23' AND l_quantity < qty_limit
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average re-expressed as an
    aggregate-then-join (the scalable formulation — the correlated form
    re-scans the fact table per row)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    pavg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("qty_limit")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(pavg, li.l_partkey == pavg.avg_partkey)
        .where(F.col("l_quantity") < F.col("qty_limit"))
        .agg((F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH joined AS (
      SELECT l_orderkey, l_suppkey,
             l_shipdate > o_orderdate + INTERVAL 90 DAY AS is_late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    ), per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late
      FROM joined GROUP BY l_orderkey
    ), late_supp AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM joined WHERE is_late
    )
    SELECT s_name, count(*) AS numwait
    FROM late_supp ls
    JOIN per_order po ON po.l_orderkey = ls.l_orderkey
                     AND po.n_supp > 1 AND po.n_late = 1
    JOIN supplier ON s_suppkey = ls.l_suppkey
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole-blame supplier — multi-supplier orders
    where exactly one supplier shipped late (>90 days). The EXISTS /
    NOT-EXISTS pair becomes one distinct-count pass per order plus a
    semi-join-style filter: one fact shuffle on l_orderkey instead of
    two correlated re-scans."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("is_late"),
    )
    # ONE pass over the fact join: per order, the distinct supplier set
    # and the distinct set of late suppliers together, then keep orders
    # where the late set is exactly one supplier. collect_set instead of
    # countDistinct: count(DISTINCT x) under a groupBy rewrites through
    # an Expand (doubling the aggregate input rows), while two
    # collect_set aggregates run in the single hash-agg pass — the
    # distinct-supplier cardinality per order is bounded (suppliers per
    # order), so the sets are tiny. Avoids the naive two-scan
    # formulation — at 100 TB the fact join shuffles once on
    # l_orderkey and never again.
    per_order = joined.groupBy("l_orderkey").agg(
        F.size(F.collect_set("l_suppkey")).alias("n_supp"),
        F.collect_set(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("late_set"),
    )
    blamed = per_order.where(
        (F.col("n_supp") > 1) & (F.size("late_set") == 1)
    ).select(F.element_at("late_set", 1).alias("l_suppkey"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        blamed.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "bucketed_join_priority_revenue",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_lineitems,
           CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS rev_cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def bucketed_join_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-shuffle fact⋈fact join through bucketed storage, oracled.

    Both sides are materialized bucketed+sorted on the order key, so the
    SortMergeJoin's children are bare scans — NO Exchange on either side
    (the plan test pins exactly one shuffle total: the small groupBy
    after the join). This is the recurring-join layout at 100 TB: the
    shuffle is paid once at write time, amortized over every query.

    Revenue aggregates in integer cents (floor(price*100)) — integer
    sums are associative, so the result is identical regardless of
    bucket-induced partitioning, keeping the cross-engine hash gate
    deterministic where double sums would drift.
    """
    from gotsdb_spark.sources.bucketing import bucket_table

    li = bucket_table(spark, sf_dir, "lineitem", "l_orderkey", 16)
    orders = bucket_table(spark, sf_dir, "orders", "o_orderkey", 16)
    ldf = spark.table(li)
    odf = spark.table(orders)
    cents = F.floor(F.col("l_extendedprice") * 100).cast("bigint")
    return (
        ldf.join(odf, ldf.l_orderkey == odf.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum(cents).alias("rev_cents"),
        )
    )


@query(
    "q22_idle_wealthy_customers",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS numcust,
           sum(c_acctbal) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY c_mktsegment
    """,
)
def q22_idle_wealthy_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average balance + NOT EXISTS, per segment
    ('no recent orders' replaces the phone-prefix filter absent from
    the fixture). Scalar subquery broadcasts; NOT EXISTS is a left-anti
    join against the filtered orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("numcust"), F.sum("c_acctbal").alias("totacctbal"))
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, min(l_extendedprice) AS min_price
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_partkey, p_brand, s_suppkey, s_name,
           l_extendedprice AS price
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN cost     ON cost.l_partkey = p_partkey
    WHERE p_size = 25 AND l_extendedprice = min_price
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the min-cost supplier per part (correlated-min
    re-expressed as aggregate-then-join; lineitem stands in for the
    absent partsupp as the part↔supplier bridge). Price equality is on
    a raw column value — exact in both engines, no arithmetic."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_size") == 25)
    supp = _t(spark, sf_dir, "supplier")
    cost = li.groupBy(F.col("l_partkey").alias("cost_partkey")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cost, F.col("l_partkey") == F.col("cost_partkey"))
        .where(F.col("l_extendedprice") == F.col("min_price"))
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            F.col("l_extendedprice").alias("price"),
        )
    )


@query(
    "q11_important_nation_volume",
    oracle="""
    WITH cents AS (
      SELECT s_nationkey,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS c
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    )
    SELECT s_nationkey, CAST(sum(c) AS BIGINT) AS volume_cents
    FROM cents
    GROUP BY s_nationkey
    HAVING sum(c) > (SELECT sum(c) / 50 FROM cents)
    """,
)
def q11_important_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups exceeding a global-fraction threshold
    (scalar subquery in HAVING). Volume aggregates in integer cents so
    the threshold comparison is association-safe in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    cents = li.join(supp, li.l_suppkey == supp.s_suppkey).select(
        "s_nationkey",
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("c"),
    )
    per_nation = cents.groupBy("s_nationkey").agg(F.sum("c").alias("volume_cents"))
    threshold = cents.agg((F.sum("c") / 50).alias("thr"))
    return (
        per_nation.join(F.broadcast(threshold))
        .where(F.col("volume_cents") > F.col("thr"))
        .select("s_nationkey", "volume_cents")
    )


@query(
    "q16_supplier_count_by_part_class",
    oracle="""
    SELECT p_brand, p_type,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type NOT LIKE 'MEDIUM%'
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type
    """,
)
def q16_supplier_count_by_part_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part class with a
    NOT IN exclusion subquery (left-anti join against the blacklisted
    suppliers; lineitem bridges part↔supplier)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#45") & (~F.col("p_type").like("MEDIUM%"))
    )
    bad_supp = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad_supp, "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_bulk_small_part_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
      GROUP BY l_suppkey
      HAVING sum(CAST(floor(l_quantity * 100) AS BIGINT)) > 50000
    )
    """,
)
def q20_bulk_small_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN against a grouped-HAVING subquery — the
    suppliers who moved bulk volume of 'small…' parts (quantity
    aggregated in integer hundredths for association safety)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    supp = _t(spark, sf_dir, "supplier")
    bulk = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.floor(F.col("l_quantity") * 100).cast("bigint")).alias("q100")
        )
        .where(F.col("q100") > 50000)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return supp.join(bulk, "s_suppkey", "left_semi").select("s_suppkey", "s_name")


# ---------------------------------------------------------------------------
# Integer-cents variants of the heavy star-join shapes — round 13.
#
# The sf1 (10x) rehearsal's hash contract requires association-order-
# invariant aggregates, which the canonical q9/q18 double sums are not
# (repartitioning re-associates float addition). These variants follow
# layout_range_scan_q1_cents (scale_ops.py): quantize every money
# measure to integer cents BEFORE the sum — floor(x*100+0.5) is
# bit-deterministic in both engines — so the heaviest multi-join
# shapes in the registry can finally rehearse at 10x volume under the
# exact-hash gate. Join topology is IDENTICAL to the canonical shapes;
# only the measure arithmetic changes.
# ---------------------------------------------------------------------------


@query(
    "q9_profit_cents_by_nation_year",
    oracle="""
    SELECT n_name AS nation,
           CAST(date_part('year', o_orderdate) AS INT) AS o_year,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT)
             AS profit_cents,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q9_profit_cents_by_nation_year(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q9 shape in integer cents: the 4-way star join (fact x
    part x supplier x orders x nation) whose profit rollup is exact
    BIGINT arithmetic, so the result hashes identically under ANY
    partitioning — the q9 that can rehearse at sf1. Same plan as
    q9_profit_by_nation_year: LIKE-filtered part dim prunes the fact
    early, nation broadcast, one shuffle per equi-join key."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    profit_cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("bigint")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.sum(profit_cents).alias("profit_cents"),
            F.count("*").alias("n_lineitems"),
        )
    )


@query(
    "q18_large_volume_cents",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             AS totalprice_cents,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS BIGINT)) > 150
    )
    GROUP BY c_custkey, c_name, o_orderkey, totalprice_cents
    """,
)
def q18_large_volume_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape in exact integers: the HAVING-filtered
    IN-subquery over the fact table with quantities summed as BIGINT
    (the fixture's l_quantity is integral-valued) and the price key
    quantized to cents — hash-exact under any partitioning, so the
    double-fact-scan semi-join shape rehearses at sf1. Same plan as
    q18_large_volume_customers: one map-side-combinable subquery
    aggregate, qualifying keys join back, no correlated re-execution."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("bigint")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("q"))
        .where(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(
            big.withColumnRenamed("l_orderkey", "bk"),
            F.col("l_orderkey") == F.col("bk"),
            "inner",
        )
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("totalprice_cents"),
        )
        .agg(F.sum(qty).alias("total_qty"))
    )
