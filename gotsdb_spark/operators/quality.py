"""Data-quality operators: referential-integrity auditing over the star
schema and corpus-quality filters over ``documents``.

These are the checks a 100 TB ingestion pipeline runs continuously —
FK orphan detection before a fact table is published, and the
Gopher/C4-style document filters that decide what enters a training
mix. Design rules:

- Integrity checks are LEFT ANTI joins against *broadcast* dimension
  key sets: the fact side streams map-side, nothing wide shuffles, and
  each audit row carries only counts.
- Document filters are pure row-local expressions (split / transform /
  aggregate higher-order functions) — scan-speed JVM work with no
  Python and no shuffle before the final tiny aggregate.
- PII scrubbing is regexp work on the JVM; the synthetic PII suffix is
  a deterministic function of ``doc_id`` so both engines see identical
  inputs (the fixture corpus itself contains none).

Reference parity: the reference engine (j0shgrant/gotsdb,
internal/storage/engine.go:39-222) has no validation surface at all —
values are opaque strings (internal/storage/types.go:3) — so this
module is part of the mandated [TARGET] pipeline extension
(SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from gotsdb_spark.operators.registry import query
from gotsdb_spark.sources.registry import load_table

# (name, fact table, fk column, dim table, pk column)
_FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


@query(
    "quality_referential_integrity",
    oracle="""
    SELECT 'lineitem.l_orderkey->orders' AS relationship,
           (SELECT count(*) FROM lineitem) AS fk_rows,
           (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL) AS null_fks,
           (SELECT count(*) FROM lineitem l WHERE l_orderkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS orphans
    UNION ALL SELECT 'lineitem.l_partkey->part',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem WHERE l_partkey IS NULL),
           (SELECT count(*) FROM lineitem l WHERE l_partkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
    UNION ALL SELECT 'lineitem.l_suppkey->supplier',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem WHERE l_suppkey IS NULL),
           (SELECT count(*) FROM lineitem l WHERE l_suppkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
    UNION ALL SELECT 'orders.o_custkey->customer',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders WHERE o_custkey IS NULL),
           (SELECT count(*) FROM orders o WHERE o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL SELECT 'customer.c_nationkey->nation',
           (SELECT count(*) FROM customer),
           (SELECT count(*) FROM customer WHERE c_nationkey IS NULL),
           (SELECT count(*) FROM customer c WHERE c_nationkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL SELECT 'supplier.s_nationkey->nation',
           (SELECT count(*) FROM supplier),
           (SELECT count(*) FROM supplier WHERE s_nationkey IS NULL),
           (SELECT count(*) FROM supplier s WHERE s_nationkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
    UNION ALL SELECT 'nation.n_regionkey->region',
           (SELECT count(*) FROM nation),
           (SELECT count(*) FROM nation WHERE n_regionkey IS NULL),
           (SELECT count(*) FROM nation n WHERE n_regionkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey))
    """,
)
def quality_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit every FK edge of the star schema: row count, NULL FKs, orphans.

    Each audit is ONE pass over the fact's FK column: a LEFT OUTER
    join against the dimension's (distinct, projected) key column —
    unhinted, so AQE broadcasts the genuinely small key sets
    (nation/region/supplier) and falls back to sort-merge where the
    "dimension" is itself growth-coupled (the lineitem→orders edge's
    key set is orders-sized; forcing it through the 8 GB broadcast
    ceiling would be the exact failure the broadcast guard exists to
    stop) — then a
    single aggregate counts rows, NULL FKs, and orphans (FK present,
    no matching PK) together. The pre-round-10 shape ran a separate
    anti-join pass and a separate count pass per edge (two fact scans
    per audit, 6 lineitem scans total — the fixed scan audit caught
    it). The per-edge results are one-row aggregates unioned into a
    seven-row report.
    """
    out: DataFrame | None = None
    for name, fact_t, fk, dim_t, pk in _FK_EDGES:
        fact = load_table(spark, fact_t, sf_dir).select(fk)
        dim_keys = load_table(spark, dim_t, sf_dir).select(pk).distinct()
        row = (
            fact.join(
                dim_keys,
                on=fact[fk] == dim_keys[pk],
                how="left",
            )
            .agg(
                F.count("*").alias("fk_rows"),
                F.count(F.when(F.col(fk).isNull(), 1)).alias("null_fks"),
                F.count(
                    F.when(F.col(fk).isNotNull() & F.col(pk).isNull(), 1)
                ).alias("orphans"),
            )
            .select(
                F.lit(name).alias("relationship"), "fk_rows", "null_fks", "orphans"
            )
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None
    return out


@query(
    "text_repetition_ratio",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ), tri AS (
      SELECT doc_id, lang,
             CASE WHEN len(w) < 3 THEN []
                  ELSE list_transform(range(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])
             END AS tris
      FROM t
    )
    SELECT doc_id, lang,
           len(tris) AS n_trigrams,
           len(list_distinct(tris)) AS n_distinct_trigrams,
           CASE WHEN len(tris) = 0 THEN 0.0
                ELSE 1.0 - len(list_distinct(tris)) * 1.0 / len(tris)
           END AS dup_ratio,
           CASE WHEN len(tris) = 0 THEN FALSE
                ELSE 1.0 - len(list_distinct(tris)) * 1.0 / len(tris) > 0.10
           END AS flagged
    FROM tri
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-trigram fraction per document (Gopher repetition signal).

    Docs dominated by repeated n-grams are boilerplate/spam; the filter
    is `1 - distinct(trigrams)/total(trigrams) > threshold`. Everything
    is array higher-order functions on the JVM (`transform` over a
    `sequence` of positions, then `array_distinct`) — a pure map with
    no explode, so the shuffle-free scan shape survives any scale.
    """
    docs = load_table(spark, "documents", sf_dir)
    w = F.split("text", " ")
    d = docs.select("doc_id", "lang", w.alias("w"))
    tris = F.when(F.size("w") < 3, F.array().cast("array<string>")).otherwise(
        F.expr("transform(sequence(0, size(w) - 3), i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))")
    )
    d = d.select("doc_id", "lang", tris.alias("tris"))
    n = F.size("tris")
    nd = F.size(F.array_distinct("tris"))
    dup = F.when(n == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - nd.cast("double") / n.cast("double")
    )
    return d.select(
        "doc_id",
        "lang",
        n.cast("long").alias("n_trigrams"),
        nd.cast("long").alias("n_distinct_trigrams"),
        dup.alias("dup_ratio"),
        F.when(n == 0, F.lit(False)).otherwise(dup > 0.10).alias("flagged"),
    )


@query(
    "quality_gopher_rules",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, n_chars, string_split(text, ' ') AS w FROM documents
    ), m AS (
      SELECT lang,
             len(w) AS n_words,
             list_sum(list_transform(w, x -> length(x))) * 1.0 / len(w) AS mean_len,
             len(list_distinct(w)) * 1.0 / len(w) AS ttr,
             n_chars
      FROM t
    ), r AS (
      SELECT lang,
             (n_words BETWEEN 30 AND 80) AS ok_word_count,
             (mean_len BETWEEN 3.0 AND 10.0) AS ok_mean_word_len,
             (ttr >= 0.45) AS ok_ttr,
             (n_chars >= 100) AS ok_min_chars
      FROM m
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN ok_word_count AND ok_mean_word_len
                          AND ok_ttr AND ok_min_chars THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           CAST(sum(CASE WHEN NOT ok_word_count THEN 1 ELSE 0 END) AS BIGINT) AS fail_word_count,
           CAST(sum(CASE WHEN NOT ok_mean_word_len THEN 1 ELSE 0 END) AS BIGINT) AS fail_mean_word_len,
           CAST(sum(CASE WHEN NOT ok_ttr THEN 1 ELSE 0 END) AS BIGINT) AS fail_ttr,
           CAST(sum(CASE WHEN NOT ok_min_chars THEN 1 ELSE 0 END) AS BIGINT) AS fail_min_chars
    FROM r GROUP BY lang
    """,
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite Gopher-style keep/drop rules with per-rule failure counts.

    Four row-local rules (word count in range, mean word length in
    range, type-token ratio floor, min char floor) evaluated in one
    scan; the report aggregates keeps and per-rule failures by lang.
    At scale this is the shape of every corpus-filter job: scan → map
    booleans → tiny agg. Thresholds are calibrated to the fixture so
    every rule has both passing and failing documents.
    """
    docs = load_table(spark, "documents", sf_dir)
    w = F.split("text", " ")
    n_words = F.size(w)
    mean_len = F.expr(
        "aggregate(split(text, ' '), 0L, (a, x) -> a + length(x))"
    ).cast("double") / n_words.cast("double")
    ttr = F.size(F.array_distinct(w)).cast("double") / n_words.cast("double")
    m = docs.select(
        "lang",
        n_words.alias("n_words"),
        mean_len.alias("mean_len"),
        ttr.alias("ttr"),
        "n_chars",
    )
    ok_wc = F.col("n_words").between(30, 80)
    ok_ml = F.col("mean_len").between(3.0, 10.0)
    ok_ttr = F.col("ttr") >= 0.45
    ok_mc = F.col("n_chars") >= 100
    return (
        m.select(
            "lang",
            ok_wc.alias("ok_wc"),
            ok_ml.alias("ok_ml"),
            ok_ttr.alias("ok_ttr"),
            ok_mc.alias("ok_mc"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                (F.col("ok_wc") & F.col("ok_ml") & F.col("ok_ttr") & F.col("ok_mc"))
                .cast("int")
            ).alias("n_keep"),
            F.sum((~F.col("ok_wc")).cast("int")).alias("fail_word_count"),
            F.sum((~F.col("ok_ml")).cast("int")).alias("fail_mean_word_len"),
            F.sum((~F.col("ok_ttr")).cast("int")).alias("fail_ttr"),
            F.sum((~F.col("ok_mc")).cast("int")).alias("fail_min_chars"),
        )
    )


@query(
    "text_pii_scrub",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.com or sales' || CAST(doc_id AS VARCHAR)
                  || '@corp.net phone 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
               AS raw
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(raw, '[a-z0-9]+@[a-z]+\\.[a-z]+')) AS n_emails,
           len(regexp_extract_all(raw, '[0-9]{3}-[0-9]{2,4}')) AS n_phones,
           md5(regexp_replace(
                 regexp_replace(raw, '[a-z0-9]+@[a-z]+\\.[a-z]+', '<EMAIL>', 'g'),
                 '[0-9]{3}-[0-9]{2,4}', '<PHONE>', 'g')) AS scrubbed_md5
    FROM t
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect and redact email/phone PII; emit counts + scrubbed hash.

    The fixture corpus contains no PII, so a deterministic synthetic
    suffix (a pure function of ``doc_id``) is appended before scrubbing
    — both engines construct identical inputs, and the md5 of the
    scrubbed text proves byte-identical redaction output. All regexp
    work is JVM-side (patterns chosen to mean the same thing in Java
    regex and DuckDB's RE2); a pure map at any scale.
    """
    docs = load_table(spark, "documents", sf_dir)
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.com or sales"),
        F.col("doc_id").cast("string"),
        F.lit("@corp.net phone 555-01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
    )
    d = docs.select("doc_id", raw.alias("raw"))
    email_re = r"[a-z0-9]+@[a-z]+\.[a-z]+"
    phone_re = r"[0-9]{3}-[0-9]{2,4}"
    scrubbed = F.regexp_replace(
        F.regexp_replace("raw", email_re, "<EMAIL>"), phone_re, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.regexp_count("raw", F.lit(email_re)).cast("long").alias("n_emails"),
        F.regexp_count("raw", F.lit(phone_re)).cast("long").alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


_LINKAGE_MAX_DIST = 2

_FUZZY_LINKAGE_ORACLE = f"""
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           a.p_brand, a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
     AND a.p_name <> b.p_name
     AND levenshtein(a.p_name, b.p_name) <= {_LINKAGE_MAX_DIST}
"""


@query("linkage_fuzzy_name_match", oracle=_FUZZY_LINKAGE_ORACLE)
def linkage_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage: near-identical catalog entries.

    The classic entity-resolution shape — find records that are the
    same real-world thing spelled slightly differently (typos, OCR
    noise, vendor feeds). Candidate generation is a BLOCKED self-join:
    records only compare within a blocking key (brand), turning the
    O(n²) all-pairs distance matrix into per-block products; the
    within-block filter is Levenshtein ≤ {_LINKAGE_MAX_DIST} on the
    JVM (both engines implement the standard unit-cost edit distance,
    so the oracle matches exactly). Identical names are excluded —
    those are exact duplicates, a groupBy's job, not linkage's.

    At 100 TB: the block key is the shuffle key (equi-join → hash
    co-location, AQE skew-split applies to hot brands) and the
    quadratic term is bounded per block. The expensive distance runs
    on the DICTIONARY, not the rows: parts are grouped to one row per
    (brand, name) first, so Levenshtein evaluates once per distinct
    ordered name pair per block (records repeat names; the distinct
    domain is orders of magnitude smaller than the row-pair space —
    8M row pairs vs ~100k name pairs at sf0.1), bounded by the
    threshold form (early-exit banded DP, returns -1 past the bound).
    Surviving name pairs explode their grouped key lists back into
    record pairs — output work is O(matches), not O(candidates).
    """
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_name", "p_brand")
    by_name = part.groupBy("p_brand", "p_name").agg(
        F.collect_list("p_partkey").alias("keys")
    )
    a = by_name.select(
        "p_brand", F.col("p_name").alias("name_a"), F.col("keys").alias("keys_a")
    )
    b = by_name.select(
        F.col("p_brand").alias("brand_b"),
        F.col("p_name").alias("name_b"),
        F.col("keys").alias("keys_b"),
    )
    # Ordered name pairs (both directions) so name_a always labels the
    # lower-key part after the part_a < part_b filter below.
    near = (
        a.join(
            b,
            (F.col("p_brand") == F.col("brand_b"))
            & (F.col("name_a") != F.col("name_b")),
        )
        .withColumn(
            "lev_dist",
            F.levenshtein("name_a", "name_b", _LINKAGE_MAX_DIST).cast("long"),
        )
        .where(F.col("lev_dist") >= 1)
    )
    return (
        near.select(
            "p_brand",
            "name_a",
            "name_b",
            "lev_dist",
            F.explode("keys_a").alias("part_a"),
            "keys_b",
        )
        .select(
            "p_brand",
            "name_a",
            "name_b",
            "lev_dist",
            "part_a",
            F.explode("keys_b").alias("part_b"),
        )
        .where(F.col("part_a") < F.col("part_b"))
        .select("part_a", "part_b", "p_brand", "name_a", "name_b", "lev_dist")
    )


# ---------------------------------------------------------------------------
# Column completeness / cardinality profile — round 6.
# ---------------------------------------------------------------------------

NULL_PROFILE_ORACLE = """
    SELECT 'o_orderkey' AS col,
           count(*) AS n_rows,
           CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_null,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*),
           CAST(count(*) - count(o_orderstatus) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*),
           CAST(count(*) - count(o_orderpriority) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*),
           CAST(count(*) - count(o_custkey) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT)
    FROM orders
"""


@query("quality_null_profile", oracle=NULL_PROFILE_ORACLE)
def quality_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column completeness + cardinality profile of the orders table —
    the dbt-style data-contract audit (null share and distinct count
    per column) run before a table is trusted as a join dimension or
    feature source.

    All four columns profile in ONE pass: count/count(col)/
    count(DISTINCT col) per column in a single aggregate (Spark expands
    multi-distinct aggregates itself; the oracle unions per-column
    passes, proving the one-pass expansion equals the per-column
    truth). Output is one row per column — a schema-stable profile
    table a contract test can diff between loads.
    """
    orders = load_table(spark, "orders", sf_dir)
    cols = ["o_orderkey", "o_orderstatus", "o_orderpriority", "o_custkey"]
    profiles = None
    base = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            agg
            for c in cols
            for agg in (
                (F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"null_{c}"),
                F.countDistinct(c).cast("long").alias(f"dist_{c}"),
            )
        ],
    )
    stack_expr = "stack({n}, {args}) AS (col, n_null, n_distinct)".format(
        n=len(cols),
        args=", ".join(f"'{c}', null_{c}, dist_{c}" for c in cols),
    )
    profiles = base.select("n_rows", F.expr(stack_expr)).select(
        "col", "n_rows", "n_null", "n_distinct"
    )
    return profiles


# ---------------------------------------------------------------------------
# Order/lineitem financial reconciliation — round 6.
# ---------------------------------------------------------------------------

RECONCILIATION_ORACLE = """
    WITH line_net AS (
      SELECT l_orderkey,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                 * (1 + l_tax) * 100) AS BIGINT))
                  AS BIGINT) AS expected_cents
      FROM lineitem GROUP BY l_orderkey
    ), recon AS (
      SELECT o.o_orderkey,
             CAST(floor(o.o_totalprice * 100) AS BIGINT) AS charged_cents,
             ln.expected_cents,
             CASE
               WHEN ln.expected_cents IS NULL THEN 'no_lines'
               WHEN floor(o.o_totalprice * 100) = ln.expected_cents
                 THEN 'exact'
               WHEN abs(CAST(floor(o.o_totalprice * 100) AS BIGINT)
                        - ln.expected_cents) <= 100 THEN 'within_dollar'
               WHEN abs(CAST(floor(o.o_totalprice * 100) AS BIGINT)
                        - ln.expected_cents) * 100
                    <= CAST(floor(o.o_totalprice * 100) AS BIGINT)
                 THEN 'within_1pct'
               ELSE 'material'
             END AS band
      FROM orders o LEFT JOIN line_net ln ON ln.l_orderkey = o.o_orderkey
    )
    SELECT band,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN expected_cents IS NULL THEN 0
                         ELSE abs(charged_cents - expected_cents) END)
                AS BIGINT) AS total_abs_dev_cents
    FROM recon GROUP BY band
"""


@query("quality_order_reconciliation", oracle=RECONCILIATION_ORACLE)
def quality_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table financial reconciliation: each order's charged total
    vs the sum of its line items' net-of-discount, tax-inclusive
    amounts, bucketed into deviation bands — the books-balance audit
    run before two tables are trusted to describe the same money
    (its FK sibling quality_referential_integrity only checks that
    keys exist, not that the numbers agree).

    Per-line amounts floor to integer cents BEFORE the per-order sum
    (association-safe; summing doubles would tie the result to
    aggregation order), the order side floors once, and every band
    predicate is integer arithmetic — the 1% band by cross-
    multiplication, no division. One shuffle join on the order key
    (zero with both tables bucketed by it); LEFT join keeps orders
    with no lines visible as their own band instead of silently
    vanishing.
    """
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    line_net = li.groupBy("l_orderkey").agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("expected_cents")
    )
    charged = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    dev = F.abs(charged - F.col("expected_cents"))
    recon = orders.join(
        line_net, orders.o_orderkey == line_net.l_orderkey, "left"
    ).select(
        charged.alias("charged_cents"),
        "expected_cents",
        F.when(F.col("expected_cents").isNull(), "no_lines")
        .when(charged == F.col("expected_cents"), "exact")
        .when(dev <= 100, "within_dollar")
        .when(dev * 100 <= charged, "within_1pct")
        .otherwise("material")
        .alias("band"),
    )
    return recon.groupBy("band").agg(
        F.count("*").alias("n_orders"),
        F.sum(
            F.when(F.col("expected_cents").isNull(), F.lit(0)).otherwise(
                F.abs(F.col("charged_cents") - F.col("expected_cents"))
            )
        )
        .cast("long")
        .alias("total_abs_dev_cents"),
    )


# ---------------------------------------------------------------------------
# Per-source length percentile profile — round 7.
# ---------------------------------------------------------------------------

SOURCE_PROFILE_ORACLE = """
    WITH dic AS (
      SELECT source, n_chars, count(*) AS c
      FROM documents GROUP BY source, n_chars
    ), cum AS (
      SELECT source, n_chars, c,
             sum(c) OVER (PARTITION BY source ORDER BY n_chars) AS cc,
             sum(c) OVER (PARTITION BY source) AS n
      FROM dic
    )
    SELECT source,
           CAST(max(n) AS BIGINT) AS n_docs,
           CAST(min(CASE WHEN cc * 10 >= n THEN n_chars END) AS BIGINT)
             AS p10_chars,
           CAST(min(CASE WHEN cc * 2 >= n THEN n_chars END) AS BIGINT)
             AS p50_chars,
           CAST(min(CASE WHEN cc * 10 >= 9 * n THEN n_chars END) AS BIGINT)
             AS p90_chars,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM cum GROUP BY source
"""


@query("quality_source_length_profile", oracle=SOURCE_PROFILE_ORACLE)
def quality_source_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length distribution profile (p10/p50/p90 +
    min/max of n_chars) — the first diagnostic plot of any corpus
    review: a source whose p50 collapsed between snapshots got
    truncated upstream; one whose p10 is near zero is shipping empty
    shells. Exact lower order statistics over the (source, n_chars)
    dictionary — smallest value with cc·k ≥ q·n by integer
    cross-multiplication (the weighted-median convention), no engine
    quantile function trusted, no interpolation.

    Scale: one map-side-combinable groupBy to the dictionary (bounded
    by sources × distinct lengths, not docs); the cumulative window is
    source-partitioned. Same dictionary machinery as
    stats_winsorized_mean, pivoted to the per-source monitoring view.
    """
    docs = load_table(spark, "documents", sf_dir)
    dic = docs.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    w_cum = (
        W.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = dic.select(
        "source",
        "n_chars",
        F.sum("c").over(w_cum).alias("cc"),
        F.sum("c").over(W.partitionBy("source")).alias("n"),
    )
    pick = lambda cond: F.min(F.when(cond, F.col("n_chars"))).cast("long")  # noqa: E731
    return cum.groupBy("source").agg(
        F.max("n").cast("long").alias("n_docs"),
        pick(F.col("cc") * 10 >= F.col("n")).alias("p10_chars"),
        pick(F.col("cc") * 2 >= F.col("n")).alias("p50_chars"),
        pick(F.col("cc") * 10 >= 9 * F.col("n")).alias("p90_chars"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# Population Stability Index between corpus snapshots — round 7.
# ---------------------------------------------------------------------------

SNAPSHOT_PSI_ORACLE = """
    WITH snap AS (
      SELECT n_chars,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                  AS BIGINT) % 2 AS s
      FROM documents
    ), tot AS (
      SELECT CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
      FROM snap
    ), dic AS (
      SELECT n_chars, count(*) AS c FROM snap WHERE s = 0 GROUP BY n_chars
    ), cum AS (
      SELECT n_chars,
             sum(c) OVER (ORDER BY n_chars) AS cc,
             (SELECT na FROM tot) AS na
      FROM dic
    ), edges AS (
      SELECT min(CASE WHEN cc * 10 >= 1 * na THEN n_chars END) AS e1,
             min(CASE WHEN cc * 10 >= 2 * na THEN n_chars END) AS e2,
             min(CASE WHEN cc * 10 >= 3 * na THEN n_chars END) AS e3,
             min(CASE WHEN cc * 10 >= 4 * na THEN n_chars END) AS e4,
             min(CASE WHEN cc * 10 >= 5 * na THEN n_chars END) AS e5,
             min(CASE WHEN cc * 10 >= 6 * na THEN n_chars END) AS e6,
             min(CASE WHEN cc * 10 >= 7 * na THEN n_chars END) AS e7,
             min(CASE WHEN cc * 10 >= 8 * na THEN n_chars END) AS e8,
             min(CASE WHEN cc * 10 >= 9 * na THEN n_chars END) AS e9
      FROM cum
    ), binned AS (
      SELECT s,
             1 + (CASE WHEN n_chars > e1 THEN 1 ELSE 0 END)
               + (CASE WHEN n_chars > e2 THEN 1 ELSE 0 END)
               + (CASE WHEN n_chars > e3 THEN 1 ELSE 0 END)
               + (CASE WHEN n_chars > e4 THEN 1 ELSE 0 END)
               + (CASE WHEN n_chars > e5 THEN 1 ELSE 0 END)
               + (CASE WHEN n_chars > e6 THEN 1 ELSE 0 END)
               + (CASE WHEN n_chars > e7 THEN 1 ELSE 0 END)
               + (CASE WHEN n_chars > e8 THEN 1 ELSE 0 END)
               + (CASE WHEN n_chars > e9 THEN 1 ELSE 0 END) AS bin
      FROM snap CROSS JOIN edges
    ), counts AS (
      SELECT b.bin,
             CAST(coalesce(sum(CASE WHEN s = 0 THEN 1 END), 0) AS BIGINT)
               AS c_ref,
             CAST(coalesce(sum(CASE WHEN s = 1 THEN 1 END), 0) AS BIGINT)
               AS c_cur
      FROM (SELECT unnest(range(1, 11)) AS bin) b
      LEFT JOIN binned ON binned.bin = b.bin
      GROUP BY b.bin
    )
    SELECT bin, c_ref, c_cur,
           CAST(floor(((c_ref + 1.0) / (tot.na + 10)
                       - (c_cur + 1.0) / (tot.nb + 10))
                      * ln(((c_ref + 1.0) * (tot.nb + 10))
                           / ((c_cur + 1.0) * (tot.na + 10)))
                      * 1e9 + 0.5001) AS BIGINT) AS psi_term_e9
    FROM counts CROSS JOIN tot
"""


@query("quality_snapshot_psi", oracle=SNAPSHOT_PSI_ORACLE)
def quality_snapshot_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the document-length distribution
    between two corpus snapshots — THE production drift gate (credit
    scoring inherited it, data pipelines adopted it): PSI < 0.1 stable,
    > 0.25 investigate. Unlike the KS statistic (max ECDF gap,
    stats_ks_priority_price) PSI reports WHERE the mass moved —
    per-decile signed terms — which is what a triage actually needs.

    Snapshots here are deterministic md5-parity halves of `documents`
    (the portable-uniform convention), standing in for release N vs
    N+1; in production only the assignment column changes. Decile
    edges come from the REFERENCE half's exact (n_chars) dictionary —
    the cc·10 ≥ k·n rule via dist_rank, no single-partition window —
    and bin assignment is a broadcast 9-edge comparison, a pure map.
    Add-one smoothing ((c+1)/(n+10)) makes empty-bin terms finite and
    identical in both engines; each decile's term is floored to an e9
    integer before any summation, so the total PSI is an exact integer
    sum downstream.

    Scale: ONE documents pass builds the (snapshot, n_chars)
    dictionary (map-side combinable, saturating length grid),
    localCheckpointed so the snapshot totals, the reference-half
    dictionary, and the binning all derive from it — the pre-round-10
    shape re-scanned documents per consumer (3 scans in the fixed
    audit). Two linear dist_rank shuffles over the dictionary, one
    broadcast of 9 edges, one (snap, bin) aggregation. Nothing
    data-sized crosses a single executor.
    """
    from gotsdb_spark.operators.distrank import (
        decile_bin_col,
        dictionary_decile_edges,
    )

    base = (
        load_table(spark, "documents", sf_dir)
        .select(
            "n_chars",
            (
                F.expr(
                    "conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10)"
                )
                .cast("bigint")
                % 2
            ).alias("s"),
        )
        .groupBy("s", "n_chars")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    tot = base.agg(
        F.sum(F.when(F.col("s") == 0, F.col("c")).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("s") == 1, F.col("c")).otherwise(0))
        .cast("long")
        .alias("nb"),
    )
    dic = (
        base.where(F.col("s") == 0)
        .groupBy("n_chars")
        .agg(F.sum("c").alias("c"))
    )
    # Edges are quantiles of the REFERENCE half (n_col="na"), then both
    # halves are binned against them — that asymmetry is the PSI
    # definition, and why the helper takes `tot` separately from `dic`.
    edges = dictionary_decile_edges(dic, "n_chars", "c", tot, "na")
    binned = base.crossJoin(F.broadcast(edges)).select(
        "s", decile_bin_col("n_chars").alias("bin"), "c"
    )
    spine = spark.range(1, 11).select(F.col("id").cast("int").alias("bin"))
    counts = (
        spine.join(binned, "bin", "left")
        .groupBy("bin")
        .agg(
            F.coalesce(F.sum(F.when(F.col("s") == 0, F.col("c"))), F.lit(0))
            .cast("long")
            .alias("c_ref"),
            F.coalesce(F.sum(F.when(F.col("s") == 1, F.col("c"))), F.lit(0))
            .cast("long")
            .alias("c_cur"),
        )
    )
    pa = (F.col("c_ref") + 1.0) / (F.col("na") + 10)
    pb = (F.col("c_cur") + 1.0) / (F.col("nb") + 10)
    lr = F.log(
        ((F.col("c_ref") + 1.0) * (F.col("nb") + 10))
        / ((F.col("c_cur") + 1.0) * (F.col("na") + 10))
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "c_ref",
        "c_cur",
        F.floor((pa - pb) * lr * 1e9 + 0.5001).cast("long").alias(
            "psi_term_e9"
        ),
    )


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence of per-source language mix — round 8.
# ---------------------------------------------------------------------------

JS_DIVERGENCE_ORACLE = """
    WITH tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM documents
    ), lmarg AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS cl FROM documents
      GROUP BY lang
    ), smarg AS (
      SELECT source, CAST(count(*) AS BIGINT) AS ns FROM documents
      GROUP BY source
    ), cells AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS csl FROM documents
      GROUP BY source, lang
    ), spine AS (
      SELECT s.source, s.ns, l.lang, l.cl,
             COALESCE(c.csl, 0) AS csl, (SELECT n FROM tot) AS n
      FROM smarg s CROSS JOIN lmarg l
      LEFT JOIN cells c ON c.source = s.source AND c.lang = l.lang
    ), terms AS (
      SELECT source, ns,
             CAST(floor(
               (CASE WHEN csl > 0
                     THEN 0.5 * (csl * 1.0 / ns)
                          * ln(2.0 * (csl * 1.0 / ns)
                               / ((csl * 1.0 / ns) + (cl * 1.0 / n)))
                     ELSE 0.0 END
                + 0.5 * (cl * 1.0 / n)
                  * ln(2.0 * (cl * 1.0 / n)
                       / ((csl * 1.0 / ns) + (cl * 1.0 / n))))
               * 1e9 + 0.5001) AS BIGINT) AS term_e9
      FROM spine
    )
    SELECT source,
           CAST(max(ns) AS BIGINT) AS n_docs,
           CAST(sum(term_e9) AS BIGINT) AS jsd_e9
    FROM terms GROUP BY source
"""


@query("quality_js_divergence_sources", oracle=JS_DIVERGENCE_ORACLE)
def quality_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between each source's language mix and
    the corpus-wide language distribution — the bounded, symmetric
    drift score (0 = identical mix, ln 2 = disjoint support) that
    ranks sources by "how unrepresentative is this source's language
    blend?". The PSI gate (quality_snapshot_psi) compares snapshots of
    ONE distribution over time; this compares every source against the
    corpus at one instant — the mixture-design view a curation run
    reads before reweighting sources.

    JSD(p, q) = 0.5*KL(p||m) + 0.5*KL(q||m) with m = (p+q)/2, where p
    is the source's lang distribution and q the corpus marginal. Every
    (source, lang) cell term — including p = 0 cells, whose p-side
    contribution is exactly 0 but whose q-side term still counts, which
    is why the source x lang spine is materialized — is computed once
    from exact integer counts with an identical float expression in
    both engines and e9-floored BEFORE summation (the
    stats_information_gain convention), so per-source sums are exact
    integer additions in any order.

    Scale: ONE map-side-combinable groupBy to the (source, lang) cell
    table — |sources|·|langs| rows, mixture-bounded — which is
    localCheckpointed and feeds both marginals and the grand total
    (the pre-round-10 shape re-scanned documents for each of the four
    aggregates); the spine is cell-sized, marginals broadcast.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    aggregation surface (internal/storage/types.go:3); this is
    [TARGET] curation machinery.
    """
    docs = load_table(spark, "documents", sf_dir).select("source", "lang")
    cells = (
        docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("csl"))
        .localCheckpoint(eager=False)
    )
    tot = cells.agg(F.sum("csl").cast("long").alias("n"))
    lmarg = cells.groupBy("lang").agg(
        F.sum("csl").cast("long").alias("cl")
    )
    smarg = cells.groupBy("source").agg(
        F.sum("csl").cast("long").alias("ns")
    )
    spine = (
        smarg.crossJoin(F.broadcast(lmarg))
        .join(cells, ["source", "lang"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "ns",
            "cl",
            F.coalesce(F.col("csl"), F.lit(0)).alias("csl"),
            "n",
        )
    )
    p = F.col("csl") * 1.0 / F.col("ns")
    q = F.col("cl") * 1.0 / F.col("n")
    term = (
        F.when(
            F.col("csl") > 0,
            0.5 * p * F.log(2.0 * p / (p + q)),
        ).otherwise(0.0)
        + 0.5 * q * F.log(2.0 * q / (p + q))
    )
    terms = spine.select(
        "source",
        "ns",
        F.floor(term * 1e9 + 0.5001).cast("long").alias("term_e9"),
    )
    return terms.groupBy("source").agg(
        F.max("ns").cast("long").alias("n_docs"),
        F.sum("term_e9").cast("long").alias("jsd_e9"),
    )


# ---------------------------------------------------------------------------
# Per-source (cohort) PSI drift gate — round 9.
# ---------------------------------------------------------------------------

def _psi_edges_terms_sql() -> tuple[str, str]:
    """The per-source edge picks and bin expression (DuckDB side)."""
    picks = ", ".join(
        f"min(CASE WHEN cc * 10 >= {k} * na THEN n_chars END) AS e{k}"
        for k in range(1, 10)
    )
    bins = " + ".join(
        f"(CASE WHEN d.n_chars > e.e{k} THEN 1 ELSE 0 END)"
        for k in range(1, 10)
    )
    return picks, bins


_PSI_SRC_PICKS, _PSI_SRC_BINS = _psi_edges_terms_sql()

PSI_BY_SOURCE_ORACLE = f"""
    WITH snap AS (
      SELECT source, n_chars,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                  AS BIGINT) % 2 AS s
      FROM documents
    ), tot AS (
      SELECT source,
             CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
      FROM snap GROUP BY source
    ), dic AS (
      SELECT source, n_chars, count(*) AS c
      FROM snap WHERE s = 0 GROUP BY source, n_chars
    ), cum AS (
      SELECT d.source, d.n_chars,
             sum(d.c) OVER (PARTITION BY d.source ORDER BY d.n_chars) AS cc,
             t.na
      FROM dic d JOIN tot t USING (source)
    ), edges AS (
      SELECT source, {_PSI_SRC_PICKS} FROM cum GROUP BY source
    ), binned AS (
      SELECT d.source, d.s, 1 + {_PSI_SRC_BINS} AS bin
      FROM snap d JOIN edges e USING (source)
    ), spine AS (
      SELECT t.source, r.range + 1 AS bin FROM tot t, range(10) r
    ), counts AS (
      SELECT sp.source, sp.bin,
             CAST(coalesce(sum(CASE WHEN b.s = 0 THEN 1 END), 0) AS BIGINT)
               AS c_ref,
             CAST(coalesce(sum(CASE WHEN b.s = 1 THEN 1 END), 0) AS BIGINT)
               AS c_cur
      FROM spine sp LEFT JOIN binned b
        ON b.source = sp.source AND b.bin = sp.bin
      GROUP BY sp.source, sp.bin
    ), terms AS (
      SELECT c.source,
             CAST(floor(((c.c_ref + 1.0) / (t.na + 10)
                         - (c.c_cur + 1.0) / (t.nb + 10))
                        * ln(((c.c_ref + 1.0) * (t.nb + 10))
                             / ((c.c_cur + 1.0) * (t.na + 10)))
                        * 1e9 + 0.5001) AS BIGINT) AS term_e9,
             t.na, t.nb
      FROM counts c JOIN tot t USING (source)
    )
    SELECT source,
           CAST(max(na) AS BIGINT) AS n_ref,
           CAST(max(nb) AS BIGINT) AS n_cur,
           CAST(sum(term_e9) AS BIGINT) AS psi_e9
    FROM terms GROUP BY source
"""


@query("quality_psi_by_source", oracle=PSI_BY_SOURCE_ORACLE)
def quality_psi_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE Population Stability Index of the document-length
    distribution between two corpus snapshots — the cohort-stratified
    upgrade of quality_snapshot_psi the round-8 verdict backlog asked
    for: a corpus-global PSI of 0.03 can hide one source whose length
    distribution collapsed (its mass is diluted 20x), and the per-source
    readout is what routes the triage to the crawler that broke.

    Same conventions as the global gate: snapshots are deterministic
    md5-parity halves of doc_id (portable-uniform convention); decile
    edges come from each source's REFERENCE-half (n_chars) dictionary
    via the exact cc*10 >= k*na integer rule; add-one smoothing
    ((c+1)/(n+10)) keeps empty-bin terms finite; every per-bin term is
    floored to an e9 integer BEFORE the per-source sum, so psi_e9 is an
    exact integer in both engines.

    The cumulative counts run as a window PARTITIONED BY source over
    the per-source length DICTIONARY — each partition is bounded by
    the n_chars value grid, never by row count (the stats_km_by_cohort
    convention), so no dist_rank machinery is needed. Bin assignment
    joins the 9-edge-per-source frame back by source equi-join
    (|sources| rows — Catalyst broadcasts it unhinted at any realistic
    source count).

    Scale: ONE documents pass builds the (source, snapshot, n_chars)
    dictionary (map-side combinable, saturating length grid),
    localCheckpointed so the per-source totals, the reference-half
    dictionary, and the binning all derive from it (the pre-round-10
    shape re-scanned documents per consumer — 5 scans in the fixed
    audit); then one dictionary-bounded partitioned window, one
    grid-sized edges join, one (source, bin) aggregation. Nothing
    data-sized crosses a single executor, and adding sources adds
    partitions, not skew.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    aggregation surface at all (internal/storage/types.go:3); this is
    [TARGET] data-quality machinery.
    """
    base = (
        load_table(spark, "documents", sf_dir)
        .select(
            "source",
            "n_chars",
            (
                F.expr(
                    "conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10)"
                )
                .cast("bigint")
                % 2
            ).alias("s"),
        )
        .groupBy("source", "s", "n_chars")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    tot = base.groupBy("source").agg(
        F.sum(F.when(F.col("s") == 0, F.col("c")).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("s") == 1, F.col("c")).otherwise(0))
        .cast("long")
        .alias("nb"),
    )
    dic = (
        base.where(F.col("s") == 0)
        .groupBy("source", "n_chars")
        .agg(F.sum("c").alias("c"))
    )
    w = (
        W.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = (
        dic.join(tot.select("source", "na"), "source")
        .withColumn("cc", F.sum("c").over(w))
    )
    edges = cum.groupBy("source").agg(
        *[
            F.min(
                F.when(F.col("cc") * 10 >= k * F.col("na"), F.col("n_chars"))
            ).alias(f"e{k}")
            for k in range(1, 10)
        ]
    )
    bin_col = F.lit(1)
    for k in range(1, 10):
        bin_col = bin_col + F.when(
            F.col("n_chars") > F.col(f"e{k}"), 1
        ).otherwise(0)
    binned = base.join(edges, "source").select(
        "source", "s", bin_col.alias("bin"), "c"
    )
    spine = tot.select("source").crossJoin(
        spark.range(1, 11).select(F.col("id").cast("int").alias("bin"))
    )
    counts = (
        spine.join(binned, ["source", "bin"], "left")
        .groupBy("source", "bin")
        .agg(
            F.coalesce(F.sum(F.when(F.col("s") == 0, F.col("c"))), F.lit(0))
            .cast("long")
            .alias("c_ref"),
            F.coalesce(F.sum(F.when(F.col("s") == 1, F.col("c"))), F.lit(0))
            .cast("long")
            .alias("c_cur"),
        )
    )
    joined = counts.join(tot, "source")
    pa = (F.col("c_ref") + 1.0) / (F.col("na") + 10)
    pb = (F.col("c_cur") + 1.0) / (F.col("nb") + 10)
    lr = F.log(
        ((F.col("c_ref") + 1.0) * (F.col("nb") + 10))
        / ((F.col("c_cur") + 1.0) * (F.col("na") + 10))
    )
    terms = joined.select(
        "source",
        "na",
        "nb",
        F.floor((pa - pb) * lr * 1e9 + 0.5001).cast("long").alias("term_e9"),
    )
    return terms.groupBy("source").agg(
        F.max("na").cast("long").alias("n_ref"),
        F.max("nb").cast("long").alias("n_cur"),
        F.sum("term_e9").cast("long").alias("psi_e9"),
    )


# ---------------------------------------------------------------------------
# Candidate-key discovery audit — round 9b.
# ---------------------------------------------------------------------------

CANDIDATE_KEYS_ORACLE = """
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderdate,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT o_orderkey) AS BIGINT) AS d1,
             CAST(count(DISTINCT (o_custkey, o_orderdate)) AS BIGINT) AS d2,
             CAST(count(DISTINCT o_orderdate) AS BIGINT) AS d3,
             CAST(count(DISTINCT (o_custkey, o_orderdate, cents)) AS BIGINT)
               AS d4
      FROM base
    ), pairs AS (
      SELECT 'o_orderkey' AS combo, n_rows, d1 AS n_distinct FROM agg
      UNION ALL
      SELECT 'o_custkey,o_orderdate', n_rows, d2 FROM agg
      UNION ALL
      SELECT 'o_orderdate', n_rows, d3 FROM agg
      UNION ALL
      SELECT 'o_custkey,o_orderdate,o_totalprice', n_rows, d4 FROM agg
    )
    SELECT combo, n_rows, n_distinct,
           n_rows - n_distinct AS dup_rows,
           CAST(n_distinct * 1000000 // n_rows AS BIGINT) AS uniqueness_e6,
           CAST(CASE WHEN n_distinct = n_rows THEN 1 ELSE 0 END AS BIGINT)
             AS is_key
    FROM pairs
"""


@query("quality_candidate_keys", oracle=CANDIDATE_KEYS_ORACLE)
def quality_candidate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery over orders: exact uniqueness of four
    column combinations (the declared key, two plausible natural keys,
    and a deliberately-coarse control) — the schema-inference audit a
    pipeline runs before it TRUSTS a merge key: quality_column_profile
    reports per-column cardinality, but dedup/MERGE correctness hangs
    on COMBINATION uniqueness, which only an exact multi-column
    distinct can certify (a 99.93%-unique "key" silently fans out a
    MERGE join).

    All four combination cardinalities come from ONE scan:
    multi-count-distinct compiles to Spark's Expand (4x row replication
    BEFORE partial aggregation, map-side combinable, shuffle bounded by
    the combined key dictionaries — never 4 scans, never a driver
    loop). The single stats row then unpivots via stack() to one row
    per combo; uniqueness is exact integer e6 fixed-point (DIV);
    o_totalprice participates as exact cents so float equality never
    decides distinctness.

    Scale: one scan + Expand; the per-combo dictionaries the partial
    aggregation shuffles are bounded by the true key cardinality (the
    thing being measured), and a 100 TB orders table shuffles its key
    dictionary for ANY exact-distinct answer — this is the minimal
    plan. No join, no window.

    Reference parity: the reference (j0shgrant/gotsdb) has no schema
    or audit surface (internal/storage/types.go:3); this is [TARGET]
    data-quality machinery.
    """
    base = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    # Multi-column combos count distinct STRUCTS, not bare column
    # tuples: Spark's countDistinct(a, b) drops any row where EITHER
    # column is NULL, while the DuckDB oracle's count(DISTINCT (a, b))
    # counts ROW tuples containing NULLs — a struct is never NULL even
    # when its fields are, so the struct form matches the oracle's
    # tuple semantics on nullable inputs (single-column distincts
    # already agree: both engines ignore NULL scalars).
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("o_orderkey").cast("long").alias("d1"),
        F.countDistinct(F.struct("o_custkey", "o_orderdate"))
        .cast("long")
        .alias("d2"),
        F.countDistinct("o_orderdate").cast("long").alias("d3"),
        F.countDistinct(F.struct("o_custkey", "o_orderdate", "cents"))
        .cast("long")
        .alias("d4"),
    )
    pairs = agg.select(
        F.expr(
            "stack(4,"
            " 'o_orderkey', d1,"
            " 'o_custkey,o_orderdate', d2,"
            " 'o_orderdate', d3,"
            " 'o_custkey,o_orderdate,o_totalprice', d4)"
            " AS (combo, n_distinct)"
        ),
        "n_rows",
    )
    return pairs.select(
        "combo",
        "n_rows",
        "n_distinct",
        (F.col("n_rows") - F.col("n_distinct")).cast("long").alias("dup_rows"),
        F.expr("CAST(n_distinct * 1000000 DIV n_rows AS BIGINT)").alias(
            "uniqueness_e6"
        ),
        F.when(F.col("n_distinct") == F.col("n_rows"), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_key"),
    )


# ---------------------------------------------------------------------------
# Functional-dependency discovery audit — round 11.
# ---------------------------------------------------------------------------

# (label, table, lhs, rhs) — the candidate A -> B dependencies to audit.
_FD_CANDIDATES = [
    ("part: p_brand -> p_type", "part", "p_brand", "p_type"),
    ("part: p_type -> p_size", "part", "p_type", "p_size"),
    ("customer: c_nationkey -> c_mktsegment", "customer", "c_nationkey",
     "c_mktsegment"),
    ("orders: o_custkey -> o_orderpriority", "orders", "o_custkey",
     "o_orderpriority"),
    ("documents: source -> lang", "documents", "source", "lang"),
]

FD_VIOLATIONS_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{label}' AS fd,
           CAST(count(*) AS BIGINT) AS lhs_groups,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS violating_groups,
           CAST(max(nd) AS BIGINT) AS max_rhs_distinct,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS violation_rate_e6,
           CAST(CASE WHEN max(nd) = 1 THEN 1 ELSE 0 END AS BIGINT) AS holds
    FROM (
      SELECT {lhs}, count(DISTINCT {rhs}) AS nd
      FROM {table} GROUP BY {lhs}
    ) g_{i}
    """
    for i, (label, table, lhs, rhs) in enumerate(_FD_CANDIDATES)
) + "\nORDER BY fd"


@query("quality_fd_violations", oracle=FD_VIOLATIONS_ORACLE)
def quality_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery audit: for each candidate
    A -> B dependency, count the LHS groups whose B is not unique —
    the profiling complement to quality_candidate_keys (which asks
    "does this column set identify rows?"; this asks "does this column
    DETERMINE that one?"). Violated FDs are how denormalization drift,
    bad joins, and dirty dimension loads show up first, and discovered
    FDs are what a schema normalizer or a join-key recommender runs
    on.

    Semantics: a candidate holds iff every LHS group has exactly one
    distinct RHS value (NULL counts as a value via count(DISTINCT) in
    both engines identically); the audit reports the violating-group
    count, the worst group's RHS cardinality, and the e6 violation
    rate — all exact integers.

    Scale: each candidate is ONE map-side-combinable groupBy on its
    own table followed by a scalar aggregate — candidates over
    different tables plan as independent unioned subtrees (no joins,
    no windows); per-candidate cost is a dictionary shuffle bounded by
    the LHS cardinality.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    profiling surface (internal/storage/types.go:3); this is [TARGET]
    quality machinery.
    """
    parts = []
    for label, table, lhs, rhs in _FD_CANDIDATES:
        g = (
            load_table(spark, table, sf_dir)
            .groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("nd"))
        )
        parts.append(
            g.agg(
                F.count(F.lit(1)).cast("long").alias("lhs_groups"),
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                .cast("long")
                .alias("violating_groups"),
                F.max("nd").cast("long").alias("max_rhs_distinct"),
            ).select(
                F.lit(label).alias("fd"),
                "lhs_groups",
                "violating_groups",
                "max_rhs_distinct",
                F.expr(
                    "CAST(violating_groups * 1000000 DIV lhs_groups"
                    " AS BIGINT)"
                ).alias("violation_rate_e6"),
                F.when(F.col("max_rhs_distinct") == 1, 1)
                .otherwise(0)
                .cast("long")
                .alias("holds"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("fd")


# ---------------------------------------------------------------------------
# Join fan-out audit — round 11.
# ---------------------------------------------------------------------------

JOIN_FANOUT_ORACLE = """
    WITH fo AS (
      SELECT o.o_orderkey,
             CAST(count(l.l_orderkey) AS BIGINT) AS fanout
      FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey
    ), hist AS (
      SELECT fanout, CAST(count(*) AS BIGINT) AS n_orders
      FROM fo GROUP BY fanout
    ), tot AS (
      SELECT CAST(sum(n_orders) AS BIGINT) AS total_orders,
             CAST(sum(fanout * n_orders) AS BIGINT) AS total_join_rows
      FROM hist
    )
    SELECT h.fanout, h.n_orders,
           CAST(h.fanout * h.n_orders AS BIGINT) AS join_rows,
           CAST(h.n_orders * 1000000 // t.total_orders AS BIGINT)
             AS orders_share_e6,
           CAST(h.fanout * h.n_orders * 1000000
                // NULLIF(t.total_join_rows, 0) AS BIGINT)
             AS rows_share_e6
    FROM hist h CROSS JOIN tot t
    ORDER BY h.fanout
"""


@query("quality_join_fanout_audit", oracle=JOIN_FANOUT_ORACLE)
def quality_join_fanout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fan-out histogram of the orders -> lineitem foreign key: for
    each multiplicity f, how many orders have exactly f lineitems and
    what share of the JOIN OUTPUT those orders produce — the join-size
    profile a planner prices equi-joins with (sum f*n = exact join
    cardinality; the f = 0 bucket is the referential dead weight an
    inner join silently drops, complementing the FK-orphan audit
    which looks in the opposite direction).

    Exact integers: the per-key fanout is a LEFT-join count (NULL
    children count 0 in both engines via count(l_orderkey)); the
    histogram, join-row products, and both e6 shares are exact
    integer arithmetic.

    Scale: one shuffle of lineitem to the order-key dictionary (the
    left join plans as a sort-merge/shuffled-hash on the FK), one
    map-side-combinable histogram shuffle bounded by the multiplicity
    domain (1..7 in TPC-H shape), a 1-row total broadcast.

    Reference parity: the reference (j0shgrant/gotsdb) has no join
    surface (SURVEY.md §2.2); this is [TARGET] quality machinery.
    """
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    fo = (
        orders.join(
            lineitem.select("l_orderkey"),
            orders.o_orderkey == lineitem.l_orderkey,
            "left",
        )
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").cast("long").alias("fanout"))
    )
    hist = fo.groupBy("fanout").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    ).localCheckpoint(eager=False)
    tot = hist.agg(
        F.sum("n_orders").cast("long").alias("total_orders"),
        F.sum(F.col("fanout") * F.col("n_orders"))
        .cast("long")
        .alias("total_join_rows"),
    )
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "fanout",
            "n_orders",
            (F.col("fanout") * F.col("n_orders"))
            .cast("long")
            .alias("join_rows"),
            F.expr(
                "CAST(n_orders * 1000000 DIV total_orders AS BIGINT)"
            ).alias("orders_share_e6"),
            F.expr(
                "CAST(fanout * n_orders * 1000000"
                " DIV NULLIF(total_join_rows, 0) AS BIGINT)"
            ).alias("rows_share_e6"),
        )
        .orderBy("fanout")
    )
