"""Statistical-inference operators: two-sample KS distance, G-test
mutual information, distributed Poisson bootstrap CIs, a Benford
first-digit audit, and lagged cross-correlation between event series.

These are the distribution-level checks a training-data pipeline runs
between ingestion and training: "did this source's distribution shift?"
(KS), "are these two attributes dependent?" (G-test/MI), "how uncertain
is this aggregate?" (bootstrap), "do these amounts look fabricated?"
(Benford), "does one stream lead another?" (cross-correlation).

Scale design (shared by all five):
- Every statistic reduces to exact integer sufficient statistics via a
  single map-side-combinable groupBy before any floating point happens;
  transcendental functions (ln, sqrt) are applied exactly once per
  OUTPUT row on those exact integers, so summation order can never flip
  a digit and both engines round identically.
- Where a cumulative distribution is needed (KS), the window runs over
  the COMPACT distinct-value domain (the dictionary trick shared with
  stats_weighted_median_price), never over raw rows: the fact table is
  collapsed to (group, value, count) first, so the window input is
  bounded by the value domain (a price grid saturates long before
  100 TB) regardless of fact-table row count.
- The bootstrap is the Poisson/online-bootstrap construction (Chamandy
  et al., "Estimating Uncertainty for Massively Parallel Algorithms",
  Google 2012): each row's per-replicate multiplicity is a pure hash
  function of (row id, replicate), so resampling is one stateless map +
  one partial-aggregated shuffle whose size is groups x replicates —
  independent of input rows — and results are bit-reproducible across
  runs, engines, and retries (no RNG state anywhere).

Reference parity: the reference (j0shgrant/gotsdb) has no statistical
surface (SURVEY.md §2.2 — a 611-line KV store); this module extends the
mandated analytics block (SURVEY.md §2.3 rows 41/47) with the
inference-grade checks next to the point estimators already present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from gotsdb_spark.operators.registry import query
from gotsdb_spark.sources.registry import load_table

# ---------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov, exact integers end to end.
# ---------------------------------------------------------------------------


def ks_dnum_by_group(pts: DataFrame) -> DataFrame:
    """Exact group-vs-complement KS distances from a (prio, v) frame.

    Shared by the registered query and the property-based differential
    test (tests/test_property_inference.py), so the construction under
    test is the construction that ships. See stats_ks_priority_price
    for the numeric and scale rationale.

    ONE pass over the fact frame builds the (prio, v) dictionary
    (map-side combinable), localCheckpointed so the per-value totals
    and the priority domain derive from it instead of re-scanning the
    fact table (3 scans before the round-10 audit fix).
    """
    cnt = (
        pts.groupBy("prio", "v")
        .agg(F.count("*").alias("cin"))
        .localCheckpoint(eager=False)
    )
    tot = cnt.groupBy("v").agg(F.sum("cin").alias("ctot"))
    prios = cnt.select("prio").distinct()
    grid = (
        tot.crossJoin(F.broadcast(prios))
        .join(cnt, ["prio", "v"], "left")
        .select(
            "prio",
            "v",
            "ctot",
            F.coalesce(F.col("cin"), F.lit(0)).alias("cin"),
        )
    )
    wcum = W.partitionBy("prio").orderBy("v")
    wall = W.partitionBy("prio")
    cum = grid.select(
        "prio",
        F.sum("cin").over(wcum).alias("ccin"),
        F.sum(F.col("ctot") - F.col("cin")).over(wcum).alias("ccout"),
        F.sum("cin").over(wall).alias("n_in"),
        F.sum(F.col("ctot") - F.col("cin")).over(wall).alias("n_out"),
    )
    # The cross-multiplied numerator |ccin·n_out − ccout·n_in| is
    # bounded by n_in·n_out — ~1e13 already at single-digit scale
    # factors, so the ×1e6 step (and at ~3e9 rows/group the product
    # itself) overflows int64: Spark (non-ANSI) would wrap silently
    # while DuckDB raises — a silent cross-engine divergence. All
    # products therefore accumulate in DECIMAL(38,0) (the repo's
    # overflow convention, cf. sim_centroid_separation) on BOTH
    # engines; only the ≤1e6 quotient comes back to BIGINT.
    dec = "decimal(38,0)"
    d_num = F.abs(
        F.col("ccin").cast(dec) * F.col("n_out").cast(dec)
        - F.col("ccout").cast(dec) * F.col("n_in").cast(dec)
    )
    # d_num is REPORTED as BIGINT (DuckDB hands DECIMAL(38,0) to pandas
    # as float64, which would wreck the hash gate; the bound d_num ≤
    # n_in·n_out keeps it exact in int64 to ~3e9 rows per group) but
    # every intermediate product above lives in DECIMAL(38,0).
    agg = cum.groupBy("prio").agg(
        F.max("n_in").cast("bigint").alias("n_in"),
        F.max("n_out").cast("bigint").alias("n_out"),
        F.max(d_num).cast(dec).alias("d_num"),
    )
    # floor((d·1e6)/(n_in·n_out)) as two chained integral divides —
    # exact for positive integers and the divisor product never
    # materializes past DECIMAL(38,0).
    return agg.select(
        "prio",
        "n_in",
        "n_out",
        F.col("d_num").cast("bigint").alias("d_num"),
        F.expr(
            f"CAST(CAST(d_num * 1000000 AS {dec})"
            f" DIV CAST(n_in AS {dec}) DIV CAST(n_out AS {dec}) AS BIGINT)"
        ).alias("d_e6"),
    )


@query(
    "stats_ks_priority_price",
    oracle="""
    WITH pts AS (
      SELECT o_orderpriority AS prio,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS v
      FROM orders
    ), cnt AS (
      SELECT prio, v, count(*) AS cin FROM pts GROUP BY prio, v
    ), tot AS (
      SELECT v, count(*) AS ctot FROM pts GROUP BY v
    ), grid AS (
      SELECT p.prio, t.v, t.ctot, COALESCE(c.cin, 0) AS cin
      FROM (SELECT DISTINCT prio FROM pts) p
      CROSS JOIN tot t
      LEFT JOIN cnt c ON c.prio = p.prio AND c.v = t.v
    ), cum AS (
      SELECT prio,
             sum(cin)  OVER (PARTITION BY prio ORDER BY v) AS ccin,
             sum(ctot - cin) OVER (PARTITION BY prio ORDER BY v) AS ccout,
             sum(cin)  OVER (PARTITION BY prio) AS n_in,
             sum(ctot - cin) OVER (PARTITION BY prio) AS n_out
      FROM grid
    )
    SELECT prio,
           CAST(max(n_in) AS BIGINT)  AS n_in,
           CAST(max(n_out) AS BIGINT) AS n_out,
           CAST(max(abs(ccin * n_out - ccout * n_in)) AS BIGINT) AS d_num,
           CAST(max(abs(ccin * n_out - ccout * n_in)) * 1000000
                // max(n_in) // max(n_out) AS BIGINT) AS d_e6
    FROM cum
    GROUP BY prio
    """,
)
def stats_ks_priority_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS distance: each order priority's price
    distribution vs the complement (all other priorities).

    The KS statistic D = sup_v |F_in(v) - F_out(v)| is computed with NO
    floating point: both empirical CDFs are integer cumulative counts
    over the shared distinct-price domain, and the supremum is taken on
    the cross-multiplied integer |ccin*n_out - ccout*n_in| (the exact
    numerator of the CDF gap over the common denominator n_in*n_out).
    d_e6 is that exact rational floored to 1e-6 via BIGINT division —
    no engine-dependent rounding anywhere.

    Scale: the fact table collapses to (priority, price, count) and
    (price, count) via two map-side-combinable groupBys; the cumulative
    window then runs per priority over the compact price domain
    (dictionary trick — window input is bounded by the price grid, not
    by order count). The 5-row priority list is broadcast onto the
    domain. At 100 TB the domain saturates while counts grow, so the
    window input size is flat.
    """
    pts = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderpriority").alias("prio"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
    )
    return ks_dnum_by_group(pts)


# ---------------------------------------------------------------------------
# G-test / mutual information between two categoricals.
# ---------------------------------------------------------------------------


@query(
    "stats_mutual_info_type_daypart",
    oracle="""
    WITH cells AS (
      SELECT event_type,
             CAST(extract(hour FROM ts) AS BIGINT) // 6 AS daypart,
             count(*) AS o
      FROM events GROUP BY 1, 2
    ), marg AS (
      SELECT event_type, daypart, o,
             sum(o) OVER (PARTITION BY event_type) AS r,
             sum(o) OVER (PARTITION BY daypart)    AS c,
             sum(o) OVER ()                        AS n
      FROM cells
    ), contrib AS (
      SELECT n,
             CAST(floor(2.0 * o * ln((o * 1.0 * n) / (r * 1.0 * c))
                        * 1e6 + 0.5001) AS BIGINT) AS cell_g_e6,
             event_type, daypart
      FROM marg
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           CAST((count(DISTINCT event_type) - 1)
                * (count(DISTINCT daypart) - 1) AS BIGINT) AS dof,
           CAST(sum(cell_g_e6) AS BIGINT) AS g_e6,
           CAST(sum(cell_g_e6) // (2 * max(n)) AS BIGINT) AS mi_e6
    FROM contrib
    """,
)
def stats_mutual_info_type_daypart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test of independence (equivalently 2N·MI in nats) between
    event_type and 6-hour daypart — the leakage/dependence check run
    before treating two attributes as independent features.

    G = 2·Σ o·ln(oN/rc). Each cell's contribution is floored to an
    integer e6 FIRST (one ln per cell on exact integer counts — both
    engines evaluate the identical double expression once), then the
    integer contributions are summed, so the cross-engine result is
    independent of summation order. mi_e6 = g_e6/(2N) by exact BIGINT
    division.

    Scale: one map-side-combinable groupBy produces the contingency
    table (|types|×|dayparts| ≤ 20 cells at any data size); margins are
    window sums over those 20 rows. Everything after the first shuffle
    is O(cells), independent of event count.
    """
    ev = load_table(spark, "events", sf_dir)
    cells = (
        ev.select(
            "event_type",
            (F.hour("ts").cast("bigint") / 6).cast("bigint").alias("daypart"),
        )
        .groupBy("event_type", "daypart")
        .agg(F.count("*").alias("o"))
    )
    marg = cells.select(
        "event_type",
        "daypart",
        "o",
        F.sum("o").over(W.partitionBy("event_type")).alias("r"),
        F.sum("o").over(W.partitionBy("daypart")).alias("c"),
        F.sum("o").over(W.partitionBy()).alias("n"),
    )
    contrib = marg.select(
        "event_type",
        "daypart",
        "n",
        F.floor(
            2.0
            * F.col("o")
            * F.log((F.col("o") * 1.0 * F.col("n")) / (F.col("r") * 1.0 * F.col("c")))
            * 1e6
            + 0.5001
        )
        .cast("bigint")
        .alias("cell_g_e6"),
    )
    return contrib.agg(
        F.max("n").cast("bigint").alias("n"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("daypart") - 1)
        )
        .cast("bigint")
        .alias("dof"),
        F.sum("cell_g_e6").cast("bigint").alias("g_e6"),
        F.expr("CAST(sum(cell_g_e6) DIV (2 * max(n)) AS BIGINT)").alias("mi_e6"),
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence intervals (hash-deterministic).
# ---------------------------------------------------------------------------

# Poisson(1) inverse-CDF thresholds scaled to 16^7 = 268435456 (the
# range of a 7-hex-digit md5 prefix). Bucket b maps to the smallest k
# with b < threshold[k]; the ~8e-5 tail above k=6 truncates to 6 —
# identically in both engines, so determinism is unaffected and the
# resampling bias is negligible and shared.
_POIS_THRESHOLDS = [98751885, 197503771, 246879713, 263338361, 267453023, 268275955]
_N_REPS = 48  # replicates 1..48; replicate 0 is the point estimate


def _poisson_case_sql(bucket_expr: str) -> str:
    """CASE expression mapping a [0, 16^7) hash bucket to Poisson(1)."""
    whens = " ".join(
        f"WHEN {bucket_expr} < {t} THEN {k}"
        for k, t in enumerate(_POIS_THRESHOLDS)
    )
    return f"CASE {whens} ELSE 6 END"


def _pois_slice_sql(s: int, h_expr: str = "h") -> str:
    """Poisson(1) from hex chars [1+7s, 7+7s) of a 32-hex md5 column."""
    return _poisson_case_sql(
        f"CAST('0x' || substr({h_expr}, {1 + 7 * s}, 7) AS BIGINT)"
    )


def _bootstrap_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(segment, o_orderkey, cents) — the un-checkpointed orders ⋈
    customer projection the bootstrap resamples. Separate so plan tests
    can pin the join shape that the operator's shared checkpoint hides."""
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    return orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).select(
        F.col("c_mktsegment").alias("segment"),
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )


@query(
    "stats_bootstrap_ci_segment_price",
    oracle=f"""
    WITH base AS (
      SELECT c.c_mktsegment AS segment,
             o.o_orderkey,
             CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), expanded AS (
      SELECT segment, cents, b.blk,
             md5(CAST(o_orderkey AS VARCHAR) || ':' || CAST(b.blk AS VARCHAR))
               AS h
      FROM base CROSS JOIN (SELECT unnest(range(0, {_N_REPS // 4})) AS blk) b
    ), blocks AS (
      SELECT segment, blk,
             sum({_pois_slice_sql(0)}) AS sw0,
             sum({_pois_slice_sql(0)} * cents) AS swc0,
             sum({_pois_slice_sql(1)}) AS sw1,
             sum({_pois_slice_sql(1)} * cents) AS swc1,
             sum({_pois_slice_sql(2)}) AS sw2,
             sum({_pois_slice_sql(2)} * cents) AS swc2,
             sum({_pois_slice_sql(3)}) AS sw3,
             sum({_pois_slice_sql(3)} * cents) AS swc3
      FROM expanded GROUP BY segment, blk
    ), reps AS (
      SELECT segment, CAST(blk * 4 + sl.s + 1 AS BIGINT) AS rep,
             CAST(CASE sl.s WHEN 0 THEN sw0 WHEN 1 THEN sw1
                            WHEN 2 THEN sw2 ELSE sw3 END AS BIGINT) AS sw,
             CAST(CASE sl.s WHEN 0 THEN swc0 WHEN 1 THEN swc1
                            WHEN 2 THEN swc2 ELSE swc3 END AS BIGINT) AS swc
      FROM blocks CROSS JOIN (SELECT unnest(range(0, 4)) AS s) sl
      UNION ALL
      SELECT segment, 0 AS rep,
             CAST(count(*) AS BIGINT) AS sw,
             CAST(sum(cents) AS BIGINT) AS swc
      FROM base GROUP BY segment
    ), means AS (
      SELECT segment, rep, sw,
             swc // NULLIF(sw, 0) AS mean_c,
             CASE WHEN rep > 0 THEN
               row_number() OVER (
                 PARTITION BY segment, (rep > 0)
                 ORDER BY swc // NULLIF(sw, 0) NULLS LAST, rep)
             END AS rn
      FROM reps
    )
    SELECT segment,
           CAST(max(CASE WHEN rep = 0 THEN sw END) AS BIGINT) AS n_orders,
           CAST(max(CASE WHEN rep = 0 THEN mean_c END) AS BIGINT)
             AS mean_cents,
           CAST(max(CASE WHEN rn = 2 THEN mean_c END) AS BIGINT)
             AS lo_cents,
           CAST(max(CASE WHEN rn = {_N_REPS - 1} THEN mean_c END) AS BIGINT)
             AS hi_cents
    FROM means
    GROUP BY segment
    """,
)
def stats_bootstrap_ci_segment_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~95% Poisson-bootstrap CI for mean order price per market
    segment — the uncertainty quantification a pipeline attaches to any
    aggregate it reports.

    Classic row-resampling bootstrap is impossible at scale (it needs N
    draws per replicate from a global table). The Poisson bootstrap
    (Chamandy et al. 2012) replaces it: each row independently
    contributes Poisson(1) copies to each replicate, with the count a
    pure function of (row id, replicate) — NO RNG state, reproducible
    across engines, runs, partitionings and retries. One md5 per (row,
    block-of-4) supplies four independent 28-bit uniforms (hex slices
    of the same digest — the curate_mixture convention), so the corpus
    is hashed 12×, not 48×; hashing dominated the first-cut runtime
    (per-rep md5: 10.9s; block md5 + single-eval k columns: 4.5s, both
    min-of-runs at sf0.1).
    Replicate 0 is the plain unweighted aggregate (the point estimate)
    so estimate and CI come from one plan.

    Replicate means are exact BIGINT cents (floor division of two
    integer sums); the CI bounds are order statistics 2 and 47 of the
    48 replicate means, selected by row_number with a deterministic
    (mean, rep) tie-break — no float percentile interpolation to
    diverge between engines.

    Scale: the ×12 block expansion happens map-side and collapses
    immediately through a partial-aggregated groupBy(segment, blk) with
    8 sum columns — the shuffle carries |segments|×12 partial rows per
    map task, independent of order count; the 4-way slice melt runs on
    that already-aggregated frame. The customer join carries no hint:
    Catalyst/AQE broadcasts it while it fits and falls back to
    sort-merge when it doesn't (customer grows with the corpus, so a
    forced broadcast would be a 100 TB hard failure).
    At 100 TB this is the only bootstrap construction that works at all.
    """
    # One orders⋈customer pass shared by the ×12 block expansion AND
    # the rep-0 point estimate (the plan previously scanned + joined
    # twice, once per branch). The join lives in _bootstrap_base so the
    # plan test can pin its shape (broadcast dim, no cartesian) — the
    # checkpoint hides it from the registered query's final plan.
    base = _bootstrap_base(spark, sf_dir).localCheckpoint(eager=False)
    # The ×12 md5 expansion is the expensive map work; a single-row-group
    # fixture scans as ONE task, so without a fan-out every hash runs on
    # one core (guide §2.5 input parallelism). Integer sums downstream are
    # association-free, so the round-robin repartition cannot move the
    # result. (fan_out no-ops when the scan is already parallel.)
    from gotsdb_spark.sources.registry import fan_out

    expanded = fan_out(base).select(
        "segment",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_N_REPS // 4 - 1))).alias("blk"),
        "o_orderkey",
    ).select(
        "segment",
        "cents",
        "blk",
        F.md5(
            F.concat(
                F.col("o_orderkey").cast("string"),
                F.lit(":"),
                F.col("blk").cast("string"),
            )
        ).alias("h"),
    )

    def _pois_slice_spark(s: int) -> str:
        return _poisson_case_sql(
            f"CAST(conv(substring(h, {1 + 7 * s}, 7), 16, 10) AS BIGINT)"
        )

    # Materialize k0..k3 in one projection so each Poisson CASE (and its
    # conv/substring) evaluates once per row, not once per sum() that
    # references it.
    ks = expanded.select(
        "segment",
        "blk",
        "cents",
        *[F.expr(_pois_slice_spark(s)).alias(f"k{s}") for s in range(4)],
    )
    blocks = ks.groupBy("segment", "blk").agg(
        *[
            agg
            for s in range(4)
            for agg in (
                F.sum(F.col(f"k{s}")).alias(f"sw{s}"),
                F.sum(F.col(f"k{s}") * F.col("cents")).alias(f"swc{s}"),
            )
        ]
    )
    melted = blocks.select(
        "segment",
        "blk",
        F.expr(
            "stack(4, 0, sw0, swc0, 1, sw1, swc1, 2, sw2, swc2, 3, sw3, swc3)"
            " AS (s, sw, swc)"
        ),
    ).select(
        "segment",
        (F.col("blk") * 4 + F.col("s") + 1).cast("bigint").alias("rep"),
        F.col("sw").cast("bigint").alias("sw"),
        F.col("swc").cast("bigint").alias("swc"),
    )
    rep0 = (
        base.groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("sw"),
            F.sum("cents").cast("bigint").alias("swc"),
        )
        .select("segment", F.lit(0).cast("bigint").alias("rep"), "sw", "swc")
    )
    reps = melted.unionByName(rep0)
    means = reps.select(
        "segment",
        "rep",
        "sw",
        F.expr("swc DIV NULLIF(sw, 0)").alias("mean_c"),
    ).withColumn(
        "rn",
        F.when(
            F.col("rep") > 0,
            # asc_nulls_last: a zero-weight replicate (sw = 0 ⇒ NULL
            # mean) must sort AFTER real means on both engines — Spark
            # defaults NULLS FIRST ascending, DuckDB NULLS LAST, so an
            # explicit pin is the only cross-engine-stable choice.
            F.row_number().over(
                W.partitionBy("segment", F.col("rep") > 0).orderBy(
                    F.asc_nulls_last("mean_c"), "rep"
                )
            ),
        ),
    )
    return means.groupBy("segment").agg(
        F.max(F.when(F.col("rep") == 0, F.col("sw")))
        .cast("bigint")
        .alias("n_orders"),
        F.max(F.when(F.col("rep") == 0, F.col("mean_c")))
        .cast("bigint")
        .alias("mean_cents"),
        F.max(F.when(F.col("rn") == 2, F.col("mean_c")))
        .cast("bigint")
        .alias("lo_cents"),
        F.max(F.when(F.col("rn") == _N_REPS - 1, F.col("mean_c")))
        .cast("bigint")
        .alias("hi_cents"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit.
# ---------------------------------------------------------------------------

# floor(log10(1 + 1/d) * 1e6 + 0.5001), precomputed so both engines
# compare the same integer constants (no per-engine log10 at all).
_BENFORD_E6 = {
    1: 301030,
    2: 176091,
    3: 124939,
    4: 96910,
    5: 79181,
    6: 66947,
    7: 57992,
    8: 51153,
    9: 45757,
}


def _benford_case_sql(digit_expr: str) -> str:
    whens = " ".join(
        f"WHEN {digit_expr} = {d} THEN {e6}" for d, e6 in _BENFORD_E6.items()
    )
    return f"CASE {whens} END"


@query(
    "quality_benford_price_audit",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders
    ), obs AS (
      SELECT digit, count(*) AS n_obs FROM digits GROUP BY digit
    )
    SELECT digit,
           CAST(n_obs AS BIGINT) AS n_obs,
           CAST(n_obs * 1000000 // (sum(n_obs) OVER ()) AS BIGINT)
             AS obs_freq_e6,
           CAST({_benford_case_sql("digit")} AS BIGINT) AS benford_e6,
           CAST(n_obs * 1000000 // (sum(n_obs) OVER ())
                - {_benford_case_sql("digit")} AS BIGINT) AS dev_e6
    FROM obs
    """,
)
def quality_benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of order prices —
    the classic fabricated-data / unit-mixing detector for numeric
    columns arriving from external producers.

    Observed digit frequencies are exact integer counts; the observed
    share and its deviation from the Benford expectation are exact
    BIGINT divisions against PRECOMPUTED integer constants (log10
    evaluated once at module load, embedded as literals), so neither
    engine computes a logarithm at query time and the comparison is
    bit-exact by construction.

    Scale: a pure map (leading digit of integer cents) into a 9-row
    map-side-combinable groupBy; the window margin runs over 9 rows.
    Shuffle carries ≤ 9 rows per map task at any data size.
    """
    digits = load_table(spark, "orders", sf_dir).select(
        F.substring(
            F.floor(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count("*").alias("n_obs"))
    benford = F.expr(_benford_case_sql("digit")).cast("bigint")
    return obs.select(
        "digit",
        F.col("n_obs").cast("bigint").alias("n_obs"),
        F.expr("CAST(n_obs * 1000000 DIV (sum(n_obs) OVER ()) AS BIGINT)").alias(
            "obs_freq_e6"
        ),
        benford.alias("benford_e6"),
        (
            F.expr("n_obs * 1000000 DIV (sum(n_obs) OVER ())") - benford
        )
        .cast("bigint")
        .alias("dev_e6"),
    )


# ---------------------------------------------------------------------------
# Lagged cross-correlation between two event streams.
# ---------------------------------------------------------------------------


@query(
    "ts_cross_correlation_types",
    oracle="""
    WITH hourly AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events
      WHERE event_type IN ('click', 'purchase')
      GROUP BY 1
    ), bounds AS (
      SELECT min(h) AS h0, max(h) AS h1 FROM hourly
    ), grid AS (
      SELECT g.h, COALESCE(hr.x, 0) AS x, COALESCE(hr.y, 0) AS y
      FROM (SELECT unnest(range(h0, h1 + 1)) AS h FROM bounds) g
      LEFT JOIN hourly hr ON hr.h = g.h
    ), pairs AS (
      SELECT l.lag, a.x, b.y
      FROM (SELECT unnest(range(0, 7)) AS lag) l
      JOIN grid a ON TRUE
      JOIN grid b ON b.h = a.h + l.lag
    ), suff AS (
      SELECT lag, count(*) AS n,
             CAST(sum(x) AS BIGINT)     AS sx,
             CAST(sum(y) AS BIGINT)     AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY lag
    )
    SELECT lag, CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS BIGINT) AS num,
           CAST(n * sxx - sx * sx AS BIGINT) AS denx,
           CAST(n * syy - sy * sy AS BIGINT) AS deny,
           CAST(floor((n * 1.0 * sxy - sx * 1.0 * sy)
                      / sqrt((n * 1.0 * sxx - sx * 1.0 * sx)
                             * (n * 1.0 * syy - sy * 1.0 * sy))
                      * 1e6 + 0.5001) AS BIGINT) AS corr_e6
    FROM suff
    ORDER BY lag
    """,
)
def ts_cross_correlation_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson cross-correlation of hourly 'click' vs 'purchase'
    volumes at lags 0..6 h — "does one stream lead the other, and by
    how much?", the lead-lag scan behind forecasting-feature selection.

    For each lag the correlation reduces to six exact integer
    sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) over the aligned
    hour pairs; the single sqrt/divide happens once per output row on
    those integers (same double expression in both engines), with the
    exact integer numerator/denominators emitted alongside so the float
    is auditable.

    Scale: raw events collapse to one row per hour via a map-side-
    combinable groupBy (720 rows/month regardless of event volume); the
    dense hour grid comes from exploding sequence(min,max) off a 1-row
    bounds frame; lag alignment is an equi-join of the grid against
    itself on h+lag with the 7-row lag frame broadcast. Everything
    after the first shuffle is O(hours), not O(events) — and the
    hourly frame is localCheckpointed so bounds, the grid fill, and
    both join sides share ONE events pass (4 scans before the
    round-10 audit fix).
    """
    ev = load_table(spark, "events", sf_dir)
    hourly = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .select(
            F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("h"),
            "event_type",
        )
        .groupBy("h")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("y"),
        )
        .localCheckpoint(eager=False)
    )
    bounds = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        bounds.select(F.explode(F.sequence("h0", "h1")).alias("h"))
        .join(hourly, "h", "left")
        .select(
            "h",
            F.coalesce("x", F.lit(0)).alias("x"),
            F.coalesce("y", F.lit(0)).alias("y"),
        )
    )
    lags = spark.range(0, 7).select(F.col("id").cast("bigint").alias("lag"))
    a = grid.select(F.col("h").alias("ah"), "x")
    b = grid.select(F.col("h").alias("bh"), "y")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .withColumn("bh", F.col("ah") + F.col("lag"))
        .join(b, "bh")
    )
    suff = pairs.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    return suff.select(
        "lag",
        F.col("n").cast("bigint").alias("n"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("bigint")
        .alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("bigint")
        .alias("denx"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("bigint")
        .alias("deny"),
        F.floor(
            (F.col("n") * 1.0 * F.col("sxy") - F.col("sx") * 1.0 * F.col("sy"))
            / F.sqrt(
                (F.col("n") * 1.0 * F.col("sxx") - F.col("sx") * 1.0 * F.col("sx"))
                * (F.col("n") * 1.0 * F.col("syy") - F.col("sy") * 1.0 * F.col("sy"))
            )
            * 1e6
            + 0.5001
        )
        .cast("bigint")
        .alias("corr_e6"),
    ).orderBy("lag")


# ---------------------------------------------------------------------------
# Autocorrelation function (self lead-lag per series) — round 6.
# ---------------------------------------------------------------------------

ACF_ORACLE = """
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2025-01-01', CAST(ts AS DATE)) AS x,
             CAST(sum(CAST(floor(value * 1000) AS BIGINT)) // count(*)
                  AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT a.event_type, l.lag, a.y AS ya, b.y AS yb
      FROM (SELECT unnest(range(1, 8)) AS lag) l
      JOIN daily a ON TRUE
      JOIN daily b ON b.event_type = a.event_type AND b.x = a.x + l.lag
    ), suff AS (
      SELECT event_type, lag, count(*) AS n,
             CAST(sum(ya) AS BIGINT)      AS sa,
             CAST(sum(yb) AS BIGINT)      AS sb,
             CAST(sum(ya * yb) AS BIGINT) AS sab,
             CAST(sum(ya * ya) AS BIGINT) AS saa,
             CAST(sum(yb * yb) AS BIGINT) AS sbb
      FROM pairs GROUP BY event_type, lag
    )
    SELECT event_type, CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_pairs,
           CAST(floor((n * 1.0 * sab - sa * 1.0 * sb)
                      / sqrt((n * 1.0 * saa - sa * 1.0 * sa)
                             * (n * 1.0 * sbb - sb * 1.0 * sb))
                      * 1e6 + 0.5001) AS BIGINT) AS acf_e6
    FROM suff
"""


@query("ts_autocorrelation_daily", oracle=ACF_ORACLE)
def ts_autocorrelation_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of each event type's daily mean series
    at lags 1..7 days — the seasonality detector that says WHICH lag a
    forecaster should model (a weekly cycle shows as a spike at lag 7).
    Self-correlation per series; the lead-lag scan BETWEEN two series
    is ts_cross_correlation_types.

    Per (type, lag) the correlation reduces to six exact integer
    sufficient statistics over the lag-aligned day pairs; one
    sqrt/divide per output row on exact integers (identical double
    expression in both engines), e6-floored with the ulp nudge.

    Scale: events collapse to one row per (type, day) via a map-side-
    combinable groupBy — everything after the first shuffle is
    O(days × 7) per type, regardless of event volume; the 7-row lag
    frame is a broadcast.
    """
    daily = (
        load_table(spark, "events", sf_dir)
        .select(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2025-01-01").cast("date")
            ).alias("x"),
            F.floor(F.col("value") * 1000).cast("bigint").alias("v_e3"),
        )
        .groupBy("event_type", "x")
        .agg(F.expr("CAST(sum(v_e3) DIV count(*) AS BIGINT)").alias("y"))
    )
    lags = load_table(spark, "events", sf_dir).sparkSession.range(1, 8).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.select("event_type", "x", F.col("y").alias("ya"))
    b = daily.select(
        F.col("event_type").alias("et_b"), F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("event_type") == F.col("et_b"))
            & (F.col("xb") == F.col("x") + F.col("lag")),
        )
    )
    ya, yb = F.col("ya"), F.col("yb")
    suff = pairs.groupBy("event_type", "lag").agg(
        F.count("*").alias("n"),
        F.sum(ya).cast("long").alias("sa"),
        F.sum(yb).cast("long").alias("sb"),
        F.sum(ya * yb).cast("long").alias("sab"),
        F.sum(ya * ya).cast("long").alias("saa"),
        F.sum(yb * yb).cast("long").alias("sbb"),
    )
    return suff.select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("long").alias("n_pairs"),
        F.expr(
            "CAST(floor((n * 1.0 * sab - sa * 1.0 * sb)"
            " / sqrt((n * 1.0 * saa - sa * 1.0 * sa)"
            "        * (n * 1.0 * sbb - sb * 1.0 * sb))"
            " * 1e6 + 0.5001) AS BIGINT)"
        ).alias("acf_e6"),
    )


# ---------------------------------------------------------------------------
# Association strength: Cramér's V + Theil's U — round 6.
# ---------------------------------------------------------------------------

ASSOCIATION_ORACLE = """
    WITH cells AS (
      SELECT l_returnflag AS f, l_linestatus AS s, count(*) AS c
      FROM lineitem GROUP BY 1, 2
    ), mf AS (
      SELECT f, CAST(sum(c) AS BIGINT) AS cf FROM cells GROUP BY f
    ), ms AS (
      SELECT s, CAST(sum(c) AS BIGINT) AS cs FROM cells GROUP BY s
    ), g AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(count(DISTINCT f) AS BIGINT) AS nf,
             CAST(count(DISTINCT s) AS BIGINT) AS ns
      FROM cells
    ), chi AS (
      SELECT CAST(sum(CAST(floor(
               (c - cf * 1.0 * cs / n) * (c - cf * 1.0 * cs / n)
               / (cf * 1.0 * cs / n) * 1e6 + 0.5001) AS BIGINT)) AS BIGINT)
               AS chi2_e6
      FROM cells JOIN mf USING (f) JOIN ms USING (s) CROSS JOIN g
    ), hx AS (
      SELECT CAST(sum(CAST(floor(-(cf * 1.0 / n) * ln(cf * 1.0 / n) * 1e9
                                 + 0.5001) AS BIGINT)) AS BIGINT) AS hx_e9
      FROM mf CROSS JOIN g
    ), hxy AS (
      SELECT CAST(sum(CAST(floor(-(c * 1.0 / n) * ln(c * 1.0 / cs) * 1e9
                                 + 0.5001) AS BIGINT)) AS BIGINT) AS hxy_e9
      FROM cells JOIN ms USING (s) CROSS JOIN g
    )
    SELECT g.n,
           chi.chi2_e6,
           CAST(floor(sqrt((chi.chi2_e6 / 1e6)
                           / (g.n * (least(g.nf, g.ns) - 1))) * 1e6 + 0.5001)
                AS BIGINT) AS cramers_v_e6,
           CAST((hx.hx_e9 - hxy.hxy_e9) * 1000000 // hx.hx_e9 AS BIGINT)
             AS theils_u_e6
    FROM g CROSS JOIN chi CROSS JOIN hx CROSS JOIN hxy
"""


@query("stats_association_strength", oracle=ASSOCIATION_ORACLE)
def stats_association_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized categorical association: Cramér's V (symmetric,
    χ²-based, 0..1) and Theil's U for returnflag given linestatus
    (asymmetric, entropy-based) — the effect-size layer on top of the
    raw test statistics (stats_chi_square_priority_flag says WHETHER
    two categoricals are dependent; these say HOW MUCH, on a scale a
    feature-selection threshold can act on — χ² grows with n even for
    negligible dependence).

    One map-side-combinable groupBy builds the contingency cells;
    every margin, entropy term, and χ² contribution is evaluated once
    on exact integer counts and floored to an e6/e9 integer BEFORE its
    sum, so cross-engine float order cannot flip a digit. V's sqrt and
    U's integer ratio happen once on those integer sums. Everything
    past the first shuffle is O(|flag|×|status|) cells — and the cell
    table is localCheckpointed so the five consumers (both margins,
    the grand totals, χ², H(X|Y)) share ONE lineitem pass instead of
    re-deriving the groupBy per reference (the fixed round-10 scan
    audit showed 10 lineitem scans here; at 100 TB that is 10× the IO
    of the single pass the math needs).
    """
    li = load_table(spark, "lineitem", sf_dir)
    cells = (
        li.groupBy(
            F.col("l_returnflag").alias("f"), F.col("l_linestatus").alias("s")
        )
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    mf = cells.groupBy("f").agg(F.sum("c").cast("long").alias("cf"))
    ms = cells.groupBy("s").agg(F.sum("c").cast("long").alias("cs"))
    g = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.countDistinct("f").cast("long").alias("nf"),
        F.countDistinct("s").cast("long").alias("ns"),
    )
    joined = cells.join(mf, "f").join(ms, "s").crossJoin(F.broadcast(g))
    expected = F.col("cf") * 1.0 * F.col("cs") / F.col("n")
    chi = joined.agg(
        F.sum(
            F.floor(
                (F.col("c") - expected) * (F.col("c") - expected) / expected * 1e6
                + 0.5001
            ).cast("long")
        )
        .cast("long")
        .alias("chi2_e6")
    )
    hx = mf.crossJoin(F.broadcast(g)).agg(
        F.sum(
            F.floor(
                -(F.col("cf") * 1.0 / F.col("n"))
                * F.log(F.col("cf") * 1.0 / F.col("n"))
                * 1e9
                + 0.5001
            ).cast("long")
        )
        .cast("long")
        .alias("hx_e9")
    )
    hxy = cells.join(ms, "s").crossJoin(F.broadcast(g)).agg(
        F.sum(
            F.floor(
                -(F.col("c") * 1.0 / F.col("n"))
                * F.log(F.col("c") * 1.0 / F.col("cs"))
                * 1e9
                + 0.5001
            ).cast("long")
        )
        .cast("long")
        .alias("hxy_e9")
    )
    return (
        g.crossJoin(F.broadcast(chi))
        .crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hxy))
        .select(
            "n",
            "chi2_e6",
            F.expr(
                "CAST(floor(sqrt((chi2_e6 / 1e6)"
                " / (n * (least(nf, ns) - 1))) * 1e6 + 0.5001) AS BIGINT)"
            ).alias("cramers_v_e6"),
            F.expr(
                "CAST((hx_e9 - hxy_e9) * 1000000 DIV hx_e9 AS BIGINT)"
            ).alias("theils_u_e6"),
        )
    )


# ---------------------------------------------------------------------------
# Information gain of candidate features — round 7.
# ---------------------------------------------------------------------------

INFOGAIN_ORACLE = """
    WITH tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM documents
    ), dic AS (
      SELECT n_chars, count(*) AS c FROM documents GROUP BY n_chars
    ), cum AS (
      SELECT n_chars, sum(c) OVER (ORDER BY n_chars) AS cc,
             (SELECT n FROM tot) AS n
      FROM dic
    ), edges AS (
      SELECT min(CASE WHEN cc * 10 >= 1 * n THEN n_chars END) AS e1,
             min(CASE WHEN cc * 10 >= 2 * n THEN n_chars END) AS e2,
             min(CASE WHEN cc * 10 >= 3 * n THEN n_chars END) AS e3,
             min(CASE WHEN cc * 10 >= 4 * n THEN n_chars END) AS e4,
             min(CASE WHEN cc * 10 >= 5 * n THEN n_chars END) AS e5,
             min(CASE WHEN cc * 10 >= 6 * n THEN n_chars END) AS e6,
             min(CASE WHEN cc * 10 >= 7 * n THEN n_chars END) AS e7,
             min(CASE WHEN cc * 10 >= 8 * n THEN n_chars END) AS e8,
             min(CASE WHEN cc * 10 >= 9 * n THEN n_chars END) AS e9
      FROM cum
    ), feat AS (
      SELECT 'source' AS feature, source AS x, lang FROM documents
      UNION ALL
      SELECT 'length_decile',
             CAST(1 + (CASE WHEN n_chars > e1 THEN 1 ELSE 0 END)
                    + (CASE WHEN n_chars > e2 THEN 1 ELSE 0 END)
                    + (CASE WHEN n_chars > e3 THEN 1 ELSE 0 END)
                    + (CASE WHEN n_chars > e4 THEN 1 ELSE 0 END)
                    + (CASE WHEN n_chars > e5 THEN 1 ELSE 0 END)
                    + (CASE WHEN n_chars > e6 THEN 1 ELSE 0 END)
                    + (CASE WHEN n_chars > e7 THEN 1 ELSE 0 END)
                    + (CASE WHEN n_chars > e8 THEN 1 ELSE 0 END)
                    + (CASE WHEN n_chars > e9 THEN 1 ELSE 0 END) AS VARCHAR),
             lang
      FROM documents CROSS JOIN edges
    ), cells AS (
      SELECT feature, x, lang, CAST(count(*) AS BIGINT) AS cxl
      FROM feat GROUP BY feature, x, lang
    ), margx AS (
      SELECT feature, x, CAST(sum(cxl) AS BIGINT) AS cx
      FROM cells GROUP BY feature, x
    ), hcond AS (
      SELECT c.feature,
             CAST(sum(CAST(floor(-(c.cxl * 1.0 / tot.n)
                                 * ln(c.cxl * 1.0 / m.cx)
                                 * 1e9 + 0.5001) AS BIGINT)) AS BIGINT)
               AS h_cond_e9
      FROM cells c
      JOIN margx m ON c.feature = m.feature AND c.x = m.x
      CROSS JOIN tot
      GROUP BY c.feature
    ), hlang AS (
      SELECT CAST(sum(CAST(floor(-(cl * 1.0 / n) * ln(cl * 1.0 / n)
                                 * 1e9 + 0.5001) AS BIGINT)) AS BIGINT)
               AS h_lang_e9
      FROM (SELECT lang, CAST(count(*) AS BIGINT) AS cl,
                   (SELECT n FROM tot) AS n
            FROM documents GROUP BY lang)
    )
    SELECT feature, hlang.h_lang_e9, hcond.h_cond_e9,
           CAST(hlang.h_lang_e9 - hcond.h_cond_e9 AS BIGINT) AS info_gain_e9
    FROM hcond CROSS JOIN hlang
"""


@query("stats_information_gain", oracle=INFOGAIN_ORACLE)
def stats_information_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information gain of candidate features for predicting `lang` —
    the feature-selection number (mutual information I(lang; X) =
    H(lang) − H(lang|X)) behind 'which metadata column is worth
    routing/stratifying on': compared here for `source` (categorical
    as-is) and the document-length DECILE (continuous feature
    discretized by the exact dictionary-quantile rule, the classic
    entropy-binning move).

    Exact-integer entropy convention (the G-test/association-strength
    family): every −p·ln(p) term is computed once per cell from exact
    integer counts and e9-floored BEFORE summation, so both engines
    accumulate identical integers regardless of cell order; the gain
    is then an exact integer difference. Decile edges come from the
    length dictionary via dist_rank (no global window); decile
    assignment is a broadcast 9-edge comparison.

    Scale: ONE documents pass builds the (source, lang, n_chars)
    base dictionary (map-side combinable; |sources|·|langs|·|distinct
    lengths| rows — tiny next to the corpus), which is
    localCheckpointed and feeds every downstream consumer: the grand
    total, the length dictionary for decile edges, both feature cell
    tables, and H(lang). Before round 10 each consumer re-scanned
    documents (9 scans in the plan audit); now everything past the
    single pass is dictionary-bounded. The same template extends to
    any feature audit — swap the x column.
    """
    from gotsdb_spark.operators.distrank import (
        decile_bin_col,
        dictionary_decile_edges,
    )

    docs = load_table(spark, "documents", sf_dir).select(
        "lang", "source", "n_chars"
    )
    base = (
        docs.groupBy("source", "lang", "n_chars")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    tot = base.agg(F.sum("c").cast("long").alias("n"))
    dic = base.groupBy("n_chars").agg(F.sum("c").alias("c"))
    edges = dictionary_decile_edges(dic, "n_chars", "c", tot, "n")
    bin_col = decile_bin_col("n_chars")
    cells = (
        base.groupBy(
            F.lit("source").alias("feature"),
            F.col("source").alias("x"),
            "lang",
        ).agg(F.sum("c").cast("long").alias("cxl"))
    ).unionByName(
        base.crossJoin(F.broadcast(edges))
        .groupBy(
            F.lit("length_decile").alias("feature"),
            bin_col.cast("string").alias("x"),
            "lang",
        )
        .agg(F.sum("c").cast("long").alias("cxl"))
    )
    margx = cells.groupBy("feature", "x").agg(
        F.sum("cxl").cast("long").alias("cx")
    )
    term = (
        F.floor(
            -(F.col("cxl") * 1.0 / F.col("n"))
            * F.log(F.col("cxl") * 1.0 / F.col("cx"))
            * 1e9
            + 0.5001
        )
    ).cast("long")
    hcond = (
        cells.join(margx, ["feature", "x"])
        .crossJoin(F.broadcast(tot))
        .groupBy("feature")
        .agg(F.sum(term).cast("long").alias("h_cond_e9"))
    )
    hlang = (
        base.groupBy("lang")
        .agg(F.sum("c").cast("long").alias("cl"))
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.floor(
                    -(F.col("cl") * 1.0 / F.col("n"))
                    * F.log(F.col("cl") * 1.0 / F.col("n"))
                    * 1e9
                    + 0.5001
                ).cast("long")
            )
            .cast("long")
            .alias("h_lang_e9")
        )
    )
    return hcond.crossJoin(F.broadcast(hlang)).select(
        "feature",
        "h_lang_e9",
        "h_cond_e9",
        (F.col("h_lang_e9") - F.col("h_cond_e9")).cast("long").alias(
            "info_gain_e9"
        ),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U rank-sum test — round 8.
# ---------------------------------------------------------------------------

MANN_WHITNEY_ORACLE = """
    WITH base AS (
      SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
             l_returnflag AS flag
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
    ), dic AS (
      SELECT cents,
             sum(CASE WHEN flag = 'A' THEN 1 ELSE 0 END) AS ca,
             count(*) AS c
      FROM base GROUP BY cents
    ), cum AS (
      SELECT cents, ca, c, sum(c) OVER (ORDER BY cents) AS cc FROM dic
    ), agg AS (
      SELECT CAST(sum(ca) AS BIGINT) AS n_a,
             CAST(sum(c - ca) AS BIGINT) AS n_r,
             CAST(sum(ca * (2 * cc - c + 1)) AS BIGINT) AS r_a_x2,
             sum(CAST(c AS HUGEINT) * c * c - c) AS tie3
      FROM cum
    )
    SELECT n_a, n_r,
           CAST(r_a_x2 - n_a * (n_a + 1) AS BIGINT) AS u_a_x2,
           CAST(tie3 // (n_a + n_r) AS BIGINT) AS tie_term_div_n,
           CAST((CAST(r_a_x2 AS HUGEINT) - CAST(n_a AS HUGEINT) * (n_a + 1))
                * 1000000
                // (2 * CAST(n_a AS HUGEINT) * n_r) AS BIGINT) AS auc_e6
    FROM agg
"""


@query("stats_mann_whitney_u", oracle=MANN_WHITNEY_ORACLE)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) comparing l_extendedprice
    between returnflag groups A and R — the NONPARAMETRIC two-sample
    location test: where the KS statistic (stats_ks_priority_price)
    asks "are these distributions different anywhere?", U asks the
    directional question "does one group stochastically dominate?",
    and U/(n_a*n_r) IS the common-language effect size / AUC — the
    probability a random A row exceeds a random R row.

    Exact integers end to end via the dictionary trick: the pooled
    price grid is compacted to (cents, c_A, c_total) first, and the
    tie-averaged midrank comes from cumulative counts over that
    dictionary — doubled (rank_x2 = 2*cc - c + 1) so half-ranks stay
    integral. The rank sum, U, the AUC e6-rational, and the tie
    correction term T = sum(t^3 - t) (reported as T div n — the
    numerator of the tie-adjusted variance, pre-divided so the output
    stays in int64 even in the all-tied worst case where T = n^3) are
    all exact integer arithmetic; T accumulates in DECIMAL(38,0) /
    HUGEINT for exactly that worst case.

    Scale: one map-side-combinable groupBy to the price dictionary
    (bounded by the cents grid, not row count), two linear dist_rank
    shuffles over it for the cumulative counts — never an
    unpartitioned row-level window — then a scalar aggregate.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    statistical surface (internal/storage/types.go:3); this is
    [TARGET] inference machinery.
    """
    from gotsdb_spark.operators.distrank import dist_rank

    base = (
        load_table(spark, "lineitem", sf_dir)
        .where(F.col("l_returnflag").isin("A", "R"))
        .select(
            F.floor(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("cents"),
            F.col("l_returnflag").alias("flag"),
        )
    )
    dic = base.groupBy("cents").agg(
        F.sum(F.when(F.col("flag") == "A", 1).otherwise(0)).alias("ca"),
        F.count(F.lit(1)).alias("c"),
    )
    ranked = dist_rank(
        dic, ["cents"], rank_col="__mw_rk", sum_cols={"cc": "c"}
    )
    agg = ranked.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum(F.col("c") - F.col("ca")).cast("long").alias("n_r"),
        F.sum(F.col("ca") * (2 * F.col("cc") - F.col("c") + 1))
        .cast("long")
        .alias("r_a_x2"),
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c") * F.col("c")
            - F.col("c")
        ).alias("tie3"),
    )
    return agg.select(
        "n_a",
        "n_r",
        F.expr("CAST(r_a_x2 - n_a * (n_a + 1) AS BIGINT)").alias("u_a_x2"),
        F.expr("CAST(tie3 DIV (n_a + n_r) AS BIGINT)").alias(
            "tie_term_div_n"
        ),
        F.expr(
            "CAST((CAST(r_a_x2 AS DECIMAL(38,0))"
            " - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1)) * 1000000"
            " DIV (2 * CAST(n_a AS DECIMAL(38,0)) * n_r) AS BIGINT)"
        ).alias("auc_e6"),
    )


# ---------------------------------------------------------------------------
# Two-proportion z-test on md5-parity experiment arms — round 8.
# ---------------------------------------------------------------------------

AB_ZTEST_ORACLE = """
    WITH units AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4)
                  AS BIGINT) % 2 AS arm,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), arms AS (
      SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b,
             CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
               AS conv_a,
             CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
               AS conv_b
      FROM units
    )
    SELECT n_a, n_b, conv_a, conv_b,
           CAST(conv_a * 1000000 // n_a AS BIGINT) AS p_a_e6,
           CAST(conv_b * 1000000 // n_b AS BIGINT) AS p_b_e6,
           CAST(CAST(conv_a * n_b - conv_b * n_a AS HUGEINT)
                * (conv_a * n_b - conv_b * n_a) * (n_a + n_b) * 1000000
                // NULLIF(CAST(n_a AS HUGEINT) * n_b * (conv_a + conv_b)
                          * (n_a + n_b - conv_a - conv_b), 0) AS BIGINT)
             AS z2_e6
    FROM arms
"""


@query("stats_ab_conversion_ztest", oracle=AB_ZTEST_ORACLE)
def stats_ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test of user-level purchase conversion between
    deterministic md5-parity experiment arms — THE experimentation
    primitive: every A/B readout reduces to "is conv_a/n_a vs
    conv_b/n_b explainable by chance?". Reported as z^2 (one-df
    chi-square) in exact integer arithmetic:

      z^2 = (conv_a*n_b - conv_b*n_a)^2 * N / (n_a*n_b*c*(N-c)),

    the cross-multiplied form with N = n_a+n_b and c = total
    conversions, so no floating-point division touches the statistic
    before the final e6 rational (exact DECIMAL(38,0)/HUGEINT integer
    division; the squared cross term alone reaches ~1e19 at sf1 —
    past int64 — which is why the accumulator is wide). NULLIF guards
    the degenerate all-convert/none-convert corpus. The md5-parity
    arm assignment is the repo's portable-uniform convention
    (quality_snapshot_psi): both engines hash the identical string, so
    the split is bit-identical and needs no stored assignment column.

    Unit of analysis is the USER-DAY (events collapse to one row per
    (user, day) first — "did this user purchase today?"), while the
    RANDOMIZATION unit stays the user: every day of a user's history
    lands in the same arm, as a real experiment would assign. The z^2
    reported is the naive pooled form; a production readout on this
    design would additionally widen it for within-user day correlation
    (cluster-robust / delta-method variance) — the statistic here is
    the exact deterministic numerator that correction starts from.
    (Plain per-user conversion is degenerate on this corpus — every
    user purchases eventually — which is itself the classic lesson:
    pick a unit whose base rate leaves room to move.)

    Scale: one groupBy to per-user rows (map-side combinable), one
    4-cell scalar aggregate. z^2 vs the mutual-information G-test
    (stats_mutual_information): same 2x2 table family, but this is the
    directional two-sample form experiments actually report.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    statistical surface (internal/storage/types.go:3); this is
    [TARGET] experimentation machinery.
    """
    units = (
        load_table(spark, "events", sf_dir)
        .groupBy("user_id", F.col("ts").cast("date").alias("d"))
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
        .select(
            (
                F.expr(
                    "conv(substring(md5(CAST(user_id AS STRING)), 1, 4),"
                    " 16, 10)"
                ).cast("bigint")
                % 2
            ).alias("arm"),
            "conv",
        )
    )
    arms = units.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    return arms.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.expr("CAST(conv_a * 1000000 DIV n_a AS BIGINT)").alias("p_a_e6"),
        F.expr("CAST(conv_b * 1000000 DIV n_b AS BIGINT)").alias("p_b_e6"),
        F.expr(
            "CAST(CAST(conv_a * n_b - conv_b * n_a AS DECIMAL(38,0))"
            " * (conv_a * n_b - conv_b * n_a) * (n_a + n_b) * 1000000"
            " DIV NULLIF(CAST(n_a AS DECIMAL(38,0)) * n_b"
            " * (conv_a + conv_b)"
            " * (n_a + n_b - conv_a - conv_b), 0) AS BIGINT)"
        ).alias("z2_e6"),
    )


# ---------------------------------------------------------------------------
# Kendall tau-b rank correlation (contingency-grid form) — round 8b.
# ---------------------------------------------------------------------------

@query(
    "stats_kendall_tau_b",
    oracle="""
    WITH base AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d
      FROM lineitem
    ), cells AS (
      SELECT q, d, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY q, d
    ), pairs AS (
      SELECT CAST(sum(CASE WHEN a.d < b.d
                  THEN CAST(a.c AS HUGEINT) * b.c END) AS HUGEINT) AS conc,
             CAST(sum(CASE WHEN a.d > b.d
                  THEN CAST(a.c AS HUGEINT) * b.c END) AS HUGEINT) AS disc
      FROM cells a JOIN cells b ON a.q < b.q
    ), xm AS (
      SELECT sum(CAST(tx AS HUGEINT) * (tx - 1)) AS n1_x2
      FROM (SELECT q, sum(c) AS tx FROM cells GROUP BY q)
    ), ym AS (
      SELECT sum(CAST(ty AS HUGEINT) * (ty - 1)) AS n2_x2
      FROM (SELECT d, sum(c) AS ty FROM cells GROUP BY d)
    ), tot AS (
      SELECT CAST(sum(c) AS HUGEINT) AS n FROM cells
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(conc AS BIGINT) AS conc_pairs,
           CAST(disc AS BIGINT) AS disc_pairs,
           CAST(floor(CAST(conc - disc AS DOUBLE)
                      / sqrt(CAST(n * (n - 1) - n1_x2 AS DOUBLE) / 2.0)
                      / sqrt(CAST(n * (n - 1) - n2_x2 AS DOUBLE) / 2.0)
                      * 1e9 + 0.5001) AS BIGINT) AS tau_b_e9
    FROM pairs CROSS JOIN xm CROSS JOIN ym CROSS JOIN tot
""",
)
def stats_kendall_tau_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between l_quantity and l_discount — the third
    rank-correlation of the family (Pearson: stats_correlation_matrix;
    Spearman: stats_spearman_corr): the probability-scaled excess of
    concordant over discordant pairs, with the tie-corrected -b
    denominator that both variables' coarse grids (quantity 1..50,
    discount 0..10 in e2 cents) make mandatory — plain tau-a on this
    data would be biased toward 0 by the ~n^2/50 tied pairs.

    The naive estimator is O(n^2) over ROWS; this is the
    contingency-GRID form, the tie-exact sub-quadratic shape the
    round-7 backlog asked for: collapse rows to the (quantity,
    discount) cell table first (<= 50 x 11 = 550 cells REGARDLESS of
    row count — the grid saturates, rows don't), then

      conc = sum over cell pairs (a.q < b.q, a.d < b.d) of c_a*c_b
      disc = sum over cell pairs (a.q < b.q, a.d > b.d) of c_a*c_b

    by a self-join of the 550-row cell table — a deliberate
    grid-bounded broadcast theta-join (the sim_knn_classify
    convention: the quadratic factor is over a VALUE GRID with a hard
    cap, never over data). Tie terms n1 = sum tx(tx-1)/2 and
    n2 = sum ty(ty-1)/2 come from the marginals (kept doubled so they
    stay integral); all pair counts accumulate in DECIMAL(38,0) /
    HUGEINT because conc alone is ~n^2/4 (1e13 at sf1, past int64 by
    sf30). The single floating-point expression
    (conc-disc)/sqrt(n0-n1)/sqrt(n0-n2) is evaluated once on exact
    integers with an identical operation sequence in both engines,
    then floored to the e9 grid (the stats_spearman_corr convention).

    Scale: one map-side-combinable groupBy to the grid, two tiny
    marginal groupBys, one broadcast self-join of a <=550-row table,
    one scalar aggregate. The grid is localCheckpointed so its five
    consumers (both self-join sides, both marginals, the total) share
    ONE lineitem pass — the fixed round-10 scan audit caught the
    un-checkpointed version re-scanning lineitem 5×. Nothing
    downstream of the first groupBy is row-count-sized.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    statistical surface (internal/storage/types.go:3); this is
    [TARGET] inference machinery.
    """
    base = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_quantity").cast("bigint").alias("q"),
        F.floor(F.col("l_discount") * 100 + 0.5).cast("bigint").alias("d"),
    )
    cells = (
        base.groupBy("q", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    a = cells.select(
        F.col("q").alias("qa"), F.col("d").alias("da"), F.col("c").alias("ca")
    )
    b = cells.select(
        F.col("q").alias("qb"), F.col("d").alias("db"), F.col("c").alias("cb")
    )
    dec = "decimal(38,0)"
    pairs = a.join(F.broadcast(b), F.col("qa") < F.col("qb")).agg(
        F.sum(
            F.when(
                F.col("da") < F.col("db"),
                F.col("ca").cast(dec) * F.col("cb"),
            )
        ).alias("conc"),
        F.sum(
            F.when(
                F.col("da") > F.col("db"),
                F.col("ca").cast(dec) * F.col("cb"),
            )
        ).alias("disc"),
    )
    xm = (
        cells.groupBy("q")
        .agg(F.sum("c").alias("tx"))
        .agg(F.sum(F.col("tx").cast(dec) * (F.col("tx") - 1)).alias("n1_x2"))
    )
    ym = (
        cells.groupBy("d")
        .agg(F.sum("c").alias("ty"))
        .agg(F.sum(F.col("ty").cast(dec) * (F.col("ty") - 1)).alias("n2_x2"))
    )
    tot = cells.agg(F.sum("c").cast(dec).alias("n"))
    return (
        pairs.crossJoin(F.broadcast(xm))
        .crossJoin(F.broadcast(ym))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("conc").cast("long").alias("conc_pairs"),
            F.col("disc").cast("long").alias("disc_pairs"),
            F.floor(
                (F.col("conc") - F.col("disc")).cast("double")
                / F.sqrt(
                    (F.col("n") * (F.col("n") - 1) - F.col("n1_x2")).cast(
                        "double"
                    )
                    / 2.0
                )
                / F.sqrt(
                    (F.col("n") * (F.col("n") - 1) - F.col("n2_x2")).cast(
                        "double"
                    )
                    / 2.0
                )
                * 1e9
                + 0.5001
            )
            .cast("bigint")
            .alias("tau_b_e9"),
        )
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis H test (k-sample rank ANOVA) — round 8b.
# ---------------------------------------------------------------------------

KRUSKAL_ORACLE = """
    WITH base AS (
      SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
             l_returnflag AS flag
      FROM lineitem
    ), dic AS (
      SELECT cents,
             sum(CASE WHEN flag = 'A' THEN 1 ELSE 0 END) AS c_a,
             sum(CASE WHEN flag = 'N' THEN 1 ELSE 0 END) AS c_n,
             sum(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS c_r,
             count(*) AS c
      FROM base GROUP BY cents
    ), cum AS (
      SELECT c_a, c_n, c_r, c, sum(c) OVER (ORDER BY cents) AS cc FROM dic
    ), agg AS (
      SELECT CAST(sum(c_a) AS BIGINT) AS n_a,
             CAST(sum(c_n) AS BIGINT) AS n_n,
             CAST(sum(c_r) AS BIGINT) AS n_r,
             sum(CAST(c_a AS HUGEINT) * (2 * cc - c + 1)) AS s_a,
             sum(CAST(c_n AS HUGEINT) * (2 * cc - c + 1)) AS s_n,
             sum(CAST(c_r AS HUGEINT) * (2 * cc - c + 1)) AS s_r,
             sum(CAST(c AS HUGEINT) * c * c - c) AS tie3
      FROM cum
    )
    SELECT n_a, n_n, n_r,
           CAST(floor((3.0 * (CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)
                                / CAST(n_a AS DOUBLE)
                              + CAST(s_n AS DOUBLE) * CAST(s_n AS DOUBLE)
                                / CAST(n_n AS DOUBLE)
                              + CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE)
                                / CAST(n_r AS DOUBLE))
                       / (CAST(n_a + n_n + n_r AS DOUBLE)
                          * CAST(n_a + n_n + n_r + 1 AS DOUBLE))
                       - 3.0 * CAST(n_a + n_n + n_r + 1 AS DOUBLE))
                      * 1e6 + 0.5001) AS BIGINT) AS h_e6,
           CAST(floor((3.0 * (CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)
                                / CAST(n_a AS DOUBLE)
                              + CAST(s_n AS DOUBLE) * CAST(s_n AS DOUBLE)
                                / CAST(n_n AS DOUBLE)
                              + CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE)
                                / CAST(n_r AS DOUBLE))
                       / (CAST(n_a + n_n + n_r AS DOUBLE)
                          * CAST(n_a + n_n + n_r + 1 AS DOUBLE))
                       - 3.0 * CAST(n_a + n_n + n_r + 1 AS DOUBLE))
                      / (1.0 - CAST(tie3 AS DOUBLE)
                               / (CAST(n_a + n_n + n_r AS DOUBLE)
                                  * CAST(n_a + n_n + n_r AS DOUBLE)
                                  * CAST(n_a + n_n + n_r AS DOUBLE)
                                  - CAST(n_a + n_n + n_r AS DOUBLE)))
                      * 1e6 + 0.5001) AS BIGINT) AS h_adj_e6
    FROM agg
"""


@query("stats_kruskal_wallis", oracle=KRUSKAL_ORACLE)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H comparing l_extendedprice across ALL THREE
    returnflag groups (A/N/R) — the k-sample generalization of
    stats_mann_whitney_u: one omnibus "do any of these k groups differ
    in location?" before k(k-1)/2 pairwise U tests are even
    justified. Reported raw and tie-adjusted (H / (1 - sum(t^3-t)
    / (n^3-n)) — with cents-grid ties the adjustment is not optional).

    Same dictionary machinery as U: the pooled price grid compacts to
    (cents, c_A, c_N, c_R, c), cumulative counts come from ONE
    dist_rank pass over that dictionary (never an unpartitioned
    row-level window), and doubled midranks (2*cc - c + 1) keep
    half-ranks integral. The three doubled rank sums and the tie term
    accumulate in DECIMAL(38,0)/HUGEINT (S_j ~ n_j * 2n ~ 2.4e13 at
    sf1 — their SQUARES only ever exist in double space). Because
    returnflag's domain is FIXED (A/N/R), the groups pivot to three
    columns of one row, so the final H expression is a single fixed
    left-to-right operation sequence — identical text in both engines
    — on exact integers; group-sum ordering can never flip a digit
    (the repo's one-float-expression convention, stats_spearman_corr).

    Scale: one map-side-combinable groupBy to the price dictionary
    (value-grid bounded), one dist_rank over it, one scalar aggregate.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    statistical surface (internal/storage/types.go:3); this is
    [TARGET] inference machinery.
    """
    from gotsdb_spark.operators.distrank import dist_rank

    base = load_table(spark, "lineitem", sf_dir).select(
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.col("l_returnflag").alias("flag"),
    )
    dic = base.groupBy("cents").agg(
        F.sum(F.when(F.col("flag") == "A", 1).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("flag") == "N", 1).otherwise(0)).alias("c_n"),
        F.sum(F.when(F.col("flag") == "R", 1).otherwise(0)).alias("c_r"),
        F.count(F.lit(1)).alias("c"),
    )
    ranked = dist_rank(
        dic, ["cents"], rank_col="__kw_rk", sum_cols={"cc": "c"}
    )
    dec = "decimal(38,0)"
    rk = 2 * F.col("cc") - F.col("c") + 1
    agg = ranked.agg(
        F.sum("c_a").cast("long").alias("n_a"),
        F.sum("c_n").cast("long").alias("n_n"),
        F.sum("c_r").cast("long").alias("n_r"),
        F.sum(F.col("c_a").cast(dec) * rk).alias("s_a"),
        F.sum(F.col("c_n").cast(dec) * rk).alias("s_n"),
        F.sum(F.col("c_r").cast(dec) * rk).alias("s_r"),
        F.sum(
            F.col("c").cast(dec) * F.col("c") * F.col("c") - F.col("c")
        ).alias("tie3"),
    )
    h_sql = (
        "(3.0 * (CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)"
        " / CAST(n_a AS DOUBLE)"
        " + CAST(s_n AS DOUBLE) * CAST(s_n AS DOUBLE)"
        " / CAST(n_n AS DOUBLE)"
        " + CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE)"
        " / CAST(n_r AS DOUBLE))"
        " / (CAST(n_a + n_n + n_r AS DOUBLE)"
        " * CAST(n_a + n_n + n_r + 1 AS DOUBLE))"
        " - 3.0 * CAST(n_a + n_n + n_r + 1 AS DOUBLE))"
    )
    tie_sql = (
        "(1.0 - CAST(tie3 AS DOUBLE)"
        " / (CAST(n_a + n_n + n_r AS DOUBLE)"
        " * CAST(n_a + n_n + n_r AS DOUBLE)"
        " * CAST(n_a + n_n + n_r AS DOUBLE)"
        " - CAST(n_a + n_n + n_r AS DOUBLE)))"
    )
    return agg.select(
        "n_a",
        "n_n",
        "n_r",
        F.expr(
            f"CAST(floor({h_sql} * 1e6 + 0.5001) AS BIGINT)"
        ).alias("h_e6"),
        F.expr(
            f"CAST(floor({h_sql} / {tie_sql} * 1e6 + 0.5001) AS BIGINT)"
        ).alias("h_adj_e6"),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA F test — round 8b.
# ---------------------------------------------------------------------------

# The single floating-point expression, shared VERBATIM by the Spark
# query and the DuckDB oracle so both engines execute the identical
# IEEE operation sequence on the same exact-integer inputs
# (n1..n5, s1..s5 = per-priority counts / cents sums, qq = sum of
# squared cents, nn = total count, ss = total cents sum).
_ANOVA_A = (
    "(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)"
    " + CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE) / CAST(n3 AS DOUBLE)"
    " + CAST(s4 AS DOUBLE) * CAST(s4 AS DOUBLE) / CAST(n4 AS DOUBLE)"
    " + CAST(s5 AS DOUBLE) * CAST(s5 AS DOUBLE) / CAST(n5 AS DOUBLE))"
)
_ANOVA_GRAND = (
    "(CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))"
)
_ANOVA_F_E6 = (
    f"CAST(floor((({_ANOVA_A} - {_ANOVA_GRAND}) / 4.0)"
    f" / ((CAST(qq AS DOUBLE) - {_ANOVA_A})"
    f" / (CAST(nn AS DOUBLE) - 5.0)) * 1e6 + 0.5001) AS BIGINT)"
)
_ANOVA_ETA2_E9 = (
    f"CAST(floor(({_ANOVA_A} - {_ANOVA_GRAND})"
    f" / (CAST(qq AS DOUBLE) - {_ANOVA_GRAND}) * 1e9 + 0.5001) AS BIGINT)"
)

ANOVA_ORACLE = f"""
    WITH base AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS p,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), agg AS (
      SELECT
        CAST(sum(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(sum(CASE WHEN p = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        CAST(sum(CASE WHEN p = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
        CAST(sum(CASE WHEN p = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4,
        CAST(sum(CASE WHEN p = 5 THEN 1 ELSE 0 END) AS BIGINT) AS n5,
        sum(CASE WHEN p = 1 THEN CAST(cents AS HUGEINT) END) AS s1,
        sum(CASE WHEN p = 2 THEN CAST(cents AS HUGEINT) END) AS s2,
        sum(CASE WHEN p = 3 THEN CAST(cents AS HUGEINT) END) AS s3,
        sum(CASE WHEN p = 4 THEN CAST(cents AS HUGEINT) END) AS s4,
        sum(CASE WHEN p = 5 THEN CAST(cents AS HUGEINT) END) AS s5,
        sum(CAST(cents AS HUGEINT) * cents) AS qq,
        CAST(count(*) AS BIGINT) AS nn,
        sum(CAST(cents AS HUGEINT)) AS ss
      FROM base
    )
    SELECT nn AS n, n1, n2, n3, n4, n5,
           {_ANOVA_F_E6} AS f_e6,
           {_ANOVA_ETA2_E9} AS eta2_e9
    FROM agg
"""


@query("stats_anova_f_oneway", oracle=ANOVA_ORACLE)
def stats_anova_f_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F of o_totalprice across the five order
    priorities — the PARAMETRIC omnibus companion of
    stats_kruskal_wallis: variance BETWEEN group means over variance
    WITHIN groups, with eta^2 = SSB/SST as the effect size (the "how
    much of price variance does priority explain?" number a dashboard
    actually wants next to the F).

    Sufficient statistics are exact integers from ONE map-side-
    combinable scalar aggregate: per-priority counts and cents sums,
    the global squared-cents sum (DECIMAL(38,0) — sum(cents^2) alone
    is ~3.7e21 at sf1, past int64 at any sf), pivoted to FIXED columns
    because o_orderpriority's domain is exactly '1-URGENT'..'5-LOW'.
    SSB = sum_j S_j^2/n_j - S^2/N and SSW = Q - sum_j S_j^2/n_j are
    then evaluated in ONE double expression whose text is shared
    VERBATIM between the Spark query and the DuckDB oracle (_ANOVA_*
    fragments above), so the operation sequence is identical and the
    e6/e9 floors land on the same grid point in both engines.

    Scale: a single partial-aggregated scan; no join, no window, no
    shuffle beyond the 1-row final combine.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    statistical surface (internal/storage/types.go:3); this is
    [TARGET] inference machinery.
    """
    base = load_table(spark, "orders", sf_dir).select(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("p"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    dec = "decimal(38,0)"
    aggs = [
        F.sum(F.when(F.col("p") == j, 1).otherwise(0))
        .cast("long")
        .alias(f"n{j}")
        for j in range(1, 6)
    ] + [
        F.sum(F.when(F.col("p") == j, F.col("cents").cast(dec))).alias(
            f"s{j}"
        )
        for j in range(1, 6)
    ] + [
        F.sum(F.col("cents").cast(dec) * F.col("cents")).alias("qq"),
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum(F.col("cents").cast(dec)).alias("ss"),
    ]
    agg = base.agg(*aggs)
    return agg.select(
        F.col("nn").alias("n"),
        "n1",
        "n2",
        "n3",
        "n4",
        "n5",
        F.expr(_ANOVA_F_E6).alias("f_e6"),
        F.expr(_ANOVA_ETA2_E9).alias("eta2_e9"),
    )


# ---------------------------------------------------------------------------
# Welch's unequal-variance t-test — round 9b.
# ---------------------------------------------------------------------------

# Shared-verbatim float fragments (the stats_anova_f_oneway convention):
# n_a/n_r = group counts, s_a/s_r = exact cents sums, q_a/q_r = exact
# squared-cents sums — all integers; both engines execute the identical
# IEEE sequence on them.
_WELCH_VA = (
    "((CAST(q_a AS DOUBLE)"
    " - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))"
    " / (CAST(n_a AS DOUBLE) - 1.0))"
)
_WELCH_VR = (
    "((CAST(q_r AS DOUBLE)"
    " - CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE) / CAST(n_r AS DOUBLE))"
    " / (CAST(n_r AS DOUBLE) - 1.0))"
)
_WELCH_SE2 = (
    f"({_WELCH_VA} / CAST(n_a AS DOUBLE)"
    f" + {_WELCH_VR} / CAST(n_r AS DOUBLE))"
)
_WELCH_T_E6 = (
    "CAST(floor((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
    " - CAST(s_r AS DOUBLE) / CAST(n_r AS DOUBLE))"
    f" / sqrt({_WELCH_SE2}) * 1e6 + 0.5001) AS BIGINT)"
)
_WELCH_DF_E6 = (
    f"CAST(floor({_WELCH_SE2} * {_WELCH_SE2}"
    f" / (({_WELCH_VA} / CAST(n_a AS DOUBLE))"
    f" * ({_WELCH_VA} / CAST(n_a AS DOUBLE))"
    " / (CAST(n_a AS DOUBLE) - 1.0)"
    f" + ({_WELCH_VR} / CAST(n_r AS DOUBLE))"
    f" * ({_WELCH_VR} / CAST(n_r AS DOUBLE))"
    " / (CAST(n_r AS DOUBLE) - 1.0)) * 1e6 + 0.5001) AS BIGINT)"
)

WELCH_ORACLE = f"""
    WITH base AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
      WHERE l_returnflag IN ('A', 'R')
    ), agg AS (
      SELECT
        CAST(sum(CASE WHEN flag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(sum(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
        sum(CASE WHEN flag = 'A' THEN CAST(cents AS HUGEINT) END) AS s_a,
        sum(CASE WHEN flag = 'R' THEN CAST(cents AS HUGEINT) END) AS s_r,
        sum(CASE WHEN flag = 'A' THEN CAST(cents AS HUGEINT) * cents END)
          AS q_a,
        sum(CASE WHEN flag = 'R' THEN CAST(cents AS HUGEINT) * cents END)
          AS q_r
      FROM base
    )
    SELECT n_a, n_r,
           CAST(s_a * 100 // n_a AS BIGINT) AS mean_a_c_e2,
           CAST(s_r * 100 // n_r AS BIGINT) AS mean_r_c_e2,
           {_WELCH_T_E6} AS t_e6,
           {_WELCH_DF_E6} AS df_e6
    FROM agg
"""


@query("stats_welch_ttest", oracle=WELCH_ORACLE)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test of l_extendedprice
    between returned (l_returnflag='A') and refused ('R') lineitems —
    the pairwise FOLLOW-UP to stats_anova_f_oneway /
    stats_brown_forsythe: once the omnibus says the groups differ and
    the variance check says "don't pool", Welch's t (which never pools
    variances) with its Welch-Satterthwaite effective df is the
    standard two-group contrast.

    Sufficient statistics are exact integers from ONE map-side-
    combinable scalar aggregate over the A/R rows: per-group counts,
    cents sums, and squared-cents sums (DECIMAL(38,0) — sum(cents^2)
    is ~2.5e21 at sf1, past int64 at any sf). t and the
    Welch-Satterthwaite df are each ONE double expression shared
    VERBATIM between the Spark query and the DuckDB oracle (_WELCH_*
    fragments above), floored to the e6 grid; group means are exact
    integer c_e2 fixed-point (DIV, no float).

    Scale: a single partial-aggregated scan with the A/R filter pushed
    to parquet; no join, no window, no shuffle beyond the 1-row final
    combine.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    statistical surface (internal/storage/types.go:3); this is
    [TARGET] inference machinery.
    """
    base = load_table(spark, "lineitem", sf_dir).where(
        F.col("l_returnflag").isin("A", "R")
    ).select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    dec = "decimal(38,0)"
    agg = base.agg(
        F.sum(F.when(F.col("flag") == "A", 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("flag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("n_r"),
        F.sum(F.when(F.col("flag") == "A", F.col("cents").cast(dec))).alias(
            "s_a"
        ),
        F.sum(F.when(F.col("flag") == "R", F.col("cents").cast(dec))).alias(
            "s_r"
        ),
        F.sum(
            F.when(F.col("flag") == "A", F.col("cents").cast(dec) * F.col("cents"))
        ).alias("q_a"),
        F.sum(
            F.when(F.col("flag") == "R", F.col("cents").cast(dec) * F.col("cents"))
        ).alias("q_r"),
    )
    return agg.select(
        "n_a",
        "n_r",
        F.expr("CAST(s_a * 100 DIV n_a AS BIGINT)").alias("mean_a_c_e2"),
        F.expr("CAST(s_r * 100 DIV n_r AS BIGINT)").alias("mean_r_c_e2"),
        F.expr(_WELCH_T_E6).alias("t_e6"),
        F.expr(_WELCH_DF_E6).alias("df_e6"),
    )


# ---------------------------------------------------------------------------
# Jarque-Bera normality test — round 9b.
# ---------------------------------------------------------------------------

# Raw power sums s1..s4 (exact DECIMAL(38,0) integers) convert to
# central moments in ONE shared-verbatim double expression; mm2/mm3/mm4
# are the population central moments of cents.
_JB_MU = "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
_JB_M2 = f"(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - {_JB_MU} * {_JB_MU})"
_JB_M3 = (
    f"(CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - 3.0 * {_JB_MU} * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" + 2.0 * {_JB_MU} * {_JB_MU} * {_JB_MU})"
)
_JB_M4 = (
    f"(CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - 4.0 * {_JB_MU} * CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" + 6.0 * {_JB_MU} * {_JB_MU} * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - 3.0 * {_JB_MU} * {_JB_MU} * {_JB_MU} * {_JB_MU})"
)
_JB_SKEW = f"({_JB_M3} / sqrt({_JB_M2} * {_JB_M2} * {_JB_M2}))"
_JB_KURT = f"({_JB_M4} / ({_JB_M2} * {_JB_M2}))"
_JB_SKEW_E6 = f"CAST(floor({_JB_SKEW} * 1e6 + 0.5001) AS BIGINT)"
_JB_KURT_E6 = f"CAST(floor({_JB_KURT} * 1e6 + 0.5001) AS BIGINT)"
_JB_STAT_E3 = (
    f"CAST(floor(CAST(n AS DOUBLE) / 6.0 * ({_JB_SKEW} * {_JB_SKEW}"
    f" + ({_JB_KURT} - 3.0) * ({_JB_KURT} - 3.0) / 4.0)"
    " * 1e3 + 0.5001) AS BIGINT)"
)

JARQUE_BERA_ORACLE = f"""
    WITH base AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ), agg AS (
      SELECT flag,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(cents AS HUGEINT)) AS s1,
             sum(CAST(cents AS HUGEINT) * cents) AS s2,
             sum(CAST(cents AS HUGEINT) * cents * cents) AS s3,
             sum(CAST(cents AS HUGEINT) * cents * cents * cents) AS s4
      FROM base GROUP BY flag
    )
    SELECT flag, n,
           {_JB_SKEW_E6} AS skew_e6,
           {_JB_KURT_E6} AS kurt_e6,
           {_JB_STAT_E3} AS jb_e3
    FROM agg
"""


@query("stats_jarque_bera", oracle=JARQUE_BERA_ORACLE)
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test of l_extendedprice per returnflag
    group — the distribution-SHAPE gate that tells a pipeline whether
    parametric machinery (stats_welch_ttest, stats_anova_f_oneway,
    OLS prediction intervals) is trustworthy on this column: JB =
    n/6 * (skew^2 + (kurt-3)^2/4), asymptotically chi^2(2) under
    normality, with the skewness and excess-kurtosis components
    reported alongside so the FAILURE MODE (asymmetry vs heavy tails)
    is visible, not just the verdict.

    Sufficient statistics are the first four raw power sums of cents,
    exact DECIMAL(38,0) integers from ONE map-side-combinable
    groupBy(flag): sum(cents^4) alone is ~2e34 at sf1 and ~2e37 at
    1000x sf1 — inside 38 digits through the design envelope, past
    int64 everywhere. Raw sums convert to central moments, skew, and
    kurtosis in double expressions shared VERBATIM between the Spark
    query and the DuckDB oracle (_JB_* fragments above); outputs land
    on e6 (shape) / e3 (statistic) grids.

    Scale: one partial-aggregated scan; the shuffle carries exactly
    three 6-column rows. No join, no window, no dictionary needed —
    power sums compose without centering.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    statistical surface (internal/storage/types.go:3); this is
    [TARGET] inference machinery.
    """
    base = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    dec = "decimal(38,0)"
    c = F.col("cents")
    agg = base.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(c.cast(dec)).alias("s1"),
        F.sum(c.cast(dec) * c).alias("s2"),
        F.sum(c.cast(dec) * c * c).alias("s3"),
        F.sum(c.cast(dec) * c * c * c).alias("s4"),
    )
    return agg.select(
        "flag",
        "n",
        F.expr(_JB_SKEW_E6).alias("skew_e6"),
        F.expr(_JB_KURT_E6).alias("kurt_e6"),
        F.expr(_JB_STAT_E3).alias("jb_e3"),
    )


# ---------------------------------------------------------------------------
# Cochran-Armitage trend test — round 10.
# ---------------------------------------------------------------------------

COCHRAN_ARMITAGE_ORACLE = """
    WITH cells AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
             CAST(count(*) AS BIGINT) AS n_k,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS r_k
      FROM orders GROUP BY 1
    ), suff AS (
      SELECT CAST(sum(n_k) AS BIGINT) AS n,
             CAST(sum(r_k) AS BIGINT) AS r,
             CAST(sum(w * r_k) AS BIGINT) AS swr,
             CAST(sum(w * n_k) AS BIGINT) AS swn,
             CAST(sum(w * w * n_k) AS BIGINT) AS swwn
      FROM cells
    )
    SELECT n, r,
           CAST(n * swr - r * swn AS BIGINT) AS a_num,
           CAST(n * swwn - swn * swn AS BIGINT) AS b_den,
           CAST(floor(
             (n * 1.0 * (CAST(n AS HUGEINT) * swr - CAST(r AS HUGEINT) * swn)
                * (CAST(n AS HUGEINT) * swr - CAST(r AS HUGEINT) * swn))
             / (r * 1.0 * (n - r)
                * (CAST(n AS HUGEINT) * swwn - CAST(swn AS HUGEINT) * swn))
             * 1e6 + 0.5001) AS BIGINT) AS z2_e6,
           (n * swr - r * swn) > 0 AS trend_positive
    FROM suff
"""


@query("stats_cochran_armitage_trend", oracle=COCHRAN_ARMITAGE_ORACLE)
def stats_cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage test for TREND: does the fraction of finalized
    orders (o_orderstatus = 'F') rise or fall monotonically with the
    ORDERED priority level (1-URGENT … 5-LOW)? The ordered-alternative
    member of the chi-square family: the plain independence test
    (stats_chi_square_priority_flag) spends its power on ANY departure,
    while this one concentrates it on the dose-response direction an
    ops review actually asks about ('do lower priorities finalize
    more?'), using the priority rank itself as the score w_k.

    z² = n·A² / (R·(n−R)·B) with A = n·Σw·r_k − R·Σw·n_k and
    B = n·Σw²·n_k − (Σw·n_k)² — all exact integer sufficient
    statistics from ONE map-side-combinable groupBy over the 5-row
    priority grid; the products run in DECIMAL(38,0)/HUGEINT (A is
    ~5n² ≈ 1e13·n², so A² passes int64 before sf1), and the single
    float division is evaluated once on those exact integers with an
    identical expression in both engines, then floored to e6. The
    signed trend direction (sign of A) rides alongside.

    Scale: one scan, one 5-row shuffle, one scalar row. Nothing
    downstream of the first groupBy is row-count-sized.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    statistical surface (internal/storage/types.go:3); this is
    [TARGET] inference machinery.
    """
    cells = (
        load_table(spark, "orders", sf_dir)
        .groupBy(
            F.substring("o_orderpriority", 1, 1).cast("bigint").alias("w")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_k"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("long")
            .alias("r_k"),
        )
    )
    suff = cells.agg(
        F.sum("n_k").cast("long").alias("n"),
        F.sum("r_k").cast("long").alias("r"),
        F.sum(F.col("w") * F.col("r_k")).cast("long").alias("swr"),
        F.sum(F.col("w") * F.col("n_k")).cast("long").alias("swn"),
        F.sum(F.col("w") * F.col("w") * F.col("n_k"))
        .cast("long")
        .alias("swwn"),
    )
    dec = "decimal(38,0)"
    return suff.select(
        "n",
        "r",
        (F.col("n") * F.col("swr") - F.col("r") * F.col("swn"))
        .cast("long")
        .alias("a_num"),
        (F.col("n") * F.col("swwn") - F.col("swn") * F.col("swn"))
        .cast("long")
        .alias("b_den"),
        F.floor(
            (
                F.col("n")
                * 1.0
                * (
                    F.col("n").cast(dec) * F.col("swr")
                    - F.col("r").cast(dec) * F.col("swn")
                )
                * (
                    F.col("n").cast(dec) * F.col("swr")
                    - F.col("r").cast(dec) * F.col("swn")
                )
            )
            / (
                F.col("r")
                * 1.0
                * (F.col("n") - F.col("r"))
                * (
                    F.col("n").cast(dec) * F.col("swwn")
                    - F.col("swn").cast(dec) * F.col("swn")
                )
            )
            * 1e6
            + 0.5001
        )
        .cast("long")
        .alias("z2_e6"),
        (
            (F.col("n") * F.col("swr") - F.col("r") * F.col("swn")) > 0
        ).alias("trend_positive"),
    )


# ---------------------------------------------------------------------------
# Cochran's Q + McNemar for paired binary gates — round 10.
# ---------------------------------------------------------------------------

_CQ_G1 = "n_chars >= 500"
_CQ_G2 = "(length(text) - length(replace(text, ' ', '')) + 1) >= 80"
_CQ_G3 = "lang = 'en'"

COCHRAN_Q_ORACLE = f"""
    WITH flags AS (
      SELECT CASE WHEN {_CQ_G1} THEN 1 ELSE 0 END AS g1,
             CASE WHEN {_CQ_G2} THEN 1 ELSE 0 END AS g2,
             CASE WHEN {_CQ_G3} THEN 1 ELSE 0 END AS g3
      FROM documents
    ), suff AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(g1) AS BIGINT) AS c1,
             CAST(sum(g2) AS BIGINT) AS c2,
             CAST(sum(g3) AS BIGINT) AS c3,
             CAST(sum(g1 + g2 + g3) AS BIGINT) AS sr,
             CAST(sum((g1 + g2 + g3) * (g1 + g2 + g3)) AS BIGINT) AS sr2,
             CAST(sum(CASE WHEN g1 = 0 AND g2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n01,
             CAST(sum(CASE WHEN g1 = 1 AND g2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n10
      FROM flags
    )
    SELECT n_docs, c1, c2, c3,
           CAST(floor(
             2.0 * (3 * (CAST(c1 AS HUGEINT) * c1 + CAST(c2 AS HUGEINT) * c2
                         + CAST(c3 AS HUGEINT) * c3)
                    - CAST(sr AS HUGEINT) * sr)
             / nullif(3.0 * sr - sr2, 0) * 1e6 + 0.5001) AS BIGINT) AS q_e6,
           n01, n10,
           CAST(floor((n01 - n10) * 1.0 * (n01 - n10) / nullif(n01 + n10, 0)
                      * 1e6 + 0.5001) AS BIGINT) AS mcnemar_chi2_e6
    FROM suff
"""


@query("stats_cochran_q_mcnemar", oracle=COCHRAN_Q_ORACLE)
def stats_cochran_q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q across three paired binary quality gates per
    document (length ≥ 500 chars, ≥ 80 whitespace tokens, lang = en)
    plus McNemar's test for the first gate pair — the snapshot-diff
    family's PAIRED significance layer: when a curation run swaps gate
    v1 for gate v2 over the SAME corpus, the question is not whether
    the two pass rates differ (two-proportion z assumes independent
    samples) but whether they differ GIVEN the pairing — only the
    discordant documents carry information, which is exactly what
    McNemar counts and what Q generalizes to k gates.

    Q = (k−1)·(k·ΣC_j² − (ΣC_j)²) / (k·ΣR_i − ΣR_i²) over per-gate
    column totals C_j and per-document row sums R_i; McNemar's
    χ² = (n01−n10)²/(n01+n10) over the discordant counts. ALL
    sufficient statistics (C_j, ΣR, ΣR², n01, n10) come from ONE
    map-side-combinable aggregate over one documents pass — the row
    sums collapse per-partition, nothing per-document survives the
    scan — with HUGEINT/DECIMAL(38,0) squares and one float division
    per statistic, e6-floored, identical in both engines.

    Scale: one scan, one 1-row shuffle. The gates are row-local
    predicates; swapping in real gate columns keeps the shape.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    statistical surface (internal/storage/types.go:3); this is
    [TARGET] inference machinery.
    """
    docs = load_table(spark, "documents", sf_dir)
    g1 = F.when(F.expr(_CQ_G1), 1).otherwise(0)
    g2 = F.when(F.expr(_CQ_G2), 1).otherwise(0)
    g3 = F.when(F.expr(_CQ_G3), 1).otherwise(0)
    flags = docs.select(
        g1.alias("g1"), g2.alias("g2"), g3.alias("g3")
    ).withColumn("rsum", F.col("g1") + F.col("g2") + F.col("g3"))
    dec = "decimal(38,0)"
    suff = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("g1").cast("long").alias("c1"),
        F.sum("g2").cast("long").alias("c2"),
        F.sum("g3").cast("long").alias("c3"),
        F.sum("rsum").cast("long").alias("sr"),
        F.sum(F.col("rsum") * F.col("rsum")).cast("long").alias("sr2"),
        F.sum(F.when((F.col("g1") == 0) & (F.col("g2") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n01"),
        F.sum(F.when((F.col("g1") == 1) & (F.col("g2") == 0), 1).otherwise(0))
        .cast("long")
        .alias("n10"),
    )
    return suff.select(
        "n_docs",
        "c1",
        "c2",
        "c3",
        F.floor(
            2.0
            * (
                3
                * (
                    F.col("c1").cast(dec) * F.col("c1")
                    + F.col("c2").cast(dec) * F.col("c2")
                    + F.col("c3").cast(dec) * F.col("c3")
                )
                - F.col("sr").cast(dec) * F.col("sr")
            )
            # all-concordant degenerate corpus (sr2 == 3·sr) → NULL in
            # both engines, not NaN/Infinity (oracle uses nullif too)
            / F.nullif(3.0 * F.col("sr") - F.col("sr2"), F.lit(0.0))
            * 1e6
            + 0.5001
        )
        .cast("long")
        .alias("q_e6"),
        "n01",
        "n10",
        F.floor(
            (F.col("n01") - F.col("n10"))
            * 1.0
            * (F.col("n01") - F.col("n10"))
            # no discordant docs → NULL in both engines
            / F.nullif(F.col("n01") + F.col("n10"), F.lit(0)).cast("double")
            * 1e6
            + 0.5001
        )
        .cast("long")
        .alias("mcnemar_chi2_e6"),
    )


# ---------------------------------------------------------------------------
# Cucconi location-scale test — round 10.
# ---------------------------------------------------------------------------

CUCCONI_ORACLE = """
    WITH base AS (
      SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
             l_returnflag AS flag
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
    ), dic AS (
      SELECT cents,
             CAST(sum(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cb,
             CAST(count(*) AS BIGINT) AS c
      FROM base GROUP BY cents
    ), cum AS (
      SELECT cb, c, 2 * sum(c) OVER (ORDER BY cents) - c + 1 AS m2 FROM dic
    ), suff AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(cb) AS BIGINT) AS n2,
             CAST(sum(CAST(cb AS HUGEINT) * m2) AS HUGEINT) AS sb_x2,
             CAST(sum(CAST(cb AS HUGEINT) * m2 * m2) AS HUGEINT) AS s2b_x4
      FROM cum
    )
    SELECT n, CAST(n - n2 AS BIGINT) AS n1, n2,
           CAST(sb_x2 AS BIGINT) AS rank_sum_b_x2,
           CAST(s2b_x4 AS VARCHAR) AS rank_sq_sum_b_x4,
           CAST(floor(
             (u.u * u.u + v.v * v.v - 2.0 * r.r * u.u * v.v)
             / (2.0 * (1 - r.r * r.r))
             * 1e6 + 0.5001) AS BIGINT) AS q_e6
    FROM suff,
    LATERAL (SELECT sqrt(CAST(n - n2 AS DOUBLE) * n2 * (n + 1) * (2 * n + 1)
                         * (8 * n + 11) / 5) AS d) d,
    LATERAL (SELECT (6.0 * (CAST(s2b_x4 AS DOUBLE) / 4)
                     - CAST(n2 AS DOUBLE) * (n + 1) * (2 * n + 1)) / d.d AS u) u,
    LATERAL (SELECT (6.0 * (CAST(n2 AS DOUBLE) * (n + 1) * (n + 1)
                            - (n + 1) * CAST(sb_x2 AS DOUBLE)
                            + CAST(s2b_x4 AS DOUBLE) / 4)
                     - CAST(n2 AS DOUBLE) * (n + 1) * (2 * n + 1)) / d.d AS v) v,
    LATERAL (SELECT 2.0 * (CAST(n AS DOUBLE) * n - 4)
                    / ((2 * n + 1) * CAST(8 * n + 11 AS DOUBLE)) - 1 AS r) r
"""


@query("stats_cucconi_location_scale", oracle=CUCCONI_ORACLE)
def stats_cucconi_location_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cucconi's joint location-scale rank test between the 'A' and
    'R' return-flag price distributions — the two-sample family's
    joint-alternative member: Mann-Whitney (stats_mann_whitney_u)
    sees location shifts, Brown-Forsythe (stats_brown_forsythe) sees
    scale shifts, KS (stats_ks_priority_price) sees any gap but
    diffusely; Cucconi combines a squared-rank statistic U and its
    contrary-rank mirror V with their known correlation ρ into one
    Q = (U² + V² − 2ρUV) / (2(1−ρ²)), with better power than the
    Lepage combination it predates.

    Tie handling: doubled MIDRANKS over the cents dictionary (the
    stats_mann_whitney_u / spearman convention) — m2 = 2·cc − c + 1 is
    an exact integer per distinct price, so the B-sample rank sum (×2)
    and squared-rank sum (×4) are exact HUGEINT/DECIMAL(38,0) integers
    (Σcb·m2² ≈ 4N³ ≈ 8.6e20 at sf1, past int64 before sf0.5); the /2
    and /4 fold into ONE shared float expression evaluated on those
    exact integers identically in both engines, then floored to e6.
    The contrary-rank sum needs no second ordering: Σ(N+1−R)² expands
    algebraically from N, ΣR, ΣR².

    Scale: one map-side-combinable groupBy to the price dictionary,
    one dictionary-bounded cumulative (saturating value grid — the
    dictionary trick), one scalar row. Nothing row-count-sized past
    the first shuffle. The squared-rank sum is reported as a STRING
    (it exceeds int64; DuckDB hands DECIMAL to pandas as float64,
    which would wreck the hash gate — the Jarque-Bera convention).

    Reference parity: the reference (j0shgrant/gotsdb) has no
    statistical surface (internal/storage/types.go:3); this is
    [TARGET] inference machinery.
    """
    dec = "decimal(38,0)"
    base = load_table(spark, "lineitem", sf_dir).where(
        F.col("l_returnflag").isin("A", "R")
    )
    dic = (
        base.select(
            F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("b"),
        )
        .groupBy("cents")
        .agg(
            F.sum("b").cast("long").alias("cb"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
    )
    from gotsdb_spark.operators.distrank import dist_rank

    # dist_rank, not a global window: the cumulative runs as two
    # linear passes over the saturating cents dictionary (the
    # spearman / Kaplan-Meier machinery) instead of funneling the
    # dictionary through one partition.
    cum = dist_rank(dic, ["cents"], rank_col="_rk", sum_cols={"cc": "c"}).select(
        "cb",
        "c",
        (2 * F.col("cc") - F.col("c") + 1).alias("m2"),
    )
    suff = cum.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum("cb").cast("long").alias("n2"),
        F.sum(F.col("cb").cast(dec) * F.col("m2")).alias("sb_x2"),
        F.sum(F.col("cb").cast(dec) * F.col("m2") * F.col("m2")).alias("s2b_x4"),
    )
    # Double-first for the same reason as rho — and because the exact
    # decimal product n1·n2·(n+1)·(2n+1)·(8n+11) ≈ 5n⁵ would overflow
    # DECIMAL(38,0) around sf30.
    den = (
        "sqrt(CAST(n - n2 AS DOUBLE) * n2 * (n + 1) * (2 * n + 1)"
        " * (8 * n + 11) / 5)"
    )
    u = (
        f"((6.0 * (CAST(s2b_x4 AS DOUBLE) / 4)"
        f" - CAST(n2 AS DOUBLE) * (n + 1) * (2 * n + 1)) / {den})"
    )
    v = (
        f"((6.0 * (CAST(n2 AS DOUBLE) * (n + 1) * (n + 1)"
        f" - (n + 1) * CAST(sb_x2 AS DOUBLE)"
        f" + CAST(s2b_x4 AS DOUBLE) / 4)"
        f" - CAST(n2 AS DOUBLE) * (n + 1) * (2 * n + 1)) / {den})"
    )
    # CAST to DOUBLE explicitly: Spark parses 2.0/1.0 literals as
    # DECIMAL, and an all-integer/decimal rho would silently evaluate
    # in 10-digit decimal arithmetic (caught by a 3e-6 cross-engine
    # drift during this op's oracle bring-up).
    rho = (
        "(2.0 * (CAST(n AS DOUBLE) * n - 4)"
        " / ((2 * n + 1) * CAST(8 * n + 11 AS DOUBLE)) - 1)"
    )
    return suff.select(
        "n",
        (F.col("n") - F.col("n2")).cast("long").alias("n1"),
        "n2",
        F.col("sb_x2").cast("long").alias("rank_sum_b_x2"),
        F.col("s2b_x4").cast("string").alias("rank_sq_sum_b_x4"),
        F.expr(
            f"CAST(floor(({u} * {u} + {v} * {v}"
            f" - 2.0 * {rho} * {u} * {v})"
            f" / (2.0 * (1 - {rho} * {rho})) * 1e6 + 0.5001) AS BIGINT)"
        ).alias("q_e6"),
    )


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank paired test — round 11.
# ---------------------------------------------------------------------------

WILCOXON_ORACLE = """
    WITH per_user AS (
      SELECT user_id,
             CAST(sum(CASE WHEN event_type = 'click'
                           THEN CAST(floor(value * 1000) AS BIGINT) END)
                  // count(CASE WHEN event_type = 'click' THEN 1 END)
                  AS BIGINT) AS click_e3,
             CAST(sum(CASE WHEN event_type = 'view'
                           THEN CAST(floor(value * 1000) AS BIGINT) END)
                  // count(CASE WHEN event_type = 'view' THEN 1 END)
                  AS BIGINT) AS view_e3
      FROM events
      WHERE event_type IN ('click', 'view')
      GROUP BY user_id
      HAVING count(CASE WHEN event_type = 'click' THEN 1 END) > 0
         AND count(CASE WHEN event_type = 'view' THEN 1 END) > 0
    ), diffs AS (
      SELECT click_e3 - view_e3 AS d FROM per_user
      WHERE click_e3 <> view_e3
    ), dic AS (
      SELECT abs(d) AS ad,
             CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cpos,
             CAST(count(*) AS BIGINT) AS c
      FROM diffs GROUP BY 1
    ), cum AS (
      SELECT ad, cpos, c, sum(c) OVER (ORDER BY ad) AS cc FROM dic
    ), agg AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(cpos * (2 * cc - c + 1)) AS BIGINT) AS w_plus_x2,
             sum(CAST(c AS HUGEINT) * c * c - c) AS tie3
      FROM cum
    )
    SELECT n, w_plus_x2,
           CAST(tie3 // n AS BIGINT) AS tie_term_div_n,
           CAST((2 * CAST(n AS HUGEINT) * (n + 1) * (2 * n + 1) - tie3)
                // n AS BIGINT) AS var_x48_div_n,
           CAST(CASE WHEN 2 * w_plus_x2 >= CAST(n AS HUGEINT) * (n + 1)
                     THEN 1 ELSE -1 END
                * 3 * (2 * CAST(w_plus_x2 AS HUGEINT)
                       - CAST(n AS HUGEINT) * (n + 1))
                * (2 * CAST(w_plus_x2 AS HUGEINT)
                   - CAST(n AS HUGEINT) * (n + 1))
                * 1000000
                // NULLIF(2 * CAST(n AS HUGEINT) * (n + 1) * (2 * n + 1)
                          - tie3, 0) AS BIGINT) AS z2_signed_e6
    FROM agg
"""


@query("stats_wilcoxon_signed_rank", oracle=WILCOXON_ORACLE)
def stats_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test of the PAIRED difference between each
    user's mean click value and mean view value — the nonparametric
    paired complement to stats_mann_whitney_u (which compares two
    INDEPENDENT samples): same units, two conditions, does the median
    difference differ from zero without assuming normality?

    Exact integers end to end via the dictionary trick: per-user means
    are e3 integer DIVs; zero differences drop (the standard
    discard-zeros convention); |d| compacts to a (ad, c, c_pos)
    dictionary whose tie-averaged midranks come from one dist_rank
    cumulative, doubled (2*cc - c + 1) so half-ranks stay integral.
    W+ (x2), the tie term sum(t^3 - t), the variance certificate
    48*Var = 2n(n+1)(2n+1) - tie3 (both reported DIV n so int64 holds
    even in the all-tied worst case), and the signed z^2 e6-rational
    3*(4W+ - n(n+1))^2 / (2n(n+1)(2n+1) - tie3) — note 48/16 = 3 —
    are all exact integer arithmetic (HUGEINT/DECIMAL(38,0)
    accumulators), NULL on the degenerate all-tied-to-one-value corpus
    in both engines.

    Scale: one map-side-combinable groupBy to the user dictionary, one
    to the |d| dictionary (bounded by the e3 value grid), one linear
    dist_rank over it — never an unpartitioned row-level window.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    statistical surface (internal/storage/types.go:3); this is
    [TARGET] inference machinery.
    """
    from gotsdb_spark.operators.distrank import dist_rank

    dec = "decimal(38,0)"
    ev = (
        load_table(spark, "events", sf_dir)
        .where(F.col("event_type").isin("click", "view"))
        .select(
            "user_id",
            "event_type",
            F.floor(F.col("value") * 1000).cast("bigint").alias("v_e3"),
        )
    )
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", F.col("v_e3")))
            .alias("cs"),
            F.count(F.when(F.col("event_type") == "click", 1)).alias("cn"),
            F.sum(F.when(F.col("event_type") == "view", F.col("v_e3")))
            .alias("vs"),
            F.count(F.when(F.col("event_type") == "view", 1)).alias("vn"),
        )
        .where((F.col("cn") > 0) & (F.col("vn") > 0))
        .select(
            F.expr("CAST(cs DIV cn AS BIGINT)").alias("click_e3"),
            F.expr("CAST(vs DIV vn AS BIGINT)").alias("view_e3"),
        )
    )
    diffs = per_user.where(F.col("click_e3") != F.col("view_e3")).select(
        (F.col("click_e3") - F.col("view_e3")).alias("d")
    )
    dic = diffs.groupBy(F.abs(F.col("d")).alias("ad")).agg(
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
        .cast("long")
        .alias("cpos"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    ranked = dist_rank(dic, ["ad"], rank_col="__wx_rk", sum_cols={"cc": "c"})
    agg = ranked.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("cpos") * (2 * F.col("cc") - F.col("c") + 1))
        .cast("long")
        .alias("w_plus_x2"),
        F.sum(
            F.col("c").cast(dec) * F.col("c") * F.col("c") - F.col("c")
        ).alias("tie3"),
    )
    return agg.select(
        "n",
        "w_plus_x2",
        F.expr("CAST(tie3 DIV n AS BIGINT)").alias("tie_term_div_n"),
        F.expr(
            f"CAST((2 * CAST(n AS {dec}) * (n + 1) * (2 * n + 1) - tie3)"
            " DIV n AS BIGINT)"
        ).alias("var_x48_div_n"),
        F.expr(
            f"CAST(CASE WHEN 2 * w_plus_x2 >= CAST(n AS {dec}) * (n + 1)"
            " THEN 1 ELSE -1 END"
            f" * 3 * (2 * CAST(w_plus_x2 AS {dec})"
            f" - CAST(n AS {dec}) * (n + 1))"
            f" * (2 * CAST(w_plus_x2 AS {dec})"
            f" - CAST(n AS {dec}) * (n + 1))"
            " * 1000000"
            f" DIV NULLIF(2 * CAST(n AS {dec}) * (n + 1) * (2 * n + 1)"
            " - tie3, 0) AS BIGINT)"
        ).alias("z2_signed_e6"),
    )


# ---------------------------------------------------------------------------
# Friedman rank test over block x treatment cells — round 11.
# ---------------------------------------------------------------------------

FRIEDMAN_ORACLE = """
    WITH cells AS (
      SELECT CAST(month(o.o_orderdate) AS BIGINT) AS block,
             o.o_orderpriority AS treatment,
             CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT block, treatment,
             CAST(row_number() OVER (PARTITION BY block
                                     ORDER BY cents, treatment)
                  AS BIGINT) AS rnk
      FROM cells
    ), sums AS (
      SELECT treatment, CAST(sum(rnk) AS BIGINT) AS rank_sum
      FROM ranked GROUP BY treatment
    ), tot AS (
      SELECT CAST(count(DISTINCT block) AS BIGINT) AS n_blocks,
             CAST(count(DISTINCT treatment) AS BIGINT) AS k_treatments
      FROM cells
    ), chi AS (
      SELECT t.n_blocks, t.k_treatments,
             CAST(12 * CAST(sum(s.rank_sum * s.rank_sum) AS HUGEINT)
                  * 1000000
                  // (t.n_blocks * t.k_treatments * (t.k_treatments + 1))
                  - 3 * t.n_blocks * (t.k_treatments + 1) * 1000000
                  AS BIGINT) AS chi2_e6
      FROM sums s CROSS JOIN tot t
      GROUP BY t.n_blocks, t.k_treatments
    )
    SELECT s.treatment, s.rank_sum, c.n_blocks, c.k_treatments, c.chi2_e6
    FROM sums s CROSS JOIN chi c
    ORDER BY s.treatment
"""


@query("stats_friedman_ranks", oracle=FRIEDMAN_ORACLE)
def stats_friedman_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test of order-priority revenue across calendar-
    month blocks — the k-sample REPEATED-MEASURES complement to
    stats_kruskal_wallis (independent groups) and
    stats_wilcoxon_signed_rank (k = 2 paired): each order month is a
    block that ranks the 5 priorities by revenue, and the test asks
    whether any priority consistently out-earns the others across
    blocks.

    Determinism: cell revenues are exact cent sums; within-block ranks
    are row_number over the total order (cents, treatment) — revenue
    sums across ~1e5-row cells are effectively tie-free, and the
    explicit treatment tie-break keeps both engines identical even if
    two cells collide exactly. chi2_F = 12*sum(R_j^2)/(n*k*(k+1)) -
    3n(k+1) is an exact integer e6-rational (HUGEINT/DECIMAL(38,0)
    intermediates).

    Scale: one map-side-combinable shuffle to the 60-cell
    (month, priority) contingency dictionary; the ranking window is
    partitioned by block over k = 5 rows; everything after is
    dictionary-sized.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    statistical surface (internal/storage/types.go:3); this is
    [TARGET] inference machinery.
    """
    from pyspark.sql.window import Window as W

    dec = "decimal(38,0)"
    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cells = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.month("o_orderdate").cast("long").alias("block"),
            F.col("o_orderpriority").alias("treatment"),
        )
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("long")
            .alias("cents")
        )
        # consumed by the rank branch and the (n, k) domain count
        .localCheckpoint(eager=False)
    )
    ranked = cells.select(
        "block",
        "treatment",
        F.row_number()
        .over(W.partitionBy("block").orderBy("cents", "treatment"))
        .cast("long")
        .alias("rnk"),
    )
    sums = ranked.groupBy("treatment").agg(
        F.sum("rnk").cast("long").alias("rank_sum")
    )
    tot = cells.agg(
        F.countDistinct("block").cast("long").alias("n_blocks"),
        F.countDistinct("treatment").cast("long").alias("k_treatments"),
    )
    chi = (
        sums.crossJoin(F.broadcast(tot))
        .groupBy("n_blocks", "k_treatments")
        .agg(
            F.sum(
                F.col("rank_sum").cast(dec) * F.col("rank_sum")
            ).alias("ss")
        )
        .select(
            "n_blocks",
            "k_treatments",
            F.expr(
                "CAST(12 * ss * 1000000"
                " DIV (n_blocks * k_treatments * (k_treatments + 1))"
                " - 3 * n_blocks * (k_treatments + 1) * 1000000"
                " AS BIGINT)"
            ).alias("chi2_e6"),
        )
    )
    return (
        sums.crossJoin(F.broadcast(chi))
        .select("treatment", "rank_sum", "n_blocks", "k_treatments", "chi2_e6")
        .orderBy("treatment")
    )


# ---------------------------------------------------------------------------
# Ljung-Box portmanteau whiteness test — round 11.
# ---------------------------------------------------------------------------

LJUNG_BOX_ORACLE = """
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2025-01-01', CAST(ts AS DATE)) AS x,
             CAST(sum(CAST(floor(value * 1000) AS BIGINT)) // count(*)
                  AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), nd AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
      FROM daily GROUP BY 1
    ), pairs AS (
      SELECT a.event_type, l.lag, a.y AS ya, b.y AS yb
      FROM (SELECT unnest(range(1, 8)) AS lag) l
      JOIN daily a ON TRUE
      JOIN daily b ON b.event_type = a.event_type AND b.x = a.x + l.lag
    ), suff AS (
      SELECT event_type, lag, count(*) AS n,
             CAST(sum(ya) AS BIGINT)      AS sa,
             CAST(sum(yb) AS BIGINT)      AS sb,
             CAST(sum(ya * yb) AS BIGINT) AS sab,
             CAST(sum(ya * ya) AS BIGINT) AS saa,
             CAST(sum(yb * yb) AS BIGINT) AS sbb
      FROM pairs GROUP BY event_type, lag
    ), acf AS (
      SELECT s.event_type, CAST(s.lag AS INT) AS lag, d.n_days,
             CAST(floor((s.n * 1.0 * s.sab - s.sa * 1.0 * s.sb)
                        / sqrt((s.n * 1.0 * s.saa - s.sa * 1.0 * s.sa)
                               * (s.n * 1.0 * s.sbb - s.sb * 1.0 * s.sb))
                        * 1e6 + 0.5001) AS BIGINT) AS acf_e6
      FROM suff s JOIN nd d USING (event_type)
    ), terms AS (
      SELECT event_type, lag, n_days, acf_e6,
             CAST(CAST(n_days AS HUGEINT) * (n_days + 2)
                  * acf_e6 * acf_e6 // (n_days - lag) AS BIGINT)
               AS lb_term_e12
      FROM acf
    )
    SELECT event_type, lag, n_days, acf_e6, lb_term_e12,
           CAST(sum(lb_term_e12)
                OVER (PARTITION BY event_type ORDER BY lag) AS BIGINT)
             AS lb_q_e12
    FROM terms
    ORDER BY event_type, lag
"""


@query("ts_ljung_box_whiteness", oracle=LJUNG_BOX_ORACLE)
def ts_ljung_box_whiteness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test of each event type's daily series at
    lags 1..7 — the whiteness gate every forecaster's residuals face:
    where ts_autocorrelation_daily reports the lag-k correlations one
    at a time, Q_m = n(n+2) * sum_{k<=m} r_k^2/(n-k) pools them into
    one is-there-ANY-serial-structure statistic (chi-square, m df),
    reported cumulatively so every prefix m = 1..7 is read off one
    result.

    Determinism: r_k is the EXACT acf_e6 integer the ACF op publishes
    (identical suffstat double expression, e6-floored with the ulp
    nudge); each Ljung-Box term is then pure integer arithmetic
    n(n+2)*acf_e6^2 DIV (n-k) at e12 scale (HUGEIN/DECIMAL(38,0)
    intermediates — no float summation order anywhere), and the
    cumulative Q is an integer running sum over the 7-row lag frame.

    Scale: one map-side-combinable shuffle to the (type, day)
    dictionary; the lag self-join and the cumulative window are
    O(days x 7) per type regardless of event volume, and the running
    sum partitions by event_type.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    statistical surface (internal/storage/types.go:3); this is
    [TARGET] inference machinery.
    """
    from pyspark.sql.window import Window as W

    dec = "decimal(38,0)"
    daily = (
        load_table(spark, "events", sf_dir)
        .select(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2025-01-01").cast("date")
            ).alias("x"),
            F.floor(F.col("value") * 1000).cast("bigint").alias("v_e3"),
        )
        .groupBy("event_type", "x")
        .agg(F.expr("CAST(sum(v_e3) DIV count(*) AS BIGINT)").alias("y"))
        # consumed by both lag-join sides and the per-type day count
        .localCheckpoint(eager=False)
    )
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    a = daily.select("event_type", "x", F.col("y").alias("ya"))
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    pairs = a.crossJoin(F.broadcast(lags)).join(
        b,
        (F.col("event_type") == F.col("et_b"))
        & (F.col("xb") == F.col("x") + F.col("lag")),
    )
    ya, yb = F.col("ya"), F.col("yb")
    suff = pairs.groupBy("event_type", "lag").agg(
        F.count("*").alias("n"),
        F.sum(ya).cast("long").alias("sa"),
        F.sum(yb).cast("long").alias("sb"),
        F.sum(ya * yb).cast("long").alias("sab"),
        F.sum(ya * ya).cast("long").alias("saa"),
        F.sum(yb * yb).cast("long").alias("sbb"),
    )
    acf = suff.join(nd, "event_type").select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        "n_days",
        F.floor(
            (F.col("n") * 1.0 * F.col("sab") - F.col("sa") * 1.0 * F.col("sb"))
            / F.sqrt(
                (F.col("n") * 1.0 * F.col("saa") - F.col("sa") * 1.0 * F.col("sa"))
                * (F.col("n") * 1.0 * F.col("sbb") - F.col("sb") * 1.0 * F.col("sb"))
            )
            * 1e6
            + 0.5001
        )
        .cast("bigint")
        .alias("acf_e6"),
    )
    terms = acf.select(
        "event_type",
        "lag",
        "n_days",
        "acf_e6",
        F.expr(
            f"CAST(CAST(n_days AS {dec}) * (n_days + 2)"
            " * acf_e6 * acf_e6 DIV (n_days - lag) AS BIGINT)"
        ).alias("lb_term_e12"),
    )
    return terms.select(
        "event_type",
        "lag",
        "n_days",
        "acf_e6",
        "lb_term_e12",
        F.sum("lb_term_e12")
        .over(W.partitionBy("event_type").orderBy("lag"))
        .cast("long")
        .alias("lb_q_e12"),
    ).orderBy("event_type", "lag")


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test for randomness — round 11.
# ---------------------------------------------------------------------------

RUNS_TEST_ORACLE = """
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2025-01-01', CAST(ts AS DATE)) AS day,
             CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), nd AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS ndays
      FROM daily GROUP BY 1
    ), ranked AS (
      SELECT d.event_type, d.y,
             row_number() OVER (PARTITION BY d.event_type
                                ORDER BY d.y, d.day) AS rk,
             n.ndays
      FROM daily d JOIN nd n USING (event_type)
    ), med AS (
      SELECT event_type, y AS med FROM ranked
      WHERE rk = (ndays + 1) // 2
    ), signs AS (
      SELECT d.event_type, d.day,
             CASE WHEN d.y > m.med THEN 1 ELSE 0 END AS s
      FROM daily d JOIN med m USING (event_type)
      WHERE d.y <> m.med
    ), chg AS (
      SELECT event_type, s,
             CASE WHEN lag(s) OVER (PARTITION BY event_type ORDER BY day)
                       IS DISTINCT FROM s THEN 1 ELSE 0 END AS c
      FROM signs
    ), agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(s) AS BIGINT) AS n1,
             CAST(count(*) - sum(s) AS BIGINT) AS n2,
             CAST(sum(c) AS BIGINT) AS runs
      FROM chg GROUP BY event_type
    )
    SELECT event_type, n, n1, n2, runs,
           CAST(1000000 + 2 * n1 * n2 * 1000000 // n AS BIGINT)
             AS expected_runs_e6,
           CAST(CASE WHEN n * (runs - 1) >= 2 * n1 * n2
                     THEN 1 ELSE -1 END
                * (CAST(n AS HUGEINT) * (runs - 1) - 2 * n1 * n2)
                * (CAST(n AS HUGEINT) * (runs - 1) - 2 * n1 * n2)
                * (n - 1) * 1000000
                // NULLIF(2 * CAST(n1 AS HUGEINT) * n2
                          * (2 * CAST(n1 AS HUGEINT) * n2 - n), 0)
                AS BIGINT) AS z2_signed_e6
    FROM agg
    ORDER BY event_type
"""


@query("stats_runs_test_daily", oracle=RUNS_TEST_ORACLE)
def stats_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test of each event type's daily revenue
    series against its own median — the randomness gate that catches
    what autocorrelation misses: too FEW runs of above/below-median
    days means trending or regime-stickiness, too MANY means
    oscillation, even when the lag-k correlations individually look
    flat (ts_ljung_box_whiteness pools those; this tests the SIGN
    pattern).

    Determinism: the per-type median is the lower median — the value
    at row_number (n+1) DIV 2 over the total order (y, day) — so both
    engines pick the identical element with no interpolation;
    median-equal days drop (the standard convention); the run count is
    counted directly as the number of rows whose sign IS DISTINCT
    FROM their predecessor's — the first row's NULL lag makes it a
    change in both engines, folding the +1 in. E[R] and the signed z^2
    ((n(R-1) - 2*n1*n2)^2 * (n-1)) / (2*n1*n2*(2*n1*n2 - n)) are exact
    e6 integer rationals (HUGEINT/DECIMAL(38,0)), NULL on degenerate
    all-same-sign series in both engines.

    Scale: one map-side-combinable shuffle to the (type, day)
    dictionary; every window is type-partitioned over calendar-bounded
    frames (the binseg convention); the statistics are scalar
    aggregates per type.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    statistical surface (internal/storage/types.go:3); this is
    [TARGET] inference machinery.
    """
    from pyspark.sql.window import Window as W

    dec = "decimal(38,0)"
    daily = (
        load_table(spark, "events", sf_dir)
        .groupBy(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2025-01-01").cast("date")
            ).alias("day"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 1000).cast("bigint"))
            .cast("long")
            .alias("y")
        )
        # consumed by the median-rank branch and the sign join
        .localCheckpoint(eager=False)
    )
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("ndays")
    )
    ranked = daily.join(nd, "event_type").select(
        "event_type",
        "y",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("y", "day"))
        .cast("long")
        .alias("rk"),
        "ndays",
    )
    med = ranked.where(
        F.col("rk") == F.expr("CAST((ndays + 1) DIV 2 AS BIGINT)")
    ).select("event_type", F.col("y").alias("med"))
    signs = (
        daily.join(med, "event_type")
        .where(F.col("y") != F.col("med"))
        .select(
            "event_type",
            "day",
            F.when(F.col("y") > F.col("med"), 1).otherwise(0).alias("s"),
        )
    )
    wd = W.partitionBy("event_type").orderBy("day")
    chg = signs.select(
        "event_type",
        "s",
        F.when(
            ~F.lag("s").over(wd).eqNullSafe(F.col("s")), 1
        )
        .otherwise(0)
        .alias("c"),
    )
    agg = chg.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("s").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("s")).cast("long").alias("n2"),
        F.sum("c").cast("long").alias("runs"),
    )
    return agg.select(
        "event_type",
        "n",
        "n1",
        "n2",
        "runs",
        F.expr(
            "CAST(1000000 + 2 * n1 * n2 * 1000000 DIV n AS BIGINT)"
        ).alias("expected_runs_e6"),
        F.expr(
            f"CAST(CASE WHEN n * (runs - 1) >= 2 * n1 * n2"
            " THEN 1 ELSE -1 END"
            f" * (CAST(n AS {dec}) * (runs - 1) - 2 * n1 * n2)"
            f" * (CAST(n AS {dec}) * (runs - 1) - 2 * n1 * n2)"
            " * (n - 1) * 1000000"
            f" DIV NULLIF(2 * CAST(n1 AS {dec}) * n2"
            f" * (2 * CAST(n1 AS {dec}) * n2 - n), 0)"
            " AS BIGINT)"
        ).alias("z2_signed_e6"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Durbin-Watson residual autocorrelation — round 11.
# ---------------------------------------------------------------------------

DURBIN_WATSON_ORACLE = """
    WITH daily AS (
      SELECT datediff('day', DATE '2025-01-01', o_orderdate) AS x,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS y
      FROM orders GROUP BY 1
    ), suff AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM daily
    ), fit AS (
      SELECT n, sx, sy,
             CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS d,
             CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS b
      FROM suff
    ), r AS (
      SELECT d2.x,
             (CAST(f.n AS HUGEINT) * f.d * d2.y - f.d * f.sy
              - f.b * (CAST(f.n AS HUGEINT) * d2.x - f.sx))
             // ((CAST(f.n AS HUGEINT) * f.d) // 100) AS re2
      FROM daily d2 CROSS JOIN fit f
    ), lagged AS (
      SELECT re2, lag(re2) OVER (ORDER BY x) AS pre2 FROM r
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN pre2 IS NOT NULL
                         THEN (re2 - pre2) * (re2 - pre2) END)
                * 1000000
                // NULLIF(sum(re2 * re2), 0) AS BIGINT) AS dw_e6
    FROM lagged
"""


@query("stats_durbin_watson", oracle=DURBIN_WATSON_ORACLE)
def stats_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic of the daily-revenue-vs-time OLS
    residuals — the classic did-the-regression-miss-serial-structure
    gate (DW ~ 2 means white residuals, toward 0 positive
    autocorrelation, toward 4 negative): Cook's distance
    (stats_cooks_distance_days) asks which points bend the line, DW
    asks whether the line's errors are even independent — the two
    diagnostics every OLS readout should ship with.

    Determinism: residuals come from the same exact integer
    construction as Cook's (E_t = n*D*y_t - D*Sy - B*(n*x_t - Sx)),
    then are truncated ONCE to centi-cent scale by the exact integer
    division E_t DIV (nD DIV 100) — identical truncation in both
    engines — so the squared sums fit HUGEINT/DECIMAL(38,0) through
    sf1000 (r^2*n ~ 1e33) and DW is the exact e6 integer quotient
    sum((r_t - r_{{t-1}})^2) * 1e6 DIV sum(r_t^2). No float exists
    anywhere in this op.

    Scale: one map-side-combinable shuffle of orders to the
    calendar-day grid (checkpointed); the fit is a 1-row broadcast;
    the single-series lag runs over the calendar-bounded day grid
    (the orders_mom_growth allowlist class — rows = days, not data).

    Reference parity: the reference (j0shgrant/gotsdb) has no
    statistical surface (internal/storage/types.go:3); this is
    [TARGET] inference machinery.
    """
    from pyspark.sql.window import Window as W

    dec = "decimal(38,0)"
    daily = (
        load_table(spark, "orders", sf_dir)
        .groupBy(
            F.datediff(
                F.col("o_orderdate"), F.lit("2025-01-01").cast("date")
            ).alias("x")
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("long")
            .alias("y")
        )
        # consumed by the suffstat pass and the residual projection
        .localCheckpoint(eager=False)
    )
    suff = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
    )
    fit = suff.select(
        "n",
        "sx",
        "sy",
        F.expr(f"CAST(n AS {dec}) * sxx - CAST(sx AS {dec}) * sx").alias("d"),
        F.expr(f"CAST(n AS {dec}) * sxy - CAST(sx AS {dec}) * sy").alias("b"),
    )
    r = daily.crossJoin(F.broadcast(fit)).select(
        "x",
        F.expr(
            f"(CAST(n AS {dec}) * d * y - d * sy"
            f" - b * (CAST(n AS {dec}) * x - sx))"
            f" DIV ((CAST(n AS {dec}) * d) DIV 100)"
        ).alias("re2"),
    )
    lagged = r.select(
        "re2", F.lag("re2").over(W.orderBy("x")).alias("pre2")
    )
    return lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr(
            "CAST(sum(CASE WHEN pre2 IS NOT NULL"
            " THEN CAST(re2 - pre2 AS DECIMAL(38,0)) * (re2 - pre2) END)"
            " * 1000000"
            " DIV NULLIF(sum(CAST(re2 AS DECIMAL(38,0)) * re2), 0)"
            " AS BIGINT)"
        ).alias("dw_e6"),
    )


# ---------------------------------------------------------------------------
# Turning-points randomness test — round 11.
# ---------------------------------------------------------------------------

TURNING_POINTS_ORACLE = """
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2025-01-01', CAST(ts AS DATE)) AS day,
             CAST(sum(CAST(floor(value * 1000) AS BIGINT)) // count(*)
                  AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), tri AS (
      SELECT event_type, y,
             lag(y)  OVER w AS py,
             lead(y) OVER w AS ny
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ), agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN py < y AND ny < y THEN 1 ELSE 0 END)
                  AS BIGINT) AS peaks,
             CAST(sum(CASE WHEN py > y AND ny > y THEN 1 ELSE 0 END)
                  AS BIGINT) AS troughs
      FROM tri GROUP BY event_type
    )
    SELECT event_type, n AS n_days, peaks, troughs,
           CAST(peaks + troughs AS BIGINT) AS turning_points,
           CAST(2 * (n - 2) * 1000000 // 3 AS BIGINT) AS expected_e6,
           CAST(CASE WHEN 3 * (peaks + troughs) >= 2 * (n - 2)
                     THEN 1 ELSE -1 END
                * (3 * (peaks + troughs) - 2 * (n - 2))
                * (3 * (peaks + troughs) - 2 * (n - 2))
                * 10 * 1000000
                // NULLIF(9 * (16 * n - 29), 0) AS BIGINT)
             AS z2_signed_e6
    FROM agg
    ORDER BY event_type
"""


@query("stats_turning_points_test", oracle=TURNING_POINTS_ORACLE)
def stats_turning_points_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-points test of each event type's daily series — the
    third classical randomness gate beside the runs test (sign
    pattern) and Ljung-Box (pooled correlation): count strict local
    peaks and troughs; an i.i.d. series has E[T] = 2(n-2)/3 and
    Var[T] = (16n-29)/90, too few turning points means momentum, too
    many means alternation. Ties produce neither a peak nor a trough
    (strict inequalities), which is exactly how both engines evaluate
    the same comparisons.

    Exact integers: T, E[T] as an e6 quotient, and the signed z^2 =
    (3T - 2(n-2))^2 * 10 / (9*(16n - 29)) as an exact e6 integer
    rational — the 1/9 from squaring (T - E) = (3T - 2(n-2))/3 and
    the 90/9 = 10 folded exactly.

    Scale: one map-side-combinable shuffle to the (type, day)
    dictionary; one type-partitioned lag/lead window over the
    calendar-bounded frame; a scalar aggregate per type.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    statistical surface (internal/storage/types.go:3); this is
    [TARGET] inference machinery.
    """
    from pyspark.sql.window import Window as W

    daily = (
        load_table(spark, "events", sf_dir)
        .groupBy(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2025-01-01").cast("date")
            ).alias("day"),
        )
        .agg(F.expr(
            "CAST(sum(CAST(floor(value * 1000) AS BIGINT)) DIV count(*)"
            " AS BIGINT)"
        ).alias("y"))
    )
    w = W.partitionBy("event_type").orderBy("day")
    tri = daily.select(
        "event_type",
        "y",
        F.lag("y").over(w).alias("py"),
        F.lead("y").over(w).alias("ny"),
    )
    agg = tri.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when((F.col("py") < F.col("y")) & (F.col("ny") < F.col("y")), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("peaks"),
        F.sum(
            F.when((F.col("py") > F.col("y")) & (F.col("ny") > F.col("y")), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("troughs"),
    )
    return agg.select(
        "event_type",
        F.col("n").alias("n_days"),
        "peaks",
        "troughs",
        (F.col("peaks") + F.col("troughs"))
        .cast("long")
        .alias("turning_points"),
        F.expr("CAST(2 * (n - 2) * 1000000 DIV 3 AS BIGINT)").alias(
            "expected_e6"
        ),
        F.expr(
            "CAST(CASE WHEN 3 * (peaks + troughs) >= 2 * (n - 2)"
            " THEN 1 ELSE -1 END"
            " * (3 * (peaks + troughs) - 2 * (n - 2))"
            " * (3 * (peaks + troughs) - 2 * (n - 2))"
            " * 10 * 1000000"
            " DIV NULLIF(9 * (16 * n - 29), 0) AS BIGINT)"
        ).alias("z2_signed_e6"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Mann-Kendall trend test — round 11.
# ---------------------------------------------------------------------------

MANN_KENDALL_ORACLE = """
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2025-01-01', CAST(ts AS DATE)) AS day,
             CAST(sum(CAST(floor(value * 1000) AS BIGINT)) // count(*)
                  AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT a.event_type,
             CAST(sum(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END)
                  AS BIGINT) AS s
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.day > a.day
      GROUP BY a.event_type
    ), nd AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n
      FROM daily GROUP BY 1
    ), ties AS (
      SELECT event_type,
             CAST(coalesce(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)),
                           0) AS HUGEINT) AS tie_term
      FROM (
        SELECT event_type, y, count(*) AS t
        FROM daily GROUP BY event_type, y
      ) g WHERE t > 1
      GROUP BY event_type
    )
    SELECT n.event_type, n.n AS n_days, s.s AS kendall_s,
           CAST((CAST(n.n AS HUGEINT) * (n.n - 1) * (2 * n.n + 5)
                 - coalesce(t.tie_term, 0)) // 18 AS BIGINT) AS var_s,
           CAST(CASE WHEN s.s >= 0 THEN 1 ELSE -1 END
                * CAST(s.s AS HUGEINT) * s.s * 18 * 1000000
                // NULLIF(CAST(n.n AS HUGEINT) * (n.n - 1) * (2 * n.n + 5)
                          - coalesce(t.tie_term, 0), 0) AS BIGINT)
             AS z2_signed_e6
    FROM nd n
    JOIN s USING (event_type)
    LEFT JOIN ties t USING (event_type)
    ORDER BY event_type
"""


@query("stats_mann_kendall_trend", oracle=MANN_KENDALL_ORACLE)
def stats_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test per event type — THE
    nonparametric is-it-drifting test hydrology and monitoring run
    before fitting any slope (stats_theil_sen_slope is its paired
    estimator): S = sum over day pairs i < j of sign(y_j - y_i),
    with the tie-corrected variance Var(S) = [n(n-1)(2n+5) -
    sum t(t-1)(2t+5)]/18.

    Exact integers: S from sign comparisons, the tie term from the
    per-type value dictionary, and the signed z^2 = 18*S^2 /
    (n(n-1)(2n+5) - tie_term) as an exact e6 integer rational in
    HUGEINT/DECIMAL(38,0); NULL on a constant series in both engines.

    Scale: the pair enumeration is a self-join on the (type, day)
    DICTIONARY (checkpointed) — pairs are bounded by the calendar
    squared per type (~3M rows for 2 years x 5 types at ANY data
    volume), never by row count; the docstring-quarantined quadratic
    class does not apply because the quadratic is over the bounded
    time grid. One fact shuffle, then dictionary-sized work.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    statistical surface (internal/storage/types.go:3); this is
    [TARGET] inference machinery.
    """
    dec = "decimal(38,0)"
    daily = (
        load_table(spark, "events", sf_dir)
        .groupBy(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2025-01-01").cast("date")
            ).alias("day"),
        )
        .agg(F.expr(
            "CAST(sum(CAST(floor(value * 1000) AS BIGINT)) DIV count(*)"
            " AS BIGINT)"
        ).alias("y"))
        # consumed by both pair-join sides, the day count and the ties
        .localCheckpoint(eager=False)
    )
    a = daily.select("event_type", F.col("day").alias("da"), F.col("y").alias("ya"))
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("day").alias("db"),
        F.col("y").alias("yb"),
    )
    s = (
        a.join(
            b,
            (F.col("event_type") == F.col("et_b")) & (F.col("db") > F.col("da")),
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("yb") > F.col("ya"), 1)
                .when(F.col("yb") < F.col("ya"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s")
        )
    )
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ties = (
        daily.groupBy("event_type", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .where(F.col("t") > 1)
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t").cast(dec) * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0).cast(dec),
            ).alias("tie_term")
        )
    )
    return (
        nd.join(s, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.col("s").alias("kendall_s"),
            F.expr(
                f"CAST((CAST(n AS {dec}) * (n - 1) * (2 * n + 5)"
                f" - coalesce(tie_term, CAST(0 AS {dec}))) DIV 18"
                " AS BIGINT)"
            ).alias("var_s"),
            F.expr(
                "CAST(CASE WHEN s >= 0 THEN 1 ELSE -1 END"
                f" * CAST(s AS {dec}) * s * 18 * 1000000"
                f" DIV NULLIF(CAST(n AS {dec}) * (n - 1) * (2 * n + 5)"
                f" - coalesce(tie_term, CAST(0 AS {dec})), 0) AS BIGINT)"
            ).alias("z2_signed_e6"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Bartlett variance-homogeneity test — round 11.
# ---------------------------------------------------------------------------

BARTLETT_ORACLE = """
    WITH base AS (
      SELECT o_orderpriority AS grp,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), g AS (
      SELECT grp,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS ss
      FROM base GROUP BY grp
    ), terms AS (
      SELECT n,
             CAST(floor((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                        / CAST(n AS DOUBLE) / 1048576.0)
                  AS BIGINT) AS vnum_mega,
             CAST(floor(CAST(n - 1 AS DOUBLE)
                        * ln((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                             / (CAST(n AS DOUBLE)
                                * CAST(n - 1 AS DOUBLE)))
                        * 1e9 + 0.5001) AS BIGINT) AS ln_term_e9,
             CAST(1000000000000 // (n - 1) AS BIGINT) AS inv_e12
      FROM g
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS bign,
             CAST(sum(vnum_mega) AS BIGINT) AS pooled_mega,
             CAST(sum(ln_term_e9) AS BIGINT) AS sum_ln_e9,
             CAST(sum(inv_e12) AS BIGINT) AS inv_sum_e12
      FROM terms
    )
    SELECT k AS n_groups, bign AS n_total,
           CAST(floor(((CAST(bign AS DOUBLE) - CAST(k AS DOUBLE))
                        * ln(CAST(pooled_mega AS DOUBLE) * 1048576.0
                             / (CAST(bign AS DOUBLE) - CAST(k AS DOUBLE)))
                       - CAST(sum_ln_e9 AS DOUBLE) / 1e9)
                      / (1.0 + (CAST(inv_sum_e12 AS DOUBLE) / 1e12
                                - 1.0 / (CAST(bign AS DOUBLE)
                                         - CAST(k AS DOUBLE)))
                               / (3.0 * (CAST(k AS DOUBLE) - 1.0)))
                      * 1e6 + 0.5001) AS BIGINT) AS bartlett_chi2_e6
    FROM tot
"""


@query("stats_bartlett_variance", oracle=BARTLETT_ORACLE)
def stats_bartlett_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test of variance homogeneity across the 5 order
    priorities — the PARAMETRIC complement to stats_brown_forsythe:
    Bartlett is the most powerful equal-variance test under normality
    (it is the likelihood-ratio test), Brown-Forsythe the robust one;
    running both is how a practitioner attributes a rejection to
    variance vs to tails.

    Determinism — no order-sensitive float sum: per-group sufficient
    statistics (n, S, SS) are exact integers; each group's
    (n_i - 1) * ln(var_i) term is e9-floored to an INTEGER before the
    cross-group sum (the stats_information_gain idiom); the pooled
    variance numerator per group is floor((n*SS - S^2)/n / 2^20) of
    the IDENTICAL double expression, quantized to 2^20 units so the
    BIGINT holds through sf1000 — two engine traps live here: Spark's
    integral DIV returns LONG and silently overflowed at sf1 where the
    raw quotient is ~6e19 (the round-10 IRLS advice class), and
    Spark's floor() ALSO returns BIGINT where DuckDB's returns DOUBLE,
    so the un-quantized floor re-overflowed the same way. 1/(n_i - 1)
    is the exact integer 1e12 DIV (n_i - 1). Every cross-group
    aggregate is an integer sum and the single final double expression
    is identical in both engines, e6-floored with the ulp nudge.

    Scale: one map-side-combinable shuffle of orders to the 5-group
    sufficient statistics, then a 5-row scalar aggregate. Nothing
    else.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    statistical surface (internal/storage/types.go:3); this is
    [TARGET] inference machinery.
    """
    dec = "decimal(38,0)"
    g = (
        load_table(spark, "orders", sf_dir)
        .select(
            F.col("o_orderpriority").alias("grp"),
            F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("s"),
            F.sum(F.col("cents").cast(dec) * F.col("cents")).alias("ss"),
        )
    )
    terms = g.select(
        "n",
        F.expr(
            "CAST(floor((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)"
            " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
            " / CAST(n AS DOUBLE) / 1048576.0) AS BIGINT)"
        ).alias("vnum_mega"),
        F.expr(
            "CAST(floor(CAST(n - 1 AS DOUBLE)"
            " * ln((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)"
            " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
            " / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))"
            " * 1e9 + 0.5001) AS BIGINT)"
        ).alias("ln_term_e9"),
        F.expr("CAST(1000000000000 DIV (n - 1) AS BIGINT)").alias("inv_e12"),
    )
    tot = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("bign"),
        F.sum("vnum_mega").cast("long").alias("pooled_mega"),
        F.sum("ln_term_e9").cast("long").alias("sum_ln_e9"),
        F.sum("inv_e12").cast("long").alias("inv_sum_e12"),
    )
    return tot.select(
        F.col("k").alias("n_groups"),
        F.col("bign").alias("n_total"),
        F.expr(
            "CAST(floor(((CAST(bign AS DOUBLE) - CAST(k AS DOUBLE))"
            " * ln(CAST(pooled_mega AS DOUBLE) * 1048576.0"
            " / (CAST(bign AS DOUBLE) - CAST(k AS DOUBLE)))"
            " - CAST(sum_ln_e9 AS DOUBLE) / 1e9)"
            " / (1.0 + (CAST(inv_sum_e12 AS DOUBLE) / 1e12"
            " - 1.0 / (CAST(bign AS DOUBLE) - CAST(k AS DOUBLE)))"
            " / (3.0 * (CAST(k AS DOUBLE) - 1.0)))"
            " * 1e6 + 0.5001) AS BIGINT)"
        ).alias("bartlett_chi2_e6"),
    )


# ---------------------------------------------------------------------------
# Hodges-Lehmann shift estimator — round 12.
# ---------------------------------------------------------------------------

HODGES_LEHMANN_ORACLE = """
    WITH base AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_extendedprice * 100) AS BIGINT) // 10000 AS g
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
    ), da AS (
      SELECT g AS ga, CAST(count(*) AS BIGINT) AS ca
      FROM base WHERE flag = 'A' GROUP BY g
    ), dr AS (
      SELECT g AS gr, CAST(count(*) AS BIGINT) AS cr
      FROM base WHERE flag = 'R' GROUP BY g
    ), diffs AS (
      SELECT ga - gr AS d, CAST(sum(ca * cr) AS BIGINT) AS w
      FROM da CROSS JOIN dr GROUP BY ga - gr
    ), ranked AS (
      SELECT d, w,
             sum(w) OVER (ORDER BY d
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cw
      FROM diffs
    ), tot AS (
      SELECT CAST(sum(ca) AS BIGINT) AS n_a FROM da
    ), tot_r AS (
      SELECT CAST(sum(cr) AS BIGINT) AS n_r FROM dr
    ), med AS (
      SELECT CAST(min(d) AS BIGINT) AS hl_grid
      FROM ranked CROSS JOIN tot CROSS JOIN tot_r
      WHERE 2 * cw >= n_a * n_r
    )
    SELECT t.n_a, r.n_r,
           CAST(t.n_a * r.n_r AS BIGINT) AS n_pairs,
           m.hl_grid AS hl_shift_usd100,
           CAST(m.hl_grid * 10000 AS BIGINT) AS hl_shift_cents
    FROM tot t CROSS JOIN tot_r r CROSS JOIN med m
"""


@query("stats_hodges_lehmann_shift", oracle=HODGES_LEHMANN_ORACLE)
def stats_hodges_lehmann_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann shift estimator between returnflag groups A and
    R: the MEDIAN of all pairwise differences price_A - price_R — the
    robust LOCATION companion to stats_mann_whitney_u the way
    stats_theil_sen_slope companions stats_mann_kendall_trend: U says
    WHETHER one group dominates, HL says BY HOW MUCH, immune to the
    tail outliers that drag the difference of means.

    The n_a x n_r pair cloud is never materialized at row grain: both
    sides collapse to a COARSENED $100-grid dictionary first (the
    price domain spans ~$900-$105,000, so each dictionary is <= ~1,050
    rows forever — value-domain-bounded, volume-independent), the
    bounded dictionary pair join carries count products as weights,
    and the weighted LOWER median (smallest difference whose
    cumulative weight reaches half of n_a * n_r, the
    stats_weighted_median_price convention) comes from one dist_rank
    running sum over the difference dictionary — never a data-sized
    window, never an all-pairs row join.

    Determinism: grid cells, count products, cumulative weights and
    the crossing point are all exact integers; no float arithmetic
    anywhere.

    Scale: one map-side-combinable shuffle to each grid dictionary;
    the pair join is an intended broadcast nested loop over two
    value-domain-bounded (~1k-row) frames (~1M weighted pairs
    regardless of data volume); one linear dist_rank over the ~2k-row
    difference dictionary. At 100 TB every frame past the first
    shuffle keeps exactly the same size.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    statistical surface (internal/storage/types.go:3); this is
    [TARGET] inference machinery.
    """
    from gotsdb_spark.operators.distrank import dist_rank

    base = (
        load_table(spark, "lineitem", sf_dir)
        .where(F.col("l_returnflag").isin("A", "R"))
        .select(
            F.col("l_returnflag").alias("flag"),
            F.expr(
                "CAST(floor(l_extendedprice * 100) AS BIGINT) DIV 10000"
            ).alias("g"),
        )
        .localCheckpoint(eager=False)
    )
    da = (
        base.where(F.col("flag") == "A")
        .groupBy(F.col("g").alias("ga"))
        .agg(F.count(F.lit(1)).cast("long").alias("ca"))
        .localCheckpoint(eager=False)
    )
    dr = (
        base.where(F.col("flag") == "R")
        .groupBy(F.col("g").alias("gr"))
        .agg(F.count(F.lit(1)).cast("long").alias("cr"))
        .localCheckpoint(eager=False)
    )
    diffs = (
        da.crossJoin(F.broadcast(dr))
        .groupBy((F.col("ga") - F.col("gr")).alias("d"))
        .agg(F.sum(F.col("ca") * F.col("cr")).cast("long").alias("w"))
    )
    ranked = dist_rank(diffs, ["d"], rank_col="__hl_rk", sum_cols={"cw": "w"})
    tot = da.agg(F.sum("ca").cast("long").alias("n_a")).crossJoin(
        dr.agg(F.sum("cr").cast("long").alias("n_r"))
    )
    med = (
        ranked.crossJoin(F.broadcast(tot))
        .where(2 * F.col("cw") >= F.col("n_a") * F.col("n_r"))
        .agg(F.min("d").cast("long").alias("hl_grid"))
    )
    return tot.crossJoin(F.broadcast(med)).select(
        "n_a",
        "n_r",
        F.expr("CAST(n_a * n_r AS BIGINT)").alias("n_pairs"),
        F.col("hl_grid").alias("hl_shift_usd100"),
        F.expr("CAST(hl_grid * 10000 AS BIGINT)").alias("hl_shift_cents"),
    )


# ---------------------------------------------------------------------------
# Partial autocorrelation via unrolled Durbin-Levinson — round 12.
# ---------------------------------------------------------------------------

# The recursion levels are identical expression TREES in both engines
# (same parenthesization, same operand order), so each IEEE double op
# matches bit for bit; inputs are the engine-agreed acf_e6 integers.
PACF_ORACLE = """
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2025-01-01', CAST(ts AS DATE)) AS x,
             CAST(sum(CAST(floor(value * 1000) AS BIGINT)) // count(*)
                  AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), lags AS (
      SELECT unnest([1, 2, 3, 4, 5]) AS lag
    ), suff AS (
      SELECT a.event_type, l.lag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a.y) AS BIGINT) AS sa,
             CAST(sum(b.y) AS BIGINT) AS sb,
             CAST(sum(a.y * b.y) AS BIGINT) AS sab,
             CAST(sum(a.y * a.y) AS BIGINT) AS saa,
             CAST(sum(b.y * b.y) AS BIGINT) AS sbb
      FROM daily a CROSS JOIN lags l
      JOIN daily b ON b.event_type = a.event_type
                  AND b.x = a.x + l.lag
      GROUP BY a.event_type, l.lag
    ), acf AS (
      SELECT event_type, lag,
             CAST(floor((n * 1.0 * sab - sa * 1.0 * sb)
                        / sqrt((n * 1.0 * saa - sa * 1.0 * sa)
                               * (n * 1.0 * sbb - sb * 1.0 * sb))
                        * 1e6 + 0.5001) AS BIGINT) AS acf_e6
      FROM suff
    ), piv AS (
      SELECT event_type,
             CAST(max(CASE WHEN lag = 1 THEN acf_e6 END) AS DOUBLE) / 1e6 AS r1,
             CAST(max(CASE WHEN lag = 2 THEN acf_e6 END) AS DOUBLE) / 1e6 AS r2,
             CAST(max(CASE WHEN lag = 3 THEN acf_e6 END) AS DOUBLE) / 1e6 AS r3,
             CAST(max(CASE WHEN lag = 4 THEN acf_e6 END) AS DOUBLE) / 1e6 AS r4,
             CAST(max(CASE WHEN lag = 5 THEN acf_e6 END) AS DOUBLE) / 1e6 AS r5
      FROM acf GROUP BY event_type
    ), l1 AS (
      SELECT *, r1 AS phi11 FROM piv
    ), l2 AS (
      SELECT *,
             (r2 - phi11 * r1) / (1.0 - phi11 * r1) AS phi22
      FROM l1
    ), l2b AS (
      SELECT *, phi11 - phi22 * phi11 AS phi21 FROM l2
    ), l3 AS (
      SELECT *,
             (r3 - (phi21 * r2 + phi22 * r1))
             / (1.0 - (phi21 * r1 + phi22 * r2)) AS phi33
      FROM l2b
    ), l3b AS (
      SELECT *,
             phi21 - phi33 * phi22 AS phi31,
             phi22 - phi33 * phi21 AS phi32
      FROM l3
    ), l4 AS (
      SELECT *,
             (r4 - (phi31 * r3 + phi32 * r2 + phi33 * r1))
             / (1.0 - (phi31 * r1 + phi32 * r2 + phi33 * r3)) AS phi44
      FROM l3b
    ), l4b AS (
      SELECT *,
             phi31 - phi44 * phi33 AS phi41,
             phi32 - phi44 * phi32 AS phi42,
             phi33 - phi44 * phi31 AS phi43
      FROM l4
    ), l5 AS (
      SELECT *,
             (r5 - (phi41 * r4 + phi42 * r3 + phi43 * r2 + phi44 * r1))
             / (1.0 - (phi41 * r1 + phi42 * r2 + phi43 * r3 + phi44 * r4))
               AS phi55
      FROM l4b
    )
    SELECT event_type,
           CAST(floor(phi11 * 1e6 + 0.5001) AS BIGINT) AS pacf1_e6,
           CAST(floor(phi22 * 1e6 + 0.5001) AS BIGINT) AS pacf2_e6,
           CAST(floor(phi33 * 1e6 + 0.5001) AS BIGINT) AS pacf3_e6,
           CAST(floor(phi44 * 1e6 + 0.5001) AS BIGINT) AS pacf4_e6,
           CAST(floor(phi55 * 1e6 + 0.5001) AS BIGINT) AS pacf5_e6
    FROM l5
    ORDER BY event_type
"""


@query("ts_pacf_daily", oracle=PACF_ORACLE)
def ts_pacf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation function of each event type's daily
    mean series at lags 1..5 via the Durbin-Levinson recursion,
    unrolled to a fixed 5-level expression chain (the Holt-Winters
    fixed-unroll convention) — the AR-ORDER diagnostic that
    ts_autocorrelation_daily and ts_ljung_box_whiteness cannot give:
    the ACF of an AR(p) process decays forever, but its PACF cuts off
    sharply after lag p, so the last significant pacf_k IS the model
    order a forecaster should fit.

    Determinism: the lag-1..5 autocorrelations are first computed as
    the SAME engine-agreed e6 integers as ts_autocorrelation_daily
    (six exact integer sufficient statistics per (type, lag), one
    double sqrt/divide per value); the recursion then runs on those
    integers as IDENTICAL expression trees in both engines — same
    parenthesization, same operand order, so every IEEE operation
    matches — and each phi_kk is e6-floored with the ulp nudge only
    at readout.

    Scale: events collapse to one row per (type, day) via a
    map-side-combinable groupBy (checkpointed — the lag self-join
    reads it twice); everything after that first shuffle is
    O(days x 5) per type regardless of event volume; the 5-row lag
    spine is a broadcast; the recursion is per-row column arithmetic
    on a type-dictionary-sized frame — no window, no extra shuffle.

    Reference parity: the reference (j0shgrant/gotsdb) has no series
    surface (internal/storage/types.go:3); this is [TARGET] inference
    machinery.
    """
    daily = (
        load_table(spark, "events", sf_dir)
        .select(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2025-01-01").cast("date")
            ).alias("x"),
            F.floor(F.col("value") * 1000).cast("bigint").alias("v_e3"),
        )
        .groupBy("event_type", "x")
        .agg(F.expr("CAST(sum(v_e3) DIV count(*) AS BIGINT)").alias("y"))
        .localCheckpoint(eager=False)
    )
    lags = daily.sparkSession.range(1, 6).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.select("event_type", "x", F.col("y").alias("ya"))
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    ya, yb = F.col("ya"), F.col("yb")
    suff = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("event_type") == F.col("et_b"))
            & (F.col("xb") == F.col("x") + F.col("lag")),
        )
        .groupBy("event_type", "lag")
        .agg(
            F.count("*").alias("n"),
            F.sum(ya).cast("long").alias("sa"),
            F.sum(yb).cast("long").alias("sb"),
            F.sum(ya * yb).cast("long").alias("sab"),
            F.sum(ya * ya).cast("long").alias("saa"),
            F.sum(yb * yb).cast("long").alias("sbb"),
        )
    )
    acf = suff.select(
        "event_type",
        "lag",
        F.expr(
            "CAST(floor((n * 1.0 * sab - sa * 1.0 * sb)"
            " / sqrt((n * 1.0 * saa - sa * 1.0 * sa)"
            "        * (n * 1.0 * sbb - sb * 1.0 * sb))"
            " * 1e6 + 0.5001) AS BIGINT)"
        ).alias("acf_e6"),
    )
    piv = acf.groupBy("event_type").agg(
        *[
            F.expr(
                f"CAST(max(CASE WHEN lag = {k} THEN acf_e6 END)"
                f" AS DOUBLE) / 1e6"
            ).alias(f"r{k}")
            for k in range(1, 6)
        ]
    )
    lvl = piv.withColumn("phi11", F.expr("r1"))
    lvl = lvl.withColumn(
        "phi22", F.expr("(r2 - phi11 * r1) / (1.0 - phi11 * r1)")
    )
    lvl = lvl.withColumn("phi21", F.expr("phi11 - phi22 * phi11"))
    lvl = lvl.withColumn(
        "phi33",
        F.expr(
            "(r3 - (phi21 * r2 + phi22 * r1))"
            " / (1.0 - (phi21 * r1 + phi22 * r2))"
        ),
    )
    lvl = lvl.withColumn("phi31", F.expr("phi21 - phi33 * phi22"))
    lvl = lvl.withColumn("phi32", F.expr("phi22 - phi33 * phi21"))
    lvl = lvl.withColumn(
        "phi44",
        F.expr(
            "(r4 - (phi31 * r3 + phi32 * r2 + phi33 * r1))"
            " / (1.0 - (phi31 * r1 + phi32 * r2 + phi33 * r3))"
        ),
    )
    lvl = lvl.withColumn("phi41", F.expr("phi31 - phi44 * phi33"))
    lvl = lvl.withColumn("phi42", F.expr("phi32 - phi44 * phi32"))
    lvl = lvl.withColumn("phi43", F.expr("phi33 - phi44 * phi31"))
    lvl = lvl.withColumn(
        "phi55",
        F.expr(
            "(r5 - (phi41 * r4 + phi42 * r3 + phi43 * r2 + phi44 * r1))"
            " / (1.0 - (phi41 * r1 + phi42 * r2 + phi43 * r3"
            " + phi44 * r4))"
        ),
    )
    return lvl.select(
        "event_type",
        *[
            F.expr(
                f"CAST(floor(phi{k}{k} * 1e6 + 0.5001) AS BIGINT)"
            ).alias(f"pacf{k}_e6")
            for k in range(1, 6)
        ],
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Seasonal Mann-Kendall trend test — round 13.
# ---------------------------------------------------------------------------

SEASONAL_MANN_KENDALL_ORACLE = """
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2025-01-01', CAST(ts AS DATE)) AS day,
             CAST(sum(CAST(floor(value * 1000) AS BIGINT)) // count(*)
                  AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), seasoned AS MATERIALIZED (
      SELECT event_type, ((day % 7) + 7) % 7 AS season, day, y FROM daily
    ), s AS (
      SELECT a.event_type,
             CAST(sum(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END)
                  AS BIGINT) AS s
      FROM seasoned a JOIN seasoned b
        ON b.event_type = a.event_type AND b.season = a.season
       AND b.day > a.day
      GROUP BY a.event_type
    ), per_season AS (
      SELECT event_type, season, CAST(count(*) AS BIGINT) AS m
      FROM seasoned GROUP BY 1, 2
    ), ties AS (
      SELECT event_type, season,
             CAST(coalesce(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)),
                           0) AS HUGEINT) AS tie_term
      FROM (
        SELECT event_type, season, y, count(*) AS t
        FROM seasoned GROUP BY event_type, season, y
      ) g WHERE t > 1
      GROUP BY event_type, season
    ), var_num AS (
      SELECT p.event_type,
             CAST(sum(p.m) AS BIGINT) AS n_days,
             CAST(count(*) AS BIGINT) AS n_seasons,
             CAST(sum(CAST(p.m AS HUGEINT) * (p.m - 1) * (2 * p.m + 5)
                      - coalesce(t.tie_term, 0)) AS HUGEINT) AS vnum
      FROM per_season p
      LEFT JOIN ties t
        ON t.event_type = p.event_type AND t.season = p.season
      GROUP BY p.event_type
    )
    SELECT v.event_type, v.n_days, v.n_seasons, s.s AS kendall_s_seasonal,
           CAST(v.vnum // 18 AS BIGINT) AS var_s,
           CAST(CASE WHEN s.s >= 0 THEN 1 ELSE -1 END
                * CAST(s.s AS HUGEINT) * s.s * 18 * 1000000
                // NULLIF(v.vnum, 0) AS BIGINT) AS z2_signed_e6
    FROM var_num v JOIN s USING (event_type)
    ORDER BY event_type
"""


@query("stats_seasonal_mann_kendall", oracle=SEASONAL_MANN_KENDALL_ORACLE)
def stats_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall trend test per event type (Hirsch-Slack):
    the monotonic-trend statistic computed WITHIN each weekday season
    and summed, S = sum_k S_k with Var(S) = sum_k [m_k(m_k-1)(2m_k+5)
    - sum_t t(t-1)(2t+5)]/18 — the trend reading that is immune to the
    weekly cycle ts_seasonal_strength quantifies (a pure day-of-week
    pattern contributes zero to every within-season pair, so a
    significant S here is real drift, not seasonality leaking into the
    plain stats_mann_kendall_trend pair sums).

    Composition: the same (type, day) dictionary and exact-integer
    pair algebra as stats_mann_kendall_trend, restricted to pairs
    sharing day % 7, with the tie correction applied per season and
    the per-season variance NUMERATORS summed before the single /18 —
    exact HUGEINT/DECIMAL(38,0) integers end to end, z^2 as a signed
    e6 rational, NULL on all-constant seasons in both engines.

    Scale: one map-side-combinable fact shuffle to the (type, day)
    dictionary (checkpointed — pair join, season sizes, and ties all
    consume it); the pair join is calendar-bounded PER SEASON
    (~104^2/2 pairs per weekday for 2 years at ANY data volume, 7x
    fewer pairs than the unrestricted test), never row-count-bounded.

    Reference parity: the reference (j0shgrant/gotsdb) has no
    statistical surface (internal/storage/types.go:3); this is
    [TARGET] inference machinery.
    """
    dec = "decimal(38,0)"
    seasoned = (
        load_table(spark, "events", sf_dir)
        .groupBy(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2025-01-01").cast("date")
            ).alias("day"),
        )
        .agg(F.expr(
            "CAST(sum(CAST(floor(value * 1000) AS BIGINT)) DIV count(*)"
            " AS BIGINT)"
        ).alias("y"))
        .withColumn("season", ((F.col("day") % 7) + 7) % 7)
        # consumed by both pair-join sides, the season sizes and the ties
        .localCheckpoint(eager=False)
    )
    a = seasoned.select(
        "event_type",
        "season",
        F.col("day").alias("da"),
        F.col("y").alias("ya"),
    )
    b = seasoned.select(
        F.col("event_type").alias("et_b"),
        F.col("season").alias("season_b"),
        F.col("day").alias("db"),
        F.col("y").alias("yb"),
    )
    s = (
        a.join(
            b,
            (F.col("event_type") == F.col("et_b"))
            & (F.col("season") == F.col("season_b"))
            & (F.col("db") > F.col("da")),
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("yb") > F.col("ya"), 1)
                .when(F.col("yb") < F.col("ya"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s")
        )
    )
    per_season = seasoned.groupBy("event_type", "season").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    ties = (
        seasoned.groupBy("event_type", "season", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .where(F.col("t") > 1)
        .groupBy("event_type", "season")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t").cast(dec) * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0).cast(dec),
            ).alias("tie_term")
        )
    )
    var_num = (
        per_season.join(ties, ["event_type", "season"], "left")
        .groupBy("event_type")
        .agg(
            F.sum("m").cast("long").alias("n_days"),
            F.count(F.lit(1)).cast("long").alias("n_seasons"),
            F.sum(
                F.col("m").cast(dec) * (F.col("m") - 1) * (2 * F.col("m") + 5)
                - F.coalesce("tie_term", F.lit(0).cast(dec))
            ).alias("vnum"),
        )
    )
    return (
        var_num.join(s, "event_type")
        .select(
            "event_type",
            "n_days",
            "n_seasons",
            F.col("s").alias("kendall_s_seasonal"),
            F.expr("CAST(vnum DIV 18 AS BIGINT)").alias("var_s"),
            F.expr(
                "CAST(CASE WHEN s >= 0 THEN 1 ELSE -1 END"
                f" * CAST(s AS {dec}) * s * 18 * 1000000"
                " DIV NULLIF(vnum, 0) AS BIGINT)"
            ).alias("z2_signed_e6"),
        )
        .orderBy("event_type")
    )
