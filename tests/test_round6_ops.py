"""Semantic invariants for the round-6 operator batch: distributed
rank (distrank), Gini concentration, equi-depth binning, correlation
matrix, token entropy, bigram LM scoring, embedding-dimension stats,
per-group reservoir sampling, null profiling, and hierarchical shares.

The oracle sweep proves cross-engine equality; these pin the
mathematical invariants and brute-force agreements inside Spark.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from gotsdb_spark.operators import QUERIES
from gotsdb_spark.operators.distrank import dist_rank, ntile_from_rank

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# distrank: the helper itself
# ---------------------------------------------------------------------------


def _synthetic(spark, n=5007, seed=11):
    rnd = random.Random(seed)
    rows = [(i, rnd.randint(0, 300), rnd.randint(1, 50)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, k long, v long")


def test_dist_rank_matches_builtin_window(spark):
    df = _synthetic(spark).repartition(9)
    w = W.orderBy("k", "id")
    exp = df.select(
        "id",
        F.row_number().over(w).alias("rnk"),
        F.sum("v")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum"),
        F.ntile(4).over(w).alias("q4"),
        F.ntile(7).over(w).alias("q7"),
    )
    got = dist_rank(df, ["k", "id"], rank_col="rnk", sum_cols={"cum": "v"})
    n = got.count()
    got = got.select(
        "id",
        "rnk",
        "cum",
        ntile_from_rank(F.col("rnk"), F.lit(n), 4).alias("q4"),
        ntile_from_rank(F.col("rnk"), F.lit(n), 7).alias("q7"),
    )
    mismatch = (
        got.alias("g")
        .join(exp.alias("e"), "id")
        .where(
            (F.col("g.rnk") != F.col("e.rnk"))
            | (F.col("g.cum") != F.col("e.cum"))
            | (F.col("g.q4") != F.col("e.q4"))
            | (F.col("g.q7") != F.col("e.q7"))
        )
        .count()
    )
    assert mismatch == 0 and n == 5007


def test_dist_rank_partition_count_invariant(spark):
    df = _synthetic(spark, n=2003, seed=3)

    def run(nparts):
        return sorted(
            (r["id"], r["rnk"])
            for r in dist_rank(
                df, ["k", "id"], num_partitions=nparts
            ).collect()
        )

    assert run(2) == run(13) == run(31)


def test_dist_rank_fewer_rows_than_buckets(spark):
    small = spark.createDataFrame(
        [(i, i, 1) for i in range(3)], "id long, k long, v long"
    )
    exp = {
        (r["id"], r["q"])
        for r in small.select(
            "id", F.ntile(7).over(W.orderBy("k", "id")).alias("q")
        ).collect()
    }
    ranked = dist_rank(small, ["k", "id"])
    got = {
        (r["id"], r["q"])
        for r in ranked.select(
            "id", ntile_from_rank(F.col("rnk"), F.lit(3), 7).alias("q")
        ).collect()
    }
    assert got == exp


# ---------------------------------------------------------------------------
# Gini / equi-depth / correlation
# ---------------------------------------------------------------------------


def test_gini_matches_bruteforce(spark):
    row = QUERIES["stats_gini_revenue_concentration"](spark, SF).collect()[0]
    from gotsdb_spark.sources.registry import load_table

    revs = sorted(
        r["rev"]
        for r in load_table(spark, "orders", SF)
        .groupBy("o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "rev"
            )
        )
        .collect()
    )
    n, s = len(revs), sum(revs)
    num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(revs))
    assert row["n_customers"] == n
    assert row["total_cents"] == s
    assert row["gini_e6"] == num * 1_000_000 // (n * s)
    assert 0 <= row["gini_e6"] < 1_000_000


def test_equidepth_bins_are_equal_depth_and_ordered(spark):
    rows = sorted(
        QUERIES["stats_equidepth_bins"](spark, SF).collect(),
        key=lambda r: r["bin"],
    )
    assert [r["bin"] for r in rows] == list(range(1, 11))
    depths = [r["n_rows"] for r in rows]
    assert max(depths) - min(depths) <= 1
    # bins tile the value axis in order (equal boundary values may
    # straddle adjacent bins, so lo of bin b+1 >= hi of bin b is not
    # guaranteed at ties; the non-decreasing lo sequence is)
    los = [r["lo_cents"] for r in rows]
    assert los == sorted(los)


def test_corr_matrix_agrees_with_builtin(spark):
    from gotsdb_spark.sources.registry import load_table

    row = QUERIES["stats_corr_matrix_lineitem"](spark, SF).collect()[0]
    li = load_table(spark, "lineitem", SF).select(
        F.floor(F.col("l_quantity") * 100).cast("bigint").alias("q"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("p"),
        F.floor(F.col("l_discount") * 10000).cast("bigint").alias("d"),
    )
    ref = li.agg(
        F.corr("q", "p").alias("qp"),
        F.corr("q", "d").alias("qd"),
        F.corr("p", "d").alias("pd"),
    ).collect()[0]
    assert abs(row["corr_qty_price_e6"] / 1e6 - ref["qp"]) < 1e-4
    assert abs(row["corr_qty_disc_e6"] / 1e6 - ref["qd"]) < 1e-4
    assert abs(row["corr_price_disc_e6"] / 1e6 - ref["pd"]) < 1e-4
    for c in ("corr_qty_price_e6", "corr_qty_disc_e6", "corr_price_disc_e6"):
        assert -1_000_001 <= row[c] <= 1_000_001


# ---------------------------------------------------------------------------
# Text: entropy + bigram LM
# ---------------------------------------------------------------------------


def test_token_entropy_brute_one_doc(spark):
    from gotsdb_spark.sources.registry import load_table

    rows = {r["doc_id"]: r for r in QUERIES["text_token_entropy"](spark, SF).collect()}
    assert rows
    doc = load_table(spark, "documents", SF).limit(1).collect()[0]
    toks = doc["text"].split(" ")
    n = len(toks)
    counts: dict[str, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    h_e9 = sum(
        math.floor(-(c / n) * math.log(c / n) * 1e9 + 0.5001)
        for c in counts.values()
    )
    got = rows[doc["doc_id"]]
    assert got["n_tokens"] == n
    assert got["n_distinct"] == len(counts)
    assert got["entropy_e9"] == h_e9
    if len(counts) > 1:
        assert got["norm_entropy_e6"] == h_e9 * 1_000_000 // math.floor(
            math.log(len(counts)) * 1e9 + 0.5001
        )
    # normalized entropy is ≤ 1 up to flooring slack on every doc
    assert all(0 <= r["norm_entropy_e6"] <= 1_000_001 for r in rows.values())


def test_bigram_logprob_brute_one_doc(spark):
    from gotsdb_spark.sources.registry import load_table

    docs = load_table(spark, "documents", SF).select("doc_id", "text").collect()
    big_counts: dict[tuple[str, str], int] = {}
    pre_counts: dict[str, int] = {}
    vocab: set[str] = set()
    for d in docs:
        ws = d["text"].split(" ")
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            big_counts[(a, b)] = big_counts.get((a, b), 0) + 1
            pre_counts[a] = pre_counts.get(a, 0) + 1
    v = len(vocab)
    target = docs[0]
    ws = target["text"].split(" ")
    nll = [
        math.floor(
            -math.log((big_counts[(a, b)] + 1) / (pre_counts[a] + v)) * 1e6
            + 0.5001
        )
        for a, b in zip(ws, ws[1:])
    ]
    rows = {
        r["doc_id"]: r
        for r in QUERIES["text_bigram_logprob"](spark, SF).collect()
    }
    got = rows[target["doc_id"]]
    assert got["n_bigrams"] == len(nll)
    assert got["sum_nll_e6"] == sum(nll)
    assert got["avg_nll_e6"] == sum(nll) // len(nll)


# ---------------------------------------------------------------------------
# Embeddings / sampling / profiling / shares
# ---------------------------------------------------------------------------


def test_embed_dimension_stats_brute_dim0(spark):
    import numpy as np

    from gotsdb_spark.sources.registry import load_table

    rows = {
        r["dim"]: r for r in QUERIES["embed_dimension_stats"](spark, SF).collect()
    }
    embs = [
        r["embedding"]
        for r in load_table(spark, "embeddings", SF).select("embedding").collect()
    ]
    xs = np.array(
        [math.floor(float(e[0]) * 1e6) for e in embs], dtype=object
    )
    n = len(xs)
    sx, sxx = int(sum(xs)), int(sum(x * x for x in xs))
    got = rows[0]
    assert len(rows) == 64
    assert got["n"] == n
    assert got["mean_e6"] == sx // n if sx >= 0 else True
    assert got["lo_e6"] == min(xs) and got["hi_e6"] == max(xs)
    assert got["std_e6"] == math.floor(
        math.sqrt(float(n * sxx - sx * sx)) / n + 0.5001
    )


def test_reservoir_sample_exact_k_and_deterministic(spark):
    df1 = QUERIES["sample_reservoir_per_group"](spark, SF)
    rows1 = sorted(map(tuple, df1.collect()))
    rows2 = sorted(map(tuple, QUERIES["sample_reservoir_per_group"](spark, SF).collect()))
    assert rows1 == rows2  # deterministic
    per_group: dict[str, int] = {}
    for et, rk, _ in rows1:
        per_group[et] = per_group.get(et, 0) + 1
        assert 1 <= rk <= 5
    assert per_group and all(v == 5 for v in per_group.values())


def test_null_profile_fixture_contract(spark):
    rows = {r["col"]: r for r in QUERIES["quality_null_profile"](spark, SF).collect()}
    assert set(rows) == {
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        "o_custkey",
    }
    n = {r["n_rows"] for r in rows.values()}
    assert len(n) == 1  # same table, same row count on every profile row
    assert all(r["n_null"] == 0 for r in rows.values())  # fixture is complete
    assert rows["o_orderkey"]["n_distinct"] == rows["o_orderkey"]["n_rows"]
    assert rows["o_orderstatus"]["n_distinct"] <= 3


def test_share_of_parent_sums_to_one(spark):
    rows = QUERIES["rollup_share_of_parent"](spark, SF).collect()
    by_region: dict[str, list] = {}
    for r in rows:
        by_region.setdefault(r["region"], []).append(r)
    region_shares = {}
    for region, rs in by_region.items():
        tot = sum(r["share_of_region_e6"] for r in rs)
        # integer truncation loses < 1 per nation
        assert 1_000_000 - len(rs) <= tot <= 1_000_000
        region_shares[region] = rs[0]["region_share_e6"]
        assert len({r["region_share_e6"] for r in rs}) == 1
    tot_regions = sum(region_shares.values())
    assert 1_000_000 - len(region_shares) <= tot_regions <= 1_000_000


# ---------------------------------------------------------------------------
# ACF + trimmed mean (second round-6 batch)
# ---------------------------------------------------------------------------


def test_acf_bruteforce_one_series(spark):
    from gotsdb_spark.sources.registry import load_table

    rows = {
        (r["event_type"], r["lag"]): r
        for r in QUERIES["ts_autocorrelation_daily"](spark, SF).collect()
    }
    assert rows and all(abs(r["acf_e6"]) <= 1_000_001 for r in rows.values())
    # brute-force one (type, lag) pair
    daily = {}
    ev = (
        load_table(spark, "events", SF)
        .select(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2025-01-01").cast("date")
            ).alias("x"),
            F.floor(F.col("value") * 1000).cast("bigint").alias("v"),
        )
        .collect()
    )
    agg: dict = {}
    for r in ev:
        agg.setdefault((r["event_type"], r["x"]), []).append(r["v"])
    for (et, x), vs in agg.items():
        daily.setdefault(et, {})[x] = sum(vs) // len(vs)
    et = sorted(daily)[0]
    series = daily[et]
    lag = 1
    pairs = [(series[x], series[x + lag]) for x in series if x + lag in series]
    n = len(pairs)
    sa = sum(a for a, _ in pairs)
    sb = sum(b for _, b in pairs)
    sab = sum(a * b for a, b in pairs)
    saa = sum(a * a for a, _ in pairs)
    sbb = sum(b * b for _, b in pairs)
    got = rows[(et, lag)]
    assert got["n_pairs"] == n
    expect = math.floor(
        (n * 1.0 * sab - sa * 1.0 * sb)
        / math.sqrt((n * 1.0 * saa - sa * 1.0 * sa) * (n * 1.0 * sbb - sb * 1.0 * sb))
        * 1e6
        + 0.5001
    )
    assert got["acf_e6"] == expect


def test_trimmed_mean_bruteforce(spark):
    from gotsdb_spark.sources.registry import load_table

    rows = {
        r["event_type"]: r
        for r in QUERIES["stats_trimmed_mean_value"](spark, SF).collect()
    }
    ev = (
        load_table(spark, "events", SF)
        .select("event_type", F.floor(F.col("value") * 1000).cast("bigint").alias("v"))
        .collect()
    )
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r["v"])
    for et, vs in by_type.items():
        vs.sort()
        n = len(vs)

        def type7(p):
            h = (n - 1) * p + 1
            k = math.floor(h)
            xk = vs[int(k) - 1]
            xk1 = vs[int(k)] if int(k) < n else xk
            return xk + (h - k) * (xk1 - xk)

        lo, hi = type7(0.1), type7(0.9)
        kept = [v for v in vs if lo <= v <= hi]
        got = rows[et]
        assert got["n_total"] == n
        assert got["n_kept"] == len(kept)
        assert got["trimmed_mean_e3"] == sum(kept) // len(kept)
        assert got["raw_mean_e3"] == sum(vs) // n
        # trimming must tighten or preserve the spread around the mean
        assert min(vs) <= got["trimmed_mean_e3"] <= max(vs)


# ---------------------------------------------------------------------------
# VAD, snapshot diff, time-to-convert (third round-6 batch)
# ---------------------------------------------------------------------------


def test_audio_vad_flags_consistent_with_frames(spark):
    """VAD's active count must equal the count of frames whose energy
    exceeds the clip mean per multimodal_audio_frames — two independent
    plans over the same decode path."""
    frames = QUERIES["multimodal_audio_framing"](spark, SF).collect()
    by_doc: dict = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["energy"])
    vad = {r["doc_id"]: r for r in QUERIES["multimodal_audio_vad"](spark, SF).collect()}
    assert set(vad) == set(by_doc)
    for doc_id, energies in by_doc.items():
        n = len(energies)
        total = sum(energies)
        active = [e * n > total for e in energies]
        got = vad[doc_id]
        assert got["n_frames"] == n
        assert got["n_active"] == sum(active)
        segs = sum(
            1
            for i, a in enumerate(active)
            if a and (i == 0 or not active[i - 1])
        )
        assert got["n_segments"] == segs
        # structural invariants
        assert 0 <= got["n_segments"] <= got["n_active"] <= got["n_frames"]


def test_snapshot_diff_partitions_the_key_space(spark):
    from gotsdb_spark.sources.registry import load_table

    rows = {r["status"]: r for r in QUERIES["curate_snapshot_diff"](spark, SF).collect()}
    n_docs = load_table(spark, "documents", SF).count()
    ids = [
        r["doc_id"]
        for r in load_table(spark, "documents", SF).select("doc_id").collect()
    ]
    v1 = {i for i in ids if i % 3 != 0}
    v2 = {i for i in ids if i % 5 != 0}
    expect = {
        "added": len(v2 - v1),
        "removed": len(v1 - v2),
        "changed": len({i for i in v1 & v2 if i % 7 == 0}),
        "unchanged": len({i for i in v1 & v2 if i % 7 != 0}),
    }
    got = {s: rows[s]["n_docs"] for s in rows}
    assert got == {k: v for k, v in expect.items() if v > 0}
    assert sum(got.values()) == len(v1 | v2) <= n_docs


def test_time_to_convert_bruteforce(spark):
    from gotsdb_spark.sources.registry import load_table

    ev = load_table(spark, "events", SF).select("user_id", "ts", "event_type").collect()
    views: dict = {}
    for r in ev:
        if r["event_type"] == "view":
            if r["user_id"] not in views or r["ts"] < views[r["user_id"]]:
                views[r["user_id"]] = r["ts"]
    gaps_by_day: dict = {}
    convs: dict = {}
    for r in ev:
        if r["event_type"] == "purchase" and r["user_id"] in views:
            v = views[r["user_id"]]
            if r["ts"] >= v and (r["user_id"] not in convs or r["ts"] < convs[r["user_id"]]):
                convs[r["user_id"]] = r["ts"]
    for uid, p in convs.items():
        v = views[uid]
        gap_min = (int(p.timestamp()) - int(v.timestamp())) // 60
        day = v.replace(hour=0, minute=0, second=0, microsecond=0)
        gaps_by_day.setdefault(day, []).append(gap_min)
    rows = {
        r["cohort_day"]: r
        for r in QUERIES["ts_time_to_convert_cohorts"](spark, SF).collect()
    }
    assert set(rows) == set(gaps_by_day)
    for day, gaps in gaps_by_day.items():
        gaps.sort()
        n = len(gaps)
        got = rows[day]
        assert got["n_converted"] == n
        assert got["p50_gap_min"] == gaps[(n + 1) // 2 - 1]
        assert got["p90_gap_min"] == gaps[(9 * n + 9) // 10 - 1]


# ---------------------------------------------------------------------------
# LSH calibration, reconciliation, degree distribution (fourth batch)
# ---------------------------------------------------------------------------


def test_lsh_calibration_algebra_and_consistency(spark):
    row = QUERIES["dedup_lsh_calibration"](spark, SF).collect()[0]
    assert row["tp"] + row["fp"] == row["n_candidates"]
    assert row["tp"] + row["fn"] == row["n_truth"]
    # truth must equal the registered exact prefix-filter pair count
    n_exact = QUERIES["dedup_prefix_filter_jaccard"](spark, SF).count()
    assert row["n_truth"] == n_exact
    # verified-LSH pairs are exactly the true positives: the verify
    # step keeps candidates with jaccard >= t, i.e. cand ∩ truth
    n_lsh = QUERIES["dedup_minhash_lsh"](spark, SF).count()
    assert row["tp"] == n_lsh
    if row["n_candidates"]:
        assert row["precision_e6"] == row["tp"] * 1_000_000 // row["n_candidates"]
    if row["n_truth"]:
        assert row["recall_e6"] == row["tp"] * 1_000_000 // row["n_truth"]


def test_order_reconciliation_covers_all_orders(spark):
    from gotsdb_spark.sources.registry import load_table

    rows = QUERIES["quality_order_reconciliation"](spark, SF).collect()
    n_orders = load_table(spark, "orders", SF).count()
    assert sum(r["n_orders"] for r in rows) == n_orders
    bands = {r["band"] for r in rows}
    assert bands <= {"exact", "within_dollar", "within_1pct", "material", "no_lines"}
    for r in rows:
        if r["band"] == "exact":
            assert r["total_abs_dev_cents"] == 0
        if r["band"] == "no_lines":
            assert r["total_abs_dev_cents"] == 0


def test_degree_distribution_matches_pair_graph(spark):
    pairs = QUERIES["dedup_minhash_lsh"](spark, SF).collect()
    deg: dict = {}
    for r in pairs:
        deg[r["doc_a"]] = deg.get(r["doc_a"], 0) + 1
        deg[r["doc_b"]] = deg.get(r["doc_b"], 0) + 1
    hist: dict = {}
    for d in deg.values():
        hist[d] = hist.get(d, 0) + 1
    rows = QUERIES["graph_degree_distribution"](spark, SF).collect()
    assert {(r["degree"], r["n_docs"]) for r in rows} == set(hist.items())
    # handshake: sum(degree * count) = 2 * |pairs|
    assert sum(r["degree"] * r["n_docs"] for r in rows) == 2 * len(pairs)


def test_association_strength_bounds_and_brute(spark):
    from gotsdb_spark.sources.registry import load_table

    row = QUERIES["stats_association_strength"](spark, SF).collect()[0]
    assert 0 <= row["cramers_v_e6"] <= 1_000_001
    assert 0 <= row["theils_u_e6"] <= 1_000_001
    # brute-force the contingency math
    li = load_table(spark, "lineitem", SF).select("l_returnflag", "l_linestatus").collect()
    cells: dict = {}
    for r in li:
        cells[(r["l_returnflag"], r["l_linestatus"])] = (
            cells.get((r["l_returnflag"], r["l_linestatus"]), 0) + 1
        )
    n = sum(cells.values())
    fs = {f for f, _ in cells}
    ss = {s for _, s in cells}
    cf = {f: sum(c for (ff, _), c in cells.items() if ff == f) for f in fs}
    cs = {s: sum(c for (_, sss), c in cells.items() if sss == s) for s in ss}
    chi2_e6 = sum(
        math.floor(
            (c - cf[f] * cs[s] / n) ** 2 / (cf[f] * cs[s] / n) * 1e6 + 0.5001
        )
        for (f, s), c in cells.items()
    )
    assert row["n"] == n
    assert row["chi2_e6"] == chi2_e6
    v = math.floor(
        math.sqrt((chi2_e6 / 1e6) / (n * (min(len(fs), len(ss)) - 1))) * 1e6
        + 0.5001
    )
    assert row["cramers_v_e6"] == v
    hx = sum(
        math.floor(-(cf[f] / n) * math.log(cf[f] / n) * 1e9 + 0.5001) for f in fs
    )
    hxy = sum(
        math.floor(-(c / n) * math.log(c / cs[s]) * 1e9 + 0.5001)
        for (f, s), c in cells.items()
    )
    assert row["theils_u_e6"] == (hx - hxy) * 1_000_000 // hx


# ---------------------------------------------------------------------------
# dist_rank edge cases
# ---------------------------------------------------------------------------


def test_dist_rank_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "id long, k long, v long")
    assert dist_rank(empty, ["k", "id"], sum_cols={"cum": "v"}).count() == 0
    one = spark.createDataFrame([(7, 3, 11)], "id long, k long, v long")
    r = dist_rank(one, ["k", "id"], sum_cols={"cum": "v"}).collect()
    assert len(r) == 1 and r[0]["rnk"] == 1 and r[0]["cum"] == 11


def test_dist_rank_all_tied_keys(spark):
    """Every k equal: the unique tie-break column alone must produce a
    clean 1..n permutation and exact running sums."""
    df = spark.createDataFrame(
        [(i, 42, 2) for i in range(97)], "id long, k long, v long"
    )
    rows = sorted(
        (r["id"], r["rnk"], r["cum"])
        for r in dist_rank(
            df, ["k", "id"], sum_cols={"cum": "v"}, num_partitions=5
        ).collect()
    )
    for i, (rid, rnk, cum) in enumerate(rows):
        assert rid == i and rnk == i + 1 and cum == 2 * (i + 1)


def test_partial_correlation_brute(spark):
    row = QUERIES["stats_partial_correlation"](spark, SF).collect()[0]
    mat = QUERIES["stats_corr_matrix_lineitem"](spark, SF).collect()[0]
    # raw pair must match the corr-matrix's same pair exactly (same
    # sufficient statistics, same flooring)
    assert row["r_qty_price_e6"] == mat["corr_qty_price_e6"]
    r_qp = mat["corr_qty_price_e6"] / 1e6
    r_qd = mat["corr_qty_disc_e6"] / 1e6
    r_pd = mat["corr_price_disc_e6"] / 1e6
    approx = (r_qp - r_qd * r_pd) / math.sqrt((1 - r_qd**2) * (1 - r_pd**2))
    # e6-rounded inputs → small tolerance vs the exact-path result
    assert abs(row["partial_qty_price_given_disc_e6"] / 1e6 - approx) < 1e-4
    assert -1_000_001 <= row["partial_qty_price_given_disc_e6"] <= 1_000_001


def test_keep_drop_ledger_covers_and_reasons(spark):
    from gotsdb_spark.sources.registry import load_table

    rows = QUERIES["curate_keep_drop_ledger"](spark, SF).collect()
    docs = load_table(spark, "documents", SF).count()
    assert len(rows) == docs  # every input doc gets a ledger row
    reasons = {r["reason"] for r in rows}
    assert "kept" in reasons
    assert reasons <= {
        "kept", "duplicate", "word_count", "mean_word_len", "ttr", "min_chars"
    }
    for r in rows:
        assert r["keep"] == (r["reason"] == "kept")
    # keep-rate must agree with the aggregate gopher report (the
    # ledger adds a dedup gate, so ledger keeps ≤ gopher keeps)
    gopher = QUERIES["quality_gopher_rules"](spark, SF).collect()
    gopher_keeps = sum(r["n_keep"] for r in gopher)
    ledger_keeps = sum(1 for r in rows if r["keep"])
    assert ledger_keeps <= gopher_keeps
