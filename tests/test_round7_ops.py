"""Round-7 operator tests: independent reference implementations and
structural properties for the seven new registered queries (the DuckDB
hash gate is the primary check; these pin semantics against a second,
non-SQL implementation and the properties a refactor could silently
lose)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gotsdb_spark.operators.registry import QUERIES
from gotsdb_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def _daily_series(spark):
    """(event_type -> [y_e3 ordered by day]) exactly as the operators
    define it: e3-floored per-event values, integer-mean per day."""
    rows = (
        load_table(spark, "events", SF)
        .select(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2025-01-01").cast("date")
            ).alias("x"),
            F.floor(F.col("value") * 1000).cast("bigint").alias("v_e3"),
        )
        .groupBy("event_type", "x")
        .agg(F.expr("CAST(sum(v_e3) DIV count(*) AS BIGINT)").alias("y_e3"))
        .collect()
    )
    out: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["x"])):
        out.setdefault(r["event_type"], []).append(r["y_e3"])
    return out


def _r9(v: float) -> float:
    return math.floor(v * 1e9 + 0.5) / 1e9


def test_holt_winters_matches_python_reference(spark):
    series = _daily_series(spark)
    got = {
        r["event_type"]: r
        for r in QUERIES["ts_holt_winters_seasonal"](spark, SF).collect()
    }
    a, b, g = 0.5, 0.3, 0.2
    for etype, ys in series.items():
        assert len(ys) >= 15
        s7a, s7b = sum(ys[:7]), sum(ys[7:14])
        level = _r9(s7a / 7000.0)
        trend = _r9((s7b - s7a) / 49000.0)
        seas = [_r9(y / 1000.0 - level) for y in ys[:7]]
        for y_e3 in ys[7:]:
            y = y_e3 / 1000.0
            s1 = seas[0]
            lnew = _r9(a * (y - s1) + (1 - a) * (level + trend))
            trend = _r9(b * (lnew - level) + (1 - b) * trend)
            seas = seas[1:] + [_r9(g * (y - lnew) + (1 - g) * s1)]
            level = lnew
        row = got[etype]
        assert row["level_e6"] == math.floor(level * 1e6 + 0.5001)
        assert row["trend_e6"] == math.floor(trend * 1e6 + 0.5001)
        assert row["season_e6"] == math.floor(seas[0] * 1e6 + 0.5001)
        assert row["forecast_e6"] == math.floor(
            (level + trend + seas[0]) * 1e6 + 0.5001
        )


def test_seasonal_naive_matches_python_reference(spark):
    series = _daily_series(spark)
    got = {
        r["event_type"]: r
        for r in QUERIES["ts_seasonal_naive_error"](spark, SF).collect()
    }
    for etype, ys in series.items():
        sae1 = sum(abs(ys[t] - ys[t - 1]) for t in range(7, len(ys)))
        sae7 = sum(abs(ys[t] - ys[t - 7]) for t in range(7, len(ys)))
        n = len(ys) - 7
        row = got[etype]
        assert row["n_scored"] == n
        assert row["mae_naive_e3"] == sae1 // n
        assert row["mae_seasonal_e3"] == sae7 // n
        assert row["seasonal_vs_naive_e6"] == (
            sae7 * 1_000_000 // sae1 if sae1 else None
        )


def test_band_sensitivity_monotone_in_r(spark):
    """Candidates of r-row bands are nested (a shared r=4 band implies a
    shared r=2 sub-band implies a shared r=1 signature), so candidate
    count and recall must be non-increasing in r and FN non-decreasing;
    truth is config-independent."""
    rows = {
        r["rows_per_band"]: r
        for r in QUERIES["dedup_lsh_band_sensitivity"](spark, SF).collect()
    }
    assert sorted(rows) == [1, 2, 4, 8]
    assert len({r["n_truth"] for r in rows.values()}) == 1
    for lo, hi in ((1, 2), (2, 4), (4, 8)):
        assert rows[lo]["n_candidates"] >= rows[hi]["n_candidates"]
        assert rows[lo]["tp"] >= rows[hi]["tp"]
        assert rows[lo]["fn"] <= rows[hi]["fn"]
    for r in rows.values():
        assert r["n_bands"] * r["rows_per_band"] == 8
        assert r["tp"] + r["fp"] == r["n_candidates"]
        assert r["tp"] + r["fn"] == r["n_truth"]


def test_pmi_matches_python_reference(spark):
    docs = load_table(spark, "documents", SF).select("text").collect()
    c12: dict = {}
    c1: dict = {}
    c2: dict = {}
    n = 0
    for row in docs:
        ws = row["text"].split(" ")
        for w1, w2 in zip(ws, ws[1:]):
            n += 1
            c12[(w1, w2)] = c12.get((w1, w2), 0) + 1
            c1[w1] = c1.get(w1, 0) + 1
            c2[w2] = c2.get(w2, 0) + 1
    scored = sorted(
        (
            (
                math.floor(
                    math.log(c * n * 1.0 / (c1[w1] * c2[w2])) * 1e6 + 0.5001
                ),
                w1,
                w2,
                c,
            )
            for (w1, w2), c in c12.items()
            if c >= 5
        ),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:50]
    want = {(w1, w2): (pmi, c) for pmi, w1, w2, c in scored}
    got = QUERIES["text_pmi_bigrams"](spark, SF).collect()
    assert len(got) == len(want) == 50
    for r in got:
        pmi, c = want[(r["w1"], r["w2"])]
        assert (r["pmi_e6"], r["n_pair"]) == (pmi, c)


def test_winsorized_mean_matches_python_reference(spark):
    cents_rows = (
        load_table(spark, "lineitem", SF)
        .select(
            F.col("l_returnflag").alias("flag"),
            F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("c"),
        )
        .collect()
    )
    by_flag: dict[str, list] = {}
    for r in cents_rows:
        by_flag.setdefault(r["flag"], []).append(r["c"])
    got = {
        r["flag"]: r for r in QUERIES["stats_winsorized_mean"](spark, SF).collect()
    }
    for flag, vals in by_flag.items():
        vals.sort()
        n = len(vals)
        # smallest value with cum count*20 >= n (p05) / >= 19n (p95)
        lo = vals[(n + 19) // 20 - 1]
        hi = vals[(19 * n + 19) // 20 - 1]
        clamped = [min(max(v, lo), hi) for v in vals]
        row = got[flag]
        assert row["n_rows"] == n
        assert (row["lo_cents"], row["hi_cents"]) == (lo, hi)
        assert row["winsorized_mean_cents"] == sum(clamped) // n
        assert row["n_clamped"] == sum(1 for v in vals if v < lo or v > hi)
        assert lo <= row["winsorized_mean_cents"] <= hi


def test_percentile_trend_matches_python_reference(spark):
    rows = (
        load_table(spark, "orders", SF)
        .select(
            F.col("o_orderpriority").alias("p"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
            ).alias("x"),
            F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        )
        .collect()
    )
    days: dict = {}
    for r in rows:
        days.setdefault((r["p"], r["x"]), []).append(r["c"])
    pts: dict[str, list] = {}
    for (p, x), vals in days.items():
        vals.sort()
        n = len(vals)
        p90 = vals[(9 * n + 9) // 10 - 1]
        pts.setdefault(p, []).append((x, p90))
    got = {
        r["prio"]: r for r in QUERIES["stats_percentile_trend"](spark, SF).collect()
    }
    for p, xy in pts.items():
        n = len(xy)
        sx = sum(x for x, _ in xy)
        sy = sum(y for _, y in xy)
        sxy = sum(x * y for x, y in xy)
        sxx = sum(x * x for x, _ in xy)
        det = n * sxx - sx * sx
        num = n * sxy - sx * sy
        row = got[p]
        assert row["n_days"] == n
        # python // floors; engines truncate toward zero — emulate
        tz = lambda a, b: -(-a // b) if (a < 0) != (b < 0) else a // b  # noqa: E731
        assert row["slope_cents_per_day_e6"] == tz(num * 1_000_000, det)
        assert row["intercept_cents_e6"] == tz(
            (sy * det - num * sx) * 1_000_000, n * det
        )


def test_streaming_topk_matches_batch(spark):
    """The incrementally-maintained leaderboard must equal the batch
    hop-exploded aggregation of the same events."""
    got = {
        (r["window_start"], r["rnk"]): (r["event_type"], r["n"])
        for r in QUERIES["streaming_topk_trending"](spark, SF).collect()
    }
    ev = load_table(spark, "events", SF).select("ts", "event_type")
    hops = ev.select(
        F.date_trunc("hour", "ts").alias("ws"), "event_type"
    ).unionAll(
        ev.select(
            (F.date_trunc("hour", "ts") - F.expr("INTERVAL 1 HOUR")).alias("ws"),
            "event_type",
        )
    )
    batch = (
        hops.groupBy("ws", "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    per_win: dict = {}
    for r in batch:
        per_win.setdefault(r["ws"], []).append((-r["n"], r["event_type"], r["n"]))
    want = {}
    for ws, items in per_win.items():
        for i, (_, etype, n) in enumerate(sorted(items)[:3], start=1):
            want[(ws, i)] = (etype, n)
    assert got == want


def test_kaplan_meier_matches_python_reference(spark):
    ev = load_table(spark, "events", SF).select("user_id", "event_type", "ts")
    rows = ev.collect()
    import datetime

    views: dict = {}
    tmax = max(r["ts"] for r in rows)
    for r in rows:
        if r["event_type"] == "view":
            if r["user_id"] not in views or r["ts"] < views[r["user_id"]]:
                views[r["user_id"]] = r["ts"]
    conv: dict = {}
    for r in rows:
        if r["event_type"] == "purchase" and r["user_id"] in views:
            if r["ts"] >= views[r["user_id"]]:
                if r["user_id"] not in conv or r["ts"] < conv[r["user_id"]]:
                    conv[r["user_id"]] = r["ts"]

    def mins(a: datetime.datetime, b: datetime.datetime) -> int:
        return (
            math.floor(b.replace(tzinfo=datetime.timezone.utc).timestamp())
            - math.floor(a.replace(tzinfo=datetime.timezone.utc).timestamp())
        ) // 60

    subjects = [
        (mins(v, conv[u]) if u in conv else mins(v, tmax), 1 if u in conv else 0)
        for u, v in views.items()
    ]
    dic: dict = {}
    for dur, evflag in subjects:
        d, n = dic.get(dur, (0, 0))
        dic[dur] = (d + evflag, n + 1)
    total = len(subjects)
    got = {
        r["horizon_min"]: r
        for r in QUERIES["stats_kaplan_meier"](spark, SF).collect()
    }
    cum_all = l_cum = z_cum = d_cum = 0
    curve = {}
    for dur in sorted(dic):
        d, n_all = dic[dur]
        cum_all += n_all
        n_risk = total - cum_all + n_all
        if d == n_risk:
            z_cum += 1
        elif d > 0:
            l_cum += math.floor(
                math.log((n_risk - d) / n_risk) * 1e9 + 0.5001
            )
        d_cum += d
        curve[dur] = (d_cum, total - cum_all, z_cum, l_cum)
    durs = sorted(curve)
    for h in (60, 360, 1440, 4320, 10080):
        eligible = [t for t in durs if t <= h]
        if not eligible:
            assert h not in got
            continue
        d_cum, at_risk, z_cum, l_cum = curve[eligible[-1]]
        row = got[h]
        assert row["n_events"] == d_cum
        assert row["at_risk_after"] == at_risk
        want_s = 0 if z_cum else math.floor(math.exp(l_cum / 1e9) * 1e6 + 0.5001)
        assert row["survival_e6"] == want_s
        # survival must be a probability and non-increasing in horizon
        assert 0 <= row["survival_e6"] <= 1_000_000


def test_ngram_novelty_matches_python_reference(spark):
    docs = load_table(spark, "documents", SF).select("doc_id", "text").collect()
    shingles: dict = {}
    for r in docs:
        ws = r["text"].split(" ")
        if len(ws) >= 3:
            ss = {f"{ws[i]} {ws[i+1]} {ws[i+2]}" for i in range(len(ws) - 2)}
        else:
            # mirror the oracle's greatest(len-2, 1): a <3-token doc
            # contributes its (partial) first window
            ss = {" ".join(ws[:3])}
        shingles[r["doc_id"]] = ss
    df: dict = {}
    for ss in shingles.values():
        for s in ss:
            df[s] = df.get(s, 0) + 1
    got = {
        r["doc_id"]: r for r in QUERIES["text_ngram_novelty"](spark, SF).collect()
    }
    assert set(got) == set(shingles)
    for doc_id, ss in shingles.items():
        novel = sum(1 for s in ss if df[s] == 1)
        row = got[doc_id]
        assert row["n_shingles"] == len(ss)
        assert row["n_novel"] == novel
        assert row["novelty_e6"] == novel * 1_000_000 // len(ss)


def test_skyline_matches_bruteforce(spark):
    """The swept frontier must equal the quadratic NOT-EXISTS dominance
    definition evaluated in Python."""
    pts = (
        load_table(spark, "part", SF)
        .select(
            "p_brand",
            F.floor(F.col("p_retailprice") * 100).cast("bigint").alias("pc"),
            F.col("p_size").cast("bigint").alias("sz"),
        )
        .collect()
    )
    by_brand: dict = {}
    for r in pts:
        by_brand.setdefault(r["p_brand"], []).append((r["pc"], r["sz"]))
    want = set()
    for brand, xs in by_brand.items():
        # collapse to (price -> max size, count)
        dic: dict = {}
        for pc, sz in xs:
            best, n = dic.get(pc, (-1, 0))
            dic[pc] = (max(best, sz), n + 1)
        for pc, (sz, n) in dic.items():
            dominated = any(
                (pc2 <= pc and sz2 >= sz and (pc2 < pc or sz2 > sz))
                for pc2, (sz2, _) in dic.items()
            )
            if not dominated:
                want.add((brand, pc, sz, n))
    got = {
        (r["p_brand"], r["price_cents"], r["best_size"], r["n_parts"])
        for r in QUERIES["skyline_price_size_frontier"](spark, SF).collect()
    }
    assert got == want
    # frontier staircase: within a brand, larger price implies strictly
    # larger best size
    for brand in by_brand:
        stair = sorted((pc, sz) for b, pc, sz, _ in got if b == brand)
        for (p1, s1), (p2, s2) in zip(stair, stair[1:]):
            assert p1 < p2 and s1 < s2


def test_dup_rate_by_source_consistency(spark):
    import hashlib

    docs = load_table(spark, "documents", SF).select(
        "doc_id", "source", "text"
    ).collect()
    by_hash: dict = {}
    src_of: dict = {}
    for r in docs:
        h = hashlib.md5(r["text"].encode()).hexdigest()
        by_hash.setdefault(h, []).append(r["doc_id"])
        src_of[r["doc_id"]] = r["source"]
    exact_dups = {d for ids in by_hash.values() if len(ids) > 1 for d in ids}
    pairs = QUERIES["dedup_minhash_lsh"](spark, SF).collect()
    near = {r["doc_a"] for r in pairs} | {r["doc_b"] for r in pairs}
    want: dict = {}
    for d, s in src_of.items():
        n, e, nn = want.get(s, (0, 0, 0))
        want[s] = (n + 1, e + (d in exact_dups), nn + (d in near))
    got = {r["source"]: r for r in QUERIES["dedup_rate_by_source"](spark, SF).collect()}
    assert set(got) == set(want)
    for s, (n, e, nn) in want.items():
        row = got[s]
        assert (row["n_docs"], row["n_exact_dup"], row["n_near_dup"]) == (n, e, nn)
        assert row["exact_dup_rate_e6"] == e * 1_000_000 // n
        assert row["near_dup_rate_e6"] == nn * 1_000_000 // n


def test_source_length_profile_matches_python_reference(spark):
    docs = load_table(spark, "documents", SF).select("source", "n_chars").collect()
    by_src: dict = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append(r["n_chars"])
    got = {
        r["source"]: r
        for r in QUERIES["quality_source_length_profile"](spark, SF).collect()
    }
    for s, vals in by_src.items():
        vals.sort()
        n = len(vals)
        row = got[s]
        assert row["n_docs"] == n
        # smallest value with cc*10 >= n etc. == ceil(q*n)-th order stat
        assert row["p10_chars"] == vals[(n + 9) // 10 - 1]
        assert row["p50_chars"] == vals[(n + 1) // 2 - 1]
        assert row["p90_chars"] == vals[(9 * n + 9) // 10 - 1]
        assert (row["min_chars"], row["max_chars"]) == (vals[0], vals[-1])
        assert row["min_chars"] <= row["p10_chars"] <= row["p50_chars"]
        assert row["p50_chars"] <= row["p90_chars"] <= row["max_chars"]


def test_snapshot_psi_matches_python_reference(spark):
    import hashlib

    docs = load_table(spark, "documents", SF).select("doc_id", "n_chars").collect()
    halves: dict = {0: [], 1: []}
    for r in docs:
        s = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:4], 16) % 2
        halves[s].append(r["n_chars"])
    ref = sorted(halves[0])
    na, nb = len(halves[0]), len(halves[1])
    # decile edges: smallest value with cc*10 >= k*na over the ref dict
    from collections import Counter

    dic = sorted(Counter(ref).items())
    edges = []
    for k in range(1, 10):
        cc = 0
        for v, c in dic:
            cc += c
            if cc * 10 >= k * na:
                edges.append(v)
                break
    assert len(edges) == 9

    def bin_of(v):
        return 1 + sum(1 for e in edges if v > e)

    c_ref = Counter(bin_of(v) for v in halves[0])
    c_cur = Counter(bin_of(v) for v in halves[1])
    got = {r["bin"]: r for r in QUERIES["quality_snapshot_psi"](spark, SF).collect()}
    assert sorted(got) == list(range(1, 11))
    for b in range(1, 11):
        row = got[b]
        ca, cb = c_ref.get(b, 0), c_cur.get(b, 0)
        assert (row["c_ref"], row["c_cur"]) == (ca, cb)
        pa, pb = (ca + 1.0) / (na + 10), (cb + 1.0) / (nb + 10)
        lr = math.log(((ca + 1.0) * (nb + 10)) / ((cb + 1.0) * (na + 10)))
        assert row["psi_term_e9"] == math.floor((pa - pb) * lr * 1e9 + 0.5001)
    # PSI terms of a random split of an identical population should be
    # tiny: total |PSI| well under the 0.1 stability threshold
    assert abs(sum(r["psi_term_e9"] for r in got.values())) < 100_000_000


def test_information_gain_matches_python_reference(spark):
    from collections import Counter

    docs = load_table(spark, "documents", SF).select(
        "lang", "source", "n_chars"
    ).collect()
    n = len(docs)
    lens = sorted(r["n_chars"] for r in docs)
    dic = sorted(Counter(lens).items())
    edges = []
    for k in range(1, 10):
        cc = 0
        for v, c in dic:
            cc += c
            if cc * 10 >= k * n:
                edges.append(v)
                break

    def ent_e9_terms(counts, denom_for):
        return sum(
            math.floor(-(c / n) * math.log(c / denom_for(key)) * 1e9 + 0.5001)
            for key, c in counts.items()
        )

    c_lang = Counter(r["lang"] for r in docs)
    h_lang = sum(
        math.floor(-(c / n) * math.log(c / n) * 1e9 + 0.5001)
        for c in c_lang.values()
    )
    got = {
        r["feature"]: r
        for r in QUERIES["stats_information_gain"](spark, SF).collect()
    }
    assert set(got) == {"source", "length_decile"}
    for feature in ("source", "length_decile"):
        if feature == "source":
            xs = [(r["source"], r["lang"]) for r in docs]
        else:
            xs = [
                (1 + sum(1 for e in edges if r["n_chars"] > e), r["lang"])
                for r in docs
            ]
        cells = Counter(xs)
        cx = Counter(x for x, _ in xs)
        h_cond = sum(
            math.floor(-(c / n) * math.log(c / cx[x]) * 1e9 + 0.5001)
            for (x, _), c in cells.items()
        )
        row = got[feature]
        assert row["h_lang_e9"] == h_lang
        assert row["h_cond_e9"] == h_cond
        assert row["info_gain_e9"] == h_lang - h_cond
        # conditioning can't add entropy (up to per-cell flooring noise
        # of <1e-9 each): gain must be >= -len(cells) in e9 units
        assert row["info_gain_e9"] >= -len(cells)


def test_km_by_cohort_consistent_with_global_km(spark):
    """Stratified and pooled KM must agree on subject accounting: the
    cohort n_subjects sum to the global risk-set total, and per-cohort
    7d event counts sum to <= the pooled 7d events (cohorts whose 7d
    horizon has no step yet report NULL)."""
    cohort = QUERIES["stats_km_by_cohort"](spark, SF).collect()
    pooled = {
        r["horizon_min"]: r
        for r in QUERIES["stats_kaplan_meier"](spark, SF).collect()
    }
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, "events", SF)
    n_view_users = (
        ev.where(F.col("event_type") == "view").select("user_id").distinct().count()
    )
    assert sum(r["n_subjects"] for r in cohort) == n_view_users
    for r in cohort:
        for label in ("1d", "7d"):
            s = r[f"survival_{label}_e6"]
            assert s is None or 0 <= s <= 1_000_000
    if 10080 in pooled:
        total_7d = sum(r["events_7d"] or 0 for r in cohort)
        assert total_7d <= pooled[10080]["n_events"] + len(cohort)
