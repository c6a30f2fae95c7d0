"""Round-11 fifth-window operator tests: independent Python reference
implementations for the new registered queries (the DuckDB hash gate
is the primary check; these pin semantics against a second, non-SQL
implementation — the round-7 convention)."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from gotsdb_spark.operators.registry import QUERIES
from gotsdb_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero (Spark DIV, DuckDB //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# ----------------------------------------------------------- Bartlett


def test_bartlett_matches_python_reference(spark):
    groups = defaultdict(list)
    for r in (
        load_table(spark, "orders", SF)
        .select(
            "o_orderpriority",
            F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        )
        .collect()
    ):
        groups[r["o_orderpriority"]].append(r["c"])
    k = len(groups)
    bign = sum(len(v) for v in groups.values())
    pooled_mega = 0
    sum_ln_e9 = 0
    inv_sum_e12 = 0
    for vals in groups.values():
        n = len(vals)
        s = sum(vals)
        ss = sum(c * c for c in vals)
        pooled_mega += math.floor(
            (float(n) * float(ss) - float(s) * float(s))
            / float(n)
            / 1048576.0
        )
        var = (float(n) * float(ss) - float(s) * float(s)) / (
            float(n) * float(n - 1)
        )
        sum_ln_e9 += math.floor(float(n - 1) * math.log(var) * 1e9 + 0.5001)
        inv_sum_e12 += tdiv(10**12, n - 1)
    chi2 = math.floor(
        (
            (float(bign) - float(k))
            * math.log(
                float(pooled_mega) * 1048576.0 / (float(bign) - float(k))
            )
            - float(sum_ln_e9) / 1e9
        )
        / (
            1.0
            + (float(inv_sum_e12) / 1e12 - 1.0 / (float(bign) - float(k)))
            / (3.0 * (float(k) - 1.0))
        )
        * 1e6
        + 0.5001
    )
    got = QUERIES["stats_bartlett_variance"](spark, SF).collect()[0]
    assert got["n_groups"] == k and got["n_total"] == bign
    assert got["bartlett_chi2_e6"] == chi2


# ----------------------------------------------------------- Hurst R/S


def test_hurst_matches_python_reference(spark):
    agg = defaultdict(int)
    for r in (
        load_table(spark, "events", SF)
        .select(
            "event_type",
            F.datediff(F.col("ts").cast("date"),
                       F.lit("2025-01-01").cast("date")).alias("day"),
            F.floor(F.col("value") * 1000).cast("bigint").alias("v"),
        )
        .collect()
    ):
        agg[(r["event_type"], r["day"])] += r["v"]
    series = defaultdict(list)
    for (et, d), y in sorted(agg.items()):
        series[et].append((d, y))
    expect = {}
    hurst = {}
    for et, rows in series.items():
        ys = [y for _, y in sorted(rows)]
        pts = []
        for m in (4, 8, 16):
            rss = []
            for b in range(len(ys) // m):
                blk = ys[b * m : (b + 1) * m]
                bs = sum(blk)
                bss = sum(v * v for v in blk)
                var_num = m * bss - bs * bs
                if var_num <= 0:
                    continue
                pfx = 0
                ws = []
                for j, v in enumerate(blk, start=1):
                    pfx += v
                    ws.append(m * pfx - j * bs)
                r_x_m = max(ws) - min(ws)
                rss.append(
                    math.floor(
                        float(r_x_m) / math.sqrt(float(var_num)) * 1e9
                        + 0.5001
                    )
                )
            if rss:
                mean_rs = tdiv(sum(rss), len(rss))
                x_e9 = math.floor(math.log(float(m)) * 1e9 + 0.5001)
                y_e9 = math.floor(
                    math.log(float(mean_rs) / 1e9) * 1e9 + 0.5001
                )
                expect[(et, m)] = (len(rss), mean_rs)
                pts.append((x_e9, y_e9))
        kk = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        den = kk * sxx - sx * sx
        hurst[et] = tdiv((kk * sxy - sx * sy) * 10**6, den) if den else None
    got = QUERIES["ts_hurst_exponent"](spark, SF).collect()
    assert len(got) == len(expect)
    for r in got:
        nb, mean_rs = expect[(r["event_type"], r["window_size"])]
        assert r["n_blocks"] == nb
        assert r["mean_rs_e9"] == mean_rs
        assert r["hurst_e6"] == hurst[r["event_type"]]


# ------------------------------------------------------------ ARI


def test_ari_matches_python_reference(spark):
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for r in (
        load_table(spark, "documents", SF)
        .select("lang", "source", "text")
        .collect()
    ):
        t = r["text"]
        chars = len(t)
        words = t.count(" ") + 1
        sents = max(sum(t.count(ch) for ch in ".!?"), 1)
        c = cells[(r["lang"], r["source"])]
        c[0] += 1
        c[1] += chars
        c[2] += words
        c[3] += sents
    got = {(r["lang"], r["source"]): r
           for r in QUERIES["text_readability_ari"](spark, SF).collect()}
    assert set(got) == set(cells)
    for key, (n, ch, w, s) in cells.items():
        r = got[key]
        assert r["n_docs"] == n
        assert r["total_chars"] == ch
        assert r["total_words"] == w
        assert r["total_sentences"] == s
        assert r["ari_e6"] == (
            tdiv(tdiv(471 * ch * 10000, w), 100)
            + tdiv(tdiv(5 * w * 1000000, s), 10)
            - 2143 * 10000
        )


# -------------------------------------------------------- silhouette


def test_silhouette_matches_python_reference(spark):
    vecs = {}
    labels = {}
    for r in load_table(spark, "embeddings", SF).collect():
        q = [math.floor(float(v) * 1e6) for v in r["embedding"]]
        vecs[r["vec_id"]] = q
        labels[r["vec_id"]] = r["label"]
    dims = len(next(iter(vecs.values())))
    sums = defaultdict(lambda: [0] * dims)
    counts = defaultdict(int)
    for vid, q in vecs.items():
        lab = labels[vid]
        counts[lab] += 1
        for i, x in enumerate(q):
            sums[lab][i] += x
    cent = {
        lab: [tdiv(s, counts[lab]) for s in sums[lab]] for lab in sums
    }
    per_label = defaultdict(lambda: [0, 0, 0])  # n, sum_s_e6, misassigned
    for vid, q in vecs.items():
        own = labels[vid]
        d2 = {
            lab: sum((x - c) ** 2 for x, c in zip(q, cvec))
            for lab, cvec in cent.items()
        }
        a2 = d2[own]
        b2 = min(v for lab, v in d2.items() if lab != own)
        if max(a2, b2) <= 0:
            continue
        s_e6 = math.floor(
            (math.sqrt(float(b2)) - math.sqrt(float(a2)))
            / math.sqrt(float(max(a2, b2)))
            * 1e6
            + 0.5001
        )
        p = per_label[own]
        p[0] += 1
        p[1] += s_e6
        p[2] += 1 if b2 < a2 else 0
    got = {r["label"]: r
           for r in QUERIES["embed_silhouette_audit"](spark, SF).collect()}
    assert set(got) == set(per_label)
    for lab, (n, ssum, mis) in per_label.items():
        r = got[lab]
        assert r["n_vecs"] == n
        assert r["mean_silhouette_e6"] == tdiv(ssum, n)
        assert r["n_misassigned"] == mis
        assert r["misassigned_e6"] == tdiv(mis * 10**6, n)
