"""Round-11 sixth-window operator tests: independent Python reference
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


# ------------------------------------------------------ vocab coverage


def test_vocab_coverage_matches_python_reference(spark):
    freq = defaultdict(int)
    for r in load_table(spark, "documents", SF).select("text").collect():
        for w in r["text"].split(" "):
            freq[w] += 1
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(freq.values())
    got = {r["vocab_size"]: r
           for r in QUERIES["text_vocab_coverage"](spark, SF).collect()}
    assert set(got) == {100, 1000, 10000} & set(
        k for k in (100, 1000, 10000) if True
    )
    for k, r in got.items():
        covered = sum(f for _, f in ranked[:k])
        assert r["tokens_covered"] == covered
        assert r["total_tokens"] == total
        assert r["n_types"] == len(freq)
        assert r["coverage_e6"] == tdiv(covered * 10**6, total)
    # the curve must be monotone in k and strictly below 100% while
    # types exceed the cut
    cuts = sorted(got)
    covs = [got[k]["coverage_e6"] for k in cuts]
    assert covs == sorted(covs)


# --------------------------------------------------- Markov entropy


def test_markov_entropy_matches_python_reference(spark):
    rows = (
        load_table(spark, "events", SF)
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    per_user = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append((r["ts"], r["event_id"],
                                       r["event_type"]))
    trans = defaultdict(int)
    for seq in per_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    marg = defaultdict(int)
    for (a, _), c in trans.items():
        marg[a] += c
    total = sum(trans.values())
    n_states = len(marg)
    h_e9 = 0
    for (a, _), c in trans.items():
        if c < marg[a]:
            h_e9 += math.floor(
                -(float(c) / float(total))
                * (math.log(float(c) / float(marg[a])) / math.log(2.0))
                * 1e9
                + 0.5001
            )
    max_e9 = math.floor(math.log(float(n_states)) / math.log(2.0) * 1e9
                        + 0.5001)
    got = QUERIES["ts_markov_entropy_rate"](spark, SF).collect()[0]
    assert got["n_transitions"] == total
    assert got["n_states"] == n_states
    assert got["entropy_rate_e9"] == h_e9
    assert got["max_entropy_e9"] == max_e9
    assert got["efficiency_e6"] == tdiv(h_e9 * 10**6, max_e9)


# ---------------------------------------------------- Bowley skewness


def test_bowley_matches_python_reference(spark):
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
    got = {r["grp"]: r
           for r in QUERIES["stats_bowley_skewness"](spark, SF).collect()}
    assert set(got) == set(groups)
    for grp, vals in groups.items():
        vals.sort()
        n = len(vals)
        q1 = vals[(n + 3) // 4 - 1]
        q2 = vals[(n + 1) // 2 - 1]
        q3 = vals[(3 * n + 3) // 4 - 1]
        r = got[grp]
        assert r["n"] == n
        assert r["q1_cents"] == q1
        assert r["q2_cents"] == q2
        assert r["q3_cents"] == q3
        if q3 == q1:
            assert r["bowley_e6"] is None
        else:
            assert r["bowley_e6"] == tdiv(
                (q3 + q1 - 2 * q2) * 10**6, q3 - q1
            )


# -------------------------------------------------------- rich club


def test_rich_club_matches_python_reference(spark):
    o2c = {
        r["o_orderkey"]: r["o_custkey"]
        for r in load_table(spark, "orders", SF)
        .select("o_orderkey", "o_custkey")
        .collect()
    }
    c2n = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load_table(spark, "customer", SF)
        .select("c_custkey", "c_nationkey")
        .collect()
    }
    s2n = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in load_table(spark, "supplier", SF)
        .select("s_suppkey", "s_nationkey")
        .collect()
    }
    ue = defaultdict(int)
    for r in (
        load_table(spark, "lineitem", SF)
        .select("l_orderkey", "l_suppkey")
        .collect()
    ):
        src = c2n[o2c[r["l_orderkey"]]]
        dst = s2n[r["l_suppkey"]]
        if src != dst:
            ue[(min(src, dst), max(src, dst))] += 1
    keep = [
        ab
        for ab, _ in sorted(ue.items(), key=lambda kv: (-kv[1], kv[0]))[
            : math.ceil(len(ue) / 10.0)
        ]
    ]
    deg = defaultdict(int)
    for a, b in keep:
        deg[a] += 1
        deg[b] += 1
    got = {r["k_min"]: r
           for r in QUERIES["graph_rich_club"](spark, SF).collect()}
    for k in (1, 2, 3, 4, 5):
        club = {v for v, d in deg.items() if d > k}
        if not club:
            assert k not in got
            continue
        n_edges = sum(1 for a, b in keep if a in club and b in club)
        r = got[k]
        assert r["n_nodes"] == len(club)
        assert r["n_edges"] == n_edges
        if len(club) < 2:
            assert r["phi_e6"] is None
        else:
            assert r["phi_e6"] == tdiv(
                2 * n_edges * 10**6, len(club) * (len(club) - 1)
            )
