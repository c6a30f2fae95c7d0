"""Image average-hash (aHash) buckets: the real-decoder Spark path vs
the analytic DuckDB oracle, run in-test (the operator is queued for
round-6 registration; this test IS its oracle gate until then).
"""

from __future__ import annotations

import pytest

import duckdb

from gotsdb_spark.operators.multimodal import IMAGE_AHASH_ORACLE, image_ahash_buckets

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con


def test_ahash_matches_analytic_oracle(spark, duck):
    got = sorted(
        (r["doc_id"], r["width"], r["height"], r["ahash"], r["n_same_hash"])
        for r in image_ahash_buckets(spark, SF).collect()
    )
    want = sorted(
        (int(a), int(b), int(c), int(d), int(e))
        for a, b, c, d, e in duck.execute(IMAGE_AHASH_ORACLE).fetchall()
    )
    assert got == want and got


def test_ahash_is_decoder_derived_not_payload_hash(spark):
    """Two docs with equal text (exact dups exist in the fixture) but
    different doc_id get different DIMENSIONS, hence different native
    grids — the hash must depend on the decoded geometry, not only on
    the byte stream."""
    rows = image_ahash_buckets(spark, SF).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    # dims derive from doc_id alone
    for r in rows:
        assert r["width"] == r["doc_id"] % 8 + 2
        assert r["height"] == (r["doc_id"] // 8) % 6 + 2
        assert 0 <= r["ahash"] < 1 << (r["width"] * r["height"])
    assert len(by_doc) == len(rows)
