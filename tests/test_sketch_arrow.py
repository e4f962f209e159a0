"""The Arrow/numpy sketch kernels must be BIT-identical to the Catalyst
HOF forms — the dedup pipelines default to the Arrow engine, and the
DuckDB oracles mirror the HOF arithmetic, so any divergence here breaks
the correctness gate, not just performance."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wpvectordb_spark.functions import sketch_arrow as SA
from wpvectordb_spark.functions import text as X
from wpvectordb_spark.operators import dedup as D

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def _edge_docs(spark):
    return spark.createDataFrame(
        [
            (1, "one two three four five"),
            (2, ""),  # empty -> null signature in both engines
            (3, None),  # null text
            (4, "one one one one"),  # single repeated token
            (5, "ab"),  # shorter than shingle_k tokens
        ],
        "doc_id long, text string",
    )


def test_minhash_arrow_matches_catalyst(spark, docs):
    sh = D.shingle_sets(docs)
    both = sh.select(
        X.minhash_signature(F.col("sh"), 32).alias("hof"),
        SA.minhash_signature_arrow(F.col("sh"), 32).alias("arrow"),
    )
    assert both.where(~F.col("hof").eqNullSafe(F.col("arrow"))).count() == 0


def test_minhash_arrow_edge_cases(spark):
    sh = D.shingle_sets(_edge_docs(spark))
    rows = sh.select(
        "doc_id",
        X.minhash_signature(F.col("sh"), 32).alias("hof"),
        SA.minhash_signature_arrow(F.col("sh"), 32).alias("arrow"),
    ).collect()
    for r in rows:
        assert r["hof"] == r["arrow"], r["doc_id"]
    nulls = {r["doc_id"] for r in rows if r["arrow"] is None}
    assert {2, 3} <= nulls  # empty and null text produce null signatures


def test_srp_simhash_arrow_matches_catalyst(spark, docs):
    th = X.token_hashes("text")
    both = docs.select(
        X.srp_simhash(th).alias("hof"), SA.srp_simhash_arrow(th).alias("arrow")
    )
    assert both.where(~F.col("hof").eqNullSafe(F.col("arrow"))).count() == 0


def test_srp_simhash_range_and_nulls(spark):
    th = X.token_hashes("text")
    rows = _edge_docs(spark).select(
        "doc_id", SA.srp_simhash_arrow(th).alias("s")
    ).collect()
    vals = {r["doc_id"]: r["s"] for r in rows}
    assert vals[2] is None and vals[3] is None
    for v in vals.values():
        if v is not None:
            assert 0 <= v < 2**60  # positive BIGINT in every engine


def test_simhash_arrow_matches_catalyst(spark, docs):
    th = X.token_hashes("text")
    both = docs.select(
        X.simhash(th).alias("hof"), SA.simhash_arrow(th).alias("arrow")
    )
    assert both.where(~F.col("hof").eqNullSafe(F.col("arrow"))).count() == 0


def test_simhash_arrow_edge_cases(spark):
    th = X.token_hashes("text")
    rows = _edge_docs(spark).select(
        "doc_id", X.simhash(th).alias("hof"), SA.simhash_arrow(th).alias("arrow")
    ).collect()
    for r in rows:
        assert r["hof"] == r["arrow"], r["doc_id"]


def test_pipeline_pairs_identical_across_engines(spark, docs):
    a = D.minhash_lsh_dedup_pairs(docs, threshold=0.5, engine="arrow")
    c = D.minhash_lsh_dedup_pairs(docs, threshold=0.5, engine="catalyst")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, c.collect()))


def test_simhash_pairs_identical_across_engines(spark, docs):
    a = D.simhash_near_dup_pairs(docs, max_hamming=3, engine="arrow")
    c = D.simhash_near_dup_pairs(docs, max_hamming=3, engine="catalyst")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, c.collect()))


def test_span_window_hashes_engines_identical(spark, docs):
    """The span-detection window-hash fold (round 12's Arrow kernel) must
    be bit-identical between engines on the real corpus — the DuckDB
    span oracles mirror the Catalyst arithmetic."""
    d = docs.select("doc_id", "text")
    a, _, _ = D._span_detection(
        d, 8, 2, "doc_id", "text", carry_tokens=False, persist=False,
        engine="arrow",
    )
    c, _, _ = D._span_detection(
        d, 8, 2, "doc_id", "text", carry_tokens=False, persist=False,
        engine="catalyst",
    )
    j = a.withColumnRenamed("_ws", "_wa").join(
        c.withColumnRenamed("_ws", "_wc"), "doc_id"
    )
    assert j.count() > 0
    assert j.where(~F.col("_wa").eqNullSafe(F.col("_wc"))).count() == 0


def test_span_window_hashes_arrow_edges(spark):
    """NULL text, empty text, shorter-than-k, and exactly-k documents:
    the kernel must emit [] (never NULL) for short/NULL rows and match
    the HOF form element-for-element everywhere (k=4 makes doc 4 the
    exactly-one-window case)."""
    d = _edge_docs(spark)
    a, _, _ = D._span_detection(
        d, 4, 2, "doc_id", "text", carry_tokens=False, persist=False,
        engine="arrow",
    )
    c, _, _ = D._span_detection(
        d, 4, 2, "doc_id", "text", carry_tokens=False, persist=False,
        engine="catalyst",
    )
    am = {r["doc_id"]: r["_ws"] for r in a.collect()}
    cm = {r["doc_id"]: r["_ws"] for r in c.collect()}
    assert am == cm
    assert am[2] == [] and am[3] == [] and am[5] == []  # empty/NULL/short
    assert len(am[4]) == 1  # exactly k tokens -> one window
    assert len(am[1]) == 2


def test_span_cut_engines_identical(spark, docs):
    """remove_duplicate_spans end to end: identical rows (ids, counts,
    rewritten text) under both window-hash engines."""
    d = docs.select("doc_id", "text").limit(300)
    rows_a = sorted(
        map(tuple, D.remove_duplicate_spans(d, k=8, min_docs=2, engine="arrow").collect())
    )
    rows_c = sorted(
        map(tuple, D.remove_duplicate_spans(d, k=8, min_docs=2, engine="catalyst").collect())
    )
    assert rows_a == rows_c
