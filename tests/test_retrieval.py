"""BM25 + RRF semantics (operators.retrieval).  Cross-engine value parity
is covered by the driver oracle (text_terms_tfidf bm25/rrf arms); these
tests pin the ranking semantics on controlled corpora."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from wpvectordb_spark.operators import retrieval as R


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "vector search with hash join"),  # both terms once
            (2, "vector vector vector search"),  # tf saturation target
            (3, "hash tables everywhere hash hash"),
            (4, "nothing relevant here at all"),
            (5, "vector hash vector hash vector hash"),  # densest
            (6, ""),
        ],
        "doc_id long, text string",
    )


def test_bm25_only_matching_docs(corpus):
    out = R.bm25_topk(corpus, ["vector", "hash"], n=10).collect()
    ids = {r["doc_id"] for r in out}
    assert ids == {1, 2, 3, 5}  # 4 and 6 match no term
    assert [r["rnk"] for r in sorted(out, key=lambda r: r["rnk"])] == [1, 2, 3, 4]


def test_bm25_scores_positive_and_ordered(corpus):
    out = sorted(R.bm25_topk(corpus, ["vector", "hash"], n=10).collect(), key=lambda r: r["rnk"])
    scores = [r["score"] for r in out]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    # doc 5 matches both terms with the highest tf at equal length — must rank 1st
    assert out[0]["doc_id"] == 5


def test_bm25_manual_value(spark):
    # single doc, single term: score = ln(1 + (N - df + .5)/(df + .5)) * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["score"] for r in R.bm25_topk(docs, ["a"], n=10).collect()}
    idf = math.log(1 + (2 - 1 + 0.5) / (1 + 0.5))
    tfc = (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * (3 / 3.0)))
    assert out.keys() == {1}
    assert abs(out[1] - round(idf * tfc, 9)) < 1e-9


def test_rrf_fusion_order(spark):
    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "doc_id long, rnk int")
    b = spark.createDataFrame([(20, 1), (40, 2)], "doc_id long, rnk int")
    out = {r["doc_id"]: (r["score"], r["rnk"]) for r in R.rrf_fuse(a, b).collect()}
    assert set(out) == {10, 20, 30, 40}
    # doc 20 appears in both lists -> highest fused score
    assert out[20][1] == 1
    assert abs(out[20][0] - round(1 / 62 + 1 / 61, 9)) < 1e-9
    # ties broken by doc_id: 10 (1/61) beats 40 (1/62)? 1/61 > 1/62 -> rank 2
    assert out[10][1] == 2 and out[40][1] == 3 and out[30][1] == 4


def test_bm25_no_full_corpus_explode(corpus):
    # the exploded row count is bounded by matching (doc, term) pairs,
    # not total tokens: scale guard on the plan's shuffled volume
    ts = R.bm25_term_scores(corpus, ["vector", "hash"])
    assert ts.count() == 6  # (1,v),(1,h),(2,v),(3,h),(5,v),(5,h)


def test_bm25_many_matches_single(corpus):
    """Batched scoring must equal the single-query operator per query."""
    queries = {"a": ["vector", "hash"], "b": ["hash"]}
    many = R.bm25_topk_many(corpus, queries, n=10).collect()
    by_q = {}
    for r in many:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"], r["rnk"]))
    for qid, terms in queries.items():
        single = [
            (r["doc_id"], r["score"], r["rnk"])
            for r in R.bm25_topk(corpus, terms, n=10).collect()
        ]
        assert sorted(by_q[qid]) == sorted(single), qid


def test_rrf_fuse_many_matches_binary(spark):
    per_q = spark.createDataFrame(
        [("a", 10, 1), ("a", 20, 2), ("b", 20, 1)],
        "query_id string, doc_id long, rnk int",
    )
    shared = spark.createDataFrame([(20, 1), (40, 2)], "doc_id long, rnk int")
    many = R.rrf_fuse_many(per_q, shared).collect()
    for qid in ("a", "b"):
        got = sorted(
            (r["doc_id"], r["score"], r["rnk"]) for r in many if r["query_id"] == qid
        )
        single = sorted(
            (r["doc_id"], r["score"], r["rnk"])
            for r in R.rrf_fuse(
                per_q.where(F.col("query_id") == qid).select("doc_id", "rnk"), shared
            ).collect()
        )
        assert got == single, qid


def test_bm25_refuses_empty_terms(corpus):
    with pytest.raises(ValueError, match="non-empty"):
        R.bm25_topk(corpus, [])
    with pytest.raises(ValueError, match="non-empty"):
        R.bm25_topk_many(corpus, {})
    with pytest.raises(ValueError, match="non-empty"):
        R.bm25_topk_many(corpus, {"q": []})


def test_bm25_duplicate_terms_count_once(corpus):
    """A term repeated in the query must not double its contribution."""
    once = sorted(
        (r["doc_id"], r["score"], r["rnk"])
        for r in R.bm25_topk(corpus, ["vector", "hash"], n=10).collect()
    )
    doubled = sorted(
        (r["doc_id"], r["score"], r["rnk"])
        for r in R.bm25_topk(corpus, ["vector", "hash", "vector"], n=10).collect()
    )
    assert once == doubled
    many = R.bm25_topk_many(corpus, {"q": ["hash", "hash", "vector"]}, n=10).collect()
    got = sorted((r["doc_id"], r["score"], r["rnk"]) for r in many)
    assert got == once


def test_rrf_fuse_many_keeps_zero_lexical_queries(spark, corpus):
    """A query whose keywords miss the corpus must still get its
    vector-only fused ranking when the authoritative id list is given."""
    bm = R.bm25_topk_many(corpus, {"hit": ["vector"]}, n=5)
    shared = spark.createDataFrame(
        [(101, 1), (102, 2)], "doc_id long, rnk int"
    )
    fused = R.rrf_fuse_many(bm, shared, query_ids=["hit", "miss"])
    per_q = {q: n for q, n in fused.groupBy("query_id").count().collect()}
    assert per_q["miss"] == 2  # vector rows only, reciprocal of rnk
    assert per_q["hit"] >= 5
    miss_rows = {r["doc_id"]: r["rnk"] for r in fused.where(F.col("query_id") == "miss").collect()}
    assert miss_rows == {101: 1, 102: 2}


def test_terms_are_normalized_to_tokenizer_form(corpus):
    """'Table' matches like 'table'; phrases and punctuation are refused."""
    a = {r["doc_id"]: r["score"] for r in R.bm25_topk(corpus, ["Hash"], n=5).collect()}
    b = {r["doc_id"]: r["score"] for r in R.bm25_topk(corpus, ["hash"], n=5).collect()}
    assert a == b and a
    with pytest.raises(ValueError, match="alphanumeric"):
        R.bm25_topk(corpus, ["two words"], n=5)
    with pytest.raises(ValueError, match="alphanumeric"):
        R.bm25_topk(corpus, ["don't"], n=5)
