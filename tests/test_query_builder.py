"""DSL semantics tests (SURVEY.md §2.3): CNF grouping, operator whitelist,
contains-LIKE, empty-IN tautology, EAV meta predicates, meta sort casts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wpvectordb_spark.plans import Filter, QueryBuilder, Sort
from wpvectordb_spark.sources import doc_meta_from_documents
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumnRenamed(
        "doc_id", "post_id"
    )


@pytest.fixture(scope="module")
def meta(spark, docs):
    return doc_meta_from_documents(docs.withColumnRenamed("post_id", "doc_id"))


def ids(df):
    return {r["post_id"] for r in df.collect()}


def test_operator_whitelist():
    with pytest.raises(ValueError):
        Filter("lang", "REGEXP", "en")
    with pytest.raises(ValueError):
        Sort("lang", "SIDEWAYS")
    with pytest.raises(ValueError):
        Sort("lang", "ASC", is_meta=True, meta_cast="json")


def test_column_filter_and_cnf(docs, meta):
    qb = QueryBuilder()
    qb.add_filter("langs", Filter("lang", "=", "en"))
    qb.add_filter("langs", Filter("lang", "=", "de"))  # OR within group
    qb.add_filter("size", Filter("n_chars", ">", 300))  # AND across groups
    got = ids(qb.candidates(docs, meta))
    want = ids(
        docs.where((F.col("lang").isin("en", "de")) & (F.col("n_chars") > 300)).select(
            "post_id"
        )
    )
    assert got == want and got


def test_like_is_contains(docs):
    qb = QueryBuilder()
    qb.add_filter("t", Filter("text", "LIKE", "spark"))
    got = ids(qb.candidates(docs))
    want = ids(docs.where(F.col("text").contains("spark")).select("post_id"))
    assert got == want


def test_empty_in_tautology(docs):
    for op in ("IN", "NOT IN"):
        qb = QueryBuilder()
        qb.add_filter("g", Filter("lang", op, []))
        assert ids(qb.candidates(docs)) == ids(docs.select("post_id"))


def test_meta_predicate_numeric_cast(docs, meta):
    qb = QueryBuilder()
    qb.add_filter("m", Filter("n_chars", ">", 300, is_meta=True))
    got = ids(qb.candidates(docs, meta))
    want = ids(docs.where(F.col("n_chars") > 300).select("post_id"))
    assert got == want and got


def test_meta_cross_group_single_row_semantics(docs, meta):
    """Two meta predicates in different AND groups need one meta row to
    satisfy both -> empty (faithful to the reference's single pm alias)."""
    qb = QueryBuilder()
    qb.add_filter("a", Filter("lang", "=", "en", is_meta=True))
    qb.add_filter("b", Filter("source", "=", "src1", is_meta=True))
    assert ids(qb.candidates(docs, meta)) == set()


def test_meta_sort_number_cast(spark, docs, meta):
    base = docs.select("post_id").limit(20).withColumn("id", F.col("post_id"))
    qb = QueryBuilder()
    qb.add_sort(Sort("n_chars", "DESC", is_meta=True, meta_cast="number"))
    out = qb.apply_sorts(base, documents=docs, doc_meta=meta).collect()
    n_by_id = {r["post_id"]: r["n_chars"] for r in docs.select("post_id", "n_chars").collect()}
    vals = [n_by_id[r["post_id"]] for r in out]
    assert vals == sorted(vals, reverse=True)
    # string sort would differ (e.g. "99" > "100"); ensure we did numeric
    assert len(out) == 20


def test_column_sort(docs):
    base = docs.select("post_id").limit(10).withColumn("id", F.col("post_id"))
    qb = QueryBuilder()
    qb.add_sort(Sort("source", "ASC"))
    out = qb.apply_sorts(base, documents=docs)
    assert out.columns == ["post_id", "id"]  # sort cols dropped after order


def test_meta_sort_date_cast(spark):
    """Q8: meta date cast — string dates sort chronologically, not
    lexically (e.g. '2024-2-1' vs '2024-10-1' would sort wrong as text)."""
    base = spark.createDataFrame(
        [(1,), (2,), (3,)], "post_id long"
    ).withColumn("id", F.col("post_id"))
    meta = spark.createDataFrame(
        [
            (1, "published", "2024-10-01"),
            (2, "published", "2024-02-01"),
            (3, "published", "2024-09-15"),
        ],
        "post_id long, meta_key string, meta_value string",
    )
    qb = QueryBuilder()
    qb.add_sort(Sort("published", "ASC", is_meta=True, meta_cast="date"))
    out = [r["post_id"] for r in qb.apply_sorts(base, doc_meta=meta).collect()]
    assert out == [2, 3, 1]


def test_meta_string_max_pivot_semantics(spark):
    """§7.4.5: multiple meta rows for one key pivot via STRING max
    (the reference's MAX(pm.meta_value) over text)."""
    base = spark.createDataFrame([(1,), (2,)], "post_id long").withColumn(
        "id", F.col("post_id")
    )
    meta = spark.createDataFrame(
        [(1, "score", "9"), (1, "score", "10"), (2, "score", "5")],
        "post_id long, meta_key string, meta_value string",
    )
    qb = QueryBuilder()
    qb.add_sort(Sort("score", "DESC", is_meta=True, meta_cast="number"))
    out = [r["post_id"] for r in qb.apply_sorts(base, doc_meta=meta).collect()]
    # string max picks '9' (not '10') for post 1 -> 9 > 5 -> [1, 2]
    assert out == [1, 2]


def test_in_rejects_non_list_values():
    with pytest.raises(ValueError):
        QueryBuilder().add_filter("g", Filter("status", "IN", "publish")).predicate()
    with pytest.raises(ValueError):
        QueryBuilder().add_filter("g", Filter("status", "NOT IN", 5)).predicate()


def test_bool_in_list_matches_stored_lowercase(spark):
    """[True] in an IN list must compare against the stored 'true' string
    like the scalar-bool path, not take the numeric cast branch."""
    meta = spark.createDataFrame(
        [(1, "published", "true"), (2, "published", "false")],
        "post_id long, meta_key string, meta_value string",
    )
    docs = spark.createDataFrame([(1,), (2,)], "post_id long")
    qb = QueryBuilder().add_filter("g", Filter("published", "IN", [True], is_meta=True))
    got = {r["post_id"] for r in qb.candidates(docs, meta, id_col="post_id").collect()}
    assert got == {1}
    scalar = QueryBuilder().add_filter("g", Filter("published", "=", True, is_meta=True))
    assert got == {
        r["post_id"] for r in scalar.candidates(docs, meta, id_col="post_id").collect()
    }
