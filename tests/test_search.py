"""Search pipeline property tests (SURVEY.md §5.3): funnel semantics,
batch/single consistency, determinism under repartitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wpvectordb_spark.operators import search as S
from wpvectordb_spark.operators import table_ops as TO
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return e.select(
        F.col("vec_id").alias("id"),
        F.col("vec_id").alias("post_id"),
        F.col("embedding").alias("vector"),
    )


@pytest.fixture(scope="module")
def qv(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return [float(x) for x in e.where(F.col("vec_id") == 7).first()["embedding"]]


def ids(df, col="id"):
    return [r[col] for r in df.collect()]


def test_self_query_is_top_hit(emb, qv):
    top = S.search(emb, qv, n=1, code_col=None, mag_col=None).collect()
    assert top[0]["id"] == 7
    assert top[0]["hamming_distance"] == 0
    assert top[0]["cosine_similarity"] == pytest.approx(1.0, abs=1e-9)


def test_two_phase_with_wide_funnel_equals_brute_force(emb, qv):
    """With a funnel wide enough to keep everything, the two-phase result
    must equal exact brute-force top-n."""
    n = 5
    exact = ids(S.brute_force_topk(emb, qv, n=n, vector_col="vector"))
    # n=5 -> stage2 keeps 50; widen by searching with n covering the table
    wide = S.search(emb, qv, n=50, code_col=None, mag_col=None)
    # brute-force top-5 must be inside the wide two-phase top-50's cosine order
    wide_ids = ids(wide)
    assert set(exact) <= set(wide_ids)


def test_precomputed_index_matches_inline_derivation(spark, emb, qv):
    """Searching over a derived index (stored binary_code/magnitude) gives
    the same result as deriving inline — the write path and read path
    agree."""
    idx = TO.derive(emb, vector_col="vector", keep_normalized=False)
    with_index = S.search(idx, qv, n=5)
    inline = S.search(emb, qv, n=5, code_col=None, mag_col=None)
    assert [tuple(r) for r in with_index.collect()] == [tuple(r) for r in inline.collect()]


def test_determinism_under_repartition(emb, qv):
    a = S.search(emb, qv, n=5, code_col=None, mag_col=None).collect()
    b = S.search(emb.repartition(17), qv, n=5, code_col=None, mag_col=None).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_batch_search_matches_single(spark, emb, qv):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = e.where(F.col("vec_id").isin(3, 7, 11)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector")
    )
    batch = S.search_many(
        emb, queries, n=5, code_col=None, mag_col=None
    ).collect()
    by_query = {}
    for r in batch:
        by_query.setdefault(r["query_id"], []).append((r["rank"], r["id"]))
    for qid in (3, 7, 11):
        single_qv = [float(x) for x in e.where(F.col("vec_id") == qid).first()["embedding"]]
        single = ids(S.search(emb, single_qv, n=5, code_col=None, mag_col=None))
        got = [i for _, i in sorted(by_query[qid])]
        assert got == single, f"query {qid}: batch {got} != single {single}"


def test_stage1_parity_cap_still_available(emb, qv):
    capped = S.search(emb, qv, n=5, code_col=None, mag_col=None, stage1_limit=100)
    assert len(capped.collect()) == 5


def test_two_phase_sql_matches_dataframe_api(spark):
    """The SQL-API form of the flagship funnel (plans.sql_queries) produces
    the identical result set as the DataFrame form — same Catalyst plan
    surface, kept in lockstep (driver key: search_two_phase)."""
    import __spark_entry__ as entry
    from tests.conftest import SF_DIR

    a = sorted(map(tuple, entry._q_search_two_phase(spark, SF_DIR).collect()), key=repr)
    b = sorted(map(tuple, entry._q_search_two_phase_sql(spark, SF_DIR).collect()), key=repr)
    assert a == b


def test_quantized_topk_recall_and_plan(spark):
    """Quantized-scan + exact-rerank top-k: the oversampled int8 stage
    recovers the exact float top-10, and both stages compile to
    TakeOrderedAndProject merges (no full-result shuffle)."""
    from tests.conftest import SF_DIR
    from wpvectordb_spark.operators import similarity as SIM
    from wpvectordb_spark.operators.search import brute_force_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r["id"] for r in brute_force_topk(
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector")), q, n=10
    ).collect()]
    out = SIM.quantized_topk(emb, q, n=10)
    got = [r["vec_id"] for r in out.collect()]
    assert set(got) == set(exact)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("TakeOrderedAndProject") == 2, plan


def test_search_many_rejects_mismatched_query_dims(spark):
    """The single-query facade rejects mismatched dims (table._check_length);
    the batch path must too — a misaligned word packing silently returns
    plausible-looking wrong rows, and an over-long query NULLs every
    Hamming distance and returns the lowest-id rows as the 'top' k."""
    import pytest as _pytest

    vectors = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 0.0]) for i in range(20)],
        "id long, vector array<float>",
    )
    bad = spark.createDataFrame(
        [("q0", [1.0, 0.0, 0.0])], "query_id string, query_vector array<float>"
    )
    with _pytest.raises(Exception, match="query vector has 3"):
        S.search_many(vectors, bad, n=3, code_col=None, mag_col=None).collect()
    ok = spark.createDataFrame(
        [("q0", [1.0, 0.0, 0.0, 0.0])], "query_id string, query_vector array<float>"
    )
    assert S.search_many(vectors, ok, n=3, code_col=None, mag_col=None).count() == 3
    # expected_dim= skips the eager one-row probe (the facade's declared
    # length wins over whatever arbitrary row the probe would anchor to)
    with _pytest.raises(Exception, match="table has 4"):
        S.search_many(
            vectors, bad, n=3, code_col=None, mag_col=None, expected_dim=4
        ).collect()
    assert (
        S.search_many(
            vectors, ok, n=3, code_col=None, mag_col=None, expected_dim=4
        ).count()
        == 3
    )
    # a NULL query vector is not a dim mismatch: it ranks no rows instead
    # of raising ('query vector has -1 dims')
    nullq = spark.createDataFrame(
        [("q0", None)], "query_id string, query_vector array<float>"
    )
    assert (
        S.search_many(vectors, nullq, n=3, code_col=None, mag_col=None).count() == 0
    )
