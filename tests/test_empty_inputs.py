"""Empty-input smoke: every major operator family must handle an empty
(but correctly-typed) input without raising — the shape of a filtered-out
partition, an empty crawl increment, or a new tenant's first run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wpvectordb_spark.operators import curation as CU
from wpvectordb_spark.operators import dedup as D
from wpvectordb_spark.operators import events as E
from wpvectordb_spark.operators import retrieval as R
from wpvectordb_spark.operators import search as S
from wpvectordb_spark.operators import text_analysis as TA


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


@pytest.fixture(scope="module")
def empty_events(spark):
    return spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


def test_dedup_family_on_empty_corpus(spark, empty_docs):
    assert D.exact_dedup(empty_docs).count() == 0
    assert D.minhash_lsh_dedup_pairs(empty_docs).count() == 0
    assert D.simhash_near_dup_pairs(empty_docs).count() == 0
    assert D.duplicate_span_stats(empty_docs).count() == 0
    assert D.remove_duplicate_spans(empty_docs).count() == 0


def test_incremental_dedup_empty_sides(spark, empty_docs):
    docs = spark.createDataFrame(
        [(1, "some words here repeated words here"), (2, "other text entirely")],
        "doc_id long, text string",
    )
    assert D.incremental_dedup_pairs(empty_docs, docs).count() == 0
    assert D.incremental_dedup_pairs(docs, empty_docs).count() == 0


def test_curation_family_on_empty_corpus(spark, empty_docs):
    empty_lang = empty_docs.withColumn("lang", F.lit(None).cast("string"))
    assert CU.stratified_sample(empty_lang, {"en": 0.5}).count() == 0
    assert CU.pack_sequences(empty_lang, persist=False).count() == 0
    assert CU.cap_per_domain(empty_docs.withColumn("source", F.lit(None).cast("string")),
                             max_docs=5, domain_col="source").count() == 0
    assert CU.chunk_documents(empty_docs, chunk_tokens=8, overlap=2).count() == 0
    assert CU.c4_page_filter(empty_docs).count() == 0
    assert CU.dsir_topk(empty_docs, empty_docs, k=5).count() == 0


def test_dsir_empty_target_is_defined(spark, empty_docs):
    """Empty target: uniform smoothed target model — weights defined."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    rows = CU.dsir_topk(docs, empty_docs, k=5).collect()
    assert len(rows) == 2
    assert all(r["weight"] is not None for r in rows)


def test_events_family_on_empty_events(spark, empty_events):
    assert E.tumbling_window_agg(empty_events).count() == 0
    assert E.sessionize(empty_events).count() == 0
    assert E.conversion_funnel(empty_events).count() == 0
    assert E.retention_cohorts(empty_events).count() == 0


def test_search_and_text_on_empty_inputs(spark, empty_docs):
    empty_index = spark.createDataFrame(
        [], "id long, post_id long, vector array<float>"
    )
    from wpvectordb_spark.operators import table_ops as TO

    derived = TO.derive(empty_index)
    assert S.search(derived, [0.1] * 4, n=5).count() == 0
    assert S.brute_force_topk(empty_index, [0.1] * 4, n=5).count() == 0
    assert TA.analyze_full(empty_docs).count() == 0
    assert TA.unigram_logprob_scores(empty_docs).count() == 0
    assert R.bm25_topk(empty_docs, ["term"], n=5).count() == 0


def test_round7_operators_on_empty_inputs(spark, empty_docs):
    """gopher filter and survivor resolution degrade to empty outputs
    (never a crash, never a phantom row) on empty frames."""
    assert CU.gopher_quality_filter(empty_docs).count() == 0
    empty_comp = spark.createDataFrame([], "doc_id long, component_id long")
    assert D.resolve_duplicates(empty_comp).count() == 0
    assert (
        D.resolve_duplicates(
            empty_comp,
            spark.createDataFrame([], "doc_id long, score double"),
        ).count()
        == 0
    )
    # components present but the scores frame empty: every member gets
    # a NULL score, so the smallest id wins per component
    comp = spark.createDataFrame(
        [(5, 5), (7, 5)], "doc_id long, component_id long"
    )
    got = {
        r["doc_id"]: r
        for r in D.resolve_duplicates(
            comp, spark.createDataFrame([], "doc_id long, score double")
        ).collect()
    }
    assert got[5]["kept"] == 1 and got[7]["kept"] == 0


def test_round7_session3_operators_on_empty_inputs(spark, empty_docs):
    """Span decontamination, domain gating, and epoch expansion degrade
    to empty/roundtrip outputs on empty frames."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    # empty corpus -> empty output; empty holdout -> untouched roundtrip
    assert CU.decontaminate_spans(empty_docs, docs, k=3).count() == 0
    rt = CU.decontaminate_spans(docs, empty_docs, k=3).collect()
    assert len(rt) == 1 and rt[0]["n_kept"] == rt[0]["n_tokens"] == 5
    # empty scored frame -> empty gate output
    empty_scored = spark.createDataFrame(
        [], "doc_id long, domain string, quality double"
    )
    assert CU.domain_quality_filter(empty_scored, 0.5).count() == 0
    # empty docs or empty budgets -> no expansion rows
    assert CU.expand_budgets(empty_docs.selectExpr("doc_id", "'en' AS lang"),
                             {"en": 10}).count() == 0
    assert CU.expand_budgets(docs.selectExpr("doc_id", "'en' AS lang"),
                             {}).count() == 0
    # empty chunk frame -> no pooled vectors
    from wpvectordb_spark.operators import similarity as SIM

    empty_chunks = spark.createDataFrame(
        [], "doc_id long, chunk_id long, embedding array<float>"
    )
    assert SIM.pool_embeddings(empty_chunks).count() == 0


def test_round9_operators_on_empty_and_edge_inputs(spark, empty_docs, empty_events):
    """Round-9 additions under the standing empty/edge probe: empty
    frames, empty budgets, NULL strata, over-budget strata, single-
    window spines, NULL payloads."""
    from wpvectordb_spark.operators import multimodal as M

    empty_w = spark.createDataFrame(
        [], "doc_id long, lang string, weight double"
    )
    assert CU.weighted_budget_sample(empty_w, {"en": 5.0}).count() == 0
    w = spark.createDataFrame(
        [(1, "en", 1.0), (2, None, 1.0), (3, "en", 0.0)],
        "doc_id long, lang string, weight double",
    )
    # empty budgets: everything drops (CASE collapses to the 0 literal)
    assert CU.weighted_budget_sample(w, {}).count() == 0
    # NULL stratum drops in BOTH engines (equi-join + CASE can't match);
    # budget over stratum mass keeps the whole stratum, including the
    # massless weight-0 row
    kept = CU.weighted_budget_sample(w, {"en": 100.0}).collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 3]
    # densify on empty events and on a single observed window
    assert E.windowed_anomaly_scores(empty_events, densify=True).count() == 0
    import datetime as dt

    one = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1), "a", 1.0)],
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double",
    )
    rows = E.windowed_anomaly_scores(one, densify=True).collect()
    assert len(rows) == 1 and rows[0]["zscore"] is None
    # byte_verify over empty media and NULL payloads (sanitized to b"")
    empty_media = spark.createDataFrame(
        [], "media_id long, media_type string, payload binary"
    )
    assert M.media_exact_dedup(empty_media, byte_verify=True).count() == 0
    nulls = spark.createDataFrame(
        [(1, "x", None), (2, "x", None)],
        "media_id long, media_type string, payload binary",
    )
    r = M.media_exact_dedup(nulls, byte_verify=True).collect()
    assert len(r) == 1 and r[0]["dup_count"] == 2  # NULLs both -> b""


def test_round10_operators_on_empty_and_edge_inputs(spark, empty_events):
    """Round-10 additions under the standing empty/edge probe: the HLL
    family on empty/all-NULL inputs, retrain_decision on an empty
    recall report (the mirror-parity coalesces), and the soft-dedup
    pipeline over an empty corpus."""
    from wpvectordb_spark.operators import similarity as SIM
    from wpvectordb_spark.pipelines import curate_training_corpus

    assert E.approx_distinct_rollup(empty_events).count() == 0
    nulls = spark.createDataFrame(
        [("a", None), ("a", None)], "g string, user_id long"
    )
    regs = E.hll_registers(nulls, ["g"])
    assert regs.count() == 0  # NULLs drop like COUNT DISTINCT
    assert E.hll_estimate(regs, ["g"]).count() == 0
    # empty recall report -> a defined, mirror-identical verdict
    empty_rep = spark.createDataFrame(
        [], "query_id long, n_hit long, n_exact long, recall double"
    )
    row = SIM.retrain_decision(empty_rep, threshold=0.9).collect()[0]
    assert (row["n_queries"], row["n_below"], row["retrain"]) == (0, 0, 0)
    assert row["mean_recall"] is None and row["min_recall"] is None
    # soft-dedup pipeline over an empty corpus: no stage crashes, the
    # weight column still exists in the (empty) manifest
    empty_corpus = spark.createDataFrame(
        [], "doc_id long, lang string, text string"
    )
    out = curate_training_corpus(
        empty_corpus, budgets={"en": 5.0}, soft_dedup=True, persist=False
    )
    assert out.count() == 0 and "weight" in out.columns
