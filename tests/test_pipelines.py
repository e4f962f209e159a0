"""End-to-end composition test: the curation pipeline drops exact dups,
near-dups, low-quality docs, and contaminated docs, and emits a
deterministic packed/sharded manifest."""

from __future__ import annotations

from pyspark.sql import functions as F

from wpvectordb_spark.pipelines import curate_training_corpus
from tests.conftest import SF_DIR


def test_curate_training_corpus_end_to_end(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where(F.col("doc_id") < 150)
        .select("doc_id", "lang", "text")
    )
    # plant an exact duplicate of doc 0 with a larger id
    dup = docs.where(F.col("doc_id") == 0).withColumn("doc_id", F.lit(90001))
    corpus = docs.unionByName(dup)
    # holdout = 10 real docs -> those exact docs must be decontaminated away
    holdout = docs.where(F.col("doc_id") < 10)
    out = curate_training_corpus(
        corpus,
        holdout=holdout,
        quality_quantile=0.25,
        near_dup_threshold=0.85,
        num_shards=4,
        seq_len=256,
    )
    rows = out.collect()
    assert rows
    assert set(out.columns) == {
        "doc_id", "lang", "n_tokens", "seq_start", "seq_end", "shard", "pos"
    }
    ids = {r["doc_id"] for r in rows}
    assert 90001 not in ids  # exact dup lost to the min-id winner
    assert ids.isdisjoint(set(range(10)))  # holdout copies decontaminated
    # per-shard positions are 1..n with no gaps (loader contract)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # quality gate actually dropped something beyond dedup/decontam
    assert len(ids) < corpus.count() - 11
    # deterministic end to end
    again = {tuple(r) for r in curate_training_corpus(
        corpus, holdout=holdout, quality_quantile=0.25,
        near_dup_threshold=0.85, num_shards=4, seq_len=256,
    ).collect()}
    assert again == {tuple(r) for r in rows}


def test_curate_training_corpus_dsir_stage(spark):
    """With a target distribution, the pipeline keeps exactly the
    requested count and skews the kept set toward the target."""
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where(F.col("doc_id") < 300)
        .select("doc_id", "lang", "text")
    )
    target = docs.where(F.col("lang") == "en").select("doc_id", "text")
    out = curate_training_corpus(
        docs,
        dsir_target=target,
        dsir_keep=40,
        quality_quantile=0.0,
        near_dup_threshold=0.95,
        num_shards=4,
        seq_len=256,
    )
    rows = out.collect()
    assert len({r["doc_id"] for r in rows}) <= 40
    langs = [r["lang"] for r in rows]
    assert langs.count("en") / len(langs) > 0.6  # enrichment over 44% base
