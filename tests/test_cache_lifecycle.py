"""Round-11 lifecycle guard: library operators with a ``persist=`` flag
must not register CacheManager entries they cannot hand the caller a
release handle for (round-10 verdict item 2 — the `_q_dedup_minhash_lsh`
leak class one layer down).

Each shared-intermediate barrier is now a LAZY ``localCheckpoint``
(blocks die with the frame via the ContextCleaner when the caller drops
it), so invoking a persisting operator repeatedly must leave the
session's CacheManager exactly as it found it — and results must be
identical with the barrier on and off.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _cache_empty(spark) -> bool:
    """True when the session CacheManager holds no entries (the thing a
    handle-less .persist() grows per call)."""
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text", "lang")
        .where(F.col("doc_id") < 800)
    )


def _invocations(docs):
    from wpvectordb_spark.operators import curation as CU
    from wpvectordb_spark.operators import dedup as D
    from wpvectordb_spark.operators import retrieval as R
    from wpvectordb_spark.operators import text_analysis as TA

    corpus = docs.select("doc_id", "text")
    half_a = corpus.where("doc_id % 2 = 0")
    half_b = corpus.where("doc_id % 2 = 1")
    target = docs.where(F.col("lang") == "en").select("doc_id", "text")
    return {
        "minhash_lsh_dedup_pairs": lambda p: D.minhash_lsh_dedup_pairs(
            corpus, threshold=0.5, persist=p
        ),
        # incremental path: barriers are unconditional (sh_d always, sh_c
        # when it bands the corpus itself) — same lambda both arms
        "incremental_dedup_pairs": lambda p: D.incremental_dedup_pairs(
            half_a, half_b, threshold=0.5
        ),
        # remove_duplicate_spans barriers internally via _span_detection
        # (persist flows from its caller); exercise the public cut path
        "remove_duplicate_spans": lambda p: D.remove_duplicate_spans(
            corpus, k=8, min_docs=2
        ),
        "bm25_term_scores": lambda p: R.bm25_term_scores(
            docs, ["batch", "scan"], persist=p
        ),
        "unigram_logprob_scores": lambda p: TA.unigram_logprob_scores(
            corpus, persist=p
        ),
        "pack_sequences": lambda p: CU.pack_sequences(docs, persist=p),
        "expand_budgets": lambda p: CU.expand_budgets(
            docs.select("doc_id", "lang"), {"en": 50, "de": 20}
        ),
        "dsir_topk": lambda p: CU.dsir_topk(corpus, target, k=50, persist=p),
    }


def test_persisting_operators_leave_cache_manager_alone(spark, docs):
    """Invoke every flag-persisting operator twice (barrier arm) and
    assert the CacheManager entry count never grows."""
    spark.catalog.clearCache()
    assert _cache_empty(spark)
    for name, make in _invocations(docs).items():
        for _ in range(2):
            make(True).write.format("noop").mode("overwrite").save()
        assert _cache_empty(spark), (
            f"{name}: persist=True registered a CacheManager entry with "
            "no release handle"
        )


def test_barrier_arm_matches_unbarriered_arm(spark, docs):
    """The barrier is a pure sharing optimization: persist=True and
    persist=False must produce identical rows."""
    from tests.conftest import rows_key

    for name, make in _invocations(docs).items():
        on = make(True)
        off = make(False)
        assert rows_key(on.columns, on.collect()) == rows_key(
            off.columns, off.collect()
        ), f"{name}: persist arms diverge"


def test_checkpoint_blocks_drain_after_frame_gc(spark, docs):
    """The barrier blocks themselves must be call-scoped: once the
    returned frame is garbage-collected, the ContextCleaner reclaims
    the localCheckpoint RDD blocks — executor storage does not grow per
    call (the CacheManager probe above cannot see checkpoint blocks, so
    this asserts the storage side directly)."""
    import gc
    import time

    from wpvectordb_spark.operators import dedup as D

    def stored_ids() -> set[int]:
        return {
            i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        }

    # DELTA-based: earlier tests in this shared session may still have
    # their own blocks awaiting the ContextCleaner; only the RDD ids
    # THIS call materializes must drain once its frame is dropped
    before = stored_ids()
    out = D.minhash_lsh_dedup_pairs(
        docs.select("doc_id", "text"), threshold=0.5, persist=True
    )
    out.write.format("noop").mode("overwrite").save()
    mine = stored_ids() - before
    assert mine  # the barrier materialized blocks
    del out
    # release the py4j proxies first (Python gc), then ask the JVM for a
    # GC — the ContextCleaner reclaims via weak references, which only
    # enqueue on a JVM collection (its own periodic GC is 30 min)
    gc.collect()
    spark._jvm.System.gc()
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline and stored_ids() & mine:
        gc.collect()
        spark._jvm.System.gc()
        time.sleep(2)
    assert not (stored_ids() & mine), (
        "localCheckpoint blocks survived frame GC — the barrier is not "
        "call-scoped"
    )


def test_barrier_mode_escape_hatch(spark, docs, tmp_path):
    """Round-12 (verdict item 6): the lazy-localCheckpoint barriers are
    not scale-safe under executor loss, so the barrier helper exposes a
    session-level mode knob.  ``reliable`` (with a checkpoint dir)
    and ``none`` must both produce identical rows to the default;
    ``reliable`` WITHOUT a checkpoint dir must refuse loudly rather
    than silently downgrade; unknown modes are refused."""
    from tests.conftest import rows_key
    from wpvectordb_spark.operators import dedup as D

    corpus = docs.select("doc_id", "text")
    base = D.minhash_lsh_dedup_pairs(corpus, threshold=0.5)
    want = rows_key(base.columns, base.collect())

    sc = spark.sparkContext
    had_dir = not sc._jsc.sc().getCheckpointDir().isEmpty()
    try:
        if not had_dir:
            # refusal must precede the directory existing
            spark.conf.set("spark.wpvectordb.barrier", "reliable")
            with pytest.raises(ValueError, match="checkpoint"):
                D.minhash_lsh_dedup_pairs(corpus, threshold=0.5).collect()
            sc.setCheckpointDir(str(tmp_path / "ckpt"))
        else:  # another test already pinned a session checkpoint dir
            spark.conf.set("spark.wpvectordb.barrier", "reliable")
        got = D.minhash_lsh_dedup_pairs(corpus, threshold=0.5)
        assert rows_key(got.columns, got.collect()) == want

        spark.conf.set("spark.wpvectordb.barrier", "none")
        got = D.minhash_lsh_dedup_pairs(corpus, threshold=0.5)
        assert rows_key(got.columns, got.collect()) == want

        spark.conf.set("spark.wpvectordb.barrier", "bogus")
        with pytest.raises(ValueError, match="bogus"):
            D.minhash_lsh_dedup_pairs(corpus, threshold=0.5).collect()
    finally:
        spark.conf.unset("spark.wpvectordb.barrier")


def test_index_builds_leave_cache_manager_alone(spark, tmp_path):
    """Round-12 (verdict item 8): the IVF/IVFPQ build functions persist
    their tiny centroid frames internally with a try/finally release —
    every consumer is an action inside the call, so the CacheManager
    must be empty again the moment the build returns (and on the
    failure path, which the finally covers)."""
    import os as _os

    from wpvectordb_spark.operators import similarity as SIM

    emb = spark.read.parquet(_os.path.join(SF_DIR, "embeddings.parquet"))
    spark.catalog.clearCache()
    assert _cache_empty(spark)
    SIM.build_ivf_index(emb, str(tmp_path / "ivf"), n_clusters=8)
    assert _cache_empty(spark), "build_ivf_index retained a cache entry"
    SIM.build_ivfpq_index(
        emb, str(tmp_path / "ivfpq"), dim=64, n_clusters=8, m=8, n_codes=16
    )
    assert _cache_empty(spark), "build_ivfpq_index retained a cache entry"
