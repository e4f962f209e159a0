#!/usr/bin/env python3
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric", "value" (total seconds), "unit",
"queries" (per-query seconds), "sf", "median_of"}.  Each query
materializes fully (count/collect) so the measured time covers the whole
plan execution.

Per-query numbers are MEDIANS of $SPARK_GRAFT_BENCH_RUNS runs (default
3) and the total is the sum of medians: identical-plan queries on this
host vary by several seconds run-to-run (PERFORMANCE.md documents 1.7 ->
5.9 s on one plan), and round 2 spent a manual re-run adjudicating six
phantom "regressions" that were all host noise.  Set
SPARK_GRAFT_BENCH_RUNS=1 for the old single-shot behavior.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from wpvectordb_spark.operators import search as S
    from wpvectordb_spark.session import get_spark

    # Capture load BEFORE the JVM launches: the end-of-run loadavg is
    # self-inflated by the benchmark itself, so it cannot adjudicate
    # whether the window was quiet.  Rounds 5 and 6 both shipped
    # artifacts ~50% above quiet-window truth because the recorded
    # number couldn't prove contamination (PERFORMANCE.md items 47/49).
    loadavg_prelaunch = [round(x, 2) for x in os.getloadavg()]
    window = "quiet" if loadavg_prelaunch[0] < 1.0 else "contaminated"
    if window == "contaminated":
        print(
            f"# WARNING: pre-launch 1-min loadavg {loadavg_prelaunch[0]} >= 1 — "
            "this run's numbers are not comparable across rounds",
            file=sys.stderr,
        )

    spark = get_spark("wpvectordb-bench")
    # Codegen mode: the Spark default (FALLBACK, whole-stage codegen with
    # interpreted fallback).  Round 2 measured interpreted mode faster and
    # pinned NO_CODEGEN — but that measurement was dominated by COLD
    # Janino compiles on single-shot plans.  With per-key warm runs and
    # medians (identical plan text -> codegen cache hit on re-runs), the
    # production default ties or wins on 21 of 23 keys (rel_* and window
    # keys by 1.4-1.7x; only dedup_simhash/search_two_phase are ~5% better
    # interpreted — noise range).  Re-measured 2026-08-14; see
    # PERFORMANCE.md item 29.
    spark.conf.set(
        "spark.sql.codegen.factoryMode",
        os.environ.get("SPARK_GRAFT_CODEGEN", "FALLBACK"),
    )

    # Frozen headline set (same keys every round for clean BENCH_rN diffs).
    # Keys map to the single-operator callables directly — the driver
    # registry (entry.queries()) merges some of them into tagged unions,
    # but the bench surface stays key-stable.
    qmap = {
        "search_two_phase": entry._q_search_two_phase,
        "search_brute_force": entry._q_search_brute_force,
        "ann_ivf": entry._q_ann_ivf,
        "index_build": entry._q_index_build,
        "dedup_exact": entry._q_dedup_exact,
        "dedup_minhash_lsh": entry._q_dedup_minhash_lsh,
        "dedup_simhash": entry._q_dedup_simhash,
        "dedup_embedding_cosine": entry._q_dedup_embedding_cosine,
        "text_analyze": entry._q_text_analyze,
        "events_tumbling": entry._q_events_tumbling,
        "events_sessionize": entry._q_events_sessionize,
        "events_user_activity": entry._q_events_user_activity,
        "rel_pricing_summary": entry._q_rel_pricing_summary,
        "rel_top_customers": entry._q_rel_top_customers,
        "rel_revenue_by_nation": entry._q_rel_revenue_by_nation,
        "queue_claim_state": entry._q_queue_claim_state,
        "stream_tumbling": entry._q_stream_tumbling,
        "multimodal_features": entry._q_multimodal_features,
        "ann_lsh": entry._q_ann_lsh,
        "text_fingerprint": entry._q_text_fingerprint,
        "curate_pack_sequences": entry._q_curate_pack_sequences,
    }
    headline = list(qmap)

    # warm the JVM/codegen once with a trivial action, and the Python
    # worker pool with a trivial mapInPandas (so the first Pandas-UDF
    # query measures the operator, not 32 interpreter forks + imports)
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    warm = spark.range(64).repartition(32)
    warm.mapInPandas(lambda it: it, "id long").count()
    # ... and the interpreted HOF expression evaluators: C2 compilation of
    # the fold/zip_with paths costs several seconds the first time they
    # run (measured 6.8 s cold -> 1.7 s warm for the same MinHash pipeline
    # at sf0.1).  A 200-doc pass through the two near-dup pipelines warms
    # those paths so the timed queries measure operator throughput, not
    # JIT state.  On a long-running cluster this state is always warm.
    from wpvectordb_spark.operators import dedup as _D

    _tiny = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).limit(200)
    _D.minhash_lsh_dedup_pairs(_tiny, threshold=0.5).count()
    _D.simhash_near_dup_pairs(_tiny, max_hamming=3).count()
    spark.catalog.clearCache()

    def timed(fn) -> float:
        """Median wall time of RUNS full materializations (fresh plan each
        run — the query callables rebuild their lineage, so no cache
        reuse inflates the later runs)."""
        samples = []
        for _ in range(RUNS):
            t0 = time.monotonic()
            fn()
            samples.append(time.monotonic() - t0)
        return round(statistics.median(samples), 3)

    timings: dict[str, float] = {}
    for name in headline:
        timings[name] = timed(lambda: qmap[name](spark, SF_DIR).count())
        print(f"# {name}: {timings[name]}s (median of {RUNS})", file=sys.stderr)

    # batch search: 50 query vectors against the whole table in one plan —
    # the Spark-native generalization (not in queries(): no single-query oracle)
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    vectors = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )
    qs = emb.where(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector")
    )
    timings["search_batch_50"] = timed(
        lambda: S.search_many(vectors, qs, n=5, code_col=None, mag_col=None).count()
    )
    print(f"# search_batch_50: {timings['search_batch_50']}s", file=sys.stderr)

    # Arrow/numpy cosine fast path vs the Catalyst expression form
    from wpvectordb_spark.operators import similarity as SIM

    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    timings["search_brute_force_arrow"] = timed(
        lambda: SIM.brute_force_topk_arrow(emb, qv, n=10).count()
    )
    print(f"# search_brute_force_arrow: {timings['search_brute_force_arrow']}s", file=sys.stderr)

    # --- extras: round-3/4 operators, PRINTED but NOT part of the frozen
    # headline total (BENCH_rN "value"/"queries" diff cleanly across
    # rounds; extras give the newer operators bench visibility) ---------
    from wpvectordb_spark.operators import curation as CU
    from wpvectordb_spark.operators import dedup as D
    from wpvectordb_spark.operators import events as EV
    from wpvectordb_spark.operators import multimodal as MM
    from wpvectordb_spark.operators import text_analysis as TA
    from wpvectordb_spark.sources.loaders import load_events

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text", "lang"
    )
    events = load_events(spark, SF_DIR)
    extra_map = {
        "dedup_span_cut": lambda: D.remove_duplicate_spans(
            docs.select("doc_id", "text"), k=8, min_docs=2
        ).count(),
        # persist=False: dsir's internal feature cache would otherwise be
        # CacheManager-deduped across the median runs — runs 2..N would
        # measure warm-cache scans, not the operator
        "curate_dsir": lambda: CU.dsir_topk(
            docs.select("doc_id", "text"),
            docs.where(F.col("lang") == "en").select("doc_id", "text"),
            k=100,
            persist=False,
        ).count(),
        "events_retention_cohorts": lambda: EV.retention_cohorts(events).count(),
        "events_sequence_funnel": lambda: EV.sequence_funnel(
            events, ["view", "click", "purchase"]
        ).count(),
        "multimodal_resize": lambda: MM.resize_media(
            MM.media_from_documents(
                spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            ),
            64,
            64,
            resizer=MM.fake_resizer,
        ).count(),
        "curate_pipeline": lambda: entry._pipeline_manifest(spark, SF_DIR).count(),
        # corpus quality profile: one narrow projection + one hash agg
        # to #strata rows — the daily "know your data" monitor pass.
        # collect(), NOT count(): count() of an Aggregate lets Catalyst
        # prune the unused metric expressions, so round 6's 0.47 s
        # measured only the group-count shuffle, not the per-doc
        # feature computation (the actual cost; round-7 scale sweep)
        "corpus_profile": lambda: TA.corpus_profile(
            spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        ).collect(),
    }
    # product-quantization serving: zero-shuffle ADC scan over the STORED
    # 8-entry codes + exact rerank (the 32x-memory-shrink scan path).
    # Codebook + encode are index-build-time costs, excluded like the IVF
    # index build; localCheckpoint materializes the codes once.
    pq_cb = SIM._collect_codebooks(
        SIM.pq_codebooks(emb, dim=entry.PQ_DIM, m=entry.PQ_M, n_codes=entry.PQ_CODES),
        entry.PQ_M,
    )
    pq_codes = SIM._pq_encode_from_cb(
        emb, pq_cb, entry.PQ_DIM, entry.PQ_M, "vec_id", "embedding"
    ).localCheckpoint()
    extra_map["ann_pq_serve"] = lambda: SIM.pq_topk(
        emb,
        qv,
        dim=entry.PQ_DIM,
        m=entry.PQ_M,
        n_codes=entry.PQ_CODES,
        n=10,
        codebooks=pq_cb,
        encoded=pq_codes,
    ).count()
    # batched PQ serving: the same 50-query frame as ann_ivf_batch_50
    # through ONE zero-shuffle ADC plan over the stored codes
    extra_map["ann_pq_batch_50"] = lambda: SIM.pq_topk_many(
        emb,
        qs,
        dim=entry.PQ_DIM,
        m=entry.PQ_M,
        n_codes=entry.PQ_CODES,
        n=10,
        codebooks=pq_cb,
        encoded=pq_codes,
    ).count()
    # batched IVF serving: 50 queries through ONE partition-pruned plan
    # against a persisted index (build cost excluded — it's the serving
    # path being measured; index_build covers construction)
    import shutil
    import tempfile

    ivf_dir = tempfile.mkdtemp(prefix="bench_ivf_")
    SIM.build_ivf_index(emb, ivf_dir, n_clusters=16)
    extra_map["ann_ivf_batch_50"] = lambda: SIM.ivf_topk_many(
        spark, qs, path=ivf_dir, k=10, n_probe=4
    ).count()
    # IVFPQ serving: probe-pruned partitions + code-ADC + exact rerank
    # against the combined persisted index (build excluded, as above)
    ivfpq_dir = tempfile.mkdtemp(prefix="bench_ivfpq_")
    SIM.build_ivfpq_index(
        emb, ivfpq_dir, dim=entry.PQ_DIM,
        n_clusters=16, m=entry.PQ_M, n_codes=entry.PQ_CODES,
    )
    extra_map["ann_ivfpq"] = lambda: SIM.ivfpq_topk(
        spark, ivfpq_dir, qv, dim=entry.PQ_DIM, m=entry.PQ_M, k=10, n_probe=4
    ).count()
    # batched IVFPQ serving: the same 50-query frame through ONE
    # probe-pruned constant-table ADC plan against the persisted index
    extra_map["ann_ivfpq_batch_50"] = lambda: SIM.ivfpq_topk_many(
        spark, ivfpq_dir, qs, dim=entry.PQ_DIM, m=entry.PQ_M, k=10, n_probe=4
    ).count()
    # residual IVFPQ serving (codes over v - centroid, per-probed-cluster
    # query tables); build excluded like the other index extras
    ivfpqres_dir = tempfile.mkdtemp(prefix="bench_ivfpqres_")
    SIM.build_ivfpq_index(
        emb, ivfpqres_dir, dim=entry.PQ_DIM,
        n_clusters=16, m=entry.PQ_M, n_codes=entry.PQ_CODES, residual=True,
    )
    extra_map["ann_ivfpq_res"] = lambda: SIM.ivfpq_topk(
        spark, ivfpqres_dir, qv, dim=entry.PQ_DIM, m=entry.PQ_M, k=10, n_probe=4
    ).count()

    # table maintenance: the OPTIMIZE rewrite itself — a deliberately
    # fragmented events copy (32 writer files, shuffled order) bin-packed
    # and Z-order clustered on (user_id, value).  One pre-written
    # fragmented input per run so the timer sees only the rewrite (the
    # clustered read-side payoff is test-asserted via footer stats, not
    # timed here).
    from wpvectordb_spark.operators import maintenance as MA

    maint_root = tempfile.mkdtemp(prefix="bench_maint_")
    _maint_dirs = []
    for i in range(RUNS):
        d = os.path.join(maint_root, f"t{i}")
        (
            spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
            .orderBy(F.xxhash64("event_id"))
            .repartition(32)
            .write.parquet(d)
        )
        _maint_dirs.append(d)
    _maint_iter = iter(_maint_dirs)
    extra_map["maint_compact_zorder"] = lambda: MA.compact_table(
        spark,
        next(_maint_iter),
        target_file_bytes=1 << 19,
        zorder_by=["user_id", "value"],
    )["after"]["n_files"]

    extras: dict[str, float] = {}
    try:
        for name, fn in extra_map.items():
            extras[name] = timed(fn)
            print(f"# extra {name}: {extras[name]}s (median of {RUNS})", file=sys.stderr)
    finally:
        shutil.rmtree(ivf_dir, ignore_errors=True)
        shutil.rmtree(ivfpq_dir, ignore_errors=True)
        shutil.rmtree(ivfpqres_dir, ignore_errors=True)
        shutil.rmtree(maint_root, ignore_errors=True)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    total = round(sum(timings.values()), 3)
    # Self-describing run context: round 4's 16.0s-vs-20.0s adjudication
    # had to be reconstructed from PERFORMANCE.md — the numbers should
    # carry their own measurement conditions.
    try:
        import subprocess

        git_sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            timeout=10,
        ).stdout.strip() or None
    except Exception:
        git_sha = None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extras": extras,
                "extras_total_sec": round(sum(extras.values()), 3),
                "sf": float(sf),
                "median_of": RUNS,
                "loadavg": [round(x, 2) for x in os.getloadavg()],
                "loadavg_prelaunch": loadavg_prelaunch,
                "window": window,
                "cpus": os.cpu_count(),
                "codegen_mode": spark.conf.get("spark.sql.codegen.factoryMode"),
                "git_sha": git_sha,
            }
        )
    )


if __name__ == "__main__":
    main()
