"""Driver-contract gate: every ``queries()`` entry must hash-match its
DuckDB ``oracle_sql()`` at sf0.01 (row count + schema + order-insensitive
values), exactly as the driver's CORRECTNESS check does."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import assert_parity

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_every_query_has_callable_and_most_have_oracles():
    assert QUERIES
    for name in ORACLES:
        assert name in QUERIES, f"oracle {name} has no query"


def test_registry_is_exactly_50_keys():
    # the driver evaluates the first ~50 entries; round 1 proved entry 51+
    # gets no CORRECTNESS row, so new operators merge into existing keys
    # as tagged unions instead of growing the dict
    assert len(QUERIES) == 50


# Standing vacuous-arm guard (round-2 verdict item 2): every tagged
# sub-result ("arm") of every merged query must be NON-EMPTY at sf0.01 —
# an arm that returns 0 rows hash-matches its oracle on empty sets and
# verifies nothing (this bit the embedding-cosine threshold and the
# rel_membership LEFT ANTI arm after driver testdata regenerations).
# Tag column name -> frozen expected tag values, per query.
EXPECTED_ARMS = {
    "stream_windows": ("kind", {"counter", "dedup", "session", "tumble"}),
    "multimodal_features": ("kind", {"feat", "frame", "dedup", "dedupv", "seg"}),
    "rel_pricing_summary": ("kind", {"plain", "salted", "udaf"}),
    "rel_grouping_sets": ("kind", {"cube", "rollup"}),
    "rel_membership": ("kind", {"seg_0", "seg_1", "set_both", "set_orders_only"}),
    "index_build": ("kind", {"derive", "compacted", "sink", "export"}),
    "crud_composite_get": (
        "kind",
        {"all", "cap", "get", "count"}
        | {
            f"ddl_{f}"
            for f in (
                "id post_id sequence_no vector normalized_vector vector_type "
                "binary_code magnitude created_at updated_at"
            ).split()
        },
    ),
    "queue_stats": (
        "status",
        {"pending", "processing", "completed", "failed", "__total__"},
    ),
    "dsl_variants": ("kind", {"dt", "neg", "taut"}),
    "crud_get_delete": ("kind", {"get", "scan"}),
    # round 7: + 'wf' (cap-aware waterfilling mixture budgets)
    #          + 'domq' (domain-level quality gate, DOMQ_MIN_AVG; its
    #            test additionally pins both kept outcomes present)
    #          + 'epoch' (epoch expansion: per-lang row count ==
    #            EPOCH_BUDGETS[lang], pinned by its test)
    #          + 'rank' (per-stratum percentile-rank calibration)
    "curate_sample_pack": (
        "kind",
        {
            "budget",
            "chunk",
            "domcap",
            "domq",
            "dsir",
            "epoch",
            "pack",
            "pipeline",
            "qfilter",
            "rank",
            "sample",
            "shard",
            # round 10: the soft-dedup composition of the pipeline arm
            # (curate_training_corpus(soft_dedup=True) — weights instead
            # of near-dup drops, mass budgets instead of token budgets)
            "softpipe",
            "temp",
            "wf",
            "wsample",
        },
    ),
    # round 6: + the C4 line/page rules over the synthetic lined corpus
    # round 7: + 'gopher' (document quality rules, GOPHER_ARM_PARAMS)
    #          + 'sdecon' (the broadcast_holdout=False shuffle-join path)
    #          + 'rdecon' (per-holdout leakage report, RDECON_THRESHOLD)
    #          + 'spancut' (span-level decontamination: redact
    #            holdout-overlapping >= SPANCUT_K-token runs; its test
    #            additionally pins redacted and untouched docs present)
    #          + 'blocklist' (C4 bad-words page gate, BLOCKLIST_PHRASES
    #            tuned so hit and clean pages both fire)
    "curate_decontaminate": (
        "kind",
        {
            "blocklist",
            "boiler",
            "c4",
            "decon",
            "gopher",
            "rdecon",
            "sdecon",
            "spancut",
            # round 8: streaming decontamination ingest (micro-batched
            # kernel accumulates to the batch decon verdicts)
            "stream",
        },
    ),
    "events_windows": (
        "kind",
        # round 10: + the portable-HLL distinct rollup ('hll' daily
        # direct, 'hllmerge' hourly-merged, 'shll' the streaming
        # kernel's accumulated registers — all equal by the merge
        # property, one executed mirror subquery serves the three)
        {"cohort", "slide", "tumble", "zscore", "zdense", "zstream",
         "hll", "hllmerge", "shll"},
    ),
    # round 7: + 'pool' (chunk->doc mean pooling, flattened cells)
    "dedup_embedding": ("engine", {"arrow", "catalyst", "semdedup", "pool"}),
    # round 7: jac = the original symmetric verify; cont = asymmetric
    # containment over the SAME candidates (NGRAM_CONT_THRESHOLD)
    "dedup_ngram_jaccard": ("kind", {"jac", "cont"}),
    # round 7: + 'diff' (corpus_diff snapshot audit over %7-split views;
    # its test additionally pins all four statuses non-vacuous)
    "dedup_exact": ("kind", {"cut", "diff", "exact", "norm", "span"}),
    # round 7: + 'resolve' (quality-argmax survivor per CC cluster)
    #          + 'split' (leakage-safe train/val split over the same CCs)
    #          + 'histo' (duplicate-cluster size histogram, same CCs)
    "dedup_minhash_lsh": (
        "kind",
        # round 8: + 'weight' (soft dedup: 1/cluster-size sampling
        # weights with corpus completion)
        {
            "component",
            "histo",
            "incr",
            "pair",
            "resolve",
            "split",
            "stream",
            "weight",
        },
    ),
    # round 7: both persisted indexes are base+append (every serving
    # arm's full-rebuild mirror doubles as an append proof), 'ivfapp'
    # pins the plain-IVF append + OPTIMIZE path all-probe, and sann
    # shrank to 2 micro-batches (qid%2, compact_every=1 keeps the
    # snapshot fold exercised)
    "ann_lsh_ivf": (
        "method",
        {
            "lsh",
            "mplsh",
            "ivf",
            "ivf_idx",
            "ivfapp",
            "ivfpq",
            "ivfpqfilt",
            "ivfpqapp",
            "stats",
            "quant",
            "pq",
            "many0",
            "many1",
            "recall0",
            "recall1",
            # round 10: the decision the recall report exists to drive
            # (retrain_decision over the recall<qid> report rows)
            "rdecide",
            "pqmany0",
            "pqmany1",
            "ivfpqmany0",
            "ivfpqmany1",
            "sann0",
            "sann1",
            "sannpq",
            "ivfpqres",
        },
    ),
    "text_terms_tfidf": ("kind", {"bm25", "ppl", "rrf", "tfidf", "top"}),
    # round 10: exact percentiles + the portable HdrHistogram sketch
    "events_percentiles": ("kind", {"exact", "hdr"}),
    # round 7: + the N-step sequence_funnel 'seq' arm (exploded
    # completed prefix; zero-completion users keep one all-NULL row)
    "events_conversion_funnel": ("kind", {"conv", "seq"}),
    # round 6: per-doc analysis + corpus profile + streaming-monitor
    # accumulation (must equal 'profile' exactly — integer-sum merge)
    "text_analyze": ("kind", {"doc", "profile", "sprofile", "tseries"}),
    # round 6: batch enqueue + the hand-driven ingest-stream accumulation
    # (must equal 'batch' exactly — disjoint-batch telescoping)
    "queue_enqueue": ("kind", {"batch", "stream"}),
    # round 6: + the raw-ingestion quarantine splits over the fixed
    # drops (JSONL and CSV parsers separately)
    "k7_json_codec": (
        "kind",
        {
            "code",
            "props",
            "ingest_ok",
            "ingest_bad",
            "ingest_csv_ok",
            "ingest_csv_bad",
        },
    ),
}


def _assert_arms_nonempty(name, cols, rows):
    assert rows, f"{name}: 0 rows at sf0.01 — the oracle check is vacuous"
    if name not in EXPECTED_ARMS:
        return
    tag_col, expected = EXPECTED_ARMS[name]
    i = cols.index(tag_col)
    got = {r[i] for r in rows}
    missing = expected - got
    assert not missing, (
        f"{name}: arm(s) {sorted(missing)} returned 0 rows at sf0.01 — "
        "vacuously verified (testdata regeneration? re-tune the "
        "corpus-dependent constants)"
    )
    unexpected = got - expected
    assert not unexpected, (
        f"{name}: unexpected arm(s) {sorted(unexpected)} — update "
        "EXPECTED_ARMS so the guard keeps covering every arm"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(name, spark, duck):
    from tests.conftest import SF_DIR

    df = QUERIES[name](spark, SF_DIR)
    rows = df.collect()
    _assert_arms_nonempty(name, df.columns, rows)
    if name not in ORACLES:
        # weaker rows-only check (driver does the same)
        assert df.columns
        return
    assert_parity(df, duck.sql(ORACLES[name]), precollected=rows)


def test_corpus_is_pure_ascii(spark):
    """Every char/byte hash-parity pair in the repo (string_hash's
    char-codepoint fold vs the multimodal byte checksum; the frame
    oracle's left(repeat(text,2),16) char slice vs fake_frame_extractor's
    byte window) holds ONLY while documents are pure ASCII.  The driver
    regenerates testdata between rounds — if a regeneration goes
    non-ASCII, fail HERE with the cause named instead of as a mysterious
    hash mismatch in CORRECTNESS."""
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    non_ascii = docs.where(
        F.octet_length(F.encode("text", "UTF-8")) != F.length("text")
    ).count()
    assert non_ascii == 0, (
        f"{non_ascii} non-ASCII documents — char-fold vs byte-fold hash "
        "parity (multimodal checksum, frame oracle) no longer holds; "
        "switch those oracles to byte-based folds before trusting hashes"
    )


def test_testdata_constants_bind():
    """Corpus-dependent registry constants vs the ACTUAL parquet (duckdb
    only — no Spark session).  The driver regenerates /root/testdata
    between rounds; when a regeneration shifts shapes, fail HERE with the
    constant named instead of as a mysterious CORRECTNESS mismatch.

    * PQ_DIM / PQ_CODES: the pq oracle slices sub-vectors with literal
      widths and takes vec_id-ordered codebooks — dims must equal PQ_DIM
      exactly and the corpus must exceed PQ_CODES at every SF.
    * PIPE_DSIR_KEEP: bound by the stage-drop test at sf0.01
      (test_pipelines.test_driver_pipeline_arm_every_stage_drops); at
      sf0.1 the bench pipeline extra goes silently vacuous if the stage-4
      survivor count drops below it — assert the documents corpus keeps
      enough headroom (survivors scale with corpus size; 311 of 1550 docs
      at sf0.01, 3146 at sf0.1 when PIPE_DSIR_KEEP=200 was chosen).
    """
    import duckdb

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        n, dmin, dmax = con.sql(
            "SELECT count(*), min(len(embedding)), max(len(embedding))"
            f" FROM read_parquet('/root/testdata/{sf}/embeddings.parquet')"
        ).fetchone()
        assert (dmin, dmax) == (entrymod.PQ_DIM, entrymod.PQ_DIM), (
            f"{sf}: embedding dims [{dmin},{dmax}] != PQ_DIM "
            f"{entrymod.PQ_DIM} — retune PQ_DIM/PQ_M (oracle slice widths"
            " are literal) after the testdata regeneration"
        )
        assert n > entrymod.PQ_CODES, f"{sf}: corpus {n} <= PQ_CODES"
    ndocs = con.sql(
        "SELECT count(*) FROM"
        " read_parquet('/root/testdata/sf0.1/documents.parquet')"
    ).fetchone()[0]
    # 311/1550 sf0.01 survivors scaled how the corpus scales: demand ~4x
    # headroom over PIPE_DSIR_KEEP so the bench extra's DSIR stage stays
    # a real selection, with margin for distribution drift
    assert ndocs * 0.2 > entrymod.PIPE_DSIR_KEEP * 2, (
        f"sf0.1 documents shrank to {ndocs}: PIPE_DSIR_KEEP="
        f"{entrymod.PIPE_DSIR_KEEP} may exceed the stage-4 survivor count"
        " — re-measure survivors and retune (see verify SKILL round-5"
        " lessons)"
    )
