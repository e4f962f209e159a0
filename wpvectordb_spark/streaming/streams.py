"""Structured Streaming forms of the engine's operators.

The reference's queue is poll-based batch (VectorTableQueue.php); its
streaming analog — and the natural shape of a 100 TB ingest pipeline — is
a file/queue source streamed through the SAME column logic the batch
operators use (events.tumbling_window_agg etc.), with watermarks bounding
state.  The batch/stream split is only at the source/sink boundary:

* ``stream_events`` — file-source stream over the events table (schema
  pinned, nanos handled as in the batch loader);
* ``stream_tumbling_counts`` — windowed aggregation with a watermark;
  results land in an in-memory sink for tests/demo, a Delta/Kafka sink in
  production;
* ``stream_queue_ingest`` — ``foreachBatch`` applying the batch queue
  transform (queue_ops.add_posts) per micro-batch: exactly-once appends of
  newly-seen post ids, demonstrating the queue as a streaming state table;
* ``run_stream_to_completion`` — drives any of the above over the static
  testdata files and returns the final result as a batch DataFrame (used
  by the driver queries so streaming output is oracle-checkable).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one
    micro-batch here; a directory of arriving files in production).

    Streaming sources need a pinned schema, but the events testdata has
    shipped with two physical ``ts`` encodings (int64-read NANOS vs native
    MICROS — see sources/loaders.load_events); probe the file's batch
    schema once (metadata-only, no data scan) and normalize ``ts`` the
    same way the batch loader does."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probed = (
        spark.read.option("pathGlobFilter", "events.parquet").parquet(sf_dir).schema
    )
    raw = (
        spark.readStream.schema(probed)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    from wpvectordb_spark.sources.loaders import _events_ts

    return raw.withColumn("ts", _events_ts(probed["ts"].dataType))


def stream_tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming windowed aggregation: same columns as the batch
    ``events.tumbling_window_agg``, with exact count_distinct replaced by
    ``approx_count_distinct`` (HLL — bounded state per window, the only
    distinct-count shape streaming state can afford)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users_approx",
        )
    )


def run_stream_to_completion(
    spark: SparkSession, streaming_df: DataFrame, output_mode: str = "append"
) -> DataFrame:
    """Run a streaming query over its (static) file source until all
    available data is processed; return the memory-sink contents.
    The throwaway checkpoint directory is deleted once the query stops —
    each call would otherwise leave a dir in the temp root forever."""
    import shutil

    name = f"sink_{uuid.uuid4().hex[:12]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"ckpt_{name}")
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def stream_session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 day"
) -> DataFrame:
    """Streaming sessionization via native ``session_window`` (dynamic-gap
    merging windows, state bounded by the watermark) — the streaming form
    of ``events.sessionize``: same 30-minute-gap session semantics, same
    per-session aggregates.  ``session_start`` equals the batch operator's
    (min event ts per session); the window END differs by construction
    (last ts + gap) so it is not emitted."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(
    events: DataFrame,
    key: str | list[str],
    watermark_col: str = "ts",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming exact dedup: keep the first record per key, with the
    watermark bounding how long keys stay in state — the streaming form of
    ``dedup.exact_dedup``.  At 100 TB ingest this is how already-seen
    documents are dropped without a static join against the full corpus.

    WHICH row survives per key depends on micro-batch arrival order;
    downstream logic that must be deterministic should aggregate per-key
    facts (counts, distinct counts), not survivor attributes."""
    keys = [key] if isinstance(key, str) else list(key)
    return events.withWatermark(watermark_col, watermark).dropDuplicates(keys)


def stream_running_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: a per-user
    running event counter maintained in explicit state across
    micro-batches (the applyInPandasWithState pattern for stateful logic
    that windowed aggregation cannot express)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("n", T.LongType())])

    def update(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_queue_ingest(
    spark: SparkSession,
    post_ids_stream: DataFrame,
    initial_queue: DataFrame,
    now,
) -> tuple[DataFrame, object]:
    """Queue ingestion as a stream: each micro-batch of post ids is
    appended as pending jobs via the batch queue transform (anti-join
    dedup), accumulating into an in-memory state table.

    Returns ``(get_state, query)`` where ``get_state()`` yields the queue
    after processed batches.  Production: the state table is Delta and
    ``add_posts`` becomes a MERGE — the transform logic is unchanged.

    State lives in a versioned parquet directory: each micro-batch reads
    the previous version, applies the batch transform, writes the next
    version, repoints, and DELETES the superseded version — executors
    carry the data, the driver only repoints a path.  No ``collect()``
    anywhere, so state size is bounded by cluster storage, not driver
    memory; lineage resets at every version boundary; disk holds at most
    THREE versions at any instant (the Delta/iceberg form of this is a
    MERGE with table history doing the same job).

    Retention keeps one superseded version: a ``get_state()`` DataFrame
    handed out between batches stays readable across the NEXT batch
    landing (only version n-2 is deleted) — consume it within one batch
    of obtaining it.
    """
    import shutil

    from wpvectordb_spark.operators import queue_ops as Q

    root = tempfile.mkdtemp(prefix="stream_queue_state_")
    v0 = os.path.join(root, "v0")
    initial_queue.write.mode("overwrite").parquet(v0)
    state = {"path": v0, "version": 0}

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        jobs = batch_df.select(F.col("job_id"), F.col("post_id"))
        prev = spark.read.parquet(state["path"])
        new_state = Q.add_posts(prev, jobs, now)
        nxt = os.path.join(root, f"v{state['version'] + 1}")
        new_state.write.mode("overwrite").parquet(nxt)
        state["path"] = nxt
        state["version"] += 1
        stale = os.path.join(root, f"v{state['version'] - 2}")
        shutil.rmtree(stale, ignore_errors=True)

    ckpt = os.path.join(tempfile.gettempdir(), f"ckpt_q_{uuid.uuid4().hex[:8]}")
    query = (
        post_ids_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    return (lambda: spark.read.parquet(state["path"])), query


def stream_dedup_ingest(
    spark: SparkSession,
    docs_stream: DataFrame,
    threshold: float = 0.5,
):
    """Streaming near-dedup ingest — the production crawl pipeline: each
    micro-batch of documents is (a) self-deduped with the full MinHash
    pipeline, (b) deduped AGAINST the accumulated corpus via the
    cross-side band join (``incremental_dedup_pairs``) over the persisted
    index, and (c) appended to that index.  The corpus is never
    re-compared to itself, and — because the persisted index carries BOTH
    halves of the production layout, (doc_id, sh) shingles AND
    (doc_id, band_id, band_key) band keys — the corpus side is never
    re-HASHED either: per batch, minhash/banding runs over the batch's
    own documents only, and corpus cost is pure I/O (band equi-join +
    verify-join scans).  Writes are append-only batch deltas, so write
    volume is O(|batch|) per batch too (the earlier versioned-rewrite
    design rewrote the whole index every batch).

    Telescoping guarantee (test-asserted): for ANY split of a corpus
    into micro-batches, the accumulated pair set equals
    ``minhash_lsh_dedup_pairs`` over the whole corpus — every pair is
    either within one batch (a) or across two batches, in which case the
    earlier doc is in the index when the later one arrives (b).  Pairs
    are normalized to id_a < id_b so batch arrival order is irrelevant.

    State writes are EXACTLY-ONCE under foreachBatch's replay semantics
    (test-asserted): every table writes its batch delta to a
    deterministic per-batch subdirectory (``b<batch_id>``) with
    ``overwrite``, so a batch replayed after a mid-write failure lands on
    its own previous attempt instead of double-appending — the canonical
    idempotent-foreachBatch pattern.  Reads inside a batch list only
    subdirectories of EARLIER batches, so a replay also re-reads exactly
    the state its first attempt saw (never its own partial output, which
    would emit self-pairs).  Schemas are passed explicitly on every read:
    inference over a multi-writer dir samples an arbitrary file and the
    inferred type then depends on file-listing order (observed once with
    a drifted seed schema: band_key inferred long, ANSI cast of the
    string band keys threw mid-stream under some orderings only).

    Batch intermediates are persisted for the batch's two jobs and
    explicitly unpersisted before the next trigger — no cache
    accumulation across a long-running stream.

    Returns ``(get_pairs, get_index, query)``.
    """
    root = tempfile.mkdtemp(prefix="stream_dedup_state_")
    sh_dir = os.path.join(root, "sh")
    bands_dir = os.path.join(root, "bands")
    pairs_dir = os.path.join(root, "pairs")
    for d in (sh_dir, bands_dir, pairs_dir):
        os.makedirs(d)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _dedup_ingest_apply(
            spark, sh_dir, bands_dir, pairs_dir, threshold, batch_df, batch_id
        )

    ckpt = os.path.join(tempfile.gettempdir(), f"ckpt_dd_{uuid.uuid4().hex[:8]}")
    query = (
        docs_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    return (
        lambda: _read_state(spark, pairs_dir, _DEDUP_PAIRS_SCHEMA),
        lambda: _read_state(spark, sh_dir, _DEDUP_SH_SCHEMA),
        query,
    )


_DEDUP_SH_SCHEMA = "doc_id long, sh array<long>"
_DEDUP_BANDS_SCHEMA = "doc_id long, band_id int, band_key string"
_DEDUP_PAIRS_SCHEMA = "id_a long, id_b long, jaccard double"


def _read_state(
    spark: SparkSession, root: str, schema: str, before_batch: int | None = None
) -> DataFrame:
    """Read a per-batch-subdirectory state table; ``before_batch`` limits
    to deltas of strictly earlier batches (the in-batch view).  An empty
    or not-yet-written table reads as an empty frame of the right schema."""
    paths = [
        os.path.join(root, d)
        for d in sorted(os.listdir(root))
        if d.startswith("b")
        and (before_batch is None or int(d[1:]) < before_batch)
    ]
    if not paths:
        return spark.createDataFrame([], schema)
    # A batch replay OVERWRITES its own subdir, so an external reader
    # whose ACTION ran while the rewrite happened can fail loudly with
    # FileNotFoundException — the CALLER re-invokes the accessor and
    # re-runs the action (the file listing is bound per returned
    # DataFrame; a retry here could not help because the failure occurs
    # at the caller's action, not at read-plan construction).
    # Deliberately NOT ignoreMissingFiles: the scan only knows the file
    # names it listed, so skipping vanished files would silently return
    # state MISSING that batch's rows rather than surfacing a retryable
    # error.  The transactional fix is a table format with snapshot
    # isolation (Delta/Iceberg) — the layout maps 1:1.
    return spark.read.schema(schema).parquet(*paths)


def _norm_pairs(pairs: DataFrame) -> DataFrame:
    return pairs.select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
        "jaccard",
    )


def _dedup_ingest_apply(
    spark: SparkSession,
    sh_dir: str,
    bands_dir: str,
    pairs_dir: str,
    threshold: float,
    batch_df: DataFrame,
    batch_id: int,
) -> None:
    """One micro-batch of the dedup ingest — module-level so the
    exactly-once replay contract is directly testable (apply the same
    batch twice, assert identical state)."""
    from wpvectordb_spark.operators import dedup as D

    bid = int(batch_id)
    batch_sh = D.shingle_sets(batch_df.select("doc_id", "text")).persist()
    prev_sh = _read_state(spark, sh_dir, _DEDUP_SH_SCHEMA, before_batch=bid)
    prev_bands = _read_state(spark, bands_dir, _DEDUP_BANDS_SCHEMA, before_batch=bid)
    within = D.minhash_lsh_dedup_pairs(batch_sh, threshold=threshold)
    cross = D.incremental_dedup_pairs(
        prev_sh, batch_sh, threshold=threshold, corpus_bands=prev_bands
    )
    _norm_pairs(within).unionByName(_norm_pairs(cross)).write.mode(
        "overwrite"
    ).parquet(os.path.join(pairs_dir, f"b{bid}"))
    batch_sh.write.mode("overwrite").parquet(os.path.join(sh_dir, f"b{bid}"))
    D.lsh_band_index(batch_sh).write.mode("overwrite").parquet(
        os.path.join(bands_dir, f"b{bid}")
    )
    batch_sh.unpersist()
