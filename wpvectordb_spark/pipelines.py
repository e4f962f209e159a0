"""End-to-end training-data curation: the engine's operators composed
into the standard corpus pipeline, as one lazy DataFrame program.

Order follows production practice (CCNet / Gopher / RefinedWeb
pipelines): exact dedup first (cheapest, biggest volume win), then
near-dedup, then the per-document quality gates, then corpus-level
mixing, and finally the training-layout passes (packing + sharding).
Every stage is one of the engine's tested operators — this module only
composes; it adds no new semantics.  All survivor rules are
deterministic (min-id / seeded-hash), so the whole pipeline is
re-runnable and backfill-stable end to end.

At 100 TB each stage keeps its documented scale shape (docs/SCALE.md).
Composition adds a materialization barrier after EVERY filter stage, not
just at the fan-out points: each stage consumes its input more than once
(the pair generator AND the survivor semi/anti-join both reference the
previous survivor set; Spark does not deduplicate common subtrees across
joins), so an unbarriered chain re-evaluates earlier stages
MULTIPLICATIVELY — ~3x per stage compounds to two orders of magnitude
over five stages (measured: 470 s -> ~10 s at sf0.01 when the per-stage
barriers landed).  Every barrier is a ``persist()``; after the
filter chain, ``persist=True`` materializes the final survivor set and
hands off (releases) the intermediates, keeping the final cache for the
caller, while ``persist=False`` converts the final set to an EAGER
``localCheckpoint`` (runs the chain at call time; blocks are GC'd with
the returned frame) and releases every stage cache — no session-lifetime
cache accumulation, the right mode for one-shot calls.
On a production run, write the survivor manifest to parquet at the same
points instead; the barrier is the in-session form of that checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wpvectordb_spark.operators import curation as CU
from wpvectordb_spark.operators import dedup as D
from wpvectordb_spark.operators import text_analysis as TA


def curate_training_corpus(
    docs: DataFrame,
    holdout: DataFrame | None = None,
    budgets: dict[str, int] | None = None,
    quality_quantile: float = 0.25,
    near_dup_threshold: float = 0.85,
    decontam_shingles: int = 5,
    dsir_target: DataFrame | None = None,
    dsir_keep: int = 1000,
    seq_len: int = 2048,
    num_shards: int = 64,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col: str = "lang",
    persist: bool = True,
) -> DataFrame:
    """documents -> packed, sharded training corpus in one composed plan.

    Stages (each optional input skips its stage):

    1. exact dedup — keep the min-id document per content fingerprint;
    2. MinHash near-dedup — drop every doc with a >= threshold Jaccard
       near-duplicate of smaller id (greedy min-id survivors, the same
       rule ``semantic_dedup`` uses);
    3. quality gate — drop each stratum's worst ``quality_quantile`` by
       the composite quality score;
    4. decontamination — drop docs sharing >= ``decontam_shingles``
       shingles with the ``holdout`` eval set;
    5. DSIR selection — keep the ``dsir_keep`` docs whose hashed-n-gram
       distribution best matches ``dsir_target`` (runs on the cleaned
       pool, as in the paper's setup);
    6. token-budget domain mixing over ``budgets``;
    7. sequence packing + deterministic shuffle-sharding.

    Returns (id, stratum, n_tokens, seq_start, seq_end, shard, pos) —
    the manifest a training loader consumes.

    ``persist=False`` ends the filter chain with an EAGER
    ``localCheckpoint`` and releases every intermediate stage cache
    before returning: the only residual blocks are the final survivor
    set's, and those die with the returned frame — use it for one-shot
    calls (driver arms, bench) and many-corpora sessions.  The trade:
    the filter chain executes at CALL time (one job), and a lost
    executor invalidates the checkpoint blocks (rerun the call) — the
    standard localCheckpoint contract.
    """
    # Barrier after every stage that the NEXT stage consumes more than
    # once (see module docstring): without it each stage re-evaluates
    # its whole upstream chain per reference and the cost compounds
    # multiplicatively.
    def _barrier(df: DataFrame) -> DataFrame:
        return df.persist()

    staged: list[DataFrame] = []  # stage caches to hand off / release
    kept = docs
    # 1. exact dedup
    winners = D.exact_dedup(kept, id_col=id_col, text_col=text_col).select(id_col)
    kept = _barrier(kept.join(winners, id_col, "left_semi"))
    staged.append(kept)
    # 2. near-dedup (greedy min-id survivors).  The shingle index is
    # computed ONCE behind its own barrier and handed to the pair
    # pipeline precomputed (minhash's internal persist is then off: its
    # three consumers read the barrier, so one-shot mode leaves no
    # shingle cache AND never re-tokenizes — re-hashing the whole corpus
    # per consumer is real money at 100 TB).
    sh = _barrier(
        D.shingle_sets(kept.select(id_col, text_col), id_col=id_col, text_col=text_col)
    )
    staged.append(sh)
    pairs = D.minhash_lsh_dedup_pairs(
        sh,
        threshold=near_dup_threshold,
        id_col=id_col,
        text_col=text_col,
        persist=False,
    )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    kept = _barrier(kept.join(dropped, id_col, "left_anti"))
    staged.append(kept)
    # 3. per-stratum quality gate (the filter projects survivors' ids;
    # semi-join them back so text flows on to the later stages)
    scored = kept.withColumn("quality", TA.quality_score(text_col))
    good = CU.quality_quantile_filter(
        scored, quantile=quality_quantile, stratum_col=stratum_col, id_col=id_col
    ).select(id_col)
    kept = _barrier(kept.join(good, id_col, "left_semi"))
    staged.append(kept)
    # 4. decontamination
    if holdout is not None:
        flags = CU.decontaminate(
            kept, holdout, threshold=decontam_shingles, id_col=id_col, text_col=text_col
        )
        clean = flags.where(F.col("contaminated") == 0).select(id_col)
        kept = _barrier(kept.join(clean, id_col, "left_semi"))
        staged.append(kept)
    # 5. DSIR selection toward the target distribution
    if dsir_target is not None:
        picked = CU.dsir_topk(
            kept,
            dsir_target,
            k=dsir_keep,
            id_col=id_col,
            text_col=text_col,
            persist=False,  # kept is a barrier: the 2x feature re-explode is
            # bounded, and dsir's internal cache has no release handle here
        ).select(id_col)
        kept = _barrier(kept.join(picked, id_col, "left_semi"))
        staged.append(kept)
    # 6. token-budget mixing
    if budgets is not None:
        kept = _barrier(
            kept.join(
                CU.budget_sample(
                    kept, budgets, stratum_col=stratum_col, id_col=id_col, text_col=text_col
                ).select(id_col),
                id_col,
                "left_semi",
            )
        )
        staged.append(kept)
    # Hand off the stage caches: materialize the FINAL survivor set,
    # then release every intermediate — otherwise each pipeline call
    # leaves one cached corpus PER STAGE resident for the session's
    # lifetime.  persist=True keeps the final set cached for the
    # downstream fan-out (caller-managed); persist=False converts it to
    # an eager localCheckpoint (lineage truncated, blocks GC'd with the
    # frame) and releases ALL stage caches.
    if persist:
        kept.count()
        for df in staged[:-1]:
            df.unpersist()
    else:
        kept = kept.localCheckpoint(eager=True)
        for df in staged:
            df.unpersist()
    # 7. packing + sharding
    packed = CU.pack_sequences(
        kept,
        seq_len=seq_len,
        stratum_col=stratum_col,
        id_col=id_col,
        text_col=text_col,
        persist=False,  # kept is already a barrier: the double scan is cheap,
        # and pack's internal cache would have no release handle here
    )
    shards = CU.shuffle_shard(kept, num_shards=num_shards, seed=seed, id_col=id_col)
    return packed.join(shards, id_col)
