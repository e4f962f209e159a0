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
Composition adds exactly two materialization barriers: the survivor set
is persisted after the last filter stage and again after budget mixing,
because the downstream stages FAN OUT (budget reads survivors twice,
packing and sharding each read them once more) — without the barriers
every consumer re-executes the whole dedup + quality + decontamination
chain, which measured 4x+ slower end to end (a 7-minute sf0.01 run
dropped to ~90 s).  On a production run, write the survivor manifest to
parquet at those points instead; the persist is the in-session form of
the same checkpoint.
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
    """
    kept = docs
    # 1. exact dedup
    winners = D.exact_dedup(kept, id_col=id_col, text_col=text_col).select(id_col)
    kept = kept.join(winners, id_col, "left_semi")
    # 2. near-dedup (greedy min-id survivors)
    pairs = D.minhash_lsh_dedup_pairs(
        kept, threshold=near_dup_threshold, id_col=id_col, text_col=text_col
    )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    kept = kept.join(dropped, id_col, "left_anti")
    # 3. per-stratum quality gate (the filter projects survivors' ids;
    # semi-join them back so text flows on to the later stages)
    scored = kept.withColumn("quality", TA.quality_score(text_col))
    good = CU.quality_quantile_filter(
        scored, quantile=quality_quantile, stratum_col=stratum_col, id_col=id_col
    ).select(id_col)
    kept = kept.join(good, id_col, "left_semi")
    # 4. decontamination
    if holdout is not None:
        flags = CU.decontaminate(
            kept, holdout, threshold=decontam_shingles, id_col=id_col, text_col=text_col
        )
        clean = flags.where(F.col("contaminated") == 0).select(id_col)
        kept = kept.join(clean, id_col, "left_semi")
    # 5. DSIR selection toward the target distribution
    if dsir_target is not None:
        picked = CU.dsir_topk(
            kept, dsir_target, k=dsir_keep, id_col=id_col, text_col=text_col
        ).select(id_col)
        kept = kept.join(picked, id_col, "left_semi")
    # The filter chain is done; everything below fans out (budget reads
    # survivors twice, packing and sharding once each) — persist so the
    # dedup/quality/decon chain executes once, not per consumer.
    kept = kept.persist()
    # 6. token-budget mixing
    if budgets is not None:
        pre_budget = kept
        kept = kept.join(
            CU.budget_sample(
                kept, budgets, stratum_col=stratum_col, id_col=id_col, text_col=text_col
            ).select(id_col),
            id_col,
            "left_semi",
        ).persist()
        # Hand off the cache: materialize the post-budget survivors, then
        # release the pre-budget copy — otherwise every pipeline call
        # leaves TWO full cached corpora (ids + text) resident for the
        # session's lifetime, and multi-corpus sessions accumulate them.
        kept.count()
        pre_budget.unpersist()
    # 7. packing + sharding
    packed = CU.pack_sequences(
        kept, seq_len=seq_len, stratum_col=stratum_col, id_col=id_col, text_col=text_col
    )
    shards = CU.shuffle_shard(kept, num_shards=num_shards, seed=seed, id_col=id_col)
    return packed.join(shards, id_col)
