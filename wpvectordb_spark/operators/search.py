"""The flagship operator: three-stage top-k vector similarity search.

Re-expresses ``VectorTable::search()`` (VectorTable.php:73-233, SURVEY.md
§2.2) as ONE lazy DataFrame DAG instead of four PHP<->MySQL round trips:

    candidate filter (S2)            documents x doc_meta, QueryBuilder preds
      -> semi-join restrict (S3)     left_semi onto the vector table
      -> Hamming top-(10n) (S4)      packed sign codes, bit_count(xor)
      -> cosine rerank top-(5n) (S6) exact double-precision cosine
      -> optional metadata sort (S7) EAV pivot + orderBy
      -> top-n projection (S8)

Spark-first physical notes:

* the query vector / its code / magnitude are **literal columns** — they ship
  inside the task binary, no join, no shuffle (S1);
* ``orderBy(...).limit(k)`` compiles to ``TakeOrderedAndProject`` — the same
  per-partition-heap + merge the reference hand-rolls with SplMinHeap
  (VectorTable.php:10-22), but distributed;
* the only exchanges in the plan are the two top-k merges (and the
  candidate ``distinct`` when a filter is present) — at 1000 executors the
  heavy work (Hamming over the full table) is embarrassingly parallel inside
  the scan stage, with only 10n rows ever crossing the wire;
* tie-breaks are total orders (``hd ASC, id ASC`` / ``cos DESC, id ASC``) —
  the reference's heap order is insertion-dependent (quirk §4.4.5); we pick
  determinism so results are reproducible across partitionings.

Funnel constants match the reference: stage-1 scan cap 1,000,000
(VectorTable.php:81), Hamming survivors 10n (:82), cosine survivors 5n (:83).

Batch mode (``search_many``) generalizes to a DataFrame of query vectors —
the per-query top-k becomes one window ``row_number() <= k`` per query id;
the reference (single query per call) cannot express this.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from wpvectordb_spark.functions import kernels as K
from wpvectordb_spark.schemas import CODE_WORD_BITS

STAGE1_LIMIT = 1_000_000  # VectorTable.php:81
STAGE2_FACTOR = 10  # VectorTable.php:82
STAGE3_FACTOR = 5  # VectorTable.php:83
DEFAULT_N = 5  # VectorTable.php:73


def _pack_code(vector: list[float], word_bits: int = CODE_WORD_BITS) -> list[int]:
    """Driver-side sign-code packing of a literal query vector (mirrors
    kernels.sign_code exactly; bits are strictly ``x > 0``).  The word
    width defaults to the SAME schemas.CODE_WORD_BITS the stored codes
    use — a mismatch null-pads the zip_with and turns every Hamming
    distance NULL.  NaN packs as bit 1: Spark SQL orders NaN above every
    numeric (so ``NaN > 0`` is true engine-side), while Python's
    ``nan > 0`` is False — without the explicit check the driver-side
    query code would disagree with stored/engine-side codes on NaN
    dimensions."""
    bits = [1 if (x > 0 or x != x) else 0 for x in vector]
    words = []
    for w in range(0, len(bits), word_bits):
        acc = 0
        for b in bits[w : w + word_bits]:
            acc = acc * 2 + b
        words.append(acc)
    return words


def _magnitude(vector: list[float]) -> float:
    acc = 0.0
    for x in vector:
        acc += float(x) * float(x)
    return acc**0.5


def search(
    vectors: DataFrame,
    query_vector: list[float],
    n: int = DEFAULT_N,
    builder=None,
    documents: DataFrame | None = None,
    doc_meta: DataFrame | None = None,
    candidates: DataFrame | None = None,
    sorts: list[tuple[Column, bool]] | None = None,
    id_col: str = "id",
    post_id_col: str = "post_id",
    vector_col: str = "vector",
    code_col: str | None = "binary_code",
    mag_col: str | None = "magnitude",
    stage1_limit: int | None = None,
) -> DataFrame:
    """Three-stage top-n similarity search over a vector table.

    Signature mirrors the reference's ``search(vector, n, builder)``: pass a
    ``plans.QueryBuilder`` (plus the ``documents`` / ``doc_meta`` frames its
    filters and sorts reference) and its compiled candidate set restricts
    the scan (S2) while its sort keys order the final survivors (S7 — the
    reference sorts the 5n stage-3 survivors, then takes n).  Lower-level
    ``candidates`` / ``sorts`` remain for pre-compiled inputs.
    Returns ``(id, post_id, hamming_distance, cosine_similarity)`` rows,
    top-n.  The reference returns bare embedding ids (quirk §4.4.1); we keep
    the id as the key but also expose post_id and both scores.
    """
    if builder is not None and candidates is None and builder.has_filters():
        if documents is None:
            raise ValueError(
                "builder has filters: pass the documents DataFrame they "
                "reference (and doc_meta for meta predicates)"
            )
        candidates = builder.candidates(documents, doc_meta, id_col=post_id_col)
    q_code = F.lit(_pack_code(query_vector))
    q_vec = F.array(*[F.lit(float(x)) for x in query_vector])
    q_mag = F.lit(_magnitude(query_vector))

    df = vectors
    # S2+S3: restrict scan to filtered candidate documents (left-semi join;
    # Catalyst broadcasts the candidate set when small).
    if candidates is not None:
        # no distinct: builder.candidates() already dedupes, and a
        # left-semi join is insensitive to right-side duplicates anyway
        df = df.join(candidates.select(post_id_col), post_id_col, "left_semi")
    # The reference caps the stage-1 scan at 1e6 rows (VectorTable.php:81) —
    # a MySQL safety valve.  In Spark a limit here compiles to
    # LocalLimit -> Exchange(SinglePartition) -> GlobalLimit: it funnels the
    # WHOLE candidate table through one partition before the Hamming top-k,
    # destroying scan parallelism.  Default is therefore no cap (the
    # distributed top-k needs none); pass stage1_limit=STAGE1_LIMIT only for
    # strict reference parity on over-1e6-row candidate sets.
    if stage1_limit is not None:
        df = df.limit(stage1_limit)

    # S4: Hamming prefilter -> top 10n (TakeOrderedAndProject).
    code = F.col(code_col) if code_col else K.sign_code(vector_col)
    hd = K.hamming(code, q_code).alias("hamming_distance")
    stage2 = (
        df.select(id_col, post_id_col, vector_col, *( [mag_col] if mag_col else [] ), hd)
        # asc_nulls_last: Spark ascending puts NULLs FIRST by default, so
        # a NULL Hamming row (null code / mismatched word count) would
        # crowd real candidates out of the 10n pool
        .orderBy(F.col("hamming_distance").asc_nulls_last(), F.col(id_col).asc())
        .limit(STAGE2_FACTOR * n)
    )

    # S6: exact cosine rerank -> top 5n.  No re-fetch needed (S5 obsolete:
    # columns were carried through, unlike the reference's second query).
    vm = F.col(mag_col) if mag_col else None
    cos = K.cosine_similarity(q_vec, F.col(vector_col), q_mag, vm).alias("cosine_similarity")
    stage3 = (
        stage2.select(id_col, post_id_col, "hamming_distance", cos)
        .orderBy(F.col("cosine_similarity").desc(), F.col(id_col).asc())
        .limit(STAGE3_FACTOR * n)
    )

    # S7: optional metadata sort over the 5n survivors, else keep
    # similarity order.  S8: top-n.
    if builder is not None and builder.has_sorts():
        sorted_df = builder.apply_sorts(
            stage3,
            documents=documents,
            doc_meta=doc_meta,
            id_col=post_id_col,
            tie_break=id_col,
        )
        return sorted_df.limit(n)
    if sorts:
        order = [c.asc() if asc else c.desc() for c, asc in sorts] + [F.col(id_col).asc()]
        return stage3.orderBy(*order).limit(n)
    return stage3.limit(n)


def brute_force_topk(
    vectors: DataFrame,
    query_vector: list[float],
    n: int = DEFAULT_N,
    id_col: str = "id",
    vector_col: str = "vector",
    round_to: int | None = 9,
) -> DataFrame:
    """Exact cosine top-n over the full table — the oracle/baseline ANN path.

    One scan, one TakeOrderedAndProject: at 100 TB this is the scan-bound
    lower bound every approximate variant must beat.
    """
    q_vec = F.array(*[F.lit(float(x)) for x in query_vector])
    q_mag = F.lit(_magnitude(query_vector))
    cos = K.cosine_similarity(q_vec, F.col(vector_col), q_mag, None)
    # Order on the exact double; round only the projected output so the
    # ordering is identical to any oracle computing the same fold.
    ranked = (
        vectors.select(id_col, cos.alias("_cos_raw"))
        .orderBy(F.col("_cos_raw").desc(), F.col(id_col).asc())
        .limit(n)
    )
    out_cos = F.round("_cos_raw", round_to) if round_to is not None else F.col("_cos_raw")
    return ranked.select(id_col, out_cos.alias("cosine_similarity"))


def search_many(
    vectors: DataFrame,
    queries: DataFrame,
    n: int = DEFAULT_N,
    two_phase: bool = True,
    id_col: str = "id",
    vector_col: str = "vector",
    code_col: str | None = "binary_code",
    mag_col: str | None = "magnitude",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vector",
    expected_dim: int | None = None,
) -> DataFrame:
    """Batch top-n search: a DataFrame of query vectors joined against the
    table, per-query top-k via window rank.

    The query side is broadcast (small dim table); the big side never
    shuffles for the join, and — critically — never shuffles for the
    RANKING either: every window's input is projected down to (query_id,
    id, score) BEFORE the exchange, so the per-query shuffle carries
    ~16-byte rows, not the full vector+query payload (at 1024 dims the
    un-projected form moves ~16 KB per (vector, query) pair through one
    partition per query — the single-partition funnel the module
    docstring warns about, just wearing a window).  The Hamming rank is
    additionally pre-pruned per (query, input partition): each scan task
    contributes at most 10n candidates per query, so the global per-query
    sort sees <= 10n x #partitions narrow rows regardless of table size.
    Survivors re-fetch their vectors by joining back to the table
    (broadcast of the 10nQ-row survivor set), mirroring the single-query
    funnel's S5 stage.

    With ``two_phase`` the Hamming funnel keeps 10n rows per query
    before the exact rerank — the same funnel as ``search`` but for Q
    queries in one plan.

    Query dimensions are guarded like the single-query facade path
    (table._check_length): a query vector whose length differs from the
    table's packs a different word count, and the misaligned Hamming
    comparison silently returns plausible-looking WRONG rows (or ranks
    all-NULL distances).  Pass ``expected_dim`` (the facade's declared
    ``vector_length``) to enforce that dimension with NO extra work;
    without it the table's dimension is probed from ONE ARBITRARY row —
    an eager metadata-cheap Spark job at plan-construction time, and on
    a ragged-dimension table the enforced dim is whichever row the probe
    happened to read (ragged tables should always pass ``expected_dim``).
    Mismatched query rows then fail loudly in-plan; a NULL query vector
    is NOT a mismatch — it is dropped up front and contributes no result
    rows (the pre-guard behavior was worse than either: NULL scores
    still take row_number ranks, so a NULL query returned n rows of
    NULL-cosine noise).
    """
    if expected_dim is not None:
        table_dim = int(expected_dim)
    else:
        dim_row = vectors.select(F.size(vector_col).alias("d")).first()
        table_dim = (
            int(dim_row["d"])
            if dim_row is not None and dim_row["d"] is not None
            else None
        )
    guarded_qv = F.col(query_vec_col)
    if table_dim is not None:
        guarded_qv = F.when(
            F.size(query_vec_col) == table_dim, F.col(query_vec_col)
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("search_many: query vector has "),
                    F.size(query_vec_col).cast("string"),
                    F.lit(f" dims; table has {table_dim}"),
                )
            ).cast("array<float>")
        )
    queries = queries.where(F.col(query_vec_col).isNotNull())
    q = queries.select(
        F.col(query_id_col),
        guarded_qv.alias(query_vec_col),
        K.sign_code(guarded_qv).alias("_q_code"),
        K.magnitude(guarded_qv).alias("_q_mag"),
    )
    # Derive per-row code/magnitude BEFORE the cross join: inline
    # expressions after the join would be re-evaluated once per
    # (vector, query) pair instead of once per vector.
    base = vectors
    if code_col is None and two_phase:
        base = base.withColumn("_code", K.sign_code(vector_col))
        code_col_eff = "_code"
    else:
        code_col_eff = code_col
    if mag_col is None:
        base = base.withColumn("_mag", K.magnitude(vector_col))
        mag_col_eff = "_mag"
    else:
        mag_col_eff = mag_col

    if two_phase:
        hd = K.hamming(F.col(code_col_eff), F.col("_q_code"))
        narrow = (
            base.select(id_col, code_col_eff)
            .join(F.broadcast(q.select(query_id_col, "_q_code")), how="cross")
            .select(
                F.col(query_id_col),
                F.col(id_col),
                hd.alias("hamming_distance"),
                F.spark_partition_id().alias("_pid"),
            )
        )
        # local pre-top-k: a per-(query, scan-partition) prune is a
        # superset of each partition's contribution to the global top-10n,
        # so results are identical while the global sort input shrinks
        # from |table| to <= 10n x #partitions rows per query
        hord = [F.col("hamming_distance").asc_nulls_last(), F.col(id_col).asc()]
        w_local = Window.partitionBy(query_id_col, "_pid").orderBy(*hord)
        w_h = Window.partitionBy(query_id_col).orderBy(*hord)
        surv = (
            narrow.withColumn("_lrank", F.row_number().over(w_local))
            .where(F.col("_lrank") <= STAGE2_FACTOR * n)
            .withColumn("_hrank", F.row_number().over(w_h))
            .where(F.col("_hrank") <= STAGE2_FACTOR * n)
            .select(query_id_col, id_col)
        )
        refetch = base.select(id_col, vector_col, mag_col_eff).join(
            F.broadcast(surv), id_col
        )
        joined = refetch.join(
            F.broadcast(q.select(query_id_col, query_vec_col, "_q_mag")), query_id_col
        )
    else:
        joined = base.select(id_col, vector_col, mag_col_eff).join(
            F.broadcast(q.select(query_id_col, query_vec_col, "_q_mag")), how="cross"
        )

    cos = K.cosine_similarity(
        F.col(query_vec_col), F.col(vector_col), F.col("_q_mag"), F.col(mag_col_eff)
    )
    c_narrow = joined.select(
        F.col(query_id_col), F.col(id_col), cos.alias("cosine_similarity")
    )
    w_c = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_similarity").desc_nulls_last(), F.col(id_col).asc()
    )
    return (
        c_narrow.withColumn("_crank", F.row_number().over(w_c))
        .where(F.col("_crank") <= n)
        .select(query_id_col, id_col, F.col("_crank").alias("rank"), "cosine_similarity")
    )
