"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship three-stage vector search on sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with a DuckDB-equivalent oracle; column names and double
precision math are kept in lockstep (left folds, reference epsilons,
round(…, 9) on similarity outputs).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wpvectordb_spark.functions import kernels as K
from wpvectordb_spark.operators import queue_ops as Q
from wpvectordb_spark.operators import search as S
from wpvectordb_spark.operators import table_ops as TO
from wpvectordb_spark.plans import Filter, QueryBuilder, Sort
from wpvectordb_spark.sources.fixtures import QUEUE_FROM_ORDERS_SQL, QUEUE_NOW, queue_from_orders
from wpvectordb_spark.sources.loaders import DOC_META_ORACLE_SQL, doc_meta_from_documents


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    row = _emb(spark, sf_dir).where(F.col("vec_id") == vec_id).select("embedding").first()
    return [float(x) for x in row["embedding"]]


# ---------------------------------------------------------------------------
# entry: flagship query (smoke, sf0.001)
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Three-stage top-5 similarity search (filter -> Hamming -> cosine
    rerank) over sf0.001, restricted to English documents."""
    sf_dir = "/root/testdata/sf0.001"
    emb = _emb(spark, sf_dir).select(
        F.col("vec_id").alias("id"),
        F.col("vec_id").alias("post_id"),
        F.col("embedding").alias("vector"),
    )
    cand = (
        _docs(spark, sf_dir)
        .where(F.col("lang") == "en")
        .select(F.col("doc_id").alias("post_id"))
    )
    qv = _query_vector(spark, sf_dir)
    out = S.search(emb, qv, n=5, candidates=cand, code_col=None, mag_col=None)
    return out.select(
        "id",
        "post_id",
        "hamming_distance",
        F.round("cosine_similarity", 9).alias("cosine_similarity"),
    )


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def _q_k1_magnitude(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _emb(spark, sf_dir).select(
        "vec_id", F.round(K.magnitude("embedding"), 9).alias("mag")
    )


def _q_k2_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    norm = K.normalize("embedding")
    return _emb(spark, sf_dir).select(
        "vec_id",
        F.round(F.aggregate(norm, F.lit(0.0), lambda a, x: a + x), 9).alias("norm_sum"),
        F.round(K.magnitude(norm), 9).alias("norm_mag"),
    )


def _q_k3_sign_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _emb(spark, sf_dir).select("vec_id", K.sign_code("embedding").alias("code"))


def _q_k4_code_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _emb(spark, sf_dir).select(
        "vec_id", K.code_to_hex(K.sign_code("embedding")).alias("code_hex")
    )


def _q_k5_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") == 0).select(K.sign_code("embedding").alias("q_code"))
    return (
        emb.crossJoin(F.broadcast(q))
        .select("vec_id", K.hamming(K.sign_code("embedding"), "q_code").alias("hd"))
    )


def _q_k6_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_vec"), K.magnitude("embedding").alias("q_mag")
    )
    return emb.crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.round(K.cosine_similarity("q_vec", "embedding", "q_mag", None), 9).alias("cos"),
    )


def _q_search_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    qv = _query_vector(spark, sf_dir)
    return S.brute_force_topk(emb, qv, n=10)


def _q_search_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).select(
        F.col("vec_id").alias("id"),
        F.col("vec_id").alias("post_id"),
        F.col("embedding").alias("vector"),
    )
    cand = _docs(spark, sf_dir).where(F.col("lang") == "en").select(
        F.col("doc_id").alias("post_id")
    )
    qv = _query_vector(spark, sf_dir)
    out = S.search(emb, qv, n=5, candidates=cand, code_col=None, mag_col=None)
    return out.select(
        "id",
        "post_id",
        "hamming_distance",
        F.round("cosine_similarity", 9).alias("cosine_similarity"),
    )


# --- query DSL (SURVEY.md §2.3) --------------------------------------------

def _docs_as_posts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).withColumnRenamed("doc_id", "post_id")


def _q_dsl_filter_cnf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_as_posts(spark, sf_dir)
    meta = doc_meta_from_documents(_docs(spark, sf_dir))
    qb = QueryBuilder()
    qb.add_filter("g1", Filter("lang", "=", "en"))
    qb.add_filter("g1", Filter("n_chars", ">", 300, is_meta=True))
    qb.add_filter("g2", Filter("source", "IN", ["src0", "src1", "src2"]))
    qb.add_filter("g3", Filter("text", "LIKE", "spark"))
    return qb.candidates(docs, meta)


def _q_dsl_empty_in_tautology(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_as_posts(spark, sf_dir)
    qb = QueryBuilder()
    qb.add_filter("g", Filter("lang", "NOT IN", []))
    qb.add_filter("g2", Filter("source", "IN", []))
    return qb.candidates(docs)


def _q_search_meta_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).select(
        F.col("vec_id").alias("id"),
        F.col("vec_id").alias("post_id"),
        F.col("embedding").alias("vector"),
    )
    docs = _docs_as_posts(spark, sf_dir)
    meta = doc_meta_from_documents(_docs(spark, sf_dir))
    qb = QueryBuilder()
    qb.add_filter("langs", Filter("lang", "IN", ["en", "de"], is_meta=True))
    qb.add_sort(Sort("n_chars", "DESC", is_meta=True, meta_cast="number"))
    qv = _query_vector(spark, sf_dir)
    out = S.search(
        emb, qv, n=5, builder=qb, documents=docs, doc_meta=meta,
        code_col=None, mag_col=None,
    )
    return out.select(
        "id", "post_id", "hamming_distance",
        F.round("cosine_similarity", 9).alias("cosine_similarity"),
    )


# --- CRUD / point access (SURVEY.md §2.4) -----------------------------------

_MULTI_GET_IDS = [42, 7, 123, 3, 77]


def _q_crud_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return TO.by_id(emb, 42, id_col="vec_id").select(
        "vec_id", "label", F.round(K.magnitude("embedding"), 9).alias("mag")
    )


def _q_crud_multi_get_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    ids_arr = F.array(*[F.lit(i) for i in _MULTI_GET_IDS])
    return TO.by_ids(emb, _MULTI_GET_IDS, id_col="vec_id").select(
        "vec_id",
        F.array_position(ids_arr, F.col("vec_id")).alias("ord"),
        "label",
    )


def _q_crud_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wpvectordb_spark.sources.loaders import load_events

    ev = load_events(spark, sf_dir)
    renamed = ev.select(
        F.col("event_id").alias("id"),
        F.col("user_id").alias("post_id"),
        F.col("ts").alias("updated_at"),
    )
    return TO.latest_per_post(renamed).select(
        F.col("post_id").alias("user_id"),
        F.col("id").alias("event_id"),
        F.col("updated_at").alias("ts"),
    )


def _q_crud_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return TO.delete(emb, 10, id_col="vec_id").where(F.col("vec_id") < 30).select(
        "vec_id", "label"
    )


def _q_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = _emb(spark, sf_dir).select(
        F.col("vec_id").alias("post_id"),
        F.lit(0).cast("int").alias("sequence_no"),
        F.col("embedding").alias("vector"),
    )
    idx = TO.derive(chunks)
    return idx.select(
        "post_id",
        "sequence_no",
        F.round("magnitude", 9).alias("magnitude"),
        F.col("binary_code"),
        F.round(
            F.aggregate("normalized_vector", F.lit(0.0), lambda a, x: a + x), 9
        ).alias("norm_sum"),
    )


def _q_upsert_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    existing = TO.derive(
        emb.where(F.col("vec_id") < 300).select(
            F.col("vec_id").alias("post_id"),
            F.lit(0).cast("int").alias("sequence_no"),
            F.col("embedding").alias("vector"),
        )
    )
    incoming = emb.where((F.col("vec_id") >= 250) & (F.col("vec_id") < 400)).select(
        (F.col("vec_id") - 50).alias("post_id"),
        F.lit(0).cast("int").alias("sequence_no"),
        F.col("embedding").alias("vector"),
    )
    merged = TO.upsert(existing, incoming)
    return merged.select("post_id", F.round("magnitude", 9).alias("magnitude"))


# --- queue (SURVEY.md §2.5) --------------------------------------------------

def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def _q_queue_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Q.stats(queue_from_orders(_orders(spark, sf_dir)))


def _q_queue_next_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = queue_from_orders(_orders(spark, sf_dir))
    return Q.dequeue_priority(q).select(
        "job_id", "post_id", "status", "queued_time", "error_count"
    )


def _q_queue_claim_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = queue_from_orders(_orders(spark, sf_dir))
    _claimed, new_state = Q.claim_batch(q, QUEUE_NOW)
    return new_state.select("job_id", "status", "start_time", "error_count")


def _q_queue_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = queue_from_orders(_orders(spark, sf_dir))
    return Q.cleanup(q, QUEUE_NOW).select(
        "job_id", "status", "error_count", "error_message"
    )


def _q_queue_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = queue_from_orders(_orders(spark, sf_dir))
    return Q.posts_to_retry(q).select("job_id", "post_id", "error_count")


def _q_queue_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = queue_from_orders(_orders(spark, sf_dir))
    return Q.page_of_records(q, page=3).select("job_id", "post_id", "status")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "k1_magnitude": _q_k1_magnitude,
        "k2_normalize": _q_k2_normalize,
        "k3_sign_code": _q_k3_sign_code,
        "k4_code_hex": _q_k4_code_hex,
        "k5_hamming": _q_k5_hamming,
        "k6_cosine": _q_k6_cosine,
        "search_brute_force": _q_search_brute_force,
        "search_two_phase": _q_search_two_phase,
        "search_meta_sorted": _q_search_meta_sorted,
        "dsl_filter_cnf": _q_dsl_filter_cnf,
        "dsl_empty_in_tautology": _q_dsl_empty_in_tautology,
        "crud_point_lookup": _q_crud_point_lookup,
        "crud_multi_get_ordered": _q_crud_multi_get_ordered,
        "crud_latest_per_user": _q_crud_latest_per_user,
        "crud_delete": _q_crud_delete,
        "index_build": _q_index_build,
        "upsert_latest_wins": _q_upsert_latest_wins,
        "queue_stats": _q_queue_stats,
        "queue_next_batch": _q_queue_next_batch,
        "queue_claim_state": _q_queue_claim_state,
        "queue_cleanup": _q_queue_cleanup,
        "queue_retry": _q_queue_retry,
        "queue_page": _q_queue_page,
    }


def oracle_sql() -> dict[str, str]:
    mag = K.sql_magnitude("embedding")
    norm = K.sql_normalize("embedding")
    code = K.sql_sign_code("embedding")
    ham = K.sql_hamming(K.sql_sign_code("e.embedding"), "q.q_code")
    cos = K.sql_cosine("q.q_vec", "e.embedding", "q.q_mag")
    # 8 hex chars per 32-bit word, lowercase, zero padded
    hexx = (
        "lower(list_reduce(list_transform("
        + code
        + ", w -> CASE WHEN w = 0 THEN '00000000' ELSE lpad(format('{:x}', w), 8, '0') END),"
        " (a, b) -> a || b))"
    )
    search_cte = f"""
        WITH q AS (
          SELECT embedding AS q_vec, {mag} AS q_mag, {code} AS q_code
          FROM embeddings WHERE vec_id = 0
        ),
        scan AS (
          SELECT e.vec_id AS id, e.vec_id AS post_id, e.embedding,
                 {ham} AS hamming_distance
          FROM embeddings e, q
          WHERE e.vec_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
        ),
        s4 AS (
          SELECT * FROM scan ORDER BY hamming_distance ASC, id ASC LIMIT 50
        ),
        s6 AS (
          SELECT s4.id, s4.post_id, s4.hamming_distance,
                 {K.sql_cosine("q.q_vec", "s4.embedding", "q.q_mag")} AS cos_raw
          FROM s4, q ORDER BY cos_raw DESC, id ASC LIMIT 25
        )
        SELECT id, post_id, hamming_distance, round(cos_raw, 9) AS cosine_similarity
        FROM s6 ORDER BY cos_raw DESC, id ASC LIMIT 5
    """
    qnow = "TIMESTAMP '1998-08-15 12:00:00'"
    ids_list = "[42, 7, 123, 3, 77]"
    meta_sorted_cte = f"""
        WITH doc_meta AS ({DOC_META_ORACLE_SQL}),
        q AS (
          SELECT embedding AS q_vec, {mag} AS q_mag, {code} AS q_code
          FROM embeddings WHERE vec_id = 0
        ),
        cand AS (
          SELECT DISTINCT d.doc_id AS post_id
          FROM documents d LEFT JOIN doc_meta pm ON d.doc_id = pm.post_id
          WHERE pm.meta_key = 'lang' AND pm.meta_value IN ('en', 'de')
        ),
        scan AS (
          SELECT e.vec_id AS id, e.vec_id AS post_id, e.embedding,
                 {ham} AS hamming_distance
          FROM embeddings e, q
          WHERE e.vec_id IN (SELECT post_id FROM cand)
        ),
        s4 AS (SELECT * FROM scan ORDER BY hamming_distance ASC, id ASC LIMIT 50),
        s6 AS (
          SELECT s4.id, s4.post_id, s4.hamming_distance,
                 {K.sql_cosine("q.q_vec", "s4.embedding", "q.q_mag")} AS cos_raw
          FROM s4, q ORDER BY cos_raw DESC, id ASC LIMIT 25
        ),
        mpivot AS (
          SELECT post_id, max(CASE WHEN meta_key = 'n_chars' THEN meta_value END) AS mv
          FROM doc_meta GROUP BY post_id
        )
        SELECT s6.id, s6.post_id, s6.hamming_distance,
               round(cos_raw, 9) AS cosine_similarity
        FROM s6 LEFT JOIN mpivot ON s6.post_id = mpivot.post_id
        ORDER BY CAST(mpivot.mv AS DECIMAL(18,3)) DESC, s6.id ASC LIMIT 5
    """
    upsert_cte = f"""
        WITH existing AS (
          SELECT vec_id AS post_id, embedding, 0 AS src
          FROM embeddings WHERE vec_id < 300
        ),
        incoming AS (
          SELECT vec_id - 50 AS post_id, embedding, 1 AS src
          FROM embeddings WHERE vec_id >= 250 AND vec_id < 400
        ),
        merged AS (SELECT * FROM existing UNION ALL SELECT * FROM incoming),
        ranked AS (
          SELECT post_id, embedding,
                 row_number() OVER (PARTITION BY post_id ORDER BY src DESC) AS rn
          FROM merged
        )
        SELECT post_id, round({mag}, 9) AS magnitude FROM ranked WHERE rn = 1
    """
    stuck = (
        f"(status = 'processing' AND end_time IS NULL"
        f" AND start_time < {qnow} - INTERVAL 15 MINUTE)"
    )
    cleanup_cte = f"""
        WITH queue AS ({QUEUE_FROM_ORDERS_SQL}),
        t AS (
          SELECT job_id,
                 CASE WHEN {stuck} THEN 'failed' ELSE status END AS status,
                 CASE WHEN {stuck} THEN error_count + 1 ELSE error_count END AS error_count,
                 CASE WHEN {stuck} THEN 'Job timed out' ELSE error_message END AS error_message,
                 end_time
          FROM queue
        )
        SELECT job_id, status, error_count, error_message FROM t
        WHERE NOT (
          (status = 'completed' AND end_time < {qnow} - INTERVAL 3 DAY)
          OR (status = 'failed' AND error_count > 3)
        )
    """
    claim_sel = """
          SELECT job_id FROM queue
          WHERE status = 'pending' OR (status = 'failed' AND error_count < 3)
          ORDER BY (CASE WHEN status = 'pending' THEN 0 ELSE 1 END), queued_time, job_id
          LIMIT 25
    """
    return {
        # --- DSL ---
        "dsl_filter_cnf": f"""
            WITH doc_meta AS ({DOC_META_ORACLE_SQL})
            SELECT DISTINCT d.doc_id AS post_id
            FROM documents d LEFT JOIN doc_meta pm ON d.doc_id = pm.post_id
            WHERE (d.lang = 'en' OR (pm.meta_key = 'n_chars' AND CAST(pm.meta_value AS DOUBLE) > 300))
              AND (d.source IN ('src0', 'src1', 'src2'))
              AND (d.text LIKE '%spark%')
        """,
        "dsl_empty_in_tautology": "SELECT DISTINCT doc_id AS post_id FROM documents",
        "search_meta_sorted": meta_sorted_cte,
        # --- CRUD ---
        "crud_point_lookup": f"SELECT vec_id, label, round({mag}, 9) AS mag FROM embeddings WHERE vec_id = 42",
        "crud_multi_get_ordered": f"""
            SELECT vec_id, CAST(list_position({ids_list}, vec_id) AS BIGINT) AS ord, label
            FROM embeddings WHERE vec_id IN (SELECT unnest({ids_list}))
        """,
        "crud_latest_per_user": """
            SELECT user_id, event_id, ts FROM (
              SELECT user_id, event_id, ts,
                     row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "crud_delete": "SELECT vec_id, label FROM embeddings WHERE vec_id != 10 AND vec_id < 30",
        "index_build": f"""
            SELECT vec_id AS post_id, CAST(0 AS INT) AS sequence_no,
                   round({mag}, 9) AS magnitude,
                   {code} AS binary_code,
                   round(list_reduce({norm}, (a, b) -> a + b), 9) AS norm_sum
            FROM embeddings
        """,
        "upsert_latest_wins": upsert_cte,
        # --- queue ---
        "queue_stats": f"WITH queue AS ({QUEUE_FROM_ORDERS_SQL}) SELECT status, COUNT(*) AS n FROM queue GROUP BY status",
        "queue_next_batch": f"""
            WITH queue AS ({QUEUE_FROM_ORDERS_SQL})
            SELECT job_id, post_id, status, queued_time, error_count FROM queue
            WHERE status = 'pending' OR (status = 'failed' AND error_count < 3)
            ORDER BY (CASE WHEN status = 'pending' THEN 0 ELSE 1 END), queued_time, job_id
            LIMIT 25
        """,
        "queue_claim_state": f"""
            WITH queue AS ({QUEUE_FROM_ORDERS_SQL}),
            claimed AS ({claim_sel})
            SELECT q.job_id,
                   CASE WHEN c.job_id IS NOT NULL THEN 'processing' ELSE q.status END AS status,
                   CASE WHEN c.job_id IS NOT NULL THEN {qnow} ELSE q.start_time END AS start_time,
                   q.error_count
            FROM queue q LEFT JOIN claimed c ON q.job_id = c.job_id
        """,
        "queue_cleanup": cleanup_cte,
        "queue_retry": f"""
            WITH queue AS ({QUEUE_FROM_ORDERS_SQL})
            SELECT job_id, post_id, error_count FROM queue
            WHERE status = 'failed' AND error_count < 3
            ORDER BY queued_time, job_id LIMIT 25000
        """,
        "queue_page": f"""
            WITH queue AS ({QUEUE_FROM_ORDERS_SQL})
            SELECT job_id, post_id, status FROM queue
            ORDER BY status DESC,
                     (CASE WHEN status = 'pending' THEN 0
                           WHEN status = 'completed' THEN 1
                           WHEN status = 'failed' THEN 2 ELSE 3 END) ASC,
                     job_id ASC
            OFFSET 50 LIMIT 25
        """,
        # --- kernels & search ---
        "k1_magnitude": f"SELECT vec_id, round({mag}, 9) AS mag FROM embeddings",
        "k2_normalize": f"""
            SELECT vec_id,
                   round(list_reduce({norm}, (a, b) -> a + b), 9) AS norm_sum,
                   round({K.sql_magnitude(norm)}, 9) AS norm_mag
            FROM embeddings
        """,
        "k3_sign_code": f"SELECT vec_id, {code} AS code FROM embeddings",
        "k4_code_hex": f"SELECT vec_id, {hexx} AS code_hex FROM embeddings",
        "k5_hamming": f"""
            SELECT e.vec_id, {ham} AS hd
            FROM embeddings e,
                 (SELECT {code} AS q_code FROM embeddings WHERE vec_id = 0) q
        """,
        "k6_cosine": f"""
            SELECT e.vec_id, round({cos}, 9) AS cos
            FROM embeddings e,
                 (SELECT embedding AS q_vec, {mag} AS q_mag
                  FROM embeddings WHERE vec_id = 0) q
        """,
        "search_brute_force": f"""
            WITH q AS (SELECT embedding AS q_vec, {mag} AS q_mag
                       FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id AS id,
                   round({cos}, 9) AS cosine_similarity
            FROM embeddings e, q
            ORDER BY {cos} DESC, e.vec_id ASC LIMIT 10
        """,
        "search_two_phase": search_cte,
    }
