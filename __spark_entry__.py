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
from wpvectordb_spark.operators import search as S


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
    return {
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
