"""The flagship pipeline expressed through the SQL API.

Catalyst produces the same physical plan for SQL text and DataFrame
calls; this module demonstrates the engine's surface from ``spark.sql``
— users who live in SQL get the identical three-stage search, with the
same higher-order-function kernels inlined as SQL expressions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from wpvectordb_spark.schemas import TESTDATA_TABLES


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    from wpvectordb_spark.sources.loaders import load_table

    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# empty-vector guard: sequence(0, -1) counts DOWN and would emit a
# garbage two-word code where kernels.sign_code returns [] — same pitfall
# kernels.hex_to_code guards against
_SIGN_CODE = (
    "(CASE WHEN size({v}) > 0 THEN"
    " transform(sequence(0, cast(ceil(size({v}) / 32.0) as int) - 1),"
    " w -> aggregate(slice(transform({v}, x -> if(cast(x as double) > 0d, 1L, 0L)),"
    " w * 32 + 1, 32), 0L, (acc, b) -> acc * 2 + b))"
    " ELSE cast(array() as array<bigint>) END)"
)
_MAG = "sqrt(aggregate({v}, 0d, (a, x) -> a + cast(x as double) * cast(x as double)))"
_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), 0d, (s, p) -> s + p)"
_HAMMING = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(bit_count(x ^ y) as bigint)),"
    " 0L, (s, c) -> s + c)"
)


def two_phase_search_sql(n: int = 5, lang: str = "en", query_vec_id: int = 0) -> str:
    """The S1-S8 funnel as one SQL statement over the registered views."""
    code_e = _SIGN_CODE.format(v="e.embedding")
    mag_q = _MAG.format(v="embedding")
    mag_s4 = _MAG.format(v="s4.embedding")
    return f"""
        WITH q AS (
          SELECT embedding AS q_vec, {mag_q} AS q_mag,
                 {_SIGN_CODE.format(v="embedding")} AS q_code
          FROM embeddings WHERE vec_id = {query_vec_id}
        ),
        scan AS (
          SELECT e.vec_id AS id, e.vec_id AS post_id, e.embedding,
                 {_HAMMING.format(a=code_e, b="q.q_code")} AS hamming_distance
          FROM embeddings e CROSS JOIN q
          WHERE e.vec_id IN (SELECT doc_id FROM documents WHERE lang = '{lang}')
        ),
        s4 AS (SELECT * FROM scan ORDER BY hamming_distance ASC, id ASC LIMIT {10 * n}),
        s6 AS (
          SELECT s4.id, s4.post_id, s4.hamming_distance,
                 {_DOT.format(a="q.q_vec", b="s4.embedding")}
                   / (q.q_mag * {mag_s4} + 1e-12) AS cos_raw
          FROM s4 CROSS JOIN q ORDER BY cos_raw DESC, id ASC LIMIT {5 * n}
        )
        SELECT id, post_id, hamming_distance, round(cos_raw, 9) AS cosine_similarity
        FROM s6 ORDER BY cos_raw DESC, id ASC LIMIT {n}
    """


def run_two_phase_search_sql(
    spark: SparkSession, sf_dir: str, n: int = 5, lang: str = "en"
) -> DataFrame:
    register_testdata_views(spark, sf_dir)
    return spark.sql(two_phase_search_sql(n=n, lang=lang))
