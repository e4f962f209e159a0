"""The flagship pipeline expressed through the SQL API.

Catalyst produces the same physical plan for SQL text and DataFrame
calls; this module demonstrates the engine's surface from ``spark.sql``
— users who live in SQL get the identical three-stage search, with the
same higher-order-function kernels inlined as SQL expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from wpvectordb_spark.schemas import TESTDATA_TABLES


def register_testdata_views(
    spark: SparkSession, sf_dir: str, only: list[str] | None = None
) -> None:
    """Register testdata parquet tables as temp views.  Pass ``only`` to
    register just what a query needs — registering everything reads ten
    parquet footers and (via the events loader) flips the session's
    nanosAsLong default as a side effect."""
    from wpvectordb_spark.sources.loaders import load_table

    for name in only if only is not None else TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# ONE fold with a (words, acc, cnt) struct accumulator — the same O(d)
# shape as kernels.sign_code.  The slice-per-word form re-evaluates the
# inner transform once per word (32x upstream recompute at 1024 dims:
# lambda-captured subtrees are not CSE'd).  aggregate over an empty array
# returns finish(init) = [], so no separate empty-vector guard is needed.
_SIGN_CODE = (
    "aggregate({v},"
    " named_struct('words', cast(array() as array<bigint>), 'acc', 0L, 'cnt', 0L),"
    " (s, x) -> named_struct("
    "   'words', IF((s.cnt + 1) % 32 = 0,"
    "     array_append(s.words, s.acc * 2 + IF(cast(x as double) > 0d, 1L, 0L)), s.words),"
    "   'acc', IF((s.cnt + 1) % 32 = 0, 0L,"
    "     s.acc * 2 + IF(cast(x as double) > 0d, 1L, 0L)),"
    "   'cnt', s.cnt + 1),"
    " s -> IF(s.cnt % 32 = 0, s.words, array_append(s.words, s.acc)))"
)
_MAG = "sqrt(aggregate({v}, 0d, (a, x) -> a + cast(x as double) * cast(x as double)))"
_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), 0d, (s, p) -> s + p)"
_HAMMING = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(bit_count(x ^ y) as bigint)),"
    " 0L, (s, c) -> s + c)"
)


def _sql_str(value: str) -> str:
    """Escape a string for interpolation into a single-quoted SQL
    literal (quote doubling) — parameters reach spark.sql as text, so a
    quote in a caller-supplied value must not break out of the literal."""
    return value.replace("'", "''")


def two_phase_search_sql(n: int = 5, lang: str = "en", query_vec_id: int = 0) -> str:
    """The S1-S8 funnel as one SQL statement over the registered views.
    ``n``/``query_vec_id`` are coerced to int and ``lang`` is
    literal-escaped before interpolation."""
    n = int(n)
    query_vec_id = int(query_vec_id)
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
          WHERE e.vec_id IN (SELECT doc_id FROM documents WHERE lang = '{_sql_str(lang)}')
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
    register_testdata_views(spark, sf_dir, only=["embeddings", "documents"])
    return spark.sql(two_phase_search_sql(n=n, lang=lang))
