"""Parquet loaders for the driver testdata plus EAV derivation.

The reference reads MySQL tables through ``$wpdb``; our I/O surface is
columnar parquet (column pruning + predicate pushdown reach the scan for
free).  ``doc_meta_from_documents`` reconstructs the reference's
``wp_postmeta`` EAV shape (post_id, meta_key, meta_value — all values text,
Filter.php:96-100) by unpivoting the typed ``documents`` columns, so the
EAV filter/sort DSL can be exercised against driver data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wpvectordb_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects; read the physical int64 (nanosAsLong) and
    truncate to microseconds with integer division — the same truncation
    DuckDB applies casting TIMESTAMP_NS -> TIMESTAMP (double division would
    round and diverge in the last microsecond).

    SESSION-WIDE side effect, deliberate: nanosAsLong has no per-read
    option, so this flips the session default (get_spark sets it too).
    It only changes how TIMESTAMP(NANOS) physical columns read — events
    is the sole NANOS table here; micros/millis tables are unaffected."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


# Documents columns exposed through the EAV meta surface.  ``stack`` unpivots
# without a shuffle (narrow transformation).
_META_KEYS = ("lang", "source", "n_chars")


def doc_meta_from_documents(documents: DataFrame) -> DataFrame:
    """documents -> (post_id, meta_key, meta_value) EAV rows, values as text.

    Mirrors wp_postmeta's stringly-typed storage (SURVEY.md §1.3): every
    value is stored as a string and cast on demand at query time.
    """
    n = len(_META_KEYS)
    pairs = ", ".join(f"'{k}', cast(`{k}` as string)" for k in _META_KEYS)
    return documents.select(
        F.col("doc_id").alias("post_id"),
        F.expr(f"stack({n}, {pairs}) as (meta_key, meta_value)"),
    )


# The equivalent DuckDB SQL fragment, kept adjacent so engine and oracle
# derive the EAV view identically.
DOC_META_ORACLE_SQL = """
SELECT doc_id AS post_id, k AS meta_key, v AS meta_value
FROM (
  SELECT doc_id, UNNEST(['lang','source','n_chars']) AS k,
         UNNEST([CAST(lang AS VARCHAR), CAST(source AS VARCHAR), CAST(n_chars AS VARCHAR)]) AS v
  FROM documents
)
"""
