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
from pyspark.sql import types as T

from wpvectordb_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet has shipped with two physical ``ts`` encodings across
    testdata generations, so the loader adapts to what the file declares:

    * TIMESTAMP(NANOS): Spark's vectorized reader rejects it; with the
      session-wide ``nanosAsLong`` flag (set in get_spark too, so the
      behavior is a visible default, not read-order-dependent) it reads as
      int64 nanos, which we truncate to microseconds with integer division
      — the same truncation DuckDB applies casting TIMESTAMP_NS ->
      TIMESTAMP (double division would round and diverge in the last
      microsecond).
    * TIMESTAMP(MICROS/MILLIS): reads natively as TIMESTAMP_NTZ; cast to
      the session-local TIMESTAMP type (a value no-op under the UTC
      session timezone) so downstream comparisons against timestamp
      literals resolve to one type either way."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return df.withColumn("ts", _events_ts(df.schema["ts"].dataType))


def _events_ts(ts_type: T.DataType) -> F.Column:
    if isinstance(ts_type, T.LongType):  # nanosAsLong int64 nanos
        return F.timestamp_micros(F.expr("ts div 1000"))
    return F.col("ts").cast("timestamp")


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


# --- raw-corpus ingestion (JSONL / CSV crawl drops) ---------------------------

DOCUMENTS_INGEST_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
_CORRUPT_COL = "_corrupt_record"


def ingest_documents(
    spark: SparkSession,
    path: str,
    format: str = "jsonl",
    schema: str = DOCUMENTS_INGEST_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read a raw document drop (the upstream of the dedup/curation
    pipelines: crawlers hand over JSONL or CSV, not parquet) into
    ``(good, quarantine)`` frames.

    100 TB ingestion rules, all enforced here rather than left to the
    caller:

    * EXPLICIT schema, never inference — inference is a full extra pass
      over the drop, and on a multi-writer directory the inferred type
      depends on which file the sampler hits (the same trap as the
      streaming state dirs; see streams._read_state).
    * PERMISSIVE mode with a corrupt-record column, never FAILFAST or
      DROPMALFORMED — at crawl scale malformed lines are a certainty,
      a single bad byte must not kill a 10-hour job, and silently
      dropping rows is unauditable.  Bad lines land in the quarantine
      frame with their raw text intact for replay/debugging.
    * The parse is ``spark.read.text`` (splittable, byte-range per
      task) + ``from_json``/``from_csv`` with the FULL schema, NOT the
      JSON/CSV datasource.  The datasource re-derives the corrupt
      decision against each query's PRUNED column set, so a row whose
      only malformed field is pruned away flips between good and
      corrupt depending on which columns the consumer selects — a
      type-mismatched ``doc_id`` made the row corrupt for the ``good``
      filter (doc_id in its projection) and clean for the
      ``quarantine`` filter (which only reads the corrupt column):
      the row silently vanished from BOTH frames (data loss, caught by
      the oracle arm's fixture).  ``from_json`` with explicit options
      is exempt from Catalyst's schema pruning, so the decision is
      made once against the full schema for every consumer.  Bonus:
      the SPARK-21610 refusal (a bare ``quarantine.count()``) no
      longer applies — counts work.
    * Whitespace-only lines are skipped (matching the datasource's
      ignore-blank-lines behavior): a whitespace-class regex blank
      check before the parse.  A NON-blank line that still parses to a
      NULL struct (``from_json`` returns one for the bare JSON literal
      ``null``, with no corrupt record set) is routed to quarantine
      with the raw line — never to the good frame as a phantom
      all-NULL row, and never silently dropped: every non-blank input
      line lands in exactly one of the two frames.
    * JSONL is splittable line-by-line; CSV here is header-less with
      explicit columns — the multiLine variants of either format
      destroy splittability and are deliberately not exposed.

    Returns ``(good, quarantine)``: ``good`` has exactly the schema's
    columns; ``quarantine`` has them plus ``_corrupt_record`` (the raw
    line).  Reference: the PHP reference ingests posts one INSERT at a
    time (VectorTable.php insert paths); this is the bulk analog."""
    full = f"{schema}, {_CORRUPT_COL} string"
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT_COL}
    if format in ("jsonl", "json"):
        parse = F.from_json(F.col("value"), full, opts)
    elif format == "csv":
        parse = F.from_csv(F.col("value"), full, opts)
    else:
        raise ValueError(f"ingest_documents: unknown format {format!r}")
    lines = (
        spark.read.text(path)
        .where(F.regexp_replace(F.col("value"), r"\s", "") != "")
        .select(F.col("value"), parse.alias("_parsed"))
    )
    cols = [f.split()[0] for f in schema.split(",")]
    # A NON-blank line whose parse yields a NULL struct with no corrupt
    # record (e.g. the bare JSON literal ``null``) is still a line the
    # caller handed us: the invariant is every non-blank input line lands
    # in exactly one frame, so its raw text becomes the corrupt record —
    # folded into ONE corrupt expression (not a filter+union of the two
    # corrupt classes: each union branch would re-scan and re-parse the
    # whole drop, doubling the quarantine frame's cost).  getField on
    # the NULL struct gives correctly-typed NULL data columns.
    corrupt = F.when(
        F.col("_parsed").isNotNull(), F.col("_parsed")[_CORRUPT_COL]
    ).otherwise(F.col("value"))
    good = lines.where(
        F.col("_parsed").isNotNull() & F.col("_parsed")[_CORRUPT_COL].isNull()
    ).select(*[F.col("_parsed")[c].alias(c) for c in cols])
    quarantine = lines.where(corrupt.isNotNull()).select(
        *[F.col("_parsed")[c].alias(c) for c in cols],
        corrupt.alias(_CORRUPT_COL),
    )
    return good, quarantine
