"""Reference-format export/import sink: the wire format a WPVectorDb
MySQL table holds (VectorTable.php:469-481) — JSON-text vectors, hex-string
binary codes — written as JSON lines so a reference deployment can be
migrated in either direction.

Columns map 1:1 to the reference schema: ``vector`` / ``normalized_vector``
as JSON float arrays (the reference stores JSON columns,
VectorTable.php:356), ``binary_code`` as the 4-bit/char hex string
(:537-575), ``magnitude`` as float.  Import parses everything back to the
engine's native types (``array<float>`` vectors, ``array<long>`` packed
codes) — `functions.kernels.hex_to_code` is the K4 inverse.

Scale note: the export is a narrow projection + file write (no shuffle);
imports re-derive nothing — the derived columns ride along, and a
consistency re-check is one `kernels.sign_code` comparison away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wpvectordb_spark.functions import kernels as K

REFERENCE_EXPORT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("post_id", T.LongType()),
        T.StructField("sequence_no", T.IntegerType()),
        T.StructField("vector", T.StringType()),  # JSON float array
        T.StructField("normalized_vector", T.StringType()),  # JSON float array
        T.StructField("vector_type", T.StringType()),
        T.StructField("binary_code", T.StringType()),  # hex, 4 bits/char
        T.StructField("magnitude", T.DoubleType()),
    ]
)


def to_reference_rows(table: DataFrame) -> DataFrame:
    """Project an engine-native vector table into the reference's column
    formats (JSON text + hex codes).  Missing optional columns are filled
    with the reference's defaults."""
    cols = set(table.columns)
    out = table
    if "sequence_no" not in cols:
        out = out.withColumn("sequence_no", F.lit(0).cast("int"))
    if "id" not in cols:
        # the reference's id is a UNIQUE primary key: a bare post_id would
        # collide for multi-chunk documents, so synthesize a composite
        # (unique while sequence_no < 2^20 — chunk counts are far below)
        out = out.withColumn(
            "id", F.col("post_id") * F.lit(1 << 20) + F.col("sequence_no")
        )
    if "vector_type" not in cols:
        out = out.withColumn("vector_type", F.lit("default"))
    if "normalized_vector" not in cols:
        out = out.withColumn("normalized_vector", K.normalize("vector"))
    if "binary_code" not in cols:
        out = out.withColumn("binary_code", K.sign_code("vector"))
    if "magnitude" not in cols:
        out = out.withColumn("magnitude", K.magnitude("vector"))
    return out.select(
        F.col("id").cast("long"),
        F.col("post_id").cast("long"),
        F.col("sequence_no").cast("int"),
        F.to_json(F.col("vector")).alias("vector"),
        F.to_json(F.col("normalized_vector")).alias("normalized_vector"),
        F.col("vector_type"),
        K.code_to_hex("binary_code").alias("binary_code"),
        F.col("magnitude").cast("double"),
    )


def export_reference_json(table: DataFrame, path: str) -> None:
    """Write the reference wire format as JSON lines (the natural dump of
    a JSON-column MySQL table)."""
    to_reference_rows(table).write.mode("overwrite").json(path)


def import_reference_json(
    spark: SparkSession,
    path: str,
    verify_derived: bool = False,
    rel_tol: float = 1e-6,
) -> DataFrame:
    """Read a reference-format dump back into engine-native types.

    ``verify_derived=True`` appends ``magnitude_ok`` / ``binary_code_ok``
    boolean columns comparing the dump's derived columns against values
    recomputed from the imported vector — FLAGGING, never silently
    fixing.  This matters because real WPVectorDb dumps contain STALE
    magnitudes: the reference's upsert path re-serializes the new vector
    but never refreshes the magnitude column (VectorTable.php:360-368,
    SURVEY.md §4.4.4), so any row updated after insert carries the OLD
    vector's magnitude.  The magnitude check is relative (``rel_tol``,
    float-narrowing headroom); the code check is exact (the sign of a
    float survives the JSON round-trip).  Rows with NULL vectors flag
    NULL — absent evidence, not a verdict.
    """
    raw = spark.read.schema(REFERENCE_EXPORT_SCHEMA).json(path)
    out = raw.select(
        "id",
        "post_id",
        "sequence_no",
        F.from_json("vector", "array<float>").alias("vector"),
        F.from_json("normalized_vector", "array<float>").alias("normalized_vector"),
        "vector_type",
        K.hex_to_code("binary_code").alias("binary_code"),
        "magnitude",
    )
    if not verify_derived:
        return out
    rm = K.magnitude("vector")
    return out.select(
        "*",
        (
            F.abs(F.col("magnitude") - rm)
            <= F.lit(rel_tol) * F.greatest(F.abs(rm), F.lit(1e-30))
        ).alias("magnitude_ok"),
        (F.col("binary_code") == K.sign_code("vector")).alias(
            "binary_code_ok"
        ),
    )
