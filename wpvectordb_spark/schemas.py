"""Schema constants for the engine's tables.

Reference data model (SURVEY.md §1): the MySQL DDL at
``src/VectorTable.php:469-481`` (embeddings) and
``src/VectorTableQueue.php:77-87`` (job queue), mapped to Spark types.
Vectors become first-class ``array<float>`` (not JSON text); binary sign
codes become ``array<bigint>`` packed 32 bits/word (not hex strings) so
Hamming distance is native ``bit_count(xor)``; timestamps are real
``timestamp`` columns.

32 bits/word (not 64) is deliberate: packing with an arithmetic left fold
(``acc*2 + bit``) stays far from signed-64 overflow, so the identical
expression is portable to any engine used as a correctness oracle, while
Hamming cost at 1024 dims is still only 32 words.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Words of 32 sign bits per array<bigint> element of a binary code.
CODE_WORD_BITS = 32

# --- reference table: {prefix}embeddings (VectorTable.php:469-481) ---------
VECTOR_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("post_id", T.LongType(), False),
        T.StructField("sequence_no", T.IntegerType(), False),
        T.StructField("vector", T.ArrayType(T.FloatType()), False),
        T.StructField("normalized_vector", T.ArrayType(T.DoubleType()), True),
        T.StructField("vector_type", T.StringType(), True),
        T.StructField("binary_code", T.ArrayType(T.LongType()), True),
        T.StructField("magnitude", T.DoubleType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

# --- reference table: {prefix}post_embed_queue (VectorTableQueue.php:77-87) -
QUEUE_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.LongType(), False),
        T.StructField("post_id", T.LongType(), False),
        T.StructField("chunk_count", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("queued_time", T.TimestampType(), True),
        T.StructField("start_time", T.TimestampType(), True),
        T.StructField("end_time", T.TimestampType(), True),
        T.StructField("error_count", T.IntegerType(), False),
        T.StructField("error_message", T.StringType(), True),
    ]
)

QUEUE_STATUSES = ("pending", "processing", "completed", "failed")

# --- EAV meta table (wp_postmeta analog; Filter.php:96-100) ------------------
DOC_META_SCHEMA = T.StructType(
    [
        T.StructField("post_id", T.LongType(), False),
        T.StructField("meta_key", T.StringType(), False),
        T.StructField("meta_value", T.StringType(), True),
    ]
)

# --- testdata tables (TESTDATA.md) ------------------------------------------
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
