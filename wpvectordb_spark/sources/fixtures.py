"""Deterministic fixture derivations from driver testdata.

The driver ships TPC-H-ish tables but no queue table; ``queue_from_orders``
derives a queue state DataFrame from ``orders`` with pure arithmetic on
stable keys, and ``QUEUE_FROM_ORDERS_SQL`` is the identical DuckDB
derivation, so queue operators can be oracle-checked end-to-end.

Fixed "now" for time-dependent queue semantics: TPC-H order dates span
1992-1998, so 1998-08-15 12:00:00 sits inside the data range.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUEUE_NOW = dt.datetime(1998, 8, 15, 12, 0, 0)

_STATUS = """
CASE WHEN o_orderstatus = 'P' THEN 'processing'
     WHEN o_orderstatus = 'F' THEN (CASE WHEN o_orderkey % 3 = 0 THEN 'failed' ELSE 'completed' END)
     ELSE 'pending' END
"""


def queue_from_orders(orders: DataFrame) -> DataFrame:
    status = F.expr(_STATUS)
    started = status.isin("processing", "completed", "failed")
    ended = status.isin("completed", "failed")
    failed = status == "failed"
    return orders.select(
        F.col("o_orderkey").alias("job_id"),
        F.col("o_custkey").alias("post_id"),
        (F.col("o_orderkey") % 7).cast("int").alias("chunk_count"),
        status.alias("status"),
        F.col("o_orderdate").alias("queued_time"),
        F.when(started, F.col("o_orderdate") + F.expr("INTERVAL 1 HOUR"))
        .otherwise(F.lit(None).cast("timestamp"))
        .alias("start_time"),
        F.when(ended, F.col("o_orderdate") + F.expr("INTERVAL 2 HOURS"))
        .otherwise(F.lit(None).cast("timestamp"))
        .alias("end_time"),
        F.when(failed, (F.lit(1) + F.col("o_orderkey") % 4)).otherwise(F.lit(0)).cast("int").alias("error_count"),
        F.when(failed, F.lit("embedding failed")).otherwise(F.lit(None).cast("string")).alias("error_message"),
    )


QUEUE_FROM_ORDERS_SQL = f"""
SELECT o_orderkey AS job_id,
       o_custkey AS post_id,
       CAST(o_orderkey % 7 AS INT) AS chunk_count,
       {_STATUS} AS status,
       o_orderdate AS queued_time,
       CASE WHEN {_STATUS} IN ('processing','completed','failed')
            THEN o_orderdate + INTERVAL 1 HOUR END AS start_time,
       CASE WHEN {_STATUS} IN ('completed','failed')
            THEN o_orderdate + INTERVAL 2 HOUR END AS end_time,
       CAST(CASE WHEN {_STATUS} = 'failed' THEN 1 + o_orderkey % 4 ELSE 0 END AS INT) AS error_count,
       CASE WHEN {_STATUS} = 'failed' THEN 'embedding failed' END AS error_message
FROM orders
"""
