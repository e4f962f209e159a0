"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]`` (N from ``SPARK_GRAFT_CPUS``, default
all cores); the same builder settings are what we would ship to a real
cluster: AQE on (runtime re-planning, skew-join handling, partition
coalescing), Arrow enabled for the few Pandas-UDF paths, shuffle
partitions sized to the core count rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "wpvectordb_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # Scale-adaptive, not host-constant: size the default to the
        # core count the session will actually RUN with ($SPARK_GRAFT_CPUS
        # when set — the driver benches at reduced core counts to measure
        # scaling, and a local[8] session with 32-partition shuffles
        # measures scheduling overhead, not the query), falling back to
        # the machine's cores.  SPARK_SHUFFLE_PARTITIONS still overrides
        # outright; on a real cluster set it to ~2-3x total cores (or
        # lean on AQE coalescing, enabled below, with an advisory
        # partition size) — see docs/SCALE.md.
        # clamp: SPARK_GRAFT_CPUS="0" would set shuffle.partitions=0, an
        # invalid conf that fails at the first shuffle with an opaque
        # error (ADVICE round 11)
        ncores = max(1, int(cpus)) if cpus.isdigit() else (os.cpu_count() or 8)
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(ncores)))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # TIMESTAMP(NANOS) parquet (the events table) reads as raw int64;
        # the loaders convert explicitly.  Set here so the behavior is a
        # visible session default, not a read-order-dependent surprise.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
