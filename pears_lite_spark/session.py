"""SparkSession factory tuned for the engine.

All jobs run through here so local tests, the driver's verify, and the
two-parallelism-level bench share one config story. The settings are the
scale knobs called out in SURVEY.md §4: AQE (runtime re-plan + skew
join), Arrow everywhere (no per-row Python), bounded shuffle partitions,
and broadcast-join for the small dimension tables (term stats, vocab).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "pears-lite-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(os.environ.get(
        "PEARS_SHUFFLE_PARTITIONS", cpus))
    b = (SparkSession.builder.appName(app_name).master(master)
         .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
         .config("spark.sql.session.timeZone", "UTC")
         # int64-micros timestamps: parquet footers carry min/max stats
         # for them (INT96, Spark's legacy default, has none and is
         # banned by the Iceberg spec) — the catalog's manifest bounds
         # and time-range file pruning depend on this
         .config("spark.sql.parquet.outputTimestampType",
                 "TIMESTAMP_MICROS")
         .config("spark.driver.memory",
                 os.environ.get("PEARS_DRIVER_MEM", "8g"))
         .config("spark.ui.enabled", "false"))
    return b.getOrCreate()
