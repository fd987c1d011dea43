"""SparkSession builder with the engine's pinned configs (SURVEY.md §4.2).

Configs chosen for correctness-critical determinism (UTC session timezone —
fixtures are timestamp_ntz, SURVEY.md §7 R3) and for scale (AQE on, so the
same declarative plans re-optimize at runtime on a real cluster; shuffle
partition count is a knob, defaulting low for local scale factors but meant
to be raised to ~2-3× total cores at 100 TB).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tuned for the local[32] test host; on a 1000-executor cluster raise
# shuffle partitions to O(cores*2) and let AQE coalesce down.
DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "*")


def ensure_session_defaults(spark: SparkSession) -> None:
    """Pin the runtime-settable configs the engine's determinism contract
    depends on, on an externally-created session (the driver passes its
    own SparkSession to queries()):

    - UTC session timezone: fixtures are timestamp_ntz and oracle
      comparisons assume UTC epoch math (SURVEY.md §7 R3);
    - nanosAsLong: events.ts is parquet TIMESTAMP(NANOS) (catalog.py);
    - Arrow: pandas-UDF interchange.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # custom Python data sources absorb offset-range predicates
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


def get_spark(app_name: str = "kafka_hadoop_consumer_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's pinned configs."""
    builder = (
        SparkSession.builder
        .master(master or f"local[{DEFAULT_CPUS}]")
        .appName(app_name)
        # AQE: runtime re-planning (coalesce post-shuffle partitions,
        # broadcast-convert joins, split skewed partitions).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        # Determinism: fixtures are timestamp_ntz; never let session tz leak in.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for pandas interchange (pandas UDFs, toPandas).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
