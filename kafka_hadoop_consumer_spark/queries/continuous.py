"""Continuous-aggregate bridge key (SURVEY.md §2A→§2B): the one
registry entry that runs an actual Structured Streaming job — micro-batched
file source, watermarked tumbling-window state carried ACROSS micro-batches
— and hash-checks its final result against the plain batch SQL aggregate.

This is the "continuous aggregate" contract every streaming warehouse
(Timescale caggs, Materialize, Flink dynamic tables) makes: maintaining
the aggregate incrementally over arriving chunks must be indistinguishable
from recomputing it over the full table. The s_stream_* pytest suite
drives the richer streaming surface (restart exactly-once, session
windows, stateful ops); this key puts the core equivalence under the
driver's DuckDB hash gate.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from itertools import count as _count

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.catalog import load_table
from kafka_hadoop_consumer_spark.queries.registry import query

N_LANDING_FILES = 4  # micro-batches per run (maxFilesPerTrigger=1)

_RUN_IDS = _count()

# Observability for tests: number of micro-batches the most recent
# q_stream_continuous_agg run executed (must be > 1, or the "state
# carries across micro-batches" claim is vacuous).
LAST_RUN_BATCHES: int | None = None


def _work_dir(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"/tmp/khcs_continuous/{tag}"


@query(
    "q_stream_continuous_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_continuous_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous aggregate, streamed: events land as {N_LANDING_FILES}
    parquet chunks, a Structured Streaming job consumes them ONE FILE PER
    MICRO-BATCH (maxFilesPerTrigger=1, availableNow) into a watermarked
    1-hour tumbling-window count/sum whose state carries across the
    micro-batches, and the final emitted table must hash-match DuckDB's
    one-shot GROUP BY over the same rows — incremental maintenance ==
    batch recompute, the continuous-aggregate contract.

    Scale shape: streaming state is one row per (open window × event
    type) — bounded by the watermark horizon, not by stream length; each
    micro-batch does a map-side partial agg before the state-store merge
    (same shuffle discipline as the batch groupBy). The memory sink +
    complete mode here are the comparison harness (the final table must
    be readable back); the production posture is update mode into a
    keyed sink with the watermark evicting closed windows, exercised in
    tests/test_streaming.py. The checkpoint is fresh per invocation
    because the landing data is rewritten per invocation — checkpoint
    resume/exactly-once across restarts is pytest-covered
    (s_ingest_e2e's kill-a-commit test)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    work = _work_dir(sf_dir)
    landing = os.path.join(work, "landing")
    e.repartition(N_LANDING_FILES).write.mode("overwrite").parquet(landing)

    ckpt = tempfile.mkdtemp(prefix="khcs_cont_ckpt_")
    name = f"continuous_agg_{next(_RUN_IDS)}"
    try:
        # Watermarks require TIMESTAMP (event-time) — the fixture column is
        # TIMESTAMP_NTZ; under the UTC session the cast is wall-clock
        # preserving, and the window bound is cast back to NTZ on output.
        stream = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sv"))
        )
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        global LAST_RUN_BATCHES
        LAST_RUN_BATCHES = len(
            [p for p in q.recentProgress if p.get("numInputRows", 0) > 0]
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name).select(
        F.col("w.start").cast("timestamp_ntz").alias("bucket_start"),
        "event_type",
        "n_events",
        F.round("sv", 2).alias("sum_value"),
    )
