"""Jar-gated REAL Kafka integration test (SURVEY.md §2A A1, §7 risk R1;
r12 verdict item 4).

This container has no spark-sql-kafka jar (0 of the bundled jars match
``kafka``) and no network to fetch one, so the engine's Kafka surface is
verified offline as an options contract (test_streaming.py) plus the
kafka_sim DataSource. THIS test is the missing last mile, armed the day
a jar (and broker) are available:

Provisioning (networked session, one line each):

* jar — start Spark with
  ``spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2``
  (match the Scala suffix and Spark version of the installed PySpark), or
  drop the jar + its kafka-clients dependency into ``$SPARK_HOME/jars``;
* broker — any reachable Kafka (e.g. a single-node local broker), then
  ``export SPARK_GRAFT_KAFKA_BOOTSTRAP=localhost:9092``.

Until both are present the tests skip with a reason naming exactly which
leg is missing, so a future networked session sees the TODO in its skip
line instead of silently green coverage.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.streaming import (
    SourceSpec,
    kafka_source_options,
    run_ingest,
)

BOOTSTRAP_ENV = "SPARK_GRAFT_KAFKA_BOOTSTRAP"


def kafka_jar_on_classpath(spark) -> bool:
    """True when the spark-sql-kafka-0-10 provider class is loadable in
    the JVM — the exact precondition for format('kafka') to resolve."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def _gate(spark) -> str | None:
    """Skip reason, or None when the test can actually run."""
    missing = []
    if not kafka_jar_on_classpath(spark):
        missing.append(
            "spark-sql-kafka-0-10 jar not on classpath (provision: "
            "spark.jars.packages=org.apache.spark:"
            "spark-sql-kafka-0-10_2.13:4.1.2)"
        )
    if not os.environ.get(BOOTSTRAP_ENV):
        missing.append(
            f"no broker configured (export {BOOTSTRAP_ENV}=host:port)"
        )
    return "; ".join(missing) or None


def test_kafka_jar_probe_is_honest(spark):
    """The gate itself must track reality: on this offline container the
    provider class is absent, so the probe must say False (if it ever
    flips true here, the e2e below stops skipping — that is the point)."""
    jar = kafka_jar_on_classpath(spark)
    if os.environ.get(BOOTSTRAP_ENV) or jar:
        pytest.skip("environment provisions Kafka; probe exercised by e2e")
    assert jar is False


def test_kafka_ingest_e2e_exactly_once(spark, tmp_path):
    """run_ingest (streaming/ingest.py A1→A7) against a REAL broker:
    produce via the batch Kafka sink, drain via SourceSpec(kind='kafka'),
    assert the decoded rows and the checkpointed exactly-once rerun —
    the same contract the file-replay e2e pins offline, now over the
    same envelope kafka_source_options builds for."""
    reason = _gate(spark)
    if reason:
        pytest.skip(f"kafka integration unavailable: {reason}")

    brokers = os.environ[BOOTSTRAP_ENV]
    topic = f"spark_graft_it_{uuid.uuid4().hex[:8]}"

    # produce 100 JSON messages through Spark's own batch Kafka sink
    msgs = spark.range(100).select(
        F.col("id").cast("string").alias("key"),
        F.to_json(F.struct(
            F.col("id").alias("event_id"),
            (F.col("id") % 7).alias("user_id"),
        )).alias("value"),
    )
    (msgs.write.format("kafka")
         .option("kafka.bootstrap.servers", brokers)
         .option("topic", topic)
         .save())

    spec = SourceSpec(kind="kafka", topic=topic, brokers=brokers)
    # contract parity: the options the reader runs with are exactly the
    # unit-tested option set
    opts = kafka_source_options(spec)
    assert opts["subscribe"] == topic
    assert opts["kafka.bootstrap.servers"] == brokers

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, user_id long"
    stats = run_ingest(spark, spec, out, ckpt, json_schema=schema)
    assert stats["rows"] == 100

    got = spark.read.parquet(out)
    assert set(got.columns) == {"event_id", "user_id"}
    assert got.count() == 100
    assert got.agg(F.countDistinct("event_id")).collect()[0][0] == 100

    # exactly-once: rerun with the same checkpoint consumes nothing new
    stats2 = run_ingest(spark, spec, out, ckpt, json_schema=schema)
    assert stats2["rows"] == 0
    assert spark.read.parquet(out).count() == 100
