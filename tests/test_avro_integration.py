"""Jar-gated Avro roundtrip test (r12 verdict "what's missing" #2).

Avro is the one mainstream ingest format with no q_source_*_roundtrip
key: spark-avro is an EXTERNAL module (not bundled in spark-sql), this
container has no matching jar and no network to fetch one — the same
environment block as the Kafka connector (SURVEY.md §7 R1). This test
arms the roundtrip the day a jar is provisioned:

* networked session, one line:
  ``spark.jars.packages=org.apache.spark:spark-avro_2.13:4.1.2``
  (match the Scala suffix + Spark version of the installed PySpark), or
  drop the jar into ``$SPARK_HOME/jars``.

Until then it skips with a reason naming the provisioning line, and the
companion probe test pins that the gate tracks reality.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.catalog import load_table
from tests.conftest import SF_SMALL

PROVISION = (
    "spark.jars.packages=org.apache.spark:spark-avro_2.13:4.1.2"
)


def avro_jar_on_classpath(spark) -> bool:
    """True when format('avro') actually resolves to a data source.

    Class-probing org.apache.spark.sql.avro.AvroFileFormat is NOT
    sufficient: avro helper classes ship inside spark-sql (the bundled
    avro-1.12 jars are Avro core, a Spark dependency), so the class
    loads while DataSource.lookupDataSource still fails with "Avro is
    built-in but external data source module since Spark 2.4". Probe
    the lookup itself via a read of a nonexistent path and classify
    the failure: missing-source error => not provisioned; plain
    path-not-found => the source resolved."""
    try:
        spark.read.format("avro").load("/nonexistent_avro_probe_path")
        return True  # (can't happen: path doesn't exist)
    except Exception as exc:
        return "Failed to find data source: avro" not in str(exc)


def test_avro_jar_probe_is_honest(spark):
    """On this offline container the provider class is absent, so the
    probe must say False; if it ever flips, the roundtrip below stops
    skipping — that is the point."""
    if avro_jar_on_classpath(spark):
        pytest.skip("avro jar provisioned; probe exercised by roundtrip")
    assert avro_jar_on_classpath(spark) is False


def test_avro_roundtrip(spark, tmp_path):
    """orders → avro sink → avro source → aggregate, mirroring
    q_source_orc_roundtrip (formats.py): doubles roundtrip bit-exact,
    so max(o_totalprice) compares unrounded while the sum is rounded
    like every cross-engine double aggregate."""
    if not avro_jar_on_classpath(spark):
        pytest.skip(
            f"avro integration unavailable: spark-avro jar not on "
            f"classpath (provision: {PROVISION})"
        )
    o = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "orders_avro")
    o.write.mode("overwrite").format("avro").save(path)
    back = spark.read.format("avro").load(path)
    got = (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderstatus")
        .collect()
    )
    want = (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderstatus")
        .collect()
    )
    assert got == want
