"""Batch source roundtrips: CSV/JSON with explicit schemas must preserve
values bit-for-bit against the parquet original."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.catalog import load_table
from kafka_hadoop_consumer_spark.sources import (
    read_csv,
    read_json,
    write_partitioned_parquet,
)
from tests.conftest import SF_SMALL

ORDERS_DDL = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"
)


def _orders(spark):
    return load_table(spark, SF_SMALL, "orders")


def test_csv_roundtrip(spark, tmp_path):
    path = str(tmp_path / "orders_csv")
    _orders(spark).write.option("header", "true").csv(path)
    back = read_csv(spark, path, ORDERS_DDL)
    assert back.count() == _orders(spark).count()
    a = _orders(spark).agg(F.sum("o_totalprice").alias("s")).collect()[0]["s"]
    b = back.agg(F.sum("o_totalprice").alias("s")).collect()[0]["s"]
    assert abs(a - b) < 1e-6


def test_json_roundtrip(spark, tmp_path):
    path = str(tmp_path / "orders_json")
    _orders(spark).write.json(path)
    back = read_json(spark, path, ORDERS_DDL)
    assert back.count() == _orders(spark).count()
    assert back.where(F.col("o_orderkey").isNull()).count() == 0


def test_orc_roundtrip(spark, tmp_path):
    path = str(tmp_path / "orders_orc")
    _orders(spark).write.orc(path)
    back = spark.read.orc(path)
    assert back.count() == _orders(spark).count()
    assert back.schema == _orders(spark).schema


def test_partitioned_write_enables_pruning(spark, tmp_path):
    from kafka_hadoop_consumer_spark.plans import formatted_plan

    path = str(tmp_path / "orders_part")
    write_partitioned_parquet(_orders(spark), path, partition_by=["o_orderstatus"])
    back = spark.read.parquet(path).where(F.col("o_orderstatus") == "F")
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters", 1)[1].split("]")[0]
    n_f = _orders(spark).where(F.col("o_orderstatus") == "F").count()
    assert back.count() == n_f
