"""Source scans, filters, and projections (SURVEY.md §2B "Sources/sinks",
"Projection/filter/predicates").

The reference's only scan is a partition-parallel bounded Kafka read
(SURVEY.md §2A A1–A3); the relational analogue here is the parquet scan,
where Catalyst gives us split planning, predicate pushdown, and column
pruning for free (§4.2). tests/test_plans.py asserts PushedFilters /
ReadSchema actually reach the scan node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.catalog import load_table
from kafka_hadoop_consumer_spark.queries.registry import query


@query(
    "q_scan_parquet",
    oracle="SELECT count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders FROM lineitem",
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan of the fact table (ingestion parity: §2A A1)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "q_scan_pruned",
    oracle="""
    SELECT l_orderkey, l_partkey, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-07-01'
    """,
)
def q_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned, predicate-pushed scan: 3 of 11 columns, shipdate range.

    The filter and the 3-column projection must reach the parquet reader
    (ReadSchema shows only referenced columns; PushedFilters shows the
    range) — asserted in tests/test_plans.py.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
        )
        .select("l_orderkey", "l_partkey", "l_extendedprice")
    )


@query(
    "q_filter_pred",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE (o_orderstatus IN ('F', 'P')
           AND o_totalprice BETWEEN 500.0 AND 150000.0
           AND o_orderpriority LIKE '1%')
       OR (NOT o_orderstatus = 'F'
           AND o_orderpriority IN ('5-LOW', '4-NOT SPECIFIED')
           AND NULLIF(o_orderstatus, 'P') IS NOT NULL)
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter: comparisons, AND/OR/NOT, IN, BETWEEN, LIKE, null handling."""
    o = load_table(spark, sf_dir, "orders")
    pred = (
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(500.0, 150000.0)
        & F.col("o_orderpriority").like("1%")
    ) | (
        (~(F.col("o_orderstatus") == "F"))
        & F.col("o_orderpriority").isin("5-LOW", "4-NOT SPECIFIED")
        & F.nullif(F.col("o_orderstatus"), F.lit("P")).isNotNull()
    )
    return o.where(pred).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )


@query(
    "q_project_expr",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
           CASE WHEN l_quantity >= 30 THEN 'bulk'
                WHEN l_quantity >= 10 THEN 'mid'
                ELSE 'small' END AS qty_class
    FROM lineitem
    """,
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with arithmetic, CASE WHEN, aliases.

    Scalar IEEE-754 expressions over identical parquet input bits are
    bit-deterministic across engines, so no rounding is needed here
    (rounding is only for aggregates — SURVEY.md §7 R2).
    """
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("charged"),
        F.when(F.col("l_quantity") >= 30, "bulk")
        .when(F.col("l_quantity") >= 10, "mid")
        .otherwise("small")
        .alias("qty_class"),
    )


@query(
    "q_source_kafka_sim",
    oracle="""
    SELECT 'sim' AS topic,
           CAST(p AS INT) AS "partition",
           CAST(o AS BIGINT) AS "offset",
           'k' || CAST(o % 10 AS VARCHAR) AS key,
           'msg-' || CAST(p AS VARCHAR) || '-' || CAST(o AS VARCHAR) AS value,
           CAST(1700000000000000 + o * 1000000 + p AS BIGINT) AS ts_us
    FROM range(0, 4) t(p), range(0, 250) u(o)
    WHERE o >= 200
    """,
)
def q_source_kafka_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan of the custom `kafka_sim` Python DataSource
    (sources/kafka_sim.py — the reference's KafkaInputFormat re-expressed
    as a Spark 4 DataSource: one task per topic-partition, offset-range
    predicates absorbed by pushFilters). Payloads are deterministic
    functions of (partition, offset), so DuckDB regenerates the identical
    log from `range()` — a full value-level oracle for a custom source.
    The offset predicate here is served from pushdown, not a post-scan
    filter (asserted in tests/test_sources.py)."""
    from kafka_hadoop_consumer_spark.sources import kafka_sim
    from pyspark.sql import functions as F

    kafka_sim.register(spark)
    return (
        spark.read.format("kafka_sim")
        .option("n_partitions", "4")
        .option("n_messages", "250")
        .load()
        .where(F.col("offset") >= 200)
    )
