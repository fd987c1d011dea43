"""Data-quality operators: expectation audits and statistical anomaly
detection — the checks a production warehouse/training-data pipeline runs
on every load (null gates, referential integrity, domain rules, duplicate
keys, outlier flags).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.catalog import load_table
from kafka_hadoop_consumer_spark.queries.registry import query


@query(
    "q_quality_expectations",
    oracle="""
    WITH li AS (
      SELECT CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS orphans,
             CAST(sum(CASE WHEN l.l_discount < 0 OR l.l_discount > 0.5
                           THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount
      FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey),
    od AS (
      SELECT CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS orphans,
             CAST(sum(CASE WHEN o.o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS bad_total
      FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey),
    doc AS (
      SELECT CAST(sum(CASE WHEN text IS NULL OR length(text) = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS null_text,
             CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS dup_ids
      FROM documents)
    SELECT 'lineitem_orphan_orderkey' AS check_name, orphans AS n_violations FROM li
    UNION ALL SELECT 'lineitem_discount_range', bad_discount FROM li
    UNION ALL SELECT 'orders_orphan_custkey', orphans FROM od
    UNION ALL SELECT 'orders_nonpositive_total', bad_total FROM od
    UNION ALL SELECT 'documents_null_text', null_text FROM doc
    UNION ALL SELECT 'documents_dup_doc_id', dup_ids FROM doc
    """,
)
def q_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite audit report: one row per data-quality check
    with its violation count — referential integrity (orphaned foreign
    keys), domain rules (discount band, positive totals), null gates,
    and key uniqueness.

    Scale shape: one audit PASS per table, not one job per check — each
    fact table is scanned once through a LEFT join against its parent
    dim, and every per-row rule on that table rides the same pass as a
    conditional sum (map-side combinable); the duplicate-key check is a
    count-minus-distinct in the documents pass. The final report is a
    union of three 1-to-2-row aggregates — constant-size, no matter the
    input scale. All counts are exact integers (no rounding needed)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_discount")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    li_pass = (
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left")
        .agg(
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
                "orphans"
            ),
            F.sum(
                F.when(
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5), 1
                ).otherwise(0)
            ).alias("bad_discount"),
        )
    )
    od_pass = (
        o.select("o_custkey", "o_totalprice")
        .join(c, o.o_custkey == c.c_custkey, "left")
        .agg(
            F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).alias(
                "orphans"
            ),
            F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
                "bad_total"
            ),
        )
    )
    doc_pass = d.agg(
        F.sum(
            F.when(F.col("text").isNull() | (F.length("text") == 0), 1).otherwise(0)
        ).alias("null_text"),
        (F.count(F.lit(1)) - F.count_distinct("doc_id")).alias("dup_ids"),
    )

    def row(src: DataFrame, name: str, col: str) -> DataFrame:
        return src.select(
            F.lit(name).alias("check_name"), F.col(col).alias("n_violations")
        )

    return (
        row(li_pass, "lineitem_orphan_orderkey", "orphans")
        .unionAll(row(li_pass, "lineitem_discount_range", "bad_discount"))
        .unionAll(row(od_pass, "orders_orphan_custkey", "orphans"))
        .unionAll(row(od_pass, "orders_nonpositive_total", "bad_total"))
        .unionAll(row(doc_pass, "documents_null_text", "null_text"))
        .unionAll(row(doc_pass, "documents_dup_doc_id", "dup_ids"))
    )


@query(
    "q_time_anomaly",
    oracle="""
    WITH s AS (
      SELECT event_type, avg(value) AS mean_v, stddev_pop(value) AS sd_v
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value,
           round((e.value - s.mean_v) / s.sd_v, 6) AS z
    FROM events e JOIN s ON s.event_type = e.event_type
    WHERE abs(round((e.value - s.mean_v) / s.sd_v, 6)) > 3
    """,
)
def q_time_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection per series: events more than 3
    population standard deviations from their event_type's mean — the
    monitoring-pipeline anomaly flag.

    Scale shape: per-series stats are a map-side-combinable hash-agg
    producing |series| rows, broadcast back over the events scan — the
    fact table never shuffles. The z threshold compares the ROUNDED
    score on both engines (mean/stddev come from association-order-
    dependent sums, so the raw z drifts in the last ulp; SURVEY.md §7
    R2 threshold rule)."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mean_v"), F.stddev_pop("value").alias("sd_v")
    )
    z = F.round((F.col("value") - F.col("mean_v")) / F.col("sd_v"), 6)
    return (
        e.join(F.broadcast(stats), "event_type")
        .withColumn("z", z)
        .where(F.abs(F.col("z")) > 3)
        .select("event_id", "event_type", "value", "z")
    )


@query(
    "q_fn_winsorize",
    oracle="""
    WITH b AS (
      SELECT event_type,
             quantile_disc(value, 0.01) AS lo,
             quantile_disc(value, 0.99) AS hi
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value,
           least(greatest(e.value, b.lo), b.hi) AS clipped,
           (e.value < b.lo OR e.value > b.hi) AS is_clipped
    FROM events e JOIN b ON b.event_type = e.event_type
    """,
)
def q_fn_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clip each series to its exact [p1, p99] band — the
    outlier treatment that caps rather than drops (value distributions
    survive, tails stop dominating sums).

    Determinism: percentile_disc picks ACTUAL data values (selections,
    bit-exact cross-engine — Spark's percentile_disc ≡ DuckDB's
    quantile_disc, verified on the fixture), and clipping is pure
    min/max comparison, so every output column is unrounded.

    Scale shape: the per-series bounds are a grouped agg producing
    |series| rows, broadcast back over the events scan — the fact table
    never shuffles (the same stats-join shape as q_time_anomaly)."""
    e = load_table(spark, sf_dir, "events")
    b = e.groupBy("event_type").agg(
        F.expr("percentile_disc(0.01) WITHIN GROUP (ORDER BY value)").alias("lo"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").alias("hi"),
    )
    return (
        e.join(F.broadcast(b), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias(
                "clipped"
            ),
            ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))).alias(
                "is_clipped"
            ),
        )
    )
