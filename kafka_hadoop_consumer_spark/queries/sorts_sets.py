"""Sort / limit / top-k and set operations (SURVEY.md §2B).

The driver's value hash is order-insensitive, so sort semantics are made
verifiable by pairing every ORDER BY with a LIMIT: the *selected set* then
proves the ordering (including null placement), with a unique key as final
tie-break (SURVEY.md §7 R5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.catalog import load_table
from kafka_hadoop_consumer_spark.queries.registry import query


@query(
    "q_sort_multi",
    oracle="""
    SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_n, o_totalprice
    FROM orders
    ORDER BY status_n ASC NULLS FIRST, o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort, mixed asc/desc with NULLS FIRST, unique tie-break."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_n"),
            "o_totalprice",
        )
        .orderBy(
            F.col("status_n").asc_nulls_first(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        )
        .limit(100)
    )


@query(
    "q_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT k → TakeOrderedAndProject: per-partition top-k then
    merge at the driver; no global sort ever materializes (scale-safe)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q_set_union_all",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000.0
    """,
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics — overlapping rows appear twice)."""
    c = load_table(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_acctbal")
    b = c.where(F.col("c_acctbal") > 5000.0).select("c_custkey", "c_acctbal")
    return a.unionByName(b)


@query(
    "q_set_union_distinct",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000.0
    """,
)
def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics: union-all then distinct)."""
    c = load_table(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_acctbal")
    b = c.where(F.col("c_acctbal") > 5000.0).select("c_custkey", "c_acctbal")
    return a.unionByName(b).distinct()


@query(
    "q_set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set): customers with both a finished and an open order."""
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


@query(
    "q_set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference preserves multiplicity)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.exceptAll(b)


@query(
    "q_set_union_byname",
    oracle="""
    SELECT event_id, user_id, value, event_type
    FROM (
      SELECT event_id, user_id, value
      FROM events WHERE event_id % 2 = 0
      UNION ALL BY NAME
      SELECT event_id, user_id, event_type
      FROM events WHERE event_id % 2 = 1
    )
    """,
)
def q_set_union_byname(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two feeds of the same stream with drifted
    schemas (an old feed lacking event_type, a new feed lacking value)
    merged positionally-unsafe but NAME-safe — unionByName with
    allowMissingColumns null-fills the gaps, exactly DuckDB's
    UNION ALL BY NAME. The everyday operator for reading a dataset
    whose schema widened mid-history.

    Scale shape: a union is plan-level concatenation — zero shuffle,
    zero compute; each side's projection pushes into its own scan."""
    e = load_table(spark, sf_dir, "events")
    old_feed = e.where(F.col("event_id") % 2 == 0).select(
        "event_id", "user_id", "value"
    )
    new_feed = e.where(F.col("event_id") % 2 == 1).select(
        "event_id", "user_id", "event_type"
    )
    return old_feed.unionByName(new_feed, allowMissingColumns=True)


@query(
    "q_set_symmetric_diff",
    oracle="""
    WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders
               WHERE year(o_orderdate) <= 1994),
    b AS (SELECT DISTINCT o_custkey AS k FROM orders
          WHERE year(o_orderdate) >= 1997)
    SELECT coalesce(a.k, b.k) AS o_custkey,
           CASE WHEN b.k IS NULL THEN 'early_only' ELSE 'late_only' END AS side
    FROM a FULL JOIN b ON a.k = b.k
    WHERE a.k IS NULL OR b.k IS NULL
    """,
)
def q_set_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference of two keyed sets (customers active only in
    the early vs only in the late period) — churn/new-cohort analysis as
    a set operation.

    Computed as ONE full-outer join with null-side filtering instead of
    the literal (A UNION B) EXCEPT (A INTERSECT B), which costs three
    distinct-shuffles plus two set-op shuffles over the same keys; here
    both deduped sides co-shuffle once on the key and AQE can still
    broadcast the smaller side. The side label comes free from the null
    pattern.
    """
    o = load_table(spark, sf_dir, "orders")
    yr = F.year(F.col("o_orderdate").cast("date"))
    a = o.where(yr <= 1994).select(F.col("o_custkey").alias("ka")).distinct()
    b = o.where(yr >= 1997).select(F.col("o_custkey").alias("kb")).distinct()
    return (
        a.join(b, a.ka == b.kb, "full")
        .where(F.col("ka").isNull() | F.col("kb").isNull())
        .select(
            F.coalesce("ka", "kb").alias("o_custkey"),
            F.when(F.col("kb").isNull(), "early_only")
            .otherwise("late_only")
            .alias("side"),
        )
    )
