"""Remaining TPC-H query shapes (Q2/Q5/Q6/Q8/Q9/Q12/Q13/Q15/Q16/Q17/Q20/Q21).

Together with q_agg_groupby (Q1), q_e2e_q3/q4/q7/q10/q11/q14/q18/q19/q22 and
q_join_multiway (Q5 star without supplier), this completes a runnable shape
for all 22 TPC-H queries (SURVEY.md §5.2: the e2e corpus is TPC-H-derived).

Fixture adaptations (documented per query): the testdata schema has no
partsupp table, no l_commitdate/l_receiptdate, no l_shipmode and no
p_container/comment columns, so
- Q2/Q16/Q20 derive the part↔supplier relation from lineitem facts;
- Q4/Q12/Q21 define "late" as l_shipdate > o_orderdate + 60 days (the
  ship-lag convention q_e2e_q4 established);
- Q9's supply cost is proxied as 0.6 * p_retailprice (cost fraction of
  list price) — same join/expression shape as spec Q9;
- Q12 groups by l_linestatus instead of the absent l_shipmode.

Cross-engine determinism (SURVEY.md §7 R2): double AGGREGATES are rounded
identically on both sides; min/max of raw doubles are selections (bit-exact,
compared unrounded); l_quantity is whole-valued 1..50 so its sums/avgs are
IEEE-exact in any association order and threshold compares stay unrounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.catalog import load_table
from kafka_hadoop_consumer_spark.queries.registry import query


@query(
    "q_e2e_q2",
    oracle="""
    WITH cost AS (
      SELECT l.l_partkey, l.l_suppkey, min(l.l_extendedprice) AS supply_cost
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type = 'LARGE' AND p.p_size < 20
      GROUP BY l.l_partkey, l.l_suppkey),
    best AS (
      SELECT *, min(supply_cost) OVER (PARTITION BY l_partkey) AS best_cost
      FROM cost)
    SELECT b.l_partkey AS p_partkey, s.s_name,
           round(s.s_acctbal, 2) AS s_acctbal,
           n.n_name, b.supply_cost
    FROM best b
    JOIN supplier s ON s.s_suppkey = b.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE b.supply_cost = b.best_cost AND r.r_name = 'EUROPE'
    """,
)
def q_e2e_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier per part — per-group min +
    equality-with-min filter + dim chain (supplier⋈nation⋈region).

    Adaptation: no partsupp table, so the part↔supplier offer price is
    min(l_extendedprice) observed in lineitem per (part, supplier).

    Scale shape: the per-(part,supplier) agg shrinks the fact table
    before the window; the min-per-part window rides the SAME hash
    partitioning as the groupBy (partkey prefix), so no extra shuffle;
    supplier/nation/region broadcast. min() is a selection of an input
    double — the equality filter is bit-exact cross-engine, no rounding."""
    p = (
        load_table(spark, sf_dir, "part")
        .where((F.col("p_type") == "LARGE") & (F.col("p_size") < 20))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    cost = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("supply_cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("best_cost", F.min("supply_cost").over(w)).where(
        F.col("supply_cost") == F.col("best_cost")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    dim = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    return best.join(F.broadcast(dim), best.l_suppkey == dim.s_suppkey).select(
        F.col("l_partkey").alias("p_partkey"),
        "s_name",
        F.round("s_acctbal", 2).alias("s_acctbal"),
        "n_name",
        "supply_cost",
    )


@query(
    "q_e2e_q5",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q_e2e_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (full): local-supplier volume — the Q5 signature is the
    CLOSING condition c_nationkey = s_nationkey (customer and supplier
    in the same nation), which q_join_multiway's star omits.

    Scale shape: nation⋈region prune suppliers to one region before
    broadcast; the closing equality is evaluated as part of the
    supplier broadcast-join condition (no extra shuffle beyond the one
    fact-fact orderkey edge + the custkey edge)."""
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    sn = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(sn),
            (li.l_suppkey == sn.s_suppkey) & (c.c_nationkey == sn.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q_e2e_q6",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)
def q_e2e_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecasting-revenue change — pure scan-filter-aggregate.
    All three predicates push into the parquet scan (year range, discount
    band, quantity cap); the plan is a single whole-stage-codegen pass
    with a map-side partial sum, the cheapest possible shape at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q_e2e_q8",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           round(sum(CASE WHEN sn.n_name = 'NATION_5'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS mkt_share
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = cn.n_regionkey AND r.r_name = 'AMERICA'
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def q_e2e_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — the share of one
    supplier-nation in a region's consumption of one part type, per year.
    Exercises TWO independent nation dims (supplier side vs customer
    side) feeding a conditional-ratio aggregate.

    Scale shape: part (type-filtered) and both supplier/customer dim
    chains broadcast (the customer side is region-filtered to ~1/5 of
    the dim and hinted — same documented degrade-to-SMJ story as
    q_join_multiway if customers outgrow executors), so the ONLY
    shuffle is the lineitem⋈orders orderkey edge. Ratio of two
    association-order-dependent sums → rounded 6dp on both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    n = load_table(spark, sf_dir, "nation")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q_e2e_q9",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)
                     - 0.6 * p.p_retailprice * l.l_quantity), 2) AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    """,
)
def q_e2e_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit by nation and year.

    Adaptation: no partsupp.ps_supplycost in the fixture — cost is
    proxied as 0.6 * p_retailprice (constant cost fraction), keeping the
    spec's profit expression shape (revenue minus quantity-scaled cost
    drawn from a joined dim).

    Scale shape: the name-filtered part broadcasts and prunes lineitem
    FIRST (most selective edge); supplier⋈nation broadcasts; the only
    shuffle is lineitem⋈orders on orderkey, then the (nation, year)
    hash-agg with map-side partials."""
    # NOTE (r13): deliberately NOT fan_out-repartitioned. The 2dp-rounded
    # money sums (magnitude ~1e9) hash-match the oracle only because both
    # engines accumulate in file order with a single partial per group;
    # a repartition reassociates the FP sum beyond the 0.005 rounding
    # margin (measured: strict hash mismatch at sf0.01).
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    n = load_table(spark, sf_dir, "nation")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
    )


@query(
    "q_e2e_q12",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q_e2e_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: shipping-priority vs lateness — late lineitems
    (ship-lag > 60 days, the q_e2e_q4 convention; fixture has no
    l_commitdate/l_receiptdate) bucketed by l_linestatus (fixture has no
    l_shipmode), counting high- vs low-priority orders conditionally.

    Scale shape: the shipdate year-range pushes into the scan; the join
    is the one orderkey shuffle; the cross-table lag predicate runs as a
    post-join residual; the final agg is a 2-group hash-agg."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q_e2e_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                            AND o.o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
)
def q_e2e_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — LEFT OUTER
    join with a filter INSIDE the join condition (customers with zero
    qualifying orders must survive with count 0), then a second-level
    aggregation over the per-customer counts.

    Scale shape: both aggregations are hash-aggs with map-side partials;
    the custkey join and the per-customer groupBy share one hash
    partitioning (no second shuffle until the tiny c_count agg)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey)
            & (o.o_orderpriority != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q_e2e_q15",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q_e2e_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: top supplier — quarterly revenue per supplier,
    then the supplier(s) equal to the global max (the spec's view +
    scalar-subquery pattern).

    Determinism: revenue is rounded to 2dp BEFORE the max/equality on
    both sides, so the compare is over identical decimals (raw sums
    differ in the last ulp cross-engine).

    Scale shape: one suppkey hash-agg; the max is a 1-row aggregate
    broadcast back (no global sort); supplier dim broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q_e2e_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type <> 'MEDIUM'
      AND p.p_size IN (1, 7, 14, 23, 36, 45, 19, 3)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_e2e_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: parts/supplier relationship count — distinct
    suppliers per (brand, type, size) under negated predicates, with an
    excluded-supplier NOT IN subquery.

    Adaptations: the part↔supplier relation is distinct (partkey,
    suppkey) pairs from lineitem (no partsupp); "complaint" suppliers
    are those with negative account balance (no comment column).

    Scale shape: the pair-distinct is one hash shuffle on the composite
    key; the exclusion list is a tiny broadcast anti-join (never a
    per-row subquery); part broadcasts; count(DISTINCT) rides the
    grouping shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 7, 14, 23, 36, 45, 19, 3)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_e2e_q17",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, avg(l_quantity) AS avg_qty
          FROM lineitem GROUP BY l_partkey) a
      ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND l.l_quantity < 0.2 * a.avg_qty
    """,
)
def q_e2e_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity-order revenue — lineitems below
    20% of their part's average quantity (the correlated-scalar-average
    pattern, decorrelated into a per-part aggregate + join).

    Determinism: l_quantity is whole-valued, so per-part sums are exact
    in fp regardless of association order; avg = exact_sum/count is one
    IEEE division → bit-identical threshold both engines, unrounded.

    Scale shape: the per-part avg is a hash-agg over the SAME partkey
    hash partitioning the main join uses (one shuffle reused); brand
    filter broadcasts into both branches' scans."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    avg_qty = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_qty, "l_partkey")
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q_e2e_q20",
    oracle="""
    SELECT s.s_name, round(s.s_acctbal, 2) AS s_acctbal, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_3', 'NATION_8')
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%bolt%'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING sum(l.l_quantity) > 45)
    """,
)
def q_e2e_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers with excess stock of a part family —
    a nested semi-join chain: (grouped HAVING over year-filtered
    lineitem for name-matched parts) → IN → supplier, narrowed by
    nation.

    Adaptation: availability is "shipped > 45 units of one bolt part in
    1997" (no partsupp.ps_availqty; 45 keeps the result non-empty at
    both sf0.01 and sf0.1); threshold compares an exact integer-valued
    sum, no rounding needed.

    Scale shape: part (name-filtered) broadcasts; the HAVING agg
    shrinks the fact side to (suppkey, partkey) groups before the
    semi-join; supplier⋈nation broadcasts; the semi-join is a LeftSemi
    hash join on suppkey."""
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%bolt%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 45)
        .select("l_suppkey")
    )
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_8")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"), "n_name")
    )


@query(
    "q_e2e_q21",
    oracle="""
    WITH st AS (
      SELECT l.l_orderkey,
             count(DISTINCT l.l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                                 THEN l.l_suppkey END) AS n_late,
             min(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                      THEN l.l_suppkey END) AS late_supp
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY l.l_orderkey)
    SELECT s.s_name, count(*) AS numwait
    FROM st JOIN supplier s ON s.s_suppkey = st.late_supp
    WHERE st.n_supp > 1 AND st.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q_e2e_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who kept orders waiting — the sole
    late supplier in a multi-supplier finished order (spec Q21's
    EXISTS other-supplier + NOT EXISTS other-late-supplier pair).

    Adaptation: "late" is ship-lag > 60 days (q_e2e_q4 convention).

    Scale shape: instead of two correlated self-joins of the fact table
    (the naive spec translation — three lineitem shuffles), the
    per-order supplier/late-supplier profile is ONE hash-agg over the
    orderkey join; the sole-late condition becomes a scalar filter
    (n_supp > 1 AND n_late = 1) and the offender is recovered with
    min(late supplier) — deterministic because the set has exactly one
    element. One fact shuffle total; supplier dim broadcasts."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    st = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
            F.min(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
        .where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        st.join(F.broadcast(s), st.late_supp == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )
