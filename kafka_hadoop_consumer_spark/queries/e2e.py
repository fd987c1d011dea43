"""End-to-end TPC-H-shaped composite queries (SURVEY.md §5.2: "TPC-H-derived
queries (Q1, Q3, Q5 shapes ...) are the e2e corpus").

Q1 and Q5 shapes are q_agg_groupby / q_join_multiway; these add the Q3
and Q18 shapes — multi-operator pipelines exercising join + agg + having +
top-k in one plan, the way real report queries compose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.catalog import load_table
from kafka_hadoop_consumer_spark.queries.registry import persist_tracked, query


@query(
    "q_e2e_q3",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q_e2e_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: shipping-priority report — segment-filtered 3-way
    join → grouped revenue → top-10. Exercises broadcast dim filter,
    fact-fact shuffle join, partial agg, and TakeOrderedAndProject in one
    plan."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q_e2e_q18",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           round(o.o_totalprice, 2) AS o_totalprice,
           round(t.sum_qty, 2) AS sum_qty
    FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 100) t
    JOIN orders o   ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q_e2e_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume customers — grouped HAVING subquery
    feeding a join, then global top-k. The HAVING pre-aggregation shrinks
    the fact side before any join touches it (the aggregate-pushdown
    shape to prefer at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty_raw"))
        .where(F.col("sum_qty_raw") > 100)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty_raw", 2).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@query(
    "q_e2e_q7",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
        OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q_e2e_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: volume shipping between two nations by year —
    lineitem ⋈ supplier ⋈ orders ⋈ customer with TWO independent nation
    dims and a cross-pair predicate.

    Scale shape: both nation filters are applied INSIDE the dim joins
    (supplier and customer each shrink to two nations before any fact
    joins them, and both broadcast), so the only shuffle is the
    lineitem⋈orders orderkey join; the (n1,n2) direction predicate runs
    on the already-joined name pair."""
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_9", "NATION_10")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .where(
            ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_10"))
            | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_9"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q_agg_bitwise",
    oracle="""
    SELECT o_orderstatus,
           bit_and(o_orderkey) AS key_and,
           bit_or(o_orderkey)  AS key_or,
           bit_xor(o_orderkey) AS key_xor
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (bit_and/or/xor) — exact integer ops, no rounding."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bit_and("o_orderkey").alias("key_and"),
        F.bit_or("o_orderkey").alias("key_or"),
        F.bit_xor("o_orderkey").alias("key_xor"),
    )


@query(
    "q_fn_encoding",
    oracle="""
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256,
           to_base64(substring(text, 1, 12)::BLOB) AS b64,
           hex(doc_id) AS key_hex,
           CAST(length(text) AS BIGINT) AS n
    FROM documents
    """,
)
def q_fn_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/encoding family: md5, sha256, base64, hex — content
    addressing + fingerprint primitives for corpus pipelines."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2(F.col("text").cast("binary"), 256).alias("h_sha256"),
        F.base64(F.encode(F.substring("text", 1, 12), "UTF-8")).alias("b64"),
        F.hex(F.col("doc_id")).alias("key_hex"),
        F.length("text").cast("long").alias("n"),
    )


@query(
    "q_e2e_q10",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           round(c.c_acctbal, 2) AS c_acctbal,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_e2e_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue report — date-windowed
    orders ⋈ return-filtered lineitem ⋈ customer ⋈ broadcast nation,
    grouped per customer, global top-20. The return-flag filter is
    pushed into the lineitem scan; nation broadcasts; the customer join
    rides the custkey shuffle."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q_e2e_q4",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def q_e2e_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking — date-windowed orders
    semi-joined to their late lineitems (shipped >60 days after order),
    counted per priority. The EXISTS plans as a LeftSemi hash join (one
    probe per order, no fact duplication) followed by a tiny agg; the
    date filter is pushed into the orders scan.

    (Fixture lineitem carries no commit/receipt dates, so "late" is
    ship-lag > 60 days — same join/agg shape as spec Q4.)"""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(o.o_orderdate, 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q_e2e_q14",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-03-01'
    """,
)
def q_e2e_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share — date-windowed lineitem
    ⋈ broadcast part, one conditional-aggregate ratio. The part side
    projects only (p_partkey, p_type) before broadcasting; both sums
    ride a single hash-agg pass (rounded: cross-engine sum order)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-03-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


Q19_PRED = (
    # (brand, max p_size, quantity lo, quantity hi) — adapted to the fixture's
    # columns (no p_container/l_shipmode in the testdata schema)
    ("Brand#12", 15, 1.0, 11.0),
    ("Brand#23", 25, 10.0, 20.0),
    ("Brand#15", 35, 20.0, 30.0),
)


@query(
    "q_e2e_q19",
    oracle="""
    SELECT p.p_brand,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    GROUP BY p.p_brand
    """,
)
def q_e2e_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: discounted revenue under an OR-of-ANDs predicate
    that references BOTH join sides (brand/size from part, quantity from
    lineitem).

    Scale shape — the classic hand-optimization, done declaratively:
    each side is prefiltered with the *implied* per-side disjunction
    (part: brand∈{...} with its size cap; lineitem: the quantity-range
    union) so both predicates push into the parquet scans; the filtered
    part (a few % of the dim) broadcasts; the full cross-side
    disjunction then runs as a residual on the joined rows. Catalyst
    cannot derive the per-side implications from the cross-side OR on
    its own, so stating them explicitly is what keeps the lineitem scan
    pruned at 100 TB."""
    part_pred = None
    li_pred = None
    for brand, size_hi, q_lo, q_hi in Q19_PRED:
        pp = (F.col("p_brand") == brand) & F.col("p_size").between(1, size_hi)
        lp = F.col("l_quantity").between(q_lo, q_hi)
        part_pred = pp if part_pred is None else (part_pred | pp)
        li_pred = lp if li_pred is None else (li_pred | lp)
    p = load_table(spark, sf_dir, "part").where(part_pred).select(
        "p_partkey", "p_brand", "p_size"
    )
    li = load_table(spark, sf_dir, "lineitem").where(li_pred)
    residual = None
    for brand, size_hi, q_lo, q_hi in Q19_PRED:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        residual = c if residual is None else (residual | c)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(residual)
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_e2e_q11",
    oracle="""
    WITH v AS (
      SELECT p.p_brand, sum(l.l_extendedprice * (1 - l.l_discount)) AS val
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand),
    w AS (SELECT p_brand, val, sum(val) OVER () AS total FROM v)
    SELECT p_brand,
           round(val, 2) AS value,
           round(100 * val / total, 4) AS pct
    FROM w
    WHERE val > 0.02 * total
    """,
)
def q_e2e_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group value vs a global-total threshold
    (brands holding > 2% of total revenue, with their share).

    Scale shape: Q11's scalar subquery is the global total of the
    ALREADY-AGGREGATED |brands| frame (25 rows at any scale) — computed
    as a broadcast 1-row crossJoin rather than an empty-frame window, so
    no SinglePartition node (plan-asserted globally); the fact table is
    read once (the brand aggregate is persisted across the two plan
    branches). The unrounded threshold compare is safe at a 2%-vs-4%
    margin; displayed values are rounded (cross-engine sum order,
    SURVEY.md §7 R2)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    v = persist_tracked(
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val")
        )
    )
    total_1row = v.agg(F.sum("val").alias("total"))
    return (
        v.crossJoin(F.broadcast(total_1row))
        .where(F.col("val") > 0.02 * F.col("total"))
        .select(
            "p_brand",
            F.round("val", 2).alias("value"),
            F.round(100 * F.col("val") / F.col("total"), 4).alias("pct"),
        )
    )


@query(
    "q_e2e_funnel",
    oracle="""
    WITH v AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
               FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
          FROM events e JOIN v ON v.user_id = e.user_id
          WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t1
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
          FROM events e JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t2
          GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_click,
           (SELECT count(*) FROM p) AS n_purchase
    """,
)
def q_e2e_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who viewed, then clicked AFTER the
    first view, then purchased AFTER that first qualifying click — the
    product-analytics sequence query (strictly ordered stages, not mere
    per-type existence).

    Scale shape: each stage is a per-user min() — map-side-combinable hash
    aggs whose outputs are one row per user — and every stage join is an
    equi-join on user_id riding the same hash partitioning, so the funnel
    is a chain of small keyed frames, never a self-join of raw events;
    min-timestamps compare exactly (no floats)."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase")))
    )


@query(
    "q_e2e_q22",
    oracle="""
    WITH t AS (SELECT avg(c_acctbal) AS thresh FROM customer
               WHERE c_acctbal > 0)
    SELECT c.c_mktsegment,
           count(*) AS n_custs,
           round(sum(c.c_acctbal), 2) AS total_bal
    FROM customer c CROSS JOIN t
    WHERE c.c_acctbal > t.thresh
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    GROUP BY c.c_mktsegment
    """,
)
def q_e2e_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: high-balance customers with no BIG-TICKET order
    (>$300k) — the lost-opportunity report: scalar-subquery threshold +
    anti join + group. (The fixture gives every customer some order, so
    the literal Q22 "no orders at all" set is empty; the big-ticket
    variant keeps the identical plan shape with a non-trivial result.)

    Scale shape: the threshold is a 1-row aggregate broadcast into the
    filter; the NOT EXISTS is a LEFT ANTI hash join on custkey (orders
    pre-projected to its join key); both plan-assertable, no correlated
    per-row probing. The unrounded avg-threshold compare is safe: the
    avg differs from any 2dp account balance by orders of magnitude more
    than cross-engine ulp drift."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 300000)
        .select("o_custkey")
    )
    thresh = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("thresh")
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("thresh"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@query(
    "q_e2e_dataset_card",
    oracle="""
    SELECT coalesce(lang, 'ALL') AS lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)
                AS BIGINT) AS p50_chars,
           round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
           round(CAST(sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 4) AS pct_short
    FROM documents
    GROUP BY ROLLUP(lang)
    """,
)
def q_e2e_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card corpus profile: the per-language + overall summary a
    training-data release ships (doc counts, source diversity, size
    quantiles, token means, short-doc rate) — one ROLLUP pass over the
    corpus, composing the text-family measures into the release report.

    Scale shape: one hash aggregate with grouping sets (lang, ALL) — the
    rollup re-aggregates map-side partials, not the raw corpus, and the
    exact median rides the same single shuffle. count(DISTINCT source) is
    exact via Spark's expand-distinct rewrite (|langs| x |sources| keys —
    tiny); avg token count is a row-local split/size, no tokenize
    re-shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.rollup("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
            F.sum("n_chars").alias("total_chars"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)")
            .cast("long")
            .alias("p50_chars"),
            F.round(F.avg(F.size(F.split("text", " "))), 4).alias("avg_tokens"),
            F.round(
                F.sum(F.when(F.col("n_chars") < 200, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("pct_short"),
        )
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            "n_docs",
            "n_sources",
            "total_chars",
            "p50_chars",
            "avg_tokens",
            "pct_short",
        )
    )


@query(
    "q_e2e_ab_test",
    oracle="""
    WITH users AS (
      SELECT user_id,
             CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                  THEN 'A' ELSE 'B' END AS variant,
             CASE WHEN CAST(sum(CASE WHEN event_type = 'purchase'
                                     THEN 1 ELSE 0 END) AS DOUBLE)
                       / count(*) > 0.2
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id),
    agg AS (
      SELECT CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b,
             CAST(sum(CASE WHEN variant = 'A' THEN converted ELSE 0 END)
                  AS BIGINT) AS conv_a,
             CAST(sum(CASE WHEN variant = 'B' THEN converted ELSE 0 END)
                  AS BIGINT) AS conv_b
      FROM users)
    SELECT n_a, n_b, conv_a, conv_b,
           round(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
           round(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
           round(CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b
                 THEN (CAST(conv_a AS DOUBLE) / n_a
                       - CAST(conv_b AS DOUBLE) / n_b)
                 / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)) END, 4) AS z_score
    FROM agg
    """,
)
def q_e2e_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users hash-split into variants (the same
    content-stable assignment as q_sample_split — a user's arm never
    changes), per-arm conversion rates, and the two-proportion
    z-statistic under the pooled null — the experimentation staple every
    product analytics stack runs. Conversion is scale-free (a user's
    purchase SHARE of events > 0.2) so the metric stays non-degenerate
    at every fixture SF (a had-any-purchase flag saturates to 100% here,
    making the pooled s.e. zero — also guarded: z is NULL on degenerate
    margins, identically on both engines). The split is a same-population
    A/A control, so |z| should be small — and both engines must agree on
    it exactly (all inputs are exact integer counts; the z arithmetic is
    the identical expression tree over them).

    Scale shape: one hash agg to the per-user grain (map-side
    combinable), then a global 1-row conditional aggregate — no joins,
    no windows, nothing keyed finer than user_id."""
    e = load_table(spark, sf_dir, "events")
    users = (
        e.groupBy("user_id")
        .agg(
            F.when(
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1))
                > 0.2,
                1,
            )
            .otherwise(0)
            .alias("converted")
        )
        .withColumn(
            "variant",
            F.when(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
                "A",
            ).otherwise("B"),
        )
    )
    agg = users.agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("variant") == "A", F.col("converted")).otherwise(0))
        .alias("conv_a"),
        F.sum(F.when(F.col("variant") == "B", F.col("converted")).otherwise(0))
        .alias("conv_b"),
    )
    ra = F.col("conv_a").cast("double") / F.col("n_a")
    rb = F.col("conv_b").cast("double") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pooled
        * (1 - pooled)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return agg.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(ra, 6).alias("rate_a"),
        F.round(rb, 6).alias("rate_b"),
        F.round(
            F.when(
                (F.col("conv_a") + F.col("conv_b") > 0)
                & (F.col("conv_a") + F.col("conv_b") < F.col("n_a") + F.col("n_b")),
                (ra - rb) / se,
            ),
            4,
        ).alias("z_score"),
    )


@query(
    "q_e2e_kpi_daily",
    oracle="""
    WITH day AS (
      SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d')
                 AS day,
             user_id, event_type, value
      FROM events),
    kpi AS (
      SELECT day,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT user_id) AS BIGINT) AS active_users,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_purchases,
             round(sum(CASE WHEN event_type = 'purchase' THEN value
                            ELSE 0 END), 2) AS purchase_value,
             CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
                                      THEN user_id END) AS BIGINT)
                 AS purchasing_users,
             round(CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                        AS DOUBLE) / count(*), 6) AS error_rate
      FROM day GROUP BY day),
    firsts AS (
      SELECT strftime(date_trunc('day', min(CAST(ts AS TIMESTAMP))),
                      '%Y-%m-%d') AS day,
             user_id
      FROM events GROUP BY user_id),
    new_u AS (
      SELECT day, CAST(count(*) AS BIGINT) AS new_users
      FROM firsts GROUP BY day)
    SELECT k.day, k.n_events, k.active_users, k.n_purchases,
           k.purchase_value, k.purchasing_users, k.error_rate,
           coalesce(n.new_users, 0) AS new_users,
           round(CAST(k.purchasing_users AS DOUBLE) / k.active_users, 6)
               AS conversion
    FROM kpi k LEFT JOIN new_u n ON n.day = k.day
    """,
)
def q_e2e_kpi_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily KPI dashboard in ONE events pass: event volume, exact active
    users, purchase count/value, purchasing users, error rate, new users
    (first-ever-seen that day), and conversion — the many-metrics-one-scan
    pattern every BI rollup job needs (running one job per metric re-reads
    the fact table N times).

    Scale shape: the main agg carries all per-day metrics in a single
    groupBy (conditional sums are map-side combinable; the two exact
    count-distincts expand to one grouping-set pass). New-user attribution
    needs per-user first-seen, an unavoidable second shuffle keyed by
    user_id — but its output is |users| rows aggregated again to |days|,
    and the final join is |days| x |days| (broadcast-sized both sides).
    At 100 TB you'd swap exact distinct for HLL partials
    (q_agg_sketch_merge) — kept exact here for the oracle contract."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    is_p = F.col("event_type") == "purchase"
    kpi = (
        e.select(day, "user_id", "event_type", "value")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("active_users"),
            F.sum(F.when(is_p, 1).otherwise(0)).alias("n_purchases"),
            F.round(F.sum(F.when(is_p, F.col("value")).otherwise(0.0)), 2).alias(
                "purchase_value"
            ),
            F.count_distinct(F.when(is_p, F.col("user_id"))).alias(
                "purchasing_users"
            ),
            F.round(
                F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("error_rate"),
        )
    )
    new_u = (
        e.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select(
            F.date_format(F.date_trunc("day", "first_ts"), "yyyy-MM-dd").alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    return (
        kpi.join(F.broadcast(new_u), "day", "left")
        .select(
            "day",
            "n_events",
            "active_users",
            "n_purchases",
            "purchase_value",
            "purchasing_users",
            "error_rate",
            F.coalesce("new_users", F.lit(0)).alias("new_users"),
            F.round(
                F.col("purchasing_users").cast("double") / F.col("active_users"), 6
            ).alias("conversion"),
        )
    )


ROLLUP_CUTOVER = "2024-01-22"


@query(
    "q_e2e_incremental_rollup",
    oracle="""
    SELECT event_type,
           strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d')
               AS day,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total
    FROM events
    GROUP BY 1, 2
    """,
)
def q_e2e_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-rollup maintenance, batch form: the
    daily (type, day) rollup is REFRESHED by aggregating only the new
    partition (days ≥ cutover) and merging it with the previously
    materialized base rollup via a full-outer coalescing merge of
    mergeable aggregates (counts and sums add; a mean would be carried
    as sum+count) — the maintenance algebra behind every incremental
    ETL and the batch analogue of the streaming continuous-aggregate
    test. The oracle is the FULL recompute, proving base⊕delta ≡
    recompute — the property that makes skipping the historical scan
    safe.

    Scale shape: in production the base side is a tiny materialized
    table read back from storage, so each refresh scans ONLY the delta
    partition; here the base agg simulates that materialization. Both
    aggs are one map-side-combinable shuffle each; the merge join runs
    on |types|×|days| rows. A same-day late arrival lands in the delta
    agg and merges onto the existing day row — idempotent re-runs
    require the replaced-partition discipline of the streaming test."""
    e = load_table(spark, sf_dir, "events")
    cut = F.lit(ROLLUP_CUTOVER).cast("timestamp_ntz")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")

    def rollup(df: DataFrame) -> DataFrame:
        return df.select("event_type", day, "value").groupBy(
            "event_type", "day"
        ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))

    base = rollup(e.where(F.col("ts") < cut)).select(
        F.col("event_type").alias("bt"), F.col("day").alias("bd"),
        F.col("n").alias("bn"), F.col("total").alias("btot"),
    )
    delta = rollup(e.where(F.col("ts") >= cut)).select(
        F.col("event_type").alias("dt"), F.col("day").alias("dd"),
        F.col("n").alias("dn"), F.col("total").alias("dtot"),
    )
    return (
        base.join(
            delta,
            (F.col("bt") == F.col("dt")) & (F.col("bd") == F.col("dd")),
            "full",
        )
        .select(
            F.coalesce("bt", "dt").alias("event_type"),
            F.coalesce("bd", "dd").alias("day"),
            (F.coalesce("bn", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
            F.round(
                F.coalesce("btot", F.lit(0.0)) + F.coalesce("dtot", F.lit(0.0)), 2
            ).alias("total"),
        )
    )


SHARD_DOCS = 50  # docs per shard within a language


@query(
    "q_e2e_shard_manifest",
    oracle=f"""
    WITH gated AS (
      SELECT doc_id, lang, text,
             len(string_split(text, ' ')) AS n_tokens,
             md5(text) AS doc_md5
      FROM documents
      WHERE len(string_split(text, ' ')) BETWEEN 20 AND 500),
    sharded AS (
      SELECT lang, doc_id, n_tokens, doc_md5,
             CAST((row_number() OVER (PARTITION BY lang ORDER BY doc_md5,
                                      doc_id) - 1)
                  // {SHARD_DOCS} AS BIGINT) AS shard_id
      FROM gated)
    SELECT lang, shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id,
           md5(string_agg(doc_md5, '' ORDER BY doc_md5, doc_id))
               AS content_hash
    FROM sharded
    GROUP BY lang, shard_id
    """,
)
def q_e2e_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset shard manifest — the artifact an LLM data pipeline
    actually SHIPS: after the quality gate, surviving docs are assigned
    to fixed-size shards per language in content-hash order
    (deterministic and stable under re-runs — no arrival-order
    dependence), and each shard row carries its doc count, token total,
    id range, and a CONTENT HASH (md5 over the ordered per-doc md5s) so
    any consumer can verify shard integrity and any re-build can prove
    bit-identity without comparing payloads — data lineage as a
    first-class query output.

    Scale shape: gating is narrow; shard assignment is one per-lang
    window (hash-ordered row_number — the WindowGroupLimit family);
    the manifest agg collapses to |langs|×|shards| rows, and the shard
    hash chains the ALREADY-ordered per-doc md5s via a sorted bounded
    collect per shard (SHARD_DOCS elements max). Every output is either
    an integer or an md5 string — nothing to round."""
    d = load_table(spark, sf_dir, "documents")
    gated = d.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5("text").alias("doc_md5"),
    ).where(F.col("n_tokens").between(20, 500))
    w = Window.partitionBy("lang").orderBy("doc_md5", "doc_id")
    sharded = gated.withColumn(
        "shard_id",
        ((F.row_number().over(w) - 1) / SHARD_DOCS).cast("long"),
    )
    ordered_md5s = F.transform(
        F.array_sort(
            F.collect_list(F.struct("doc_md5", "doc_id")).over(
                Window.partitionBy("lang", "shard_id")
            )
        ),
        lambda s: s["doc_md5"],
    )
    return (
        sharded.withColumn("all_md5", ordered_md5s)
        .groupBy("lang", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.md5(F.array_join(F.any_value("all_md5"), "")).alias("content_hash"),
        )
    )
