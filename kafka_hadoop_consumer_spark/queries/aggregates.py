"""Aggregation operators (SURVEY.md §2B "Aggregation").

Spark's hash aggregate does partial (map-side) + final aggregation
automatically, so at 100 TB each grouped agg is one shuffle of the partial
states, not the raw rows. Double-valued aggregates are rounded on BOTH
engine and oracle sides (association order differs → last-ulp drift,
SURVEY.md §7 R2); counts and min/max are exact and stay unrounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.catalog import load_table
from kafka_hadoop_consumer_spark.queries.registry import (
    distributed_prefix,
    persist_tracked,
    query,
)


@query(
    "q_agg_global",
    oracle="""
    SELECT count(*) AS n_rows,
           count(DISTINCT l_orderkey) AS n_orders,
           round(sum(l_quantity), 2) AS sum_qty,
           round(avg(l_extendedprice), 2) AS avg_price,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price
    FROM lineitem
    """,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregate: count / distinct / sum / avg / min / max."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@query(
    "q_agg_groupby",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 2) AS avg_qty,
           round(avg(l_extendedprice), 2) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP — TPC-H Q1 shape: hash group-by with 8 aggregates.

    Partial aggregation means the shuffle carries |groups|×|partitions|
    rows (6 groups here), independent of fact-table size — the canonical
    scale-safe aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 15
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
        .where(F.col("n_orders") >= 15)
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_cust,
           round(sum(DISTINCT o_totalprice), 2) AS sum_distinct_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) / SUM(DISTINCT) — expand-then-aggregate under the hood."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.round(F.sum_distinct(F.col("o_totalprice")), 2).alias("sum_distinct_price"),
    )


@query("q_agg_approx_distinct")  # no oracle: HLL sketches differ across engines (R4)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HyperLogLog++); scale path for distincts.

    rows-only driver check; pytest asserts the estimate is within 5% of the
    exact distinct count.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 2) AS std_price,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           round(quantile_cont(l_extendedprice, 0.5), 2) AS median_price,
           round(quantile_cont(l_extendedprice, 0.9), 2) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/corr/covar + exact percentiles."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("std_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 2).alias("median_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 2).alias("p90_price"),
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT r.r_name, n.n_name,
           count(*) AS n_cust,
           round(sum(c.c_acctbal), 2) AS sum_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup region→nation→grand-total (null-filled supergroups)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over two low-cardinality dimensions."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q_agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets + GROUPING() disambiguators (SQL entry point E2)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """)


@query(
    "q_agg_collect",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-of-values aggregate, sorted + joined to a string for determinism
    (collect_list order is nondeterministic; sort_array fixes it)."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
    )


@query("q_agg_sketch_merge")  # no oracle: DataSketches HLL ≠ DuckDB HLL (R4)
def q_agg_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL): one
    sketch per order-status, then a re-aggregated global estimate from
    the sketches ALONE — the 100 TB pattern for distinct counts:
    partial sketches combine map-side, persist as bytes, and roll up
    across days/partitions without re-reading raw data (exact
    countDistinct needs a full shuffle of the distinct keys every time).

    Deterministic (HLL registers are order-insensitive maxima), but not
    DuckDB-comparable; tests/test_oracle.py gates the estimates against
    exact counts at ±5%.
    """
    o = load_table(spark, sf_dir, "orders")
    per_group = o.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count_distinct("o_custkey").alias("exact_nd"),
    )
    return (
        per_group.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
            F.lit("ALL").alias("o_orderstatus"),
        ).select(
            "o_orderstatus",
            F.col("est").cast("long").alias("estimated_nd"),
            F.lit(None).cast("long").alias("exact_nd"),
        )
    ).unionByName(
        per_group.select(
            "o_orderstatus",
            F.hll_sketch_estimate("sk").cast("long").alias("estimated_nd"),
            F.col("exact_nd").cast("long").alias("exact_nd"),
        )
    )


@query(
    "q_agg_mode",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n
    FROM (
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY count(*) DESC, o_orderpriority) AS rn
      FROM orders GROUP BY 1, 2)
    WHERE rn = 1
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode (most frequent order priority per
    status, ties broken by value). Built as count-then-argmax rather
    than native mode() because mode tie-breaking is engine-dependent;
    the count agg combines map-side and the argmax window sees only
    |groups|×|values| rows."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_orderstatus", F.col("o_orderpriority").alias("mode_priority"), "n"
        )
    )


HIST_LO, HIST_HI, HIST_BINS = 0.0, 110_000.0, 11


@query(
    "q_agg_histogram",
    oracle=f"""
    SELECT CAST(least(greatest(floor((l_extendedprice - {HIST_LO})
                                     / (({HIST_HI} - {HIST_LO}) / {HIST_BINS})), 0),
                      {HIST_BINS - 1}) AS INT) AS bin,
           count(*) AS n,
           round(min(l_extendedprice), 2) AS lo,
           round(max(l_extendedprice), 2) AS hi
    FROM lineitem
    GROUP BY 1
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram ({HIST_BINS} bins over [{HIST_LO},
    {HIST_HI})) — the distribution-profiling staple. Bin arithmetic is
    plain floor division (engine-neutral, unlike width_bucket whose
    edge semantics differ); one map-side-combinable hash agg, and the
    fixed edges mean the same query profiles 100 TB without a prior
    min/max pass."""
    li = load_table(spark, sf_dir, "lineitem")
    width = (HIST_HI - HIST_LO) / HIST_BINS
    bin_col = F.least(
        F.greatest(F.floor((F.col("l_extendedprice") - HIST_LO) / width), F.lit(0)),
        F.lit(HIST_BINS - 1),
    ).cast("int")
    return li.groupBy(bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("l_extendedprice"), 2).alias("lo"),
        F.round(F.max("l_extendedprice"), 2).alias("hi"),
    )


@query(
    "q_agg_percentile",
    oracle="""
    SELECT event_type,
           quantile_disc(value, 0.5) AS p50_disc,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group quantiles: percentile_disc (an actual data value,
    bit-exact cross-engine, left unrounded) and interpolated
    percentile_cont at p50/p90/p99 (interpolation arithmetic can differ
    in the last ulp between engines → rounded 4dp).

    Scale note: exact percentiles require the group's values together —
    one shuffle, same as any grouped agg; Spark's Percentile buffers
    per-group counts-by-value (OpenHashMap partial state), so heavily
    duplicated metric values aggregate map-side. For truly unbounded
    groups at 100 TB the approx path is q_agg_approx_distinct's sibling
    ``percentile_approx`` (t-digest-like sketch, mergeable, bounded
    memory) — kept out of the oracle gate because sketches are
    engine-specific (SURVEY.md §7 R4)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias(
            "p50_disc"
        ),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


UNPIVOT_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@query(
    "q_agg_unpivot",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{m}' AS measure,
               count(*) AS n,
               round(sum({m}), 2) AS total,
               round(avg({m}), 4) AS avg_val,
               min({m}) AS min_val,
               max({m}) AS max_val
        FROM lineitem"""
        for m in UNPIVOT_MEASURES
    ),
)
def q_agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) + per-measure profile: wide numeric columns →
    (measure, val) long form, then one grouped agg — the
    column-statistics pass a data-quality profiler runs over every
    table.

    Scale shape: unpivot is a narrow projection (each input row emits
    |measures| rows, no shuffle), and the profile is a hash agg with
    |measures| groups — partial states are map-side-combined so the
    shuffle carries a handful of rows per partition. The oracle is the
    portable spelling: one aggregate per measure UNION ALLed."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=list(UNPIVOT_MEASURES),
        variableColumnName="measure",
        valueColumnName="val",
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("val"), 2).alias("total"),
        F.round(F.avg("val"), 4).alias("avg_val"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


@query("q_agg_approx_percentile")  # no oracle: sketch internals are
# engine-specific (SURVEY.md §7 R4); accuracy is gated vs the exact
# operator in tests/test_oracle.py
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-group quantiles via percentile_approx
    (KLL/GK-style mergeable sketch, bounded memory) — the 100 TB
    companion to q_agg_percentile's exact path: partial sketches merge
    map-side, so unbounded groups cost O(sketch) not O(group).

    accuracy=10000 → rank error ≤ 1/10000; pytest gates the result
    against the exact percentiles."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("p50"),
        F.percentile_approx("value", 0.9, 10000).alias("p90"),
        F.percentile_approx("value", 0.99, 10000).alias("p99"),
    )


@query(
    "q_agg_corr",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_p,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_s,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistical aggregates per group: correlation,
    population/sample covariance, and the OLS regression family
    (slope/intercept/R²) — the profiling pass feeding feature selection.

    All are single-pass co-moment aggregates (count/sum/sumsq/sum-xy
    partials), map-side combinable — one shuffle of constant-size state.
    skewness/kurtosis are deliberately EXCLUDED from the oracle contract:
    Spark computes population moments, DuckDB applies sample-bias
    correction, so they differ beyond rounding by definition (verified
    1e-6..3e-6 at sf0.01). Every included function is definitionally
    identical; results rounded for cross-engine sum-order drift."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covar_p"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_s"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
    )


@query(
    "q_agg_boolean",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_discount <= 0.1) AS all_small_discount,
           bool_or(l_quantity >= 45)   AS any_bulk,
           CAST(count_if(l_tax > 0.05) AS BIGINT) AS n_high_tax,
           CAST(count(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS n_finished
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregate family: every/any (bool_and/or),
    count_if, and FILTER-style conditional count — predicate rollups for
    monitoring dashboards. All exact (boolean/integer), map-side
    combinable with 1-bit/1-long partial state."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.every(F.col("l_discount") <= 0.1).alias("all_small_discount"),
        F.some(F.col("l_quantity") >= 45).alias("any_bulk"),
        F.count_if(F.col("l_tax") > 0.05).alias("n_high_tax"),
        F.count(F.when(F.col("l_linestatus") == "F", 1)).alias("n_finished"),
    )


@query(
    "q_agg_weighted",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_quantity), 2) AS w_total,
           round(sum(l_quantity * l_extendedprice) / sum(l_quantity), 4)
             AS w_mean,
           round(sum(l_quantity * l_extendedprice * l_extendedprice)
                   / sum(l_quantity)
                 - pow(sum(l_quantity * l_extendedprice) / sum(l_quantity), 2), 2)
             AS w_var
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted aggregate family: quantity-weighted mean and (frequency-
    weight, population) variance of price per return flag, from plain
    power sums — Spark has no weighted_avg/var built-in, but the moment
    sums ARE map-side-combinable partial aggregates, so the composition
    distributes exactly like sum/avg (one shuffle of 3 doubles per
    group), unlike a naive two-pass mean-then-deviation formulation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w, x = F.col("l_quantity"), F.col("l_extendedprice")
    s1 = F.sum(w)
    sx = F.sum(w * x)
    sxx = F.sum(w * x * x)
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(s1, 2).alias("w_total"),
        F.round(sx / s1, 4).alias("w_mean"),
        F.round(sxx / s1 - F.pow(sx / s1, F.lit(2)), 2).alias("w_var"),
    )


@query(
    "q_agg_bitmap_distinct",
    oracle="""
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap words: user ids map to
    (word = id DIV 64, bit = id MOD 64), bit_or folds each word per
    group, bit_count + sum totals the population — the bitmap-index
    pattern behind exact-distinct at scale.

    Why not count_distinct? That shuffles every distinct VALUE per group
    (or a hash set of them); the bitmap shuffles at most
    |id_domain|/64 constant-size longs per group — for a dense integer
    domain (user ids here) partial states are ~1000x smaller, and the
    two hash aggs are both map-side combinable (bit_or partials merge
    associatively, like HLL partials but exact). The oracle is plain
    COUNT(DISTINCT) — identical result, different shuffle economics.
    """
    e = load_table(spark, sf_dir, "events")
    words = (
        e.select(
            "event_type",
            F.expr("user_id DIV 64").alias("word"),
            F.expr("shiftleft(1L, CAST(user_id % 64 AS INT))").alias("bit"),
        )
        .groupBy("event_type", "word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    return words.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).alias("n_users")
    )


@query(
    "q_agg_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med_v
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_type, abs(e.value - m.med_v) AS adev
      FROM events e JOIN med m ON m.event_type = e.event_type)
    SELECT event_type,
           round(any_value(med_v), 4) AS median_v,
           round(quantile_cont(adev, 0.5), 4) AS mad
    FROM dev JOIN med USING (event_type)
    GROUP BY event_type
    """,
)
def q_agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust dispersion
    estimator (outlier-resistant alternative to stddev, the basis of
    robust z-scores). Two exact-percentile passes by construction: group
    medians, then medians of absolute deviations.

    Scale shape: pass 1 is a grouped percentile (one shuffle on the
    group key); its tiny result broadcasts back onto the fact table
    (explicit hint), so pass 2 re-shuffles on the SAME key — two
    shuffles total, no fact-fact join. Exact percentiles are the point
    (matching quantile_cont); swap in approx_percentile partials at
    100 TB if 1e-3 error is acceptable (q_agg_approx_percentile).
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med_v")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "med_v", F.abs(F.col("value") - F.col("med_v")).alias("adev")
    )
    return dev.groupBy("event_type").agg(
        F.round(F.first("med_v"), 4).alias("median_v"),
        F.round(F.percentile("adev", F.lit(0.5)), 4).alias("mad"),
    )


@query(
    "q_agg_gini",
    oracle="""
    WITH j AS (
      SELECT n.n_name, o.o_totalprice AS x, o.o_orderkey
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey),
    r AS (
      SELECT n_name, x,
             row_number() OVER (PARTITION BY n_name
                                ORDER BY x, o_orderkey) AS i
      FROM j)
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_orders,
           round((2.0 * sum(i * x)) / (count(*) * sum(x))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM r GROUP BY n_name
    """,
)
def q_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order value per nation — the inequality /
    concentration measure (revenue concentration, data-contribution
    skew), from the rank formulation G = 2*sum(i*x_i)/(n*sum(x)) -
    (n+1)/n over ascending-sorted values.

    Scale shape: dims broadcast onto the fact scan, then ONE shuffle on
    the group key serves both the rank window and the final aggregate
    (same partitioning). The rank's (value, orderkey) tie-break makes
    the sort — and therefore sum(i*x) on tied values — identical on
    both engines; the ratio rounds at 6dp.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", F.col("o_totalprice").alias("x"), "o_orderkey")
    )
    w = Window.partitionBy("n_name").orderBy("x", "o_orderkey")
    r = j.withColumn("i", F.row_number().over(w))
    return r.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            (2.0 * F.sum(F.col("i") * F.col("x"))) / (F.count(F.lit(1)) * F.sum("x"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


@query(
    "q_agg_moments",
    oracle="""
    WITH s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(value) AS s1, sum(value * value) AS s2,
             sum(value * value * value) AS s3,
             sum(value * value * value * value) AS s4
      FROM events GROUP BY event_type)
    SELECT event_type, n,
           round(s1 / n, 6) AS mean,
           round(sqrt(s2 / n - (s1 / n) * (s1 / n)), 6) AS stddev_p,
           round((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n)
                  * (s1 / n))
                 / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 4) AS skewness,
           round((s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                 / pow(s2 / n - (s1 / n) * (s1 / n), 2) - 3, 4) AS kurtosis
    FROM s
    """,
)
def q_agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment profile per series — skewness and excess kurtosis
    computed from RAW POWER SUMS (Σx, Σx², Σx³, Σx⁴), not the built-in
    skewness()/kurtosis() aggregates, for two deliberate reasons: the
    power sums are plain map-side-combinable SUMs (one hash agg, partials
    merge by addition — the mergeable-statistics pattern of
    q_agg_weighted), and the engines' built-ins disagree on sample-vs-
    population correction while the explicit moment arithmetic is the
    identical expression tree on both sides (rounded: accumulation order
    still differs inside each SUM).

    Central moments from power sums: m2 = S2/n − μ², m3 = S3/n − 3μS2/n
    + 2μ³, m4 = S4/n − 4μS3/n + 6μ²S2/n − 3μ⁴; g1 = m3/m2^1.5,
    excess g2 = m4/m2² − 3. Fixture values are O(1-100), so the
    power-sum cancellation stays well inside the rounding margin."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value")
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
    )
    mu = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mu * mu
    m3 = F.col("s3") / F.col("n") - 3 * mu * (F.col("s2") / F.col("n")) + 2 * mu * mu * mu
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * mu * (F.col("s3") / F.col("n"))
        + 6 * mu * mu * (F.col("s2") / F.col("n"))
        - 3 * mu * mu * mu * mu
    )
    return s.select(
        "event_type",
        "n",
        F.round(mu, 6).alias("mean"),
        F.round(F.sqrt(m2), 6).alias("stddev_p"),
        # try_divide: a single-row or constant-valued series has m2 = 0
        # exactly — ANSI '/' would abort the query; DuckDB's x/0 is
        # NULL, so NULL moments on zero variance is the parity behavior
        F.round(F.try_divide(m3, F.pow(m2, 1.5)), 4).alias("skewness"),
        F.round(F.try_divide(m4, F.pow(m2, 2)) - 3, 4).alias("kurtosis"),
    )


@query(
    "q_agg_decimal_exact",
    oracle="""
    WITH cents AS (
      SELECT l_returnflag, l_linestatus,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
             CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                  AS BIGINT) AS disc_c,
             CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c
      FROM lineitem)
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(price_c) AS DOUBLE) / 100 AS sum_price,
           CAST(sum(disc_c) AS DOUBLE) / 100 AS sum_disc_price,
           CAST(sum(qty_c) AS DOUBLE) / 100 AS sum_qty
    FROM cents
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-money aggregation: each measure is converted to INTEGER
    CENTS per row via the explicit, IEEE-deterministic expression
    ``floor(x*100 + 0.5)`` (NOT a double→decimal cast — Spark rounds
    HALF_UP while DuckDB rounds half-even, a real cross-engine trap this
    key's first draft hit), then summed as BIGINT — bit-exact,
    associative, order-independent currency arithmetic at any scale,
    divided back to currency units only at the end (exact: the BIGINT
    cent sum is well inside double's 2^53 integer range, and /100 is the
    same IEEE operation on both engines — emitted as DOUBLE because the
    engines' decimal-to-client renderings differ while the double bits
    hash identically).

    Scale shape: identical single hash agg to q_agg_groupby — integer
    partials, map-side combinable, one shuffle of |groups| rows.
    """
    li = load_table(spark, sf_dir, "lineitem")

    def cents(col):
        return F.floor(col * 100 + 0.5).cast("long")

    c = li.select(
        "l_returnflag",
        "l_linestatus",
        cents(F.col("l_extendedprice")).alias("price_c"),
        cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_c"),
        cents(F.col("l_quantity")).alias("qty_c"),
    )

    def as_dec(col_name):
        return F.sum(col_name).cast("double") / 100

    return c.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        as_dec("price_c").alias("sum_price"),
        as_dec("disc_c").alias("sum_disc_price"),
        as_dec("qty_c").alias("sum_qty"),
    )


@query(
    "q_agg_stringagg",
    oracle="""
    SELECT lang,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           string_agg(DISTINCT source, ',' ORDER BY source) AS sources_csv,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY lang
    """,
)
def q_agg_stringagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG / string_agg — the report-friendly "collapse a group's
    members into one delimited cell" aggregate. Spark has no string_agg
    builtin; the equivalent composition is
    array_join(array_sort(collect_set(...)), ',') — set semantics +
    explicit sort make the cell deterministic, which is also why the
    oracle pins ORDER BY inside DuckDB's string_agg (an unordered
    LISTAGG is nondeterministic on BOTH engines and would never hash
    stably).

    Scale shape: one hash agg; collect_set partials merge as bounded
    sets (|sources| = 20 here — LISTAGG of a high-cardinality group is
    an anti-pattern at any scale and should become q_agg_collect's
    bounded-array form or a separate detail table)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count_distinct("source").alias("n_sources"),
        F.array_join(F.array_sort(F.collect_set("source")), ",").alias(
            "sources_csv"
        ),
        F.count(F.lit(1)).alias("n_docs"),
    )


@query(
    "q_agg_skyline",
    oracle="""
    WITH ranked AS (
      SELECT p_partkey, p_retailprice, p_size,
             -- p_size DESC tie order: an equal-price LARGER part must
             -- precede (and thereby dominate) its smaller twins
             max(p_size) OVER (
               ORDER BY p_retailprice ASC, p_size DESC, p_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_size
      FROM part)
    SELECT p_partkey, p_retailprice, p_size
    FROM ranked
    WHERE best_size IS NULL OR p_size > best_size
    """,
)
def q_agg_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query: parts not DOMINATED on the
    (minimize price, maximize size) plane — no other part is both
    cheaper-or-equal and larger — the multi-criteria shortlist behind
    "best tradeoff" product/supplier selection, and a classic
    OLAP-research operator with no SQL keyword. The 2-D case collapses
    to ONE ordered window: sweep by ascending price and keep a point iff
    its size beats the running max of everything at-or-below its price.
    Price ties sweep LARGER sizes first (r9 review: with pk-only tie
    order an equal-price larger part never preceded its smaller twin,
    so the dominated twin survived), and an equal-price-equal-size twin
    later in pk order is dominated — pinned identically in both
    engines.

    Scale shape: the single-dimension ordered sweep runs as the
    distributed_prefix two-pass (range-partition by price with the
    p_partkey tie-break, carry each partition's max size forward as a
    broadcast literal — no SinglePartition sort, plan-asserted
    globally). Input |part| rows, output the (small) frontier. Values
    are pass-through columns, no rounding."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    swept = distributed_prefix(
        p,
        (F.col("p_retailprice").asc(), F.col("p_size").desc(), F.col("p_partkey")),
        "p_size",
        op="max",
        out_col="best_size",
        include_current=False,
    )
    return (
        swept
        .where(F.col("best_size").isNull() | (F.col("p_size") > F.col("best_size")))
        .select("p_partkey", "p_retailprice", "p_size")
    )


KMV_K = 256  # k-minimum-values sketch size (rel. error ~ 1/sqrt(k) ≈ 6%)


def _kmv_hash(col: str):
    """Engine-neutral multiplicative hash to [0, 1): Knuth's 2654435761
    multiplier mod 2^32, exact in int64 for the fixture id ranges. The
    constant-sensitive expression that makes the KMV sketches
    cross-engine-deterministic — single source for q_agg_kmv_distinct
    and q_agg_kmv_setops (r9 review: four hand-kept copies; the
    bm25_scores/bm25_oracle_ctes precedent); ``_kmv_hash_sql`` is the
    oracle twin."""
    return (
        ((F.col(col) * 2654435761) % 4294967296).cast("double") / 4294967296
    )


def _kmv_hash_sql(col: str) -> str:
    """DuckDB twin of ``_kmv_hash`` — splice into oracle SQL."""
    return (
        f"CAST(({col} * 2654435761) % 4294967296 AS DOUBLE)\n"
        "             / 4294967296"
    )


@query(
    "q_agg_kmv_distinct",
    oracle=f"""
    WITH vals AS (
      SELECT DISTINCT l_partkey AS v FROM lineitem),
    hashed AS (
      SELECT v, {_kmv_hash_sql("v")} AS h
      FROM vals),
    kmin AS (
      SELECT h, row_number() OVER (ORDER BY h, 1) AS rn
      FROM hashed ORDER BY h LIMIT {KMV_K}),
    est AS (
      SELECT max(h) AS hk, CAST(count(*) AS BIGINT) AS k_used FROM kmin),
    exact AS (
      SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM vals)
    SELECT e.exact_distinct, s.k_used,
           round((s.k_used - 1) / s.hk, 2) AS kmv_estimate,
           round(abs((s.k_used - 1) / s.hk - e.exact_distinct)
                 / e.exact_distinct, 4) AS rel_error
    FROM exact e, est s
    """,
)
def q_agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch, built as DataFrame
    ops with a FULLY DETERMINISTIC oracle — unlike HLL
    (q_agg_approx_distinct, rows-only because engine hash functions
    differ), KMV over an engine-neutral multiplicative hash is the same
    arithmetic on both engines, so the APPROXIMATION ITSELF is
    hash-verified: estimate D̂ = (k−1)/h₍ₖ₎ from the k-th smallest
    normalized hash (Bar-Yossef et al.'s classic estimator), emitted
    alongside the exact count and the realized relative error.

    Scale shape: the k smallest hashes come from a TakeOrdered pattern —
    per-partition k-min heaps merged on one reducer, k values total
    moving, never a global sort; KMV summaries are mergeable (union the
    sets, keep the k smallest), the same property the driver's
    q_agg_sketch_merge demonstrates for HLL partials. The exact count
    (for the error column) is the expensive two-phase distinct — in
    production you'd ship only the sketch."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = persist_tracked(li.select("l_partkey").distinct())
    hashed = vals.select(
        _kmv_hash("l_partkey").alias("h")
    )
    kmin = hashed.orderBy("h").limit(KMV_K)
    est = kmin.agg(
        F.max("h").alias("hk"), F.count(F.lit(1)).alias("k_used")
    )
    exact = vals.agg(F.count(F.lit(1)).alias("exact_distinct"))
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_distinct",
        "k_used",
        F.round((F.col("k_used") - 1) / F.col("hk"), 2).alias("kmv_estimate"),
        F.round(
            F.abs(
                (F.col("k_used") - 1) / F.col("hk") - F.col("exact_distinct")
            )
            / F.col("exact_distinct"),
            4,
        ).alias("rel_error"),
    )


@query(
    "q_agg_abc",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM lineitem GROUP BY l_partkey),
    ranked AS (
      SELECT l_partkey, rev_cents,
             sum(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey
                                  ROWS UNBOUNDED PRECEDING) AS cum_cents,
             sum(rev_cents) OVER () AS tot_cents
      FROM rev),
    classed AS (
      SELECT l_partkey, rev_cents,
             CASE WHEN cum_cents <= tot_cents * 0.8 THEN 'A'
                  WHEN cum_cents <= tot_cents * 0.95 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked)
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(rev_cents) AS BIGINT) AS class_rev_cents,
           round(CAST(sum(rev_cents) AS DOUBLE)
                 / (SELECT CAST(sum(rev_cents) AS DOUBLE) FROM rev), 6)
               AS rev_share
    FROM classed GROUP BY abc_class
    """,
)
def q_agg_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification: parts ranked by revenue, class A =
    the head covering 80% of cumulative revenue, B to 95%, C the tail —
    the inventory-management 80/20 cut that decides what gets premium
    treatment (and, in data-pipeline terms, which hot keys deserve
    dedicated handling). Revenue is summed in EXACT integer cents
    (q_agg_decimal_exact's floor trick), so the cumulative thresholds
    are integer-exact comparisons against tot·0.8 — no float running
    sums to drift across engines; boundary parts classify identically.

    Scale shape: the fact table collapses to |parts| rows first; the
    cumulative sweep over that (still-large at TPC-H scale: |parts| =
    200k·SF) aggregate runs as the distributed_prefix two-pass — range
    partition by (revenue desc, partkey), broadcast per-partition
    prefix sums — and the global total rides a broadcast 1-row
    crossJoin, so there is no SinglePartition window anywhere
    (plan-asserted globally); final rollup is 3 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = persist_tracked(
        li.groupBy("l_partkey").agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
            ).alias("rev_cents")
        )
    )
    swept = distributed_prefix(
        rev,
        (F.col("rev_cents").desc(), F.col("l_partkey")),
        "rev_cents",
        op="sum",
        out_col="cum_cents",
    )
    tot_1row = rev.agg(F.sum("rev_cents").alias("tot_cents"))
    ranked = swept.crossJoin(F.broadcast(tot_1row)).select(
        "l_partkey", "rev_cents", "cum_cents", "tot_cents"
    )
    # tot_cents is carried through to the final rev_share so the total
    # aggregates ONCE (r9 review: a second rev.agg() pass computed the
    # same sum again just to cast it double)
    classed = ranked.select(
        "rev_cents",
        "tot_cents",
        F.when(F.col("cum_cents") <= F.col("tot_cents") * 0.8, "A")
        .when(F.col("cum_cents") <= F.col("tot_cents") * 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev_cents").alias("class_rev_cents"),
            F.max("tot_cents").alias("tot_cents"),
        )
        .select(
            "abc_class",
            "n_parts",
            "class_rev_cents",
            F.round(
                F.col("class_rev_cents").cast("double")
                / F.col("tot_cents").cast("double"),
                6,
            ).alias("rev_share"),
        )
    )


@query(
    "q_agg_kmv_setops",
    oracle=f"""
    WITH m AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 1 AS in_a,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1 AS in_b
      FROM events WHERE event_type IN ('view', 'purchase')
      GROUP BY user_id),
    hashed AS (
      SELECT user_id, in_a, in_b,
             {_kmv_hash_sql("user_id")} AS h
      FROM m),
    unionk AS (
      SELECT in_a, in_b, h FROM hashed ORDER BY h, user_id LIMIT {KMV_K}),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS k_used, max(h) AS hk,
             CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT)
                 AS k_both
      FROM unionk),
    exact AS (
      SELECT CAST(count(*) AS BIGINT) AS exact_union,
             CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT)
                 AS exact_inter
      FROM m)
    SELECT e.exact_union, e.exact_inter, s.k_used,
           round((s.k_used - 1) / s.hk, 2) AS union_est,
           round(CAST(s.k_both AS DOUBLE) / s.k_used, 4) AS jaccard_est,
           round(CAST(s.k_both AS DOUBLE) / s.k_used
                 * (s.k_used - 1) / s.hk, 2) AS inter_est,
           round(abs(CAST(s.k_both AS DOUBLE) / s.k_used
                     * (s.k_used - 1) / s.hk - e.exact_inter)
                 / e.exact_inter, 4) AS inter_rel_error
    FROM exact e, s
    """,
)
def q_agg_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET OPERATIONS — the reason K-minimum-values beats HLL
    for composable analytics: from one union sketch (the K smallest
    engine-neutral hashes of viewers ∪ purchasers, membership flags
    carried along), estimate union cardinality ((k−1)/h_k), Jaccard
    (fraction of the union sketch belonging to both sets), and
    intersection (their product) — emitted next to the exact values and
    the realized intersection error, all hash-verified like
    q_agg_kmv_distinct (the approximation itself is deterministic).

    Scale shape: one hash agg to per-user membership flags, then a
    TakeOrdered k-min pass (per-partition heaps, K rows to one reducer)
    — at 100 TB each side's sketch is built independently and merged by
    keeping the K smallest of the union, the mergeability that makes
    sketch warehouses (per-day sketches → any date-range set algebra)
    work."""
    e = load_table(spark, sf_dir, "events")
    m = (
        e.where(F.col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(
            (F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)) == 1).alias("in_a"),
            (F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) == 1).alias("in_b"),
        )
    )
    m = persist_tracked(m)
    hashed = m.select(
        "user_id",
        "in_a",
        "in_b",
        _kmv_hash("user_id").alias("h"),
    )
    unionk = hashed.orderBy("h", "user_id").limit(KMV_K)
    s = unionk.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("hk"),
        F.sum(F.when(F.col("in_a") & F.col("in_b"), 1).otherwise(0)).alias("k_both"),
    )
    exact = m.agg(
        F.count(F.lit(1)).alias("exact_union"),
        F.sum(F.when(F.col("in_a") & F.col("in_b"), 1).otherwise(0)).alias(
            "exact_inter"
        ),
    )
    union_est = (F.col("k_used") - 1) / F.col("hk")
    j_est = F.col("k_both").cast("double") / F.col("k_used")
    return exact.crossJoin(F.broadcast(s)).select(
        "exact_union",
        "exact_inter",
        "k_used",
        F.round(union_est, 2).alias("union_est"),
        F.round(j_est, 4).alias("jaccard_est"),
        F.round(j_est * union_est, 2).alias("inter_est"),
        # try_divide: disjoint view/purchase user sets give
        # exact_inter = 0 — ANSI '/' would abort; DuckDB's x/0 is NULL
        F.round(
            F.try_divide(
                F.abs(j_est * union_est - F.col("exact_inter")),
                F.col("exact_inter"),
            ),
            4,
        ).alias("inter_rel_error"),
    )


ASSOC_MIN_PAIR = 10  # minimum co-occurrence count for a rule
ASSOC_TOP = 20       # rules emitted (by lift)


@query(
    "q_agg_assoc_rules",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS item
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    nb AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n FROM items),
    sup AS (SELECT item, CAST(count(*) AS BIGINT) AS s FROM items GROUP BY item),
    pairs AS (
      SELECT a.item AS i1, b.item AS i2, CAST(count(*) AS BIGINT) AS np
      FROM items a JOIN items b ON a.okey = b.okey AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING count(*) >= {ASSOC_MIN_PAIR}),
    rules AS (
      SELECT i1 AS antecedent, i2 AS consequent, np, s1.s AS n_ante, s2.s AS n_cons
      FROM pairs JOIN sup s1 ON s1.item = i1 JOIN sup s2 ON s2.item = i2
      UNION ALL
      SELECT i2, i1, np, s2.s, s1.s
      FROM pairs JOIN sup s1 ON s1.item = i1 JOIN sup s2 ON s2.item = i2),
    scored AS (
      SELECT antecedent, consequent, np AS n_pair,
             round(CAST(np AS DOUBLE) / nb.n, 6) AS support,
             round(CAST(np AS DOUBLE) / n_ante, 6) AS confidence,
             round(CAST(np AS DOUBLE) * nb.n / (CAST(n_ante AS DOUBLE) * n_cons),
                   6) AS lift
      FROM rules CROSS JOIN nb)
    SELECT * FROM scored
    ORDER BY lift DESC, antecedent, consequent
    LIMIT {ASSOC_TOP}
    """,
)
def q_agg_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining (market-basket analysis) over order
    baskets: brand co-occurrence within orders yields support,
    confidence, and lift per directed rule, with a minimum-support
    threshold and the top-{ASSOC_TOP} rules by lift — the
    recommendation / cross-sell primitive, computed exactly. Integer
    counts throughout; only the final ratios divide (rounded 6dp, full
    ordering pinned by the rule pair).

    Scale shape: baskets come from one distinct over the fact join (dim
    broadcast); pair generation is a self-equi-join on the basket key —
    fan-out bounded by basket size squared (TPC-H baskets are ~4 items;
    general carts warrant the df-cap discipline); rule scoring joins the
    |items|-row support table twice (broadcast). Top-k is
    TakeOrderedAndProject."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    items = persist_tracked(
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("item"))
        .distinct()
    )
    nb = items.agg(F.count_distinct("okey").alias("n"))
    sup = items.groupBy("item").agg(F.count(F.lit(1)).alias("s"))
    a = items.select("okey", F.col("item").alias("i1"))
    b = items.select("okey", F.col("item").alias("i2"))
    pairs = (
        a.join(b, "okey")
        .where(F.col("i1") < F.col("i2"))
        .groupBy("i1", "i2")
        .agg(F.count(F.lit(1)).alias("np"))
        .where(F.col("np") >= ASSOC_MIN_PAIR)
    )
    s1 = F.broadcast(sup.select(F.col("item").alias("i1"), F.col("s").alias("s1")))
    s2 = F.broadcast(sup.select(F.col("item").alias("i2"), F.col("s").alias("s2")))
    joined = persist_tracked(pairs.join(s1, "i1").join(s2, "i2"))
    fwd = joined.select(
        F.col("i1").alias("antecedent"),
        F.col("i2").alias("consequent"),
        "np",
        F.col("s1").alias("n_ante"),
        F.col("s2").alias("n_cons"),
    )
    rev = joined.select(
        F.col("i2").alias("antecedent"),
        F.col("i1").alias("consequent"),
        "np",
        F.col("s2").alias("n_ante"),
        F.col("s1").alias("n_cons"),
    )
    rules = fwd.unionByName(rev).crossJoin(F.broadcast(nb))
    return (
        rules.select(
            "antecedent",
            "consequent",
            F.col("np").alias("n_pair"),
            F.round(F.col("np").cast("double") / F.col("n"), 6).alias("support"),
            F.round(F.col("np").cast("double") / F.col("n_ante"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("np").cast("double")
                * F.col("n")
                / (F.col("n_ante").cast("double") * F.col("n_cons")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "antecedent", "consequent")
        .limit(ASSOC_TOP)
    )


@query(
    "q_agg_percentile_weighted",
    oracle="""
    WITH w AS (
      SELECT l_returnflag AS g, l_extendedprice AS v, l_quantity AS wt
      FROM lineitem),
    tot AS (SELECT g, sum(wt) AS tw FROM w GROUP BY g),
    cum AS (
      SELECT g, v, wt,
             sum(wt) OVER (PARTITION BY g ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cw
      FROM w)
    SELECT c.g,
           CAST(t.tw AS BIGINT) AS total_weight,
           min(CASE WHEN c.cw >= 0.5 * t.tw THEN c.v END) AS wp50,
           min(CASE WHEN c.cw >= 0.9 * t.tw THEN c.v END) AS wp90,
           min(CASE WHEN c.cw >= 0.99 * t.tw THEN c.v END) AS wp99
    FROM cum c JOIN tot t ON t.g = c.g
    GROUP BY c.g, t.tw
    """,
)
def q_agg_percentile_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED exact percentiles — the quantile every importance-weighted
    corpus (token-weighted doc stats, quantity-weighted price bands)
    actually needs and percentile_disc can't express: the smallest value
    whose cumulative weight reaches q·Σw, per group, for p50/p90/p99.
    Weights here are integral (quantities), so cumulative sums are exact
    in doubles and the threshold crossings are bit-deterministic; ties on
    the value column cannot change the selected value (all tied rows
    share it).

    Scale shape: one running-weight window per group (the scalable-rank
    discipline — partitioned, no global sort) and a group rollup sharing
    its partitioning; the tiny totals table joins broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    w = li.select(
        F.col("l_returnflag").alias("g"),
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").alias("wt"),
    )
    tot = w.groupBy("g").agg(F.sum("wt").alias("tw"))
    win = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = w.withColumn("cw", F.sum("wt").over(win))
    return (
        cum.join(F.broadcast(tot), "g")
        .groupBy("g", "tw")
        .agg(
            F.min(F.when(F.col("cw") >= 0.5 * F.col("tw"), F.col("v"))).alias("wp50"),
            F.min(F.when(F.col("cw") >= 0.9 * F.col("tw"), F.col("v"))).alias("wp90"),
            F.min(F.when(F.col("cw") >= 0.99 * F.col("tw"), F.col("v"))).alias("wp99"),
        )
        .select(
            "g",
            F.col("tw").cast("long").alias("total_weight"),
            "wp50",
            "wp90",
            "wp99",
        )
    )


# Portable HyperLogLog (r6): q_agg_approx_distinct is rows-only by design
# (Spark's HLL internals are opaque), but the SKETCH ALGORITHM itself is
# deterministic given a portable hash — so this twin builds HLL from md5
# and puts an approximate-distinct estimate under the driver's hash gate.
# Exactness discipline: registers are exact integers (length-of-binary,
# no floats), every 2^-R term is 1.0 / (1 << R) — an exact power of two —
# and with R capped at HLL_RHO_CAP every partial sum of <= m such terms
# spans < 53 mantissa bits, so the register sum is EXACT and
# order-independent; the only remaining float op is one division by the
# shared alpha*m^2 literal. No bias/linear-counting correction: the raw
# estimator is the portable contract (choose n >> m, as here).
HLL_P = 8                        # 2^8 = 256 registers
HLL_M = 1 << HLL_P
HLL_RHO_CAP = 40                 # keeps sum-of-2^-R exact in a double
HLL_ALPHA_M2 = repr((0.7213 / (1 + 1.079 / HLL_M)) * HLL_M * HLL_M)
HLL_W_BITS = 60 - HLL_P          # 60-bit md5 int: top 8 index, low 52 rho


@query(
    "q_agg_hll_manual",
    oracle=f"""
    WITH h AS (
      SELECT event_type,
             CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15))
                  AS UBIGINT) AS hv
      FROM events),
    rho AS (
      SELECT event_type,
             CAST(hv >> {HLL_W_BITS} AS INTEGER) AS idx,
             least({HLL_W_BITS + 1} - length(bin(CAST(
                 hv & ((CAST(1 AS UBIGINT) << {HLL_W_BITS}) - 1)
               AS BIGINT))), {HLL_RHO_CAP}) AS m
      FROM h),
    regs AS (
      SELECT event_type, idx, max(m) AS r
      FROM rho GROUP BY event_type, idx),
    s AS (
      SELECT event_type,
             sum(1.0 / CAST(CAST(1 AS BIGINT) << r AS DOUBLE))
               + ({HLL_M} - count(*)) AS ssum,
             CAST(count(*) AS BIGINT) AS n_regs
      FROM regs GROUP BY event_type),
    exact AS (
      SELECT event_type, CAST(count(DISTINCT event_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type)
    SELECT e.event_type, e.n_exact, s.n_regs,
           round({HLL_ALPHA_M2} / s.ssum, 4) AS hll_estimate,
           round(abs({HLL_ALPHA_M2} / s.ssum - e.n_exact) / e.n_exact, 4)
               AS rel_error
    FROM exact e JOIN s ON s.event_type = e.event_type
    """,
)
def q_agg_hll_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate COUNT DISTINCT via a hand-built, engine-portable
    HyperLogLog ({HLL_M} registers over a 60-bit md5 hash), reported next
    to the exact count and its relative error — the sketch q_agg_
    approx_distinct can only evidence rows-only, here fully hash-checked
    because every step (register index, leading-zero rank via
    length-of-binary, max-per-register, exact power-of-two sum) is
    integer-deterministic on both engines; see the module comment for
    why the register sum is EXACT. ~1.04/sqrt(m) ≈ 6.5% expected error
    at the fixture's per-type cardinalities (n >> m, raw-estimator
    regime).

    Scale shape: the whole sketch is one map-side-combinable
    max-aggregation into (type x {HLL_M}) registers — constant state per
    group at ANY corpus size, the same mergeability contract real HLL
    sinks rely on (q_agg_sketch_merge covers Spark's native binary
    merge path)."""
    e = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = h.bitwiseAND(F.lit((1 << HLL_W_BITS) - 1))
    rho = F.least(
        F.lit(HLL_W_BITS + 1) - F.length(F.bin(w)), F.lit(HLL_RHO_CAP)
    )
    regs = (
        e.select(
            "event_type",
            F.shiftright(h, HLL_W_BITS).cast("int").alias("idx"),
            rho.alias("m"),
        )
        .groupBy("event_type", "idx")
        .agg(F.max("m").alias("r"))
    )
    s = regs.groupBy("event_type").agg(
        (
            F.sum(F.lit(1.0) / F.expr("cast(shiftleft(1L, r) as double)"))
            + (F.lit(HLL_M) - F.count(F.lit(1)))
        ).alias("ssum"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("event_id").alias("n_exact")
    )
    est = F.lit(float(HLL_ALPHA_M2)) / F.col("ssum")
    return exact.join(s, "event_type").select(
        "event_type",
        "n_exact",
        "n_regs",
        F.round(est, 4).alias("hll_estimate"),
        F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 4).alias(
            "rel_error"
        ),
    )
