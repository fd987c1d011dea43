"""Data-quality operators: expectation audits and statistical anomaly
detection — the checks a production warehouse/training-data pipeline runs
on every load (null gates, referential integrity, domain rules, duplicate
keys, outlier flags).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.catalog import load_table
from kafka_hadoop_consumer_spark.queries.registry import (
    fan_out,
    persist_tracked,
    query,
)


def hash_split_arm(id_col: str):
    """Deterministic 50/50 arm assignment: 'a' iff the first hex digit of
    md5(id) is < '8', else 'b' — the engine-portable split every
    two-arm stats key uses (md5 and lowercase-hex substring compare
    identically on Spark and DuckDB). Single source for q_stats_ks,
    q_stats_ttest, q_stats_mannwhitney, q_quality_psi,
    q_stats_delta_ratio, q_stats_did, and q_stats_cuped (r9 review:
    seven hand-kept copies could silently fork one key's arms from the
    rest of the suite); ``hash_split_sql`` is the oracle-side twin."""
    return F.when(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 1) < "8", "a"
    ).otherwise("b")


def hash_split_sql(id_col: str) -> str:
    """DuckDB twin of ``hash_split_arm`` — splice into oracle SQL."""
    return (
        f"CASE WHEN substring(md5(CAST({id_col} AS VARCHAR)), 1, 1) < '8' "
        "THEN 'a' ELSE 'b' END"
    )


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


@query(
    "q_stats_ks",
    oracle=f"""
    WITH split AS (
      SELECT event_type, value,
             {hash_split_sql("event_id")} AS grp
      FROM events),
    binned AS (
      SELECT event_type, CAST(floor(value * 10) AS BIGINT) AS bin,
             CAST(sum(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM split GROUP BY event_type, bin),
    cum AS (
      SELECT event_type, bin,
             sum(ca) OVER (PARTITION BY event_type ORDER BY bin
                           ROWS UNBOUNDED PRECEDING) AS cum_a,
             sum(cb) OVER (PARTITION BY event_type ORDER BY bin
                           ROWS UNBOUNDED PRECEDING) AS cum_b,
             sum(ca) OVER (PARTITION BY event_type) AS tot_a,
             sum(cb) OVER (PARTITION BY event_type) AS tot_b
      FROM binned)
    SELECT event_type,
           CAST(any_value(tot_a) AS BIGINT) AS n_a,
           CAST(any_value(tot_b) AS BIGINT) AS n_b,
           round(max(abs(CAST(cum_a AS DOUBLE) / tot_a
                         - CAST(cum_b AS DOUBLE) / tot_b)), 6) AS ks_stat
    FROM cum GROUP BY event_type
    """,
)
def q_stats_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic per event_type between
    two deterministic hash-split halves of the corpus — the
    distribution-drift gate a training pipeline runs between snapshots or
    train/serve populations (here the split is a same-distribution control:
    small KS values are the expected answer, and both engines must agree
    on them exactly).

    Scale shape: the ECDFs are BINNED (fixed decimal bins, no prior
    min/max pass — same engine-neutral trick as q_agg_histogram), so the
    plan is one hash agg over (type, bin) followed by windows over the
    bin-level aggregate, partitioned by event_type — cardinality
    |types| x |bins|, independent of row count, and never a global sort.
    A raw-value KS would need a per-type total order over all rows; the
    binned form is how you run this at 100 TB (bin width = measurement
    resolution).
    """
    e = load_table(spark, sf_dir, "events")
    grp = hash_split_arm("event_id")
    binned = (
        e.select(
            "event_type",
            F.floor(F.col("value") * 10).cast("long").alias("bin"),
            grp.alias("grp"),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.when(F.col("grp") == "a", 1)).alias("ca"),
            F.count(F.when(F.col("grp") == "b", 1)).alias("cb"),
        )
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("event_type")
    cum = binned.select(
        "event_type",
        F.sum("ca").over(w_cum).alias("cum_a"),
        F.sum("cb").over(w_cum).alias("cum_b"),
        F.sum("ca").over(w_tot).alias("tot_a"),
        F.sum("cb").over(w_tot).alias("tot_b"),
    )
    return cum.groupBy("event_type").agg(
        F.any_value("tot_a").alias("n_a"),
        F.any_value("tot_b").alias("n_b"),
        F.round(
            F.max(
                F.abs(
                    F.col("cum_a").cast("double") / F.col("tot_a")
                    - F.col("cum_b").cast("double") / F.col("tot_b")
                )
            ),
            6,
        ).alias("ks_stat"),
    )


@query(
    "q_stats_chisq",
    oracle="""
    WITH base AS (
      SELECT event_type,
             (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 3) % 7 AS dow
      FROM events),
    obs AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS o
            FROM base GROUP BY event_type, dow),
    rowt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt FROM obs
             GROUP BY event_type),
    colt AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct FROM obs GROUP BY dow),
    grand AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
    grid AS (
      SELECT r.event_type, c.dow, r.rt, c.ct, g.n, coalesce(o.o, 0) AS o,
             CAST(r.rt AS DOUBLE) * c.ct / g.n AS e
      FROM rowt r CROSS JOIN colt c CROSS JOIN grand g
      LEFT JOIN obs o ON o.event_type = r.event_type AND o.dow = c.dow)
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST((count(DISTINCT event_type) - 1)
                * (count(DISTINCT dow) - 1) AS BIGINT) AS dof,
           round(sum((o - e) * (o - e) / e), 6) AS chi2
    FROM grid
    """,
)
def q_stats_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test: is event_type distributed uniformly
    across weekdays? (The categorical-drift / feature-label-dependence
    check.) Weekday is computed engine-neutrally from the epoch-day index
    ((day + 3) mod 7 -> Monday=0), never via locale-dependent date parts.

    Scale shape: one hash agg over the raw rows per margin (row, column,
    grand — all re-aggregated from the 35-row obs table, so the fact is
    scanned ONCE), then the EXPECTED grid is a
    cross join of the two margin AGGREGATES (|types| x |dow| = 35 rows —
    the broadcast-tiny-side pattern, whitelisted in the cartesian sweep);
    observed cells left-join onto the dense grid so zero-observed cells
    still contribute (o-e)^2/e. No shuffle touches row-level data twice.
    """
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        F.expr("(unix_micros(cast(ts as timestamp)) DIV 86400000000 + 3) % 7").alias(
            "dow"
        ),
    )
    # one fact-scan: margins re-aggregate the tiny obs table, never base
    obs = persist_tracked(
        base.groupBy("event_type", "dow").agg(F.count(F.lit(1)).alias("o"))
    )
    rowt = obs.groupBy("event_type").agg(F.sum("o").alias("rt"))
    colt = obs.groupBy("dow").agg(F.sum("o").alias("ct"))
    grand = obs.agg(F.sum("o").alias("n"))
    grid = (
        rowt.crossJoin(F.broadcast(colt))
        .crossJoin(F.broadcast(grand))
        .join(F.broadcast(obs), ["event_type", "dow"], "left")
        .select(
            "event_type",
            "dow",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
            (F.col("rt").cast("double") * F.col("ct") / F.col("n")).alias("e"),
        )
    )
    return grid.agg(
        F.count(F.lit(1)).alias("n_cells"),
        (
            (F.count_distinct(F.col("event_type")) - 1)
            * (F.count_distinct(F.col("dow")) - 1)
        ).alias("dof"),
        F.round(
            F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")),
            6,
        ).alias("chi2"),
    )


# Benford first-digit probabilities log10(1 + 1/d), d=1..9, precomputed
# once in Python and spliced as IDENTICAL literals into both engines —
# no cross-engine libm-log risk.
_BENFORD_P = (
    "0.3010299956639812", "0.17609125905568124", "0.12493873660829992",
    "0.09691001300805642", "0.07918124604762482", "0.06694678963061322",
    "0.05799194697768673", "0.05115252244738129", "0.04575749056067514",
)


def _benford_oracle() -> str:
    probs = " ".join(
        f"WHEN {d} THEN {p}" for d, p in enumerate(_BENFORD_P, start=1)
    )
    return f"""
    WITH digits AS (
      SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1),
    counts AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
               FROM digits GROUP BY digit),
    agg AS (SELECT c.digit, c.n_obs, t.n_total
            FROM counts c CROSS JOIN
                 (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM counts) t)
    SELECT digit, n_obs,
           round(CAST(n_obs AS DOUBLE) / n_total, 6) AS pct_obs,
           round(CASE digit {probs} END, 6) AS pct_benford,
           round(CAST(n_obs AS DOUBLE) / n_total
                 - CASE digit {probs} END, 6) + 0.0 AS deviation
    FROM agg
    """


@query("q_quality_benford", oracle=_benford_oracle())
def q_quality_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the synthetic-
    data / fraud / fat-finger screen: naturally-occurring amounts follow
    log10(1+1/d); a generator or manual entry shows up as systematic
    deviation per digit. First digit is taken from the INTEGER part via
    string head (both engines stringify integers identically — never via
    log10, whose libm rounding could differ at a power of ten).

    Scale shape: one hash agg to 9 digit rows; the total for the
    percentage re-aggregates those 9 rows into a broadcast 1-row cross
    join (the tfidf scalar-broadcast pattern — no global window), and
    the expected distribution is a literal CASE — no second scan."""
    o = load_table(spark, sf_dir, "orders")
    digits = o.where(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    counts = persist_tracked(
        digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    )
    total = counts.agg(F.sum("n_obs").alias("n_total"))
    benford = F.element_at(
        F.array(*[F.lit(float(p)) for p in _BENFORD_P]), F.col("digit")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs").cast("double") / F.col("n_total"), 6).alias(
                "pct_obs"
            ),
            F.round(benford, 6).alias("pct_benford"),
            # + 0.0: -0.0 canonicalization on a rounded difference (the
            # q_stats_cuped precedent — DuckDB round keeps the sign of a
            # tiny-negative zero, Spark's BigDecimal round does not)
            (
                F.round(
                    F.col("n_obs").cast("double") / F.col("n_total") - benford,
                    6,
                )
                + F.lit(0.0)
            ).alias("deviation"),
        )
    )


@query(
    "q_stats_ttest",
    oracle=f"""
    WITH arms AS (
      SELECT event_type,
             {hash_split_sql("event_id")} AS arm,
             value
      FROM events),
    s AS (
      SELECT event_type, arm, CAST(count(*) AS BIGINT) AS n,
             sum(value) AS s1, sum(value * value) AS s2
      FROM arms GROUP BY event_type, arm),
    m AS (
      SELECT event_type, arm, n, s1 / n AS mean,
             (s2 - s1 * s1 / n) / (n - 1) AS var
      FROM s),
    w AS (
      SELECT a.event_type, a.n AS n_a, b.n AS n_b,
             a.mean AS mean_a, b.mean AS mean_b,
             a.var / a.n AS va_n, b.var / b.n AS vb_n
      FROM m a JOIN m b ON a.event_type = b.event_type
      WHERE a.arm = 'a' AND b.arm = 'b')
    SELECT event_type, n_a, n_b,
           round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
           round((mean_a - mean_b) / sqrt(va_n + vb_n), 4) + 0.0 AS t_stat,
           round((va_n + vb_n) * (va_n + vb_n)
                 / (va_n * va_n / (n_a - 1) + vb_n * vb_n / (n_b - 1)),
                 2) AS df_welch
    FROM w
    """,
)
def q_stats_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-test per event_type between deterministic
    hash-split arms: per-arm mean/variance from RAW POWER SUMS (n, Σx,
    Σx²), t statistic, and Welch–Satterthwaite degrees of freedom — the
    experiment-readout primitive for unequal-variance A/B comparisons
    (complements q_e2e_ab_test's proportion z-test with a continuous
    metric).

    Scale shape: one map-side-combinable hash agg over (type, arm) carries
    constant-size partials (3 power sums); everything downstream operates
    on the |types|x2 aggregate. Variance is derived from the SAME power-sum
    expression tree on both engines (built-in var_samp accumulation orders
    differ — q_agg_moments precedent), then rounded.
    """
    e = load_table(spark, sf_dir, "events")
    arm = hash_split_arm("event_id")
    s = (
        e.select("event_type", arm.alias("arm"), "value")
        .groupBy("event_type", "arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s1"),
            F.sum(F.col("value") * F.col("value")).alias("s2"),
        )
    )
    m = s.select(
        "event_type",
        "arm",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias("var"),
    )
    a = m.where(F.col("arm") == "a").select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("mean").alias("mean_a"),
        (F.col("var") / F.col("n")).alias("va_n"),
    )
    b = m.where(F.col("arm") == "b").select(
        "event_type",
        F.col("n").alias("n_b"),
        F.col("mean").alias("mean_b"),
        (F.col("var") / F.col("n")).alias("vb_n"),
    )
    j = a.join(b, "event_type")
    pooled = F.col("va_n") + F.col("vb_n")
    return j.select(
        "event_type",
        "n_a",
        "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        # + 0.0: -0.0 canonicalization (q_stats_cuped precedent)
        (
            F.round((F.col("mean_a") - F.col("mean_b")) / F.sqrt(pooled), 4)
            + F.lit(0.0)
        ).alias("t_stat"),
        F.round(
            pooled * pooled
            / (
                F.col("va_n") * F.col("va_n") / (F.col("n_a") - 1)
                + F.col("vb_n") * F.col("vb_n") / (F.col("n_b") - 1)
            ),
            2,
        ).alias("df_welch"),
    )


@query(
    "q_stats_mannwhitney",
    oracle=f"""
    WITH arms AS (
      SELECT event_type, round(value, 2) AS v,
             {hash_split_sql("event_id")} AS arm
      FROM events),
    dv AS (  -- collapse to distinct values: exact ranks from counts
      SELECT event_type, v,
             CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(count(*) AS BIGINT) AS ct
      FROM arms GROUP BY event_type, v),
    rk AS (
      SELECT event_type, v, ca, ct,
             coalesce(sum(ct) OVER (PARTITION BY event_type ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS below
      FROM dv),
    agg AS (
      SELECT event_type,
             sum(ca * (below + (ct + 1) / 2.0)) AS r_a,
             CAST(sum(ca) AS BIGINT) AS n_a,
             CAST(sum(ct - ca) AS BIGINT) AS n_b,
             CAST(sum(ct) AS BIGINT) AS n,
             sum(CAST(ct AS DOUBLE) * ct * ct - ct) AS tie_term
      FROM rk GROUP BY event_type)
    SELECT event_type, n_a, n_b,
           round(r_a - n_a * (n_a + 1) / 2.0, 2) AS u_stat,
           round((r_a - n_a * (n_a + 1) / 2.0 - n_a * n_b / 2.0)
                 / sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0
                        * ((n + 1) - tie_term / (CAST(n AS DOUBLE) * (n - 1)))),
                 4) + 0.0 AS z_stat
    FROM agg
    """,
)
def q_stats_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) test per event_type between the same
    hash-split arms — the non-parametric counterpart of q_stats_ttest,
    with exact tie-corrected average ranks and the normal-approximation
    z statistic.

    Scale shape: the naive formulation ranks every raw row (a per-type
    global sort). Instead the corpus is first collapsed to DISTINCT
    (type, value) with per-arm counts — one map-side-combinable hash agg —
    and exact average ranks are recovered in closed form from cumulative
    counts over that far smaller aggregate (avg_rank = below + (ct+1)/2).
    The window runs over |distinct values| rows per type, not |rows|;
    values are pre-rounded to 2dp so distinct-value cardinality is bounded
    by measurement resolution (same binning contract as q_stats_ks, but
    the statistic here stays exact for the rounded values on both
    engines).
    """
    e = load_table(spark, sf_dir, "events")
    arm = hash_split_arm("event_id")
    dv = (
        e.select("event_type", F.round("value", 2).alias("v"), arm.alias("arm"))
        .groupBy("event_type", "v")
        .agg(
            F.count(F.when(F.col("arm") == "a", 1)).alias("ca"),
            F.count(F.lit(1)).alias("ct"),
        )
    )
    w_below = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rk = dv.select(
        "event_type",
        "ca",
        "ct",
        F.coalesce(F.sum("ct").over(w_below), F.lit(0)).alias("below"),
    )
    agg = rk.groupBy("event_type").agg(
        F.sum(F.col("ca") * (F.col("below") + (F.col("ct") + 1) / 2.0)).alias("r_a"),
        F.sum("ca").alias("n_a"),
        F.sum(F.col("ct") - F.col("ca")).alias("n_b"),
        F.sum("ct").alias("n"),
        F.sum(
            F.col("ct").cast("double") * F.col("ct") * F.col("ct") - F.col("ct")
        ).alias("tie_term"),
    )
    u = F.col("r_a") - F.col("n_a") * (F.col("n_a") + 1) / 2.0
    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(u, 2).alias("u_stat"),
        # + 0.0: -0.0 canonicalization (q_stats_cuped precedent)
        (
            F.round(
                (u - F.col("n_a") * F.col("n_b") / 2.0)
                / F.sqrt(
                    F.col("n_a").cast("double") * F.col("n_b") / 12.0
                    * (
                        (F.col("n") + 1)
                        - F.col("tie_term")
                        / (F.col("n").cast("double") * (F.col("n") - 1))
                    )
                ),
                4,
            )
            + F.lit(0.0)
        ).alias("z_stat"),
    )


BOOT_B = 24  # bootstrap resamples
# Truncated Poisson(1) CDF as 8-hex-digit thresholds on a uniform
# md5-prefix draw (lowercase hex compares lexicographically = numerically
# on both engines); P(w > 6) ≈ 6e-5 is folded into w = 6.
_POIS_T = ("5e2d58d8", "bc5ab1b1", "eb715e1d", "fb239797", "ff1025f5",
           "ffd90f3b")
_POIS_W_SQL = (
    "CASE WHEN h < '" + _POIS_T[0] + "' THEN 0 "
    + " ".join(
        f"WHEN h < '{t}' THEN {k}" for k, t in enumerate(_POIS_T[1:], start=1)
    )
    + " ELSE 6 END"
)


@query(
    "q_stats_bootstrap",
    oracle=f"""
    WITH draws AS (
      SELECT e.event_type, e.value, r.b,
             substring(md5(CAST(e.event_id AS VARCHAR) || ':'
                           || CAST(r.b AS VARCHAR)), 1, 8) AS h
      FROM events e CROSS JOIN range(1, {BOOT_B} + 1) AS r(b)),
    wt AS (SELECT event_type, value, b, {_POIS_W_SQL} AS w FROM draws),
    means AS (
      SELECT event_type, b,
             round(sum(w * value) / sum(w), 6) AS m
      FROM wt GROUP BY event_type, b),
    ci AS (
      SELECT event_type, list_sort(list(m)) AS ms
      FROM means GROUP BY event_type),
    fullm AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             round(avg(value), 6) AS mean_full
      FROM events GROUP BY event_type)
    SELECT f.event_type, f.n, f.mean_full,
           list_element(c.ms, 2) AS ci_lo,
           list_element(c.ms, {BOOT_B} - 1) AS ci_hi
    FROM fullm f JOIN ci c ON c.event_type = f.event_type
    """,
)
def q_stats_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the per-type mean — the
    ONLY bootstrap that works at 100 TB: classic resampling needs N draws
    WITH replacement from a materialized population (a global shuffle per
    resample), while the Poisson bootstrap gives each row an independent
    Poisson(1) multiplicity per resample, so all BOOT_B resamples ride ONE
    scan as a deterministic per-(row, b) weight and aggregate map-side.
    Weights are drawn via md5(event_id:b) prefix against the truncated
    Poisson CDF (hex-string thresholds — identical draw on both engines);
    the CI is the 2nd-smallest / 2nd-largest of the 24 sorted resample
    means (a ~92% interval), selected from a bounded collected array
    (B elements per group, constant regardless of data size).

    Scale shape: B× row amplification happens INSIDE the scan projection
    (explode of a literal sequence — no join, no shuffle) and collapses
    immediately into |types|×B partial sums; everything after is
    broadcast-sized. Resample means are rounded to 6dp BEFORE the sort so
    both engines select the same element even when two means differ by an
    ulp."""
    e = load_table(spark, sf_dir, "events")
    # fan_out (guide §2.5): the B× row amplification + per-(row, b) md5
    # all happen in the scan projection, and the single-row-group
    # fixture file plans ONE scan task — measured 1.62 s → 0.72 s at
    # sf0.1 once the 24× md5 work spreads over the session's cores.
    # No-op on a real multi-split scan. Keyed on event_id (r13 advice):
    # hash partitioning makes row→partition assignment content-derived
    # and deterministic run-to-run, so the (already ≥1e4×-margin) FP
    # association of the downstream resample means cannot drift with
    # partition layout the way round-robin assignment could.
    draws = fan_out(e, "event_id").select(
        "event_type",
        "value",
        F.explode(F.sequence(F.lit(1), F.lit(BOOT_B))).alias("b"),
        "event_id",
    ).withColumn(
        "h",
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.col("event_id").cast("string"), F.col("b").cast("string")
                )
            ),
            1,
            8,
        ),
    )
    w = F.when(F.col("h") < _POIS_T[0], 0)
    for k, t in enumerate(_POIS_T[1:], start=1):
        w = w.when(F.col("h") < t, k)
    w = w.otherwise(6)
    means = (
        draws.select("event_type", "value", "b", w.alias("w"))
        .groupBy("event_type", "b")
        .agg(
            F.round(
                F.sum(F.col("w") * F.col("value")) / F.sum("w"), 6
            ).alias("m")
        )
    )
    ci = means.groupBy("event_type").agg(
        F.sort_array(F.collect_list("m")).alias("ms")
    )
    full = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("mean_full"),
    )
    return full.join(F.broadcast(ci), "event_type").select(
        "event_type",
        "n",
        "mean_full",
        F.element_at("ms", 2).alias("ci_lo"),
        F.element_at("ms", BOOT_B - 1).alias("ci_hi"),
    )


@query(
    "q_quality_psi",
    oracle=f"""
    WITH split AS (
      SELECT event_type, CAST(floor(value * 10) AS BIGINT) AS bin,
             {hash_split_sql("event_id")} AS grp
      FROM events),
    binned AS (
      SELECT event_type, bin,
             CAST(sum(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM split GROUP BY event_type, bin),
    tot AS (
      SELECT event_type, bin, ca, cb,
             sum(ca) OVER (PARTITION BY event_type) AS ta,
             sum(cb) OVER (PARTITION BY event_type) AS tb
      FROM binned)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum(CASE WHEN ca = 0 OR cb = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_excluded,
           round(sum(CASE WHEN ca > 0 AND cb > 0
                          THEN (CAST(ca AS DOUBLE) / ta
                                - CAST(cb AS DOUBLE) / tb)
                               * ln((CAST(ca AS DOUBLE) / ta)
                                    / (CAST(cb AS DOUBLE) / tb))
                          ELSE 0 END), 6) AS psi
    FROM tot GROUP BY event_type
    """,
)
def q_quality_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event_type between the
    deterministic hash-split halves — the risk-scoring industry's
    standard drift gate (PSI < 0.1 stable, > 0.25 action), complementing
    q_stats_ks: KS reports the worst single deviation, PSI integrates
    shift across ALL bins. Bins empty on either side are excluded from
    the sum (the standard convention) and COUNTED in n_excluded so the
    exclusion is visible, not silent.

    Scale shape: identical to q_stats_ks — one hash agg to (type, bin)
    cardinality, windows + final agg on the constant-size binned table;
    a same-distribution control split, so near-zero PSI is the expected
    answer on both engines (one rounding site after the sum)."""
    e = load_table(spark, sf_dir, "events")
    grp = hash_split_arm("event_id")
    binned = (
        e.select(
            "event_type",
            F.floor(F.col("value") * 10).cast("long").alias("bin"),
            grp.alias("grp"),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.when(F.col("grp") == "a", 1)).alias("ca"),
            F.count(F.when(F.col("grp") == "b", 1)).alias("cb"),
        )
    )
    w_tot = Window.partitionBy("event_type")
    tot = binned.select(
        "event_type",
        "ca",
        "cb",
        F.sum("ca").over(w_tot).alias("ta"),
        F.sum("cb").over(w_tot).alias("tb"),
    )
    pa = F.col("ca").cast("double") / F.col("ta")
    pb = F.col("cb").cast("double") / F.col("tb")
    term = F.when(
        (F.col("ca") > 0) & (F.col("cb") > 0), (pa - pb) * F.log(pa / pb)
    ).otherwise(0.0)
    return tot.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum(
            F.when((F.col("ca") == 0) | (F.col("cb") == 0), 1).otherwise(0)
        ).alias("n_excluded"),
        F.round(F.sum(term), 6).alias("psi"),
    )


@query(
    "q_ml_ols",
    oracle="""
    WITH f AS (
      SELECT event_type, value AS y,
             CAST(extract(hour FROM CAST(ts AS TIMESTAMP)) AS DOUBLE) AS x1,
             CAST((epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 3) % 7
                  AS DOUBLE) AS x2
      FROM events),
    g AS (  -- normal-equation sufficient statistics (all plain SUMs)
      SELECT event_type,
             CAST(count(*) AS DOUBLE) AS n,
             sum(x1) AS sx1, sum(x2) AS sx2, sum(y) AS sy,
             sum(x1 * x1) AS sx11, sum(x1 * x2) AS sx12,
             sum(x2 * x2) AS sx22,
             sum(x1 * y) AS sx1y, sum(x2 * y) AS sx2y,
             sum(y * y) AS syy
      FROM f GROUP BY event_type),
    solved AS (
      SELECT event_type, n, sy, syy,
             -- Cramer's rule on [[n,sx1,sx2],[sx1,sx11,sx12],[sx2,sx12,sx22]]
             n * (sx11 * sx22 - sx12 * sx12)
               - sx1 * (sx1 * sx22 - sx12 * sx2)
               + sx2 * (sx1 * sx12 - sx11 * sx2) AS det,
             sy * (sx11 * sx22 - sx12 * sx12)
               - sx1 * (sx1y * sx22 - sx12 * sx2y)
               + sx2 * (sx1y * sx12 - sx11 * sx2y) AS det_a,
             n * (sx1y * sx22 - sx12 * sx2y)
               - sy * (sx1 * sx22 - sx12 * sx2)
               + sx2 * (sx1 * sx2y - sx1y * sx2) AS det_b,
             n * (sx11 * sx2y - sx1y * sx12)
               - sx1 * (sx1 * sx2y - sx1y * sx2)
               + sy * (sx1 * sx12 - sx11 * sx2) AS det_c,
             sx1y, sx2y
      FROM g)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(det_a / det, 6) + 0.0 AS intercept,
           round(det_b / det, 6) + 0.0 AS coef_hour,
           round(det_c / det, 6) + 0.0 AS coef_dow,
           round(1 - (syy - (det_a / det) * sy - (det_b / det) * sx1y
                          - (det_c / det) * sx2y)
                     / (syy - sy * sy / n), 6) AS r2
    FROM solved
    """,
)
def q_ml_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed multiple linear regression (OLS), closed form: fit
    value ~ intercept + hour-of-day + day-of-week per event_type from
    NORMAL-EQUATION sufficient statistics — ten plain SUMs per group
    (the X'X / X'y entries), solved with Cramer's rule on the 3×3 system
    INSIDE the query, plus R² from the same sums. No solver library, no
    iteration, no second data pass: the entire fit is one
    map-side-combinable hash agg followed by constant-size arithmetic —
    the way you regress 100 TB (sufficient statistics shuffle, never
    rows), and because the solve is an expression tree, the DuckDB
    oracle reproduces it bit-for-bit-then-rounded rather than trusting
    a black-box fit.

    (q_agg_corr's regr_slope is the 1-feature special case; this is the
    multivariate generalization. For ill-conditioned X'X at many
    features you'd move to QR on mapInPandas partials — out of scope.)
    """
    e = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    f = e.select(
        "event_type",
        F.col("value").alias("y"),
        F.hour(ts).cast("double").alias("x1"),
        (
            (F.expr("unix_micros(cast(ts as timestamp)) div 86400000000") + 3) % 7
        )
        .cast("double")
        .alias("x2"),
    )
    g = f.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx11"),
        F.sum(F.col("x1") * F.col("x2")).alias("sx12"),
        F.sum(F.col("x2") * F.col("x2")).alias("sx22"),
        F.sum(F.col("x1") * F.col("y")).alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).alias("sx2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx1, sx2, sy = F.col("n"), F.col("sx1"), F.col("sx2"), F.col("sy")
    sx11, sx12, sx22 = F.col("sx11"), F.col("sx12"), F.col("sx22")
    sx1y, sx2y, syy = F.col("sx1y"), F.col("sx2y"), F.col("syy")
    det = (
        n * (sx11 * sx22 - sx12 * sx12)
        - sx1 * (sx1 * sx22 - sx12 * sx2)
        + sx2 * (sx1 * sx12 - sx11 * sx2)
    )
    det_a = (
        sy * (sx11 * sx22 - sx12 * sx12)
        - sx1 * (sx1y * sx22 - sx12 * sx2y)
        + sx2 * (sx1y * sx12 - sx11 * sx2y)
    )
    det_b = (
        n * (sx1y * sx22 - sx12 * sx2y)
        - sy * (sx1 * sx22 - sx12 * sx2)
        + sx2 * (sx1 * sx2y - sx1y * sx2)
    )
    det_c = (
        n * (sx11 * sx2y - sx1y * sx12)
        - sx1 * (sx1 * sx2y - sx1y * sx2)
        + sy * (sx1 * sx12 - sx11 * sx2)
    )
    a, b, c = det_a / det, det_b / det, det_c / det
    r2 = 1 - (syy - a * sy - b * sx1y - c * sx2y) / (syy - sy * sy / n)
    return g.select(
        "event_type",
        n.cast("long").alias("n"),
        # + 0.0: -0.0 canonicalization on the near-zero regression
        # coefficients (q_stats_cuped precedent)
        (F.round(a, 6) + F.lit(0.0)).alias("intercept"),
        (F.round(b, 6) + F.lit(0.0)).alias("coef_hour"),
        (F.round(c, 6) + F.lit(0.0)).alias("coef_dow"),
        F.round(r2, 6).alias("r2"),
    )


@query(
    "q_quality_fd",
    oracle="""
    WITH checks AS (
      SELECT 'orders: o_orderkey -> o_custkey' AS fd,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_violating_keys
      FROM (SELECT o_orderkey, count(DISTINCT o_custkey) AS n_rhs
            FROM orders GROUP BY o_orderkey)
      UNION ALL
      SELECT 'lineitem: l_orderkey -> l_returnflag',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
      FROM (SELECT l_orderkey, count(DISTINCT l_returnflag) AS n_rhs
            FROM lineitem GROUP BY l_orderkey)
      UNION ALL
      SELECT 'events: user_id -> event_type',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
      FROM (SELECT user_id, count(DISTINCT event_type) AS n_rhs
            FROM events GROUP BY user_id))
    SELECT fd, n_keys, n_violating_keys,
           (n_violating_keys = 0) AS holds
    FROM checks
    """,
)
def q_quality_fd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit — data profiling's schema-inference
    primitive: for each candidate FD ``A → B``, count the A-keys whose
    B-value is not unique. An FD that HOLDS certifies a denormalization
    is safe (or a key constraint real); one that fails (users emit many
    event types) quantifies by how much. Three candidate FDs ride the
    report: a true key dependency, a per-order flag dependency
    (plausible but false on TPC-H-ish data), and a behavioral
    non-dependency.

    Scale shape: each FD check is one hash agg on the LHS key with a
    count-distinct of the RHS (two-phase distinct expansion, map-side
    partials), collapsing to one row per check — profiling N candidate
    FDs over the same table shares its scan. Counts exact."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = load_table(spark, sf_dir, "events")

    def fd(df: DataFrame, name: str, lhs: str, rhs: str) -> DataFrame:
        g = df.groupBy(lhs).agg(F.count_distinct(rhs).alias("n_rhs"))
        return g.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0)).alias(
                "n_violating_keys"
            ),
        )

    checks = (
        fd(o, "orders: o_orderkey -> o_custkey", "o_orderkey", "o_custkey")
        .unionByName(
            fd(li, "lineitem: l_orderkey -> l_returnflag",
               "l_orderkey", "l_returnflag")
        )
        .unionByName(fd(e, "events: user_id -> event_type",
                        "user_id", "event_type"))
    )
    return checks.select(
        "fd", "n_keys", "n_violating_keys",
        (F.col("n_violating_keys") == 0).alias("holds"),
    )


@query(
    "q_quality_tukey",
    oracle="""
    WITH q AS (
      SELECT event_type,
             quantile_disc(value, 0.25) AS p25,
             quantile_disc(value, 0.75) AS p75
      FROM events GROUP BY event_type),
    fenced AS (
      SELECT e.event_type, e.value,
             q.p25 - 1.5 * (q.p75 - q.p25) AS lo,
             q.p75 + 1.5 * (q.p75 - q.p25) AS hi
      FROM events e JOIN q ON q.event_type = e.event_type)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(any_value(lo), 6) AS fence_lo,
           round(any_value(hi), 6) AS fence_hi,
           CAST(sum(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           round(CAST(sum(CASE WHEN value < lo OR value > hi
                               THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
               AS outlier_rate
    FROM fenced GROUP BY event_type
    """,
)
def q_quality_tukey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey boxplot fences per series: outliers beyond
    [p25 − 1.5·IQR, p75 + 1.5·IQR] — the distribution-free outlier gate
    (z-scores assume normality and get dragged by the outliers
    themselves; q_time_anomaly is the z-score counterpart, q_agg_mad the
    robust-scale one — this completes the robust-outlier trio with THE
    convention every boxplot draws). Quartiles are exact DISCRETE
    selections (input bit patterns — no interpolation), so the fence
    arithmetic is IEEE-identical on both engines; one rounding site per
    output.

    Scale shape: two passes — exact per-group quartiles (one shuffle),
    fences broadcast back onto the fact scan (q_agg_mad's
    median-table-broadcast pattern), conditional-sum rollup rides the
    second pass. Counts exact."""
    e = load_table(spark, sf_dir, "events")
    q = e.groupBy("event_type").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)").alias("p25"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY value)").alias("p75"),
    )
    iqr = F.col("p75") - F.col("p25")
    fences = q.select(
        F.col("event_type").alias("ft"),
        (F.col("p25") - 1.5 * iqr).alias("lo"),
        (F.col("p75") + 1.5 * iqr).alias("hi"),
    )
    fenced = e.join(
        F.broadcast(fences), F.col("event_type") == F.col("ft")
    )
    is_out = (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
    return fenced.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.any_value("lo"), 6).alias("fence_lo"),
        F.round(F.any_value("hi"), 6).alias("fence_hi"),
        F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers"),
        F.round(
            F.sum(F.when(is_out, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("outlier_rate"),
    )


@query(
    "q_stats_delta_ratio",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             {hash_split_sql("user_id")} AS arm,
             sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS y,
             CAST(count(*) AS DOUBLE) AS m
      FROM events GROUP BY user_id),
    s AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
             sum(y) AS sy, sum(m) AS sm,
             sum(y * y) AS syy, sum(m * m) AS smm, sum(y * m) AS sym
      FROM per_user GROUP BY arm),
    d AS (
      SELECT arm, n_users, sy / sm AS r,
             -- delta method: var(R) ≈ (s_y² − 2R·c_ym + R²·s_m²) / (n·m̄²)
             ((syy - sy * sy / n_users) / (n_users - 1)
              - 2 * (sy / sm) * ((sym - sy * sm / n_users) / (n_users - 1))
              + (sy / sm) * (sy / sm)
                * ((smm - sm * sm / n_users) / (n_users - 1)))
             / (n_users * (sm / n_users) * (sm / n_users)) AS var_r
      FROM s)
    SELECT a.n_users AS n_users_a, b.n_users AS n_users_b,
           round(a.r, 6) AS ratio_a, round(b.r, 6) AS ratio_b,
           round(sqrt(a.var_r), 6) AS se_a, round(sqrt(b.var_r), 6) AS se_b,
           round((a.r - b.r) / sqrt(a.var_r + b.var_r), 4) + 0.0 AS z_stat
    FROM d a JOIN d b ON a.arm = 'a' AND b.arm = 'b'
    """,
)
def q_stats_delta_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method inference for a RATIO metric — revenue per event
    (Σ purchase value / Σ events), the metric class where naive
    per-row variance is WRONG because both numerator and denominator
    are random per user: the correct experiment-readout variance is the
    delta-method expansion var(R) ≈ (σ²_y − 2R·σ_ym + R²·σ²_m)/(n·m̄²)
    over per-user aggregates, with users (not events) as the
    randomization unit — the standard large-scale A/B methodology for
    ratio metrics, completing the stats suite (proportions:
    q_e2e_ab_test; means: q_stats_ttest; ranks: q_stats_mannwhitney).

    Scale shape: one shuffle to per-user aggregates (the randomization
    unit — this agg is REQUIRED for correctness, not performance), then
    power sums per arm (constant-size mergeable partials) and closed-
    form arithmetic on the 2-row arm table; identical expression tree
    both engines, rounded once per output."""
    e = load_table(spark, sf_dir, "events")
    arm = hash_split_arm("user_id")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                0.0
            )
        ).alias("y"),
        F.count(F.lit(1)).cast("double").alias("m"),
    ).select(arm.alias("arm"), "y", "m")
    s = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("y").alias("sy"),
        F.sum("m").alias("sm"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("m") * F.col("m")).alias("smm"),
        F.sum(F.col("y") * F.col("m")).alias("sym"),
    )
    n = F.col("n_users")
    r = F.col("sy") / F.col("sm")
    var_y = (F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1)
    var_m = (F.col("smm") - F.col("sm") * F.col("sm") / n) / (n - 1)
    cov = (F.col("sym") - F.col("sy") * F.col("sm") / n) / (n - 1)
    mbar = F.col("sm") / n
    d = s.select(
        "arm",
        "n_users",
        r.alias("r"),
        ((var_y - 2 * r * cov + r * r * var_m) / (n * mbar * mbar)).alias(
            "var_r"
        ),
    )
    a = d.where(F.col("arm") == "a").select(
        F.col("n_users").alias("n_users_a"),
        F.col("r").alias("ra"),
        F.col("var_r").alias("va"),
    )
    b = d.where(F.col("arm") == "b").select(
        F.col("n_users").alias("n_users_b"),
        F.col("r").alias("rb"),
        F.col("var_r").alias("vb"),
    )
    return a.crossJoin(b).select(
        "n_users_a",
        "n_users_b",
        F.round("ra", 6).alias("ratio_a"),
        F.round("rb", 6).alias("ratio_b"),
        F.round(F.sqrt("va"), 6).alias("se_a"),
        F.round(F.sqrt("vb"), 6).alias("se_b"),
        # + 0.0: -0.0 canonicalization (q_stats_cuped precedent)
        (
            F.round(
                (F.col("ra") - F.col("rb")) / F.sqrt(F.col("va") + F.col("vb")),
                4,
            )
            + F.lit(0.0)
        ).alias("z_stat"),
    )


DID_CUTOVER = "2024-01-15"  # pre-period before, post-period from this day


@query(
    "q_stats_did",
    oracle=f"""
    WITH daily AS (
      SELECT {hash_split_sql("user_id")} AS grp,
             CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '{DID_CUTOVER}'
                  THEN 'pre' ELSE 'post' END AS period,
             date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
             CAST(count(*) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2, 3),
    cell AS (
      SELECT grp, period, CAST(count(*) AS BIGINT) AS n_days,
             sum(y) AS s1, sum(y * y) AS s2
      FROM daily GROUP BY grp, period),
    m AS (
      SELECT grp, period, n_days, s1 / n_days AS mean,
             ((s2 - s1 * s1 / n_days) / (n_days - 1)) / n_days AS var_mean
      FROM cell),
    w AS (
      SELECT max(CASE WHEN grp='a' AND period='pre' THEN mean END) AS a_pre,
             max(CASE WHEN grp='a' AND period='post' THEN mean END) AS a_post,
             max(CASE WHEN grp='b' AND period='pre' THEN mean END) AS b_pre,
             max(CASE WHEN grp='b' AND period='post' THEN mean END) AS b_post,
             sum(var_mean) AS var_did
      FROM m)
    SELECT round(a_pre, 4) AS a_pre, round(a_post, 4) AS a_post,
           round(b_pre, 4) AS b_pre, round(b_post, 4) AS b_post,
           round((a_post - a_pre) - (b_post - b_pre), 4) + 0.0 AS did_estimate,
           round(((a_post - a_pre) - (b_post - b_pre)) / sqrt(var_did), 4)
               + 0.0 AS z_stat
    FROM w
    """,
)
def q_stats_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the causal-inference readout when a
    change hits one group mid-stream — (post − pre) in the treated arm
    minus (post − pre) in the control arm cancels both group-level
    baselines and shared time trends, with a z-statistic from the four
    cells' mean-variances (daily activity as the observation unit; the
    hash split is a same-distribution control, so ≈0 is the expected
    estimate and both engines must agree on it exactly).

    Scale shape: the raw scan collapses to (grp, period, day) daily
    cells immediately; everything after — power sums per cell, the
    2×2 pivot, the closed-form estimate — runs on ≤4·|days| then 4
    rows. One rounding site per output (q_agg_moments discipline)."""
    e = load_table(spark, sf_dir, "events")
    grp = hash_split_arm("user_id")
    period = F.when(
        F.col("ts") < F.lit(DID_CUTOVER).cast("timestamp_ntz"), "pre"
    ).otherwise("post")
    daily = (
        e.select(
            grp.alias("grp"),
            period.alias("period"),
            F.date_trunc("day", "ts").alias("day"),
        )
        .groupBy("grp", "period", "day")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    cell = daily.groupBy("grp", "period").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("y").alias("s1"),
        F.sum(F.col("y") * F.col("y")).alias("s2"),
    )
    n = F.col("n_days")
    m = cell.select(
        "grp",
        "period",
        (F.col("s1") / n).alias("mean"),
        (((F.col("s2") - F.col("s1") * F.col("s1") / n) / (n - 1)) / n).alias(
            "var_mean"
        ),
    )

    def pick(g, p):
        return F.max(
            F.when((F.col("grp") == g) & (F.col("period") == p), F.col("mean"))
        )

    w = m.agg(
        pick("a", "pre").alias("a_pre"),
        pick("a", "post").alias("a_post"),
        pick("b", "pre").alias("b_pre"),
        pick("b", "post").alias("b_post"),
        F.sum("var_mean").alias("var_did"),
    )
    did = (F.col("a_post") - F.col("a_pre")) - (F.col("b_post") - F.col("b_pre"))
    return w.select(
        F.round("a_pre", 4).alias("a_pre"),
        F.round("a_post", 4).alias("a_post"),
        F.round("b_pre", 4).alias("b_pre"),
        F.round("b_post", 4).alias("b_post"),
        # + 0.0: -0.0 canonicalization — this key's docstring calls ≈0 the
        # EXPECTED estimate, so the sign-of-zero hazard is maximal here
        (F.round(did, 4) + F.lit(0.0)).alias("did_estimate"),
        (F.round(did / F.sqrt(F.col("var_did")), 4) + F.lit(0.0)).alias(
            "z_stat"
        ),
    )


CUPED_CUTOFF = "2024-01-16"  # pre-period < cutoff <= experiment period


@query(
    "q_stats_cuped",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             {hash_split_sql("user_id")} AS arm,
             coalesce(sum(CASE WHEN ts < TIMESTAMP '{CUPED_CUTOFF}'
                               THEN value END), 0) AS x,
             coalesce(sum(CASE WHEN ts >= TIMESTAMP '{CUPED_CUTOFF}'
                               THEN value END), 0) AS y
      FROM events GROUP BY user_id),
    g AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy
      FROM per_user),
    theta AS (
      SELECT round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS th,
             round(sx / n, 6) AS xbar
      FROM g),
    adj AS (
      SELECT arm, y, y - th * (x - xbar) AS y_adj
      FROM per_user CROSS JOIN theta),
    s AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
             sum(y) AS s1, sum(y * y) AS s2,
             sum(y_adj) AS a1, sum(y_adj * y_adj) AS a2
      FROM adj GROUP BY arm)
    SELECT arm, n_users,
           round(s1 / n_users, 6) AS mean_y,
           round(a1 / n_users, 6) AS mean_y_adj,
           round((s2 - s1 * s1 / n_users) / (n_users - 1), 4) AS var_y,
           round((a2 - a1 * a1 / n_users) / (n_users - 1), 4) AS var_y_adj,
           round(1.0 - (a2 - a1 * a1 / n_users) / (s2 - s1 * s1 / n_users), 4)
               + 0.0 AS var_reduction,
           (SELECT th FROM theta) AS theta
    FROM s
    """,
)
def q_stats_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al., WSDM 2013):
    each user's experiment-period metric y is adjusted by their PRE-period
    covariate x — y_adj = y − θ(x − x̄) with θ = cov(x,y)/var(x) pooled
    across arms — which strips the variance x explains without biasing the
    arm difference (θ and x̄ are arm-independent). Emits per-arm raw vs
    adjusted mean/variance plus the realized variance-reduction ratio —
    the standard sensitivity upgrade over q_stats_ttest's raw comparison.
    θ and x̄ are rounded 6dp BEFORE adjustment on both engines so the
    adjusted power sums share one expression tree.

    Scale shape: one hash agg to per-user (x, y) pairs (the randomization
    unit — same shuffle as q_stats_delta_ratio), one constant-size pooled
    power-sum row broadcast back, one per-arm power-sum agg; nothing
    downstream of the first agg exceeds |users| rows."""
    e = load_table(spark, sf_dir, "events")
    cutoff = F.lit(CUPED_CUTOFF).cast("timestamp")
    arm = hash_split_arm("user_id")
    per_user = e.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(F.col("ts") < cutoff, F.col("value"))), F.lit(0.0)).alias("x"),
        F.coalesce(F.sum(F.when(F.col("ts") >= cutoff, F.col("value"))), F.lit(0.0)).alias("y"),
    ).select(arm.alias("arm"), "x", "y")
    per_user = persist_tracked(per_user)
    g = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    theta = g.select(
        F.round(
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")),
            6,
        ).alias("th"),
        F.round(F.col("sx") / F.col("n"), 6).alias("xbar"),
    )
    adj = per_user.crossJoin(F.broadcast(theta)).select(
        "arm",
        "y",
        (F.col("y") - F.col("th") * (F.col("x") - F.col("xbar"))).alias("y_adj"),
        "th",
    )
    s = adj.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("y").alias("s1"),
        F.sum(F.col("y") * F.col("y")).alias("s2"),
        F.sum("y_adj").alias("a1"),
        F.sum(F.col("y_adj") * F.col("y_adj")).alias("a2"),
        F.first("th").alias("theta"),
    )
    n = F.col("n_users")
    var_y = (F.col("s2") - F.col("s1") * F.col("s1") / n) / (n - 1)
    var_adj = (F.col("a2") - F.col("a1") * F.col("a1") / n) / (n - 1)
    return s.select(
        "arm",
        "n_users",
        F.round(F.col("s1") / n, 6).alias("mean_y"),
        F.round(F.col("a1") / n, 6).alias("mean_y_adj"),
        F.round(var_y, 4).alias("var_y"),
        F.round(var_adj, 4).alias("var_y_adj"),
        (
            F.round(
                F.lit(1.0)
                - (F.col("a2") - F.col("a1") * F.col("a1") / n)
                / (F.col("s2") - F.col("s1") * F.col("s1") / n),
                4,
            )
            # + 0.0 canonicalizes IEEE -0.0 (a 4dp-rounded tiny negative)
            # to +0.0 on both engines so value hashes can't split on the
            # sign of zero.
            + F.lit(0.0)
        ).alias("var_reduction"),
        "theta",
    )


KANON_K = 5  # minimum safe quasi-identifier group size
KANON_L = 2  # minimum sensitive-attribute diversity per group
_SENS_BAND_SQL = (
    "CASE WHEN c_acctbal < 0 THEN 'neg' "
    "WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END"
)


@query(
    "q_quality_kanon",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(count(*) AS BIGINT) AS sz,
             count(DISTINCT {_SENS_BAND_SQL}) AS l_div
      FROM customer GROUP BY c_nationkey, c_mktsegment)
    SELECT c_nationkey,
           CAST(sum(sz) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(sz) AS BIGINT) AS min_group_size,
           CAST(sum(CASE WHEN sz < {KANON_K} THEN sz ELSE 0 END) AS BIGINT)
               AS n_rows_at_risk,
           CAST(sum(CASE WHEN l_div < {KANON_L} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_groups_low_diversity,
           round(CAST(sum(CASE WHEN sz < {KANON_K} THEN sz ELSE 0 END) AS DOUBLE)
                 / sum(sz), 4) AS risk_rate
    FROM g GROUP BY c_nationkey
    """,
)
def q_quality_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit — the data-governance gate run
    before releasing or training on user-adjacent tables: rows whose
    quasi-identifier combination (nation, market segment) lands in a
    group smaller than KANON_K are re-identifiable; groups whose
    sensitive attribute (account-balance band) shows fewer than KANON_L
    distinct values leak the attribute even when k holds. Reports both
    risks per nation, exactly. Complements q_text_pii (which scrubs
    direct identifiers; THIS audits the indirect ones).

    Scale shape: one hash agg to QI-group granularity (bounded by the QI
    domain, not the row count), one rollup over it — the same
    two-level-aggregate shape as q_agg_gini; nothing bigger than
    |QI groups| leaves the first shuffle."""
    c = load_table(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("sz"),
        F.count_distinct(band).alias("l_div"),
    )
    at_risk = F.sum(F.when(F.col("sz") < KANON_K, F.col("sz")).otherwise(0))
    return g.groupBy("c_nationkey").agg(
        F.sum("sz").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("sz").alias("min_group_size"),
        at_risk.alias("n_rows_at_risk"),
        F.sum(F.when(F.col("l_div") < KANON_L, 1).otherwise(0)).alias(
            "n_groups_low_diversity"
        ),
        F.round(at_risk.cast("double") / F.sum("sz"), 4).alias("risk_rate"),
    )


LOGREG_LR = 0.5     # gradient-descent learning rate
LOGREG_ITERS = 3    # unrolled descent steps
_DAY_US_LR = 86_400_000_000


def _logreg_feats_sql() -> str:
    """DuckDB: features CTE — label, standardized value, weekend flag."""
    return f"""
    s AS (
      SELECT count(*) AS n, sum(value) AS s1, sum(value * value) AS s2
      FROM events),
    st AS (
      SELECT round(s1 / n, 6) AS mu,
             round(sqrt((s2 - s1 * s1 / n) / (n - 1)), 6) AS sd
      FROM s),
    feats AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y,
             (value - mu) / sd AS x1,
             CASE WHEN (epoch_us(CAST(ts AS TIMESTAMP)) // {_DAY_US_LR} + 4) % 7
                       IN (0, 6) THEN 1.0 ELSE 0.0 END AS x2
      FROM events CROSS JOIN st)
    """


def _logreg_iter_sql(prev: str, cur: str) -> str:
    """DuckDB: one descent step from beta CTE ``prev`` to ``cur``."""
    return f"""
    {cur} AS (
      SELECT round(any_value(b0) - {LOGREG_LR} * avg(p - y), 6) AS b0,
             round(any_value(b1) - {LOGREG_LR} * avg((p - y) * x1), 6) AS b1,
             round(any_value(b2) - {LOGREG_LR} * avg((p - y) * x2), 6) AS b2
      FROM (
        SELECT y, x1, x2, b0, b1, b2,
               1 / (1 + exp(-(b0 + b1 * x1 + b2 * x2))) AS p
        FROM feats CROSS JOIN {prev}))
    """


@query(
    "q_ml_logreg",
    oracle="WITH "
    + _logreg_feats_sql().strip().rstrip()
    + ", it0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2),"
    + ",".join(
        _logreg_iter_sql(f"it{i}", f"it{i + 1}").strip()
        for i in range(LOGREG_ITERS)
    )
    + f"""
    SELECT CAST(count(*) AS BIGINT) AS n,
           any_value(b0) AS b0, any_value(b1) AS b1, any_value(b2) AS b2,
           round(avg(CASE WHEN (p >= 0.5) = (y = 1.0) THEN 1.0 ELSE 0.0 END), 4)
               AS accuracy,
           round(-avg(y * ln(p) + (1 - y) * ln(1 - p)), 4) AS log_loss
    FROM (
      SELECT y, b0, b1, b2,
             1 / (1 + exp(-(b0 + b1 * x1 + b2 * x2))) AS p
      FROM feats CROSS JOIN it{LOGREG_ITERS})
    """,
)
def q_ml_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression training as pure DataFrame ops:
    LOGREG_ITERS unrolled batch-gradient-descent steps fit
    P(purchase | standardized value, weekend) — each step is ONE
    map-side-combinable hash agg producing three gradient components, and
    the 1-row coefficient vector is broadcast back for the next step
    (the q_embed_kmeans loop discipline, but with an oracle: coefficients
    are ROUNDED 6dp after every step on both engines, so the nonlinear
    recurrence stays on one expression tree — the companion to
    q_ml_ols' closed-form solve for models with no closed form). Final
    row reports coefficients, training accuracy, and log-loss.

    Scale shape: per step, the fact table is scanned once and reduced to
    3 doubles; nothing iterative ever exceeds one broadcastable row, so
    step count — not data size — is the only serial factor. The weekend
    flag uses exact integer epoch-day arithmetic (q_time_heatmap
    precedent), never locale-dependent dayofweek."""
    e = load_table(spark, sf_dir, "events")
    s = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("s1"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
    )
    st = s.select(
        F.round(F.col("s1") / F.col("n"), 6).alias("mu"),
        F.round(
            F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
                / (F.col("n") - 1)
            ),
            6,
        ).alias("sd"),
    )
    weekend = F.expr(
        f"CASE WHEN (unix_micros(cast(ts AS timestamp)) DIV {_DAY_US_LR} + 4) % 7"
        f" IN (0, 6) THEN 1.0 ELSE 0.0 END"
    )
    feats = persist_tracked(
        e.crossJoin(F.broadcast(st)).select(
            F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0).alias("y"),
            ((F.col("value") - F.col("mu")) / F.col("sd")).alias("x1"),
            weekend.alias("x2"),
        )
    )
    beta = feats.sparkSession.range(1).select(
        F.lit(0.0).alias("b0"), F.lit(0.0).alias("b1"), F.lit(0.0).alias("b2")
    )
    p = F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(-(F.col("b0") + F.col("b1") * F.col("x1") + F.col("b2") * F.col("x2")))
    )
    for _ in range(LOGREG_ITERS):
        scored = feats.crossJoin(F.broadcast(beta)).select(
            "y", "x1", "x2", "b0", "b1", "b2", p.alias("p")
        )
        beta = scored.agg(
            F.round(
                F.first("b0") - LOGREG_LR * F.avg(F.col("p") - F.col("y")), 6
            ).alias("b0"),
            F.round(
                F.first("b1")
                - LOGREG_LR * F.avg((F.col("p") - F.col("y")) * F.col("x1")),
                6,
            ).alias("b1"),
            F.round(
                F.first("b2")
                - LOGREG_LR * F.avg((F.col("p") - F.col("y")) * F.col("x2")),
                6,
            ).alias("b2"),
        )
    final = feats.crossJoin(F.broadcast(beta)).select("y", "b0", "b1", "b2", p.alias("p"))
    return final.agg(
        F.count(F.lit(1)).alias("n"),
        F.first("b0").alias("b0"),
        F.first("b1").alias("b1"),
        F.first("b2").alias("b2"),
        F.round(
            F.avg(
                F.when(
                    (F.col("p") >= 0.5) == (F.col("y") == 1.0), 1.0
                ).otherwise(0.0)
            ),
            4,
        ).alias("accuracy"),
        F.round(
            -F.avg(
                F.col("y") * F.log(F.col("p"))
                + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - F.col("p"))
            ),
            4,
        ).alias("log_loss"),
    )


POWER_Z_ALPHA = 1.959964  # two-sided alpha = 0.05
POWER_Z_BETA = 0.841621   # power = 0.80
POWER_MDE_REL = 0.05      # minimum detectable effect: 5% relative lift


@query(
    "q_stats_power",
    oracle=f"""
    WITH s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             sum(value) AS s1, sum(value * value) AS s2,
             CAST(count(DISTINCT epoch_us(CAST(ts AS TIMESTAMP)) // {86_400_000_000})
                  AS BIGINT) AS n_days
      FROM events GROUP BY event_type),
    m AS (
      SELECT event_type, n, n_days,
             round(s1 / n, 6) AS mean,
             round(sqrt((s2 - s1 * s1 / n) / (n - 1)), 6) AS sd
      FROM s)
    SELECT event_type, n AS n_observed,
           mean, sd,
           round({POWER_MDE_REL} * mean, 6) AS mde_abs,
           CAST(ceil(2 * pow({POWER_Z_ALPHA} + {POWER_Z_BETA}, 2) * sd * sd
                     / pow({POWER_MDE_REL} * mean, 2)) AS BIGINT) AS n_per_arm,
           CAST(ceil(2 * ceil(2 * pow({POWER_Z_ALPHA} + {POWER_Z_BETA}, 2) * sd * sd
                              / pow({POWER_MDE_REL} * mean, 2))
                     / (CAST(n AS DOUBLE) / n_days)) AS BIGINT) AS days_needed
    FROM m
    """,
)
def q_stats_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power planning from observed data — the question every
    A/B test starts with: given this metric's observed variance and
    traffic, how many units per arm (and how many days at current volume)
    does an 80%-power, alpha=0.05 test of a {POWER_MDE_REL:.0%} relative
    lift need? n/arm = 2(z_a+z_b)^2 * sd^2 / mde^2, the standard
    two-sample normal-approximation formula with the z quantiles shipped
    as literals (no engine erf). mean/sd come from power sums rounded
    6dp, so the plan is deterministic cross-engine.

    Scale shape: one map-side-combinable hash agg (count/sum/sumsq +
    exact distinct-days) per event_type; everything downstream is
    |types|-row scalar arithmetic. Pairs with q_stats_ttest (the readout
    this plans for) and q_stats_cuped (whose variance reduction shrinks
    n_per_arm — rerun THIS on the adjusted metric to see the saving)."""
    e = load_table(spark, sf_dir, "events")
    day = F.expr("unix_micros(cast(ts AS timestamp)) DIV 86400000000")
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("s1"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
        F.count_distinct(day).alias("n_days"),
    )
    mean = F.round(F.col("s1") / F.col("n"), 6)
    sd = F.round(
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ),
        6,
    )
    m = s.select("event_type", "n", "n_days", mean.alias("mean"), sd.alias("sd"))
    mde = POWER_MDE_REL * F.col("mean")
    n_arm = F.ceil(
        2
        * F.pow(F.lit(POWER_Z_ALPHA + POWER_Z_BETA), 2)
        * F.col("sd")
        * F.col("sd")
        / F.pow(mde, 2)
    )
    return m.select(
        "event_type",
        F.col("n").alias("n_observed"),
        "mean",
        "sd",
        F.round(mde, 6).alias("mde_abs"),
        n_arm.cast("long").alias("n_per_arm"),
        F.ceil(2 * n_arm / (F.col("n").cast("double") / F.col("n_days")))
        .cast("long")
        .alias("days_needed"),
    )


NB_SMOOTH = 1  # add-one (Laplace) smoothing


@query(
    "q_ml_naive_bayes",
    oracle=f"""
    WITH split AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8' AS is_train
      FROM documents),
    tr_tok AS (
      SELECT lang, unnest(t) AS tok FROM split WHERE is_train),
    counts AS (
      SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
      FROM tr_tok GROUP BY lang, tok),
    class_tot AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_tok FROM tr_tok GROUP BY lang),
    vocab AS (
      SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM tr_tok),
    priors AS (
      SELECT lang, ln(CAST(count(*) AS DOUBLE)
                      / (SELECT count(*) FROM split WHERE is_train)) AS lp
      FROM split WHERE is_train GROUP BY lang),
    te_tok AS (
      SELECT doc_id, lang AS actual_lang, unnest(t) AS tok
      FROM split WHERE NOT is_train),
    scored AS (
      SELECT te.doc_id, te.actual_lang, ct.lang AS cand,
             sum(ln((coalesce(c.c, 0) + {NB_SMOOTH})
                    / CAST(ct.n_tok + {NB_SMOOTH} * vocab.v AS DOUBLE))) AS ll
      FROM te_tok te
      CROSS JOIN class_tot ct CROSS JOIN vocab
      LEFT JOIN counts c ON c.lang = ct.lang AND c.tok = te.tok
      GROUP BY te.doc_id, te.actual_lang, ct.lang, ct.n_tok, vocab.v),
    best AS (
      SELECT doc_id, actual_lang, cand AS predicted_lang,
             row_number() OVER (
               PARTITION BY doc_id
               ORDER BY round(s.ll + p.lp, 6) DESC, cand) AS rn
      FROM scored s JOIN priors p ON p.lang = s.cand)
    SELECT actual_lang, predicted_lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM best WHERE rn = 1
    GROUP BY actual_lang, predicted_lang
    """,
)
def q_ml_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed multinomial Naive Bayes, trained AND scored in one
    declarative query: token likelihoods with Laplace smoothing and class
    priors come from the deterministic hash-train split, every held-out
    doc is scored against all classes (per-class token log-probs joined
    onto exploded test tokens, unseen tokens falling to the smoothed
    floor), and the argmax prediction (6dp-rounded log-likelihood, class
    tie-break) rolls up into a confusion matrix. The fixture corpus is
    word-salad, so accuracy is honest chance-level — the operator under
    test is the distributed train/score machinery, not the fixture's
    separability (the q_text_langid caveat).

    Scale shape: training is two map-side-combinable hash aggs ((class,
    token) counts + class totals); scoring explodes test docs once and
    joins the Zipf-small likelihood table (broadcastable, like
    q_text_tfidf's vocabulary); the per-(doc, class) sum rides one
    shuffle. No iteration — NB's closed form is why it stays one pass at
    any scale."""
    d = load_table(spark, sf_dir, "documents")
    split = d.select(
        "doc_id",
        "lang",
        F.split("text", " ").alias("t"),
        (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8").alias(
            "is_train"
        ),
    )
    split = persist_tracked(split)
    tr_tok = persist_tracked(
        split.where("is_train").select("lang", F.explode("t").alias("tok"))
    )
    counts = tr_tok.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    class_tot = tr_tok.groupBy("lang").agg(F.count(F.lit(1)).alias("n_tok"))
    vocab = tr_tok.agg(F.count_distinct("tok").alias("v"))
    n_train = split.where("is_train").agg(
        F.count(F.lit(1)).cast("double").alias("n_tr")
    )
    priors = (
        split.where("is_train")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(F.broadcast(n_train))
        .select("lang", F.log(F.col("n_docs") / F.col("n_tr")).alias("lp"))
    )
    te_tok = split.where(~F.col("is_train")).select(
        "doc_id", F.col("lang").alias("actual_lang"), F.explode("t").alias("tok")
    )
    scored = (
        te_tok.crossJoin(F.broadcast(class_tot.withColumnRenamed("lang", "cand")))
        .crossJoin(F.broadcast(vocab))
        .join(
            counts.select(
                F.col("lang").alias("cand_c"), F.col("tok").alias("tok_c"), "c"
            ),
            (F.col("cand") == F.col("cand_c")) & (F.col("tok") == F.col("tok_c")),
            "left",
        )
        .groupBy("doc_id", "actual_lang", "cand")
        .agg(
            F.sum(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + NB_SMOOTH)
                    / (F.col("n_tok") + NB_SMOOTH * F.col("v")).cast("double")
                )
            ).alias("ll")
        )
    )
    best = (
        scored.join(
            F.broadcast(priors.withColumnRenamed("lang", "cand")), "cand"
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.round(F.col("ll") + F.col("lp"), 6).desc(), F.col("cand")
                )
            ),
        )
        .where(F.col("rn") == 1)
    )
    return best.groupBy(
        "actual_lang", F.col("cand").alias("predicted_lang")
    ).agg(F.count(F.lit(1)).alias("n_docs"))


BOT_MIN_EVENTS = 50      # volume floor for the low-diversity flag
BOT_MAX_NORM_ENTROPY = 0.6  # flag heavy users below this diversity


@query(
    "q_quality_behavior_entropy",
    oracle=f"""
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id, event_type),
    sh AS (
      SELECT user_id, c,
             c / CAST(sum(c) OVER (PARTITION BY user_id) AS DOUBLE) AS p
      FROM c),
    u AS (
      SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_types,
             -- normalize by the OBSERVED type cardinality, not a literal:
             -- a fixture domain change shifts the normalization (and the
             -- BOT_MAX_NORM_ENTROPY meaning) identically on both engines
             -- + 0.0: a single-type user has entropy -sum(0.0) = -0.0
             -- here but +0.0 in Spark's sum aggregate — canonicalize
             round(-sum(p * ln(p))
                   / ln((SELECT count(DISTINCT event_type) FROM events)), 6)
                 + 0.0 AS norm_entropy
      FROM sh GROUP BY user_id)
    SELECT user_id, n_events, n_types, norm_entropy,
           (n_events >= {BOT_MIN_EVENTS}
            AND norm_entropy < {BOT_MAX_NORM_ENTROPY}) AS low_diversity_flag
    FROM u
    """,
)
def q_quality_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-diversity audit — the bot/scripted-traffic signature:
    per user, Shannon entropy of the event-type distribution normalized
    by ln(|types|), with heavy-volume low-diversity accounts flagged
    (a human mixes views/clicks/purchases; a scraper hammers one type).
    Complements q_graph_triangles (coordination structure) and
    q_win_time_range (velocity) as the third abuse-detection axis.

    Scale shape: one (user, type) hash agg, then a per-user rollup —
    the entropy sum needs each type's share of the user total, taken
    from a window over the TINY (user, type) aggregate that reuses its
    partitioning; nothing row-granular survives the first shuffle. The
    normalizer ln(|observed types|) is a broadcast 1-row crossJoin of a
    distinct-count over the persisted (user, type) aggregate (not a
    hard-coded ln(5): a fixture domain change shifts the normalization
    identically on both engines instead of silently de-normalizing)."""
    e = load_table(spark, sf_dir, "events")
    c = persist_tracked(
        e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    )
    k_1row = c.agg(
        F.log(F.count_distinct("event_type").cast("double")).alias("ln_k")
    )
    w_u = Window.partitionBy("user_id")
    share = F.col("c") / F.sum("c").over(w_u).cast("double")
    u = (
        c.withColumn("term", -share * F.log(share))
        .groupBy("user_id")
        .agg(
            F.sum("c").alias("n_events"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum("term").alias("ent_sum"),
        )
        .crossJoin(F.broadcast(k_1row))
        .select(
            "user_id",
            "n_events",
            "n_types",
            # + 0.0: -0.0 canonicalization (single-type users; see oracle)
            (
                F.round(F.col("ent_sum") / F.col("ln_k"), 6) + F.lit(0.0)
            ).alias("norm_entropy"),
        )
    )
    return u.select(
        "user_id",
        "n_events",
        "n_types",
        "norm_entropy",
        (
            (F.col("n_events") >= BOT_MIN_EVENTS)
            & (F.col("norm_entropy") < BOT_MAX_NORM_ENTROPY)
        ).alias("low_diversity_flag"),
    )


STUMP_FEATS = 3      # candidate features: first 3 embedding components
STUMP_BIN_DP = 2     # histogram-bin rounding (decimal places) for
# candidate thresholds — the XGBoost/Spark-ML histogram-split discipline
# that bounds candidate count independently of corpus size.
BOOST_W_MISS = 2     # integer up-weight for round-1 misclassified points
# (a discrete boosting round: exact-integer reweighting instead of
# AdaBoost's e^±alpha floats, so both engines score round 2 from
# identical integers).


def _stump_points(spark: SparkSession, sf_dir: str):
    """(vec_id, feat, bin, label) for the first STUMP_FEATS embedding
    components, thresholds histogram-binned at STUMP_BIN_DP dp."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    return e.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f"x{i}").alias("feat"),
                        F.round(F.element_at("v", i), STUMP_BIN_DP).alias("bin"),
                    )
                    for i in range(1, STUMP_FEATS + 1)
                ]
            )
        ).alias("p"),
        "label",
    ).select("vec_id", "p.feat", "p.bin", "label")


def _gini_splits(pts: DataFrame, w) -> DataFrame:
    """Weighted histogram-split scores: for every (feat, bin) candidate
    threshold, the weighted side totals and weighted multi-class Gini,
    computed from exact integer cumulative weights (one map-side-
    combinable hash agg + a window whose partition size is the bin
    count). The Gini expression is a fixed-association arithmetic tree
    over those integers, so both engines produce bit-identical doubles."""
    cnt = pts.groupBy("feat", "bin", "label").agg(F.sum(w).alias("c"))
    bins = cnt.select("feat", "bin").distinct()
    labels = pts.select("label").distinct()
    dense = (
        bins.join(F.broadcast(labels))
        .join(cnt, ["feat", "bin", "label"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    )
    w_cum = Window.partitionBy("feat", "label").orderBy("bin")
    w_tot = Window.partitionBy("feat", "label")
    cum = dense.select(
        "feat",
        "bin",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_tot).alias("tot"),
    )
    splits = cum.groupBy("feat", "bin").agg(
        F.sum("cum").alias("n_le"),
        (F.sum("tot") - F.sum("cum")).alias("n_gt"),
        F.sum(F.col("cum") * F.col("cum")).alias("s_le2"),
        F.sum((F.col("tot") - F.col("cum")) * (F.col("tot") - F.col("cum"))).alias(
            "s_gt2"
        ),
        F.sum("tot").alias("n"),
    )
    wg = (
        F.col("n_le")
        - F.col("s_le2") / F.col("n_le").cast("double")
        + F.col("n_gt")
        - F.col("s_gt2") / F.col("n_gt").cast("double")
    ) / F.col("n").cast("double")
    return splits.where(F.col("n_gt") > 0).select(
        "feat", "bin", "n_le", "n_gt", wg.alias("wg")
    )


def _gini_sql(pts_cte: str, weight: str, p: str) -> str:
    """The cnt -> scored CTE chain (weighted), names prefixed with ``p``
    so the boost oracle can instantiate it twice in one statement."""
    return f"""
    {p}cnt AS (
      SELECT feat, bin, label, CAST(sum({weight}) AS BIGINT) AS c
      FROM {pts_cte} GROUP BY feat, bin, label),
    {p}dense AS (
      SELECT b.feat, b.bin, l.label, coalesce(c.c, 0) AS c
      FROM (SELECT DISTINCT feat, bin FROM {p}cnt) b
      CROSS JOIN (SELECT DISTINCT label FROM {pts_cte}) l
      LEFT JOIN {p}cnt c
        ON c.feat = b.feat AND c.bin = b.bin AND c.label = l.label),
    {p}cum AS (
      SELECT feat, bin, label,
             sum(c) OVER (PARTITION BY feat, label ORDER BY bin) AS cum,
             sum(c) OVER (PARTITION BY feat, label) AS tot
      FROM {p}dense),
    {p}splits AS (
      SELECT feat, bin,
             sum(cum) AS n_le,
             sum(tot) - sum(cum) AS n_gt,
             sum(cum * cum) AS s_le2,
             sum((tot - cum) * (tot - cum)) AS s_gt2,
             sum(tot) AS n
      FROM {p}cum GROUP BY feat, bin),
    {p}scored AS (
      SELECT feat, bin, n_le, n_gt,
             (n_le - s_le2 / CAST(n_le AS DOUBLE)
              + n_gt - s_gt2 / CAST(n_gt AS DOUBLE)) / CAST(n AS DOUBLE)
               AS wg
      FROM {p}splits WHERE n_gt > 0)"""


_STUMP_PTS_SQL = f"""pts AS (
      SELECT e.vec_id, f.feat, round(e.v[f.i], {STUMP_BIN_DP}) AS bin,
             e.label
      FROM (SELECT vec_id, label, embedding::DOUBLE[] AS v
            FROM embeddings) e
      CROSS JOIN (SELECT unnest(range(1, {STUMP_FEATS} + 1)) AS i,
                         unnest(['x1', 'x2', 'x3']) AS feat) f)"""


@query(
    "q_ml_decision_stump",
    oracle=f"""
    WITH {_STUMP_PTS_SQL},{_gini_sql("pts", "1", "")}
    SELECT feat AS feature, bin AS threshold,
           CAST(n_le AS BIGINT) AS n_le, CAST(n_gt AS BIGINT) AS n_gt,
           round(wg, 6) AS gini
    FROM (SELECT *, row_number() OVER (
            PARTITION BY feat ORDER BY round(wg, 6), bin) AS rn
          FROM scored)
    WHERE rn = 1
    """,
)
def q_ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump training — the greedy one-node tree split that
    gradient-boosting and random-forest trainers evaluate millions of
    times: for each candidate feature (first {STUMP_FEATS} embedding
    components), the histogram-binned threshold minimizing weighted
    multi-class Gini impurity, with per-side support counts.

    Scale shape (the histogram-split discipline): candidate thresholds
    are the features' values rounded to {STUMP_BIN_DP}dp, so the
    candidate count is bounded by the bin grid, NOT corpus size — the
    per-(feature, bin, label) count is one map-side-combinable hash agg,
    the class-cumulative pass is a window over (feature, label) whose
    partition size is the bin count (thousands of rows at ANY corpus
    scale), and the Gini arithmetic runs on exact BIGINT cumulative
    counts, so both engines score splits from identical integers (the
    6dp-rounded score only breaks ranking ties, never accuracy).
    Per-feature argmin ties break toward the smaller threshold."""
    scored = _gini_splits(_stump_points(spark, sf_dir), F.lit(1))
    w_best = Window.partitionBy("feat").orderBy(F.round("wg", 6), "bin")
    return (
        scored.withColumn("rn", F.row_number().over(w_best))
        .where(F.col("rn") == 1)
        .select(
            F.col("feat").alias("feature"),
            F.col("bin").alias("threshold"),
            "n_le",
            "n_gt",
            F.round("wg", 6).alias("gini"),
        )
    )


@query(
    "q_ml_boost_round",
    oracle=f"""
    WITH {_STUMP_PTS_SQL},{_gini_sql("pts", "1", "")},
    best1 AS (
      SELECT feat, bin FROM (
        SELECT feat, bin, row_number() OVER (
                 ORDER BY round(wg, 6), feat, bin) AS rn
        FROM scored) WHERE rn = 1),
    sides AS (
      SELECT p.vec_id, p.label,
             (p.bin <= b.bin) AS on_le
      FROM pts p JOIN best1 b ON p.feat = b.feat),
    maj AS (
      SELECT on_le, label AS maj_label FROM (
        SELECT on_le, label,
               row_number() OVER (PARTITION BY on_le
                                  ORDER BY count(*) DESC, label) AS rn
        FROM sides GROUP BY on_le, label) WHERE rn = 1),
    wts AS (
      SELECT s.vec_id,
             CASE WHEN s.label = m.maj_label
                  THEN 1 ELSE {BOOST_W_MISS} END AS w
      FROM sides s JOIN maj m ON m.on_le = s.on_le),
    wpts AS (
      SELECT p.feat, p.bin, p.label, w.w
      FROM pts p JOIN wts w ON w.vec_id = p.vec_id),{_gini_sql("wpts", "w", "b_")}
    SELECT feat AS feature, bin AS threshold,
           CAST(n_le AS BIGINT) AS w_le, CAST(n_gt AS BIGINT) AS w_gt,
           round(wg, 6) AS gini_w,
           (SELECT feat FROM best1) AS r1_feature,
           (SELECT bin FROM best1) AS r1_threshold,
           (SELECT CAST(count(*) AS BIGINT) FROM wts WHERE w > 1)
               AS r1_miss
    FROM (SELECT *, row_number() OVER (
            PARTITION BY feat ORDER BY round(wg, 6), bin) AS rn
          FROM b_scored)
    WHERE rn = 1
    """,
)
def q_ml_boost_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One boosting round over the histogram stump — the inner loop of
    gradient-boosted-tree training at corpus scale: train the global
    best stump (round 1), classify every point by its side's majority
    label, up-weight the misclassified points by the integer factor
    {BOOST_W_MISS}, and retrain the per-feature stumps on the weighted
    histogram (round 2), reporting each feature's new best split, its
    weighted Gini, and the round-1 split + miss count it corrected for.

    Discrete reweighting (1 vs {BOOST_W_MISS}) instead of AdaBoost's
    e^±alpha floats keeps every count an exact BIGINT, so both engines
    score round 2 from identical integers — the same exactness
    discipline as q_ml_decision_stump, whose scoring machinery this key
    reuses with a weight column. Scale shape: the round-1 winner and the
    two per-side majority labels are the only driver-side scalars
    (bounded literal-shipping, 3 rows); the per-point weight table joins
    back on vec_id — one hash join keyed on the corpus id, then the same
    bin-grid-bounded weighted histogram aggregation as round 1. Round-1
    global ties break by (gini, feat, bin) on both engines."""
    pts = persist_tracked(_stump_points(spark, sf_dir))
    s1 = _gini_splits(pts, F.lit(1))
    best1 = (
        s1.orderBy(F.round("wg", 6), "feat", "bin")
        .select("feat", "bin")
        .limit(1)
        .collect()[0]
    )
    sides = pts.where(F.col("feat") == best1["feat"]).select(
        "vec_id",
        "label",
        (F.col("bin") <= F.lit(best1["bin"])).alias("on_le"),
    )
    maj = {
        r["on_le"]: r["maj_label"]
        for r in sides.groupBy("on_le", "label")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("on_le").orderBy(
                    F.col("c").desc(), "label"
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("on_le", F.col("label").alias("maj_label"))
        .collect()
    }
    wts = sides.select(
        "vec_id",
        F.when(
            (F.col("on_le") & (F.col("label") == F.lit(maj[True])))
            | (~F.col("on_le") & (F.col("label") == F.lit(maj[False]))),
            F.lit(1),
        )
        .otherwise(F.lit(BOOST_W_MISS))
        .alias("w"),
    )
    r1_miss = wts.where(F.col("w") > 1).count()
    s2 = _gini_splits(pts.join(wts, "vec_id"), F.col("w"))
    w_best = Window.partitionBy("feat").orderBy(F.round("wg", 6), "bin")
    return (
        s2.withColumn("rn", F.row_number().over(w_best))
        .where(F.col("rn") == 1)
        .select(
            F.col("feat").alias("feature"),
            F.col("bin").alias("threshold"),
            F.col("n_le").alias("w_le"),
            F.col("n_gt").alias("w_gt"),
            F.round("wg", 6).alias("gini_w"),
            F.lit(best1["feat"]).alias("r1_feature"),
            F.lit(best1["bin"]).alias("r1_threshold"),
            F.lit(r1_miss).cast("long").alias("r1_miss"),
        )
    )


AUC_BIN_DP = 2   # score histogram resolution (stump's binning discipline)


@query(
    "q_ml_auc",
    oracle=f"""
    WITH pts AS (
      SELECT round((embedding::DOUBLE[])[1], {AUC_BIN_DP}) AS s, label
      FROM embeddings),
    cnt AS (
      SELECT s, label, CAST(count(*) AS BIGINT) AS c
      FROM pts GROUP BY s, label),
    tot AS (SELECT s, CAST(sum(c) AS BIGINT) AS ct FROM cnt GROUP BY s),
    grid AS (
      SELECT t.s, l.label, t.ct, coalesce(c.c, 0) AS pos
      FROM tot t
      CROSS JOIN (SELECT DISTINCT label FROM pts) l
      LEFT JOIN cnt c ON c.s = t.s AND c.label = l.label),
    rk AS (
      SELECT label, pos, ct,
             coalesce(sum(ct) OVER (PARTITION BY label ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS below
      FROM grid),
    agg AS (
      SELECT label,
             sum(pos * (below + (ct + 1) / 2.0)) AS r_pos,
             CAST(sum(pos) AS BIGINT) AS n_pos,
             CAST(sum(ct - pos) AS BIGINT) AS n_neg
      FROM rk GROUP BY label)
    SELECT label, n_pos, n_neg,
           round((r_pos - n_pos * (n_pos + 1) / 2.0)
                 / (CAST(n_pos AS DOUBLE) * n_neg), 6) AS auc
    FROM agg
    """,
)
def q_ml_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest ROC AUC per class for a fixed scorer (the first
    embedding component, histogram-binned at {AUC_BIN_DP}dp) — the
    model-evaluation counterpart of q_stats_mannwhitney: AUC is the
    rank-sum statistic normalized by n_pos*n_neg, with exact
    tie-corrected average ranks.

    Scale shape: no per-row global sort. Scores collapse to the binned
    distinct-value histogram (one map-side-combinable hash agg), the
    dense (bin x class) grid is bin-count x |classes| rows at ANY corpus
    size, and average ranks come in closed form from cumulative counts
    over a window PARTITIONED BY class (partition size = bin count).
    Every term of the rank sum is an exact multiple of 0.5 well inside
    double precision, so r_pos is order-independent and the final
    division is bit-deterministic on both engines."""
    e = load_table(spark, sf_dir, "embeddings")
    pts = e.select(
        F.round(F.element_at("embedding", 1).cast("double"), AUC_BIN_DP).alias(
            "s"
        ),
        "label",
    )
    cnt = pts.groupBy("s", "label").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("s").agg(F.sum("c").alias("ct"))
    classes = pts.select("label").distinct()
    grid = (
        tot.join(F.broadcast(classes))
        .join(cnt, ["s", "label"], "left")
        .withColumn("pos", F.coalesce(F.col("c"), F.lit(0)))
    )
    w_below = (
        Window.partitionBy("label")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rk = grid.select(
        "label",
        "pos",
        "ct",
        F.coalesce(F.sum("ct").over(w_below), F.lit(0)).alias("below"),
    )
    agg = rk.groupBy("label").agg(
        F.sum(F.col("pos") * (F.col("below") + (F.col("ct") + 1) / 2.0)).alias(
            "r_pos"
        ),
        F.sum("pos").alias("n_pos"),
        F.sum(F.col("ct") - F.col("pos")).alias("n_neg"),
    )
    return agg.select(
        "label",
        "n_pos",
        "n_neg",
        F.round(
            (F.col("r_pos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
            / (F.col("n_pos").cast("double") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )


CAL_BINS = 10        # reliability-diagram bins over the score support
CAL_POS_MIN = 5      # binary target: label >= CAL_POS_MIN
# Integer-cents affine map onto [0, 1]: p_hat = (cents + 60) / 120 for
# cents = round(100 * x1) in [-60, 60]; bin = (cents + 60) div 12.
CAL_SHIFT, CAL_SPAN, CAL_STEP = 60, 120, 12


@query(
    "q_ml_calibration",
    oracle=f"""
    WITH pts AS (
      SELECT CAST(round((embedding::DOUBLE[])[1] * 100, 0) AS BIGINT)
               + {CAL_SHIFT} AS cs,
             CASE WHEN label >= {CAL_POS_MIN} THEN 1 ELSE 0 END AS y
      FROM embeddings),
    b AS (
      SELECT least(cs // {CAL_STEP}, {CAL_BINS - 1}) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS pos,
             CAST(sum(cs) AS BIGINT) AS sum_cs
      FROM pts GROUP BY 1)
    SELECT bin, n, pos,
           round(sum_cs / ({CAL_SPAN}.0 * n), 6) AS mean_pred,
           round(pos / CAST(n AS DOUBLE), 6) AS pos_rate,
           round(pos / CAST(n AS DOUBLE)
                 - sum_cs / ({CAL_SPAN}.0 * n), 6) + 0.0 AS gap
    FROM b
    """,
)
def q_ml_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration / reliability-diagram audit of a scorer mapped to
    [0, 1] (affine integer-cents transform of the first embedding
    component) against the binary target label >= {CAL_POS_MIN}: per
    score bin, the mean predicted probability vs the empirical positive
    rate and their gap — the per-bin decomposition behind expected
    calibration error.

    Scale shape: ONE map-side-combinable hash agg to {CAL_BINS} rows;
    the per-bin mean prediction is recovered from the exact BIGINT sum
    of integer cents (never an order-dependent double sum), so every
    emitted double is a fixed arithmetic tree over exact integers —
    bit-deterministic on both engines. A cross-bin ECE rollup is
    deliberately NOT emitted: it would sum order-dependent doubles; the
    per-bin rows are the lossless artifact."""
    e = load_table(spark, sf_dir, "embeddings")
    cs = (
        F.round(F.element_at("embedding", 1).cast("double") * 100, 0)
        .cast("long")
        + CAL_SHIFT
    )
    pts = e.select(
        cs.alias("cs"),
        F.when(F.col("label") >= CAL_POS_MIN, 1).otherwise(0).alias("y"),
    )
    b = pts.groupBy(
        F.least(F.expr(f"cs div {CAL_STEP}"), F.lit(CAL_BINS - 1)).alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("pos"),
        F.sum("cs").alias("sum_cs"),
    )
    mean_pred = F.col("sum_cs") / (float(CAL_SPAN) * F.col("n"))
    pos_rate = F.col("pos") / F.col("n").cast("double")
    return b.select(
        "bin",
        "n",
        "pos",
        F.round(mean_pred, 6).alias("mean_pred"),
        F.round(pos_rate, 6).alias("pos_rate"),
        # + 0.0: -0.0 canonicalization (q_stats_cuped precedent)
        (F.round(pos_rate - mean_pred, 6) + F.lit(0.0)).alias("gap"),
    )


CV_FOLDS = 3         # md5 first-hex thresholds: <'6' | <'b' | else
CV_BASE_HOURS = 473352   # 2024-01-01T00:00Z in whole hours since epoch
_CV_PTS_SQL = f"""pts AS (
      SELECT event_type,
             CASE WHEN substring(md5(CAST(event_id AS VARCHAR)), 1, 1) < '6'
                  THEN 0
                  WHEN substring(md5(CAST(event_id AS VARCHAR)), 1, 1) < 'b'
                  THEN 1 ELSE 2 END AS fold,
             epoch_us(ts) // 3600000000 - {CV_BASE_HOURS} AS x,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
      FROM events)"""


@query(
    "q_ml_cross_val",
    oracle=f"""
    WITH {_CV_PTS_SQL},
    fs AS (
      SELECT event_type, fold,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pts GROUP BY event_type, fold),
    tr AS (
      SELECT event_type, fold, n, sx, sy, sxx, sxy, syy,
             sum(n) OVER w - n AS tn,
             sum(sx) OVER w - sx AS tsx,
             sum(sy) OVER w - sy AS tsy,
             sum(sxx) OVER w - sxx AS tsxx,
             sum(sxy) OVER w - sxy AS tsxy
      FROM fs WINDOW w AS (PARTITION BY event_type)),
    fit AS (
      SELECT *,
             (tn * tsxy - tsx * tsy)
               / CAST(tn * tsxx - tsx * tsx AS DOUBLE) AS b
      FROM tr),
    ev AS (
      SELECT event_type, fold, tn, n, b,
             (tsy - b * tsx) / CAST(tn AS DOUBLE) AS a
      FROM fit)
    SELECT e.event_type, e.fold,
           CAST(e.tn AS BIGINT) AS n_train, f.n AS n_test,
           round(e.b, 6) AS slope, round(e.a, 6) AS intercept,
           round(sqrt((CAST(f.syy AS DOUBLE) - 2 * e.a * f.sy
                       - 2 * e.b * f.sxy + f.n * e.a * e.a
                       + 2 * e.a * e.b * f.sx + e.b * e.b * f.sxx)
                      / f.n), 6) AS test_rmse
    FROM ev e
    JOIN fs f ON f.event_type = e.event_type AND f.fold = e.fold
    """,
)
def q_ml_cross_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{CV_FOLDS}-fold cross-validation of a per-series linear model
    (integer-cents value vs integer event-hour) in ONE scan — the
    model-selection loop without the retrain loop: per (series, fold)
    exact-integer sufficient statistics are aggregated once, each fold's
    TRAINING stats are recovered by subtracting its own partial from the
    series total, the normal-equation fit is a closed form over those
    integers, and the held-out error comes from the fold's OWN
    sufficient statistics (SSE = Syy - 2aSy - 2bSxy + na^2 + 2abSx
    + b^2Sxx) — no second pass over rows, no per-row residuals.

    Scale shape: k models per series cost exactly one map-side-
    combinable hash agg to k rows per series; the subtraction window
    spans {CV_FOLDS} rows. All sums are exact BIGINTs (hour offsets
    <= ~10^3, cents <= ~10^7; the n*Sxy cross terms stay inside int64
    up to ~10^9 rows per series — beyond that, recentre x per series or
    widen to DECIMAL), so slope/intercept/RMSE are fixed arithmetic
    trees over identical integers on both engines — bit-deterministic
    before the display rounding. Fold assignment is the md5 first-hex
    split (reproducible, engine-portable)."""
    e = load_table(spark, sf_dir, "events")
    hexd = F.substring(F.md5(F.col("event_id").cast("string")), 1, 1)
    pts = e.select(
        "event_type",
        F.when(hexd < "6", 0).when(hexd < "b", 1).otherwise(2).alias("fold"),
        (
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000")
            - CV_BASE_HOURS
        ).alias("x"),
        F.floor(F.col("value") * 100 + 0.5).alias("y"),
    )
    fs = pts.groupBy("event_type", "fold").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    w = Window.partitionBy("event_type")
    tr = fs.select(
        "*",
        (F.sum("n").over(w) - F.col("n")).alias("tn"),
        (F.sum("sx").over(w) - F.col("sx")).alias("tsx"),
        (F.sum("sy").over(w) - F.col("sy")).alias("tsy"),
        (F.sum("sxx").over(w) - F.col("sxx")).alias("tsxx"),
        (F.sum("sxy").over(w) - F.col("sxy")).alias("tsxy"),
    )
    b = (F.col("tn") * F.col("tsxy") - F.col("tsx") * F.col("tsy")) / (
        F.col("tn") * F.col("tsxx") - F.col("tsx") * F.col("tsx")
    ).cast("double")
    fit = tr.withColumn("b", b).withColumn(
        "a", (F.col("tsy") - F.col("b") * F.col("tsx")) / F.col("tn").cast("double")
    )
    sse = (
        F.col("syy").cast("double")
        - 2 * F.col("a") * F.col("sy")
        - 2 * F.col("b") * F.col("sxy")
        + F.col("n") * F.col("a") * F.col("a")
        + 2 * F.col("a") * F.col("b") * F.col("sx")
        + F.col("b") * F.col("b") * F.col("sxx")
    )
    return fit.select(
        "event_type",
        "fold",
        F.col("tn").alias("n_train"),
        F.col("n").alias("n_test"),
        F.round("b", 6).alias("slope"),
        F.round("a", 6).alias("intercept"),
        F.round(F.sqrt(sse / F.col("n")), 6).alias("test_rmse"),
    )


BLOCK_TERMS = ("slow", "big", "crash", "exploit")  # two absent on purpose:
# the zero-hit path must stay exact, not just the hot one
BLOCK_RATIO = 0.06   # flag docs whose blocklist share exceeds this
_BLOCK_IN = ", ".join(f"'{t}'" for t in BLOCK_TERMS)


@query(
    "q_quality_blocklist",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id, lang,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, t -> t IN ({_BLOCK_IN}))) AS BIGINT)
             AS hits,
           CAST(len(list_intersect(list_distinct(toks),
                                   [{_BLOCK_IN}])) AS BIGINT)
             AS distinct_terms,
           round(len(list_filter(toks, t -> t IN ({_BLOCK_IN})))
                 / CAST(len(toks) AS DOUBLE), 6) AS hit_ratio,
           len(list_filter(toks, t -> t IN ({_BLOCK_IN})))
             / CAST(len(toks) AS DOUBLE) > {BLOCK_RATIO} AS flagged
    FROM t
    """,
)
def q_quality_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon content filter — the blocklist gate every training-data
    pipeline runs (policy terms, PII keywords, spam markers): per doc,
    total and distinct blocklist hits, the hit share of all tokens, and
    the over-threshold flag ({BLOCK_RATIO}). Two of the {len(BLOCK_TERMS)}
    terms never occur in the corpus, pinning the zero-hit path.

    Scale shape: a pure per-row map over the token array (higher-order
    filter/intersect inside whole-stage codegen) — ZERO shuffles, no
    explode (the token stream never becomes rows), lexicon inlined as a
    literal (broadcast a dictionary table at real lexicon sizes). The
    ratio is a division of exact integers, so the flag threshold is
    bit-deterministic on both engines."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    hits = F.size(F.expr(f"filter(split(text, ' '), t -> t IN ({_BLOCK_IN}))"))
    ratio = hits / F.size(toks).cast("double")
    return d.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        hits.cast("long").alias("hits"),
        F.size(
            F.array_intersect(
                F.array_distinct(toks),
                F.array(*[F.lit(t) for t in BLOCK_TERMS]),
            )
        )
        .cast("long")
        .alias("distinct_terms"),
        F.round(ratio, 6).alias("hit_ratio"),
        (ratio > BLOCK_RATIO).alias("flagged"),
    )
