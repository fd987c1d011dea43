"""Scale-pattern tests: the structural techniques that keep plans alive at
100 TB — salted joins under pathological skew, bucketed co-located joins
that eliminate the shuffle entirely."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.operators.salting import salted_join
from kafka_hadoop_consumer_spark.plans.audit import formatted_plan


@pytest.fixture(scope="module")
def skewed(spark):
    """1M-row fact where ONE key owns ~50% of all rows + a 100-row dim."""
    fact = spark.range(0, 1_000_000).select(
        F.when(F.col("id") % 2 == 0, 7).otherwise(F.pmod("id", 100)).alias("k"),
        (F.col("id") * 1.0).alias("v"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim"), "id").alias("name")
    )
    return fact, dim


def test_salted_join_matches_plain_join(spark, skewed):
    fact, dim = skewed
    plain = fact.join(dim, "k").groupBy("name").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("s")
    )
    salted = salted_join(fact, dim, "k").groupBy("name").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("s")
    )
    a = {(r["name"], r["n"], r["s"]) for r in plain.collect()}
    b = {(r["name"], r["n"], r["s"]) for r in salted.collect()}
    assert a == b


def test_salted_join_spreads_hot_key(spark, skewed):
    fact, _ = skewed
    salt_src = F.xxhash64(*[F.col(c) for c in fact.columns])
    salted = fact.where(F.col("k") == 7).withColumn(
        "_salt", F.pmod(salt_src, F.lit(16)).cast("int")
    )
    dist = salted.groupBy("_salt").count().collect()
    assert len(dist) == 16  # hot key now spans all 16 sub-keys
    counts = [r["count"] for r in dist]
    assert max(counts) < 2 * min(counts)  # roughly uniform spread


def test_salted_join_rejects_outer_variants(spark, skewed):
    """Outer salted joins would emit each unmatched small-side row once
    per replica; the operator must refuse rather than silently duplicate."""
    import pytest

    fact, dim = skewed
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(fact, dim, "k", how=how)


def test_dynamic_partition_pruning(spark, tmp_path_factory):
    """DPP (SURVEY.md §4.2): joining a partitioned fact with a filtered dim
    prunes fact partitions at RUNTIME using the dim's join keys — at
    100 TB this is the difference between scanning one partition and all
    of them."""
    from kafka_hadoop_consumer_spark.catalog import load_table
    from tests.conftest import SF_DIR

    path = str(tmp_path_factory.mktemp("dpp") / "orders_part")
    load_table(spark, SF_DIR, "orders").write.partitionBy("o_orderstatus").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("F", "finished")], "st string, tag string"
    ).where(F.col("tag") == "finished")
    joined = fact.join(dim, fact.o_orderstatus == dim.st)
    plan = formatted_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan[:1500]
    n_f = load_table(spark, SF_DIR, "orders").where(F.col("o_orderstatus") == "F").count()
    assert joined.count() == n_f


def test_bucketed_join_has_no_shuffle(spark, tmp_path_factory):
    """Bucketing both sides on the join key pre-shuffles data AT WRITE TIME:
    the join then runs shuffle-free (no Exchange above either scan) — the
    pattern for repeated big-big joins on a stable key at 100 TB."""
    n_bkts = 8
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    from kafka_hadoop_consumer_spark.catalog import load_table
    from tests.conftest import SF_DIR

    from kafka_hadoop_consumer_spark.sources.batch import write_bucketed_table

    write_bucketed_table(
        load_table(spark, SF_DIR, "orders"), "b_orders", "o_custkey", n_bkts
    )
    write_bucketed_table(
        load_table(spark, SF_DIR, "customer").withColumn(
            "c_custkey2", F.col("c_custkey")
        ),
        "b_customer", "c_custkey", n_bkts, sort=False,
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = formatted_plan(joined)
        assert "Exchange" not in plan, plan[:1500]
        assert joined.count() == load_table(spark, SF_DIR, "orders").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_observed_metrics_computed_in_same_action(spark, tmp_path):
    """The Observation API yields row/null metrics from the SAME write
    action — no second validation scan at 100 TB."""
    from kafka_hadoop_consumer_spark.operators.quality import observed, quality_gate
    from kafka_hadoop_consumer_spark.catalog import load_table
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    o = load_table(spark, SF_DIR, "orders").withColumn(
        "maybe", F.when(F.col("o_orderkey") % 10 == 0, None).otherwise(F.col("o_orderkey"))
    )
    df2, obs = observed(o, "maybe", "o_custkey")
    df2.write.mode("overwrite").format("noop").save()
    m = obs.get
    total = o.count()
    assert m["n_rows"] == total
    assert m["null_o_custkey"] == 0
    assert m["null_maybe"] == o.where(F.col("maybe").isNull()).count()

    kept = quality_gate(o, "maybe")
    assert kept.count() == total - m["null_maybe"]


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """Runtime bloom-filter injection (SURVEY.md §4.2): when a shuffle
    join's small side carries a selective filter, Catalyst builds a bloom
    filter from its join keys and applies `might_contain` on the big side
    BEFORE the shuffle — at 100 TB that drops most of the fact exchange
    for selective dim filters, complementing DPP (which needs a
    partitioned fact, while this works on any layout). The application
    threshold defaults to 10 GB scans, so the test lowers it to observe
    the mechanism at fixture scale."""
    from kafka_hadoop_consumer_spark.catalog import load_table
    from tests.conftest import SF_DIR

    tuned = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "false",
    }
    saved = {k: spark.conf.get(k) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, SF_DIR, "lineitem")
        o = load_table(spark, SF_DIR, "orders").where(
            F.col("o_totalprice") > 400000
        )
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:1500]
        assert "might_contain" in plan, plan[:1500]
        n = joined.count()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    expected = (
        load_table(spark, SF_DIR, "lineitem")
        .join(
            load_table(spark, SF_DIR, "orders").where(
                F.col("o_totalprice") > 400000
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert n == expected  # the bloom filter is a pre-filter, never lossy


def test_cbo_statistics_drive_broadcast_selection(spark, tmp_path_factory):
    """Cost-based optimization from ANALYZE statistics: with table + column
    stats computed, Catalyst broadcasts the small side of a join WITHOUT
    an explicit hint and below-threshold detection comes from catalog
    stats, not file sizes — the planning mode a 100 TB warehouse runs in
    (file-size heuristics mislead once tables are partitioned/columnar;
    row-count + NDV stats are what CBO join reordering consumes)."""
    warehouse = str(tmp_path_factory.mktemp("cbo_wh"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS cbo_db LOCATION '{warehouse}'")
    try:
        spark.range(0, 500_000).selectExpr(
            "id AS k", "id % 100 AS grp", "id * 1.0 AS v"
        ).write.mode("overwrite").saveAsTable("cbo_db.big")
        spark.range(0, 200).selectExpr(
            "id AS k", "concat('d', id) AS name"
        ).write.mode("overwrite").saveAsTable("cbo_db.small")
        for t in ("cbo_db.big", "cbo_db.small"):
            spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")

        stats = spark.sql("DESC EXTENDED cbo_db.small").collect()
        stat_row = [r for r in stats if r.col_name == "Statistics"]
        assert stat_row and "rows" in stat_row[0].data_type, stats

        with_cbo = {
            "spark.sql.cbo.enabled": "true",
            "spark.sql.cbo.joinReorder.enabled": "true",
        }
        old = {k: spark.conf.get(k, None) for k in with_cbo}
        for k, v in with_cbo.items():
            spark.conf.set(k, v)
        try:
            plan = formatted_plan(
                spark.table("cbo_db.big").join(
                    spark.table("cbo_db.small"), "k"
                )
            )
        finally:
            for k, v in old.items():
                if v is not None:
                    spark.conf.set(k, v)
        assert "BroadcastHashJoin" in plan, plan
    finally:
        spark.sql("DROP DATABASE IF EXISTS cbo_db CASCADE")


def test_aqe_coalesces_small_shuffle_partitions(spark):
    """AQE partition coalescing: with shuffle.partitions cranked to 256,
    a small aggregate's post-shuffle read collapses to far fewer
    partitions at runtime — the knob that lets one global setting serve
    both the 100 TB shuffle and its 1 MB final reduction without manual
    repartition() calls."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "256")
    try:
        df = (
            spark.range(0, 100_000)
            .groupBy((F.col("id") % 50).alias("k"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "AQEShuffleRead" in plan and "coalesced" in plan, plan
        n_parts = df.rdd.getNumPartitions()
        assert n_parts < 256, n_parts
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_max_partition_bytes_controls_scan_splits(spark, tmp_path):
    """Input-split sizing: shrinking spark.sql.files.maxPartitionBytes
    multiplies the scan's partition count — the lever that matches scan
    parallelism to executor count when files are few but large (the
    openCostInBytes floor keeps tiny files from over-splitting)."""
    p = str(tmp_path / "wide")
    spark.range(0, 200_000).selectExpr(
        "id", "repeat('x', 64) AS pad"
    ).coalesce(1).write.parquet(p)
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_open = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
        coarse = spark.read.parquet(p).rdd.getNumPartitions()
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        fine = spark.read.parquet(p).rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", old_open)
    assert fine > coarse and fine >= 8, (coarse, fine)


def test_salted_join_reserved_column_and_map_columns(spark):
    """_salt is a reserved name (silently clobbering-then-dropping a
    business column of that name loses caller data), and the default
    whole-row salt must skip MapType columns — hash expressions reject
    maps (SPARK-27619), so a large side with an irrelevant map column
    crashed at plan time before the r9 fix."""
    import pytest

    fact = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z")], "k long, v string"
    )
    dim = spark.createDataFrame([(1, "one"), (2, "two")], "k long, name string")

    with pytest.raises(ValueError, match="_salt"):
        salted_join(fact.withColumnRenamed("v", "_salt"), dim, "k")
    with pytest.raises(ValueError, match="_salt"):
        salted_join(fact, dim.withColumnRenamed("name", "_salt"), "k")

    mfact = fact.withColumn(
        "attrs", F.create_map(F.lit("a"), F.col("v"))
    )
    out = salted_join(mfact, dim, "k", n_salts=4)
    assert sorted((r["k"], r["name"]) for r in out.collect()) == [
        (1, "one"), (1, "one"), (2, "two")
    ]
