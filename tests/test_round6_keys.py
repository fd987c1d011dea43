"""Property tests for the round-6 registry additions — invariants the
DuckDB hash gate cannot express (micro-batch counts, per-row bounds,
conservation laws). Oracle equality itself is covered by the
whole-registry sweep in tests/test_oracle.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.queries import QUERIES
from tests.conftest import SF_DIR


def test_continuous_agg_spans_multiple_microbatches(spark):
    """The streaming run must actually be incremental: several
    micro-batches (maxFilesPerTrigger=1 over the multi-file landing),
    each contributing rows, with the windowed state carried between
    them — one big batch would make the equivalence claim vacuous."""
    from kafka_hadoop_consumer_spark.queries import continuous

    out = QUERIES["q_stream_continuous_agg"](spark, SF_DIR)
    # result equals the batch recompute over the SAME landing files
    landing = continuous.LAST_LANDING["q_stream_continuous_agg"]
    batch = (
        spark.read.parquet(landing)
        .groupBy(
            F.date_trunc("hour", "ts").alias("bucket_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    assert out.exceptAll(batch).count() == 0
    assert batch.exceptAll(out).count() == 0
    n_batches = continuous.LAST_BATCHES.get("q_stream_continuous_agg")
    assert n_batches is not None and n_batches >= 2, (
        f"expected multiple data micro-batches, got {n_batches}"
    )


def test_cdc_upsert_streams_multiple_batches_and_matches_batch_lww(spark):
    from kafka_hadoop_consumer_spark.catalog import load_table
    from kafka_hadoop_consumer_spark.queries import continuous

    out = QUERIES["q_stream_cdc_upsert"](spark, SF_DIR).cache()
    try:
        assert continuous.LAST_BATCHES["q_stream_cdc_upsert"] >= 2
        e = load_table(spark, SF_DIR, "events")
        # one state row per entity; change counts conserve the stream
        assert out.count() == e.select("user_id").distinct().count()
        n = out.agg(F.sum("n_changes")).collect()[0][0]
        assert n == e.count()
        # the winner really is each user's max-(ts, event_id) event
        w = e.groupBy("user_id").agg(
            F.max(F.struct("ts", "event_id")).alias("m")
        )
        bad = out.join(w, "user_id").where(F.col("last_ts") != F.col("m.ts"))
        assert bad.count() == 0
    finally:
        out.unpersist()


def test_sessionize_streams_multiple_batches_and_partitions_events(spark):
    from kafka_hadoop_consumer_spark.catalog import load_table
    from kafka_hadoop_consumer_spark.queries import continuous

    out = QUERIES["q_stream_sessionize"](spark, SF_DIR).cache()
    try:
        assert continuous.LAST_BATCHES["q_stream_sessionize"] >= 2
        e = load_table(spark, SF_DIR, "events")
        # sessions partition the event stream (merges lose nothing)
        assert out.agg(F.sum("n_events")).collect()[0][0] == e.count()
        # streamed session merging == batch native session_window
        batch = QUERIES["q_win_session_native"](spark, SF_DIR).select(
            "user_id", "session_start", "n_events"
        )
        got = out.select("user_id", "session_start", "n_events")
        assert got.exceptAll(batch).count() == 0
        assert batch.exceptAll(got).count() == 0
    finally:
        out.unpersist()


def test_stream_dedup_lands_each_event_twice_and_emits_once(spark):
    from kafka_hadoop_consumer_spark.catalog import load_table
    from kafka_hadoop_consumer_spark.queries import continuous

    out = QUERIES["q_stream_dedup_exact"](spark, SF_DIR).cache()
    try:
        n = load_table(spark, SF_DIR, "events").count()
        # the landing really contains every event twice...
        landing = continuous.LAST_LANDING["q_stream_dedup_exact"]
        landed = spark.read.parquet(landing)
        assert landed.count() == 2 * n
        # ...across multiple micro-batches, and exactly once survives
        assert continuous.LAST_BATCHES["q_stream_dedup_exact"] >= 2
        assert out.count() == n
        assert out.select("event_id").distinct().count() == n
    finally:
        out.unpersist()


def test_av_sync_one_row_per_frame_and_nonnegative_lag(spark):
    sync = QUERIES["q_multimodal_av_sync"](spark, SF_DIR).cache()
    try:
        frames = QUERIES["q_multimodal_frames"](spark, SF_DIR)
        assert sync.count() == frames.count()  # inner as-of drops nothing
        assert sync.where(F.col("lag_ms") < 0).count() == 0
        # a frame inside the audio span lags less than one hop
        from kafka_hadoop_consumer_spark.queries.multimodal import AUDIO_HOP_MS

        in_span = sync.join(
            sync.groupBy("doc_id").agg(F.max("chunk_idx").alias("mx")), "doc_id"
        ).where(F.col("chunk_idx") < F.col("mx"))
        assert in_span.where(F.col("lag_ms") >= AUDIO_HOP_MS).count() == 0
    finally:
        sync.unpersist()


def test_decision_stump_conservation_and_bounds(spark):
    from kafka_hadoop_consumer_spark.catalog import load_table

    stump = QUERIES["q_ml_decision_stump"](spark, SF_DIR)
    n = load_table(spark, SF_DIR, "embeddings").count()
    rows = stump.collect()
    assert len(rows) == 3  # one winning split per candidate feature
    for r in rows:
        assert r.n_le + r.n_gt == n, r  # every vector lands on one side
        assert r.n_le > 0 and r.n_gt > 0, r
        assert 0.0 <= r.gini <= 0.9, r  # 10-class gini < 1 - 1/10


def test_hll_manual_error_within_sketch_regime(spark):
    from kafka_hadoop_consumer_spark.queries.aggregates import HLL_M

    rows = QUERIES["q_agg_hll_manual"](spark, SF_DIR).collect()
    assert len(rows) >= 2
    for r in rows:
        assert 0 < r.n_regs <= HLL_M
        assert r.hll_estimate > 0
        # raw-estimator regime: expected sigma 1.04/sqrt(m) ~ 6.5%;
        # 3-sigma gate catches a broken hash/register pipeline without
        # flaking on legitimate sketch noise
        assert r.rel_error < 0.2, r


def test_boost_round_weight_conservation(spark):
    from kafka_hadoop_consumer_spark.catalog import load_table
    from kafka_hadoop_consumer_spark.queries.quality import BOOST_W_MISS

    res = QUERIES["q_ml_boost_round"](spark, SF_DIR)
    n = load_table(spark, SF_DIR, "embeddings").count()
    rows = res.collect()
    assert len(rows) == 3
    miss = rows[0].r1_miss
    assert 0 < miss < n  # round 1 is neither perfect nor useless
    for r in rows:
        # total weight = n + (W-1)·misses, conserved on every feature
        assert r.w_le + r.w_gt == n + (BOOST_W_MISS - 1) * miss, r
        assert r.r1_miss == miss and r.r1_feature == rows[0].r1_feature


def test_pq_adc_dist_lies_on_exact_integer_grid(spark):
    """The r6 PQ oracle conversion rests on one invariant: every ADC
    distance is an exact integer in the PQ_SCALE² domain (that is what
    makes rankings order-independent across engines). The shipped
    adc_dist is that integer divided by PQ_SCALE² — the division itself
    is inexact but IEEE-deterministic, so the value must round-trip:
    rescaling and re-dividing reproduces it bit-for-bit."""
    from kafka_hadoop_consumer_spark.queries.similarity import PQ_SCALE

    s2 = F.lit(PQ_SCALE * PQ_SCALE)
    res = QUERIES["q_sim_pq_topk"](spark, SF_DIR)
    off_grid = res.where(
        F.col("adc_dist") != F.round(F.col("adc_dist") * s2, 0) / s2
    )
    assert off_grid.count() == 0


def test_round_half_away_matches_sql_semantics():
    import numpy as np

    from kafka_hadoop_consumer_spark.queries.similarity import (
        _round_half_away,
    )

    a = np.array([0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 2.4, -2.4])
    # half away from zero (SQL ROUND), NOT banker's (np.round)
    assert _round_half_away(a).tolist() == [1, 2, 3, -1, -2, -3, 2, -2]


def test_range_search_radius_and_selectivity(spark):
    from kafka_hadoop_consumer_spark.queries.similarity import RANGE_COS

    res = QUERIES["q_sim_range_search"](spark, SF_DIR).cache()
    try:
        assert res.where(F.col("cos_sim") < RANGE_COS).count() == 0
        # n_in_range is the per-query row count, replicated on each row
        per_q = res.groupBy("q_id").agg(F.count(F.lit(1)).alias("n"))
        bad = res.join(per_q, "q_id").where(F.col("n_in_range") != F.col("n"))
        assert bad.count() == 0
    finally:
        res.unpersist()


def test_stream_join_interval_crosses_batches_and_bounds(spark):
    """The stream-stream join must span several micro-batches (state
    genuinely buffered on both sides) and every emitted pair must sit
    inside the 1-hour interval (0 <= mins_before <= 60)."""
    from kafka_hadoop_consumer_spark.queries import continuous

    out = QUERIES["q_stream_join_interval"](spark, SF_DIR).cache()
    try:
        assert continuous.LAST_BATCHES["q_stream_join_interval"] >= 2
        n = out.count()
        assert n > 0
        bad = out.where(
            (F.col("mins_before") < 0) | (F.col("mins_before") > 60)
        )
        assert bad.count() == 0
        # no duplicate emissions: (purchase, click) pairs are unique
        assert out.select("purchase_id", "click_id").distinct().count() == n
    finally:
        out.unpersist()


def test_graph_cc_components_are_edge_consistent(spark):
    """Independent CC invariants (stronger than the oracle hash alone):
    both endpoints of every edge share a component, the component id is
    the min member id, and sizes partition the node set."""
    from kafka_hadoop_consumer_spark.catalog import load_table
    from kafka_hadoop_consumer_spark.queries.graph import copurchase_edges

    out = QUERIES["q_graph_cc"](spark, SF_DIR).cache()
    try:
        e = load_table(spark, SF_DIR, "events")
        edges = copurchase_edges(e)
        lab = out.select("user_id", "component_id")
        viol = (
            edges.join(lab.withColumnRenamed("user_id", "u"), "u")
            .withColumnRenamed("component_id", "cu")
            .join(lab.withColumnRenamed("user_id", "v"), "v")
            .where(F.col("cu") != F.col("component_id"))
        )
        assert viol.count() == 0
        mins = out.groupBy("component_id").agg(
            F.min("user_id").alias("mn"), F.count(F.lit(1)).alias("n")
        )
        assert mins.where(F.col("mn") != F.col("component_id")).count() == 0
        # sizes match and node set is exactly the graph's node set
        assert (
            out.join(mins, "component_id")
            .where(F.col("component_size") != F.col("n"))
            .count()
            == 0
        )
        nodes = (
            edges.select(F.col("u").alias("user_id"))
            .union(edges.select(F.col("v").alias("user_id")))
            .distinct()
        )
        assert out.count() == nodes.count()
    finally:
        out.unpersist()


def test_graph_bfs_layers_are_parented(spark):
    """BFS invariants: exactly BFS_SOURCES dist-0 rows (the sources
    themselves), (src, node) states unique, and every dist-h node has a
    neighbor at dist h-1 (the frontier-parent property that makes
    first-visit == shortest-hop)."""
    from kafka_hadoop_consumer_spark.catalog import load_table
    from kafka_hadoop_consumer_spark.queries.graph import (
        BFS_SOURCES,
        copurchase_edges,
    )

    out = QUERIES["q_graph_bfs"](spark, SF_DIR).cache()
    try:
        zero = out.where(F.col("dist") == 0)
        assert zero.count() == BFS_SOURCES
        assert zero.where(F.col("src_id") != F.col("user_id")).count() == 0
        n = out.count()
        assert out.select("src_id", "user_id").distinct().count() == n
        e = load_table(spark, SF_DIR, "events")
        edges = copurchase_edges(e)
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        child = out.where(F.col("dist") > 0)
        parented = child.join(
            sym.withColumnRenamed("u", "user_id"), "user_id"
        ).join(
            out.select(
                "src_id",
                F.col("user_id").alias("v"),
                F.col("dist").alias("pdist"),
            ),
            ["src_id", "v"],
        ).where(F.col("pdist") == F.col("dist") - 1)
        orphans = child.join(
            parented.select("src_id", "user_id").distinct(),
            ["src_id", "user_id"],
            "left_anti",
        )
        assert orphans.count() == 0
    finally:
        out.unpersist()


def test_graph_cc_converges_in_log_rounds(spark):
    """The large-star/small-star loop must DETECT its fixpoint well
    under the round cap (the O(log V) claim), never exit by cap — a
    cap exit would silently return unconverged components."""
    from kafka_hadoop_consumer_spark.queries import graph

    QUERIES["q_graph_cc"](spark, SF_DIR).count()
    rounds = graph.CC_LAST_ROUNDS.get("q_graph_cc")
    assert rounds is not None and rounds < graph.CC_MAX_ROUNDS, rounds
    # the fixture co-purchase graph is dense: fixpoint within a few rounds
    assert rounds <= 6, rounds


def test_late_r6_streaming_keys_span_multiple_microbatches(spark):
    """q_stream_static_join / q_stream_sliding_agg / q_stream_late_drop
    must actually run >= 2 data micro-batches (one big batch would make
    the cross-batch-state claim vacuous); for late_drop, the late path
    must genuinely fire: the emitted table misses rows the full batch
    recompute over the same landing would count."""
    from kafka_hadoop_consumer_spark.queries import continuous

    for key in ("q_stream_static_join", "q_stream_sliding_agg"):
        QUERIES[key](spark, SF_DIR).count()
        assert continuous.LAST_BATCHES[key] >= 2, key

    out = QUERIES["q_stream_late_drop"](spark, SF_DIR).cache()
    try:
        assert continuous.LAST_BATCHES["q_stream_late_drop"] >= 2
        landing = continuous.LAST_LANDING["q_stream_late_drop"]
        landed = spark.read.parquet(landing)
        emitted = out.agg(F.sum("n_events")).collect()[0][0]
        assert emitted < landed.count(), (
            "no rows were late-dropped or window-elided; the key is not "
            "exercising the watermark contract"
        )
    finally:
        out.unpersist()
