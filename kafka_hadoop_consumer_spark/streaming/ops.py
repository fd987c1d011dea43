"""Streaming operator surface (SURVEY.md §2B "Streaming-only operators"):
windowed aggregations, watermarks, dedup, joins, arbitrary state.

Each builder takes an (unbounded) events-shaped DataFrame —
``event_id long, ts timestamp, user_id long, event_type string,
value double`` — and returns the transformed streaming DataFrame; the
same builders work on batch DataFrames (one engine, two modes, SURVEY.md
§1.3). Verified in tests/test_streaming.py by replaying fixture data
through file sources into memory sinks and comparing against the batch
analogue.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark import cloudpickle
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

cloudpickle.register_pickle_by_value(sys.modules[__name__])


def tumbling_counts(df: DataFrame, window: str = "1 hour",
                    watermark: str = "10 minutes") -> DataFrame:
    """s_stream_tumbling: per-(window, event_type) counts/sums with a
    watermark so state for closed windows is dropped (bounded state at
    100 TB/day stream rates)."""
    return (
        df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("bucket"), "event_type", "n_events", "sum_value"
        )
    )


def sliding_counts(df: DataFrame, window: str = "1 hour", slide: str = "30 minutes",
                   watermark: str = "10 minutes") -> DataFrame:
    """s_stream_sliding: overlapping windows — each event lands in
    window/slide buckets."""
    return (
        df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("bucket"), "n_events")
    )


def session_counts(df: DataFrame, gap: str = "30 minutes",
                   watermark: str = "10 minutes") -> DataFrame:
    """s_stream_session: gap-based session windows per user (dynamic-width
    state, merged as events arrive)."""
    return (
        df.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(df: DataFrame, keys: list[str] | None = None,
                           watermark: str = "1 hour") -> DataFrame:
    """s_stream_dedup: drop duplicate event_ids arriving within the
    watermark horizon — state is bounded by the watermark, unlike a plain
    dropDuplicates on a stream which grows forever."""
    keys = keys or ["event_id"]
    out = df.withWatermark("ts", watermark)
    if hasattr(out, "dropDuplicatesWithinWatermark"):
        return out.dropDuplicatesWithinWatermark(keys)
    # Spark <3.5 fallback: plain dropDuplicates on the SAME keys keeps
    # the contract (a redelivered event_id with a re-stamped ts is still
    # dropped — keying on (keys + ts) would let it through), at the cost
    # of state that the watermark cannot evict. Loud, not silent:
    import warnings

    warnings.warn(
        "dropDuplicatesWithinWatermark unavailable (<Spark 3.5): falling "
        "back to unbounded-state dropDuplicates on the same keys",
        RuntimeWarning,
        stacklevel=2,
    )
    return out.dropDuplicates(keys)


def enrich_with_dim(stream: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """s_stream_join (stream-static): per-microbatch broadcast-able join
    against a static dimension — no streaming state at all."""
    return stream.join(F.broadcast(dim), on, "left")


def stream_stream_funnel(views: DataFrame, purchases: DataFrame,
                         horizon: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """s_stream_join (stream-stream): purchase within `horizon` after a
    view, same user — both sides watermarked so join state expires."""
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("v_ts"),
    ).withWatermark("v_ts", watermark)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", watermark)
    return v.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("p_ts") > F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select("view_id", "purchase_id", "user_id")


def _read_snapshot(spark, out_path: str) -> DataFrame:
    """Recovery-aware read of a snapshot maintained by ``_swap_snapshot``.

    If a crash interrupted a prior swap, ``out_path`` may be missing
    while a sibling holds the data: a fully-staged dir (Spark's
    ``_SUCCESS`` marker proves the write committed) supersedes the
    ``.old`` snapshot it was about to replace; an incomplete staging
    dir means the old snapshot is still current. After recovery, a
    genuinely missing path (true first batch) raises
    AnalysisException exactly like a plain read."""
    import shutil

    staged, old = out_path + ".staging", out_path + ".old"
    if not os.path.isdir(out_path):
        if os.path.exists(os.path.join(staged, "_SUCCESS")):
            os.rename(staged, out_path)
        elif os.path.isdir(old):
            os.rename(old, out_path)
    shutil.rmtree(staged, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    return spark.read.parquet(out_path)


def _swap_snapshot(merged: DataFrame, out_path: str) -> None:
    """Crash-safe replacement of a parquet snapshot that ``merged``'s
    own plan reads from (r9 review: overwrite-in-place truncated the
    only copy of the accumulated state BEFORE the write committed, so
    a crash mid-write made the checkpoint replay read an empty path,
    fall into its first-batch branch, and permanently lose every
    previously accumulated row).

    localCheckpoint (not cache: best-effort, an evicted partition
    would recompute from lineage and re-read the dir mid-replacement —
    the run_incremental_near_dedup precedent) severs the plan from
    ``out_path``; the new snapshot is fully staged to a sibling dir,
    then swapped via two renames. Every crash point leaves a complete
    snapshot recoverable by ``_read_snapshot``."""
    import shutil

    staged, old = out_path + ".staging", out_path + ".old"
    merged = merged.localCheckpoint()
    merged.write.mode("overwrite").parquet(staged)
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(out_path):
        os.rename(out_path, old)
    os.rename(staged, out_path)
    shutil.rmtree(old, ignore_errors=True)


def run_foreach_batch_upsert(
    df: DataFrame,
    out_path: str,
    checkpoint: str,
    key: str,
    order_col: str,
) -> None:
    """Streaming upsert via foreachBatch: each micro-batch is merged into a
    keep-latest-per-key snapshot at ``out_path``.

    The foreachBatch escape hatch is how Structured Streaming reaches
    sinks without native streaming support (JDBC merges, dedup snapshots,
    multi-table fanout): the batch is an ordinary DataFrame, and the
    checkpoint still provides exactly-once batch ids. The merge itself is
    the q_dedup_keyed pattern (row_number over key by recency).
    """
    from pyspark.sql import Window

    def merge(batch: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch.sparkSession
        try:
            current = _read_snapshot(spark, out_path)
            merged = current.unionByName(batch)
        except AnalysisException:
            # Missing path AFTER swap recovery = genuinely the first
            # batch. Anything else (transient IO, permissions, corrupt
            # footer) PROPAGATES and fails the batch — treating it as
            # "first batch" would overwrite the accumulated snapshot
            # with this batch alone and silently lose every prior key.
            merged = batch
        w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
        latest = (
            merged.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        # stage-then-swap: replay of this batch id must find the PRIOR
        # snapshot intact if the rewrite dies mid-flight
        _swap_snapshot(latest, out_path)

    q = (
        df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


_COUNTER_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def _counter_fn(key: tuple, batches: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState body: running per-user counters across
    micro-batches (the arbitrary-stateful pattern: sessionization,
    counters, custom CDC)."""
    n, total = state.get if state.exists else (0, 0.0)  # .get is a property
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def _make_ttl_counter_fn(ttl_ms: int):
    """Counter body with idle-key eviction: keys quiet for ttl_ms have
    their state removed (bounding the state store by ACTIVE keys instead
    of all keys ever seen)."""

    def fn(key: tuple, batches: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return fn


def transform_with_state_available() -> bool:
    """Feature-detect Spark 4's transformWithStateInPandas (SURVEY.md §7 R6).

    The API exists in PySpark 4.1 but its streaming runner imports
    google.protobuf, which is not usable in this container — probed at
    runtime so the engine degrades to applyInPandasWithState (identical
    semantics for the patterns used here) instead of crashing mid-query.
    """
    try:
        from pyspark.sql.streaming import StatefulProcessor  # noqa: F401
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def stateful_user_counters(df: DataFrame, ttl_minutes: int | None = None) -> DataFrame:
    """s_stream_stateful: arbitrary per-key state via applyInPandasWithState.

    Emits the updated (user_id, n_events, total_value) each micro-batch;
    state lives in the checkpointed state store (the analogue of the
    reference's ZK offsets — but holding operator state, SURVEY.md §3.2).

    ``ttl_minutes`` bounds the state store for always-on deployments:
    keys idle longer than the TTL are evicted (processing-time timeout),
    so state scales with ACTIVE keys, not with every user_id ever seen —
    without it, an unbounded-cardinality key column grows the state
    store and checkpoint forever. ``None`` (bounded replay harnesses,
    tests) keeps counters exact over the whole run.

    Operational caveat (measured on PySpark 4.1.2): with a processing-
    time timeout configured, ``trigger(availableNow=True)`` does NOT
    terminate after draining input — the engine keeps scheduling
    micro-batches (~1/sec) so pending timeouts can fire. Drive TTL mode
    with the default trigger plus ``processAllAvailable()``/``stop()``
    in bounded harnesses; reserve availableNow for ``ttl_minutes=None``.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    if ttl_minutes is None:
        fn, conf = _counter_fn, GroupStateTimeout.NoTimeout
    else:
        fn = _make_ttl_counter_fn(ttl_minutes * 60_000)
        conf = GroupStateTimeout.ProcessingTimeTimeout
    return (
        df.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_COUNTER_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=conf,
        )
    )


def run_continuous_rollup(
    df: DataFrame,
    out_path: str,
    checkpoint: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Continuous aggregate (the hypertable materialized-rollup pattern):
    maintain a per-(window, event_type) rollup table that stays correct as
    new micro-batches arrive and across restarts.

    Spark-first shape: the aggregation itself lives in the STREAM (state
    store holds the running per-bucket totals; update output mode emits
    only buckets a batch changed), and foreachBatch REPLACES those
    buckets in the snapshot — replace-not-add is what makes a replayed
    batch id idempotent, because the emitted rows are full recomputed
    totals, not deltas. At 100 TB the snapshot rewrite becomes a
    partition-overwrite (or MERGE on a table format); the stream side
    already only ships changed buckets.
    """
    rolled = (
        df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket"), "event_type",
            "n_events", "total_value",
        )
    )

    def replace_buckets(batch: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch.sparkSession
        batch = batch.cache()
        try:
            current = _read_snapshot(spark, out_path)
            keep = current.join(
                batch.select("bucket", "event_type").distinct(),
                ["bucket", "event_type"],
                "left_anti",
            )
            merged = keep.unionByName(batch)
        except AnalysisException:
            # Missing path AFTER swap recovery = first batch. A
            # transient read error must FAIL the batch instead: falling
            # back to `merged = batch` would overwrite the rollup with
            # only the buckets this batch touched, truncating all other
            # history — and the state store would never re-emit the
            # lost buckets.
            merged = batch
        # stage-then-swap (r9 review): overwrite-in-place truncated the
        # rollup BEFORE the write committed, so a crash mid-write lost
        # every bucket outside this batch on replay
        _swap_snapshot(merged, out_path)
        batch.unpersist()

    q = (
        rolled.writeStream.outputMode("update")
        .foreachBatch(replace_buckets)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_incremental_near_dedup(
    docs: DataFrame, corpus_dir: str, log_dir: str, checkpoint: str
) -> None:
    """Streaming NEAR-dedup ingestion — the LLM-corpus dedup gate running
    in the ingestion path: each micro-batch of (doc_id, text) is
    classified against the accumulated corpus as ``exact_dup`` (md5
    fingerprint already present), ``near_dup`` (MinHash LSH band-bucket
    collision with an accepted doc — the q_dedup_minhash banding, so
    only genuinely-similar docs collide), or ``new``. Duplicates WITHIN
    a micro-batch are also caught (min doc_id keeps; later same-batch
    copies classify as dups), so a bulk backfill arriving as one batch
    cannot smuggle copies past the gate. Verdicts append to
    ``log_dir``; only NEW docs' signatures join the corpus state at
    ``corpus_dir``, so later batches dedup against everything accepted
    so far (the streaming face of q_dedup_incremental, upgraded from
    exact-only to near-dup).

    State is a parquet signature table ((doc_id, fp, band, bucket) —
    N_BANDS rows per accepted doc, constant-size per doc regardless of
    text length), the same mergeable-compact-state discipline as the
    continuous-aggregate sink.

    Exactly-once is enforced IN the sink, not just by the checkpoint:
    both outputs land in ``batch_id=N`` partition directories with
    overwrite semantics, and classification reads only ``batch_id < N``
    corpus state — so a replay of batch N (failure after the writes but
    before the checkpoint commit) overwrites its own partitions and
    classifies against exactly the same prior corpus, never against its
    own first-attempt signatures (which would have re-classified its new
    docs as exact_dups of themselves)."""
    from kafka_hadoop_consumer_spark.queries.dedup import (
        N_BANDS,
        ROWS_PER_BAND,
        minhash_signatures,
        shingles,
    )

    def sig_table(d: DataFrame) -> DataFrame:
        sig = minhash_signatures(shingles(d))
        band_structs = [
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col(f"m{b * ROWS_PER_BAND + k}") for k in range(ROWS_PER_BAND)]
                ).alias("bucket"),
            )
            for b in range(N_BANDS)
        ]
        return sig.select(
            "doc_id", F.explode(F.array(*band_structs)).alias("bb")
        ).select("doc_id", "bb.band", "bb.bucket")

    def classify(batch: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch.sparkSession
        fps = batch.select("doc_id", F.md5("text").alias("fp"))
        bands = sig_table(batch).join(fps, "doc_id")
        bands.cache().count()
        try:
            # batch_id is the partition column of corpus_dir; < batch_id
            # makes a replayed batch blind to its own first attempt.
            corpus = spark.read.parquet(corpus_dir).where(
                F.col("batch_id") < batch_id
            )
            have_corpus = True
        except AnalysisException:
            # Missing path / no partitions yet = genuinely empty corpus.
            # Anything else (corrupt parquet, permissions) PROPAGATES and
            # fails the batch — silently accepting every doc as new on a
            # read error would poison the corpus.
            have_corpus = False
        if have_corpus:
            exact = (
                fps.join(corpus.select("fp").distinct(), "fp")
                .select("doc_id")
                .distinct()
            )
            near = (
                bands.join(
                    corpus.select("band", "bucket").distinct(), ["band", "bucket"]
                )
                .select("doc_id")
                .distinct()
                .join(exact, "doc_id", "left_anti")
            )
        else:
            exact = fps.select("doc_id").where(F.lit(False))
            near = exact
        # Intra-batch duplicates (the same-batch blind spot): a doc whose
        # fingerprint or band-bucket collides with an EARLIER doc of the
        # SAME batch (min doc_id = deterministic keeper) is a dup even
        # when the corpus has seen neither — bulk backfills deliver
        # duplicate bursts inside one micro-batch, and classifying only
        # against prior batches would accept every copy as "new".
        a_fp = fps.select(F.col("doc_id").alias("a_id"), "fp")
        b_fp = fps.select(F.col("doc_id").alias("b_id"), "fp")
        intra_exact = (
            a_fp.join(b_fp, "fp")
            .where(F.col("a_id") > F.col("b_id"))
            .select(F.col("a_id").alias("doc_id"))
            .distinct()
        )
        a_bb = bands.select(F.col("doc_id").alias("a_id"), "band", "bucket")
        b_bb = bands.select(F.col("doc_id").alias("b_id"), "band", "bucket")
        intra_near = (
            a_bb.join(b_bb, ["band", "bucket"])
            .where(F.col("a_id") > F.col("b_id"))
            .select(F.col("a_id").alias("doc_id"))
            .distinct()
        )
        exact = exact.union(intra_exact).distinct()
        near = near.union(intra_near).distinct().join(
            exact, "doc_id", "left_anti"
        )
        verdicts = (
            fps.select("doc_id")
            .join(exact.withColumn("v", F.lit("exact_dup")), "doc_id", "left")
            .join(near.withColumn("w", F.lit("near_dup")), "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("v", "w", F.lit("new")).alias("verdict"),
            )
        )
        # localCheckpoint truncates the lineage: caching is best-effort,
        # and a re-evaluated verdict plan would otherwise re-read the
        # corpus AFTER this batch's own signatures landed — classifying
        # the batch's new docs as duplicates of themselves.
        verdicts = verdicts.localCheckpoint()
        # Idempotent per-batch sinks: hive-style batch_id=N partition dirs
        # with overwrite, so a replayed batch replaces its first attempt
        # instead of appending duplicate rows (batch_id comes back as the
        # partition column on read).
        verdicts.write.mode("overwrite").parquet(
            os.path.join(log_dir, f"batch_id={batch_id}")
        )
        new_sigs = bands.join(
            verdicts.where(F.col("verdict") == "new").select("doc_id"), "doc_id"
        )
        new_sigs.write.mode("overwrite").parquet(
            os.path.join(corpus_dir, f"batch_id={batch_id}")
        )
        bands.unpersist()

    q = (
        docs.writeStream.outputMode("append")
        .foreachBatch(classify)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
