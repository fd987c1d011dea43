"""Multimodal plumbing gates: the stubs are deterministic, so the Arrow
batch shapes (1→1 decode, 1→N frame explosion) are exactly checkable."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.queries import QUERIES
from tests.conftest import SF_DIR


def test_frame_sampling_counts_and_resize_bounds(spark):
    """Every doc must yield ceil(n_frames / stride) frames with the
    deterministic n_frames rule, and thumbnails never exceed the bound."""
    from kafka_hadoop_consumer_spark.catalog import load_table
    from kafka_hadoop_consumer_spark.queries.multimodal import (
        FRAME_STRIDE,
        RESIZE_MAX,
    )

    frames = QUERIES["q_multimodal_frames"](spark, SF_DIR)
    got = (
        frames.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("out_width").alias("w"),
             F.max("out_height").alias("h"))
        .collect()
    )
    d = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.length(F.encode("text", "UTF-8")).alias("blen")
    )
    expected = {
        r["doc_id"]: -(-(r["blen"] % 24 + 1) // FRAME_STRIDE) for r in d.collect()
    }
    assert {r["doc_id"]: r["n"] for r in got} == expected
    assert all(r["w"] <= RESIZE_MAX and r["h"] <= RESIZE_MAX for r in got)


def test_frame_sampling_is_pure_map_stage(spark):
    """Frame sampling must not shuffle — it's a scan → Arrow map stage."""
    from kafka_hadoop_consumer_spark.plans import n_shuffle_exchanges

    assert n_shuffle_exchanges(QUERIES["q_multimodal_frames"](spark, SF_DIR)) == 0
