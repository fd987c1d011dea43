"""Multimodal column operators (SURVEY.md §2B; build plan M4).

Convention: a multimodal value is a struct column —
``struct(content: binary|string, meta: struct(...typed fields))`` — so
media travels WITH its typed metadata through any relational operator,
and Catalyst prunes the (large) content field when only metadata is
referenced.

The container ships no image/audio codecs, so the decode step is a
clearly-marked deterministic STUB inside an otherwise REAL mapInPandas
pipeline: schema contract, Arrow batching, partition-parallel execution
are exactly what a production decoder would use — only the bytes→pixels
call is fake (see _fake_decode).
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd
from pyspark import cloudpickle
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Ship UDF bodies by value — executor Python workers don't have this
# package on sys.path (see udfs.py).
cloudpickle.register_pickle_by_value(sys.modules[__name__])

from kafka_hadoop_consumer_spark.catalog import load_table
from kafka_hadoop_consumer_spark.queries.registry import query


@query(
    "q_multimodal_struct",
    oracle="""
    SELECT doc_id,
           length(text) AS content_len,
           lang AS meta_lang,
           source AS meta_source,
           concat('{"lang":"', lang, '","n_chars":', CAST(n_chars AS VARCHAR), '}') AS meta_json
    FROM documents
    """,
)
def q_multimodal_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into a multimodal struct(content, meta), then access
    fields by dot-path and serialize meta to canonical JSON.

    Catalyst's nested-schema pruning means reading only ``doc.meta.lang``
    from parquet-at-rest would never fetch ``content`` — the property that
    makes struct-typed media columns viable at 100 TB.
    """
    d = load_table(spark, sf_dir, "documents")
    packed = d.select(
        "doc_id",
        F.struct(
            F.col("text").alias("content"),
            F.struct(
                F.col("lang"), F.col("source"), F.col("n_chars")
            ).alias("meta"),
        ).alias("doc"),
    )
    return packed.select(
        "doc_id",
        F.length("doc.content").cast("long").alias("content_len"),
        F.col("doc.meta.lang").alias("meta_lang"),
        F.col("doc.meta.source").alias("meta_source"),
        F.to_json(
            F.struct(
                F.col("doc.meta.lang").alias("lang"),
                F.col("doc.meta.n_chars").alias("n_chars"),
            )
        ).alias("meta_json"),
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decoder (no codec libraries in this container).

    A real implementation would call PIL/ffmpeg per payload here — the
    Arrow batch shape, schema contract, and partition parallelism are
    identical. The fake derives deterministic "dimensions" from payload
    bytes so tests can assert the plumbing end-to-end.
    """
    import hashlib

    for pdf in batches:
        payload = pdf["payload"]
        lens = payload.str.len().astype("int32")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": lens,
                "width": (lens % 640 + 1).astype("int32"),
                "height": (lens % 480 + 1).astype("int32"),
                "n_frames": (lens % 24 + 1).astype("int32"),
                "checksum": payload.map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()[:16]
                ),
            }
        )


@query("q_multimodal_binary")  # no oracle: mapInPandas plumbing op (R4)
def q_multimodal_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload pipeline: opaque bytes + typed metadata → Arrow-batched
    mapInPandas "decode" → per-item features, aggregated per source.

    Documents stand in for media files (text bytes as payload). The
    decode is a stub (_fake_decode); everything around it — binary
    column, batch iterator, schema contract, downstream aggregation — is
    real and scale-shaped (decode is partition-parallel, no shuffle until
    the final small aggregate).
    """
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        "source",
    )
    decoded = payloads.select("doc_id", "payload").mapInPandas(
        _fake_decode, schema=_DECODE_SCHEMA
    )
    return (
        decoded.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("byte_len").cast("long").alias("total_bytes"),
            F.round(F.avg("width"), 2).alias("avg_width"),
            F.round(F.avg("height"), 2).alias("avg_height"),
            F.countDistinct("checksum").alias("n_distinct"),
        )
    )
