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
        # metadata rides THROUGH the decode as a pass-through column
        # (r9 review: dropping it forced a per-row shuffle join back to
        # documents, contradicting the no-shuffle-until-aggregate shape)
        T.StructField("source", T.StringType()),
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
                "source": pdf["source"],
                "byte_len": lens,
                "width": (lens % 640 + 1).astype("int32"),
                "height": (lens % 480 + 1).astype("int32"),
                "n_frames": (lens % 24 + 1).astype("int32"),
                "checksum": payload.map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()[:16]
                ),
            }
        )


@query(
    "q_multimodal_binary",
    oracle="""
    WITH dec AS (
      SELECT doc_id, source,
             octet_length(encode(text)) AS blen,
             substring(sha256(text), 1, 16) AS checksum
      FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(blen) AS BIGINT) AS total_bytes,
           round(avg(blen % 640 + 1), 2) AS avg_width,
           round(avg(blen % 480 + 1), 2) AS avg_height,
           CAST(count(DISTINCT checksum) AS BIGINT) AS n_distinct
    FROM dec GROUP BY source
    """,
)
def q_multimodal_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload pipeline: opaque bytes + typed metadata → Arrow-batched
    mapInPandas "decode" → per-item features, aggregated per source.

    Documents stand in for media files (text bytes as payload). The
    decode is a stub (_fake_decode); everything around it — binary
    column, batch iterator, schema contract, downstream aggregation — is
    real and scale-shaped (decode is partition-parallel, no shuffle until
    the final small aggregate).

    SQL-oracled as of r4 (was rows-only): the stub's feature derivation
    is a pure byte function (length mods + sha256), so DuckDB replays it
    exactly — the hash check covers the Arrow plumbing end-to-end, not
    just row counts. The averages divide exact integer sums (< 2^53) so
    no cross-engine sum-order drift; rounded 2dp regardless.
    """
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        "source",
    )
    # source rides through the decode UDF — joining it back afterwards
    # shuffled every decoded row and re-scanned documents (r9 review)
    decoded = payloads.mapInPandas(_fake_decode, schema=_DECODE_SCHEMA)
    return (
        decoded
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("byte_len").cast("long").alias("total_bytes"),
            F.round(F.avg("width"), 2).alias("avg_width"),
            F.round(F.avg("height"), 2).alias("avg_height"),
            F.countDistinct("checksum").alias("n_distinct"),
        )
    )


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)

FRAME_STRIDE = 4       # keep every 4th frame
RESIZE_MAX = 224       # thumbnail bound (max edge)


def _fake_frame_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB frame sampler/resizer (no ffmpeg/PIL in this container).

    Real code would demux the payload and decode every FRAME_STRIDE-th
    frame, resizing to RESIZE_MAX. The stub derives a deterministic
    frame count + dimensions from the payload bytes (same rule as
    _fake_decode) and emits one OUTPUT ROW PER SAMPLED FRAME — the
    1→N Arrow batch explosion a real sampler produces.
    """
    import hashlib

    for pdf in batches:
        rows: dict[str, list] = {k.name: [] for k in _FRAME_SCHEMA.fields}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            blen = len(payload)
            n_frames = blen % 24 + 1
            w, h = blen % 640 + 1, blen % 480 + 1
            scale = min(1.0, RESIZE_MAX / max(w, h))
            for idx in range(0, n_frames, FRAME_STRIDE):
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(idx)
                rows["out_width"].append(max(1, int(w * scale)))
                rows["out_height"].append(max(1, int(h * scale)))
                # payload + DECIMAL-STRING frame index (not raw int bytes):
                # printable suffix keeps the formula expressible in the
                # DuckDB oracle (sha256 there is VARCHAR-only and a
                # blob→VARCHAR cast escapes bytes rather than passing them)
                rows["frame_checksum"].append(
                    hashlib.sha256(bytes(payload) + str(idx).encode())
                    .hexdigest()[:12]
                )
        yield pd.DataFrame(rows).astype(
            {"frame_idx": "int32", "out_width": "int32", "out_height": "int32"}
        )


@query(
    "q_multimodal_frames",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text,
             octet_length(encode(text)) % 24 + 1 AS n_frames,
             octet_length(encode(text)) % 640 + 1 AS w,
             octet_length(encode(text)) % 480 + 1 AS h
      FROM documents),
    s AS (
      SELECT doc_id, text, w, h,
             least(1.0, CAST({RESIZE_MAX} AS DOUBLE) / greatest(w, h)) AS scale,
             u.idx
      FROM d, UNNEST(range(0, n_frames, {FRAME_STRIDE})) AS u(idx))
    SELECT doc_id,
           CAST(idx AS INTEGER) AS frame_idx,
           CAST(greatest(1, CAST(trunc(w * scale) AS INTEGER)) AS INTEGER)
               AS out_width,
           CAST(greatest(1, CAST(trunc(h * scale) AS INTEGER)) AS INTEGER)
               AS out_height,
           substring(sha256(text || CAST(idx AS VARCHAR)), 1, 12)
               AS frame_checksum
    FROM s
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling + resize over binary "video" payloads: every
    {FRAME_STRIDE}-th frame, thumbnailed to ≤{RESIZE_MAX}px — the
    mapInPandas shape where each input row explodes into N output rows
    inside the Arrow batch (demux → sample → resize).

    Scale shape: pure map stage — partition-parallel, zero shuffle; at
    100 TB the frame stream is written straight to the sink partitioned
    by whatever downstream training wants. Determinism of the stub lets
    tests assert exact sampled-frame counts (tests/test_multimodal.py).

    SQL-oracled as of r4 (was rows-only): the stub's 1→N frame explosion
    and resize arithmetic replay exactly in DuckDB (UNNEST(range(...))
    mirrors the stride loop; trunc/greatest mirror Python int()/max();
    the scalar float ops are IEEE-identical), so the driver hash-checks
    the full per-frame output, not just the row count.
    """
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(_fake_frame_sample, schema=_FRAME_SCHEMA)


FPS_MS = 40        # stub video frame period (25 fps)
AUDIO_HOP_MS = 37  # stub audio chunk hop (co-prime with the frame period,
# so frame/chunk boundaries drift like real AV streams do)


@query(
    "q_multimodal_av_sync",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, octet_length(encode(text)) AS blen FROM documents),
    frames AS (
      SELECT doc_id, CAST(u.idx AS INTEGER) AS frame_idx,
             u.idx * {FPS_MS} AS frame_ts_ms
      FROM (SELECT doc_id, blen % 24 + 1 AS n_frames FROM d),
           UNNEST(range(0, n_frames, {FRAME_STRIDE})) AS u(idx)),
    chunks AS (
      SELECT doc_id, CAST(u.idx AS INTEGER) AS chunk_idx,
             u.idx * {AUDIO_HOP_MS} AS chunk_ts_ms
      FROM (SELECT doc_id, blen % 50 + 1 AS n_chunks FROM d),
           UNNEST(range(0, n_chunks)) AS u(idx))
    SELECT doc_id, frame_idx, chunk_idx, frame_ts_ms - chunk_ts_ms AS lag_ms
    FROM (
      SELECT f.doc_id, f.frame_idx, c.chunk_idx, f.frame_ts_ms, c.chunk_ts_ms,
             row_number() OVER (PARTITION BY f.doc_id, f.frame_idx
                                ORDER BY c.chunk_ts_ms DESC) AS rn
      FROM frames f JOIN chunks c
        ON c.doc_id = f.doc_id AND c.chunk_ts_ms <= f.frame_ts_ms)
    WHERE rn = 1
    """,
)
def q_multimodal_av_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio/video stream alignment — the multimodal-ingest sync step:
    every sampled video frame (the REAL mapInPandas output of
    q_multimodal_frames' stub demuxer, {FPS_MS} ms period) is as-of
    joined to the latest stub audio chunk at-or-before it
    ({AUDIO_HOP_MS} ms hop, co-prime so boundaries drift), emitting the
    per-frame sync lag a training pipeline needs before fusing the two
    modalities into one example.

    Scale shape: both sides derive map-side from the same corpus scan
    (frames via the Arrow mapInPandas stub, chunks via a declarative
    1→N sequence explode); the as-of core is the generic
    ``operators.temporal.asof_join`` — equi-join on doc_id + backward
    inequality + one winner window per frame, the same bounded shape as
    q_join_asof (never a per-doc cross product; chunk 0 sits at t=0 so
    the inner join drops nothing). All arithmetic is integer-exact, so
    the oracle replays the stub bit-for-bit."""
    from kafka_hadoop_consumer_spark.operators.temporal import asof_join

    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    frames = (
        payloads.mapInPandas(_fake_frame_sample, schema=_FRAME_SCHEMA)
        .select(
            "doc_id",
            "frame_idx",
            (F.col("frame_idx").cast("long") * FPS_MS).alias("frame_ts_ms"),
        )
        .withColumn(
            "frame_key",
            F.col("doc_id") * 100 + F.col("frame_idx"),  # frame_idx < 24
        )
    )
    chunks = payloads.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0), (F.octet_length("payload") % 50 + 1).cast("int") - 1
            )
        ).alias("chunk_idx"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        (F.col("chunk_idx").cast("long") * AUDIO_HOP_MS).alias("chunk_ts_ms"),
    )
    synced = asof_join(
        frames,
        chunks,
        by="doc_id",
        left_ts="frame_ts_ms",
        right_ts="chunk_ts_ms",
        left_key="frame_key",
        direction="backward",
    )
    return synced.select(
        "doc_id",
        "frame_idx",
        "chunk_idx",
        (F.col("frame_ts_ms") - F.col("chunk_ts_ms")).alias("lag_ms"),
    )
