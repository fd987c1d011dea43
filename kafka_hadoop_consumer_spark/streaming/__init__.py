"""Streaming/ingestion layer: the reference's Kafka→HDFS pipeline
re-expressed as Structured Streaming (SURVEY.md §2A, §3.2-E3), plus the
streaming operator surface (windows, watermarks, dedup, joins, stateful).
"""

from kafka_hadoop_consumer_spark.streaming.ingest import (
    SourceSpec,
    build_reader,
    decode_payload,
    kafka_source_options,
    run_ingest,
)

__all__ = [
    "SourceSpec",
    "build_reader",
    "decode_payload",
    "kafka_source_options",
    "run_ingest",
]
