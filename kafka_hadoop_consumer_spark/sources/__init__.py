"""Batch source/sink surface (SURVEY.md §2A A1/A6 secondary formats).

Streaming sources live in ``streaming.ingest``; this package provides the
batch analogues — parquet (primary, via catalog), CSV and JSON with
explicit schemas (never inference on large data: a schema-inference pass
is a full extra scan at 100 TB).
"""

from kafka_hadoop_consumer_spark.sources.batch import (
    read_csv,
    read_json,
    write_partitioned_parquet,
)

__all__ = ["read_csv", "read_json", "write_partitioned_parquet"]
