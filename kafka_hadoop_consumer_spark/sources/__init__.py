"""Batch source/sink surface (SURVEY.md §2A A1/A6 secondary formats).

Streaming sources live in ``streaming.ingest``; this package provides the
batch analogues — parquet (primary, via catalog), CSV and JSON with
explicit schemas (never inference on large data: a schema-inference pass
is a full extra scan at 100 TB).
"""

from kafka_hadoop_consumer_spark.sources.batch import (
    corrupt_record_schema,
    read_csv,
    read_json,
    read_sequence_file,
    write_bucketed_table,
    write_partitioned_parquet,
    write_sequence_file,
)

__all__ = [
    "corrupt_record_schema",
    "read_csv",
    "read_json",
    "read_sequence_file",
    "write_bucketed_table",
    "write_partitioned_parquet",
    "write_sequence_file",
]
