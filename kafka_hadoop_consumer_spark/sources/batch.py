"""Batch CSV/JSON readers + partitioned parquet writer.

CSV/JSON exist for ingest parity (SURVEY.md §2B "Sources/sinks"): the
reference consumed opaque byte payloads that downstream jobs parsed; in
this engine those payloads land as CSV/JSON files and are read with
explicit schemas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(spark: SparkSession, path: str, schema: str,
             header: bool = True, sep: str = ",") -> DataFrame:
    """Schema-explicit CSV scan (no inference pass)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def corrupt_record_schema(schema: str, corrupt_col: str) -> str:
    """Append the quarantine column to a DDL schema — the PERMISSIVE
    dead-letter contract shared by this batch JSON reader and the
    streaming decode path (streaming/ingest.py): the corrupt-record
    column must be part of the DECLARED schema or the parser has nowhere
    to put the raw line (from_json PERMISSIVE otherwise yields an
    all-null struct with no signal)."""
    return f"{schema}, {corrupt_col} string"


def read_json(spark: SparkSession, path: str, schema: str,
              mode: str = "PERMISSIVE",
              corrupt_col: str | None = None) -> DataFrame:
    """Schema-explicit JSON-lines scan (no inference pass).

    ``mode`` is the malformed-record policy — the knob that decides what
    a 100 TB ingest does when a producer ships a bad line:
    PERMISSIVE (default) nulls the row out and, when ``corrupt_col`` is
    given, quarantines the raw line in that column for a dead-letter
    audit; DROPMALFORMED silently drops; FAILFAST aborts the job.
    tests/test_sources.py exercises all three."""
    reader = spark.read
    if corrupt_col:
        schema = corrupt_record_schema(schema, corrupt_col)
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.schema(schema).option("mode", mode).json(path)


def write_partitioned_parquet(df: DataFrame, path: str,
                              partition_by: list[str] | None = None,
                              mode: str = "overwrite") -> None:
    """Parquet sink with optional hive-style partition layout — the layout
    that enables partition pruning on re-read (SURVEY.md §4.2 DPP)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_sequence_file(df: DataFrame, path: str,
                        key_col: str | None = None,
                        value_col: str = "payload") -> None:
    """Hadoop SequenceFile sink — the reference's literal output format
    (kafka-hadoop-consumer wrote SequenceFile/Text parts via
    TextOutputFormat/SequenceFileOutputFormat; §2A A6).

    DataFrame writers don't speak SequenceFile, so this is the one
    justified RDD drop-down: a narrow map to (key, value) string pairs
    then ``saveAsSequenceFile`` (org.apache.hadoop.io.Text via the
    default converters). No shuffle — one part file per partition,
    exactly the reference's map-task layout.

    Coercion is explicit, not str(): a NULL payload lands as the empty
    string (not the literal "None") and a binary payload is UTF-8
    decoded (not repr'd as "bytearray(b'...')") — str() would silently
    corrupt both in the lake. Missing columns fail HERE, not as a
    KeyError inside an executor lambda.
    """
    need = [value_col] + ([key_col] if key_col else [])
    missing = [c for c in need if c not in df.columns]
    if missing:
        raise KeyError(
            f"write_sequence_file: column(s) {missing} not in {df.columns}"
        )

    def to_text(v) -> str:
        if v is None:
            return ""
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).decode("utf-8", "replace")
        return str(v)

    if key_col is None:
        pairs = df.rdd.map(lambda r: ("", to_text(r[value_col])))
    else:
        pairs = df.rdd.map(
            lambda r, k=key_col: (to_text(r[k]), to_text(r[value_col]))
        )
    pairs.saveAsSequenceFile(path)


def read_sequence_file(spark: SparkSession, path: str) -> DataFrame:
    """Read back a SequenceFile of Text pairs as (key, value) strings."""
    rdd = spark.sparkContext.sequenceFile(path)
    return spark.createDataFrame(rdd, "key string, value string")


def write_bucketed_table(df: DataFrame, table: str, key: str,
                         n_buckets: int = 32,
                         sort: bool = True,
                         mode: str = "overwrite") -> None:
    """Bucketed (and bucket-sorted) managed table — the write-time
    pre-shuffle that makes every later equi-join/agg on ``key``
    shuffle-free (SortMergeJoin with zero Exchange when both sides share
    the bucketing; plan-asserted in tests/test_scale_patterns.py).

    At 100 TB this is the storage layout for fact tables that join on a
    stable key every day: pay the shuffle once at ingest, never again.
    n_buckets should be sized so each bucket file lands near the
    cluster's target split size (128-512 MB).
    """
    writer = df.write.bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.mode(mode).saveAsTable(table)
