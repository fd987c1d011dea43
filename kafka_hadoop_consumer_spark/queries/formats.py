"""Source/sink format-parity keys: CSV, JSON-lines, and ORC roundtrips.

The reference consumed Kafka byte payloads and wrote text/SequenceFile
part-files; downstream jobs re-read those files with per-format parsers
(§2A A5/A6). These keys prove the engine's batch format matrix end-to-end
*at the value level*: each writes a fixture projection to the format under
test, reads it back with an explicit schema (never inference — a schema
inference pass over 100 TB is a full extra scan), and aggregates; the
DuckDB oracle computes the same aggregate from the original parquet, so
any roundtrip corruption (quoting, escaping, type mangling, precision
loss) breaks the hash.

Format choice per key is deliberate:
- CSV carries only integer/string columns (line-oriented CSV cannot hold
  free text with embedded newlines without multiLine=true, which kills
  input splitting at scale — documented, not worked around);
- JSON-lines carries the full text column (JSON escapes newlines, so the
  file stays splittable);
- ORC is the binary columnar cross-check (doubles roundtrip bit-exact).

Writes land under /tmp/khcs_formats/<sf>/ with mode=overwrite, so reruns
are idempotent and concurrent SFs don't collide.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.catalog import load_table
from kafka_hadoop_consumer_spark.queries.registry import persist_tracked, query


def _out_dir(sf_dir: str, fmt: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"/tmp/khcs_formats/{tag}/{fmt}"


@query(
    "q_source_csv_roundtrip",
    oracle="""
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def q_source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink→source roundtrip (header, explicit schema on re-read).

    Carries (doc_id, lang, source, n_chars) — ints and newline-free
    strings, the columns CSV can hold while staying line-splittable.
    The re-read aggregate must equal the oracle's aggregate over the
    original parquet, proving write quoting + read parsing are lossless."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    path = _out_dir(sf_dir, "csv")
    d.write.mode("overwrite").option("header", "true").csv(path)
    back = (
        spark.read.schema("doc_id bigint, lang string, source string, n_chars bigint")
        .option("header", "true")
        .csv(path)
    )
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@query(
    "q_source_json_roundtrip",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_len,
           min(md5(text)) AS min_md5
    FROM documents
    GROUP BY source
    """,
)
def q_source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink→source roundtrip INCLUDING the free-text column —
    JSON escaping keeps embedded newlines/quotes inside one physical
    line, so the file stays splittable at 100 TB. The min(md5(text))
    probe catches any escaping corruption byte-for-byte."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    path = _out_dir(sf_dir, "json")
    d.write.mode("overwrite").json(path)
    back = spark.read.schema("doc_id bigint, text string, source string").json(path)
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_len"),
        F.min(F.md5("text")).alias("min_md5"),
    )


@query(
    "q_source_orc_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price,
           max(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink→source roundtrip — the second columnar format besides
    parquet (both ship in Spark; the reference era's Hive pipelines wrote
    ORC). Doubles roundtrip bit-exact through ORC, so max(o_totalprice)
    is compared UNROUNDED (a selection, not arithmetic) while the sum is
    rounded like every cross-engine double aggregate."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = _out_dir(sf_dir, "orc")
    o.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "q_source_partitioned_roundtrip",
    oracle="""
    SELECT event_type, count(*) AS n_events,
           round(sum(value), 2) AS sum_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE event_type IN ('view', 'purchase')
    GROUP BY event_type
    """,
)
def q_source_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-layout partitioned write + partition-PRUNED re-read: events
    land partitioned by event_type; the re-read filters two types, so
    the scan must touch only those directories (partition pruning — the
    layout decision that turns a 100 TB scan into a per-type read;
    pruning is plan-asserted in tests/test_plans.py).

    The aggregate matches the oracle over the ORIGINAL parquet, proving
    the partition column round-trips losslessly through the directory
    encoding (partition values live in paths, not data files)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = _out_dir(sf_dir, "partitioned")
    e.write.mode("overwrite").partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path).where(
        F.col("event_type").isin("view", "purchase")
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.count_distinct("user_id").alias("n_users"),
    )


@query(
    "q_source_codec_roundtrip",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(md5(text)) AS min_md5
    FROM documents
    GROUP BY lang
    """,
)
def q_source_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet compression-codec roundtrip: documents written with zstd
    (the 100 TB default — snappy-class speed at gzip-class ratio; codec
    is a per-write knob, not a format property) and re-read; the md5
    probe proves decompression is byte-lossless. At scale the codec
    choice moves both storage cost and scan throughput, so it belongs
    to the engine's tested surface, not ops folklore."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "n_chars"
    )
    path = _out_dir(sf_dir, "zstd")
    d.write.mode("overwrite").option("compression", "zstd").parquet(path)
    back = spark.read.parquet(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min(F.md5("text")).alias("min_md5"),
    )


@query(
    "q_source_text_roundtrip",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct
    FROM documents
    """,
)
def q_source_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text sink→source roundtrip — the reference's actual output
    family (§2A A6 wrote text part-files; log pipelines still do). One
    line per document (fixture text is newline-free word salad,
    FIXTURES.md); the re-read line set must reproduce the source column
    exactly: line count, total chars, and the distinct-md5 cardinality
    all recomputed by the oracle from the original parquet.

    Scale shape: text is line-splittable, so the re-read parallelizes
    per HDFS block exactly like the reference's TextInputFormat; no
    schema inference (the one ``value`` column is the schema)."""
    out = _out_dir(sf_dir, "text")
    d = load_table(spark, sf_dir, "documents")
    d.select("text").write.mode("overwrite").text(out)
    lines = spark.read.text(out)
    return lines.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
        F.count_distinct(F.md5("value")).alias("n_distinct"),
    )


@query(
    "q_source_bucketed_roundtrip",
    oracle="""
    SELECT o.o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l.l_extendedprice), 2) AS total_price
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def q_source_bucketed_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table roundtrip + SHUFFLE-FREE co-located join: both fact
    tables are written bucketed (8 buckets, sorted) on their join key,
    then joined bucket-to-bucket — the layout you pre-pay once at 100 TB
    so every subsequent orderkey join of these tables skips its exchange
    entirely (tests/test_plans.py asserts the join has zero shuffles).
    The aggregate must match the oracle's plain-parquet join, proving the
    bucketed write/read path is value-lossless, not just plan-pretty.

    The merge hint pins SortMergeJoin (a broadcast of the small fixture
    orders table would trivially also avoid the shuffle — but then the
    key would demonstrate nothing about bucketing)."""
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_") or "sf"
    t_li, t_ord = f"b_lineitem_{tag}", f"b_orders_{tag}"
    base = f"/tmp/khcs_bucketed/{tag}"
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    for name, df, key in ((t_li, li, "l_orderkey"), (t_ord, o, "o_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .format("parquet")
            .option("path", f"{base}/{name}")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    joined = spark.table(t_li).join(
        spark.table(t_ord).hint("merge"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


@query(
    "q_source_xml_roundtrip",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
)
def q_source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink→source roundtrip — Spark 4's NATIVE XML data source (no
    external spark-xml package), the interchange format B2B/EDI and
    legacy-feed ingestion still runs on. Orders are written as one
    ``<order>`` element per row, re-read with an EXPLICIT schema (no
    inference pass — at 100 TB schema inference is a full extra scan),
    and the re-read rows must reproduce the original parquet values:
    the oracle recomputes the same grouped profile (exact integer cents
    — doubles survive the text roundtrip because Spark writes
    shortest-roundtrip decimal strings) from the source table.

    Scale shape: each row is a self-contained element, so the XML reader
    splits files by element boundaries and parallelizes per file/block;
    the profile agg is one hash shuffle of |status x priority| groups.
    """
    out = _out_dir(sf_dir, "xml")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    (
        o.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "orders")
        .option("rowTag", "order")
        .save(out)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "order")
        .schema(
            "o_orderkey LONG, o_orderstatus STRING, "
            "o_orderpriority STRING, o_totalprice DOUBLE"
        )
        .load(out)
    )
    return back.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias(
            "total_cents"
        ),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


BINFILE_MOD = 7  # doc_id % 7 == 0 → written out as a standalone binary file


@query(
    "q_source_binaryfile",
    oracle=f"""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents WHERE doc_id % {BINFILE_MOD} = 0
    """,
)
def q_source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` source — the ingestion path for multimodal corpora
    (images/audio/PDF dumps arrive as one opaque file per asset, not as
    rows): a deterministic sample of documents is materialized as
    standalone ``.bin`` files, re-read through
    ``spark.read.format("binaryFile")`` (schema: path, modificationTime,
    length, content BINARY), and verified value-lossless — the doc id
    recovered from the file path, the byte length and the md5 of the
    binary content matching what the oracle computes from the original
    parquet column.

    The file-creation step is driver-side by necessity (a SOURCE test
    starts from files that exist outside Spark; ~1/7 of fixture docs,
    bounded) — the measured path is the distributed re-read: one task
    per file/block, content never touches Python.

    Scale shape: binaryFile lists and splits by file; pair it with
    ``pathGlobFilter`` / partitioned directory layouts for pruning, and
    decode via mapInPandas downstream (q_multimodal_binary)."""
    out = _out_dir(sf_dir, "binfile")
    d = load_table(spark, sf_dir, "documents")
    sample = (
        d.where(F.col("doc_id") % BINFILE_MOD == 0)
        .select("doc_id", "text")
        .collect()
    )
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for row in sample:
        with open(os.path.join(out, f"doc_{row['doc_id']}.bin"), "wb") as f:
            f.write(row["text"].encode("utf-8"))
    back = spark.read.format("binaryFile").load(out)
    return back.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )


@query(
    "q_source_schema_evolution",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_missing_chars,
           CAST(sum(coalesce(n_chars, 0)) AS BIGINT) AS total_chars
    FROM (
      SELECT lang, NULL::BIGINT AS n_chars
      FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT lang, n_chars FROM documents WHERE doc_id % 2 = 1)
    GROUP BY lang
    """,
)
def q_source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution on READ: two batches of the same dataset
    written with DIFFERENT schemas (an early batch before the n_chars
    column existed, a later batch with it) live in one directory;
    ``mergeSchema=true`` reconciles them into the union schema with
    NULLs for the missing column — how a years-old data lake keeps being
    queryable as its schema grows, without rewriting old partitions.
    The oracle recomputes the same union-with-nulls from the source
    table, proving no rows or values are lost or invented.

    Scale shape: schema merge is a FOOTER-only driver-side operation
    (file footers, not data, are read to reconcile) — row scanning is
    unchanged columnar pruning per file; files missing a projected
    column materialize NULL vectors at zero I/O cost."""
    out = _out_dir(sf_dir, "evolve")
    d = load_table(spark, sf_dir, "documents")
    shutil.rmtree(out, ignore_errors=True)
    (
        d.where(F.col("doc_id") % 2 == 0)
        .select("doc_id", "lang")
        .write.mode("overwrite")
        .parquet(f"{out}/batch=old")
    )
    (
        d.where(F.col("doc_id") % 2 == 1)
        .select("doc_id", "lang", "n_chars")
        .write.mode("overwrite")
        .parquet(f"{out}/batch=new")
    )
    back = spark.read.option("mergeSchema", "true").parquet(out)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("n_chars").isNull(), 1).otherwise(0)).alias(
            "n_missing_chars"
        ),
        F.sum(F.coalesce("n_chars", F.lit(0))).alias("total_chars"),
    )


@query(
    "q_source_dpp_join",
    oracle="""
    WITH dim AS (
      SELECT event_type,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events
      WHERE event_type IN ('purchase', 'signup')
      GROUP BY event_type)
    SELECT e.event_type, d.n_users,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value), 2) AS sum_value
    FROM events e JOIN dim d ON d.event_type = e.event_type
    GROUP BY e.event_type, d.n_users
    """,
)
def q_source_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning as a first-class, value-checked key:
    the fact table is laid out partitioned by event_type, and joining it
    against a FILTERED dim makes Spark prune fact partitions at RUNTIME
    from the dim's join keys (the `dynamicpruning` subquery in the scan
    — plan-asserted in tests/test_plans.py). At 100 TB this is the
    difference between scanning 2 of N partitions and all of them, and
    it needs no static predicate on the fact side — the dim filter alone
    drives the pruning.

    The dim here is itself derived (per-type distinct-user counts,
    filtered to two types) so the pruning values genuinely arrive at
    runtime; the oracle recomputes the same join from the original
    un-partitioned table, proving pruning changed I/O, not answers."""
    out = _out_dir(sf_dir, "dpp")
    e = load_table(spark, sf_dir, "events")
    e.select("event_id", "user_id", "event_type", "value").write.mode(
        "overwrite"
    ).partitionBy("event_type").parquet(out)
    fact = spark.read.parquet(out)
    dim = (
        e.where(F.col("event_type").isin("purchase", "signup"))
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .withColumnRenamed("event_type", "d_type")
    )
    return (
        fact.join(dim, fact.event_type == F.col("d_type"))
        .groupBy("event_type", "n_users")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


DIRTY_MOD = 50  # every 50th row is corrupted in the written CSV


@query(
    "q_source_csv_dirty",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, n_chars,
             doc_id % {DIRTY_MOD} = 0 AS is_bad
      FROM documents)
    SELECT
      CAST(count(*) AS BIGINT) AS n_rows,
      CAST(sum(CASE WHEN is_bad THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
      CAST(sum(CASE WHEN NOT is_bad THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
      CAST(sum(CASE WHEN NOT is_bad THEN n_chars END) AS BIGINT)
          AS clean_total_chars,
      CAST(count(DISTINCT CASE WHEN NOT is_bad THEN lang END) AS BIGINT)
          AS clean_langs
    FROM d
    """,
)
def q_source_csv_dirty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch dead-letter handling for malformed input — the PERMISSIVE-mode
    contract every production CSV ingest depends on: a CSV is written with
    every {DIRTY_MOD}th row deliberately corrupted (wrong arity /
    non-numeric field), re-read with a _corrupt_record column, and split
    into clean rows vs quarantine. The counts and clean-side aggregates
    hash-check against the oracle's model of which rows were corrupted —
    proving malformed lines neither vanish nor poison parsed columns
    (the batch face of the streaming quarantine test in
    tests/test_streaming.py).

    Scale shape: corruption detection is scan-side (no shuffle); the
    split is two filters over one cached read; only the 5-column audit
    aggregate shuffles."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    path = _out_dir(sf_dir, "csv_dirty")
    lines = d.select(
        F.when(
            F.col("doc_id") % DIRTY_MOD == 0,
            F.concat_ws(",", F.col("doc_id"), F.lit("oops\",broken")),
        )
        .otherwise(F.concat_ws(",", "doc_id", "lang", "n_chars"))
        .alias("value")
    )
    lines.write.mode("overwrite").text(path)
    back = (
        spark.read.schema(
            "doc_id bigint, lang string, n_chars bigint, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    back = persist_tracked(back)
    bad = F.col("_corrupt_record").isNotNull()
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(bad, 1).otherwise(0)).alias("n_quarantined"),
        F.sum(F.when(~bad, 1).otherwise(0)).alias("n_clean"),
        F.sum(F.when(~bad, F.col("n_chars"))).alias("clean_total_chars"),
        F.count_distinct(F.when(~bad, F.col("lang"))).alias("clean_langs"),
    )


COMPACT_TARGET_ROWS = 1000  # rows per planned compaction output group

# The driver (and the pytest mirror) always run oracles at sf0.01; the
# oracle glob is built from the SAME _out_dir helper the Spark side uses,
# so the two can never drift apart. DuckDB's read_parquet fails loudly on
# a zero-match glob ("No files found"), so a standalone oracle run
# without the engine pass errors instead of passing against nothing; a
# STALE compact_in from an earlier run is caught by the hash compare
# (the Spark side re-writes the dir every invocation).
_COMPACT_ORACLE_GLOB = _out_dir("/root/testdata/sf0.01", "compact_in") + "/*/*.parquet"


@query(
    "q_source_compaction_plan",
    oracle=f"""
    WITH files AS (
      SELECT regexp_extract(filename, '([^/]+/[^/]+)$', 1) AS f,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM read_parquet('{_COMPACT_ORACLE_GLOB}', filename=true)
      GROUP BY 1),
    keyed AS (
      SELECT f, n_rows, split_part(f, '/', 1) AS part_dir
      FROM files),
    planned AS (
      SELECT part_dir, f, n_rows,
             coalesce(sum(n_rows) OVER (
               PARTITION BY part_dir ORDER BY n_rows DESC, f
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum_before
      FROM keyed)
    SELECT part_dir,
           CAST(cum_before // {COMPACT_TARGET_ROWS} AS BIGINT) AS grp,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(n_rows) AS BIGINT) AS total_rows
    FROM planned GROUP BY part_dir, grp
    """,
)
def q_source_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning — the lakehouse OPTIMIZE primitive:
    events are written partitioned with deliberately many small files,
    per-file row counts are recovered from the scan's _metadata column
    (no extra listing pass), and files are banded into merge groups by a
    size-ordered running-sum cut against a target group size (the
    q_pack_sequences discipline over FILES instead of tokens). The plan —
    per (partition, group): file count and total rows — is hash-checked
    against DuckDB reading the SAME physical files by name, so the
    file-accounting itself is verified, not just the arithmetic.

    NOTE the oracle reads files the SPARK side writes: the comparison
    protocol always executes the Spark query before its oracle, so the
    fragmented table exists by the time DuckDB lists it; a standalone
    oracle run without the engine pass would see no files.

    Scale shape: the planning input is one row per FILE (millions of
    rows for a petabyte table — trivial); the per-partition running-sum
    window never crosses partition dirs. Executing the plan is then one
    repartition-per-group write, not planned here."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = _out_dir(sf_dir, "compact_in")
    e.repartition(8).write.mode("overwrite").partitionBy("event_type").parquet(
        path
    )
    files = (
        spark.read.parquet(path)
        .select(
            F.regexp_extract(
                F.col("_metadata.file_path"), r"([^/]+/[^/]+)$", 1
            ).alias("f")
        )
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    keyed = files.withColumn("part_dir", F.split("f", "/").getItem(0))
    w = (
        Window.partitionBy("part_dir")
        .orderBy(F.col("n_rows").desc(), "f")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = keyed.withColumn(
        "cum_before", F.coalesce(F.sum("n_rows").over(w), F.lit(0))
    )
    return planned.groupBy(
        "part_dir",
        F.expr(f"cum_before DIV {COMPACT_TARGET_ROWS}").alias("grp"),
    ).agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_rows").alias("total_rows"),
    )


@query(
    "q_source_pysink_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_date
    FROM orders
    WHERE o_orderkey % 8 = 0
    """,
)
def q_source_pysink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource WRITER roundtrip (§2A A6 inside the same
    Spark-4 DataSource API the kafka_sim READER uses): a filtered orders
    projection is written through the ``arrow_sink`` source — per-task
    Arrow-batch staging files, commit messages back to the driver,
    all-or-nothing driver-side publish with a _SUCCESS manifest (the
    FileOutputCommitter-v1 protocol the reference delegated to Hadoop) —
    then re-read from the committed files and returned ROW-LEVEL, so the
    value hash proves the sink is lossless for ints, strings, doubles
    (bit-exact pass-through, unrounded) and dates.

    Scale shape: writer tasks never coordinate (unique staging names;
    retries can't collide), commit traffic is bytes per task, and the
    data plane stays in Arrow — no row-at-a-time Python. The published
    dir is plain parquet, directly readable by any engine."""
    from kafka_hadoop_consumer_spark.sources import pysink

    pysink.register(spark)
    src = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 8 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias(
                "o_date"
            ),
        )
    )
    path = _out_dir(sf_dir, "pysink")
    src.write.format("arrow_sink").mode("overwrite").option("path", path).save()
    return spark.read.parquet(path).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_date"
    )
