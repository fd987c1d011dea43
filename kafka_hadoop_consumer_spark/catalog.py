"""Table catalog: load the fixture star schema from a scale-factor directory.

Tables per TESTDATA.md / FIXTURES.md: TPC-H-ish star schema plus an
``events`` stream-shaped table and ``documents`` / ``embeddings`` for the
LLM-pipeline operators. All reads are plain parquet scans so Catalyst's
vectorized reader, predicate pushdown, and column pruning apply (SURVEY.md
§4.2 — verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at every realistic scale factor
# (region=5, nation=25 rows always; supplier/part grow slowly). Used by the
# join operators to pin broadcast strategy deterministically.
BROADCAST_DIMS = ("region", "nation", "supplier")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table as a DataFrame (lazy parquet scan).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    (Spark timestamps are µs). We read it as raw nanos
    (``legacy.parquet.nanosAsLong``) and truncate to a ``timestamp_ntz``
    with exact integer FLOOR division — ``(ts - pmod(ts, 1000)) div 1000``:
    double division rounds up for ns%1000 ≥ ~875, and a bare ``div``
    truncates toward zero, so a pre-epoch (negative) nanosecond would
    round UP by 1µs; both would disagree with the oracle's
    ``CAST(ts AS TIMESTAMP)`` floor-truncation. pmod is always in
    [0, 999], so the numerator is an exact multiple of 1000 and the
    division is exact for any sign.
    """
    from kafka_hadoop_consumer_spark.session import ensure_session_defaults

    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Every query path goes through here — pin determinism-critical configs
    # even when the session was built by an external driver.
    ensure_session_defaults(spark)
    if name == "events":
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts",
                F.timestamp_micros(
                    F.expr("(ts - pmod(ts, 1000)) div 1000")
                ).cast("timestamp_ntz"),
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read the whole catalog as {name: DataFrame}."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` entry points.

    Mirrors the DuckDB oracle's pre-registered views (__spark_entry__.py
    contract) so SQL-string operators read identical inputs.
    """
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
