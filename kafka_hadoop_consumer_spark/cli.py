"""Analytics CLI — run any registered operator (or ad-hoc SQL) against a
scale-factor directory and write the result, so a reference user has a
one-line replacement for their report jobs (SURVEY.md §3.2 entry points).

    python -m kafka_hadoop_consumer_spark.cli list
    python -m kafka_hadoop_consumer_spark.cli run q_agg_groupby \
        --sf-dir /root/testdata/sf0.01 --out /tmp/q1 --format parquet
    python -m kafka_hadoop_consumer_spark.cli explain q_join_broadcast \
        --sf-dir /root/testdata/sf0.01
    python -m kafka_hadoop_consumer_spark.cli sql \
        "SELECT l_returnflag, count(*) n FROM lineitem GROUP BY 1" \
        --sf-dir /root/testdata/sf0.01 --out /tmp/flags --format csv

`sql` registers the ten tables as temp views (same loader/configs as the
operator path, so determinism pins like UTC + nanosAsLong apply) and runs
any Spark SQL — the catch-all for queries outside the packaged inventory.
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

SINK_FORMATS = ("parquet", "csv", "json", "show")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="kafka_hadoop_consumer_spark.cli",
        description="Run packaged analytics operators or ad-hoc SQL",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered operator keys")

    run = sub.add_parser("run", help="run one operator key")
    run.add_argument("key")
    run.add_argument("--sf-dir", required=True)
    run.add_argument("--out", default=None,
                     help="output path (omit with --format show)")
    run.add_argument("--format", choices=SINK_FORMATS, default="show")
    run.add_argument("--mode", default="overwrite",
                     help="save mode (overwrite/append/error)")

    ex = sub.add_parser("explain", help="print an operator's physical plan")
    ex.add_argument("key")
    ex.add_argument("--sf-dir", required=True)

    sql = sub.add_parser("sql", help="run ad-hoc SQL over the tables")
    sql.add_argument("statement")
    sql.add_argument("--sf-dir", required=True)
    sql.add_argument("--out", default=None)
    sql.add_argument("--format", choices=SINK_FORMATS, default="show")
    sql.add_argument("--mode", default="overwrite")
    return p


def _sink(df: DataFrame, fmt: str, out: str | None, mode: str) -> None:
    if fmt == "show":
        df.show(50, truncate=False)
        return
    if not out:
        raise SystemExit(f"--format {fmt} requires --out")
    w = df.write.mode(mode)
    if fmt == "csv":
        w = w.option("header", "true")
    w.format(fmt).save(out)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the ten tables as temp views for the `sql` subcommand,
    through the same loader the operators use (pins session defaults)."""
    from kafka_hadoop_consumer_spark.catalog import load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def execute(args: argparse.Namespace, spark: SparkSession) -> int:
    """Dispatch a parsed command on an existing session (unit-testable)."""
    from kafka_hadoop_consumer_spark.queries import QUERIES

    if args.cmd == "list":
        for key in sorted(QUERIES):
            print(key)
        return 0
    if args.cmd == "explain":
        QUERIES[args.key](spark, args.sf_dir).explain("formatted")
        return 0
    if args.cmd == "run":
        if args.key not in QUERIES:
            raise SystemExit(
                f"unknown key {args.key!r} — `list` shows the inventory"
            )
        _sink(QUERIES[args.key](spark, args.sf_dir), args.format,
              args.out, args.mode)
        return 0
    register_views(spark, args.sf_dir)
    _sink(spark.sql(args.statement), args.format, args.out, args.mode)
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from kafka_hadoop_consumer_spark import get_spark

    return execute(args, get_spark(app_name="analytics-cli"))


if __name__ == "__main__":
    raise SystemExit(main())
