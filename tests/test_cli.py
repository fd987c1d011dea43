"""Analytics CLI (kafka_hadoop_consumer_spark.cli): the reference user's
one-line replacement surface — list / run / explain / sql, each driven
through the argparse front door with a shared session."""

from __future__ import annotations

import glob

import pytest

from kafka_hadoop_consumer_spark.cli import build_parser, execute
from kafka_hadoop_consumer_spark.queries import QUERIES
from tests.conftest import SF_SMALL


def _exec(spark, *argv):
    return execute(build_parser().parse_args(list(argv)), spark)


def test_list_prints_every_registered_key(spark, capsys):
    assert _exec(spark, "list") == 0
    printed = set(capsys.readouterr().out.split())
    assert printed == set(QUERIES)


def test_run_writes_parquet(spark, tmp_path):
    out = str(tmp_path / "q1")
    assert _exec(
        spark, "run", "q_agg_groupby", "--sf-dir", SF_SMALL,
        "--out", out, "--format", "parquet",
    ) == 0
    back = spark.read.parquet(out)
    assert back.count() > 0
    assert "sum_qty" in back.columns


def test_run_show_needs_no_out(spark, capsys):
    assert _exec(
        spark, "run", "q_limit_topk", "--sf-dir", SF_SMALL,
        "--format", "show",
    ) == 0
    assert "rows" not in capsys.readouterr().err  # no traceback


def test_run_unknown_key_is_a_clean_error(spark):
    with pytest.raises(SystemExit, match="unknown key"):
        _exec(spark, "run", "q_nope", "--sf-dir", SF_SMALL,
              "--out", "/tmp/x", "--format", "parquet")


def test_explain_prints_physical_plan(spark, capsys):
    assert _exec(spark, "explain", "q_join_broadcast", "--sf-dir", SF_SMALL) == 0
    assert "Physical Plan" in capsys.readouterr().out


def test_sql_over_registered_views_to_csv(spark, tmp_path):
    out = str(tmp_path / "flags")
    assert _exec(
        spark, "sql",
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1",
        "--sf-dir", SF_SMALL, "--out", out, "--format", "csv",
    ) == 0
    files = glob.glob(out + "/*.csv")
    assert files
    header = open(files[0]).readline().strip()
    assert header == "l_returnflag,n"
