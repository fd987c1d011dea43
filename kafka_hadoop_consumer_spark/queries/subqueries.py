"""Subquery operators (SURVEY.md §2B "Subqueries") — SQL entry point E2.

Catalyst rewrites these declaratively: uncorrelated scalars become
single-row broadcast joins, IN becomes left-semi, and correlated scalars
are decorrelated into aggregated joins (RewriteCorrelatedScalarSubquery) —
so each runs as ordinary distributed joins at 100 TB, never per-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_hadoop_consumer_spark.catalog import load_table
from kafka_hadoop_consumer_spark.queries.registry import query


def _sql(spark: SparkSession, sf_dir: str, tables: tuple[str, ...], text: str) -> DataFrame:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(text)


_SCALAR = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT round(avg(o_totalprice) * 1.5, 4)
                          FROM orders)
"""
# round(threshold, 4): the repo-wide determinism discipline — comparing
# raw doubles against an UNROUNDED double aggregate lets a last-ulp
# accumulation-order difference between the engines flip membership of
# a value lying on the threshold (r9 review; the e2e_tpch header rule).
# Both engines run the same SQL text, so one edit pins both.


@query("q_subq_scalar", oracle=_SCALAR)
def q_subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders 50% above the global average."""
    return _sql(spark, sf_dir, ("orders",), _SCALAR)


_IN = """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN
      (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


@query("q_subq_in", oracle=_IN)
def q_subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) → rewritten to a left-semi join."""
    return _sql(spark, sf_dir, ("customer", "orders"), _IN)


_CORR = """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice >
      (SELECT round(avg(o2.o_totalprice) * 2.0, 4) FROM orders o2
       WHERE o2.o_custkey = o.o_custkey)
"""


@query("q_subq_correlated", oracle=_CORR)
def q_subq_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-customer average) — Catalyst
    decorrelates into a grouped join, one pass over orders."""
    return _sql(spark, sf_dir, ("orders",), _CORR)


_LATERAL = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) t
"""


@query("q_subq_lateral", oracle=_LATERAL)
def q_subq_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 orders per customer) — the
    SQL-standard spelling of per-row dependent subqueries. Catalyst
    plans it as a decorrelated join + per-key window (the
    q_win_topk_group shape), NOT a per-customer re-execution, so it
    distributes like any other join at scale. Identical text runs on
    DuckDB (comma-LATERAL — the one spelling both parsers accept;
    Spark also rejects DuckDB's `JOIN LATERAL ... ON true`)."""
    return _sql(spark, sf_dir, ("customer", "orders"), _LATERAL)


_NOTIN_NULL = """
    SELECT
      (SELECT count(*) FROM customer
       WHERE c_custkey NOT IN (SELECT nullif(user_id, 42) FROM events))
        AS cnt_notin,
      (SELECT count(*) FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM events e
                         WHERE nullif(e.user_id, 42) = c.c_custkey))
        AS cnt_notexists
"""


@query("q_subq_notin_null", oracle=_NOTIN_NULL)
def q_subq_notin_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN vs NOT EXISTS under NULLs — the classic three-valued-logic
    trap, pinned as a query: the subquery plants a NULL (nullif on a
    present key), so ANSI NOT IN yields UNKNOWN for every candidate
    (cnt_notin = 0) while NOT EXISTS ignores the NULL row and counts
    correctly. Identical SQL text runs on both engines.

    Physically Spark plans the single-column NOT IN as a NULL-aware
    anti join (one extra null-existence check over a plain LeftAnti,
    not a nested-loop per row), and the NOT EXISTS as an ordinary hash
    LeftAnti — both scale as hash joins on the key.
    """
    return _sql(spark, sf_dir, ("customer", "events"), _NOTIN_NULL)
