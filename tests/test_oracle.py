"""Local mirror of the driver's t2 correctness gate: every registered
query with an oracle must match DuckDB exactly at sf0.01; oracle-less
(approximate/hash-dependent) queries must at least run and return a
stable schema.
"""

from __future__ import annotations

import pytest

from kafka_hadoop_consumer_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_DIR, assert_matches_oracle

ORACLE_KEYS = sorted(ORACLES)
ROWS_ONLY_KEYS = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_match(spark, oracle_con, name):
    assert_matches_oracle(spark, oracle_con, name)


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    rows = df.count()
    assert rows >= 0
    assert len(df.schema) > 0


def test_sketch_merge_estimates_close_and_consistent(spark):
    """q_agg_sketch_merge: per-group HLL estimates within 5% of exact;
    the merged (union-of-sketches) global estimate agrees with a single
    whole-table sketch to <1% (mergeability — not bit-equality: the
    DataSketches union gadget is HLL_8 internally, so its rounding can
    differ from a directly-built HLL_4 sketch by a few counts)."""
    from pyspark.sql import functions as F
    from kafka_hadoop_consumer_spark.catalog import load_table

    rows = {r.o_orderstatus: r for r in QUERIES["q_agg_sketch_merge"](spark, SF_DIR).collect()}
    for status, r in rows.items():
        if status == "ALL":
            continue
        assert abs(r.estimated_nd - r.exact_nd) <= 0.05 * r.exact_nd, r

    o = load_table(spark, SF_DIR, "orders")
    whole = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).cast("long")
    ).collect()[0][0]
    assert abs(rows["ALL"].estimated_nd - whole) <= 0.01 * whole


def test_approx_percentile_close_to_exact(spark):
    """q_agg_approx_percentile: sketch quantiles within 1% relative error
    of the exact q_agg_percentile values per group (accuracy=10000 →
    rank error 1e-4; on ~thousands of rows per group that's near-exact)."""
    from kafka_hadoop_consumer_spark.queries import QUERIES
    from tests.conftest import SF_DIR

    exact = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"])
        for r in QUERIES["q_agg_percentile"](spark, SF_DIR).collect()
    }
    approx = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"])
        for r in QUERIES["q_agg_approx_percentile"](spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for g in exact:
        for e, a in zip(exact[g], approx[g]):
            assert abs(a - e) <= 0.01 * max(abs(e), 1.0), (g, e, a)
