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
