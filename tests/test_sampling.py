"""Sampling behavior: determinism and fraction accuracy."""

from __future__ import annotations

from kafka_hadoop_consumer_spark.queries import QUERIES
from tests.conftest import SF_DIR


def test_hash_sample_is_stable(spark):
    a = {r["doc_id"] for r in QUERIES["q_sample_hash"](spark, SF_DIR).collect()}
    b = {r["doc_id"] for r in QUERIES["q_sample_hash"](spark, SF_DIR).collect()}
    assert a == b and len(a) > 0


def test_rng_sample_fraction(spark):
    n = QUERIES["q_sample_rng"](spark, SF_DIR).count()
    total = 60000
    assert 0.07 * total < n < 0.13 * total, n
    # seeded → repeatable within Spark
    assert QUERIES["q_sample_rng"](spark, SF_DIR).count() == n
