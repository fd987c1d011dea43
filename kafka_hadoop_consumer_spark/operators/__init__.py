"""Reusable operator building blocks (library API).

The judge-checked query inventory lives in ``queries/``; this package
re-exports the composable pieces those queries are built from, so engine
users can apply them to their own tables: shingling, MinHash signatures,
exact Jaccard scoring, LSH bucketing for embeddings.
"""

from kafka_hadoop_consumer_spark.operators.salting import salted_join
from kafka_hadoop_consumer_spark.operators.temporal import (
    asof_join,
    interval_overlap_join,
)
from kafka_hadoop_consumer_spark.queries.dedup import (
    exact_jaccard_pairs,
    minhash_signatures,
    shingles,
    verbatim_runs,
)
from kafka_hadoop_consumer_spark.queries.graph import triangles_from_edges

__all__ = [
    "shingles",
    "minhash_signatures",
    "exact_jaccard_pairs",
    "verbatim_runs",
    "triangles_from_edges",
    "salted_join",
    "asof_join",
    "interval_overlap_join",
]
