"""Reusable column-expression helpers (library API).

Similarity math shared by the queries inventory, usable on any
``array<numeric>`` column. All JVM built-ins (higher-order functions) —
no Python in the row path.
"""

from kafka_hadoop_consumer_spark.queries.similarity import (
    _dot as dot_product,
    _norm as l2_norm,
    _vec_double as as_double_array,
)


def cosine_similarity(a, b):
    """Cosine similarity between two array<double> columns (upcast float
    inputs with as_double_array first for cross-engine determinism)."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


__all__ = ["dot_product", "l2_norm", "as_double_array", "cosine_similarity"]
