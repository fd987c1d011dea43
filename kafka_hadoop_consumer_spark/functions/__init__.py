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


def zorder_key(x_col: str, y_col: str, bits: int = 10):
    """Z-order (Morton) interleave of the low ``bits`` bits of two
    non-negative integral columns — sort by this before writing and
    parquet min/max stats prune on BOTH dimensions (see q_fn_zorder).
    Codegen'd SQL fold; column arguments are NAMES (the shift amounts are
    lambda-index expressions, which the Python shiftleft builtin cannot
    express) and are spliced verbatim into SQL text — pass plain column
    names only, never expressions or untrusted strings.

    ``bits`` must be in [1, 31]: bits=0 would build sequence(0, -1), which
    Spark evaluates as a DESCENDING 2-element array (the documented
    sequence trap), silently folding a wrong key; >31 overflows the
    interleaved 64-bit result."""
    from pyspark.sql import functions as F

    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    if not (x_col.isidentifier() and y_col.isidentifier()):
        raise ValueError(
            "x_col/y_col must be plain column names (spliced into SQL text), "
            f"got {x_col!r}, {y_col!r}"
        )
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> acc"
        f" + (shiftright({x_col}, i) & 1L) * shiftleft(1L, 2 * i)"
        f" + (shiftright({y_col}, i) & 1L) * shiftleft(1L, 2 * i + 1))"
    )


__all__.append("zorder_key")
