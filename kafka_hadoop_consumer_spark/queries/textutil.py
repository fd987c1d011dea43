"""Shared guarded n-gram/shingle expression builder.

``sequence(1, greatest(size - k, 0))`` is NOT a safe index generator:
``sequence(1, 0)`` yields the descending array ``[1, 0]`` and ``slice``
throws ``INVALID_PARAMETER_VALUE.START`` on index 0 (verified on Spark
4.1).  Docs shorter than ``n`` tokens must yield an empty gram array —
matching the DuckDB oracles, whose ``range(1, x, +1)`` is empty when
``x <= 1``.
"""

from __future__ import annotations


def ngram_expr(toks_col: str, n: int, sep: str = " ") -> str:
    """SQL expression: array of ``n``-token grams of array column
    ``toks_col``; empty array when the doc has fewer than ``n`` tokens."""
    return (
        f"if(size({toks_col}) >= {n}, "
        f"transform(sequence(1, size({toks_col}) - {n - 1}), "
        f"i -> array_join(slice({toks_col}, i, {n}), '{sep}')), "
        f"array())"
    )
