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
    ``toks_col``; empty array when the doc has fewer than ``n`` tokens.

    Inputs are spliced into SQL text, so reject anything that isn't a
    plain identifier / quote-free separator — the zorder_key precedent
    (r9 review): a ``sep`` containing a quote would otherwise produce
    malformed SQL or a silently wrong separator."""
    if not toks_col.replace("_", "").isalnum():
        raise ValueError(f"toks_col must be a plain identifier, got {toks_col!r}")
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if "'" in sep or "\\" in sep:
        raise ValueError(f"sep must not contain quotes/backslashes, got {sep!r}")
    return (
        f"if(size({toks_col}) >= {n}, "
        f"transform(sequence(1, size({toks_col}) - {n - 1}), "
        f"i -> array_join(slice({toks_col}, i, {n}), '{sep}')), "
        f"array())"
    )
