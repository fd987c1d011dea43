"""Query registry: the single source of truth for the judge-checked
operator inventory (SURVEY.md §2B).

Every operator registers (a) its PySpark implementation — a callable
``(spark, sf_dir) -> DataFrame`` — and (b) optionally its DuckDB oracle SQL
string. The driver hash-compares the two at sf0.01 (row count + schema +
order-insensitive value hash), so:

- every computed/aggregate column is aliased identically on both sides;
- double-valued AGGREGATES are rounded on both sides (association order
  differs between engines → last-ulp drift; SURVEY.md §7 R2). Scalar
  expressions over identical input bits are IEEE-deterministic and are NOT
  rounded (pass-through values hash exactly);
- hash-function-dependent / approximate ops register with oracle=None →
  the driver records a rows-only check (SURVEY.md §7 R4) and pytest covers
  quality instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


@dataclass(frozen=True)
class QueryMeta:
    name: str
    doc: str
    oracle: bool


METAS: dict[str, QueryMeta] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        METAS[name] = QueryMeta(name=name, doc=(fn.__doc__ or "").strip(),
                                oracle=oracle is not None)
        return fn

    return deco
