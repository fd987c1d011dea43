"""Inspect physical plans via EXPLAIN FORMATTED text.

Parsing the formatted explain output is the stable public surface for
plan assertions (the Catalyst node classes are JVM-internal); these
helpers centralize the string contracts so tests don't each invent their
own grep.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """EXPLAIN FORMATTED text of the dataframe's physical plan."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def _split_top_level(body: str) -> list[str]:
    """Split on commas NOT nested inside (), [], or <> — filter entries
    like EqualTo(col,val) and struct fields like v:array<double> contain
    commas/angle brackets that a naive split would shred."""
    parts: list[str] = []
    depth, cur = 0, []
    for ch in body:
        if ch in "([<":
            depth += 1
        elif ch in ")]>":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (PushedFilters: [...]),
    one WHOLE entry per filter (EqualTo(col,val) stays one element)."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(_split_top_level(body))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets each parquet scan actually reads (ReadSchema lines) —
    the observable form of column pruning."""
    plan = formatted_plan(df)
    schemas: list[set[str]] = []
    # greedy to the LAST '>' on the line: a non-greedy match would stop
    # at the first '>' of a nested complex type (array<double>) and drop
    # every column after it; top-level-comma split keeps nested commas in
    # their field
    for m in re.finditer(r"ReadSchema: struct<(.*)>", plan):
        cols = {
            c.split(":")[0].strip()
            for c in _split_top_level(m.group(1))
            if ":" in c
        }
        schemas.append(cols)
    return schemas


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def n_shuffle_exchanges(df: DataFrame) -> int:
    """DISTINCT shuffle Exchange nodes in the plan tree (BroadcastExchange
    excluded) — the number of data-movement barriers a 1000-executor run
    would pay. Counts unique node ids: EXPLAIN FORMATTED re-prints a
    cached (InMemoryRelation) subtree at every reference, so a raw line
    count would bill the same exchange once per consumer of the cache."""
    tree = formatted_plan(df).split("\n\n")[0]
    ids = set()
    unnumbered = 0
    for line in tree.splitlines():
        if "Exchange" not in line or "BroadcastExchange" in line:
            continue
        if "ReusedExchange" in line:
            continue  # reuse of an already-counted shuffle, not a new one
        m = re.search(r"Exchange.*\((\d+)\)\s*$", line)
        if m:
            ids.add(m.group(1))
        else:  # defensive: count unnumbered lines individually
            unnumbered += 1
    return len(ids) + unnumbered


def has_take_ordered(df: DataFrame) -> bool:
    """ORDER BY + LIMIT should plan as TakeOrderedAndProject (per-partition
    top-k + merge), never a global Sort."""
    return "TakeOrderedAndProject" in formatted_plan(df)


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (fused JVM pipelines). More
    fusion = fewer virtual-call boundaries; Python UDFs break spans.

    Uses EXPLAIN CODEGEN: with AQE on, the formatted plan doesn't show
    codegen spans until runtime finalization, but codegen mode compiles
    and reports them up front.
    """
    text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else 0
