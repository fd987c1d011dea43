"""Physical-plan audit helpers (SURVEY.md §4.2): programmatic assertions
that Catalyst actually produced the scale-critical plan shapes —
predicate pushdown, column pruning, broadcast joins, top-k without full
sort, whole-stage codegen. Used by tests/test_plans.py and by bench.py's
--explain mode.
"""

from kafka_hadoop_consumer_spark.plans.audit import (
    formatted_plan,
    has_broadcast_hash_join,
    has_take_ordered,
    n_shuffle_exchanges,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_ids,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_hash_join",
    "has_take_ordered",
    "n_shuffle_exchanges",
    "wholestage_codegen_ids",
]
