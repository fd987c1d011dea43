"""Double-run determinism sweep for the round-3 session additions.

The oracle gate compares ONE Spark run against DuckDB; an operator with
partition-order nondeterminism (unordered collect_list, ties without a
total order, rounding on unstable sums) can pass it by luck. Running the
same query twice and demanding identical value hashes pins run-to-run
stability — cheap insurance the driver's hash check then inherits.
"""

from __future__ import annotations

import hashlib

import pytest

from kafka_hadoop_consumer_spark.queries import QUERIES
from tests.conftest import SF_DIR

R3B_KEYS = [
    "q_dedup_substring",
    "q_dedup_span_scrub",
    "q_join_bloom_prefilter",
    "q_stats_cuped",
    "q_sim_rrf_fusion",
    "q_graph_triangles",
    "q_quality_kanon",
    "q_ml_logreg",
    "q_dedup_semdedup",
    "q_text_bpe_encode",
    "q_pack_mixture_budget",
    "q_agg_kmv_setops",
    "q_join_asof_nearest",
    "q_quality_drift_embedding",
    "q_time_drawdown",
    "q_sample_coreset",
    "q_cdc_deletes",
    "q_e2e_dedup_cascade",
    "q_stats_power",
    "q_win_attribution_linear",
    "q_quality_freshness",
    "q_time_sla_uptime",
    "q_pack_epoch_shuffle",
    "q_fn_ipv4",
    "q_ml_naive_bayes",
    "q_agg_assoc_rules",
    "q_quality_behavior_entropy",
    "q_time_gap_histogram",
    "q_agg_percentile_weighted",
    "q_graph_link_predict",
    "q_source_csv_dirty",
    "q_source_compaction_plan",
    "q_dedup_sorted_neighborhood",
    "q_sim_eval_ndcg",
    "q_ml_knn",
    "q_pack_length_batches",
]


def _vhash(df) -> str:
    pdf = df.toPandas().reindex(sorted(df.columns), axis=1)
    lines = sorted(repr(tuple(r)) for r in pdf.itertuples(index=False, name=None))
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


@pytest.mark.parametrize("name", R3B_KEYS)
def test_double_run_is_bit_stable(spark, name):
    h1 = _vhash(QUERIES[name](spark, SF_DIR))
    h2 = _vhash(QUERIES[name](spark, SF_DIR))
    assert h1 == h2, f"{name}: value hash differs between identical runs"
