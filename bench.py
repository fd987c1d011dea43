#!/usr/bin/env python
"""Benchmark harness (driver contract + SURVEY.md §6 protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Protocol: one warm-up execution per query (JIT + file-index warm), then
median of 3 timed runs. Queries materialize through the noop sink so
timing covers full execution without driver-side collect overhead.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_hadoop_consumer_spark import get_spark  # noqa: E402
from kafka_hadoop_consumer_spark.queries import QUERIES  # noqa: E402

HEADLINE = [
    "q_agg_groupby",       # flagship: TPC-H Q1 shape
    "q_join_multiway",     # TPC-H Q5 shape star join
    "q_win_topk_group",    # partitioned window
    "q_join_range",        # temporal equi+residual join
    "q_dedup_minhash",     # MinHash+LSH near-dedup cascade
    "q_dedup_ngram_jaccard",  # exact near-dup ground truth
    "q_sim_cosine_topk",   # brute-force ANN baseline
    "q_text_ngram",        # shingle + frequency
    "q_udf_scalar",        # Arrow pandas-UDF path
]

N_RUNS = 3


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        materialize(fn(spark, sf_dir))  # warm-up
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)

    print(
        json.dumps(
            {
                "metric": "headline query wall-clock (median of 3, noop sink)",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
