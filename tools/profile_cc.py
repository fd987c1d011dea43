#!/usr/bin/env python
"""q_graph_cc primary-pass profile (r11 verdict item 2).

The driver bench's q_graph_cc PRIMARY pass breached its 2.3-4.6 s band
twice (r10: 4.97 s, r11: 5.42 s) while the in-file CONTROL pass sat
inside both times. This script attributes a pass's wall to its parts,
using the CC_LAST_ROUND_WALLS observability the loop now records:

  build  = the eager star-round loop (one localCheckpoint job/round,
           per-round walls + the exceptAll fixpoint confirm)
  write  = everything after the loop: the labels/window/count stage plus
           job scheduling for the noop write

Protocol mirrors bench.time_query: the same four-query JVM warm-up the
warmed anchors use, co-measured warmed controls for box state, then one
untimed warm-up pass and N timed passes of the full query. The FIRST
timed pass after warm-up is the closest stand-in for the driver's
primary; later passes correspond to its control.

Optionally (--soak) runs the 13 headline queries that precede q_graph_cc
in bench order once before profiling, reproducing the in-bench storage/
GC state the driver's primary pass actually sees.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from kafka_hadoop_consumer_spark import get_spark  # noqa: E402
from kafka_hadoop_consumer_spark.queries import QUERIES, graph  # noqa: E402

WARM_QUERIES = ("q_agg_groupby", "q_join_broadcast", "q_udf_scalar", "q_text_ngram")
N_PASSES = 4


def one_pass(spark, sf_dir: str) -> dict:
    t0 = time.perf_counter()
    df = QUERIES["q_graph_cc"](spark, sf_dir)  # runs the round loop eagerly
    t_build = time.perf_counter() - t0
    bench.materialize(df)
    t_total = time.perf_counter() - t0
    walls = graph.CC_LAST_ROUND_WALLS.get("q_graph_cc", {})
    return {
        "total_sec": round(t_total, 3),
        "build_sec": round(t_build, 3),
        "write_sec": round(t_total - t_build, 3),
        "rounds_to_fixpoint": graph.CC_LAST_ROUNDS.get("q_graph_cc"),
        "round_walls": walls.get("rounds"),
        "confirm_wall": walls.get("confirm"),
        "edge_counts": graph.CC_LAST_EDGE_COUNTS.get("q_graph_cc"),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--soak", action="store_true",
                    help="run the 13 pre-cc headline queries once first, "
                         "reproducing in-bench storage/GC state")
    ap.add_argument("--passes", type=int, default=N_PASSES)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_cc")

    for name in WARM_QUERIES:
        bench.materialize(QUERIES[name](spark, sf_dir))
    controls = {}
    for name in ("q_udf_scalar", "q_text_ngram"):
        sec = bench.time_query(spark, name, sf_dir)
        controls[name] = {
            "sec": sec,
            "vs_anchor": round(sec / bench.WARMED_ANCHORS[name], 2),
        }

    if args.soak:
        t0 = time.perf_counter()
        for name in bench.HEADLINE:
            if name == "q_graph_cc":
                break
            bench.materialize(QUERIES[name](spark, sf_dir))
        soak_sec = round(time.perf_counter() - t0, 1)
    else:
        soak_sec = None

    one_pass(spark, sf_dir)  # untimed warm-up, like time_query's
    passes = [one_pass(spark, sf_dir) for _ in range(args.passes)]

    print(json.dumps({
        "protocol": f"profile_cc (soak={bool(args.soak)})",
        "sf_dir": sf_dir,
        "controls": controls,
        "soak_sec": soak_sec,
        "passes": passes,
    }, indent=2))


if __name__ == "__main__":
    main()
