#!/usr/bin/env python
"""Isolated WARMED anchor measurement (the r9 protocol, as a script).

The r9/r11 warmed anchors in bench.WARMED_ANCHORS were measured ad hoc;
this tool makes the protocol reproducible so future re-anchors carry an
identical measurement chain (r11 verdict item 3):

  1. a fresh bench-config session warms the JVM + Python workers with
     four headline-style queries (agg, broadcast join, pandas UDF,
     text shingles) — one execution each, untimed;
  2. CONTROLS: ``bench.time_query`` on every key that already has a
     warmed anchor; their ratio vs the anchors is the session's box
     state (median printed as ``control_box``) — an anchor measured
     while controls read >~1.2x is contended and should be discarded;
  3. TARGETS: ``bench.time_query`` on the requested keys (plus
     ``bench.time_ingest`` when ``--ingest`` is passed).

One JSON line per invocation; run it 2-3 times across sessions and take
the min-of-sessions as the anchor, recording the co-measured controls
in BASELINE.md next to it.

Usage:
    python tools/warmed_probe.py q_dedup_minhash q_dedup_ngram_jaccard
    python tools/warmed_probe.py --ingest
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from kafka_hadoop_consumer_spark import get_spark  # noqa: E402
from kafka_hadoop_consumer_spark.queries import QUERIES  # noqa: E402

WARM_QUERIES = ("q_agg_groupby", "q_join_broadcast", "q_udf_scalar", "q_text_ngram")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("targets", nargs="*", help="query keys to anchor")
    ap.add_argument("--ingest", action="store_true",
                    help="also measure s_ingest_e2e via bench.time_ingest")
    args = ap.parse_args()
    unknown = [t for t in args.targets if t not in QUERIES]
    if unknown:
        ap.error(f"unknown query keys: {unknown}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="warmed_probe")

    for name in WARM_QUERIES:
        bench.materialize(QUERIES[name](spark, sf_dir))

    controls, ratios = {}, []
    for name, anchor in bench.WARMED_ANCHORS.items():
        if name == "s_ingest_e2e":
            continue  # streaming path; only timed under --ingest
        if name in args.targets:
            # r12 ADVICE: an already-anchored key being RE-anchored must
            # not feed its own timing into the control median — a code
            # regression in the target would inflate control_box and
            # partially mask the regression being measured.
            continue
        sec = bench.time_query(spark, name, sf_dir)
        controls[name] = {"sec": sec, "vs_anchor": round(sec / anchor, 2)}
        ratios.append(sec / anchor)

    targets = {name: bench.time_query(spark, name, sf_dir) for name in args.targets}
    if args.ingest:
        sec, rows = bench.time_ingest(spark, sf_dir)
        targets["s_ingest_e2e"] = round(sec, 3)
        targets["s_ingest_rows_per_sec"] = round(rows / sec)

    import subprocess

    try:
        git_head = subprocess.run(
            ["git", "-C", os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "rev-parse", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        git_head = None

    print(json.dumps({
        "protocol": "r9-isolated-warmed (tools/warmed_probe.py)",
        "sf_dir": sf_dir,
        # git_head stamps which code the controls certified — required
        # for this record to count as bench.idle_box_evidence().
        "git_head": git_head,
        "controls": controls,
        "control_box": round(statistics.median(ratios), 2) if ratios else None,
        "targets": targets,
    }))


if __name__ == "__main__":
    main()
