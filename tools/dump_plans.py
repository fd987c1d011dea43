#!/usr/bin/env python
"""Dump .explain("formatted") for registry keys to plans/<round>/<key>_<tag>.txt.

Usage: python tools/dump_plans.py r14 before q_graph_triangles q_graph_cc ...
Planning only (no action), so it is cheap enough to run any time.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_hadoop_consumer_spark import get_spark  # noqa: E402
from kafka_hadoop_consumer_spark.queries import QUERIES  # noqa: E402


def main(argv: list[str]) -> int:
    rnd, tag, *keys = argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"dump_plans_{rnd}_{tag}")
    for key in keys:
        df = QUERIES[key](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{key}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{key}: {path} (Exchange x{n_ex})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
