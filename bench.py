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
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_hadoop_consumer_spark import get_spark  # noqa: E402
from kafka_hadoop_consumer_spark.queries import QUERIES  # noqa: E402
from kafka_hadoop_consumer_spark.streaming.ingest import (  # noqa: E402
    SourceSpec,
    run_ingest,
)

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
    "q_win_sessionize",    # lag + cumsum gap sessionization
    "q_text_tfidf",        # tf-idf with broadcast vocabulary
    "q_e2e_q9",            # 5-table profit rollup (round-2 TPC-H set)
    "q_cdc_scd2",          # change-compressed SCD2 (single-shuffle windows)
]

N_RUNS = 3


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# events.ts is parquet TIMESTAMP(NANOS); the session reads it as long
# (nanosAsLong) — fine for an ingest-throughput measure (bytes in,
# checkpointed parquet out), the reference's entire job.
_EVENTS_DDL = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def time_ingest(spark, sf_dir: str) -> tuple[float, int]:
    """Wall-clock for the reference-parity ingest pipeline (s_ingest_e2e):
    stream the events table from a file source into a checkpointed parquet
    sink, availableNow. Fresh checkpoint per run = a cold bounded run, the
    reference's cron invocation. Returns (median seconds, rows ingested)."""
    stage = tempfile.mkdtemp(prefix="bench_ingest_src_")
    runs, n_rows = [], 0
    try:
        # file stream sources take a directory: stage the table via symlink
        os.symlink(
            os.path.join(sf_dir, "events.parquet"),
            os.path.join(stage, "events.parquet"),
        )
        spec = SourceSpec(kind="file", format="parquet", path=stage, schema=_EVENTS_DDL)
        for _ in range(N_RUNS):
            work = tempfile.mkdtemp(prefix="bench_ingest_")
            try:
                out, ckpt = os.path.join(work, "out"), os.path.join(work, "ckpt")
                t0 = time.perf_counter()
                run_ingest(spark, spec, out, ckpt)
                runs.append(time.perf_counter() - t0)
                n_rows = spark.read.parquet(out).count()
            finally:
                shutil.rmtree(work, ignore_errors=True)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return statistics.median(runs), n_rows


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

    ingest_sec, ingest_rows = time_ingest(spark, sf_dir)
    timings["s_ingest_e2e"] = round(ingest_sec, 3)

    result = {
        "metric": "headline query wall-clock (median of 3, noop sink)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "ingest_rows_per_sec": round(ingest_rows / ingest_sec),
        "sf": float(sf),
    }
    print(json.dumps(result))
    check_regressions(timings, sf)


# Regression guardrail: refactors must not silently slow the headline
# set. Compared only at the anchor's scale factor (per-query medians are
# meaningless across SFs). Thresholds are noise-calibrated: ambient VM
# load moves single queries up to ~1.5× run-to-run, so the trip wires
# are any query >2× OR total >1.4× — a real regression (e.g. the cache
# policy bug: one query 4×, total 1.75×) trips both, noise trips
# neither. Per-query ratios always print to stderr for inspection.
ANCHOR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r01.json")
QUERY_RATIO = 2.0
TOTAL_RATIO = 1.4


def check_regressions(timings: dict[str, float], sf: str) -> None:
    if not os.path.exists(ANCHOR):
        return
    with open(ANCHOR) as f:
        anchor = json.load(f)
    # the driver's BENCH_r{N}.json wraps the bench line under "parsed"
    anchor = anchor.get("parsed", anchor)
    if float(sf) != float(anchor.get("sf", -1)):
        return
    regressions = []
    tot_now = tot_base = 0.0
    for name, sec in timings.items():
        base = anchor.get("queries", {}).get(name)
        if base:
            ratio = sec / base
            tot_now, tot_base = tot_now + sec, tot_base + base
            flag = " REGRESSION" if ratio > QUERY_RATIO else ""
            print(f"# vs r01: {name} {sec:.3f}s / {base:.3f}s = {ratio:.2f}x{flag}",
                  file=sys.stderr)
            if ratio > QUERY_RATIO:
                regressions.append((name, round(ratio, 2)))
    if tot_base and tot_now / tot_base > TOTAL_RATIO:
        regressions.append(("TOTAL", round(tot_now / tot_base, 2)))
    if regressions:
        print(f"BENCH REGRESSION (> {QUERY_RATIO}x/query or {TOTAL_RATIO}x total) "
              f"vs {ANCHOR}: {regressions}", file=sys.stderr)
        # Exit non-zero only in opt-in strict mode (local refactor loop).
        # The default stays rc=0: boot-to-boot VM variance alone moves the
        # total ~1.5x (measured 2026-08-13, same code both sides), and the
        # driver records bench rc verbatim — a noise-tripped rc=1 would
        # read as a broken bench, which is worse than the warning.
        if os.environ.get("SPARK_GRAFT_BENCH_STRICT"):
            sys.exit(1)


if __name__ == "__main__":
    main()
