#!/usr/bin/env python
"""One-time 100× ANN stress receipt (r8 verdict item 8).

The per-round bench measures the LSH/embedding-dedup paths at 10× and
records that bits-per-table must grow ~log2(n) for candidate pairs to
stay linear. This probe adds the SECOND measured point: a 100× corpus
(200k × 64-dim gaussian vectors, same generator as bench's scaling
probe) run with the re-tuned config the operators' scale contract
prescribes — bits_100x = bits_1x + log2(100) ≈ 5 + 6.6 → 12 — plus the
per-table ΣC(bucket,2) candidate bound for the UN-tuned configs, which
shows the blow-up re-tuning avoids without paying to materialize it
(bits=5 at 200k rows is ~7.5e9 pair slots — exactly the all-pairs
behavior the cascade exists to avoid, so it is reported analytically
from the bucket histogram, not joined).

Writes bench_100x.json (committed); bench.py embeds it verbatim under
"scaling_100x_recorded" in bench_detail.json so the receipt rides every
round's artifact without re-paying the ~2-4 min probe per round.

Run: python tools/scale100_probe.py  [--n1 2000]       # ANN/embedding
     python tools/scale100_probe.py --minhash [--n1 2000]   # text twin
     python tools/scale100_probe.py --substring [--n1 2000] # verbatim runs

--minhash records the text-side twin (VERDICT r9 item 7): the MinHash
cascade on a 100× synthetic document corpus (200k docs, same generator
as bench's 1x/10x probe, planted near-dup per 10 docs). Unlike the
embedding cascade there is no bits knob to re-tune: band buckets key on
the concatenated minhash signature itself, so bucket membership is
content-driven and the config is n-independent by design. The receipt
therefore measures what re-tuning would otherwise have to fix — the
band-bucket ΣC(bucket,2) bound, the max bucket size, and the DISTINCT
verified candidate count (expected ~linear in n: candidates track the
planted near-dup density, not n²) — plus one actually-ran cascade wall.
Results merge into bench_100x.json under "minhash_100x" without
touching the recorded ANN fields.
"""
from __future__ import annotations

import datetime
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.normpath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)
sys.path.insert(0, REPO)


def sigma_pairs(ed, bits, planes_for):
    """Per-table Σ C(bucket,2) — the candidate-generation upper bound
    from the bucket histogram alone (cheap: one groupBy, no self-join).
    Counts a multi-table collision once per table, so it upper-bounds
    the distinct-pair count the operator actually verifies."""
    from pyspark.sql import functions as F

    from kafka_hadoop_consumer_spark.queries.similarity import _table_buckets

    row = (
        ed.select(
            F.posexplode(
                F.array(*_table_buckets(F.col("v"), planes_for(bits)))
            ).alias("l", "bucket")
        )
        .groupBy("l", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) / 2")).cast("long").alias("s"))
        .first()
    )
    return int(row["s"] or 0)


def _def_hashes(keys: tuple) -> dict:
    """Snapshot the measured operators' CURRENT def-hashes into the
    receipt (r10 verdict item 6): a receipt is a single-run artifact, so
    round_check can warn when an operator's definition changed AFTER its
    receipt was recorded — without re-paying the 300-second probe."""
    import importlib.util

    from kafka_hadoop_consumer_spark.queries import ORACLES, QUERIES

    spec = importlib.util.spec_from_file_location(
        "_cov_ledger", os.path.join(REPO, "tools", "coverage_ledger.py")
    )
    led = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(led)
    return {k: led.def_hash(k, QUERIES, ORACLES) for k in keys}


def _merge_into_sidecar(update: dict) -> str:
    """Merge keys into bench_100x.json, preserving whatever else is
    recorded (the ANN and minhash probes run on different days and must
    not clobber each other's receipts)."""
    path = os.path.join(REPO, "bench_100x.json")
    try:
        with open(path) as f:
            out = json.load(f)
    except (OSError, ValueError):
        out = {}
    out.update(update)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    return path


def probe_minhash(n1: int) -> int:
    """100× MinHash-cascade receipt → bench_100x.json["minhash_100x"]."""
    from pyspark.sql import functions as F

    import bench
    from kafka_hadoop_consumer_spark.queries.dedup import (
        N_BANDS,
        N_MINHASH,
        ROWS_PER_BAND,
        minhash_banded,
        minhash_near_dup_pairs,
        minhash_signatures,
        shingles,
    )
    from kafka_hadoop_consumer_spark.queries.registry import release_tracked

    n100 = n1 * 100
    spark = bench.get_spark(app_name="scale100_minhash")
    d100 = tempfile.mkdtemp(prefix="bench_scale_100x_mh_")
    try:
        bench._synth_documents(spark, n100, d100)

        def docs():
            return spark.read.parquet(
                os.path.join(d100, "documents.parquet")
            )

        # band-bucket histogram: ΣC(bucket,2) upper bound + max bucket —
        # the quantities a bits-style re-tune would control if buckets
        # were positional rather than content-keyed
        hist = (
            minhash_banded(minhash_signatures(shingles(docs())))
            .groupBy("band_idx", "band_hash")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.sum(F.expr("c * (c - 1) / 2")).cast("long").alias("s"),
                F.max("c").alias("mx"),
            )
            .first()
        )
        release_tracked()

        # the SAME distinct-candidate definition as bench's 1x/10x points
        cand = bench.scale_minhash_candidate_pairs(docs())
        release_tracked()

        # the cascade, actually run: wall + emitted near-dup pair count
        t0 = time.perf_counter()
        pairs_out = minhash_near_dup_pairs(docs()).count()
        wall = round(time.perf_counter() - t0, 3)
        release_tracked()

        out = {
            "recorded": datetime.date.today().isoformat(),
            "command": "python tools/scale100_probe.py --minhash",
            "def_hashes": _def_hashes(("q_dedup_minhash",)),
            "n_1x": n1,
            "n_100x": n100,
            "band_config": {
                "n_minhash": N_MINHASH,
                "bands": N_BANDS,
                "rows_per_band": ROWS_PER_BAND,
                "note": "content-keyed band buckets; config is "
                        "n-independent (no bits re-tune exists or is "
                        "needed)",
            },
            "sigma_band_pair_bound_100x": int(hist["s"] or 0),
            "max_band_bucket_100x": int(hist["mx"] or 0),
            "candidate_pairs_100x": cand,
            "near_dup_pairs_out_100x": pairs_out,
            "cascade_wall_sec_100x_single_run": wall,
        }
        path = _merge_into_sidecar({"minhash_100x": out})
        print(json.dumps(out, indent=2))
        print(f"merged into {path}", file=sys.stderr)
        return 0
    finally:
        shutil.rmtree(d100, ignore_errors=True)


def probe_substring(n1: int) -> int:
    """100× verbatim-run receipt → bench_100x.json["substring_100x"].

    The substring miner's wall ratio is the most cache-sensitive number
    in scaling_10x (1.27–2.33 across same-code snapshots — the r9
    ADVICE false-regression), so its 100× point is recorded the same
    way as the cascades': the noise-free invariants (joinable
    positions after the OCC_CAP df-cap, positions the cap dropped)
    plus one actually-ran wall. Linear joinable positions at 100× rows
    with zero drops shows the positional-shingle index does not
    saturate; a nonzero drop count is the cap doing its job, priced."""
    from pyspark.sql import functions as F

    import bench
    from kafka_hadoop_consumer_spark.queries.dedup import (
        OCC_CAP,
        kept_positions,
        verbatim_runs,
    )
    from kafka_hadoop_consumer_spark.queries.registry import release_tracked

    n100 = n1 * 100
    spark = bench.get_spark(app_name="scale100_substring")
    d100 = tempfile.mkdtemp(prefix="bench_scale_100x_sub_")
    try:
        bench._synth_documents(spark, n100, d100)

        def docs():
            return spark.read.parquet(
                os.path.join(d100, "documents.parquet")
            )

        row = kept_positions(docs()).select(
            F.sum((F.col("occ") > OCC_CAP).cast("long")).alias("dropped"),
            F.sum((F.col("occ") <= OCC_CAP).cast("long")).alias("kept"),
        ).first()
        release_tracked()

        t0 = time.perf_counter()
        runs_out = verbatim_runs(docs()).count()
        wall = round(time.perf_counter() - t0, 3)
        release_tracked()

        out = {
            "recorded": datetime.date.today().isoformat(),
            "command": "python tools/scale100_probe.py --substring",
            "def_hashes": _def_hashes(("q_dedup_substring",)),
            "n_1x": n1,
            "n_100x": n100,
            "occ_cap": OCC_CAP,
            "occ_cap_dropped_100x": int(row["dropped"] or 0),
            "joinable_positions_100x": int(row["kept"] or 0),
            "verbatim_runs_out_100x": runs_out,
            "wall_sec_100x_single_run": wall,
        }
        path = _merge_into_sidecar({"substring_100x": out})
        print(json.dumps(out, indent=2))
        print(f"merged into {path}", file=sys.stderr)
        return 0
    finally:
        shutil.rmtree(d100, ignore_errors=True)


def probe_hybrid(n1: int) -> int:
    """100× hybrid-search receipt → bench_100x.json["hybrid_100x"].

    Same hybrid_search core as q_e2e_hybrid_search over a 200k-doc +
    200k-vector synthetic corpus (bench's generators). The invariant is
    the PRUNED token stream — rows that actually reach the BM25
    explode-output shuffle after the term IN-filter — which must stay
    the query-term fraction of the corpus (6 of 40 vocab words) at
    every scale: the filter prunes BEFORE the shuffle, evidenced with
    row counts at a third decade, plus one actually-ran wall."""
    from pyspark.sql import functions as F

    import bench
    from kafka_hadoop_consumer_spark.queries.registry import release_tracked
    from kafka_hadoop_consumer_spark.queries.similarity import hybrid_search

    n100 = n1 * 100
    spark = bench.get_spark(app_name="scale100_hybrid")
    d100 = tempfile.mkdtemp(prefix="bench_scale_100x_hyb_")
    try:
        bench._synth_documents(spark, n100, d100)
        bench._synth_embeddings(spark, n100, d100)
        hyb_queries = {
            "hq1": ("w1", "w2"),
            "hq2": ("w3", "w4"),
            "hq3": ("w5", "w6"),
        }
        hyb_terms = [t for ts in hyb_queries.values() for t in ts]

        def docs():
            return (
                spark.read.parquet(os.path.join(d100, "documents.parquet"))
                .withColumn("lang", F.lit("en"))
                .withColumn("source", F.lit("synth"))
            )

        row = (
            docs()
            .select(F.explode(F.split("text", " ")).alias("term"))
            .agg(
                F.count(F.lit(1)).alias("total"),
                F.count(
                    F.when(F.col("term").isin(*hyb_terms), 1)
                ).alias("pruned"),
            )
            .first()
        )
        release_tracked()

        t0 = time.perf_counter()
        rows_out = hybrid_search(
            spark,
            docs(),
            spark.read.parquet(os.path.join(d100, "embeddings.parquet")),
            hyb_queries,
        ).count()
        wall = round(time.perf_counter() - t0, 3)
        release_tracked()

        tot, pr = int(row["total"]), int(row["pruned"])
        out = {
            "recorded": datetime.date.today().isoformat(),
            "command": "python tools/scale100_probe.py --hybrid",
            "def_hashes": _def_hashes(("q_e2e_hybrid_search",)),
            "n_1x": n1,
            "n_100x": n100,
            "tokens_total_100x": tot,
            "tokens_after_in_filter_100x": pr,
            "prune_fraction_100x": round(pr / tot, 3) if tot else None,
            "result_rows_100x": rows_out,
            "wall_sec_100x_single_run": wall,
        }
        path = _merge_into_sidecar({"hybrid_100x": out})
        print(json.dumps(out, indent=2))
        print(f"merged into {path}", file=sys.stderr)
        return 0
    finally:
        shutil.rmtree(d100, ignore_errors=True)


def probe_cc(n1: int) -> int:
    """100× connected-components receipt → bench_100x.json["cc_100x"].

    PATH graph (diameter = n−1), the adversarial case for label
    propagation: large-star/small-star must converge in O(log d)
    rounds, and the per-round bench probe measured 12 rounds at 2k
    nodes → 16 at 20k. This records the third decade (200k nodes) so
    the log-round claim has three measured points like the dedup/ANN
    candidate series — a linear-round algorithm would need ~200k
    rounds here; the observed count stays ~log2(n)."""
    from pyspark.sql import functions as F

    import bench
    from kafka_hadoop_consumer_spark.queries.graph import (
        CC_LAST_ROUNDS,
        cc_from_edges,
    )
    from kafka_hadoop_consumer_spark.queries.registry import release_tracked

    n100 = n1 * 100
    spark = bench.get_spark(app_name="scale100_cc")
    edges = spark.range(1, n100).select(
        (F.col("id") - 1).alias("u"), F.col("id").alias("v")
    )
    t0 = time.perf_counter()
    out_df = cc_from_edges(edges, key="probe_cc_100x", max_rounds=40)
    n_components = out_df.select("component_id").distinct().count()
    wall = round(time.perf_counter() - t0, 3)
    release_tracked()

    out = {
        "recorded": datetime.date.today().isoformat(),
        "command": "python tools/scale100_probe.py --cc",
        "def_hashes": _def_hashes(("q_graph_cc",)),
        "graph": "path (diameter = n-1)",
        "n_1x": n1,
        "n_100x": n100,
        "rounds_100x": CC_LAST_ROUNDS.get("probe_cc_100x"),
        "n_components_100x": n_components,
        "wall_sec_100x_single_run": wall,
    }
    path = _merge_into_sidecar({"cc_100x": out})
    print(json.dumps(out, indent=2))
    print(f"merged into {path}", file=sys.stderr)
    return 0


def probe_pagerank(n1: int) -> int:
    """100× PageRank receipt → bench_100x.json["pagerank_100x"]
    (r12 verdict item 5: the heaviest bench extra with no scale
    receipt).

    Measures pagerank_from_edges — the exact iteration core
    q_graph_pagerank runs (dedup.py) — on a synthetic ring+skip graph
    (each node → node+1 and node+7, both directions: degree 4, |E| =
    4n, no dangling nodes, diameter-independent so the wall isolates
    the per-iteration join+groupBy cost). Two decades (n1 and 100·n1)
    × two unroll depths (1 and 3 iterations): per-iteration cost =
    (wall₃ − wall₁)/2 cancels the shared setup (persist of edges/deg,
    rank init), and the claim under test is per_iter_100x/per_iter_1x
    tracking the 100× edge ratio (linear in |E|), not n² behavior."""
    from pyspark.sql import functions as F

    import bench
    from kafka_hadoop_consumer_spark.queries.dedup import pagerank_from_edges
    from kafka_hadoop_consumer_spark.queries.registry import release_tracked

    spark = bench.get_spark(app_name="scale100_pagerank")

    def ring_edges(n: int):
        nodes = spark.range(n)
        fwd = nodes.select(
            F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
        ).unionByName(
            nodes.select(
                F.col("id").alias("src"), ((F.col("id") + 7) % n).alias("dst")
            )
        )
        return fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )

    def run(n: int, iters: int) -> float:
        t0 = time.perf_counter()
        out = pagerank_from_edges(ring_edges(n), iters=iters)
        # materialize + sanity: rank mass sums to ~1 (power iteration
        # on a connected regular graph preserves total mass)
        mass = out.agg(F.sum("r")).first()[0]
        wall = round(time.perf_counter() - t0, 3)
        release_tracked()
        assert abs(mass - 1.0) < 1e-6, mass
        return wall

    n100 = n1 * 100
    run(n1, 1)  # untimed warm-up: JVM JIT + shuffle service + Arrow init
    walls = {
        "wall_1x_iters1": run(n1, 1),
        "wall_1x_iters3": run(n1, 3),
        "wall_100x_iters1": run(n100, 1),
        "wall_100x_iters3": run(n100, 3),
    }
    per_1x = round((walls["wall_1x_iters3"] - walls["wall_1x_iters1"]) / 2, 3)
    per_100x = round(
        (walls["wall_100x_iters3"] - walls["wall_100x_iters1"]) / 2, 3
    )
    out = {
        "recorded": datetime.date.today().isoformat(),
        "command": "python tools/scale100_probe.py --pagerank",
        "def_hashes": _def_hashes(("q_graph_pagerank",)),
        "graph": "ring+skip7 (degree 4, |E| = 4n directed, no dangling)",
        "n_1x": n1,
        "n_100x": n100,
        "edges_1x": 4 * n1,
        "edges_100x": 4 * n100,
        **walls,
        "per_iteration_sec_1x": per_1x,
        "per_iteration_sec_100x": per_100x,
        "per_iteration_ratio_100x_vs_1x": (
            round(per_100x / per_1x, 2) if per_1x > 0 else None
        ),
        "edge_ratio": 100,
    }
    path = _merge_into_sidecar({"pagerank_100x": out})
    print(json.dumps(out, indent=2))
    print(f"merged into {path}", file=sys.stderr)
    return 0


def probe_bootstrap(n1: int) -> int:
    """100× Poisson-bootstrap receipt → bench_100x.json["bootstrap_100x"]
    (r12 plan audit: q_stats_bootstrap was the heaviest bench extra
    whose scale posture was argued from the plan, not measured).

    Runs q_stats_bootstrap itself (the registry callable, not a twin)
    over synthetic events tables at n1 and 100·n1 rows. The design
    claim under test: all BOOT_B resamples ride ONE scan as in-projection
    weights (explode of a literal sequence — no join, no per-resample
    shuffle), collapsing map-side into exactly |event_types| × BOOT_B
    resample means, so (a) the post-aggregate state is CONSTANT in n —
    recorded at both scales — and (b) wall grows ~linearly in rows, far
    under the B×n² a materialized-resample design would pay."""
    from pyspark.sql import functions as F

    import bench
    from kafka_hadoop_consumer_spark.queries.quality import (
        BOOT_B,
        q_stats_bootstrap,
    )
    from kafka_hadoop_consumer_spark.queries.registry import release_tracked

    spark = bench.get_spark(app_name="scale100_bootstrap")

    def synth_events(n: int, out_dir: str) -> None:
        # same shape as testdata events.parquet; event_type cardinality 3
        # matches sf0.1 (browse/click/purchase) so the constant-state
        # claim is checked at the real |types|
        spark.range(n).select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
            (F.col("id") % 997).alias("user_id"),
            F.element_at(
                F.array(F.lit("browse"), F.lit("click"), F.lit("purchase")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("event_type"),
            (F.sin(F.col("id").cast("double")) * 50 + 50).alias("value"),
            F.lit("{}").alias("props"),
        ).coalesce(8).write.mode("overwrite").parquet(
            os.path.join(out_dir, "events.parquet")
        )

    def run(sf_dir: str) -> tuple[float, int]:
        t0 = time.perf_counter()
        rows = q_stats_bootstrap(spark, sf_dir).count()
        wall = round(time.perf_counter() - t0, 3)
        release_tracked()
        return wall, rows

    n100 = n1 * 100
    d1 = tempfile.mkdtemp(prefix="bench_scale_1x_boot_")
    d100 = tempfile.mkdtemp(prefix="bench_scale_100x_boot_")
    try:
        synth_events(n1, d1)
        synth_events(n100, d100)

        # constant-state invariant: resample means entering the final
        # per-type collect — must be |types| × BOOT_B at BOTH scales
        def mean_rows(sf_dir: str) -> int:
            e = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            return (
                e.select("event_type").distinct().count() * BOOT_B
            )

        run(d1)  # untimed warm-up: JVM JIT + shuffle + codegen caches
        wall_1x, rows_1x = run(d1)
        wall_100x, rows_100x = run(d100)

        out = {
            "recorded": datetime.date.today().isoformat(),
            "command": "python tools/scale100_probe.py --bootstrap",
            "def_hashes": _def_hashes(("q_stats_bootstrap",)),
            "boot_b": BOOT_B,
            "n_1x": n1,
            "n_100x": n100,
            "exploded_rows_1x": n1 * BOOT_B,
            "exploded_rows_100x": n100 * BOOT_B,
            "resample_means_state_1x": mean_rows(d1),
            "resample_means_state_100x": mean_rows(d100),
            "result_rows_1x": rows_1x,
            "result_rows_100x": rows_100x,
            "wall_sec_1x": wall_1x,
            "wall_sec_100x_single_run": wall_100x,
            "wall_ratio_100x_vs_1x": (
                round(wall_100x / wall_1x, 2) if wall_1x > 0 else None
            ),
        }
        path = _merge_into_sidecar({"bootstrap_100x": out})
        print(json.dumps(out, indent=2))
        print(f"merged into {path}", file=sys.stderr)
        return 0
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d100, ignore_errors=True)


def main() -> int:
    import argparse

    from pyspark.sql import functions as F

    import bench
    from kafka_hadoop_consumer_spark.queries.registry import release_tracked
    from kafka_hadoop_consumer_spark.queries.similarity import (
        embedding_near_dup_pairs,
        lsh_topk,
    )

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n1", type=int, default=bench.SCALE_N1,
                    help="1x corpus size (probe runs at 100x this)")
    ap.add_argument("--minhash", action="store_true",
                    help="run the MinHash-cascade twin instead of ANN")
    ap.add_argument("--substring", action="store_true",
                    help="run the verbatim-run/substring twin instead")
    ap.add_argument("--cc", action="store_true",
                    help="run the connected-components PATH-graph probe")
    ap.add_argument("--hybrid", action="store_true",
                    help="run the hybrid-search (BM25+dense) probe")
    ap.add_argument("--pagerank", action="store_true",
                    help="run the PageRank ring-graph iteration probe")
    ap.add_argument("--bootstrap", action="store_true",
                    help="run the Poisson-bootstrap events probe")
    args = ap.parse_args()
    n1 = args.n1
    if args.bootstrap:
        return probe_bootstrap(n1)
    if args.minhash:
        return probe_minhash(n1)
    if args.substring:
        return probe_substring(n1)
    if args.cc:
        return probe_cc(n1)
    if args.hybrid:
        return probe_hybrid(n1)
    if args.pagerank:
        return probe_pagerank(n1)
    n100 = n1 * 100
    BITS_1X = bench.SCALE_DEDUP_BITS_1X          # 5
    BITS_10X = bench.SCALE_DEDUP_BITS_10X        # 8
    BITS_100X = BITS_1X + 7                      # ceil(5 + log2(100)) = 12

    spark = bench.get_spark(app_name="scale100_probe")

    # ONE plane family + loader + candidate count, shared with bench's
    # 1x/10x probes — the 1x/10x/100x series must measure the same
    # definitions or the receipt's comparison is meaningless
    planes_for = bench.scale_planes_for

    d100 = tempfile.mkdtemp(prefix="bench_scale_100x_")
    try:
        bench._synth_embeddings(spark, n100, d100)

        def load_ed():
            return bench.scale_load_embeddings(spark, d100)

        # analytic candidate bounds per config (no join materialized)
        sig = {
            bits: sigma_pairs(load_ed(), bits, planes_for)
            for bits in (BITS_1X, BITS_10X, BITS_100X)
        }

        # the re-tuned cascade, actually run: wall + verified pair count
        t0 = time.perf_counter()
        pairs_out = embedding_near_dup_pairs(
            load_ed(), planes_for(BITS_100X)
        ).count()
        dedup_wall = round(time.perf_counter() - t0, 3)
        release_tracked()

        # distinct candidate pairs the cascade cosine-verifies at the
        # re-tuned config (the SAME function as bench's 1x/10x points)
        cand_100x = bench.scale_candidate_pairs(load_ed(), BITS_100X)

        # LSH top-k ANN at 100×, re-tuned planes: one wall point
        ed = load_ed()
        q = ed.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
        )
        t0 = time.perf_counter()
        lsh_rows = lsh_topk(ed, q).count()
        lsh_wall = round(time.perf_counter() - t0, 3)
        release_tracked()

        out = {
            "recorded": datetime.date.today().isoformat(),
            "command": "python tools/scale100_probe.py",
            "def_hashes": _def_hashes(("q_dedup_embedding", "q_sim_lsh_topk")),
            "n_1x": n1,
            "n_100x": n100,
            "tables": bench.SCALE_DEDUP_TABLES,
            "bits": {"1x": BITS_1X, "10x_retuned": BITS_10X,
                     "100x_retuned": BITS_100X},
            "sigma_pair_bound_100x": {
                "bits_5_same_config": sig[BITS_1X],
                "bits_8_10x_tuned": sig[BITS_10X],
                "bits_12_100x_retuned": sig[BITS_100X],
            },
            "candidate_pairs_100x_retuned": cand_100x,
            "near_dup_pairs_out_100x": pairs_out,
            "dedup_wall_sec_100x_retuned_single_run": dedup_wall,
            "lsh_topk_wall_sec_100x_single_run": lsh_wall,
            "lsh_topk_rows": lsh_rows,
        }
        path = _merge_into_sidecar(out)
        print(json.dumps(out, indent=2))
        print(f"merged into {path}", file=sys.stderr)
        return 0
    finally:
        shutil.rmtree(d100, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
