"""Semantic property tests for the round-3 substring-run and triangle
operators: the DuckDB oracle proves cross-engine parity of one shared
formulation; these tests prove the formulation itself is RIGHT, on planted
inputs with hand-computable answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.queries.dedup import SUB_N, verbatim_runs
from kafka_hadoop_consumer_spark.queries.graph import triangles_from_edges


def _doc(tokens):
    return " ".join(tokens)


def test_planted_run_length_measured_exactly(spark):
    """Two docs share exactly one 20-token verbatim run, embedded at
    DIFFERENT positions and surrounded by doc-unique filler: the operator
    must report longest_run_tokens == 20 for that pair and nothing else."""
    run = [f"shared{i}" for i in range(20)]
    doc_a = [f"a{i}" for i in range(7)] + run + [f"az{i}" for i in range(5)]
    doc_b = [f"b{i}" for i in range(13)] + run + [f"bz{i}" for i in range(9)]
    doc_c = [f"c{i}" for i in range(30)]
    docs = spark.createDataFrame(
        [(1, _doc(doc_a)), (2, _doc(doc_b)), (3, _doc(doc_c))],
        "doc_id long, text string",
    )
    rows = verbatim_runs(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.longest_run_tokens == 20
    # 20-token run contains exactly 20 - SUB_N + 1 matching shingles, one run
    assert r.n_pos_matches == 20 - SUB_N + 1
    assert r.n_runs == 1


def test_two_disjoint_runs_counted_separately(spark):
    """Two shared runs split by unique middles: longest reports the longer
    one; n_runs sees both."""
    r1 = [f"p{i}" for i in range(SUB_N)]          # exactly SUB_N tokens
    r2 = [f"q{i}" for i in range(SUB_N + 4)]      # SUB_N + 4 tokens
    doc_a = r1 + [f"am{i}" for i in range(6)] + r2
    doc_b = r2 + [f"bm{i}" for i in range(9)] + r1
    docs = spark.createDataFrame(
        [(1, _doc(doc_a)), (2, _doc(doc_b))], "doc_id long, text string"
    )
    r = verbatim_runs(docs).collect()[0]
    assert r.longest_run_tokens == SUB_N + 4
    assert r.n_runs == 2


def test_occ_cap_bounds_pathological_repeat_blowup(spark):
    """Two docs each repeating one 8-token phrase 50×: uncapped, every
    shingle occurs ~50× per doc → ~2500 matched positions per shingle
    type (the within-pair quadratic term). The OCC_CAP budget must bound
    joined positions at OCC_CAP² per shingle while the pair is still
    detected with a long run; and the cap must genuinely drop positions
    (the accounting the bench records)."""
    from kafka_hadoop_consumer_spark.queries.dedup import (
        OCC_CAP,
        kept_positions,
    )

    phrase = [f"rep{i}" for i in range(SUB_N)]
    docs = spark.createDataFrame(
        [(1, _doc(phrase * 50)), (2, _doc(phrase * 50))],
        "doc_id long, text string",
    )
    kp = kept_positions(docs).toPandas()
    dropped = int((kp.occ > OCC_CAP).sum())
    assert dropped > 0  # the budget is live on this corpus
    surviving = kp[kp.occ <= OCC_CAP]
    # per (doc, shingle) at most OCC_CAP positions survive → any pair's
    # join fan-out per shingle is ≤ OCC_CAP²
    assert surviving.groupby(["doc_id", "sh"]).size().max() <= OCC_CAP

    rows = verbatim_runs(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    # truncated by the budget, but still unambiguously a long shared run
    assert r.longest_run_tokens >= OCC_CAP * SUB_N


def test_occ_cap_is_invisible_on_non_repetitive_docs(spark):
    """Docs whose shingles are unique within each doc (the normal case)
    must be entirely unaffected by the budget: exact planted-run numbers
    still come out, and zero positions are dropped."""
    from kafka_hadoop_consumer_spark.queries.dedup import (
        OCC_CAP,
        kept_positions,
    )

    run = [f"shared{i}" for i in range(25)]
    doc_a = [f"a{i}" for i in range(9)] + run
    doc_b = run + [f"b{i}" for i in range(11)]
    docs = spark.createDataFrame(
        [(1, _doc(doc_a)), (2, _doc(doc_b))], "doc_id long, text string"
    )
    assert int((kept_positions(docs).toPandas().occ > OCC_CAP).sum()) == 0
    r = verbatim_runs(docs).collect()[0]
    assert r.longest_run_tokens == 25
    assert r.n_pos_matches == 25 - SUB_N + 1
    assert r.n_runs == 1


def test_triangle_orientation_matches_brute_force(spark):
    """Degree-ordered orientation must count each triangle exactly once:
    on K6 plus a pendant path (20 triangles, hand-computable), the
    oriented count equals the brute-force a<b<c triple join."""
    k6 = [(u, v) for u in range(6) for v in range(6) if u < v]
    path = [(6, 7), (7, 8)]
    edges = spark.createDataFrame(k6 + path, "u long, v long")
    tri, _deg, _wedges = triangles_from_edges(edges)
    assert tri.count() == 20  # C(6,3)

    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = edges.select(F.col("u").alias("a"), F.col("v").alias("c"))
    brute = e1.join(e2, "b").join(e3, ["a", "c"]).count()
    assert brute == 20
