"""Quality gates for approximate similarity search: LSH recall measured
against the exact brute-force operator."""

from __future__ import annotations

from kafka_hadoop_consumer_spark.queries import QUERIES
from tests.conftest import SF_DIR


def _topk(df):
    out = {}
    for r in df.collect():
        out.setdefault(int(r["q_id"]), set()).add(int(r["vec_id"]))
    return out


def test_lsh_recall_on_fixture(spark):
    """8-table adaptive-k LSH: ≥0.9 recall vs brute force on the fixture
    (k floors at 4 for a 500-vector corpus → probe coverage is near-total,
    the correct degeneration at tiny n; measured recall 1.0, seed 42)."""
    exact = _topk(QUERIES["q_sim_cosine_topk"](spark, SF_DIR))
    approx = _topk(QUERIES["q_sim_lsh_topk"](spark, SF_DIR))
    assert set(exact) == set(approx), "every query vector must get results"
    recalls = [
        len(exact[q] & approx[q]) / len(exact[q]) for q in exact
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.9, f"mean recall {mean_recall:.2f} ({recalls})"


def test_lsh_recall_on_10x_corpus_with_planted_neighbors(spark):
    """10× corpus (5000 vectors, k rises to 7 → ~40% probe coverage):
    queries with planted high-cos neighbors (the realistic ANN workload —
    near-duplicates exist) must get ≥0.9 of their true top-10. Ground
    truth computed independently in numpy."""
    import numpy as np

    from kafka_hadoop_consumer_spark.queries.similarity import (
        EMB_DIM,
        TOP_K,
        lsh_topk,
    )

    rng = np.random.RandomState(123)
    n = 5000
    V = rng.randn(n, EMB_DIM)
    for q in range(5):
        for j in range(12):   # 12 planted neighbors per query, cos ~0.73-0.97
            noise = rng.randn(EMB_DIM)
            V[100 + q * 12 + j] = (
                V[q] / np.linalg.norm(V[q])
                + (0.25 + 0.05 * j) * noise / np.linalg.norm(noise)
            )
    norms = np.linalg.norm(V, axis=1)
    C = (V @ V.T) / np.outer(norms, norms)
    exact = {}
    for q in range(5):
        s = C[q].copy()
        s[q] = -2.0
        exact[q] = set(np.argsort(-s)[:TOP_K].tolist())

    ed = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(n)],
        "vec_id long, v array<double>",
    ).repartition(8)
    queries = ed.where("vec_id < 5").selectExpr("vec_id AS q_id", "v AS qv")
    approx = _topk(lsh_topk(ed, queries))
    recalls = [len(exact[q] & approx[q]) / TOP_K for q in exact]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.9, f"mean recall {mean_recall:.2f} ({recalls})"


def test_ivf_recall_beats_random(spark):
    exact = _topk(QUERIES["q_sim_cosine_topk"](spark, SF_DIR))
    approx = _topk(QUERIES["q_sim_ivf_topk"](spark, SF_DIR))
    assert set(exact) == set(approx)
    recalls = [len(exact[q] & approx[q]) / len(exact[q]) for q in exact]
    mean_recall = sum(recalls) / len(recalls)
    # nprobe=3 of 10 cells scans ~30% of the corpus; nearest-cell probing
    # must beat random subsetting (0.30) clearly.
    assert mean_recall >= 0.45, f"mean recall {mean_recall:.2f} ({recalls})"


def test_lsh_results_are_true_cosines(spark):
    """Approximate ≠ wrong: every (q, v, cos) LSH emits must equal the
    exact operator's cosine for that pair (it only *misses* pairs)."""
    exact = {
        (int(r["q_id"]), int(r["vec_id"])): r["cos_sim"]
        for r in QUERIES["q_sim_cosine_topk"](spark, SF_DIR).collect()
    }
    for r in QUERIES["q_sim_lsh_topk"](spark, SF_DIR).collect():
        key = (int(r["q_id"]), int(r["vec_id"]))
        if key in exact:
            assert abs(exact[key] - r["cos_sim"]) < 1e-9


def test_dedup_embedding_recall_vs_exact(spark):
    """The registered near-dup operator is the LSH cascade; measure its
    recall against the exact all-pairs ground truth. With 12 tables x 3
    bits, recall at the fixture's hardest band (cos ~= 0.40) is ~0.93+
    analytically; measured 0.983 overall on the fixed seed."""
    from kafka_hadoop_consumer_spark.queries.similarity import exact_embedding_pairs

    approx = {
        (int(r["vec1"]), int(r["vec2"]))
        for r in QUERIES["q_dedup_embedding"](spark, SF_DIR).collect()
    }
    exact = {
        (int(r["vec1"]), int(r["vec2"])): r["cos_sim"]
        for r in exact_embedding_pairs(spark, SF_DIR).collect()
    }
    assert approx <= set(exact), "cascade must emit only true pairs (precision 1.0)"
    recall = len(approx) / len(exact)
    assert recall >= 0.95, f"recall {recall:.3f} ({len(approx)}/{len(exact)})"


def test_kmeans_matches_numpy_lloyds(spark):
    """q_embed_kmeans must reproduce an independent NumPy Lloyd's run
    exactly: same deterministic init (vec_id < k), same per-iteration
    6dp centroid rounding (which is what makes both sides bit-stable),
    same lowest-id argmin tie-break. Also gates that the clustering is
    non-trivial (every cluster non-empty) and that inertia does not
    increase across iterations."""
    import numpy as np

    from kafka_hadoop_consumer_spark.queries.similarity import (
        KMEANS_ITERS,
        KMEANS_K,
    )
    from tests.conftest import SF_DIR

    rows = (
        QUERIES["q_embed_kmeans"](spark, SF_DIR)
        .orderBy("vec_id")
        .collect()
    )
    got = {int(r["vec_id"]): int(r["cluster"]) for r in rows}

    import pyarrow.parquet as pq

    from kafka_hadoop_consumer_spark.queries.similarity import _round_half_up

    def r6(arr):
        # HALF_UP on the shortest decimal repr, like the engine and the
        # DuckDB oracle — np.round is banker's and would fork the
        # trajectory at any mean whose shortest repr ends in 5
        return np.array([_round_half_up(float(x), 6) for x in arr])

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    t = t.sort_values("vec_id").reset_index(drop=True)
    V = np.array([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    cents = np.stack([r6(row) for row in V[:KMEANS_K]])
    inertias = []
    for _ in range(KMEANS_ITERS):
        d2 = ((V[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # argmin takes first occurrence = lowest id
        inertias.append(d2.min(axis=1).sum())
        for k in range(KMEANS_K):
            if (assign == k).any():
                cents[k] = r6(V[assign == k].mean(axis=0))
    d2 = ((V[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    final = d2.argmin(axis=1)
    expected = {int(t["vec_id"][i]): int(final[i]) for i in range(len(t))}

    assert got == expected
    assert len({c for c in got.values()}) == KMEANS_K, "empty cluster"
    assert all(
        b <= a * (1 + 1e-9) for a, b in zip(inertias, inertias[1:])
    ), f"inertia increased: {inertias}"


def test_mmr_rerank_matches_numpy_mirror(spark):
    """q_sim_mmr_rerank exactness: an independent greedy-MMR mirror over
    the engine's own candidate sets must reproduce the selection, order,
    and scores exactly (both sides numpy float64 — no tolerance)."""
    import numpy as np
    import pandas as pd

    from kafka_hadoop_consumer_spark.queries.similarity import (
        MMR_CAND_K,
        MMR_LAMBDA,
        MMR_OUT_K,
        _round_half_up,
        mmr_candidates,
    )

    cands = mmr_candidates(spark, SF_DIR).toPandas()
    got = (
        QUERIES["q_sim_mmr_rerank"](spark, SF_DIR)
        .toPandas()
        .sort_values(["q_id", "mmr_rank"])
        .reset_index(drop=True)
    )
    rows = []
    for q_id, g in cands.groupby("q_id"):
        g = g.sort_values("vec_id").reset_index(drop=True)
        assert len(g) == MMR_CAND_K
        V = np.stack(g["v"].to_numpy())
        qv = np.asarray(g["qv"].iloc[0])
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        simq = Vn @ (qv / np.linalg.norm(qv))
        S = Vn @ Vn.T
        sel = []
        for rank in range(1, MMR_OUT_K + 1):
            best_i, best = -1, -np.inf
            for i in range(len(g)):
                if i in sel:
                    continue
                pen = max((S[i][j] for j in sel), default=0.0)
                score = _round_half_up(
                    MMR_LAMBDA * simq[i] - (1 - MMR_LAMBDA) * pen, 6
                )
                if score > best:
                    best_i, best = i, score
            sel.append(best_i)
            rows.append((q_id, int(g["vec_id"].iloc[best_i]), rank,
                         _round_half_up(float(best), 4)))
        # diversity sanity: the picked set is not simply raw top-k by simq
        # unless top-k already diverse; at minimum scores are decreasing
        scores = [r[3] for r in rows if r[0] == q_id]
        assert scores == sorted(scores, reverse=True)
    expected = pd.DataFrame(
        rows, columns=["q_id", "vec_id", "mmr_rank", "mmr_score"]
    ).sort_values(["q_id", "mmr_rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"mmr_rank": "int64"}),
        expected.astype({"mmr_rank": "int64"}),
        check_dtype=False,
    )


def test_pca_matches_numpy_full_corpus(spark):
    """q_embed_pca projections must match a from-scratch full-corpus
    NumPy PCA (same covariance convention, same sign fix) to 1e-6, and
    explained-variance ratios must be sane and ordered."""
    import numpy as np

    from kafka_hadoop_consumer_spark.catalog import load_table
    from kafka_hadoop_consumer_spark.queries import QUERIES
    from kafka_hadoop_consumer_spark.queries.similarity import PCA_K
    from tests.conftest import SF_DIR

    got = QUERIES["q_embed_pca"](spark, SF_DIR).toPandas().sort_values(
        "vec_id", ignore_index=True
    )
    raw = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id", ignore_index=True)
    )
    X = np.stack(raw.embedding.to_numpy()).astype(np.float64)
    mu = X.mean(axis=0)
    C = (X - mu).T @ (X - mu) / X.shape[0]
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:PCA_K]
    evr_total = vals.sum()
    for i, idx in enumerate(order, start=1):
        v = vecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        exp = (X - mu) @ v
        assert np.allclose(got[f"pc{i}"].to_numpy(), exp, atol=1e-5), i
        assert abs(got[f"evr{i}"].iloc[0] - vals[idx] / evr_total) < 1e-5
    assert got["evr1"].iloc[0] >= got["evr2"].iloc[0] > 0


def test_pq_recall_vs_exact_cosine(spark):
    """PQ ADC shortlist + exact re-rank must recover ≥0.8 of the exact
    cosine top-10 per query on the fixture, and its surviving cos_sim
    values must agree with the exact ranking's values (the re-rank stage
    computes TRUE cosine, so overlapping pairs match to the same 4dp)."""
    from kafka_hadoop_consumer_spark.queries import QUERIES
    from kafka_hadoop_consumer_spark.queries.similarity import TOP_K
    from tests.conftest import SF_DIR

    exact = QUERIES["q_sim_cosine_topk"](spark, SF_DIR).toPandas()
    approx = QUERIES["q_sim_pq_topk"](spark, SF_DIR).toPandas()
    ex = exact.groupby("q_id")
    ap = approx.groupby("q_id")
    recalls = []
    for q, g in ex:
        a = ap.get_group(q)
        hits = set(g.vec_id) & set(a.vec_id)
        recalls.append(len(hits) / TOP_K)
        em = g.set_index("vec_id").cos_sim
        am = a.set_index("vec_id").cos_sim
        for v in hits:
            assert abs(em[v] - am[v]) < 1e-9
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.8, f"mean recall {mean_recall:.2f} ({recalls})"


def test_hybrid_search_core_parameterized(spark):
    """The extracted hybrid_search core (bench's scaling-probe entry
    point) must honor an arbitrary query->terms mapping on an arbitrary
    corpus: HYB_OUT fused hits per query, lexically-seeded PRF hits
    present, and hydrated metadata columns intact."""
    from pyspark.sql import functions as F

    from kafka_hadoop_consumer_spark.queries.similarity import (
        HYB_OUT,
        hybrid_search,
    )

    n = 200
    d = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("alpha "),
                F.when(F.col("id") % 3 == 0, "beta beta").otherwise("gamma"),
            ).alias("text"),
            F.lit("en").alias("lang"),
            F.lit("synth").alias("source"),
        )
    )
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            (F.col("id") % (i + 2)).cast("float") for i in range(8)
        ]).alias("embedding"),
    )
    out = hybrid_search(
        spark, d, emb, {"qa": ("beta",), "qb": ("gamma",)}
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == {"qa", "qb"}
    for q, rows in by_q.items():
        assert len(rows) == HYB_OUT
        assert [r.fused_rank for r in sorted(rows, key=lambda r: r.fused_rank)] == list(
            range(1, HYB_OUT + 1)
        )
        assert all(r.lang == "en" and r.source == "synth" for r in rows)
    # lexical stage must seed the fusion: every 'beta' doc is a %3==0 id
    beta_docs = [r.doc_id for r in by_q["qa"]]
    assert any(doc % 3 == 0 for doc in beta_docs)


def test_lsh_topk_handles_out_of_corpus_queries(spark):
    """lsh_topk must bucket the QUERY VECTOR itself, not look the q_id up
    in the corpus: pre-fix an out-of-corpus query produced zero probe
    buckets and silently returned no rows (r9 review). A query vector
    EQUAL to a corpus vector lands in identical buckets in every table,
    so its nearest neighbor (cos 1.0) is a guaranteed candidate."""
    import numpy as np

    from kafka_hadoop_consumer_spark.queries.similarity import lsh_topk

    rng = np.random.RandomState(7)
    V = rng.randn(100, 64)
    ed = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(100)],
        "vec_id long, v array<double>",
    )
    queries = spark.createDataFrame(
        [(9999, [float(x) for x in V[5]])], "q_id long, qv array<double>"
    )
    out = lsh_topk(ed, queries, top_k=3).collect()
    assert out, "out-of-corpus query must still retrieve neighbors"
    top = sorted(out, key=lambda r: -r["cos_sim"])[0]
    assert top["vec_id"] == 5 and top["cos_sim"] == 1.0
