"""Independent NumPy mirrors for the round-3 iterative operators.

The DuckDB oracles replay the SAME formulation as the Spark queries, so
they prove cross-engine parity, not correctness of the formulation. These
tests recompute the greedy coreset trajectory and the logistic-regression
descent in plain NumPy from the raw fixture bytes — a third
implementation sharing no query machinery (the q_embed_kmeans
discipline) — and demand exact agreement on the pinned quantities.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from tests.conftest import SF_DIR
from kafka_hadoop_consumer_spark.queries import QUERIES
from kafka_hadoop_consumer_spark.queries.similarity import CORESET_STEPS


def test_coreset_matches_numpy_greedy(spark):
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = np.asarray(t["vec_id"])
    V = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    nrm = np.sqrt((V * V).sum(axis=1))

    selected = [int(np.where(ids == 0)[0][0])]
    picks = [(0, None)]
    for _ in range(CORESET_STEPS):
        # max cosine of every vector to the selected set, rounded 6dp
        S = V[selected]
        sn = nrm[selected]
        cos = (V @ S.T) / np.outer(nrm, sn)
        maxcos = np.round(cos.max(axis=1), 6)
        mask = np.ones(len(ids), dtype=bool)
        mask[selected] = False
        # argmin with vec_id tie-break: ids are sorted ascending, so the
        # first index attaining the min wins
        cand = np.where(mask)[0]
        best = cand[np.lexsort((ids[cand], maxcos[cand]))[0]]
        picks.append((int(ids[best]), float(maxcos[best])))
        selected.append(int(best))

    rows = {
        r.step: (r.vec_id, r.max_cos_at_pick)
        for r in QUERIES["q_sample_coreset"](spark, SF_DIR).collect()
    }
    assert len(rows) == CORESET_STEPS + 1
    for step, (vid, cov) in enumerate(picks):
        got_vid, got_cov = rows[step]
        assert got_vid == vid, (step, got_vid, vid)
        if cov is None:
            assert got_cov is None
        else:
            assert abs(got_cov - cov) < 1e-9, (step, got_cov, cov)


def test_logreg_matches_numpy_descent(spark):
    from kafka_hadoop_consumer_spark.queries.quality import (
        LOGREG_ITERS,
        LOGREG_LR,
        _DAY_US_LR,
    )

    t = pq.read_table(f"{SF_DIR}/events.parquet")
    value = np.asarray(t["value"], dtype=np.float64)
    etype = np.asarray(t["event_type"])
    ts_us = np.asarray(t["ts"].cast("timestamp[us]").cast("int64"))

    n = len(value)
    s1, s2 = value.sum(), (value * value).sum()
    mu = round(s1 / n, 6)
    sd = round(float(np.sqrt((s2 - s1 * s1 / n) / (n - 1))), 6)
    y = (etype == "purchase").astype(np.float64)
    x1 = (value - mu) / sd
    x2 = (((ts_us // _DAY_US_LR + 4) % 7 == 0)
          | ((ts_us // _DAY_US_LR + 4) % 7 == 6)).astype(np.float64)

    b = np.zeros(3)
    for _ in range(LOGREG_ITERS):
        p = 1.0 / (1.0 + np.exp(-(b[0] + b[1] * x1 + b[2] * x2)))
        g = np.array([(p - y).mean(), ((p - y) * x1).mean(), ((p - y) * x2).mean()])
        b = np.round(b - LOGREG_LR * g, 6)

    row = QUERIES["q_ml_logreg"](spark, SF_DIR).collect()[0]
    assert (row.b0, row.b1, row.b2) == tuple(b), (row, b)
