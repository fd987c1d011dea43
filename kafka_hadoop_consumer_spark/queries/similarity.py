"""Embedding similarity search (SURVEY.md §2B; build plan M4): brute-force
cosine top-k (the correctness baseline), sign-bit LSH ANN (the scale
path), and embedding-cosine near-dup pairs.

Numeric determinism: embeddings are float32; both engines upcast to
double FIRST and accumulate sequentially, so dot products agree bitwise
(verified empirically at 4dp against two independent DuckDB
formulations). All similarity outputs are rounded to 4dp; thresshold
comparisons happen on the ROUNDED value so boundary pairs can't flip.

Scale notes: the brute-force path broadcasts the (small) query side, so
the corpus never shuffles — O(|corpus|·k) memory. The LSH path buckets
the corpus once (16 buckets here; O(√n)–O(n/buckets) candidates per
probe with Hamming-1 multiprobe) — sublinear per-query work at 100 TB.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
from pyspark import cloudpickle
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Executor-side Python workers don't share the driver's sys.path; the
# pandas UDF below must pickle by value (see queries/udfs.py).
cloudpickle.register_pickle_by_value(sys.modules[__name__])

from kafka_hadoop_consumer_spark.catalog import load_table
from kafka_hadoop_consumer_spark.queries.registry import (
    fan_out,
    persist_tracked,
    query,
)

TOP_K = 10
N_QUERY = 5          # vec_id < 5 are the query vectors
DEDUP_COS_THRESHOLD = 0.4
EMB_DIM = 64

# Multi-table LSH for top-k ANN (q_sim_lsh_topk). L fixed tables drive
# recall for genuinely-similar vectors; bits-per-table k adapts to corpus
# size (k ≈ log2(n / target bucket rows)) so buckets stay ~constant-sized
# at any scale. Per-table probe fraction with Hamming-1 multiprobe is
# (k+1)/2^k → at n=10⁹ (k≈25) a query touches ~10⁻⁵ of the corpus; at
# tiny test corpora k floors at 4 and coverage approaches 100% — the
# correct degeneration (a 500-vector corpus needs no ANN).
#
# k selection is by INTEGER thresholds (n ≥ ceil(32·2^(k-1/2))), not a
# runtime log2: the thresholds below are the exact integer solutions of
# round(log2(n/32)) = k, precomputed once, so the Python engine and the
# DuckDB oracle pick identical k by integer comparison — no cross-engine
# libm-rounding risk at a floor boundary. MAX_BITS caps k at the depth of
# the seeded hyperplane bank; it is a test-profile setting — at real scale
# regenerate a deeper bank (seeded, free) and raise the cap with it.
SIM_LSH_TABLES = 8
SIM_LSH_TARGET_BUCKET = 32
SIM_LSH_MIN_BITS = 4
SIM_LSH_MAX_BITS = 8
# n-thresholds at which k steps to 5, 6, 7, 8 (= ceil(32 * 2**(k - 0.5)))
_SIM_K_THRESHOLDS = [725, 1449, 2897, 5793]

# Multi-table LSH for near-dup candidate generation (q_dedup_embedding).
# k bits/table bounds per-table bucket count (2^k); L tables drive recall:
# P(candidate | cos=c) = 1 - (1 - p^k)^L with p = 1 - arccos(c)/pi.
# At the fixture's hardest pairs (cos ~= 0.40, p ~= 0.63): ~0.93 with
# k=3, L=12; recall rises steeply with cos (0.99 at cos 0.6). At 100 TB
# raise k ~ log2(n/target_bucket_size) and L with it — the join stays an
# equi-join on (table, bucket), never an all-pairs product.
DEDUP_LSH_TABLES = 12
DEDUP_LSH_BITS = 3


def _vec_double(col: str = "embedding"):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


# Shared oracle CTE: embeddings upcast to double with precomputed norms.
_ORACLE_E = """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v,
                      sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
               FROM embeddings)
"""


def broadcast_cosine_topk(
    ed: DataFrame,
    k: int,
    vcol: str = "v",
    ncol: str = "nrm",
    n_query: int = N_QUERY,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """THE brute-force exact-cosine ranking core: top-``k`` of every
    query vector (vec_id < ``n_query``, drawn from ``ed`` itself)
    against the rest of the corpus, ranked on the raw cosine of
    ``vcol``/``ncol`` with vec_id tie-break. Single source for
    q_sim_cosine_topk, q_e2e_semsearch, mmr_candidates,
    q_embed_matryoshka, q_sim_rrf_fusion, and q_sim_eval_ndcg (r9
    review: six hand-kept copies of this block could fork the tie-break
    or rounding between keys) — callers project/round from the returned
    (q_id, vec_id, cos_raw, *carry, rn) frame.

    Scale shape: the query side broadcasts; the corpus streams through
    executors once, never shuffling — the only wide op is the per-query
    top-k window over |queries|·|corpus| scored rows, partitioned by
    q_id. ``carry`` forwards extra post-join columns (e.g. the raw
    vectors for MMR) through the ranking."""
    q = ed.where(F.col("vec_id") < n_query).select(
        F.col("vec_id").alias("q_id"),
        F.col(vcol).alias("qv"),
        F.col(ncol).alias("qnrm"),
    )
    cos = _dot(F.col("qv"), F.col(vcol)) / (F.col("qnrm") * F.col(ncol))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
    return (
        ed.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias("cos_raw"), *carry)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )


@query(
    "q_sim_cosine_topk",
    oracle=_ORACLE_E
    + f"""
    SELECT q_id, vec_id, cos_sim FROM (
      SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
             round(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
                   / (a.nrm * b.nrm), 4) AS cos_sim,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
                        / (a.nrm * b.nrm) DESC, b.vec_id) AS rn
      FROM e a JOIN e b ON a.vec_id < {N_QUERY} AND b.vec_id <> a.vec_id
    ) WHERE rn <= {TOP_K}
    """,
)
def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: exact ANN baseline.

    The query side ({N_QUERY} vectors) is broadcast; the corpus side
    streams through executors once — no shuffle of the big side. Ranking
    uses the raw cosine (ties broken by vec_id); output is rounded.
    """
    e = load_table(spark, sf_dir, "embeddings")
    # norms precomputed ONCE per vector (mirroring the oracle's e CTE):
    # the pair expression is then a single array pass (dot) instead of
    # dot + two norm recomputations per (q, v) pair.
    ed = e.select(
        "vec_id", _vec_double().alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    return broadcast_cosine_topk(ed, TOP_K).select(
        "q_id", "vec_id", F.round("cos_raw", 4).alias("cos_sim")
    )


def _dedup_planes() -> list[list[list[float]]]:
    """Deterministic hyperplanes for the near-dup LSH tables (seed 7):
    ``planes[l][j]`` is bit ``j`` of table ``l``. Shipped as literals to
    BOTH engines, so the candidate sets match by construction."""
    rng = np.random.RandomState(7)
    return rng.randn(DEDUP_LSH_TABLES, DEDUP_LSH_BITS, EMB_DIM).tolist()


def _dedup_embedding_oracle() -> str:
    """Oracle mirroring the LSH cascade exactly: identical plane literals,
    identical sign-bit buckets, identical verify threshold."""
    rows = []
    for l, table in enumerate(_dedup_planes()):
        for j, h in enumerate(table):
            lit = "[" + ", ".join(repr(x) for x in h) + "]"
            rows.append(f"({l}, {j}, {lit}::DOUBLE[])")
    values = ",\n      ".join(rows)
    return (
        _ORACLE_E
        + f""",
    planes AS (SELECT * FROM (VALUES
      {values}) AS p(l, j, h)),
    buckets AS (
      SELECT e.vec_id, p.l,
             CAST(sum(CASE WHEN list_sum(list_transform(list_zip(e.v, p.h),
                                                        q -> q[1] * q[2])) > 0
                           THEN 1 << p.j ELSE 0 END) AS INT) AS bucket
      FROM e, planes p
      GROUP BY e.vec_id, p.l),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec1, b.vec_id AS vec2
      FROM buckets a JOIN buckets b
        ON a.l = b.l AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT vec1, vec2,
           round(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
                 / (a.nrm * b.nrm), 4) AS cos_sim
    FROM cand JOIN e a ON a.vec_id = vec1 JOIN e b ON b.vec_id = vec2
    WHERE round(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
                / (a.nrm * b.nrm), 4) > {DEDUP_COS_THRESHOLD}
    """
    )


def exact_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs ground truth (cos > {DEDUP_COS_THRESHOLD}) — O(n²),
    test/recall-measurement use only; deliberately NOT a registered query
    (the registered operator is the bucketed cascade below)."""
    e = load_table(spark, sf_dir, "embeddings")
    ed = e.select(
        "vec_id", _vec_double().alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    a = ed.select(
        F.col("vec_id").alias("vec1"), F.col("v").alias("v1"), F.col("nrm").alias("n1")
    )
    b = ed.select(
        F.col("vec_id").alias("vec2"), F.col("v").alias("v2"), F.col("nrm").alias("n2")
    )
    cos = F.round(_dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")), 4)
    return (
        a.join(b, F.col("vec1") < F.col("vec2"))
        .select("vec1", "vec2", cos.alias("cos_sim"))
        .where(F.col("cos_sim") > DEDUP_COS_THRESHOLD)
    )


def embedding_near_dup_pairs(
    ed: DataFrame,
    planes: list[list[list[float]]],
    threshold: float = DEDUP_COS_THRESHOLD,
) -> DataFrame:
    """Multi-table sign-bit LSH near-dup cascade over any (vec_id,
    v: array<double>) corpus — the library core behind q_dedup_embedding.
    ``planes[l][j]`` is hyperplane j of table l; bits-per-table should
    grow ~log2(n/target_bucket) with corpus size so bucket sizes (and
    with them candidate counts) stay bounded — the scaling bench in
    bench.py measures exactly that contract at 1× vs 10×."""
    edn = ed.withColumn("nrm", _norm(F.col("v")))
    # persisted because it's SELF-joined below: without the pin the L·k
    # hyperplane-dot HOF projection (the cascade's hot math) runs once
    # per join side; the pinned frame is (vec_id, l, bucket) ints — tiny
    # relative to the vectors, safe at any corpus scale (the lsh_topk
    # precedent)
    bucketed = persist_tracked(
        edn.select(
            "vec_id",
            F.posexplode(F.array(*_table_buckets(F.col("v"), planes))).alias(
                "l", "bucket"
            ),
        )
    )
    cand = (
        bucketed.alias("a")
        .join(
            bucketed.alias("b"),
            (F.col("a.l") == F.col("b.l"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec1"), F.col("b.vec_id").alias("vec2"))
        .distinct()
    )
    a = edn.select(
        F.col("vec_id").alias("vec1"), F.col("v").alias("v1"), F.col("nrm").alias("n1")
    )
    b = edn.select(
        F.col("vec_id").alias("vec2"), F.col("v").alias("v2"), F.col("nrm").alias("n2")
    )
    cos = F.round(_dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")), 4)
    return (
        cand.join(a, "vec1")
        .join(b, "vec2")
        .select("vec1", "vec2", cos.alias("cos_sim"))
        .where(F.col("cos_sim") > threshold)
    )


@query("q_dedup_embedding", oracle=_dedup_embedding_oracle())
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via multi-table sign-bit LSH:
    candidate pairs collide in ≥1 of {DEDUP_LSH_TABLES} tables
    ({DEDUP_LSH_BITS} bits each), then exact cosine verify
    (> {DEDUP_COS_THRESHOLD} on the ROUNDED value, both engines).

    The oracle runs the SAME cascade (plane literals shared), so the
    check is exact cross-engine parity of the full pipeline, not of an
    all-pairs scan. Recall vs the exact ground truth
    (exact_embedding_pairs) is measured in tests/test_similarity.py.

    Scale shape: every join is an equi-join — (table, bucket) for
    candidates, vec_id to re-fetch vectors — so the plan has no
    cartesian/BNLJ over the corpus (asserted in tests/test_plans.py).
    At 100 TB, raise DEDUP_LSH_BITS ~ log2(n/bucket_target) so bucket
    sizes stay bounded; candidate verify cost is O(Σ candidates), not
    O(n²).
    """
    e = load_table(spark, sf_dir, "embeddings")
    ed = e.select("vec_id", _vec_double().alias("v"))
    return embedding_near_dup_pairs(ed, _dedup_planes())


def _table_buckets(vcol, planes: list[list[list[float]]]):
    """One int bucket column per LSH table: bit j = (v · h[l][j]) > 0.
    ``planes[l][j]`` is hyperplane j of table l, shipped as literals."""
    out = []
    for table in planes:
        bits = [
            F.when(
                _dot(vcol, F.array(*[F.lit(float(x)) for x in row])) > 0,
                F.lit(1 << j),
            ).otherwise(F.lit(0))
            for j, row in enumerate(table)
        ]
        out.append(sum(bits[1:], start=bits[0]).cast("int"))
    return out


def _sim_lsh_bits(n: int) -> int:
    """Bits per table for an n-vector corpus: bucket ≈ TARGET_BUCKET rows.
    Integer-threshold form of round(log2(n / TARGET)), clamped to
    [MIN_BITS, MAX_BITS] — mirrored verbatim in the oracle SQL CASE."""
    k = SIM_LSH_MIN_BITS
    for t in _SIM_K_THRESHOLDS:
        if n >= t:
            k += 1
    return min(k, SIM_LSH_MAX_BITS)


def _sim_plane_bank() -> np.ndarray:
    """Deterministic hyperplane bank (seed 42), shape
    (L, MAX_BITS, dim) — k-INDEPENDENT so the oracle can ship the full
    bank as literals while k is chosen at runtime; table l at depth k
    uses rows bank[l, :k, :]."""
    rng = np.random.RandomState(42)
    return rng.randn(SIM_LSH_TABLES, SIM_LSH_MAX_BITS, EMB_DIM)


def _sim_planes(k: int) -> list[list[list[float]]]:
    """First k hyperplanes of each ANN table from the seeded bank."""
    return _sim_plane_bank()[:, :k, :].tolist()


def lsh_topk(ed: DataFrame, queries: DataFrame, top_k: int = TOP_K) -> DataFrame:
    """Multi-table sign-bit LSH ANN core over any (vec_id, v) corpus.

    ``ed`` is the corpus (vec_id, v: array<double>), ``queries`` the
    query side (q_id, qv). Candidate generation: the corpus is bucketed
    once per table (L bucket ids per vector); each query probes, in each
    table, its own bucket plus the k Hamming-1 neighbors; union of
    colliding vectors across tables → exact cosine on candidates only.

    Scale shape: the probe table is L·(k+1) rows per query — broadcast;
    the corpus never shuffles for candidate generation, and the verify
    join is an equi-join on vec_id over the (sublinear) candidate set.
    """
    n = ed.count()
    k = _sim_lsh_bits(n)
    # Bucketing is the hot math (L·k hyperplane dots per vector);
    # interpreted higher-order functions evaluate per element, so this
    # is the one place a vectorized Arrow UDF wins: one numpy matmul per
    # batch (measured ~6× over the HOF formulation at sf0.1). Allowed
    # here because the key is rows-only checked — q_dedup_embedding, in
    # contrast, must stay HOF so its arithmetic is bit-identical with
    # its DuckDB oracle's.
    H = np.asarray(_sim_planes(k))          # (L, k, dim)
    Hf = H.reshape(-1, H.shape[-1]).T       # (dim, L·k)
    weights = 1 << np.arange(k)

    @F.pandas_udf("array<int>")
    def _buckets(vs: pd.Series) -> pd.Series:
        V = np.stack(vs.values)                      # (rows, dim)
        bits = (V @ Hf) > 0                          # (rows, L·k)
        b = bits.reshape(len(V), H.shape[0], k) @ weights
        return pd.Series(list(b.astype(np.int32)))

    bucketed = ed.select(
        "vec_id", F.posexplode(_buckets("v")).alias("l", "bucket")
    )
    # probe buckets hash qv through the SAME planes — NOT a join on
    # vec_id membership in the corpus, which silently returned zero rows
    # for any out-of-corpus query (r9 review); for in-corpus queries the
    # buckets are identical, for new vectors they're now actually defined
    probes = queries.select(
        "q_id", F.posexplode(_buckets("qv")).alias("l", "bucket")
    ).select(
        "q_id",
        "l",
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << j)).cast("int")
                    for j in range(k)
                ],
            )
        ).alias("bucket"),
    )
    cand = (
        bucketed.join(F.broadcast(probes), ["l", "bucket"])
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
        .distinct()
    )
    edn = ed.withColumn("nrm", _norm(F.col("v")))
    qn = queries.withColumn("qnrm", _norm(F.col("qv")))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
    return (
        edn.join(cand, "vec_id")
        .join(F.broadcast(qn), "q_id")
        .select("q_id", "vec_id", cos.alias("cos_raw"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_k)
        .select("q_id", "vec_id", F.round("cos_raw", 4).alias("cos_sim"))
    )


IVF_NPROBE = 3


# Shared oracle CTE block: computed-and-rounded centroids (avg per
# (cell, dim), 6dp — the q_embed_centroid precedent) and nearest-centroid
# assignment of every vector. Appended after _ORACLE_E; used by the IVF
# ANN oracle and the SemDeDup oracle so both replay ONE cascade.
_IVF_ASSIGN_CTES = """,
    cx AS (
      SELECT label AS cell, pos, round(avg(x), 6) AS cx
      FROM (SELECT label, unnest(v) AS x, unnest(range(1, len(v) + 1)) AS pos
            FROM e)
      GROUP BY label, pos),
    cent AS (SELECT cell, list(cx ORDER BY pos) AS cv FROM cx GROUP BY cell),
    centn AS (
      SELECT cell, cv, sqrt(list_sum(list_transform(cv, x -> x * x))) AS cnrm
      FROM cent),
    assigned AS (
      SELECT vec_id, v, nrm, cell FROM (
        SELECT e.vec_id, e.v, e.nrm, c.cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_sum(list_transform(list_zip(e.v, c.cv),
                                                  p -> p[1] * p[2]))
                          / (e.nrm * c.cnrm) DESC, c.cell) AS rn
        FROM e, centn c)
      WHERE rn = 1)"""


def _sim_ivf_oracle() -> str:
    """Oracle running the IDENTICAL IVF cascade in DuckDB: centroids are
    computed (avg per (cell, dim)) and rounded 6dp on both engines — the
    q_embed_centroid precedent — so assignment/probe similarity arithmetic
    is a sequential double fold over identical inputs on both sides."""
    return (
        _ORACLE_E
        + _IVF_ASSIGN_CTES
        + f""",
    probes AS (
      SELECT q_id, qv, qnrm, cell FROM (
        SELECT a.vec_id AS q_id, a.v AS qv, a.nrm AS qnrm, c.cell,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY list_sum(list_transform(list_zip(a.v, c.cv),
                                                  p -> p[1] * p[2]))
                          / (a.nrm * c.cnrm) DESC, c.cell) AS rn
        FROM assigned a, centn c
        WHERE a.vec_id < {N_QUERY})
      WHERE rn <= {IVF_NPROBE})
    SELECT q_id, vec_id, cos_sim FROM (
      SELECT p.q_id, s.vec_id,
             round(list_sum(list_transform(list_zip(p.qv, s.v), z -> z[1] * z[2]))
                   / (p.qnrm * s.nrm), 4) AS cos_sim,
             row_number() OVER (
               PARTITION BY p.q_id
               ORDER BY list_sum(list_transform(list_zip(p.qv, s.v),
                                                z -> z[1] * z[2]))
                        / (p.qnrm * s.nrm) DESC, s.vec_id) AS rn
      FROM assigned s JOIN probes p ON s.cell = p.cell
      WHERE s.vec_id <> p.q_id
    ) WHERE rn <= {TOP_K}
    """
    )


def _ivf_assign(e: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Spark side of _IVF_ASSIGN_CTES: computed 6dp-rounded centroids per
    coarse cell (label-seeded) and nearest-centroid assignment. Returns
    (cent(cell, cv, cnrm), assigned(vec_id, v, nrm, cell))."""
    # fan_out (guide §2.5): the fixture embeddings file is one row group
    # → one scan task, serializing every per-vector dot/norm below on a
    # single core; no-op on real multi-split inputs
    ed = fan_out(e, "vec_id").select(
        "vec_id", "label", _vec_double().alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    # element-wise centroid per cell: posexplode → mean per (cell, pos)
    # → re-assemble ordered arrays
    cent = (
        ed.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("x"), 6).alias("cx"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                lambda s: s.cx,
            ).alias("cv")
        )
        .select(F.col("label").alias("cell"), "cv")
        .withColumn("cnrm", _norm(F.col("cv")))
    )
    # assign every vector to its nearest centroid. r13 (guide §2.3/§4.1):
    # this was a broadcast cross join (|vecs| × |cells| rows, each
    # carrying the full vector) ranked by a Window.partitionBy(vec_id) —
    # i.e. a k× row explosion AND a shuffle of vectors×k bytes, for an
    # argmax. All centroids now ride in ONE broadcast row (sorted by
    # cell id) and each vector picks its cell with a linear JVM
    # aggregate over that array: zero row amplification, zero exchange.
    # Tie-break identical to the old rank: strict > over cells iterated
    # in ascending id keeps the LOWEST cell among equal similarities,
    # exactly orderBy(c_sim desc, cell).
    # r14 guard (r13 advice): an EMPTY centroid table must yield an
    # empty assignment (the pre-r13 inner join's behavior), not every
    # vector with cell = null from array_max over []. The filter sits
    # on the ONE-row aggregate side — evaluated once, not per corpus
    # row (a per-row guard after the crossJoin measured ~10-20% slower
    # on ivf/semdedup by breaking the join→project codegen fusion).
    cents = cent.agg(
        F.sort_array(F.collect_list(F.struct("cell", "cv", "cnrm"))).alias("cs")
    ).where(F.size("cs") > 0)

    # one similarity per cell (transform), then a flat array_max whose
    # struct comparator implements (sim desc, cell asc): highest sim
    # wins, and among equal sims the largest NEGATED cell id == the
    # lowest cell id — the exact old rank order.
    sims = F.transform(
        "cs",
        lambda c: F.struct(
            (_dot(F.col("v"), c["cv"]) / (F.col("nrm") * c["cnrm"])).alias(
                "sim"
            ),
            (-c["cell"]).alias("negcell"),
        ),
    )
    assigned = (
        ed.crossJoin(F.broadcast(cents))
        .withColumn("cell", -F.array_max(sims)["negcell"])
        .select("vec_id", "v", "nrm", "cell")
    )
    return cent, assigned


@query("q_sim_ivf_topk", oracle=_sim_ivf_oracle())
def q_sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k ANN via IVF (inverted-file) coarse quantization.

    Real IVF mechanics on DataFrame ops: (1) centroid table — element-wise
    mean embedding per coarse cell (the fixture's ``label`` stands in for
    a k-means trainer; the centroid VECTORS are computed, not assumed),
    rounded 6dp on both engines so accumulation order can't leak;
    (2) every vector assigned to its nearest centroid → inverted lists;
    (3) queries probe the nprobe={IVF_NPROBE} nearest lists and
    brute-force only those candidates. At 100 TB: centroid table is tiny
    (broadcast), each query touches nprobe/n_cells of the corpus, and the
    inverted lists are a partitioning of the data — this is the standard
    billion-vector layout.

    SQL-oracled since r3 (was rows-only): the oracle replays the whole
    cascade — computed-and-rounded centroids, nearest-cell assignment,
    nprobe probing, candidate verify — so the driver hash checks the full
    pipeline end-to-end.
    """
    nprobe = IVF_NPROBE
    e = load_table(spark, sf_dir, "embeddings")
    cent, assigned = _ivf_assign(e)

    # (3) queries probe their nprobe nearest cells
    w_probe = Window.partitionBy("q_id").orderBy(F.col("c_sim").desc(), F.col("cell"))
    probes = (
        assigned.where(F.col("vec_id") < N_QUERY)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
        )
        .join(F.broadcast(cent))
        .select(
            "q_id", "qv", "qnrm", "cell",
            (_dot(F.col("qv"), F.col("cv")) / (F.col("qnrm") * F.col("cnrm"))).alias("c_sim"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .where(F.col("rn") <= nprobe)
        .select("q_id", "qv", "qnrm", "cell")
    )

    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))
    w_top = Window.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
    return (
        assigned.join(F.broadcast(probes), ["cell"])
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias("cos_raw"))
        .withColumn("rn", F.row_number().over(w_top))
        .where(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id", F.round("cos_raw", 4).alias("cos_sim"))
    )


def _sim_lsh_oracle() -> str:
    """Oracle replaying the FULL adaptive-k multiprobe LSH cascade in
    DuckDB: the whole seeded hyperplane bank ships as literals
    (k-independent by construction), k is re-derived from count(*) via
    the same integer thresholds the engine uses, probing is own-bucket
    plus the k Hamming-1 neighbors, and the verify is exact cosine.

    The one cross-engine arithmetic asymmetry is the SIGN of the
    hyperplane dot (engine: one numpy matmul per Arrow batch; oracle:
    sequential list_sum fold). A sign flip needs |dot| within ~1e-13 of
    zero — probability ~1e-13 per dot, ~1e-8 over the whole fixture —
    and both engines are deterministic on fixed parquet, so local
    parity at sf0.01/sf0.1 (tests/test_oracle.py) implies driver parity.
    """
    bank = _sim_plane_bank()
    rows = []
    for l in range(SIM_LSH_TABLES):
        for j in range(SIM_LSH_MAX_BITS):
            lit = "[" + ", ".join(repr(float(x)) for x in bank[l, j]) + "]"
            rows.append(f"({l}, {j}, {lit}::DOUBLE[])")
    values = ",\n      ".join(rows)
    t5, t6, t7, t8 = _SIM_K_THRESHOLDS
    k_case = (
        f"CASE WHEN n >= {t8} THEN 8 WHEN n >= {t7} THEN 7 "
        f"WHEN n >= {t6} THEN 6 WHEN n >= {t5} THEN 5 "
        f"ELSE {SIM_LSH_MIN_BITS} END"
    )
    return (
        _ORACLE_E
        + f""",
    params AS (SELECT {k_case} AS k FROM (SELECT count(*) AS n FROM e)),
    bank AS (SELECT * FROM (VALUES
      {values}) AS p(l, j, h)),
    planes AS (SELECT l, j, h FROM bank WHERE j < (SELECT k FROM params)),
    buckets AS (
      SELECT e.vec_id, p.l,
             CAST(sum(CASE WHEN list_sum(list_transform(list_zip(e.v, p.h),
                                                        q -> q[1] * q[2])) > 0
                           THEN 1 << p.j ELSE 0 END) AS INT) AS bucket
      FROM e, planes p
      GROUP BY e.vec_id, p.l),
    qb AS (SELECT vec_id AS q_id, l, bucket FROM buckets
           WHERE vec_id < {N_QUERY}),
    probes AS (
      SELECT q_id, l, bucket FROM qb
      UNION ALL
      SELECT q_id, l, CAST(xor(bucket, 1 << CAST(j.j AS INT)) AS INT) AS bucket
      FROM qb, (SELECT unnest(range((SELECT k FROM params))) AS j) j),
    cand AS (
      SELECT DISTINCT p.q_id, b.vec_id
      FROM probes p JOIN buckets b ON b.l = p.l AND b.bucket = p.bucket
      WHERE b.vec_id <> p.q_id)
    SELECT q_id, vec_id, cos_sim FROM (
      SELECT c.q_id, c.vec_id,
             round(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
                   / (a.nrm * b.nrm), 4) AS cos_sim,
             row_number() OVER (
               PARTITION BY c.q_id
               ORDER BY list_sum(list_transform(list_zip(a.v, b.v),
                                                p -> p[1] * p[2]))
                        / (a.nrm * b.nrm) DESC, c.vec_id) AS rn
      FROM cand c JOIN e a ON a.vec_id = c.q_id JOIN e b ON b.vec_id = c.vec_id
    ) WHERE rn <= {TOP_K}
    """
    )


@query("q_sim_lsh_topk", oracle=_sim_lsh_oracle())
def q_sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k ANN via multi-table random-hyperplane LSH with
    Hamming-1 multiprobe ({SIM_LSH_TABLES} tables; bits/table adapt to
    corpus size so buckets hold ~{SIM_LSH_TARGET_BUCKET} rows at any n).

    L independent tables drive recall (≥0.9 gated in
    tests/test_similarity.py on the fixture AND a 10× synthetic corpus
    with planted high-cos neighbors); k ≈ log2(n/{SIM_LSH_TARGET_BUCKET})
    keeps per-query candidate sets sublinear at scale — at n=10⁹, k≈25
    and a query touches ~10⁻⁵ of the corpus across all tables.

    SQL-oracled since r3 (was rows-only): the hyperplane BANK is
    k-independent (seeded, sliced to depth k at runtime) so the oracle
    replays the identical cascade — see _sim_lsh_oracle.
    """
    e = load_table(spark, sf_dir, "embeddings")
    ed = e.select("vec_id", _vec_double().alias("v"))
    queries = ed.where(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    return lsh_topk(ed, queries)


KMEANS_K = 8
KMEANS_ITERS = 3


def _sq_dist(vcol, centroid: list[float]):
    """Squared L2 distance between an array column and a centroid literal,
    as a fixed-order sequential fold (deterministic bit pattern)."""
    carr = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vcol, carr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _kmeans_oracle() -> str:
    """DuckDB replay of the full fixed-seed Lloyd's loop as a chained CTE
    (same conversion class as the BPE merge replay and the MMR chain):
    c0 = the 6dp-rounded seed centroids (vec_id < k, cluster = rank by
    vec_id), then per iteration an assignment CTE (cross join against the
    k current centroids, argmin by squared L2 with lowest-cluster
    tie-break — row_number ORDER BY dist, cluster mirrors Spark's
    array_position-of-array_min first-match) and an update CTE
    (positional unnest → per-(cluster, pos) avg rounded to 6dp — the same
    rounding the engine applies each iteration precisely so accumulation
    order can't leak — re-listed in position order, empty clusters
    keeping the previous centroid via the left-join coalesce)."""
    dist = (
        "list_sum(list_transform(list_zip(e.v, c.cv),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    parts = [
        """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
             list_transform(v, x -> round(x, 6)) AS cv
      FROM e WHERE vec_id < {k})""".format(k=KMEANS_K)
    ]
    for i in range(1, KMEANS_ITERS + 1):
        parts.append(
            """,
    a{i} AS (
      SELECT vec_id, v, cluster FROM (
        SELECT e.vec_id, e.v, c.cluster,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist}, c.cluster) AS rn
        FROM e CROSS JOIN c{prev} c)
      WHERE rn = 1),
    u{i} AS (
      SELECT cluster, list(cx ORDER BY pos) AS cv FROM (
        SELECT cluster, pos, round(avg(x), 6) AS cx FROM (
          SELECT cluster, unnest(v) AS x,
                 unnest(range(1, len(v) + 1)) AS pos
          FROM a{i})
        GROUP BY cluster, pos)
      GROUP BY cluster),
    c{i} AS (
      SELECT p.cluster, coalesce(u.cv, p.cv) AS cv
      FROM c{prev} p LEFT JOIN u{i} u ON p.cluster = u.cluster)""".format(
                i=i, prev=i - 1, dist=dist
            )
        )
    parts.append(
        """
    SELECT vec_id, CAST(cluster AS INT) AS cluster,
           round(d, 6) AS dist2
    FROM (
      SELECT e.vec_id, c.cluster, {dist} AS d,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY {dist}, c.cluster) AS rn
      FROM e CROSS JOIN c{last} c)
    WHERE rn = 1""".format(dist=dist, last=KMEANS_ITERS)
    )
    return "".join(parts)


@query("q_embed_kmeans", oracle=_kmeans_oracle())
# Converted from rows-only in r6: the fixed-seed fixed-iteration Lloyd's
# loop is fully expressible as a chained CTE (assignment + update per
# iteration), so the whole trajectory — not just the final assignment —
# is hash-checked; pytest additionally cross-checks against an
# independent NumPy Lloyd's run.
def q_embed_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (Lloyd's), k={KMEANS_K}, {KMEANS_ITERS} fixed
    iterations, deterministic init (vec_id < k are the seeds).

    Spark-first iterative shape: each iteration is (1) an assignment map
    — squared-L2 against k broadcast centroid LITERALS, argmin with
    lowest-id tie-break, no shuffle — and (2) a centroid update: one
    hash agg keyed on (cluster, dim) whose shuffle carries k×dim partial
    sums (constant-size at any corpus scale), collected to the driver
    (k×dim doubles — the legitimate driver-side loop, same class as
    q_dedup_clusters' convergence scalar). Centroids are rounded 6dp
    each iteration so the floating accumulation order inside the update
    agg cannot leak into the next assignment — runs are bit-reproducible
    and match the NumPy mirror in tests/test_similarity.py exactly.
    """
    e = load_table(spark, sf_dir, "embeddings")
    ed = e.select("vec_id", _vec_double().alias("v"))
    # _round_half_up, NOT Python round(): the oracle's c0/u{i} round with
    # DuckDB's HALF_UP-on-shortest-repr; banker's rounding on the binary
    # value forks the Lloyd trajectory at any mean whose shortest repr
    # ends in 5 (the trap _round_half_up's own docstring forbids)
    cents = [
        [_round_half_up(float(x), 6) for x in row["v"]]
        for row in ed.where(F.col("vec_id") < KMEANS_K)
        .orderBy("vec_id")
        .collect()
    ]
    for _ in range(KMEANS_ITERS):
        dists = F.array(*[_sq_dist(F.col("v"), c) for c in cents])
        assigned = ed.select(
            "vec_id",
            "v",
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias("cluster"),
        )
        upd = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("c"))
            .collect()
        )
        new = {}
        for row in upd:
            new.setdefault(row["cluster"], [0.0] * len(cents[0]))[
                row["pos"]
            ] = _round_half_up(row["c"], 6)
        cents = [new.get(i, cents[i]) for i in range(KMEANS_K)]
    dists = F.array(*[_sq_dist(F.col("v"), c) for c in cents])
    return ed.select(
        "vec_id",
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("cluster"),
        F.round(F.array_min(dists), 6).alias("dist2"),
    )


INTRA_SAMPLE = 16  # per-label sample size bounding the pairwise cost


@query(
    "q_sim_intra_label",
    oracle=_ORACLE_E
    + f"""
    , sampled AS (
      SELECT label, vec_id, v, nrm FROM (
        SELECT *, row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
        FROM e)
      WHERE rn <= {INTRA_SAMPLE}),
    pairs AS (
      SELECT a.label,
             list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
               / (a.nrm * b.nrm) AS cos
      FROM sampled a JOIN sampled b
        ON a.label = b.label AND a.vec_id < b.vec_id)
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(cos), 4) AS avg_cos,
           round(min(cos), 4) AS min_cos,
           round(max(cos), 4) AS max_cos
    FROM pairs GROUP BY label
    """,
)
def q_sim_intra_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding cohesion audit: average / extreme pairwise
    cosine within each label, over a bounded deterministic sample of
    {INTRA_SAMPLE} vectors per label (smallest vec_ids) — the cluster-
    quality check run after labeling or clustering a corpus.

    Sampling is what makes this scale-safe: per-label pairwise cost is
    capped at C({INTRA_SAMPLE},2) pairs regardless of cluster size, so a
    billion-vector label costs the same as a thousand-vector one (the
    unsampled variant is quadratic in the hottest label — the same skew
    bomb the dedup family's df-cap kills). One shuffle samples per label
    (window rank), one equi-join on label pairs the samples; both ride
    the same label partitioning.
    """
    e = load_table(spark, sf_dir, "embeddings")
    ed = e.select(
        "label",
        "vec_id",
        _vec_double().alias("v"),
    ).withColumn("nrm", _norm(F.col("v")))
    w = Window.partitionBy("label").orderBy("vec_id")
    s = (
        ed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= INTRA_SAMPLE)
        .drop("rn")
    )
    a = s.select("label", F.col("vec_id").alias("id_a"),
                 F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = s.select("label", F.col("vec_id").alias("id_b"),
                 F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, "label")
        .where(F.col("id_a") < F.col("id_b"))
        .select("label", cos.alias("cos"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("cos"), 4).alias("avg_cos"),
            F.round(F.min("cos"), 4).alias("min_cos"),
            F.round(F.max("cos"), 4).alias("max_cos"),
        )
    )


SEM_TOP_K = 5


@query(
    "q_e2e_semsearch",
    oracle=_ORACLE_E
    + f"""
    , hits AS (
      SELECT q_id, vec_id, cos_sim FROM (
        SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
               round(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
                     / (a.nrm * b.nrm), 4) AS cos_sim,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
                          / (a.nrm * b.nrm) DESC, b.vec_id) AS rn
        FROM e a JOIN e b ON a.vec_id < {N_QUERY} AND b.vec_id <> a.vec_id)
      WHERE rn <= {SEM_TOP_K})
    SELECT h.q_id, h.vec_id, h.cos_sim, d.lang, d.source, d.n_chars
    FROM hits h JOIN documents d ON d.doc_id = h.vec_id
    """,
)
def q_e2e_semsearch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end semantic search: exact cosine top-{SEM_TOP_K} per query
    vector, then hydrate each hit with its document metadata (vec_id and
    doc_id share the id space in this corpus) — retrieval plus metadata
    enrichment as one declarative plan, the serving-side shape of the
    similarity family.

    Plan shape: the {N_QUERY}-row query side broadcasts into the scoring
    pass (corpus never shuffles — same as q_sim_cosine_topk); the
    surviving top-k hit set ({N_QUERY}x{SEM_TOP_K} rows) is tiny, so the
    metadata hydration join broadcasts the HITS against the documents
    scan, never the reverse. At 100 TB the hydration is a broadcast of
    O(queries x k) rows whatever the corpus size.
    """
    e = load_table(spark, sf_dir, "embeddings")
    ed = e.select("vec_id", _vec_double().alias("v")).withColumn(
        "nrm", _norm(F.col("v"))
    )
    hits = broadcast_cosine_topk(ed, SEM_TOP_K).select(
        "q_id", "vec_id", F.round("cos_raw", 4).alias("cos_sim")
    )
    d = load_table(spark, sf_dir, "documents")
    return F.broadcast(hits).join(
        d, hits.vec_id == d.doc_id
    ).select("q_id", "vec_id", "cos_sim", "lang", "source", "n_chars")


OUTLIER_BOTTOM_K = 3


@query(
    "q_embed_outliers",
    oracle=_ORACLE_E
    + f"""
    , cx AS (
      SELECT label, pos, round(avg(x), 6) AS cx
      FROM (SELECT label, unnest(v) AS x, unnest(range(1, len(v) + 1)) AS pos
            FROM e)
      GROUP BY label, pos),
    cent AS (SELECT label, list(cx ORDER BY pos) AS cv FROM cx GROUP BY label),
    centn AS (
      SELECT label, cv, sqrt(list_sum(list_transform(cv, x -> x * x))) AS cnrm
      FROM cent),
    scored AS (
      SELECT e.label, e.vec_id,
             round(list_sum(list_transform(list_zip(e.v, c.cv),
                                           p -> p[1] * p[2]))
                   / (e.nrm * c.cnrm), 4) AS cos_c
      FROM e JOIN centn c ON c.label = e.label),
    stats AS (
      SELECT label, avg(cos_c) AS mu, stddev_samp(cos_c) AS sigma
      FROM scored GROUP BY label)
    SELECT label, vec_id, cos_c, z FROM (
      SELECT s.label, s.vec_id, s.cos_c,
             round((s.cos_c - t.mu) / t.sigma, 4) AS z,
             row_number() OVER (PARTITION BY s.label
                                ORDER BY s.cos_c, s.vec_id) AS rn
      FROM scored s JOIN stats t ON t.label = s.label)
    WHERE rn <= {OUTLIER_BOTTOM_K}
    """,
)
def q_embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier audit: the {OUTLIER_BOTTOM_K} vectors
    farthest from their own label's centroid (lowest cosine), with a
    per-label z-score — the mislabeled-example / contamination screen run
    after clustering or labeling a corpus.

    Cross-engine determinism: centroids are rounded 6dp (q_embed_centroid
    precedent) so the cosine fold is over identical inputs; ranking
    orders by the 4dp-rounded cosine (z is an affine transform of it, so
    rank-by-z ≡ rank-by-cos — the unrounded mu/sigma can't reorder rows);
    z itself is rounded 4dp.

    Scale shape: centroid agg shuffles |labels| x |dims| partials
    (constant-size); the tiny centroid and stats tables broadcast back
    onto the corpus — the corpus itself shuffles once for the scoring
    pass's label partition and rides it through ranking."""
    e = load_table(spark, sf_dir, "embeddings")
    ed = e.select("label", "vec_id", _vec_double().alias("v")).withColumn(
        "nrm", _norm(F.col("v"))
    )
    cent = (
        ed.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("x"), 6).alias("cx"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                lambda s: s.cx,
            ).alias("cv")
        )
        .withColumn("cnrm", _norm(F.col("cv")))
    )
    scored = persist_tracked(ed.join(F.broadcast(cent), "label").select(
        "label",
        "vec_id",
        F.round(
            _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm")), 4
        ).alias("cos_c"),
    ))
    stats = scored.groupBy("label").agg(
        F.avg("cos_c").alias("mu"), F.stddev_samp("cos_c").alias("sigma")
    )
    w = Window.partitionBy("label").orderBy("cos_c", "vec_id")
    return (
        scored.join(F.broadcast(stats), "label")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= OUTLIER_BOTTOM_K)
        .select(
            "label",
            "vec_id",
            "cos_c",
            F.round((F.col("cos_c") - F.col("mu")) / F.col("sigma"), 4).alias("z"),
        )
    )


MMR_LAMBDA = 0.7
MMR_CAND_K = 20
MMR_OUT_K = 5


def _round_half_up(x: float, dp: int) -> float:
    """HALF_UP rounding of a float64 with the same semantics as Spark's
    F.round AND DuckDB's round() on DOUBLE: both round the SHORTEST
    decimal representation of the double (Spark goes through
    BigDecimal.valueOf = Double.toString), NOT its exact binary
    expansion — e.g. 0.1234565 (stored as 0.123456499999...) rounds UP
    to 0.123457 on both engines because its shortest repr ends in 5.
    Python repr() is the same shortest round-trip decimal, so
    Decimal(repr(x)) reproduces it exactly (property-tested against both
    engines in tests/test_properties.py). Python's built-in round() and
    numpy.round are banker's — using either in a cross-engine-hashed
    path is the -0.0-class trap of rounding."""
    import decimal

    q = decimal.Decimal(1).scaleb(-dp)
    return float(
        decimal.Decimal(repr(x)).quantize(q, rounding=decimal.ROUND_HALF_UP)
    ) + 0.0


def mmr_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{MMR_CAND_K} exact-cosine candidates per query vector, carrying
    both vectors — the input stage q_sim_mmr_rerank reranks (shared with
    the pytest mirror so the iterative stage is tested on the exact same
    candidate set the engine sees)."""
    e = load_table(spark, sf_dir, "embeddings")
    ed = e.select("vec_id", _vec_double().alias("v")).withColumn(
        "nrm", _norm(F.col("v"))
    )
    return broadcast_cosine_topk(ed, MMR_CAND_K, carry=("v", "qv")).select(
        "q_id", "vec_id", "v", "qv"
    )


def _mmr_rerank_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Greedy maximal-marginal-relevance over one query's candidate set.
    Pure numpy float64 (similarities recomputed HERE so the pytest mirror
    is bit-identical); candidates scanned in vec_id order with strict >
    so ties resolve to the lowest vec_id, deterministically.

    The selection compares scores rounded HALF_UP to 6dp — the cross-
    engine determinism contract with the DuckDB oracle: numpy's BLAS
    dot products (pairwise summation) and the oracle's sequential
    list_sum folds differ in the last ulp, and the 6dp round collapses
    that before the argmax so both engines walk the same trajectory."""
    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    V = np.stack(pdf["v"].to_numpy())
    qv = np.asarray(pdf["qv"].iloc[0])
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    qn = qv / np.linalg.norm(qv)
    simq = Vn @ qn
    S = Vn @ Vn.T
    selected: list[int] = []
    out = []
    for rank in range(1, min(MMR_OUT_K, len(pdf)) + 1):
        best_i, best_score = -1, -np.inf
        for i in range(len(pdf)):
            if i in selected:
                continue
            pen = max((S[i][j] for j in selected), default=0.0)
            score = _round_half_up(
                MMR_LAMBDA * simq[i] - (1 - MMR_LAMBDA) * pen, 6
            )
            if score > best_score:
                best_i, best_score = i, score
        selected.append(best_i)
        out.append(
            (
                int(pdf["q_id"].iloc[0]),
                int(pdf["vec_id"].iloc[best_i]),
                rank,
                _round_half_up(float(best_score), 4),
            )
        )
    return pd.DataFrame(out, columns=["q_id", "vec_id", "mmr_rank", "mmr_score"])


def _mmr_oracle() -> str:
    """Chained-CTE greedy MMR replay (the q_sample_coreset treatment,
    upgraded from rows-only in r4): candidates are the top-{MMR_CAND_K}
    per query by UNROUNDED cosine (bit-equal cross-engine: both sides
    are sequential folds), then {MMR_OUT_K} unrolled steps each pick the
    per-query argmax of round(λ·simq − (1−λ)·max_pen, 6) with vec_id
    tie-break — the same 6dp-rounded comparison the Spark UDF makes, so
    BLAS-vs-sequential last-ulp drift cannot fork the trajectory."""
    lam = repr(MMR_LAMBDA)
    oml = repr(1.0 - MMR_LAMBDA)  # float64 literal, NOT '0.3'
    step_tpl = """,
    s{i} AS (
      SELECT q_id, vec_id, nv, score FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY score DESC, vec_id) AS rn
        FROM (
          SELECT c.q_id, c.vec_id, c.nv,
                 round({lam} * c.cos_raw - {oml} *
                       coalesce(list_max(list_transform(p.nvs,
                           s -> list_sum(list_transform(list_zip(c.nv, s),
                                                        z -> z[1] * z[2])))),
                                0.0), 6) AS score
          FROM cand c JOIN sel{p} p USING (q_id)
          WHERE NOT list_contains(p.ids, c.vec_id)))
      WHERE rn = 1),
    sel{i} AS (
      SELECT q_id, list_append(p.ids, n.vec_id) AS ids,
             list_append(p.nvs, n.nv) AS nvs,
             list_append(p.scores, n.score) AS scores
      FROM sel{p} p JOIN s{i} n USING (q_id))"""
    steps = "".join(
        step_tpl.format(i=i, p=i - 1, lam=lam, oml=oml)
        for i in range(1, MMR_OUT_K + 1)
    )
    return (
        _ORACLE_E
        + f""",
    q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm
          FROM e WHERE vec_id < {N_QUERY}),
    scored AS (
      SELECT q.q_id, e.vec_id,
             list_transform(e.v, x -> x / e.nrm) AS nv,
             list_sum(list_transform(list_zip(e.v, q.qv), z -> z[1] * z[2]))
               / (e.nrm * q.qnrm) AS cos_raw
      FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
    cand AS (
      SELECT q_id, vec_id, nv, cos_raw FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY cos_raw DESC, vec_id) AS rn
        FROM scored) WHERE rn <= {MMR_CAND_K}),
    sel0 AS (SELECT q_id, []::BIGINT[] AS ids, []::DOUBLE[][] AS nvs,
                    []::DOUBLE[] AS scores
             FROM q){steps}
    SELECT q_id, ids[u.i] AS vec_id, CAST(u.i AS INT) AS mmr_rank,
           round(scores[u.i], 4) AS mmr_score
    FROM sel{MMR_OUT_K}, UNNEST(range(1, len(ids) + 1)) AS u(i)
    """
    )


@query("q_sim_mmr_rerank", oracle=_mmr_oracle())
def q_sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance reranking: from each query's
    top-{MMR_CAND_K} cosine candidates, greedily pick {MMR_OUT_K}
    maximizing λ·sim(q,d) − (1−λ)·max_sim(d, already-picked) — the
    diversity-aware serving stage (dedup-at-retrieval: near-identical
    hits crowd out coverage when raw top-k is returned).

    Spark shape: candidate generation is the broadcast-query scoring
    pass (corpus never shuffles); the greedy stage is inherently
    sequential PER QUERY, so it runs as grouped applyInPandas over
    candidate sets BOUNDED at {MMR_CAND_K} rows — O(k²) work per query
    regardless of corpus size, Arrow-batched, one shuffle on q_id.

    SQL-oracled as of r4 (was rows-only): the full greedy trajectory is
    hash-verified against a chained-CTE DuckDB replay (_mmr_oracle);
    selection compares 6dp-HALF_UP-rounded scores on both engines so the
    check is exact, not tolerance-based."""
    return (
        mmr_candidates(spark, sf_dir)
        .groupBy("q_id")
        .applyInPandas(
            _mmr_rerank_pdf,
            schema="q_id long, vec_id long, mmr_rank int, mmr_score double",
        )
    )


PCA_K = 2


def _pca_partials(batches):
    """Per-partition PCA sufficient statistics over the embedding column:
    (n, Σx, Σxxᵀ flattened) — one bounded row per partition, the
    mergeable-moments pattern (sums are associative, so partials combine
    by addition in any order)."""
    import numpy as np
    import pandas as pd

    n, s, ss = 0, None, None
    for pdf in batches:
        X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        n += X.shape[0]
        s = X.sum(axis=0) if s is None else s + X.sum(axis=0)
        g = X.T @ X
        ss = g if ss is None else ss + g
    if n:
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
        )


@query("q_embed_pca")  # rows-only: eigendecomposition; numpy-mirror-gated
def q_embed_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA of the embedding corpus: project every vector onto
    the top-PCA_K principal components — the dimensionality-reduction /
    visualization / whitening primitive of an embedding pipeline.

    Plan: (1) one mapInPandas pass emits per-partition sufficient
    statistics (n, Σx, Σxxᵀ) — a single NumPy matmul per Arrow batch,
    constant 64+64² doubles per partition regardless of row count;
    (2) the ≤|partitions| partial rows are collected and summed on the
    driver (the k-means centroid-collect precedent: a d²-sized scalar,
    not data), the 64×64 covariance C = Σxxᵀ/n − μμᵀ is
    eigendecomposed in NumPy, and each eigenvector's sign is fixed
    deterministically (largest-|component| made positive — eigenvectors
    are sign-ambiguous and the mirror test must agree); (3) components
    ship back as LITERAL arrays inside a codegen'd zip_with/aggregate
    dot product — the projection pass is JVM-only, zero shuffle, no
    Python in the per-row path.

    Rows-only by design (no SQL oracle: DuckDB has no eigensolver);
    tests/test_similarity.py gates the projections against a
    full-corpus NumPy PCA to 1e-6."""
    emb = load_table(spark, sf_dir, "embeddings")
    parts = emb.select("embedding").mapInPandas(
        _pca_partials, "n long, s array<double>, ss array<double>"
    ).collect()
    n = sum(r["n"] for r in parts)
    s = np.sum([np.array(r["s"]) for r in parts], axis=0)
    ss = np.sum([np.array(r["ss"]).reshape(EMB_DIM, EMB_DIM) for r in parts], axis=0)
    mu = s / n
    cov = ss / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:PCA_K]
    total_var = float(vals.sum())
    comps, evr = [], []
    for idx in order:
        v = vecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append(v)
        evr.append(float(vals[idx]) / total_var)
    centered = F.zip_with(
        _vec_double("embedding"),
        F.array(*[F.lit(float(m)) for m in mu]),
        lambda x, m: x - m,
    )
    out = emb.select("vec_id", "label", centered.alias("c"))
    for i, (v, r) in enumerate(zip(comps, evr), start=1):
        lit_v = F.array(*[F.lit(float(x)) for x in v])
        out = out.withColumn(f"pc{i}", F.round(_dot(F.col("c"), lit_v), 6))
        out = out.withColumn(f"evr{i}", F.round(F.lit(r), 6))
    return out.drop("c")


PQ_M = 8            # subspaces (64 dims → 8 blocks of 8)
PQ_K = 16           # centroids per subspace → 4-bit codes, 4 bytes/vector
PQ_ITERS = 4        # Lloyd iterations per subspace codebook
PQ_TRAIN_CAP = 2048  # deterministic training-sample bound (by vec_id)
PQ_SHORTLIST = 100  # ADC shortlist size re-ranked exactly


PQ_SCALE = 1_000_000.0  # unit-vector components quantized to integer
# millionths: every distance in the pipeline is then an EXACT integer
# (d2 <= 8·(2e6)² ~ 3.2e13, adist <= 2.6e14, both << 2^53), so argmins,
# sums, and rankings are order-independent and bit-identical across
# engines — no rounding boundary exists anywhere between quantization
# and the final exact re-rank.


def _round_half_away(a: "np.ndarray") -> "np.ndarray":
    """round-half-away-from-zero, matching Spark's ROUND/HALF_UP and
    DuckDB's round() on the exact .5 averages integer centroids produce
    (np.round is banker's and WOULD diverge there)."""
    return np.sign(a) * np.floor(np.abs(a) + 0.5)


def _pq_train_codebooks(Xq: "np.ndarray") -> "np.ndarray":
    """Train PQ codebooks on the bounded integer-quantized unit-vector
    sample: per subspace, PQ_K-means with deterministic init (first PQ_K
    sample rows in vec_id order) and PQ_ITERS Lloyd steps. All distances
    are exact integers (argmin ties -> lowest centroid id, the
    first-match both np.argmin and ORDER BY d, j produce) and centroid
    updates round half-away back onto the integer grid, so the whole
    trajectory is engine-portable by construction. Returns (M, K, dim/M)."""
    sub_d = Xq.shape[1] // PQ_M
    books = []
    for m in range(PQ_M):
        S = Xq[:, m * sub_d:(m + 1) * sub_d]
        C = S[:PQ_K].copy()
        for _ in range(PQ_ITERS):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for j in range(PQ_K):
                mask = assign == j
                if mask.any():
                    C[j] = _round_half_away(S[mask].mean(0))
        books.append(C)
    return np.stack(books)


def _pq_oracle() -> str:
    """DuckDB replay of the ENTIRE PQ pipeline (train -> encode -> ADC ->
    shortlist -> exact re-rank) — the same chained-CTE conversion class as
    q_embed_kmeans/BPE/MMR, with the subspace id as one more grouping key
    so all PQ_M codebooks train in a single CTE chain: wn = unit vectors
    quantized to integer millionths (the shared EXACT domain — see
    PQ_SCALE), c0 = first PQ_K training subvectors per subspace, then per
    Lloyd iteration an assignment CTE (argmin by exact-integer squared
    L2, lowest-centroid tie-break) and an update CTE (per-(m, j, pos)
    avg rounded half-away back onto the grid, empty cells keeping the
    previous centroid); encode/ADC reuse the same exact-argmin shape,
    adc_dist is the exact lookup-table sum rescaled to the unit sphere,
    and the final stage is q_sim_cosine_topk's proven raw-cosine re-rank
    over the shortlist."""
    sub_d = EMB_DIM // PQ_M
    d2 = (
        "list_sum(list_transform(list_zip({a}, {b}),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    parts = [
        f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                                   x -> x * x))) AS nrm
               FROM embeddings),
    en AS (SELECT vec_id, v, nrm,
                  list_transform(v, x -> round(x / nrm * {PQ_SCALE!r}, 0))
                      AS wn FROM e),
    sub AS (SELECT vec_id, ms.m AS m,
                   list_slice(wn, ms.m * {sub_d} + 1,
                              ms.m * {sub_d} + {sub_d}) AS sv
            FROM en, (SELECT unnest(range(0, {PQ_M})) AS m) ms),
    tr AS (SELECT * FROM sub WHERE vec_id < {PQ_TRAIN_CAP}),
    c0 AS (SELECT m, j, cv FROM (
             SELECT m, sv AS cv,
                    row_number() OVER (PARTITION BY m ORDER BY vec_id) - 1
                        AS j
             FROM tr) WHERE j < {PQ_K})"""
    ]
    for i in range(1, PQ_ITERS + 1):
        parts.append(
            """,
    a{i} AS (SELECT vec_id, m, sv, j FROM (
        SELECT t.vec_id, t.m, t.sv, c.j,
               row_number() OVER (PARTITION BY t.m, t.vec_id
                                  ORDER BY {d}, c.j) AS rn
        FROM tr t JOIN c{prev} c ON c.m = t.m) WHERE rn = 1),
    u{i} AS (SELECT m, j, list(cx ORDER BY pos) AS cv FROM (
        SELECT m, j, pos, round(avg(x), 0) AS cx FROM (
            SELECT m, j, unnest(sv) AS x,
                   unnest(range(1, len(sv) + 1)) AS pos FROM a{i})
        GROUP BY m, j, pos) GROUP BY m, j),
    c{i} AS (SELECT p.m, p.j, coalesce(u.cv, p.cv) AS cv
             FROM c{prev} p LEFT JOIN u{i} u ON u.m = p.m AND u.j = p.j)""".format(
                i=i, prev=i - 1, d=d2.format(a="t.sv", b="c.cv")
            )
        )
    last = f"c{PQ_ITERS}"
    parts.append(
        f""",
    codes AS (SELECT vec_id, m, j FROM (
        SELECT s.vec_id, s.m, c.j,
               row_number() OVER (PARTITION BY s.m, s.vec_id
                                  ORDER BY {d2.format(a="s.sv", b="c.cv")},
                                           c.j) AS rn
        FROM sub s JOIN {last} c ON c.m = s.m) WHERE rn = 1),
    qtab AS (SELECT s.vec_id AS q_id, s.m, c.j,
                    {d2.format(a="s.sv", b="c.cv")} AS d
             FROM sub s JOIN {last} c ON c.m = s.m
             WHERE s.vec_id < {N_QUERY}),
    adist AS (SELECT q.q_id, k.vec_id,
                     sum(q.d) / ({PQ_SCALE!r} * {PQ_SCALE!r}) AS adc_dist
              FROM codes k JOIN qtab q ON q.m = k.m AND q.j = k.j
              WHERE k.vec_id <> q.q_id
              GROUP BY q.q_id, k.vec_id),
    short AS (SELECT q_id, vec_id, adc_dist FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY adc_dist, vec_id) AS rn
        FROM adist) WHERE rn <= {PQ_SHORTLIST})
    SELECT q_id, vec_id, cos_sim, adc_dist FROM (
        SELECT s.q_id, s.vec_id,
               round(list_sum(list_transform(list_zip(eq.v, ev.v),
                                             p -> p[1] * p[2]))
                     / (eq.nrm * ev.nrm), 4) AS cos_sim,
               s.adc_dist,
               row_number() OVER (
                 PARTITION BY s.q_id
                 ORDER BY list_sum(list_transform(list_zip(eq.v, ev.v),
                                                  p -> p[1] * p[2]))
                          / (eq.nrm * ev.nrm) DESC, s.vec_id) AS rn
        FROM short s JOIN e ev ON ev.vec_id = s.vec_id
                     JOIN e eq ON eq.vec_id = s.q_id)
    WHERE rn <= {TOP_K}"""
    )
    return "".join(parts)


@query("q_sim_pq_topk", oracle=_pq_oracle())
# Converted from rows-only in r6: quantizing unit vectors to integer
# millionths (PQ_SCALE) makes every distance in the pipeline an exact
# integer — argmins, lookup-table sums, and rankings are then
# order-independent and bit-identical across engines, so the driver
# hash-checks train + encode + ADC + shortlist + re-rank end-to-end;
# the pytest recall gate still scores it against exact cosine. The
# ~1e-6 quantization perturbation is far below the quantization error
# PQ itself introduces.
def q_sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN — the MEMORY-bound scale path LSH/IVF
    don't cover: every corpus vector is compressed to PQ_M 4-bit codes
    (64 float32 dims → 4 bytes, 64× smaller), approximate distances are
    computed from per-query lookup tables (ADC — no decompression), and
    only an ADC shortlist of PQ_SHORTLIST candidates per query is
    re-ranked with exact cosine, the standard FAISS-style
    shortlist-then-rerank pipeline.

    Vectors are L2-normalized first, so ADC's L2 ordering matches cosine
    ordering (‖a−b‖² = 2−2cos on the unit sphere) and the exact re-rank
    stage is directly comparable with q_sim_cosine_topk's ranking —
    which is how the recall gate in tests/test_similarity.py scores it.

    Scale shape: codebooks train driver-side on a deterministic bounded
    sample (vec_id < PQ_TRAIN_CAP — PQ codebooks are always trained on a
    sample; M·K·(d/M) = 1k floats) and ship inside the encode closure;
    encode + ADC scoring is ONE mapInPandas pass over the corpus (two
    NumPy matmuls per Arrow batch), emitting |queries| bounded rows per
    vector; the shortlist window + exact re-rank join touch
    PQ_SHORTLIST·|queries| rows. The corpus never shuffles at full
    width — only (vec_id, q_id, adist) triples move."""
    emb = load_table(spark, sf_dir, "embeddings")
    # wn: unit vectors quantized to integer millionths IN SPARK — the
    # exact shared domain (see PQ_SCALE) is computed once, engine-side,
    # and the oracle recomputes it with the same one-step round, so
    # codebooks and codes derive from identical integers.
    ed = persist_tracked(
        emb.select("vec_id", _vec_double().alias("v"))
        .withColumn("nrm", _norm(F.col("v")))
        .withColumn(
            "wn",
            F.transform(
                "v", lambda x: F.round(x / F.col("nrm") * PQ_SCALE, 0)
            ),
        )
    )
    # r14 (guide §2.4/§5): ONE bounded driver collect replaces the former
    # two (train rows, then query rows — N_QUERY < PQ_TRAIN_CAP, so the
    # query sample is a prefix of the train sample); the global orderBy
    # exchanges are dropped too — the ≤ PQ_TRAIN_CAP collected rows sort
    # driver-side, which is where bounded-sample work belongs.
    srows = (
        ed.where(F.col("vec_id") < PQ_TRAIN_CAP)
        .select("vec_id", "wn")
        .toPandas()
        .sort_values("vec_id", kind="mergesort")
    )
    train = np.stack(srows["wn"].to_numpy())
    books = _pq_train_codebooks(train)            # (M, K, sub_d)
    qrows = srows[srows["vec_id"] < N_QUERY]
    Q = np.stack(qrows["wn"].to_numpy())
    q_ids = qrows["vec_id"].to_numpy()
    sub_d = books.shape[2]
    # per-query ADC tables: dtab[q, m, k] = ||Q[q, m·d:(m+1)·d] − books[m, k]||²
    dtab = np.stack([
        ((Q[:, m * sub_d:(m + 1) * sub_d][:, None, :]
          - books[m][None, :, :]) ** 2).sum(-1)
        for m in range(PQ_M)
    ], axis=1)                                     # (n_q, M, K)

    def _adc(batches):
        # r14 (guide §2.3 "aggregate before you shuffle"): the pass used
        # to emit |corpus|×|queries| (vec_id, q_id, adist) rows into the
        # shortlist window's exchange. A running per-TASK top-
        # PQ_SHORTLIST per query — kept under the exact global order
        # (adist asc, vec_id asc), so the global top-S over the union of
        # per-task top-S is unchanged — bounds the emitted rows at
        # tasks × |queries| × PQ_SHORTLIST. The self-match (vec_id ==
        # q_id) is excluded here, where the candidate set is pruned.
        tops = {int(q): (np.empty(0), np.empty(0, dtype="int64"))
                for q in q_ids}
        for pdf in batches:
            X = np.stack(pdf["wn"].to_numpy())
            codes = np.stack([
                ((X[:, m * sub_d:(m + 1) * sub_d][:, None, :]
                  - books[m][None, :, :]) ** 2).sum(-1).argmin(1)
                for m in range(PQ_M)
            ], axis=1)                             # (rows, M)
            A = np.stack([
                dtab[:, np.arange(PQ_M), c].sum(axis=1) for c in codes
            ])                                     # (rows, n_q)
            vids = pdf["vec_id"].to_numpy()
            for j, q in enumerate(q_ids):
                mask = vids != q
                a = np.concatenate([tops[int(q)][0], A[mask, j]])
                v = np.concatenate([tops[int(q)][1], vids[mask]])
                if len(a) > PQ_SHORTLIST:
                    idx = np.lexsort((v, a))[:PQ_SHORTLIST]
                    a, v = a[idx], v[idx]
                tops[int(q)] = (a, v)
        if any(len(a) for a, _ in tops.values()):
            yield pd.DataFrame({
                "vec_id": np.concatenate([tops[int(q)][1] for q in q_ids]),
                "q_id": np.repeat(
                    q_ids, [len(tops[int(q)][1]) for q in q_ids]
                ),
                "adist": np.concatenate([tops[int(q)][0] for q in q_ids]),
            })

    scored = ed.select("vec_id", "wn").mapInPandas(
        _adc, "vec_id long, q_id long, adist double"
    )
    w_short = Window.partitionBy("q_id").orderBy(
        F.col("adist").asc(), F.col("vec_id")
    )
    shortlist = (
        scored.withColumn("rn", F.row_number().over(w_short))
        .where(F.col("rn") <= PQ_SHORTLIST)
        .select("q_id", "vec_id", "adist")
    )
    qn = (
        ed.where(F.col("vec_id") < N_QUERY)
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
                F.col("nrm").alias("qnrm"))
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))
    w_final = Window.partitionBy("q_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id")
    )
    return (
        # broadcast the ≤ PQ_SHORTLIST×|queries|-row shortlist so the
        # cached corpus side never shuffles for the re-rank join (§3.1)
        ed.select("vec_id", "v", "nrm").join(F.broadcast(shortlist), "vec_id")
        .join(F.broadcast(qn), "q_id")
        .select("q_id", "vec_id", cos.alias("cos_raw"),
                (F.col("adist") / F.lit(PQ_SCALE * PQ_SCALE)).alias(
                    "adc_dist"
                ))
        .withColumn("rn", F.row_number().over(w_final))
        .where(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id", F.round("cos_raw", 4).alias("cos_sim"),
                "adc_dist")
    )


NEG_PER_QUERY = 20  # deterministic negatives sampled per query


@query(
    "q_sample_negative",
    oracle=_ORACLE_E
    + f"""
    , pos AS (
      SELECT q_id, vec_id, rn FROM (
        SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY list_sum(list_transform(list_zip(a.v, b.v),
                                                  p -> p[1] * p[2]))
                          / (a.nrm * b.nrm) DESC, b.vec_id) AS rn
        FROM e a JOIN e b ON a.vec_id < {N_QUERY} AND b.vec_id <> a.vec_id
      ) WHERE rn <= {TOP_K}),
    cand AS (
      SELECT q.vec_id AS q_id, c.vec_id
      FROM e q JOIN e c ON q.vec_id < {N_QUERY} AND c.vec_id <> q.vec_id),
    neg AS (
      SELECT q_id, vec_id,
             row_number() OVER (
               PARTITION BY q_id
               ORDER BY md5(CAST(q_id AS VARCHAR) || ':'
                            || CAST(vec_id AS VARCHAR)), vec_id) AS rn
      FROM (SELECT c.q_id, c.vec_id
            FROM cand c LEFT JOIN pos p
              ON p.q_id = c.q_id AND p.vec_id = c.vec_id
            WHERE p.q_id IS NULL))
    SELECT q_id, vec_id, 'positive' AS role, CAST(rn AS BIGINT) AS rank
    FROM pos
    UNION ALL
    SELECT q_id, vec_id, 'negative' AS role, CAST(rn AS BIGINT) AS rank
    FROM neg WHERE rn <= {NEG_PER_QUERY}
    """,
)
def q_sample_negative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair construction: for each query vector, the
    exact cosine top-{TOP_K} become POSITIVES and {NEG_PER_QUERY}
    deterministic hash-ordered NEGATIVES are drawn from the rest of the
    corpus (excluding the positives and the query itself) — the
    (anchor, positive, negatives) batches every embedding-model
    contrastive loss (InfoNCE/triplet) trains on. Negative selection is
    md5-ordered, so the sample is reproducible across runs and engines —
    resumable training data, not random.sample.

    Scale shape: positives ride the q_sim_cosine_topk plan (corpus
    streams past the broadcast query side); negative candidates move
    only (q_id, vec_id) ID PAIRS — never vectors — through the anti-join
    and the per-query hash-order window. At real scale you'd pre-filter
    candidates to an LSH/IVF bucket sample instead of ranking the whole
    corpus's ids; the hash-order trick is unchanged. (In-batch negatives
    are the zero-cost alternative; this op builds the curated hard-ish
    set.)"""
    e = load_table(spark, sf_dir, "embeddings")
    ed = persist_tracked(
        e.select("vec_id", _vec_double().alias("v")).withColumn(
            "nrm", _norm(F.col("v"))
        )
    )
    q = ed.where(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
    pos = persist_tracked(
        ed.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias("cos_raw"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id", "rn")
    )
    cand = ed.select("vec_id").crossJoin(
        F.broadcast(q.select("q_id"))
    ).where(F.col("vec_id") != F.col("q_id"))
    w_neg = Window.partitionBy("q_id").orderBy(
        F.md5(
            F.concat_ws(
                ":", F.col("q_id").cast("string"), F.col("vec_id").cast("string")
            )
        ),
        "vec_id",
    )
    neg = (
        cand.join(pos, ["q_id", "vec_id"], "left_anti")
        .withColumn("rn", F.row_number().over(w_neg))
        .where(F.col("rn") <= NEG_PER_QUERY)
    )
    return pos.select(
        "q_id", "vec_id", F.lit("positive").alias("role"),
        F.col("rn").cast("long").alias("rank"),
    ).unionByName(
        neg.select(
            "q_id", "vec_id", F.lit("negative").alias("role"),
            F.col("rn").cast("long").alias("rank"),
        )
    )


MAT_DIMS = 16  # truncated prefix dimensionality audited vs the full 64


@query(
    "q_embed_matryoshka",
    oracle=_ORACLE_E
    + f"""
    , et AS (
      SELECT vec_id, v[1:{MAT_DIMS}] AS tv,
             sqrt(list_sum(list_transform(v[1:{MAT_DIMS}], x -> x * x)))
                 AS tnrm
      FROM e),
    full_rank AS (
      SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_sum(list_transform(list_zip(a.v, b.v),
                                                p -> p[1] * p[2]))
                        / (a.nrm * b.nrm) DESC, b.vec_id) AS rn
      FROM e a JOIN e b ON a.vec_id < {N_QUERY} AND b.vec_id <> a.vec_id),
    trunc_rank AS (
      SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_sum(list_transform(list_zip(a.tv, b.tv),
                                                p -> p[1] * p[2]))
                        / (a.tnrm * b.tnrm) DESC, b.vec_id) AS rn
      FROM et a JOIN et b ON a.vec_id < {N_QUERY} AND b.vec_id <> a.vec_id)
    SELECT f.q_id,
           CAST(count(*) AS BIGINT) AS overlap_at_k,
           round(CAST(count(*) AS DOUBLE) / {TOP_K}, 4) AS overlap_ratio
    FROM (SELECT q_id, vec_id FROM full_rank WHERE rn <= {TOP_K}) f
    JOIN (SELECT q_id, vec_id FROM trunc_rank WHERE rn <= {TOP_K}) t
      ON t.q_id = f.q_id AND t.vec_id = f.vec_id
    GROUP BY f.q_id
    """,
)
def q_embed_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation retrieval audit: how much of the exact
    64-dim cosine top-k survives when ranking with only the FIRST
    MAT_DIMS dimensions — the measurement behind the
    truncate-your-embeddings storage play (MRL-style models pack
    information into leading dims; 16/64 dims = 4× memory/compute
    saving IF overlap stays high, and this op tells you whether it
    does, per query, exactly — both rankings and their intersection are
    deterministic and oracle-verified, no approximation).

    Scale shape: two brute-force ranking passes that share the
    broadcast-queries/corpus-streams plan of q_sim_cosine_topk (the
    truncated pass reads 4× less vector data — exactly the saving being
    audited); the overlap join touches only the two k-row-per-query
    top-k sets."""
    e = load_table(spark, sf_dir, "embeddings")
    ed = persist_tracked(
        e.select("vec_id", _vec_double().alias("v"))
        .withColumn("nrm", _norm(F.col("v")))
        .withColumn("tv", F.slice("v", 1, MAT_DIMS))
        .withColumn("tnrm", _norm(F.col("tv")))
    )

    def topk(vcol: str, ncol: str) -> DataFrame:
        return broadcast_cosine_topk(ed, TOP_K, vcol, ncol).select(
            "q_id", "vec_id"
        )

    full = topk("v", "nrm")
    trunc = topk("tv", "tnrm")
    return (
        full.join(trunc, ["q_id", "vec_id"])
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("overlap_at_k"),
            F.round(F.count(F.lit(1)).cast("double") / TOP_K, 4).alias(
                "overlap_ratio"
            ),
        )
    )


RRF_POOL = 20  # per-ranker candidate pool depth
RRF_C = 60     # RRF smoothing constant (Cormack et al. 2009 default)
RRF_OUT = 5    # fused results emitted per query


@query(
    "q_sim_rrf_fusion",
    oracle=_ORACLE_E
    + f"""
    , et AS (
      SELECT vec_id, v[1:{MAT_DIMS}] AS tv,
             sqrt(list_sum(list_transform(v[1:{MAT_DIMS}], x -> x * x)))
                 AS tnrm
      FROM e),
    full_rank AS (
      SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_sum(list_transform(list_zip(a.v, b.v),
                                                p -> p[1] * p[2]))
                        / (a.nrm * b.nrm) DESC, b.vec_id) AS rn
      FROM e a JOIN e b ON a.vec_id < {N_QUERY} AND b.vec_id <> a.vec_id),
    trunc_rank AS (
      SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_sum(list_transform(list_zip(a.tv, b.tv),
                                                p -> p[1] * p[2]))
                        / (a.tnrm * b.tnrm) DESC, b.vec_id) AS rn
      FROM et a JOIN et b ON a.vec_id < {N_QUERY} AND b.vec_id <> a.vec_id),
    fused AS (
      SELECT coalesce(f.q_id, t.q_id) AS q_id,
             coalesce(f.vec_id, t.vec_id) AS vec_id,
             coalesce(1.0 / ({RRF_C} + f.rn), 0)
               + coalesce(1.0 / ({RRF_C} + t.rn), 0) AS score
      FROM (SELECT * FROM full_rank WHERE rn <= {RRF_POOL}) f
      FULL JOIN (SELECT * FROM trunc_rank WHERE rn <= {RRF_POOL}) t
        ON t.q_id = f.q_id AND t.vec_id = f.vec_id),
    ranked AS (
      SELECT q_id, vec_id, score,
             row_number() OVER (
               PARTITION BY q_id ORDER BY score DESC, vec_id) AS fused_rank
      FROM fused)
    SELECT q_id, vec_id, CAST(fused_rank AS INT) AS fused_rank,
           round(score, 6) AS rrf_score
    FROM ranked WHERE fused_rank <= {RRF_OUT}
    """,
)
def q_sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of two retrieval
    rankings — the full 64-dim cosine ranking and the 16-dim matryoshka
    prefix ranking — score = Σ 1/(RRF_C + rank) over the rankers that
    placed the doc in their top-RRF_POOL. RRF is the standard way to merge
    heterogeneous retrievers (dense + sparse, full + truncated) without
    score calibration, because it consumes only RANKS; ranks here are exact
    and deterministic (sequential-fold dot products agree bitwise across
    engines — q_embed_matryoshka precedent), so the fused list is
    hash-verified end-to-end, including symmetric-score ties broken by
    vec_id.

    Scale shape: both ranking passes share q_sim_cosine_topk's plan
    (queries broadcast, corpus streams — at 100 TB swap in the LSH/IVF/PQ
    shortlists, which emit the same (q_id, vec_id, rn) shape); the fusion
    itself touches only 2·RRF_POOL rows per query."""
    e = load_table(spark, sf_dir, "embeddings")
    ed = persist_tracked(
        e.select("vec_id", _vec_double().alias("v"))
        .withColumn("nrm", _norm(F.col("v")))
        .withColumn("tv", F.slice("v", 1, MAT_DIMS))
        .withColumn("tnrm", _norm(F.col("tv")))
    )

    def ranked(vcol: str, ncol: str) -> DataFrame:
        return broadcast_cosine_topk(ed, RRF_POOL, vcol, ncol).select(
            "q_id", "vec_id", "rn"
        )

    full = ranked("v", "nrm")
    trunc = ranked("tv", "tnrm")
    fused = (
        full.withColumnRenamed("rn", "rn_f")
        .join(
            trunc.withColumnRenamed("rn", "rn_t")
            .withColumnRenamed("q_id", "tq")
            .withColumnRenamed("vec_id", "tv_id"),
            (F.col("q_id") == F.col("tq")) & (F.col("vec_id") == F.col("tv_id")),
            "full",
        )
        .select(
            F.coalesce("q_id", "tq").alias("q_id"),
            F.coalesce("vec_id", "tv_id").alias("vec_id"),
            (
                F.coalesce(F.lit(1.0) / (RRF_C + F.col("rn_f")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (RRF_C + F.col("rn_t")), F.lit(0.0))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), "vec_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .where(F.col("fused_rank") <= RRF_OUT)
        .select(
            "q_id",
            "vec_id",
            F.col("fused_rank").cast("int").alias("fused_rank"),
            F.round("score", 6).alias("rrf_score"),
        )
    )


SEMDEDUP_TAU = 0.4  # rounded-cosine drop threshold (fixture near-dup level)


@query(
    "q_dedup_semdedup",
    oracle=_ORACLE_E
    + _IVF_ASSIGN_CTES
    + f""",
    dup AS (
      SELECT DISTINCT b.cell, b.vec_id
      FROM assigned a JOIN assigned b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE round(list_sum(list_transform(list_zip(a.v, b.v),
                                          p -> p[1] * p[2]))
                  / (a.nrm * b.nrm), 4) >= {SEMDEDUP_TAU}),
    sz AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs
           FROM assigned GROUP BY cell),
    dr AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_dropped
           FROM dup GROUP BY cell)
    SELECT s.cell, s.n_vecs,
           coalesce(d.n_dropped, 0) AS n_dropped,
           round(1.0 - CAST(coalesce(d.n_dropped, 0) AS DOUBLE) / s.n_vecs, 4)
               AS keep_rate
    FROM sz s LEFT JOIN dr d ON d.cell = s.cell
    """,
)
def q_dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication by
    cluster-then-compare — vectors are assigned to coarse cells (the
    computed-centroid cascade shared with q_sim_ivf_topk), and WITHIN each
    cell any vector whose rounded cosine to a lower-id cell-mate reaches
    SEMDEDUP_TAU is dropped (deterministic keep-lowest-id policy — a
    non-iterative, slightly conservative variant of the paper's greedy
    removal, chosen so the drop set needs no sequential dependency).
    Emits per-cell corpus size, drops, and keep rate — the dedup budget
    report that decides how hard semantic pruning hits each region of
    embedding space.

    Scale shape: the whole point of SemDeDup is that the O(m²) compare
    runs per CELL, not per corpus — cell size m ≈ n/k stays constant when
    k grows with n (at 100 TB, train real k-means centroids with
    q_embed_kmeans and raise k); assignment is a broadcast-centroid
    zero-shuffle pass, the compare one equi-join shuffle on cell."""
    e = load_table(spark, sf_dir, "embeddings")
    _cent, assigned = _ivf_assign(e)
    assigned = persist_tracked(assigned)
    a = assigned.select(
        "cell",
        F.col("vec_id").alias("ida"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = assigned.select(
        "cell",
        F.col("vec_id").alias("idb"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    dup = (
        a.join(b, "cell")
        .where(F.col("ida") < F.col("idb"))
        .where(F.round(cos, 4) >= SEMDEDUP_TAU)
        .select("cell", F.col("idb").alias("vec_id"))
        .distinct()
    )
    sz = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vecs"))
    dr = dup.groupBy("cell").agg(F.count(F.lit(1)).alias("n_dropped"))
    return sz.join(dr, "cell", "left").select(
        "cell",
        "n_vecs",
        F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
        F.round(
            F.lit(1.0)
            - F.coalesce("n_dropped", F.lit(0)).cast("double") / F.col("n_vecs"),
            4,
        ).alias("keep_rate"),
    )


@query(
    "q_quality_drift_embedding",
    oracle=_ORACLE_E
    + """
    , h AS (
      SELECT vec_id, label, v, nrm,
             CASE WHEN substring(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '8'
                  THEN 'ref' ELSE 'cur' END AS half
      FROM e),
    cx AS (
      SELECT label, half, pos, round(avg(x), 6) AS cx
      FROM (SELECT label, half, unnest(v) AS x,
                   unnest(range(1, len(v) + 1)) AS pos
            FROM h)
      GROUP BY label, half, pos),
    cent AS (
      SELECT label, half, list(cx ORDER BY pos) AS cv
      FROM cx GROUP BY label, half),
    stats AS (
      SELECT label, half, CAST(count(*) AS BIGINT) AS n, avg(nrm) AS mnrm
      FROM h GROUP BY label, half)
    SELECT r.label, rs.n AS n_ref, cs.n AS n_cur,
           round(list_sum(list_transform(list_zip(r.cv, c.cv),
                                         p -> p[1] * p[2]))
                 / (sqrt(list_sum(list_transform(r.cv, x -> x * x)))
                    * sqrt(list_sum(list_transform(c.cv, x -> x * x)))),
                 4) AS centroid_cosine,
           round(cs.mnrm - rs.mnrm, 4) + 0.0 AS norm_shift
    FROM cent r
    JOIN cent c ON c.label = r.label AND r.half = 'ref' AND c.half = 'cur'
    JOIN stats rs ON rs.label = r.label AND rs.half = 'ref'
    JOIN stats cs ON cs.label = r.label AND cs.half = 'cur'
    """,
)
def q_quality_drift_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor — the ML-observability gate run when
    a new model version or data batch lands: the corpus is split into
    deterministic hash halves (stand-ins for reference vs current
    batches), and per label the two halves' centroids (computed, rounded
    6dp — q_embed_centroid discipline) are compared by cosine, alongside
    population counts and mean-norm shift. centroid_cosine ≈ 1 means the
    region of embedding space is stable; a drop localizes drift to a
    label before it degrades retrieval (complements q_quality_psi, which
    watches scalar distributions).

    Scale shape: two hash aggs carrying |labels|·|dims| constant-size
    partials (centroid sums) and |labels| norm averages; the comparison
    joins touch only the tiny per-label tables — the corpus is scanned
    once and never shuffled at row granularity."""
    e = load_table(spark, sf_dir, "embeddings")
    h = e.select(
        "vec_id",
        "label",
        _vec_double().alias("v"),
        F.when(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1) < "8", "ref"
        )
        .otherwise("cur")
        .alias("half"),
    ).withColumn("nrm", _norm(F.col("v")))
    h = persist_tracked(h)
    cent = (
        h.select("label", "half", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "half", "pos")
        .agg(F.round(F.avg("x"), 6).alias("cx"))
        .groupBy("label", "half")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                lambda s: s.cx,
            ).alias("cv")
        )
    )
    stats = h.groupBy("label", "half").agg(
        F.count(F.lit(1)).alias("n"), F.avg("nrm").alias("mnrm")
    )
    r = cent.where(F.col("half") == "ref").select(
        "label", F.col("cv").alias("rcv")
    )
    c = cent.where(F.col("half") == "cur").select(
        "label", F.col("cv").alias("ccv")
    )
    rs = stats.where(F.col("half") == "ref").select(
        "label", F.col("n").alias("n_ref"), F.col("mnrm").alias("rm")
    )
    cs = stats.where(F.col("half") == "cur").select(
        "label", F.col("n").alias("n_cur"), F.col("mnrm").alias("cm")
    )
    cosine = _dot(F.col("rcv"), F.col("ccv")) / (
        _norm(F.col("rcv")) * _norm(F.col("ccv"))
    )
    return (
        r.join(c, "label")
        .join(rs, "label")
        .join(cs, "label")
        .select(
            "label",
            "n_ref",
            "n_cur",
            F.round(cosine, 4).alias("centroid_cosine"),
            # + 0.0 canonicalizes a tiny negative rounded to IEEE -0.0
            (F.round(F.col("cm") - F.col("rm"), 4) + F.lit(0.0)).alias(
                "norm_shift"
            ),
        )
    )


CORESET_STEPS = 4  # greedy selections after the seed (5 points total)


def _coreset_oracle() -> str:
    """Chained-CTE k-center greedy: sel0 holds the seed; each step picks
    the vector minimizing its 6dp-rounded max cosine to the selected set
    (= maximizing min angular distance), vec_id tie-break."""
    step_tpl = """,
    s{i} AS (
      SELECT e.vec_id, e.v,
             round(list_max(list_transform(p.vs,
                 s -> list_sum(list_transform(list_zip(e.v, s),
                                              z -> z[1] * z[2]))
                      / (sqrt(list_sum(list_transform(e.v, x -> x * x)))
                         * sqrt(list_sum(list_transform(s, x -> x * x)))))),
                   6) AS maxcos
      FROM e CROSS JOIN sel{p} p
      WHERE NOT list_contains(p.ids, e.vec_id)
      ORDER BY maxcos, e.vec_id LIMIT 1),
    sel{i} AS (
      SELECT list_append(p.ids, n.vec_id) AS ids,
             list_append(p.vs, n.v) AS vs,
             list_append(p.cov, n.maxcos) AS cov
      FROM sel{p} p CROSS JOIN s{i} n)"""
    steps = "".join(
        step_tpl.format(i=i, p=i - 1) for i in range(1, CORESET_STEPS + 1)
    )
    return (
        _ORACLE_E
        + f""",
    sel0 AS (
      SELECT [vec_id] AS ids, [v] AS vs, [CAST(NULL AS DOUBLE)] AS cov
      FROM e WHERE vec_id = 0){steps}
    SELECT CAST(u.i - 1 AS INT) AS step, c.ids[u.i] AS vec_id,
           c.cov[u.i] AS max_cos_at_pick
    FROM sel{CORESET_STEPS} c, UNNEST(range(1, len(c.ids) + 1)) AS u(i)
    """
    )


@query("q_sample_coreset", oracle=_coreset_oracle())
def q_sample_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-center greedy coreset selection (farthest-point traversal — the
    facility-location greedy behind diversity-aware data curation): from
    a fixed seed, each step admits the vector MINIMIZING its rounded max
    cosine to everything already selected (equivalently, maximizing the
    minimum angular distance) — the classic 2-approximation to the
    k-center cover, emitted with each pick's coverage cosine so the
    radius curve is visible. Deterministic end-to-end: cosines rounded
    6dp before the argmin, ties broken by vec_id, and the whole greedy
    trajectory hash-verified against the oracle's chained-CTE replay.

    Scale shape: each step is one scan of the corpus against a
    BROADCAST ≤k-vector selected set (zero shuffle) followed by a
    TakeOrdered-1 reduction; steps are serial by nature of the greedy,
    so wall-clock is k scans — at 100 TB pick k per partition first and
    greedy-merge the per-partition candidates (composable, same op)."""
    e = load_table(spark, sf_dir, "embeddings")
    ed = persist_tracked(e.select("vec_id", _vec_double().alias("v")))
    sel = ed.where(F.col("vec_id") == 0).select(
        F.array("vec_id").alias("ids"),
        F.array("v").alias("vs"),
        F.array(F.lit(None).cast("double")).alias("cov"),
    )
    for _ in range(CORESET_STEPS):
        maxcos = F.round(
            F.array_max(
                F.transform(
                    F.col("vs"),
                    lambda s: _dot(F.col("v"), s)
                    / (_norm(F.col("v")) * _norm(s)),
                )
            ),
            6,
        )
        nxt = (
            ed.crossJoin(F.broadcast(sel))
            .where(~F.array_contains(F.col("ids"), F.col("vec_id")))
            .select("vec_id", "v", "ids", "vs", "cov", maxcos.alias("maxcos"))
            .orderBy(F.col("maxcos").asc(), F.col("vec_id").asc())
            .limit(1)
        )
        sel = nxt.select(
            F.concat(F.col("ids"), F.array(F.col("vec_id"))).alias("ids"),
            F.concat(F.col("vs"), F.array(F.col("v"))).alias("vs"),
            F.concat(F.col("cov"), F.array(F.col("maxcos"))).alias("cov"),
        )
    return sel.select(
        F.posexplode(F.arrays_zip("ids", "cov")).alias("step", "z")
    ).select(
        "step",
        F.col("z.ids").alias("vec_id"),
        F.col("z.cov").alias("max_cos_at_pick"),
    )


NDCG_K = 10  # evaluation depth for the retrieval-quality report


@query(
    "q_sim_eval_ndcg",
    oracle=_ORACLE_E
    + f"""
    , et AS (
      SELECT vec_id, v[1:{MAT_DIMS}] AS tv,
             sqrt(list_sum(list_transform(v[1:{MAT_DIMS}], x -> x * x)))
                 AS tnrm
      FROM e),
    full_rank AS (
      SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_sum(list_transform(list_zip(a.v, b.v),
                                                p -> p[1] * p[2]))
                        / (a.nrm * b.nrm) DESC, b.vec_id) AS rn
      FROM e a JOIN e b ON a.vec_id < {N_QUERY} AND b.vec_id <> a.vec_id),
    truth AS (
      SELECT q_id, vec_id, rn, {NDCG_K + 1} - rn AS rel
      FROM full_rank WHERE rn <= {NDCG_K}),
    approx AS (
      SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_sum(list_transform(list_zip(a.tv, b.tv),
                                                p -> p[1] * p[2]))
                        / (a.tnrm * b.tnrm) DESC, b.vec_id) AS rn
      FROM et a JOIN et b ON a.vec_id < {N_QUERY} AND b.vec_id <> a.vec_id),
    atop AS (SELECT q_id, vec_id, rn FROM approx WHERE rn <= {NDCG_K}),
    dcg AS (
      SELECT a.q_id,
             sum(coalesce(t.rel, 0) / ln(a.rn + 1)) AS dcg
      FROM atop a LEFT JOIN truth t
        ON t.q_id = a.q_id AND t.vec_id = a.vec_id
      GROUP BY a.q_id),
    idcg AS (
      SELECT q_id, sum(rel / ln(rn + 1)) AS idcg FROM truth GROUP BY q_id),
    mrr AS (
      SELECT t.q_id, 1.0 / min(a.rn) AS rr
      FROM truth t JOIN atop a ON a.q_id = t.q_id AND a.vec_id = t.vec_id
      WHERE t.rn = 1 GROUP BY t.q_id)
    SELECT d.q_id,
           round(d.dcg / i.idcg, 6) AS ndcg_at_k,
           round(coalesce(m.rr, 0.0), 6) AS mrr_top1,
           CAST((SELECT count(*) FROM atop a2 JOIN truth t2
                 ON t2.q_id = a2.q_id AND t2.vec_id = a2.vec_id
                 WHERE a2.q_id = d.q_id) AS BIGINT) AS overlap_at_k
    FROM dcg d JOIN idcg i ON i.q_id = d.q_id
    LEFT JOIN mrr m ON m.q_id = d.q_id
    """,
)
def q_sim_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation — NDCG@{NDCG_K}, MRR of the true
    top-1, and overlap@{NDCG_K} for the matryoshka-truncated ranking
    against the full-dimension ground truth: the standard IR scorecard
    (graded relevance = inverse ground-truth rank, log-discounted) that
    turns 'the cheap index looks fine' into a number with an SLO. The
    same harness evaluates any approximate ranking that emits
    (q_id, vec_id, rn) — LSH, IVF, PQ shortlists slot in unchanged.

    Scale shape: both ranking passes share the broadcast-queries plan;
    the metric joins touch only the two k-row-per-query toplists.
    ln is libm (q_text_lmscore precedent); metrics rounded 6dp."""
    e = load_table(spark, sf_dir, "embeddings")
    ed = persist_tracked(
        e.select("vec_id", _vec_double().alias("v"))
        .withColumn("nrm", _norm(F.col("v")))
        .withColumn("tv", F.slice("v", 1, MAT_DIMS))
        .withColumn("tnrm", _norm(F.col("tv")))
    )

    def ranked(vcol: str, ncol: str) -> DataFrame:
        return broadcast_cosine_topk(ed, NDCG_K, vcol, ncol).select(
            "q_id", "vec_id", "rn"
        )

    truth = persist_tracked(
        ranked("v", "nrm").withColumn("rel", F.lit(NDCG_K + 1) - F.col("rn"))
    )
    atop = persist_tracked(ranked("tv", "tnrm"))
    dcg = (
        atop.join(
            truth.select("q_id", "vec_id", "rel"), ["q_id", "vec_id"], "left"
        )
        .groupBy("q_id")
        .agg(
            F.sum(
                F.coalesce("rel", F.lit(0)) / F.log(F.col("rn") + 1)
            ).alias("dcg")
        )
    )
    idcg = truth.groupBy("q_id").agg(
        F.sum(F.col("rel") / F.log(F.col("rn") + 1)).alias("idcg")
    )
    mrr = (
        truth.where(F.col("rn") == 1)
        .select("q_id", "vec_id")
        .join(atop.withColumnRenamed("rn", "arn"), ["q_id", "vec_id"])
        .groupBy("q_id")
        .agg((F.lit(1.0) / F.min("arn")).alias("rr"))
    )
    overlap = atop.join(truth.select("q_id", "vec_id"), ["q_id", "vec_id"]).groupBy(
        "q_id"
    ).agg(F.count(F.lit(1)).alias("overlap_at_k"))
    # overlap joins LEFT + coalesce(0), like mrr: a query whose truncated
    # and full top-k share zero vectors has no overlap row, but the
    # oracle's correlated count still emits it with overlap_at_k = 0 —
    # an inner join would drop the query entirely (r9 review)
    return (
        dcg.join(idcg, "q_id")
        .join(mrr, "q_id", "left")
        .join(overlap, "q_id", "left")
        .select(
            "q_id",
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_k"),
            F.round(F.coalesce("rr", F.lit(0.0)), 6).alias("mrr_top1"),
            F.coalesce("overlap_at_k", F.lit(0).cast("long")).alias(
                "overlap_at_k"
            ),
        )
    )


KNN_K = 5  # neighbors voting in the kNN classifier


@query(
    "q_ml_knn",
    oracle=_ORACLE_E
    + f"""
    , split AS (
      SELECT vec_id, label, v, nrm,
             substring(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '8' AS is_train
      FROM e),
    nn AS (
      SELECT q.vec_id AS q_id, q.label AS actual, t.label AS nb_label,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_sum(list_transform(list_zip(q.v, t.v),
                                                p -> p[1] * p[2]))
                        / (q.nrm * t.nrm) DESC, t.vec_id) AS rn
      FROM split q JOIN split t ON NOT q.is_train AND t.is_train),
    votes AS (
      SELECT q_id, actual, nb_label, CAST(count(*) AS BIGINT) AS n_votes
      FROM nn WHERE rn <= {KNN_K} GROUP BY q_id, actual, nb_label),
    best AS (
      SELECT q_id, actual, nb_label AS predicted,
             row_number() OVER (
               PARTITION BY q_id ORDER BY n_votes DESC, nb_label) AS vr
      FROM votes)
    SELECT actual AS actual_label, predicted AS predicted_label,
           CAST(count(*) AS BIGINT) AS n_vecs
    FROM best WHERE vr = 1
    GROUP BY actual, predicted
    """,
)
def q_ml_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-nearest-neighbor classification over the embedding corpus: every
    held-out vector (deterministic hash split) is labeled by majority
    vote of its {KNN_K} nearest TRAIN vectors by exact cosine — the
    lazy-learning baseline every embedding space is sanity-checked with
    (labels here are real cluster structure, so accuracy is
    substantive, unlike the word-salad text classifiers). Vote ties
    break to the lower label; the confusion matrix is hash-verified.

    Scale shape: brute-force scoring with the TEST side as the
    broadcast probe set (train corpus streams, never shuffles); at
    corpus scale swap the exact pass for the LSH/IVF/PQ shortlists —
    the voting stage reads the same (q_id, neighbor, rn) shape. Vote
    rollup is two hash aggs on k-bounded rows."""
    e = load_table(spark, sf_dir, "embeddings")
    split = persist_tracked(
        e.select("vec_id", "label", _vec_double().alias("v"))
        .withColumn("nrm", _norm(F.col("v")))
        .withColumn(
            "is_train",
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1) < "8",
        )
    )
    q = split.where(~F.col("is_train")).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("actual"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    t = split.where(F.col("is_train")).select(
        "vec_id", F.col("label").alias("nb_label"), "v", "nrm"
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
    nn = (
        t.join(F.broadcast(q))
        .select("q_id", "actual", "nb_label", cos.alias("cos_raw"), "vec_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KNN_K)
    )
    votes = nn.groupBy("q_id", "actual", "nb_label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    best = votes.withColumn(
        "vr",
        F.row_number().over(
            Window.partitionBy("q_id").orderBy(
                F.col("n_votes").desc(), F.col("nb_label")
            )
        ),
    ).where(F.col("vr") == 1)
    return best.groupBy(
        F.col("actual").alias("actual_label"),
        F.col("nb_label").alias("predicted_label"),
    ).agg(F.count(F.lit(1)).alias("n_vecs"))


RANGE_COS = 0.25     # radius-search threshold (cosine), applied to the
# 4dp-ROUNDED similarity on BOTH engines so a last-ulp cross-engine
# difference in the raw dot product can never flip membership at the
# boundary (same discipline as the verify thresholds in the dedup
# cascade oracles).


@query(
    "q_sim_range_search",
    oracle=_ORACLE_E
    + f"""
    SELECT q_id, vec_id, cos_sim,
           CAST(count(*) OVER (PARTITION BY q_id) AS BIGINT) AS n_in_range
    FROM (
      SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
             round(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
                   / (a.nrm * b.nrm), 4) AS cos_sim
      FROM e a JOIN e b ON a.vec_id < {N_QUERY} AND b.vec_id <> a.vec_id)
    WHERE cos_sim >= {RANGE_COS}
    """,
)
def q_sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (range) similarity search — ANN's other half: instead of
    the k best neighbors (q_sim_cosine_topk), ALL corpus vectors within a
    cosine radius of each query, plus the per-query in-range count (the
    selectivity statistic a planner needs before choosing radius vs
    top-k retrieval).

    Scale shape: identical to the brute-force top-k baseline — the
    {N_QUERY}-vector query side is broadcast, the corpus streams through
    executors once with no shuffle of the big side, and the radius
    predicate prunes rows map-side BEFORE anything aggregates, so output
    (not corpus) size bounds what moves. Unlike top-k there is no
    per-query window; the only post-filter shuffle is the per-query
    count over the (small) in-range result. The LSH-bucketed variant
    (q_sim_lsh_topk's table layout with a radius verify) is the 100 TB
    path; this exact operator is its recall oracle, same pairing as
    q_dedup_ngram_jaccard / q_dedup_minhash."""
    ed = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", _vec_double().alias("v"))
        .withColumn("nrm", _norm(F.col("v")))
    )
    q = ed.where(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))
    in_range = (
        ed.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", F.round(cos, 4).alias("cos_sim"))
        .where(F.col("cos_sim") >= RANGE_COS)
    )
    return in_range.withColumn(
        "n_in_range",
        F.count(F.lit(1)).over(Window.partitionBy("q_id")),
    )


HYB_QUERIES = {          # disjoint lexical term sets, one row set per query
    "hq1": ("merge", "stream"),
    "hq2": ("vector", "hash"),
    "hq3": ("filter", "scan"),
}
HYB_POOL = 20            # per-ranker candidate pool depth
HYB_PRF = 3              # pseudo-relevance-feedback docs per query
HYB_OUT = 10             # fused results emitted per query
HYB_Q = 1_000_000        # integer-millionths embedding quantization
# BM25 scoring pipeline (Python AND oracle-SQL sides) shared with
# q_text_bm25 — one implementation in queries/text.py, so the two keys
# can't silently diverge (closed r6 review finding).
from kafka_hadoop_consumer_spark.queries.text import (  # noqa: E402
    bm25_oracle_ctes,
    bm25_scores,
)
_HYB_TERM_ROWS = ", ".join(
    f"('{q}', '{t}')" for q, ts in HYB_QUERIES.items() for t in ts
)


@query(
    "q_e2e_hybrid_search",
    oracle=f"""
    WITH qt(q_id, term) AS (VALUES {_HYB_TERM_ROWS}),
    {bm25_oracle_ctes(
        term_pred="t IN (SELECT term FROM qt)",
        select_keys="qt.q_id AS q_id, tf.doc_id AS doc_id",
        group_by="qt.q_id, tf.doc_id",
        extra_joins="JOIN qt ON qt.term = tf.term",
    )},
    lex AS (SELECT q_id, doc_id, bm25 FROM bm25_scored),
    lexr AS (
      SELECT q_id, doc_id,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY bm25 DESC, doc_id) AS rl
      FROM lex),
    eq AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(round(x * {HYB_Q}, 0) AS BIGINT)) AS v
      FROM embeddings),
    cent AS (
      SELECT l.q_id, p.pos, CAST(sum(e.v[p.pos]) AS BIGINT) AS cq
      FROM (SELECT q_id, doc_id FROM lexr WHERE rl <= {HYB_PRF}) l
      JOIN eq e ON e.vec_id = l.doc_id
      CROSS JOIN (SELECT unnest(range(1, {EMB_DIM + 1})) AS pos) p
      GROUP BY 1, 2),
    dots AS (
      SELECT c.q_id, e.vec_id AS doc_id,
             CAST(sum(e.v[c.pos] * c.cq) AS BIGINT) AS dot
      FROM eq e JOIN cent c ON true
      GROUP BY 1, 2),
    denser AS (
      SELECT q_id, doc_id,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY dot DESC, doc_id) AS rd
      FROM dots),
    fused AS (
      SELECT coalesce(l.q_id, d.q_id) AS q_id,
             coalesce(l.doc_id, d.doc_id) AS doc_id,
             coalesce(1.0 / (60 + l.rl), 0)
               + coalesce(1.0 / (60 + d.rd), 0) AS score
      FROM (SELECT * FROM lexr WHERE rl <= {HYB_POOL}) l
      FULL JOIN (SELECT * FROM denser WHERE rd <= {HYB_POOL}) d
        ON d.q_id = l.q_id AND d.doc_id = l.doc_id),
    ranked AS (
      SELECT q_id, doc_id, score,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY score DESC, doc_id) AS fused_rank
      FROM fused)
    SELECT r.q_id, CAST(r.fused_rank AS INT) AS fused_rank, r.doc_id,
           round(r.score, 6) AS rrf_score, m.lang, m.source
    FROM ranked r JOIN documents m ON m.doc_id = r.doc_id
    WHERE r.fused_rank <= {HYB_OUT}
    """,
)
def q_e2e_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval end-to-end — the modern search-stack composition
    (lexical + dense + fusion) as ONE plan, for {len(HYB_QUERIES)}
    concurrent queries: (1) BM25 ranks each query's term set over the
    corpus; (2) the top-{HYB_PRF} lexical hits per query seed a
    pseudo-relevance-feedback centroid in integer-millionths embedding
    space; (3) the centroid scores the whole corpus by exact-integer
    inner product (MIPS); (4) both rankings fuse by reciprocal rank
    (1/(60+r)); (5) the top-{HYB_OUT} fused hits hydrate document
    metadata. Dense scoring needs NO query embedding model at inference
    time — the PRF centroid derives from the lexical stage, which is
    what makes the composition a pipeline rather than two independent
    retrievers.

    Scale shape: the term IN-filter prunes the token stream BEFORE its
    explode output shuffles (q_text_bm25's plan); df/corpus-stats and
    the {HYB_PRF}x64 centroid are broadcast; corpus embeddings stream
    through one narrow posexplode joined to the 64-row-per-query
    centroid, partial-aggregated map-side to one dot per (query, doc);
    fusion touches <= 2x{HYB_POOL} rows per query and ranks partition
    by query id. Quantized components make every dot product an exact
    BIGINT (sum order immaterial; the 6dp rrf rounding only formats two
    exactly-representable reciprocals), so the whole cascade — PRF
    selection included — replays bit-exactly in the oracle. At 100 TB
    swap stage (3) for the IVF/PQ shortlist (same (q, doc, rank)
    shape); ranks stay per-query windows, never global."""
    return hybrid_search(
        spark,
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
        HYB_QUERIES,
    )


def hybrid_search(
    spark: SparkSession, d: DataFrame, emb: DataFrame, queries: dict
) -> DataFrame:
    """The hybrid-retrieval core behind q_e2e_hybrid_search, extracted
    (same pattern as graph.cc_from_edges) so bench.py's scaling_10x
    probe can run the identical plan over synthetic 1x/10x corpora with
    vocabulary-matched query terms. ``d`` needs (doc_id, text, lang,
    source); ``emb`` needs (vec_id, embedding array<float>); ``queries``
    maps q_id -> lexical term tuple."""
    qt = spark.createDataFrame(
        [(q, t) for q, ts in queries.items() for t in ts],
        "q_id string, term string",
    )
    all_terms = [t for ts in queries.values() for t in ts]
    lex = bm25_scores(d, all_terms, qt=qt)
    w_lex = Window.partitionBy("q_id").orderBy(F.col("bm25").desc(), "doc_id")
    lexr = persist_tracked(
        lex.withColumn("rl", F.row_number().over(w_lex)).where(
            F.col("rl") <= HYB_POOL
        )
    )
    # The quantize / centroid-sum / dot HOFs are PRE-RENDERED SQL strings
    # (one JVM parse each) — the lambda-Column forms cost ~0.2 s of py4j
    # round-trips per invocation (the minhash_signatures rationale;
    # identical expressions, verified strict-green).
    quant = (
        f"transform({{c}}, x -> cast(round(cast(x AS double) * {HYB_Q}, 0)"
        " AS long))"
    )
    eq = emb.selectExpr("vec_id", quant.format(c="embedding") + " AS v")
    # r13 (guide §2.3/§4.1): MIPS against the per-query centroid used to
    # posexplode every corpus embedding ×64 rows, join the component
    # stream to the centroid on position, and shuffle (q, doc) partial
    # sums back together — a 64× row amplification plus an exchange, for
    # a dot product. Pivot the tiny centroid into one array row per
    # query (|queries| rows, k-capped), broadcast it, and compute each
    # dot as a single JVM zip_with/aggregate over the two arrays: the
    # corpus streams through ONCE, zero exchanges, and the exact-BIGINT
    # sum is the same value in any order.
    #
    # r14 (guide §2.4/§2.3): the centroid itself used to posexplode the
    # PRF embeddings and pay TWO exchanges (groupBy (q, pos), then the
    # groupBy(q) pivot); it is now ONE aggregation — element-wise BIGINT
    # array sum via zip_with inside collect_list/aggregate (order-free,
    # exact). The PRF side also joins the RAW embeddings and quantizes
    # AFTER the join, so the per-element round/cast runs on the
    # |queries|×HYB_PRF joined rows instead of the whole corpus (the
    # corpus-wide quantization happens exactly once, in the dots scan).
    centv = (
        lexr.where(F.col("rl") <= HYB_PRF)
        .join(
            emb.select("vec_id", "embedding"),
            F.col("vec_id") == F.col("doc_id"),
        )
        .select("q_id", F.expr(quant.format(c="embedding") + " AS pv"))
        .groupBy("q_id")
        .agg(
            F.expr(
                "aggregate(collect_list(pv),"
                f" array_repeat(cast(0 AS long), {EMB_DIM}),"
                " (acc, v) -> zip_with(acc, v, (a, b) -> a + b)) AS cv"
            )
        )
    )
    dots = eq.crossJoin(F.broadcast(centv)).selectExpr(
        "q_id",
        "vec_id AS doc_id",
        "aggregate(zip_with(v, cv, (x, y) -> x * y), cast(0 AS long),"
        " (acc, x) -> acc + x) AS dot",
    )
    w_dense = Window.partitionBy("q_id").orderBy(F.col("dot").desc(), "doc_id")
    denser = dots.withColumn("rd", F.row_number().over(w_dense)).where(
        F.col("rd") <= HYB_POOL
    )
    # r14 (guide §2.4): RRF fusion was a FULL OUTER join of the two rank
    # lists (two sort exchanges + SMJ + coalesce arithmetic); a union +
    # groupBy(q, doc) sum is one hash aggregation over the same ≤
    # 2·HYB_POOL rows per query. Bit-identical scores: a doc on both
    # lists sums its two reciprocals (FP addition of two terms is
    # commutative, so partial-merge order cannot matter), a doc on one
    # list keeps its single reciprocal exactly (the old `x + 0.0` is
    # exact for the strictly positive reciprocals).
    fused = (
        lexr.select(
            "q_id", "doc_id", (F.lit(1.0) / (60 + F.col("rl"))).alias("score")
        )
        .unionAll(
            denser.select(
                "q_id", "doc_id", (F.lit(1.0) / (60 + F.col("rd"))).alias("score")
            )
        )
        .groupBy("q_id", "doc_id")
        .agg(F.sum("score").alias("score"))
    )
    w_f = Window.partitionBy("q_id").orderBy(F.col("score").desc(), "doc_id")
    hits = fused.withColumn("fused_rank", F.row_number().over(w_f)).where(
        F.col("fused_rank") <= HYB_OUT
    )
    # hydration: broadcast the <=30-row HITS side and stream the corpus
    # metadata past it (broadcasting the documents side would ship the
    # whole corpus to every executor at scale)
    return d.select("doc_id", "lang", "source").join(
        F.broadcast(hits), "doc_id"
    ).select(
        "q_id",
        F.col("fused_rank").cast("int").alias("fused_rank"),
        "doc_id",
        F.round("score", 6).alias("rrf_score"),
        "lang",
        "source",
    )
