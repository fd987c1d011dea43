"""UDF / UDAF / UDTF surface (SURVEY.md §2B "UDF/UDAF/UDTF surface").

The engine's stance: built-ins first; when Python is genuinely needed it
must be Arrow-vectorized — pandas_udf for scalars (one Arrow batch per
call, ~10-100× over row-at-a-time), applyInPandas for grouped logic.
The UDTF is row-based by nature (lateral table function) and is kept off
hot paths.
"""

from __future__ import annotations

import sys

import pandas as pd
from pyspark import cloudpickle
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Executor-side Python workers don't share the driver's sys.path, so
# functions from this module must be pickled BY VALUE (not by reference)
# or workers fail with ModuleNotFoundError when the driver runs from a
# different cwd. (Found by driving the entry contract from /tmp.)
cloudpickle.register_pickle_by_value(sys.modules[__name__])

from kafka_hadoop_consumer_spark.catalog import load_table
from kafka_hadoop_consumer_spark.queries.registry import query


@F.pandas_udf(T.StringType())
def _normalize_text(s: pd.Series) -> pd.Series:
    """Vectorized text normalizer: lowercase, trim, collapse whitespace.

    strip(" ") — SPACES only, matching the oracle's SQL trim(): bare
    .str.strip() removes every Unicode whitespace (tabs, newlines), so
    any edge tab would silently fork norm_text between the engines
    (r9 review; the fixture's space-only text masked it)."""
    return s.str.lower().str.strip(" ").str.replace(r" +", " ", regex=True)


@query(
    "q_udf_scalar",
    oracle="""
    SELECT doc_id,
           lower(trim(regexp_replace(text, ' +', ' ', 'g'))) AS norm_text,
           length(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS norm_len
    FROM documents
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF (text normalizer); the oracle
    expresses the same semantics in SQL.

    The UDF is invoked ONCE: ``norm_text`` is materialized in a first
    projection and ``norm_len`` derives from that column in a second, so
    the plan has a single ArrowEvalPython node (plan-asserted) instead of
    two Arrow round-trips for the same input.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", _normalize_text("text").alias("norm_text")
    ).select(
        "doc_id",
        "norm_text",
        F.length("norm_text").cast("long").alias("norm_len"),
    )


_GROUP_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("median_chars", T.DoubleType()),
        T.StructField("iqr_chars", T.DoubleType()),
    ]
)


def _per_lang_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map UDAF body: order statistics pandas computes natively
    (linear-interpolation quantiles — matching SQL quantile_cont)."""
    q1, q2, q3 = pdf["n_chars"].quantile([0.25, 0.5, 0.75])
    return pd.DataFrame(
        {
            "lang": [pdf["lang"].iloc[0]],
            "n_docs": [len(pdf)],
            "median_chars": [float(q2)],
            "iqr_chars": [float(q3 - q1)],
        }
    )


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           quantile_cont(n_chars, 0.5) AS median_chars,
           quantile_cont(n_chars, 0.75) - quantile_cont(n_chars, 0.25) AS iqr_chars
    FROM documents
    GROUP BY lang
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF via applyInPandas: per-language order statistics.

    Each group becomes one pandas DataFrame on an executor — the pattern
    for custom per-group logic Spark lacks natively. One shuffle on the
    group key; groups must fit in executor memory (fine for bounded key
    domains like language).
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", "n_chars")
        .groupBy("lang")
        .applyInPandas(_per_lang_stats, schema=_GROUP_SCHEMA)
    )


@query(
    "q_udtf_explode",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    SELECT doc_id, CAST(i AS INT) AS pos, t[i] AS token
    FROM tok, UNNEST(range(1, len(t) + 1)) AS r(i)
    WHERE length(t[i]) > 5
    """,
)
def q_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function): tokenize with positions,
    emitting only tokens longer than 5 chars — a lateral join per input
    row. The oracle mirrors it with UNNEST(range(...))."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class TokenizeLong:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" "), start=1):
                if len(tok) > 5:
                    yield i, tok

    spark.udtf.register("tokenize_long", TokenizeLong)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM documents d, LATERAL tokenize_long(d.text) t
        """
    )


_PACK_BINS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("bin_id", T.IntegerType()),
    ]
)

BIN_BUDGET = 512   # tokens per packed bin
# Bounded-group packing: FFD runs per (lang, shard), not per whole
# language, so no Arrow group ever exceeds ~|lang| / N_PACK_SHARDS docs.
# 4 shards keeps fixture groups meaningfully multi-doc; in production the
# shard count is sized from data volume (target_docs_per_shard ≈ 100k-1M
# rows per executor-memory-bounded group), trading a little cross-shard
# packing slack for O(1) per-task state.
N_PACK_SHARDS = 4


def _ffd_pack(pdf: pd.DataFrame) -> pd.DataFrame:
    """First-fit-decreasing bin packing within one (lang, shard) group —
    genuinely sequential/stateful (each placement depends on all prior
    ones), the applyInPandas case built-ins can't express. Deterministic:
    items sorted by (tokens desc, doc_id); bin_id is local to the group."""
    pdf = pdf.sort_values(
        ["n_tokens", "doc_id"], ascending=[False, True], ignore_index=True
    )
    remaining: list[int] = []
    assigned: list[int] = []
    for nt in pdf["n_tokens"]:
        for i, rem in enumerate(remaining):
            if nt <= rem:
                remaining[i] = rem - nt
                assigned.append(i)
                break
        else:
            remaining.append(BIN_BUDGET - nt)
            assigned.append(len(remaining) - 1)
    out = pdf[["doc_id", "lang", "shard", "n_tokens"]].copy()
    out["bin_id"] = pd.array(assigned, dtype="int32")
    return out


@query(
    "q_pack_bins",
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, lang,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2))::UBIGINT
                  % {N_PACK_SHARDS} AS INT) AS shard,
             CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             CAST(row_number() OVER (
                      PARTITION BY lang,
                                   ('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                                      1, 2))::UBIGINT
                                   % {N_PACK_SHARDS}
                      ORDER BY len(string_split(text, ' ')) DESC,
                               doc_id) AS BIGINT) AS rn
      FROM documents),
    r AS (
      SELECT lang, shard, CAST(0 AS BIGINT) AS step,
             []::INT[] AS remaining, []::BIGINT[] AS doc_ids, []::INT[] AS bins
      FROM (SELECT DISTINCT lang, shard FROM toks)
      UNION ALL
      SELECT lang, shard, step,
             CASE WHEN fit IS NULL
                  THEN list_append(remaining, {BIN_BUDGET} - nt)
                  ELSE list_transform(range(1, len(remaining) + 1),
                                      i -> CASE WHEN i = fit
                                                THEN remaining[i] - nt
                                                ELSE remaining[i] END)::INT[]
             END AS remaining,
             list_append(doc_ids, doc_id) AS doc_ids,
             list_append(bins, CAST(CASE WHEN fit IS NULL THEN len(remaining)
                                         ELSE fit - 1 END AS INT)) AS bins
      FROM (
        SELECT r.lang, r.shard, r.step + 1 AS step, r.remaining, r.doc_ids,
               r.bins, t.doc_id, t.n_tokens AS nt,
               list_min(list_filter(range(1, len(r.remaining) + 1),
                                    i -> r.remaining[i] >= t.n_tokens)) AS fit
        FROM r JOIN toks t ON t.lang = r.lang AND t.shard = r.shard
                          AND t.rn = r.step + 1))
    SELECT t.doc_id, t.lang, t.shard, t.n_tokens, b.bin_id
    FROM (
      SELECT lang, shard, doc_ids[u.i] AS doc_id, bins[u.i] AS bin_id
      FROM (SELECT lang, shard, doc_ids, bins,
                   row_number() OVER (PARTITION BY lang, shard
                                      ORDER BY step DESC) AS q
            FROM r) last, UNNEST(range(1, len(doc_ids) + 1)) AS u(i)
      WHERE q = 1) b
    JOIN toks t ON t.doc_id = b.doc_id
    """,
)
def q_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing sequence packing with BOUNDED groups: per
    (lang, shard) — shard = first md5 byte of doc_id mod {N_PACK_SHARDS}
    — pack docs into bins of ≤{BIN_BUDGET} tokens (oversize docs get
    singleton bins). Tighter than the cumulative-sum packing of
    q_pack_sequences, at the cost of sequential per-group state.

    Scale shape (r4 verdict item 3): token counts and the shard key
    compute JVM-side; one shuffle on (lang, shard) brings each group to
    one Arrow batch. Sharding is what makes this 100 TB-safe — the
    whole-language variant put the dominant language in ONE task and one
    executor's memory; here every group is ~|lang|/N_PACK_SHARDS docs
    and the shard count scales with data volume. The cost is only
    cross-shard packing slack (each shard's last bins may be
    under-full). bin_id is local to its (lang, shard) group — the
    globally-unique id is the (lang, shard, bin_id) triple, exactly how
    a production writer would path-partition the output. Properties (no
    bin over budget, every doc exactly once) gated in
    tests/test_properties.py.

    SQL-oracled (r4, extended to the sharded key in r5): the per-group
    greedy is replayed by a DuckDB RECURSIVE CTE stepping one doc per
    iteration in the same (tokens desc, doc_id) order, list-typed bin
    state carried through the recursion keyed by (lang, shard), and
    first-fit chosen via list_min(list_filter(...)) — all-integer
    arithmetic, so the full (doc → bin) assignment hash-matches exactly.
    """
    d = load_table(spark, sf_dir, "documents")
    with_tokens = d.select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10)
            .cast("int")
            % N_PACK_SHARDS
        ).alias("shard"),
        F.size(F.split("text", " ")).cast("int").alias("n_tokens"),
    )
    return with_tokens.groupBy("lang", "shard").applyInPandas(
        _ffd_pack, schema=_PACK_BINS_SCHEMA
    )


N_QUERY_VEC = 5  # vec_id < 5 are the query vectors (similarity family)


@query(
    "q_udf_vector_score",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
               FROM embeddings),
    scored AS (
      SELECT b.vec_id, q.vec_id AS q_id,
             round(list_sum(list_transform(list_zip(q.v, b.v), p -> p[1] * p[2]))
                   / (q.nrm * b.nrm), 4) AS score
      FROM e b JOIN e q ON q.vec_id < {N_QUERY_VEC})
    SELECT vec_id, CAST(best_q AS INT) AS best_q, score FROM (
      SELECT vec_id, q_id AS best_q, score,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY score DESC, q_id) AS rn
      FROM scored)
    WHERE rn = 1
    """,
)
def q_udf_vector_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized linear algebra in a pandas UDF: every corpus vector
    scored against the {N_QUERY_VEC}-row query matrix in ONE NumPy matmul
    per Arrow batch (queries broadcast via closure capture), returning
    the best query id + cosine as a struct column.

    This is the high-dimension counterpart of the JVM expression path
    used by q_sim_cosine_topk: at dim 64 the built-in aggregate/zip_with
    wins, but matmul cost per element shrinks with BLAS batching while
    the codegen'd fold stays per-element — past ~256 dims the Arrow
    round-trip pays for itself. Ties and accumulation order are pinned:
    scores round to 4dp before argmax, argmax takes the lowest q_id.
    """
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings")
    qrows = (
        e.where(F.col("vec_id") < N_QUERY_VEC)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    qm = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)

    out_t = T.StructType(
        [T.StructField("best_q", T.IntegerType()),
         T.StructField("score", T.DoubleType())]
    )

    @F.pandas_udf(out_t)
    def _best_query(emb: pd.Series) -> pd.DataFrame:
        v = np.array(emb.tolist(), dtype=np.float64)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        s = np.round(v @ qm.T, 4)
        best = s.argmax(axis=1)  # first max = lowest q_id
        return pd.DataFrame(
            {"best_q": best.astype("int32"),
             "score": s[np.arange(len(best)), best]}
        )

    return e.select(
        "vec_id", _best_query("embedding").alias("b")
    ).select("vec_id", "b.best_q", "b.score")


_COGROUP_SCHEMA = T.StructType(
    [
        T.StructField("purchase_id", T.LongType()),
        T.StructField("view_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
    ]
)


def _merge_asof_group(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
    """Co-grouped as-of body: pandas merge_asof per user. Right side is
    sorted (v_ts, view_id) so backward's last-match tie-break = highest
    view_id among equal timestamps — the same winner as the JVM
    asof_join's (ts DESC, event_id DESC) ordering."""
    if l.empty or r.empty:
        return pd.DataFrame(columns=["purchase_id", "view_id", "user_id"])
    l = l.sort_values(["p_ts", "purchase_id"], ignore_index=True)
    r = r.sort_values(["v_ts", "view_id"], ignore_index=True)
    m = pd.merge_asof(l, r, left_on="p_ts", right_on="v_ts",
                      direction="backward")
    m = m.dropna(subset=["view_id"])
    return pd.DataFrame(
        {"purchase_id": m["purchase_id"].astype("int64"),
         "view_id": m["view_id"].astype("int64"),
         "user_id": m["user_id"].astype("int64")}
    )


@query(
    "q_udf_cogroup",
    # same semantics (and oracle) as q_join_asof: latest view at-or-before
    # each purchase, per user
    oracle="""
    SELECT purchase_id, view_id, user_id
    FROM (SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id,
                 row_number() OVER (PARTITION BY p.event_id
                                    ORDER BY CAST(v.ts AS TIMESTAMP) DESC, v.event_id DESC) AS rn
          FROM (SELECT * FROM events WHERE event_type = 'purchase') p
          JOIN (SELECT * FROM events WHERE event_type = 'view') v
            ON v.user_id = p.user_id AND CAST(v.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP))
    WHERE rn = 1
    """,
)
def q_udf_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-grouped applyInPandas (the third grouped-Python surface next to
    applyInPandas and the UDTF): purchases and views co-partition on
    user_id, each pair of groups meets as two pandas frames, and
    pd.merge_asof computes the per-user as-of match — provably identical
    to the JVM-side operators.temporal.asof_join (same oracle as
    q_join_asof).

    One co-partitioning shuffle on user_id for both inputs; per-user
    groups are bounded, and the Python work is pandas' O(n+m) ordered
    merge per group — no per-row Python.
    """
    e = load_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").cast("timestamp").alias("p_ts"),
    )
    v = e.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").cast("timestamp").alias("v_ts"),
    )
    return (
        p.groupBy("user_id")
        .cogroup(v.groupBy("v_user_id"))
        .applyInPandas(
            lambda l, r: _merge_asof_group(l, r.drop(columns=["v_user_id"])),
            schema=_COGROUP_SCHEMA,
        )
    )
