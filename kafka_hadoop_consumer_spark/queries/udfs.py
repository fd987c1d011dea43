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
    """Vectorized text normalizer: lowercase, trim, collapse whitespace."""
    return s.str.lower().str.strip().str.replace(r" +", " ", regex=True)


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
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("bin_id", T.IntegerType()),
    ]
)

BIN_BUDGET = 512   # tokens per packed bin


def _ffd_pack(pdf: pd.DataFrame) -> pd.DataFrame:
    """First-fit-decreasing bin packing within one group — genuinely
    sequential/stateful (each placement depends on all prior ones), the
    applyInPandas case built-ins can't express. Deterministic: items
    sorted by (tokens desc, doc_id)."""
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
    out = pdf[["doc_id", "lang", "n_tokens"]].copy()
    out["bin_id"] = pd.array(assigned, dtype="int32")
    return out


@query("q_pack_bins")  # no oracle: greedy FFD is inherently sequential (R4)
def q_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing sequence packing: per language, pack docs
    into bins of ≤{BIN_BUDGET} tokens (oversize docs get singleton
    bins) — tighter than the cumulative-sum packing of
    q_pack_sequences, at the cost of sequential per-group state.

    Scale shape: token counts compute JVM-side; one shuffle on lang
    brings each group to one Arrow batch. Groups must fit in executor
    memory — at 100 TB you'd pack per (lang, shard) where shard is a
    hash prefix, keeping groups bounded while preserving within-shard
    packing quality (the standard compromise). Properties (no bin over
    budget, every doc exactly once) gated in tests/test_properties.py.
    """
    d = load_table(spark, sf_dir, "documents")
    with_tokens = d.select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("int").alias("n_tokens")
    )
    return with_tokens.groupBy("lang").applyInPandas(
        _ffd_pack, schema=_PACK_BINS_SCHEMA
    )
