"""Sampling + pivot operators — training-pipeline staples beyond the core
§2B table (corpus subsampling, wide summary matrices).

Hash-based sampling is the scale-correct pattern: deterministic,
engine-portable (md5 on both sides), stable under re-partitioning and
re-runs — unlike rng-based TABLESAMPLE whose result depends on partition
layout. At 100 TB it also gives consistent train/holdout splits across
pipeline stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.catalog import load_table
from kafka_hadoop_consumer_spark.queries.registry import persist_tracked, query


@query(
    "q_sample_hash",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '29'
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~16% sample: first md5 byte of the key below 0x29.

    Same rows selected on any engine, any partitioning, any run — the
    reproducible-split primitive for train/eval carving.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "29"
    ).select("doc_id", "lang", "n_chars")


@query(
    "q_sample_quota",
    oracle="""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    WHERE rn <= 50
    """,
)
def q_sample_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quota sampling: at most 50 docs per language, chosen by
    deterministic hash order — the domain-mixing primitive of corpus
    curation ("cap any one domain/language at N documents").

    Hash-ordered row_number is reproducible across engines, runs, and
    partitionings (md5 on both sides), unlike rand()-ordered quotas. One
    shuffle on the group key; at 100 TB, skewed groups are bounded by
    the quota itself — the window never retains more than the cap per
    group after the partial top-k AQE applies to window-with-limit.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 50)
        .select("doc_id", "lang")
    )


@query("q_sample_rng")  # no oracle: rng sampling is engine-specific (R4)
def q_sample_rng(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli TABLESAMPLE (deterministic within Spark, not
    across engines). pytest asserts the fraction lands near 10%."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "q_agg_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
           CAST(count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS n_F,
           CAST(count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS n_O
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): linestatus values become columns.

    Explicit value list → one pass, no distinct-values pre-query; the
    oracle expresses the same thing as portable CASE aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    # counts coalesce to 0: Spark's pivot fills a structurally empty
    # (returnflag, linestatus) cell with NULL even for count, while the
    # oracle's count(CASE ...) is 0 — on genuine TPC-H data the (A,O)
    # and (R,O) cells ARE empty (r9 review; the fixture happens to
    # populate all six). Sums stay NULL on both engines (sum of an
    # empty set is NULL in SQL too).
    return wide.select(
        "l_returnflag",
        F.col("F_qty").alias("qty_F"),
        F.col("O_qty").alias("qty_O"),
        F.coalesce(F.col("F_n"), F.lit(0).cast("long")).alias("n_F"),
        F.coalesce(F.col("O_n"), F.lit(0).cast("long")).alias("n_O"),
    )


MIX_ALPHA = 0.3  # temperature exponent: 1.0 = natural, 0.0 = uniform


@query(
    "q_sample_mixture",
    oracle=f"""
    WITH counts AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
    shares AS (
      SELECT lang, n_docs, n_docs / sum(n_docs) OVER () AS share FROM counts)
    SELECT lang, n_docs,
           round(share, 6) AS share,
           round(pow(share, {MIX_ALPHA})
                 / sum(pow(share, {MIX_ALPHA})) OVER (), 6) AS weight
    FROM shares
    """,
)
def q_sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language-mixture weights (the multilingual
    sampling recipe from mBERT/XLM-R: w_l ∝ (n_l/N)^α, α={MIX_ALPHA}) —
    upweights low-resource languages for training-data balancing.

    Scale shape: one count-by-lang hash agg over the corpus (map-side
    combinable); everything after runs on the persisted |langs|-row
    frame, with the two global totals (doc count, Σ share^α) as
    broadcast 1-row crossJoins — no SinglePartition window
    (plan-asserted globally). pow() is libm → weights rounded 6dp on
    both engines; the share division itself is exact (int counts →
    double)."""
    d = load_table(spark, sf_dir, "documents")
    counts = persist_tracked(
        d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    )
    n_total = counts.agg(F.sum("n_docs").alias("n_total"))
    shares = persist_tracked(
        counts.crossJoin(F.broadcast(n_total)).withColumn(
            "share_raw", F.col("n_docs") / F.col("n_total")
        )
    )
    pw_total = shares.agg(
        F.sum(F.pow("share_raw", MIX_ALPHA)).alias("pw_total")
    )
    return shares.crossJoin(F.broadcast(pw_total)).select(
        "lang",
        "n_docs",
        F.round("share_raw", 6).alias("share"),
        F.round(F.pow("share_raw", MIX_ALPHA) / F.col("pw_total"), 6).alias(
            "weight"
        ),
    )


SPLIT_BOUNDS = ("cc", "e6")  # md5-prefix cut points ≈ 80% / 10% / 10%


@query(
    "q_sample_split",
    oracle=f"""
    WITH tagged AS (
      SELECT lang,
             CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                       < '{SPLIT_BOUNDS[0]}' THEN 'train'
                  WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                       < '{SPLIT_BOUNDS[1]}' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents)
    SELECT lang, split, count(*) AS n_docs
    FROM tagged
    GROUP BY lang, split
    """,
)
def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (~80/10/10) by content-stable
    hash — the dataset-versioning staple: a document's split never
    changes when the corpus grows, shards move, or the job reruns,
    because membership depends only on its id hash (no RNG, no
    partition-order dependence).

    Scale shape: the split tag is a narrow projection; the audit count
    is one map-side-combinable hash agg over |langs|×3 groups. The same
    CASE predicate filters any split lazily (train-only scan reads
    nothing else when used as a pushed filter)."""
    d = load_table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h < SPLIT_BOUNDS[0], "train")
        .when(h < SPLIT_BOUNDS[1], "val")
        .otherwise("test")
    )
    return (
        d.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "q_sample_weighted",
    oracle="""
    SELECT doc_id, n_chars, a_key
    FROM (
      SELECT doc_id, n_chars,
             round(pow(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                       / 4294967296.0,
                       1.0 / n_chars), 9) AS a_key
      FROM documents)
    ORDER BY a_key DESC, doc_id
    LIMIT 100
    """,
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis-Spirakis A-Res:
    each item draws u ∈ [0,1) and scores u^(1/w) (w = n_chars); the
    top-k scores ARE a weighted sample — long documents proportionally
    likelier, yet the draw is a pure function of the key.

    Determinism: u comes from the md5 hash (engine-portable, like every
    sampler here), not rand(); pow() drifts in the last ulp between
    libm implementations, so the score is rounded to 9dp on BOTH sides
    before ranking, with doc_id as the tiebreak.

    Scale shape: the score is a zero-shuffle projection; top-100 is
    TakeOrderedAndProject (per-partition partial top-k, no global
    sort) — the same one-pass selection at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("double") / F.lit(4294967296.0)
    # try_divide: an empty doc (n_chars = 0) would abort under ANSI;
    # DuckDB's 1.0/0 is NULL -> NULL a_key, sorted last on both engines
    a_key = F.round(F.pow(u, F.try_divide(F.lit(1.0), F.col("n_chars"))), 9)
    return (
        d.select("doc_id", "n_chars", a_key.alias("a_key"))
        .orderBy(F.col("a_key").desc(), F.col("doc_id"))
        .limit(100)
    )


@query(
    "q_sample_balanced",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
             ) AS rn
      FROM documents),
    floor_n AS (SELECT min(c) AS n_keep FROM (
      SELECT count(*) AS c FROM documents GROUP BY lang))
    SELECT doc_id, lang, n_chars
    FROM ranked, floor_n
    WHERE rn <= n_keep
    """,
)
def q_sample_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced undersampling: every language keeps exactly
    min-class-count documents, chosen by deterministic hash order (md5 of
    the key — a reproducible shuffle, not rand(), and not doc_id order,
    which would bias toward old documents) — the class-balancing prep
    before training on skewed label distributions.

    Scale shape: one window shuffle on the class key ranks each class in
    hash order; the floor count is a map-side-combinable agg reduced to
    one broadcast row. Because the quota is DATA-DEPENDENT (a column,
    not a literal), Spark cannot apply its WindowGroupLimit partial
    top-k — at 100 TB, resolve the floor first (tiny agg) and re-plan
    with the literal quota (q_sample_quota's shape) so hot classes
    forward only ~n_keep rows per map task.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), F.col("doc_id")
    )
    floor_n = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.min("c").alias("n_keep"))
    )
    return (
        d.select("doc_id", "lang", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(floor_n))
        .where(F.col("rn") <= F.col("n_keep"))
        .select("doc_id", "lang", "n_chars")
    )
