"""Training-data pipeline operators beyond the core §2B table — the
document-prep stages between raw corpus and model input: chunking,
scrubbing, repetition filtering, embedding post-processing, stratified
split carving, and sequence packing.

All hot-path logic is JVM built-ins (higher-order array lambdas, regexp,
window functions) — no Python UDFs — so every operator runs inside
whole-stage codegen. Scale notes per operator in docstrings; the common
theme: per-document work is narrow (no shuffle), corpus-level work
shuffles once on its natural key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.catalog import load_table
from kafka_hadoop_consumer_spark.queries.registry import persist_tracked, query
from kafka_hadoop_consumer_spark.queries.textutil import ngram_expr

CHUNK_TOKENS = 32       # chunk width (tokens)
CHUNK_STRIDE = 24       # stride => 8-token overlap between adjacent chunks
PACK_BUDGET = 256       # tokens per packed shard
_SCRUB = ("the", "a", "of", "and", "to")  # stand-in PII/denylist lexicon


@query(
    "q_text_chunk",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    SELECT doc_id,
           CAST((s - 1) / {CHUNK_STRIDE} AS INT) AS chunk_idx,
           array_to_string(list_slice(t, s, s + {CHUNK_TOKENS - 1}), ' ') AS chunk,
           CAST(len(list_slice(t, s, s + {CHUNK_TOKENS - 1})) AS INT) AS n_chunk_tokens
    FROM tok, UNNEST(range(1, len(t) + 1, {CHUNK_STRIDE})) AS u(s)
    """,
)
def q_text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: 32-token chunks every 24 tokens
    (8-token overlap), the context-window prep stage for embedding or
    training pipelines.

    Narrow op — tokenize once into a column, slice per start offset via a
    higher-order transform, explode. No shuffle; scales linearly with
    corpus bytes and parallelizes per input split.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("toks", F.split("text", " "))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks), {CHUNK_STRIDE}),"
                    f" s -> struct(CAST((s - 1) DIV {CHUNK_STRIDE} AS INT) AS chunk_idx,"
                    f"             array_join(slice(toks, s, {CHUNK_TOKENS}), ' ') AS chunk,"
                    f"             CAST(size(slice(toks, s, {CHUNK_TOKENS})) AS INT) AS n_chunk_tokens))"
                )
            ).alias("c"),
        )
        .select("doc_id", "c.chunk_idx", "c.chunk", "c.n_chunk_tokens")
    )


@query(
    "q_text_scrub",
    oracle=r"""
    SELECT doc_id,
           trim(regexp_replace(
                regexp_replace(text, '\b(the|a|of|and|to)\b', '<MASK>', 'g'),
                ' +', ' ', 'g')) AS scrubbed,
           CAST(len(list_filter(string_split(text, ' '),
                                t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS INT)
             AS n_redacted
    FROM documents
    """,
)
def q_text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based scrubbing: replace denylisted tokens with <MASK>,
    normalize whitespace, and count redactions per document — the
    PII-redaction / boilerplate-strip stage (the fixture corpus has no
    real PII, so a fixed lexicon stands in; swap the pattern for
    email/phone/SSN regexes on a real corpus).

    Pure regexp built-ins — narrow, codegen'd, no shuffle. Both engines
    use the same RE2-compatible pattern; Spark's regexp_replace is
    global by default, DuckDB takes the 'g' flag.
    """
    d = load_table(spark, sf_dir, "documents")
    pattern = r"\b(" + "|".join(_SCRUB) + r")\b"
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.trim(
            F.regexp_replace(F.regexp_replace("text", pattern, "<MASK>"), " +", " ")
        ).alias("scrubbed"),
        F.size(F.filter(toks, lambda t: t.isin(*_SCRUB))).cast("int").alias("n_redacted"),
    )


@query(
    "q_text_repetition",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    tf AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
    stats AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(max(c) AS BIGINT) AS max_tf
      FROM tf GROUP BY doc_id
    ),
    bg AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    bigr AS (
      SELECT doc_id,
             len(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                                i -> array_to_string(list_slice(t, i, i + 1), ' '))) AS n_bigrams,
             len(list_distinct(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                                i -> array_to_string(list_slice(t, i, i + 1), ' ')))) AS n_distinct_bigrams
      FROM bg
    )
    SELECT s.doc_id, n_tokens, n_distinct, max_tf,
           round(1.0 - CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS dup_token_ratio,
           CASE WHEN n_bigrams = 0 THEN 0.0
                ELSE round(1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams, 6)
           END AS dup_bigram_ratio
    FROM stats s JOIN bigr b ON s.doc_id = b.doc_id
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition features: duplicated-token ratio,
    duplicated-bigram ratio, and peak term frequency — the repetition
    filter that catches degenerate/boilerplate docs before training.

    Token stats go through explode → two map-side-combinable hash aggs
    keyed by doc_id (the scalable form — per-doc O(n), never O(n²) HOF
    scans). Bigram distinctness stays a narrow higher-order expression.
    The doc_id join is co-partitioned by the first agg's shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("max_tf"),
    )
    bigrams = F.expr(ngram_expr("toks", 2))
    bigr = (
        d.withColumn("toks", F.split("text", " "))
        .select(
            "doc_id",
            F.size(bigrams).alias("n_bigrams"),
            F.size(F.array_distinct(bigrams)).alias("n_distinct_bigrams"),
        )
    )
    return (
        stats.join(bigr, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            "max_tf",
            F.round(
                1.0 - F.col("n_distinct").cast("double") / F.col("n_tokens"), 6
            ).alias("dup_token_ratio"),
            # single-token docs have no bigrams: define the ratio as 0.0
            # (ANSI mode would otherwise raise DIVIDE_BY_ZERO)
            F.when(F.col("n_bigrams") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    1.0
                    - F.col("n_distinct_bigrams").cast("double")
                    / F.col("n_bigrams"),
                    6,
                )
            )
            .alias("dup_bigram_ratio"),
        )
    )


@query(
    "q_embed_normquant",
    oracle="""
    WITH e AS (SELECT vec_id,
                      embedding::DOUBLE[] AS v,
                      sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
               FROM embeddings)
    SELECT vec_id,
           CAST(i AS INT) AS dim,
           round(v[i] / nrm, 6) AS nx,
           CAST(floor(v[i] / nrm * 127 + 0.5) AS INT) AS q_int8
    FROM e, UNNEST(range(1, len(v) + 1)) AS u(i)
    """,
)
def q_embed_normquant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding post-processing: L2-normalize, then symmetric int8
    quantization (x/||x|| × 127, round-half-up via floor(x+0.5) — exact
    on both engines, unlike engine-specific round/cast behavior).

    Norms accumulate in double, sequentially (same bit pattern both
    engines — the similarity.py determinism contract). Narrow explode;
    at scale the quantized form is what you'd sink to the vector store.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        e.select("vec_id", v.alias("v"), nrm.alias("nrm"))
        .select("vec_id", F.posexplode("v").alias("pos", "x"), "nrm")
        .select(
            "vec_id",
            (F.col("pos") + 1).cast("int").alias("dim"),
            # try_divide: an all-zero vector has nrm = 0 — ANSI '/'
            # would abort the whole query; DuckDB's x/0 is NULL, so
            # NULL components for a zero-norm vector is the parity
            # behavior (r9 review, the q_text_langid class)
            F.round(F.try_divide(F.col("x"), F.col("nrm")), 6).alias("nx"),
            F.floor(F.try_divide(F.col("x"), F.col("nrm")) * 127 + 0.5)
            .cast("int")
            .alias("q_int8"),
        )
    )


@query(
    "q_sample_stratified",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
          CASE lang WHEN 'en' THEN '20' WHEN 'zh' THEN '80' ELSE '40' END
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-stratum hash thresholds
    (downsample dominant 'en' to ~12.5%, upsample-keep 'zh' at ~50%,
    25% elsewhere) — the language-rebalancing step of corpus curation.

    Same md5-prefix trick as q_sample_hash, so the selected set is
    engine-portable, partitioning-independent, and stable across reruns;
    the per-stratum threshold is just a CASE over the strat key. Narrow
    (no shuffle, no per-stratum pass — one predicate does all strata).
    """
    d = load_table(spark, sf_dir, "documents")
    threshold = (
        F.when(F.col("lang") == "en", "20")
        .when(F.col("lang") == "zh", "80")
        .otherwise("40")
    )
    return d.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < threshold
    ).select("doc_id", "lang", "n_chars")


@query(
    "q_pack_sequences",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM tok
    )
    SELECT doc_id, lang,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_tokens - n_tokens AS BIGINT) AS start_offset,
           CAST(floor((cum_tokens - n_tokens) / {PACK_BUDGET}.0) AS BIGINT) AS bin_id
    FROM packed
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: stream each language's docs in key order and
    assign each to the ~256-token shard its cumulative offset lands in —
    the packing step that turns ragged documents into fixed-budget
    training shards (docs may straddle shard boundaries; the trainer
    splits at token level).

    One window (= one shuffle on lang) computes the running offset;
    bin assignment is arithmetic. Deterministic because doc_id is a
    unique total order within each partition key. At 100 TB the
    partition key would be (lang, shard-range) to bound window state.
    """
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("long")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = d.select("doc_id", "lang", n_tokens.alias("n_tokens"))
    cum = tok.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    start = F.col("cum_tokens") - F.col("n_tokens")
    return cum.select(
        "doc_id",
        "lang",
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / float(PACK_BUDGET)).cast("long").alias("bin_id"),
    )


CURATE_QUOTA = 100    # max docs per language after dedup


@query(
    "q_e2e_curation",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fp
      FROM documents
      WHERE len(string_split(text, ' ')) BETWEEN 20 AND 500
        AND CAST(len(list_filter(string_split(text, ' '),
                                 t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
            / len(string_split(text, ' ')) < 0.5
    ),
    d AS (
      SELECT doc_id, lang, n_tokens FROM (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM q)
      WHERE rn = 1
    )
    SELECT doc_id, lang, n_tokens FROM (
      SELECT doc_id, lang, n_tokens,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS qrn
      FROM d)
    WHERE qrn <= {CURATE_QUOTA}
    """,
)
def q_e2e_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation in ONE declarative plan — the composed
    LLM-data pipeline: quality gate (token band + stopword ratio, the
    q_text_quality criteria) → exact near-dup removal (order-insensitive
    bag-of-words fingerprint, min-doc_id survivor) → per-language quota
    (hash-ordered, the q_sample_quota cap).

    Scale shape: the quality gate and fingerprinting are narrow (no
    shuffle — filters + per-row expressions on the scan); dedup is one
    shuffle on the fingerprint and the quota one on lang, and BOTH
    windows carry a row_number-limit so WindowGroupLimit truncates
    map-side. Nothing in the plan is corpus-quadratic; at 100 TB this
    is two bounded shuffles over the quality survivors only.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "to")))
        .cast("double") / n_tokens
    )
    fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split(F.lower("text"), " "))), " ")
    )
    gated = d.where(n_tokens.between(20, 500) & (stop_ratio < 0.5)).select(
        "doc_id", "lang", n_tokens.cast("int").alias("n_tokens"), fp.alias("fp")
    )
    w_dedup = Window.partitionBy("fp").orderBy("doc_id")
    deduped = (
        gated.withColumn("rn", F.row_number().over(w_dedup))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "n_tokens")
    )
    w_quota = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        deduped.withColumn("qrn", F.row_number().over(w_quota))
        .where(F.col("qrn") <= CURATE_QUOTA)
        .select("doc_id", "lang", "n_tokens")
    )


@query(
    "q_embed_centroid",
    oracle="""
    WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
    x AS (SELECT label, unnest(v) AS x, unnest(range(1, len(v) + 1)) AS pos
          FROM e)
    SELECT label,
           CAST(pos AS INT) AS pos,
           round(avg(x), 6) AS centroid,
           count(*) AS n_vecs
    FROM x
    GROUP BY label, pos
    """,
)
def q_embed_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (the k-means M-step / class-prototype
    primitive), long format: one row per (label, dimension).

    Scale shape: posexplode is narrow (no shuffle); the avg is one hash
    agg keyed on (label, pos) with map-side partial sums, so the shuffle
    carries |labels|×|dims| partial states — constant-size regardless of
    corpus row count. That is exactly how you'd compute centroids for a
    billion vectors (and iterating it + q_sim_ivf_topk's assignment step
    is distributed k-means). Component avg is an accumulated double →
    rounded 6dp on both engines (SURVEY.md §7 R2)."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    return (
        e.select("label", F.posexplode(v).alias("pos0", "x"))
        .groupBy("label", (F.col("pos0") + 1).cast("int").alias("pos"))
        .agg(
            F.round(F.avg("x"), 6).alias("centroid"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
    )


CURRICULUM_STAGES = 4


@query(
    "q_pack_curriculum",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    ug AS (SELECT unnest(t) AS w FROM tok),
    uc AS (SELECT w, CAST(count(*) AS BIGINT) AS cw FROM ug GROUP BY w),
    tot AS (SELECT CAST(sum(cw) AS DOUBLE) AS n FROM uc),
    scored AS (
      SELECT d.doc_id,
             CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
             round(avg(ln(uc.cw / (SELECT n FROM tot))), 6) AS difficulty
      FROM (SELECT doc_id, text, unnest(string_split(text, ' ')) AS w
            FROM documents) d
      JOIN uc ON uc.w = d.w
      JOIN documents dd ON dd.doc_id = d.doc_id
      GROUP BY d.doc_id, dd.text, d.text),
    cuts AS (
      SELECT quantile_disc(difficulty,
                           [i / {CURRICULUM_STAGES}.0
                            FOR i IN range(1, {CURRICULUM_STAGES})]) AS qs
      FROM scored),
    staged AS (
      SELECT s.doc_id, s.n_tokens, s.difficulty,
             1 + CAST(len(list_filter(c.qs, q -> s.difficulty > q))
                      AS BIGINT) AS stage
      FROM scored s, cuts c)
    SELECT stage,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(difficulty), 6) AS mean_difficulty,
           round(min(difficulty), 6) AS min_difficulty,
           round(max(difficulty), 6) AS max_difficulty
    FROM staged GROUP BY stage
    """,
)
def q_pack_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data staging: docs scored by unigram-LM mean log-prob
    (the q_text_lmscore difficulty signal — common-word docs score high
    / easy, rare-word docs low / hard), then cut into
    CURRICULUM_STAGES difficulty stages at exact score quantiles and
    rolled into a stage manifest (doc counts, token budget, difficulty
    band per stage) — easy-first data ordering for curriculum training,
    produced as a queryable artifact like q_e2e_shard_manifest.

    Stage assignment deliberately avoids a global ntile window (the
    q_win_ntile wall): the 3 quantile cuts are computed exactly
    (percentile_disc — input bit patterns), broadcast, and each doc's
    stage is 1 + (#cuts strictly below its score) — a narrow comparison
    against a 3-element array, no global sort. Docs tied exactly AT a
    cut land in the lower stage on both engines (> comparison on
    identical rounded doubles).

    Scale shape: vocab broadcast into the scoring join (q_text_tfidf
    pattern), one doc-keyed agg, a 1-row quantile aggregate broadcast
    back, final rollup to CURRICULUM_STAGES rows."""
    d = load_table(spark, sf_dir, "documents")
    ug = d.select(F.explode(F.split("text", " ")).alias("w"))
    uc = persist_tracked(ug.groupBy("w").agg(F.count(F.lit(1)).alias("cw")))
    tot = uc.agg(F.sum("cw").cast("double").alias("n"))
    scored = persist_tracked(
        d.select(
            "doc_id",
            F.size(F.split("text", " ")).alias("n_tokens"),
            F.explode(F.split("text", " ")).alias("w"),
        )
        .join(F.broadcast(uc), "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.any_value("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("cw") / F.col("n"))), 6).alias(
                "difficulty"
            ),
        )
    )
    qs = scored.agg(
        F.expr(
            "percentile_disc(array({}) ) WITHIN GROUP (ORDER BY difficulty)".format(
                ", ".join(
                    str(i / CURRICULUM_STAGES)
                    for i in range(1, CURRICULUM_STAGES)
                )
            )
        ).alias("qs")
    )
    staged = scored.crossJoin(F.broadcast(qs)).select(
        "n_tokens",
        "difficulty",
        (
            1
            + F.size(
                F.filter(F.col("qs"), lambda q: F.col("difficulty") > q)
            ).cast("long")
        ).alias("stage"),
    )
    return staged.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("difficulty"), 6).alias("mean_difficulty"),
        F.round(F.min("difficulty"), 6).alias("min_difficulty"),
        F.round(F.max("difficulty"), 6).alias("max_difficulty"),
    )


MIXB_ALPHA = 0.3       # temperature exponent (matches q_sample_mixture)
MIXB_BUDGET = 20_000   # global token budget to materialize


@query(
    "q_pack_mixture_budget",
    oracle=f"""
    WITH counts AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
    shares AS (
      SELECT lang, n_docs / sum(n_docs) OVER () AS share FROM counts),
    weights AS (
      SELECT lang,
             round(pow(share, {MIXB_ALPHA})
                   / sum(pow(share, {MIXB_ALPHA})) OVER (), 6) AS w
      FROM shares),
    budgets AS (
      SELECT lang, CAST(floor({MIXB_BUDGET} * w) AS BIGINT) AS budget_tokens
      FROM weights),
    docs AS (
      SELECT lang, md5(text) AS h,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents),
    cum AS (
      SELECT lang, n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
      FROM docs),
    sel AS (
      SELECT c.lang, c.n_tokens
      FROM cum c JOIN budgets b ON b.lang = c.lang
      WHERE c.running <= b.budget_tokens)
    SELECT b.lang, b.budget_tokens,
           CAST(coalesce(count(s.n_tokens), 0) AS BIGINT) AS n_docs_selected,
           CAST(coalesce(sum(s.n_tokens), 0) AS BIGINT) AS tokens_selected,
           round(CAST(coalesce(sum(s.n_tokens), 0) AS DOUBLE)
                 / b.budget_tokens, 4) AS utilization
    FROM budgets b LEFT JOIN sel s ON s.lang = b.lang
    GROUP BY b.lang, b.budget_tokens
    """,
)
def q_pack_mixture_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize a training mixture: the temperature-scaled language
    weights of q_sample_mixture are turned into per-language TOKEN
    budgets (floor(B·w_l) of a global budget), and documents are
    admitted per language in deterministic content-hash order until the
    running token sum would exceed the budget — the greedy
    budget-cut that turns mixture WEIGHTS into an actual dataset
    manifest. Emits per language: budget, docs/tokens admitted, and
    budget utilization (the shortfall shows quantization loss from
    whole-document admission).

    Scale shape: one count agg (|langs| rows) for weights; one
    per-language hash-ordered running-sum window over the corpus — the
    q_pack_sequences cumulative-cut discipline, partitioned by lang so no
    global sort; admission is a broadcast join of the |langs|-row budget
    table."""
    d = load_table(spark, sf_dir, "documents")
    counts = persist_tracked(
        d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    )
    # Both global totals (doc count, Σ share^α) over the |langs|-row frame
    # ride broadcast 1-row crossJoins — no SinglePartition window
    # (plan-asserted globally).
    n_total = counts.agg(F.sum("n_docs").alias("n_total"))
    shared = persist_tracked(
        counts.crossJoin(F.broadcast(n_total)).withColumn(
            "share_raw", F.col("n_docs") / F.col("n_total")
        )
    )
    pw_total = shared.agg(
        F.sum(F.pow("share_raw", MIXB_ALPHA)).alias("pw_total")
    )
    pw = F.pow("share_raw", MIXB_ALPHA)
    budgets = shared.crossJoin(F.broadcast(pw_total)).select(
        "lang",
        F.floor(MIXB_BUDGET * F.round(pw / F.col("pw_total"), 6))
        .cast("long")
        .alias("budget_tokens"),
    )
    docs = d.select(
        "lang",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    wcum = (
        Window.partitionBy("lang")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = docs.withColumn("running", F.sum("n_tokens").over(wcum))
    sel = cum.join(F.broadcast(budgets), "lang").where(
        F.col("running") <= F.col("budget_tokens")
    )
    agg = sel.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sel"),
        F.sum("n_tokens").alias("tok_sel"),
    )
    return (
        budgets.join(agg, "lang", "left")
        .select(
            "lang",
            "budget_tokens",
            F.coalesce("n_sel", F.lit(0)).alias("n_docs_selected"),
            F.coalesce("tok_sel", F.lit(0)).alias("tokens_selected"),
            F.round(
                F.coalesce("tok_sel", F.lit(0)).cast("double")
                / F.col("budget_tokens"),
                4,
            ).alias("utilization"),
        )
    )


EPOCH_SEEDS = ("ep0", "ep1")  # literal epoch seeds (reproducible runs)
EPOCH_SHARDS = 16             # hex-nibble sharding of each epoch order


@query(
    "q_pack_epoch_shuffle",
    oracle=f"""
    WITH d AS (SELECT doc_id FROM documents),
    ep AS (
      SELECT e.epoch, d.doc_id,
             md5(CASE e.epoch WHEN 0 THEN '{EPOCH_SEEDS[0]}'
                              ELSE '{EPOCH_SEEDS[1]}' END
                 || ':' || CAST(d.doc_id AS VARCHAR)) AS h
      FROM d CROSS JOIN (SELECT unnest([0, 1]) AS epoch) e),
    sharded AS (
      SELECT epoch, doc_id, h,
             CAST(strpos('0123456789abcdef', substring(h, 1, 1)) - 1 AS INT)
                 AS shard
      FROM ep)
    SELECT epoch, doc_id, shard,
           CAST(row_number() OVER (
             PARTITION BY epoch, shard ORDER BY h, doc_id) AS BIGINT) AS pos
    FROM sharded
    """,
)
def q_pack_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible epoch shuffling for training runs: each epoch's
    document order comes from md5(seed:doc_id) — re-running the pipeline
    regenerates byte-identical epoch orders (the property data-loading
    infra needs for resumable/replicable training), and different seeds
    give independent permutations. Orders are SHARDED by the hash's
    first nibble with positions assigned within (epoch, shard) — a
    loader streams shards in sequence, so no global permutation is ever
    materialized.

    Scale shape: no global sort — the only window partitions by
    (epoch, shard), i.e. 2×{EPOCH_SHARDS} parallel orderings whose size
    is |corpus|/shards; at 100 TB raise the nibble count (2 hex chars →
    256 shards) to keep shard sorts in-memory."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = d.sparkSession.range(2).select(F.col("id").cast("int").alias("epoch"))
    ep = d.crossJoin(epochs).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat(
                F.when(F.col("epoch") == 0, EPOCH_SEEDS[0]).otherwise(
                    EPOCH_SEEDS[1]
                ),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ).alias("h"),
    )
    sharded = ep.withColumn(
        "shard",
        (F.instr(F.lit("0123456789abcdef"), F.substring("h", 1, 1)) - 1).cast(
            "int"
        ),
    )
    w = Window.partitionBy("epoch", "shard").orderBy("h", "doc_id")
    return sharded.select(
        "epoch",
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


LB_BATCH_DOCS = 16  # documents per training batch within a length band


@query(
    "q_pack_length_batches",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, md5(text) AS h,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CASE WHEN len(string_split(text, ' ')) < 40 THEN 0
                  WHEN len(string_split(text, ' ')) < 80 THEN 1
                  WHEN len(string_split(text, ' ')) < 120 THEN 2
                  ELSE 3 END AS band
      FROM documents),
    batched AS (
      SELECT band, n_tokens,
             CAST((row_number() OVER (
               PARTITION BY band ORDER BY h, doc_id) - 1)
               // {LB_BATCH_DOCS} AS BIGINT) AS batch_id
      FROM d)
    SELECT band, batch_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(max(n_tokens) AS BIGINT) AS batch_seq_len,
           CAST(max(n_tokens) * count(*) - sum(n_tokens) AS BIGINT)
               AS padding_waste,
           round(CAST(max(n_tokens) * count(*) - sum(n_tokens) AS DOUBLE)
                 / (max(n_tokens) * count(*)), 4) AS waste_ratio
    FROM batched GROUP BY band, batch_id
    """,
)
def q_pack_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed dynamic batching — the padding-minimization prep
    every efficient training loader runs: documents are banded by token
    length (literal edges), hash-shuffled WITHIN their band, and cut into
    fixed-size batches; each batch pads to its own longest member, and
    the emitted padding_waste / waste_ratio quantify exactly what the
    banding buys (unbanded batches pad everything to the corpus max —
    this report is the before/after evidence). Deterministic: band
    edges, hash order, and integer token counts.

    Scale shape: one per-band row_number window (bands are few and
    independent — at scale range-partition within band like the epoch
    shuffler) and one (band, batch) rollup riding its partitioning."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    band = (
        F.when(F.col("n_tokens") < 40, 0)
        .when(F.col("n_tokens") < 80, 1)
        .when(F.col("n_tokens") < 120, 2)
        .otherwise(3)
    )
    w = Window.partitionBy("band").orderBy("h", "doc_id")
    batched = d.withColumn("band", band).withColumn(
        "batch_id",
        ((F.row_number().over(w) - 1) / LB_BATCH_DOCS).cast("long"),
    )
    waste = F.max("n_tokens") * F.count(F.lit(1)) - F.sum("n_tokens")
    return batched.groupBy("band", "batch_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.max("n_tokens").alias("batch_seq_len"),
        waste.alias("padding_waste"),
        F.round(
            waste.cast("double") / (F.max("n_tokens") * F.count(F.lit(1))), 4
        ).alias("waste_ratio"),
    )
