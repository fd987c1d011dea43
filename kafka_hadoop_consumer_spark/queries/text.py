"""Text-analysis operators for LLM data pipelines (SURVEY.md §2B
"Dedup + LLM-data-pipeline operators"; build plan M4).

All hot-path logic is JVM built-ins (split / explode / higher-order
lambdas / regexp) — no Python UDFs — so these run inside whole-stage
codegen and scale linearly: tokenize+aggregate is one shuffle on the
group key; n-gram frequency is explode + hash-agg with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.catalog import load_table
from kafka_hadoop_consumer_spark.queries.registry import (
    fan_out,
    persist_tracked,
    query,
)
from kafka_hadoop_consumer_spark.queries.textutil import ngram_expr

# Tokens are space-separated in the fixture corpus (FIXTURES.md: word-salad
# from a small vocabulary). Lazy because Column construction needs an
# active SparkContext.
def _tokens():
    return F.split(F.col("text"), " ")

# Tiny fixed stopword lexicon for ratio features (deterministic, mirrored
# verbatim in the oracle SQL).
_STOPWORDS = ("the", "a", "of", "and", "to")


@query(
    "q_text_stats",
    oracle="""
    SELECT lang, source,
           count(*) AS n_docs,
           round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
           round(avg(n_chars), 4) AS avg_chars,
           CAST(max(len(string_split(text, ' '))) AS INT) AS max_tokens,
           CAST(min(n_chars) AS BIGINT) AS min_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) corpus stats: doc counts, token/char lengths."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(_tokens())
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(n_tokens), 4).alias("avg_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.max(n_tokens).cast("int").alias("max_tokens"),
        F.min("n_chars").alias("min_chars"),
    )


@query(
    "q_text_tokens",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INT) AS bpe_ish_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS distinct_tokens
    FROM documents
    """,
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens vs a BPE-ish regex segmentation
    (letters / digits / single symbols) vs distinct-token vocabulary size."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_tokens()).cast("int").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0)))
        .cast("int")
        .alias("bpe_ish_tokens"),
        F.size(F.array_distinct(_tokens())).cast("int").alias("distinct_tokens"),
    )


@query(
    "q_text_ngram",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT s AS ngram
      FROM tok,
           UNNEST(list_transform(range(1, greatest(len(t) - 3, 0) + 1),
                                 i -> array_to_string(list_slice(t, i, i + 3), ' '))) AS u(s)
    )
    SELECT ngram, count(*) AS freq
    FROM grams
    GROUP BY ngram
    ORDER BY freq DESC, ngram
    LIMIT 100
    """,
)
def q_text_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-gram extraction + corpus-wide frequency, top-100.

    Shingling is a higher-order transform over the token array (no
    explode-then-window): sequence(1, n-3) indexes each 4-token slice.
    """
    d = load_table(spark, sf_dir, "documents")
    # tokenize into a column FIRST: referencing `toks` twice in the shingle
    # expr reuses one split; inlining split(text) twice doubles the cost
    # (measured 3x slower at sf0.1)
    grams = (
        fan_out(d)  # single-row-group scan: shingle + partial agg were one task
        .withColumn("toks", F.split("text", " "))
        .select(
            F.explode(F.expr(ngram_expr("toks", 4))).alias("ngram")
        )
    )
    return (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("ngram"))
        .limit(100)
    )


@query(
    "q_text_langid",
    oracle="""
    SELECT doc_id, lang,
           round(CAST(length(regexp_replace(replace(text, ' ', ''), '[^aeiou]', '', 'g')) AS DOUBLE)
                 / length(replace(text, ' ', '')), 6) AS vowel_ratio,
           round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS avg_word_len,
           CASE WHEN CAST(length(regexp_replace(replace(text, ' ', ''), '[^aeiou]', '', 'g')) AS DOUBLE)
                     / length(replace(text, ' ', '')) >= 0.38 THEN 'vowel-heavy'
                WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE)
                     / len(string_split(text, ' ')) >= 5.0 THEN 'long-words'
                ELSE 'default' END AS lang_guess
    FROM documents
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: character-class features (vowel ratio, mean
    word length) + threshold classifier.

    The fixture corpus is synthetic word-salad, so this exercises the
    *plumbing* of n-gram/char-class language ID (deterministic features →
    CASE classifier), not a real model. Ratios are int/int divisions —
    IEEE-deterministic — rounded only for display stability.
    """
    d = load_table(spark, sf_dir, "documents")
    nospace = F.regexp_replace("text", " ", "")
    vowels = F.length(F.regexp_replace(nospace, "[^aeiou]", ""))
    chars = F.length(nospace)
    # try_divide: an empty/whitespace-only doc has chars = 0 — ANSI '/'
    # would abort the whole query; DuckDB's x/0 is NULL, and a NULL
    # ratio falls through the CASE to 'default' identically on both
    # engines (r9 review)
    vowel_ratio = F.try_divide(vowels.cast("double"), chars)
    awl = chars.cast("double") / F.size(_tokens())
    return d.select(
        "doc_id",
        "lang",
        F.round(vowel_ratio, 6).alias("vowel_ratio"),
        F.round(awl, 6).alias("avg_word_len"),
        F.when(vowel_ratio >= 0.38, "vowel-heavy")
        .when(awl >= 5.0, "long-words")
        .otherwise("default")
        .alias("lang_guess"),
    )


@query(
    "q_text_quality",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(len(list_filter(string_split(text, ' '),
                                t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS INT) AS n_stopwords,
           round(CAST(len(list_filter(string_split(text, ' '),
                                      t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS stopword_ratio,
           round(CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')), 6) AS chars_per_token,
           (len(string_split(text, ' ')) BETWEEN 20 AND 500
            AND CAST(len(list_filter(string_split(text, ' '),
                                     t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
                / len(string_split(text, ' ')) < 0.5) AS passes_quality
    FROM documents
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length band, stopword ratio, chars-per-token, and a
    boolean keep/drop gate — the standard pre-training corpus filter shape."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(_tokens())
    n_stop = F.size(F.filter(_tokens(), lambda t: t.isin(*_STOPWORDS)))
    stop_ratio = n_stop.cast("double") / n_tokens
    return d.select(
        "doc_id",
        n_tokens.cast("int").alias("n_tokens"),
        n_stop.cast("int").alias("n_stopwords"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(F.col("n_chars").cast("double") / n_tokens, 6).alias("chars_per_token"),
        (n_tokens.between(20, 500) & (stop_ratio < 0.5)).alias("passes_quality"),
    )


@query(
    "q_text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' '))
             AS fingerprint,
           md5(text) AS exact_hash
    FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: exact-content hash + an order-insensitive
    bag-of-words fingerprint (sorted distinct tokens → md5), the cheap
    first pass before MinHash in a dedup cascade."""
    d = load_table(spark, sf_dir, "documents")
    canon = F.array_join(
        F.array_sort(F.array_distinct(F.split(F.lower("text"), " "))), " "
    )
    return d.select(
        "doc_id",
        F.md5(canon).alias("fingerprint"),
        F.md5("text").alias("exact_hash"),
    )


TFIDF_TOP_K = 5


@query(
    "q_text_tfidf",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    tf AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
    dfc AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             CAST(tf.c AS BIGINT) AS tf,
             CAST(dfc.df AS BIGINT) AS df,
             round(tf.c * ln((n.n + 1.0) / (dfc.df + 1.0)), 6) AS tfidf
      FROM tf CROSS JOIN n JOIN dfc ON tf.tok = dfc.tok
    )
    SELECT doc_id, tok, tf, df, tfidf FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, tok) AS rn
      FROM scored
    ) WHERE rn <= {TFIDF_TOP_K}
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-5 terms per document by
    tf × ln((N+1)/(df+1)) — the salience features feeding corpus search
    / topic labeling.

    Scale shape: term frequencies are one hash-agg on (doc, token);
    document frequencies reduce that (map-side combinable) to the vocab,
    which is broadcast back (vocabulary ≪ corpus — Zipf); the corpus
    count N is a broadcast scalar. The per-doc top-k window rides the
    existing doc_id partitioning. Scores are rounded to 6dp BEFORE the
    window ordering (libm ln drifts in the last ulp between engines —
    ordering on the rounded value keeps ranks identical), ties broken by
    token.
    """
    d = load_table(spark, sf_dir, "documents")
    # r13 (guide §2.4): hash the DOCUMENT rows by doc_id once (tiny —
    # whole docs, pre-explode; also un-starves the single-row-group
    # fixture scan), and every downstream keyed operator reuses that one
    # exchange: groupBy(doc_id, tok) clusters by a superset of doc_id,
    # and the final per-doc top-k window repartitions by doc_id — so the
    # exploded token stream and the scored stream never shuffle at all
    # (was: tf exchange + window exchange over the full token stream).
    tf = (
        fan_out(d, "doc_id")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dfc = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.crossJoin(F.broadcast(n))
        .join(F.broadcast(dfc), "tok")
        .select(
            "doc_id",
            "tok",
            F.col("c").alias("tf"),
            "df",
            F.round(
                F.col("c") * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TFIDF_TOP_K)
        .select("doc_id", "tok", "tf", "df", "tfidf")
    )


@query(
    "q_text_entropy",
    oracle="""
    WITH tf AS (
      SELECT doc_id, t AS tok, count(*) AS c
      FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents)
      GROUP BY 1, 2
    )
    SELECT doc_id,
           round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) AS token_entropy,
           round(CAST(count(*) AS DOUBLE) / sum(c), 4) AS type_token_ratio
    FROM tf GROUP BY doc_id
    """,
)
def q_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution quality signals per doc: Shannon entropy of the
    token frequency distribution (H = log2(n) − Σc·log2(c)/n — low
    entropy ⇒ repetitive/templated text) and type-token ratio. Two
    map-side-combinable hash aggs (doc,tok) → (doc); no joins, no
    windows — the shape that survives any corpus size.
    """
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c")
    return tf.groupBy("doc_id").agg(
        F.round(
            F.log2(n) - F.sum(F.col("c") * F.log2("c")) / n, 4
        ).alias("token_entropy"),
        F.round(F.count(F.lit(1)).cast("double") / n, 4).alias("type_token_ratio"),
    )


BM25_TERMS = ("join", "scan", "filter")
BM25_K1, BM25_B = 1.2, 0.75
BM25_TOP = 20


def bm25_scores(d: DataFrame, terms, qt: DataFrame | None = None) -> DataFrame:
    """The ONE BM25 scoring pipeline, shared by q_text_bm25 and
    q_e2e_hybrid_search so the two can't silently diverge (r6 review
    finding: constants were shared but the scoring plan was rebuilt
    inline in both files).

    Input: documents frame ``d`` (doc_id, text) and the lexical term
    list; optionally a (q_id, term) mapping ``qt`` for multi-query
    scoring. Output: one row per doc_id (or per (q_id, doc_id) when
    ``qt`` is given) with the summed BM25 score rounded 4dp.

    Scale shape (unchanged from both call sites): the term IN-filter
    prunes the token stream BEFORE the explode output shuffles; document
    frequencies, the query-term mapping, and the 1-row (N, avgdl) corpus
    stats are tiny → broadcast; the heavy side shuffles once into the
    final hash agg. The ln() idf is libm → rounded on both engines
    (SURVEY.md §7 R2)."""
    # r13 (guide §2.3/§2.4): dl rides THROUGH the tf aggregation (it is
    # constant per doc), so the per-doc length table no longer joins
    # back onto the scored stream — that join re-scanned and shuffled
    # the whole corpus' (doc_id, dl) at scale for rows the IN-filter
    # had already pruned to the query-term docs. One corpus tokenize
    # feeds tf; the 1-row stats agg keeps its own column-pruned scan.
    # fan_out: single-row-group fixture scans plan one task (no-op on
    # real multi-split inputs); hashing by doc_id lets the tf groupBy
    # and the (q_id, doc_id)-keyed final agg reuse the same exchange.
    base = fan_out(d, "doc_id").withColumn("_toks", F.split("text", " "))
    tf = (
        base.select(
            "doc_id", F.size("_toks").alias("dl"), F.explode("_toks").alias("term")
        )
        .where(F.col("term").isin(*list(terms)))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(F.split("text", " "))).alias("avgdl"),
    )
    idf = F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + BM25_K1 * (
        1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    term_score = idf * F.col("tf") * (BM25_K1 + 1) / denom
    scored, keys = tf, ["doc_id"]
    if qt is not None:
        scored, keys = tf.join(F.broadcast(qt), "term"), ["q_id", "doc_id"]
    return (
        scored.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(*keys)
        .agg(F.round(F.sum(term_score), 4).alias("bm25"))
    )


def bm25_oracle_ctes(term_pred: str, select_keys: str = "tf.doc_id AS doc_id",
                     group_by: str = "tf.doc_id", extra_joins: str = "") -> str:
    """The matching DuckDB CTE block (ends with a ``bm25_scored`` CTE),
    shared by the same two oracles. Emitted WITHOUT a leading WITH so
    callers can prepend their own CTEs."""
    return f"""docs AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM docs),
    tf AS (
      SELECT doc_id, t AS term, count(*) AS tf
      FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents)
      WHERE {term_pred}
      GROUP BY 1, 2),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    bm25_scored AS (
      SELECT {select_keys}, round(sum(
               ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * ({BM25_K1} + 1)
               / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * docs.dl / stats.avgdl))
             ), 4) AS bm25
      FROM tf
      {extra_joins}
      JOIN df ON df.term = tf.term
      JOIN docs ON docs.doc_id = tf.doc_id
      CROSS JOIN stats
      GROUP BY {group_by})"""


@query(
    "q_text_bm25",
    oracle=f"""
    WITH {bm25_oracle_ctes(
        "t IN ('" + "', '".join(BM25_TERMS) + "')"
    )}
    SELECT doc_id, bm25 FROM bm25_scored
    ORDER BY bm25 DESC, doc_id
    LIMIT {BM25_TOP}
    """,
)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring for a fixed query ({', '.join(BM25_TERMS)}):
    the classic probabilistic ranking, top-{BM25_TOP} docs.

    Scale shape mirrors tf-idf: term frequencies are one hash agg over
    the term-filtered token stream (the IN filter prunes before the
    explode output shuffles); document frequencies and the (N, avgdl)
    corpus stats are tiny — broadcast back; final top-k is
    TakeOrderedAndProject. The ln() idf is libm — score rounded 4dp on
    both engines (SURVEY.md §7 R2). Scoring pipeline: bm25_scores()
    (shared with q_e2e_hybrid_search)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        bm25_scores(d, BM25_TERMS)
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(BM25_TOP)
    )


COOCCUR_MIN_PAIRS = 5


@query(
    "q_text_cooccur",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents),
    cx AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    cxy AS (
      SELECT a.tok AS t1, b.tok AS t2, count(*) AS c_xy
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY 1, 2
      HAVING count(*) >= {COOCCUR_MIN_PAIRS}),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT t1, t2, c_xy,
           round(ln(c_xy * n.n_docs / (x.c * y.c)), 6) AS pmi
    FROM cxy
    CROSS JOIN n
    JOIN cx x ON x.tok = cxy.t1
    JOIN cx y ON y.tok = cxy.t2
    """,
)
def q_text_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level co-occurrence with PMI scoring (the collocation /
    embedding-prep statistic: which token pairs appear together more
    than chance).

    Scale shape: pairs are generated INSIDE each document from its
    sorted distinct-token array (an indexed transform over the array —
    narrow, no self-join shuffle; the oracle's a⋈b spelling is the same
    relation), so the only shuffles are the two hash aggs; per-doc pair
    count is bounded by distinct-tokens², the document-length analogue
    of the dedup family's df-cap. Token marginals are Zipf-small →
    broadcast back; ln() is libm → PMI rounded 6dp on both engines."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.array_sort(F.array_distinct(F.split("text", " "))).alias("ts")
    )
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.flatten(
                F.transform(
                    "ts",
                    lambda x, i: F.transform(
                        F.slice(F.col("ts"), i + 2, F.size("ts") - i - 1),
                        lambda y: F.struct(x.alias("t1"), y.alias("t2")),
                    ),
                )
            )
        ).alias("p"),
    ).select("doc_id", "p.t1", "p.t2")
    cxy = (
        pairs.groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .where(F.col("c_xy") >= COOCCUR_MIN_PAIRS)
    )
    cx = (
        toks.select(F.explode("ts").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        cxy.crossJoin(F.broadcast(n))
        .join(F.broadcast(cx.withColumnRenamed("tok", "t1").withColumnRenamed("c", "cx1")), "t1")
        .join(F.broadcast(cx.withColumnRenamed("tok", "t2").withColumnRenamed("c", "cx2")), "t2")
        .select(
            "t1",
            "t2",
            "c_xy",
            F.round(
                F.log(F.col("c_xy") * F.col("n_docs") / (F.col("cx1") * F.col("cx2"))),
                6,
            ).alias("pmi"),
        )
    )


LM_SMOOTH = 0.5  # additive smoothing pseudo-count


@query(
    "q_text_lmscore",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    tf AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
    n AS (SELECT sum(c) AS total, count(*) AS vocab FROM tf),
    scored AS (
      SELECT t.doc_id,
             count(*) AS n_tokens,
             sum(ln((tf.c + {LM_SMOOTH})
                    / (n.total + {LM_SMOOTH} * n.vocab))) AS logp
      FROM tok t
      JOIN tf ON tf.tok = t.tok
      CROSS JOIN n
      GROUP BY t.doc_id)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(logp / n_tokens, 6) AS avg_logp
    FROM scored
    """,
)
def q_text_lmscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring: each document's mean token
    log-probability under the corpus's own smoothed unigram LM — the
    CCNet/KenLM-style perplexity quality filter in its simplest exact
    form (outlier docs score low; the ranking is what the filter
    thresholds).

    Scale shape: the LM "training" is one token hash agg; the model —
    (token, count) plus the (total, vocab) scalars — is Zipf-small and
    broadcasts back onto the token stream, so scoring is a narrow pass
    over the explode with one final per-doc agg. ln() is libm → the
    per-doc mean is rounded 6dp on both engines; the count sums feeding
    it are exact integers."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    n = tf.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    logp = F.log(
        (F.col("c") + LM_SMOOTH) / (F.col("total") + LM_SMOOTH * F.col("vocab"))
    )
    return (
        tok.join(F.broadcast(tf), "tok")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(logp).alias("logp_raw"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("logp_raw") / F.col("n_tokens"), 6).alias("avg_logp"),
        )
    )


# PII patterns kept to character classes both regex dialects (Java in
# Spark, RE2-ish in DuckDB) treat identically.
_PII_EMAIL_RE = r"[a-z0-9]+@[a-z0-9]+\.[a-z]+"
_PII_PHONE_RE = r"555-[0-9]{4}"


@query(
    "q_text_pii",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id, lang,
             concat(substring(text, 1, 40),
                    ' contact user', doc_id, '@', source, '.net tel 555-',
                    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                    CASE WHEN doc_id % 3 = 0
                         THEN concat(' alt x', doc_id, '@backup.org')
                         ELSE '' END) AS body
      FROM documents)
    SELECT doc_id, lang,
           CAST(len(regexp_extract_all(body, '{_PII_EMAIL_RE}')) AS INT)
             AS n_emails,
           CAST(len(regexp_extract_all(body, '{_PII_PHONE_RE}')) AS INT)
             AS n_phones,
           md5(regexp_replace(regexp_replace(body, '{_PII_EMAIL_RE}', '[EMAIL]',
                                             'g'),
                              '{_PII_PHONE_RE}', '[PHONE]', 'g')) AS scrub_md5
    FROM planted
    """,
)
def q_text_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + scrubbing: count and redact email/phone patterns per
    document — the privacy pass every training-data pipeline runs before
    release. The fixture corpus contains no PII (word-salad text,
    FIXTURES.md), so deterministic synthetic PII is PLANTED inside the
    query from doc_id/source (identically on both engines) and the
    operator under test is the detect/redact stage over it; the md5 of
    the scrubbed body proves byte-identical redaction cross-engine.

    Scale shape: pure narrow row-local string work — zero shuffles, full
    pushdown; regexes are Java-compiled per task and stream through
    whole-stage codegen, no Python in the row path."""
    d = load_table(spark, sf_dir, "documents")
    body = F.concat(
        F.substring("text", 1, 40),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@"),
        F.col("source"),
        F.lit(".net tel 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" alt x"), F.col("doc_id").cast("string"),
                F.lit("@backup.org"),
            ),
        ).otherwise(F.lit("")),
    )
    planted = d.select("doc_id", "lang", body.alias("body"))
    scrubbed = F.regexp_replace(
        F.regexp_replace("body", _PII_EMAIL_RE, "[EMAIL]"),
        _PII_PHONE_RE,
        "[PHONE]",
    )
    return planted.select(
        "doc_id",
        "lang",
        F.size(F.regexp_extract_all("body", F.lit(_PII_EMAIL_RE), F.lit(0)))
        .cast("int")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("body", F.lit(_PII_PHONE_RE), F.lit(0)))
        .cast("int")
        .alias("n_phones"),
        F.md5(scrubbed).alias("scrub_md5"),
    )


# Counter budget for the Misra-Gries partition summaries. The survival
# guarantee is for items with global frequency strictly above
# N/(MG_COUNTERS + 1); keep the +1 visible rather than folding it.
MG_COUNTERS = 4095


def _mg_summarize(batches):
    """Per-partition Misra-Gries heavy-hitter summary over the ``gram``
    column, batch-merged: add each Arrow batch's value counts, then
    compact by subtracting the (M+1)-th largest residual from every
    counter and dropping non-positives — the mergeable-summaries
    compaction, which preserves the classic MG bound (any item
    undercounted by at most n_partition/(M+1)). Python touches only
    counter-dict maintenance on vectorized per-batch value_counts; the
    raw rows never leave the JVM row-by-row."""
    import numpy as np
    import pandas as pd

    counters: dict = {}
    for pdf in batches:
        for g, c in pdf["gram"].value_counts().items():
            counters[g] = counters.get(g, 0) + int(c)
        if len(counters) > MG_COUNTERS:
            vals = np.fromiter(counters.values(), dtype=np.int64)
            cut_idx = len(vals) - MG_COUNTERS - 1
            cut = int(np.partition(vals, cut_idx)[cut_idx])
            counters = {g: c - cut for g, c in counters.items() if c > cut}
    yield pd.DataFrame({"gram": list(counters.keys())})


@query(
    "q_text_heavy_hitters",
    oracle="""
    WITH d AS (SELECT string_split(text, ' ') AS t FROM documents),
    g AS (SELECT unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                         FOR i IN range(1, len(t) - 1)]) AS gram
          FROM d),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM g)
    SELECT gram, CAST(count(*) AS BIGINT) AS freq
    FROM g GROUP BY gram
    HAVING count(*) > (SELECT n FROM tot) / 4096
    """,
)
def q_text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (token 3-grams with frequency > N/4096) found
    WITHOUT shuffling the full gram distribution: per-partition
    Misra-Gries summaries (4095 counters, mapInPandas) produce a bounded
    candidate set, then only the candidates are exactly recounted via a
    broadcast semi-join. Union-of-candidates is a guarantee, not a
    heuristic: an item with global freq > N/(M+1) must exceed
    n_p/(M+1) in at least one partition (pigeonhole), where MG's error
    bound keeps its residual positive — so no true heavy hitter can be
    missed, and the exact recount removes the false positives. The
    batch-merge compaction (subtract the (M+1)-th largest residual) is
    the mergeable-summaries formulation of the same bound.

    At 100 TB this is THE frequent-items plan: the full-cardinality
    groupBy (which the oracle runs — fine at fixture scale) would
    shuffle |distinct grams| rows, while the MG plan shuffles only
    |partitions| x 4095 candidate grams plus one broadcast-filtered
    recount of the winners; fixture trigram cardinality (~16k distinct
    vs 4095 counters) genuinely exercises eviction."""
    d = load_table(spark, sf_dir, "documents")
    # NOTE (r13): deliberately NOT fan_out-repartitioned. Measured A/B:
    # spreading the gram stream over defaultParallelism partitions made
    # the key ~15-20% SLOWER isolated — the gram explode is cheap JVM
    # codegen, while the Misra-Gries mapInPandas pays one Python-worker
    # summary per partition, so partitions multiply the Python-boundary
    # cost without relieving any bottleneck (guide §4: control how often
    # data crosses the boundary).
    grams = persist_tracked(
        d.select(F.split("text", " ").alias("toks"))
        .select(F.explode(F.expr(ngram_expr("toks", 3))).alias("gram"))
    )
    candidates = grams.mapInPandas(_mg_summarize, "gram string").distinct()
    total = grams.agg(F.count(F.lit(1)).cast("double").alias("n"))
    return (
        grams.join(F.broadcast(candidates), "gram")
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .crossJoin(F.broadcast(total))
        .where(F.col("freq") > F.col("n") / (MG_COUNTERS + 1))
        .select("gram", "freq")
    )


BPE_MERGES = 8


def _bpe_adjacent_pairs(col: str) -> str:
    """SQL expr: adjacent symbol pairs of array column ``col`` (guarded:
    sequence(1, 0) is DESCENDING on Spark — see textutil.ngram_expr)."""
    return (
        f"if(size({col}) >= 2, "
        f"transform(sequence(1, size({col}) - 1), "
        f"i -> named_struct('a', element_at({col}, i), "
        f"'b', element_at({col}, i + 1))), "
        f"array())"
    )


def _bpe_apply_merge(col: str, a: str, b: str) -> str:
    """SQL expr: greedy leftmost, non-overlapping merge of adjacent
    (a, b) symbol occurrences in array column ``col`` — a left fold with
    a one-symbol lookbehind carried in the accumulator ('' sentinel:
    real symbols are never empty)."""
    qa, qb = a.replace("'", "''"), b.replace("'", "''")
    qab = (a + b).replace("'", "''")
    return (
        f"aggregate({col}, "
        f"named_struct('out', cast(array() as array<string>), 'prev', ''), "
        f"(acc, x) -> if(acc.prev = '{qa}' AND x = '{qb}', "
        f"named_struct('out', array_append(acc.out, '{qab}'), 'prev', ''), "
        f"if(acc.prev = '', named_struct('out', acc.out, 'prev', x), "
        f"named_struct('out', array_append(acc.out, acc.prev), 'prev', x))), "
        f"acc -> if(acc.prev = '', acc.out, array_append(acc.out, acc.prev)))"
    )


def _bpe_oracle() -> str:
    """DuckDB replay of the BPE trainer: the BPE_MERGES-deep iterated
    argmax unrolls into chained CTE stages (one per merge — the
    q_sim_mmr_rerank trajectory-replay idiom), and the greedy leftmost
    non-overlapping merge rewrite is expressed positionally: occurrence
    positions of the best pair, split into islands of consecutive
    positions, keep even offsets within each island (provably equal to
    the engine's one-pass lookbehind fold — both implement leftmost
    non-overlapping), then rebuild each symbol list dropping the
    consumed right-halves. All-integer/string ops, so the full merge
    table hash-matches."""
    stages = ["""
    s0 AS (
      SELECT CAST(count(*) AS BIGINT) AS freq, string_split(word, '') AS syms
      FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
      WHERE word != '' GROUP BY word)"""]
    for k in range(BPE_MERGES):
        stages.append(f"""
    p{k} AS (
      SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
      FROM s{k}, UNNEST(range(1, len(syms))) AS u(i)
      GROUP BY 1, 2),
    best{k} AS (
      SELECT a, b, a || b AS ab, cnt FROM p{k}
      ORDER BY cnt DESC, a, b LIMIT 1),
    r{k} AS (
      SELECT syms, freq, ab,
             list_filter(range(1, len(syms)),
                         i -> syms[i] = a AND syms[i+1] = b) AS occ
      FROM s{k} CROSS JOIN best{k}),
    k{k} AS (
      SELECT syms, freq, ab,
             [occ[t] FOR t IN range(1, len(occ) + 1)
              IF (occ[t] - occ[list_max(
                    list_filter(range(1, len(occ) + 1),
                                u -> u <= t AND (u = 1 OR occ[u] > occ[u-1] + 1)))])
                 % 2 = 0] AS kept
      FROM r{k}),
    s{k + 1} AS (
      SELECT freq,
             list_transform(
               list_filter(range(1, len(syms) + 1),
                           j -> NOT list_contains(
                                  list_transform(kept, x -> x + 1), j)),
               j -> CASE WHEN list_contains(kept, j) THEN ab
                         ELSE syms[j] END) AS syms
      FROM k{k})""")
    merges = "\n    UNION ALL ".join(
        f"SELECT CAST({k + 1} AS INT) AS merge_rank, a AS pair_a,"
        f" b AS pair_b, ab AS merged, cnt AS pair_count FROM best{k}"
        for k in range(BPE_MERGES)
    )
    return "WITH" + ",".join(stages) + "\n    " + merges


@query("q_text_bpe", oracle=_bpe_oracle())
def q_text_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-Pair-Encoding vocabulary learning — the first BPE_MERGES
    merge rules of a tokenizer trained on the corpus, computed
    distributed: the classic GPT-2/SentencePiece recipe of (1) collapse
    the corpus to a (word, freq) table — the ONLY pass over raw text —
    then (2) iterate: count adjacent symbol pairs weighted by word freq,
    take the argmax (ties broken count desc, then pair lexicographic so
    the result is engine-independent), rewrite symbol arrays with a
    greedy leftmost non-overlapping fold, repeat. Returns one row per
    merge rule: (merge_rank, pair_a, pair_b, merged, pair_count).

    SQL-oracled as of r5 (was rows-only): the iteration unrolls into
    chained CTEs and the greedy fold is replayed positionally — see
    _bpe_oracle. Correctness is additionally gated in pytest by an EXACT
    match against a pure-Python reference BPE run on the same
    word-frequency dict (tests/test_properties.py).

    Scale shape: raw text is touched once (hash agg to |vocab| rows —
    the same dedup-to-frequency-table trick every tokenizer trainer
    uses; at 100 TB the vocab table is millions of rows, not terabytes).
    Each iteration is one map-side-combinable pair-count agg over the
    vocab table plus a 1-ROW driver collect (the argmax — the k-means
    centroid-collect precedent), and the merge rewrite is a codegen'd
    higher-order fold, zero shuffle. Iteration state is re-persisted,
    materialized, and the previous step unpersisted IN the loop, so the
    cache footprint stays one symbol table regardless of merge count
    (plan depth grows linearly but BPE_MERGES is a small constant)."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    syms = persist_tracked(
        words.select("freq", F.split("word", "").alias("syms"))
    )
    merges = []
    for rank in range(1, BPE_MERGES + 1):
        pairs = syms.select(
            "freq", F.explode(F.expr(_bpe_adjacent_pairs("syms"))).alias("p")
        )
        best = (
            pairs.groupBy("p")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("p.a").asc(), F.col("p.b").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["p"]["a"], best[0]["p"]["b"], int(best[0]["cnt"])
        merges.append((rank, a, b, a + b, cnt))
        prev = syms
        syms = persist_tracked(
            syms.select("freq", F.expr(_bpe_apply_merge("syms", a, b)).alias("syms"))
        )
        # materialize the new symbol table from the still-pinned prev,
        # then release prev NOW (r9 review: without this every
        # iteration's frame stayed pinned until the next query —
        # BPE_MERGES+1 cached copies, not the docstring's O(1)).
        # unpersist is idempotent, so the registry's end-of-query
        # release_tracked sweep stays safe.
        syms.count()
        prev.unpersist()
    return spark.createDataFrame(
        merges, "merge_rank INT, pair_a STRING, pair_b STRING, "
                "merged STRING, pair_count LONG"
    )


CM_W = 1024   # count-min width (columns per hash row)
CM_D = 4      # count-min depth (hash rows)
CM_MULTS = (31, 37, 41, 43)   # per-row positional-hash multipliers
CM_PROBES = 25                # point-queried grams (exact top-25)


def _cm_hash_sql_duck(m: int) -> str:
    """DuckDB: positional weighted hash of gram → column in [0, CM_W)."""
    return (
        f"list_sum([ascii(gc[j]) * (((j * {m} + 13) % 251) + 1) "
        f"FOR j IN range(1, len(gc) + 1)]) % {CM_W}"
    )


def _cm_hash_spark(m: int):
    """Spark: the IDENTICAL positional weighted hash (gc = char array)."""
    return F.expr(
        f"aggregate(transform(sequence(1, size(gc)), "
        f"j -> ascii(element_at(gc, j)) * (((j * {m} + 13) % 251) + 1)), "
        f"0L, (acc, x) -> acc + x) % {CM_W}"
    )


@query(
    "q_agg_countmin",
    oracle=f"""
    WITH d AS (SELECT string_split(text, ' ') AS t FROM documents),
    g AS (SELECT unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                         FOR i IN range(1, len(t) - 1)]) AS gram
          FROM d),
    freq AS (SELECT gram, CAST(count(*) AS BIGINT) AS freq
             FROM g GROUP BY gram),
    chars AS (SELECT gram, freq, string_split(gram, '') AS gc FROM freq),
    cells AS (  -- sketch build: d hash rows per distinct gram
      SELECT r.i AS row_i,
             CASE r.i {' '.join(f"WHEN {i} THEN ({_cm_hash_sql_duck(m)})" for i, m in enumerate(CM_MULTS))} END AS col,
             sum(freq) AS cnt
      FROM chars CROSS JOIN range(0, {CM_D}) AS r(i)
      GROUP BY 1, 2),
    probes AS (
      SELECT gram, freq, string_split(gram, '') AS gc
      FROM freq ORDER BY freq DESC, gram LIMIT {CM_PROBES}),
    probe_cells AS (
      SELECT p.gram, p.freq, r.i AS row_i,
             CASE r.i {' '.join(f"WHEN {i} THEN ({_cm_hash_sql_duck(m)})" for i, m in enumerate(CM_MULTS))} END AS col
      FROM probes p CROSS JOIN range(0, {CM_D}) AS r(i))
    SELECT p.gram, p.freq AS true_freq,
           CAST(min(c.cnt) AS BIGINT) AS cm_est,
           CAST(min(c.cnt) - p.freq AS BIGINT) AS overestimate
    FROM probe_cells p JOIN cells c
      ON c.row_i = p.row_i AND c.col = p.col
    GROUP BY p.gram, p.freq
    """,
)
def q_agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch, built and queried entirely as DataFrame ops: the
    corpus trigram distribution is compressed into a CM_D×CM_W counter
    grid (positional-weighted char hashes — engine-neutral integer
    arithmetic, no engine hash builtins), then the exact top-CM_PROBES
    grams are point-queried: est = min over rows of their cell counts.
    The CM guarantee (est ≥ true, est ≤ true + εN w.h.p.) is visible in
    the emitted overestimate column, which the oracle reproduces exactly
    — a deterministic sketch is a queryable artifact, not a black box.

    Scale shape: the sketch build is one hash agg to at most CM_D×CM_W
    cells (CONSTANT size regardless of corpus — the point of CM; cell
    partials merge by addition, so this is exactly the mergeable-summary
    shuffle of q_agg_sketch_merge but with a provable point-query error
    bound). Probing joins CM_D rows per probe against the constant-size
    cell table. The distinct-gram pre-agg reuses the q_text_ngram
    explode."""
    d = load_table(spark, sf_dir, "documents")
    freq = persist_tracked(
        d.select(F.split("text", " ").alias("toks"))
        .select(F.explode(F.expr(ngram_expr("toks", 3))).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    chars = freq.withColumn("gc", F.split("gram", ""))
    row_i = F.explode(F.sequence(F.lit(0), F.lit(CM_D - 1))).alias("row_i")
    col = F.col("row_i")
    col_expr = None
    for i, m in enumerate(CM_MULTS):
        cur = _cm_hash_spark(m)
        col_expr = F.when(col == i, cur) if col_expr is None else col_expr.when(col == i, cur)
    cells = (
        chars.select("gc", "freq", row_i)
        .select("freq", "row_i", col_expr.alias("col"))
        .groupBy("row_i", "col")
        .agg(F.sum("freq").alias("cnt"))
    )
    probes = (
        freq.orderBy(F.col("freq").desc(), F.col("gram"))
        .limit(CM_PROBES)
        .withColumn("gc", F.split("gram", ""))
        .select("gram", "freq", "gc", row_i)
        .select("gram", "freq", "row_i", col_expr.alias("col"))
    )
    return (
        probes.join(F.broadcast(cells), ["row_i", "col"])
        .groupBy("gram", F.col("freq").alias("true_freq"))
        .agg(F.min("cnt").alias("cm_est"))
        .select(
            "gram",
            "true_freq",
            "cm_est",
            (F.col("cm_est") - F.col("true_freq")).alias("overestimate"),
        )
    )


BIGRAM_K = 0.5  # add-k smoothing constant


@query(
    "q_text_bigram_lm",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bg AS (
      SELECT doc_id,
             unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS b
      FROM tok),
    bc AS (SELECT b, CAST(count(*) AS BIGINT) AS cb FROM bg GROUP BY b),
    ug AS (SELECT unnest(t) AS w FROM tok),
    uc AS (SELECT w, CAST(count(*) AS BIGINT) AS cw FROM ug GROUP BY w),
    vocab AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uc)
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((bc.cb + {BIGRAM_K})
                        / (uc.cw + {BIGRAM_K} * (SELECT v FROM vocab)))), 6)
               AS mean_logprob
    FROM bg g
    JOIN bc ON bc.b = g.b
    JOIN uc ON uc.w = string_split(g.b, ' ')[1]
    GROUP BY g.doc_id
    """,
)
def q_text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring with add-k smoothing: each doc's
    mean log P(w_i | w_{{i-1}}) where P(w|p) = (c(p,w)+k)/(c(p)+k·V) —
    the conditional upgrade of q_text_lmscore's unigram CCNet-style
    filter (a doc of common words in IMPROBABLE orders now scores low,
    which unigram scoring cannot see). c(p) is the corpus unigram count
    of the prefix and V the vocabulary size, the textbook smoothed-MLE
    definition.

    Scale shape: bigram and unigram count tables are Zipf-small and
    broadcast into the scoring joins (the q_text_tfidf pattern); the
    per-doc aggregate rides one hash shuffle on doc_id. The log is the
    only libm call and sits inside an avg that both engines round once.
    """
    d = load_table(spark, sf_dir, "documents")
    bg = persist_tracked(
        d.select("doc_id", F.split("text", " ").alias("toks"))
        .select("doc_id", F.explode(F.expr(ngram_expr("toks", 2))).alias("b"))
    )
    bc = bg.groupBy("b").agg(F.count(F.lit(1)).alias("cb"))
    ug = d.select(F.explode(F.split("text", " ")).alias("w"))
    uc = persist_tracked(ug.groupBy("w").agg(F.count(F.lit(1)).alias("cw")))
    vocab = uc.agg(F.count(F.lit(1)).cast("double").alias("v"))
    scored = (
        bg.join(F.broadcast(bc), "b")
        .withColumn("w", F.split(F.col("b"), " ")[0])
        .join(F.broadcast(uc), "w")
        .crossJoin(F.broadcast(vocab))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.avg(
                F.log(
                    (F.col("cb") + BIGRAM_K)
                    / (F.col("cw") + BIGRAM_K * F.col("v"))
                )
            ),
            6,
        ).alias("mean_logprob"),
    )


# Literal BPE merge table for q_text_bpe_encode (named distinctly from
# the trainer's BPE_MERGES merge-count above) — the production shape:
# the tokenizer is trained offline (q_text_bpe IS that trainer) and the
# merge rules ship with the job as constants. Applied in rule order; each
# rule runs two leftmost-non-overlapping replace passes (pass 2 catches
# the boundary-space consumed by pass 1 between adjacent matches) — both
# engines' replace() share scan-resume-after-replacement semantics, so
# even that detail is engine-identical.
BPE_MERGE_TABLE = (
    ("t", "h"), ("th", "e"), ("e", "r"), ("o", "r"), ("o", "w"),
    ("i", "n"), ("s", "t"), ("a", "r"), ("l", "e"), ("t", "a"),
)


def _bpe_apply(inner: str) -> str:
    """Chained replace() applying BPE_MERGE_TABLE to a space-separated symbol
    string (same text valid in Spark SQL and DuckDB)."""
    expr = inner
    for x, y in BPE_MERGE_TABLE:
        for _ in range(2):
            expr = f"replace({expr}, ' {x} {y} ', ' {x}{y} ')"
    return expr


_BPE_WORD_SPARK = _bpe_apply("concat(' ', regexp_replace(w, '(.)', '$1 '))")
_BPE_WORD_DUCK = _bpe_apply(r"' ' || regexp_replace(w, '(.)', '\1 ', 'g')")


@query(
    "q_text_bpe_encode",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(list_sum(list_transform(string_split(text, ' '),
                w -> len(string_split(trim({_BPE_WORD_DUCK}), ' '))))
               AS BIGINT) AS n_bpe_tokens,
           round(CAST(list_sum(list_transform(string_split(text, ' '),
                     w -> len(string_split(trim({_BPE_WORD_DUCK}), ' '))))
                     AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS tokens_per_word,
           md5(array_to_string(list_transform(string_split(text, ' '),
               w -> trim({_BPE_WORD_DUCK})), ' | ')) AS encoded_md5
    FROM documents
    """,
)
def q_text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION at corpus scale: every word is split to
    characters and the literal BPE_MERGE_TABLE (trained offline — see
    q_text_bpe, the trainer) is applied as a chain of codegen'd replace
    passes, exactly how a shipped tokenizer runs inside an ingest job.
    Emits per-doc BPE token counts, tokens-per-word (the fertility metric
    that decides context-window budgeting), and an md5 of the full encoded
    symbol sequence — the encoding itself is hash-verified byte-for-byte
    against the oracle, not just counted.

    Scale shape: the replace chain runs once per DISTINCT word (natural
    language is Zipf — the codebook is tiny relative to the corpus), the
    resulting word→encoding codebook is broadcast as one map row, and the
    document pass is a zero-shuffle map-lookup that fuses into
    WholeStageCodegen — the memoized-tokenizer pattern (10× faster here
    than encoding every occurrence; measured in bench r3_ops). A real
    32k-merge vocabulary with unbounded long tail would cap the codebook
    at the hot vocabulary and fall back to inline encoding for misses,
    but the dataflow is identical."""
    # fan_out: both the vocab tokenize (map side of the distinct) and
    # the final per-doc encode/md5 pass below otherwise run as a single
    # task over the one-row-group fixture scan
    d = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .distinct()
        .select(
            "w",
            F.expr(f"trim({_BPE_WORD_SPARK})").alias("enc"),
        )
    )
    codebook = vocab.groupBy().agg(
        F.map_from_entries(F.collect_list(F.struct("w", "enc"))).alias("cb")
    )
    enc_w = "element_at(cb, w)"
    per_word_tokens = (
        f"aggregate(transform(split(text, ' '), "
        f"w -> size(split({enc_w}, ' '))), 0, (a, x) -> a + x)"
    )
    encoded = f"array_join(transform(split(text, ' '), w -> {enc_w}), ' | ')"
    return d.crossJoin(F.broadcast(codebook)).select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_words"),
        F.expr(per_word_tokens).cast("long").alias("n_bpe_tokens"),
        F.round(
            F.expr(per_word_tokens).cast("double")
            / F.size(F.split("text", " ")),
            4,
        ).alias("tokens_per_word"),
        F.md5(F.expr(encoded)).alias("encoded_md5"),
    )


READ_WPS = 15        # pseudo-sentence length: the synthetic corpus has no
# sentence punctuation, so sentences fall back to ceil-free words div 15
READ_VOWELS = "[aeiouy]+"   # vowel-group run == syllable heuristic
READ_COMPLEX = 3     # words with >= this many vowel groups are "complex"


@query(
    "q_text_readability",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
             CAST(len(regexp_extract_all(text, '{READ_VOWELS}')) AS BIGINT)
               AS syllables,
             CAST(len(list_filter(string_split(text, ' '),
                        w -> len(regexp_extract_all(w, '{READ_VOWELS}'))
                             >= {READ_COMPLEX})) AS BIGINT) AS complex_words
      FROM documents),
    s AS (
      SELECT *, greatest(words // {READ_WPS}, 1) AS sentences,
             206.835 - 1.015 * (words / CAST(greatest(words // {READ_WPS}, 1)
                                             AS DOUBLE))
                     - 84.6 * (syllables / CAST(words AS DOUBLE)) AS flesch
      FROM t)
    SELECT doc_id, lang, words, syllables, complex_words,
           round(flesch, 4) AS flesch,
           round(0.4 * (words / CAST(sentences AS DOUBLE)
                        + 100 * (complex_words / CAST(words AS DOUBLE))), 4)
             AS fog,
           CASE WHEN flesch >= 60 THEN 'easy'
                WHEN flesch >= 30 THEN 'medium'
                ELSE 'hard' END AS band
    FROM s
    """,
)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability scoring per document — the classic prose-quality
    signals (Flesch reading ease, Gunning-fog) from integer counts:
    words, vowel-group syllables, complex words (>= {READ_COMPLEX}
    vowel groups). The synthetic corpus carries no sentence punctuation,
    so sentence count falls back to words div {READ_WPS} pseudo-
    sentences (documented heuristic; swap in a [.!?] splitter on real
    prose).

    Scale shape: a pure per-row map — tokenize + two regexp passes, all
    inside whole-stage codegen, ZERO shuffles, no explode. Both scores
    are fixed arithmetic trees over exact per-row integers (never a sum
    of doubles), so values and the CASE band are bit-deterministic on
    both engines before display rounding."""
    d = load_table(spark, sf_dir, "documents")
    words = F.size(_tokens()).cast("long")
    syll = F.size(F.expr(f"regexp_extract_all(text, '{READ_VOWELS}', 0)")).cast(
        "long"
    )
    cplx = F.size(
        F.filter(
            _tokens(),
            lambda w: F.size(
                F.regexp_extract_all(w, F.lit(READ_VOWELS), F.lit(0))
            )
            >= READ_COMPLEX,
        )
    ).cast("long")
    t = d.select(
        "doc_id",
        "lang",
        words.alias("words"),
        syll.alias("syllables"),
        cplx.alias("complex_words"),
    )
    sent = F.greatest(F.expr(f"words div {READ_WPS}"), F.lit(1))
    flesch = (
        F.lit(206.835)
        - 1.015 * (F.col("words") / sent.cast("double"))
        - 84.6 * (F.col("syllables") / F.col("words").cast("double"))
    )
    fog = 0.4 * (
        F.col("words") / sent.cast("double")
        + 100 * (F.col("complex_words") / F.col("words").cast("double"))
    )
    return t.select(
        "doc_id",
        "lang",
        "words",
        "syllables",
        "complex_words",
        F.round(flesch, 4).alias("flesch"),
        F.round(fog, 4).alias("fog"),
        F.when(flesch >= 60, "easy")
        .when(flesch >= 30, "medium")
        .otherwise("hard")
        .alias("band"),
    )
