"""Scalar function families (SURVEY.md §2B "Scalar function families").

One representative query per family, each exercising the whole family in a
single projection. All functions are JVM built-ins (whole-stage codegen;
no Python in the row path). Cross-engine gotchas handled here:

- double→int casts TRUNCATE in Spark but ROUND in DuckDB → use explicit
  floor() on both sides;
- libm-dependent functions (pow/ln/log10) can differ in the last ulp →
  rounded to 6dp on both sides;
- DuckDB's split/element syntax differs (string_split + [i]) but the
  semantics align with Spark's split + getItem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.catalog import load_table
from kafka_hadoop_consumer_spark.queries.registry import query


@query(
    "q_fn_string",
    oracle="""
    SELECT c_custkey,
           concat(upper(c_mktsegment), ':', lower(c_name)) AS tag,
           substring(c_name, 1, 8) AS head8,
           length(c_name) AS name_len,
           trim(lpad(c_mktsegment, 12, ' ')) AS padded_trimmed,
           string_split(c_name, '#')[2] AS cust_num,
           regexp_extract(c_name, '([0-9]+)$', 1) AS digits,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
           (c_mktsegment LIKE 'B%') AS is_b_segment
    FROM customer
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: concat/substring/upper/lower/trim/lpad/split/regexp/like/length."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(F.upper("c_mktsegment"), F.lit(":"), F.lower("c_name")).alias("tag"),
        F.substring("c_name", 1, 8).alias("head8"),
        F.length("c_name").cast("long").alias("name_len"),
        F.trim(F.lpad("c_mktsegment", 12, " ")).alias("padded_trimmed"),
        F.split("c_name", "#").getItem(1).alias("cust_num"),
        F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("digits"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("masked"),
        F.col("c_mktsegment").like("B%").alias("is_b_segment"),
    )


@query(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mth,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT) AS days_to_2002,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           strftime(make_date(CAST(year(o_orderdate) AS INT), 1, 1), '%Y-%m-%d') AS year_start
    FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract, trunc, add, diff, epoch, make_date.

    Dates are emitted as formatted strings so both engines hash identical
    canonical values (fixtures are timestamp_ntz; session tz pinned UTC).
    DuckDB dayofweek: Sunday=0 vs Spark Sunday=1 → aligned with +1 shift...
    actually emitted via ISO day-of-week on both sides.
    """
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("int").alias("yr"),
        F.month(d).cast("int").alias("mth"),
        F.dayofmonth(d).cast("int").alias("dom"),
        F.dayofweek(d).cast("int").alias("dow"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("plus30"),
        F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date")).cast("int").alias("days_to_2002"),
        F.unix_timestamp(d).cast("long").alias("epoch_s"),
        F.date_format(F.make_date(F.year(d), F.lit(1), F.lit(1)), "yyyy-MM-dd").alias("year_start"),
    )


@query(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS price_r1,
           floor(l_extendedprice) AS price_floor,
           ceil(l_extendedprice) AS price_ceil,
           abs(l_discount - 0.05) AS disc_dev,
           round(pow(l_quantity, 2.0), 6) AS qty_sq,
           sqrt(l_extendedprice) AS price_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(log10(l_extendedprice), 6) AS price_log10,
           CAST((l_orderkey % 7 + 7) % 7 AS BIGINT) AS key_mod7,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           greatest(l_quantity, l_discount * 100.0) AS g,
           least(l_quantity, l_discount * 100.0) AS l
    FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round/floor/ceil/abs/pow/sqrt/ln/log10/pmod/sign/greatest/least.

    pow/ln/log10 are libm-dependent (JVM vs C++ last-ulp drift) → rounded
    to 6dp both sides; sqrt is IEEE-correctly-rounded → exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(price, 1).alias("price_r1"),
        F.floor(price).cast("double").alias("price_floor"),
        F.ceil(price).cast("double").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.pow("l_quantity", F.lit(2.0)), 6).alias("qty_sq"),
        F.sqrt(price).alias("price_sqrt"),
        F.round(F.log(price), 6).alias("price_ln"),
        F.round(F.log10(price), 6).alias("price_log10"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100.0).alias("g"),
        F.least(F.col("l_quantity"), F.col("l_discount") * 100.0).alias("l"),
    )


@query(
    "q_fn_cond_cast",
    oracle="""
    SELECT o_orderkey,
           coalesce(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_or_default,
           (NULLIF(o_orderstatus, 'O') IS NULL) AS is_open,
           CASE WHEN o_totalprice >= 100000 THEN 'high'
                WHEN o_totalprice >= 10000 THEN 'mid'
                ELSE 'low' END AS price_band,
           CAST(floor(o_totalprice) AS BIGINT) AS price_int,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(o_totalprice > 50000 AS INT) AS is_big_int,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date_str
    FROM orders
    """,
)
def q_fn_cond_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional + cast family: coalesce/nullif/isnull/CASE and casts
    across int/double/string/timestamp.

    double→int cast intentionally goes through floor(): Spark truncates,
    DuckDB rounds — floor pins one semantics on both engines.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias("status_or_default"),
        F.isnull(F.nullif(F.col("o_orderstatus"), F.lit("O"))).alias("is_open"),
        F.when(F.col("o_totalprice") >= 100000, "high")
        .when(F.col("o_totalprice") >= 10000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.floor(F.col("o_totalprice")).cast("long").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        (F.col("o_totalprice") > 50000).cast("int").alias("is_big_int"),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("order_date_str"),
    )


@query(
    "q_fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS n_dims,
           embedding[1] AS first_val,
           list_max(embedding) AS max_val,
           list_min(embedding) AS min_val,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           round(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)), 4) AS dot_self,
           round(list_sum(list_slice(embedding::DOUBLE[], 1, 8)), 4) AS head8_sum
    FROM embeddings
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order functions: size/element_at/min/max,
    filter, transform, slice, aggregate — on the 64-dim embedding column.

    The self-dot-product is the building block of q_sim_cosine_topk;
    accumulation is in double on both sides (float32 inputs upcast first).
    """
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    embd = F.transform(emb, lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(emb).cast("int").alias("n_dims"),
        F.element_at(emb, 1).alias("first_val"),
        F.array_max(emb).alias("max_val"),
        F.array_min(emb).alias("min_val"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("int").alias("n_pos"),
        F.round(
            F.aggregate(embd, F.lit(0.0), lambda acc, x: acc + x * x), 4
        ).alias("dot_self"),
        F.round(
            F.aggregate(F.slice(embd, 1, 8), F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("head8_sum"),
    )


@query(
    "q_fn_map",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k_val,
           array_to_string(json_keys(props), ',') AS keys_csv,
           CAST(len(json_keys(props)) AS INT) AS n_keys
    FROM events
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: from_json→map, element_at, map_keys, size — over the
    JSON `events.props` column."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        # try_element_at: ANSI element_at ABORTS on a missing map key,
        # but the oracle's json_extract pins NULL — and nothing
        # guarantees every props row carries 'k' beyond this fixture
        # (r9 review; the q_fn_try line-403 precedent)
        F.try_element_at(m, F.lit("k")).alias("k_val"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
    )


@query(
    "q_fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS INT) AS k_int,
           CAST(json_extract(props, '$.k') IS NOT NULL AS VARCHAR) AS has_k,
           CASE WHEN json_extract(props, '$.k') IS NOT NULL
                THEN concat('{"k2":',
                            CAST(CAST(json_extract(props, '$.k') AS INT) * 2
                                 AS VARCHAR), '}')
           END AS rebuilt
    FROM events
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: get_json_object / from_json / to_json on events.props.

    The rebuilt column exercises to_json(struct): Spark emits compact
    {"k2":N}; the oracle constructs the same canonical text.
    """
    e = load_table(spark, sf_dir, "events")
    k_int = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        k_int.alias("k_int"),
        F.get_json_object("props", "$.k").isNotNull().cast("string").alias("has_k"),
        # NULL when k is absent, pinned on BOTH sides: Spark's to_json
        # would emit '{}' (ignoreNullFields) while DuckDB's concat
        # skips NULL args and emits '{"k2":}' — two different strings
        # for the same missing key (r9 review)
        F.when(
            k_int.isNotNull(), F.to_json(F.struct((k_int * 2).alias("k2")))
        ).alias("rebuilt"),
    )


@query(
    "q_fn_url",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             concat('https://', source, '.example.com/docs/', doc_id,
                    '?lang=', lang, '&v=2') AS url
      FROM documents)
    SELECT doc_id, url,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
           regexp_extract(regexp_extract(url, '^[a-z]+://([^/]+)/', 1),
                          '([^.]+\\.[^.]+)$', 1) AS reg_domain
    FROM u
    """,
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family: protocol/host/path/query extraction, query-
    parameter lookup, and registered-domain derivation (last two host
    labels) — the normalization pass before URL-keyed dedup or per-domain
    quota sampling in a crawl pipeline. The fixture corpus has no URL
    column, so a deterministic synthetic URL is derived per document
    first.

    Spark side uses the native parse_url (codegen'd) for
    proto/host/path/query and parameter lookup; the oracle expresses the
    same extractions as anchored regexes (DuckDB has no parse_url).
    Registered-domain is regex on both sides (no public-suffix list
    offline; two-label fallback documented).
    """
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
        F.lit("&v=2"),
    )
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    return (
        d.select("doc_id", url.alias("url"))
        .select(
            "doc_id",
            "url",
            F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("proto"),
            host.alias("host"),
            F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
            F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
            F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
            F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1).alias("reg_domain"),
        )
    )


ZBITS = 10  # bits per dimension in the Z-order key


@query(
    "q_fn_zorder",
    oracle=f"""
    WITH d AS (
      SELECT o_orderkey,
             CAST(o_custkey % {1 << ZBITS} AS BIGINT) AS xa,
             -- floor, not bare CAST: double->int casts TRUNCATE in
             -- Spark but ROUND in DuckDB (this module's header rule) —
             -- latent only while the fixture dates are all-midnight
             CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) % {1 << ZBITS} AS ya
      FROM orders)
    SELECT o_orderkey, xa, ya,
           CAST(list_sum(list_transform(range(0, {ZBITS}),
                i -> ((xa >> i) & 1) * power(2, 2 * i)
                   + ((ya >> i) & 1) * power(2, 2 * i + 1))) AS BIGINT) AS zkey
    FROM d
    """,
)
def q_fn_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) key derivation: interleave the low {ZBITS} bits of
    two clustering dimensions (customer, order day) into one sort key —
    the multi-dimensional-locality layout trick behind Z-ordered table
    writes (sort by zkey before writing and min/max stats prune BOTH
    dimensions, not just the leading sort column).

    Pure integer bit arithmetic in one codegen'd projection (aggregate
    over a literal bit range unrolls; no shuffle, no UDF). The oracle
    computes the identical interleave with DuckDB bit ops.
    """
    o = load_table(spark, sf_dir, "orders")
    xa = (F.col("o_custkey") % (1 << ZBITS)).cast("long")
    ya = (F.unix_date(F.col("o_orderdate").cast("date")) % (1 << ZBITS)).cast("long")
    d = o.select("o_orderkey", xa.alias("xa"), ya.alias("ya"))
    from kafka_hadoop_consumer_spark.functions import zorder_key

    return d.select(
        "o_orderkey", "xa", "ya", zorder_key("xa", "ya", ZBITS).alias("zkey")
    )


@query(
    "q_fn_try",
    oracle="""
    SELECT event_id,
           CASE WHEN (event_id % 5) = 0 THEN NULL
                ELSE round(value / (event_id % 5), 6) END AS safe_div,
           TRY_CAST(CAST(user_id AS VARCHAR) || 'x' AS INTEGER) AS bad_int,
           TRY_CAST(CAST(user_id AS VARCHAR) AS INTEGER) AS good_int,
           string_split(event_type, '')[10] AS oob_char
    FROM events
    """,
)
def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family — the ``try_*`` forms that turn
    runtime errors into NULLs so one malformed row cannot kill a 100 TB
    job: try_divide (÷0 → NULL), try_cast (unparseable → NULL, parseable
    → value), and out-of-bounds element access (→ NULL). The oracle
    expresses the identical semantics through DuckDB's TRY_CAST / CASE /
    native NULL-on-OOB list indexing, pinning that "safe" means the SAME
    null-production rules on both engines, not merely "doesn't crash".

    Scale shape: pure narrow projection — zero shuffle, all codegen;
    dirty-data tolerance this way is free, unlike a Python validation
    UDF. (The streaming dead-letter test covers the complementary
    policy: route the bad row aside instead of nulling it.)"""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.round(
            F.try_divide(F.col("value"), F.col("event_id") % 5), 6
        ).alias("safe_div"),
        F.try_to_number(
            F.concat(F.col("user_id").cast("string"), F.lit("x")),
            F.lit("999999"),
        ).cast("int").alias("bad_int"),
        # try_cast like the oracle's TRY_CAST: a plain ANSI cast in the
        # error-safe family would itself abort on an out-of-int user_id
        F.col("user_id").cast("string").try_cast("int").alias("good_int"),
        F.try_element_at(F.split("event_type", ""), F.lit(10)).alias("oob_char"),
    )


@query(
    "q_fn_variant",
    oracle="""
    WITH j AS (
      SELECT event_id,
             '{"id": ' || event_id || ', "type": "' || event_type
             || '", "tags": ["t' || (event_id % 3) || '", "t'
             || (user_id % 5) || '"], "nested": {"u": ' || user_id
             || '}}' AS js
      FROM events)
    SELECT event_id,
           CAST(json_extract(js, '$.id') AS BIGINT) AS vid,
           json_extract_string(js, '$.type') AS vtype,
           CAST(json_extract(js, '$.nested.u') AS BIGINT) AS vu,
           json_extract_string(js, '$.tags[1]') AS tag2,
           CAST(json_extract(js, '$.nested.missing') AS BIGINT) AS vmissing
    FROM j
    """,
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured type (Spark 4): JSON parsed ONCE into the
    binary variant encoding, then typed path extraction
    (``try_variant_get`` with ``$.nested.u`` / array-index paths,
    missing paths → NULL) — the modern replacement for repeated
    get_json_object string re-parsing (q_fn_json documents the classic
    idiom; variant parses once and each extraction walks the binary
    form). The JSON is constructed in-query from integer/string columns
    only (planted-data precedent of q_text_pii — double-to-string
    formatting differs across engines and never enters the document);
    DuckDB mirrors with its native json_extract paths.

    Scale shape: pure narrow projection, zero shuffle; at 100 TB the
    parse-once property is the cost win when ≥2 fields are read, and
    variant columns store the binary encoding so re-reads skip parsing
    entirely."""
    e = load_table(spark, sf_dir, "events")
    js = F.concat(
        F.lit('{"id": '), F.col("event_id").cast("string"),
        F.lit(', "type": "'), F.col("event_type"),
        F.lit('", "tags": ["t'), (F.col("event_id") % 3).cast("string"),
        F.lit('", "t'), (F.col("user_id") % 5).cast("string"),
        F.lit('"], "nested": {"u": '), F.col("user_id").cast("string"),
        F.lit("}}"),
    )
    v = F.try_parse_json(js)
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.id", "long").alias("vid"),
        F.try_variant_get(v, "$.type", "string").alias("vtype"),
        F.try_variant_get(v, "$.nested.u", "long").alias("vu"),
        F.try_variant_get(v, "$.tags[1]", "string").alias("tag2"),
        F.try_variant_get(v, "$.nested.missing", "long").alias("vmissing"),
    )


@query(
    "q_fn_collation",
    oracle="""
    WITH mixed AS (
      SELECT event_type,
             CASE WHEN event_id % 2 = 1 THEN upper(event_type)
                  ELSE event_type END AS typed
      FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN typed = event_type THEN 1 ELSE 0 END)
                AS BIGINT) AS n_exact_eq,
           CAST(sum(CASE WHEN lower(typed) = lower(event_type)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_ci_eq,
           CAST(sum(CASE WHEN contains(lower(typed), 'ic')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_ci_contains
    FROM mixed GROUP BY event_type
    """,
)
def q_fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): case-insensitive comparison and
    substring search via the ``UTF8_LCASE`` collation — planted
    mixed-case values (every odd event upper-cased) split exact equality
    from collated equality, and a collated ``contains`` matches across
    case. Collation expresses the comparison rule ON THE TYPE rather
    than wrapping every operand in lower() — at 100 TB that matters
    because collation-aware equality stays sargable (usable by joins,
    group-bys and pushdown) where lower(col) wrapping blocks column
    pruning statistics. The oracle pins the SEMANTICS with explicit
    lower() — the observable contract is identical counts.

    Scale shape: narrow projection + one hash agg; counts exact."""
    e = load_table(spark, sf_dir, "events")
    typed = F.when(
        F.col("event_id") % 2 == 1, F.upper("event_type")
    ).otherwise(F.col("event_type"))
    lc = lambda c: F.collate(c, "UTF8_LCASE")  # noqa: E731
    m = e.select("event_type", typed.alias("typed"))
    return m.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("typed") == F.col("event_type"), 1).otherwise(0)
        ).alias("n_exact_eq"),
        F.sum(
            F.when(lc(F.col("typed")) == lc(F.col("event_type")), 1).otherwise(0)
        ).alias("n_ci_eq"),
        F.sum(
            F.when(F.contains(lc(F.col("typed")), F.lit("IC")), 1).otherwise(0)
        ).alias("n_ci_contains"),
    )


def _oct_duck(i: int) -> str:
    """DuckDB: octet i (1-4) from the user hash — hex pair → int."""
    return f"CAST(CAST('0x' || substring(h, {2 * i - 1}, 2) AS INTEGER) AS INT)"


def _oct_spark(i: int) -> str:
    """Spark: the same octet via conv(hex, 16, 10)."""
    return f"CAST(conv(substring(h, {2 * i - 1}, 2), 16, 10) AS INT)"


@query(
    "q_fn_ipv4",
    oracle=f"""
    WITH u AS (
      SELECT DISTINCT user_id FROM events),
    h AS (
      SELECT user_id, md5('ip:' || CAST(user_id AS VARCHAR)) AS h FROM u),
    ip AS (
      SELECT user_id,
             {_oct_duck(1)} AS o1, {_oct_duck(2)} AS o2,
             {_oct_duck(3)} AS o3, {_oct_duck(4)} AS o4
      FROM h)
    SELECT user_id,
           o1 || '.' || o2 || '.' || o3 || '.' || o4 AS ip,
           CAST(o1 AS BIGINT) * 16777216 + o2 * 65536 + o3 * 256 + o4 AS ip_int,
           (o1 = 10 OR (o1 = 172 AND o2 BETWEEN 16 AND 31)
            OR (o1 = 192 AND o2 = 168)) AS is_private,
           o1 || '.' || o2 || '.0.0/16' AS subnet16
    FROM ip
    """,
)
def q_fn_ipv4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 address family for log analytics — parse/format octets, the
    32-bit integer form (the sargable representation CIDR-range predicates
    and range joins use at scale), RFC-1918 private-range classification,
    and the /16 aggregation key. The fixture has no IP column, so
    addresses derive deterministically from a user-id hash (the
    q_text_pii synthesize-in-query discipline); the arithmetic is the
    operator under test and is hash-verified end-to-end, hex parsing
    included (conv(x,16,10) vs DuckDB's 0x-cast — different spellings,
    same integers).

    Scale shape: one distinct on user_id, then pure narrow codegen'd
    expressions — at 100 TB a CIDR-containment join becomes
    BETWEEN ip_int AND subnet bounds, i.e. the q_join_range recipe on
    the integer form computed here."""
    e = load_table(spark, sf_dir, "events")
    u = e.select("user_id").distinct()
    h = u.select(
        "user_id",
        F.md5(F.concat(F.lit("ip:"), F.col("user_id").cast("string"))).alias("h"),
    )
    ip = h.select(
        "user_id",
        *[F.expr(_oct_spark(i)).alias(f"o{i}") for i in range(1, 5)],
    )
    return ip.select(
        "user_id",
        F.concat_ws(".", "o1", "o2", "o3", "o4").alias("ip"),
        (
            F.col("o1").cast("long") * 16777216
            + F.col("o2") * 65536
            + F.col("o3") * 256
            + F.col("o4")
        ).alias("ip_int"),
        (
            (F.col("o1") == 10)
            | ((F.col("o1") == 172) & F.col("o2").between(16, 31))
            | ((F.col("o1") == 192) & (F.col("o2") == 168))
        ).alias("is_private"),
        F.concat(F.col("o1"), F.lit("."), F.col("o2"), F.lit(".0.0/16")).alias(
            "subnet16"
        ),
    )
