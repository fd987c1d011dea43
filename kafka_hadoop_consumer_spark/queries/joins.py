"""Join operators (SURVEY.md §2B "Joins").

Strategy notes for 100 TB (SURVEY.md §4.2): small dims are broadcast
explicitly (region/nation/supplier never exceed broadcast size); big-big
equi-joins shuffle on their keys and AQE handles skew; the theta join is a
broadcast nested-loop with the SMALL side broadcast and an aggregate on top
so the blow-up never leaves the executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.catalog import load_table
from kafka_hadoop_consumer_spark.queries.registry import persist_tracked, query


@query(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_name, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join orders ⋈ customer (shuffle join on the key at scale)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_name", "c_mktsegment", "o_totalprice"
    )


@query(
    "q_join_broadcast",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_partkey, p.p_brand, l.l_quantity
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#1'
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join: fact ⋈ broadcast(small dim), explicit hint.

    At 100 TB the fact side never shuffles — the dim ships to every
    executor. tests/test_plans.py asserts BroadcastHashJoin in the plan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_orderkey", "l_linenumber", "p_partkey", "p_brand", "l_quantity"
    )


@query(
    "q_join_multiway",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join, TPC-H Q5 shape: region⋈nation⋈customer⋈orders⋈lineitem.

    nation/region broadcast unconditionally (constant-size dims). The
    customer-side dim is also hinted broadcast: it prunes to 3 columns
    (~25k rows/SF), well inside executor memory at bench scale, and the
    hint removes the only non-fact shuffle (measured 0.92→0.66 s at
    sf0.1 — without it Catalyst's post-join size estimate overshoots the
    10 MB threshold and plans a sort-merge join). At a scale factor
    where customers no longer fit an executor, drop this one hint and
    the identical declarative plan degrades gracefully to SMJ on
    custkey; the lineitem⋈orders edge shuffles either way — that's the
    unavoidable fact-fact edge.
    """
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    # NOTE (r13): deliberately NOT fan_out-repartitioned — same 2dp money
    # sum as q_e2e_q9: reassociating the FP partials flips the rounded
    # hash vs the oracle (q9 measured strict-red with a repartition).
    li = load_table(spark, sf_dir, "lineitem")
    dim = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dim), o.o_custkey == dim.c_custkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_acctbal, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 100000.0
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a join-side predicate; unmatched rows null-extend."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 100000.0)
    return c.join(o, cond, "left").select(
        "c_custkey", "c_acctbal", "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_full",
    oracle="""
    SELECT c.c_custkey, c.c_acctbal, o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM (SELECT * FROM customer WHERE c_acctbal > 9000.0) c
    FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 100000.0) o
      ON c.c_custkey = o.o_custkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: both sides contribute unmatched, null-extended rows."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000.0)
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", "c_acctbal", "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN
      (SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): customers with ≥1 large order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS
      (SELECT 1 FROM orders o
       WHERE o.o_custkey = customer.c_custkey AND o.o_totalprice > 200000.0)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no order above 200k."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 200000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_theta",
    oracle="""
    SELECT s.s_suppkey,
           count(*) AS n_parts,
           round(sum(p.p_retailprice), 2) AS sum_price
    FROM supplier s JOIN part p
      ON p.p_retailprice BETWEEN s.s_acctbal / 10.0 AND s.s_acctbal / 5.0
    GROUP BY s.s_suppkey
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi theta join → broadcast nested loop, aggregated on top.

    The small side (supplier) is broadcast so the quadratic pairing stays
    executor-local; the aggregate keeps the blow-up from materializing.
    """
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    cond = p.p_retailprice.between(s.s_acctbal / 10.0, s.s_acctbal / 5.0)
    return (
        p.join(F.broadcast(s), cond)
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("p_retailprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_join_skewed",
    oracle="""
    SELECT e.event_id, e.user_id, e.value, c.c_name, c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def q_join_skewed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant equi-join: the salted-join operator as a first-class
    query — fact (events) salted into 8 sub-keys, dim (customer) replicated
    8x, join on (key, salt).

    Result set is IDENTICAL to the plain equi-join (the oracle): salting
    only re-shards the shuffle. At 100 TB this is the structural answer to
    pathological single-key skew (one user = 30% of the fact table) that
    AQE's skew splitting can't fix for broadcast/hash joins — each hot key
    spreads over n_salts tasks at the cost of replicating the small side.
    See operators/salting.py for the determinism argument (hash-derived
    salt, no rand()).
    """
    from kafka_hadoop_consumer_spark.operators.salting import salted_join

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_mktsegment"
    )
    return salted_join(e, c, on="user_id", n_salts=8).select(
        "event_id", "user_id", "value", "c_name", "c_mktsegment"
    )


@query(
    "q_join_shuffle_hash",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice, o.o_orderstatus
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_totalprice > 50000
    """,
)
def q_join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffled hash join by explicit hint — the third physical join
    strategy alongside broadcast (q_join_broadcast) and sort-merge
    (q_join_inner), completing the strategy matrix. SHJ wins over SMJ
    when one side is much smaller than the other but too big to
    broadcast: it builds a hash map per partition instead of sorting
    BOTH sides (no sort phase at all — plan-asserted in
    tests/test_plans.py).

    At 100 TB this is the fact-to-mid-size-table pattern: shuffle both
    on the key, hash-build the smaller. Spark only honors the hint when
    the per-partition build side fits memory — exactly the operating
    regime the hint asserts."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 50000
    ).select("o_orderkey", "o_orderstatus")
    return li.join(
        o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey
    ).select("l_orderkey", "l_linenumber", "l_extendedprice", "o_orderstatus")


SPATIAL_R = 25.0        # radius; also the grid cell size
SPATIAL_GRID = 100003   # prime modulus for synthetic planar coords


@query(
    "q_join_spatial",
    oracle=f"""
    WITH pts AS (
      -- u is reduced mod the grid prime BEFORE squaring: u*u overflows
      -- BIGINT at u ~ 1.33e8 (reached near SF 900, well inside the
      -- documented scale shape); the reduced mix is congruent, so the
      -- planted coordinates are bit-identical for every fixture id
      SELECT DISTINCT user_id,
             CAST((((user_id % {SPATIAL_GRID}) * (user_id % {SPATIAL_GRID})
                    % {SPATIAL_GRID}) * 377
                   + (user_id % {SPATIAL_GRID}) * 48271)
                  % {SPATIAL_GRID} AS DOUBLE) / 100 AS x,
             CAST((((user_id % {SPATIAL_GRID}) * (user_id % {SPATIAL_GRID})
                    % {SPATIAL_GRID}) * 521
                   + (user_id % {SPATIAL_GRID}) * 69621 + 12345)
                  % {SPATIAL_GRID} AS DOUBLE) / 100 AS y
      FROM events),
    cells AS (
      SELECT user_id, x, y,
             CAST(floor(x / {SPATIAL_R}) AS BIGINT) AS cx,
             CAST(floor(y / {SPATIAL_R}) AS BIGINT) AS cy
      FROM pts),
    probes AS (
      SELECT user_id, x, y, cx + dx.d AS cx, cy + dy.d AS cy
      FROM cells,
           (VALUES (-1), (0), (1)) AS dx(d),
           (VALUES (-1), (0), (1)) AS dy(d))
    SELECT a.user_id AS id_a, b.user_id AS id_b,
           round(sqrt((a.x - b.x) * (a.x - b.x)
                      + (a.y - b.y) * (a.y - b.y)), 4) AS dist
    FROM probes a JOIN cells b ON a.cx = b.cx AND a.cy = b.cy
    WHERE a.user_id < b.user_id
      AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          <= {SPATIAL_R} * {SPATIAL_R}
    """,
)
def q_join_spatial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join via GRID BUCKETING — all point pairs within
    distance R, found with an equi-join instead of an O(n²) distance
    product: each point lands in its ⌊x/R⌋,⌊y/R⌋ home cell, the probe
    side explodes into the 3×3 neighborhood (any pair within R must fall
    in adjacent cells when the cell edge equals R), and the exact
    distance predicate runs only on co-cell candidates. The id_a < id_b
    guard both dedups the symmetric pair and halves the candidate work.

    Coordinates are planted deterministically (QUADRATIC integer mixes of
    user_id mod a prime — a linear mix puts all points on a 1-D lattice
    whose minimum pair distance jumps from 0 to ~60 with nothing in
    between, found the hard way; pure bigint arithmetic, bit-identical
    on both engines; no
    libm trig, and sqrt is IEEE correctly-rounded so even the output
    distance hashes exactly at 4dp).

    Scale shape: ONE equi-join shuffle on (cx, cy) with constant 9×
    probe-side amplification — the textbook distributed spatial-join
    plan (uniform hash coords keep cells balanced; real workloads with
    hot cells compose the q_join_skewed salting recipe on the cell
    key)."""
    e = load_table(spark, sf_dir, "events")
    # user_id reduced mod the grid prime BEFORE squaring (see oracle):
    # u*u overflows BIGINT (ANSI abort) at u ~ 1.33e8; the reduced mix
    # is congruent, so planted coordinates are unchanged for every id
    um = F.col("user_id") % SPATIAL_GRID
    pts = (
        e.select("user_id").distinct()
        .select(
            "user_id",
            ((((um * um % SPATIAL_GRID) * 377
               + um * 48271) % SPATIAL_GRID).cast("double") / 100)
            .alias("x"),
            ((((um * um % SPATIAL_GRID) * 521
               + um * 69621 + 12345) % SPATIAL_GRID)
             .cast("double") / 100)
            .alias("y"),
        )
    )
    cells = persist_tracked(
        pts.withColumn("cx", F.floor(F.col("x") / SPATIAL_R))
        .withColumn("cy", F.floor(F.col("y") / SPATIAL_R))
    )
    d = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    probes = (
        cells.withColumn("dx", d)
        .withColumn("dy", d)
        .select(
            F.col("user_id").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    d2 = (F.col("xa") - F.col("x")) ** 2 + (F.col("ya") - F.col("y")) ** 2
    return (
        probes.join(cells, ["cx", "cy"])
        .where(
            (F.col("id_a") < F.col("user_id"))
            & (d2 <= F.lit(SPATIAL_R * SPATIAL_R))
        )
        .select(
            "id_a",
            F.col("user_id").alias("id_b"),
            F.round(F.sqrt(d2), 4).alias("dist"),
        )
    )


@query(
    "q_join_null_safe",
    oracle="""
    WITH a AS (
      SELECT nullif(user_id % 10, 0) AS k,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1),
    b AS (
      SELECT nullif(c_custkey % 10, 0) AS k,
             CAST(count(*) AS BIGINT) AS n_custs
      FROM customer GROUP BY 1)
    SELECT a.k, a.n_events, b.n_custs
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): the
    NULL bucket on each side MATCHES (one joined row), where ordinary
    equality would silently drop every NULL-keyed row — the semantics
    needed when NULL is a real category (unknown segment, unparsed key)
    rather than absent data. Contrast q_subq_notin_null, which pins the
    opposite three-valued-logic behavior.

    Scale shape: Spark plans ``<=>`` as a HASH-partitionable equi-join
    (null keys hash to one partition like any other value) — no
    nested-loop fallback; both inputs here are pre-aggregated to ≤10
    rows so the join itself is broadcast-trivial, the point being the
    matching semantics, not the data volume."""
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    a = e.groupBy(
        F.nullif(F.col("user_id") % 10, F.lit(0)).alias("ka")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    b = c.groupBy(
        F.nullif(F.col("c_custkey") % 10, F.lit(0)).alias("kb")
    ).agg(F.count(F.lit(1)).alias("n_custs"))
    return a.join(b, F.col("ka").eqNullSafe(F.col("kb"))).select(
        F.col("ka").alias("k"), "n_events", "n_custs"
    )


# Hand-built Bloom filter (q_join_bloom_prefilter). Engine-neutral integer
# hashes (no engine hash builtins), 63 usable bits per word so neither
# engine touches the BIGINT sign bit with 1 << 63. The filter is sized
# SMALL on purpose (1008 bits for ~300 keys → visible false positives)
# so the emitted fp accounting actually exercises the bound.
BLOOM_WORD_BITS = 63
BLOOM_WORDS = 16
BLOOM_M = BLOOM_WORDS * BLOOM_WORD_BITS
BLOOM_HASHES = ((2654435761, 17), (2246822519, 101), (3266489917, 911))
BLOOM_P = 1000003  # prime modulus before folding into [0, BLOOM_M)


def _bloom_pos_sql(key: str, a: int, b: int) -> str:
    """Bit position of hash (a, b) for integer column ``key`` — identical
    text is valid Spark SQL and DuckDB SQL (% on BIGINT, same precedence).
    ``key`` is reduced mod BLOOM_P BEFORE the multiply: key * a overflows
    BIGINT (ANSI abort) at key ~ 2.8e9, i.e. customer counts near SF
    ~19k — far below the documented operating regime; the reduced form
    is congruent, so every position is unchanged."""
    return (
        f"(((({key} % {BLOOM_P}) * {a} + {b}) % {BLOOM_P}) % {BLOOM_M})"
    )


@query(
    "q_join_bloom_prefilter",
    oracle=f"""
    WITH keys AS (
      SELECT DISTINCT c_custkey AS k FROM customer
      WHERE c_mktsegment = 'BUILDING'),
    posn AS (
      SELECT unnest([{", ".join(_bloom_pos_sql("k", a, b) for a, b in BLOOM_HASHES)}]) AS pos
      FROM keys),
    words AS (
      SELECT pos // {BLOOM_WORD_BITS} AS w,
             bit_or(1::BIGINT << CAST(pos % {BLOOM_WORD_BITS} AS INT)) AS bits
      FROM posn GROUP BY 1),
    warr AS (
      SELECT r.i AS w, coalesce(ww.bits, 0::BIGINT) AS bits
      FROM range(0, {BLOOM_WORDS}) r(i) LEFT JOIN words ww ON ww.w = r.i),
    bloom AS (SELECT list(bits ORDER BY w) AS arr FROM warr),
    probe AS (
      SELECT o.o_orderstatus,
             ({" AND ".join(
                 f"(arr[CAST({_bloom_pos_sql('o.o_custkey', a, b)} // {BLOOM_WORD_BITS} AS INT) + 1]"
                 f" >> CAST({_bloom_pos_sql('o.o_custkey', a, b)} % {BLOOM_WORD_BITS} AS INT)) & 1 = 1"
                 for a, b in BLOOM_HASHES)}) AS pass_bloom,
             o.o_custkey IN (SELECT k FROM keys) AS is_true
      FROM orders o CROSS JOIN bloom)
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN pass_bloom THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_bloom,
           CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true_match,
           CAST(sum(CASE WHEN pass_bloom AND NOT is_true THEN 1 ELSE 0 END) AS BIGINT)
               AS n_false_pos,
           CAST(sum(CASE WHEN is_true AND NOT pass_bloom THEN 1 ELSE 0 END) AS BIGINT)
               AS n_false_neg,
           round(CAST(sum(CASE WHEN pass_bloom AND NOT is_true THEN 1 ELSE 0 END) AS DOUBLE)
                 / nullif(count(*) - sum(CASE WHEN is_true THEN 1 ELSE 0 END), 0), 6)
               AS fp_rate
    FROM probe GROUP BY o_orderstatus
    """,
)
def q_join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter join pruning made explicit and value-checked: a Bloom
    filter over the build side's join keys (customers in one segment) is
    constructed AS DATAFRAME OPS — K engine-neutral integer hashes set bits
    in BLOOM_WORDS 63-bit words via a map-side-combinable bit_or aggregate —
    then broadcast as one row, and the fact side is probed with pure bit
    arithmetic before any join. The output books n_pass_bloom against the
    true join result: n_false_neg is structurally 0 (the Bloom guarantee,
    visible to the driver as a hash-checked column), n_false_pos / fp_rate
    shows the deliberately-undersized filter's error — the same accounting
    Catalyst's InjectRuntimeFilter does internally (tests/test_scale_patterns
    demos the built-in; THIS key proves the mechanism end-to-end).

    Scale shape: the build agg reduces any build-side cardinality to a
    CONSTANT BLOOM_WORDS-row table (bit_or partials merge associatively);
    the probe is a zero-shuffle scan-side predicate, so at 100 TB only the
    surviving ~|true|+fp·|fact| rows reach the real join's shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    keys = (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    pos = F.explode(
        F.array(*[F.expr(_bloom_pos_sql("k", a, b)) for a, b in BLOOM_HASHES])
    ).alias("pos")
    words = (
        keys.select(pos)
        .select(
            F.expr(f"pos DIV {BLOOM_WORD_BITS}").alias("w"),
            F.expr(f"pos % {BLOOM_WORD_BITS}").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(shiftleft(1L, cast(b AS INT)))").alias("bits"))
    )
    bloom = words.groupBy().agg(
        F.expr(
            f"transform(sequence(0, {BLOOM_WORDS - 1}), "
            f"i -> coalesce(element_at(map_from_entries(collect_list(struct(w, bits))), "
            f"cast(i AS BIGINT)), 0L))"
        ).alias("arr")
    )
    checks = [
        F.expr(
            f"(element_at(arr, CAST({_bloom_pos_sql('o_custkey', a, b)} DIV {BLOOM_WORD_BITS} AS INT) + 1)"
            f" >> CAST({_bloom_pos_sql('o_custkey', a, b)} % {BLOOM_WORD_BITS} AS INT)) & 1 = 1"
        )
        for a, b in BLOOM_HASHES
    ]
    pass_bloom = checks[0] & checks[1] & checks[2]
    probe = (
        o.select("o_orderstatus", "o_custkey")
        .crossJoin(F.broadcast(bloom))
        .join(F.broadcast(keys), F.col("o_custkey") == F.col("k"), "left")
        .select(
            "o_orderstatus",
            pass_bloom.alias("pass_bloom"),
            F.col("k").isNotNull().alias("is_true"),
        )
    )
    n_fp = F.sum(F.when(F.col("pass_bloom") & ~F.col("is_true"), 1).otherwise(0))
    n_true = F.sum(F.when(F.col("is_true"), 1).otherwise(0))
    return probe.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("pass_bloom"), 1).otherwise(0)).alias("n_pass_bloom"),
        n_true.alias("n_true_match"),
        n_fp.alias("n_false_pos"),
        F.sum(F.when(F.col("is_true") & ~F.col("pass_bloom"), 1).otherwise(0)).alias(
            "n_false_neg"
        ),
        F.round(
            n_fp.cast("double") / F.nullif(F.count(F.lit(1)) - n_true, F.lit(0)), 6
        ).alias("fp_rate"),
    )
