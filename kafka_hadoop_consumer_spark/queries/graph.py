"""Graph analytics over DataFrame ops (complements q_graph_pagerank and
the q_dedup_clusters connected components in queries/dedup.py).

The graph here is a CO-OCCURRENCE projection: users connected when they
purchased within the same hour bucket — the bipartite-projection
construction every recommender/fraud pipeline uses, with the hot-bucket
cap that keeps the projection from going quadratic on a viral bucket
(the q_dedup_ngram_jaccard df-cap, applied to graph building).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.catalog import load_table
from kafka_hadoop_consumer_spark.queries.registry import persist_tracked, query

HOUR_US = 3_600_000_000
TRI_BUCKET_CAP = 64  # drop hour buckets with more co-purchasers than this


def copurchase_edges(e: DataFrame) -> DataFrame:
    """Distinct co-purchase edges (u < v): users purchasing in the same
    hour bucket, hot buckets capped. Pair generation is posting-list
    style — one shuffle groups users per bucket, pairs explode from each
    sorted posting (the pair_overlap_counts pattern, measured faster
    than a bucket self-join and moving |buckets| rows instead of 2×
    probe streams); the cap bounds per-bucket fan-out at C(cap, 2)."""
    hr = F.expr(f"unix_micros(cast(ts AS timestamp)) DIV {HOUR_US}")
    pu = (
        e.where(F.col("event_type") == "purchase")
        .select(hr.alias("hr"), "user_id")
        .distinct()
    )
    posts = (
        pu.groupBy("hr")
        .agg(F.sort_array(F.collect_list("user_id")).alias("us"))
        .where((F.size("us") >= 2) & (F.size("us") <= TRI_BUCKET_CAP))
    )
    return (
        posts.select(
            F.explode(
                F.expr(
                    "flatten(transform(us, (x, i) ->"
                    " transform(slice(us, i + 2, size(us) - i - 1),"
                    " y -> struct(x AS u, y AS v))))"
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
        .distinct()
    )


@query(
    "q_graph_triangles",
    oracle=f"""
    WITH pu AS (
      SELECT DISTINCT epoch_us(CAST(ts AS TIMESTAMP)) // {HOUR_US} AS hr,
                      user_id
      FROM events WHERE event_type = 'purchase'),
    ok AS (SELECT hr FROM pu GROUP BY hr
           HAVING count(*) BETWEEN 2 AND {TRI_BUCKET_CAP}),
    edges AS (
      SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM pu a JOIN pu b ON a.hr = b.hr AND a.user_id < b.user_id
      WHERE a.hr IN (SELECT hr FROM ok)),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges)
      GROUP BY node),
    o AS (  -- orient each edge from lower (degree, id) to higher
      SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS src,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS dst,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END AS ddeg
      FROM edges e
      JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
    tri AS (
      SELECT w.src AS a, w.d1 AS b, w.d2 AS c FROM (
        SELECT o1.src, o1.dst AS d1, o2.dst AS d2
        FROM o o1 JOIN o o2
          ON o2.src = o1.src AND (o1.ddeg, o1.dst) < (o2.ddeg, o2.dst)) w
      JOIN o oc ON oc.src = w.d1 AND oc.dst = w.d2),
    part AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        SELECT a AS node FROM tri UNION ALL
        SELECT b AS node FROM tri UNION ALL
        SELECT c AS node FROM tri)
      GROUP BY node)
    SELECT p.node AS user_id, d.d AS degree, p.n_triangles,
           round(2.0 * p.n_triangles / (d.d * (d.d - 1)), 6)
               AS clustering_coeff
    FROM part p JOIN deg d ON d.node = p.node
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle counting with DEGREE-ORDERED edge orientation — the
    standard distributed-triangle trick (orient every edge from the
    lower-(degree, id) endpoint to the higher; enumerate wedges only from
    each node's out-edges; close them with one more equi-join). Each
    triangle is counted exactly once, and wedge fan-out is bounded by the
    max OUT-degree, which orientation caps at O(√E) — the difference
    between feasible and quadratic on skewed (social/co-occurrence)
    graphs. Emits per-node triangle participation + local clustering
    coefficient — the community-density signal behind fraud rings and
    botted engagement.

    Graph construction (co-purchase projection, same-hour buckets) caps
    hot buckets at TRI_BUCKET_CAP users, bounding projection fan-out at
    C(64,2) per bucket — the df-cap discipline applied to graphs.

    Scale shape: bucket cap → projection is one equi-join on hr; degree
    is one hash agg; wedge + closure are two equi-joins on node keys
    (shuffle by src — wedges for one node co-locate); no global sort, no
    driver collect."""
    e = load_table(spark, sf_dir, "events")
    edges = persist_tracked(copurchase_edges(e))
    tri, deg = triangles_from_edges(edges)
    part = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return part.join(deg, "node").select(
        F.col("node").alias("user_id"),
        F.col("d").alias("degree"),
        "n_triangles",
        F.round(
            F.lit(2.0) * F.col("n_triangles") / (F.col("d") * (F.col("d") - 1)), 6
        ).alias("clustering_coeff"),
    )


def triangles_from_edges(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Degree-ordered triangle enumeration over a distinct undirected edge
    frame (u, v) with u < v. Returns (triangles(a, b, c), degrees(node, d));
    each triangle appears exactly once. Exposed so tests can check the
    orientation count against a brute-force triple join."""
    deg = persist_tracked(
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    lower_u = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = persist_tracked(
        edges.join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
        .select(
            F.when(lower_u, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_u, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(lower_u, F.col("dv")).otherwise(F.col("du")).alias("ddeg"),
        )
    )
    o2 = o.select(
        F.col("src").alias("src2"),
        F.col("dst").alias("d2"),
        F.col("ddeg").alias("ddeg2"),
    )
    wedge_lt = (F.col("ddeg") < F.col("ddeg2")) | (
        (F.col("ddeg") == F.col("ddeg2")) & (F.col("dst") < F.col("d2"))
    )
    wedges = (
        o.join(o2, F.col("src") == F.col("src2"))
        .where(wedge_lt)
        .select(F.col("src").alias("a"), F.col("dst").alias("b"), F.col("d2").alias("c"))
    )
    closing = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    return wedges.join(closing, ["b", "c"]), deg


LP_TOP = 25      # candidate links emitted (by score)
LP_DEG_CAP = 64  # hub cap: nodes above this degree don't generate wedges


@query(
    "q_graph_link_predict",
    oracle=f"""
    WITH pu AS (
      SELECT DISTINCT epoch_us(CAST(ts AS TIMESTAMP)) // {HOUR_US} AS hr,
                      user_id
      FROM events WHERE event_type = 'purchase'),
    ok AS (SELECT hr FROM pu GROUP BY hr
           HAVING count(*) BETWEEN 2 AND {TRI_BUCKET_CAP}),
    edges AS (
      SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM pu a JOIN pu b ON a.hr = b.hr AND a.user_id < b.user_id
      WHERE a.hr IN (SELECT hr FROM ok)),
    adj AS (  -- symmetric adjacency
      SELECT u AS node, v AS nb FROM edges
      UNION ALL SELECT v, u FROM edges),
    deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY node),
    wadj AS (  -- hub-capped wedge generation: only low-degree centers
      SELECT a.node, a.nb FROM adj a
      JOIN deg dn ON dn.node = a.nb WHERE dn.d <= {LP_DEG_CAP}),
    common AS (  -- non-adjacent pairs sharing >= 1 non-hub neighbor
      SELECT a.node AS x, b.node AS y, CAST(count(*) AS BIGINT) AS cn
      FROM wadj a JOIN wadj b ON a.nb = b.nb AND a.node < b.node
      GROUP BY a.node, b.node),
    cand AS (
      SELECT c.x, c.y, c.cn, dx.d AS dx, dy.d AS dy
      FROM common c
      JOIN deg dx ON dx.node = c.x JOIN deg dy ON dy.node = c.y
      WHERE NOT EXISTS (SELECT 1 FROM edges e
                        WHERE e.u = c.x AND e.v = c.y))
    SELECT x AS user_a, y AS user_b, cn AS n_common, dx + dy - cn AS n_union,
           round(CAST(cn AS DOUBLE) / (dx + dy - cn), 6) AS jaccard_score
    FROM cand
    ORDER BY jaccard_score DESC, x, y LIMIT {LP_TOP}
    """,
)
def q_graph_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighbor-set Jaccard — the classic
    common-neighbors feature behind friend/product recommendation: for
    every NON-adjacent node pair of the capped co-purchase graph that
    shares at least one neighbor, score |N(x)∩N(y)| / |N(x)∪N(y)| and
    emit the top-{LP_TOP} predicted links. Candidate pairs come only
    from shared-neighbor wedges (posting-list style on the adjacency —
    never all pairs), the q_dedup_ngram_jaccard shape applied to graph
    structure.

    Scale shape: adjacency and degrees are one union + hash agg; wedge
    pairing is one equi-join on the shared neighbor with fan-out bounded
    by the capped degree; the known-edge exclusion is an anti join. Same
    cap discipline as q_graph_triangles."""
    e = load_table(spark, sf_dir, "events")
    edges = persist_tracked(copurchase_edges(e))
    adj = persist_tracked(
        edges.select(F.col("u").alias("node"), F.col("v").alias("nb")).unionAll(
            edges.select(F.col("v").alias("node"), F.col("u").alias("nb"))
        )
    )
    deg = persist_tracked(adj.groupBy("node").agg(F.count(F.lit(1)).alias("d")))
    low_centers = deg.where(F.col("d") <= LP_DEG_CAP).select(
        F.col("node").alias("nb")
    )
    wadj = persist_tracked(adj.join(low_centers, "nb"))
    common = (
        wadj.select(F.col("node").alias("x"), "nb")
        .join(wadj.select(F.col("node").alias("y"), "nb"), "nb")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    cand = (
        common.join(
            edges.select(F.col("u").alias("x"), F.col("v").alias("y")),
            ["x", "y"],
            "left_anti",
        )
        .join(deg.select(F.col("node").alias("x"), F.col("d").alias("dx")), "x")
        .join(deg.select(F.col("node").alias("y"), F.col("d").alias("dy")), "y")
    )
    return (
        cand.select(
            F.col("x").alias("user_a"),
            F.col("y").alias("user_b"),
            F.col("cn").alias("n_common"),
            (F.col("dx") + F.col("dy") - F.col("cn")).alias("n_union"),
            F.round(
                F.col("cn").cast("double")
                / (F.col("dx") + F.col("dy") - F.col("cn")),
                6,
            ).alias("jaccard_score"),
        )
        .orderBy(F.col("jaccard_score").desc(), "user_a", "user_b")
        .limit(LP_TOP)
    )
