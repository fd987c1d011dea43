"""Near-duplicate detection operators (SURVEY.md §2B; build plan M4) —
the LLM-corpus dedup cascade: exact hash → MinHash+LSH banding →
SimHash fingerprints → exact n-gram Jaccard verification.

Scale design (the point of these operators at 100 TB):

- q_dedup_ngram_jaccard is the EXACT ground truth — its only join is an
  equi-join on shingle, so cost is Σ|posting-list|², fine when shingles are
  rare but quadratic on hot shingles. It exists to verify the approximate
  paths at test scale.
- q_dedup_minhash is the ~O(n) scale path: constant-size signatures
  (K=32 hashes) per doc, LSH banding (8 bands × 4 rows) so only
  same-bucket docs are paired, then exact-Jaccard verification of the
  candidates only. Recall for J≥0.8 pairs is ≥ 99.8% (1-(1-J^4)^8)
  while the distinct-shingle count is << 2^31 — the engine-portable
  md5+affine family (MH_P comment below) maps shingles into a 31-bit
  base space first, and shingles that collide there stay collided
  under every affine permutation. At corpus scales approaching 2^31
  distinct shingles, widen the base hash (128-bit md5 intermediates /
  two independent 31-bit draws) before trusting the recall bound.
  Precision is 1.0 by construction (candidates verified).
- q_dedup_simhash emits 60-bit fingerprints + 4×15-bit bands; duplicate
  candidates are same-band collisions (Hamming ≤ 3 guarantee over 4 bands).

MinHash/SimHash use engine-portable md5-derived base hashes (r5), so
both replay in DuckDB as full SQL oracles; tests/test_dedup.py
additionally asserts MinHash recall against the exact operator.
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

N_SHINGLE = 4           # w-shingle width (FIXTURES.md planted pairs use 4)
N_MINHASH = 32          # signature length K
N_BANDS = 8             # LSH bands (K = bands × rows)
ROWS_PER_BAND = N_MINHASH // N_BANDS
JACCARD_THRESHOLD = 0.6
# Hot-shingle document-frequency cap: shingles present in more docs than
# this are dropped from the exact-Jaccard shingle space (postings AND
# per-doc sizes, so the ratio stays consistent). A stop-phrase shared by
# 1M docs would otherwise contribute |posting|² ≈ 10¹² candidate pairs —
# the classic near-dedup skew bomb. df-capping is standard in production
# dedup; fixture max df is 6 (sf0.1), so the cap is inert at test scale
# and the DuckDB oracles mirror it exactly either way.
DF_CAP = 64


def _shingle_ctes(src: str = "documents") -> str:
    """Oracle-side single source of the shingle pipeline (r9 review: six
    hand-kept copies meant a df-cap or window change had to be applied
    to every oracle by hand — the DF_CAP retrofit already walked that
    minefield once). Yields ``sh`` = distinct df-capped 4-shingles of
    ``src`` (doc_id, text); the engine twin is ``shingles`` +
    ``df_capped``."""
    return f"""tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM {src}),
    sh_all AS (
      SELECT DISTINCT doc_id, s
      FROM tok,
           UNNEST(list_transform(range(1, greatest(len(t) - {N_SHINGLE - 1}, 0) + 1),
                                 i -> array_to_string(list_slice(t, i, i + {N_SHINGLE - 1}), ' '))) AS u(s)
    ),
    sh AS (  -- hot-shingle df-cap, mirroring the engine exactly
      SELECT doc_id, s FROM (
        SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM sh_all)
      WHERE df <= {DF_CAP}
    )"""


def _shingle_pair_ctes(src: str = "documents") -> str:
    """``_shingle_ctes`` + per-doc shingle counts and per-pair posting
    intersections — the shared front of every exact-Jaccard oracle."""
    return (
        _shingle_ctes(src)
        + """,
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )"""
    )


# ``_shingle_pair_ctes`` + the J > threshold pair filter — shared by the
# cluster/pagerank oracles that consume the near-dup GRAPH, not the scores.
_JACCARD_PAIRS_CTE = f""",
    pairs AS (
      SELECT doc1, doc2
      FROM inter JOIN sizes s1 ON s1.doc_id = doc1 JOIN sizes s2 ON s2.doc_id = doc2
      WHERE CAST(n_inter AS DOUBLE) / (s1.n_sh + s2.n_sh - n_inter) > {JACCARD_THRESHOLD}
    )"""


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct (id, shingle) pairs: 4-token shingles of the token stream.

    Tokenization lands in a column first so the shingle expression splits
    each text once, not twice (measured 3× faster at sf0.1).

    PRECONDITION (r13 advice): each id must occupy exactly ONE input row
    — true for every current caller (documents fixtures and the
    streaming micro-batch frames key rows by doc id). A duplicated id
    row would emit duplicate (id, shingle) pairs, silently inflating
    intersection counts downstream; dedupe by id first if a new caller
    cannot guarantee this.

    r13 optimization (guide §2.4 "remove shuffles outright"): the
    distinct is keyed (id, shingle) and every shingle of a doc lives in
    that doc's own row, so a global ``.distinct()`` — a full shuffle of
    the widest stream in the dedup family — is equivalent to a row-local
    ``array_distinct`` on the ngram array before the explode. Zero
    exchanges here now; downstream consumers (MinHash signatures,
    posting lists) see the identical distinct pair set. The doc frame is
    also fan_out-repartitioned by id first (single-row-group fixture
    scan → one task otherwise; no-op at cluster scale), which lets the
    per-doc aggregations downstream (minhash_signatures' groupBy(id),
    the verify-stage docsets) reuse this one exchange."""
    return (
        fan_out(df, id_col)
        .withColumn("_toks", F.split(F.col(text_col), " "))
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(F.expr(ngram_expr("_toks", N_SHINGLE)))
            ).alias("sh"),
        )
    )


def exact_jaccard_pairs(sh: DataFrame, df_cap: int = DF_CAP) -> DataFrame:
    """Exact shingle-set Jaccard for every doc pair sharing ≥1 surviving
    shingle, over the df-capped shingle space (df ≤ ``df_cap``).

    Pair generation is posting-list style: one shuffle groups doc ids per
    shingle, then pair combinations explode from each posting list — one
    wide stage instead of a shingle self-join plus pair shuffle (measured
    25% faster at sf0.1, and the shuffle moves |shingles| rows instead of
    2×|shingles| join probes). The df-cap bounds each posting's pair
    fan-out at C(df_cap, 2), so Σ|posting|² can no longer blow up on a
    hot shingle; per-doc sizes are derived from the SAME capped postings
    so numerator and denominator agree.

    The capped posting table feeds two plan branches (pairs + sizes) and
    is persisted for the duration of the query. The per-doc sizes table
    is rows=|docs| — UNBOUNDED, so its two probe joins carry no
    broadcast hint (AQE broadcasts when small; at corpus scale they are
    shuffle equi-joins keyed on the same doc ids as the pair table).
    """
    return pair_overlap_counts(sh, df_cap).select(
        "doc1",
        "doc2",
        (
            F.col("n_inter").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("n_inter"))
        ).alias("jaccard"),
    )


def pair_overlap_counts(sh: DataFrame, df_cap: int = DF_CAP) -> DataFrame:
    """(doc1, doc2, n_inter, n1, n2) for every doc pair sharing ≥1
    surviving shingle — the shared posting-list core behind both the
    symmetric (Jaccard) and asymmetric (containment) exact overlap
    measures; see exact_jaccard_pairs for the plan rationale."""
    posts = persist_tracked(
        sh.groupBy("sh")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .where(F.size("ds") <= df_cap)
    )
    pairs = posts.where(F.size("ds") > 1).select(
        F.explode(
            F.expr(
                "flatten(transform(ds, (x, i) ->"
                " transform(slice(ds, i + 2, size(ds) - i - 1),"
                " y -> struct(x AS doc1, y AS doc2))))"
            )
        ).alias("p")
    ).select("p.doc1", "p.doc2")
    inter = pairs.groupBy("doc1", "doc2").agg(F.count(F.lit(1)).alias("n_inter"))
    sizes = posts.select(F.explode("ds").alias("doc_id")).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sh")
    )
    s1 = sizes.select(F.col("doc_id").alias("doc1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("doc2"), F.col("n_sh").alias("n2"))
    return inter.join(s1, "doc1").join(s2, "doc2")


@query(
    "q_dedup_ngram_jaccard",
    oracle=f"""
    WITH {_shingle_pair_ctes()}
    SELECT doc1, doc2,
           CAST(n_inter AS DOUBLE) / (s1.n_sh + s2.n_sh - n_inter) AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.doc_id = doc1
    JOIN sizes s2 ON s2.doc_id = doc2
    WHERE CAST(n_inter AS DOUBLE) / (s1.n_sh + s2.n_sh - n_inter) > {JACCARD_THRESHOLD}
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs (J > 0.6 on 4-shingles over the
    df-capped shingle space, df ≤ {DF_CAP}) — the ground truth the MinHash
    path is measured against. Finds the planted near-dup pairs
    (FIXTURES.md: 28 pairs at sf0.001; cap inert at fixture df ≤ 6)."""
    d = load_table(spark, sf_dir, "documents")
    return exact_jaccard_pairs(shingles(d)).where(
        F.col("jaccard") > JACCARD_THRESHOLD
    )


CONTAM_EVAL_MOD = 10      # doc_id % 10 == 0 → held-out eval set
CONTAM_MIN_SHARED = 3     # shared shingles to flag contamination


@query(
    "q_dedup_contamination",
    oracle=f"""
    WITH {_shingle_ctes()}
    SELECT a.doc_id AS train_doc, b.doc_id AS eval_doc,
           count(*) AS n_shared
    FROM sh a JOIN sh b ON a.s = b.s
    WHERE a.doc_id % {CONTAM_EVAL_MOD} != 0 AND b.doc_id % {CONTAM_EVAL_MOD} = 0
    GROUP BY 1, 2
    HAVING count(*) >= {CONTAM_MIN_SHARED}
    """,
)
def q_dedup_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing
    ≥{CONTAM_MIN_SHARED} distinct {N_SHINGLE}-gram shingles with any
    held-out eval document (here the deterministic doc_id %
    {CONTAM_EVAL_MOD} == 0 split stands in for the benchmark corpus) —
    the standard n-gram-overlap contamination check run before training.

    Scale shape: one equi-join on shingle between the eval-side posting
    set and the train side, with the same hot-shingle df-cap as the
    dedup family (a stop-phrase shared with an eval doc is not
    contamination signal, and capping kills the join's skew bomb). A
    production benchmark set is ~10⁴ docs, so AQE turns the join into a
    broadcast on its own; the hint is deliberately NOT hard-coded
    because this fixture's stand-in split (doc_id % {CONTAM_EVAL_MOD})
    is 10% of the corpus — broadcastable at test scale only.
    """
    d = load_table(spark, sf_dir, "documents")
    sh = persist_tracked(shingles(d))
    hot = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > DF_CAP)
        .select("sh")
    )
    capped = sh.join(F.broadcast(hot), "sh", "left_anti")
    eval_side = capped.where(F.col("doc_id") % CONTAM_EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_doc"), "sh"
    )
    train_side = capped.where(F.col("doc_id") % CONTAM_EVAL_MOD != 0).select(
        F.col("doc_id").alias("train_doc"), "sh"
    )
    return (
        train_side.join(eval_side, "sh")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= CONTAM_MIN_SHARED)
    )


# Engine-portable MinHash hash family (r5; was xxhash64): base hash =
# first 8 hex chars of md5(shingle) reduced mod MH_P = 2^31-1, then K
# affine permutations (a_k*h + b_k) mod MH_P. h, a_k < 2^31 keeps every
# product < 2^62 — exact in 64-bit integers on BOTH engines, which is
# what makes the signature (and so the banding, candidates, and the
# exact-Jaccard-verified output) DuckDB-replayable: the key graduates
# from rows-only to a full SQL oracle. The 31-bit reduced space only
# perturbs the Jaccard ESTIMATE (signature collisions ~n/2^31 per
# permutation); the emitted pairs are exact-verified, so precision is
# unaffected and the recall gate (tests/test_dedup.py) still holds. At
# true 100 TB scale you'd widen the base hash (the family generalizes to
# 61-bit via 128-bit intermediates); the banding/verify plan is
# unchanged either way.
MH_P = 2_147_483_647  # 2^31 - 1, Mersenne prime
_MH_GOLD = 0x9E3779B1
_MH_MIX = 0x85EBCA6B
# (2k+1) and _MH_GOLD are both nonzero and < MH_P with MH_P prime, so
# every a_k is nonzero — each map is a proper permutation of Z_p.
MH_A = [((2 * k + 1) * _MH_GOLD) % MH_P for k in range(N_MINHASH)]
MH_B = [((k * k + 1) * _MH_MIX) % MH_P for k in range(N_MINHASH)]


def minhash_base_hash(col):
    """Portable 31-bit base hash of a shingle string: first 8 md5 hex
    chars as an integer, reduced mod MH_P. Identical arithmetic in
    DuckDB: ('0x' || substring(md5(s), 1, 8))::UBIGINT % MH_P."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % MH_P


# r14 (verdict item 7, guide §5 "very large query plans"): the K min
# aggregates and the band keys are built from PRE-RENDERED SQL strings —
# one F.expr parse in the JVM per aggregate instead of ~6 py4j
# round-trips per Column op. Build-only A/B (sf0.1 session, 4 runs):
# signatures 0.37-0.77 s → 0.09-0.13 s, banding 0.20-0.29 s →
# 0.02-0.04 s, with schema and exceptAll-verified identical output.
# Strings (not Column objects) are cached module-level because Columns
# pin py4j handles to a specific JVM. The `L` suffixes pin BIGINT
# literals — same arithmetic the Column form produced.
_MH_MIN_EXPRS = [
    f"min((_h * {MH_A[k]}L + {MH_B[k]}L) % {MH_P}L) AS m{k}"
    for k in range(N_MINHASH)
]


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """K min-hashes per doc.

    The shingle string is hashed ONCE (md5 → 31-bit int); the K
    permutations are then two integer ops each on that int instead of
    re-hashing the variable-length string K times — same trick as the
    earlier xxhash64 variant, and the affine maps are cheaper than K
    hash calls."""
    return (
        sh.withColumn("_h", minhash_base_hash(F.col("sh")))
        .groupBy("doc_id")
        .agg(*[F.expr(e) for e in _MH_MIN_EXPRS])
    )


def _minhash_oracle() -> str:
    """DuckDB replay of the full MinHash+LSH+verify pipeline — generated
    (32 affine mins, 8 band keys) from the same constants the engine
    uses, so the two can't drift."""
    mins = ",\n             ".join(
        f"min((h * {MH_A[k]} + {MH_B[k]}) % {MH_P}) AS m{k}"
        for k in range(N_MINHASH)
    )
    bands = "\n      UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, concat_ws('_', {ms}) AS band_key"
        " FROM sig".format(
            b=b,
            ms=", ".join(
                f"m{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(N_BANDS)
    )
    return f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, s
      FROM tok,
           UNNEST(list_transform(range(1, greatest(len(t) - {N_SHINGLE - 1}, 0) + 1),
                                 i -> array_to_string(list_slice(t, i, i + {N_SHINGLE - 1}), ' '))) AS u(s)
    ),
    hh AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(s), 1, 8))::UBIGINT % {MH_P} AS BIGINT) AS h
      FROM sh),
    sig AS (
      SELECT doc_id,
             {mins}
      FROM hh GROUP BY doc_id),
    bands AS (
      {bands}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc1, c.doc2, count(*) AS n_inter
      FROM cand c
      JOIN sh x ON x.doc_id = c.doc1
      JOIN sh y ON y.doc_id = c.doc2 AND y.s = x.s
      GROUP BY 1, 2)
    SELECT doc1, doc2,
           round(CAST(n_inter AS DOUBLE) / (s1.n_sh + s2.n_sh - n_inter), 4)
             AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.doc_id = doc1
    JOIN sizes s2 ON s2.doc_id = doc2
    WHERE CAST(n_inter AS DOUBLE) / (s1.n_sh + s2.n_sh - n_inter)
            > {JACCARD_THRESHOLD}
    """


@query("q_dedup_minhash", oracle=_minhash_oracle())
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dedup via MinHash + LSH banding + exact verification.

    Pipeline: shingle → K=32 minhashes/doc → 8 bands of 4 hashes →
    same-(band, band-key) candidate pairs → exact Jaccard on candidates
    only → J > 0.6. ~O(n) at scale: signature size is constant and only
    colliding docs are compared.

    SQL-oracled as of r5 (was the last rows-only §2B main-table key):
    the portable md5+affine hash family (see minhash_signatures) lets a
    DuckDB query replay signatures, banding, candidates, and the exact
    verify bit-for-bit, so the full output hash-matches.

    Verification is strictly O(|candidates|): the shingle set is first
    semi-joined down to candidate docs (broadcast — the candidate id set
    is tiny by LSH construction), each surviving doc's shingles are
    collected into one array row, and Jaccard is computed per candidate
    pair via ``array_intersect`` on a broadcast join of the pair list.
    No all-pairs posting join ever runs on the full corpus (2.2× faster
    than the semi-join-after-the-fact plan it replaces at sf0.1).

    Band identity joins on the raw 4-minhash tuple (concat_ws key, 4
    longs ≈ 40 bytes) rather than re-hashing it — at cluster scale you
    would hash the tuple to 8 bytes before the shuffle; semantics are
    identical, and the tuple key is what keeps the oracle exact.
    """
    return minhash_near_dup_pairs(load_table(spark, sf_dir, "documents"))


def minhash_banded(sig: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_hash) — one row per band per doc; the
    LSH bucket table candidates come from. Built via pre-rendered
    selectExpr strings (see _MH_MIN_EXPRS rationale)."""
    bands = ", ".join(
        "struct({b} AS band_idx, concat_ws('_', {ms}) AS band_hash)".format(
            b=b,
            ms=", ".join(
                f"m{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(N_BANDS)
    )
    return sig.selectExpr(
        "doc_id", f"explode(array({bands})) AS bk"
    ).selectExpr("doc_id", "bk.band_idx", "bk.band_hash")


def minhash_near_dup_pairs(d: DataFrame) -> DataFrame:
    """MinHash+LSH+exact-verify core of q_dedup_minhash over any
    (doc_id, text) frame — exposed so the bench scaling probe can run
    it on synthetic 1×/10× corpora and count candidate pairs."""
    # cache: shingles feed signatures + verification (released at the
    # next registered-query call — see registry.persist_tracked)
    sh = persist_tracked(shingles(d))
    # r13: persist the banded bucket table too — the candidate self-join
    # references it on BOTH sides, and each side otherwise re-runs the
    # md5 base hash + 32-way min aggregation from the cached shingles
    # (Spark dedupes identical subplans only at exchange boundaries;
    # same fix the bench's scale_minhash_candidate_pairs already carries)
    banded = persist_tracked(minhash_banded(minhash_signatures(sh)))
    left = banded.select(
        F.col("doc_id").alias("doc1"), "band_idx", "band_hash"
    )
    right = banded.select(
        F.col("doc_id").alias("doc2"), "band_idx", "band_hash"
    )
    candidates = persist_tracked(
        left.join(right, ["band_idx", "band_hash"])
        .where(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )  # candidate set is tiny (near-dup pairs); reused 3×
    cand_docs = (
        candidates.select(F.col("doc1").alias("doc_id"))
        .union(candidates.select("doc2"))
        .distinct()
    )
    docsets = persist_tracked(
        sh.join(F.broadcast(cand_docs), "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("sh").alias("s"), F.count(F.lit(1)).alias("n"))
    )  # one array row per candidate doc; probed by both pair sides
    n_inter = F.size(F.array_intersect("s1", "s2"))
    return (
        F.broadcast(candidates)
        .join(
            docsets.select(
                F.col("doc_id").alias("doc1"),
                F.col("s").alias("s1"),
                F.col("n").alias("n1"),
            ),
            "doc1",
        )
        .join(
            docsets.select(
                F.col("doc_id").alias("doc2"),
                F.col("s").alias("s2"),
                F.col("n").alias("n2"),
            ),
            "doc2",
        )
        .select(
            "doc1",
            "doc2",
            (
                n_inter.cast("double") / (F.col("n1") + F.col("n2") - n_inter)
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") > JACCARD_THRESHOLD)
        .select("doc1", "doc2", F.round("jaccard", 4).alias("jaccard"))
    )


# SimHash geometry (r5: portable md5 base hash, was xxhash64): 60 bits
# (15 md5 hex chars fit a BIGINT exactly on both engines) in 4 bands of
# 15. Same-band collision still bounds Hamming distance ≤ 3 across the
# remaining bands; the 4-hex-char band rendering is unchanged (15-bit
# values occupy the same lpad(hex, 4) width).
SIMHASH_BITS = 60
SIMHASH_BAND_BITS = SIMHASH_BITS // 4


def _simhash_oracle() -> str:
    """DuckDB replay of the bit-majority fingerprint — generated from
    the same bit/band constants the engine uses."""
    sums = ",\n             ".join(
        f"sum(((h >> {j}) & 1) * 2 - 1) AS s{j}" for j in range(SIMHASH_BITS)
    )
    def band(c: int) -> str:
        bits = " + ".join(
            f"(CASE WHEN s{SIMHASH_BAND_BITS * c + j} > 0"
            f" THEN {1 << j} ELSE 0 END)"
            for j in range(SIMHASH_BAND_BITS)
        )
        return f"CAST({bits} AS INT) AS band{c}"

    bands = ",\n             ".join(band(c) for c in range(4))
    hexcat = ", ".join(f"lpad(hex(band{c}), 4, '0')" for c in (3, 2, 1, 0))
    return f"""
    WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                 FROM documents),
    hh AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(tok), 1, 15))::UBIGINT AS BIGINT) AS h
      FROM tok),
    sums AS (
      SELECT doc_id,
             {sums}
      FROM hh GROUP BY doc_id),
    bands AS (
      SELECT doc_id,
             {bands}
      FROM sums)
    SELECT doc_id, concat({hexcat}) AS simhash_hex,
           band0, band1, band2, band3
    FROM bands
    """


@query("q_dedup_simhash", oracle=_simhash_oracle())
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints: 60-bit weighted-majority hash of the token
    multiset, emitted as 4×15-bit bands (same-band collision ⇒ candidate
    pair with Hamming ≤ 3 guaranteed found).

    Per-doc output (fingerprint table); pairing is a groupBy on any band
    at scale. Token weights = term frequency (explode without distinct).

    SQL-oracled as of r5 (was rows-only): the base hash is the first 15
    md5 hex chars of the token — a 60-bit integer both engines compute
    identically — so the bit-majority sums, band assembly, and hex
    rendering replay exactly in DuckDB.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).withColumn(
        "h", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    )
    # bit-majority sums: Σ over tokens of ±1 per bit position
    sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                (F.shiftright("h", j).bitwiseAND(F.lit(1)) * 2 - 1)
            ).alias(f"s{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    # assemble 15-bit band integers from sign bits
    def band(c: int):
        return sum(
            [
                F.when(
                    F.col(f"s{SIMHASH_BAND_BITS * c + j}") > 0, F.lit(1 << j)
                ).otherwise(F.lit(0))
                for j in range(SIMHASH_BAND_BITS)
            ],
            start=F.lit(0),
        ).cast("int").alias(f"band{c}")

    out = sums.select(
        "doc_id", band(0), band(1), band(2), band(3)
    )
    return out.select(
        "doc_id",
        F.concat(
            *[F.lpad(F.hex(F.col(f"band{c}")), 4, "0") for c in (3, 2, 1, 0)]
        ).alias("simhash_hex"),
        "band0",
        "band1",
        "band2",
        "band3",
    )


@query(
    "q_dedup_clusters",
    # oracle: transitive closure as a recursive CTE — min reachable id
    # per node == min-label-propagation fixpoint
    oracle=f"""
    WITH RECURSIVE {_shingle_pair_ctes()}{_JACCARD_PAIRS_CTE},
    edges AS (SELECT doc1, doc2 FROM pairs UNION ALL SELECT doc2, doc1 FROM pairs),
    walk(doc_id, label) AS (
      SELECT doc1, doc1 FROM edges
      UNION
      SELECT e.doc1, w.label FROM walk w JOIN edges e ON e.doc2 = w.doc_id
    )
    SELECT doc_id, CAST(min(label) AS BIGINT) AS cluster_id,
           (doc_id = min(label)) AS is_representative
    FROM walk GROUP BY doc_id
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup cluster formation: connected components over the exact
    near-dup pair graph (J > 0.6), labeling each duplicate doc with its
    cluster representative (min doc_id in the component) — the final
    step of a dedup cascade: keep `doc_id == cluster_id`, drop the rest.
    SQL-checked: the oracle expresses the same fixpoint as a recursive
    CTE (min reachable id over the transitive closure).

    Algorithm: iterative min-label propagation (the Pregel pattern as
    plain DataFrame joins) — see ``min_label_components``; rounds
    needed = component diameter, tiny for near-dup clusters
    (pairs/chains of a few docs) and MEASURED, not asserted: bench's
    ``scaling_10x.q_dedup_clusters`` probe plants deep chains and
    records rounds-to-fixpoint == diameter + 1 confirm round.
    """
    d = load_table(spark, sf_dir, "documents")
    pairs = (
        exact_jaccard_pairs(shingles(d))
        .where(F.col("jaccard") > JACCARD_THRESHOLD)
        .select("doc1", "doc2")
    )
    # undirected: propagate both ways
    edges = persist_tracked(
        pairs.union(
            pairs.select(F.col("doc2").alias("doc1"), F.col("doc1").alias("doc2"))
        )
    )
    labels = min_label_components(edges, key="q_dedup_clusters")
    return labels.select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        (F.col("doc_id") == F.col("label")).alias("is_representative"),
    )


# rounds-to-fixpoint of the last min_label_components run, by caller key
# (same shape as graph.CC_LAST_ROUNDS) — bench reads this for the
# rounds-vs-diameter receipt
MINLABEL_LAST_ROUNDS: dict = {}


def min_label_components(edges: DataFrame, max_rounds: int = 64,
                         key: str = "default") -> DataFrame:
    """Connected components by iterative min-label propagation over a
    BIDIRECTIONAL edge list (doc1, doc2) → (doc_id, label = component
    min). Each round every node takes the min of its own label and its
    neighbors' — one join + one 1-row convergence aggregate, fully
    distributed; rounds-to-fixpoint = component diameter (+1 round to
    confirm the sum stopped moving), which bench measures on planted
    chains of diameter 5 and 20.

    The cap is a safety valve, not a semantic bound: a graph whose
    diameter exceeds it RAISES instead of silently returning labels
    that never reached the component min (the pre-r9 16-round cap broke
    exactly that way on a planted 20-deep chain). Deep graphs belong on
    the log-round large-star/small-star path (graph.cc_from_edges);
    near-dup cluster graphs converge in a handful of rounds.

    Scale note: each round is ``localCheckpoint``ed, exactly as in
    q_graph_cc (graph.py) — a persist alone leaves Catalyst
    re-analyzing a logical plan that NESTS the prior round's plan, so
    at depth ~16 analysis time grows exponentially even though
    execution reuses the cache. localCheckpoint truncates lineage after
    eagerly materializing the round (reliable checkpoint() on a cluster
    with lossy executors); dropping the Python reference each round
    makes the prior round's checkpoint RDD unreachable and
    ContextCleaner frees it on GC.
    """
    labels = (
        edges.select(F.col("doc1").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("label"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    rounds = 0
    converged = prev_sum is None  # empty graph: nothing to propagate
    while not converged and rounds < max_rounds:
        nbr = (
            edges.join(labels, edges.doc2 == labels.doc_id)
            .groupBy("doc1")
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr, labels.doc_id == nbr.doc1, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        rounds += 1
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        converged = new_sum == prev_sum
        prev_sum = new_sum
    MINLABEL_LAST_ROUNDS[key] = rounds
    if not converged:
        raise RuntimeError(
            f"min_label_components: no fixpoint after {max_rounds} rounds "
            "— component diameter exceeds the cap; raise max_rounds or "
            "use the log-round graph.cc_from_edges for deep graphs"
        )
    return labels


EDITDIST_BAND = 3        # n_chars band width for blocking
EDITDIST_LEN_TOL = 2     # max length difference within a candidate pair
EDITDIST_HEAD = 32       # prefix compared
EDITDIST_MAX = 16        # max edit distance reported (non-trivial at sf0.01+)


@query(
    "q_dedup_editdist",
    oracle=f"""
    SELECT doc_id_a, doc_id_b, dist FROM (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             CAST(levenshtein(substring(a.text, 1, {EDITDIST_HEAD}),
                              substring(b.text, 1, {EDITDIST_HEAD})) AS INT) AS dist
      FROM documents a JOIN documents b
        ON a.lang = b.lang
       AND abs(a.n_chars - b.n_chars) <= {EDITDIST_LEN_TOL}
       AND a.doc_id < b.doc_id)
    WHERE dist <= {EDITDIST_MAX}
    """,
)
def q_dedup_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup verification with banded blocking: candidate
    pairs come from an EQUI-join on (lang, length-band) — each left doc
    explodes to its band and both neighbors, so any pair within the
    length tolerance meets in exactly one band (|band_a − band_b| ≤ 1 is
    implied by |Δlen| ≤ 2 < band width, and the right side's band is
    unique → no duplicate pairs) — then Levenshtein on 32-char heads,
    early-exited at the threshold (Spark's 3-arg levenshtein).

    Scale shape: the blocking join is a hash equi-join (never a
    length-range theta join, never all-pairs); candidates per doc are
    bounded by band occupancy, and the quadratic verify runs on
    candidates only — the same cascade shape as minhash→verify. Edit
    distance is an exact integer on both engines."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars",
        F.substring("text", 1, EDITDIST_HEAD).alias("head"),
    )
    band = (F.col("n_chars") / EDITDIST_BAND).cast("long")
    left = d.select(
        F.col("doc_id").alias("doc_id_a"),
        F.col("lang").alias("lang_a"),
        F.col("n_chars").alias("len_a"),
        F.col("head").alias("head_a"),
        F.explode(F.array(band - 1, band, band + 1)).alias("band"),
    )
    right = d.select(
        F.col("doc_id").alias("doc_id_b"),
        F.col("lang").alias("lang_b"),
        F.col("n_chars").alias("len_b"),
        F.col("head").alias("head_b"),
        band.alias("band"),
    )
    pairs = left.join(
        right,
        (left.lang_a == right.lang_b)
        & (left.band == right.band)
        & (left.doc_id_a < right.doc_id_b)
        & (F.abs(left.len_a - right.len_b) <= EDITDIST_LEN_TOL),
    )
    dist = F.levenshtein("head_a", "head_b", EDITDIST_MAX)
    return (
        pairs.select("doc_id_a", "doc_id_b", dist.alias("dist"))
        .where(F.col("dist") >= 0)
    )


CONTAINMENT_THRESHOLD = 0.8


@query(
    "q_dedup_containment",
    oracle=f"""
    WITH {_shingle_pair_ctes()}
    SELECT doc1, doc2,
           CAST(n_inter AS DOUBLE) / least(s1.n_sh, s2.n_sh) AS containment
    FROM inter
    JOIN sizes s1 ON s1.doc_id = doc1
    JOIN sizes s2 ON s2.doc_id = doc2
    WHERE CAST(n_inter AS DOUBLE) / least(s1.n_sh, s2.n_sh)
          > {CONTAINMENT_THRESHOLD}
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle CONTAINMENT near-dup pairs: |A∩B| / min(|A|, |B|) > 0.8 —
    the asymmetric overlap measure that catches a short document quoted
    wholesale inside a longer one, which symmetric Jaccard misses (the
    union in its denominator is dominated by the longer doc). The
    standard companion to Jaccard in corpus dedup (Broder's containment).

    Scale shape: identical posting-list core as q_dedup_ngram_jaccard
    (pair_overlap_counts — one shingle shuffle, df-capped fan-out,
    broadcast size tables); only the final ratio differs. The ratio is
    one IEEE division of two exact integers → bit-identical cross-engine,
    threshold and value both UNROUNDED."""
    d = load_table(spark, sf_dir, "documents")
    sh = shingles(d)
    counts = pair_overlap_counts(sh)
    containment = F.col("n_inter").cast("double") / F.least(
        F.col("n1"), F.col("n2")
    )
    return (
        counts.select("doc1", "doc2", containment.alias("containment"))
        .where(F.col("containment") > CONTAINMENT_THRESHOLD)
    )


BOILER_MIN_DF = 3   # shingle must appear in >= this many docs
BOILER_TOP = 50     # report the hottest N


@query(
    "q_text_boilerplate",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, s
      FROM tok,
           UNNEST(list_transform(range(1, greatest(len(t) - {N_SHINGLE - 1}, 0) + 1),
                                 i -> array_to_string(list_slice(t, i, i + {N_SHINGLE - 1}), ' '))) AS u(s))
    SELECT s AS shingle, df, sample_docs FROM (
      SELECT s, CAST(count(*) AS BIGINT) AS df,
             array_to_string(list_sort(list(doc_id))[1:3], ',') AS sample_docs,
             row_number() OVER (ORDER BY count(*) DESC, s) AS rn
      FROM sh GROUP BY s
      HAVING count(*) >= {BOILER_MIN_DF})
    WHERE rn <= {BOILER_TOP}
    """,
)
def q_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate n-gram mining: the {N_SHINGLE}-gram shingles shared by
    >= {BOILER_MIN_DF} documents, hottest {BOILER_TOP} first with 3 sample
    doc ids each — the mining pass behind headers/footers/license-block
    removal in corpus cleaning, and the explicit complement of the dedup
    family's df-cap (the shingles THAT cap drops are exactly the ones
    reported here).

    Scale shape: one map-side-combinable hash agg over (shingle, doc) —
    the same posting aggregation the Jaccard family pays — then
    TakeOrderedAndProject for the top-{BOILER_TOP} (no global sort). The
    3-element sample bounds per-row payload: collect_list is capped via
    slice AFTER sort, and a hot shingle's full posting list never leaves
    the executors un-truncated... except inside the agg buffer itself;
    at true 100 TB swap collect_list for a bounded min-k sketch
    (aggregate expression) — noted, not needed at fixture df <= 6.
    """
    d = load_table(spark, sf_dir, "documents")
    sh = shingles(d)
    return (
        sh.groupBy("sh")
        .agg(
            F.count(F.lit(1)).alias("df"),
            # Stringified (not a raw array column): the driver canonicalizer
            # sorts pandas values and dies on unhashable ndarray cells — every
            # driver-facing output column must be a sortable scalar type
            # (enforced by tests/test_registry.py::test_no_complex_output_columns).
            F.array_join(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, 3), ","
            ).alias("sample_docs"),
        )
        .where(F.col("df") >= BOILER_MIN_DF)
        .orderBy(F.col("df").desc(), F.col("sh"))
        .limit(BOILER_TOP)
        .select(F.col("sh").alias("shingle"), "df", "sample_docs")
    )


def canonical_url_expr(url_col: str):
    """Canonical form of a URL column: scheme/host lowercased, default
    :443 port dropped, trailing path slashes stripped, fragment
    discarded, utm_* params removed, surviving params sorted. IDEMPOTENT
    (canonical(canonical(u)) == canonical(u) — property-tested in
    tests/test_properties.py) and pure codegen (regex + array ops, no
    shuffle, no Python)."""
    scheme = F.lower(F.regexp_extract(url_col, r"^([A-Za-z]+)://", 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url_col, r"^[A-Za-z]+://([^/?#]+)", 1)),
        ":443$", "")
    path = F.regexp_replace(
        F.regexp_extract(url_col, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1),
        "/+$", "")
    qs = F.regexp_extract(url_col, r"\?([^#]*)", 1)
    cq = F.array_join(
        F.array_sort(
            F.filter(
                F.split(qs, "&"),
                lambda x: (~x.startswith("utm_")) & (x != ""),
            )
        ),
        "&",
    )
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(cq == "", "").otherwise(F.concat(F.lit("?"), cq)),
    )


@query(
    "q_dedup_url",
    oracle="""
    WITH raw AS (
      SELECT event_id,
             CASE event_id % 6
               WHEN 0 THEN 'https://shop.example.com/p/' || (user_id % 40)
                           || '?ref=' || (event_id % 3)
               WHEN 1 THEN 'HTTPS://SHOP.EXAMPLE.COM/p/' || (user_id % 40)
                           || '?ref=' || (event_id % 3)
               WHEN 2 THEN 'https://shop.example.com:443/p/' || (user_id % 40)
                           || '?ref=' || (event_id % 3)
               WHEN 3 THEN 'https://shop.example.com/p/' || (user_id % 40)
                           || '/?ref=' || (event_id % 3)
               WHEN 4 THEN 'https://shop.example.com/p/' || (user_id % 40)
                           || '?utm_source=mail&ref=' || (event_id % 3)
               ELSE 'https://shop.example.com/p/' || (user_id % 40)
                    || '?ref=' || (event_id % 3)
                    || '&utm_campaign=x#frag'
             END AS url
      FROM events),
    parts AS (
      SELECT url,
             lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
             regexp_replace(
               lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
               ':443$', '') AS host,
             regexp_replace(
               regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
               '/+$', '') AS path,
             regexp_extract(url, '\\?([^#]*)', 1) AS qs
      FROM raw),
    canon AS (
      SELECT url,
             scheme || '://' || host || path ||
             CASE WHEN cq = '' THEN '' ELSE '?' || cq END AS canonical_url
      FROM (
        SELECT url, scheme, host, path,
               array_to_string(
                 list_sort(list_filter(string_split(qs, '&'),
                                       x -> x NOT LIKE 'utm_%' AND x <> '')),
                 '&') AS cq
        FROM parts))
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_raw,
           CAST(count(DISTINCT url) AS BIGINT) AS n_variants
    FROM canon
    GROUP BY canonical_url
    """,
)
def q_dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup — the first normalization pass of a
    web-crawl pipeline (CommonCrawl-style): scheme/host lowercased,
    default :443 port dropped, trailing path slashes stripped, fragments
    discarded, ``utm_*`` tracking parameters removed, and surviving query
    parameters SORTED so parameter order can't split a page's count.
    Emits each canonical URL with its raw-occurrence count and the number
    of distinct raw spellings it absorbed.

    The fixture has no URL column, so raw URLs are planted
    deterministically from events (six spelling variants per canonical
    target — same synthetic-plant precedent as q_text_pii); the
    normalization expressions are the operator under test and are the
    identical regex/array pipeline on both engines.

    Scale shape: canonicalization is a narrow, zero-shuffle expression
    chain (regexp + array ops inside codegen); the shuffles are the
    groupBy canonical_url plus the count-distinct expansion's second
    pass (both keyed on the canonical key) — the hash-partitioned dedup
    of q_dedup_exact, after the key has been made collision-correct."""
    e = load_table(spark, sf_dir, "events")
    k = F.pmod(F.col("user_id"), F.lit(40)).cast("string")
    r = F.pmod(F.col("event_id"), F.lit(3)).cast("string")
    base = F.concat(F.lit("https://shop.example.com/p/"), k)
    variants = (
        F.when(F.pmod("event_id", F.lit(6)) == 0,
               F.concat(base, F.lit("?ref="), r))
        .when(F.pmod("event_id", F.lit(6)) == 1,
              F.concat(F.lit("HTTPS://SHOP.EXAMPLE.COM/p/"), k, F.lit("?ref="), r))
        .when(F.pmod("event_id", F.lit(6)) == 2,
              F.concat(F.lit("https://shop.example.com:443/p/"), k, F.lit("?ref="), r))
        .when(F.pmod("event_id", F.lit(6)) == 3,
              F.concat(base, F.lit("/?ref="), r))
        .when(F.pmod("event_id", F.lit(6)) == 4,
              F.concat(base, F.lit("?utm_source=mail&ref="), r))
        .otherwise(F.concat(base, F.lit("?ref="), r, F.lit("&utm_campaign=x#frag")))
    )
    raw = e.select("event_id", variants.alias("url"))
    return (
        raw.select("url", canonical_url_expr("url").alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.count_distinct("url").alias("n_variants"),
        )
    )


PR_DAMPING = 0.85
PR_TELEPORT = 0.15  # 1 - PR_DAMPING, spelled exactly (no float re-derivation)
PR_ITERS = 3


def pagerank_from_edges(edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """The PageRank iteration core on a DIRECTED (src, dst) edge list
    with no dangling nodes (every node appears as a src) — shared by
    q_graph_pagerank and tools/scale100_probe.py --pagerank so the 100×
    receipt measures the exact plan the registry key runs.

    Scale shape (the q_graph_pagerank contract): edges hash-partitioned
    by src ONCE, degree-annotated ONCE, and persisted; each unrolled
    iteration is one join (rank lands on the edges' partitioning) plus
    one groupBy-dst shuffle of |V| partial sums — linear in |E| per
    iteration. r13 (guide §2.4): the out-degree rides ON the persisted
    edge table instead of being re-joined onto the rank vector every
    iteration — that join shuffled (or AQE-broadcast-built) an O(|V|)
    table once per iteration for a value that never changes; now deg
    attaches to the returned frame once at the end. The O(|V|) degree
    table carries NO broadcast hint (AQE decides); only the 1-row |V|
    count is hint-broadcast. One Catalyst plan, no driver collect
    between iterations. Returns (id, deg, r) unrounded."""
    # One exchange builds the whole iteration-side table: repartition by
    # src, and the degree window rides that same partitioning BEFORE the
    # persist (an InMemoryRelation compiled under AQE reports unknown
    # partitioning, so anything computed after the cache would pay a
    # fresh exchange — measured on this Spark: cached repartitioned
    # frames re-shuffle for a same-key groupBy/window).
    ed = persist_tracked(
        edges.repartition("src").withColumn(
            "deg", F.count(F.lit(1)).over(Window.partitionBy("src"))
        )
    )
    # O(|V|) (src, deg) table for the |V| count and the final output
    # columns only — no longer touched inside the iterations. max() of a
    # per-partition-constant column == the column's value.
    deg = persist_tracked(
        ed.groupBy("src").agg(F.max("deg").alias("deg"))
    )
    nv = deg.agg(F.count(F.lit(1)).cast("double").alias("n"))
    r = (
        deg.select(F.col("src").alias("id"))
        .crossJoin(F.broadcast(nv))
        .select("id", (F.lit(1.0) / F.col("n")).alias("r"))
    )
    for _ in range(iters):
        contrib = ed.join(
            r.withColumnRenamed("id", "src_id"),
            F.col("src") == F.col("src_id"),
        ).select("dst", (F.col("r") / F.col("deg")).alias("m"))
        r = (
            contrib.groupBy("dst")
            .agg(F.sum("m").alias("s"))
            .crossJoin(F.broadcast(nv))
            .select(
                F.col("dst").alias("id"),
                (PR_TELEPORT / F.col("n") + PR_DAMPING * F.col("s")).alias("r"),
            )
        )
    return r.join(deg, r["id"] == deg["src"]).select("id", "deg", "r")


@query(
    "q_graph_pagerank",
    oracle=f"""
    WITH {_shingle_pair_ctes()}{_JACCARD_PAIRS_CTE},
    edges AS (SELECT doc1 AS src, doc2 AS dst FROM pairs
              UNION ALL SELECT doc2, doc1 FROM pairs),
    deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
            FROM edges GROUP BY src),
    nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
    r0 AS (SELECT id, deg, 1.0 / (SELECT n FROM nv) AS r FROM deg),
    r1 AS (SELECT e.dst AS id, d.deg,
                  {PR_TELEPORT} / (SELECT n FROM nv)
                  + {PR_DAMPING} * sum(p.r / p.deg) AS r
           FROM edges e JOIN r0 p ON p.id = e.src JOIN deg d ON d.id = e.dst
           GROUP BY e.dst, d.deg),
    r2 AS (SELECT e.dst AS id, d.deg,
                  {PR_TELEPORT} / (SELECT n FROM nv)
                  + {PR_DAMPING} * sum(p.r / p.deg) AS r
           FROM edges e JOIN r1 p ON p.id = e.src JOIN deg d ON d.id = e.dst
           GROUP BY e.dst, d.deg),
    r3 AS (SELECT e.dst AS id, d.deg,
                  {PR_TELEPORT} / (SELECT n FROM nv)
                  + {PR_DAMPING} * sum(p.r / p.deg) AS r
           FROM edges e JOIN r2 p ON p.id = e.src JOIN deg d ON d.id = e.dst
           GROUP BY e.dst, d.deg)
    SELECT id AS doc_id, deg, round(r, 8) AS pagerank FROM r3
    """,
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (PR_ITERS=3 statically-unrolled power iterations,
    d=0.85) over the exact near-dup pair graph — graph analytics as plain
    DataFrame joins, no graph framework: rank mass flows along the same
    J > 0.6 edges that q_dedup_clusters components, surfacing the most
    central document of every duplicate cluster (the natural KEEP choice
    when collapsing a near-dup group: highest-connectivity copy rather
    than lowest doc_id).

    The undirected dedup graph has no dangling nodes (every node in the
    edge list has degree ≥ 1), so the classic teleport formulation
    r' = 0.15/|V| + 0.85·Σ r(u)/deg(u) needs no dangling-mass patch and
    is the IDENTICAL expression tree on both engines (one final 8dp
    round absorbs sum-order drift).

    Scale shape: edges are hash-partitioned by src ONCE and persisted;
    each iteration is one join (rank table moves to the edges'
    partitioning) plus one groupBy-dst shuffle carrying |V| partial
    sums — the standard distributed PageRank plan, linear per iteration.
    The per-node degree table is O(|V|) (unbounded on a 100 TB graph) so
    its per-iteration join carries NO broadcast hint — it lands on the
    groupBy(dst)'s existing partitioning, and AQE broadcasts it when the
    graph is actually small; only the 1-row |V| count is hint-broadcast.
    The unrolled loop builds ONE Catalyst plan (no driver-side collect
    between iterations)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = (
        exact_jaccard_pairs(shingles(d))
        .where(F.col("jaccard") > JACCARD_THRESHOLD)
        .select("doc1", "doc2")
    )
    edges = pairs.selectExpr("doc1 AS src", "doc2 AS dst").unionByName(
        pairs.selectExpr("doc2 AS src", "doc1 AS dst")
    )
    r = pagerank_from_edges(edges, iters=PR_ITERS)
    return r.select(
        F.col("id").alias("doc_id"), "deg", F.round("r", 8).alias("pagerank")
    )


CHUNK_TOKENS = 16  # non-overlapping chunk width for exact chunk dedup


@query(
    "q_dedup_chunks",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    chunks AS (
      SELECT doc_id,
             unnest([array_to_string(list_slice(t, i, i + {CHUNK_TOKENS} - 1), ' ')
                     FOR i IN range(1, len(t) + 1, {CHUNK_TOKENS})]) AS chunk
      FROM tok),
    df AS (
      SELECT chunk, count(DISTINCT doc_id) AS n_docs_with
      FROM chunks GROUP BY chunk),
    flagged AS (
      SELECT c.doc_id,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(CASE WHEN d.n_docs_with > 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_dup_chunks
      FROM chunks c JOIN df d ON d.chunk = c.chunk
      GROUP BY c.doc_id)
    SELECT doc_id, n_chunks, n_dup_chunks,
           round(CAST(n_dup_chunks AS DOUBLE) / n_chunks, 6) AS dup_ratio
    FROM flagged
    """,
)
def q_dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact chunk-level cross-document dedup: every doc is cut into
    NON-OVERLAPPING {16}-token chunks and a chunk is duplicated when the
    identical token run appears in more than one document — the
    passage-reuse detector that catches verbatim copying (licensing
    boilerplate, syndicated paragraphs, template text) that
    set-based shingle Jaccard smooths over. Per doc: chunk count,
    duplicated-chunk count, duplication ratio — the curation gate drops
    docs above a dup_ratio threshold.

    Complementary trio: q_dedup_ngram_jaccard (symmetric overlap),
    q_dedup_containment (asymmetric quote inclusion), THIS (contiguous
    verbatim reuse, positional).

    Scale shape: chunking is a zero-shuffle higher-order slice (stepped
    sequence — 1/16th the rows of overlapping shingles); chunk
    document-frequency is one hash agg on the chunk text (at 100 TB,
    hash the chunk to a 128-bit key first so the shuffle moves 16-byte
    keys, not 16-token strings); the per-doc rollup joins chunks back to
    their bounded df counts."""
    d = load_table(spark, sf_dir, "documents")
    chunks = persist_tracked(
        d.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(size(split(text, ' ')), 1), {CHUNK_TOKENS}), "
                    f"i -> array_join(slice(split(text, ' '), i, {CHUNK_TOKENS}), ' '))"
                )
            ).alias("chunk"),
        )
    )
    df = chunks.groupBy("chunk").agg(
        F.count_distinct("doc_id").alias("n_docs_with")
    )
    flagged = (
        chunks.join(df, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("n_docs_with") > 1, 1).otherwise(0)).alias(
                "n_dup_chunks"
            ),
        )
    )
    return flagged.select(
        "doc_id",
        "n_chunks",
        "n_dup_chunks",
        F.round(
            F.col("n_dup_chunks").cast("double") / F.col("n_chunks"), 6
        ).alias("dup_ratio"),
    )


INCR_BATCH_MOD = 5  # doc_id % 5 == 0 → the arriving "new" batch


@query(
    "q_dedup_incremental",
    oracle=f"""
    WITH corpus AS (
      SELECT md5(text) AS fp FROM documents
      WHERE doc_id % {INCR_BATCH_MOD} <> 0),
    batch AS (
      SELECT doc_id, lang, md5(text) AS fp,
             row_number() OVER (PARTITION BY md5(text)
                                ORDER BY doc_id) AS rn
      FROM documents WHERE doc_id % {INCR_BATCH_MOD} = 0),
    classified AS (
      SELECT b.lang,
             CASE WHEN b.rn > 1 THEN 'dup_within_batch'
                  WHEN c.fp IS NOT NULL THEN 'dup_vs_corpus'
                  ELSE 'new' END AS status
      FROM batch b LEFT JOIN (SELECT DISTINCT fp FROM corpus) c
        ON c.fp = b.fp)
    SELECT lang, status, CAST(count(*) AS BIGINT) AS n_docs
    FROM classified GROUP BY lang, status
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup — the operational shape every
    continuously-growing corpus needs: an arriving batch is deduped (1)
    WITHIN itself (first occurrence per fingerprint wins, by stable
    doc_id order) and (2) AGAINST the existing corpus via its
    fingerprint set, classifying every batch doc as new /
    dup-within-batch / dup-vs-corpus per language. Running full-corpus
    dedup on every arrival re-reads everything; this plan touches the
    corpus only as a fingerprint column.

    Scale shape: the corpus side reduces to distinct md5 fingerprints
    (16-byte keys, columnar-pruned scan of just `text` — in production a
    maintained fingerprint table, the q_e2e_incremental_rollup
    discipline); within-batch dedup is one window on the fingerprint;
    the corpus check is a fingerprint equi-join (semi-join shaped,
    expressed as LEFT JOIN + null test so both dup classes emerge from
    one pass). Counts exact."""
    d = load_table(spark, sf_dir, "documents")
    is_batch = F.col("doc_id") % INCR_BATCH_MOD == 0
    corpus_fp = (
        d.where(~is_batch).select(F.md5("text").alias("fp")).distinct()
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    batch = (
        d.where(is_batch)
        .select("doc_id", "lang", F.md5("text").alias("fp"))
        .withColumn("rn", F.row_number().over(w))
    )
    classified = batch.join(
        corpus_fp.withColumnRenamed("fp", "cfp"),
        F.col("fp") == F.col("cfp"),
        "left",
    ).select(
        "lang",
        F.when(F.col("rn") > 1, "dup_within_batch")
        .when(F.col("cfp").isNotNull(), "dup_vs_corpus")
        .otherwise("new")
        .alias("status"),
    )
    return classified.groupBy("lang", "status").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


SUB_N = 8        # positional shingle width for verbatim-run mining
SUB_MIN_RUN = 8  # report pairs sharing >=1 uncommon SUB_N-token run
# Within-pair position budget (r4 verdict item 4): a shingle occurring
# p_a times in doc a and p_b times in doc b contributes p_a*p_b matched
# positions — the one quadratic term DF_CAP (distinct-doc fan-out) does
# not bound. Capping occurrences per (doc, shingle) at OCC_CAP bounds
# any pair's matched positions at ~len(doc) * OCC_CAP (linear in doc
# length) and per-shingle pair fan-out at OCC_CAP^2. Repeated-boilerplate
# runs longer than ~OCC_CAP*SUB_N tokens are truncated — acceptable: the
# signal is "shares a long verbatim run", already unambiguous there.
OCC_CAP = 8


@query(
    "q_dedup_substring",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    ps AS (
      SELECT doc_id, u.i AS pos,
             array_to_string(t[u.i : u.i + {SUB_N - 1}], ' ') AS sh
      FROM tok, UNNEST(range(1, len(t) - {SUB_N - 2})) AS u(i)),
    keep AS (
      SELECT sh FROM ps GROUP BY sh
      HAVING count(DISTINCT doc_id) BETWEEN 2 AND {DF_CAP}),
    psk AS (
      SELECT doc_id, pos, sh
      FROM (SELECT doc_id, pos, sh,
                   row_number() OVER (PARTITION BY doc_id, sh
                                      ORDER BY pos) AS occ
            FROM ps WHERE sh IN (SELECT sh FROM keep))
      WHERE occ <= {OCC_CAP}),
    m AS (
      SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
      FROM psk a JOIN psk b ON a.sh = b.sh AND a.doc_id < b.doc_id),
    runs AS (
      SELECT da, db, pa - pb AS diag,
             pa - row_number() OVER (
               PARTITION BY da, db, pa - pb ORDER BY pa) AS isl
      FROM m),
    r AS (
      SELECT da, db, CAST(count(*) AS BIGINT) AS len_sh
      FROM runs GROUP BY da, db, diag, isl)
    SELECT da AS doc_a, db AS doc_b,
           CAST(max(len_sh) + {SUB_N - 1} AS BIGINT) AS longest_run_tokens,
           CAST(sum(len_sh) AS BIGINT) AS n_pos_matches,
           CAST(count(*) AS BIGINT) AS n_runs
    FROM r GROUP BY da, db
    HAVING max(len_sh) + {SUB_N - 1} >= {SUB_MIN_RUN}
    """,
)
def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest shared verbatim token run per cross-document pair — the
    suffix-array substring-dedup signal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better") re-expressed relationally:
    POSITIONAL SUB_N-token shingles are equi-joined across documents, and
    matching positions lying on one diagonal (pos_a - pos_b constant) with
    consecutive pos_a form a shared run (gaps-and-islands on the diagonal
    — the q_win_islands trick applied to sequence alignment). A run of m
    consecutive matching shingles is a shared substring of m + SUB_N - 1
    tokens. Unlike set-based Jaccard/containment, this finds and MEASURES
    contiguous verbatim overlap (the memorization-relevant quantity).

    Scale shape: one equi-join shuffle on the shingle text (at 100 TB,
    join on xxhash64(shingle) so the shuffle moves 8-byte keys); the
    df-cap [2, DF_CAP] bounds per-shingle fan-out at C(64,2) exactly like
    q_dedup_ngram_jaccard; the OCC_CAP occurrence cap bounds any single
    pair's matched positions at ~len(doc)*OCC_CAP (the within-pair
    quadratic term df-cap can't see); the diagonal windows partition by
    (pair, diagonal) — many small partitions, no global sort."""
    return verbatim_runs(load_table(spark, sf_dir, "documents"))


def kept_positions(d: DataFrame) -> DataFrame:
    """(doc_id, pos, sh, occ) positional shingles surviving the df-cap,
    with the within-doc occurrence rank — exposed so the bench can count
    exactly how many positions the OCC_CAP budget drops."""
    ps = persist_tracked(
        fan_out(d, "doc_id")
        .select("doc_id", F.split("text", " ").alias("t"))
        .select(
            "doc_id", F.posexplode(F.expr(ngram_expr("t", SUB_N))).alias("pos", "sh")
        )
    )
    keep = (
        ps.groupBy("sh")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where((F.col("nd") >= 2) & (F.col("nd") <= DF_CAP))
        .select("sh")
    )
    occ_w = Window.partitionBy("doc_id", "sh").orderBy("pos")
    return ps.join(keep, "sh").withColumn("occ", F.row_number().over(occ_w))


def verbatim_runs(d: DataFrame, min_run: int = SUB_MIN_RUN) -> DataFrame:
    """Shared-run mining core of q_dedup_substring over any
    (doc_id, text) frame — exposed so tests can plant corpora with known
    longest runs."""
    kept = persist_tracked(
        kept_positions(d).where(F.col("occ") <= OCC_CAP).drop("occ")
    )
    m = (
        kept.select(
            F.col("sh"),
            F.col("doc_id").alias("da"),
            F.col("pos").alias("pa"),
        )
        .join(
            kept.select(
                F.col("sh"),
                F.col("doc_id").alias("db"),
                F.col("pos").alias("pb"),
            ),
            "sh",
        )
        .where(F.col("da") < F.col("db"))
        .drop("sh")
    )
    w = Window.partitionBy("da", "db", "diag").orderBy("pa")
    runs = m.withColumn("diag", F.col("pa") - F.col("pb")).withColumn(
        "isl", F.col("pa") - F.row_number().over(w)
    )
    r = runs.groupBy("da", "db", "diag", "isl").agg(
        F.count(F.lit(1)).alias("len_sh")
    )
    return (
        r.groupBy(F.col("da").alias("doc_a"), F.col("db").alias("doc_b"))
        .agg(
            (F.max("len_sh") + (SUB_N - 1)).cast("long").alias("longest_run_tokens"),
            F.sum("len_sh").cast("long").alias("n_pos_matches"),
            F.count(F.lit(1)).cast("long").alias("n_runs"),
        )
        .where(F.col("longest_run_tokens") >= min_run)
    )


@query(
    "q_dedup_span_scrub",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    chunks AS (
      SELECT doc_id, u.i AS idx,
             array_to_string(t[u.i : u.i + {CHUNK_TOKENS - 1}], ' ') AS chunk
      FROM tok, UNNEST(range(1, len(t) + 1, {CHUNK_TOKENS})) AS u(i)),
    df AS (SELECT chunk, count(DISTINCT doc_id) AS nd FROM chunks GROUP BY chunk),
    j AS (SELECT c.doc_id, c.idx, c.chunk, d.nd
          FROM chunks c JOIN df d ON d.chunk = c.chunk)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_chunks_removed,
           CAST(coalesce(sum(CASE WHEN nd = 1
                 THEN len(string_split(chunk, ' ')) END), 0) AS BIGINT)
               AS n_tokens_kept,
           md5(coalesce(string_agg(chunk, ' ' ORDER BY idx)
                        FILTER (WHERE nd = 1), '')) AS cleaned_md5
    FROM j GROUP BY doc_id
    """,
)
def q_dedup_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span REMOVAL (the C4/CCNet cleanup transform, not just
    the report): every cross-document duplicated CHUNK_TOKENS-token chunk
    is cut from every document containing it, and the cleaned document is
    reassembled in original chunk order — proven byte-identical across
    engines by md5 (the q_text_pii discipline). Removal from EVERY
    occurrence (rather than keep-one-copy) is the deterministic policy: it
    needs no canonical-copy election and is what C4 does for repeated
    lines. Extends q_dedup_chunks from measurement to transformation.

    Scale shape: identical to q_dedup_chunks (zero-shuffle stepped
    chunking, one hash agg for chunk document-frequency, one join back)
    plus an ordered per-doc reassembly that rides the same per-doc
    shuffle — collect_list here is per-document (bounded by doc length),
    never per-corpus."""
    d = load_table(spark, sf_dir, "documents")
    chunk_expr = (
        f"transform(sequence(1, greatest(size(t), 1), {CHUNK_TOKENS}), "
        f"i -> array_join(slice(t, i, {CHUNK_TOKENS}), ' '))"
    )
    chunks = persist_tracked(
        d.select("doc_id", F.split("text", " ").alias("t")).select(
            "doc_id", F.posexplode(F.expr(chunk_expr)).alias("idx", "chunk")
        )
    )
    dfc = chunks.groupBy("chunk").agg(F.count_distinct("doc_id").alias("nd"))
    j = chunks.join(dfc, "chunk")
    kept_struct = F.when(F.col("nd") == 1, F.struct("idx", "chunk"))
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).alias("n_chunks_removed"),
        F.coalesce(
            F.sum(F.when(F.col("nd") == 1, F.size(F.split("chunk", " ")))),
            F.lit(0),
        )
        .cast("long")
        .alias("n_tokens_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda x: x["chunk"],
                ),
                " ",
            )
        ).alias("cleaned_md5"),
    )


CASCADE_SPAN_RATIO = 0.5  # drop docs with > this duplicated-chunk ratio


@query(
    "q_e2e_dedup_cascade",
    oracle=f"""
    WITH s1 AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents)
      WHERE rn = 1),
    {_shingle_pair_ctes("s1")},
    drop2 AS (
      SELECT DISTINCT doc2 AS doc_id FROM inter
      JOIN sizes z1 ON z1.doc_id = inter.doc1
      JOIN sizes z2 ON z2.doc_id = inter.doc2
      WHERE CAST(n_inter AS DOUBLE) / (z1.n_sh + z2.n_sh - n_inter)
            > {JACCARD_THRESHOLD}),
    s2 AS (SELECT doc_id, text FROM s1
           WHERE doc_id NOT IN (SELECT doc_id FROM drop2)),
    t2 AS (SELECT doc_id, string_split(text, ' ') AS t FROM s2),
    ch AS (
      SELECT doc_id,
             array_to_string(t[u.i : u.i + {CHUNK_TOKENS - 1}], ' ') AS chunk
      FROM t2, UNNEST(range(1, len(t) + 1, {CHUNK_TOKENS})) AS u(i)),
    cdf AS (SELECT chunk, count(DISTINCT doc_id) AS nd FROM ch GROUP BY chunk),
    ratio AS (
      SELECT c.doc_id,
             CAST(sum(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS r
      FROM ch c JOIN cdf d ON d.chunk = c.chunk GROUP BY c.doc_id),
    drop3 AS (SELECT doc_id FROM ratio WHERE r > {CASCADE_SPAN_RATIO}),
    n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s1),
    n2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s2),
    n3 AS (SELECT CAST((SELECT n FROM n2) - count(*) AS BIGINT) AS n FROM drop3)
    SELECT 1 AS stage_ord, 'exact' AS stage, n0.n AS n_in,
           n0.n - n1.n AS n_dropped, n1.n AS n_out FROM n0, n1
    UNION ALL
    SELECT 2, 'near_dup', n1.n, n1.n - n2.n, n2.n FROM n1, n2
    UNION ALL
    SELECT 3, 'span_dup', n2.n, n2.n - n3.n, n3.n FROM n2, n3
    """,
)
def q_e2e_dedup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production dedup pipeline END-TO-END, one query: exact dedup
    (keep-lowest doc per md5 fingerprint) → near-dup removal (df-capped
    exact 4-shingle Jaccard > {JACCARD_THRESHOLD}, keep-lowest-id per
    pair) → verbatim-span gate (drop docs whose duplicated-chunk ratio
    exceeds {CASCADE_SPAN_RATIO} among survivors). Emits the funnel —
    per stage: docs in, dropped, out — which is the number every corpus
    curation report leads with. Each stage reuses an already-verified
    formulation (q_dedup_exact, q_dedup_ngram_jaccard, q_dedup_chunks),
    so the composition, including stage ordering effects (near-dup
    removal changes chunk document frequencies for the span gate), is
    hash-checked as a whole.

    Scale shape: the union of the component shapes — one fingerprint
    window, one capped posting-list shuffle, one chunk-df agg — each
    stage filtering before the next so later stages scan less; at 100 TB
    swap stage 2's exact Jaccard for q_dedup_minhash banding (same
    in/out contract)."""
    d = load_table(spark, sf_dir, "documents")
    w_fp = Window.partitionBy("fp").orderBy("doc_id")
    s1 = persist_tracked(
        d.withColumn("fp", F.md5("text"))
        .withColumn("rn", F.row_number().over(w_fp))
        .where(F.col("rn") == 1)
        .select("doc_id", "text")
    )
    pairs = exact_jaccard_pairs(shingles(s1)).where(
        F.col("jaccard") > JACCARD_THRESHOLD
    )
    drop2 = pairs.select(F.col("doc2").alias("doc_id")).distinct()
    s2 = persist_tracked(s1.join(drop2, "doc_id", "left_anti"))
    chunks = s2.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(size(split(text, ' ')), 1), {CHUNK_TOKENS}), "
                f"i -> array_join(slice(split(text, ' '), i, {CHUNK_TOKENS}), ' '))"
            )
        ).alias("chunk"),
    )
    # r14 (guide §2.4): the duplicated-chunk flag used to be a chunk-df
    # aggregate (count_distinct per chunk) joined BACK onto the persisted
    # chunk stream — an agg exchange + a join re-shuffle + a persist. The
    # span gate only needs the BOOLEAN nd > 1, and "≥ 2 distinct doc_ids
    # share this chunk" ≡ min(doc_id) ≠ max(doc_id) over the chunk's
    # window — two streaming window aggregates riding ONE exchange on
    # chunk, no set/count materialization, no join-back, no persist.
    # The per-doc numerator/denominator are the same integers, so the
    # emitted ratio double is bit-identical.
    w_ch = Window.partitionBy("chunk")
    ratio = (
        chunks.withColumn(
            "dup",
            F.min("doc_id").over(w_ch) != F.max("doc_id").over(w_ch),
        )
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.when(F.col("dup"), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("r")
        )
    )
    drop3 = ratio.where(F.col("r") > CASCADE_SPAN_RATIO)

    def n_row(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias(name))

    n0, n1, n2 = n_row(d, "n0"), n_row(s1, "n1"), n_row(s2, "n2")
    nd3 = n_row(drop3, "nd3")
    r1 = n0.crossJoin(n1).select(
        F.lit(1).alias("stage_ord"),
        F.lit("exact").alias("stage"),
        F.col("n0").alias("n_in"),
        (F.col("n0") - F.col("n1")).alias("n_dropped"),
        F.col("n1").alias("n_out"),
    )
    r2 = n1.crossJoin(n2).select(
        F.lit(2).alias("stage_ord"),
        F.lit("near_dup").alias("stage"),
        F.col("n1").alias("n_in"),
        (F.col("n1") - F.col("n2")).alias("n_dropped"),
        F.col("n2").alias("n_out"),
    )
    r3 = n2.crossJoin(nd3).select(
        F.lit(3).alias("stage_ord"),
        F.lit("span_dup").alias("stage"),
        F.col("n2").alias("n_in"),
        F.col("nd3").alias("n_dropped"),
        (F.col("n2") - F.col("nd3")).alias("n_out"),
    )
    return r1.unionByName(r2).unionByName(r3)


SN_WINDOW = 3        # neighbors compared per doc in sorted order
SN_THRESHOLD = 0.5   # token-set Jaccard to report a near-dup pair


@query(
    "q_dedup_sorted_neighborhood",
    oracle=f"""
    WITH tokd AS (SELECT doc_id, lang, text,
                        string_split(text, ' ') AS t FROM documents),
    d AS (
      SELECT doc_id, lang, text,
             list_distinct(list_transform(
               range(1, greatest(len(t) - {N_SHINGLE - 1}, 0) + 1),
               i -> array_to_string(list_slice(t, i, i + {N_SHINGLE - 1}), ' ')))
                 AS ts
      FROM tokd),
    nb AS (
      SELECT doc_id, lang, ts,
             {", ".join(
                 f"lead(doc_id, {i}) OVER w AS id{i},"
                 f" lead(ts, {i}) OVER w AS ts{i}"
                 for i in range(1, SN_WINDOW + 1))}
      FROM d WINDOW w AS (PARTITION BY lang ORDER BY text, doc_id)),
    pairs AS (
      {" UNION ALL ".join(
          f"SELECT doc_id AS doc_a, id{i} AS doc_b, {i} AS neighbor_offset, "
          f"round(CAST(len(list_intersect(ts, ts{i})) AS DOUBLE) "
          f"/ (len(ts) + len(ts{i}) - len(list_intersect(ts, ts{i}))), 6) AS jacc "
          f"FROM nb WHERE id{i} IS NOT NULL"
          for i in range(1, SN_WINDOW + 1))})
    SELECT doc_a, doc_b, neighbor_offset, jacc AS jaccard
    FROM pairs WHERE jacc >= {SN_THRESHOLD}
    """,
)
def q_dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood near-dup blocking (Hernández & Stolfo's record-
    linkage classic): docs are sorted by their text within each language
    and each doc is compared ONLY to its SN_WINDOW successors in sorted
    order — token-edit near-dups share long prefixes, so they land
    adjacent, and the comparison budget is exactly O(n·w) with NO
    candidate-pair explosion of any kind (the third blocking strategy in
    the dedup toolkit, next to posting-list shingle joins and LSH
    banding; each catches pairs the others' collision structure can
    miss). Similarity is 4-SHINGLE-set Jaccard (the corpus vocabulary is
    tiny, so token sets overlap by chance; shingles discriminate —
    measured: token-set Jaccard at the same threshold emits 1091 pairs
    on the sf0.01 fixture, shingle-set Jaccard only the true
    near-neighbors), reported for pairs ≥ {SN_THRESHOLD}.

    Scale shape: lead() columns over the per-language sort — at 100 TB,
    range-partition by the sort key (q_win_ntile_scalable's recipe) and
    overlap partition boundaries by w rows; no join at all, the only
    shuffle is the sort itself."""
    d = (
        load_table(spark, sf_dir, "documents")
        .withColumn("t", F.split("text", " "))
        .select(
            "doc_id",
            "lang",
            "text",
            F.array_distinct(F.expr(ngram_expr("t", N_SHINGLE))).alias("ts"),
        )
    )
    w = Window.partitionBy("lang").orderBy("text", "doc_id")
    nb = d.select(
        "doc_id",
        "ts",
        *[
            c
            for i in range(1, SN_WINDOW + 1)
            for c in (
                F.lead("doc_id", i).over(w).alias(f"id{i}"),
                F.lead("ts", i).over(w).alias(f"ts{i}"),
            )
        ],
    )
    nb = persist_tracked(nb)
    parts = []
    for i in range(1, SN_WINDOW + 1):
        inter = F.size(F.array_intersect("ts", f"ts{i}"))
        jacc = F.round(
            inter.cast("double")
            / (F.size("ts") + F.size(f"ts{i}") - inter),
            6,
        )
        parts.append(
            nb.where(F.col(f"id{i}").isNotNull()).select(
                F.col("doc_id").alias("doc_a"),
                F.col(f"id{i}").alias("doc_b"),
                F.lit(i).alias("neighbor_offset"),
                jacc.alias("jaccard"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.where(F.col("jaccard") >= SN_THRESHOLD)
