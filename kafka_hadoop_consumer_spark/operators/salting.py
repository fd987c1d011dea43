"""Skew mitigation: salted equi-join (SURVEY.md §4.2 "Skew handling").

AQE's skew-join splitting handles most skew automatically, but it only
splits SORT-MERGE join partitions; pathological single-key skew (one user
= 30% of a 100 TB fact table) is better handled structurally: salt the
skewed (large) side into S sub-keys and replicate the other side S×, so
the hot key spreads over S tasks. Cost: S× duplication of the small side
— use only for keys identified as hot (or combine: salted join for the
hot keys, plain join for the rest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join `large ⋈ small` on column `on`, salting the large side.

    The large side gets a deterministic pseudo-random salt derived from a
    row hash (uniform, reproducible — no rand(), which would break retry
    determinism); the small side is exploded n_salts× so every
    (key, salt) pair finds its match. Join keys become (on, salt) —
    spreading each hot key across n_salts shuffle partitions.

    CAVEAT — identical rows: the default salt hashes the whole row, so
    byte-identical duplicate rows all land on ONE salt and a hot key
    dominated by repeated identical tuples is not spread at all (while
    still paying the n_salts× small-side replication). If the large side
    can contain such duplicates, pass ``salt_cols`` naming a
    high-cardinality distinguisher (an event id, an offset) to derive
    the salt from instead.

    Only ``inner`` and ``left`` are sound: each large-side row carries
    exactly one salt, so unmatched large rows null-extend once. With
    ``right``/``full``/``outer`` every unmatched SMALL row would appear
    n_salts times (one per exploded replica) — rejected explicitly.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in ('inner', 'left'), got {how!r}: "
            "outer variants would emit each unmatched small-side row "
            "n_salts times (one per replica)"
        )
    if n_salts < 1:
        # pmod(x, 0) is NULL (non-ANSI), which never equi-joins — a typo
        # would silently drop the entire join output
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if "_salt" in large.columns or "_salt" in small.columns:
        # withColumn would silently REPLACE a business column named
        # _salt with the synthetic salt and drop() would then delete it
        raise ValueError(
            "salted_join reserves the column name '_salt'; rename it on "
            "the input before joining"
        )
    if salt_cols is None:
        # hash expressions reject MapType (SPARK-27619): deriving the
        # default whole-row salt must skip map columns or a large side
        # with an irrelevant map column fails at plan time
        salt_cols = [
            c for c, t in large.dtypes if not t.startswith("map<")
        ] or [on]
    salt_src = F.xxhash64(*[F.col(c) for c in salt_cols])
    salted_large = large.withColumn("_salt", F.pmod(salt_src, F.lit(n_salts)).cast("int"))
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return salted_large.join(replicated_small, [on, "_salt"], how).drop("_salt")
