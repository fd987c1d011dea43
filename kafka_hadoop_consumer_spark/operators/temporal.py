"""Temporal join operators (library API): as-of join and interval-overlap
join — the two time-series joins Spark has no native operator for,
expressed as compositions that keep Catalyst in charge of the physical
plan (SURVEY.md §2B temporal-join rows; the registered q_join_asof /
q_join_interval keys are fixture-bound instances of these).

Both are equi-join-shaped on purpose:

- ``asof_join`` is an equi-join on the ``by`` key with a one-sided time
  residual, then a per-left-row window picks the single winner — never a
  cross product. Two exchanges total: the join shuffles on the ``by``
  key, and the winner window re-shuffles on ``left_key`` (they differ
  whenever ``left_key`` is finer than ``by``, the common case).
- ``interval_overlap_join`` never evaluates raw range-vs-range pairing:
  each interval explodes into the fixed-width time buckets it covers and
  the pairing is an EQUI-join on the bucket id, with the true overlap
  predicate as a residual and an emit-once guard so a pair meeting in
  several buckets is produced exactly once. Cost is proportional to
  co-bucketed candidates, not |A|x|B|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    left_key: str,
    direction: str = "backward",
    tolerance: int | None = None,
    how: str = "inner",
    tie_break: str | None = None,
) -> DataFrame:
    """For each left row, attach the single closest right row at-or-before
    (``backward``) / at-or-after (``forward``) / closest-in-either-direction
    (``nearest``) its timestamp, per ``by`` key.

    ``nearest`` REQUIRES ``tolerance`` (an unbounded nearest join is a
    per-key cross product — the bounded band keeps it an equi-join plus a
    residual, bucketizable at scale) and requires timestamp-typed
    ts columns (distance is computed on epoch seconds). Equal distances
    prefer the EARLIER right row, then ``tie_break`` ascending.

    ``left_key`` must uniquely identify left rows AND be non-null (the
    winner window partitions on it): a NULL key would collapse every
    null-key left row into ONE window partition, of which only the
    row_number()==1 winner survives — silently violating the
    one-output-row-per-left-row contract rather than erroring. Filter or
    surrogate-key null ids before calling.

    ``tolerance`` bounds how far back/forward a match may be. Type
    contract (checked eagerly): for ``backward``/``forward`` the band is
    ``ts ± tolerance`` in the ts columns' OWN units, so those columns
    must be numeric (epoch micros/seconds); for ``nearest`` the ts
    columns must instead be timestamp-castable and ``tolerance`` is in
    SECONDS. ``how='left'`` keeps
    unmatched left rows null-extended. Equal right timestamps are broken
    by ``tie_break`` (a unique right column, ordered in the same direction
    as the timestamp) — pass one whenever right timestamps can collide,
    or the winner among ties is nondeterministic.

    Non-``by`` column names must be disjoint between the two inputs.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if direction == "nearest" and tolerance is None:
        raise ValueError("direction='nearest' requires a tolerance bound")
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join supports how in ('inner','left'), got {how!r}")
    overlap = (set(left.columns) & set(right.columns)) - {by}
    if overlap:
        raise ValueError(f"non-by columns must be disjoint, shared: {sorted(overlap)}")
    if tolerance is not None and direction != "nearest":
        # fail with guidance NOW, not as a DATATYPE_MISMATCH at analysis:
        # the banded condition computes ts - tolerance in the column's
        # own units, which timestamp types don't support
        bad = [
            (c, t)
            for c, t in (
                (left_ts, dict(left.dtypes).get(left_ts, "")),
                (right_ts, dict(right.dtypes).get(right_ts, "")),
            )
            if t.startswith(("timestamp", "date"))
        ]
        if bad:
            raise ValueError(
                f"direction={direction!r} with a tolerance needs NUMERIC "
                f"(epoch) ts columns, got {bad}; cast to epoch units or "
                "use direction='nearest' (tolerance in seconds)"
            )

    r = right.withColumnRenamed(by, "_asof_by")
    lt, rt = F.col(left_ts), F.col(right_ts)
    if direction == "backward":
        cond = rt <= lt
        if tolerance is not None:
            cond &= rt >= lt - F.lit(tolerance)
        order = [rt.desc()]
        if tie_break is not None:
            order.append(F.col(tie_break).desc())
    elif direction == "forward":
        cond = rt >= lt
        if tolerance is not None:
            cond &= rt <= lt + F.lit(tolerance)
        order = [rt.asc()]
        if tie_break is not None:
            order.append(F.col(tie_break).asc())
    else:  # nearest: tolerance is in SECONDS, distance in exact integer µs
        # NOT epoch-seconds doubles: their ulp at 2024-era epochs is
        # ~0.24 µs, enough to rank an exact-tie pair differently from an
        # integer-µs oracle (r9 review) — tie outcomes are hash-checked
        dist = F.abs(
            F.unix_micros(rt.cast("timestamp")) - F.unix_micros(lt.cast("timestamp"))
        )
        cond = dist <= F.lit(int(round(tolerance * 1_000_000)))
        order = [dist.asc(), rt.asc()]
        if tie_break is not None:
            order.append(F.col(tie_break).asc())
    w = Window.partitionBy(left_key).orderBy(*order)
    return (
        left.join(r, (F.col(by) == F.col("_asof_by")) & cond, how)
        .withColumn("_asof_rn", F.row_number().over(w))
        .where(F.col("_asof_rn") == 1)
        .drop("_asof_rn", "_asof_by")
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_width: int,
) -> DataFrame:
    """All (a, b) pairs whose intervals intersect — a's interval closed
    [a_start, a_end], b's half-open [b_start, b_end): overlap iff
    ``a_start < b_end AND a_end >= b_start``. Interval bounds must be
    integers (e.g. epoch micros); column names must be disjoint.

    Intervals must satisfy start <= end (a-side) / start < end (b-side);
    inverted intervals are caller error — the bucket cover degenerates to
    a superset and the residual alone decides, which may not match a
    strict mathematical "empty interval" reading.

    Scale shape (see module docstring): both sides explode into
    ``bucket_width``-sized time buckets, pair via an equi-join on the
    bucket, and each pair is emitted only in the bucket containing
    ``greatest(a_start, b_start)`` — one output row per overlapping pair,
    no distinct pass. Pick ``bucket_width`` near the typical interval
    length: too small multiplies the explode fan-out
    (span/bucket_width rows per interval), too large co-buckets
    non-overlapping intervals and shifts cost to the residual filter.
    """
    if set(a.columns) & set(b.columns):
        raise ValueError(
            f"column names must be disjoint, shared: {sorted(set(a.columns) & set(b.columns))}"
        )
    W = int(bucket_width)
    if W <= 0:
        # x DIV 0 is NULL, sequence(NULL, NULL) is NULL, explode(NULL)
        # emits nothing — a zero width would silently return 0 pairs
        raise ValueError(f"bucket_width must be a positive integer, got {W}")
    # column names are backtick-quoted inside the SQL fragments so names
    # with spaces/reserved words behave like they do under F.col
    qa_s, qa_e = f"`{a_start}`", f"`{a_end}`"
    qb_s, qb_e = f"`{b_start}`", f"`{b_end}`"
    ab = a.withColumn(
        "_ivl_bkt", F.explode(F.expr(f"sequence({qa_s} DIV {W}, {qa_e} DIV {W})"))
    )
    bb = b.withColumn(
        "_ivl_bkt",
        F.explode(F.expr(f"sequence({qb_s} DIV {W}, ({qb_e} - 1) DIV {W})")),
    )
    return (
        ab.join(bb, "_ivl_bkt")
        .where(
            (F.col(a_start) < F.col(b_end))
            & (F.col(a_end) >= F.col(b_start))
            & (F.col("_ivl_bkt") == F.expr(f"greatest({qa_s}, {qb_s}) DIV {W}"))
        )
        .drop("_ivl_bkt")
    )
