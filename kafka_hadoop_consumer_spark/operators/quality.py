"""Inline data-quality metrics via the Observation API — validation
without a second scan.

At 100 TB, a separate ``df.count()`` / null-scan validation pass costs as
much as the job itself. ``observe`` attaches aggregate metrics to the
SAME action: they're computed inside the existing stages (map-side,
whole-stage-codegen'd) and surface on the driver after the write/collect
finishes. This is the engine's data-quality gate primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, *required_cols: str) -> tuple[DataFrame, Observation]:
    """Attach row-count + per-column null-count metrics to ``df``.

    Returns (df', observation). Run ONE action on df' (write/collect),
    then read ``observation.get`` — e.g.::

        df2, obs = observed(df, "event_id", "ts")
        df2.write.parquet(out)
        assert obs.get["null_ts"] == 0
    """
    obs = Observation()
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in required_cols:
        # count(when(...)), not sum(when/otherwise): sum over ZERO rows
        # is NULL, so an empty input would surface null_<col> = None and
        # break `obs.get["null_ts"] == 0` gates; count is always integral
        metrics.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"null_{c}")
        )
    return df.observe(obs, *metrics), obs


def quality_gate(df: DataFrame, *required_cols: str) -> DataFrame:
    """Filter out rows with nulls in required columns (the keep side of
    a quality gate); pair with ``observed`` to count what was dropped
    in the same pass."""
    cond = None
    for c in required_cols:
        p = F.col(c).isNotNull()
        cond = p if cond is None else (cond & p)
    return df if cond is None else df.where(cond)
