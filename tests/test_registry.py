"""Registry bookkeeping guards.

The registered-key count is the repo's shop-window number (README, judge
inventory); it drifted once (r2 README said 172 vs 170 registered), so it
is now generated-checked: README must state exactly ``len(QUERIES)``.
Also pins that the 100 TB ``cluster_profile()`` overlay actually LANDS on
a SparkSession (conf round-trip), not merely constructs a dict.
"""

import re

from kafka_hadoop_consumer_spark.queries import ORACLES, QUERIES


def test_readme_key_count_matches_registry():
    with open("README.md") as f:
        readme = f.read()
    m = re.search(r"operator inventory \((\d+) keys", readme)
    assert m, "README.md must state the operator-inventory key count"
    assert int(m.group(1)) == len(QUERIES), (
        f"README says {m.group(1)} keys but registry has {len(QUERIES)} — "
        "update the README count"
    )


def test_every_oracle_key_is_a_query_key():
    orphans = set(ORACLES) - set(QUERIES)
    assert not orphans, f"oracle_sql keys without queries(): {sorted(orphans)}"


def test_driver_window_shaping_preserves_registry():
    # The _DEFER_TO_TAIL reorder must move keys, never add or drop them.
    from kafka_hadoop_consumer_spark.queries import _DEFER_TO_TAIL

    for k in _DEFER_TO_TAIL:
        assert k in QUERIES, f"deferred key {k} missing from registry"
    # Deferred keys sit at the tail of the dict, in defer-list order.
    tail = list(QUERIES)[-len(_DEFER_TO_TAIL):]
    assert tail == list(_DEFER_TO_TAIL)


def test_cluster_profile_lands_on_session(spark):
    """The 100 TB overlay's runtime-settable knobs must round-trip through
    SparkSession.conf — guards against typo'd config keys that Spark would
    silently accept-and-ignore at builder time."""
    from kafka_hadoop_consumer_spark.session import cluster_profile

    profile = cluster_profile(total_cores=64, target_partition_mb=64)
    # Static (non-runtime) SQL configs would raise here; every knob in the
    # overlay is runtime-settable by design so the whole map must land.
    saved = {k: spark.conf.get(k, None) for k in profile}
    try:
        for k, v in profile.items():
            spark.conf.set(k, v)
        for k, v in profile.items():
            assert spark.conf.get(k) == v, f"{k} did not land"
        # Derivations, not magic numbers: partitions scale with cores,
        # partition bytes with the MB target.
        assert profile["spark.sql.shuffle.partitions"] == "128"
        assert profile["spark.sql.files.maxPartitionBytes"] == str(64 * 1024 * 1024)
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)


def test_zorder_key_validates_arguments():
    """bits=0 would build sequence(0, -1) — a DESCENDING array in Spark,
    silently folding a wrong key; column args are spliced into SQL text so
    non-identifiers must be rejected, not executed."""
    import pytest

    from kafka_hadoop_consumer_spark.functions import zorder_key

    for bad_bits in (0, -1, 32):
        with pytest.raises(ValueError, match="bits"):
            zorder_key("x", "y", bad_bits)
    with pytest.raises(ValueError, match="plain column names"):
        zorder_key("x + 1", "y", 8)
    zorder_key("x", "y", 31)  # boundary accepted


def test_bad_sf_dir_raises_cleanly(spark):
    """A wrong sf_dir must fail with Spark's AnalysisException (path not
    found) — not a hang, not a silent empty result (driver-contract
    probe from .claude/skills/verify)."""
    import pytest
    from pyspark.errors import AnalysisException

    from kafka_hadoop_consumer_spark.queries import QUERIES

    with pytest.raises(AnalysisException):
        QUERIES["q_agg_groupby"](spark, "/root/testdata/sf_nonexistent").collect()
