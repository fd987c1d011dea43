"""The r12 measurement tools (tools/warmed_probe.py, tools/profile_cc.py)
are the anchors' provenance chain — if they bit-rot, the next re-anchor
can't reproduce the protocol. These tests import them (no Spark session:
both only build one inside main()) and pin their wiring to the registry
and the anchor set."""

import importlib.util
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402
from kafka_hadoop_consumer_spark.queries import QUERIES  # noqa: E402


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name,
        os.path.join(os.path.dirname(__file__), "..", "tools", f"{name}.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_warmed_probe_wiring():
    wp = _load("warmed_probe")
    # the warm-up set must stay runnable registry keys (a renamed key
    # would make every future re-anchor crash before measuring)
    assert set(wp.WARM_QUERIES) <= set(QUERIES)
    # protocol parity: same warm-up queries as profile_cc (one protocol,
    # not two drifting copies)
    pc = _load("profile_cc")
    assert tuple(pc.WARM_QUERIES) == tuple(wp.WARM_QUERIES)
    assert pc.N_PASSES >= 2  # first timed pass ~ driver primary, rest ~ control


def test_profile_cc_soak_slice_matches_bench_order():
    # --soak runs "the headline queries preceding q_graph_cc in bench
    # order"; that claim depends on cc being IN bench.HEADLINE
    assert "q_graph_cc" in bench.HEADLINE
    assert bench.HEADLINE.index("q_graph_cc") > 0


def test_cc_anchor_matches_committed_profile():
    # cross-artifact pin: the WARMED_ANCHORS value for q_graph_cc is the
    # one bench_cc_profile.json's action paragraph records (3.9 s) — an
    # anchor edit without a new profile receipt should fail here
    import json

    path = os.path.join(os.path.dirname(__file__), "..", "bench_cc_profile.json")
    with open(path) as f:
        prof = json.load(f)
    anchor = bench.WARMED_ANCHORS["q_graph_cc"]
    assert f"{anchor}s" in prof["action"], (
        f"WARMED_ANCHORS['q_graph_cc']={anchor} but bench_cc_profile.json's "
        "action records a different value — re-profile before re-anchoring"
    )


def test_scale100_probe_wiring_and_receipt_keys():
    """bench_100x.json receipts are def-hash-stamped against registry
    keys; a key rename (or a probe function deletion) would make the
    receipts unre-earnable without failing anywhere. Pin both: every
    stamped key still exists in the registry, and every probe entry
    point the receipts' recorded commands name is still defined."""
    import json

    sp = _load("scale100_probe")
    for fn in ("probe_minhash", "probe_substring", "probe_cc",
               "probe_hybrid", "probe_pagerank", "probe_bootstrap"):
        assert callable(getattr(sp, fn)), f"scale100_probe.{fn} missing"

    path = os.path.join(os.path.dirname(__file__), "..", "bench_100x.json")
    with open(path) as f:
        receipts = json.load(f)
    stamped = set()
    for section, rec in receipts.items():
        if isinstance(rec, dict):
            stamped |= set(rec.get("def_hashes", {}))
    # top-level ANN receipt keeps def_hashes at the root
    stamped |= set(receipts.get("def_hashes", {}))
    assert stamped, "no def-hash-stamped keys found in bench_100x.json"
    missing = stamped - set(QUERIES)
    assert not missing, (
        f"bench_100x.json stamps keys absent from the registry: {missing}"
    )
