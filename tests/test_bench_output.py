"""The driver captures only the last ~2000 chars of bench output and
parses the final JSON line found there. Round 4 lost its bench evidence
because the (single) JSON line outgrew that buffer. These tests lock the
contract: the final stdout line is valid JSON, stays under the budget
with a full-size realistic payload, and carries the evidence the judge
reads (control summary, scaling ratios, skew straggler incl. the
tuned-AQE point)."""

import json

import bench


def _full_detail() -> dict:
    """A payload at least as large as a real round's (r4 shapes)."""
    headline = dict.fromkeys(bench.HEADLINE, 12.345)
    headline["s_ingest_e2e"] = 12.345
    return {
        "metric": "headline query wall-clock (median of 3, noop sink)",
        "value": 123.456,
        "unit": "sec",
        "queries": headline,
        "control_rerun": {"value": 123.456, "queries": dict(headline)},
        "ingest_rows_per_sec": 155364,
        "r3_ops": {
            k: 12.345
            for k in (
                "q_text_heavy_hitters", "q_graph_pagerank", "q_sim_pq_topk",
                "q_stats_bootstrap", "q_dedup_substring", "q_graph_triangles",
                "q_dedup_semdedup", "q_text_bpe_encode", "q_e2e_dedup_cascade",
            )
        },
        "scaling_10x": {
            "q_sim_lsh_topk": {
                "n_1x": 2000, "n_10x": 20000,
                "sec_1x": 1.234, "sec_10x": 12.345, "ratio": 10.01,
                "candidate_pairs_1x": 123456,
                "candidate_pairs_10x": 12345678,
                "ratio_pairs": 10.03,
            },
            "q_dedup_minhash": {
                "n_1x": 2000, "n_10x": 20000,
                "sec_1x": 1.234, "sec_10x": 12.345, "ratio": 10.01,
                "candidate_pairs_1x": 123456,
                "candidate_pairs_10x": 12345678,
                "ratio_pairs": 10.02,
            },
            "q_dedup_substring": {
                "n_1x": 2000, "n_10x": 20000,
                "sec_1x": 1.234, "sec_10x": 12.345, "ratio": 10.01,
            },
            "q_dedup_embedding": {
                "n_1x": 2000, "n_10x": 20000, "sec_1x": 1.234,
                "sec_10x_same_config": 12.345,
                "sec_10x_retuned": 2.345,
                "bits_1x": 5, "bits_10x_retuned": 8,
                "candidate_pairs_1x": 123456,
                "candidate_pairs_10x_same_config": 123456789,
                "candidate_pairs_10x_retuned": 12345678,
                "ratio_pairs_same_config": 1000.12,
                "ratio_pairs_retuned": 100.01,
                "ratio_wall_same_config": 10.01,
                "ratio_wall_retuned": 1.9,
            },
        },
        "skew_join": {
            "rows": 8_000_000, "hot_fraction": 0.5,
            "naive_no_aqe_sec": 12.345, "salted_no_aqe_sec": 12.345,
            "aqe_skew_sec": 12.345, "aqe_tuned_sec": 12.345,
            "naive_max_task_ms": 1592.0, "salted_max_task_ms": 717.0,
            "aqe_skew_max_task_ms": 1500.0, "aqe_tuned_max_task_ms": 600.0,
            "aqe_tuned_threshold": "4m+force",
        },
        "sf": 0.1,
    }


def test_final_line_parses_and_fits_budget():
    line = bench.format_final_line(_full_detail())
    assert "\n" not in line
    assert len(line) <= bench.FINAL_LINE_BUDGET, len(line)
    parsed = json.loads(line)
    assert parsed["value"] == 123.456
    assert parsed["sf"] == 0.1
    assert set(parsed["queries"]) == set(bench.HEADLINE) | {"s_ingest_e2e"}


def test_final_line_carries_judge_evidence():
    parsed = json.loads(bench.format_final_line(_full_detail()))
    # control summary (r3 verdict item 5) survives compaction
    assert parsed["control"]["value"] == 123.456
    assert parsed["control"]["max_query_ratio"] == 1.0
    # scaling ratios: candidate-pair ratios are the headline invariant
    # (r5 verdict item 5); wall ratios stay as context. Compacted names
    # drop the "ratio_" prefix (bare "ratio" -> "wall") — the r9 budget
    # trim; full names stay in bench_detail.json
    emb = parsed["scaling_10x_ratios"]["q_dedup_embedding"]
    assert emb["pairs_same_config"] == 1000.12
    assert emb["pairs_retuned"] == 100.01
    assert emb["wall_same_config"] == 10.01
    assert parsed["scaling_10x_ratios"]["q_dedup_minhash"]["pairs"] == 10.02
    # r10: the ANN wall gained its own candidate invariant (r9 ADVICE)
    assert parsed["scaling_10x_ratios"]["q_sim_lsh_topk"]["pairs"] == 10.03
    assert parsed["scaling_10x_ratios"]["q_dedup_substring"]["wall"] == 10.01
    # skew straggler evidence incl. the tuned-AQE point (r4 verdict item 6)
    assert parsed["skew_join"]["salted_max_task_ms"] == 717.0
    assert parsed["skew_join"]["aqe_tuned_max_task_ms"] == 600.0
    assert parsed["extras"]["q_graph_triangles"] == 12.345


def test_committed_real_payload_fits_budget():
    # The synthetic payload above tracks the INTENDED shape; the
    # committed bench_detail.json is the real one and gains fields as
    # probes are added (r10: lsh candidate ratios left 59 chars of
    # margin). If the real payload ever overflows, the driver records
    # the minimal fallback and silently loses the control/scaling/skew
    # evidence — fail here first.
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "bench_detail.json")
    with open(path) as f:
        detail = json.load(f)
    line = bench.format_final_line(detail)
    parsed = json.loads(line)
    assert "scaling_10x_ratios" in parsed, (
        "real payload fell back to the minimal line — evidence dropped"
    )
    # Margin tripwire (r10 ADVICE): fail while there is still headroom,
    # not at the hard fallback. Numeric widths wobble a few chars per
    # round; a new probe field costs tens. If this fires, trim the
    # compact line BEFORE the driver silently drops evidence.
    headroom = bench.FINAL_LINE_BUDGET - len(line)
    assert headroom >= 40, (
        f"only {headroom} chars of final-line headroom left "
        f"({len(line)}/{bench.FINAL_LINE_BUDGET}) — trim "
        "format_final_line before the minimal-line fallback bites"
    )


def test_warmed_advisory_reads_warmed_anchors():
    # r10 verdict item 3: the 1.3x advisory must read the isolated
    # WARMED anchors (not the fast-boot r01 in-bench numbers) and the
    # payload must record which anchor set was used.
    best = {
        "q_udf_scalar": bench.WARMED_ANCHORS["q_udf_scalar"] * 1.29,
        "q_text_ngram": bench.WARMED_ANCHORS["q_text_ngram"] * 1.31,
        "q_agg_groupby": 99.9,  # not a warmed-anchored key: ignored
    }
    gate = bench.warmed_advisory(best)
    assert gate["ratios"]["q_udf_scalar"] == 1.29  # inside, no flag
    assert gate["ratios"]["q_text_ngram"] == 1.31
    assert "q_agg_groupby" not in gate["ratios"]
    assert gate["ratio_limit"] == bench.WARMED_RATIO == 1.3
    assert "isolated-warmed" in gate["anchor_set"]
    assert gate["session_box_factor_vs_r01"] is None  # no box passed


def test_warmed_advisory_box_factor_suppresses_slow_box(capsys):
    # Host contention moves every key ~1.8x together (measured
    # 2026-08-16); a key at 1.8x the warmed anchor on a 1.79x box is
    # the box, not the code — no flag. The same ratio on a 1.0x box
    # IS the code — flag.
    best = {"q_udf_scalar": bench.WARMED_ANCHORS["q_udf_scalar"] * 1.8}
    gate = bench.warmed_advisory(best, box=1.79)
    out = capsys.readouterr().err
    assert "ADVISORY-EXCEEDED" not in out
    assert gate["excess_vs_box"]["q_udf_scalar"] == 1.01
    assert gate["session_box_factor_vs_r01"] == 1.79
    gate = bench.warmed_advisory(best, box=1.0)
    assert "ADVISORY-EXCEEDED" in capsys.readouterr().err
    # and without a box factor the absolute 1.3x limit alone decides
    bench.warmed_advisory(best, box=None)
    assert "ADVISORY-EXCEEDED" in capsys.readouterr().err


def test_session_box_factor_is_median_vs_r01(tmp_path, monkeypatch):
    import json as _json

    anchor = {"sf": 0.1, "queries": {"a": 1.0, "b": 2.0, "c": 4.0}}
    p = tmp_path / "r01.json"
    p.write_text(_json.dumps(anchor))
    monkeypatch.setattr(bench, "ANCHOR", str(p))
    best = {"a": 1.5, "b": 4.0, "c": 4.0, "unknown": 99.0}
    # ratios 1.5, 2.0, 1.0 -> median 1.5; unknown keys ignored
    assert bench.session_box_factor(best, "0.1") == 1.5
    assert bench.session_box_factor(best, "0.01") is None  # sf mismatch
    monkeypatch.setattr(bench, "ANCHOR", str(tmp_path / "missing.json"))
    assert bench.session_box_factor(best, "0.1") is None
    # every warmed-anchored key is a headline/ingest entry the bench
    # actually times — a typo'd key would silently never be checked
    timed = set(bench.HEADLINE) | {"s_ingest_e2e"}
    assert set(bench.WARMED_ANCHORS) <= timed


def _anchor_file(tmp_path, monkeypatch, queries: dict) -> None:
    import json as _json

    p = tmp_path / "r01.json"
    p.write_text(_json.dumps({"sf": 0.1, "queries": queries}))
    monkeypatch.setattr(bench, "ANCHOR", str(p))


def test_hard_gate_convention_box_normalized(tmp_path, monkeypatch, capsys):
    # r11 verdict item 4 — the PINNED convention: the hard gate flags on
    # the box-NORMALIZED ratio (raw ratio / session box factor), the
    # same normalization the 1.3x advisory applies, so one run cannot
    # carry two contradictory regression verdicts. Keys here are not
    # warmed-anchored, isolating the normalization itself.
    anchors = {f"k{i}": 1.0 for i in range(9)}
    _anchor_file(tmp_path, monkeypatch, anchors)
    # contended box: most keys ~1.6x, one at 2.5x raw -> 1.56x normalized
    timings = {f"k{i}": 1.6 for i in range(8)}
    timings["k8"] = 2.5
    flagged = bench.check_regressions(timings, "0.1")
    err = capsys.readouterr().err
    # no PER-KEY flag (2.5x raw on a 1.6x box normalizes to 1.56x) —
    # but the 1.6x box itself now returns a BOX_FACTOR data flag (r12
    # ADVICE): contention is a claim that needs idle-box evidence.
    assert flagged == [("BOX_FACTOR", 1.6)], flagged
    assert "box-normalized" in err
    # same 2.5x raw reading on an idle box IS the code -> flags at 2.5x
    timings = {f"k{i}": 1.0 for i in range(8)}
    timings["k8"] = 2.5
    flagged = bench.check_regressions(timings, "0.1")
    assert ("k8", 2.5) in flagged


def test_hard_gate_total_is_box_normalized(tmp_path, monkeypatch):
    # a uniformly 1.6x session (pure contention) must not flag TOTAL
    # (raw total ratio 1.6 > 1.4, but normalized 1.6/1.6 = 1.0) — the
    # only flag left is the session-level BOX_FACTOR demand for
    # idle-box evidence (r12 ADVICE)
    anchors = {f"k{i}": 1.0 for i in range(9)}
    _anchor_file(tmp_path, monkeypatch, anchors)
    flagged = bench.check_regressions(dict.fromkeys(anchors, 1.6), "0.1")
    assert flagged == [("BOX_FACTOR", 1.6)], flagged
    # a uniformly 1.5x-normalized-excess session does flag TOTAL: every
    # key 1.5x on a box whose median is... itself 1.5 -> normalized 1.0.
    # TOTAL only fires when the total outruns the median (skewed mass):
    timings = dict.fromkeys(anchors, 1.0)
    timings["k0"] = timings["k1"] = timings["k2"] = timings["k3"] = 8.0
    flagged = bench.check_regressions(timings, "0.1")
    assert flagged and flagged[-1][0] == "TOTAL"


def test_hard_gate_reads_warmed_anchors_replaying_r11(tmp_path, monkeypatch, capsys):
    # The r11 false alarm, replayed: q_dedup_minhash min-of-passes
    # 1.634 s was exactly 2.00x its fast-boot r01 in-bench 0.816 s on a
    # 1.59x box and the old gate flagged it while the advisory stayed
    # quiet. Against its documented warmed anchor (1.27 s, BASELINE.md
    # r5/r12) and the box factor, the same reading must stay clean.
    # The HISTORICAL anchor is pinned here (anchors re-tighten as the
    # code gets faster — r14 moved minhash to 0.67 — and the replay's
    # meaning is tied to the anchor that was current at r11).
    monkeypatch.setitem(bench.WARMED_ANCHORS, "q_dedup_minhash", 1.27)
    anchors = {f"k{i}": 1.0 for i in range(8)}
    anchors["q_dedup_minhash"] = 0.816
    _anchor_file(tmp_path, monkeypatch, anchors)
    timings = {f"k{i}": 1.59 for i in range(8)}
    timings["q_dedup_minhash"] = 1.634
    flagged = bench.check_regressions(timings, "0.1")
    err = capsys.readouterr().err
    # per-key verdict stays clean (the r11 fix); the 1.59x box itself
    # returns the session-level BOX_FACTOR data flag (r12 ADVICE)
    assert flagged == [("BOX_FACTOR", 1.59)], flagged
    assert "REGRESSION" not in err
    assert "q_dedup_minhash 1.634s / 1.270s" in err  # warmed base used


def test_raw_ceiling_flags_regardless_of_box(tmp_path, monkeypatch):
    # r12 verdict item 3: past RAW_CEILING no box factor may excuse a
    # key — box-normalization must never hide an arbitrarily large
    # single-key regression behind a contended-looking session.
    anchors = {f"k{i}": 1.0 for i in range(9)}
    _anchor_file(tmp_path, monkeypatch, anchors)
    timings = {f"k{i}": 1.6 for i in range(8)}  # box median 1.6
    timings["k8"] = 2.6                          # 2.6x raw, 1.63x normalized
    flagged = bench.check_regressions(timings, "0.1")
    assert ("RAW:k8", 2.6) in flagged, flagged
    # normalized 1.63x stays under QUERY_RATIO — only the raw ceiling
    # (and the 1.6x-box evidence demand) fire
    assert ("k8", 2.6) not in flagged


def test_uniform_slowdown_fails_strict_mode(tmp_path, monkeypatch, capsys):
    # r12 ADVICE (medium): a uniform code slowdown inflates the box
    # median itself, so every normalized ratio reads ~1.0x; previously
    # SPARK_GRAFT_BENCH_STRICT exited 0 on exactly that shape. Now a
    # synthetic uniform 1.4x slowdown flags BOX_FACTOR in strict mode
    # (same-boot refactor loop — any box jump past BOX_STRICT_BOUND
    # without idle-box evidence blocks).
    import pytest

    anchors = {f"k{i}": 1.0 for i in range(9)}
    _anchor_file(tmp_path, monkeypatch, anchors)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_STRICT", "1")
    monkeypatch.delenv("SPARK_GRAFT_BOX_EVIDENCE", raising=False)
    with pytest.raises(SystemExit):
        bench.check_regressions(dict.fromkeys(anchors, 1.4), "0.1")
    assert "BOX_FACTOR flag" in capsys.readouterr().err
    # default (non-strict) mode: 1.4x sits under the 1.5x advisory
    # bound — recorded box variance, no flag, rc stays 0
    monkeypatch.delenv("SPARK_GRAFT_BENCH_STRICT")
    assert bench.check_regressions(dict.fromkeys(anchors, 1.4), "0.1") == []


def test_idle_box_evidence_suppresses_box_flag(tmp_path, monkeypatch):
    # A warmed_probe record with clean co-measured controls at the
    # CURRENT git HEAD certifies "this code on an idle box is fine" —
    # the box flag downgrades back to host contention.
    import json as _json
    import os
    import subprocess

    anchors = {f"k{i}": 1.0 for i in range(9)}
    _anchor_file(tmp_path, monkeypatch, anchors)
    head = subprocess.run(
        ["git", "-C", os.path.dirname(bench.__file__), "rev-parse", "HEAD"],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    ev = tmp_path / "probe.json"
    ev.write_text(_json.dumps({"control_box": 1.1, "git_head": head}) + "\n")
    monkeypatch.setenv("SPARK_GRAFT_BOX_EVIDENCE", str(ev))
    flagged = bench.check_regressions(dict.fromkeys(anchors, 1.6), "0.1")
    assert flagged == [], flagged
    # a contended probe (controls slow too) is NOT evidence
    ev.write_text(_json.dumps({"control_box": 1.5, "git_head": head}) + "\n")
    assert bench.check_regressions(
        dict.fromkeys(anchors, 1.6), "0.1") == [("BOX_FACTOR", 1.6)]
    # nor is one stamped against different code
    ev.write_text(_json.dumps(
        {"control_box": 1.1, "git_head": "0" * 40}) + "\n")
    assert bench.check_regressions(
        dict.fromkeys(anchors, 1.6), "0.1") == [("BOX_FACTOR", 1.6)]


def test_hard_flag_implies_advisory_flag(tmp_path, monkeypatch, capsys):
    # Monotone severity: whenever the hard gate flags a warmed-anchored
    # key, the advisory must flag it too (QUERY_RATIO > WARMED_RATIO and
    # both divide by the same box factor over the same anchor).
    anchors = {f"k{i}": 1.0 for i in range(8)}
    anchors["q_udf_scalar"] = bench.WARMED_ANCHORS["q_udf_scalar"]
    _anchor_file(tmp_path, monkeypatch, anchors)
    timings = {f"k{i}": 1.0 for i in range(8)}
    timings["q_udf_scalar"] = bench.WARMED_ANCHORS["q_udf_scalar"] * 2.6
    flagged = bench.check_regressions(timings, "0.1")
    assert ("q_udf_scalar", 2.6) in flagged
    box = bench.session_box_factor(timings, "0.1")
    bench.warmed_advisory(timings, box=box)
    assert "ADVISORY-EXCEEDED" in capsys.readouterr().err


def test_hard_flag_implies_advisory_flag_property(tmp_path, monkeypatch, capsys):
    # The monotone-severity claim as a PROPERTY over random sessions:
    # for any timings, any warmed-anchored key the hard gate flags must
    # also be advisory-flagged when the advisory reads the same box.
    # (QUERY_RATIO > WARMED_RATIO and both divide by the same box over
    # the same anchor — this pins that the implementations stay aligned.)
    from hypothesis import given, settings
    from hypothesis import strategies as st

    warmed_keys = sorted(bench.WARMED_ANCHORS)
    anchors = {f"k{i}": 1.0 for i in range(8)}

    @settings(max_examples=40, deadline=None)
    @given(
        filler=st.floats(min_value=0.5, max_value=3.0),
        mults=st.lists(
            st.floats(min_value=0.5, max_value=4.0),
            min_size=len(warmed_keys), max_size=len(warmed_keys),
        ),
    )
    def prop(filler, mults):
        _anchor_file(tmp_path, monkeypatch, anchors)
        timings = {f"k{i}": filler for i in range(8)}
        for k, m in zip(warmed_keys, mults):
            timings[k] = bench.WARMED_ANCHORS[k] * m
        flagged = dict(bench.check_regressions(timings, "0.1"))
        capsys.readouterr()
        box = bench.session_box_factor(timings, "0.1")
        bench.warmed_advisory(timings, box=box)
        err = capsys.readouterr().err
        for k in warmed_keys:
            if k in flagged:
                line = [ln for ln in err.splitlines() if f" {k} " in ln]
                assert line and "ADVISORY-EXCEEDED" in line[0], (k, flagged, err)

    prop()


def test_box_factor_advisory_records_blind_spot(capsys):
    # r11 ADVICE: a uniform code slowdown inflates the box median itself
    # and every per-key excess reads ~1.0x — the gate must say so loudly
    # instead of auto-classifying the session as host contention.
    best = {"q_udf_scalar": bench.WARMED_ANCHORS["q_udf_scalar"] * 1.6}
    gate = bench.warmed_advisory(best, box=1.62)
    assert gate["box_factor_advisory"]["exceeded"] is True
    assert "BOX-FACTOR ADVISORY" in capsys.readouterr().err
    gate = bench.warmed_advisory(best, box=1.2)
    assert gate["box_factor_advisory"]["exceeded"] is False
    assert "BOX-FACTOR ADVISORY" not in capsys.readouterr().err


def test_overflow_falls_back_to_minimal_line():
    detail = _full_detail()
    detail["metric"] = "x" * 2000  # pathological: force the fallback
    line = bench.format_final_line(detail)
    parsed = json.loads(line)
    assert set(parsed) == {"metric", "value", "unit", "queries", "sf"}


def test_budget_is_under_driver_tail_buffer():
    # The driver tail holds ~2000 chars; leave margin for a trailing
    # newline and any final progress-bar erase sequences.
    assert bench.FINAL_LINE_BUDGET <= 1700
