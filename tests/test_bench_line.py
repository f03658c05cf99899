"""bench.py final-line budget: the driver parses the last JSON line out of
a 2000-char stdout tail, so the line must ALWAYS fit (round 2's full
per-query dict overflowed the window and the headline number was lost)."""

from __future__ import annotations

import json

from bench import _LINE_BUDGET, _final_line


def test_small_result_is_complete():
    t = {f"q{i}": 0.5 for i in range(40)}
    d = json.loads(_final_line(20.0, t, 0.1))
    assert d["queries"] == {k: 0.5 for k in t}
    assert "queries_omitted" not in d


def test_oversized_result_keeps_slowest_and_fits():
    t = {f"query_name_number_{i:03d}": round(0.1 + i * 0.01, 3) for i in range(150)}
    line = _final_line(sum(t.values()), t, 0.1)
    assert len(line) <= _LINE_BUDGET
    d = json.loads(line)
    kept = d["queries"]
    assert d["queries_omitted"] == len(t) - len(kept)
    # slowest-first retention: every kept timing >= every omitted timing
    omitted = set(t) - set(kept)
    assert min(kept.values()) >= max(t[n] for n in omitted)
    # the omitted total is accounted for, so value stays auditable
    assert abs(d["omitted_sec"] - sum(t[n] for n in omitted)) < 1e-6
    assert d["value"] == sum(t.values())


def test_budget_capped_run_is_visibly_capped():
    """A budget-cut run must carry queries_unrun in the final line."""
    d = json.loads(_final_line(12.0, {"q1": 12.0}, 0.1, unrun=7))
    assert d["queries_unrun"] == 7
    assert "queries_unrun" not in json.loads(_final_line(12.0, {"q1": 12.0}, 0.1))


def test_single_pass_tail_is_marked():
    d = json.loads(_final_line(12.0, {"q1": 12.0}, 0.1, single_pass=3))
    assert d["single_pass_tail"] == 3
    assert "single_pass_tail" not in json.loads(
        _final_line(12.0, {"q1": 12.0}, 0.1)
    )


def test_final_line_carries_drift_normalization():
    from bench import _final_line

    line = _final_line(
        100.0, {"a": 1.0, "b": 2.0}, 0.1, drift=1.25, norm=80.0
    )
    payload = json.loads(line)
    assert payload["drift_factor"] == 1.25
    assert payload["value_normalized"] == 80.0
    # absent when no drift estimate (non-sf0.1 or cold controls)
    line = _final_line(100.0, {"a": 1.0}, 0.01)
    assert "drift_factor" not in json.loads(line)


def test_final_line_carries_median_ratio_normalization():
    """r10 (r09 VERDICT item 3): the burst-proof drift estimate — the
    median warm per-query ratio vs BENCH_REF.json — rides the stdout
    line next to the 3-point trio factor."""
    line = _final_line(
        100.0, {"a": 1.0, "b": 2.0}, 0.1, drift=1.25, norm=80.0,
        drift_median=1.1,
    )
    payload = json.loads(line)
    assert payload["drift_median"] == 1.1
    assert payload["value_normalized_median"] == round(100.0 / 1.1, 3)
    # absent when no per-query reference data was available
    line = _final_line(100.0, {"a": 1.0}, 0.1, drift=1.25, norm=80.0)
    assert "drift_median" not in json.loads(line)


def test_bench_ref_seed_matches_running_minimum_semantics():
    """BENCH_REF.json is a running minimum of warm timings: the seeder
    and bench.py's in-run update must agree that a LOWER warm timing
    rebases the reference and a higher one never does."""
    import bench as benchmod  # noqa: F401  (import proves no side effects)

    ref = {"q1": 2.0, "q2": 1.0}
    timings = {"q1": 1.5, "q2": 3.0, "q3": 0.7}
    passes = {"q1": 2, "q2": 2, "q3": 1}
    # replicate bench.py's update rule
    for n, sec in timings.items():
        if passes.get(n) == 2 and sec > 0 and (n not in ref or sec < ref[n]):
            ref[n] = sec
    assert ref == {"q1": 1.5, "q2": 1.0}  # q3 cold: never enters the ref
