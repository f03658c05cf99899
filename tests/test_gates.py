"""Keep capability gates warm.

The real-Iceberg suite is capability-gated (no iceberg-spark-runtime jar
ships in this container), but it must keep COLLECTING cleanly — a stale
import or fixture error would silently turn "skipped until a jar appears"
into "never runs again" (round-3 VERDICT #9).
"""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_iceberg_gated_suite_still_collects():
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            "--collect-only",
            "-q",
            "-p",
            "no:cacheprovider",
            os.path.join(_REPO, "tests", "test_iceberg_backend.py"),
        ],
        capture_output=True,
        text=True,
        cwd=_REPO,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    # at least one test item must be discoverable
    assert "test" in proc.stdout


def test_registry_warns_when_artifacts_missing(monkeypatch, tmp_path):
    """If neither the repo root nor the cwd holds CORRECTNESS artifacts,
    the registry must WARN (and fall back to no-history ranking) rather
    than silently ordering alphabetically — the silent mode would rotate
    unproven queries out of the driver's gate window."""
    import warnings
    from pathlib import Path

    from bytewax_iceberg_connector_spark.plans import registry

    monkeypatch.setattr(registry, "_REPO_ROOT", Path(str(tmp_path / "nowhere")))
    monkeypatch.setattr(registry.Path, "cwd", staticmethod(lambda: Path(str(tmp_path))))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert registry._artifact_paths() == []
    assert any("CORRECTNESS" in str(w.message) for w in caught)


def test_registry_artifact_cwd_fallback(monkeypatch, tmp_path):
    """Artifacts beside the process cwd are found when the package is
    imported away from the source checkout (wheel/site-packages case)."""
    import json as _json
    from pathlib import Path

    from bytewax_iceberg_connector_spark.plans import registry

    (tmp_path / "CORRECTNESS_r09.json").write_text(
        _json.dumps({"some_query": {"rows_match": True, "schema_match": True,
                                    "hash_match": True, "err": None}})
    )
    monkeypatch.setattr(registry, "_REPO_ROOT", Path(str(tmp_path / "nowhere")))
    monkeypatch.setattr(registry.Path, "cwd", staticmethod(lambda: Path(str(tmp_path))))
    recs = registry._driver_records()
    assert recs.get("some_query") == (9, True, False)


def test_explain_audit_exchange_counting_rule():
    """Round-6 contract (r05 verdict #2): the audit counts shuffle-
    exchange NODES in the physical tree only — skipping (a) everything
    indented under an InMemoryTableScan (plan text replays the cached
    build plan under every cache reference; those exchanges already ran
    once) and (b) the formatted per-node detail section (which repeats
    every node name). BroadcastExchange never counts."""
    from tools.explain_audit import count_executed_exchanges

    plan = """== Physical Plan ==
AdaptiveSparkPlan (9)
+- HashAggregate (8)
   +- Exchange (7)
      +- HashAggregate (6)
         +- BroadcastHashJoin (5)
            :- InMemoryTableScan (1)
            :     +- InMemoryRelation (2)
            :           +- Exchange hashpartitioning(v, 32)
            :              +- Scan parquet (3)
            +- BroadcastExchange (4)
               +- InMemoryTableScan (10)
                     +- InMemoryRelation (11)
                           +- Exchange hashpartitioning(u, 32)
                              +- Scan parquet (12)

(7) Exchange
Arguments: hashpartitioning(k, 32), ENSURE_REQUIREMENTS

(4) BroadcastExchange
"""
    n_ex, n_imts = count_executed_exchanges(plan)
    assert n_ex == 1  # only node (7): cached + broadcast + details skipped
    assert n_imts == 2


def test_explain_audit_single_partition_detection():
    """single_partition counts EXECUTED Exchange nodes whose detail block
    declares SinglePartition — never cached replays, never hash/range
    exchanges, and never detail blocks of nodes outside the executed
    tree."""
    from tools.explain_audit import count_single_partition_exchanges

    plan = """== Physical Plan ==
AdaptiveSparkPlan (9)
+- Window (8)
   +- Exchange (7)
      +- HashAggregate (6)
         +- Exchange (5)
            +- InMemoryTableScan (1)
                  +- InMemoryRelation (2)
                        +- Exchange (99)
                           +- Scan parquet (3)

(7) Exchange
Input [2]: [a, b]
Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]

(5) Exchange
Input [2]: [a, b]
Arguments: hashpartitioning(k#1, 32), ENSURE_REQUIREMENTS, [plan_id=2]

(99) Exchange
Input [2]: [a, b]
Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=3]
"""
    assert count_single_partition_exchanges(plan) == 1
