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
