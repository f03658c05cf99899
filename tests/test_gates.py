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
