"""Seed/refresh BENCH_REF.json: per-query clean-band reference timings.

The reference for each query is the MINIMUM warm (best-of-2) timing it has
ever recorded in a sf0.1 BENCH_DETAIL.json — bursts and host drift only ever
INFLATE a timing, so the min over many runs converges on the query's
clean-host steady-state cost (the same logic as best-of-2, applied across
runs). Seeds from every BENCH_DETAIL.json version in git history plus the
working tree; bench.py then keeps the file fresh as a running minimum.
"""

from __future__ import annotations

import json
import subprocess
import sys

REPO = "/root/repo"


def _versions() -> list[dict]:
    revs = subprocess.run(
        ["git", "log", "--format=%H", "--", "BENCH_DETAIL.json"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    out = []
    for rev in revs:
        raw = subprocess.run(
            ["git", "show", f"{rev}:BENCH_DETAIL.json"],
            cwd=REPO, capture_output=True, text=True,
        )
        if raw.returncode != 0:
            continue
        try:
            out.append(json.loads(raw.stdout))
        except ValueError:
            continue
    try:
        with open(f"{REPO}/BENCH_DETAIL.json") as f:
            out.append(json.load(f))
    except (OSError, ValueError):
        pass
    return out


def main() -> None:
    ref: dict[str, float] = {}
    runs = 0
    for d in _versions():
        if d.get("sf") != 0.1:
            continue
        runs += 1
        for name, rec in (d.get("queries") or {}).items():
            if not isinstance(rec, dict) or rec.get("passes") != 2:
                continue
            sec = rec.get("sec")
            if not isinstance(sec, (int, float)) or sec <= 0:
                continue
            if name not in ref or sec < ref[name]:
                ref[name] = sec
    payload = {
        "note": (
            "per-query clean-band reference = min warm (best-of-2) sf0.1 "
            "timing ever recorded; maintained as a running minimum by "
            "bench.py, reseedable via tools/seed_bench_ref.py"
        ),
        "runs_seen": runs,
        "queries": {n: ref[n] for n in sorted(ref)},
    }
    with open(f"{REPO}/BENCH_REF.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(f"seeded {len(ref)} query refs from {runs} runs")


if __name__ == "__main__":
    main()
