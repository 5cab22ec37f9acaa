"""Rebuild bench_artifacts/summary.json from the individual artifact
files (newest data wins). bench_matrix writes summary.json atomically at
the END of a full battery; if a run is interrupted part-way the stale
summary would contradict the fresh per-row artifacts (the r4 evidence
failure mode) — this reconstructs it from whatever is on disk, keyed by
each file's own provenance stamp.

Usage: python scripts/rebuild_summary.py
"""
from __future__ import annotations

import json
import os

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_artifacts")


def main() -> int:
    rows = []
    for name in sorted(os.listdir(ART)):
        if not name.endswith(".json") or name == "summary.json":
            continue
        path = os.path.join(ART, name)
        if os.path.getsize(path) == 0:
            print(f"WARNING: {name} is empty — dropping it")
            os.unlink(path)
            continue
        with open(path) as f:
            rows.append({"artifact": name, **json.load(f)})
    with open(os.path.join(ART, "summary.json"), "w") as f:
        json.dump(rows, f, indent=1)
    stamped = sum(1 for r in rows if "measured_at" in r)
    print(f"summary.json rebuilt from {len(rows)} artifacts "
          f"({stamped} carry provenance stamps)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
