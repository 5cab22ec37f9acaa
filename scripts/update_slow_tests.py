"""Regenerate tests/slow_tests.txt from a pytest --durations report.

Usage:
    python -m pytest tests/ -q --durations=0 2>&1 | tee /tmp/durations.log
    python scripts/update_slow_tests.py /tmp/durations.log [threshold_s]

Tests at/above the threshold (default 4.5s, single-threaded on the
recording box) get the `slow` marker via tests/conftest.py's
pytest_collection_modifyitems and are excluded from the default
`make test` gate (run everything with `make test-all`).
"""
from __future__ import annotations

import os
import re
import sys


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 4.5
    rows = []
    with open(sys.argv[1]) as f:
        for ln in f:
            m = re.match(r"\s*([\d.]+)s call\s+(tests/\S+)", ln)
            if m and float(m.group(1)) >= threshold:
                rows.append((float(m.group(1)), m.group(2)))
    rows.sort(reverse=True)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "slow_tests.txt")
    with open(out, "w") as f:
        f.write("\n".join(nid for _, nid in rows) + "\n")
    print(f"wrote {out}: {len(rows)} tests >= {threshold}s "
          f"({sum(d for d, _ in rows):.0f}s total)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
