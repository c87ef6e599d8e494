#!/usr/bin/env python
"""Run the full pytest suite and append a {"kind": "pytest", ...} record
to PROGRESS.jsonl (VERDICT r13 item #8): the judge re-ran the whole
~90-minute suite to verify "pytest green" because no artifact recorded
it — this script makes the builder's own run the auditable record.

Usage: python scripts/run_pytest_progress.py [extra pytest args]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", *sys.argv[1:]],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    lines = [ln for ln in (proc.stdout or "").strip().splitlines() if ln]
    tail = lines[-1] if lines else ""

    def grab(pat: str) -> int:
        m = re.search(pat, tail)
        return int(m.group(1)) if m else 0

    rec = {
        "ts": time.time(),
        "kind": "pytest",
        "passed": grab(r"(\d+) passed"),
        "failed": grab(r"(\d+) failed"),
        "skipped": grab(r"(\d+) skipped"),
        "deselected": grab(r"(\d+) deselected"),
        "errors": grab(r"(\d+) error"),
        "duration_s": round(time.time() - t0, 1),
        "returncode": proc.returncode,
        "summary": tail[:300],
    }
    with open(os.path.join(REPO, "PROGRESS.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
