"""Machine-readable bench regression gate (round-4 verdict item 7).

Diffs the current ``BENCH_DETAIL.json`` against the newest committed
``BENCH_DETAIL_r{N}.json`` snapshot using the variance band BASELINE.md
documents for this box (a regression must exceed BOTH +25% relative and
+0.5 s absolute to flag — smaller deltas are load noise), and appends one
``{"kind": "bench_regressions", ...}`` record to ``PROGRESS.jsonl``.

Usage: python scripts/bench_regressions.py [old.json [new.json]]
End-of-round ritual: run the full ``python bench.py``, run this script,
then ``cp BENCH_DETAIL.json BENCH_DETAIL_r{N}.json`` so the next round
diffs against this one.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_REL = 1.25  # flag only beyond +25% ...
_ABS = 0.5  # ... AND +0.5 s (both: the measured box-variance band)


def main() -> int:
    snaps = sorted(glob.glob(os.path.join(_REPO, "BENCH_DETAIL_r*.json")))
    old_path = sys.argv[1] if len(sys.argv) > 1 else (snaps[-1] if snaps else None)
    new_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(_REPO, "BENCH_DETAIL.json")
    if old_path is None:
        print("no BENCH_DETAIL_r*.json snapshot to diff against")
        return 1

    def _load_queries(path: str) -> dict | None:
        try:
            with open(path) as f:
                return json.load(f)["queries"]
        except FileNotFoundError:
            print(f"{path} not found — run the full `python bench.py` first")
        except (KeyError, json.JSONDecodeError):
            print(
                f"{path} has no 'queries' map — an isolation-only bench run "
                "doesn't write it; run the full `python bench.py` first"
            )
        return None

    old = _load_queries(old_path)
    new = _load_queries(new_path)
    if old is None or new is None:
        return 1

    regressions, improvements = [], []
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        if n > o * _REL and n - o > _ABS:
            regressions.append({"q": name, "old": o, "new": n, "x": round(n / o, 2)})
        elif o > n * _REL and o - n > _ABS:
            improvements.append({"q": name, "old": o, "new": n, "x": round(n / o, 2)})

    rec = {
        "ts": time.time(),
        "kind": "bench_regressions",
        "old": os.path.basename(old_path),
        "new": os.path.basename(new_path),
        "n_shared": len(set(old) & set(new)),
        "added": sorted(set(new) - set(old)),
        "removed": sorted(set(old) - set(new)),
        "regressions": regressions,
        "improvements": improvements,
    }
    with open(os.path.join(_REPO, "PROGRESS.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
