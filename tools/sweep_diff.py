#!/usr/bin/env python3
"""Diff two BASELINE_SWEEP artifacts: per-key regressions past a
threshold, new/removed keys, and totals — the round-over-round
check VERDICT r5 #5 asked for, as a tool instead of ad-hoc inline
Python.

Usage: python3 tools/sweep_diff.py OLD.json NEW.json [ratio_threshold]

Keys faster than 0.3 s in the old artifact are skipped for the
regression listing (fixed per-action overhead dominates them and the
ambient spread routinely exceeds any real signal).  Cross-day
comparisons are only meaningful after checking the machine canary in
BASELINE.md v9 — ambient shifts of 1.2-2x across EVERY key have been
observed between sessions.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    oq, nq = old["queries"], new["queries"]

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    regs = sorted(
        (
            (k, round(nq[k] / oq[k], 2), oq[k], nq[k])
            for k in oq
            if k in nq and oq[k] >= 0.3 and nq[k] / oq[k] > thr
        ),
        key=lambda r: -r[1],
    )
    print(
        json.dumps(
            {
                "old_n": old["n"],
                "new_n": new["n"],
                "old_total_sec": old["total_sec"],
                "new_total_sec": new["total_sec"],
                "added": added,
                "removed": removed,
                "threshold": thr,
                "regressions": [
                    {"key": k, "ratio": r, "old_sec": o, "new_sec": n}
                    for k, r, o, n in regs
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
