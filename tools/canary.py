#!/usr/bin/env python3
"""Machine canary (BASELINE.md v9): two single-core CPU reference
timings — an md5 digest chain and a pure-Python sum loop — rerun
before trusting ANY cross-day per-key comparison.  Ambient machine
shifts of 1.2-2x across every key have been observed between
sessions; the canary separates "the machine is slow today" from "the
code regressed".

Importable (``from tools.canary import canary``) and runnable.
"""

from __future__ import annotations

import hashlib
import json
import time


def canary() -> dict[str, float]:
    t0 = time.perf_counter()
    h = b"x"
    for _ in range(2_000_000):
        h = hashlib.md5(h).digest()
    md5_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i
    loop_s = time.perf_counter() - t0
    return {"md5_2m_s": round(md5_s, 3), "loop_20m_s": round(loop_s, 3)}


if __name__ == "__main__":
    print(json.dumps(canary()))
