#!/usr/bin/env python3
"""De-noised sweep regression confirmation (VERDICT r8 #5 / r9 next
#4): one-JVM full-registry sweeps carry up to 5x per-key noise, so a
raw sweep_diff flag is an UPPER BOUND, never a verdict.  This tool
mechanizes the adjudication CLAUDE.md prescribes by hand:

1. run the machine canary (tools/canary.py) — if the old artifact
   recorded one, per-key old values are ambient-normalized by the
   canary ratio before comparison;
2. diff OLD vs NEW sweep artifacts (same rule as sweep_diff: keys
   >= 0.3 s in OLD, in-sweep ratio > threshold);
3. isolated 3-pass re-measure of every flagged key in THIS process
   (fresh JVM relative to the sweep; one warm pass, then three timed
   passes with clearCache between) — the MEDIAN is canonical;
4. a key is CONFIRMED regressed only if its isolated median still
   exceeds threshold x (canary-normalized) old;
5. GATE (r13, VERDICT r12 next #7): a confirmed key whose RAW
   isolated ratio exceeds the control group's measured ambient floor
   by more than the threshold is a REAL regression — the tool records
   it in "gate_failed" and main() exits NONZERO, so round-close
   catches it mechanically instead of editorially.

Usage: python3 tools/sweep_confirm.py OLD.json NEW.json [thr=1.3]
Prints one JSON line; $SPARK_GRAFT_CONFIRM_OUT writes it to a file.
Exit code 1 iff the gate fails.  NEVER run while another Spark job
holds the cores.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.canary import canary  # noqa: E402

# Control group (r12): three dependency-light keys that no round has
# touched in ages, measured with the SAME isolated protocol — their
# median ratio vs the old artifact is the machine-day ambient floor
# measured the way the flagged keys are measured (a one-moment canary
# under- or over-normalizes: the r12 confirm normalized by 0.811 and
# "confirmed" 25 keys whose raw isolated ratios all sat in the same
# 1.06-1.25 band as the untouched controls).  A flagged key is only a
# REAL regression to the extent it exceeds this floor.
CONTROL_KEYS = ("q_filter", "q_struct_funcs", "q_subquery_correlated")


def _isolated_median(spark, fn, sf_dir: str) -> tuple[list, float]:
    fn(spark, sf_dir).toPandas()  # warm (plan+codegen)
    passes = []
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).toPandas()
        passes.append(round(time.perf_counter() - t0, 3))
    return passes, round(statistics.median(passes), 3)


def confirm(old: dict, new: dict, thr: float = 1.3, queries=None,
            spark=None, skip_canary: bool = False) -> dict:
    """Core adjudication, callable in-process (the gate test injects a
    synthetic queries dict).  Returns the result record; gate failures
    are in result["gate_failed"]."""
    oq, nq = old["queries"], new["queries"]

    can = None if skip_canary else canary()
    # ambient normalization: if the old artifact recorded a canary,
    # scale its per-key times to TODAY's machine speed before ratioing
    # (md5 chain tracks the digest-dense keys; the python loop tracks
    # driver-side work — use their mean as a scalar machine factor)
    norm = 1.0
    if can is not None and isinstance(old.get("canary"), dict):
        oc = old["canary"]
        r1 = can["md5_2m_s"] / oc["md5_2m_s"]
        r2 = can["loop_20m_s"] / oc["loop_20m_s"]
        norm = round((r1 + r2) / 2, 3)

    flagged = sorted(
        k
        for k in oq
        if k in nq and oq[k] >= 0.3 and nq[k] / (oq[k] * norm) > thr
    )

    result: dict = {
        "threshold": thr,
        "canary": can,
        "ambient_norm": norm,
        "flagged_in_sweep": len(flagged),
        "keys": {},
        "confirmed": [],
        "gate_failed": [],
    }

    if flagged:
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        if queries is None:
            from processor_spark import registry

            queries = registry.queries()
        if spark is None:
            from processor_spark.session import build_session

            spark = build_session(app_name="processor_spark-sweep-confirm")
        control_ratios = []
        for key in CONTROL_KEYS:
            if key not in queries or key not in oq:
                continue
            _passes, med = _isolated_median(spark, queries[key], sf_dir)
            control_ratios.append(med / oq[key])
        if control_ratios:
            result["control_floor_raw_ratio"] = round(
                statistics.median(control_ratios), 3
            )
        # the gate compares RAW isolated ratios against the floor the
        # controls actually measured today (1.0 when no control is
        # available — then raw ratio alone carries the verdict)
        floor = result.get("control_floor_raw_ratio", 1.0)
        for key in flagged:
            passes, med = _isolated_median(spark, queries[key], sf_dir)
            confirmed = med > thr * oq[key] * norm
            raw_ratio = round(med / oq[key], 3)
            gate_failed = confirmed and raw_ratio > thr * floor
            result["keys"][key] = {
                "old": oq[key],
                "old_normalized": round(oq[key] * norm, 3),
                "in_sweep": nq[key],
                "isolated": passes,
                "median": med,
                "raw_ratio": raw_ratio,
                "confirmed": confirmed,
                "gate_failed": gate_failed,
            }
            if confirmed:
                result["confirmed"].append(key)
            if gate_failed:
                result["gate_failed"].append(key)

    # ambient-shift heuristic (r10 close): when the OLD artifact has no
    # canary to normalize against, a machine-day shift confirms many
    # UNRELATED keys at a uniform ratio.  If >= 5 keys confirm and
    # their median-ratio spread is tight (max/min <= 1.6) across >= 4
    # distinct key families (prefix after "q_"), the confirmation set
    # is flagged ambient — real code regressions localize.
    if len(result["confirmed"]) >= 5:
        ratios = [
            result["keys"][k]["median"] / result["keys"][k]["old_normalized"]
            for k in result["confirmed"]
        ]
        fams = {k.split("_")[1][:4] for k in result["confirmed"]}
        if len(fams) >= 4 and max(ratios) / min(ratios) <= 1.6:
            result["ambient_shift_suspected"] = {
                "ratio_band": [round(min(ratios), 2), round(max(ratios), 2)],
                "families": sorted(fams),
                "note": "uniform shift across unrelated families — "
                "treat as machine-day ambient unless a shared "
                "dependency changed; re-run under a fresh canary",
            }
    return result


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3

    result = confirm(old, new, thr)
    line = json.dumps(result)
    print(line)
    dest = os.environ.get("SPARK_GRAFT_CONFIRM_OUT")
    if dest:
        with open(dest, "w") as fh:
            fh.write(line + "\n")
    if result["gate_failed"]:
        sys.exit(1)  # the round-close gate: a real, de-noised regression


if __name__ == "__main__":
    main()
