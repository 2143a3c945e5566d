"""sweep_confirm as a FAILING gate (r13, VERDICT r12 next #7).

The confirm pipeline must (a) dissolve a sweep flag whose isolated
re-measure is fast (the de-noising that adjudicated 44/45 r10 flags
and all 25 r12 ones), and (b) FAIL — gate_failed non-empty, main()
exit nonzero — on a PLANTED real regression: a key whose builder
actually got slower (an artificial sleep), exactly the case a
machine-day shift can't explain.
"""

from __future__ import annotations

import time


def _artifacts(old_s: float, new_s: float, key: str) -> tuple[dict, dict]:
    return {"queries": {key: old_s}}, {"queries": {key: new_s}}


def test_gate_fails_on_planted_sleep_regression(spark):
    from tools.sweep_confirm import confirm

    def sleepy(sp, sf_dir):
        time.sleep(0.8)
        return sp.range(1)

    old, new = _artifacts(0.4, 2.0, "q_sleepy")
    res = confirm(old, new, thr=1.3, queries={"q_sleepy": sleepy},
                  spark=spark, skip_canary=True)
    assert res["flagged_in_sweep"] == 1
    assert res["confirmed"] == ["q_sleepy"], res
    assert res["gate_failed"] == ["q_sleepy"], res
    assert res["keys"]["q_sleepy"]["raw_ratio"] > 1.3


def test_gate_dissolves_inflated_sweep_flag(spark):
    """The r10/r12 adjudication: an in-sweep 5× flag whose isolated
    median is actually FAST confirms nothing and fails no gate."""
    from tools.sweep_confirm import confirm

    def fast(sp, sf_dir):
        return sp.range(1)

    old, new = _artifacts(0.4, 2.0, "q_fast")
    res = confirm(old, new, thr=1.3, queries={"q_fast": fast},
                  spark=spark, skip_canary=True)
    assert res["flagged_in_sweep"] == 1
    assert res["confirmed"] == [] and res["gate_failed"] == [], res


def test_gate_exit_code_nonzero(tmp_path, spark):
    """main() must exit nonzero iff gate_failed is non-empty — the
    contract the round-close script relies on (subprocess-free check:
    drive main() with planted artifact files and a monkeypatched
    confirm so no Spark work runs)."""
    import json
    import sys

    import pytest

    import tools.sweep_confirm as sc

    o, n = tmp_path / "old.json", tmp_path / "new.json"
    o.write_text(json.dumps({"queries": {"q_x": 0.5}}))
    n.write_text(json.dumps({"queries": {"q_x": 2.0}}))

    orig = sc.confirm
    try:
        sc.confirm = lambda *a, **k: {"gate_failed": ["q_x"], "keys": {},
                                      "confirmed": ["q_x"]}
        sys_argv = sys.argv
        sys.argv = ["sweep_confirm.py", str(o), str(n)]
        with pytest.raises(SystemExit) as ei:
            sc.main()
        assert ei.value.code == 1
        sc.confirm = lambda *a, **k: {"gate_failed": [], "keys": {},
                                      "confirmed": []}
        sc.main()  # no exit — returns normally
    finally:
        sc.confirm = orig
        sys.argv = sys_argv
