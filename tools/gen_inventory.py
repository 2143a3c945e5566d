"""Regenerate SURVEY.md §2.12 from the live registry.

Run after adding/removing operator keys:

    python3 tools/gen_inventory.py

Rewrites everything below the `## §2.12` marker in SURVEY.md with one
row per registered key (module, oracle kind, first docstring line), so
the judged inventory can never drift from the code.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from processor_spark import registry  # noqa: E402

SURVEY = Path(__file__).resolve().parent.parent / "SURVEY.md"
MARKER = "## §2.12 Implemented inventory"


def main() -> None:
    registry.load_all_modules()
    qs = sorted(registry._REGISTRY.values(), key=lambda q: q.key)
    n_sql = sum(1 for q in qs if q.sql is not None)

    rows = []
    for q in qs:
        module = q.fn.__module__.rsplit(".", 1)[-1]
        first_line = (q.doc or "").strip().splitlines()[0] if q.doc else ""
        oracle = "SQL" if q.sql is not None else "rows-only"
        rows.append(f"| {q.key} | {module} | {oracle} | {first_line} |")

    section = f"""{MARKER} (regenerated from the registry each round — tools/gen_inventory.py)

Every key below is registered in ``__spark_entry__.py::queries()``;
``oracle=SQL`` keys carry a DuckDB twin in ``oracle_sql()`` and pass
the hash check at sf0.01 AND sf0.1 (tests/test_oracle_parity.py
mirrors the driver). {len(qs)} keys, {n_sql} SQL-oracled.
Regenerate with ``python3 tools/gen_inventory.py``.

| query key | module | oracle | summary |
|---|---|---|---|
""" + "\n".join(rows) + "\n"

    text = SURVEY.read_text()
    head = re.split(rf"^{re.escape(MARKER)}.*$", text, maxsplit=1, flags=re.M)[0]
    SURVEY.write_text(head + section)
    print(f"SURVEY.md §2.12: {len(qs)} keys, {n_sql} SQL-oracled")


if __name__ == "__main__":
    main()
