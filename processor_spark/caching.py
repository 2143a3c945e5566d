"""Deterministic release of shared-subplan persists.

Operators ``persist()`` DataFrames referenced more than once in a
single plan (self-join build sides, rollup bases, offset tables) —
Spark has no automatic CTE materialization, so an unpersisted shared
subplan is simply computed twice.  ``persist`` (never
``localCheckpoint``) is the house rule because the CacheManager also
gives an IDENTICAL later plan a cache hit and ``clearCache()`` can
evict it (CLAUDE.md, round-4 measurement: swapping the dedup persists
to localCheckpoint regressed q_dedup_minhash_md5 0.8→2.1 s).

The cost of that rule used to be hygiene: a long driver session running
many registered keys accumulated one live cache entry per persist site
(VERDICT r4 "What's wrong" #2).  This module closes the loop:

- operators call :func:`scoped_persist` instead of bare ``.persist()``;
  the entry is tagged with the registry key being built;
- the registry wrapper brackets every top-level invocation with
  :func:`invocation`, which on entry releases every tracked entry owned
  by a DIFFERENT key.

So at most one key's blocks are live at any time, release is
deterministic (not GC-dependent), and a SAME-key re-invocation keeps
its plan-cache hit — the entry is only dropped when another key runs.
``bench.py``'s per-key ``clearCache()`` isolation is unaffected (a
tracked entry that was already cleared unpersists as a no-op).

Reentrancy: registered fns may call other registered fns
(q_dedup_near → q_dedup_minhash); only the OUTERMOST invocation
releases, so an outer key's persists are never dropped mid-build.

Assumed driver protocol (ADVICE r5): build-then-immediately-execute,
single-threaded — release is keyed to the next key's BUILD time, so a
driver that builds key A, builds key B, then executes A would have
A's shared subplans silently unpersisted before use (results stay
correct; the persist's perf win is lost), and the module globals are
not thread-safe.  Every in-repo driver (the registry wrapper,
bench.py, the oracle-parity suite, the external driver's per-key
run-and-collect loop) follows the protocol; if a concurrent driver
ever enters scope, move _TRACKED/_CURRENT/_DEPTH into
``threading.local``.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

# (owner_key, DataFrame) for every live scoped persist.
_TRACKED: list[tuple[str, DataFrame]] = []
_CURRENT: str | None = None
_DEPTH: int = 0


def scoped_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() a shared subplan and track it for release at the next
    top-level invocation of a different registry key."""
    df = df.persist() if storage_level is None else df.persist(storage_level)
    owner = _CURRENT or "<unowned>"
    # same-key re-invocations (bench warm loops) rebuild an identical
    # plan that hits the SAME CacheManager entry — tracking it again
    # would only grow the list with duplicate refs (ADVICE r5)
    for t_owner, t_df in _TRACKED:
        try:
            if t_owner == owner and df.sameSemantics(t_df):
                return df
        except Exception:
            continue  # stale entry from a stopped session — not a match
    _TRACKED.append((owner, df))
    return df


def release_tracked(keep_owner: str | None = None) -> int:
    """Unpersist every tracked entry not owned by ``keep_owner``.

    Returns the number of entries released.  Unpersist never fails the
    caller: a stopped session or an already-cleared cache entry is a
    no-op, not an error.
    """
    kept: list[tuple[str, DataFrame]] = []
    released = 0
    for owner, df in _TRACKED:
        if keep_owner is not None and owner == keep_owner:
            kept.append((owner, df))
            continue
        try:
            df.unpersist(blocking=False)
            released += 1
        except Exception:
            pass  # session gone / entry evicted — release is best-effort
    _TRACKED[:] = kept
    return released


@contextmanager
def invocation(key: str):
    """Bracket a top-level registry invocation: release the previous
    key's persists on entry (outermost frame only)."""
    global _CURRENT, _DEPTH
    _DEPTH += 1
    try:
        if _DEPTH == 1:
            if _CURRENT != key:
                release_tracked(keep_owner=key)
            _CURRENT = key
        yield
    finally:
        _DEPTH -= 1
