#!/usr/bin/env python3
"""r14-opt: the dropped/Σocc² QUALITY ladder at nlist 8192–32768 —
the adjudication the NUMPY_FLAT_MAX_NLIST comment demands before the
flat/routed ceiling can move (OPTIMIZATION_r14.md "Not yet optimized"
#2).  After _router_groups went vectorized, routed rp3 is FASTER than
blocked flat from ~nlist=8192 up, but speed alone cannot move the
ceiling: in-window exact flat is the quality-bearing choice.  This
ladder prices the quality side of that trade at the occupancy-250
layouts the n/250 rule actually produces in the window (2M vectors →
nlist=8192 … 8M → 32768), entirely in the numpy twin (r13 method: the
twin reproduced the engine's measured Σocc² verbatim before any
engine change shipped).

Twin fidelity: micro-units floor((x+2)*1e6+0.5), exact int64
squared-L2 via sub-2^53 float64 matmul, (sq, cid) argmin tie-break as
first-occurrence over cid-ascending rows, one Lloyd round from the
lowest-vec_id seeds, exact integer centroid means (// on positives),
empty seeds drop their cell, SemDeDup drop rule = lower-id same-cell
neighbor within SEMDEDUP_EPS.  The jittered N× corpus is generated
bit-identically to tools/ann_bits_probe.build_layout (same ±5% jitter
hash, float32 cast), so the REPL=64 rung is a VALIDATION rung: it
must reproduce the engine-measured dropped 126,579 (flat) / 124,173
(rp3) and Σocc² 36.4M / 46.0M before the bigger rungs are believed.

Usage: python3 tools/flat_quality_ladder.py [REPL ...]   (default
64 1024 2048 4096 → nlist 512 / 8192 / 16384 / 32768)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.router_balance_probe import (  # noqa: E402
    micro,
    route_groups,
)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGET_CELL = 250
SEMDEDUP_EPS = 1_300_000_000_000
CENT_BLOCK = 1024  # similarity.NUMPY_CENT_BLOCK — the measured cache width
ROW_BLOCK = 16384


def routed_assign_fast(X, cids, C, router_idx, grp, rprobe):
    """router_balance_probe.assign's routed branch with argsort-based
    row grouping instead of a per-unique-set `inv == u` boolean mask —
    that mask is O(n_sets · n), fine at 128k rows, minutes at 2M+.
    Semantics identical (validated against the original at the 64×
    rung); tie-breaks unchanged: stable top-rprobe selection, members
    cid-ascending, first-occurrence argmin."""
    G = C[router_idx]
    Xf = X.astype(np.float64)
    Gf = G.astype(np.float64)
    gd = (
        (Xf * Xf).sum(axis=1)[:, None]
        + (Gf * Gf).sum(axis=1)[None, :]
        - 2.0 * (Xf @ Gf.T)
    )
    out = np.empty(len(X), dtype=np.int64)
    # plain argsort, same as the validated original — only the row
    # GROUPING differs from router_balance_probe.assign
    top = np.argsort(gd, axis=1)[:, :rprobe]
    keys = np.sort(top, axis=1)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    order = np.argsort(inv, kind="stable")
    counts = np.bincount(inv, minlength=len(uniq))
    starts = np.concatenate(([0], np.cumsum(counts)))
    for u in range(len(uniq)):
        rows = order[starts[u] : starts[u + 1]]
        if not len(rows):
            continue
        members = np.nonzero(np.isin(grp, uniq[u]))[0]
        if not len(members):
            members = np.arange(len(C))
        Mf = C[members].astype(np.float64)
        sub = (
            (Xf[rows] * Xf[rows]).sum(axis=1)[:, None]
            + (Mf * Mf).sum(axis=1)[None, :]
            - 2.0 * (Xf[rows] @ Mf.T)
        )
        out[rows] = members[sub.argmin(axis=1)]
    return out


def build_corpus(repl: int) -> np.ndarray:
    """The ann_bits_probe jittered layout, in-memory: replica i>0 of
    base row v gets per-dim jitter ((vid*2654435761 + d*40503 + i) %
    997 / 997.0 - 0.5) * 0.1 where vid = v + i*10_000_000, cast to
    float32 — byte-identical to the Spark builder's transform().
    Rows returned sorted by vec_id (base block first, then replica
    blocks — replica offsets are monotone)."""
    import pyarrow.dataset as ds

    t = ds.dataset(os.path.join(SRC, "embeddings.parquet")).to_table(
        columns=["vec_id", "embedding"]
    )
    pdf = t.to_pandas().sort_values("vec_id").reset_index(drop=True)
    base = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
    bids = pdf["vec_id"].to_numpy().astype(np.int64)
    d = np.arange(base.shape[1], dtype=np.int64)
    parts = [base]
    for i in range(1, repl):
        vid = bids + i * 10_000_000
        m = (vid[:, None] * 2654435761 + d[None, :] * 40503 + i) % 997
        jit = (m / 997.0 - 0.5) * 0.1
        parts.append((base.astype(np.float64) + jit).astype(np.float32))
    return np.concatenate(parts, axis=0)


def flat_argmin(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Exact blocked (sq, cid) argmin of X against cid-ascending C:
    row blocks × CENT_BLOCK centroid columns with a running strict-<
    min (later blocks only win strictly smaller distances, so ties
    keep the lowest cid — same tie-break as the engine's
    _numpy_flat_assign).  The per-row ||x||² term is DROPPED — it is
    constant within a row, so argmin and the exact tie structure are
    unchanged (all remaining terms are exact sub-2^53 integers in
    float64), and the big xsq-broadcast temporary disappears."""
    Xf = X.astype(np.float64)
    Cf = C.astype(np.float64)
    csq = (Cf * Cf).sum(axis=1)
    out = np.empty(len(X), dtype=np.int64)
    for r in range(0, len(X), ROW_BLOCK):
        Xb = Xf[r : r + ROW_BLOCK]
        best = np.full(len(Xb), np.inf)
        bidx = np.zeros(len(Xb), dtype=np.int64)
        for c in range(0, len(C), CENT_BLOCK):
            Cb = Cf[c : c + CENT_BLOCK]
            sq = csq[None, c : c + CENT_BLOCK] - 2.0 * (Xb @ Cb.T)
            loc = sq.argmin(axis=1)
            val = sq[np.arange(len(Xb)), loc]
            upd = val < best
            best[upd] = val[upd]
            bidx[upd] = loc[upd] + c
        out[r : r + ROW_BLOCK] = bidx
    return out


def group_slices(a: np.ndarray, k: int):
    """(order, starts) — argsort-based grouping (no per-cell boolean
    mask: that is O(k·n)).  order is stable so within-group rows stay
    vec_id-ascending; starts[i]:starts[i+1] slices group i."""
    order = np.argsort(a, kind="stable")
    counts = np.bincount(a, minlength=k)
    starts = np.concatenate(([0], np.cumsum(counts)))
    return order, starts


def lloyd_flat(X: np.ndarray, seeds: np.ndarray):
    """One flat Lloyd round: exact argmin to seeds, exact integer
    means; seeds that win nothing emit no centroid (groupBy
    semantics).  Returns (cids, cents) cid-ascending."""
    a = flat_argmin(X, seeds)
    order, starts = group_slices(a, len(seeds))
    cids, cents = [], []
    for i in range(len(seeds)):
        members = order[starts[i] : starts[i + 1]]
        if len(members):
            cids.append(i)
            cents.append(X[members].sum(axis=0, dtype=np.int64) // len(members))
    return np.asarray(cids, dtype=np.int64), np.stack(cents)


def dropped_count(X: np.ndarray, a: np.ndarray, n_cells: int) -> int:
    """SemDeDup verdicts over an assignment: a row is DROPPED iff a
    lower-vec_id same-cell row sits within SEMDEDUP_EPS squared-L2.
    Rows of X are vec_id-ascending, so lower index == lower vec_id."""
    order, starts = group_slices(a, n_cells)
    total = 0
    for i in range(n_cells):
        m = order[starts[i] : starts[i + 1]]
        if len(m) < 2:
            continue
        Mf = X[m].astype(np.float64)
        sq = (Mf * Mf).sum(axis=1)
        D = sq[:, None] + sq[None, :] - 2.0 * (Mf @ Mf.T)
        near = np.tril(D <= SEMDEDUP_EPS, k=-1)
        total += int(near.any(axis=1).sum())
    return total


def run_rung(repl: int) -> None:
    t0 = time.perf_counter()
    Xf32 = build_corpus(repl)
    X = micro(Xf32)
    del Xf32
    n = len(X)
    nlist = max(8, n // TARGET_CELL)
    ncoarse = max(1, math.isqrt(nlist))
    seeds = X[:nlist].copy()
    scids = np.arange(nlist, dtype=np.int64)
    gen_s = time.perf_counter() - t0
    rows = []

    def record(leg, a, n_cells, wall):
        occ = np.bincount(a, minlength=n_cells).astype(np.int64)
        t = time.perf_counter()
        drop = dropped_count(X, a, n_cells)
        rows.append(
            {
                "leg": leg,
                "n_cells": int(n_cells),
                "occ2_M": round(float((occ**2).sum()) / 1e6, 1),
                "max_occ": int(occ.max()),
                "dropped": drop,
                "twin_wall_s": round(wall, 1),
                "pairs_wall_s": round(time.perf_counter() - t, 1),
            }
        )
        print(
            json.dumps({"repl": repl, "n": n, "nlist": nlist, **rows[-1]}),
            flush=True,
        )

    # flat: train + assign, both exact
    t = time.perf_counter()
    fcids, fcents = lloyd_flat(X, seeds)
    fa = flat_argmin(X, fcents)
    record("flat", fa, len(fcids), time.perf_counter() - t)

    # routed rpK: train routed, router REBUILT over trained cents for
    # the assign (the engine recomputes cgrp against cents, not seeds)
    for rp in (3, 5):
        t = time.perf_counter()
        ridx = np.arange(ncoarse)
        grp = route_groups(scids, seeds, ridx, False)
        ta = routed_assign_fast(X, scids, seeds, ridx, grp, rp)
        order, starts = group_slices(ta, nlist)
        rcids, rcents = [], []
        for i in range(nlist):
            m = order[starts[i] : starts[i + 1]]
            if len(m):
                rcids.append(i)
                rcents.append(X[m].sum(axis=0, dtype=np.int64) // len(m))
        rcids = np.asarray(rcids, dtype=np.int64)
        rcents = np.stack(rcents)
        ridx2 = np.arange(min(ncoarse, len(rcids)))
        grp2 = route_groups(rcids, rcents, ridx2, False)
        ra = routed_assign_fast(X, rcids, rcents, ridx2, grp2, rp)
        record(f"routed rp{rp}", ra, len(rcids), time.perf_counter() - t)

    flat_drop = rows[0]["dropped"]
    print(
        json.dumps(
            {
                "repl": repl,
                "n": n,
                "nlist": nlist,
                "ncoarse": ncoarse,
                "gen_s": round(gen_s, 1),
                "summary": [
                    {
                        "leg": r["leg"],
                        "dropped": r["dropped"],
                        "dropped_vs_flat": round(r["dropped"] / flat_drop, 4)
                        if flat_drop
                        else None,
                        "occ2_M": r["occ2_M"],
                        "max_occ": r["max_occ"],
                    }
                    for r in rows
                ],
            }
        ),
        flush=True,
    )


def main() -> None:
    repls = [int(a) for a in sys.argv[1:]] or [64, 1024, 2048, 4096]
    for repl in repls:
        run_rung(repl)


if __name__ == "__main__":
    main()
