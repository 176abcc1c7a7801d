"""Banded Damerau-Levenshtein kernels.

Semantics follow the reference (`Sources/FuzzyMatch/EditDistance.swift:73-270`):

* ``prefix_edit_distance`` — min edits to match the query against a *prefix*
  of the candidate; scans only ``queryLen + maxED`` candidate bytes (band at
  `EditDistance.swift:99`), tracks the best complete match, early-exits at 0,
  and applies row-min pruning (`:148-159`).
* ``substring_edit_distance`` — free-start DP (``row[0] = 0`` each column,
  `:226`), min over complete matches, early exit at 0.
* ``normalized_score`` — ``max(0, 1 - (1-base)/weight)`` (`:304-313`).

Implementation note: the inner loop over query positions is vectorized with
numpy.  The sequential deletion dependency ``row[j] = min(., row[j-1]+1)``
is resolved with the standard prefix-min identity
``row[j] = j + min_{i<=j}(tmp[i] - i)`` via ``np.minimum.accumulate``.

``batch_substring_distance`` additionally vectorizes across a whole Arrow
batch of pairs (the dedup verify hot path): one DP sweep over candidate
positions updates all pairs simultaneously.
"""

from __future__ import annotations

import numpy as np


def _dl_distance(
    query: np.ndarray,
    candidate: np.ndarray,
    max_edit_distance: int,
    free_start: bool,
    banded: bool,
) -> int | None:
    """Shared DL core. query/candidate: uint8 arrays (normalized bytes)."""
    q = len(query)
    c = len(candidate)
    if q == 0:
        return 0 if not free_start else None
    if free_start and c == 0:
        return None

    limit = min(c, q + max_edit_distance) if banded else c
    idx = np.arange(q + 1)
    prev_prev = idx.copy()
    prev = idx.copy()
    row = idx.copy()
    qv = query.astype(np.int16)
    best = q if not free_start else np.iinfo(np.int32).max

    for i in range(limit):
        prev_prev, prev, row = prev, row, prev_prev
        cand_char = int(candidate[i])
        sub_cost = (qv != cand_char).astype(np.int64)
        # options that don't involve the in-row deletion chain:
        tmp = np.minimum(prev[1:] + 1, prev[:-1] + sub_cost)
        if i > 0:
            prev_cand = int(candidate[i - 1])
            # transposition: query[j-1]==candidate[i-1] and query[j-2]==candidate[i]
            # valid for j >= 2, i.e. tmp indices 1..q-1
            trans_ok = (qv[1:] == prev_cand) & (qv[:-1] == cand_char)
            trans_cost = prev_prev[:-2] + 1
            tmp[1:] = np.where(trans_ok, np.minimum(tmp[1:], trans_cost), tmp[1:])
        row0 = 0 if free_start else i + 1
        full = np.empty(q + 1, dtype=np.int64)
        full[0] = row0
        full[1:] = tmp
        # resolve deletion chain row[j] = min(full[j], row[j-1]+1)
        np.minimum.accumulate(full - idx, out=full)
        full += idx
        row[:] = full

        if row[q] < best:
            best = int(row[q])
            if best == 0:
                return 0
        if not free_start:
            # row-min pruning (`EditDistance.swift:148-159`)
            remaining = limit - i - 1
            if remaining > 0 and int(row[1:].min()) > max_edit_distance + remaining:
                break

    if best > max_edit_distance:
        return None
    return best


def prefix_edit_distance(
    query: bytes | np.ndarray, candidate: bytes | np.ndarray, max_edit_distance: int
) -> int | None:
    q = np.frombuffer(query, dtype=np.uint8) if isinstance(query, bytes) else query
    c = (
        np.frombuffer(candidate, dtype=np.uint8)
        if isinstance(candidate, bytes)
        else candidate
    )
    return _dl_distance(q, c, max_edit_distance, free_start=False, banded=True)


def substring_edit_distance(
    query: bytes | np.ndarray, candidate: bytes | np.ndarray, max_edit_distance: int
) -> int | None:
    q = np.frombuffer(query, dtype=np.uint8) if isinstance(query, bytes) else query
    c = (
        np.frombuffer(candidate, dtype=np.uint8)
        if isinstance(candidate, bytes)
        else candidate
    )
    if len(q) == 0 or len(c) == 0:
        return None
    return _dl_distance(q, c, max_edit_distance, free_start=True, banded=False)


def normalized_score(
    edit_distance: int, query_length: int, kind: str, prefix_weight: float,
    substring_weight: float,
) -> float:
    base = max(0.0, 1.0 - edit_distance / max(query_length, 1))
    weight = prefix_weight if kind == "prefix" else substring_weight
    return max(0.0, 1.0 - (1.0 - base) / weight)


def batch_levenshtein(
    queries: list[bytes], candidates: list[bytes], max_ed: int
) -> np.ndarray:
    """Batch-vectorized PLAIN Levenshtein (no transpositions, whole-string)
    for N pairs at once; entries > max_ed come back as ``max_ed + 1``.

    This is the cross-engine-checkable form (DuckDB ``levenshtein`` is
    unambiguous; ``damerau_levenshtein`` there is full DL while the
    reference's kernels are OSA — those stay golden-fixture-pinned).
    Same one-python-loop structure as ``batch_substring_distance``: the
    in-row deletion chain resolves via the prefix-min identity.
    """
    n = len(queries)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    ql = np.array([len(q) for q in queries], dtype=np.int64)
    cl = np.array([len(c) for c in candidates], dtype=np.int64)
    maxq = int(ql.max()) if n else 0
    maxc = int(cl.max()) if n else 0
    big = np.int64(1 << 30)

    Q = np.zeros((n, max(maxq, 1)), dtype=np.int16)
    C = np.full((n, max(maxc, 1)), -1, dtype=np.int16)
    for k, qb in enumerate(queries):
        if qb:
            Q[k, : len(qb)] = np.frombuffer(qb, dtype=np.uint8)
    for k, cb in enumerate(candidates):
        if cb:
            C[k, : len(cb)] = np.frombuffer(cb, dtype=np.uint8)

    idx = np.arange(maxq + 1, dtype=np.int64)
    prev = np.broadcast_to(idx, (n, maxq + 1)).copy()
    row = prev.copy()
    # distance for empty candidate is ql (all deletions)
    out = np.where(cl == 0, ql, big)
    jmask = idx[None, 1:] <= ql[:, None]

    for i in range(maxc):
        active = i < cl
        if not active.any():
            break
        prev, row = row, prev
        cand = C[:, i : i + 1]
        sub_cost = (Q != cand).astype(np.int64)
        tmp = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + sub_cost)
        full = np.empty((n, maxq + 1), dtype=np.int64)
        full[:, 0] = i + 1
        full[:, 1:] = np.where(jmask, tmp, big)
        acc = full - idx[None, :]
        np.minimum.accumulate(acc, axis=1, out=acc)
        new_row = acc + idx[None, :]
        np.copyto(row, new_row, where=active[:, None])
        np.copyto(row, prev, where=~active[:, None])
        # rows whose candidate ends at this position: final cell is D[c][q]
        done = active & (i == cl - 1)
        if done.any():
            end = np.take_along_axis(row, ql[:, None], axis=1)[:, 0]
            out = np.where(done, end, out)

    return np.minimum(out, max_ed + 1).astype(np.int32)


def batch_substring_distance(
    queries: list[bytes], candidates: list[bytes], max_edit_distance: int
) -> np.ndarray:
    """Batch-vectorized free-start DL distance for N pairs at once.

    Returns int32 array; entries > max_edit_distance are reported as
    ``max_edit_distance + 1`` (the caller thresholds).  This is the verify-
    stage hot path: one python-level loop over max candidate length, all
    pairs advanced simultaneously in numpy.
    """
    n = len(queries)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    ql = np.array([len(q) for q in queries], dtype=np.int64)
    cl = np.array([len(c) for c in candidates], dtype=np.int64)
    maxq = int(ql.max()) if n else 0
    maxc = int(cl.max()) if n else 0
    if maxq == 0:
        return np.zeros(n, dtype=np.int32)

    Q = np.zeros((n, maxq), dtype=np.int16)
    C = np.full((n, maxc), -1, dtype=np.int16)
    for k, qb in enumerate(queries):
        if qb:
            Q[k, : len(qb)] = np.frombuffer(qb, dtype=np.uint8)
    for k, cb in enumerate(candidates):
        if cb:
            C[k, : len(cb)] = np.frombuffer(cb, dtype=np.uint8)

    idx = np.arange(maxq + 1, dtype=np.int64)
    big = np.int64(1 << 30)
    prev_prev = np.broadcast_to(idx, (n, maxq + 1)).copy()
    prev = prev_prev.copy()
    row = prev_prev.copy()
    best = np.full(n, big, dtype=np.int64)
    # query-length mask: positions j > ql are padding
    jmask = idx[None, 1:] <= ql[:, None]  # (n, maxq) valid query columns

    for i in range(maxc):
        prev_prev, prev, row = prev, row, prev_prev
        active = (i < cl) & (ql > 0)
        if not active.any():
            break
        cand_char = C[:, i : i + 1]  # (n,1)
        sub_cost = (Q != cand_char).astype(np.int64)  # (n, maxq)
        tmp = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + sub_cost)
        if i > 0:
            prev_cand = C[:, i - 1 : i]
            trans_ok = (Q == prev_cand) & np.concatenate(
                [np.zeros((n, 1), dtype=bool), Q[:, :-1] == cand_char], axis=1
            )
            trans_cost = prev_prev[:, :-2] + 1
            t2 = tmp[:, 1:]
            np.copyto(t2, np.minimum(t2, trans_cost), where=trans_ok[:, 1:])
        full = np.empty((n, maxq + 1), dtype=np.int64)
        full[:, 0] = 0  # free start
        full[:, 1:] = np.where(jmask, tmp, big)
        acc = full - idx[None, :]
        np.minimum.accumulate(acc, axis=1, out=acc)
        new_row = acc + idx[None, :]
        # freeze rows for pairs whose candidate already ended
        np.copyto(row, new_row, where=active[:, None])
        np.copyto(row, prev, where=~active[:, None])

        end = np.take_along_axis(row, ql[:, None], axis=1)[:, 0]
        upd = active & (end < best)
        best = np.where(upd, end, best)
        if (best == 0).all():
            break

    out = np.where(ql == 0, 0, np.minimum(best, max_edit_distance + 1))
    # empty candidate with non-empty query: no match
    out = np.where((cl == 0) & (ql > 0), max_edit_distance + 1, out)
    return out.astype(np.int32)
