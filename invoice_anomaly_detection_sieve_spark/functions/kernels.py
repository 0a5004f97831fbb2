"""Numeric kernels that run inside Arrow-vectorized pandas UDFs.

These are the only pieces of the engine that SQL genuinely cannot express
(SURVEY.md §2.7): Jaro-Winkler string distance (reference uses rapidfuzz,
``app/features.py:39,44``) and optimal line assignment (reference uses
``scipy.optimize.linear_sum_assignment``, ``app/features.py:81``). Neither
library ships in this sandbox, so both are implemented here from the public
textbook algorithms: Jaro-Winkler per Winkler (1990), and the
Jonker-Volgenant shortest-augmenting-path solver for the rectangular linear
sum assignment problem.

Semantic parity targets:
- ``line_assign_features`` matches reference ``app/features.py:47-101``
  (cost = 0.7*desc_JW + 0.2*unit_price term + 0.1*qty term, both ratio
  terms capped at 5; empty-side special case at :54-65).
- cost-matrix weights and feature names are pinned by the reference test
  fixtures (``tests/test_features.py``).

Matrices stay group-local (≤200×200 given the reference's 200-line-item
cap, requirements.md:175), so an O(n^2·m) exact solver is cheap.
"""

from __future__ import annotations

import json
import math
from functools import lru_cache
from typing import Any

import numpy as np

__all__ = [
    "jaro_winkler_similarity",
    "linear_sum_assignment",
    "line_assign_features",
    "char_ngrams",
    "dice_3gram",
]


def jaro_similarity(s1: str, s2: str) -> float:
    """Plain Jaro similarity in [0, 1]."""
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    if n1 == 0 or n2 == 0:
        return 0.0
    window = max(n1, n2) // 2 - 1
    if window < 0:
        window = 0
    flagged1 = [False] * n1
    flagged2 = [False] * n2
    matches = 0
    for i, ch in enumerate(s1):
        lo = max(0, i - window)
        hi = min(n2, i + window + 1)
        for j in range(lo, hi):
            if not flagged2[j] and s2[j] == ch:
                flagged1[i] = True
                flagged2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(n1):
        if flagged1[i]:
            while not flagged2[k]:
                k += 1
            if s1[i] != s2[k]:
                transpositions += 1
            k += 1
    t = transpositions / 2.0
    m = float(matches)
    return (m / n1 + m / n2 + (m - t) / m) / 3.0


def jaro_winkler_similarity(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler similarity with the standard 0.7 boost threshold.

    Matches ``rapidfuzz.distance.JaroWinkler.normalized_similarity``
    semantics (prefix bonus for up to 4 shared leading characters).
    """
    sim = jaro_similarity(s1, s2)
    if sim > 0.7:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        sim += prefix * prefix_weight * (1.0 - sim)
    return float(min(1.0, sim))


@lru_cache(maxsize=1 << 16)
def jw_cached(s1: str, s2: str) -> float:
    """Memoized symmetric Jaro-Winkler. Line descriptions repeat heavily
    across candidate pairs, so the executor-local cache removes most of
    the string-kernel cost of the Hungarian cost matrix."""
    if s1 > s2:
        s1, s2 = s2, s1
    return jaro_winkler_similarity(s1, s2)


def linear_sum_assignment(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact minimum-cost assignment for a rectangular cost matrix.

    Jonker-Volgenant shortest augmenting path with potentials; inner loop
    vectorized with numpy. Returns (row_ind, col_ind) sorted by row, the
    same contract as ``scipy.optimize.linear_sum_assignment``.
    """
    cost = np.asarray(cost, dtype=np.float64)
    if cost.ndim != 2:
        raise ValueError("cost must be 2-D")
    transposed = cost.shape[0] > cost.shape[1]
    if transposed:
        cost = cost.T
    n, m = cost.shape
    if n == 0:
        return np.array([], dtype=int), np.array([], dtype=int)

    u = np.zeros(n + 1)
    v = np.zeros(m + 1)
    # col j (1-based) -> assigned row (1-based); 0 = unassigned
    assigned = np.zeros(m + 1, dtype=np.int64)
    predecessor = np.zeros(m + 1, dtype=np.int64)

    for row in range(1, n + 1):
        assigned[0] = row
        j0 = 0
        min_reduced = np.full(m + 1, np.inf)
        visited = np.zeros(m + 1, dtype=bool)
        while True:
            visited[j0] = True
            i0 = assigned[j0]
            reduced = cost[i0 - 1, :] - u[i0] - v[1:]
            free = ~visited[1:]
            better = free & (reduced < min_reduced[1:])
            if better.any():
                idx = np.flatnonzero(better) + 1
                min_reduced[idx] = reduced[idx - 1]
                predecessor[idx] = j0
            free_idx = np.flatnonzero(free) + 1
            j1 = free_idx[np.argmin(min_reduced[free_idx])]
            delta = min_reduced[j1]
            u[assigned[visited]] += delta
            v[visited] -= delta
            min_reduced[~visited] -= delta
            j0 = j1
            if assigned[j0] == 0:
                break
        # augment along the alternating path
        while j0 != 0:
            j1 = predecessor[j0]
            assigned[j0] = assigned[j1]
            j0 = j1

    rows = assigned[1:] - 1
    cols = np.arange(m)
    keep = rows >= 0
    rows, cols = rows[keep], cols[keep]
    order = np.argsort(rows)
    rows, cols = rows[order], cols[order]
    if transposed:
        rows, cols = cols, rows
        order = np.argsort(rows)
        rows, cols = rows[order], cols[order]
    return rows, cols


def _f(value: Any, default: float = 0.0) -> float:
    """Tolerant numeric coercion (reference ``_to_float``, app/features.py:11-17)."""
    if value is None:
        return default
    try:
        out = float(value)
    except (TypeError, ValueError):
        return default
    return default if math.isnan(out) else out


def line_assign_features(
    a_lines: list[dict[str, Any]],
    b_lines: list[dict[str, Any]],
    alpha: float = 0.7,
    beta: float = 0.2,
    gamma: float = 0.1,
) -> dict[str, float]:
    """Optimal line-item matching features between two documents.

    Parity with reference ``app/features.py:47-101``: each line dict has
    ``desc_norm``, ``qty``, ``unit_price``, ``amount``. Either side empty
    triggers the degenerate branch (:54-65).
    """
    if not a_lines or not b_lines:
        total_amount = sum(_f(x.get("amount")) for x in a_lines)
        unmatched = float(total_amount)
        frac = float(unmatched / max(total_amount, 1.0)) if total_amount else 1.0
        return {
            "line_coverage_pct": 0.0,
            "unmatched_amount_frac": frac,
            "count_new_items": float(len(a_lines)),
            "median_unit_price_diff": unmatched,
        }

    n, m = len(a_lines), len(b_lines)
    a_up = np.array([_f(x.get("unit_price")) for x in a_lines])
    b_up = np.array([_f(x.get("unit_price")) for x in b_lines])
    a_qty = np.array([_f(x.get("qty")) for x in a_lines])
    b_qty = np.array([_f(x.get("qty")) for x in b_lines])

    up_term = np.minimum(
        np.abs(a_up[:, None] - b_up[None, :]) / np.maximum(np.abs(a_up)[:, None], 1.0), 5.0
    )
    qty_term = np.minimum(
        np.abs(a_qty[:, None] - b_qty[None, :]) / np.maximum(np.abs(a_qty)[:, None], 1.0), 5.0
    )
    desc_cost = np.empty((n, m))
    a_descs = [x.get("desc_norm") or "" for x in a_lines]
    b_descs = [x.get("desc_norm") or "" for x in b_lines]
    for i, da in enumerate(a_descs):
        for j, db in enumerate(b_descs):
            desc_cost[i, j] = 1.0 - jw_cached(da, db)

    cost = alpha * desc_cost + beta * up_term + gamma * qty_term
    row_ind, col_ind = linear_sum_assignment(cost)
    matched = set(row_ind.tolist())

    amounts = np.array([_f(x.get("amount")) for x in a_lines])
    total_amount = float(amounts.sum())
    matched_amount = float(amounts[list(matched)].sum()) if matched else 0.0
    unmatched_amount = max(total_amount - matched_amount, 0.0)
    frac = float(unmatched_amount / max(total_amount, 1.0)) if total_amount else 1.0

    diffs = [abs(_f(a_lines[i].get("unit_price")) - _f(b_lines[j].get("unit_price")))
             for i, j in zip(row_ind, col_ind)]
    return {
        "line_coverage_pct": float(1.0 - frac),
        "unmatched_amount_frac": frac,
        "count_new_items": float(max(0, n - len(matched))),
        "median_unit_price_diff": float(np.median(diffs)) if diffs else 0.0,
    }


def char_ngrams(text: str, n: int = 3) -> set[str]:
    """Distinct character n-grams (reference ``_ngram_slices``, app/main.py:205-208)."""
    if len(text) < n:
        return set()
    return {text[i : i + n] for i in range(len(text) - n + 1)}


@lru_cache(maxsize=1 << 14)
def _gram_set_cached(text: str) -> frozenset[str]:
    return frozenset(char_ngrams(text))


def dice_3gram(a_text: str, b_text: str) -> float:
    """Dice overlap on distinct char-3-gram sets (app/main.py:290-296).
    Gram sets are memoized per text — each doc's blob recurs across all
    its candidate pairs."""
    a, b = _gram_set_cached(a_text), _gram_set_cached(b_text)
    denom = max(len(a) + len(b), 1)
    return float(min(1.0, 2.0 * len(a & b) / denom))


def parse_line_payload(text: str | None) -> dict[str, Any]:
    """Decode a kind='line' span's JSON payload; tolerant of junk."""
    if not text:
        return {}
    try:
        out = json.loads(text)
    except (ValueError, TypeError):
        return {}
    return out if isinstance(out, dict) else {}
