"""M7 model-based anomaly detection: isolation-forest per partition.

The reference SPECS (but never shipped) model-based detectors — "Isolation
Forest / one-class SVM on engineered features" (ML-003,
/root/reference/requirements.md:132,258). sklearn is absent here, so this
is the textbook isolation forest (Liu, Ting, Zhou 2008) on numpy, run as a
grouped-map (``applyInPandas``) per partition: each vendor/partition fits
its own forest on its own feature sample — the same per-partition-baseline
shape as the profile job, so a hot partition isolates to one worker and
nothing touches the driver.

Determinism: the RNG seeds from sha256(partition key), so scores are
reproducible across runs and cluster layouts.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_EULER = 0.5772156649015329


def _c(n: float) -> float:
    """Average unsuccessful-search path length in a BST of n nodes —
    the normalizer c(n) from the paper."""
    if n <= 1.0:
        return 0.0
    return 2.0 * (np.log(n - 1.0) + _EULER) - 2.0 * (n - 1.0) / n


def _build_tree(rng: np.random.RandomState, x: np.ndarray, depth: int, limit: int):
    """Recursive isolation tree over sample rows ``x`` (n × d).
    Node = (feature, split, left, right) | leaf size (int)."""
    n = len(x)
    if depth >= limit or n <= 1:
        return n
    lo = x.min(axis=0)
    hi = x.max(axis=0)
    usable = np.flatnonzero(hi > lo)
    if len(usable) == 0:
        return n
    f = int(rng.choice(usable))
    split = float(rng.uniform(lo[f], hi[f]))
    mask = x[:, f] < split
    return (
        f,
        split,
        _build_tree(rng, x[mask], depth + 1, limit),
        _build_tree(rng, x[~mask], depth + 1, limit),
    )


def _path_length(tree, x: np.ndarray, depth: int = 0) -> np.ndarray:
    """Vectorized path length of every row through one tree."""
    if isinstance(tree, int):
        return np.full(len(x), depth + _c(float(tree)))
    f, split, left, right = tree
    out = np.empty(len(x))
    mask = x[:, f] < split
    if mask.any():
        out[mask] = _path_length(left, x[mask], depth + 1)
    if (~mask).any():
        out[~mask] = _path_length(right, x[~mask], depth + 1)
    return out


def isolation_scores(
    docs: DataFrame,
    features: tuple[str, ...] = ("total",),
    group_col: str = "part",
    id_col: str = "doc_id",
    n_trees: int = 32,
    sample: int = 256,
    score_threshold: float = 0.65,
) -> DataFrame:
    """Per-doc isolation-forest anomaly score within each partition.

    Output: part, doc_id, iso_score (∈(0,1], higher = more anomalous),
    iso_flag (score > threshold; 0.65 ≈ the conventional "anomaly" cut).
    NULL/NaN features are zero-filled (the engine's tolerant-coercion
    convention). Partitions with < 8 sample rows emit score 0.5
    (indistinguishable) — the cold-start analog of the z-score gate.
    """
    feat_list = list(features)
    schema = f"{group_col} string, {id_col} string, iso_score double, iso_flag boolean"

    def _fit_score(pdf: pd.DataFrame) -> pd.DataFrame:
        part = str(pdf[group_col].iloc[0])
        x = pdf[feat_list].to_numpy(dtype=np.float64)
        x = np.where(np.isnan(x), 0.0, x)
        n = len(x)
        if n < 8:
            score = np.full(n, 0.5)
        else:
            seed = int.from_bytes(hashlib.sha256(part.encode()).digest()[:4], "big")
            rng = np.random.RandomState(seed)
            psi = min(sample, n)
            limit = int(np.ceil(np.log2(max(psi, 2))))
            paths = np.zeros(n)
            for _ in range(n_trees):
                idx = rng.choice(n, size=psi, replace=False)
                tree = _build_tree(rng, x[idx], 0, limit)
                paths += _path_length(tree, x)
            score = np.power(2.0, -(paths / n_trees) / max(_c(float(psi)), 1e-12))
        return pd.DataFrame(
            {
                group_col: pdf[group_col].astype(str),
                id_col: pdf[id_col].astype(str),
                "iso_score": score,
                "iso_flag": score > score_threshold,
            }
        )

    cols = [group_col, id_col, *feat_list]
    return docs.select(*cols).groupBy(group_col).applyInPandas(_fit_score, schema)
