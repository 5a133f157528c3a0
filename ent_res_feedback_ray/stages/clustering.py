"""Clustering stages: global transitive closure and per-block HAC.

Two paths (SURVEY.md §7.2 step 6):
a. *Per-block average-linkage HAC* cut at eps — reference-parity
   (``FastCluster``/``Clusterer.predict``,
   /root/reference/s2and/model.py:992-1095,456-531).  Blocks are independent
   → ``groupby(block_key).map_groups``; cluster key = ``block_key + "_" +
   label`` (reference /root/reference/s2and/model.py:528-531); singleton
   blocks get label 0.
b. *Global transitive closure* over thresholded score edges — the scale path
   (see state/unionfind.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..state.unionfind import connected_components
from .constraints import DISALLOW


# --------------------------------------------------------------------------
# a) per-block average-linkage HAC (from scratch — no scipy in this env)
# --------------------------------------------------------------------------

def hac_average_cut(dist: np.ndarray, eps: float) -> np.ndarray:
    """Average-linkage agglomeration on a square distance matrix, merging
    while the closest pair is ≤ eps (flat-cut semantics of
    ``fcluster(t=eps, criterion='distance')``).  Returns int labels 0..k-1,
    numbered by first appearance (deterministic).

    Lance-Williams update for average linkage:
    d(i∪j, k) = (n_i·d(i,k) + n_j·d(j,k)) / (n_i + n_j).
    """
    n = dist.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n == 1:
        return np.zeros(1, dtype=np.int64)
    d = dist.astype(np.float64).copy()
    np.fill_diagonal(d, np.inf)
    active = np.ones(n, dtype=bool)
    size = np.ones(n, dtype=np.int64)
    members: list[list[int]] = [[i] for i in range(n)]
    for _ in range(n - 1):
        masked = np.where(active[:, None] & active[None, :], d, np.inf)
        idx = np.argmin(masked)
        i, j = divmod(idx, n)
        if masked[i, j] > eps or not np.isfinite(masked[i, j]):
            break
        if i > j:
            i, j = j, i
        # merge j into i
        ni, nj = size[i], size[j]
        new_row = (ni * d[i] + nj * d[j]) / (ni + nj)
        d[i] = new_row
        d[:, i] = new_row
        d[i, i] = np.inf
        active[j] = False
        size[i] = ni + nj
        members[i].extend(members[j])
        members[j] = []
    labels = np.empty(n, dtype=np.int64)
    next_label = 0
    # deterministic numbering: clusters ordered by their smallest member index
    clusters = sorted((min(members[i]), i) for i in range(n) if active[i])
    for _, i in clusters:
        for m in members[i]:
            labels[m] = next_label
        next_label += 1
    return labels


def hac_block_clustering(
    pairs: ray.data.Dataset,
    block_col: str = "block_key",
    eps: float = 0.5,
    dist_col: str = "distance",
) -> ray.data.Dataset:
    """Per-block HAC over pair rows with a distance column.

    Input: pair rows (block_key, id1, id2, distance).  Output:
    (id, cluster_id:str) with cluster_id = f"{block_key}_{label}"."""

    def cluster_block(g: pd.DataFrame) -> pd.DataFrame:
        block = g[block_col].iloc[0]
        ids = np.unique(np.concatenate([g["id1"].to_numpy(), g["id2"].to_numpy()]))
        pos = {v: i for i, v in enumerate(ids)}
        n = len(ids)
        d = np.ones((n, n), dtype=np.float64)  # unscored pairs: max distance
        np.fill_diagonal(d, 0.0)
        for i1, i2, dist in zip(g["id1"], g["id2"], g[dist_col]):
            a, b = pos[i1], pos[i2]
            v = min(float(dist), 1.0) if dist < DISALLOW else 2.0
            d[a, b] = d[b, a] = v
        labels = hac_average_cut(d, eps)
        return pd.DataFrame(
            {"id": ids, "cluster_id": [f"{block}_{l}" for l in labels]}
        )

    return pairs.groupby(block_col).map_groups(cluster_block, batch_format="pandas")


# --------------------------------------------------------------------------
# b) global transitive closure over thresholded edges
# --------------------------------------------------------------------------

def edges_from_scores(
    scored_pairs: ray.data.Dataset,
    threshold: float = 0.5,
    score_col: str = "score",
    id1: str = "id1",
    id2: str = "id2",
) -> ray.data.Dataset:
    """score ≥ threshold ∧ not disallowed → (src, dst) edge rows.

    Constraint semantics: require (0.0) always links; disallow never links
    (reference override precedence, /root/reference/s2and/model.py:277-298)."""

    def _edges(batch: pa.Table) -> pa.Table:
        score = batch.column(score_col).to_numpy(zero_copy_only=False).astype(np.float64)
        keep = score >= threshold
        if "constraint" in batch.column_names:
            cons = batch.column("constraint").to_numpy(zero_copy_only=False).astype(np.float64)
            keep = np.where(np.isnan(cons), keep, cons == 0.0)
        idx = np.nonzero(keep)[0]
        sub = batch.take(pa.array(idx, pa.int64()))
        return pa.table({"src": sub.column(id1), "dst": sub.column(id2)})

    return scored_pairs.map_batches(_edges, batch_format="pyarrow")


def transitive_clustering(
    scored_pairs: ray.data.Dataset,
    all_ids: ray.data.Dataset | None = None,
    threshold: float = 0.5,
    **cc_kwargs,
) -> ray.data.Dataset:
    """Scored pairs → (node, label) assignments; label = min id of component.

    ``all_ids`` (a Dataset with column ``node``) adds singleton rows for ids
    that never appeared in an edge."""
    edges = edges_from_scores(scored_pairs, threshold=threshold)
    return connected_components(edges, nodes=all_ids, **cc_kwargs)
