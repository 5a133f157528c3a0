"""Correlation-clustering inference: SDP relaxation + HAC max-agree cut.

Numpy re-expression of the reference's torch/cvxpy inference stack
(``CCInference``, /root/reference/e2e_pipeline/cc_inference.py:15-48):

1. pair scores → signed edge weights (score − threshold, the reference's
   ``sigmoid(w) − threshold`` conversion, cc_inference.py:28-30);
2. ``SDPLayer`` (/root/reference/e2e_pipeline/sdp_layer.py:17-71) solves
   max tr(WX) s.t. X ⪰ 0, diag(X)=1, X ≥ 0 with SCS.  cvxpy is not in this
   environment, so the analog is the standard Burer–Monteiro low-rank
   factorization X = VVᵀ with unit-norm nonnegative rows (nonnegative V ⇒
   entrywise-nonnegative X), optimized by projected gradient ascent —
   deterministic seeded init, public technique (Burer & Monteiro 2003);
3. ``HACCutLayer`` (/root/reference/e2e_pipeline/hac_cut_layer.py:4-131)
   builds an average-linkage tree over the fractional solution and accepts
   each merge iff the merged cluster's total within-weight beats the sum of
   its children's accepted energies (max-agree rounding).

Blocks are independent → the distributed shape is
``groupby(block_key).map_groups`` exactly like the per-block HAC stage; the
dense NxN work is bounded by the reference's own block-size guard (drop
blocks >500, /root/reference/scripts/make_s2and_mini_dataset.py:25-26) —
oversized blocks fall back to thresholded transitive closure in-block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .constraints import DISALLOW, REQUIRE

# Constraint override weights: require links at any cost, disallow never
# links (reference override precedence, /root/reference/s2and/model.py:277-298).
_HARD = 64.0


def uncompress_weights(values: np.ndarray, n: int) -> np.ndarray:
    """Condensed upper-triangular vector → NxN strict-upper-tri matrix
    (reference ``UncompressTransformLayer``,
    /root/reference/e2e_pipeline/uncompress_layer.py:8-24)."""
    out = np.zeros((n, n), dtype=np.float64)
    iu = np.triu_indices(n, k=1)
    out[iu] = np.asarray(values, dtype=np.float64)
    return out


def sdp_lowrank(W: np.ndarray, rank: int = 8, max_iters: int = 500,
                eps: float = 1e-5, seed: int = 7) -> tuple[float, np.ndarray]:
    """Low-rank relaxation of the cluster SDP: maximize Σ_{u<v} w_uv·X_uv
    over X = VVᵀ, rows of V unit-norm and nonnegative (so diag(X)=1 and
    X ≥ 0 — the reference SDP's constraint set, sdp_layer.py:33-37).

    Projected gradient ascent; step size 1/‖W‖∞ (row-sum bound on the
    spectral norm keeps ascent stable).  Returns (max-agree objective,
    symmetric fractional X with unit diagonal)."""
    n = W.shape[0]
    if n == 0:
        return 0.0, np.zeros((0, 0))
    Wsym = W + W.T
    rng = np.random.default_rng(seed)
    V = rng.random((n, min(rank, max(2, n))))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    row_sum = np.abs(Wsym).sum(axis=1).max()
    lr = 1.0 / max(row_sum, 1e-9)
    prev = -np.inf
    for _ in range(max_iters):
        V += lr * (Wsym @ V)          # ∇_V tr(W VVᵀ) = (W + Wᵀ)V
        np.maximum(V, 0.0, out=V)     # V ≥ 0 ⇒ X = VVᵀ ≥ 0 entrywise
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        # a row projected to all-zeros restarts at its own axis (unit norm)
        dead = norms[:, 0] < 1e-12
        if dead.any():
            V[dead] = 0.0
            V[dead, np.arange(n)[dead] % V.shape[1]] = 1.0
            norms = np.linalg.norm(V, axis=1, keepdims=True)
        V /= norms
        obj = float((W * (V @ V.T)).sum())
        if obj - prev < eps * max(1.0, abs(obj)):
            break
        prev = obj
    X = V @ V.T
    np.fill_diagonal(X, 1.0)
    # max-agree objective of the fractional solution (reference reports
    # IC − Σ negatives, sdp_layer.py:60-64)
    frac = W * np.triu(X, k=1)
    obj_ma = float(frac.sum() - frac[frac < 0].sum())
    return obj_ma, X


def hac_cut(X: np.ndarray, W: np.ndarray,
            linkage: str = "average") -> tuple[np.ndarray, float]:
    """Agglomeration tree over the fractional solution, cut by max-agree
    energy (reference ``HACCutLayer.get_rounded_solution``,
    /root/reference/e2e_pipeline/hac_cut_layer.py:16-126).

    The full tree is always built (D−1 merges on dissimilarity 1−X;
    ``linkage`` ∈ average/single/complete); a merge is *accepted* — its
    leaves collapse into one flat cluster — iff the merged leaves' total
    pairwise weight is ≥ the sum of the children's accepted energies.
    Returns (labels 0..k−1 numbered by smallest member, max-agree objective
    of the rounded solution)."""
    n = X.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64), 0.0
    if n == 1:
        return np.zeros(1, dtype=np.int64), 0.0
    Wsym = W + W.T
    d = 1.0 - X.astype(np.float64)
    np.fill_diagonal(d, np.inf)
    active = np.ones(n, dtype=bool)
    size = np.ones(n, dtype=np.int64)
    members: list[list[int]] = [[i] for i in range(n)]
    energy = np.zeros(n)          # accepted energy of each active cluster
    flat = np.arange(n)           # leaf → current flat-cluster id
    next_id = n
    for _ in range(n - 1):
        masked = np.where(active[:, None] & active[None, :], d, np.inf)
        idx = int(np.argmin(masked))
        i, j = divmod(idx, n)
        if i > j:
            i, j = j, i
        ni, nj = size[i], size[j]
        if linkage == "single":
            new_row = np.minimum(d[i], d[j])
        elif linkage == "complete":
            new_row = np.maximum(d[i], d[j])
        else:
            new_row = (ni * d[i] + nj * d[j]) / (ni + nj)  # Lance-Williams
        d[i] = new_row
        d[:, i] = new_row
        d[i, i] = np.inf
        active[j] = False
        size[i] = ni + nj
        leaves = members[i] + members[j]
        # merged cluster's total within-weight: Σ_{u<v ∈ leaves} w_uv
        within = float(Wsym[np.ix_(leaves, leaves)].sum()) / 2.0
        if within >= energy[i] + energy[j]:
            energy[i] = within
            flat[leaves] = next_id        # accept: collapse to one cluster
        else:
            energy[i] += energy[j]        # reject: keep children's cuts
        members[i] = leaves
        members[j] = []
        next_id += 1
    # deterministic relabel: clusters ordered by smallest member index
    labels = np.empty(n, dtype=np.int64)
    order: dict[int, int] = {}
    for leaf in range(n):
        c = int(flat[leaf])
        if c not in order:
            order[c] = len(order)
        labels[leaf] = order[c]
    same = labels[:, None] == labels[None, :]
    rounded = W * np.triu(same, k=1)
    obj_ma = float(rounded.sum() - rounded[rounded < 0].sum())
    return labels, obj_ma


def trellis_cut(X: np.ndarray, W: np.ndarray,
                linkages: tuple[str, ...] = ("average", "single", "complete"),
                ) -> tuple[np.ndarray, float]:
    """Trellis-cut analog (reference ``TrellisCutLayer`` +
    ``build_trellis``/``cut_trellis``,
    /root/reference/e2e_pipeline/trellis_cut_layer.py:15-26,
    /root/reference/utils/trellis_helper_fns.py:6-57): the reference cuts a
    trellis — a DAG unioning candidate clusters from several agglomeration
    runs — maximizing intra-cluster energy over every clustering the DAG
    encodes.  This analog cuts each linkage's tree with the same max-agree
    rule and returns the best flat clustering found; a strict trellis can
    mix subtrees across runs and so can only do better — this is the
    documented lower bound, exact whenever one tree contains the optimum
    (always true for the single-tree trellis the reference defaults to,
    ``only_avg_hac=True``)."""
    best_labels, best_obj = None, -np.inf
    for lk in linkages:
        labels, obj = hac_cut(X, W, linkage=lk)
        if obj > best_obj:
            best_labels, best_obj = labels, obj
    return best_labels, float(best_obj)


def cc_labels(ids: np.ndarray, id1: np.ndarray, id2: np.ndarray,
              scores: np.ndarray, constraint: np.ndarray | None = None,
              threshold: float = 0.5, rank: int = 8,
              max_iters: int = 500) -> np.ndarray:
    """CCInference over one block: scores in [0,1] → signed weights
    (score − threshold, the reference's sigmoid−threshold conversion) with
    constraint overrides, SDP relaxation, HAC max-agree cut.  ``ids`` must
    be sorted unique; returns int labels aligned with ``ids``."""
    n = len(ids)
    pos = {int(v): k for k, v in enumerate(ids)}
    W = np.zeros((n, n), dtype=np.float64)
    w = np.asarray(scores, dtype=np.float64) - threshold
    if constraint is not None:
        # constraint values are distance overrides: REQUIRE (0.0) → hard
        # positive weight, DISALLOW (10000.0) → hard negative, intermediate
        # d ∈ (0,1) → similarity (1−d) recentered on the threshold
        cons = np.asarray(constraint, dtype=np.float64)
        w = np.where(np.isnan(cons), w,
                     np.where(cons >= DISALLOW, -_HARD,
                              np.where(cons <= REQUIRE, _HARD,
                                       (1.0 - cons) - threshold)))
    for a, b, v in zip(id1, id2, w):
        ia, ib = pos[int(a)], pos[int(b)]
        if ia > ib:
            ia, ib = ib, ia
        W[ia, ib] = v
    _, X = sdp_lowrank(W, rank=rank, max_iters=max_iters)
    labels, _ = hac_cut(X, W)
    return labels


def cc_block_clustering(
    pairs: ray.data.Dataset,
    block_col: str = "block_key",
    threshold: float = 0.5,
    score_col: str = "score",
    max_block_docs: int = 500,
) -> ray.data.Dataset:
    """Per-block correlation-clustering inference over scored pair rows.

    Input: (block_key, id1, id2, score[, constraint]).  Output:
    (id, cluster_id:str) with cluster_id = f"{block_key}_{label}" — the same
    contract as ``hac_block_clustering``.  Blocks larger than
    ``max_block_docs`` (the reference's own >500-signature guard) fall back
    to thresholded transitive closure inside the block."""
    from ..state.unionfind import unionfind_labels

    def cluster_block(g: pd.DataFrame) -> pd.DataFrame:
        block = g[block_col].iloc[0]
        id1 = g["id1"].to_numpy(np.int64)
        id2 = g["id2"].to_numpy(np.int64)
        ids = np.unique(np.concatenate([id1, id2]))
        score = g[score_col].to_numpy(np.float64)
        cons = (g["constraint"].to_numpy(np.float64)
                if "constraint" in g.columns else None)
        if len(ids) > max_block_docs:
            keep = score >= threshold
            if cons is not None:
                keep = np.where(np.isnan(cons), keep, cons <= REQUIRE)
            _, labels = unionfind_labels(id1[keep], id2[keep], ids)
            # unionfind labels are min-member doc ids — compress to 0..k−1
            _, labels = np.unique(labels, return_inverse=True)
        else:
            labels = cc_labels(ids, id1, id2, score, constraint=cons,
                               threshold=threshold)
        return pd.DataFrame(
            {"id": ids, "cluster_id": [f"{block}_{l}" for l in labels]})

    return pairs.groupby(block_col).map_groups(
        cluster_block, batch_format="pandas")
