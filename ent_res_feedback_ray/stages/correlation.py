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


def linkage_tree_merges(D: np.ndarray, linkage: str = "average",
                        ) -> list[tuple[tuple, tuple, tuple]]:
    """Full agglomeration over dissimilarity ``D`` → the tree's merge list
    ``[(lchild_leaves, rchild_leaves, merged_leaves), …]`` (leaves as sorted
    int tuples), one entry per internal node, bottom-up.

    Linkages mirror the reference trellis's five trees
    (/root/reference/ecc/trellis.py:136-146): ``average`` / ``single`` /
    ``complete`` (Lance–Williams updates) and ``exp-`` / ``exp+`` —
    exponential linkage with α = ∓1 (Yadav et al. 2019), computed from the
    additive accumulators E = Σ exp(α·d), ED = Σ d·exp(α·d) over cross
    pairs so every update stays O(n)."""
    n = D.shape[0]
    if n <= 1:
        return []
    D = D.astype(np.float64, copy=True)
    np.fill_diagonal(D, np.inf)
    alpha = {"exp-": -1.0, "exp+": 1.0}.get(linkage)
    if linkage == "average":
        acc = D.copy()                      # cross-distance SUMS
    elif alpha is not None:
        with np.errstate(over="ignore", invalid="ignore"):
            E = np.exp(alpha * D)           # Σ exp(α d); inf diag → handled
            ED = D * E
        np.fill_diagonal(E, 0.0)
        np.fill_diagonal(ED, 0.0)
        E[~np.isfinite(E)] = 0.0
        ED[~np.isfinite(ED)] = 0.0
    active = np.ones(n, dtype=bool)
    size = np.ones(n, dtype=np.int64)
    members: list[tuple] = [(i,) for i in range(n)]
    merges: list[tuple[tuple, tuple, tuple]] = []
    cur = D.copy()                          # current linkage distances
    for _ in range(n - 1):
        masked = np.where(active[:, None] & active[None, :], cur, np.inf)
        idx = int(np.argmin(masked))
        i, j = divmod(idx, n)
        if i > j:
            i, j = j, i
        li, lj = members[i], members[j]
        merged = tuple(sorted(li + lj))
        merges.append((li, lj, merged))
        if linkage == "single":
            cur[i] = np.minimum(cur[i], cur[j])
        elif linkage == "complete":
            cur[i] = np.maximum(cur[i], cur[j])
        elif linkage == "average":
            acc[i] += acc[j]
            acc[:, i] = acc[i]
            with np.errstate(invalid="ignore"):
                cur[i] = acc[i] / ((size[i] + size[j]) * size)
        else:                               # exponential linkage
            E[i] += E[j]
            ED[i] += ED[j]
            E[:, i] = E[i]
            ED[:, i] = ED[i]
            with np.errstate(invalid="ignore", divide="ignore"):
                cur[i] = np.where(E[i] > 0, ED[i] / E[i], np.inf)
        cur[:, i] = cur[i]
        cur[i, i] = np.inf
        active[j] = False
        size[i] += size[j]
        members[i] = merged
        members[j] = ()
    return merges


def build_trellis(trees: list[list[tuple]], n: int) -> dict:
    """Union candidate clusters from several agglomeration trees into one
    DAG (reference ``build_trellis_from_trees``,
    /root/reference/ecc/trellis.py:39-122): node key = sorted leaf tuple,
    value = the set of (lchild_key, rchild_key) splits observed in ANY
    tree.  Singletons are the DAG's leaves."""
    nodes: dict[tuple, set] = {(i,): set() for i in range(n)}
    for merges in trees:
        for lk, rk, mk in merges:
            pair = (lk, rk) if lk <= rk else (rk, lk)
            nodes.setdefault(mk, set()).add(pair)
            nodes.setdefault(lk, set())
            nodes.setdefault(rk, set())
    return nodes


def cut_trellis(nodes: dict, W: np.ndarray,
                ecc: "list[tuple[int, frozenset]] | None" = None,
                ) -> tuple[np.ndarray, float]:
    """DP over the trellis DAG maximizing intra-cluster (signed) energy —
    the reference ``cut_trellis`` (/root/reference/utils/
    trellis_helper_fns.py:12-57): bottom-up in topological (cluster-size)
    order, a node keeps its leaves as ONE cluster unless some observed
    child split's combined objective is strictly better; because a node's
    splits come from every tree, the cut can mix subtrees across trees and
    strictly beat each single tree's best.

    ``ecc``: optional existential constraints ``(anchor_leaf,
    qualifying_leaves)`` — a constraint is satisfied by a flat cluster
    containing its anchor AND ≥1 qualifying leaf.  With constraints the DP
    compares ``(num_ecc_sat, energy)`` LEXICOGRAPHICALLY, exactly the
    reference's EccClusterer cut (trellis_helper_fns.py:29-36: adopt a
    split iff it satisfies more constraints, or equally many at higher
    energy).  Returns (labels aligned with leaf index 0..n−1, DP energy of
    the root)."""
    n = W.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64), 0.0
    Wsym = W + W.T
    obj: dict[tuple, float] = {}
    sat: dict[tuple, int] = {}
    memb: dict[tuple, np.ndarray] = {}      # labels aligned with the key
    root = None
    for key in sorted(nodes, key=lambda k: (len(k), k)):
        leaves = np.fromiter(key, np.int64, count=len(key))
        lset = frozenset(key)
        best = float(Wsym[np.ix_(leaves, leaves)].sum()) / 2.0
        best_sat = 0
        if ecc:
            # unsplit-node satisfaction: anchor in leaves ∧ any qualifier in
            # (reference get_num_ecc_sat over the flat cluster)
            best_sat = sum(1 for a, q in ecc
                           if a in lset and not q.isdisjoint(lset))
        labels = np.zeros(len(key), dtype=np.int64)
        for lk, rk in nodes[key]:
            cand_sat = sat[lk] + sat[rk]
            cand = obj[lk] + obj[rk]
            if (cand_sat, cand) > (best_sat, best):   # lexicographic; strict
                best, best_sat = cand, cand_sat
                lab = np.empty(len(key), dtype=np.int64)
                lpos = np.searchsorted(leaves, np.fromiter(lk, np.int64))
                rpos = np.searchsorted(leaves, np.fromiter(rk, np.int64))
                lm = memb[lk]
                lab[lpos] = lm
                lab[rpos] = memb[rk] + (lm.max() + 1 if len(lm) else 0)
                labels = lab
        obj[key] = best
        sat[key] = best_sat
        memb[key] = labels
        if len(key) == n:
            root = key
    assert root is not None, "trellis has no root (trees disagree on n)"
    # deterministic relabel: clusters ordered by smallest member index
    _, out = np.unique(memb[root], return_inverse=True)
    return out.astype(np.int64), float(obj[root])


def trellis_energy(labels: np.ndarray, W: np.ndarray) -> float:
    """Signed intra-cluster energy of a flat clustering — the objective the
    trellis DP maximizes (reference ``get_intra_cluster_energy``,
    /root/reference/utils/trellis_helper_fns.py:76-81)."""
    same = labels[:, None] == labels[None, :]
    return float((W * np.triu(same, k=1)).sum())


def trellis_cut(X: np.ndarray, W: np.ndarray,
                linkages: tuple[str, ...] = ("average", "single", "complete",
                                             "exp-", "exp+"),
                ecc: "list[tuple[int, frozenset]] | None" = None,
                ) -> tuple[np.ndarray, float]:
    """True trellis cut (reference ``TrellisCutLayer`` + ``Trellis.fit`` +
    ``cut_trellis``, /root/reference/e2e_pipeline/trellis_cut_layer.py:15-26,
    /root/reference/ecc/trellis.py:124-171,
    /root/reference/utils/trellis_helper_fns.py:6-99): build the five
    linkage trees over dissimilarity 1−X, union their candidate clusters
    into one DAG, and DP-cut the DAG maximizing intra-cluster signed
    energy.  The cut can mix subtrees across trees, so its energy dominates
    every single tree's max-agree cut.  Returns (labels, max-agree
    objective of the cut — same reporting convention as :func:`hac_cut`)."""
    n = X.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64), 0.0
    if n == 1:
        return np.zeros(1, dtype=np.int64), 0.0
    d = 1.0 - X.astype(np.float64)
    trees = [linkage_tree_merges(d, lk) for lk in linkages]
    labels, _ = cut_trellis(build_trellis(trees, n), W, ecc=ecc)
    same = labels[:, None] == labels[None, :]
    rounded = W * np.triu(same, k=1)
    obj_ma = float(rounded.sum() - rounded[rounded < 0].sum())
    return labels, obj_ma


def _block_weights(ids: np.ndarray, id1: np.ndarray, id2: np.ndarray,
                   scores: np.ndarray, constraint: np.ndarray | None,
                   threshold: float) -> np.ndarray:
    """Scores in [0,1] → the block's signed strict-upper-tri weight matrix
    (score − threshold, the reference's sigmoid−threshold conversion) with
    constraint overrides."""
    n = len(ids)
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
    # vectorized placement: ids sorted unique → searchsorted positions
    ia = np.searchsorted(ids, np.asarray(id1, dtype=ids.dtype))
    ib = np.searchsorted(ids, np.asarray(id2, dtype=ids.dtype))
    lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
    W = np.zeros((n, n), dtype=np.float64)
    W[lo, hi] = w
    return W


def cc_labels(ids: np.ndarray, id1: np.ndarray, id2: np.ndarray,
              scores: np.ndarray, constraint: np.ndarray | None = None,
              threshold: float = 0.5, rank: int = 8,
              max_iters: int = 500) -> np.ndarray:
    """CCInference over one block (signed weights → SDP relaxation → HAC
    max-agree cut).  ``ids`` must be sorted unique; returns int labels
    aligned with ``ids``."""
    W = _block_weights(ids, id1, id2, scores, constraint, threshold)
    _, X = sdp_lowrank(W, rank=rank, max_iters=max_iters)
    labels, _ = hac_cut(X, W)
    return labels


def cc_and_trellis_labels(ids: np.ndarray, id1: np.ndarray, id2: np.ndarray,
                          scores: np.ndarray,
                          constraint: np.ndarray | None = None,
                          threshold: float = 0.5, rank: int = 8,
                          max_iters: int = 500
                          ) -> tuple[np.ndarray, np.ndarray]:
    """CCInference + the trellis DAG cut over ONE shared SDP solve: the
    fractional X is solved once, then rounded both ways (HAC max-agree cut
    vs five-tree trellis DP).  Returns (cc_labels, trellis_labels)."""
    W = _block_weights(ids, id1, id2, scores, constraint, threshold)
    _, X = sdp_lowrank(W, rank=rank, max_iters=max_iters)
    hac_labels, _ = hac_cut(X, W)
    tre_labels, _ = trellis_cut(X, W)
    return hac_labels, tre_labels


def cc_block_clustering(
    pairs: ray.data.Dataset,
    block_col: str = "block_key",
    threshold: float = 0.5,
    score_col: str = "score",
    max_block_docs: int = 500,
    include_trellis: bool = False,
) -> ray.data.Dataset:
    """Per-block correlation-clustering inference over scored pair rows.

    Input: (block_key, id1, id2, score[, constraint]).  Output:
    (id, cluster_id:str) with cluster_id = f"{block_key}_{label}" — the same
    contract as ``hac_block_clustering``; ``include_trellis=True`` adds a
    ``trellis_cluster_id`` column from the five-tree trellis DAG cut
    sharing the block's single SDP solve.  Blocks larger than
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
        tre = None
        if len(ids) > max_block_docs:
            keep = score >= threshold
            if cons is not None:
                keep = np.where(np.isnan(cons), keep, cons <= REQUIRE)
            _, labels = unionfind_labels(id1[keep], id2[keep], ids)
            # unionfind labels are min-member doc ids — compress to 0..k−1
            _, labels = np.unique(labels, return_inverse=True)
        elif include_trellis:
            labels, tre = cc_and_trellis_labels(
                ids, id1, id2, score, constraint=cons, threshold=threshold)
        else:
            labels = cc_labels(ids, id1, id2, score, constraint=cons,
                               threshold=threshold)
        out = pd.DataFrame(
            {"id": ids, "cluster_id": [f"{block}_{l}" for l in labels]})
        if include_trellis:
            if tre is None:           # oversized-block fallback
                tre = labels
            out["trellis_cluster_id"] = [f"{block}_{l}" for l in tre]
        return out

    return pairs.groupby(block_col).map_groups(
        cluster_block, batch_format="pandas")
