"""Correlation-clustering inference (SDP low-rank + HAC max-agree cut) —
numpy analog of /root/reference/e2e_pipeline/{sdp_layer,hac_cut_layer,
cc_inference}.py."""

import numpy as np
import pandas as pd
import ray.data

from ent_res_feedback_ray.stages.correlation import (
    cc_block_clustering,
    cc_labels,
    hac_cut,
    sdp_lowrank,
    uncompress_weights,
)


def test_uncompress_weights_roundtrip():
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    W = uncompress_weights(vals, 4)
    assert W.shape == (4, 4)
    assert np.allclose(W[np.triu_indices(4, k=1)], vals)
    assert np.allclose(np.tril(W), 0.0)


def _planted_weights(sizes, w_in=0.4, w_out=-0.4):
    n = sum(sizes)
    labels = np.repeat(np.arange(len(sizes)), sizes)
    W = np.where(labels[:, None] == labels[None, :], w_in, w_out)
    W = np.triu(W, k=1)
    return W, labels


def test_sdp_hac_recovers_planted_cliques():
    W, gold = _planted_weights([4, 3, 5])
    obj_frac, X = sdp_lowrank(W)
    assert np.allclose(np.diag(X), 1.0)
    assert (X >= -1e-9).all()
    labels, obj = hac_cut(X, W)
    # exact recovery: same partition as gold
    pred_same = labels[:, None] == labels[None, :]
    gold_same = gold[:, None] == gold[None, :]
    assert np.array_equal(pred_same, gold_same)
    # rounded objective (reference definition: within-cluster sum minus
    # negative-within entries, hac_cut_layer.py:124-126) equals the optimum:
    # every positive edge inside a cluster, no negative edge inside any
    assert np.isclose(obj, W[W > 0].sum())


def test_hac_cut_splits_where_transitive_closure_merges():
    # a–b strong, b–c strong, a–c strongly negative: threshold closure would
    # merge {a,b,c}; max-agree prefers splitting c off (0.4+0.8 > 0.4+0.4)
    W = np.zeros((3, 3))
    W[0, 1] = 0.4   # a-b
    W[1, 2] = 0.4   # b-c
    W[0, 2] = -0.8  # a-c
    _, X = sdp_lowrank(W)
    labels, obj = hac_cut(X, W)
    assert labels[0] == labels[1] or labels[1] == labels[2]
    assert labels[0] != labels[2]
    # one positive edge kept within, no negatives within any cluster
    assert np.isclose(obj, 0.4)


def test_cc_labels_constraint_override():
    ids = np.array([10, 20, 30], dtype=np.int64)
    id1 = np.array([10, 10, 20])
    id2 = np.array([20, 30, 30])
    from ent_res_feedback_ray.stages.constraints import DISALLOW as DIS
    scores = np.array([0.9, 0.9, 0.9])      # all want to merge...
    cons = np.array([np.nan, DIS, np.nan])  # ...but 10-30 is disallowed
    labels = cc_labels(ids, id1, id2, scores, constraint=cons)
    assert labels[0] != labels[2]


def test_cc_block_clustering_dataset_and_fallback():
    rows = []
    # block A: two planted entities {1,2} and {3}
    rows += [("A", 1, 2, 0.95), ("A", 1, 3, 0.05), ("A", 2, 3, 0.05)]
    # block B: singleton pair below threshold
    rows += [("B", 7, 8, 0.1)]
    pairs = ray.data.from_pandas(pd.DataFrame(
        rows, columns=["block_key", "id1", "id2", "score"]))
    out = cc_block_clustering(pairs).to_pandas().set_index("id")["cluster_id"]
    assert out[1] == out[2]
    assert out[1] != out[3]
    assert out[7] != out[8]
    # oversized-block fallback (max_block_docs=2 forces the union-find path)
    out2 = cc_block_clustering(pairs, max_block_docs=2) \
        .to_pandas().set_index("id")["cluster_id"]
    assert out2[1] == out2[2] and out2[1] != out2[3]
    assert out2[7] != out2[8]


def test_hac_cc_clusters_query(sf_dir):
    """Driver-surface row: HAC + CC labels per doc, CC respects the same
    planted duplicates the HAC path finds."""
    from ent_res_feedback_ray.pipelines.er import hac_cc_clusters

    out = hac_cc_clusters(sf_dir).to_pandas()
    assert list(out.columns) == ["id", "cluster_id", "cc_cluster_id",
                                 "trellis_cluster_id"]
    assert out["cc_cluster_id"].notna().all()
    assert out["trellis_cluster_id"].notna().all()
    assert out["id"].is_unique
    # CC must find real structure: at least one multi-doc CC cluster, and
    # the number of CC clusters stays within [n_hac_clusters/2, n_docs]
    n_cc = out["cc_cluster_id"].nunique()
    assert n_cc < len(out)
    assert n_cc >= out["cluster_id"].nunique() // 2
    # the trellis cut also finds real structure
    n_tre = out["trellis_cluster_id"].nunique()
    assert n_tre < len(out)
    assert n_tre >= out["cluster_id"].nunique() // 2


def test_trellis_cut_best_of_linkages():
    """Trellis cut returns the max-objective clustering across linkage
    trees; on a clean planted instance every tree finds the optimum."""
    from ent_res_feedback_ray.stages.correlation import hac_cut, trellis_cut

    W, gold = _planted_weights([3, 4])
    _, X = sdp_lowrank(W)
    labels, obj = trellis_cut(X, W)
    per_tree = [hac_cut(X, W, linkage=lk)[1]
                for lk in ("average", "single", "complete")]
    assert np.isclose(obj, max(per_tree))
    assert obj >= max(per_tree) - 1e-12
    pred_same = labels[:, None] == labels[None, :]
    gold_same = gold[:, None] == gold[None, :]
    assert np.array_equal(pred_same, gold_same)


def test_trellis_cut_beats_single_tree_sometimes():
    """A noisy instance where at least one linkage tree's cut is strictly
    worse than the trellis best — the multi-tree search has real effect."""
    from ent_res_feedback_ray.stages.correlation import hac_cut, trellis_cut

    rng = np.random.default_rng(12)
    n = 12
    gold = np.repeat([0, 1, 2], 4)
    W = np.where(gold[:, None] == gold[None, :], 0.3, -0.3)
    W = W + rng.normal(0, 0.35, (n, n))
    W = np.triu(W, k=1)
    _, X = sdp_lowrank(W)
    _, obj = trellis_cut(X, W)
    per_tree = [hac_cut(X, W, linkage=lk)[1]
                for lk in ("average", "single", "complete")]
    assert np.isclose(obj, max(per_tree))
    assert obj >= min(per_tree)


def test_trellis_dag_strictly_beats_every_single_tree():
    """The DAG cut mixes subtrees ACROSS linkage trees: on this crafted W
    its intra-cluster energy is strictly higher than the best cut of each
    single tree — the behavior the reference's trellis exists for
    (/root/reference/utils/trellis_helper_fns.py:12-57), which the old
    best-of-trees lower bound could never show."""
    from ent_res_feedback_ray.stages.correlation import (
        build_trellis,
        cut_trellis,
        linkage_tree_merges,
        trellis_energy,
    )

    rng = np.random.default_rng(1411)
    n = int(rng.integers(5, 10))  # = 8
    W = np.triu(rng.uniform(-1, 1, (n, n)), k=1)
    X = np.clip(0.5 + 0.5 * (W + W.T), 0, 1)
    np.fill_diagonal(X, 1.0)
    d = 1.0 - X
    linkages = ("average", "single", "complete", "exp-", "exp+")
    trees = [linkage_tree_merges(d, lk) for lk in linkages]
    dag_labels, dag_obj = cut_trellis(build_trellis(trees, n), W)
    dag_energy = trellis_energy(dag_labels, W)
    assert np.isclose(dag_obj, dag_energy)  # root DP value == cut energy
    for t in trees:
        # DP over ONE tree == that tree's own max-agree cut
        tree_labels, _ = cut_trellis(build_trellis([t], n), W)
        assert dag_energy > trellis_energy(tree_labels, W) + 1e-6


def test_trellis_energy_dominates_hac_cut_property():
    """Energy dominance: the trellis DAG cut's signed intra-cluster energy
    is ≥ every single-linkage-tree max-agree cut's, on random instances
    through the full SDP path (the trellis contains every tree)."""
    from ent_res_feedback_ray.stages.correlation import (
        hac_cut,
        trellis_cut,
        trellis_energy,
    )

    for seed in range(5):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(6, 13))
        g = rng.integers(0, 3, n)
        W = np.where(g[:, None] == g[None, :], 0.3, -0.3)
        W = np.triu(W + rng.normal(0, 0.4, (n, n)), k=1)
        _, X = sdp_lowrank(W)
        tl, _ = trellis_cut(X, W)
        te = trellis_energy(tl, W)
        for lk in ("average", "single", "complete"):
            hl, _ = hac_cut(X, W, linkage=lk)
            assert te >= trellis_energy(hl, W) - 1e-9


def test_trellis_cut_exists_constraints_lexicographic():
    """ECC-aware trellis cut (reference EccClusterer's (num_ecc_sat,
    energy) lexicographic DP, /root/reference/utils/
    trellis_helper_fns.py:29-36): the energy optimum splits the anchor
    from every qualifying doc, but a there-exists constraint forces the
    cut to a lower-energy clustering that satisfies it."""
    from ent_res_feedback_ray.stages.correlation import (
        trellis_cut,
        trellis_energy,
    )

    # leaves 0,1 strongly similar; leaf 2 repelled by both
    W = np.zeros((3, 3))
    W[0, 1] = 0.8
    W[0, 2] = -0.3
    W[1, 2] = -0.3
    X = np.clip(0.5 + (W + W.T), 0, 1)
    np.fill_diagonal(X, 1.0)

    free_labels, _ = trellis_cut(X, W)
    assert free_labels[0] == free_labels[1] != free_labels[2]

    # exists-constraint: cluster of anchor 0 must contain leaf 2
    ecc = [(0, frozenset({2}))]
    lab, _ = trellis_cut(X, W, ecc=ecc)
    assert lab[0] == lab[2]            # satisfied at an energy cost
    assert trellis_energy(lab, W) < trellis_energy(free_labels, W)

    # unsatisfiable constraint (no qualifying leaf) leaves the cut free
    lab2, _ = trellis_cut(X, W, ecc=[(0, frozenset())])
    assert np.array_equal(lab2, free_labels)
