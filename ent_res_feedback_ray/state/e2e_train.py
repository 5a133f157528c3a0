"""Straight-through end-to-end training: a cluster-level loss backpropagated
through SDP + HAC-cut rounding into the pairwise scorer's weights.

Reference analog: ``e2e_scripts/train.py:32-425`` trains
MLP → uncompress → ``SDPLayer`` → ``HACCutLayer`` with torch autograd —
cvxpylayers provides implicit differentiation through the SDP argmax, and
the HAC cut contributes NO Jacobian of its own (the rounded solution enters
the loss; gradients flow to the SDP output unchanged).  torch/cvxpylayers
are absent from this environment, so the from-scratch analog applies the
same identity-backward trick one level deeper (the straight-through
estimator — public technique, Bengio et al. 2013): the rounded
coclustering matrix is treated as identity in ``X*`` (exactly the
reference's HACCutLayer backward) and ``X*`` as identity in the signed
edge weights (replacing the implicit SDP differentiation).  The loss is
the reference's squared Frobenius error between the rounded coclustering
and the gold block-diagonal matrix, restricted to in-block pairs — the
only pairs the reference featurizes.

Distribution shape: blocks are independent, so per-epoch per-block
gradients are an embarrassingly-parallel fan-out (Ray tasks over blocks,
parameters broadcast once per epoch via ``ray.put``) summed on the driver.
Driver state is the parameter set + Adam moments — bounded by MODEL size,
never data size.  Exercised by tests/test_e2e_train.py in both local and
Ray-parallel modes.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..stages.correlation import hac_cut, sdp_lowrank, uncompress_weights


@dataclass
class TrainBlock:
    """All within-block pairs (u < v, row-major upper-tri order), their
    feature rows, and the gold same-entity indicator per pair."""

    feats: np.ndarray   # (n_pairs, n_features), NaN = missing
    n_docs: int
    gold: np.ndarray    # (n_pairs,) float 0/1


def block_forward_backward(scorer, block: TrainBlock,
                           threshold: float = 0.5):
    """One block's forward pass (score → SDP → HAC cut → rounded
    coclustering) and the straight-through upstream gradient dL/dprob.

    Returns (loss, dprob, rounded_pair_indicator)."""
    prob = scorer.predict_proba(block.feats)
    W = uncompress_weights(prob - threshold, block.n_docs)
    _, Xf = sdp_lowrank(W)
    labels, _ = hac_cut(Xf, W)
    iu, ju = np.triu_indices(block.n_docs, k=1)
    rounded = (labels[iu] == labels[ju]).astype(np.float64)
    resid = rounded - block.gold
    loss = float((resid ** 2).sum())
    return loss, 2.0 * resid, rounded


def _block_grads(scorer, block: TrainBlock, threshold: float):
    loss, dprob, _ = block_forward_backward(scorer, block, threshold)
    return loss, scorer.param_grads_from_prob_grad(block.feats, dprob)


def train_e2e(scorer, blocks: list[TrainBlock], n_epochs: int = 30,
              lr: float = 0.02, threshold: float = 0.5,
              parallel: bool = False) -> list[float]:
    """Full-batch Adam over the straight-through cluster loss; returns the
    per-epoch loss history.  ``parallel=True`` fans the per-block
    forward/backward out as Ray tasks (one per block, params broadcast
    once per epoch) — the multi-node shape; the local path is
    bit-identical (same summation order: block list order)."""
    scorer.ensure_init(np.concatenate([b.feats for b in blocks], axis=0))
    p = scorer.params
    mom = {k: np.zeros_like(v) for k, v in p.items()}
    vel = {k: np.zeros_like(v) for k, v in p.items()}
    b1c, b2c = 0.9, 0.999
    history: list[float] = []

    if parallel:
        import ray

        @ray.remote
        def _one(sc, blk, thr):
            return _block_grads(sc, blk, thr)

        block_refs = [ray.put(b) for b in blocks]

    for t in range(1, n_epochs + 1):
        if parallel:
            sref = ray.put(scorer)
            results = ray.get([_one.remote(sref, br, threshold)
                               for br in block_refs])
        else:
            results = [_block_grads(scorer, b, threshold) for b in blocks]
        total = 0.0
        grads = {k: np.zeros_like(v) for k, v in p.items()}
        for loss, g in results:
            total += loss
            for k in grads:
                grads[k] += g[k]
        history.append(total)
        for k in p:
            mom[k] = b1c * mom[k] + (1 - b1c) * grads[k]
            vel[k] = b2c * vel[k] + (1 - b2c) * grads[k] ** 2
            mhat = mom[k] / (1 - b1c ** t)
            vhat = vel[k] / (1 - b2c ** t)
            p[k] -= lr * mhat / (np.sqrt(vhat) + 1e-8)
        if parallel:
            # params mutated in place → next epoch re-broadcasts the scorer
            del sref
    return history


def pairwise_f1(scorer, blocks: list[TrainBlock],
                threshold: float = 0.5) -> float:
    """Pairwise F1 of the rounded e2e clustering against gold, summed over
    blocks (the reference's eval metric for the e2e model)."""
    tp = fp = fn = 0.0
    for b in blocks:
        _, _, rounded = block_forward_backward(scorer, b, threshold)
        tp += float((rounded * b.gold).sum())
        fp += float((rounded * (1 - b.gold)).sum())
        fn += float(((1 - rounded) * b.gold).sum())
    prec = tp / max(tp + fp, 1e-12)
    rec = tp / max(tp + fn, 1e-12)
    return 2 * prec * rec / max(prec + rec, 1e-12)
