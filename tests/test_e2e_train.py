"""Straight-through e2e training (reference e2e_scripts/train.py:32-425
analog): the cluster-level loss backpropagates through SDP + HAC-cut
rounding into the pairwise scorer, without ever training on pair labels
directly.

Pins: training drives the rounded-coclustering loss down and recovers the
planted entities; the Ray-parallel per-block gradient fan-out matches the
local path; the NeuMiss scorer trains through the same loop with missing
features."""

import numpy as np

from ent_res_feedback_ray.state.e2e_train import (
    TrainBlock, pairwise_f1, train_e2e)
from ent_res_feedback_ray.state.mlp import MLPScorer, NeuMissScorer


def _planted_blocks(n_blocks=6, seed=0, nan_frac=0.0):
    """Blocks of 6-10 docs split into two planted entities; pair features
    carry a noisy same-entity signal in dim 0 and pure noise in dims 1-2."""
    rng = np.random.default_rng(seed)
    blocks = []
    for _ in range(n_blocks):
        n = int(rng.integers(6, 11))
        ent = (np.arange(n) >= rng.integers(2, n - 1)).astype(np.int64)
        iu, ju = np.triu_indices(n, k=1)
        gold = (ent[iu] == ent[ju]).astype(np.float64)
        f0 = gold + rng.normal(0.0, 0.35, gold.shape)
        feats = np.stack(
            [f0, rng.normal(size=gold.shape), rng.normal(size=gold.shape)],
            axis=1)
        if nan_frac:
            feats[rng.random(feats.shape) < nan_frac] = np.nan
        blocks.append(TrainBlock(feats=feats, n_docs=n, gold=gold))
    return blocks


def test_e2e_training_recovers_planted_entities():
    blocks = _planted_blocks(seed=1)
    scorer = MLPScorer(seed=3)
    f1_before = pairwise_f1(scorer.ensure_init(
        np.concatenate([b.feats for b in blocks])), blocks)
    history = train_e2e(scorer, blocks, n_epochs=40, lr=0.05)
    f1_after = pairwise_f1(scorer, blocks)
    assert history[-1] < 0.5 * history[0], history
    assert f1_after > 0.95, (f1_before, f1_after)
    assert f1_after > f1_before


def test_e2e_parallel_epoch_matches_local(sf_dir):
    """The Ray fan-out sums per-block grads in block order — same floats
    as the sequential path."""
    blocks = _planted_blocks(n_blocks=4, seed=2)
    local = MLPScorer(seed=5)
    dist = MLPScorer(seed=5)
    h_local = train_e2e(local, blocks, n_epochs=3, lr=0.05, parallel=False)
    h_dist = train_e2e(dist, blocks, n_epochs=3, lr=0.05, parallel=True)
    assert np.allclose(h_local, h_dist, rtol=0, atol=1e-9)
    for k in local.params:
        assert np.allclose(local.params[k], dist.params[k],
                           rtol=0, atol=1e-12), k


def test_e2e_training_with_neumiss_under_missingness():
    blocks = _planted_blocks(seed=4, nan_frac=0.25)
    scorer = NeuMissScorer(depth=3, seed=7)
    history = train_e2e(scorer, blocks, n_epochs=40, lr=0.05)
    assert history[-1] < 0.7 * history[0]
    assert pairwise_f1(scorer, blocks) > 0.85


def test_e2e_train_on_real_blocks(synth_pages):
    """Full plumbing: pages → blocking → featurize → TrainBlocks → e2e
    train (parallel).  The trained scorer's rounded clustering beats the
    cold-start one on its own training blocks."""
    from ent_res_feedback_ray.pipelines.feedback import train_e2e_on_blocks

    pages_path, gold_path = synth_pages
    out = train_e2e_on_blocks(pages_path, gold_path, n_blocks=10,
                              n_epochs=15, parallel=True)
    assert out["n_blocks"] >= 3
    assert out["loss_history"][-1] <= out["loss_history"][0]
    assert out["pair_f1_after"] >= max(0.9, out["pair_f1_before"])
