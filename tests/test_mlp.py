"""Numpy MLP edge scorer (reference MLPLayer analog,
/root/reference/e2e_pipeline/mlp_layer.py:6-45): learns a non-linear
boundary the logistic scorer cannot, handles NaN features via mask-concat,
round-trips through checkpoints, and serves through the same actor-pool
inference stage."""

import numpy as np

from ent_res_feedback_ray.state.mlp import MLPScorer
from ent_res_feedback_ray.state.model import LogisticScorer, auroc


def _xor_data(n=2000, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-1, 1, (n, 2))
    y = ((X[:, 0] > 0) ^ (X[:, 1] > 0)).astype(np.float64)
    return X, y


def test_mlp_beats_logistic_on_xor():
    X, y = _xor_data()
    mlp_auc = auroc(y, MLPScorer(n_iter=600, seed=5).fit(X, y).predict_proba(X))
    log_auc = auroc(y, LogisticScorer().fit(X, y).predict_proba(X))
    assert mlp_auc > 0.95
    assert log_auc < 0.7  # linearly inseparable by construction


def test_mlp_deterministic_and_nan_safe():
    X, y = _xor_data(500)
    X[::7, 0] = np.nan  # missing features must not poison training
    p1 = MLPScorer(seed=11).fit(X, y).predict_proba(X)
    p2 = MLPScorer(seed=11).fit(X, y).predict_proba(X)
    assert np.array_equal(p1, p2)
    assert np.isfinite(p1).all()
    # the missingness mask is informative, not destructive
    assert auroc(y, p1) > 0.9


def test_mlp_checkpoint_roundtrip(tmp_path):
    X, y = _xor_data(500)
    m = MLPScorer(n_iter=200).fit(X, y)
    path = str(tmp_path / "mlp.npz")
    m.save(path)
    m2 = MLPScorer.load(path)
    assert np.allclose(m.predict_proba(X), m2.predict_proba(X))


def test_mlp_through_actor_pool_stage(sf_dir):
    """The duck-typed predict_proba contract: distributed inference through
    trained_scoring_stage matches driver-side predictions bit-for-bit."""
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.stages.features import FEATURE_COLS
    from ent_res_feedback_ray.stages.scoring import trained_scoring_stage

    rng = np.random.default_rng(9)
    n = 256
    df = pd.DataFrame({c: rng.random(n) for c in FEATURE_COLS})
    df.insert(0, "id1", np.arange(n))
    df.insert(1, "id2", np.arange(n) + 1_000_000)
    y = (df[FEATURE_COLS[0]] > 0.5).to_numpy(np.float64)
    model = MLPScorer(n_iter=150).fit(df[FEATURE_COLS].to_numpy(), y)

    out = trained_scoring_stage(
        ray.data.from_pandas(df), model).to_pandas().sort_values("id1")
    local = model.predict_proba(df[FEATURE_COLS].to_numpy())
    assert np.allclose(out["score"].to_numpy(), local)


def test_scores_trained_mlp_path(sf_dir):
    from ent_res_feedback_ray.pipelines.er import scores_trained

    out = scores_trained(sf_dir, scorer="mlp").to_pandas()
    assert len(out) > 0
    assert out["score"].between(0.0, 1.0).all()


def test_feedback_loop_with_mlp_scorer(synth_pages, tmp_path_factory):
    """e2e-train-loop analog: MLP edge scorer retrained each feedback round
    (reference /root/reference/e2e_scripts/train.py:32-425, minus the
    backprop-through-SDP step — no autodiff in this env)."""
    from ent_res_feedback_ray.pipelines.feedback import run_feedback_rounds
    from ent_res_feedback_ray.state.mlp import MLPScorer

    pages_path, gold_path = synth_pages
    out = str(tmp_path_factory.mktemp("mlp_rounds"))
    history = run_feedback_rounds(
        pages_path, gold_path, out, n_rounds=2, k_per_round=150,
        scorer_cls=MLPScorer,
        resolve_kwargs={"use_key_blocks": False, "use_lsh": True})
    assert len(history) == 2
    assert history[-1]["pair_f1"] >= 0.9
    # the round-1 model checkpoint reloads as an MLP and scores
    import os

    from ent_res_feedback_ray.state.checkpoint import stage_dir

    mp = os.path.join(stage_dir(out, 1, "round"), "model.npz")
    if os.path.exists(mp):
        m = MLPScorer.load(mp)
        import numpy as np
        p = m.predict_proba(np.random.default_rng(1).random((8, len(m.mu))))
        assert np.isfinite(p).all()
