"""SHAP-analog attributions (reference pairwise_eval SHAP diagnostics,
/root/reference/s2and/eval.py:430-607): exact linear Shapley for the
logistic scorer, permutation-sampling Shapley for the neural scorers,
distributed explain stage + global importance ranking.

Pins: decision-space additivity is EXACT for both constructions; the
planted informative feature ranks first; the distributed stage reproduces
the driver computation row-for-row."""

import numpy as np
import pandas as pd

from ent_res_feedback_ray.eval.explain import (
    explain_stage, feature_importance, linear_shap_values,
    sampling_shap_values)
from ent_res_feedback_ray.state.mlp import MLPScorer, NeuMissScorer
from ent_res_feedback_ray.state.model import LogisticScorer


def _planted(n=400, d=4, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    y = (X[:, 0] > 0).astype(np.float64)
    return X, y


def test_linear_shap_additivity_exact():
    X, y = _planted()
    sc = LogisticScorer().fit(X, y)
    mu = X.mean(axis=0)
    phi = linear_shap_values(sc, X, mu)
    assert np.allclose(phi.sum(axis=1),
                       sc.decision(X) - sc.decision(mu[None, :])[0],
                       atol=1e-10)


def test_sampling_shap_additivity_exact_single_background():
    """Every permutation telescopes to f(x) − f(b), so with one background
    row the attribution sum is exact at ANY sample count."""
    X, y = _planted(n=64)
    sc = MLPScorer(n_iter=100, seed=3).fit(X, y)
    b = X.mean(axis=0, keepdims=True)
    phi = sampling_shap_values(sc, X, b, n_samples=4, seed=9)
    assert np.allclose(phi.sum(axis=1),
                       sc.decision(X) - sc.decision(b)[0], atol=1e-9)


def test_importance_ranks_planted_feature_first():
    import ray.data

    X, y = _planted(n=600, seed=2)
    sc = LogisticScorer().fit(X, y)
    cols = [f"f{j}" for j in range(X.shape[1])]
    df = pd.DataFrame(X, columns=cols)
    ds = explain_stage(ray.data.from_pandas(df), sc, cols, X[:32])
    imp = feature_importance(ds, cols)
    assert imp.iloc[0]["feature"] == "f0"
    assert imp.iloc[0]["mean_abs_shap"] > 2 * imp.iloc[1]["mean_abs_shap"]


def test_explain_stage_matches_driver_rows(sf_dir):
    """Distributed attributions == driver attributions row-for-row (seeded
    permutations are batch-independent; rows are vectorized independently).
    Includes NaN features to pin the missingness-encoding semantics."""
    import ray.data

    rng = np.random.default_rng(5)
    X, y = _planted(n=200, seed=4)
    X[rng.random(X.shape) < 0.15] = np.nan
    sc = NeuMissScorer(depth=3, n_iter=80, seed=7).fit(X, y)
    bg = np.nan_to_num(X[:16], nan=0.0)
    cols = [f"f{j}" for j in range(X.shape[1])]
    df = pd.DataFrame(X, columns=cols)
    df.insert(0, "rid", np.arange(len(df)))

    out = (explain_stage(ray.data.from_pandas(df), sc, cols, bg,
                         n_samples=8, seed=11)
           .to_pandas().sort_values("rid").reset_index(drop=True))
    local = sampling_shap_values(sc, X, bg, n_samples=8, seed=11)
    got = out[[f"shap_{c}" for c in cols]].to_numpy()
    assert np.allclose(got, local, atol=1e-9)


def test_er_explain_pipeline(sf_dir):
    """Importance over the real featurizer output: the self-label source
    feature (shingle_jaccard) must rank near the top, and every feature
    gets a finite attribution."""
    from ent_res_feedback_ray.pipelines.er import explain_features
    from ent_res_feedback_ray.stages.features import FEATURE_COLS

    imp = explain_features(sf_dir)
    assert set(imp["feature"]) == set(FEATURE_COLS)
    assert np.isfinite(imp["mean_abs_shap"]).all()
    assert "shingle_jaccard" in set(imp.head(3)["feature"])
