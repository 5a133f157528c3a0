"""Histogram-GBDT scorer: accuracy, monotone constraints, missing routing,
determinism, persistence, actor-pool inference parity, TPE integration.

Reference analog under test: LGBMClassifier + hyperopt + monotone_constraints
(/root/reference/s2and/model.py:744-876)."""

import numpy as np
import pytest

from ent_res_feedback_ray.state.gbdt import (GBDT_SPACE, GBDTScorer,
                                             tune_pairwise_gbdt)
from ent_res_feedback_ray.state.model import LogisticScorer, auroc


def _xor_data(n=4000, seed=3):
    """Nonlinear (XOR-ish) target a linear model cannot fit."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 4))
    y = ((X[:, 0] > 0) ^ (X[:, 1] > 0)).astype(float)
    flip = rng.random(n) < 0.05
    y[flip] = 1 - y[flip]
    return X, y


def test_fits_nonlinear_boundary_beats_linear():
    X, y = _xor_data()
    Xtr, ytr, Xte, yte = X[:3000], y[:3000], X[3000:], y[3000:]
    gbdt = GBDTScorer(n_estimators=40, num_leaves=15, seed=7).fit(Xtr, ytr)
    lin = LogisticScorer().fit(Xtr, ytr)
    a_gbdt = auroc(yte, gbdt.predict_proba(Xte))
    a_lin = auroc(yte, lin.predict_proba(Xte))
    assert a_gbdt > 0.95
    assert a_gbdt > a_lin + 0.3  # XOR is ~0.5 for any linear model


def test_monotone_constraint_holds_ensemble_wide():
    # noisy data where the unconstrained fit would locally violate +1
    rng = np.random.default_rng(11)
    n = 3000
    X = rng.normal(size=(n, 3))
    z = 1.5 * X[:, 0] + 0.8 * np.sin(3 * X[:, 1]) + rng.normal(0, 1.2, n)
    y = (z > 0).astype(float)
    m = GBDTScorer(n_estimators=30, num_leaves=15, monotone=[1, 0, 0],
                   seed=5).fit(X, y)
    # sweep feature 0 over a fine grid at many random anchor points: the
    # decision must be non-decreasing everywhere (bounds propagation
    # guarantees it globally, not just in-sample)
    grid = np.linspace(-4, 4, 201)
    for anchor in rng.normal(size=(20, 3)):
        P = np.tile(anchor, (len(grid), 1))
        P[:, 0] = grid
        d = m.decision(P)
        assert (np.diff(d) >= -1e-12).all()
    # the constrained model still learns: feature-0 signal dominates
    assert auroc(y, m.predict_proba(X)) > 0.75


def test_monotone_decreasing():
    rng = np.random.default_rng(12)
    X = rng.normal(size=(2000, 2))
    y = (-X[:, 0] + 0.5 * rng.normal(size=2000) > 0).astype(float)
    m = GBDTScorer(n_estimators=20, monotone=[-1, 0], seed=5).fit(X, y)
    grid = np.linspace(-3, 3, 101)
    P = np.zeros((101, 2))
    P[:, 0] = grid
    assert (np.diff(m.decision(P)) <= 1e-12).all()


def test_native_missing_direction_is_learned():
    # missingness is informative: NaN in feature 0 ⇒ y=1 with high prob.
    # A NaN-filled linear model maps NaN to 0.0 (mid-range), losing the
    # signal; native routing should recover it.
    rng = np.random.default_rng(4)
    n = 4000
    X = rng.normal(size=(n, 2))
    is_missing = rng.random(n) < 0.4
    y = np.where(is_missing, (rng.random(n) < 0.9),
                 (X[:, 0] > 0)).astype(float)
    X[is_missing, 0] = np.nan
    m = GBDTScorer(n_estimators=20, num_leaves=7, seed=9).fit(X, y)
    a = auroc(y, m.predict_proba(X))
    assert a > 0.85
    # NaN rows must score systematically higher than non-missing negatives
    p = m.predict_proba(X)
    assert p[is_missing].mean() > p[~is_missing & (y == 0)].mean() + 0.2


def test_deterministic_and_subsampling_seeded():
    X, y = _xor_data(n=1500)
    kw = dict(n_estimators=15, num_leaves=15, subsample=0.8,
              colsample_bytree=0.75, seed=21)
    p1 = GBDTScorer(**kw).fit(X, y).predict_proba(X)
    p2 = GBDTScorer(**kw).fit(X, y).predict_proba(X)
    assert np.array_equal(p1, p2)
    p3 = GBDTScorer(**{**kw, "seed": 22}).fit(X, y).predict_proba(X)
    assert not np.array_equal(p1, p3)


def test_save_load_roundtrip(tmp_path):
    X, y = _xor_data(n=1200)
    X = X.copy()
    X[::7, 2] = np.nan  # exercise missing routing through persistence
    m = GBDTScorer(n_estimators=10, num_leaves=9, seed=2).fit(X, y)
    path = str(tmp_path / "gbdt_model")
    m.save(path)
    m2 = GBDTScorer.load(path)
    assert np.array_equal(m.predict_proba(X), m2.predict_proba(X))


def test_actor_pool_inference_parity(ray_session):
    import pyarrow as pa
    import ray.data

    import ray

    from ent_res_feedback_ray.stages.scoring import TrainedScorer

    X, y = _xor_data(n=2000)
    X[::11, 1] = np.nan
    m = GBDTScorer(n_estimators=12, num_leaves=9, seed=6).fit(X, y)
    cols = [f"f{j}" for j in range(X.shape[1])]
    tbl = pa.table({c: X[:, j] for j, c in enumerate(cols)}
                   | {"pair_id": np.arange(len(X))})
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = ds.map_batches(TrainedScorer,
                         fn_constructor_kwargs={"model_ref": ray.put(m),
                                                "feature_cols": cols},
                         batch_format="pyarrow", concurrency=(1, 2),
                         batch_size=512)
    df = out.to_pandas().sort_values("pair_id")
    # raw NaNs must reach the model (no nan_fill attr) — parity is exact
    assert np.array_equal(df["score"].to_numpy(),
                          m.predict_proba(X))


def test_tpe_tuned_gbdt(ray_session):
    X, y = _xor_data(n=2400, seed=8)
    Xtr, ytr = X[:1600], y[:1600]
    Xv, yv = X[1600:2000], y[1600:2000]
    Xte, yte = X[2000:], y[2000:]
    model, tpe = tune_pairwise_gbdt(Xtr, ytr, Xv, yv, n_iter=6, batch=3,
                                    seed=13)
    hist = tpe.trials_frame()
    assert len(hist) == 6
    assert set(GBDT_SPACE) <= set(hist.columns)
    assert auroc(yte, model.predict_proba(Xte)) > 0.9


def test_scores_trained_gbdt_path(sf_dir):
    """scorer="gbdt" serves the from-scratch LightGBM analog through the
    trained-scorer pipeline's actor-pool stage, raw NaNs reaching the model
    (native missing routing, like the reference feeding LightGBM unimputed
    matrices — /root/reference/s2and/model.py:744-876)."""
    from ent_res_feedback_ray.pipelines.er import scores_trained

    out = scores_trained(sf_dir, scorer="gbdt").to_pandas()
    assert len(out) > 0
    assert out["score"].between(0.0, 1.0).all()
    assert out["score"].nunique() > 1  # non-degenerate scorer
