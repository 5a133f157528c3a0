"""NeuMiss edge scorer (reference NeuMiss+MLPLayer analog,
/root/reference/e2e_pipeline/mlp_layer.py:6-13): the Neumann-unrolled
missingness block, pure numpy with manual backprop.

Pins: (1) the hand-derived gradients are EXACT (central-difference check
through the full unroll); (2) the block learns pattern-dependent slopes a
fixed linear head on mean-imputed features cannot represent; (3) duck-typed
persistence + the resume dispatcher recognize the new checkpoint format.
"""

import numpy as np

from ent_res_feedback_ray.state.mlp import MLPScorer, NeuMissScorer
from ent_res_feedback_ray.state.model import LogisticScorer, auroc


def _correlated_mcar(n, seed, rho=0.7, miss_p=0.6):
    """y depends ONLY on x0; x1/x2 are noisy correlates of x0; x0 and x1
    go missing independently (MCAR).  The Bayes slope on x1 is ~0 when x0
    is observed but large when x0 is missing — inexpressible with one
    fixed coefficient, which is exactly the NeuMiss paper's motivating
    gap over mean-imputation + linear."""
    rng = np.random.default_rng(seed)
    z = rng.normal(size=n)
    noise = np.sqrt(1.0 - rho * rho)
    x0 = z
    x1 = rho * z + noise * rng.normal(size=n)
    x2 = rho * z + noise * rng.normal(size=n)
    y = (x0 > 0).astype(np.float64)
    X = np.stack([x0, x1, x2], axis=1)
    X[rng.random(n) < miss_p, 0] = np.nan
    X[rng.random(n) < miss_p, 1] = np.nan
    return X, y


def test_neumiss_gradients_exact():
    """Central-difference check of every parameter through the unroll."""
    rng = np.random.default_rng(2)
    n, d = 12, 3
    X = rng.normal(size=(n, d))
    X[rng.random((n, d)) < 0.4] = np.nan
    y = (rng.random(n) < 0.5).astype(np.float64)

    m = NeuMissScorer(depth=3, hidden=4, seed=7)
    obs = ~np.isnan(X)
    cnt = np.maximum(obs.sum(axis=0), 1)
    m.mu = np.where(obs, X, 0.0).sum(axis=0) / cnt
    sd = np.sqrt(np.where(obs, (X - m.mu) ** 2, 0.0).sum(axis=0) / cnt)
    sd[sd == 0] = 1.0
    m.sd = sd
    h0, msk, miss = m._encode(X)
    sw = np.full((n, 1), 1.0 / n)

    p = {
        "Wn": rng.normal(0.0, 0.3, (d, d)),
        "W1": rng.normal(0.0, 0.5, (2 * d, 4)),
        "b1": rng.normal(0.0, 0.1, 4),
        "W2": rng.normal(0.0, 0.5, (4, 1)),
        "b2": rng.normal(0.0, 0.1, 1),
    }
    _, grads = m._loss_grads(p, h0, msk, miss, y, sw)

    eps = 1e-6
    for k in p:
        flat = p[k].reshape(-1)
        for idx in range(flat.size):
            orig = flat[idx]
            flat[idx] = orig + eps
            lp, _ = m._loss_grads(p, h0, msk, miss, y, sw)
            flat[idx] = orig - eps
            lm, _ = m._loss_grads(p, h0, msk, miss, y, sw)
            flat[idx] = orig
            num = (lp - lm) / (2 * eps)
            ana = grads[k].reshape(-1)[idx]
            assert abs(num - ana) <= 1e-5 * max(1.0, abs(num)), (
                f"grad mismatch {k}[{idx}]: numeric {num} vs analytic {ana}")


def test_neumiss_beats_fixed_linear_under_mcar():
    Xtr, ytr = _correlated_mcar(4000, seed=11)
    Xte, yte = _correlated_mcar(2000, seed=12)
    nm = NeuMissScorer(n_iter=500, seed=5).fit(Xtr, ytr)
    lg = LogisticScorer().fit(Xtr, ytr)
    nm_auc = auroc(yte, nm.predict_proba(Xte))
    lg_auc = auroc(yte, lg.predict_proba(Xte))
    assert nm_auc > 0.85
    assert nm_auc > lg_auc + 0.01, (nm_auc, lg_auc)


def test_neumiss_deterministic_and_nan_safe():
    X, y = _correlated_mcar(600, seed=3)
    p1 = NeuMissScorer(n_iter=150, seed=11).fit(X, y).predict_proba(X)
    p2 = NeuMissScorer(n_iter=150, seed=11).fit(X, y).predict_proba(X)
    assert np.array_equal(p1, p2)
    assert np.isfinite(p1).all()


def test_neumiss_checkpoint_roundtrip_and_resume_dispatch(tmp_path):
    X, y = _correlated_mcar(600, seed=4)
    m = NeuMissScorer(depth=4, n_iter=100).fit(X, y)
    path = str(tmp_path / "model.npz")
    m.save(path)
    m2 = NeuMissScorer.load(path)
    assert m2.depth == 4
    assert np.allclose(m.predict_proba(X), m2.predict_proba(X))

    # the feedback-resume prober must route the new format to NeuMissScorer
    # even when another class was requested (round-3 ADVICE semantics)
    from ent_res_feedback_ray.pipelines.feedback import _load_scorer

    got = _load_scorer(path, MLPScorer)
    assert isinstance(got, NeuMissScorer)
    assert np.allclose(got.predict_proba(X), m.predict_proba(X))
