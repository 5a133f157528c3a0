"""Deterministic TPE hyperparameter search (reference hyperopt analog,
/root/reference/s2and/model.py:744-876)."""

import numpy as np
import pytest

from ent_res_feedback_ray.state.tpe import DEFAULT_SPACE, TPESearch, tune_pairwise_model


def _run(space, loss_fn, n_iter, seed):
    tpe = TPESearch(space, seed=seed)
    for _ in range(n_iter):
        (p,) = tpe.suggest(1)
        tpe.observe(p, loss_fn(p))
    return tpe


def test_tpe_deterministic():
    """Same seed → bit-identical trial sequence; different seed differs."""
    space = {"x": ("uniform", -5.0, 5.0), "k": ("choice", ["a", "b"])}
    loss = lambda p: p["x"] ** 2 + (0.5 if p["k"] == "b" else 0.0)
    a = _run(space, loss, 20, seed=7).trials_frame()
    b = _run(space, loss, 20, seed=7).trials_frame()
    c = _run(space, loss, 20, seed=8).trials_frame()
    assert a.equals(b)
    assert not a.equals(c)


def test_tpe_beats_prior_random_on_quadratic():
    """After the startup phase, the Parzen good/bad split should steer
    proposals toward the optimum: TPE's best loss beats prior-only random
    sampling with the same budget (both seeded)."""
    space = {"x": ("uniform", 0.0, 10.0), "y": ("uniform", 0.0, 10.0)}
    loss = lambda p: (p["x"] - 7.3) ** 2 + (p["y"] - 2.1) ** 2

    tpe_best, rand_best = [], []
    for seed in range(8):  # single-seed comparison is luck; aggregate
        tpe_best.append(_run(space, loss, 40, seed=seed).best_loss)
        rand = TPESearch(space, seed=seed, n_startup=10 ** 9)  # prior only
        for _ in range(40):
            (p,) = rand.suggest(1)
            rand.observe(p, loss(p))
        rand_best.append(rand.best_loss)
    assert np.mean(tpe_best) < np.mean(rand_best)
    assert np.mean(tpe_best) < 0.6  # near the optimum in 40 evals


def test_tpe_respects_bounds_and_quantization():
    space = {
        "u": ("uniform", 2.0, 3.0),
        "lg": ("loguniform", -4.0, 1.0),
        "q": ("quniform", 100.0, 500.0, 50.0),
        "c": ("choice", [1, 2, 4]),
    }
    loss = lambda p: abs(p["u"] - 2.5) + p["lg"] + p["q"] / 1000 + p["c"]
    tpe = _run(space, loss, 30, seed=11)
    df = tpe.trials_frame()
    assert df["u"].between(2.0, 3.0).all()
    assert df["lg"].between(np.exp(-4.0), np.exp(1.0)).all()
    assert (df["q"] % 50 == 0).all() and df["q"].between(100, 500).all()
    assert df["c"].isin([1, 2, 4]).all()


def test_tune_pairwise_model_ray_parallel():
    """tune_pairwise_model mirrors the reference fit loop: TPE-minimized
    −AUROC(val) over Ray-parallel trial batches, winner refit on train only.
    The tuned model must separate a synthetic pair-feature problem and the
    search must be reproducible."""
    rng = np.random.default_rng(5)
    n, d = 600, 6
    X = rng.normal(size=(n, d))
    w_true = np.array([2.0, -1.5, 1.0, 0.0, 0.5, -0.25])
    y = (X @ w_true + rng.normal(scale=0.5, size=n) > 0).astype(np.float64)
    Xtr, ytr, Xv, yv = X[:400], y[:400], X[400:], y[400:]

    model, tpe = tune_pairwise_model(Xtr, ytr, Xv, yv, n_iter=8, batch=4,
                                     seed=17)
    assert len(tpe.trials) == 8
    assert tpe.best_loss < -0.95  # val AUROC ≥ 0.95
    # refit-on-train-only winner still separates held-out pairs
    from ent_res_feedback_ray.state.model import auroc
    assert auroc(yv, model.predict_proba(Xv)) > 0.95
    # reproducible: same seed → same best params and same trial losses
    model2, tpe2 = tune_pairwise_model(Xtr, ytr, Xv, yv, n_iter=8, batch=4,
                                       seed=17)
    assert tpe.best_params == tpe2.best_params
    assert tpe.trials_frame()["loss"].tolist() == \
        tpe2.trials_frame()["loss"].tolist()
    # defaults come from the reference's search-space shape
    assert set(DEFAULT_SPACE) == {"l2", "lr", "n_iter"}


def test_scores_trained_tpe_path(sf_dir):
    """scorer="tpe" runs the full reference fit loop (TPE over −AUROC(val)
    then refit on train, /root/reference/s2and/model.py:819-871) inside the
    trained-scorer pipeline and serves through the same actor-pool stage."""
    from ent_res_feedback_ray.pipelines.er import scores_trained

    out = scores_trained(sf_dir, scorer="tpe").to_pandas()
    assert len(out) > 0
    assert out["score"].between(0.0, 1.0).all()
