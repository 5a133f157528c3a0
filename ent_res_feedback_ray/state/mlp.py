"""Numpy MLP pairwise edge scorer with missingness handling.

Reference analog: ``MLPLayer`` + NeuMiss (torch,
/root/reference/e2e_pipeline/mlp_layer.py:6-45).  torch/neumiss are not in
this environment, so this is a from-scratch numpy MLP:

- missing features (NaN) are handled by the standard mask-concat encoding —
  impute 0 and concatenate the per-feature missingness indicator — the
  simple public baseline the NeuMiss paper (Le Morvan et al., 2020)
  compares against; the reference's Neumann-iteration block is its learned
  refinement;
- one hidden ReLU layer + sigmoid output (the reference's
  ``n_hidden_layers=1`` default shape, without batchnorm/dropout — those
  regularize epochs-long GPU training, not this bounded driver-side fit);
- full-batch Adam, seeded deterministic init.

Training data is bounded by construction (same contract as
``LogisticScorer``); inference distributes through the identical duck-typed
``predict_proba`` actor-pool stage (``stages.scoring.trained_scoring_stage``).
"""

from __future__ import annotations

import numpy as np


class MLPScorer:
    """One-hidden-layer numpy MLP on the mask-concat pair-feature matrix."""

    def __init__(self, hidden: int = 32, lr: float = 0.01, n_iter: int = 400,
                 l2: float = 1e-4, seed: int = 17):
        self.hidden = hidden
        self.lr = lr
        self.n_iter = n_iter
        self.l2 = l2
        self.seed = seed
        self.params: dict[str, np.ndarray] | None = None
        self.mu: np.ndarray | None = None
        self.sd: np.ndarray | None = None

    # --- encoding ----------------------------------------------------------
    def _encode(self, X: np.ndarray) -> np.ndarray:
        """Standardize observed values, impute 0 (= the mean, post-
        standardization), concat the missingness mask."""
        X = np.asarray(X, dtype=np.float64)
        mask = np.isnan(X)
        Xs = (np.where(mask, self.mu, X) - self.mu) / self.sd
        return np.concatenate([Xs, mask.astype(np.float64)], axis=1)

    # --- training ----------------------------------------------------------
    def fit(self, X: np.ndarray, y: np.ndarray,
            sample_weight: np.ndarray | None = None) -> "MLPScorer":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        obs = ~np.isnan(X)
        cnt = np.maximum(obs.sum(axis=0), 1)
        self.mu = np.where(obs, X, 0.0).sum(axis=0) / cnt
        sd = np.sqrt(np.where(obs, (X - self.mu) ** 2, 0.0).sum(axis=0) / cnt)
        sd[sd == 0] = 1.0
        self.sd = sd

        Z = self._encode(X)
        n, d = Z.shape
        if sample_weight is None:
            sample_weight = np.ones(n)
        sw = (sample_weight / sample_weight.sum())[:, None]

        rng = np.random.default_rng(self.seed)
        h = self.hidden
        p = {
            "W1": rng.normal(0.0, np.sqrt(2.0 / d), (d, h)),
            "b1": np.zeros(h),
            "W2": rng.normal(0.0, np.sqrt(2.0 / h), (h, 1)),
            "b2": np.zeros(1),
        }
        m = {k: np.zeros_like(v) for k, v in p.items()}
        v = {k: np.zeros_like(val) for k, val in p.items()}
        b1c, b2c = 0.9, 0.999
        for t in range(1, self.n_iter + 1):
            a1 = Z @ p["W1"] + p["b1"]
            h1 = np.maximum(a1, 0.0)
            z2 = (h1 @ p["W2"] + p["b2"])[:, 0]
            prob = 1.0 / (1.0 + np.exp(-z2))
            # weighted BCE gradient
            g2 = (prob - y)[:, None] * sw
            grads = {
                "W2": h1.T @ g2 + self.l2 * p["W2"],
                "b2": g2.sum(axis=0),
            }
            gh = (g2 @ p["W2"].T) * (a1 > 0)
            grads["W1"] = Z.T @ gh + self.l2 * p["W1"]
            grads["b1"] = gh.sum(axis=0)
            for k in p:
                m[k] = b1c * m[k] + (1 - b1c) * grads[k]
                v[k] = b2c * v[k] + (1 - b2c) * grads[k] ** 2
                mhat = m[k] / (1 - b1c ** t)
                vhat = v[k] / (1 - b2c ** t)
                p[k] -= self.lr * mhat / (np.sqrt(vhat) + 1e-8)
        self.params = p
        return self

    # --- inference (duck-typed with LogisticScorer) -------------------------
    def decision(self, X: np.ndarray) -> np.ndarray:
        Z = self._encode(X)
        p = self.params
        h1 = np.maximum(Z @ p["W1"] + p["b1"], 0.0)
        return (h1 @ p["W2"] + p["b2"])[:, 0]

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        return 1.0 / (1.0 + np.exp(-self.decision(X)))

    # --- persistence (round checkpoints) ------------------------------------
    def save(self, path: str) -> None:
        np.savez(path, mu=self.mu, sd=self.sd, **self.params)

    @classmethod
    def load(cls, path: str) -> "MLPScorer":
        data = np.load(path if path.endswith(".npz") else path + ".npz")
        m = cls(hidden=data["W1"].shape[1])
        m.mu = data["mu"]
        m.sd = data["sd"]
        m.params = {k: data[k] for k in ("W1", "b1", "W2", "b2")}
        return m
