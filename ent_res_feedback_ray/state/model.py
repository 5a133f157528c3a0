"""Driver-side trainable pairwise scorer (numpy logistic regression).

Reference analog: ``PairwiseModeler`` (LightGBM + hyperopt,
/root/reference/s2and/model.py:744-876).  LightGBM/sklearn are not available
in this environment, so the trained path is a from-scratch L2-regularized
logistic regression (full-batch Newton-ish gradient descent, seeded and
deterministic).  Training data is bounded by construction (≤100k pairs) so
the fit runs on the driver; inference distributes via
``stages.scoring.TrainedScorer`` actor pools.
"""

from __future__ import annotations

import numpy as np


class LogisticScorer:
    """Deterministic L2 logistic regression on the pair-feature matrix.

    ``monotone``: per-feature sign constraints (+1 non-decreasing, -1
    non-increasing, 0 free) — the exact linear-model analog of the
    reference's LightGBM ``monotone_constraints``
    (/root/reference/s2and/model.py:744-876): for a linear decision
    function, monotone in feature i ⟺ sign(w_i) pinned, enforced by
    projected gradient descent (projection of a convex problem → the
    constrained optimum).  A scalar broadcasts to all features."""

    def __init__(self, l2: float = 1e-3, lr: float = 0.5, n_iter: int = 300,
                 nan_fill: float = 0.0, seed: int = 17,
                 monotone: "np.ndarray | list | int | None" = None):
        self.l2 = l2
        self.lr = lr
        self.n_iter = n_iter
        self.nan_fill = nan_fill
        self.seed = seed
        self.monotone = monotone
        self.w: np.ndarray | None = None
        self.b: float = 0.0

    def fit(self, X: np.ndarray, y: np.ndarray,
            sample_weight: np.ndarray | None = None) -> "LogisticScorer":
        X = np.nan_to_num(np.asarray(X, dtype=np.float64), nan=self.nan_fill)
        y = np.asarray(y, dtype=np.float64)
        n, d = X.shape
        if sample_weight is None:
            sample_weight = np.ones(n)
        sw = sample_weight / sample_weight.sum()
        # standardize for conditioning; fold back into (w, b) afterwards
        mu = X.mean(axis=0)
        sd = X.std(axis=0)
        sd[sd == 0] = 1.0
        Xs = (X - mu) / sd
        # sd > 0, so sign(w_orig) = sign(w_std): project in standard space
        mono = None
        if self.monotone is not None:
            mono = np.broadcast_to(
                np.asarray(self.monotone, np.float64), (d,)).copy()
        w = np.zeros(d)
        b = 0.0
        for _ in range(self.n_iter):
            z = Xs @ w + b
            p = 1.0 / (1.0 + np.exp(-z))
            g = (p - y) * sw
            gw = Xs.T @ g + self.l2 * w
            gb = g.sum()
            w -= self.lr * gw
            b -= self.lr * gb
            if mono is not None:
                w = np.where(mono > 0, np.maximum(w, 0.0),
                             np.where(mono < 0, np.minimum(w, 0.0), w))
        self.w = w / sd
        self.b = float(b - (w * mu / sd).sum())
        return self

    def decision(self, X: np.ndarray) -> np.ndarray:
        X = np.nan_to_num(np.asarray(X, dtype=np.float64), nan=self.nan_fill)
        return X @ self.w + self.b

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        return 1.0 / (1.0 + np.exp(-self.decision(X)))

    # --- persistence (round checkpoints) ---------------------------------
    def save(self, path: str) -> None:
        np.savez(path, w=self.w, b=self.b, nan_fill=self.nan_fill)

    @classmethod
    def load(cls, path: str) -> "LogisticScorer":
        data = np.load(path if path.endswith(".npz") else path + ".npz")
        m = cls(nan_fill=float(data["nan_fill"]))
        m.w = data["w"]
        m.b = float(data["b"])
        return m


def auroc(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Rank-based AUROC (no sklearn); ties get midranks."""
    y_true = np.asarray(y_true, dtype=np.float64)
    y_score = np.asarray(y_score, dtype=np.float64)
    order = np.argsort(y_score, kind="mergesort")
    ranks = np.empty(len(y_score))
    sorted_scores = y_score[order]
    ranks[order] = np.arange(1, len(y_score) + 1)
    # midranks for ties
    i = 0
    while i < len(sorted_scores):
        j = i
        while j + 1 < len(sorted_scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        if j > i:
            mid = (i + j) / 2 + 1
            ranks[order[i : j + 1]] = mid
        i = j + 1
    n_pos = y_true.sum()
    n_neg = len(y_true) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return float((ranks[y_true == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def average_precision(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Average precision (area under the precision-recall curve, step
    interpolation — sklearn's definition, which the reference's
    ``pairwise_eval`` reports alongside AUROC,
    /root/reference/s2and/eval.py:430-607): AP = Σ_k (R_k − R_{k−1})·P_k
    over descending score thresholds; tied scores enter together."""
    y_true = np.asarray(y_true, dtype=np.float64)
    y_score = np.asarray(y_score, dtype=np.float64)
    n_pos = float(y_true.sum())
    if len(y_true) == 0 or n_pos == 0:
        return float("nan")
    order = np.argsort(-y_score, kind="mergesort")
    ys, yt = y_score[order], y_true[order]
    # threshold group boundaries: last index of each tied-score run
    last = np.nonzero(np.append(ys[1:] != ys[:-1], True))[0]
    tp = np.cumsum(yt)[last]
    fp = np.cumsum(1.0 - yt)[last]
    precision = tp / (tp + fp)
    recall = tp / n_pos
    prev_recall = np.concatenate([[0.0], recall[:-1]])
    return float(((recall - prev_recall) * precision).sum())


class VotingScorer:
    """Soft-voting ensemble of fitted scorers (reference ``VotingClassifier``
    prefit-soft mode, /root/reference/s2and/model.py:879-981, and the
    nameless-classifier average, model.py:286-292): predict_proba = mean of
    member probabilities.  Serves through the same actor-pool stage as a
    single scorer (duck-typed predict_proba / nan_fill)."""

    def __init__(self, models: list, weights: list[float] | None = None):
        assert models
        self.models = models
        self.weights = np.asarray(weights if weights is not None
                                  else [1.0] * len(models), dtype=np.float64)
        self.weights = self.weights / self.weights.sum()
        self.nan_fill = models[0].nan_fill

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        out = np.zeros(len(X), dtype=np.float64)
        for w, m in zip(self.weights, self.models):
            out += w * m.predict_proba(X)
        return out
