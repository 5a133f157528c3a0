"""Deterministic Tree-structured Parzen Estimator hyperparameter search.

Reference analog: ``PairwiseModeler.fit`` — ``hyperopt.fmin(tpe.suggest)``
over a LightGBM search space minimizing −AUROC on the validation split,
then a refit on train only (/root/reference/s2and/model.py:744-876), and
``Clusterer.fit``'s eps search (model.py:335-432).  hyperopt is absent in
this environment, so this is a from-scratch TPE implemented from the public
algorithm (Bergstra, Bardenet, Bengio, Kégl — "Algorithms for Hyper-Parameter
Optimization", NeurIPS 2011): split observed trials at the γ-quantile of
loss into good/bad sets, fit an adaptive Parzen (prior + per-observation
Gaussian) density to each, propose the candidate maximizing l(x)/g(x).

Differences from hyperopt, on purpose:
- **Seeded and deterministic**: one ``numpy`` Generator drives startup
  sampling, candidate draws and tie-breaks; same seed → same trial sequence.
- **Batched proposals for Ray parallelism**: the reference notes its search
  "is serial, but can be made semi-parallel with batch search"
  (model.py:763) — ``suggest(n)`` returns the top-n EI candidates per round
  and ``tune_pairwise_model`` evaluates each batch as concurrent Ray tasks
  over a ``ray.put``-broadcast feature matrix (put once, never re-shipped).

Search-space spec (mirrors the hyperopt primitives the reference uses,
model.py:791-801): ``("uniform", lo, hi)``, ``("loguniform", lo, hi)``
(bounds in log-space, like ``hp.loguniform``), ``("quniform", lo, hi, q)``,
``("qloguniform", lo, hi, q)``, ``("choice", [options...])``.
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-12


def _spec_kind(spec) -> str:
    return spec[0]


class TPESearch:
    """Minimizes a loss over a search space; the caller owns evaluation.

    Usage::

        tpe = TPESearch(space, seed=17)
        for _ in range(rounds):
            batch = tpe.suggest(4)
            for params, loss in zip(batch, evaluate(batch)):
                tpe.observe(params, loss)
        tpe.best_params
    """

    def __init__(self, space: dict, seed: int = 17, gamma: float = 0.25,
                 n_startup: int = 5, n_ei_candidates: int = 24):
        for k, spec in space.items():
            kind = _spec_kind(spec)
            if kind not in ("uniform", "loguniform", "quniform",
                            "qloguniform", "choice"):
                raise ValueError(f"unknown spec {spec!r} for {k!r}")
        self.space = dict(space)
        self.rng = np.random.default_rng(seed)
        self.gamma = gamma
        self.n_startup = n_startup
        self.n_ei = n_ei_candidates
        self.trials: list[tuple[dict, float]] = []

    # --- public API -------------------------------------------------------
    def suggest(self, n: int = 1) -> list[dict]:
        out = []
        for _ in range(n):
            if len(self.trials) < self.n_startup:
                out.append(self._sample_prior())
            else:
                out.append(self._sample_tpe())
        return out

    def observe(self, params: dict, loss: float) -> None:
        self.trials.append((dict(params), float(loss)))

    @property
    def best_params(self) -> dict:
        if not self.trials:
            raise RuntimeError("no trials observed")
        return min(self.trials, key=lambda t: t[1])[0]

    @property
    def best_loss(self) -> float:
        return min(t[1] for t in self.trials)

    def trials_frame(self):
        import pandas as pd
        rows = [{**p, "loss": l} for p, l in self.trials]
        return pd.DataFrame(rows)

    # --- sampling ---------------------------------------------------------
    def _sample_prior(self) -> dict:
        params = {}
        for k, spec in self.space.items():
            kind = _spec_kind(spec)
            if kind == "choice":
                params[k] = spec[1][int(self.rng.integers(len(spec[1])))]
            else:
                lo, hi = spec[1], spec[2]
                v = float(self.rng.uniform(lo, hi))
                params[k] = self._decode(spec, v)
        return params

    def _sample_tpe(self) -> dict:
        losses = np.array([l for _, l in self.trials])
        # γ-quantile split: ceil(γ·n) best trials form the "good" set l(x)
        n_good = max(1, int(np.ceil(self.gamma * len(losses))))
        order = np.argsort(losses, kind="mergesort")
        good_idx = set(order[:n_good].tolist())
        good = [self.trials[i][0] for i in range(len(self.trials))
                if i in good_idx]
        bad = [self.trials[i][0] for i in range(len(self.trials))
               if i not in good_idx]
        best_params, best_ei = None, -np.inf
        for _ in range(self.n_ei):
            cand, log_l, log_g = {}, 0.0, 0.0
            for k, spec in self.space.items():
                v, ll, lg = self._propose_param(spec, [p[k] for p in good],
                                                [p[k] for p in bad])
                cand[k] = v
                log_l += ll
                log_g += lg
            ei = log_l - log_g
            if ei > best_ei:
                best_params, best_ei = cand, ei
        return best_params

    def _propose_param(self, spec, good_vals, bad_vals):
        kind = _spec_kind(spec)
        if kind == "choice":
            options = spec[1]
            pg = self._cat_probs(options, good_vals)
            pb = self._cat_probs(options, bad_vals)
            i = int(self.rng.choice(len(options), p=pg))
            return options[i], float(np.log(pg[i])), float(np.log(pb[i]))
        lo, hi = spec[1], spec[2]
        g_enc = np.array([self._encode(spec, v) for v in good_vals])
        b_enc = np.array([self._encode(spec, v) for v in bad_vals])
        x = self._parzen_sample(lo, hi, g_enc)
        ll = self._parzen_logpdf(lo, hi, g_enc, x)
        lg = self._parzen_logpdf(lo, hi, b_enc, x)
        return self._decode(spec, x), ll, lg

    # --- adaptive Parzen over [lo, hi] -------------------------------------
    # mixture of the uniform prior and one clipped Gaussian per observation;
    # bandwidth = max gap to the neighboring observations (hyperopt's
    # adaptive-parzen heuristic), clipped to [1%, 100%] of the range
    def _bandwidths(self, lo, hi, obs):
        if len(obs) == 0:
            return obs
        pts = np.sort(obs)
        ext = np.concatenate([[lo], pts, [hi]])
        gaps = np.maximum(ext[1:-1] - ext[:-2], ext[2:] - ext[1:-1])
        bw = np.empty_like(obs)
        bw[np.argsort(obs, kind="mergesort")] = gaps
        return np.clip(bw, (hi - lo) * 0.01, (hi - lo))

    def _parzen_sample(self, lo, hi, obs) -> float:
        k = len(obs)
        # component 0 = prior; 1..k = observation Gaussians, equal weights
        c = int(self.rng.integers(k + 1))
        if c == 0:
            return float(self.rng.uniform(lo, hi))
        bw = self._bandwidths(lo, hi, obs)
        for _ in range(32):  # seeded rejection for the truncation
            v = float(self.rng.normal(obs[c - 1], bw[c - 1]))
            if lo <= v <= hi:
                return v
        return float(np.clip(v, lo, hi))

    def _parzen_logpdf(self, lo, hi, obs, x) -> float:
        p = 1.0 / (hi - lo)  # prior
        if len(obs):
            bw = self._bandwidths(lo, hi, obs)
            z = (x - obs) / bw
            comp = np.exp(-0.5 * z * z) / (np.sqrt(2 * np.pi) * bw)
            p = (p + comp.sum()) / (len(obs) + 1)
        return float(np.log(p + _EPS))

    def _cat_probs(self, options, vals):
        counts = np.ones(len(options))  # +1 prior smoothing
        index = {self._opt_key(o): i for i, o in enumerate(options)}
        for v in vals:
            counts[index[self._opt_key(v)]] += 1
        return counts / counts.sum()

    @staticmethod
    def _opt_key(o):
        return o if not isinstance(o, (list, np.ndarray)) else tuple(o)

    # --- encode/decode between search space and model space -----------------
    @staticmethod
    def _encode(spec, v) -> float:
        kind = _spec_kind(spec)
        if kind in ("loguniform", "qloguniform"):
            return float(np.log(max(v, _EPS)))
        return float(v)

    @staticmethod
    def _decode(spec, x) -> float:
        kind = _spec_kind(spec)
        lo, hi = spec[1], spec[2]
        x = float(np.clip(x, lo, hi))
        if kind == "uniform":
            return x
        if kind == "loguniform":
            return float(np.exp(x))
        if kind == "quniform":
            q = spec[3]
            return float(np.clip(np.round(x / q) * q, lo, hi))
        if kind == "qloguniform":
            q = spec[3]
            return float(max(q, np.round(np.exp(x) / q) * q))
        raise AssertionError(kind)


# --- reference PairwiseModeler.fit analog ----------------------------------

DEFAULT_SPACE = {
    # linear-scorer analogs of the reference's LightGBM space
    # (/root/reference/s2and/model.py:791-801): regularization strength ~
    # reg_lambda loguniform(-16, 2); learning_rate loguniform(-7, 0) with a
    # floor that keeps full-batch GD convergent; iteration budget ~
    # n_estimators quniform
    "l2": ("loguniform", -16.0, 2.0),
    "lr": ("loguniform", -3.0, 0.5),
    "n_iter": ("quniform", 100.0, 500.0, 50.0),
}


def tune_pairwise_model(X_train, y_train, X_val, y_val, space=None,
                        n_iter: int = 16, batch: int = 4, seed: int = 17,
                        monotone=None, gamma: float = 0.25):
    """TPE-tuned :class:`~.model.LogisticScorer` — the reference
    ``PairwiseModeler.fit`` loop (/root/reference/s2and/model.py:819-871):
    minimize −AUROC(val) over the space, then REFIT the winner on train
    only ("so as not to leak anything").

    Trials run as Ray tasks, ``batch`` at a time, over a ``ray.put``-once
    broadcast of the four matrices (the task closure carries ObjectRefs, so
    a 100k×d feature matrix is shipped to plasma exactly once regardless of
    ``n_iter``).  Must be called with Ray already initialised (library code
    never owns the session).  Returns ``(model, tpe)``; the trial history is
    ``tpe.trials_frame()``.
    """
    import ray

    from .model import LogisticScorer, auroc

    space = DEFAULT_SPACE if space is None else space
    tpe = TPESearch(space, seed=seed, gamma=gamma)
    refs = [ray.put(np.ascontiguousarray(a, dtype=np.float64))
            for a in (X_train, y_train, X_val, y_val)]

    @ray.remote(num_cpus=1)
    def _trial(params, Xtr, ytr, Xv, yv):
        m = LogisticScorer(l2=float(params["l2"]), lr=float(params["lr"]),
                           n_iter=int(params["n_iter"]), monotone=monotone)
        m.fit(Xtr, ytr)
        a = auroc(yv, m.predict_proba(Xv))
        return -(a if np.isfinite(a) else 0.0)

    done = 0
    while done < n_iter:
        props = tpe.suggest(min(batch, n_iter - done))
        losses = ray.get([_trial.remote(p, *refs) for p in props])
        for p, l in zip(props, losses):
            tpe.observe(p, l)
        done += len(props)

    best = tpe.best_params
    model = LogisticScorer(l2=float(best["l2"]), lr=float(best["lr"]),
                           n_iter=int(best["n_iter"]), monotone=monotone)
    model.fit(np.asarray(X_train, np.float64), np.asarray(y_train, np.float64))
    return model, tpe
