"""Per-pair feature attributions for the pairwise scorer — the reference's
SHAP diagnostics re-expressed as a dataflow stage.

Reference analog: ``pairwise_eval`` computes per-sample SHAP values of the
(Tree-based) pairwise classifier and renders summary plots
(/root/reference/s2and/eval.py:430-607, ``shap.TreeExplainer``).  The shap
package and plotting are absent here, and the scorers are linear / MLP /
NeuMiss rather than trees, so the from-scratch analog uses the two public
exact constructions that fit them:

- ``linear_shap_values``: for the logistic scorer, Shapley values of a
  linear model under feature independence are analytic —
  φ_j = w_j · (x_j − E[x_j]) (Lundberg & Lee 2017, "Linear SHAP") — in
  DECISION (log-odds) space, where additivity is exact.
- ``sampling_shap_values``: for any duck-typed scorer, seeded
  permutation-sampling Shapley (Štrumbelj & Kononenko 2014): for each
  sampled permutation + background row, the sum of marginal contributions
  telescopes to f(x) − f(background), so additivity is exact for the
  estimate too (pinned in tests).

The distributed shape is ``explain_stage``: attributions computed inside
``map_batches`` with the model broadcast once (``ray.put``), emitting one
``shap_<feature>`` column per feature; ``feature_importance`` reduces them
to the global mean-|φ| ranking (the content of the reference's summary bar
plot, minus the figure).  NaN features attribute through the scorers' own
missingness encoding — the attribution is on the model's actual input
semantics, not an imputed stand-in.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def _decision(scorer, X: np.ndarray) -> np.ndarray:
    return scorer.decision(np.asarray(X, dtype=np.float64))


def linear_shap_values(scorer, X: np.ndarray,
                       background_mu: np.ndarray) -> np.ndarray:
    """Exact Shapley values of a linear decision function:
    φ_ij = w_j (x_ij − μ_j), NaN imputed by the scorer's own fill."""
    X = np.asarray(X, dtype=np.float64)
    Xf = np.nan_to_num(X, nan=scorer.nan_fill)
    mu = np.nan_to_num(np.asarray(background_mu, np.float64),
                       nan=scorer.nan_fill)
    return scorer.w[None, :] * (Xf - mu[None, :])


def sampling_shap_values(scorer, X: np.ndarray, background: np.ndarray,
                         n_samples: int = 32, seed: int = 17) -> np.ndarray:
    """Seeded permutation-sampling Shapley values in decision space.

    Each of ``n_samples`` draws pairs a feature permutation with one
    background row; marginal contributions along the permutation telescope
    to f(x) − f(b), so the per-row attribution sum equals the mean of
    f(x) − f(b) over draws EXACTLY (additivity pin).  Cost:
    n_samples × (d+1) scorer calls on n-row matrices — vectorized over
    rows, so suitable for bounded explain batches."""
    X = np.asarray(X, dtype=np.float64)
    background = np.atleast_2d(np.asarray(background, dtype=np.float64))
    n, d = X.shape
    rng = np.random.default_rng(seed)
    phi = np.zeros((n, d))
    for _ in range(n_samples):
        order = rng.permutation(d)
        b = background[rng.integers(len(background))]
        cur = np.tile(b, (n, 1))
        prev = _decision(scorer, cur)
        for j in order:
            cur[:, j] = X[:, j]
            nxt = _decision(scorer, cur)
            phi[:, j] += nxt - prev
            prev = nxt
    return phi / n_samples


def explain_stage(pairs: ray.data.Dataset, scorer, feature_cols: list[str],
                  background: np.ndarray, n_samples: int = 16,
                  seed: int = 17) -> ray.data.Dataset:
    """Distributed attribution: adds one ``shap_<col>`` column per feature
    (decision-space Shapley values).  The scorer + background ship once via
    ``ray.put``; each batch is one vectorized sampling pass (or the
    analytic path for the linear scorer)."""
    from ..stages.shuffleops import _broadcast_get

    ref = ray.put((scorer, np.asarray(background, dtype=np.float64)))
    linear = hasattr(scorer, "w") and scorer.w is not None

    def _explain(df: pd.DataFrame) -> pd.DataFrame:
        sc, bg = _broadcast_get(ref)
        X = df[feature_cols].to_numpy(np.float64)
        if linear:
            phi = linear_shap_values(sc, X, bg.mean(axis=0))
        else:
            phi = sampling_shap_values(sc, X, bg, n_samples=n_samples,
                                       seed=seed)
        out = df.copy()
        for j, c in enumerate(feature_cols):
            out[f"shap_{c}"] = phi[:, j]
        return out

    return pairs.map_batches(_explain, batch_format="pandas")


def feature_importance(explained: ray.data.Dataset,
                       feature_cols: list[str]) -> pd.DataFrame:
    """Global mean-|φ| ranking (the reference's SHAP summary bar plot as a
    table).  Distributed: per-batch partial |φ| sums, one small reduce."""
    cols = [f"shap_{c}" for c in feature_cols]

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "feature": feature_cols,
            "abs_sum": [float(df[c].abs().sum()) for c in cols],
            "n": len(df),
        })

    parts = explained.map_batches(_partial, batch_format="pandas").to_pandas()
    agg = parts.groupby("feature", as_index=False).agg(
        abs_sum=("abs_sum", "sum"), n=("n", "sum"))
    agg["mean_abs_shap"] = agg["abs_sum"] / agg["n"].clip(lower=1)
    return (agg[["feature", "mean_abs_shap"]]
            .sort_values(["mean_abs_shap", "feature"],
                         ascending=[False, True])
            .reset_index(drop=True))
