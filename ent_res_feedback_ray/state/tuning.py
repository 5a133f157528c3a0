"""Threshold (eps) tuning — driver-side search over cached per-pair scores.

Reference analogs: ``Clusterer.fit`` (hyperopt TPE over eps maximizing B³ on
val blocks, /root/reference/s2and/model.py:335-432) and ``HACInference.
tune_threshold`` (quantized candidate cuts, best B³,
/root/reference/e2e_pipeline/hac_inference.py:59-104).  No hyperopt in this
environment → deterministic quantile-grid search (the reference's KMeans
quantization of candidate cuts, simplified): score quantiles give the
candidate thresholds, each trial is a cheap re-threshold + union-find over
the CACHED scored pairs — the expensive scoring runs once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..eval.metrics import b3_prf, pairwise_prf
from .unionfind import unionfind_labels


def tune_score_threshold(
    scored: pd.DataFrame,
    gold: pd.DataFrame,
    all_nodes: np.ndarray,
    n_candidates: int = 25,
    metric: str = "b3_f1",
    score_col: str = "score",
) -> tuple[float, pd.DataFrame]:
    """Pick the threshold maximizing the chosen metric on a validation set.

    ``scored``: pair rows (id1, id2, score[, constraint]).
    ``gold``: (node, gold) assignment.  Returns (best_threshold, trials_df).

    Deterministic: candidate grid = unique score quantiles; ties broken by
    the LOWER threshold (more links — reference keeps eps maximal... the tie
    rule just has to be fixed; documented here).
    """
    sp = scored
    if "constraint" in sp.columns:
        cons = sp["constraint"].to_numpy(dtype=np.float64)
        allowed = np.isnan(cons) | (cons == 0.0)
        forced = ~np.isnan(cons) & (cons == 0.0)
        sp = sp.assign(__forced=forced)[allowed]
    else:
        sp = sp.assign(__forced=False)
    scores = sp[score_col].to_numpy(dtype=np.float64)
    qs = np.linspace(0.0, 1.0, n_candidates)
    candidates = np.unique(np.round(np.quantile(scores, qs), 6)) if len(scores) \
        else np.array([0.5])
    gold_map = gold.rename(columns={gold.columns[0]: "id", gold.columns[1]: "gold"})

    rows = []
    best = (None, -np.inf)
    for th in candidates:
        keep = (scores >= th) | sp["__forced"].to_numpy()
        nodes, labels = unionfind_labels(
            sp["id1"].to_numpy(np.int64)[keep],
            sp["id2"].to_numpy(np.int64)[keep],
            all_nodes,
        )
        pred = pd.DataFrame({"id": nodes, "pred": labels})
        bp, br, bf = b3_prf(pred, gold_map)
        pp, pr, pf = pairwise_prf(pred, gold_map)
        # reference's second objective (metric_for_hyperopt="ratio",
        # /root/reference/s2and/model.py:357,409-412): MINIMIZE the mean
        # per-mention over/under-merge ratio — expressed here as maximizing
        # its negation so one comparison rule serves all metrics
        j = pred.merge(gold_map, on="id")
        psz = j.groupby("pred")["id"].transform("size").to_numpy(np.float64)
        gsz = j.groupby("gold")["id"].transform("size").to_numpy(np.float64)
        ratio = float(np.where(psz >= gsz, psz / gsz, gsz / psz).mean()) \
            if len(j) else float("nan")
        value = {"b3_f1": bf, "pair_f1": pf,
                 "ratio": -ratio if not np.isnan(ratio) else -np.inf}[metric]
        rows.append({"threshold": float(th), "b3_f1": bf, "pair_f1": pf,
                     "merge_ratio": ratio})
        if value > best[1]:
            best = (float(th), value)
    return best[0], pd.DataFrame(rows)
