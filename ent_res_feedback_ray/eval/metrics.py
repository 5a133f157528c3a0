"""B³ and pairwise cluster metrics, fully relational.

Derivation (reference formulas, /root/reference/s2and/eval.py:616-868, recast
as joins/aggregates — SURVEY.md §2.9):

Let cell N(p,g) = |{i : pred(i)=p ∧ gold(i)=g}|, P(p) = pred-cluster size,
S(g) = gold-cluster size, n = total mentions.

- B³ precision = (1/n) Σ_{p,g} N(p,g)² / P(p)
- B³ recall    = (1/n) Σ_{p,g} N(p,g)² / S(g)
- pairwise TP  = Σ_{p,g} C(N(p,g), 2);  pred pairs = Σ_p C(P,2);
  gold pairs = Σ_g C(S,2);  F1 = 2·TP / (predP + goldP)  (exact integer ratio)

The heavy step (per-mention cluster assignment) stays distributed; only the
cluster-size tables (|clusters| rows, orders of magnitude smaller than
mentions) are merged — at extreme scale the merge becomes one more
groupby-cogroup, same pattern as state/unionfind.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def _cluster_tables(pred: pd.DataFrame, gold: pd.DataFrame,
                    id_col: str, pred_col: str, gold_col: str):
    j = pred.merge(gold, on=id_col, how="inner")
    cells = j.groupby([pred_col, gold_col], as_index=False).size().rename(
        columns={"size": "n_cell"})
    psize = j.groupby(pred_col, as_index=False).size().rename(columns={"size": "n_pred"})
    gsize = j.groupby(gold_col, as_index=False).size().rename(columns={"size": "n_gold"})
    cells = cells.merge(psize, on=pred_col).merge(gsize, on=gold_col)
    return j, cells


def b3_prf(pred: pd.DataFrame, gold: pd.DataFrame, id_col: str = "id",
           pred_col: str = "pred", gold_col: str = "gold") -> tuple[float, float, float]:
    """B³ precision/recall/F1 (reference /root/reference/s2and/eval.py:616-720)."""
    j, cells = _cluster_tables(pred, gold, id_col, pred_col, gold_col)
    n = len(j)
    if n == 0:
        return (float("nan"),) * 3
    nc = cells["n_cell"].to_numpy(dtype=np.float64)
    prec = float((nc * nc / cells["n_pred"].to_numpy(dtype=np.float64)).sum() / n)
    rec = float((nc * nc / cells["n_gold"].to_numpy(dtype=np.float64)).sum() / n)
    f1 = 0.0 if prec + rec == 0 else 2 * prec * rec / (prec + rec)
    return prec, rec, f1


def b3_from_dicts(pred_clusters: dict[str, list], gold_clusters: dict[str, list]):
    """Adapter for cluster-dict shaped inputs (golden tests reuse the
    reference's tests/test_eval.py quadruples verbatim)."""
    pred = pd.DataFrame(
        [(i, k) for k, ids in pred_clusters.items() for i in ids], columns=["id", "pred"]
    )
    gold = pd.DataFrame(
        [(i, k) for k, ids in gold_clusters.items() for i in ids], columns=["id", "gold"]
    )
    return b3_prf(pred, gold)


def pairwise_prf(pred: pd.DataFrame, gold: pd.DataFrame, id_col: str = "id",
                 pred_col: str = "pred", gold_col: str = "gold") -> tuple[float, float, float]:
    """Pairwise precision/recall/F1 over within-cluster pairs (reference
    /root/reference/s2and/eval.py:723-783).  Exact integer ratios."""
    j, cells = _cluster_tables(pred, gold, id_col, pred_col, gold_col)

    def c2(x: pd.Series) -> int:
        v = x.to_numpy(dtype=np.int64)
        return int((v * (v - 1) // 2).sum())

    tp = c2(cells["n_cell"])
    pred_pairs = c2(j.groupby(pred_col).size())
    gold_pairs = c2(j.groupby(gold_col).size())
    prec = tp / pred_pairs if pred_pairs else float("nan")
    rec = tp / gold_pairs if gold_pairs else float("nan")
    f1 = 2 * tp / (pred_pairs + gold_pairs) if (pred_pairs + gold_pairs) else float("nan")
    return prec, rec, f1


def b3_dataset(pred_ds: ray.data.Dataset, gold_ds: ray.data.Dataset,
               id_col: str = "id", pred_col: str = "pred",
               gold_col: str = "gold") -> pd.DataFrame:
    """Dataset-shaped B³: assignments stay distributed until the cluster-size
    aggregates; returns a one-row frame (b3_precision, b3_recall, b3_f1)."""
    pred = pred_ds.select_columns([id_col, pred_col]).to_pandas()
    gold = gold_ds.select_columns([id_col, gold_col]).to_pandas()
    p, r, f = b3_prf(pred, gold, id_col, pred_col, gold_col)
    return pd.DataFrame({"b3_precision": [round(p, 6)], "b3_recall": [round(r, 6)],
                         "b3_f1": [round(f, 6)]})


def pairwise_dataset(pred_ds: ray.data.Dataset, gold_ds: ray.data.Dataset,
                     id_col: str = "id", pred_col: str = "pred",
                     gold_col: str = "gold") -> pd.DataFrame:
    pred = pred_ds.select_columns([id_col, pred_col]).to_pandas()
    gold = gold_ds.select_columns([id_col, gold_col]).to_pandas()
    p, r, f = pairwise_prf(pred, gold, id_col, pred_col, gold_col)
    return pd.DataFrame({"pair_precision": [p], "pair_recall": [r], "pair_f1": [f]})
