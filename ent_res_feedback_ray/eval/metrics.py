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


def cells_dataset(pred_ds: ray.data.Dataset, gold_ds: ray.data.Dataset,
                  id_col: str = "id", pred_col: str = "pred",
                  gold_col: str = "gold",
                  facet_cols: list[str] | None = None,
                  num_partitions: int = 16) -> pd.DataFrame:
    """DISTRIBUTED contingency cells: inner-join pred⋈gold per mention (hash
    join — the per-mention tables never reach the driver), then per-batch
    partial cell counts + one bucketed grouped sum.  Only the |cells| table
    (bounded by #clusters, orders of magnitude below #mentions) is collected.
    ``facet_cols`` (columns on the pred side) key the cells additionally —
    the facet_eval path."""
    from ..stages.shuffleops import bucketed_aggregate

    facet_cols = facet_cols or []
    left = pred_ds.select_columns([id_col, pred_col, *facet_cols])
    right = gold_ds.select_columns([id_col, gold_col]).map_batches(
        lambda df: df.rename(columns={id_col: "__gold_id"}),
        batch_format="pandas")
    j = left.join(right, "inner", num_partitions=num_partitions,
                  on=(id_col,), right_on=("__gold_id",))
    keys = [*facet_cols, pred_col, gold_col]

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False).size().rename(
            columns={"size": "n_cell"})

    partials = j.map_batches(_partial, batch_format="pandas")
    cells = bucketed_aggregate(partials, keys, n_cell=("n_cell", "sum"))
    return cells.to_pandas()


def _prf_from_cells(cells: pd.DataFrame, pred_col: str = "pred",
                    gold_col: str = "gold") -> dict:
    """Both metric families from the cell table alone (every mention is in
    exactly one (pred, gold) cell, so sizes are cell marginals)."""
    n = int(cells["n_cell"].sum())
    if n == 0:
        return {k: float("nan") for k in (
            "b3_precision", "b3_recall", "b3_f1",
            "pair_precision", "pair_recall", "pair_f1")}
    psize = cells.groupby(pred_col)["n_cell"].transform("sum").to_numpy(np.float64)
    gsize = cells.groupby(gold_col)["n_cell"].transform("sum").to_numpy(np.float64)
    nc = cells["n_cell"].to_numpy(np.float64)
    prec = float((nc * nc / psize).sum() / n)
    rec = float((nc * nc / gsize).sum() / n)
    bf = 0.0 if prec + rec == 0 else 2 * prec * rec / (prec + rec)

    def c2(v: np.ndarray) -> int:
        v = v.astype(np.int64)
        return int((v * (v - 1) // 2).sum())

    tp = c2(nc)
    pred_pairs = c2(cells.groupby(pred_col)["n_cell"].sum().to_numpy())
    gold_pairs = c2(cells.groupby(gold_col)["n_cell"].sum().to_numpy())
    pp = tp / pred_pairs if pred_pairs else float("nan")
    pr = tp / gold_pairs if gold_pairs else float("nan")
    pf = (2 * tp / (pred_pairs + gold_pairs)
          if (pred_pairs + gold_pairs) else float("nan"))
    # over/under-merge ratios (reference b3_precision_recall_fscore's
    # pred_bigger_ratios / true_bigger_ratios, /root/reference/s2and/
    # eval.py:683-692): per MENTION, |pred|/|gold| when pred ≥ gold else
    # |gold|/|pred| — mention-weighted means from the cell table
    over = psize >= gsize
    w_over = nc[over].sum()
    w_under = nc[~over].sum()
    over_mean = (float((nc[over] * psize[over] / gsize[over]).sum() / w_over)
                 if w_over else float("nan"))
    under_mean = (float((nc[~over] * gsize[~over] / psize[~over]).sum()
                        / w_under) if w_under else float("nan"))
    return {"b3_precision": prec, "b3_recall": rec, "b3_f1": bf,
            "pair_precision": pp, "pair_recall": pr, "pair_f1": pf,
            "pred_bigger_ratio": over_mean, "pred_bigger_n": int(w_over),
            "true_bigger_ratio": under_mean, "true_bigger_n": int(w_under)}


def cluster_metrics_dataset(pred_ds: ray.data.Dataset,
                            gold_ds: ray.data.Dataset,
                            id_col: str = "id", pred_col: str = "pred",
                            gold_col: str = "gold") -> dict:
    """One distributed join+aggregate, both metric families out."""
    cells = cells_dataset(pred_ds, gold_ds, id_col, pred_col, gold_col)
    return _prf_from_cells(cells, pred_col, gold_col)


def b3_dataset(pred_ds: ray.data.Dataset, gold_ds: ray.data.Dataset,
               id_col: str = "id", pred_col: str = "pred",
               gold_col: str = "gold") -> pd.DataFrame:
    """Dataset-shaped B³ — distributed cells, |clusters|-sized driver merge."""
    m = cluster_metrics_dataset(pred_ds, gold_ds, id_col, pred_col, gold_col)
    return pd.DataFrame({"b3_precision": [round(m["b3_precision"], 6)],
                         "b3_recall": [round(m["b3_recall"], 6)],
                         "b3_f1": [round(m["b3_f1"], 6)]})


def pairwise_dataset(pred_ds: ray.data.Dataset, gold_ds: ray.data.Dataset,
                     id_col: str = "id", pred_col: str = "pred",
                     gold_col: str = "gold") -> pd.DataFrame:
    m = cluster_metrics_dataset(pred_ds, gold_ds, id_col, pred_col, gold_col)
    return pd.DataFrame({"pair_precision": [m["pair_precision"]],
                         "pair_recall": [m["pair_recall"]],
                         "pair_f1": [m["pair_f1"]]})


def facet_metrics_dataset(pred_ds: ray.data.Dataset,
                          gold_ds: ray.data.Dataset,
                          facet_col: str,
                          id_col: str = "id", pred_col: str = "pred",
                          gold_col: str = "gold") -> pd.DataFrame:
    """Per-facet B³/pairwise breakdown (reference ``facet_eval``,
    /root/reference/s2and/eval.py:196-427): ONE distributed cells pass keyed
    by the facet, metrics derived per facet value from the small cell table.
    Facet semantics: a cluster's members may span facets; within a facet we
    evaluate the induced sub-partition (cells restricted to the facet)."""
    cells = cells_dataset(pred_ds, gold_ds, id_col, pred_col, gold_col,
                          facet_cols=[facet_col])
    rows = []
    for v, grp in cells.groupby(facet_col, sort=True):
        m = _prf_from_cells(grp, pred_col, gold_col)
        rows.append({facet_col: v, "n_docs": int(grp["n_cell"].sum()),
                     "b3_precision": round(m["b3_precision"], 6),
                     "b3_recall": round(m["b3_recall"], 6),
                     "b3_f1": round(m["b3_f1"], 6)})
    return pd.DataFrame(rows)


def b3_skipset_dataset(pred_ds: ray.data.Dataset,
                       gold_ds: ray.data.Dataset,
                       id_col: str = "id", pred_col: str = "pred",
                       gold_col: str = "gold",
                       eval_col: str = "is_eval") -> dict:
    """Skip-set B³ — the reference's incremental-evaluation variant
    (/root/reference/s2and/eval.py:616-720 with ``skip_signatures``):
    per-mention precision/recall use the FULL cluster compositions, but the
    mean runs only over the non-skipped (eval) mentions.  In cell terms:
    Σ_cells n_eval·(n_cell/size) / Σ n_eval, with full-count marginals —
    one distributed join + aggregate carrying an eval indicator; 3-decimal
    rounding like the reference."""
    from ..stages.shuffleops import bucketed_aggregate

    left = pred_ds.select_columns([id_col, pred_col, eval_col])
    right = gold_ds.select_columns([id_col, gold_col]).map_batches(
        lambda df: df.rename(columns={id_col: "__gold_id"}),
        batch_format="pandas")
    j = left.join(right, "inner", num_partitions=16,
                  on=(id_col,), right_on=("__gold_id",))
    keys = [pred_col, gold_col]

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False).agg(
            n_cell=(eval_col, "size"), n_eval=(eval_col, "sum"))

    cells = bucketed_aggregate(
        j.map_batches(_partial, batch_format="pandas"), keys,
        n_cell=("n_cell", "sum"), n_eval=("n_eval", "sum")).to_pandas()
    n_eval = float(cells["n_eval"].sum())
    if n_eval == 0:
        return {"b3_precision": float("nan"), "b3_recall": float("nan"),
                "b3_f1": float("nan"), "n_eval": 0}
    psize = cells.groupby(pred_col)["n_cell"].transform("sum").to_numpy(np.float64)
    gsize = cells.groupby(gold_col)["n_cell"].transform("sum").to_numpy(np.float64)
    nc = cells["n_cell"].to_numpy(np.float64)
    ne = cells["n_eval"].to_numpy(np.float64)
    p = float((ne * nc / psize).sum() / n_eval)
    r = float((ne * nc / gsize).sum() / n_eval)
    f = 0.0 if p + r == 0 else 2 * p * r / (p + r)
    return {"b3_precision": round(p, 3), "b3_recall": round(r, 3),
            "b3_f1": round(f, 3), "n_eval": int(n_eval)}


def _pair_prf_singleton_fix(cells: pd.DataFrame, pred_col: str = "pred",
                            gold_col: str = "gold") -> tuple[float, float, float]:
    """Pairwise P/R/F1 with the Levin et al. singleton fix (reference
    ``cluster_precision_recall_fscore``,
    /root/reference/s2and/eval.py:723-783): a singleton cluster contributes
    a SELF-pair, counted as matched iff the doc is a singleton on both
    sides — all derivable from the cell table: pred/gold pair counts gain
    one per singleton cluster; matched pairs gain one per cell whose pred
    AND gold marginals are both 1."""
    psize = cells.groupby(pred_col)["n_cell"].transform("sum").to_numpy(np.int64)
    gsize = cells.groupby(gold_col)["n_cell"].transform("sum").to_numpy(np.int64)
    nc = cells["n_cell"].to_numpy(np.int64)

    def c2(v):
        return int((v * (v - 1) // 2).sum())

    pred_sizes = cells.groupby(pred_col)["n_cell"].sum().to_numpy(np.int64)
    gold_sizes = cells.groupby(gold_col)["n_cell"].sum().to_numpy(np.int64)
    sys_pairs = c2(pred_sizes) + int((pred_sizes == 1).sum())
    gold_pairs = c2(gold_sizes) + int((gold_sizes == 1).sum())
    tp = c2(nc) + int(((psize == 1) & (gsize == 1)).sum())
    p = tp / sys_pairs if sys_pairs else float("nan")
    r = tp / gold_pairs if gold_pairs else float("nan")
    f = 0.0 if (np.isnan(p) or np.isnan(r) or p + r == 0) \
        else 2 * p * r / (p + r)
    return p, r, f


def pairwise_cmacro_dataset(pred_ds: ray.data.Dataset,
                            gold_ds: ray.data.Dataset,
                            id_col: str = "id", pred_col: str = "pred",
                            gold_col: str = "gold",
                            block_col: str = "block") -> dict:
    """The reference's 'cmacro' strategy
    (/root/reference/s2and/eval.py:786-868): pairwise P/R/F1 with the
    singleton fix computed per BLOCK over the block-restricted
    sub-partition, then unweighted-averaged across blocks and rounded to 3
    decimals (the reference's rounding).  ``pred_ds`` carries the block
    column; one distributed cells pass keyed by block."""
    cells = cells_dataset(pred_ds, gold_ds, id_col, pred_col, gold_col,
                          facet_cols=[block_col])
    ps, rs, fs = [], [], []
    for _, grp in cells.groupby(block_col, sort=True):
        p, r, f = _pair_prf_singleton_fix(grp, pred_col, gold_col)
        ps.append(p)
        rs.append(r)
        fs.append(f)
    return {"pair_cmacro_precision": round(float(np.mean(ps)), 3),
            "pair_cmacro_recall": round(float(np.mean(rs)), 3),
            "pair_cmacro_f1": round(float(np.mean(fs)), 3)}


def facet_metrics_multi(pred_ds: ray.data.Dataset,
                        gold_ds: ray.data.Dataset,
                        facet_cols: list[str],
                        id_col: str = "id", pred_col: str = "pred",
                        gold_col: str = "gold") -> pd.DataFrame:
    """All facets in ONE distributed cells pass: the pred side melts to
    (id, pred, facet, facet_value) rows — 9× the rows, but one join + one
    bucketed aggregate instead of one full pipeline per facet (a driver
    correctness run paid ~9× the fixed shuffle latency; the per-facet
    numbers are identical to :func:`facet_metrics_dataset`)."""
    def _melt(df: pd.DataFrame) -> pd.DataFrame:
        frames = [pd.DataFrame({id_col: df[id_col], pred_col: df[pred_col],
                                "facet": f, "facet_value": df[f]})
                  for f in facet_cols]
        return pd.concat(frames, ignore_index=True)

    melted = pred_ds.map_batches(_melt, batch_format="pandas")
    cells = cells_dataset(melted, gold_ds, id_col, pred_col, gold_col,
                          facet_cols=["facet", "facet_value"])
    rows = []
    for f in facet_cols:
        sub = cells[cells["facet"] == f]
        for v, grp in sub.groupby("facet_value", sort=True):
            m = _prf_from_cells(grp, pred_col, gold_col)
            rows.append({
                "facet": f, "facet_value": v,
                "n_docs": int(grp["n_cell"].sum()),
                "b3_precision": round(m["b3_precision"], 6),
                "b3_recall": round(m["b3_recall"], 6),
                "b3_f1": round(m["b3_f1"], 6)})
    return pd.DataFrame(rows)


def min_pair_edit(claims: pd.DataFrame,
                  assign: dict[int, int] | pd.DataFrame) -> tuple[float, int, int]:
    """Greedy minimum cluster-edit repair of a claims set (reference
    ``min_pair_edit``, /root/reference/s2and/eval.py:1063-1160): how many
    single-record cluster moves fix every wrong claim pair?

    ``claims``: (id1, id2, gold_same: bool) — the bounded claims table.
    ``assign``: record → predicted cluster (dict or (doc_id, cluster) frame).

    Re-expression notes (from-scratch, deterministic where the reference
    iterates an unordered set):
    - offenders are visited by (wrong-pair count desc, id asc);
    - candidate flips are the offender's PARTNER clusters plus one fresh
      singleton cluster — any other cluster changes no claim pair, so the
      objective (−fp−fn, as in the reference) is identical to the singleton
      flip; this prunes the reference's all-clusters scan without changing
      any achievable objective value;
    - ties pick the smallest cluster label (singleton last).

    Returns (min_edit_score, min_edit_count, n_mistaken_ids) — score is
    steps normalized by max(n_mistaken_ids − 1, 1).  Driver-side by design:
    the claims table is bounded (sampled) and the repair is sequential.
    """
    if isinstance(assign, pd.DataFrame):
        cols = list(assign.columns)
        assign = dict(zip(assign[cols[0]].astype(int),
                          assign[cols[1]].astype(int)))
    else:
        assign = {int(k): int(v) for k, v in assign.items()}
    id1 = claims["id1"].astype(int).to_numpy()
    id2 = claims["id2"].astype(int).to_numpy()
    gold = claims["gold_same"].astype(bool).to_numpy()
    pairs = list(zip(id1.tolist(), id2.tolist(), gold.tolist()))

    def wrong_pairs():
        return [(a, b, g) for a, b, g in pairs
                if (assign[a] == assign[b]) != g]

    wrong = wrong_pairs()
    if not wrong:
        return 0.0, 0, 0

    def objective() -> int:
        bad = 0
        for a, b, g in pairs:
            if (assign[a] == assign[b]) != g:
                bad -= 1
        return bad

    # fresh labels for singleton flips: beyond every existing label
    next_fresh = max(assign.values(), default=0) + 1

    counts: dict[int, int] = {}
    for a, b, _ in wrong:
        counts[a] = counts.get(a, 0) + 1
        counts[b] = counts.get(b, 0) + 1
    worst_ids = sorted(counts, key=lambda i: (-counts[i], i))
    partners: dict[int, set] = {}
    for a, b, _ in pairs:
        partners.setdefault(a, set()).add(b)
        partners.setdefault(b, set()).add(a)

    steps = 0
    for wid in worst_ids:
        original = assign[wid]
        best = objective()
        cand = sorted({assign[p] for p in partners.get(wid, ())}
                      - {original})
        best_to = None
        for to in cand + [next_fresh]:
            assign[wid] = to
            cur = objective()
            if cur > best:
                best = cur
                best_to = to
        assign[wid] = best_to if best_to is not None else original
        if best_to is not None:
            steps += 1
            if best_to == next_fresh:
                next_fresh += 1
            if not wrong_pairs():
                break
    n_mistaken = len(worst_ids)
    return steps / max(n_mistaken - 1, 1), steps, n_mistaken
