"""Feedback / active-learning rounds: checkpointed score → cluster → select
→ reveal → retrain loops.

Reference analog: the ECC ``simulate`` loop (predict → compare with gold →
synthesize constraint → re-solve, /root/reference/ecc/ecc.py:787-900) and
warm-start retraining (/root/reference/e2e_scripts/train.py:262-269), re-
expressed per the north rule as *checkpointed rounds that select uncertain
pairs globally and retrain the pairwise scorer between rounds*:

round R:
  1. score all candidate pairs with the round-(R−1) scorer (actor pool)
  2. cluster (transitive closure) → assignments checkpoint
  3. metrics vs gold (pairwise F1, B³) → metrics checkpoint
  4. select the globally most-uncertain k pairs (sort |p−0.5| → limit k)
  5. reveal their gold labels; append to the accumulated label store
  6. retrain the scorer on all revealed labels (driver-side fit — the label
     store is bounded by k × rounds)
  7. write round checkpoint (labels, model, counters) with _SUCCESS

Resume: rounds whose checkpoint has _SUCCESS are skipped; the label store
and model reload from the last complete round (north-rule resumability).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import ray.data

from ..eval.metrics import cluster_metrics_dataset
from ..stages.features import FEATURE_COLS
from ..state.checkpoint import is_complete, mark_success, stage_dir, write_checkpoint
from ..state.model import LogisticScorer, auroc, average_precision
from .er import resolve_pages


def _assign_quality(assignments: ray.data.Dataset, gold: pd.DataFrame) -> dict:
    """Clustering quality vs gold — the per-mention join/aggregate runs
    DISTRIBUTED (eval.metrics.cells_dataset); assignments never hit the
    driver."""
    pred = assignments.map_batches(
        lambda df: pd.DataFrame({"id": df["node"], "pred": df["label"]}),
        batch_format="pandas")
    g = ray.data.from_pandas(
        gold.rename(columns={"doc_id": "id", "gold_entity_id": "gold"})
        [["id", "gold"]].reset_index(drop=True))
    return cluster_metrics_dataset(pred, g)


def _diff_cells(assignments: ray.data.Dataset, gold: pd.DataFrame) -> pd.DataFrame:
    """(pred, gold, n_cell, rep) contingency cells of the gold/pred cluster
    diff — computed DISTRIBUTED (hash join + bucketed aggregate); only the
    |cells| rows reach the driver.  Shared by the pairwise-seed and the
    exists-constraint synthesizers."""
    from ..stages.shuffleops import bucketed_aggregate

    pred = assignments.map_batches(
        lambda df: pd.DataFrame({"id": df["node"], "pred": df["label"]}),
        batch_format="pandas")
    g = ray.data.from_pandas(
        gold.rename(columns={"doc_id": "__gid", "gold_entity_id": "gold"})
        [["__gid", "gold"]].reset_index(drop=True))
    j = pred.join(g, "inner", num_partitions=8, on=("id",), right_on=("__gid",))

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["pred", "gold"], as_index=False).agg(
            n_cell=("id", "size"), rep=("id", "min"))

    return bucketed_aggregate(
        j.map_batches(_partial, batch_format="pandas"), ["pred", "gold"],
        n_cell=("n_cell", "sum"), rep=("rep", "min")).to_pandas()


def synthesize_constraint_seeds(assignments: ray.data.Dataset,
                                gold: pd.DataFrame,
                                max_each: int = 5) -> dict:
    """ECC-style constraint synthesis from the gold/pred cluster DIFF
    (reference picks an exists-constraint from the diff between predicted
    and gold clusterings, /root/reference/ecc/ecc.py:615-866; re-expressed
    per the north rule as pairwise require/disallow seeds — the true
    existential type lives in state/ecc.py):

    - a gold cluster split across predicted clusters → a REQUIRE seed
      between the two largest fragments' representative docs;
    - a predicted cluster merging several gold clusters → a DISALLOW seed
      between the two largest merged groups' representatives."""
    cells = _diff_cells(assignments, gold)

    seeds: dict = {}
    # splits → require
    for gold_id, grp in sorted(
            cells.groupby("gold"), key=lambda kv: (-len(kv[1]), kv[0])):
        if len(seeds) >= max_each or len(grp) < 2:
            break
        top = grp.sort_values(["n_cell", "rep"], ascending=[False, True]).head(2)
        a, b = sorted(int(x) for x in top["rep"])
        seeds[(a, b)] = "require"
    n_req = len(seeds)
    # merges → disallow
    for pred_id, grp in sorted(
            cells.groupby("pred"), key=lambda kv: (-len(kv[1]), str(kv[0]))):
        if len(seeds) >= n_req + max_each or len(grp) < 2:
            break
        top = grp.sort_values(["n_cell", "rep"], ascending=[False, True]).head(2)
        a, b = sorted(int(x) for x in top["rep"])
        if (a, b) not in seeds:
            seeds[(a, b)] = "disallow"
    return seeds


def _load_scorer(model_path: str, scorer_cls):
    """Resume-safe model load: a round checkpoint written with one scorer
    class must not be fed to another's loader (LogisticScorer npz has
    'w'/'b'/'nan_fill'; MLPScorer has 'W1'/'b1'/'W2'/'b2'/'mu'/'sd';
    NeuMissScorer additionally has the Neumann block 'Wn') — probe the npz
    keys and dispatch to the matching class, warning when it differs from
    the requested ``scorer_cls`` (round-3 ADVICE)."""
    from ..state.mlp import MLPScorer, NeuMissScorer

    with np.load(model_path) as data:
        keys = set(data.files)
    if "w" in keys:
        cls = LogisticScorer
    elif "Wn" in keys:
        cls = NeuMissScorer
    elif "W1" in keys:
        cls = MLPScorer
    else:
        raise ValueError(
            f"unrecognized scorer checkpoint at {model_path}: keys {sorted(keys)}")
    if cls is not scorer_cls:
        print(f"FEEDBACK resume: checkpoint at {model_path} was written by "
              f"{cls.__name__}; requested {scorer_cls.__name__} — loading "
              f"with {cls.__name__} (delete the round dirs to retrain)",
              flush=True)
    return cls.load(model_path)


def run_feedback_rounds(
    pages_path: str,
    gold_path: str,
    out_dir: str,
    n_rounds: int = 3,
    k_per_round: int = 200,
    threshold: float = 0.5,
    seed: int = 17,
    resolve_kwargs: dict | None = None,
    constraints_per_round: int = 0,
    exists_per_round: int = 0,
    tune_threshold_on_val: bool = False,
    scorer_cls: type | None = None,
) -> list[dict]:
    """Run (or resume) the feedback loop; returns per-round metric dicts.

    ``gold_path`` parquet: (url, gold_entity_id) — read only for metric
    computation and label revelation, never visible to the pipeline.

    ``scorer_cls``: pairwise scorer class to retrain each round —
    ``LogisticScorer`` (default) or ``state.mlp.MLPScorer``.  With the MLP
    this loop is the graft's analog of the reference e2e train loop
    (/root/reference/e2e_scripts/train.py:32-425): alternating
    MLP-score → cluster → reveal → retrain.  The backprop-through-SDP step
    itself lives in ``train_e2e_on_blocks`` below (straight-through
    gradients, state/e2e_train.py)."""
    os.makedirs(out_dir, exist_ok=True)
    # inputs may be single parquet files OR checkpoint directories (written
    # by write_checkpoint, which adds a _SUCCESS marker the readers must skip)
    pages = ray.data.read_parquet(pages_path, file_extensions=["parquet"])
    if os.path.isdir(gold_path):
        import glob as _glob

        gold_urls = pd.concat(
            [pd.read_parquet(p) for p in sorted(
                _glob.glob(os.path.join(gold_path, "*.parquet")))],
            ignore_index=True)
    else:
        gold_urls = pd.read_parquet(gold_path)

    resolve_kwargs = dict(resolve_kwargs or {})

    # map gold to doc ids (same stable hash as add_doc_ids)
    from ..functions.hashing import blake2b64

    gold_urls["doc_id"] = [blake2b64(u) >> 1 for u in gold_urls["url"]]
    gold = gold_urls[["doc_id", "gold_entity_id"]]
    gold_lookup = dict(zip(gold["doc_id"], gold["gold_entity_id"]))

    scorer_cls = scorer_cls or LogisticScorer
    model = None
    labels = pd.DataFrame(columns=["id1", "id2", "label", *FEATURE_COLS])
    seeds: dict = {}
    exists_constraints: list = []
    history: list[dict] = []

    for rnd in range(n_rounds):
        rdir = stage_dir(out_dir, rnd, "round")
        label_path = os.path.join(rdir, "labels.parquet")
        model_path = os.path.join(rdir, "model.npz")
        metrics_path = os.path.join(rdir, "metrics.json")
        seeds_path = os.path.join(rdir, "seeds.json")
        exists_path = os.path.join(rdir, "exists.json")
        if is_complete(rdir):
            # resume: reload accumulated labels + model + seeds, skip round
            labels = pd.read_parquet(label_path)
            if os.path.exists(model_path):
                model = _load_scorer(model_path, scorer_cls)
            if os.path.exists(seeds_path):
                with open(seeds_path) as f:
                    seeds = {(int(a), int(b)): v
                             for a, b, v in json.load(f)}
            if os.path.exists(exists_path):
                from ..state.ecc import constraints_from_json

                with open(exists_path) as f:
                    exists_constraints = constraints_from_json(json.load(f))
            with open(metrics_path) as f:
                history.append(json.load(f))
            continue

        result = resolve_pages(pages, model=model, threshold=threshold,
                               seeds=seeds or None, **resolve_kwargs)
        scored = result["scored"]
        assignments = result["assignments"]
        tuned_th = None
        if tune_threshold_on_val:
            # reference Clusterer.fit: tune the cut on HELD-OUT val docs
            # (hash carve, 20%), then re-cluster everything at the tuned
            # threshold.  Scoring ran once; trials re-threshold cached pairs.
            from ..stages.clustering import transitive_clustering
            from ..stages.sampling import md5_mod, pair_sample_stage
            from ..state.tuning import tune_score_threshold

            val_ids = gold["doc_id"].to_numpy(np.int64)
            val_ids = val_ids[md5_mod(
                [f"{v}|{seed}" for v in val_ids]) >= 800_000]
            val_set = set(val_ids.tolist())

            def _val_pairs(df: pd.DataFrame) -> pd.DataFrame:
                keep = (df["id1"].isin(val_set)
                        & df["id2"].isin(val_set)).to_numpy()
                return df[keep]

            vp = scored.map_batches(_val_pairs, batch_format="pandas")
            # bound the driver pull (tuner input) deterministically
            n_vp = vp.count()
            if n_vp > 100_000:
                vp = pair_sample_stage(vp, 100_000 / n_vp, seed=seed)
            vp_pd = vp.to_pandas()
            gold_val = gold[gold["doc_id"].isin(val_set)].rename(
                columns={"doc_id": "id", "gold_entity_id": "gold"})
            if len(vp_pd) and gold_val["gold"].nunique() > 1:
                tuned_th, _ = tune_score_threshold(
                    vp_pd, gold_val[["id", "gold"]], val_ids)
                assignments = transitive_clustering(
                    scored,
                    all_ids=result["id_map"].map_batches(
                        lambda df: pd.DataFrame({"node": df["doc_id"]}),
                        batch_format="pandas"),
                    threshold=tuned_th)

        # checkpoints: assignments + lineage counters (per-partition parquet)
        write_checkpoint(assignments, stage_dir(out_dir, rnd, "assignments"))
        write_checkpoint(result["counters"], stage_dir(out_dir, rnd, "counters"))

        metrics = _assign_quality(assignments, gold)
        metrics["round"] = rnd
        metrics["n_labels"] = int(len(labels))
        metrics["n_seeds"] = int(len(seeds))
        if tuned_th is not None:
            metrics["tuned_threshold"] = float(tuned_th)

        # ECC-style constraint synthesis: seeds from this round's gold/pred
        # cluster diff apply from the NEXT round on
        if constraints_per_round:
            seeds.update(synthesize_constraint_seeds(
                assignments, gold, max_each=constraints_per_round))

        # existential constraints (reference ECC's namesake type): check the
        # carried list against THIS round's clustering, compile violations
        # to require seeds for the next round, then synthesize new ones
        if exists_per_round or exists_constraints:
            from ..state.ecc import (
                compile_to_seeds,
                doc_features,
                find_violations,
                synthesize_exists_constraints,
            )
            from .er import add_doc_ids

            feats = doc_features(add_doc_ids(pages)).materialize()
            violated = find_violations(assignments, feats,
                                       exists_constraints)
            metrics["n_exists"] = len(exists_constraints)
            metrics["n_exists_violated"] = len(violated)
            seeds.update(compile_to_seeds(scored, assignments, feats,
                                          violated))
            if exists_per_round:
                known = set(exists_constraints)
                for c in synthesize_exists_constraints(
                        assignments, gold, feats, max_new=exists_per_round):
                    if c not in known:
                        exists_constraints.append(c)
                        known.add(c)

        # 4. global top-k uncertain pairs (exclude already-labeled)
        scored_pd_cols = ["id1", "id2", "score", *FEATURE_COLS]

        def _unc(df: pd.DataFrame) -> pd.DataFrame:
            df = df[scored_pd_cols].copy()
            df["uncertainty"] = (df["score"] - 0.5).abs()
            return df

        unc = scored.map_batches(_unc, batch_format="pandas")
        # already-labeled pairs are excluded IN the dataflow (reference
        # delete_training_data, featurizer.py:683-692) before the global sort
        from ..stages.pairs import exclude_pairs_stage

        unc = exclude_pairs_stage(unc, labels[["id1", "id2"]]
                                  if len(labels) else None)
        if k_per_round > 0:
            from ..stages.shuffleops import bottom_k

            topk = bottom_k(unc, ["uncertainty", "id1", "id2"],
                            2 * k_per_round).to_pandas()
            # candidate pairs may repeat across LSH bands (dedup-free path)
            topk = topk.drop_duplicates(subset=["id1", "id2"], keep="first")
            topk = topk.head(k_per_round)
        else:
            # constraint-only rounds (k=0): no label revelation this round
            topk = pd.DataFrame(columns=scored_pd_cols)

        # 5. reveal gold labels
        revealed = topk.copy()
        revealed["label"] = [
            float(gold_lookup.get(a) == gold_lookup.get(b))
            for a, b in zip(revealed["id1"], revealed["id2"])
        ]
        labels = pd.concat(
            [labels, revealed[["id1", "id2", "label", *FEATURE_COLS]]],
            ignore_index=True)

        # 6. retrain scorer on the TRAIN carve of the accumulated labels
        # (deterministic hash split on the pair key — the val carve is held
        # out so val_auroc measures generalization, not memorization;
        # reference fixed-split analog /root/reference/s2and/data.py:1042-1138)
        from ..stages.sampling import md5_mod

        h = md5_mod([f"{a}|{b}|{seed}" for a, b in
                     zip(labels["id1"], labels["id2"])])
        is_train = h < 800_000  # 80/20 train/val
        tr, va = labels[is_train], labels[~is_train]
        if tr["label"].nunique() > 1:
            X = tr[FEATURE_COLS].to_numpy(dtype=np.float64)
            y = tr["label"].to_numpy(dtype=np.float64)
            model = scorer_cls(seed=seed).fit(X, y)
            if len(va) and va["label"].nunique() > 1:
                Xv = va[FEATURE_COLS].to_numpy(np.float64)
                nf = getattr(model, "nan_fill", None)
                if nf is not None:
                    Xv = np.nan_to_num(Xv, nan=nf)
                vy = va["label"].to_numpy(np.float64)
                vp = model.predict_proba(Xv)
                metrics["val_auroc"] = float(auroc(vy, vp))
                metrics["val_ap"] = float(average_precision(vy, vp))

        # 7. round checkpoint
        os.makedirs(rdir, exist_ok=True)
        labels.to_parquet(label_path, index=False)
        with open(seeds_path, "w") as f:
            json.dump([[a, b, v] for (a, b), v in sorted(seeds.items())], f)
        if exists_constraints:
            from ..state.ecc import constraints_to_json

            with open(exists_path, "w") as f:
                json.dump(constraints_to_json(exists_constraints), f)
        if model is not None:
            model.save(model_path)
        with open(metrics_path, "w") as f:
            json.dump(metrics, f)
        mark_success(rdir, {"round": rnd, "n_labels": int(len(labels))})
        history.append(metrics)

    return history


def train_e2e_on_blocks(
    pages_path: str,
    gold_path: str,
    scorer_cls: type | None = None,
    n_blocks: int = 16,
    max_block_docs: int = 12,
    n_epochs: int = 25,
    lr: float = 0.05,
    threshold: float = 0.5,
    seed: int = 17,
    parallel: bool = True,
) -> dict:
    """Reference e2e train loop with real data plumbing
    (/root/reference/e2e_scripts/train.py:32-425): blocked + featurized
    pairs become fully-labeled per-block training instances, and the
    scorer trains straight-through the SDP + HAC-cut rounding
    (state/e2e_train.py — identity backward through rounding and the SDP
    argmax, replacing torch/cvxpylayers).

    Bounded by construction: ≤ ``n_blocks`` blocks of 3..``max_block_docs``
    docs each — the reference's own train-time block subsample
    (/root/reference/wandb_configs/sweeps/e2e.json:11-12, 80 train / 100
    dev blocks) — so the driver pull is O(n_blocks · max_block_docs²)
    labeled pairs, never the corpus.  Per-epoch per-block gradients fan
    out as Ray tasks when ``parallel``.

    Returns {"scorer", "loss_history", "pair_f1_before", "pair_f1_after",
    "n_blocks", "n_pairs"}.
    """
    from ..stages.blocking import key_blocking_stage
    from ..stages.features import featurize_stage
    from ..stages.normalize import normalize_stage
    from ..stages.pairs import pairs_from_blocks
    from ..stages.shuffleops import bucketed_aggregate
    from ..state.e2e_train import TrainBlock, pairwise_f1, train_e2e
    from ..state.mlp import MLPScorer
    from .er import add_doc_ids

    pages = ray.data.read_parquet(pages_path, file_extensions=["parquet"])
    blk = key_blocking_stage(normalize_stage(add_doc_ids(pages)))

    # trainable block keys: 3..max docs, deterministic subsample of
    # n_blocks by block_key order (bounded driver pull: n_blocks keys)
    sizes = bucketed_aggregate(
        blk.select_columns(["doc_id", "block_key"]), "block_key",
        n_docs=("doc_id", "size"))

    def _trainable(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["n_docs"].between(3, max_block_docs)]

    from ..stages.shuffleops import bottom_k

    chosen = bottom_k(sizes.map_batches(_trainable, batch_format="pandas"),
                      ["block_key"], n_blocks).to_pandas()
    keys = set(chosen["block_key"])
    key_ref = ray.put(keys)

    def _keep(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.shuffleops import _broadcast_get

        return df[df["block_key"].isin(_broadcast_get(key_ref))]

    sub = blk.map_batches(_keep, batch_format="pandas")
    pairs = pairs_from_blocks(
        sub.select_columns(
            ["doc_id", "block_key", "norm_text", "lang", "warc_ts"]),
        block_col="block_key", id_col="doc_id",
        carry_cols=["norm_text", "lang", "warc_ts"])
    feats = featurize_stage(pairs).to_pandas()  # bounded: ≤ n_blocks·C(max,2)

    # gold entity per doc id (labels are bounded by contract — the
    # reference trains on ≤100k labeled pairs)
    from ..functions.hashing import blake2b64

    gold_urls = pd.read_parquet(gold_path)
    gold_urls["doc_id"] = [blake2b64(u) >> 1 for u in gold_urls["url"]]
    gold_of = dict(zip(gold_urls["doc_id"], gold_urls["gold_entity_id"]))

    blocks: list[TrainBlock] = []
    n_pairs = 0
    for _, part in feats.groupby("block_key", sort=True):
        ids = np.sort(pd.unique(part[["id1", "id2"]].to_numpy().ravel()))
        if len(ids) < 3 or any(int(i) not in gold_of for i in ids):
            continue
        pos = {int(v): j for j, v in enumerate(ids)}
        n = len(ids)
        iu, ju = np.triu_indices(n, k=1)
        fmat = np.full((len(iu), len(FEATURE_COLS)), np.nan)
        row_of = {(pos[int(a)], pos[int(b)]): r
                  for r, (a, b) in enumerate(zip(part["id1"], part["id2"]))}
        fvals = part[FEATURE_COLS].to_numpy(np.float64)
        for r, (a, b) in enumerate(zip(iu, ju)):
            src = row_of.get((int(a), int(b))) or row_of.get((int(b), int(a)))
            if src is not None:
                fmat[r] = fvals[src]
        ent = np.asarray([gold_of[int(i)] for i in ids])
        gold = (ent[iu] == ent[ju]).astype(np.float64)
        blocks.append(TrainBlock(feats=fmat, n_docs=n, gold=gold))
        n_pairs += len(iu)

    scorer = (scorer_cls or MLPScorer)(seed=seed)
    scorer.ensure_init(np.concatenate([b.feats for b in blocks], axis=0))
    f1_before = pairwise_f1(scorer, blocks, threshold)
    hist = train_e2e(scorer, blocks, n_epochs=n_epochs, lr=lr,
                     threshold=threshold, parallel=parallel)
    return {
        "scorer": scorer,
        "loss_history": hist,
        "pair_f1_before": f1_before,
        "pair_f1_after": pairwise_f1(scorer, blocks, threshold),
        "n_blocks": len(blocks),
        "n_pairs": n_pairs,
    }
