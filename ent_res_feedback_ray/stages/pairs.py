"""Candidate-pair generation from blocks (the O(n²) step, made explicit).

Reference analog: ``pair_sampling`` — exhaustive within-block upper-triangle
enumeration with canonical (i<j) order (/root/reference/s2and/data.py:1346-1484)
and the transitivity-preserving subsample (data.py:1486-1701).

Scale design (replaces the reference's drop>500/subsample-to-80 guards,
/root/reference/scripts/make_s2and_mini_dataset.py:25-26):
- each block group emits at most ``max_pairs_per_block`` pairs;
- oversized blocks switch to *sorted-neighborhood windowing*: rows are sorted
  by a deterministic key and only pairs within a window ``w`` are emitted
  (w chosen so the pair budget holds) — candidates stay local, recall is
  preserved for near-duplicates (which sort adjacently), and no block is
  silently dropped;
- what was capped is logged in the per-block lineage counters
  (``pairs_possible`` vs ``pairs_generated``), satisfying the north rule's
  "log what was dropped".

Pairs carry both sides' featurizer inputs inline (the group already holds the
rows), avoiding a post-shuffle join — the reference instead shared a forked
corpus dict (/root/reference/s2and/featurizer.py:582-583), which does not
distribute.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def emit_block_pairs(
    group: pd.DataFrame,
    id_col: str,
    carry_cols: list[str],
    block_col: str,
    max_pairs_per_block: int,
    sort_col: str | None = None,
) -> pd.DataFrame:
    """Upper-triangle pairs for one block, canonical ``id1 < id2``."""
    n = len(group)
    if n < 2:
        empty: dict = {
            block_col: np.empty(0, dtype=group[block_col].dtype if n else object)
        }
        id_dtype = group[id_col].dtype if n else np.int64
        empty["id1"] = np.empty(0, dtype=id_dtype)
        empty["id2"] = np.empty(0, dtype=id_dtype)
        for c in carry_cols:
            c_dtype = group[c].dtype if n else object
            empty[f"{c}1"] = np.empty(0, dtype=c_dtype)
            empty[f"{c}2"] = np.empty(0, dtype=c_dtype)
        empty["pairs_possible"] = np.empty(0, dtype=np.int64)
        return pd.DataFrame(empty)
    # deterministic order regardless of partitioning
    order_col = sort_col or id_col
    group = group.sort_values([order_col, id_col], kind="mergesort").reset_index(drop=True)
    possible = n * (n - 1) // 2
    if possible <= max_pairs_per_block:
        iu, ju = np.triu_indices(n, k=1)
    else:
        # sorted-neighborhood window: pick w so ~n*w <= budget (w >= 1)
        w = max(1, max_pairs_per_block // n)
        iu_l, ju_l = [], []
        for d in range(1, w + 1):
            idx = np.arange(0, n - d)
            iu_l.append(idx)
            ju_l.append(idx + d)
        iu = np.concatenate(iu_l)
        ju = np.concatenate(ju_l)
    ids = group[id_col].to_numpy()
    a, b = ids[iu], ids[ju]
    swap = a > b
    i1 = np.where(swap, ju, iu)
    i2 = np.where(swap, iu, ju)
    data = {
        block_col: np.repeat(group[block_col].iloc[0], len(iu)),
        "id1": ids[i1],
        "id2": ids[i2],
    }
    for c in carry_cols:
        vals = group[c].to_numpy()
        data[f"{c}1"] = vals[i1]
        data[f"{c}2"] = vals[i2]
    data["pairs_possible"] = np.repeat(np.int64(possible), len(iu))
    return pd.DataFrame(data)


from .shuffleops import bucketed_group_apply  # noqa: E402  (re-export)


def pairs_from_blocks(
    ds: ray.data.Dataset,
    block_col: str,
    id_col: str,
    carry_cols: list[str],
    max_pairs_per_block: int = 100_000,
    sort_col: str | None = None,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Within-block pair generation — shuffle #1 (hash-bucketed).

    Singleton blocks are dropped vectorized (pandas size filter) before any
    per-group Python runs."""

    def _emit_bucket(part: pd.DataFrame) -> pd.DataFrame:
        sizes = part.groupby(block_col)[id_col].transform("size")
        part = part[sizes >= 2]
        if len(part) == 0:
            return emit_block_pairs(
                part, id_col=id_col, carry_cols=carry_cols, block_col=block_col,
                max_pairs_per_block=max_pairs_per_block, sort_col=sort_col)
        outs = [
            emit_block_pairs(
                g, id_col=id_col, carry_cols=carry_cols, block_col=block_col,
                max_pairs_per_block=max_pairs_per_block, sort_col=sort_col)
            for _, g in part.groupby(block_col, sort=True)
        ]
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_apply(ds, block_col, _emit_bucket, num_buckets)


def dedup_pairs(ds: ray.data.Dataset, num_buckets: int = 32) -> ray.data.Dataset:
    """Keep one row per canonical (id1, id2) — needed when several blocking
    families (key blocks + LSH bands) propose the same pair.  Hash-partition
    dedup; within a bucket the distinct is pandas ``drop_duplicates`` (C),
    with block_key-sorted order so the winner is deterministic."""

    def _distinct(part: pd.DataFrame) -> pd.DataFrame:
        order_cols = [c for c in ("block_key",) if c in part.columns]
        part = part.sort_values(["id1", "id2", *order_cols], kind="mergesort")
        return part.drop_duplicates(subset=["id1", "id2"], keep="first")

    def _with_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__pair"] = df["id1"].astype("string") + "|" + df["id2"].astype("string")
        return df

    keyed = ds.map_batches(_with_key, batch_format="pandas")
    out = bucketed_group_apply(keyed, "__pair", _distinct, num_buckets)
    return out.drop_columns(["__pair"])
