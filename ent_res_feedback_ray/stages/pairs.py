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
    oversize_mode: str = "window",
) -> pd.DataFrame:
    """Upper-triangle pairs for one block, canonical ``id1 < id2``.

    ``oversize_mode`` picks the budget policy for blocks whose full pair
    count exceeds ``max_pairs_per_block``:

    - ``"window"`` (default, inference): sorted-neighborhood windowing —
      every record keeps candidates, near-dups sort adjacently;
    - ``"sample"`` (training): the reference's TRANSITIVITY-PRESERVING
      subsample (/root/reference/s2and/data.py:1486-1701) — draw k records
      (k·(k−1)/2 ≤ budget) with a seeded, partition-invariant hash order
      and emit ALL pairs among them, so sampled positive pairs stay
      transitively consistent (the property the pairwise trainer needs;
      windowing breaks it)."""
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
    elif oversize_mode == "sample":
        # k records whose complete graph fits the budget
        k = max(2, int((1 + np.sqrt(1 + 8 * max_pairs_per_block)) // 2))
        k = min(k, n)
        # seeded, partition-invariant order: hash of (block, id) — the same
        # records are drawn no matter how rows were partitioned upstream
        from ..functions.hashing import fnv1a64

        blk = group[block_col].iloc[0]
        hs = fnv1a64([f"tps|{blk}|{v}" for v in group[id_col]])
        take = np.sort(np.argsort(hs, kind="stable")[:k])
        iu_k, ju_k = np.triu_indices(k, k=1)
        iu, ju = take[iu_k], take[ju_k]
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
    oversize_mode: str = "window",
) -> ray.data.Dataset:
    """Within-block pair generation — shuffle #1 (hash-bucketed).

    Singleton blocks are dropped vectorized (pandas size filter) before any
    per-group Python runs.  ``oversize_mode`` — see ``emit_block_pairs``:
    "window" for inference recall, "sample" for the reference's
    transitivity-preserving training subsample."""

    def _emit_bucket(part: pd.DataFrame) -> pd.DataFrame:
        return emit_bucket_pairs_vectorized(
            part, id_col=id_col, carry_cols=carry_cols, block_col=block_col,
            max_pairs_per_block=max_pairs_per_block, sort_col=sort_col,
            oversize_mode=oversize_mode)

    return bucketed_group_apply(ds, block_col, _emit_bucket, num_buckets)


def emit_bucket_pairs_vectorized(
    part: pd.DataFrame,
    id_col: str,
    carry_cols: list[str],
    block_col: str,
    max_pairs_per_block: int,
    sort_col: str | None = None,
    oversize_mode: str = "window",
) -> pd.DataFrame:
    """All small blocks of a bucket at once, no per-group Python.

    Groups are ordered deterministically, bucketed by SIZE CLASS, and each
    size class emits its pairs with one tiled ``triu_indices`` gather —
    a bucket with 100k two-doc bands costs a handful of numpy ops, not 100k
    pandas calls.  Oversized blocks (pairs_possible > cap) fall back to the
    per-group sorted-neighborhood windowing of ``emit_block_pairs``."""
    order_col = sort_col or id_col
    part = part.sort_values([block_col, order_col, id_col],
                            kind="mergesort").reset_index(drop=True)
    grp_codes, _ = pd.factorize(part[block_col], sort=False)
    sizes_per_row = np.bincount(grp_codes)[grp_codes]
    keep = sizes_per_row >= 2
    part = part[keep].reset_index(drop=True)
    if len(part) == 0:
        return emit_block_pairs(
            part, id_col=id_col, carry_cols=carry_cols, block_col=block_col,
            max_pairs_per_block=max_pairs_per_block, sort_col=sort_col)
    grp_codes = grp_codes[keep]
    # re-factorize to dense codes in row order (groups are contiguous)
    change = np.empty(len(part), dtype=bool)
    change[0] = True
    np.not_equal(grp_codes[1:], grp_codes[:-1], out=change[1:])
    dense = np.cumsum(change) - 1
    offsets = np.nonzero(change)[0]
    sizes = np.diff(np.append(offsets, len(part)))
    possible = sizes * (sizes - 1) // 2

    ids = part[id_col].to_numpy()
    carries = {c: part[c].to_numpy() for c in carry_cols}
    blocks = part[block_col].to_numpy()

    i_parts: list[np.ndarray] = []
    j_parts: list[np.ndarray] = []
    poss_parts: list[np.ndarray] = []
    small = possible <= max_pairs_per_block
    for s in np.unique(sizes[small]):
        g_off = offsets[small & (sizes == s)]
        iu, ju = np.triu_indices(s, k=1)
        i_parts.append((g_off[:, None] + iu[None, :]).ravel())
        j_parts.append((g_off[:, None] + ju[None, :]).ravel())
        poss_parts.append(np.repeat(np.int64(s * (s - 1) // 2),
                                    len(g_off) * len(iu)))
    big_frames: list[pd.DataFrame] = []
    for g in np.nonzero(~small)[0]:
        lo = offsets[g]
        hi = lo + sizes[g]
        big_frames.append(emit_block_pairs(
            part.iloc[lo:hi], id_col=id_col, carry_cols=carry_cols,
            block_col=block_col, max_pairs_per_block=max_pairs_per_block,
            sort_col=sort_col, oversize_mode=oversize_mode))

    if i_parts:
        iu = np.concatenate(i_parts)
        ju = np.concatenate(j_parts)
        a, b = ids[iu], ids[ju]
        swap = a > b
        i1 = np.where(swap, ju, iu)
        i2 = np.where(swap, iu, ju)
        data = {
            block_col: blocks[iu],
            "id1": ids[i1],
            "id2": ids[i2],
        }
        for c in carry_cols:
            data[f"{c}1"] = carries[c][i1]
            data[f"{c}2"] = carries[c][i2]
        data["pairs_possible"] = np.concatenate(poss_parts)
        small_frame = pd.DataFrame(data)
    else:
        small_frame = emit_block_pairs(
            part.iloc[0:0], id_col=id_col, carry_cols=carry_cols,
            block_col=block_col, max_pairs_per_block=max_pairs_per_block,
            sort_col=sort_col)
    if big_frames:
        return pd.concat([small_frame, *big_frames], ignore_index=True)
    return small_frame


def exclude_pairs_stage(ds: ray.data.Dataset, exclude_df,
                        id1: str = "id1", id2: str = "id2") -> ray.data.Dataset:
    """Drop pairs present in a bounded exclusion store (reference
    ``delete_training_data`` — inference must not re-score pairs the model
    trained on, /root/reference/s2and/featurizer.py:683-692).  The store is
    broadcast once (``ray.put``); each batch anti-filters with a vectorized
    merge — row order preserved, no shuffle."""
    import ray as _ray

    from .shuffleops import _broadcast_get

    keys = (exclude_df[[id1, id2]].drop_duplicates().assign(__x=1)
            if exclude_df is not None and len(exclude_df) else None)
    ref = _ray.put(keys)

    def _anti(df: pd.DataFrame) -> pd.DataFrame:
        ex = _broadcast_get(ref)
        if ex is None:
            return df
        m = df[[id1, id2]].merge(ex, on=[id1, id2], how="left")
        return df[m["__x"].isna().to_numpy()]

    return ds.map_batches(_anti, batch_format="pandas")


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
        # int64 ROUTING key (mixed, not unique): two distinct pairs sharing a
        # key merely share a bucket — dedup inside the bucket is exact on
        # (id1, id2).  ~3× fewer shuffle bytes than the old "id1|id2" string
        # key, and no per-row string building.
        df = df.copy()
        a = df["id1"].to_numpy(np.int64).astype(np.uint64)
        b = df["id2"].to_numpy(np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            k = (a * np.uint64(0x9E3779B97F4A7C15)) ^ b
        df["__pair"] = (k >> np.uint64(1)).astype(np.int64)
        return df

    keyed = ds.map_batches(_with_key, batch_format="pandas")
    out = bucketed_group_apply(keyed, "__pair", _distinct, num_buckets)
    return out.drop_columns(["__pair"])
