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


def salted_window_pairs(
    ds: ray.data.Dataset,
    block_col: str,
    id_col: str,
    carry_cols: list[str],
    max_pairs_per_block: int = 100_000,
    sort_col: str | None = None,
    salt_threshold_rows: int = 200_000,
    chunk_rows: int = 100_000,
    num_buckets: int = 32,
    sample_per_chunk: int = 32,
    seed: int = 41,
    max_salted_blocks: int = 100_000,
) -> ray.data.Dataset:
    """EXPLICIT SALTING of oversized blocks (the north-star skew mechanism;
    SURVEY §7 "explicit salting of oversized blocks"): identical pair set to
    ``pairs_from_blocks(oversize_mode="window")``, but a mega-host block is
    emitted by MANY parallel tasks instead of one straggler holding every
    row of the block.

    Construction (exactness argument):

    1. blocks with ≥ ``salt_threshold_rows`` rows AND over the pair budget
       take the salted path; everything else goes through the normal
       bucketed emission unchanged;
    2. per salted block, sort-order chunk BOUNDARIES are estimated from a
       seeded hash sample (boundaries only control balance — ANY boundary
       set yields the exact pair set, because chunks are contiguous key
       ranges of the same (sort_col, id) order the unsalted path sorts by);
    3. provisional chunks are counted EXACTLY (one small aggregate) and
       greedily merged so every chunk except a block's last holds ≥ w rows
       (w = budget // n, the window width) — this bounds how far a window
       can reach: partners of a row in chunk k lie in chunk k or k+1;
    4. every row ships to its own chunk and the preceding one (≤ 2×
       movement of the salted rows only); each (block, chunk) group sorts
       locally, its OWN rows form a prefix, and each own row pairs with the
       next w rows — the union over chunks is exactly the global
       sorted-neighborhood emission, disjointly partitioned.

    Driver state: per-salted-block sizes + boundary samples + chunk-size
    table — all O(#salted blocks + #chunks), loudly capped at
    ``max_salted_blocks``, never O(rows)."""
    from ..functions.hashing import fnv1a64
    from .shuffleops import _broadcast_get, bucketed_aggregate

    order_col = sort_col or id_col
    budget = max_pairs_per_block

    sizes = bucketed_aggregate(
        ds.select_columns([id_col, block_col]), block_col,
        n=(id_col, "size"), num_buckets=num_buckets)

    def _oversized(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64)
        return df[(n >= salt_threshold_rows) & (n * (n - 1) // 2 > budget)]

    big = sizes.map_batches(_oversized, batch_format="pandas").to_pandas()
    if len(big) > max_salted_blocks:
        raise ValueError(
            f"salted_window_pairs: {len(big)} oversized blocks exceeds the "
            f"driver-state cap {max_salted_blocks}; raise the cap or "
            f"salt_threshold_rows")
    if big.empty:
        return pairs_from_blocks(
            ds, block_col, id_col, carry_cols, budget, sort_col,
            num_buckets, oversize_mode="window")

    n_of = dict(zip(big[block_col], big["n"].astype(int)))
    w_of = {b: max(1, budget // n) for b, n in n_of.items()}
    big_ref = ray.put((set(n_of), n_of, w_of))

    def _split(keep_big: bool):
        def _f(df: pd.DataFrame) -> pd.DataFrame:
            bigset, _, _ = _broadcast_get(big_ref)
            m = df[block_col].isin(bigset)
            return df[m] if keep_big else df[~m]
        return _f

    normal_pairs = pairs_from_blocks(
        ds.map_batches(_split(False), batch_format="pandas"),
        block_col, id_col, carry_cols, budget, sort_col,
        num_buckets, oversize_mode="window")

    bigds = ds.map_batches(_split(True), batch_format="pandas")

    # --- 2. boundary sample (seeded, partition-invariant) ------------------
    rate_of = {b: min(1.0, sample_per_chunk * max(1, -(-n // chunk_rows))
                      / max(n, 1))
               for b, n in n_of.items()}
    rate_ref = ray.put(rate_of)

    def _sample(df: pd.DataFrame) -> pd.DataFrame:
        rates = _broadcast_get(rate_ref)
        u = fnv1a64([f"saltsmp|{seed}|{v}" for v in df[id_col]])
        r = df[block_col].map(rates).to_numpy(np.float64)
        keep = (u.astype(np.float64) / 2.0 ** 64) < r
        cols = list(dict.fromkeys([block_col, order_col, id_col]))
        return df.loc[keep, cols]

    smp = bigds.map_batches(_sample, batch_format="pandas").to_pandas()

    bounds: dict = {}
    for b, part in smp.groupby(block_col, sort=False):
        part = part.sort_values([order_col, id_col], kind="mergesort")
        nchunks = max(1, -(-n_of[b] // chunk_rows))
        if nchunks > 1 and len(part) > nchunks:
            idx = (np.arange(1, nchunks)
                   * (len(part) // nchunks)).astype(np.int64)
            bounds[b] = (part[order_col].to_numpy()[idx],
                         part[id_col].to_numpy()[idx])
    bounds_ref = ray.put(bounds)

    def _chunk_ids(bvals, bids, vals, ids) -> np.ndarray:
        """#boundaries ≤ (val, id), vectorized with a tiny equal-run scan."""
        lo = np.searchsorted(bvals, vals, side="left")
        hi = np.searchsorted(bvals, vals, side="right")
        out = lo.astype(np.int64)
        eq = np.nonzero(hi > lo)[0]
        for i in eq:
            out[i] = lo[i] + int(np.searchsorted(
                bids[lo[i]:hi[i]], ids[i], side="right"))
        return out

    def _assign(df: pd.DataFrame) -> pd.DataFrame:
        bmap = _broadcast_get(bounds_ref)
        df = df.copy()
        chunk = np.zeros(len(df), dtype=np.int64)
        for b, gidx in df.groupby(block_col, sort=False).indices.items():
            bv = bmap.get(b)
            if bv is not None:
                chunk[gidx] = _chunk_ids(
                    bv[0], bv[1], df[order_col].to_numpy()[gidx],
                    df[id_col].to_numpy()[gidx])
        df["__prov"] = chunk
        return df

    assigned = bigds.map_batches(_assign, batch_format="pandas").materialize()

    # --- 3. exact chunk sizes → greedy merge so interior chunks hold ≥ w ---
    csz = bucketed_aggregate(
        assigned.select_columns([block_col, "__prov", id_col]),
        [block_col, "__prov"], m=(id_col, "size"),
        num_buckets=num_buckets).to_pandas()
    remap: dict = {}
    for b, part in csz.groupby(block_col, sort=False):
        part = part.sort_values("__prov")
        w = w_of[b]
        final, acc = 0, 0
        for prov, m in zip(part["__prov"], part["m"]):
            remap[(b, int(prov))] = final
            acc += int(m)
            if acc >= w:
                final, acc = final + 1, 0
        # a trailing under-w run stays merged into the last closed chunk
    remap_ref = ray.put(remap)

    # --- 4. ship rows to own chunk + preceding chunk ------------------------
    def _ship(df: pd.DataFrame) -> pd.DataFrame:
        rm = _broadcast_get(remap_ref)
        df = df.copy()
        own = np.asarray([rm.get((b, int(p)), 0) for b, p in
                          zip(df[block_col], df["__prov"])], dtype=np.int64)
        df["__own"] = own
        df = df.drop(columns=["__prov"])
        prev = df[own > 0].copy()
        prev["__grp"] = prev["__own"].to_numpy() - 1
        df["__grp"] = own
        return pd.concat([df, prev], ignore_index=True)

    shipped = assigned.map_batches(_ship, batch_format="pandas")

    # --- 5. per-(block, chunk) core-prefix window emission ------------------
    def _emit(part: pd.DataFrame) -> pd.DataFrame:
        _, nmap, wmap = _broadcast_get(big_ref)
        frames = []
        for (b, grp), g in part.groupby([block_col, "__grp"], sort=False):
            g = g.sort_values([order_col, id_col],
                              kind="mergesort").reset_index(drop=True)
            m = int((g["__own"].to_numpy() == grp).sum())
            if m == 0:
                continue
            w = wmap[b]
            L = len(g)
            iu_l, ju_l = [], []
            for d in range(1, w + 1):
                top = min(m, L - d)
                if top <= 0:
                    break
                idx = np.arange(0, top)
                iu_l.append(idx)
                ju_l.append(idx + d)
            if not iu_l:
                continue
            iu = np.concatenate(iu_l)
            ju = np.concatenate(ju_l)
            ids = g[id_col].to_numpy()
            a, bb = ids[iu], ids[ju]
            swap = a > bb
            i1 = np.where(swap, ju, iu)
            i2 = np.where(swap, iu, ju)
            n_b = nmap[b]
            data = {
                block_col: np.repeat(b, len(iu)),
                "id1": ids[i1],
                "id2": ids[i2],
            }
            for c in carry_cols:
                vals = g[c].to_numpy()
                data[f"{c}1"] = vals[i1]
                data[f"{c}2"] = vals[i2]
            data["pairs_possible"] = np.repeat(
                np.int64(n_b * (n_b - 1) // 2), len(iu))
            frames.append(pd.DataFrame(data))
        if not frames:
            cols = {
                block_col: np.empty(0, dtype=part[block_col].dtype),
                "id1": np.empty(0, dtype=part[id_col].dtype),
                "id2": np.empty(0, dtype=part[id_col].dtype),
            }
            for c in carry_cols:
                cols[f"{c}1"] = np.empty(0, dtype=part[c].dtype)
                cols[f"{c}2"] = np.empty(0, dtype=part[c].dtype)
            cols["pairs_possible"] = np.empty(0, dtype=np.int64)
            return pd.DataFrame(cols)
        return pd.concat(frames, ignore_index=True)

    salted = bucketed_group_apply(
        shipped, [block_col, "__grp"], _emit, num_buckets)
    return normal_pairs.union(salted)
