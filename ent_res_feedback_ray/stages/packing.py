"""Training-data export primitives: deterministic global shuffle and
token-budget sequence packing.

At 100 TB the pretraining-export shuffle is a SORT BY HASH — one
range-partitioned all-to-all exchange the streaming executor pipelines and
spills — not an in-memory permutation.  Order is a pure function of the
row key (md5, like every sampler in stages/sampling.py), so any
partitioning, any cluster size, any retry yields the SAME permutation, and
DuckDB replays it exactly (``ORDER BY md5_number_lower(key || '|seed')``).
The reference shuffles positionally with a seeded ``np.random``
(/root/reference/s2and/sampling.py:13-115) — not reproducible under
re-partitioning; this is the distributed-deterministic re-expression.

Sequence packing concatenates documents into fixed-token-budget training
rows (GPT-style pretraining).  Greedy packing is inherently sequential, so
the corpus is sharded by key hash (the documented partitioning assumption:
packs never span shards — at 64+ shards the per-shard boundary waste is
noise) and each shard packs independently in shuffle order: deterministic,
partition-invariant, resumable per shard.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data

# one pack-id namespace per shard: pack_id = shard << 32 | pack_idx
_SHARD_SHIFT = 32


def md5_u64(keys: "list[str]") -> np.ndarray:
    """Full md5_number_lower (little-endian uint64 of md5 bytes 8:16) per
    key — DuckDB-identical, collision odds ~n²/2⁶⁴ (vs the samplers'
    %1e6, too coarse for a total ORDER)."""
    out = np.empty(len(keys), dtype=np.uint64)
    for i, k in enumerate(keys):
        out[i] = int.from_bytes(
            hashlib.md5(k.encode("utf-8")).digest()[8:16], "little")
    return out


def _shuffle_hash(ids: pd.Series, seed: int, method: str) -> np.ndarray:
    if method == "md5":
        return md5_u64([f"{v}|shuf{seed}" for v in ids])
    if method == "splitmix":
        from ..functions.hashing import splitmix64

        return splitmix64(ids.to_numpy(np.int64), seed=seed)
    raise ValueError(f"unknown shuffle hash method {method!r}")


def deterministic_shuffle(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    seed: int = 17,
    keep_hash: bool = False,
    method: str = "md5",
    cols: "list[str] | None" = None,
) -> ray.data.Dataset:
    """Global deterministic shuffle: order rows by
    ``md5_number_lower(id || '|shuf{seed}')`` with the id as tie-break.
    One Ray range-partitioned sort; no driver materialization.  SQL twin:
    ``ORDER BY md5_number_lower(CAST(id AS VARCHAR) || '|shuf{seed}'), id``
    (parity-tested in tests/test_packing.py).

    ``method="splitmix"`` swaps the per-row-Python md5 for the vectorized
    splitmix64 integer mix (functions/hashing.py) — same invariants
    (deterministic, partition/cluster/retry-invariant permutation), zero
    per-row Python; the 100-TB path when SQL replayability isn't needed."""

    def _hash(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["shuffle_hash"] = _shuffle_hash(df[id_col], seed, method)
        return df

    out = ds.map_batches(_hash, batch_format="pandas") \
        .sort(["shuffle_hash", id_col])
    if keep_hash:
        return out
    # ``cols`` lets a caller with a lazy lineage skip the .schema() probe
    # (which would execute the upstream plan for one row)
    drop = list(cols) if cols is not None else list(ds.schema().names)
    return out.select_columns(drop)


def whitespace_token_counts(text: pd.Series) -> np.ndarray:
    """Whitespace token count per doc (pandas C path; '' → 0) — the same
    convention as textstats n_tokens."""
    return text.str.split().str.len().fillna(0).to_numpy(np.int64)


def _greedy_pack(n_tokens: np.ndarray, budget: int) -> tuple[np.ndarray, np.ndarray]:
    """First-fit-in-order packing: (pack_idx, pack_pos) per doc.  A doc
    larger than the budget gets its own pack (zero-token docs consume no
    budget and may share it — hypothesis-pinned).  O(n) integer loop —
    runs inside a worker over ONE shard's rows; the sequential dependence
    is the definition of the operator, the parallelism lives across
    shards."""
    pack = np.empty(len(n_tokens), np.int64)
    pos = np.empty(len(n_tokens), np.int64)
    cur, running, at = 0, 0, 0
    for i, n in enumerate(n_tokens):
        if running > 0 and running + n > budget:
            cur += 1
            running, at = 0, 0
        pack[i] = cur
        pos[i] = at
        running += int(n)
        at += 1
    return pack, pos


def pack_sequences(
    ds: ray.data.Dataset,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 64,
    seed: int = 17,
    method: str = "md5",
) -> ray.data.Dataset:
    """Pack documents into fixed-token-budget training sequences:
    (id, shard, pack_id, pack_pos, n_tokens) — ``pack_id`` globally unique
    (shard << 32 | per-shard pack index), packs filled greedily in
    deterministic shuffle order within each hash shard.

    Invariants (property-tested): every pack's token total ≤ budget unless
    it is a single oversized doc; every doc lands in exactly one pack;
    pack_pos is the doc's 0-based position inside its pack; the output is
    identical under any input partitioning."""
    from .shuffleops import bucketed_group_apply

    if n_shards >= (1 << (63 - _SHARD_SHIFT)):
        raise ValueError(f"n_shards {n_shards} overflows the pack_id namespace")

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        h = _shuffle_hash(df[id_col], seed, method)
        return pd.DataFrame({
            id_col: df[id_col],
            "shard": (h % np.uint64(n_shards)).astype(np.int64),
            "__h": h,
            "n_tokens": whitespace_token_counts(df[text_col]),
        })

    def _pack_shard(part: pd.DataFrame) -> pd.DataFrame:
        out = []
        for shard, grp in part.groupby("shard", sort=True):
            grp = grp.sort_values(["__h", id_col], kind="mergesort")
            pack, pos = _greedy_pack(grp["n_tokens"].to_numpy(np.int64),
                                     budget)
            out.append(pd.DataFrame({
                id_col: grp[id_col].to_numpy(),
                "shard": np.int64(shard),
                "pack_id": (np.int64(shard) << _SHARD_SHIFT) + pack,
                "pack_pos": pos,
                "n_tokens": grp["n_tokens"].to_numpy(np.int64),
            }))
        if not out:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "shard": pd.Series([], dtype=np.int64),
                                 "pack_id": pd.Series([], dtype=np.int64),
                                 "pack_pos": pd.Series([], dtype=np.int64),
                                 "n_tokens": pd.Series([], dtype=np.int64)})
        return pd.concat(out, ignore_index=True)

    prepped = ds.map_batches(_prep, batch_format="pandas")
    return bucketed_group_apply(prepped, "shard", _pack_shard,
                                num_buckets=min(32, n_shards))


def export_packed_corpus(
    docs: ray.data.Dataset,
    out_dir: str,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 16,
    seed: int = 17,
    method: str = "md5",
) -> dict:
    """Shard-resumable packed-corpus export: shuffle-order pack assignments
    joined back onto the text, written as ONE hive-partitioned parquet pass
    over only the shards whose ``shard=<s>/_SUCCESS`` marker is missing —
    a failed or killed run re-runs only its unfinished shards (the brief's
    "resumable output" requirement, as an operator).

    Returns {"n_shards", "written", "resumed"}.  Output rows:
    (doc_id, shard, pack_id, pack_pos, n_tokens, text) under
    ``out_dir/shard=<s>/``; readers stream packs with
    ``read_parquet(out_dir)`` ordered by (pack_id, pack_pos)."""
    import os
    import shutil

    import ray as _ray

    from ..state.checkpoint import is_complete, mark_success
    from .shuffleops import join_on_key

    def _sdir(s: int) -> str:
        return os.path.join(out_dir, f"shard={s}")

    missing = [s for s in range(n_shards) if not is_complete(_sdir(s))]
    if not missing:
        return {"n_shards": n_shards, "written": 0, "resumed": n_shards}

    packed = pack_sequences(docs, budget=budget, id_col=id_col,
                            text_col=text_col, n_shards=n_shards,
                            seed=seed, method=method)
    wide = join_on_key(packed,
                       docs.select_columns([id_col, text_col]), id_col,
                       left_fields=[(id_col, np.int64),
                                    ("shard", np.int64),
                                    ("pack_id", np.int64),
                                    ("pack_pos", np.int64),
                                    ("n_tokens", np.int64)],
                       right_fields=[(id_col, np.int64),
                                     (text_col, object)])
    miss_ref = _ray.put(frozenset(missing))

    def _only_missing(df: pd.DataFrame) -> pd.DataFrame:
        from .shuffleops import _broadcast_get

        ms = _broadcast_get(miss_ref)
        return df[df["shard"].isin(ms)]

    sub = wide.map_batches(_only_missing, batch_format="pandas")
    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    sub.write_parquet(tmp, partition_cols=["shard"])
    os.makedirs(out_dir, exist_ok=True)
    for s in missing:
        src, dst = os.path.join(tmp, f"shard={s}"), _sdir(s)
        if os.path.exists(dst):
            shutil.rmtree(dst)
        if os.path.exists(src):
            os.rename(src, dst)
        else:
            os.makedirs(dst, exist_ok=True)  # empty shard is still DONE
        mark_success(dst, {"shard": s, "budget": budget, "seed": seed})
    shutil.rmtree(tmp, ignore_errors=True)
    return {"n_shards": n_shards, "written": len(missing),
            "resumed": n_shards - len(missing)}
