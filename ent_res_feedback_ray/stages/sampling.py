"""Deterministic, partition-invariant sampling and splits.

Reference analogs: ``random_sampling`` / balanced ``sampling``
(/root/reference/s2and/sampling.py:13-115) and the fixed/hash-based
train/val/test carves (/root/reference/s2and/data.py:1042-1138).  The
reference seeds ``np.random`` and samples positionally — NOT reproducible
under re-partitioning.  Here membership is a pure function of the ROW KEY
(md5), so any partitioning, any cluster size, any retry yields the same
sample — and DuckDB can replay it exactly (``md5_number_lower``).

Hash: ``md5_number_lower(key)`` = little-endian uint64 of md5 bytes 8:16,
bit-identical between hashlib and DuckDB (unit-tested).  ~1µs/row Python
cost inside ``map_batches`` — acceptable for sampling stages whose purpose
is to SHRINK data; the downstream pipeline never sees the unsampled rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data

_MOD = 1_000_000


def md5_mod(keys: "list[str]", mod: int = _MOD) -> np.ndarray:
    """uint64 md5_number_lower(key) % mod per key (DuckDB-identical)."""
    out = np.empty(len(keys), dtype=np.int64)
    for i, k in enumerate(keys):
        h = int.from_bytes(hashlib.md5(k.encode("utf-8")).digest()[8:16],
                           "little")
        out[i] = h % mod
    return out


def pair_sample_stage(ds: ray.data.Dataset, rate: float, seed: int = 17,
                      id1: str = "id1", id2: str = "id2") -> ray.data.Dataset:
    """Bernoulli(rate) pair sample keyed on (id1, id2, seed)."""
    thresh = int(round(rate * _MOD))

    def _keep(df: pd.DataFrame) -> pd.DataFrame:
        keys = [f"{a}|{b}|{seed}" for a, b in zip(df[id1], df[id2])]
        return df[md5_mod(keys) < thresh]

    return ds.map_batches(_keep, batch_format="pandas")


def pair_sample_sql_filter(rate: float, seed: int = 17,
                           id1: str = "id1", id2: str = "id2") -> str:
    thresh = int(round(rate * _MOD))
    return (f"md5_number_lower(CAST({id1} AS VARCHAR) || '|' || "
            f"CAST({id2} AS VARCHAR) || '|{seed}') % {_MOD} < {thresh}")


def hash_split_stage(ds: ray.data.Dataset, id_col: str,
                     fractions: dict[str, float],
                     seed: int = 17,
                     out_col: str = "split") -> ray.data.Dataset:
    """Deterministic hash split: each row lands in exactly one named split,
    independent of partitioning (reference fixed-split analog).  Fractions
    must sum to ≤ 1; any remainder goes to the LAST split."""
    names = list(fractions)
    bounds = np.cumsum([fractions[k] for k in names]) * _MOD
    bounds = bounds.round().astype(np.int64)
    bounds[-1] = _MOD  # remainder → last split

    def _assign(df: pd.DataFrame) -> pd.DataFrame:
        keys = [f"{v}|{seed}" for v in df[id_col]]
        h = md5_mod(keys)
        idx = np.searchsorted(bounds, h, side="right")
        df = df.copy()
        df[out_col] = np.array(names, dtype=object)[np.minimum(idx, len(names) - 1)]
        return df

    return ds.map_batches(_assign, batch_format="pandas")


def hash_split_sql_case(id_col: str, fractions: dict[str, float],
                        seed: int = 17) -> str:
    names = list(fractions)
    bounds = np.cumsum([fractions[k] for k in names]) * _MOD
    bounds = bounds.round().astype(np.int64)
    h = (f"md5_number_lower(CAST({id_col} AS VARCHAR) || '|{seed}') % {_MOD}")
    clauses = []
    for name, b in list(zip(names, bounds))[:-1]:
        clauses.append(f"WHEN {h} < {b} THEN '{name}'")
    return "CASE " + " ".join(clauses) + f" ELSE '{names[-1]}' END"


def balanced_sample(df: pd.DataFrame, label_col: str, k_per_class: int,
                    key_cols: list[str], seed: int = 17) -> pd.DataFrame:
    """Balanced per-class subsample (reference balanced ``sampling``,
    /root/reference/s2and/sampling.py:13-94): up to ``k_per_class`` rows per
    label value, chosen by ASCENDING row-key hash — deterministic and
    order/partition-invariant (unlike the reference's positional RNG)."""
    keys = [("|".join(str(v) for v in row) + f"|{seed}")
            for row in df[key_cols].itertuples(index=False)]
    df = df.assign(__h=md5_mod(keys, mod=1 << 62))
    out = (df.sort_values("__h", kind="mergesort")
             .groupby(label_col, sort=False).head(k_per_class))
    return out.drop(columns="__h").reset_index(drop=True)
