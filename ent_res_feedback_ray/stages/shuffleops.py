"""Core wide-operation kernels: hash-bucketed group-apply and aggregate.

Why this exists: Ray Data's native ``groupby().aggregate()`` /
``map_groups()`` pay per-GROUP Python overhead (~2 ms/group measured on Ray
2.49) — catastrophic for high-cardinality keys (147k order keys: 280 s native
vs 2.1 s bucketed).  The engine's rule:

- **low cardinality** (≤ ~1k groups): native ``groupby().aggregate(...)`` is
  fine and fuses well;
- **high cardinality**: hash keys into B buckets (one shuffle, same volume),
  then ONE ``map_groups`` call per bucket whose body does the real grouping
  with pandas C code.

Both helpers are deterministic and partition-invariant: bucket id is a pure
function of the key (pandas stable 64-bit hash), and every row of a key lands
in exactly one bucket.

Skew note (north rule): a single hot key still lands in one bucket; callers
with quadratic per-group work (pair generation) cap/window inside the group
(stages/pairs.py); linear aggregates just ride — a bucket is at most
(hot key size + n/B) rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def _bucket_of(df: pd.DataFrame, keys: list[str], num_buckets: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
    return (h % num_buckets).astype(np.int64)


def bucketed_group_apply(
    ds: ray.data.Dataset,
    key: "str | list[str]",
    bucket_fn,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Hash-partitioned group apply: ``bucket_fn`` receives ALL rows of a
    bucket (a superset of whole key-groups) as one pandas DataFrame and is
    responsible for the per-key grouping (vectorized)."""
    keys = [key] if isinstance(key, str) else list(key)

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = _bucket_of(df, keys, num_buckets)
        return df

    def _apply(g: pd.DataFrame) -> pd.DataFrame:
        return bucket_fn(g.drop(columns=["__bucket"]))

    return (
        ds.map_batches(_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(_apply, batch_format="pandas")
    )


def bucketed_aggregate(
    ds: ray.data.Dataset,
    key: "str | list[str]",
    num_buckets: int = 32,
    **named_aggs,
) -> ray.data.Dataset:
    """High-cardinality grouped aggregate: per-bucket pandas ``groupby.agg``.

    ``named_aggs``: pandas named-aggregation spec, e.g.
    ``revenue=("revenue", "sum"), n=("revenue", "size")``.

    Callers should pre-aggregate per batch (map-side partials) before this
    when the aggregate is algebraic — then the shuffle moves partials only."""
    keys = [key] if isinstance(key, str) else list(key)

    def _agg(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby(keys, as_index=False, sort=True).agg(**named_aggs)

    return bucketed_group_apply(ds, keys, _agg, num_buckets)


def bucketed_min_label(ds: ray.data.Dataset, node_col: str, cand_col: str,
                       num_buckets: int = 32) -> ray.data.Dataset:
    """min(cand) per node — the label-propagation reduce (high cardinality)."""

    def _agg(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby(node_col, as_index=False, sort=True).agg(
            **{cand_col: (cand_col, "min")})

    return bucketed_group_apply(ds, node_col, _agg, num_buckets)


def distinct_values(ds: ray.data.Dataset, col: str,
                    num_buckets: int = 32) -> ray.data.Dataset:
    """Distinct values of one column (high-cardinality ``unique``)."""

    def _distinct(part: pd.DataFrame) -> pd.DataFrame:
        return part[[col]].drop_duplicates()

    return bucketed_group_apply(ds, col, _distinct, num_buckets)
