"""Blocking stages: deterministic key blocking, MinHash/LSH band blocking,
and sorted-neighborhood keys.

Reference analog: ``compute_block`` (first initial + last name,
/root/reference/s2and/text.py:632-653) and the block dict
(/root/reference/s2and/data.py:744-774).  The web graft re-keys blocking to
(lang, leading token) for key blocking and adds MinHash/LSH bands over word
3-gram shingles as the recall path (SURVEY.md §7.2 step 2) — the reference
has no sketching; LSH is the scale-path addition the north_star asks for.

Scale notes:
- the block key is computed in a stateless ``map_batches`` (no shuffle);
  the ``groupby(block_key)`` downstream is shuffle #1;
- band rows multiply the dataset by ``num_bands`` but carry only projected
  columns (id + the few featurizer inputs), not the full page;
- skewed blocks are handled at pair-generation time (caps + sorted-window,
  see stages/pairs.py), replacing the reference's drop/subsample guards
  (/root/reference/scripts/make_s2and_mini_dataset.py:25-88).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashing import band_keys, fnv1a64, minhash_params, minhash_signature
from ..functions.textnorm import word_ngrams

BLOCK_KEY_SQL = (
    "({lang} || '_' || coalesce(string_split({norm}, ' ')[1], ''))"
)
"""DuckDB expression equivalent to ``key_block_key`` (lang + first token)."""


def key_block_key(norm_text: str, lang: str) -> str:
    """Deterministic key block: language + leading normalized token."""
    first = norm_text.split(" ", 1)[0] if norm_text else ""
    return f"{lang}_{first}"


def key_blocking_stage(ds: ray.data.Dataset, norm_col: str = "norm_text",
                       lang_col: str = "lang",
                       out_col: str = "block_key") -> ray.data.Dataset:
    def _block(batch: pa.Table) -> pa.Table:
        norms = batch.column(norm_col).to_pylist()
        langs = batch.column(lang_col).to_pylist()
        keys = [key_block_key(n or "", l or "") for n, l in zip(norms, langs)]
        return batch.append_column(out_col, pa.array(keys, pa.string()))

    return ds.map_batches(_block, batch_format="pyarrow")


class MinHasher:
    """Stateful minhash stage (actor pool): permutation parameters are built
    once per actor in ``__init__`` (the canonical load-once pattern — the
    reference's module-global fastText model, /root/reference/s2and/text.py:23,
    becomes actor state here)."""

    def __init__(self, num_perm: int = 128, shingle_n: int = 3, seed: int = 42,
                 norm_col: str = "norm_text"):
        self.a, self.b = minhash_params(num_perm, seed)
        self.shingle_n = shingle_n
        self.norm_col = norm_col

    def signature(self, norm_text: str) -> np.ndarray:
        shingles = sorted(set(word_ngrams(norm_text.split(), self.shingle_n)))
        hashes = fnv1a64(shingles)
        return minhash_signature(hashes, self.a, self.b)

    def __call__(self, batch: pa.Table) -> pa.Table:
        norms = batch.column(self.norm_col).to_pylist()
        sigs = np.stack([self.signature(n or "") for n in norms]) if len(norms) else \
            np.empty((0, len(self.a)), dtype=np.uint64)
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1), pa.uint64()), len(self.a)
        )
        return batch.append_column("minhash", sig_col)


def minhash_stage(ds: ray.data.Dataset, num_perm: int = 128, shingle_n: int = 3,
                  seed: int = 42, concurrency=None) -> ray.data.Dataset:
    kwargs = {"concurrency": concurrency if concurrency else (1, 4)}
    return ds.map_batches(
        MinHasher, fn_constructor_kwargs={
            "num_perm": num_perm, "shingle_n": shingle_n, "seed": seed},
        batch_format="pyarrow", **kwargs)


def band_explode_stage(ds: ray.data.Dataset, num_bands: int = 16,
                       keep_cols: list[str] | None = None) -> ray.data.Dataset:
    """minhash column → one row per (doc, band): ``band_key`` + projected cols.

    ``keep_cols`` are the columns pair-generation needs downstream (carrying
    them here avoids a join after the band groupby)."""

    def _explode(batch: pa.Table) -> pa.Table:
        sigs = batch.column("minhash")
        out_keys: list[int] = []
        take_idx: list[int] = []
        for i in range(batch.num_rows):
            sig = np.asarray(sigs[i].as_py(), dtype=np.uint64)
            for bk in band_keys(sig, num_bands):
                out_keys.append(bk)
                take_idx.append(i)
        cols = keep_cols or [c for c in batch.column_names if c != "minhash"]
        taken = batch.select(cols).take(pa.array(take_idx, pa.int64()))
        return taken.append_column("band_key", pa.array(out_keys, pa.int64()))

    return ds.map_batches(_explode, batch_format="pyarrow")


def sorted_neighborhood_key(norm_text: str, prefix_len: int = 12) -> str:
    """Sorted-neighborhood sort key: normalized-text prefix (north_star's
    third blocking family; windowing happens at pair generation)."""
    return norm_text[:prefix_len]
