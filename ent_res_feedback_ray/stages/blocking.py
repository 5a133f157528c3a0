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

import functools as _functools

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashing import (band_keys_matrix, fnv1a64, minhash_params,
                                 minhash_signature)
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
    """Arrow-native (lang + '_' + first token) key — zero per-row Python on
    the er_e2e hot path (scalar twin: :func:`key_block_key`)."""
    import pyarrow.compute as pc

    def _block(batch: pa.Table) -> pa.Table:
        norm = pc.fill_null(
            pc.cast(batch.column(norm_col), pa.string()), "")
        lang = pc.fill_null(
            pc.cast(batch.column(lang_col), pa.string()), "")
        first = pc.list_element(
            pc.split_pattern(norm, " ", max_splits=1), 0)
        keys = pc.binary_join_element_wise(lang, first, "_")
        return batch.append_column(out_col, pc.cast(keys, pa.string()))

    return ds.map_batches(_block, batch_format="pyarrow")


@_functools.lru_cache(maxsize=8)
def _cached_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-worker-process param cache: building the permutation table is
    cheap, so the minhash stage runs as stateless tasks (fully elastic)
    rather than an actor pool — the cache makes it once per worker."""
    return minhash_params(num_perm, seed)


_MH_SCRATCH: dict[int, np.ndarray] = {}
_MH_MAX_CELLS = 4_000_000


def minhash_batch(norms: list[str], num_perm: int, shingle_n: int,
                  seed: int) -> np.ndarray:
    """Vectorized per-batch minhash: hash ALL docs' shingles in one columnar
    pass, then segment-min via ``np.minimum.reduceat`` — no per-doc Python
    beyond shingle extraction.

    The [chunk, num_perm] permutation temporary writes into a PER-PROCESS
    scratch buffer (grow-only): fresh 32 MB numpy temporaries get mmap'd and
    munmap'd by glibc each call, and on virtualized hosts the resulting
    first-touch page faults cost ~50× the multiply-add itself — reuse keeps
    the stage at steady-state memory with zero allocator churn."""
    a, b = _cached_params(num_perm, seed)
    n = len(norms)
    sigs = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    all_shingles: list[str] = []
    offsets: list[int] = []
    doc_idx: list[int] = []
    for i, s in enumerate(norms):
        sh = set(word_ngrams((s or "").split(), shingle_n))
        if not sh:
            continue
        offsets.append(len(all_shingles))
        doc_idx.append(i)
        all_shingles.extend(sh)
    if not all_shingles:
        return sigs
    h = fnv1a64(all_shingles)
    scratch = _MH_SCRATCH.get(num_perm)
    if scratch is None or scratch.shape[0] * num_perm < _MH_MAX_CELLS:
        scratch = np.empty((_MH_MAX_CELLS // num_perm, num_perm), np.uint64)
        _MH_SCRATCH[num_perm] = scratch
    max_rows = scratch.shape[0]
    starts = np.array(offsets + [len(all_shingles)], dtype=np.int64)
    d = 0
    while d < len(doc_idx):
        e = d
        while e < len(doc_idx) and starts[e + 1] - starts[d] <= max_rows:
            e += 1
        e = max(e, d + 1)
        lo, hi = starts[d], starts[e]
        # a single doc larger than the scratch window falls back to a fresh
        # temporary (same as pre-scratch behavior; pathological docs only)
        vals = (scratch[: hi - lo] if hi - lo <= max_rows
                else np.empty((hi - lo, num_perm), np.uint64))
        with np.errstate(over="ignore"):
            np.multiply(h[lo:hi, None], a[None, :], out=vals)
            np.add(vals, b[None, :], out=vals)
        seg = starts[d:e] - lo
        mins = np.minimum.reduceat(vals, seg, axis=0)
        sigs[doc_idx[d:e]] = mins
        d = e
    return sigs


def minhash_stage(ds: ray.data.Dataset, num_perm: int = 128, shingle_n: int = 3,
                  seed: int = 42, norm_col: str = "norm_text",
                  concurrency=None) -> ray.data.Dataset:
    """Stateless vectorized minhash over Arrow batches."""

    def _mh(batch: pa.Table) -> pa.Table:
        norms = batch.column(norm_col).to_pylist()
        sigs = minhash_batch(norms, num_perm, shingle_n, seed)
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1), pa.uint64()), num_perm)
        return batch.append_column("minhash", sig_col)

    return ds.map_batches(_mh, batch_format="pyarrow")


def band_explode_stage(ds: ray.data.Dataset, num_bands: int = 16,
                       keep_cols: list[str] | None = None) -> ray.data.Dataset:
    """minhash column → one row per (doc, band): ``band_key`` + projected cols.

    ``keep_cols`` are the columns pair-generation needs downstream (carrying
    them here avoids a join after the band groupby)."""

    def _explode(batch: pa.Table) -> pa.Table:
        col = batch.column("minhash")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = batch.num_rows
        if n == 0:
            cols = keep_cols or [c for c in batch.column_names if c != "minhash"]
            return batch.select(cols).append_column(
                "band_key", pa.array([], pa.int64()))
        num_perm = col.type.list_size
        sigs = col.flatten().to_numpy(zero_copy_only=False).reshape(n, num_perm)
        # vectorized band digest (hashing.band_keys_matrix): FNV lane fold +
        # splitmix64 avalanche, no per-row Python — this stage used to be the
        # LSH hot path's last interpreter loop (one blake2b call per
        # (doc, band)).  Keys carry the band-namespace tag bit (bit 62).
        keys = band_keys_matrix(sigs.astype(np.uint64, copy=False), num_bands)
        take_idx = np.repeat(np.arange(n, dtype=np.int64), num_bands)
        cols = keep_cols or [c for c in batch.column_names if c != "minhash"]
        taken = batch.select(cols).take(pa.array(take_idx, pa.int64()))
        return taken.append_column(
            "band_key", pa.array(keys.reshape(-1), pa.int64()))

    return ds.map_batches(_explode, batch_format="pyarrow")


def sorted_neighborhood_key(norm_text: str, prefix_len: int = 12) -> str:
    """Sorted-neighborhood sort key: normalized-text prefix (north_star's
    third blocking family; windowing happens at pair generation)."""
    return norm_text[:prefix_len]
