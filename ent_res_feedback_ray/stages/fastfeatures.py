"""Hot-path featurization against broadcast per-doc signatures.

The string-based featurizer (stages/features.py — the oracle-parity spec)
materializes two Python strings per pair row; at millions of pairs that is
memory-bandwidth-bound and stops scaling with cores.  This module keeps the
pair stream as ``(block_key, id1, id2)`` integers and computes the SAME
feature values from a compact, **zero-copy broadcast** signature table:

- per doc: sorted uint64 FNV hashes of its token set and its word-3-gram
  shingle set (CSR layout: one flat array + offsets), the UTF-32 prefix
  matrix for Myers Levenshtein, normalized length, lang code, text md5;
- the whole table is numpy arrays in the object store — ``ray.get`` gives
  every worker a read-only view of the SAME plasma memory (no per-worker
  heap copy, no deserialization);
- per pair: |A∩B| via ``searchsorted`` membership on the sorted hash
  slices — values are bit-identical to the string-set path unless a 64-bit
  FNV collision occurs inside one document (probability ~n_tokens²/2⁶⁴).

Scale boundary: the signature table must fit the object store (~60 bytes +
16·tokens per doc).  Beyond that, resolve_pages falls back to the
``attach_attrs`` join path (stages/shuffleops.py).

Reference analog: the fork-shared in-RAM corpus every featurizer worker read
(/root/reference/s2and/featurizer.py:582-583) — done cluster-safe.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.hashing import fnv1a64
from ..functions.strsim import levenshtein_batch_myers_encoded
from ..functions.textnorm import word_ngrams
from .features import LEV_PREFIX


class DocSignatures:
    """Columnar per-doc signature table (all numpy; plasma-friendly)."""

    __slots__ = ("ids", "tok_flat", "tok_off", "shg_flat", "shg_off",
                 "prefix", "prefix_len", "text_len", "lang_code", "text_md5")

    def __init__(self, ids, tok_flat, tok_off, shg_flat, shg_off, prefix,
                 prefix_len, text_len, lang_code, text_md5):
        self.ids = ids
        self.tok_flat = tok_flat
        self.tok_off = tok_off
        self.shg_flat = shg_flat
        self.shg_off = shg_off
        self.prefix = prefix
        self.prefix_len = prefix_len
        self.text_len = text_len
        self.lang_code = lang_code
        self.text_md5 = text_md5


def build_doc_signatures(norm_ds: ray.data.Dataset, id_col: str = "doc_id",
                         norm_col: str = "norm_text",
                         lang_col: str = "lang") -> DocSignatures:
    """Distributed signature build (map_batches), driver-side concatenation,
    sorted by doc id.  Lang codes are a deterministic factorization."""

    def _sig(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        norms = t.column(norm_col).to_pylist()
        langs = t.column(lang_col)
        n = len(norms)
        tok_bytes, shg_bytes, prefixes = [], [], []
        md5s = np.empty(n, dtype=np.int64)
        lens = np.empty(n, dtype=np.int64)
        for i, s in enumerate(norms):
            s = s or ""
            words = s.split()
            th = np.sort(fnv1a64(sorted(set(words))))
            sh = np.sort(fnv1a64(sorted(set(word_ngrams(words, 3)))))
            tok_bytes.append(th.tobytes())
            shg_bytes.append(sh.tobytes())
            # pack the UTF-32 prefix row (fixed LEV_PREFIX uint32 words)
            enc = s[:LEV_PREFIX].encode("utf-32-le")
            prefixes.append(enc + b"\x00" * (LEV_PREFIX * 4 - len(enc)))
            md5s[i] = np.frombuffer(
                hashlib.md5(s.encode("utf-8")).digest()[:8],
                dtype=np.uint64)[0].astype(np.int64)
            lens[i] = len(s)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "tok": pa.array(tok_bytes, pa.binary()),
            "shg": pa.array(shg_bytes, pa.binary()),
            "prefix": pa.array(prefixes, pa.binary()),
            "md5": pa.array(md5s, pa.int64()),
            "text_len": pa.array(lens, pa.int64()),
            "lang": langs,
        })

    # pull as arrow (binary columns stay contiguous buffers — the driver
    # concatenation is a few memcpys, not 300k tiny-array concats)
    import pyarrow as _pa

    tables = list(norm_ds.map_batches(_sig, batch_format="pyarrow",
                                      batch_size=8192).iter_batches(
        batch_size=None, batch_format="pyarrow"))
    tbl = _pa.concat_tables(tables).combine_chunks()
    order = np.argsort(tbl.column("doc_id").to_numpy(), kind="stable")
    tbl = tbl.take(_pa.array(order, _pa.int64()))

    ids = tbl.column("doc_id").to_numpy()
    tok_col = tbl.column("tok").combine_chunks()
    shg_col = tbl.column("shg").combine_chunks()
    pre_col = tbl.column("prefix").combine_chunks()

    import pyarrow.compute as _pc

    def _flat_csr(col) -> tuple[np.ndarray, np.ndarray]:
        n_words = (_pc.binary_length(col).to_numpy() // 8).astype(np.int64)
        blob = b"".join(col.to_pylist())  # one memcpy pass
        data = np.frombuffer(blob, dtype=np.uint64) if blob else \
            np.empty(0, np.uint64)
        off = np.concatenate([[0], np.cumsum(n_words)]).astype(np.int64)
        return data, off

    tok_flat, tok_off = _flat_csr(tok_col)
    shg_flat, shg_off = _flat_csr(shg_col)
    prefix = np.frombuffer(b"".join(pre_col.to_pylist()),
                           dtype=np.uint32).reshape(len(ids), LEV_PREFIX)
    text_len = tbl.column("text_len").to_numpy()
    prefix_len = np.minimum(text_len, LEV_PREFIX).astype(np.int64)
    lang_codes, _ = pd.factorize(
        pd.Series(tbl.column("lang").to_pylist()), sort=True)
    return DocSignatures(
        ids=ids.astype(np.int64),
        tok_flat=np.ascontiguousarray(tok_flat),
        tok_off=tok_off.astype(np.int64),
        shg_flat=np.ascontiguousarray(shg_flat),
        shg_off=shg_off.astype(np.int64),
        prefix=np.ascontiguousarray(prefix),
        prefix_len=prefix_len,
        text_len=text_len.astype(np.int64),
        lang_code=lang_codes.astype(np.int64),
        text_md5=tbl.column("md5").to_numpy().astype(np.int64),
    )


def _intersect_size(flat: np.ndarray, off: np.ndarray, i: int, j: int) -> int:
    a = flat[off[i]: off[i + 1]]
    b = flat[off[j]: off[j + 1]]
    if len(a) > len(b):
        a, b = b, a
    if len(a) == 0:
        return 0
    lo = np.searchsorted(b, a, side="left")
    hi = np.searchsorted(b, a, side="right")
    return int((hi > lo).sum())


def featurize_and_score_fast(
    pairs_ds: ray.data.Dataset,
    sig_ref,
    seeds: dict | None = None,
    lang_rule: bool = True,
    exact_text_rule: bool = True,
    batch_size: int = 32768,
) -> ray.data.Dataset:
    """pairs (block_key, id1, id2, …) → + FEATURE_COLS + score + constraint.

    One fused stateless stage: signature lookups are zero-copy views into
    plasma; no Python strings touch the pair stream.  Feature values and the
    linear score are bit-identical to the string path (features.py) modulo
    64-bit hash collisions."""
    seeds_ref = ray.put(seeds or {})

    def _fast(batch: pa.Table) -> pa.Table:
        from .shuffleops import _broadcast_get

        sig: DocSignatures = _broadcast_get(sig_ref)
        n = batch.num_rows
        id1 = batch.column("id1").to_numpy(zero_copy_only=False)
        id2 = batch.column("id2").to_numpy(zero_copy_only=False)
        i1 = np.searchsorted(sig.ids, id1)
        i2 = np.searchsorted(sig.ids, id2)

        # unique doc-pairs within the batch (blocks repeat docs heavily)
        key = i1.astype(np.int64) * len(sig.ids) + i2
        uniq, inv = np.unique(key, return_inverse=True)
        u1 = (uniq // len(sig.ids)).astype(np.int64)
        u2 = (uniq % len(sig.ids)).astype(np.int64)

        m = len(uniq)
        tj_u = np.empty(m)
        sj_u = np.empty(m)
        tok_sizes = np.diff(sig.tok_off)
        shg_sizes = np.diff(sig.shg_off)
        for k in range(m):
            a, b = u1[k], u2[k]
            ti = _intersect_size(sig.tok_flat, sig.tok_off, a, b)
            tu = tok_sizes[a] + tok_sizes[b] - ti
            tj_u[k] = ti / tu if tu else np.nan
            si = _intersect_size(sig.shg_flat, sig.shg_off, a, b)
            su = shg_sizes[a] + shg_sizes[b] - si
            sj_u[k] = si / su if su else np.nan
        lev_u = levenshtein_batch_myers_encoded(
            sig.prefix[u1], sig.prefix_len[u1], sig.prefix[u2], sig.prefix_len[u2])
        len1, len2 = sig.text_len[u1], sig.text_len[u2]
        nonempty = (len1 > 0) & (len2 > 0)
        plen = np.maximum(np.minimum(len1, LEV_PREFIX),
                          np.minimum(len2, LEV_PREFIX)).astype(np.float64)
        lv_u = np.where(nonempty, 1.0 - lev_u / np.maximum(plen, 1), np.nan)
        lr_u = np.where(nonempty,
                        np.minimum(len1, len2) / np.maximum(np.maximum(len1, len2), 1),
                        np.nan)
        lang_eq_u = sig.lang_code[u1] == sig.lang_code[u2]
        lm_u = lang_eq_u.astype(np.float64)

        tj, sj, lv, lr, lm = tj_u[inv], sj_u[inv], lv_u[inv], lr_u[inv], lm_u[inv]
        # linear score — same association order as SCORE_SQL
        z = ((0.55 * np.nan_to_num(sj) + 0.25 * np.nan_to_num(tj))
             + 0.15 * np.nan_to_num(lv)) + 0.05 * np.nan_to_num(lr)
        score = np.minimum(1.0, np.maximum(0.0, z))

        # constraint chain (seeds > exact text > lang), vectorized
        cons = np.full(n, np.nan)
        lang_eq = lang_eq_u[inv]
        if lang_rule:
            cons[~lang_eq] = 1.0e4
        if exact_text_rule:
            exact_u = ((sig.text_md5[u1] == sig.text_md5[u2])
                       & (sig.text_len[u1] > 0) & lang_eq_u)
            exact = exact_u[inv]
            cons[exact] = 0.0
        seed_map = ray.get(seeds_ref)
        if seed_map:
            for idx in range(n):
                s = seed_map.get((int(id1[idx]), int(id2[idx])))
                if s == "require":
                    cons[idx] = 0.0
                elif s == "disallow":
                    cons[idx] = 1.0e4

        def col(arr):
            return pa.array(arr, pa.float64(), from_pandas=True)

        return (
            batch.append_column("token_jaccard", col(tj))
            .append_column("shingle_jaccard", col(sj))
            .append_column("lev_sim", col(lv))
            .append_column("len_ratio", col(lr))
            .append_column("lang_match", col(lm))
            .append_column("score", pa.array(score, pa.float64()))
            .append_column("constraint", col(cons))
        )

    return pairs_ds.map_batches(_fast, batch_format="pyarrow",
                                batch_size=batch_size)
