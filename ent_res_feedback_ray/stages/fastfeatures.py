"""Hot-path featurization against broadcast per-doc signatures.

The string-based featurizer (stages/features.py — the oracle-parity spec)
materializes two Python strings per pair row; at millions of pairs that is
memory-bandwidth-bound and stops scaling with cores.  This module keeps the
pair stream as ``(block_key, id1, id2)`` integers and computes the SAME
feature values from a compact, **zero-copy broadcast** signature table:

- per doc: sorted uint64 FNV hashes of its token BAG (dups kept, for the
  multiset counter-jaccard), its word-3-gram shingle set and its char-3-gram
  set (CSR layout: one flat array + offsets), the UTF-32 prefix matrix for
  Myers Levenshtein / LCP, the UTF-32 first-token matrix for Jaro-Winkler,
  normalized length, lang code, warc_ts (µs), text md5;
- the whole table is numpy arrays in the object store — ``ray.get`` gives
  every worker a read-only view of the SAME plasma memory (no per-worker
  heap copy, no deserialization);
- per batch: set/bag intersections for ALL unique pairs at once via a
  gather → value-code → sort-count kernel (zero per-pair Python); values are
  bit-identical to the string-set path unless a 64-bit FNV collision occurs
  inside one document (probability ~n_tokens²/2⁶⁴).

Empty-side semantics match the spec exactly: any jaccard with an empty side
is NaN (NOT 0.0 — see strsim.jaccard / counter_jaccard).

Scale boundary: the signature table must fit the object store (~300 bytes +
~24·tokens per doc).  Beyond that, resolve_pages falls back to the
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
from ..functions.strsim import (
    encode_utf32,
    jaro_winkler_batch_encoded,
    lcp_batch_encoded,
    levenshtein_batch_myers_encoded,
)
from .features import CHAR3_PREFIX, CJ_CLAMP, FTOK_LEN, LEV_PREFIX, TS_CLAMP_DAYS


class DocSignatures:
    """Columnar per-doc signature table (all numpy; plasma-friendly)."""

    __slots__ = ("ids", "tok_flat", "tok_off", "tok_nset", "tok_ncodes",
                 "shg_flat", "shg_off", "shg_ncodes",
                 "ch3_flat", "ch3_off", "ch3_ncodes", "prefix", "prefix_len",
                 "ftok", "ftok_len", "text_len", "lang_code", "text_md5",
                 "ts_us")

    def __init__(self, **kw):
        for k in self.__slots__:
            setattr(self, k, kw[k])


def build_doc_signatures(norm_ds: ray.data.Dataset, id_col: str = "doc_id",
                         norm_col: str = "norm_text",
                         lang_col: str = "lang",
                         ts_col: str = "warc_ts") -> DocSignatures:
    """Distributed signature build (map_batches), driver-side concatenation,
    sorted by doc id.  Lang codes are a deterministic factorization.
    ``ts_col`` is optional — absent input → ts_diff_days is NaN downstream."""
    have_ts = ts_col in norm_ds.schema().names

    def _sorted_dedup_csr(vals: np.ndarray, doc: np.ndarray, n: int):
        """(values, owning doc) → per-doc sorted DISTINCT CSR (vectorized)."""
        if len(vals) == 0:
            return np.empty(0, np.uint64), np.zeros(n + 1, np.int64)
        order = np.lexsort((vals, doc))
        v, d = vals[order], doc[order]
        keep = np.concatenate([[True], (v[1:] != v[:-1]) | (d[1:] != d[:-1])])
        v, d = v[keep], d[keep]
        counts = np.bincount(d, minlength=n)
        off = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        return v, off

    def _sig(t: pa.Table) -> pa.Table:
        """Batch-vectorized signature build: ONE columnar fnv pass over all
        tokens of the batch; shingle hashes derived arithmetically from
        consecutive token hashes; char-3-grams as INJECTIVE packed
        codepoints (c0·2⁴² + c1·2²¹ + c2 — no collisions at all); per-doc
        sort/dedup via one lexsort.  The only per-doc Python is the cheap
        split/encode/md5."""
        from itertools import chain

        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        norms = t.column(norm_col).to_pylist()
        langs = t.column(lang_col)
        n = len(norms)
        tok_lists = [(s or "").split() for s in norms]
        counts = np.fromiter((len(x) for x in tok_lists), np.int64, count=n)
        th = fnv1a64(list(chain.from_iterable(tok_lists)))
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)

        # token BAG: per-doc sorted with dups; nset from the dedup pass
        if len(th):
            order = np.lexsort((th, doc_idx))
            tok_sorted = th[order]
            dsort = doc_idx[order]
            first = np.concatenate(
                [[True], (tok_sorted[1:] != tok_sorted[:-1])
                 | (dsort[1:] != dsort[:-1])])
            nsets = np.bincount(dsort[first], minlength=n).astype(np.int64)
        else:
            tok_sorted = th
            nsets = np.zeros(n, np.int64)
        tok_off = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

        # shingles: hash-combine consecutive token hashes (same-doc triples);
        # docs with 1-2 tokens emit ONE shingle = fnv of the joined words
        # (word_ngrams semantics)
        P = np.uint64(0x100000001B3)
        if len(th) >= 3:
            with np.errstate(over="ignore"):
                tri = (th[:-2] * P + th[1:-1]) * P + th[2:]
            ok = doc_idx[:-2] == doc_idx[2:]
            sh_vals, sh_doc = tri[ok], doc_idx[:-2][ok]
        else:
            sh_vals = np.empty(0, np.uint64)
            sh_doc = np.empty(0, np.int64)
        small = np.nonzero((counts > 0) & (counts < 3))[0]
        if len(small):
            sv = fnv1a64([" ".join(tok_lists[i]) for i in small])
            sh_vals = np.concatenate([sh_vals, sv])
            sh_doc = np.concatenate([sh_doc, small.astype(np.int64)])
        shg_flat, shg_off = _sorted_dedup_csr(sh_vals, sh_doc, n)

        # prefix / first-token matrices + packed char-3-grams over s[:100]
        lens = np.fromiter((len(s or "") for s in norms), np.int64, count=n)
        clens = np.minimum(lens, CHAR3_PREFIX).astype(np.int64)
        M = np.zeros((n, CHAR3_PREFIX), dtype=np.uint32)
        ftoks = np.zeros((n, FTOK_LEN), dtype=np.uint32)
        md5s = np.empty(n, dtype=np.int64)
        for i, s in enumerate(norms):
            s = s or ""
            if s:
                enc = np.frombuffer(
                    s[:CHAR3_PREFIX].encode("utf-32-le"), dtype=np.uint32)
                M[i, : len(enc)] = enc
                ft = tok_lists[i][0][:FTOK_LEN] if tok_lists[i] else ""
                if ft:
                    fenc = np.frombuffer(ft.encode("utf-32-le"), dtype=np.uint32)
                    ftoks[i, : len(fenc)] = fenc
            md5s[i] = np.frombuffer(
                hashlib.md5(s.encode("utf-8")).digest()[:8],
                dtype=np.uint64)[0].astype(np.int64)
        S21 = np.uint64(1) << np.uint64(21)
        Mu = M.astype(np.uint64)
        tri3 = (Mu[:, :-2] * S21 + Mu[:, 1:-1]) * S21 + Mu[:, 2:]
        pos_ok = (np.arange(CHAR3_PREFIX - 2)[None, :] < (clens - 2)[:, None])
        c3_vals = tri3[pos_ok]
        c3_doc = np.broadcast_to(np.arange(n, dtype=np.int64)[:, None],
                                 tri3.shape)[pos_ok]
        csmall = np.nonzero((clens > 0) & (clens < 3))[0]
        if len(csmall):
            # whole (short) string as the single gram — same packing, zero-
            # padded: cannot collide with a real 3-gram (chars are ≥ 1)
            sm = (Mu[csmall, 0] * S21 + Mu[csmall, 1]) * S21 + Mu[csmall, 2]
            c3_vals = np.concatenate([c3_vals, sm])
            c3_doc = np.concatenate([c3_doc, csmall.astype(np.int64)])
        ch3_flat, ch3_off = _sorted_dedup_csr(c3_vals, c3_doc, n)

        def _list_col(flat: np.ndarray, off: np.ndarray) -> pa.Array:
            return pa.LargeListArray.from_arrays(
                pa.array(off, pa.int64()),
                pa.array(flat.astype(np.uint64), pa.uint64()))

        cols = {
            "doc_id": pa.array(ids, pa.int64()),
            "tok": _list_col(tok_sorted, tok_off),
            "nset": pa.array(nsets, pa.int64()),
            "shg": _list_col(shg_flat, shg_off),
            "ch3": _list_col(ch3_flat, ch3_off),
            "prefix": pa.array(
                [row.tobytes() for row in M[:, :LEV_PREFIX]], pa.binary()),
            "ftok": pa.array([row.tobytes() for row in ftoks], pa.binary()),
            "md5": pa.array(md5s, pa.int64()),
            "text_len": pa.array(lens, pa.int64()),
            "lang": langs,
        }
        if have_ts:
            ts = t.column(ts_col).to_numpy(zero_copy_only=False).astype(
                "datetime64[us]").astype(np.int64)
            cols["ts_us"] = pa.array(ts, pa.int64())
        return pa.table(cols)

    # pull as arrow (binary columns stay contiguous buffers — the driver
    # concatenation is a few memcpys, not 300k tiny-array concats)
    tables = list(norm_ds.map_batches(_sig, batch_format="pyarrow",
                                      batch_size=8192).iter_batches(
        batch_size=None, batch_format="pyarrow"))
    tbl = pa.concat_tables(tables).combine_chunks()
    order = np.argsort(tbl.column("doc_id").to_numpy(), kind="stable")
    tbl = tbl.take(pa.array(order, pa.int64()))

    ids = tbl.column("doc_id").to_numpy()

    def _flat_csr(col) -> tuple[np.ndarray, np.ndarray]:
        """Arrow large_list<uint64> → (flat values, offsets) — zero-copy."""
        col = col.combine_chunks()
        data = col.values.to_numpy(zero_copy_only=False).astype(
            np.uint64, copy=False)
        off = col.offsets.to_numpy().astype(np.int64)
        return data, off

    def _flat_mat(col, width: int) -> np.ndarray:
        col = col.combine_chunks()
        return np.frombuffer(b"".join(col.to_pylist()),
                             dtype=np.uint32).reshape(len(ids), width)

    def _recode(flat: np.ndarray) -> tuple[np.ndarray, int]:
        """Map uint64 hashes → dense MONOTONE int64 codes, computed once for
        the whole corpus.  Monotone ⇒ per-doc slices stay sorted, so the
        per-batch kernel needs no sorts at all (see pair_bag_stats)."""
        if len(flat) == 0:
            return flat.astype(np.int64), 0
        uniq, inv = np.unique(flat, return_inverse=True)
        return inv.astype(np.int64), len(uniq)

    tok_flat, tok_off = _flat_csr(tbl.column("tok"))
    shg_flat, shg_off = _flat_csr(tbl.column("shg"))
    ch3_flat, ch3_off = _flat_csr(tbl.column("ch3"))
    tok_flat, tok_ncodes = _recode(tok_flat)
    shg_flat, shg_ncodes = _recode(shg_flat)
    ch3_flat, ch3_ncodes = _recode(ch3_flat)
    prefix = _flat_mat(tbl.column("prefix"), LEV_PREFIX)
    ftok = _flat_mat(tbl.column("ftok"), FTOK_LEN)
    text_len = tbl.column("text_len").to_numpy()
    prefix_len = np.minimum(text_len, LEV_PREFIX).astype(np.int64)
    ftok_len = (ftok != 0).sum(axis=1).astype(np.int64)
    lang_codes, _ = pd.factorize(
        pd.Series(tbl.column("lang").to_pylist()), sort=True)
    ts_us = (tbl.column("ts_us").to_numpy().astype(np.int64)
             if have_ts else None)
    return DocSignatures(
        ids=ids.astype(np.int64),
        tok_flat=np.ascontiguousarray(tok_flat),
        tok_off=tok_off.astype(np.int64),
        tok_nset=tbl.column("nset").to_numpy().astype(np.int64),
        tok_ncodes=tok_ncodes,
        shg_flat=np.ascontiguousarray(shg_flat),
        shg_off=shg_off.astype(np.int64),
        shg_ncodes=shg_ncodes,
        ch3_flat=np.ascontiguousarray(ch3_flat),
        ch3_off=ch3_off.astype(np.int64),
        ch3_ncodes=ch3_ncodes,
        prefix=np.ascontiguousarray(prefix),
        prefix_len=prefix_len,
        ftok=np.ascontiguousarray(ftok),
        ftok_len=ftok_len,
        text_len=text_len.astype(np.int64),
        lang_code=lang_codes.astype(np.int64),
        text_md5=tbl.column("md5").to_numpy().astype(np.int64),
        ts_us=ts_us,
    )


# ---------------------------------------------------------------------------
# Vectorized CSR pair-intersection kernel (zero per-pair Python)
# ---------------------------------------------------------------------------

def _gather_csr(flat: np.ndarray, off: np.ndarray, docs: np.ndarray):
    """Concatenate the CSR slices of ``docs``: (values, owner index, lengths)."""
    lens = (off[docs + 1] - off[docs]).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, flat.dtype), np.empty(0, np.int64), lens
    cum = np.cumsum(lens)
    idx = (np.arange(total, dtype=np.int64)
           - np.repeat(cum - lens, lens) + np.repeat(off[docs], lens))
    owner = np.repeat(np.arange(len(docs), dtype=np.int64), lens)
    return flat[idx], owner, lens


def _rle_sorted(k: np.ndarray):
    """Run-length encode an ALREADY-SORTED key array → (uniques, counts)."""
    starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
    return k[starts], np.diff(np.append(starts, len(k)))


def pair_bag_stats(flat: np.ndarray, off: np.ndarray, ncodes: int,
                   u1: np.ndarray, u2: np.ndarray, bag: bool = False):
    """Per pair k: |set(A)∩set(B)| (and the multiset intersection when
    ``bag``) over the CSR slices of docs u1[k], u2[k].

    Zero sorts: ``flat`` holds dense MONOTONE value codes (see ``_recode``),
    so ``owner·C + code`` is globally sorted by construction (owner index is
    non-decreasing, slices are sorted) — intersections reduce to one
    ``searchsorted`` between two pre-sorted key streams."""
    m = len(u1)
    if m == 0:
        z = np.zeros(0, np.int64)
        return z, z
    v1, p1, _ = _gather_csr(flat, off, u1)
    v2, p2, _ = _gather_csr(flat, off, u2)
    if len(v1) == 0 or len(v2) == 0:
        z = np.zeros(m, np.int64)
        return z, z.copy()
    C = np.int64(max(ncodes, 1))
    k1 = p1 * C + v1
    k2 = p2 * C + v2
    if bag:
        uk1, n1 = _rle_sorted(k1)
        uk2, n2 = _rle_sorted(k2)
    else:  # set slices have no dups — every key is already unique
        uk1, n1 = k1, None
        uk2, n2 = k2, None
    pos = np.searchsorted(uk2, uk1)
    pos_c = np.minimum(pos, len(uk2) - 1)
    match = uk2[pos_c] == uk1
    mp = uk1[match] // C
    set_inter = np.bincount(mp, minlength=m).astype(np.int64)
    if not bag:
        return set_inter, set_inter
    bag_inter = np.bincount(
        mp, weights=np.minimum(n1[match], n2[pos_c[match]]),
        minlength=m).astype(np.int64)
    return set_inter, bag_inter


def _jaccard_from_inter(inter: np.ndarray, l1: np.ndarray,
                        l2: np.ndarray) -> np.ndarray:
    """Set jaccard with spec NaN semantics (either side empty → NaN)."""
    union = l1 + l2 - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        out = inter / union
    return np.where((l1 > 0) & (l2 > 0), out, np.nan)


def featurize_and_score_fast(
    pairs_ds: ray.data.Dataset,
    sig_ref,
    seeds: dict | None = None,
    lang_rule: bool = True,
    exact_text_rule: bool = True,
    alias_pairs=None,
    # 4096 keeps every temporary a few MB: small enough to stay in the malloc
    # arena and be reused across batches (fresh first-touch pages cost
    # ~300µs/page on virtualized hosts — measured 0.8s vs 34s for the same
    # work at batch 32768), big enough to amortize the kernel setup.
    batch_size: int = 4096,
) -> ray.data.Dataset:
    """pairs (block_key, id1, id2, …) → + FEATURE_COLS + score + constraint.

    One fused stateless stage: signature lookups are zero-copy views into
    plasma; no Python strings touch the pair stream, no per-pair Python runs.
    Feature values and the linear score are bit-identical to the string path
    (features.py) modulo 64-bit hash collisions."""
    from .constraints import canonical_alias_set

    seed_df = None
    if seeds:
        seed_df = pd.DataFrame(
            [(a, b, v) for (a, b), v in seeds.items()],
            columns=["id1", "id2", "__seed"])
    seeds_ref = ray.put(seed_df)
    alias_ref = ray.put(canonical_alias_set(alias_pairs))

    def _decode_ftok(sig: "DocSignatures", docs: np.ndarray) -> list[str]:
        rows = sig.ftok[docs]
        lens = sig.ftok_len[docs]
        return [bytes(rows[i, :lens[i]].view(np.uint8)).decode("utf-32-le")
                if lens[i] else "" for i in range(len(docs))]

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

        tok_sizes = np.diff(sig.tok_off)  # bag sizes (with dups)
        shg_sizes = np.diff(sig.shg_off)
        ch3_sizes = np.diff(sig.ch3_off)

        tset_i, tbag_i = pair_bag_stats(sig.tok_flat, sig.tok_off,
                                        sig.tok_ncodes, u1, u2, bag=True)
        sset_i, _ = pair_bag_stats(sig.shg_flat, sig.shg_off,
                                   sig.shg_ncodes, u1, u2)
        cset_i, _ = pair_bag_stats(sig.ch3_flat, sig.ch3_off,
                                   sig.ch3_ncodes, u1, u2)

        tj_u = _jaccard_from_inter(tset_i, sig.tok_nset[u1], sig.tok_nset[u2])
        sj_u = _jaccard_from_inter(sset_i, shg_sizes[u1], shg_sizes[u2])
        c3_u = _jaccard_from_inter(cset_i, ch3_sizes[u1], ch3_sizes[u2])
        # multiset counter-jaccard with denominator clamp (spec: strsim.py)
        bl1, bl2 = tok_sizes[u1], tok_sizes[u2]
        with np.errstate(divide="ignore", invalid="ignore"):
            cj_u = tbag_i / np.minimum(bl1 + bl2 - tbag_i, CJ_CLAMP)
        cj_u = np.where((bl1 > 0) & (bl2 > 0), cj_u, np.nan)

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

        jw_u = np.where(nonempty, jaro_winkler_batch_encoded(
            sig.ftok[u1], sig.ftok_len[u1], sig.ftok[u2], sig.ftok_len[u2]),
            np.nan)
        lcp_u = lcp_batch_encoded(sig.prefix[u1], sig.prefix_len[u1],
                                  sig.prefix[u2], sig.prefix_len[u2])
        pmin = np.minimum(sig.prefix_len[u1], sig.prefix_len[u2])
        ps_u = np.where(nonempty, lcp_u / np.maximum(pmin, 1), np.nan)
        if sig.ts_us is not None:
            td_u = np.minimum(
                np.abs(sig.ts_us[u1] - sig.ts_us[u2]).astype(np.float64)
                / 86400000000.0, TS_CLAMP_DAYS)
        else:
            td_u = np.full(len(u1), np.nan)

        tj, sj, lv, lr, lm = tj_u[inv], sj_u[inv], lv_u[inv], lr_u[inv], lm_u[inv]
        jw, c3, cj, ps, td = jw_u[inv], c3_u[inv], cj_u[inv], ps_u[inv], td_u[inv]
        # linear score — same association order as SCORE_SQL
        z = ((0.55 * np.nan_to_num(sj) + 0.25 * np.nan_to_num(tj))
             + 0.15 * np.nan_to_num(lv)) + 0.05 * np.nan_to_num(lr)
        score = np.minimum(1.0, np.maximum(0.0, z))

        # constraint chain (seeds > exact text > alias > lang), vectorized
        cons = np.full(n, np.nan)
        lang_eq = lang_eq_u[inv]
        if lang_rule:
            cons[~lang_eq] = 1.0e4
        aliases = _broadcast_get(alias_ref)
        if aliases:
            udocs = np.unique(np.concatenate([u1, u2]))
            toks = dict(zip(udocs, _decode_ftok(sig, udocs)))
            alias_u = np.fromiter(
                (tuple(sorted((toks[a], toks[b]))) in aliases
                 for a, b in zip(u1, u2)),
                dtype=bool, count=len(u1))
            cons[alias_u[inv]] = 0.0
        if exact_text_rule:
            exact_u = ((sig.text_md5[u1] == sig.text_md5[u2])
                       & (sig.text_len[u1] > 0) & lang_eq_u)
            exact = exact_u[inv]
            cons[exact] = 0.0
        sdf = _broadcast_get(seeds_ref)
        if sdf is not None:
            merged = pd.DataFrame({"id1": id1, "id2": id2}).merge(
                sdf, on=["id1", "id2"], how="left")["__seed"].to_numpy(object)
            cons[merged == "require"] = 0.0
            cons[merged == "disallow"] = 1.0e4

        def col(arr):
            return pa.array(arr, pa.float64(), from_pandas=True)

        return (
            batch.append_column("token_jaccard", col(tj))
            .append_column("shingle_jaccard", col(sj))
            .append_column("lev_sim", col(lv))
            .append_column("len_ratio", col(lr))
            .append_column("lang_match", col(lm))
            .append_column("jw_first", col(jw))
            .append_column("char3_jaccard", col(c3))
            .append_column("token_cjaccard", col(cj))
            .append_column("prefix_sim", col(ps))
            .append_column("ts_diff_days", col(td))
            .append_column("score", pa.array(score, pa.float64()))
            .append_column("constraint", col(cons))
        )

    return pairs_ds.map_batches(_fast, batch_format="pyarrow",
                                batch_size=batch_size)
