"""Hot-path featurization against SHARDED broadcast per-doc signatures.

The string-based featurizer (stages/features.py — the oracle-parity spec)
materializes two Python strings per pair row; at millions of pairs that is
memory-bandwidth-bound and stops scaling with cores.  This module keeps the
pair stream as ``(block_key, id1, id2)`` integers and computes the SAME
feature values from compact per-doc signatures:

- per doc: sorted 48-bit-masked hashes of its token BAG (dups kept, for the
  multiset counter-jaccard), its word-3-gram shingle set and its char-3-gram
  set (CSR layout: one flat array + offsets), the UTF-32 prefix matrix for
  Myers Levenshtein / LCP, the UTF-32 first-token matrix for Jaro-Winkler,
  normalized length, lang hash, warc_ts (µs), text md5;
- the table is SHARDED by doc-id range: a distributed sort + one assembly
  RAY TASK per range builds each shard's numpy arrays INSIDE a worker and
  leaves them in the object store — the driver only ever holds shard
  boundary ids and ObjectRefs.  This matters beyond memory: on virtualized
  hosts, first-touch page faults cost ~100µs/page in a single process, so a
  driver-side concatenation of a multi-GB signature table serializes into
  minutes; sharded assembly faults in parallel across workers;
- workers ``ray.get`` each shard once (zero-copy plasma views, cached per
  process) and gather a small BATCH-LOCAL doc table per batch — kernels run
  on batch-local CSR with zero per-pair Python and zero per-batch sorts
  (slices are pre-sorted; keys pack as owner·2⁴⁸ + value48);
- values are bit-identical to the string-set path unless a 48-bit collision
  occurs inside one document's bag union (probability ~n_tokens²/2⁴⁸).

Empty-side semantics match the spec exactly: any jaccard with an empty side
is NaN (NOT 0.0 — see strsim.jaccard / counter_jaccard).

Scale boundary: the sharded table must fit the cluster object store
(~300 bytes + ~24·tokens per doc).  Beyond that, resolve_pages falls back
to the ``attach_attrs`` join path (stages/shuffleops.py).

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
    jaro_winkler_batch_encoded,
    lcp_batch_encoded,
    levenshtein_batch_myers_encoded,
)
from .features import CHAR3_PREFIX, CJ_CLAMP, FTOK_LEN, LEV_PREFIX, TS_CLAMP_DAYS

# hash values are masked to 48 bits so (owner<<48 | value) packs into a
# positive int64 for up-to-32768-pair batches — no global code dictionary
_VAL_BITS = 48
_VAL_SPACE = np.int64(1) << np.int64(_VAL_BITS)
_FNV_PRIME = np.uint64(0x100000001B3)


def _mask48(vals: np.ndarray) -> np.ndarray:
    """Mix-then-truncate uint64 → 48-bit int64 (well-distributed)."""
    with np.errstate(over="ignore"):
        mixed = vals * _FNV_PRIME
    return (mixed >> np.uint64(16)).astype(np.int64)


class DocSignatures:
    """One SHARD of the columnar per-doc signature table (all numpy)."""

    __slots__ = ("ids", "tok_flat", "tok_off", "tok_nset",
                 "shg_flat", "shg_off", "ch3_flat", "ch3_off",
                 "prefix", "prefix_len", "ftok", "ftok_len",
                 "text_len", "lang_code", "text_md5", "ts_us")

    def __init__(self, **kw):
        for k in self.__slots__:
            setattr(self, k, kw[k])


class ShardedSignatures:
    """Handle: a routing index (sorted doc ids → shard, local position) +
    shard ObjectRefs.  The route is itself plasma-resident behind
    ``route_ref`` and resolved lazily on first access — so building the
    handle never blocks the driver, and the shard/route tasks overlap with
    whatever Dataset stage executes next (the blocking shuffle, in
    resolve_pages).  Workers resolve it zero-copy once per process (the
    handle instance is cached by ``_broadcast_get``)."""

    __slots__ = ("_route", "route_ref", "refs", "have_ts")

    def __init__(self, route_ref, refs, have_ts, _route=None):
        self.route_ref = route_ref
        self.refs = refs
        self.have_ts = have_ts
        self._route = _route

    def _resolve(self):
        if self._route is None:
            self._route = ray.get(self.route_ref)
        return self._route

    @property
    def route_ids(self):
        return self._resolve()[0]

    @property
    def route_shard(self):
        return self._resolve()[1]

    @property
    def route_local(self):
        return self._resolve()[2]

    def __getstate__(self):
        # never ship resolved route arrays inside the pickled handle — the
        # route stays one shared plasma object (workers re-resolve lazily).
        # A ref-less handle (empty corpus) ships its tiny inline route.
        return (self.route_ref, self.refs, self.have_ts,
                self._route if self.route_ref is None else None)

    def __setstate__(self, st):
        self.route_ref, self.refs, self.have_ts, self._route = st


@ray.remote
def _route_task(*id_lists):
    """Assemble the sorted routing index from per-shard id arrays — runs in
    a worker so the driver never serializes on an O(docs) concatenate/sort
    (round-2 verdict: that build was a measurable serial stage)."""
    ids = (np.concatenate(id_lists) if id_lists
           else np.empty(0, np.int64)).astype(np.int64)
    shard = np.repeat(np.arange(len(id_lists), dtype=np.int64),
                      [len(x) for x in id_lists])
    local = (np.concatenate([np.arange(len(x), dtype=np.int64)
                             for x in id_lists]) if id_lists
             else np.empty(0, np.int64))
    o = np.argsort(ids, kind="stable")
    return ids[o], shard[o], local[o]


def _sig_batch(t: pa.Table, id_col: str, norm_col: str, lang_col: str,
               ts_col: str, have_ts: bool) -> pa.Table:
    """Batch-vectorized signature build: ONE columnar fnv pass over all
    tokens of the batch; shingle hashes derived arithmetically from
    consecutive token hashes; char-3-grams as packed codepoint triples;
    per-doc sort/dedup via one lexsort.  The only per-doc Python is the
    cheap split/encode/md5."""
    from itertools import chain

    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    norms = t.column(norm_col).to_pylist()
    langs = t.column(lang_col).to_pylist()
    n = len(norms)
    tok_lists = [(s or "").split() for s in norms]
    counts = np.fromiter((len(x) for x in tok_lists), np.int64, count=n)
    th = fnv1a64(list(chain.from_iterable(tok_lists)))
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)

    def _sorted_dedup_csr(vals: np.ndarray, doc: np.ndarray):
        """(masked values, owning doc) → per-doc sorted DISTINCT CSR."""
        if len(vals) == 0:
            return np.empty(0, np.int64), np.zeros(n + 1, np.int64)
        order = np.lexsort((vals, doc))
        v, d = vals[order], doc[order]
        keep = np.concatenate([[True], (v[1:] != v[:-1]) | (d[1:] != d[:-1])])
        v, d = v[keep], d[keep]
        c = np.bincount(d, minlength=n)
        return v, np.concatenate([[0], np.cumsum(c)]).astype(np.int64)

    # token BAG (masked, per-doc sorted, dups kept) + distinct count
    tm = _mask48(th)
    if len(tm):
        order = np.lexsort((tm, doc_idx))
        tok_sorted = tm[order]
        dsort = doc_idx[order]
        first = np.concatenate(
            [[True], (tok_sorted[1:] != tok_sorted[:-1])
             | (dsort[1:] != dsort[:-1])])
        nsets = np.bincount(dsort[first], minlength=n).astype(np.int64)
    else:
        tok_sorted = tm
        nsets = np.zeros(n, np.int64)
    tok_off = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

    # shingles: hash-combine consecutive token hashes (same-doc triples);
    # docs with 1-2 tokens emit ONE shingle = fnv of the joined words
    if len(th) >= 3:
        with np.errstate(over="ignore"):
            tri = (th[:-2] * _FNV_PRIME + th[1:-1]) * _FNV_PRIME + th[2:]
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
    shg_flat, shg_off = _sorted_dedup_csr(_mask48(sh_vals), sh_doc)

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
        sm = (Mu[csmall, 0] * S21 + Mu[csmall, 1]) * S21 + Mu[csmall, 2]
        c3_vals = np.concatenate([c3_vals, sm])
        c3_doc = np.concatenate([c3_doc, csmall.astype(np.int64)])
    ch3_flat, ch3_off = _sorted_dedup_csr(_mask48(c3_vals), c3_doc)

    # lang as a stable hash (NOT a factorization — codes must agree across
    # shards without a global pass)
    lang_codes = _mask48(fnv1a64([x or "" for x in langs]))

    def _list_col(flat: np.ndarray, off: np.ndarray) -> pa.Array:
        return pa.LargeListArray.from_arrays(
            pa.array(off, pa.int64()),
            pa.array(flat.astype(np.int64), pa.int64()))

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
        "lang_code": pa.array(lang_codes, pa.int64()),
    }
    if have_ts:
        ts = t.column(ts_col).to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        cols["ts_us"] = pa.array(ts, pa.int64())
    return pa.table(cols)


def _assemble_shard(tbl: pa.Table, have_ts: bool) -> DocSignatures:
    """One map-output block → a DocSignatures shard sorted by doc id (runs
    in a TASK; the arrays fault in that worker, in parallel with the other
    shards, and return to the object store)."""
    tbl = tbl.combine_chunks()
    order = np.argsort(tbl.column("doc_id").to_numpy(), kind="stable")
    tbl = tbl.take(pa.array(order, pa.int64()))
    ids = tbl.column("doc_id").to_numpy().astype(np.int64)

    def _flat_csr(name: str):
        col = tbl.column(name).combine_chunks()
        data = col.values.to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False)
        off = col.offsets.to_numpy().astype(np.int64)
        return np.ascontiguousarray(data), off

    def _flat_mat(name: str, width: int) -> np.ndarray:
        col = tbl.column(name).combine_chunks()
        return np.frombuffer(b"".join(col.to_pylist()),
                             dtype=np.uint32).reshape(len(ids), width)

    tok_flat, tok_off = _flat_csr("tok")
    shg_flat, shg_off = _flat_csr("shg")
    ch3_flat, ch3_off = _flat_csr("ch3")
    prefix = _flat_mat("prefix", LEV_PREFIX)
    ftok = _flat_mat("ftok", FTOK_LEN)
    text_len = tbl.column("text_len").to_numpy().astype(np.int64)
    return DocSignatures(
        ids=ids,
        tok_flat=tok_flat, tok_off=tok_off,
        tok_nset=tbl.column("nset").to_numpy().astype(np.int64),
        shg_flat=shg_flat, shg_off=shg_off,
        ch3_flat=ch3_flat, ch3_off=ch3_off,
        prefix=np.ascontiguousarray(prefix),
        prefix_len=np.minimum(text_len, LEV_PREFIX).astype(np.int64),
        ftok=np.ascontiguousarray(ftok),
        ftok_len=(ftok != 0).sum(axis=1).astype(np.int64),
        text_len=text_len,
        lang_code=tbl.column("lang_code").to_numpy().astype(np.int64),
        text_md5=tbl.column("md5").to_numpy().astype(np.int64),
        ts_us=(tbl.column("ts_us").to_numpy().astype(np.int64)
               if have_ts else None),
    )


@ray.remote(num_returns=2)
def _sig_shard_task(id_col: str, norm_col: str,
                    lang_col: str, ts_col: str, have_ts: bool, *tbls):
    """A GROUP of norm blocks → one assembled shard, FUSED in a single task:
    the intermediate signature table never hits the object store (halves the
    plasma write volume — a SERIAL cost on fault-throttled hosts).  Groups
    keep the shard count ~ CPU count: batch-local gathers downstream
    (``_local_signatures``) pay a fixed cost per shard RUN, so hundreds of
    micro-shards tax every featurize batch."""
    chunks = []
    for tbl in tbls:
        for lo in range(0, tbl.num_rows, 8192):
            chunks.append(_sig_batch(tbl.slice(lo, 8192), id_col, norm_col,
                                     lang_col, ts_col, have_ts))
    if not chunks:
        # a group of all-empty blocks (nondeterministic block layout):
        # produce a typed empty shard instead of concat_tables([]) raising.
        # The empty table must honor have_ts — _assemble_shard reads ts_us
        # when the corpus carries timestamps (the normal ER case).
        cols = {id_col: pa.array([], pa.int64()),
                norm_col: pa.array([], pa.string()),
                lang_col: pa.array([], pa.string())}
        if have_ts:
            cols[ts_col] = pa.array([], pa.timestamp("us"))
        chunks.append(_sig_batch(pa.table(cols), id_col, norm_col,
                                 lang_col, ts_col, have_ts))
    sig = _assemble_shard(pa.concat_tables(chunks), have_ts)
    return sig.ids, sig


def build_doc_signatures(norm_ds: ray.data.Dataset, id_col: str = "doc_id",
                         norm_col: str = "norm_text",
                         lang_col: str = "lang",
                         ts_col: str = "warc_ts",
                         max_shards: int | None = None) -> ShardedSignatures:
    """Distributed signature build: map_batches sketching → distributed sort
    by doc id → ONE assembly task per sorted block.  The driver touches only
    shard boundaries and ObjectRefs; every heavy array faults inside a
    worker, in parallel, and lives in the object store."""
    import os as _os
    import time as _time

    _prof = bool(_os.environ.get("GRAFT_SIG_PROFILE"))

    def _tick(label, s):
        if _prof:
            print(f"SIGPROF {label} {_time.perf_counter() - s:.2f}", flush=True)
        return _time.perf_counter()

    have_ts = ts_col in norm_ds.schema().names
    s = _time.perf_counter()
    # NO shuffle, NO intermediate: every input block (disjoint docs) becomes
    # one shard via a single fused task; lookup goes through a tiny sorted
    # routing index instead of ranges
    block_refs = norm_ds.to_arrow_refs()
    s = _tick("refs", s)
    # shard count tracks the cluster, not the input block count: each shard
    # builds in its own task (parallelism = n_shards ≈ CPUs), while the
    # featurize stage's per-batch gather pays per shard RUN — 128 input
    # micro-blocks as 128 shards made every batch 4× more expensive than 32
    ncpu = max(1, int(ray.cluster_resources().get("CPU", 8)))
    if not block_refs:
        cols = {id_col: pa.array([], pa.int64()),
                norm_col: pa.array([], pa.string()),
                lang_col: pa.array([], pa.string())}
        if have_ts:  # the empty shard must still carry ts_us when the
            cols[ts_col] = pa.array([], pa.timestamp("us"))  # handle says so
        empty = _assemble_shard(
            _sig_batch(pa.table(cols), id_col, norm_col, lang_col, ts_col,
                       have_ts), have_ts)
        z = np.empty(0, np.int64)
        return ShardedSignatures(None, [ray.put(empty)], have_ts,
                                 _route=(z, z, z))
    n_shards = max(1, min(len(block_refs), max_shards or ncpu))
    groups = [block_refs[i::n_shards] for i in range(n_shards)]
    id_refs, sig_refs = [], []
    for grp in groups:
        ids_ref, sref = _sig_shard_task.remote(
            id_col, norm_col, lang_col, ts_col, have_ts, *grp)
        id_refs.append(ids_ref)
        sig_refs.append(sref)
    # NO driver ray.get: the route assembles in a worker task; the handle
    # carries its ObjectRef and callers keep building the (lazy) Dataset
    # graph — shard + route tasks execute CONCURRENTLY with the next stage's
    # execution (e.g. the blocking shuffle) instead of serializing before it
    route_ref = _route_task.remote(*id_refs)
    handle = ShardedSignatures(route_ref, sig_refs, have_ts)
    _tick("launch", s)
    return handle


# ---------------------------------------------------------------------------
# Vectorized CSR pair-intersection kernel (zero per-pair Python, zero sorts)
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


def pair_bag_stats(flat: np.ndarray, off: np.ndarray,
                   u1: np.ndarray, u2: np.ndarray, bag: bool = False,
                   return_matched: bool = False):
    """Per pair k: |set(A)∩set(B)| (and the multiset intersection when
    ``bag``) over the CSR slices of docs u1[k], u2[k].

    Zero sorts: values are 48-bit, slices pre-sorted, so
    ``owner·2⁴⁸ + value`` is globally sorted by construction — intersections
    reduce to one ``searchsorted`` between two pre-sorted key streams."""
    m = len(u1)
    if m == 0:
        z = np.zeros(0, np.int64)
        return z, z
    assert m <= (1 << 15), "batch too large for 48-bit key packing"
    v1, p1, _ = _gather_csr(flat, off, u1)
    v2, p2, _ = _gather_csr(flat, off, u2)
    if len(v1) == 0 or len(v2) == 0:
        z = np.zeros(m, np.int64)
        return z, z.copy()
    k1 = p1 * _VAL_SPACE + v1
    k2 = p2 * _VAL_SPACE + v2
    if bag:
        uk1, n1 = _rle_sorted(k1)
        uk2, n2 = _rle_sorted(k2)
    else:  # set slices have no dups — every key is already unique
        uk1, n1 = k1, None
        uk2, n2 = k2, None
    pos = np.searchsorted(uk2, uk1)
    pos_c = np.minimum(pos, len(uk2) - 1)
    match = uk2[pos_c] == uk1
    mp = uk1[match] // _VAL_SPACE
    set_inter = np.bincount(mp, minlength=m).astype(np.int64)
    if return_matched:
        # (pair index, intersected value) per matched SET element — feeds
        # value-dependent pair aggregates (e.g. corpus-DF min/max over
        # shared tokens)
        return set_inter, (mp, uk1[match] - mp * _VAL_SPACE)
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


def batch_pair_shingle_jaccard(texts1, texts2, n: int = 3) -> np.ndarray:
    """EXACT word-n-gram set Jaccard for aligned text pairs, vectorized.

    Shingle extraction runs once per UNIQUE text in the batch (dedup verify
    batches repeat the same hot documents many times); shingle strings are
    factorized to integer codes with one ``np.unique`` (exact — no hash
    collisions), per-text slices become a sorted CSR, and the per-pair
    intersection reuses ``pair_bag_stats``'s searchsorted kernel — zero
    per-pair Python.  NaN semantics match ``functions.strsim.jaccard``
    (either side empty → NaN)."""
    from ..functions.textnorm import word_ngrams

    m = len(texts1)
    if m == 0:
        return np.empty(0, np.float64)
    all_txt = np.asarray(
        [t if t is not None else "" for t in list(texts1) + list(texts2)],
        dtype=object)
    uniq, inv = np.unique(all_txt, return_inverse=True)
    shingles: list[str] = []
    lens = np.empty(len(uniq), np.int64)
    for i, s in enumerate(uniq):
        sh = set(word_ngrams(s.split(), n)) if s else ()
        lens[i] = len(sh)
        shingles.extend(sh)
    if shingles:
        _, codes = np.unique(np.asarray(shingles, dtype=object),
                             return_inverse=True)
        codes = codes.astype(np.int64)
    else:
        codes = np.empty(0, np.int64)
    off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    # sort codes within each text's slice (owner-major key keeps slices
    # contiguous; pair_bag_stats needs sorted, duplicate-free slices)
    owner = np.repeat(np.arange(len(uniq), dtype=np.int64), lens)
    order = np.argsort(owner * (len(codes) + 1) + codes, kind="stable")
    flat = codes[order]
    u1, u2 = inv[:m], inv[m:]
    out = np.empty(m, np.float64)
    chunk = 1 << 15  # pair_bag_stats 48-bit key-packing bound
    for lo in range(0, m, chunk):
        hi = min(lo + chunk, m)
        inter, _ = pair_bag_stats(flat, off, u1[lo:hi], u2[lo:hi])
        out[lo:hi] = _jaccard_from_inter(inter, lens[u1[lo:hi]],
                                         lens[u2[lo:hi]])
    return out


_MERGED_CACHE: dict = {}
_MERGED_CACHE_SLOTS = 4
"""Small LRU: a worker interleaving batches from two concurrent featurize
stages (two corpora / two handles) must not rebuild the up-to-256MB merged
table on every batch — clear-then-insert did exactly that (round-3 ADVICE).
dict preserves insertion order; eviction pops the oldest key."""


def _merged_cache_put(key, value):
    while len(_MERGED_CACHE) >= _MERGED_CACHE_SLOTS:
        _MERGED_CACHE.pop(next(iter(_MERGED_CACHE)))
    _MERGED_CACHE[key] = value
    return value
_MERGED_LIMIT_BYTES = 256 << 20
"""Per-worker cap on the merged-signature private copy.  Below the cap a
worker concatenates all plasma shards ONCE and every featurize batch indexes
the merged table directly (no per-batch gather — the gather was ~40% of
featurize CPU and pure allocator churn).  Above it, batches fall back to the
batch-local gather (bounded memory, zero-copy plasma views)."""


def _merged_signatures(handle: ShardedSignatures, shards: list):
    """(merged DocSignatures with GLOBAL rows, rowmap aligned to
    handle.route_ids) — cached per worker process in a small LRU keyed by
    handle identity.  Returns None when the table exceeds
    ``_MERGED_LIMIT_BYTES``."""
    key = ((handle.refs[0].hex(), len(handle.refs))
           if handle.refs else ("empty", 0))
    if key in _MERGED_CACHE:
        # refresh LRU recency (dict preserves insertion order)
        return _MERGED_CACHE[key] if key == next(reversed(_MERGED_CACHE)) \
            else _merged_cache_put(key, _MERGED_CACHE.pop(key))
    nbytes = sum(sd.tok_flat.nbytes + sd.shg_flat.nbytes + sd.ch3_flat.nbytes
                 + sd.prefix.nbytes + sd.ftok.nbytes + sd.ids.nbytes * 6
                 for sd in shards)
    if nbytes > _MERGED_LIMIT_BYTES:
        return _merged_cache_put(key, None)
    base_rows = np.cumsum([0] + [len(sd.ids) for sd in shards])[:-1]
    rowmap = base_rows[handle.route_shard] + handle.route_local

    def cat(name):
        return np.concatenate([getattr(sd, name) for sd in shards])

    def cat_csr(fname, oname):
        flats = [getattr(sd, fname) for sd in shards]
        offs = [getattr(sd, oname) for sd in shards]
        bases = np.cumsum([0] + [len(f) for f in flats])
        flat = (np.concatenate(flats) if flats else np.empty(0, np.int64))
        off = np.concatenate(
            [np.zeros(1, np.int64)]
            + [o[1:] + b for o, b in zip(offs, bases[:-1])]).astype(np.int64)
        return flat, off

    tok_flat, tok_off = cat_csr("tok_flat", "tok_off")
    shg_flat, shg_off = cat_csr("shg_flat", "shg_off")
    ch3_flat, ch3_off = cat_csr("ch3_flat", "ch3_off")
    sig = DocSignatures(
        ids=cat("ids"),
        tok_flat=tok_flat, tok_off=tok_off, tok_nset=cat("tok_nset"),
        shg_flat=shg_flat, shg_off=shg_off,
        ch3_flat=ch3_flat, ch3_off=ch3_off,
        prefix=cat("prefix"),
        prefix_len=cat("prefix_len"),
        ftok=cat("ftok"),
        ftok_len=cat("ftok_len"),
        text_len=cat("text_len"),
        lang_code=cat("lang_code"),
        text_md5=cat("text_md5"),
        ts_us=cat("ts_us") if handle.have_ts else None,
    )
    return _merged_cache_put(key, (sig, rowmap))


def _local_signatures(handle: ShardedSignatures, shards: list,
                      uids: np.ndarray) -> DocSignatures:
    """Gather a BATCH-LOCAL signature table for the (sorted, unique) doc ids
    of one batch — small fresh arrays that the worker's arena reuses.  Rows
    come out aligned to ``uids`` order regardless of shard layout."""
    pos = np.searchsorted(handle.route_ids, uids)
    sh = handle.route_shard[pos]
    loc = handle.route_local[pos]
    order = np.argsort(sh, kind="stable")   # shard-major build order
    # the local table is built in SHARD-MAJOR order; callers translate uid
    # index j → local row inv[j] (one indirection instead of re-gathering
    # every CSR slice a second time — the batch-local copy is the hot path's
    # main memory traffic)
    inv = np.empty(len(uids), np.int64)
    inv[order] = np.arange(len(uids))
    sh_o, loc_o = sh[order], loc[order]
    runs = np.flatnonzero(np.concatenate(
        [[True], sh_o[1:] != sh_o[:-1]])) if len(sh_o) else np.empty(0, np.int64)
    ends = np.append(runs[1:], len(sh_o))
    parts = [(shards[sh_o[rs]], loc_o[rs:re]) for rs, re in zip(runs, ends)]

    def cat(name):
        return np.concatenate([getattr(sd, name)[lc] for sd, lc in parts])

    def cat_csr(fname, oname):
        flats, lens_all = [], []
        for sd, lc in parts:
            flat, off = getattr(sd, fname), getattr(sd, oname)
            v, _, lens = _gather_csr(flat, off, lc)
            flats.append(v)
            lens_all.append(lens)
        flat_sm = (np.concatenate(flats) if flats else np.empty(0, np.int64))
        lens_sm = (np.concatenate(lens_all) if lens_all
                   else np.empty(0, np.int64))
        off = np.concatenate([[0], np.cumsum(lens_sm)]).astype(np.int64)
        return flat_sm, off

    tok_flat, tok_off = cat_csr("tok_flat", "tok_off")
    shg_flat, shg_off = cat_csr("shg_flat", "shg_off")
    ch3_flat, ch3_off = cat_csr("ch3_flat", "ch3_off")
    sig = DocSignatures(
        ids=uids[order],  # row-aligned (shard-major) doc ids
        tok_flat=tok_flat, tok_off=tok_off, tok_nset=cat("tok_nset"),
        shg_flat=shg_flat, shg_off=shg_off,
        ch3_flat=ch3_flat, ch3_off=ch3_off,
        prefix=cat("prefix"),
        prefix_len=cat("prefix_len"),
        ftok=cat("ftok"),
        ftok_len=cat("ftok_len"),
        text_len=cat("text_len"),
        lang_code=cat("lang_code"),
        text_md5=cat("text_md5"),
        ts_us=cat("ts_us") if handle.have_ts else None,
    )
    return sig, inv


def featurize_and_score_fast(
    pairs_ds: ray.data.Dataset,
    sig_ref,
    seeds: dict | None = None,
    lang_rule: bool = True,
    exact_text_rule: bool = True,
    alias_pairs=None,
    # corpus-DF side input for the df_min/max_shared pair features:
    # tokendf.ShardedTokenDF handle (production) or an ObjectRef of a
    # single (sorted int64 keys, int64 counts) tuple; None → NaN columns
    token_df_ref=None,
    # 4096 pairs/batch balances per-batch fixed work (shard-local gathers)
    # against per-worker arena footprint (~20 MB, faulted once per worker —
    # callers that care warm the pool first; see bench.run_er_scaled).
    batch_size: int = 16384,
) -> ray.data.Dataset:
    """pairs (block_key, id1, id2, …) → + FEATURE_COLS + score + constraint.

    One fused stateless stage: shard lookups are zero-copy views into
    plasma; no Python strings touch the pair stream, no per-pair Python
    runs.  Feature values and the linear score are bit-identical to the
    string path (features.py) modulo 48-bit hash collisions."""
    from .constraints import canonical_alias_set

    seed_df = None
    if seeds:
        seed_df = pd.DataFrame(
            [(a, b, v) for (a, b), v in seeds.items()],
            columns=["id1", "id2", "__seed"])
    seeds_ref = ray.put(seed_df)
    alias_ref = ray.put(canonical_alias_set(alias_pairs))

    def _decode_ftok(sig: DocSignatures, idx: np.ndarray) -> list[str]:
        rows = sig.ftok[idx]
        lens = sig.ftok_len[idx]
        return [bytes(rows[i, :lens[i]].view(np.uint8)).decode("utf-32-le")
                if lens[i] else "" for i in range(len(idx))]

    def _fast(batch: pa.Table) -> pa.Table:
        from .shuffleops import _broadcast_get

        handle: ShardedSignatures = _broadcast_get(sig_ref)
        shards = [_broadcast_get(r) for r in handle.refs]
        n = batch.num_rows
        id1 = batch.column("id1").to_numpy(zero_copy_only=False)
        id2 = batch.column("id2").to_numpy(zero_copy_only=False)

        merged = _merged_signatures(handle, shards)
        if merged is not None:
            # fast path: ONE per-worker merged table; batches index global
            # rows directly — no per-batch signature gather at all
            sig, rowmap = merged
            nrows = len(sig.ids)
            li1 = rowmap[np.searchsorted(handle.route_ids, id1)]
            li2 = rowmap[np.searchsorted(handle.route_ids, id2)]
        else:
            # big-table path: batch-local doc table for this batch's unique
            # docs (rows in shard-major order; ``inv_row`` maps sorted-uid
            # index → local row) — bounded memory, zero-copy plasma views
            uids = np.unique(np.concatenate([id1, id2]))
            sig, inv_row = _local_signatures(handle, shards, uids)
            nrows = len(uids)
            li1 = inv_row[np.searchsorted(uids, id1)]
            li2 = inv_row[np.searchsorted(uids, id2)]

        # unique doc-pairs within the batch (blocks repeat docs heavily)
        key = li1.astype(np.int64) * max(nrows, 1) + li2
        uniq, inv = np.unique(key, return_inverse=True)
        u1 = (uniq // max(nrows, 1)).astype(np.int64)
        u2 = (uniq % max(nrows, 1)).astype(np.int64)

        tok_sizes = np.diff(sig.tok_off)  # bag sizes (with dups)
        shg_sizes = np.diff(sig.shg_off)
        ch3_sizes = np.diff(sig.ch3_off)

        tset_i, tbag_i = pair_bag_stats(sig.tok_flat, sig.tok_off,
                                        u1, u2, bag=True)
        sset_i, _ = pair_bag_stats(sig.shg_flat, sig.shg_off, u1, u2)
        cset_i, _ = pair_bag_stats(sig.ch3_flat, sig.ch3_off, u1, u2)

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

        # corpus-DF features: min/max document frequency over the SHARED
        # tokens (reference name_counts analog — see features.FEATURE_GROUPS).
        # The side input is the ONE unified format (tokendf.ShardedTokenDF /
        # legacy (keys, counts) tuple ref) shared with the string path.
        from .tokendf import resolve_view

        view = resolve_view(token_df_ref)
        if view is None:
            dmn_u = np.full(len(u1), np.nan)
            dmx_u = dmn_u
        else:
            m_u = len(u1)
            # matched (pair, value) stream over the token bag — dup slices
            # repeat a value within a pair, which min/max ignores.  A miss
            # returns 1 ("rarer than the table" — see TokenDFView)
            _, (mpair, mvals) = pair_bag_stats(
                sig.tok_flat, sig.tok_off, u1, u2, return_matched=True)
            dfv = view.lookup_hashes(mvals)
            lo = np.full(m_u, np.inf)
            hi = np.full(m_u, -np.inf)
            np.minimum.at(lo, mpair, dfv)
            np.maximum.at(hi, mpair, dfv)
            has = np.zeros(m_u, bool)
            has[mpair] = True
            dmn_u = np.where(has, lo, np.nan)
            dmx_u = np.where(has, hi, np.nan)

        tj, sj, lv, lr, lm = tj_u[inv], sj_u[inv], lv_u[inv], lr_u[inv], lm_u[inv]
        jw, c3, cj, ps, td = jw_u[inv], c3_u[inv], cj_u[inv], ps_u[inv], td_u[inv]
        dmn, dmx = dmn_u[inv], dmx_u[inv]
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
            .append_column("df_min_shared", col(dmn))
            .append_column("df_max_shared", col(dmx))
            .append_column("score", pa.array(score, pa.float64()))
            .append_column("constraint", col(cons))
        )

    return pairs_ds.map_batches(_fast, batch_format="pyarrow",
                                batch_size=batch_size)
