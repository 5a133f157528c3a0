"""Hashing / sketching determinism and accuracy."""

import numpy as np

from ent_res_feedback_ray.functions.hashing import (
    band_keys,
    estimate_minhash_jaccard,
    fnv1a64,
    fnv1a64_scalar,
    hamming64,
    hamming64_batch,
    md5_hex,
    minhash_params,
    minhash_signature,
    rolling_fingerprints,
    simhash64,
)


def test_fnv_vectorized_matches_scalar():
    strs = ["", "a", "abc", "hello world", "日本語", "x" * 100]
    vec = fnv1a64(strs)
    for s, h in zip(strs, vec):
        assert int(h) == fnv1a64_scalar(s)


def test_md5_matches_duckdb():
    import duckdb

    con = duckdb.connect()
    for s in ["", "abc", "hello world"]:
        assert md5_hex(s) == con.execute("select md5(?)", [s]).fetchone()[0]


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(0)
    a, b = minhash_params(256, seed=42)
    # two sets with known jaccard 1/3 (100 shared / 300 union)
    all_items = [f"item{i}" for i in range(300)]
    h = fnv1a64(all_items)
    set1 = h[:200]
    set2 = h[100:]
    sig1 = minhash_signature(set1, a, b)
    sig2 = minhash_signature(set2, a, b)
    est = estimate_minhash_jaccard(sig1, sig2)
    assert abs(est - 1 / 3) < 0.08


def test_minhash_deterministic():
    a1, b1 = minhash_params(64, seed=42)
    a2, b2 = minhash_params(64, seed=42)
    assert (a1 == a2).all() and (b1 == b2).all()
    h = fnv1a64(["x", "y", "z"])
    assert (minhash_signature(h, a1, b1) == minhash_signature(h, a2, b2)).all()


def test_band_keys():
    a, b = minhash_params(64, seed=1)
    h = fnv1a64(["p", "q"])
    sig = minhash_signature(h, a, b)
    k1 = band_keys(sig, 16)
    k2 = band_keys(sig, 16)
    assert k1 == k2 and len(k1) == 16
    # different band index ⇒ (almost surely) different key even if rows equal
    const_sig = np.zeros(64, dtype=np.uint64)
    assert len(set(band_keys(const_sig, 16))) == 16


def test_simhash_near_vs_far():
    toks_a = [f"w{i}" for i in range(50)]
    toks_b = toks_a[:45] + [f"v{i}" for i in range(5)]   # near-dup
    toks_c = [f"z{i}" for i in range(50)]                # unrelated
    ha = simhash64(fnv1a64(toks_a))
    hb = simhash64(fnv1a64(toks_b))
    hc = simhash64(fnv1a64(toks_c))
    assert hamming64(ha, hb) < hamming64(ha, hc)
    assert hamming64(ha, ha) == 0


def test_hamming_batch():
    xs = np.array([0, 0xFF, 0xF0F0], dtype=np.uint64)
    ys = np.array([0, 0x0F, 0x0F0F], dtype=np.uint64)
    assert hamming64_batch(xs, ys).tolist() == [0, 4, 16]


def test_rolling_fingerprints_deterministic_and_local():
    s = "the quick brown fox jumps over the lazy dog " * 3
    f1 = rolling_fingerprints(s)
    assert f1 == rolling_fingerprints(s)
    # a local edit changes only some fingerprints
    s2 = s.replace("quick", "quack", 1)
    f2 = rolling_fingerprints(s2)
    shared = set(f1) & set(f2)
    assert len(shared) > 0.5 * min(len(f1), len(f2))


def test_simhash64_segmented_parity():
    """Vectorized segmented SimHash == per-doc simhash64 over random corpora
    with empty docs, across chunk boundaries (round-3 verdict polish)."""
    from itertools import chain

    import numpy as np

    from ent_res_feedback_ray.functions.hashing import (
        fnv1a64,
        simhash64,
        simhash64_segmented,
    )

    rng = np.random.default_rng(5)
    vocab = [f"tok{i}" for i in range(300)]
    docs = []
    for _ in range(300):
        k = int(rng.integers(0, 40))
        docs.append(" ".join(rng.choice(vocab, size=k)) if k else "")
    ref = []
    for s in docs:
        toks = s.split()
        if not toks:
            ref.append(0)
            continue
        uniq, counts = np.unique(np.array(toks), return_counts=True)
        ref.append(simhash64(fnv1a64(list(uniq)), counts.astype(np.float64)))
    ref = np.array(ref, dtype=np.uint64)

    tok_lists = [s.split() for s in docs]
    lens = np.fromiter((len(x) for x in tok_lists), np.int64)
    h = fnv1a64(list(chain.from_iterable(tok_lists)))
    doc = np.repeat(np.arange(len(docs)), lens)
    order = np.lexsort((h, doc))
    hs_, ds_ = h[order], doc[order]
    first = np.concatenate([[True], (hs_[1:] != hs_[:-1]) | (ds_[1:] != ds_[:-1])])
    starts = np.nonzero(first)[0]
    cnt = np.diff(np.append(starts, len(hs_)))
    uh, ud = hs_[first], ds_[first]
    seg_starts = np.searchsorted(ud, np.arange(len(docs)))
    for chunk in (13, 97, 65_536):   # force many / few chunk boundaries
        got = simhash64_segmented(uh, cnt, seg_starts, chunk_rows=chunk)
        assert np.array_equal(ref, got)
