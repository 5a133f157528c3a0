"""Hot-path featurizer (broadcast doc signatures) must agree with the
string-path spec featurizer bit-for-bit (modulo 64-bit hash collisions)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ent_res_feedback_ray.stages.fastfeatures import (
    build_doc_signatures,
    featurize_and_score_fast,
)
from ent_res_feedback_ray.stages.features import FEATURE_COLS, featurize_pairs_batch
from ent_res_feedback_ray.stages.scoring import linear_score_batch


def _docs():
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(40)]
    rows = []
    for d in range(60):
        n = int(rng.integers(0, 50))
        text = " ".join(rng.choice(words, size=n)) if n else ""
        rows.append({"doc_id": d, "url": f"u{d}", "norm_text": text,
                     "lang": "en" if d % 3 else "fr"})
    return pd.DataFrame(rows)


def test_fast_matches_string_path():
    docs = _docs()
    norm_ds = ray.data.from_pandas(docs)
    sig = build_doc_signatures(norm_ds)
    sig_ref = ray.put(sig)

    rng = np.random.default_rng(1)
    id1 = rng.integers(0, 60, 300)
    id2 = rng.integers(0, 60, 300)
    keep = id1 != id2
    pairs = pd.DataFrame({
        "block_key": "b",
        "id1": np.minimum(id1, id2)[keep],
        "id2": np.maximum(id1, id2)[keep],
        "pairs_possible": np.int64(1),
    })
    fast = featurize_and_score_fast(
        ray.data.from_pandas(pairs), sig_ref).to_pandas()

    # string-path spec on the same pairs
    lk = docs.set_index("doc_id")
    wide = pairs.copy()
    for side in ("1", "2"):
        wide[f"norm_text{side}"] = lk.loc[wide[f"id{side}"], "norm_text"].to_numpy()
        wide[f"lang{side}"] = lk.loc[wide[f"id{side}"], "lang"].to_numpy()
    spec = linear_score_batch(
        featurize_pairs_batch(pa.Table.from_pandas(wide))).to_pandas()

    fast = fast.sort_values(["id1", "id2"]).reset_index(drop=True)
    spec = spec.sort_values(["id1", "id2"]).reset_index(drop=True)
    for c in [*FEATURE_COLS, "score"]:
        a = fast[c].to_numpy(dtype=np.float64)
        b = spec[c].to_numpy(dtype=np.float64)
        same = (a == b) | (np.isnan(a) & np.isnan(b))
        assert same.all(), (c, np.nonzero(~same)[0][:5])


def test_fast_matches_string_path_with_ts():
    """warc_ts present → ts_diff_days must agree bit-for-bit; one doc is
    forced EMPTY so the empty-side NaN semantics are pinned on both paths."""
    docs = _docs()
    docs.loc[5, "norm_text"] = ""  # explicit empty vs nonempty pairs
    docs["warc_ts"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        docs["doc_id"] * 37, unit="m")
    docs["warc_ts"] = docs["warc_ts"].astype("datetime64[us]")
    sig_ref = ray.put(build_doc_signatures(ray.data.from_pandas(docs)))

    rng = np.random.default_rng(3)
    id1 = rng.integers(0, 60, 200)
    id2 = rng.integers(0, 60, 200)
    keep = id1 != id2
    pairs = pd.DataFrame({
        "block_key": "b",
        "id1": np.minimum(id1, id2)[keep],
        "id2": np.maximum(id1, id2)[keep],
        "pairs_possible": np.int64(1),
    })
    # force empty-doc pairs into the batch
    pairs = pd.concat([pairs, pd.DataFrame({
        "block_key": ["b", "b"], "id1": [2, 5], "id2": [5, 7],
        "pairs_possible": np.int64(1)})], ignore_index=True)
    fast = featurize_and_score_fast(
        ray.data.from_pandas(pairs), sig_ref).to_pandas()

    lk = docs.set_index("doc_id")
    wide = pairs.copy()
    for side in ("1", "2"):
        for c in ("norm_text", "lang", "warc_ts"):
            wide[f"{c}{side}"] = lk.loc[wide[f"id{side}"], c].to_numpy()
    spec = featurize_pairs_batch(pa.Table.from_pandas(wide)).to_pandas()

    fast = fast.sort_values(["id1", "id2"]).reset_index(drop=True)
    spec = spec.sort_values(["id1", "id2"]).reset_index(drop=True)
    for c in FEATURE_COLS:
        a = fast[c].to_numpy(dtype=np.float64)
        b = spec[c].to_numpy(dtype=np.float64)
        same = (a == b) | (np.isnan(a) & np.isnan(b))
        assert same.all(), (c, np.nonzero(~same)[0][:5])
    # empty-side rows: every jaccard is NaN, never 0.0
    e = fast[(fast.id1 == 5) | (fast.id2 == 5)]
    assert e["token_jaccard"].isna().all()
    assert e["token_cjaccard"].isna().all()


def test_fast_constraints():
    docs = _docs()
    # two docs with identical nonempty text and lang → require
    docs.loc[1, "norm_text"] = docs.loc[0, "norm_text"] = "same text here ok"
    docs.loc[1, "lang"] = docs.loc[0, "lang"] = "en"
    sig_ref = ray.put(build_doc_signatures(ray.data.from_pandas(docs)))
    pairs = pd.DataFrame({
        "block_key": ["b"] * 3,
        "id1": np.array([0, 0, 3], dtype=np.int64),
        "id2": np.array([1, 2, 4], dtype=np.int64),
        "pairs_possible": np.int64(1),
    })
    out = featurize_and_score_fast(
        ray.data.from_pandas(pairs), sig_ref,
        seeds={(3, 4): "disallow"}).to_pandas().set_index(["id1", "id2"])
    assert out.loc[(0, 1), "constraint"] == 0.0       # exact text → require
    assert out.loc[(3, 4), "constraint"] == 1.0e4     # seed disallow wins


def test_fast_path_many_shards():
    """Routing correctness with MANY signature shards: repartitioning the
    doc table must not change any feature value (shard layout is an
    implementation detail)."""
    docs = _docs()
    docs["warc_ts"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        docs["doc_id"] * 11, unit="m")
    docs["warc_ts"] = docs["warc_ts"].astype("datetime64[us]")
    rng = np.random.default_rng(9)
    id1 = rng.integers(0, 60, 250)
    id2 = rng.integers(0, 60, 250)
    keep = id1 != id2
    pairs = pd.DataFrame({
        "block_key": "b",
        "id1": np.minimum(id1, id2)[keep],
        "id2": np.maximum(id1, id2)[keep],
        "pairs_possible": np.int64(1),
    })
    outs = []
    for nshards in (1, 7):
        ds = ray.data.from_pandas(docs).repartition(nshards).materialize()
        sig = build_doc_signatures(ds, max_shards=nshards)
        assert len(sig.refs) == nshards
        out = featurize_and_score_fast(
            ray.data.from_pandas(pairs), ray.put(sig)).to_pandas()
        outs.append(out.sort_values(["id1", "id2"]).reset_index(drop=True))
    for c in [*FEATURE_COLS, "score"]:
        a = outs[0][c].to_numpy(np.float64)
        b = outs[1][c].to_numpy(np.float64)
        same = (a == b) | (np.isnan(a) & np.isnan(b))
        assert same.all(), c


def test_fast_df_features_parity():
    """Corpus-DF pair features (df_min_shared/df_max_shared): the broadcast
    fast path (hashed token keys) must match the string spec path given the
    same DF table."""
    from ent_res_feedback_ray.functions.hashing import fnv1a64
    from ent_res_feedback_ray.stages.fastfeatures import _mask48

    docs = _docs()
    norm_ds = ray.data.from_pandas(docs)
    sig_ref = ray.put(build_doc_signatures(norm_ds))

    # DF table from the docs themselves (DF >= 2 only, as in production)
    from collections import Counter
    cnt = Counter()
    for t in docs["norm_text"]:
        cnt.update(set(t.split()))
    token_df = {t: c for t, c in cnt.items() if c >= 2}
    toks = sorted(token_df)
    keys = _mask48(fnv1a64(toks))
    order = np.argsort(keys)
    hashed = (keys[order],
              np.array([token_df[toks[i]] for i in order], dtype=np.int64))

    rng = np.random.default_rng(11)
    id1 = rng.integers(0, 60, 300)
    id2 = rng.integers(0, 60, 300)
    keep = id1 != id2
    pairs = pd.DataFrame({
        "block_key": "b",
        "id1": np.minimum(id1, id2)[keep],
        "id2": np.maximum(id1, id2)[keep],
        "pairs_possible": np.int64(1),
    })
    fast = featurize_and_score_fast(
        ray.data.from_pandas(pairs), sig_ref,
        token_df_ref=ray.put(hashed)).to_pandas()

    from ent_res_feedback_ray.stages.features import featurize_pairs_batch
    lk = docs.set_index("doc_id")
    wide = pairs.copy()
    for side in ("1", "2"):
        wide[f"norm_text{side}"] = lk.loc[wide[f"id{side}"], "norm_text"].to_numpy()
        wide[f"lang{side}"] = lk.loc[wide[f"id{side}"], "lang"].to_numpy()
    spec = featurize_pairs_batch(pa.Table.from_pandas(wide),
                                 token_df=token_df).to_pandas()

    fast = fast.sort_values(["id1", "id2"]).reset_index(drop=True)
    spec = spec.sort_values(["id1", "id2"]).reset_index(drop=True)
    for c in ("df_min_shared", "df_max_shared"):
        a = fast[c].to_numpy(np.float64)
        b = spec[c].to_numpy(np.float64)
        same = (a == b) | (np.isnan(a) & np.isnan(b))
        assert same.all(), (c, np.nonzero(~same)[0][:5])
    # sanity: at least one pair actually shares a token (non-degenerate)
    assert np.isfinite(fast["df_min_shared"].to_numpy(np.float64)).any()
