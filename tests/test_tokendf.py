"""Range-sharded corpus token-DF side input: build correctness, lookup
semantics, cap behavior, and bit-parity of BOTH featurizer twins against the
exact {token: df} dict spec."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ent_res_feedback_ray.stages.tokendf import (
    ShardedTokenDF,
    build_token_df,
    resolve_view,
    token_hashes,
)


def _docs(n=60, seed=7):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(40)]
    rows = []
    for d in range(n):
        k = int(rng.integers(0, 50))
        text = " ".join(rng.choice(words, size=k)) if k else ""
        rows.append({"doc_id": d, "norm_text": text,
                     "lang": "en" if d % 3 else "fr"})
    return pd.DataFrame(rows)


def _exact_df(docs: pd.DataFrame, min_df=2) -> dict:
    cnt = Counter()
    for t in docs["norm_text"]:
        cnt.update(set(t.split()))
    return {t: c for t, c in cnt.items() if c >= min_df}


def test_build_matches_exact_counts():
    docs = _docs()
    exact = _exact_df(docs)
    for nshards in (1, 5):
        handle = build_token_df(
            ray.data.from_pandas(docs).repartition(4), n_shards=nshards)
        assert isinstance(handle, ShardedTokenDF)
        assert handle.n_shards == nshards
        view = resolve_view(handle)
        toks = sorted(exact)
        got = view.lookup_tokens(toks)
        want = np.array([exact[t] for t in toks], np.float64)
        assert np.array_equal(got, want)
        # singletons / unknown tokens → 1.0 ("rarer than the table")
        assert np.array_equal(view.lookup_tokens(["nosuchtok_xyz"]),
                              np.array([1.0]))
        # total entries across shards == exact vocab (DF >= 2)
        total = sum(len(ray.get(r)[0]) for r in handle.refs)
        assert total == len(exact)


def test_shard_cap_is_loud_and_keeps_top_df():
    docs = _docs()
    exact = _exact_df(docs)
    handle = build_token_df(ray.data.from_pandas(docs), n_shards=1,
                            max_entries_per_shard=5)
    keys, counts = ray.get(handle.refs[0])
    assert len(keys) >= 5
    # kept entries are the highest-DF ones (ties kept)
    thr = counts.min()
    n_ge = sum(1 for c in exact.values() if c >= thr)
    assert len(keys) == n_ge
    # dropped tokens fall back to 1.0
    view = resolve_view(handle)
    dropped = [t for t, c in exact.items() if c < thr]
    if dropped:
        assert np.array_equal(view.lookup_tokens(dropped),
                              np.ones(len(dropped)))


def test_legacy_tuple_ref_still_resolves():
    exact = {"a": 3, "b": 7}
    keys = token_hashes(sorted(exact))
    order = np.argsort(keys)
    counts = np.array([exact[t] for t in sorted(exact)], np.int64)[order]
    view = resolve_view(ray.put((keys[order], counts)))
    assert np.array_equal(view.lookup_tokens(["a", "b", "zz"]),
                          np.array([3.0, 7.0, 1.0]))


def test_both_featurize_twins_match_dict_spec():
    """string path w/ ShardedTokenDF == string path w/ exact dict == fast
    path w/ ShardedTokenDF, on df_min_shared / df_max_shared."""
    from ent_res_feedback_ray.stages.fastfeatures import (
        build_doc_signatures,
        featurize_and_score_fast,
    )
    from ent_res_feedback_ray.stages.features import (
        featurize_pairs_batch,
        featurize_stage,
    )

    docs = _docs()
    docs["url"] = [f"u{d}" for d in docs["doc_id"]]
    exact = _exact_df(docs)
    norm_ds = ray.data.from_pandas(docs)
    handle = build_token_df(norm_ds.select_columns(["norm_text"]),
                            n_shards=3)

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
    lk = docs.set_index("doc_id")
    wide = pairs.copy()
    for side in ("1", "2"):
        wide[f"norm_text{side}"] = lk.loc[wide[f"id{side}"],
                                          "norm_text"].to_numpy()
        wide[f"lang{side}"] = lk.loc[wide[f"id{side}"], "lang"].to_numpy()

    spec_dict = featurize_pairs_batch(
        pa.Table.from_pandas(wide), token_df=exact).to_pandas()
    spec_shard = featurize_stage(
        ray.data.from_pandas(wide), token_df_ref=handle).to_pandas()
    fast = featurize_and_score_fast(
        ray.data.from_pandas(pairs),
        ray.put(build_doc_signatures(norm_ds)),
        token_df_ref=handle).to_pandas()

    key = ["id1", "id2"]
    spec_dict = spec_dict.sort_values(key).reset_index(drop=True)
    spec_shard = spec_shard.sort_values(key).reset_index(drop=True)
    fast = fast.sort_values(key).reset_index(drop=True)
    for c in ("df_min_shared", "df_max_shared"):
        a = spec_dict[c].to_numpy(np.float64)
        b = spec_shard[c].to_numpy(np.float64)
        f = fast[c].to_numpy(np.float64)
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c
        assert ((a == f) | (np.isnan(a) & np.isnan(f))).all(), c
    assert np.isfinite(spec_shard["df_min_shared"].to_numpy(np.float64)).any()
