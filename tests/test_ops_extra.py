"""Extra operator coverage: tuning, incremental assignment, as-of join,
bucketed join path, SNM blocking."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from ent_res_feedback_ray.stages.clustering import incremental_assign
from ent_res_feedback_ray.stages.shuffleops import (
    attach_attrs,
    bucketed_aggregate,
    distinct_values,
)
from ent_res_feedback_ray.state.tuning import tune_score_threshold


def test_tune_score_threshold_finds_separator():
    # pairs within gold clusters score ~0.9; across ~0.2 → any threshold in
    # (0.2, 0.9] is perfect; tuner must land there
    rng = np.random.default_rng(0)
    gold = pd.DataFrame({"node": np.arange(30), "gold": np.arange(30) % 3})
    rows = []
    for i in range(30):
        for j in range(i + 1, 30):
            same = (i % 3) == (j % 3)
            score = 0.9 + 0.05 * rng.random() if same else 0.2 * rng.random()
            rows.append((i, j, score))
    scored = pd.DataFrame(rows, columns=["id1", "id2", "score"])
    best, trials = tune_score_threshold(
        scored, gold.rename(columns={"node": "id"}), np.arange(30))
    assert 0.2 < best <= 0.95
    assert trials["b3_f1"].max() == 1.0


def test_incremental_assign_attaches_and_reclusters():
    existing = pd.DataFrame({"node": [1, 2, 3], "label": [1, 1, 3]})
    new_ids = pd.DataFrame({"node": [10, 11, 12]})
    scored = pd.DataFrame({
        "id1": [1, 2, 3, 10, 11],
        "id2": [10, 10, 11, 12, 12],
        # 10 matches cluster 1 strongly (mean 0.9); 11 weak vs cluster 3;
        # 11-12 and 10-12 edges below/above threshold
        "score": [0.9, 0.9, 0.2, 0.1, 0.95],
    })
    out = incremental_assign(
        ray.data.from_pandas(scored), existing, new_ids, threshold=0.5)
    m = dict(zip(out["node"], out["label"]))
    assert m[1] == 1 and m[2] == 1 and m[3] == 3  # frozen
    assert m[10] == 1                              # attached to cluster 1
    # 11 couldn't attach (0.2 < 0.5) → leftover; 12 couldn't attach (10 is
    # new, not an old cluster) → leftover; edge 11-12 at 0.95 joins them
    assert m[11] == m[12] == 11


def test_incremental_assign_dataset_existing_matches_dataframe():
    """Scale path: a Dataset frozen assignment (broadcast assembled in a Ray
    task, no driver pull) produces the identical combined assignment, as a
    Dataset."""
    existing = pd.DataFrame({"node": [1, 2, 3], "label": [1, 1, 3]})
    new_ids = pd.DataFrame({"node": [10, 11, 12]})
    scored = pd.DataFrame({
        "id1": [1, 2, 3, 10, 11],
        "id2": [10, 10, 11, 12, 12],
        "score": [0.9, 0.9, 0.2, 0.1, 0.95],
    })
    df_out = incremental_assign(
        ray.data.from_pandas(scored), existing, new_ids, threshold=0.5)
    ds_out = incremental_assign(
        ray.data.from_pandas(scored), ray.data.from_pandas(existing),
        new_ids, threshold=0.5)
    assert isinstance(ds_out, ray.data.Dataset)
    a = df_out.sort_values("node").reset_index(drop=True)
    b = ds_out.to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_attach_attrs_bucketed_matches_broadcast():
    docs = pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64),
        "norm_text": [f"text {i}" for i in range(20)],
        "lang": ["en", "fr"] * 10,
    })
    pairs = pd.DataFrame({
        "id1": np.array([0, 1, 2, 5], dtype=np.int64),
        "id2": np.array([3, 4, 7, 9], dtype=np.int64),
        "block_key": ["a", "a", "b", "b"],
    })
    docs_ds = ray.data.from_pandas(docs)
    pairs_ds = ray.data.from_pandas(pairs)
    wide1 = attach_attrs(pairs_ds, docs_ds, attr_cols=["norm_text", "lang"],
                         broadcast_limit=10**9).to_pandas()
    wide2 = attach_attrs(pairs_ds, docs_ds, attr_cols=["norm_text", "lang"],
                         broadcast_limit=0).to_pandas()
    cols = sorted(wide1.columns)
    a = wide1[cols].sort_values(["id1", "id2"]).reset_index(drop=True)
    b = wide2[cols].sort_values(["id1", "id2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert a.loc[0, "norm_text1"] == "text 0"
    assert a.loc[0, "norm_text2"] == "text 3"


def test_attach_attrs_broadcast_float64_contract_and_guard():
    # both plans emit float64 for int attrs (corpus-size-invariant dtypes);
    # int values beyond 2^53 fail loudly instead of losing exactness
    docs = pd.DataFrame({"doc_id": np.array([1, 2], np.int64),
                         "nfp": np.array([10, 20], np.int64)})
    pairs = pd.DataFrame({"id1": np.array([1, 99], np.int64),
                          "id2": np.array([2, 1], np.int64)})
    wide = attach_attrs(ray.data.from_pandas(pairs),
                        ray.data.from_pandas(docs),
                        attr_cols=["nfp"], broadcast_limit=10**9) \
        .to_pandas().sort_values(["id1", "id2"]).reset_index(drop=True)
    assert wide["nfp1"].dtype == np.float64 == wide["nfp2"].dtype
    assert wide.loc[0, "nfp1"] == 10.0 and np.isnan(wide.loc[1, "nfp1"])

    big = pd.DataFrame({"doc_id": np.array([1], np.int64),
                        "nfp": np.array([2**60], np.int64)})
    for limit in (10**9, 0):
        with pytest.raises(Exception, match="2\\^53"):
            attach_attrs(ray.data.from_pandas(pairs),
                         ray.data.from_pandas(big),
                         attr_cols=["nfp"], broadcast_limit=limit) \
                .materialize()


def test_bucketed_aggregate_matches_pandas():
    rng = np.random.default_rng(1)
    df = pd.DataFrame({"k": rng.integers(0, 1000, 20000),
                       "v": rng.random(20000)})
    ds = ray.data.from_pandas(df).repartition(4)
    out = bucketed_aggregate(ds, "k", total=("v", "sum"), n=("v", "size"))
    got = out.to_pandas().sort_values("k").reset_index(drop=True)
    exp = df.groupby("k", as_index=False).agg(
        total=("v", "sum"), n=("v", "size")).sort_values("k").reset_index(drop=True)
    assert (got["k"] == exp["k"]).all()
    assert np.allclose(got["total"], exp["total"])
    assert (got["n"] == exp["n"]).all()


def test_distinct_values():
    df = pd.DataFrame({"x": [3, 1, 2, 3, 1, 1]})
    out = distinct_values(ray.data.from_pandas(df), "x").to_pandas()
    assert sorted(out["x"].tolist()) == [1, 2, 3]


def test_asof_join_semantics(sf_dir):
    from ent_res_feedback_ray.pipelines.relational import purchases_asof_signup

    out = purchases_asof_signup(sf_dir).to_pandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    p = ev[ev.event_type == "purchase"]
    s = ev[ev.event_type == "signup"]
    assert len(out) == len(p)
    # spot-check a few rows against a direct computation
    lookup = out.set_index("event_id")["signup_event_id"]
    for _, row in p.head(20).iterrows():
        prior = s[(s.user_id == row.user_id) & (s.ts <= row.ts)]
        expect = prior.sort_values("ts").event_id.iloc[-1] if len(prior) else None
        got = lookup.loc[row.event_id]
        if expect is None:
            assert pd.isna(got)
        else:
            assert got == expect


def test_json_side_inputs_and_jsonl_corpus(tmp_path):
    """maybe_load_json passthrough/file modes + JSONL corpus read
    (reference maybe_load_json, /root/reference/s2and/data.py:643-662)."""
    import json

    from ent_res_feedback_ray.sources.tables import (
        maybe_load_json,
        read_jsonl_dataset,
    )

    assert maybe_load_json(None) is None
    d = {"a": 1}
    assert maybe_load_json(d) is d
    p = tmp_path / "side.json"
    p.write_text(json.dumps({"seeds": [[1, 2]]}))
    assert maybe_load_json(str(p)) == {"seeds": [[1, 2]]}

    jl = tmp_path / "corpus.jsonl"
    jl.write_text('{"doc_id": 1, "text": "alpha", "lang": "en"}\n'
                  '{"doc_id": 2, "text": "beta", "lang": "fr"}\n')
    ds = read_jsonl_dataset(str(jl), columns=["doc_id", "lang"])
    out = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out.columns) == ["doc_id", "lang"]
    assert out["lang"].tolist() == ["en", "fr"]


def test_cli_main_inprocess(tmp_path, sf_dir, synth_pages):
    """CLI surface (python -m ent_res_feedback_ray): list / query-to-parquet
    / resolve write real outputs in-process (shares the session Ray)."""
    import io
    from contextlib import redirect_stdout

    import ray.data

    from ent_res_feedback_ray.__main__ import main

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["list"]) == 0
    assert "er_clusters" in buf.getvalue().split()

    out = str(tmp_path / "q.parquet")
    with redirect_stdout(io.StringIO()):
        assert main(["query", "doc_token_counts",
                     "--sf-dir", sf_dir, "--out", out]) == 0
    assert ray.data.read_parquet(out).count() == 500

    pages_path, _gold = synth_pages
    rdir = str(tmp_path / "resolve_out")
    with redirect_stdout(io.StringIO()):
        assert main(["resolve", "--pages", pages_path, "--out", rdir]) == 0
    got = ray.data.read_parquet(rdir, file_extensions=["parquet"])
    assert got.count() > 0
    import os as _os

    assert _os.path.exists(_os.path.join(rdir, "_SUCCESS"))

    with redirect_stdout(io.StringIO()):
        assert main(["query", "no_such_query", "--sf-dir", sf_dir]) == 2


def test_attach_attrs_bucketed_int_attr_with_missing_doc():
    # regression: the cogroup path's LEFT merge emits float64+NaN for a
    # pair id absent from docs, while the tagged union used to declare the
    # int placeholder dtype — mixed-dtype blocks for the same column.
    # Numeric attrs now travel as float64 on BOTH sides (NaN-capable).
    import numpy as np
    import pandas as pd
    import ray.data

    docs = pd.DataFrame({"doc_id": np.array([1, 2], np.int64),
                         "nfp": np.array([10, 20], np.int64)})
    pairs = pd.DataFrame({"id1": np.array([1, 99], np.int64),
                          "id2": np.array([2, 1], np.int64)})
    wide = attach_attrs(ray.data.from_pandas(pairs),
                        ray.data.from_pandas(docs),
                        attr_cols=["nfp"], broadcast_limit=0) \
        .to_pandas().sort_values(["id1", "id2"]).reset_index(drop=True)
    assert wide.loc[0, "nfp1"] == 10.0 and wide.loc[0, "nfp2"] == 20.0
    assert np.isnan(wide.loc[1, "nfp1"])          # 99 has no doc row
    assert wide.loc[1, "nfp2"] == 10.0
    assert wide["nfp1"].dtype == np.float64 == wide["nfp2"].dtype


def test_bottom_k_numeric_string_and_empty_blocks():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from ent_res_feedback_ray.stages.shuffleops import bottom_k

    df = pd.DataFrame({
        "k": ["b", "a", "c", "a", "b"],
        "v": np.array([5, 3, 1, 4, 2], np.int64),
    })
    # string keys (nsmallest would reject these), lexicographic (k, v)
    out = bottom_k(ray.data.from_pandas(df), ["k", "v"], 3).to_pandas()
    assert list(out["k"]) == ["a", "a", "b"]
    assert list(out["v"]) == [3, 4, 2]
    # numeric key, k larger than the table → whole table sorted
    out2 = bottom_k(ray.data.from_pandas(df), ["v"], 99).to_pandas()
    assert list(out2["v"]) == [1, 2, 3, 4, 5]
    # column-less empty block in the union is skipped, not fatal
    ds = ray.data.from_pandas(df).union(ray.data.from_arrow([pa.table({})]))
    out3 = bottom_k(ds, ["v"], 2).to_pandas()
    assert list(out3["v"]) == [1, 2]
