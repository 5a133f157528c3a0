"""Deterministic sampling/splits: DuckDB hash parity, partition invariance,
and the distributed metrics path vs the driver-side spec."""

import duckdb
import numpy as np
import pandas as pd
import ray.data

from ent_res_feedback_ray.stages.sampling import (
    balanced_sample,
    hash_split_sql_case,
    hash_split_stage,
    md5_mod,
    pair_sample_sql_filter,
    pair_sample_stage,
)


def test_md5_mod_matches_duckdb():
    con = duckdb.connect()
    for s in ["abc", "", "42|17|23", "doc_9|x"]:
        db = con.execute(
            "SELECT md5_number_lower(?) % 1000000", [s]).fetchone()[0]
        assert md5_mod([s])[0] == db


def test_pair_sample_partition_invariant_and_sql_equal():
    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        "id1": rng.integers(0, 1000, 500),
        "id2": rng.integers(1000, 2000, 500),
    })
    a = pair_sample_stage(ray.data.from_pandas(df), 0.3, seed=7).to_pandas()
    # different partitioning → same membership
    b = pair_sample_stage(
        ray.data.from_pandas(df).repartition(7), 0.3, seed=7).to_pandas()
    key = lambda d: set(zip(d.id1, d.id2))
    assert key(a) == key(b)
    con = duckdb.connect()
    con.register("pairs", df)
    sql = con.execute(
        "SELECT id1, id2 FROM pairs WHERE "
        + pair_sample_sql_filter(0.3, seed=7)).df()
    assert key(a) == key(sql)


def test_hash_split_fractions_and_sql():
    df = pd.DataFrame({"doc_id": np.arange(2000)})
    out = hash_split_stage(
        ray.data.from_pandas(df), "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1}, seed=5).to_pandas()
    counts = out["split"].value_counts()
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert set(out["split"]) == {"train", "val", "test"}
    con = duckdb.connect()
    con.register("t", df)
    sql = con.execute(
        "SELECT doc_id, " + hash_split_sql_case(
            "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=5)
        + " AS split FROM t").df()
    merged = out.merge(sql, on="doc_id", suffixes=("_ray", "_sql"))
    assert (merged["split_ray"] == merged["split_sql"]).all()


def test_balanced_sample_deterministic_under_shuffle():
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "id1": np.arange(400), "id2": np.arange(400) + 1000,
        "label": (np.arange(400) % 5 == 0).astype(float),  # 80 pos, 320 neg
    })
    a = balanced_sample(df, "label", 50, ["id1", "id2"], seed=9)
    shuffled = df.sample(frac=1.0, random_state=1).reset_index(drop=True)
    b = balanced_sample(shuffled, "label", 50, ["id1", "id2"], seed=9)
    ka = set(zip(a.id1, a.id2))
    assert ka == set(zip(b.id1, b.id2))
    assert (a["label"] == 1.0).sum() == 50 and (a["label"] == 0.0).sum() == 50


def test_distributed_metrics_match_driver_spec():
    from ent_res_feedback_ray.eval.metrics import (
        b3_prf,
        cluster_metrics_dataset,
        pairwise_prf,
    )

    rng = np.random.default_rng(4)
    n = 500
    pred = pd.DataFrame({"id": np.arange(n), "pred": rng.integers(0, 40, n)})
    gold = pd.DataFrame({"id": np.arange(n), "gold": rng.integers(0, 35, n)})
    m = cluster_metrics_dataset(
        ray.data.from_pandas(pred).repartition(5),
        ray.data.from_pandas(gold).repartition(3))
    bp, br, bf = b3_prf(pred, gold)
    pp, pr, pf = pairwise_prf(pred, gold)
    assert abs(m["b3_precision"] - bp) < 1e-12
    assert abs(m["b3_recall"] - br) < 1e-12
    assert m["pair_precision"] == pp and m["pair_recall"] == pr


def test_join_on_key_semi_anti():
    """Semi/anti join modes match pandas set semantics (left columns only)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.stages.shuffleops import join_on_key

    left = pd.DataFrame({"k": np.arange(10, dtype=np.int64),
                         "v": np.arange(10, dtype=np.int64) * 2})
    right = pd.DataFrame({"k": np.array([2, 3, 5, 7, 7], np.int64),
                          "w": np.arange(5, dtype=np.int64)})
    l_ds, r_ds = ray.data.from_pandas(left), ray.data.from_pandas(right)

    semi = join_on_key(l_ds, r_ds, "k", how="semi").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert list(semi.columns) == ["k", "v"]
    assert semi["k"].tolist() == [2, 3, 5, 7]     # 7 not duplicated

    anti = join_on_key(l_ds, r_ds, "k", how="anti").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert anti["k"].tolist() == [0, 1, 4, 6, 8, 9]
    assert len(semi) + len(anti) == len(left)


def test_split_disjointness_operator(sf_dir):
    """Dataflow split-integrity check over the registered split queries:
    hash_split and block_split are leak-free; a crafted leaky split is
    flagged with the right counts."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.pipelines.er import blocked_compact, hash_split
    from ent_res_feedback_ray.stages.shuffleops import split_disjointness

    hs = split_disjointness(hash_split(sf_dir), "doc_id", "split").to_pandas()
    assert set(hs["split"]) == {"train", "val", "test"}
    assert (hs["n_leaked"] == 0).all()
    assert hs["n_units"].sum() == 500

    # block-level carve: no BLOCK leaks across splits (the property
    # reference split_blocks_helper guarantees)
    from ent_res_feedback_ray.pipelines.er import block_split

    bs = split_disjointness(block_split(sf_dir), "block_key", "split") \
        .to_pandas()
    assert (bs["n_leaked"] == 0).all()

    leaky = pd.DataFrame({
        "unit": np.array([1, 1, 2, 3, 3, 3], np.int64),
        "split": ["train", "test", "train", "train", "train", "val"],
    })
    out = split_disjointness(ray.data.from_pandas(leaky), "unit", "split") \
        .to_pandas().set_index("split")
    # unit 1 leaks train/test; unit 3 leaks train/val; unit 2 clean
    assert out.loc["train", "n_units"] == 3
    assert out.loc["train", "n_leaked"] == 2
    assert out.loc["test", "n_leaked"] == 1
    assert out.loc["val", "n_leaked"] == 1


def test_source_balanced_sample_matches_duckdb():
    """Data-mixing sampler: every source downsampled toward the smallest
    source's size; membership integer-exact vs the DuckDB twin."""
    import duckdb

    from ent_res_feedback_ray.stages.sampling import (
        source_balanced_sample, source_balanced_sample_sql)

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/documents.parquet")
    out = source_balanced_sample(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    ora = con.execute(source_balanced_sample_sql()
                      + " ORDER BY doc_id").fetchdf()
    pd.testing.assert_frame_equal(out[sorted(out.columns)],
                                  ora[sorted(ora.columns)], check_dtype=False)
    # balance: every source's kept count is within binomial noise of the
    # smallest source's total
    full = con.execute(
        "SELECT source, count(*) n FROM documents GROUP BY source").fetchdf()
    tgt = full["n"].min()
    totals = full.set_index("source")["n"]
    kept = out.groupby("source").size().reindex(totals.index, fill_value=0)
    assert (kept <= totals).all()
    assert (np.abs(kept - tgt) <= 4 * np.sqrt(tgt) + 1).all()


def test_source_balanced_sample_cardinality_cap():
    import pytest as _pytest

    from ent_res_feedback_ray.stages import sampling

    df = pd.DataFrame({"doc_id": np.arange(50, dtype=np.int64),
                       "source": [f"s{i}" for i in range(50)]})
    old = sampling.SOURCE_CARD_CAP
    sampling.SOURCE_CARD_CAP = 10
    try:
        with _pytest.raises(ValueError, match="cap"):
            sampling.source_balanced_sample(ray.data.from_pandas(df))
    finally:
        sampling.SOURCE_CARD_CAP = old


def test_source_mixture_sample_matches_duckdb_twin():
    import duckdb
    import numpy as np
    import ray.data

    from ent_res_feedback_ray.stages.sampling import (
        source_mixture_sample, source_mixture_sample_sql)

    sf = "/root/testdata/sf0.001"
    weights = {"web": 5, "news": 2, "wiki": 1}
    docs = ray.data.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id", "source", "text"])
    srcs = set(docs.select_columns(["source"]).to_pandas()["source"])
    usable = {s: w for s, w in weights.items() if s in srcs}
    if len(usable) < 2:  # fixture guard: need ≥2 named sources
        usable = {s: w for s, w in zip(sorted(srcs), (5, 2, 1))}
    out = source_mixture_sample(docs, usable).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    ora = con.execute(source_mixture_sample_sql(usable)).df()
    a = sorted(out["doc_id"])
    b = sorted(ora["doc_id"])
    assert a == b and len(a) > 0
    # kept proportions track the weights (loose: small-sample noise)
    got = out.groupby("source").size()
    ws = np.array([usable[s] for s in got.index], dtype=float)
    ratios = got.to_numpy() / ws
    assert ratios.max() / max(ratios.min(), 1) < 2.5


def test_source_mixture_sample_drops_unlisted_sources():
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.stages.sampling import source_mixture_sample

    df = pd.DataFrame({
        "doc_id": range(300),
        "source": ["a"] * 100 + ["b"] * 100 + ["junk"] * 100,
    })
    out = source_mixture_sample(ray.data.from_pandas(df),
                                {"a": 1, "b": 1}).to_pandas()
    assert set(out["source"]) <= {"a", "b"}
    assert len(out[out["source"] == "a"]) == 100  # binding source kept whole


def test_leakage_safe_split_matches_duckdb_and_never_splits_a_cluster():
    """Near-dup components land whole on one side (zero leakage pairs);
    the ngram-source variant is replayed bit-exactly by its DuckDB twin."""
    import duckdb
    import numpy as np

    from ent_res_feedback_ray.stages.sampling import (
        leakage_safe_split, leakage_safe_split_sql)

    sf = "/root/testdata/sf0.001"
    out = leakage_safe_split(sf, method="ngram").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    ora = con.execute(leakage_safe_split_sql()).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == ora["doc_id"].tolist()
    assert out["dup_cluster_id"].tolist() == ora["dup_cluster_id"].tolist()
    assert out["split"].tolist() == ora["split"].tolist()
    # the property the operator exists for: one split per component
    per_cluster = out.groupby("dup_cluster_id")["split"].nunique()
    assert (per_cluster == 1).all()
    # fixture actually has multi-doc components and both splits present
    sizes = out.groupby("dup_cluster_id").size()
    assert (sizes > 1).any()
    assert set(out["split"]) == {"train", "test"}


def test_stratified_sample_matches_duckdb_and_exact_counts():
    """Exact k per stratum, partition-invariant, DuckDB-replayable."""
    import duckdb

    from ent_res_feedback_ray.stages.sampling import (
        stratified_sample, stratified_sample_sql)

    sf = "/root/testdata/sf0.001"
    docs = ray.data.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id", "source"])
    out = stratified_sample(docs, "source", "doc_id", k_per_stratum=5) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    out2 = stratified_sample(docs.repartition(9), "source", "doc_id",
                             k_per_stratum=5) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == out2["doc_id"].tolist()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    ora = con.execute(stratified_sample_sql(
        "documents", "source", "doc_id", 5, cols="doc_id, source")) \
        .df().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == ora["doc_id"].tolist()
    assert out["source"].tolist() == ora["source"].tolist()
    # exact per-stratum counts: min(k, stratum size)
    full = con.execute(
        "SELECT source, count(*) AS n FROM documents GROUP BY source").df()
    got = out.groupby("source").size()
    for _, row in full.iterrows():
        assert got.get(row["source"], 0) == min(5, row["n"])
