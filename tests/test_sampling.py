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
