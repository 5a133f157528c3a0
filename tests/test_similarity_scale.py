"""Scale-path ANN operators: IVF variants must reach ≥0.9 recall vs their
exact twins, with no whole-table driver pull (the exact twins are the
oracles; these are probabilistic)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _pairs(df: pd.DataFrame) -> set:
    return set(zip(df["id1"], df["id2"]))


def test_embedding_dup_ivf_recall():
    from ent_res_feedback_ray.stages.dedup import (
        embedding_dup_pairs,
        embedding_dup_pairs_ivf,
    )

    exact = _pairs(embedding_dup_pairs(SF).to_pandas())
    approx = _pairs(embedding_dup_pairs_ivf(SF).to_pandas())
    assert approx <= exact or not exact  # verify step kills false positives
    if exact:
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.9, (recall, len(exact))


def test_ann_topk_ivf_recall():
    from ent_res_feedback_ray.stages.similarity import (
        ann_topk_bruteforce,
        ann_topk_ivf,
    )

    exact = ann_topk_bruteforce(SF).to_pandas()
    approx = ann_topk_ivf(SF).to_pandas()
    ek = set(zip(exact["query_id"], exact["neighbor_id"]))
    ak = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(ak & ek) / len(ek)
    assert recall >= 0.9, recall


def test_centroids_deterministic():
    from ent_res_feedback_ray.stages.similarity import embedding_centroids

    a = embedding_centroids(SF, n_iter=3, k=4).to_pandas()
    b = embedding_centroids(SF, n_iter=3, k=4).to_pandas()
    assert a["centroid_id"].tolist() == b["centroid_id"].tolist()
    for x, y in zip(a["centroid"], b["centroid"]):
        assert np.allclose(x, y, atol=0)
