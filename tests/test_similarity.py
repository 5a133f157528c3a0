

def test_embedding_pca_matches_numpy_and_is_partition_invariant(sf_dir):
    """Distributed moment-reduce PCA == numpy eigh on the pulled table
    (same sign convention); identical fit under any partitioning."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.stages.similarity import (
        embedding_pca, pca_transform)

    raw = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    ds = ray.data.from_pandas(raw)
    k = 4
    fit = embedding_pca(ds, n_components=k)
    fit2 = embedding_pca(ds.repartition(7), n_components=k)
    assert np.allclose(fit["mean"], fit2["mean"])
    assert np.allclose(fit["components"], fit2["components"], atol=1e-9)

    X = np.stack(raw["embedding"].to_numpy()).astype(np.float64)
    mean = X.mean(axis=0)
    cov = np.cov(X, rowvar=False)
    w, V = np.linalg.eigh(cov)
    order = np.argsort(-w)[:k]
    comps = V[:, order].T
    flip = np.sign(comps[np.arange(k), np.argmax(np.abs(comps), axis=1)])
    comps = comps * flip[:, None]
    assert np.allclose(fit["mean"], mean, atol=1e-9)
    assert np.allclose(fit["components"], comps, atol=1e-7)
    assert np.allclose(fit["explained_var"], w[order], atol=1e-9)
    # orthonormal, variance-ordered
    assert np.allclose(fit["components"] @ fit["components"].T, np.eye(k),
                       atol=1e-9)
    assert (np.diff(fit["explained_var"]) <= 1e-12).all()

    # transform == centered projection, schema preserved
    out = pca_transform(ds, fit).to_pandas().sort_values("vec_id")
    Z = np.stack(out["embedding"].to_numpy())
    assert Z.shape == (len(raw), k)
    raw_sorted = raw.sort_values("vec_id")
    Xs = np.stack(raw_sorted["embedding"].to_numpy()).astype(np.float64)
    assert np.allclose(Z, (Xs - mean) @ comps.T, atol=1e-9)


def test_pca_feeds_ann_kernels():
    """Reduced-dim output is a drop-in for the ANN operators: planted
    low-rank structure survives — nearest neighbors in PCA space match
    full-space neighbors when the data IS low-rank."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.stages.similarity import (
        embedding_pca, pca_transform)

    rng = np.random.default_rng(3)
    B = rng.normal(size=(3, 32))            # rank-3 structure in 32 dims
    W = rng.normal(size=(200, 3))
    X = W @ B + 1e-6 * rng.normal(size=(200, 32))
    ds = ray.data.from_pandas(pd.DataFrame({
        "vec_id": np.arange(200, dtype=np.int64),
        "embedding": list(X)}))
    fit = embedding_pca(ds, n_components=3)
    assert fit["explained_var"][2] > 1e3 * 1e-10  # rank-3 captured
    Z = np.stack(pca_transform(ds, fit).to_pandas()
                 .sort_values("vec_id")["embedding"].to_numpy())
    # pairwise euclidean distances preserved (projection onto true span)
    d_full = np.linalg.norm(X[:50, None] - X[None, :50], axis=2)
    d_red = np.linalg.norm(Z[:50, None] - Z[None, :50], axis=2)
    assert np.allclose(d_full, d_red, rtol=1e-3, atol=1e-4)


def test_text_embedder_stage():
    """In-pipeline embedder (SPECTER/SBERT seam, deterministic stand-in
    kernel): unit-norm list<float64> column, deterministic and
    partition-invariant, near-duplicate texts close / unrelated far, and
    composable from the Stage registry."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.stages.similarity import embed_texts

    base = ("web scale duplicate detection with minhash signatures and "
            "band bucketing for candidate generation")
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [base, base + " trailing variation",
                 "completely unrelated cooking recipe with onions and salt",
                 "another separate topic about orbital mechanics and fuel"],
    })
    out = embed_texts(ray.data.from_pandas(docs), dim=32).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    E = np.stack(out["embedding"].to_numpy())
    assert E.shape == (4, 32)
    assert np.allclose(np.linalg.norm(E, axis=1), 1.0)
    # near-dup pair far more similar than unrelated pair
    assert E[0] @ E[1] > 0.8 > 0.5 > E[0] @ E[2]

    # determinism + partition invariance
    out2 = embed_texts(ray.data.from_pandas(docs).repartition(3),
                       dim=32).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert np.allclose(E, np.stack(out2["embedding"].to_numpy()))

    # registry composition
    from ent_res_feedback_ray.pipelines.protocol import build_pipeline

    out3 = build_pipeline([{"stage": "embed_text", "dim": 32}])(
        ray.data.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert np.allclose(E, np.stack(out3["embedding"].to_numpy()))
