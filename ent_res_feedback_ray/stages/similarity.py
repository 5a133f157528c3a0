"""Similarity search over the embeddings table: brute-force cosine top-k
(baseline) and an LSH-bucketed approximate variant (scale path).

Reference analog: SPECTER-embedding cosine features
(/root/reference/s2and/featurizer.py:486-501, /root/reference/s2and/text.py:374-394);
top-k retrieval itself is a training-data-pipeline addition (task brief).

Scale design: the query matrix is broadcast once (``ray.put``), each batch of
the corpus does one numpy matmul against it — compute is a dense GEMM, the
corpus streams.  The IVF variant shrinks the per-batch GEMM to the probed
buckets only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from ..sources.tables import read_table


def _normalized_matrix(df: pd.DataFrame, id_col: str = "vec_id",
                       emb_col: str = "embedding") -> tuple[np.ndarray, np.ndarray]:
    ids = df[id_col].to_numpy(np.int64)
    M = np.stack(df[emb_col].to_numpy()).astype(np.float64)
    M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    return ids, M


def _first_n_rows(ds: ray.data.Dataset, col: str, n: int) -> pd.DataFrame:
    """The n smallest rows by ``col`` WITHOUT a table-wide sort: map-side
    bottom-n prune, then a DISTRIBUTED sort over the surviving ≤
    n_blocks·n rows — exactly n rows reach the driver (with micro-blocks
    the pruned set can approach the table, so the merge must not be a
    driver pull).  The former `sort(col).limit(n)` shape shuffled the
    whole table for a handful of query rows."""
    from .shuffleops import bottom_k

    return bottom_k(ds, [col], n).to_pandas()


def ann_topk_bruteforce(sf_dir: str, n_queries: int = 10, k: int = 5) -> ray.data.Dataset:
    """Exact cosine top-k: queries = the first ``n_queries`` vectors by id;
    neighbors over the whole table (self excluded).  Output
    (query_id, neighbor_id, rank) with deterministic id tie-break.

    The corpus streams in batches; each batch computes a (batch × n_queries)
    GEMM and emits its local candidates; the global top-k per query is a
    small sort over n_batches×k rows."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # query selection: sort + limit INSIDE the dataflow — only n_queries rows
    # reach the driver, never the table
    qdf = _first_n_rows(emb, "vec_id", n_queries)
    qids, Q = _normalized_matrix(qdf)
    qref = ray.put((qids, Q))

    class LocalTopK:
        def __init__(self):
            self.qids, self.Q = ray.get(qref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ids, M = _normalized_matrix(df)
            sims = self.Q @ M.T  # [n_queries, batch]
            out = []
            for qi in range(len(self.qids)):
                s = sims[qi]
                mask = ids != self.qids[qi]
                cand_ids = ids[mask]
                cand_s = s[mask]
                top = min(k, len(cand_ids))
                if top == 0:
                    continue
                # local top-k (order by -sim, id)
                order = np.lexsort((cand_ids, -cand_s))[:top]
                out.append(pd.DataFrame({
                    "query_id": self.qids[qi],
                    "neighbor_id": cand_ids[order],
                    "cosine": cand_s[order],
                }))
            if not out:
                return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
            return pd.concat(out, ignore_index=True)

    local = emb.map_batches(LocalTopK, batch_format="pandas", concurrency=(1, 4),
                            batch_size=2048)

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return local.groupby("query_id").map_groups(global_topk, batch_format="pandas")


ANN_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding FROM embeddings
  ORDER BY vec_id LIMIT 10
),
sims AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding, e.embedding) AS cosine
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
      AS rank
  FROM sims
)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 5
""".strip()


def ann_topk_lsh(sf_dir: str, n_queries: int = 10, k: int = 5,
                 n_planes: int = 12, n_tables: int = 6, seed: int = 42) -> ray.data.Dataset:
    """Approximate cosine top-k via random-hyperplane LSH (SimHash family).

    Each vector hashes to ``n_tables`` bucket keys (sign pattern of
    ``n_planes`` random projections).  Queries search only colliding
    buckets — at scale this replaces the full GEMM with per-bucket GEMMs.
    Recall is probabilistic (rows-only check; the brute-force twin above is
    the exactness oracle)."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # dim from ONE row; queries via sort+limit — no full-table driver pull
    qdf = _first_n_rows(emb, "vec_id", n_queries)
    dim = len(qdf["embedding"].iloc[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    qids, Q = _normalized_matrix(qdf)
    shared = ray.put((planes, qids, Q))

    class BucketTopK:
        def __init__(self):
            self.planes, self.qids, self.Q = ray.get(shared)
            # query bucket keys per table
            self.qkeys = []
            for t in range(len(self.planes)):
                proj = self.Q @ self.planes[t].T > 0
                self.qkeys.append(proj @ (1 << np.arange(proj.shape[1])))

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ids, M = _normalized_matrix(df)
            hit = np.zeros((len(self.qids), len(ids)), dtype=bool)
            for t in range(len(self.planes)):
                proj = M @ self.planes[t].T > 0
                keys = proj @ (1 << np.arange(proj.shape[1]))
                hit |= self.qkeys[t][:, None] == keys[None, :]
            out = []
            for qi in range(len(self.qids)):
                cand = np.nonzero(hit[qi] & (ids != self.qids[qi]))[0]
                if len(cand) == 0:
                    continue
                sims = self.Q[qi] @ M[cand].T
                order = np.lexsort((ids[cand], -sims))[: k]
                out.append(pd.DataFrame({
                    "query_id": self.qids[qi],
                    "neighbor_id": ids[cand][order],
                    "cosine": sims[order],
                }))
            if not out:
                return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
            return pd.concat(out, ignore_index=True)

    local = emb.map_batches(BucketTopK, batch_format="pandas", concurrency=(1, 4),
                            batch_size=2048)

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank", "cosine"]]

    return local.groupby("query_id").map_groups(global_topk, batch_format="pandas")


def ann_topk_approx(sf_dir: str) -> ray.data.Dataset:
    """Both approximate ANN variants in one table, tagged by ``method``
    ('lsh' = random-hyperplane buckets, 'ivf' = coarse-quantizer partitions)
    — a single registry entry covering both scale paths (rows-only; recall
    vs the exact ``ann_topk`` oracle is pinned by
    tests/test_similarity_scale.py)."""
    lsh = ann_topk_lsh(sf_dir).map_batches(
        lambda df: df[["query_id", "neighbor_id", "rank"]].assign(method="lsh"),
        batch_format="pandas")
    ivf = ann_topk_ivf(sf_dir).map_batches(
        lambda df: df.assign(method="ivf"), batch_format="pandas")
    return lsh.union(ivf)


def train_centroids(emb: ray.data.Dataset, k: int = 10, n_iter: int = 10,
                    seed: int = 42) -> np.ndarray:
    """Distributed k-means (IVF coarse quantizer training): init from a
    BOUNDED sort+limit sample (first ~32k ids — never the whole table),
    then per-batch partial assignment + centroid sums with a driver reduce
    over k rows per batch.  Deterministic seeding."""
    sample = _first_n_rows(emb, "vec_id", max(32 * k, 1024))
    _, M = _normalized_matrix(sample)
    rng = np.random.default_rng(seed)
    centroids = M[rng.choice(len(M), size=min(k, len(M)), replace=False)]
    from .shuffleops import _broadcast_get

    for _ in range(n_iter):
        cref = ray.put(centroids)

        def _partial(df: pd.DataFrame, _cref=cref) -> pd.DataFrame:
            # stateless task (not an actor pool): per-iteration actor
            # startup cost exceeded the assignment work itself; the
            # centroid table ships once per worker via the broadcast cache
            C = _broadcast_get(_cref)
            _, X = _normalized_matrix(df)
            assign = np.argmax(X @ C.T, axis=1)
            out = []
            for c in np.unique(assign):
                sel = X[assign == c]
                out.append({"centroid": int(c), "count": len(sel),
                            "vecsum": sel.sum(axis=0).tolist()})
            return pd.DataFrame(out)

        parts = emb.map_batches(_partial, batch_format="pandas",
                                batch_size=4096).to_pandas()
        new_c = centroids.copy()
        for c in range(len(centroids)):
            rows = parts[parts["centroid"] == c]
            if len(rows):
                total = np.sum(np.stack(rows["vecsum"].to_numpy()), axis=0)
                n = rows["count"].sum()
                v = total / n
                new_c[c] = v / max(np.linalg.norm(v), 1e-12)
        centroids = new_c
    return centroids


def embedding_centroids(sf_dir: str, n_iter: int = 10, k: int = 10,
                        seed: int = 42) -> ray.data.Dataset:
    """Centroid table of the IVF coarse quantizer (see ``train_centroids``)."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    centroids = train_centroids(emb, k=k, n_iter=n_iter, seed=seed)
    out = pd.DataFrame({
        "centroid_id": np.arange(len(centroids), dtype=np.int64),
        "centroid": [c.tolist() for c in centroids],
    })
    return ray.data.from_pandas(out)


def ann_topk_ivf(sf_dir: str, n_queries: int = 10, k: int = 5,
                 n_centroids: int = 8, nprobe: int = 4, n_assign: int = 2,
                 seed: int = 42) -> ray.data.Dataset:
    """IVF-partitioned approximate top-k — the ANN scale path: corpus rows
    are assigned to their ``n_assign`` nearest coarse centroids per batch
    (multi-assign covers bucket-boundary neighbors); each query only GEMMs
    against rows whose buckets intersect its ``nprobe`` closest centroids.
    At 100 TB the corpus is written partitioned by bucket (×n_assign
    amplification) and only probed partitions are read; here the bucket
    filter runs per batch (same arithmetic, streaming form).  Rows-only
    (probabilistic recall; ``ann_topk`` is the exactness oracle — recall
    ≥0.9 pinned by pytest)."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    C = train_centroids(emb, k=n_centroids, n_iter=5, seed=seed)
    qdf = _first_n_rows(emb, "vec_id", n_queries)
    qids, Q = _normalized_matrix(qdf)
    probed = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # [nq, nprobe]
    shared = ray.put((C, qids, Q, probed))

    class BucketTopK:
        def __init__(self):
            self.C, self.qids, self.Q, self.probed = ray.get(shared)
            nq = len(self.qids)
            self.probe_mask = np.zeros((nq, len(self.C)), dtype=bool)
            self.probe_mask[np.repeat(np.arange(nq), self.probed.shape[1]),
                            self.probed.ravel()] = True

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ids, M = _normalized_matrix(df)
            assign = np.argsort(-(M @ self.C.T), axis=1)[:, :n_assign]
            hit = np.zeros((len(self.qids), len(ids)), dtype=bool)
            for a in range(n_assign):
                hit |= self.probe_mask[:, assign[:, a]]  # [nq, batch]
            out = []
            for qi in range(len(self.qids)):
                cand = np.nonzero(hit[qi] & (ids != self.qids[qi]))[0]
                if len(cand) == 0:
                    continue
                sims = self.Q[qi] @ M[cand].T
                order = np.lexsort((ids[cand], -sims))[:k]
                out.append(pd.DataFrame({
                    "query_id": self.qids[qi],
                    "neighbor_id": ids[cand][order],
                    "cosine": sims[order],
                }))
            if not out:
                return pd.DataFrame({"query_id": [], "neighbor_id": [],
                                     "cosine": []})
            return pd.concat(out, ignore_index=True)

    local = emb.map_batches(BucketTopK, batch_format="pandas",
                            concurrency=(1, 4), batch_size=2048)

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return local.groupby("query_id").map_groups(global_topk,
                                                batch_format="pandas")


class TextEmbedder:
    """In-pipeline text-embedding ACTOR stage — the embedder seam the
    reference fills with SPECTER (/root/reference/s2and/data.py:703-725)
    and the north-star fills with an SBERT GPU pool.  No model weights
    exist in this env, so the kernel is a DETERMINISTIC public stand-in
    (hashed sublinear-TF features → seeded Gaussian random projection,
    L2-normalized — the hashing-trick + Johnson-Lindenstrauss classics);
    a real encoder drops into ``__call__`` with the same schema and the
    same actor-pool shape.  The projection matrix builds ONCE per actor
    in ``__init__`` (the load-once-per-worker model pattern)."""

    def __init__(self, dim: int = 64, vocab_dim: int = 4096, seed: int = 13,
                 text_col: str = "text", id_col: str = "doc_id",
                 out_col: str = "embedding", normalized: bool = False):
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((vocab_dim, dim)) / np.sqrt(dim)
        self.dim = dim
        self.vocab_dim = vocab_dim
        self.text_col = text_col
        self.id_col = id_col
        self.out_col = out_col
        self.normalized = normalized

    def __call__(self, t: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        from ..functions.textnorm import normalize_text_array

        if self.normalized:
            norm = t.column(self.text_col).to_pylist()
        else:
            norm = normalize_text_array(t.column(self.text_col)).to_pylist()
        mat = hashed_tf_matrix([s or "" for s in norm], self.vocab_dim)
        e = mat @ self.proj
        nrm = np.linalg.norm(e, axis=1)
        nrm[nrm == 0] = 1.0
        e = e / nrm[:, None]
        n = len(norm)
        offsets = pa.array((np.arange(n + 1, dtype=np.int64)
                            * self.dim).astype(np.int32))
        values = pa.array(e.reshape(-1), pa.float64())
        return t.append_column(self.out_col,
                               pa.ListArray.from_arrays(offsets, values))


def embed_texts(ds: ray.data.Dataset, dim: int = 64, vocab_dim: int = 4096,
                seed: int = 13, text_col: str = "text",
                out_col: str = "embedding", concurrency=(1, 8),
                batch_size: int = 1024) -> ray.data.Dataset:
    """Compute an embedding column in-pipeline via the :class:`TextEmbedder`
    actor pool (GPU-encoder-shaped: bounded batch, per-actor model state)."""
    return ds.map_batches(
        TextEmbedder,
        fn_constructor_kwargs=dict(dim=dim, vocab_dim=vocab_dim, seed=seed,
                                   text_col=text_col, out_col=out_col),
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)


def hashed_tf_matrix(norm_texts: "list[str]", dim: int,
                     sublinear: bool = True) -> np.ndarray:
    """Vectorized hashing-trick feature matrix over NORMALIZED texts —
    the kernel shared by hashed_tfidf_vectors and the quality-classifier
    scorer (one np.add.at scatter per batch, L2-normalized rows)."""
    from itertools import chain

    from ..functions.hashing import fnv1a64, splitmix64

    tok_lists = [s.split() for s in norm_texts]
    n = len(tok_lists)
    lens = np.fromiter((len(x) for x in tok_lists), np.int64, count=n)
    mat = np.zeros((n, dim), np.float64)
    m = int(lens.sum())
    if m:
        h = splitmix64(fnv1a64(list(chain.from_iterable(tok_lists))))
        doc = np.repeat(np.arange(n, dtype=np.int64), lens)
        bucket = (h % np.uint64(dim)).astype(np.int64)
        sign = 1.0 - 2.0 * ((h >> np.uint64(63)) & np.uint64(1)).astype(np.float64)
        if sublinear:
            # tf per (doc, bucket, sign triple is already folded): count
            # then 1+log — collapse identical (doc, signed-bucket) first
            key = doc * (2 * dim) + bucket * 2 \
                + ((h >> np.uint64(63)) & np.uint64(1)).astype(np.int64)
            uk, cnts = np.unique(key, return_counts=True)
            tf = 1.0 + np.log(cnts.astype(np.float64))
            udoc = uk // (2 * dim)
            ubucket = (uk % (2 * dim)) // 2
            usign = 1.0 - 2.0 * (uk % 2).astype(np.float64)
            np.add.at(mat, (udoc, ubucket), usign * tf)
        else:
            np.add.at(mat, (doc, bucket), sign)
    nrm = np.linalg.norm(mat, axis=1, keepdims=True)
    return np.where(nrm > 0, mat / np.maximum(nrm, 1e-300), 0.0)


def hashed_tfidf_vectors(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
    sublinear: bool = True,
) -> ray.data.Dataset:
    """Hashing-trick text vectorizer (Weinberger et al. 2009 "feature
    hashing"; public method): token → bucket ``splitmix64(fnv1a64(tok)) %
    dim`` with a ± sign bit, sublinear tf (1 + log tf), L2-normalized.
    Model-free and deterministic — the bridge from raw text to the
    embedding operators: output rows are (vec_id, embedding list<double>),
    the same schema the ann_topk / embedding-dedup kernels consume, so
    `hashed_tfidf_vectors(docs) → cosine top-k` is a complete text
    near-dup/similarity pipeline with no external model.  Fully vectorized
    (one np.add.at scatter per batch); partition-invariant (pinned)."""
    import pyarrow as pa

    from ..functions.textnorm import normalize_text_array

    def _vec(t: "pa.Table") -> "pa.Table":
        norm = normalize_text_array(t.column(text_col)).to_pylist()
        mat = hashed_tf_matrix(norm, dim, sublinear)
        return pa.table({
            "vec_id": t.column(id_col),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), pa.float64()), dim),
        })

    return ds.map_batches(_vec, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# distributed PCA over an embedding column — bounded-state second-moment
# reduce (the classic covariance-method PCA; public linear algebra).
# Dimensionality reduction ahead of the ANN / semantic-dedup operators:
# project d-dim embeddings onto the top principal components so the
# downstream GEMMs shrink ×(d/k) with minimal cosine distortion.
# ---------------------------------------------------------------------------

def embedding_pca(emb: ray.data.Dataset, n_components: int = 8,
                  col: str = "embedding",
                  num_shards: int = 16) -> dict:
    """Fit PCA with ONE streaming pass: per-shard partials (count, sum
    vector, X^T X — d²+d+1 doubles each, independent of row count) merged
    in a tree of Ray tasks; the driver receives a single d×d moment
    matrix and runs ``eigh`` on it.  Deterministic sign convention (the
    largest-|w| coordinate of every component is made positive) so the fit
    is partition-invariant (pinned).  Returns ``{"mean": [d],
    "components": [k, d], "explained_var": [k]}``.

    At 100 TB: the exchange is num_shards × (d²+d+1) doubles — nothing
    scales with rows; d is the embedding width (≤ a few thousand), so the
    driver eigh is milliseconds."""
    import ray as _ray

    @_ray.remote
    def _partial(shard_refs):
        n, s, xtx = 0, None, None
        for r in shard_refs:
            t = _ray.get(r)
            if not t.num_rows or col not in t.column_names:
                continue  # column-less empty block from a lazy lineage
            X = np.stack(t.column(col).to_pylist()).astype(np.float64)
            n += len(X)
            s = X.sum(axis=0) if s is None else s + X.sum(axis=0)
            xtx = X.T @ X if xtx is None else xtx + X.T @ X
        return n, s, xtx

    @_ray.remote
    def _merge(*parts):
        parts = [p for p in parts if p[0]]
        n = sum(p[0] for p in parts)
        s = np.sum([p[1] for p in parts], axis=0)
        xtx = np.sum([p[2] for p in parts], axis=0)
        return n, s, xtx

    refs = emb.select_columns([col]).to_arrow_refs()
    shards = [refs[i::num_shards] for i in range(num_shards)]
    parts = [_partial.remote(s) for s in shards if s]
    while len(parts) > 1:
        parts = [_merge.remote(*parts[i:i + 8])
                 for i in range(0, len(parts), 8)]
    n, s, xtx = _ray.get(parts[0])
    if n < 2:
        raise ValueError("embedding_pca needs at least 2 rows")
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    w, V = np.linalg.eigh(cov)              # ascending eigenvalues
    order = np.argsort(-w)[:n_components]
    comps = V[:, order].T                   # [k, d]
    # deterministic sign: largest-|coordinate| entry positive per component
    flip = np.sign(comps[np.arange(len(comps)),
                         np.argmax(np.abs(comps), axis=1)])
    comps = comps * flip[:, None]
    return {"mean": mean, "components": comps,
            "explained_var": np.maximum(w[order], 0.0)}


def pca_transform(emb: ray.data.Dataset, pca: dict,
                  id_col: str = "vec_id",
                  col: str = "embedding") -> ray.data.Dataset:
    """Project embeddings onto fitted components — output keeps the
    (vec_id, embedding) schema the ANN / dedup kernels consume, so
    ``pca_transform(emb, embedding_pca(emb)) → ann_topk / semdedup`` is a
    drop-in reduced-dimension pipeline.  The (mean, components) pair ships
    ONCE via ray.put."""
    import ray as _ray

    from .shuffleops import _broadcast_get

    ref = _ray.put((pca["mean"], pca["components"]))

    def _proj(df: pd.DataFrame) -> pd.DataFrame:
        mean, W = _broadcast_get(ref)
        X = np.stack(df[col].to_numpy()).astype(np.float64)
        Z = (X - mean) @ W.T
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            col: list(Z),
        })

    return emb.map_batches(_proj, batch_format="pandas",
                           batch_size=2048)
