"""Pair scoring: a deterministic linear scorer (oracle-parity path) and a
trained logistic scorer served by an actor pool.

Reference analogs: ``PairwiseModeler`` — driver-side training, distributed
inference (/root/reference/s2and/model.py:744-876) and the 1M-pair scoring
batches of ``Clusterer.make_distance_matrices``
(/root/reference/s2and/model.py:189-333).  Training data is bounded by
construction (≤100k labeled pairs, e2e_scripts/preprocess_s2and_data.py:34-36)
so fitting stays on the driver; inference is ``map_batches`` over the pair
Dataset — the scorer state rides in actor ``__init__`` via an object-store
ref (``ray.put`` once, NOT re-shipped per batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .features import FEATURE_COLS


def linear_score_batch(batch: pa.Table) -> pa.Table:
    """Deterministic linear scorer — the SQL twin is SCORE_SQL in features.py.

    Association order mirrors the SQL exactly (exactly-rounded IEEE ops), so
    Ray and DuckDB produce bit-identical doubles."""
    def c(name: str) -> np.ndarray:
        arr = batch.column(name).to_numpy(zero_copy_only=False).astype(np.float64)
        return np.nan_to_num(arr, nan=0.0)

    sj, tj, lv, lr = c("shingle_jaccard"), c("token_jaccard"), c("lev_sim"), c("len_ratio")
    z = ((0.55 * sj + 0.25 * tj) + 0.15 * lv) + 0.05 * lr
    score = np.minimum(1.0, np.maximum(0.0, z))
    return batch.append_column("score", pa.array(score, pa.float64()))


def linear_scoring_stage(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(linear_score_batch, batch_format="pyarrow",
                          batch_size=None)


class TrainedScorer:
    """Actor-pool scorer: model weights fetched from the object store once per
    actor (``__init__``), applied vectorized per batch (``__call__``).

    ``model_ref`` is a ``ray.put`` handle to a fitted
    ``state.model.LogisticScorer`` — broadcast once, read per actor."""

    def __init__(self, model_ref, feature_cols: list[str] | None = None,
                 out_col: str = "score"):
        self.model = ray.get(model_ref)
        self.feature_cols = feature_cols or FEATURE_COLS
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = np.column_stack([
            batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            for c in self.feature_cols
        ])
        # scorers that declare a nan_fill get pre-imputed input (logistic);
        # scorers with native missing handling (MLP mask-concat) get raw NaNs
        nf = getattr(self.model, "nan_fill", None)
        if nf is not None:
            X = np.nan_to_num(X, nan=nf)
        p = self.model.predict_proba(X)
        return batch.append_column(self.out_col, pa.array(p, pa.float64()))


def trained_scoring_stage(ds: ray.data.Dataset, model, concurrency=(1, 4),
                          batch_size: int = 8192) -> ray.data.Dataset:
    model_ref = ray.put(model)
    return ds.map_batches(
        TrainedScorer,
        fn_constructor_kwargs={"model_ref": model_ref},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
