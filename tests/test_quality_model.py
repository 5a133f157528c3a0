"""Model-based quality filter (GPT-3-style classifier gate): planted
separation, deterministic Pareto gate, partition invariance."""

import numpy as np
import pandas as pd
import ray.data

from ent_res_feedback_ray.stages.curation import (
    quality_model_gate,
    quality_model_scores,
    train_quality_classifier,
)

_GOOD = ("the quarterly report presents audited revenue figures and a "
         "detailed methodology appendix with citations")
_BAD = "click here buy now free casino bonus winner prize claim xxx"


def _docs(n, text, start=0):
    return pd.DataFrame({
        "doc_id": np.arange(start, start + n, dtype=np.int64),
        "text": [f"{text} item {i}" for i in range(n)],
    })


def test_quality_classifier_separates_planted_styles():
    corpus = pd.concat([_docs(40, _BAD), _docs(10, _GOOD, start=100)],
                       ignore_index=True)
    reference = _docs(30, _GOOD, start=1000)
    model = train_quality_classifier(
        ray.data.from_pandas(corpus), ray.data.from_pandas(reference),
        dim=128, seed=5)
    scores = quality_model_scores(
        ray.data.from_pandas(corpus), model, dim=128).to_pandas()
    by = dict(zip(scores["doc_id"], scores["q_score"]))
    good_mean = np.mean([by[i] for i in range(100, 110)])
    bad_mean = np.mean([by[i] for i in range(40)])
    assert good_mean > bad_mean + 0.2
    assert len(scores) == len(corpus)


def test_quality_gate_deterministic_and_partition_invariant():
    corpus = pd.concat([_docs(60, _BAD), _docs(20, _GOOD, start=200)],
                       ignore_index=True)
    reference = _docs(25, _GOOD, start=2000)
    model = train_quality_classifier(
        ray.data.from_pandas(corpus), ray.data.from_pandas(reference),
        dim=128, seed=5)
    a = quality_model_gate(ray.data.from_pandas(corpus), model,
                           dim=128, pareto_alpha=2.0).to_pandas()
    b = quality_model_gate(
        ray.data.from_pandas(corpus).repartition(7), model,
        dim=128, pareto_alpha=2.0).to_pandas()
    ka = sorted(a["doc_id"]); kb = sorted(b["doc_id"])
    assert ka == kb                       # partition-invariant keep set
    # high scorers (reference-style) survive at a higher rate than low
    good_kept = sum(1 for i in ka if i >= 200) / 20
    bad_kept = sum(1 for i in ka if i < 60) / 60
    assert good_kept > bad_kept
    assert 0 < len(ka) < len(corpus)      # gate is neither no-op nor drop-all


def test_quality_model_gate_config_stage(tmp_path):
    from ent_res_feedback_ray.pipelines.protocol import build_pipeline

    corpus = pd.concat([_docs(60, _BAD), _docs(20, _GOOD, start=200)],
                       ignore_index=True)
    ref_path = str(tmp_path / "ref.parquet")
    _docs(25, _GOOD, start=2000).to_parquet(ref_path)
    pipe = build_pipeline([
        {"stage": "quality_model_gate", "reference_path": ref_path,
         "dim": 128, "pareto_alpha": 2.0},
    ])
    out = pipe(ray.data.from_pandas(corpus)).to_pandas()
    kept = set(out["doc_id"])
    good_kept = sum(1 for i in kept if i >= 200) / 20
    bad_kept = sum(1 for i in kept if i < 60) / 60
    assert good_kept > bad_kept
    assert set(out.columns) >= {"doc_id", "text"}
