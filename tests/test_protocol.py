"""Stage protocol (SURVEY §2.12): registry, config-driven pipelines, and
variant composition — blocking × scoring × clustering swapped by config."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from ent_res_feedback_ray.pipelines.protocol import (
    Ctx,
    build_pipeline,
    make_stage,
    register_stage,
    stage_names,
)


def _planted_pages() -> tuple[pd.DataFrame, dict[int, int]]:
    """Six docs, two planted duplicate groups + two singletons, all sharing
    one blocking key so every pair is a candidate."""
    texts = [
        "alpha news report about the market crash today extended coverage",
        "alpha news report about the market crash today extended coverage",
        "alpha completely different quarterly earnings statement for the firm",
        "alpha completely different quarterly earnings statement for the firm",
        "alpha unrelated cooking recipe with tomatoes and fresh basil leaves",
        "alpha another standalone travel guide for remote mountain villages",
    ]
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "url": [f"https://ex{i}.com/p" for i in range(6)],
        "text": texts,
        "lang": ["en"] * 6,
    })
    gold = {0: 0, 1: 0, 2: 2, 3: 2, 4: 4, 5: 5}
    return df, gold


BASE = [
    {"stage": "normalize"},
    {"stage": "publish_all_ids"},
    {"stage": "key_blocking"},
    {"stage": "pairs", "carry_cols": ("norm_text", "lang")},
    {"stage": "featurize"},
    {"stage": "linear_score"},
    {"stage": "constraints"},
]


def _pairs_same(assign: pd.DataFrame, gold: dict[int, int],
                id_col: str, lab_col: str) -> None:
    lab = dict(zip(assign[id_col].astype(int), assign[lab_col]))
    for a in gold:
        for b in gold:
            if a < b and a in lab and b in lab:
                assert (lab[a] == lab[b]) == (gold[a] == gold[b]), (a, b)


def test_config_pipeline_transitive_matches_gold():
    df, gold = _planted_pages()
    run = build_pipeline(BASE + [{"stage": "cluster_transitive"}])
    out = run(ray.data.from_pandas(df)).to_pandas()
    assert sorted(out["doc_id"]) == list(range(6))
    _pairs_same(out, gold, "doc_id", "cluster_id")


def test_config_pipeline_variants_hac_cc_lsh():
    """Same planted corpus through three variant configs: HAC clustering,
    CC clustering, and LSH blocking — pure config edits, same gold."""
    df, gold = _planted_pages()
    ds = ray.data.from_pandas(df)

    hac = build_pipeline(BASE + [{"stage": "cluster_hac", "eps": 0.5}])
    out_hac = hac(ds).to_pandas()
    _pairs_same(out_hac, gold, "id", "cluster_id")

    cc = build_pipeline(BASE + [{"stage": "cluster_cc"}])
    out_cc = cc(ds).to_pandas()
    _pairs_same(out_cc, gold, "id", "cluster_id")

    lsh = build_pipeline([
        {"stage": "normalize"},
        {"stage": "publish_all_ids"},
        {"stage": "lsh_blocking", "num_perm": 64, "num_bands": 16},
        {"stage": "pairs", "carry_cols": ("norm_text", "lang"), "dedup": True},
        {"stage": "featurize"},
        {"stage": "linear_score"},
        {"stage": "constraints"},
        {"stage": "cluster_transitive"},
    ])
    out_lsh = lsh(ds).to_pandas()
    # LSH recall: the exact-duplicate groups must band together
    _pairs_same(out_lsh, gold, "doc_id", "cluster_id")


def test_ctx_side_state_trained_score():
    """ctx carries the fitted scorer into the actor-pool stage — the
    train-on-driver / infer-distributed seam as a config variant."""
    from ent_res_feedback_ray.stages.features import FEATURE_COLS
    from ent_res_feedback_ray.state.model import LogisticScorer

    df, gold = _planted_pages()
    ds = ray.data.from_pandas(df)
    featurized = build_pipeline(BASE[:-2])(ds)  # through featurize
    feats = featurized.to_pandas()
    X = feats[list(FEATURE_COLS)].to_numpy(np.float64)
    y = np.array([1.0 if gold[a] == gold[b] else 0.0
                  for a, b in zip(feats["id1"], feats["id2"])])
    model = LogisticScorer().fit(X, y)

    run = build_pipeline(BASE[:-2] + [
        {"stage": "trained_score"},
        {"stage": "constraints"},
        {"stage": "cluster_transitive", "threshold": 0.5},
    ])
    out = run(ds, Ctx(params={"model": model})).to_pandas()
    _pairs_same(out, gold, "doc_id", "cluster_id")


def test_registry_errors_and_custom_stage():
    assert "normalize" in stage_names()
    with pytest.raises(KeyError):
        make_stage("no_such_stage")
    with pytest.raises(ValueError):
        register_stage("normalize")(lambda **kw: None)

    @register_stage("add_len_col_test")
    def _add_len(col: str = "text") -> object:
        def _s(ds, ctx):
            return ds.map_batches(
                lambda df: df.assign(text_len=df[col].str.len()),
                batch_format="pandas")
        return _s

    df, _ = _planted_pages()
    run = build_pipeline([{"stage": "add_len_col_test"}])
    out = run(ray.data.from_pandas(df)).to_pandas()
    assert (out["text_len"] == df["text"].str.len()).all()


def test_cli_pipeline_from_json_config(tmp_path, synth_pages):
    """python -m ... pipeline --config runs a config-driven variant
    pipeline end-to-end from a JSON file to a parquet checkpoint."""
    import io
    import json
    import os
    from contextlib import redirect_stdout

    import ray.data

    from ent_res_feedback_ray.__main__ import main

    config = [
        {"stage": "add_doc_ids"},
        {"stage": "normalize"},
        {"stage": "publish_all_ids"},
        {"stage": "key_blocking"},
        {"stage": "pairs", "carry_cols": ["norm_text", "lang"]},
        {"stage": "featurize"},
        {"stage": "linear_score"},
        {"stage": "constraints"},
        {"stage": "cluster_transitive"},
    ]
    cfg = tmp_path / "pipeline.json"
    cfg.write_text(json.dumps(config))
    pages_path, _ = synth_pages
    out = str(tmp_path / "plout")
    with redirect_stdout(io.StringIO()):
        assert main(["pipeline", "--config", str(cfg),
                     "--pages", pages_path, "--out", out]) == 0
    got = ray.data.read_parquet(out, file_extensions=["parquet"]).to_pandas()
    assert set(got.columns) == {"doc_id", "cluster_id"}
    assert len(got) > 0
    assert os.path.exists(os.path.join(out, "_SUCCESS"))


def test_config_curation_pipeline_matches_funnel_keepers():
    """A config-driven curation pipeline (lang → quality → decontaminate →
    exact-dedup → paragraph-dedup → PII) keeps exactly the docs the
    curate_corpus funnel keeps, with the same curated text."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.pipelines.protocol import build_pipeline

    boiler = ("subscribe to the newsletter and follow the weekly updates "
              "from a team of writers in the field ")
    rows = [
        {"doc_id": 0, "text": "the quick brown fox jumps over the lazy dog "
                              "in a sunny meadow of wild flowers", "lang": "en"},
        {"doc_id": 1, "text": "the first article is a long note about rivers "
                              "and it keeps a steady mix of words in every "
                              "line\n\n" + boiler, "lang": "en"},
        {"doc_id": 2, "text": boiler + "\n\nthe second article is a note to "
                              "a friend at someone@example.org about a trip",
         "lang": "en"},
        {"doc_id": 3, "text": "der hund und die katze das haus ist ein tier "
                              "und der baum", "lang": "de"},
        {"doc_id": 4, "text": "the and of to a in is " * 6, "lang": "en"},
        {"doc_id": 5, "text": "the first article is a long note about rivers "
                              "and it keeps a steady mix of words in every "
                              "line\n\n" + boiler, "lang": "en"},  # dup of 1
    ]
    docs = pd.DataFrame(rows)

    run = build_pipeline([
        {"stage": "decontaminate_gate", "n": 5, "bench_mod": 7},
        {"stage": "lang_gate"},
        {"stage": "quality_gate"},
        {"stage": "exact_dedup_gate"},
        {"stage": "paragraph_dedup"},
        {"stage": "pii_redact"},
    ])
    out = run(ray.data.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # 0 drops (benchmark), 3 (lang), 4 (quality), 5 (exact dup of 1)
    assert out["doc_id"].tolist() == [1, 2]
    assert boiler.strip() in out.loc[0, "redacted_text"]
    assert boiler.strip() not in out.loc[1, "redacted_text"]  # para dedup
    assert "<EMAIL>" in out.loc[1, "redacted_text"]


def test_domain_and_unigram_gates():
    import numpy as np
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.pipelines.protocol import build_pipeline

    common = "the quick brown fox jumps over the lazy dog in the meadow"
    n_common = 10
    df = pd.DataFrame({
        "doc_id": np.arange(n_common + 2, dtype=np.int64),
        "url": [f"http://good.com/{i}" for i in range(n_common)]
        + ["http://spam.example/b", "http://good.com/z"],
        "text": [common] * n_common
        + [common, "zzqv wvuqk jjqzx qqpw zxcv mnbv"],  # blocked, gibberish
    })
    run = build_pipeline([
        {"stage": "domain_gate", "blocklist": ["spam.example"]},
        {"stage": "unigram_gate", "max_logloss": 3.5},
    ])
    out = run(ray.data.from_pandas(df)).to_pandas()
    # blocked host (10) and gibberish (11) both dropped
    assert sorted(out["doc_id"]) == list(range(n_common))


def test_config_pipeline_salted_pairs_variant():
    """The salted pair stage is a one-line config edit and yields the same
    clustering (tiny blocks fall through to the normal path verbatim)."""
    df, gold = _planted_pages()
    cfg = [s if s.get("stage") != "pairs"
           else {"stage": "pairs", "carry_cols": ("norm_text", "lang"),
                 "salted": True, "salt_threshold_rows": 4, "chunk_rows": 2,
                 "max_pairs_per_block": 3}
           for s in BASE] + [{"stage": "cluster_transitive"}]
    out = build_pipeline(cfg)(ray.data.from_pandas(df)).to_pandas()
    assert sorted(out["doc_id"]) == list(range(6))
    with pytest.raises(ValueError):
        make_stage("pairs", salted=True, oversize_mode="sample")


def test_semdedup_gate_stage():
    """Config-registry semantic-dedup gate: exact text copies collapse to
    the first occurrence; distinct docs pass through."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.pipelines.protocol import build_pipeline

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["the quick brown fox jumps over the lazy dog"] * 3 + [
            "completely different content about entity resolution",
            "unrelated text about streaming dataflow engines",
            "another unique document mentioning minhash bands"],
    })
    pipe = build_pipeline([
        {"stage": "semdedup_gate", "eps": 0.05, "n_centroids": 2}])
    out = pipe(ray.data.from_pandas(docs)).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [0, 3, 4, 5]
    assert set(out.columns) == {"doc_id", "text"}


def test_dsir_select_stage(tmp_path):
    """Config-registry DSIR gate: target-domain docs survive, off-domain
    docs are resampled away (gumbel_scale=0 → exact top-k)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.pipelines.protocol import build_pipeline

    sci = "quantum lattice tensor eigenvalue manifold proof".split()
    spam = "click free winner prize buy now".split()
    rng = np.random.default_rng(5)
    docs = pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64),
        "text": [" ".join(rng.choice(sci if i < 10 else spam, size=20))
                 for i in range(20)],
    })
    target = pd.DataFrame({
        "doc_id": np.arange(500, 505, dtype=np.int64),
        "text": [" ".join(rng.choice(sci, size=20)) for _ in range(5)],
    })
    tp = str(tmp_path / "target.parquet")
    target.to_parquet(tp)
    pipe = build_pipeline([
        {"stage": "dsir_select", "target_path": tp, "k": 8,
         "gumbel_scale": 0.0}])
    out = pipe(ray.data.from_pandas(docs)).to_pandas()
    assert len(out) == 8
    assert (out["doc_id"] < 10).all()
    assert set(out.columns) == {"doc_id", "text"}


def test_config_model_gated_funnel_matches_direct_calls(tmp_path):
    """Round-4 verdict item 7: the REGISTRY composes the model-based
    variants — a config-driven funnel (exact-dedup → ensemble LID →
    quality-classifier gate) is bit-equal to chaining the underlying
    stage functions directly."""
    import hashlib

    import ray.data

    from ent_res_feedback_ray.functions.textnorm import normalize_text_array
    from ent_res_feedback_ray.pipelines.protocol import build_pipeline
    from ent_res_feedback_ray.stages.curation import (
        quality_model_gate, train_quality_classifier)
    from ent_res_feedback_ray.stages.shuffleops import (
        bucketed_group_apply, join_on_key)
    from ent_res_feedback_ray.stages.textstats import lang_id_ensemble_batch

    sf = "/root/testdata/sf0.001"
    docs = ray.data.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id", "text"])
    ref_path = str(tmp_path / "ref.parquet")
    docs.to_pandas().head(100).to_parquet(ref_path)

    cfg = [
        {"stage": "exact_dedup_gate"},
        {"stage": "lang_ensemble_gate", "lang": "en"},
        {"stage": "quality_model_gate", "reference_path": ref_path,
         "dim": 64, "seed": 37, "max_train_per_side": 200},
    ]
    got = build_pipeline(cfg)(docs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    # --- direct chain (same underlying functions, no registry) ---
    import pyarrow as pa

    def _fp(t: pa.Table) -> pa.Table:
        norm = normalize_text_array(t.column("text")).to_pylist()
        return pa.table({
            "doc_id": t.column("doc_id"),
            "fingerprint": pa.array(
                [hashlib.md5(s.encode("utf-8")).hexdigest()
                 for s in norm], pa.string())})

    def _first(part):
        keep = part["doc_id"] == part.groupby("fingerprint")["doc_id"] \
            .transform("min")
        return part.loc[keep, ["doc_id"]]

    keepers = bucketed_group_apply(
        docs.map_batches(_fp, batch_format="pyarrow"), "fingerprint", _first)
    deduped = join_on_key(docs, keepers, "doc_id", how="semi")

    def _lid(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pred = lang_id_ensemble_batch(t)
        return t.filter(pc.and_(pc.equal(pred.column("pred_marker"), "en"),
                                pred.column("is_reliable")))

    lided = deduped.map_batches(_lid, batch_format="pyarrow").materialize()
    ref = ray.data.read_parquet(ref_path, columns=["doc_id", "text"])
    model = train_quality_classifier(lided, ref, dim=64, seed=37,
                                     max_train_per_side=200)
    kept = quality_model_gate(lided, model, dim=64, pareto_alpha=9.0,
                              seed=37 ^ 0x5DEECE66D) \
        .select_columns(["doc_id"])
    want = join_on_key(lided, kept, "doc_id", how="semi").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    pd.testing.assert_frame_equal(got, want)
    assert 0 < len(got) < docs.count()
