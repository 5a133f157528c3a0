"""Formal Stage protocol: registry + pipeline-from-config — the rebuild's
user-extension surface (SURVEY.md §2.12).

Reference extension hooks this formalizes: ``features_to_use`` feature-group
selection (/root/reference/s2and/featurizer.py:55-74), pluggable
``classifier`` / ``cluster_model`` (/root/reference/s2and/model.py:73-109),
and the documented ``compute_block`` override ("Override for other
definition of blocks", /root/reference/s2and/text.py:634-635).  Instead of
subclass seams, the Ray rebuild exposes one composable shape:

    Stage = Callable[[ray.data.Dataset, Ctx], ray.data.Dataset]

Stages are pure Dataset→Dataset transforms; cross-stage side state (seeds,
a trained model, the singleton id table) travels in :class:`Ctx` — never as
module globals.  A pipeline is data: a list of ``{"stage": name, **kwargs}``
dicts, resolved against the registry by :func:`build_pipeline`, so variant
pipelines (key vs LSH blocking, linear vs trained scoring, transitive vs
HAC vs CC clustering) are config edits, not code forks.

Register custom stages with :func:`register_stage`; factories receive the
config kwargs once at build time and return the Stage closure.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import ray.data

Stage = Callable[[ray.data.Dataset, "Ctx"], ray.data.Dataset]
StageFactory = Callable[..., Stage]

_REGISTRY: dict[str, StageFactory] = {}


@dataclass
class Ctx:
    """Cross-stage side state: constraint seeds, a fitted scorer, the
    singleton-fill id table, arbitrary user entries.  Mutable on purpose —
    a stage may publish state for a later stage (e.g. blocking publishes
    ``all_ids`` for the clusterer's singleton fill)."""

    params: dict[str, Any] = field(default_factory=dict)

    def get(self, key: str, default: Any = None) -> Any:
        return self.params.get(key, default)


def register_stage(name: str) -> Callable[[StageFactory], StageFactory]:
    """Decorator: add a stage factory to the registry under ``name``."""

    def _reg(factory: StageFactory) -> StageFactory:
        if name in _REGISTRY:
            raise ValueError(f"stage {name!r} already registered")
        _REGISTRY[name] = factory
        return factory

    return _reg


def stage_names() -> list[str]:
    return sorted(_REGISTRY)


def make_stage(name: str, **kwargs) -> Stage:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown stage {name!r}; registered: {stage_names()}")
    return _REGISTRY[name](**kwargs)


def build_pipeline(config: list[dict]) -> Callable[..., ray.data.Dataset]:
    """``[{"stage": name, **kwargs}, …]`` → one callable
    ``(Dataset, ctx=None) -> Dataset`` applying the stages in order.
    Unknown stage names and bad kwargs fail at BUILD time, not mid-run."""
    stages = [
        make_stage(c["stage"], **{k: v for k, v in c.items() if k != "stage"})
        for c in config
    ]

    def run(ds: ray.data.Dataset, ctx: Ctx | None = None) -> ray.data.Dataset:
        ctx = ctx or Ctx()
        for s in stages:
            ds = s(ds, ctx)
        return ds

    return run


# ---------------------------------------------------------------------------
# built-in stages (thin closures over the package's stage functions)
# ---------------------------------------------------------------------------


@register_stage("normalize")
def _normalize(**kw) -> Stage:
    from ..stages.normalize import normalize_stage

    def _s(ds, ctx):
        return normalize_stage(ds, **kw)

    return _s


@register_stage("add_doc_ids")
def _add_doc_ids() -> Stage:
    """Stable doc ids from the url column (skipped if already present)."""

    def _s(ds, ctx):
        if "doc_id" in (ds.schema().names or []):
            return ds
        from .er import add_doc_ids

        return add_doc_ids(ds)

    return _s


@register_stage("publish_all_ids")
def _publish_all_ids(id_col: str = "doc_id") -> Stage:
    """Publish the full id table into ``ctx.params['all_ids']`` (column
    ``node``) for the clusterer's singleton fill — stays a Dataset."""

    def _s(ds, ctx):
        ctx.params["all_ids"] = ds.select_columns([id_col]).map_batches(
            lambda t: t.rename_columns(["node"]), batch_format="pyarrow")
        return ds

    return _s


@register_stage("key_blocking")
def _key_blocking(**kw) -> Stage:
    from ..stages.blocking import key_blocking_stage

    def _s(ds, ctx):
        return key_blocking_stage(ds, **kw)

    return _s


@register_stage("lsh_blocking")
def _lsh_blocking(num_perm: int = 64, num_bands: int = 16, seed: int = 42,
                  carry_cols: tuple = ("doc_id", "norm_text", "lang")) -> Stage:
    """MinHash + band explode; band_key lands in ``block_key`` so the pairs
    stage downstream is blocking-family-agnostic."""
    from ..stages.blocking import band_explode_stage, minhash_stage

    def _s(ds, ctx):
        mh = minhash_stage(ds.select_columns(list(carry_cols)),
                           num_perm=num_perm, seed=seed)
        bands = band_explode_stage(mh, num_bands=num_bands,
                                   keep_cols=list(carry_cols))
        return bands.map_batches(
            lambda t: t.rename_columns(
                ["block_key" if c == "band_key" else c
                 for c in t.column_names]),
            batch_format="pyarrow")

    return _s


@register_stage("pairs")
def _pairs(carry_cols: tuple = ("norm_text", "lang"), **kw) -> Stage:
    """``salted=True`` routes oversized blocks through
    ``salted_window_pairs`` (identical pair set, straggler-free — the
    north-star skew mechanism); pass ``salt_threshold_rows``/``chunk_rows``
    to tune when/how blocks shard."""
    from ..stages.pairs import (dedup_pairs, pairs_from_blocks,
                                salted_window_pairs)

    dedup = kw.pop("dedup", False)
    salted = kw.pop("salted", False)

    if salted and kw.pop("oversize_mode", "window") != "window":
        raise ValueError("salted pairs is window-mode only")

    def _s(ds, ctx):
        fn = salted_window_pairs if salted else pairs_from_blocks
        out = fn(ds, block_col="block_key", id_col="doc_id",
                 carry_cols=list(carry_cols), **kw)
        return dedup_pairs(out) if dedup else out

    return _s


@register_stage("featurize")
def _featurize(**kw) -> Stage:
    from ..stages.features import featurize_stage

    def _s(ds, ctx):
        return featurize_stage(ds, token_df_ref=ctx.get("token_df"), **kw)

    return _s


@register_stage("linear_score")
def _linear_score() -> Stage:
    from ..stages.scoring import linear_scoring_stage

    def _s(ds, ctx):
        return linear_scoring_stage(ds)

    return _s


@register_stage("trained_score")
def _trained_score(**kw) -> Stage:
    """Actor-pool inference with the scorer published in
    ``ctx.params['model']`` (the train-on-driver / infer-distributed
    split, /root/reference/s2and/model.py:744-876)."""
    from ..stages.scoring import trained_scoring_stage

    def _s(ds, ctx):
        model = ctx.get("model")
        if model is None:
            raise ValueError("trained_score needs ctx.params['model']")
        return trained_scoring_stage(ds, model, **kw)

    return _s


@register_stage("constraints")
def _constraints(**kw) -> Stage:
    from ..stages.constraints import constraint_stage

    def _s(ds, ctx):
        return constraint_stage(ds, seeds=ctx.get("seeds"),
                                alias_pairs=ctx.get("alias_pairs"), **kw)

    return _s


@register_stage("cluster_transitive")
def _cluster_transitive(threshold: float = 0.5, **kw) -> Stage:
    """Global transitive closure → (doc_id, cluster_id)."""
    from ..stages.clustering import transitive_clustering

    def _s(ds, ctx):
        assign = transitive_clustering(ds, all_ids=ctx.get("all_ids"),
                                       threshold=threshold, **kw)
        return assign.map_batches(
            lambda t: t.select(["node", "label"]).rename_columns(
                ["doc_id", "cluster_id"]),
            batch_format="pyarrow")

    return _s


@register_stage("cluster_hac")
def _cluster_hac(eps: float = 0.5) -> Stage:
    """Per-block average-linkage HAC cut over distance = 1 − score."""
    from ..stages.clustering import hac_block_clustering

    def _dist(t: pa.Table) -> pa.Table:
        s = t.column("score").to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column("distance", pa.array(1.0 - s, pa.float64()))

    def _s(ds, ctx):
        return hac_block_clustering(
            ds.map_batches(_dist, batch_format="pyarrow"), eps=eps)

    return _s


@register_stage("cluster_cc")
def _cluster_cc(**kw) -> Stage:
    """Per-block correlation-clustering inference (SDP + max-agree cut)."""
    from ..stages.correlation import cc_block_clustering

    def _s(ds, ctx):
        return cc_block_clustering(ds, **kw)

    return _s


# ---------------------------------------------------------------------------
# curation stages — config-composable LM-data hygiene (each a thin closure
# over stages/curation.py + stages/dedup.py; a curation pipeline is a list
# of these, same registry as the ER stages above)
# ---------------------------------------------------------------------------


@register_stage("lang_gate")
def _lang_gate(lang: str = "en") -> Stage:
    """Keep docs whose predicted language is ``lang`` (stopword-argmax
    LID, textstats.lang_id_batch kernel)."""
    from ..stages.textstats import lang_id_batch

    def _s(ds, ctx):
        def _f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            pred = lang_id_batch(t)
            return t.filter(pc.equal(pred.column("pred_lang"), lang))

        return ds.map_batches(_f, batch_format="pyarrow")

    return _s


@register_stage("lang_ensemble_gate")
def _lang_ensemble_gate(lang: str = "en", require_reliable: bool = True) -> Stage:
    """Keep docs whose ENSEMBLE language prediction is ``lang`` — the
    two-voter LID with the reference ``is_reliable`` agreement logic
    (marker-argmax + trigram voter, textstats.lang_id_ensemble_batch;
    reference /root/reference/s2and/text.py:266-309).  With
    ``require_reliable`` the voters must agree AND have ≥2 marker hits —
    the model-based-LID seam the curation funnel upgrades to when a real
    fastText model is available."""
    from ..stages.textstats import lang_id_ensemble_batch

    def _s(ds, ctx):
        def _f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            pred = lang_id_ensemble_batch(t)
            keep = pc.equal(pred.column("pred_marker"), lang)
            if require_reliable:
                keep = pc.and_(keep, pred.column("is_reliable"))
            return t.filter(keep)

        return ds.map_batches(_f, batch_format="pyarrow")

    return _s


@register_stage("quality_gate")
def _quality_gate() -> Stage:
    """Keep docs passing the Gopher-rule chain (no violated rule)."""
    from ..stages.curation import quality_drop_reasons
    from ..stages.textstats import quality_metrics_batch

    def _s(ds, ctx):
        def _f(t: pa.Table) -> pa.Table:
            reasons = quality_drop_reasons(
                quality_metrics_batch(t).to_pandas())
            return t.filter(pa.array(reasons == ""))

        return ds.map_batches(_f, batch_format="pyarrow")

    return _s


@register_stage("decontaminate_gate")
def _decontaminate_gate(n: int = 13, bench_mod: int = 17) -> Stage:
    """Drop benchmark docs AND docs sharing any word n-gram with them
    (broadcast searchsorted — no shuffle)."""
    import ray as _ray

    from ..functions.textnorm import normalize_text_array
    from ..stages.curation import _bench_ngrams_ref, _collision_counts

    class _Gate:
        def __init__(self, bench_ref):
            self.bench = _ray.get(bench_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t.column("doc_id").combine_chunks())
            norm = normalize_text_array(t.column("text")).to_pylist()
            hit = _collision_counts(self.bench, norm, n) > 0
            return t.filter(pa.array((ids % bench_mod != 0) & ~hit))

    def _s(ds, ctx):
        bench_ref = _bench_ngrams_ref(ds, n, bench_mod)
        return ds.map_batches(_Gate, fn_constructor_args=(bench_ref,),
                              batch_format="pyarrow", concurrency=(1, 8))

    return _s


@register_stage("exact_dedup_gate")
def _exact_dedup_gate(num_buckets: int = 32) -> Stage:
    """Keep the min-doc_id holder of each normalized-text fingerprint:
    light (fingerprint, doc_id) election shuffle, then a semi-join back —
    text never enters the election exchange."""
    import hashlib

    import pandas as pd

    from ..functions.textnorm import normalize_text_array
    from ..stages.shuffleops import bucketed_group_apply, join_on_key

    def _s(ds, ctx):
        def _fp(t: pa.Table) -> pa.Table:
            norm = normalize_text_array(t.column("text")).to_pylist()
            return pa.table({
                "doc_id": t.column("doc_id"),
                "fingerprint": pa.array(
                    [hashlib.md5(s.encode("utf-8")).hexdigest()
                     for s in norm], pa.string()),
            })

        def _first(part: pd.DataFrame) -> pd.DataFrame:
            keep = part["doc_id"] == part.groupby("fingerprint")["doc_id"] \
                .transform("min")
            return part.loc[keep, ["doc_id"]]

        keepers = bucketed_group_apply(
            ds.map_batches(_fp, batch_format="pyarrow"), "fingerprint",
            _first, num_buckets)
        return join_on_key(ds, keepers, "doc_id", num_buckets, how="semi")

    return _s


@register_stage("paragraph_dedup")
def _paragraph_dedup(**kw) -> Stage:
    from ..stages.dedup import paragraph_dedup

    def _s(ds, ctx):
        return paragraph_dedup(ds, **kw)

    return _s


@register_stage("pii_redact")
def _pii_redact(text_col: str = "text") -> Stage:
    from ..stages.curation import redact_pii

    def _s(ds, ctx):
        return redact_pii(ds, text_col=text_col)

    return _s


@register_stage("embed_text")
def _embed_text(dim: int = 64, vocab_dim: int = 4096, seed: int = 13,
                text_col: str = "text", out_col: str = "embedding",
                batch_size: int = 1024) -> Stage:
    """Compute an embedding column in-pipeline (TextEmbedder actor pool —
    the SPECTER/SBERT seam with a deterministic public stand-in kernel)."""
    from ..stages.similarity import embed_texts

    def _s(ds, ctx):
        return embed_texts(ds, dim=dim, vocab_dim=vocab_dim, seed=seed,
                           text_col=text_col, out_col=out_col,
                           batch_size=batch_size)

    return _s


@register_stage("shuffle")
def _shuffle(id_col: str = "doc_id", seed: int = 17) -> Stage:
    """Deterministic global shuffle (md5 hash-sort) — the training-data
    export permutation."""
    from ..stages.packing import deterministic_shuffle

    def _s(ds, ctx):
        return deterministic_shuffle(ds, id_col=id_col, seed=seed)

    return _s


@register_stage("pack_sequences")
def _pack_sequences(**kw) -> Stage:
    from ..stages.packing import pack_sequences

    def _s(ds, ctx):
        return pack_sequences(ds, **kw)

    return _s


@register_stage("domain_gate")
def _domain_gate(blocklist: "list[str] | None" = None,
                 url_col: str = "url") -> Stage:
    """Drop docs whose URL host is on the blocklist (broadcast frozenset;
    host = third '/'-segment, matching the facet twin's convention)."""
    import ray as _ray

    blocked = frozenset(blocklist or [])

    def _s(ds, ctx):
        ref = _ray.put(blocked)

        def _f(df):
            from ..stages.shuffleops import _broadcast_get

            bl = _broadcast_get(ref)
            host = df[url_col].str.split("/").str[2]
            return df[~host.isin(bl)]

        return ds.map_batches(_f, batch_format="pandas")

    return _s


@register_stage("unigram_gate")
def _unigram_gate(max_logloss: float = 12.0, text_col: str = "text") -> Stage:
    """Drop docs whose corpus-unigram log-loss exceeds ``max_logloss``
    (the model-free perplexity gate) — scores via textstats.unigram_logloss
    then a semi-join back on doc_id, so the text column never enters the
    scoring exchange twice."""
    from ..stages.shuffleops import join_on_key
    from ..stages.textstats import unigram_logloss

    def _s(ds, ctx):
        scores = unigram_logloss(ds, text_col=text_col)

        def _keep(df):
            return df.loc[df["logloss"] <= max_logloss, ["doc_id"]]

        keepers = scores.map_batches(_keep, batch_format="pandas")
        return join_on_key(ds, keepers, "doc_id", how="semi")

    return _s


@register_stage("semdedup_gate")
def _semdedup_gate(eps: float = 0.25, n_centroids: int = 8,
                   seed: int = 42, dim: int = 256,
                   num_buckets: int = 32) -> Stage:
    """Semantic-dedup gate (SemDeDup, Abbas et al. 2023): hashed-tfidf
    vectorize the text (model-free bridge), k-means-partition, prune
    within-cluster cosine near-dups keeping the lowest-centroid-sim
    member, then semi-join the keep set back onto the docs.  Composes
    ``hashed_tfidf_vectors → semdedup → join_on_key`` — all bucketed,
    nothing driver-side."""
    from ..stages.dedup import semdedup
    from ..stages.shuffleops import join_on_key
    from ..stages.similarity import hashed_tfidf_vectors

    def _s(ds, ctx):
        vecs = hashed_tfidf_vectors(ds, text_col="text", id_col="doc_id",
                                    dim=dim)
        verdicts = semdedup(vecs, eps=eps, n_centroids=n_centroids,
                            seed=seed)

        def _keepers(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table(
                {"doc_id": t.filter(t.column("keep")).column("vec_id")})

        keepers = verdicts.map_batches(_keepers, batch_format="pyarrow")
        return join_on_key(ds, keepers, "doc_id", num_buckets, how="semi")

    return _s


@register_stage("dsir_select")
def _dsir_select(target_path: str, k: int, seed: int = 17,
                 gumbel_scale: float = 1.0,
                 num_buckets: int = 32) -> Stage:
    """DSIR importance-resampling gate (Xie et al. 2023): score docs by
    the hashed-unigram log ratio against the target-domain parquet at
    ``target_path`` (columns doc_id, text), Gumbel-top-k select, semi-join
    the winners back onto the stream."""
    from ..stages.curation import dsir_select
    from ..stages.shuffleops import join_on_key

    def _s(ds, ctx):
        target = ray.data.read_parquet(target_path,
                                       columns=["doc_id", "text"])
        sel = dsir_select(ds, target, k=k, seed=seed,
                          gumbel_scale=gumbel_scale) \
            .select_columns(["doc_id"])
        return join_on_key(ds, sel, "doc_id", num_buckets, how="semi")

    return _s


@register_stage("quality_model_gate")
def _quality_model_gate(reference_path: str, dim: int = 256,
                        pareto_alpha: float = 9.0, seed: int = 37,
                        max_train_per_side: int = 10_000,
                        num_buckets: int = 32) -> Stage:
    """Model-based quality gate (GPT-3 Appendix-A classifier filter /
    FineWeb-Edu family): train a logistic reference-vs-corpus classifier
    over hashed-TF-IDF features (driver fit on a bounded seeded sample;
    the model is dim+1 doubles), score every doc in an actor pool, keep
    via the deterministic per-doc Pareto rule, semi-join survivors back
    onto the stream.  ``reference_path``: parquet with (doc_id, text) of
    the trusted reference set."""
    from ..stages.curation import quality_model_gate, train_quality_classifier
    from ..stages.shuffleops import join_on_key

    def _s(ds, ctx):
        # diamond consumer (README rule 9): train-sample, gate scoring and
        # the semi-join all read ds — materialize once instead of
        # re-executing the upstream pipeline per consumer
        ds = ds.materialize()
        reference = ray.data.read_parquet(reference_path,
                                          columns=["doc_id", "text"])
        model = train_quality_classifier(
            ds, reference, dim=dim, seed=seed,
            max_train_per_side=max_train_per_side)
        # distinct hash stream for the gate's Pareto keep-draw: reusing the
        # training seed would couple training-sample membership (smallest
        # splitmix draws) with the keep decision (same smallest draws)
        kept = quality_model_gate(ds, model, dim=dim,
                                  pareto_alpha=pareto_alpha,
                                  seed=seed ^ 0x5DEECE66D) \
            .select_columns(["doc_id"])
        return join_on_key(ds, kept, "doc_id", num_buckets, how="semi")

    return _s
