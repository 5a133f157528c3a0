"""Entity-resolution pipeline over the web-page table, plus DuckDB oracles.

Stage graph (SURVEY.md §7.2):
pages → normalize (map_batches) → block keys (map_batches) →
groupby(block_key).map_groups(pairs) → featurize (map_batches) →
score (linear or trained actor pool) → constraints → thresholded edges →
connected components (distributed min-label propagation) → assignments.

Every oracle-checked query here has a bit-exact SQL twin: features/scores use
only exactly-rounded IEEE ops, clustering's SQL twin is a recursive CTE whose
fixpoint (min reachable id) equals min-label propagation's.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..eval.metrics import b3_prf, pairwise_prf
from ..sources.pages import PAGES_CTE, load_pages
from ..stages.blocking import BLOCK_KEY_SQL, key_blocking_stage
from ..stages.clustering import transitive_clustering
from ..stages.constraints import constraint_stage
from ..stages.features import (
    LANG_MATCH_SQL,
    LEN_RATIO_SQL,
    LEV_SIM_SQL,
    SCORE_SQL,
    SHINGLE_JACCARD_SQL,
    SHINGLES_SQL,
    TOKEN_JACCARD_SQL,
    featurize_stage,
)
from ..stages.normalize import normalize_stage
from ..stages.pairs import pairs_from_blocks
from ..stages.scoring import linear_scoring_stage
from ..functions.textnorm import NORMALIZE_SQL

SCORE_THRESHOLD = 0.5
GOLD_JACCARD = 0.5  # brute-force gold: shingle_jaccard ≥ 0.5 components

# ---------------------------------------------------------------------------
# Ray pipeline steps (each callable with sf_dir for the driver's queries())
# ---------------------------------------------------------------------------


def pages_normalized(sf_dir: str) -> ray.data.Dataset:
    """pages + norm_text column."""
    return normalize_stage(load_pages(sf_dir))


def blocked(sf_dir: str) -> ray.data.Dataset:
    return key_blocking_stage(pages_normalized(sf_dir))


def blocked_compact(sf_dir: str) -> ray.data.Dataset:
    return blocked(sf_dir).select_columns(["doc_id", "block_key"])


def candidate_pairs(sf_dir: str, max_pairs_per_block: int = 10_000_000) -> ray.data.Dataset:
    ds = blocked(sf_dir).select_columns(["doc_id", "block_key", "norm_text", "lang"])
    return pairs_from_blocks(
        ds, block_col="block_key", id_col="doc_id",
        carry_cols=["norm_text", "lang"],
        max_pairs_per_block=max_pairs_per_block,
    )


def candidate_pairs_compact(sf_dir: str) -> ray.data.Dataset:
    def _proj(b: pa.Table) -> pa.Table:
        return b.select(["block_key", "id1", "id2"])
    return candidate_pairs(sf_dir).map_batches(_proj, batch_format="pyarrow")


def pair_features(sf_dir: str) -> ray.data.Dataset:
    feats = featurize_stage(candidate_pairs(sf_dir))

    def _proj(b: pa.Table) -> pa.Table:
        return b.select(
            ["block_key", "id1", "id2", "token_jaccard", "shingle_jaccard",
             "lev_sim", "len_ratio", "lang_match"]
        )

    return feats.map_batches(_proj, batch_format="pyarrow")


def scored_pairs(sf_dir: str) -> ray.data.Dataset:
    """Features + deterministic linear score + constraint column."""
    feats = featurize_stage(candidate_pairs(sf_dir))
    scored = linear_scoring_stage(feats)
    return constraint_stage(scored)


def scored_pairs_compact(sf_dir: str) -> ray.data.Dataset:
    def _proj(b: pa.Table) -> pa.Table:
        return b.select(["block_key", "id1", "id2", "score"])
    return scored_pairs(sf_dir).map_batches(_proj, batch_format="pyarrow")


def all_doc_ids(sf_dir: str) -> ray.data.Dataset:
    from ..sources.tables import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    return ds.map_batches(
        lambda df: pd.DataFrame({"node": df["doc_id"]}), batch_format="pandas"
    )


def clusters(sf_dir: str) -> ray.data.Dataset:
    """Transitive closure over score ≥ 0.5 edges; every doc gets a cluster
    (singletons keep their own id).  Output: (doc_id, cluster_id)."""
    assign = transitive_clustering(
        scored_pairs(sf_dir), all_ids=all_doc_ids(sf_dir),
        threshold=SCORE_THRESHOLD,
    )
    return assign.map_batches(
        lambda df: pd.DataFrame({"doc_id": df["node"], "cluster_id": df["label"]}),
        batch_format="pandas",
    )


def uncertain_topk(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """Globally most-uncertain pairs: sort by |score−0.5| with deterministic
    tie-break — the feedback loop's selection step (north rule; reference
    constraint synthesis /root/reference/ecc/ecc.py:615-866)."""
    sp = scored_pairs_compact(sf_dir)

    def _unc(b: pa.Table) -> pa.Table:
        s = b.column("score").to_numpy(zero_copy_only=False).astype(np.float64)
        return b.append_column("uncertainty", pa.array(np.abs(s - 0.5), pa.float64()))

    ds = sp.map_batches(_unc, batch_format="pyarrow")
    out = ds.sort(["uncertainty", "id1", "id2"]).limit(k)
    return out.select_columns(["id1", "id2", "score", "uncertainty"])


def _gold_assignments(sf_dir: str) -> ray.data.Dataset:
    """Brute-force 'gold': connected components of the exact shingle-Jaccard
    ≥ 0.5 graph over ALL pairs (no blocking) — the oracle the blocked
    pipeline is judged against (recall losses show up in er_quality)."""
    ds = pages_normalized(sf_dir).select_columns(["doc_id", "norm_text", "lang"])

    def _const(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["all_key"] = "all"
        return df

    one = ds.map_batches(_const, batch_format="pandas")
    pairs = pairs_from_blocks(
        one, block_col="all_key", id_col="doc_id",
        carry_cols=["norm_text", "lang"], max_pairs_per_block=10_000_000,
    )
    feats = featurize_stage(pairs)

    def _edges(b: pa.Table) -> pa.Table:
        sj = b.column("shingle_jaccard").to_numpy(zero_copy_only=False).astype(np.float64)
        keep = np.nonzero(np.nan_to_num(sj, nan=0.0) >= GOLD_JACCARD)[0]
        sub = b.take(pa.array(keep, pa.int64()))
        return pa.table({"src": sub.column("id1"), "dst": sub.column("id2")})

    edges = feats.map_batches(_edges, batch_format="pyarrow")
    from ..state.unionfind import connected_components

    return connected_components(edges, nodes=all_doc_ids(sf_dir))


def er_quality(sf_dir: str) -> pd.DataFrame:
    """One-row quality report: pairwise P/R/F1 + B³ of the blocked pipeline's
    clusters vs the brute-force gold components."""
    pred = clusters(sf_dir).to_pandas().rename(
        columns={"doc_id": "id", "cluster_id": "pred"})
    gold = _gold_assignments(sf_dir).to_pandas().rename(
        columns={"node": "id", "label": "gold"})
    pp, pr, pf = pairwise_prf(pred, gold)
    bp, br, bf = b3_prf(pred, gold)
    return pd.DataFrame({
        "pair_precision": [pp], "pair_recall": [pr], "pair_f1": [pf],
        "b3_precision": [round(bp, 6)], "b3_recall": [round(br, 6)],
        "b3_f1": [round(bf, 6)],
    })


# ---------------------------------------------------------------------------
# DuckDB oracle SQL twins
# ---------------------------------------------------------------------------

_NORM = NORMALIZE_SQL.format(col="text")

_NORM_CTE = f"""
norm AS (
  SELECT doc_id, url, warc_ts, lang, {_NORM} AS norm_text FROM pages
)
""".strip()

_BLOCK_EXPR = BLOCK_KEY_SQL.format(lang="lang", norm="norm_text")

_BLOCKS_CTE = f"""
blocks AS (
  SELECT doc_id, lang, norm_text, {_BLOCK_EXPR} AS block_key FROM norm
)
""".strip()

_CAND_CTE = """
cand AS (
  SELECT a.block_key, a.doc_id AS id1, b.doc_id AS id2,
         a.norm_text AS n1, b.norm_text AS n2, a.lang AS l1, b.lang AS l2
  FROM blocks a JOIN blocks b
    ON a.block_key = b.block_key AND a.doc_id < b.doc_id
)
""".strip()

_SH1 = SHINGLES_SQL.format(n="n1")
_SH2 = SHINGLES_SQL.format(n="n2")

_FEAT_CTE = f"""
shingled AS (
  SELECT *, {_SH1} AS s1, {_SH2} AS s2 FROM cand
),
feat AS (
  SELECT block_key, id1, id2,
    {TOKEN_JACCARD_SQL.format(n1="n1", n2="n2")} AS token_jaccard,
    {SHINGLE_JACCARD_SQL.format(s1="s1", s2="s2")} AS shingle_jaccard,
    {LEV_SIM_SQL.format(n1="n1", n2="n2")} AS lev_sim,
    {LEN_RATIO_SQL.format(n1="n1", n2="n2")} AS len_ratio,
    {LANG_MATCH_SQL.format(l1="l1", l2="l2")} AS lang_match
  FROM shingled
)
""".strip()

_SCORE_CTE = f"""
scored AS (
  SELECT block_key, id1, id2,
    {SCORE_SQL.format(sj="shingle_jaccard", tj="token_jaccard", lv="lev_sim", lr="len_ratio")} AS score
  FROM feat
)
""".strip()

_CLUSTER_SQL_TAIL = """
edges AS (
  SELECT id1 AS src, id2 AS dst FROM scored WHERE score >= 0.5
),
sym AS (
  SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges
),
reach AS (
  SELECT doc_id AS node, doc_id AS label FROM pages
  UNION
  SELECT s.dst AS node, r.label AS label
  FROM reach r JOIN sym s ON s.src = r.node
)
SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node
""".strip()


def oracle_queries() -> dict[str, str]:
    """SQL twins for each oracle-checked ER query (driver contract)."""
    base = f"WITH {PAGES_CTE},\n{_NORM_CTE},\n{_BLOCKS_CTE},\n{_CAND_CTE},\n{_FEAT_CTE}"
    return {
        "er_pages": f"WITH {PAGES_CTE} SELECT url, warc_ts, text, lang, doc_id FROM pages",
        "er_normalize": f"WITH {PAGES_CTE},\n{_NORM_CTE} "
                        "SELECT doc_id, url, norm_text FROM norm",
        "er_blocking": f"WITH {PAGES_CTE},\n{_NORM_CTE},\n{_BLOCKS_CTE} "
                       "SELECT doc_id, block_key FROM blocks",
        "er_candidate_pairs": f"WITH {PAGES_CTE},\n{_NORM_CTE},\n{_BLOCKS_CTE},\n{_CAND_CTE} "
                              "SELECT block_key, id1, id2 FROM cand",
        "er_features": f"{base} SELECT block_key, id1, id2, token_jaccard, "
                       "shingle_jaccard, lev_sim, len_ratio, lang_match FROM feat",
        "er_scores": f"{base},\n{_SCORE_CTE} SELECT block_key, id1, id2, score FROM scored",
        "er_clusters": f"WITH RECURSIVE {PAGES_CTE},\n{_NORM_CTE},\n{_BLOCKS_CTE},\n"
                       f"{_CAND_CTE},\n{_FEAT_CTE},\n{_SCORE_CTE},\n{_CLUSTER_SQL_TAIL}",
        "er_uncertain_topk": f"{base},\n{_SCORE_CTE} "
                             "SELECT id1, id2, score, abs(score - 0.5) AS uncertainty "
                             "FROM scored ORDER BY abs(score - 0.5), id1, id2 LIMIT 20",
    }


# ---------------------------------------------------------------------------
# Generic ER over an arbitrary pages Dataset (flagship + feedback rounds)
# ---------------------------------------------------------------------------


def add_doc_ids(pages_ds: ray.data.Dataset, url_col: str = "url") -> ray.data.Dataset:
    """Stable int64 doc id from the url (blake2b-64 >> 1) — deterministic,
    partition-invariant, collision probability ~n²/2⁶⁴."""
    from ..functions.hashing import blake2b64

    def _ids(b: pa.Table) -> pa.Table:
        urls = b.column(url_col).to_pylist()
        ids = np.array([blake2b64(u) >> 1 for u in urls], dtype=np.int64)
        return b.append_column("doc_id", pa.array(ids, pa.int64()))

    return pages_ds.map_batches(_ids, batch_format="pyarrow")


def resolve_pages(
    pages_ds: ray.data.Dataset,
    model=None,
    use_key_blocks: bool = True,
    use_lsh: bool = True,
    threshold: float = SCORE_THRESHOLD,
    seeds: dict | None = None,
    max_pairs_per_block: int = 100_000,
    num_perm: int = 64,
    num_bands: int = 16,
    scorer_concurrency=(1, 4),
    dedup: bool = False,
) -> dict:
    """Full ER stage graph over a pages Dataset with ``url`` (and optionally
    ``doc_id``) columns.  Returns dict of Datasets:
    ``scored`` (pair rows + score + constraint), ``assignments``
    (doc_id, url? via id_map, cluster_id), ``id_map`` (doc_id, url),
    ``counters`` (per-block lineage: pairs_generated, pairs_scored,
    edges_kept — north-rule counters).
    """
    from ..stages.blocking import minhash_stage, band_explode_stage
    from ..stages.pairs import dedup_pairs
    from ..stages.scoring import trained_scoring_stage

    cols = set(pages_ds.schema().names)
    if "doc_id" not in cols:
        pages_ds = add_doc_ids(pages_ds)
    norm = normalize_stage(pages_ds)
    norm = norm.select_columns(["doc_id", "url", "norm_text", "lang"]).materialize()
    # right-size block count: the featurize stage downstream is CPU-bound, so
    # parallelism must track the cluster (sources read via read_table already
    # produce ~ncpu/2..ncpu blocks; from_pandas fixtures arrive as 1 block)
    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 8))
    if norm.num_blocks() < max(2, ncpu // 2):
        norm = norm.repartition(max(2, ncpu // 2)).materialize()

    id_map = norm.select_columns(["doc_id", "url"])

    # Pair generation carries ONLY ids + block key — featurizer inputs are
    # attached AFTER the blocking shuffles (attach_attrs: broadcast gather at
    # this scale, bucketed cogroup join at dimension scale).  Carrying the
    # full text through a 16-band explode would amplify shuffle volume 16×
    # (SURVEY.md §7.4 "very wide pair rows").
    pair_sources = []
    if use_key_blocks:
        keyed = key_blocking_stage(norm).select_columns(["doc_id", "block_key"])
        pair_sources.append(pairs_from_blocks(
            keyed, block_col="block_key", id_col="doc_id", carry_cols=[],
            max_pairs_per_block=max_pairs_per_block))
    if use_lsh:
        mh = minhash_stage(norm.select_columns(["doc_id", "norm_text"]),
                           num_perm=num_perm, seed=42)
        bands = band_explode_stage(mh, num_bands=num_bands, keep_cols=["doc_id"])
        lsh_pairs = pairs_from_blocks(
            bands, block_col="band_key", id_col="doc_id", carry_cols=[],
            max_pairs_per_block=max_pairs_per_block)
        lsh_pairs = lsh_pairs.map_batches(
            lambda df: df.assign(block_key="band_" + df["band_key"].astype(str))
                        .drop(columns=["band_key"]),
            batch_format="pandas")
        pair_sources.append(lsh_pairs)

    pairs = pair_sources[0]
    for extra in pair_sources[1:]:
        pairs = pairs.union(extra)
    if dedup and len(pair_sources) > 1:
        # optional: scoring is idempotent and connected components are
        # insensitive to duplicate edges, so the default path skips the
        # distinct shuffle entirely and re-scores dup candidates instead —
        # cheaper than the extra wide op (counters then count pair-instances)
        pairs = dedup_pairs(pairs)

    from ..stages.shuffleops import attach_attrs

    pairs = attach_attrs(
        pairs, norm.select_columns(["doc_id", "norm_text", "lang"]),
        id_col="doc_id", attr_cols=["norm_text", "lang"])
    feats = featurize_stage(pairs)
    if model is None:
        scored = linear_scoring_stage(feats)
    else:
        scored = trained_scoring_stage(feats, model,
                                       concurrency=scorer_concurrency)
    scored = constraint_stage(scored, seeds=seeds)
    # project the (wide) text payload away before materializing — everything
    # downstream (edges, counters, uncertainty selection) needs only ids,
    # block key, features, score, constraint
    keep = ["block_key", "id1", "id2", "pairs_possible",
            "token_jaccard", "shingle_jaccard", "lev_sim", "len_ratio",
            "lang_match", "score", "constraint"]
    scored = scored.select_columns(keep).materialize()

    all_ids = norm.map_batches(
        lambda df: pd.DataFrame({"node": df["doc_id"]}), batch_format="pandas")
    assignments = transitive_clustering(scored, all_ids=all_ids,
                                        threshold=threshold)

    # north-rule lineage counters, per block
    def _counter_rows(b: pa.Table) -> pd.DataFrame:
        df = b.select(["block_key", "score", "constraint"]).to_pandas()
        s = df["score"].to_numpy(dtype=np.float64)
        cons = df["constraint"].to_numpy(dtype=np.float64)
        keep = np.where(np.isnan(cons), s >= threshold, cons == 0.0)
        g = df.assign(kept=keep).groupby("block_key", as_index=False).agg(
            pairs_generated=("score", "size"),
            pairs_scored=("score", "size"),
            edges_kept=("kept", "sum"),
        )
        g["edges_kept"] = g["edges_kept"].astype(np.int64)
        return g

    from ..stages.shuffleops import bucketed_aggregate

    counter_partials = scored.map_batches(_counter_rows, batch_format="pyarrow")
    counters = bucketed_aggregate(
        counter_partials, "block_key",
        pairs_generated=("pairs_generated", "sum"),
        pairs_scored=("pairs_scored", "sum"),
        edges_kept=("edges_kept", "sum"),
    )

    return {
        "scored": scored,
        "assignments": assignments,
        "id_map": id_map,
        "counters": counters,
    }
