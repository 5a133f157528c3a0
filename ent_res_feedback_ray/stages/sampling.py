"""Deterministic, partition-invariant sampling and splits.

Reference analogs: ``random_sampling`` / balanced ``sampling``
(/root/reference/s2and/sampling.py:13-115) and the fixed/hash-based
train/val/test carves (/root/reference/s2and/data.py:1042-1138).  The
reference seeds ``np.random`` and samples positionally — NOT reproducible
under re-partitioning.  Here membership is a pure function of the ROW KEY
(md5), so any partitioning, any cluster size, any retry yields the same
sample — and DuckDB can replay it exactly (``md5_number_lower``).

Hash: ``md5_number_lower(key)`` = little-endian uint64 of md5 bytes 8:16,
bit-identical between hashlib and DuckDB (unit-tested).  ~1µs/row Python
cost inside ``map_batches`` — acceptable for sampling stages whose purpose
is to SHRINK data; the downstream pipeline never sees the unsampled rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data

_MOD = 1_000_000


def md5_mod(keys: "list[str]", mod: int = _MOD) -> np.ndarray:
    """uint64 md5_number_lower(key) % mod per key (DuckDB-identical)."""
    out = np.empty(len(keys), dtype=np.int64)
    for i, k in enumerate(keys):
        h = int.from_bytes(hashlib.md5(k.encode("utf-8")).digest()[8:16],
                           "little")
        out[i] = h % mod
    return out


def pair_sample_stage(ds: ray.data.Dataset, rate: float, seed: int = 17,
                      id1: str = "id1", id2: str = "id2") -> ray.data.Dataset:
    """Bernoulli(rate) pair sample keyed on (id1, id2, seed)."""
    thresh = int(round(rate * _MOD))

    def _keep(df: pd.DataFrame) -> pd.DataFrame:
        keys = [f"{a}|{b}|{seed}" for a, b in zip(df[id1], df[id2])]
        return df[md5_mod(keys) < thresh]

    return ds.map_batches(_keep, batch_format="pandas")


def pair_sample_sql_filter(rate: float, seed: int = 17,
                           id1: str = "id1", id2: str = "id2") -> str:
    thresh = int(round(rate * _MOD))
    return (f"md5_number_lower(CAST({id1} AS VARCHAR) || '|' || "
            f"CAST({id2} AS VARCHAR) || '|{seed}') % {_MOD} < {thresh}")


def hash_split_stage(ds: ray.data.Dataset, id_col: str,
                     fractions: dict[str, float],
                     seed: int = 17,
                     out_col: str = "split") -> ray.data.Dataset:
    """Deterministic hash split: each row lands in exactly one named split,
    independent of partitioning (reference fixed-split analog).  Fractions
    must sum to ≤ 1; any remainder goes to the LAST split."""
    names = list(fractions)
    bounds = np.cumsum([fractions[k] for k in names]) * _MOD
    bounds = bounds.round().astype(np.int64)
    bounds[-1] = _MOD  # remainder → last split

    def _assign(df: pd.DataFrame) -> pd.DataFrame:
        keys = [f"{v}|{seed}" for v in df[id_col]]
        h = md5_mod(keys)
        idx = np.searchsorted(bounds, h, side="right")
        df = df.copy()
        df[out_col] = np.array(names, dtype=object)[np.minimum(idx, len(names) - 1)]
        return df

    return ds.map_batches(_assign, batch_format="pandas")


def hash_split_sql_case(id_col: str, fractions: dict[str, float],
                        seed: int = 17) -> str:
    names = list(fractions)
    bounds = np.cumsum([fractions[k] for k in names]) * _MOD
    bounds = bounds.round().astype(np.int64)
    h = (f"md5_number_lower(CAST({id_col} AS VARCHAR) || '|{seed}') % {_MOD}")
    clauses = []
    for name, b in list(zip(names, bounds))[:-1]:
        clauses.append(f"WHEN {h} < {b} THEN '{name}'")
    return "CASE " + " ".join(clauses) + f" ELSE '{names[-1]}' END"


def balanced_sample(df: pd.DataFrame, label_col: str, k_per_class: int,
                    key_cols: list[str], seed: int = 17) -> pd.DataFrame:
    """Balanced per-class subsample (reference balanced ``sampling``,
    /root/reference/s2and/sampling.py:13-94): up to ``k_per_class`` rows per
    label value, chosen by ASCENDING row-key hash — deterministic and
    order/partition-invariant (unlike the reference's positional RNG)."""
    keys = [("|".join(str(v) for v in row) + f"|{seed}")
            for row in df[key_cols].itertuples(index=False)]
    df = df.assign(__h=md5_mod(keys, mod=1 << 62))
    out = (df.sort_values("__h", kind="mergesort")
             .groupby(label_col, sort=False).head(k_per_class))
    return out.drop(columns="__h").reset_index(drop=True)


# ---------------------------------------------------------------------------
# source-balanced corpus sampling (data mixing)
# ---------------------------------------------------------------------------

# Loud guard: the per-source rate table is broadcast as a plain dict — fine
# for real corpora (sources are crawls/registries, thousands at most), but
# a mis-keyed column (e.g. url) would make it O(corpus).
SOURCE_CARD_CAP = 100_000


def source_balanced_docs(sf_dir: str) -> "ray.data.Dataset":
    """Driver-surface row: every source of the documents table downsampled
    toward the smallest source's size (integer-exact md5 membership —
    bit-exact DuckDB twin ``source_balanced_sample_sql``)."""
    from ..sources.tables import read_table

    return source_balanced_sample(read_table(sf_dir, "documents"))


def source_balanced_sample(ds: ray.data.Dataset, source_col: str = "source",
                           id_col: str = "doc_id", seed: int = 17
                           ) -> ray.data.Dataset:
    """Downsample every source to the size of the SMALLEST source — the
    uniform-mixing primitive of LM data curation (each source contributes
    ~equal documents; generalizes to arbitrary mixing weights by scaling
    the per-source rate).

    Membership is a pure function of the row key (md5, like every sampler
    in this module): partition/cluster-size invariant and exactly
    replayable in SQL.  The keep test is integer-exact —
    ``h % MOD * cnt_source < target * MOD`` — so no float-rounding drift
    between numpy and DuckDB.

    Two passes: (1) per-source counts — a map-side partial then one tiny
    groupby (cardinality = #sources, capped loudly); (2) stateless filter
    with the rate table in the closure."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(source_col, as_index=False).agg(
            n=(id_col, "size"))

    counts = (ds.map_batches(_partial, batch_format="pandas")
              .groupby(source_col).sum("n"))
    cdf = counts.to_pandas()  # bounded: one row per distinct source
    if len(cdf) > SOURCE_CARD_CAP:
        raise ValueError(
            f"{len(cdf)} distinct values in {source_col!r} (cap "
            f"{SOURCE_CARD_CAP}) — is this really a source column?")
    ncol = "sum(n)" if "sum(n)" in cdf.columns else "n"
    cnt = dict(zip(cdf[source_col], cdf[ncol].astype(np.int64)))
    tgt = int(min(cnt.values()))

    def _keep(df: pd.DataFrame) -> pd.DataFrame:
        keys = [f"{v}|mix{seed}" for v in df[id_col]]
        h = md5_mod(keys)
        cs = df[source_col].map(cnt).to_numpy(np.int64)
        return df[h * cs < tgt * _MOD]

    return ds.map_batches(_keep, batch_format="pandas")


def source_balanced_sample_sql(source_col: str = "source",
                               id_col: str = "doc_id", seed: int = 17,
                               table: str = "documents") -> str:
    """Exact DuckDB twin of ``source_balanced_sample`` over ``table``."""
    return f"""
WITH c AS (
  SELECT {source_col}, count(*) AS cnt FROM {table} GROUP BY {source_col}
),
t AS (SELECT min(cnt) AS tgt FROM c)
SELECT d.*
FROM {table} d JOIN c USING ({source_col}) CROSS JOIN t
WHERE md5_number_lower(CAST(d.{id_col} AS VARCHAR) || '|mix{seed}')
      % {_MOD} * c.cnt < t.tgt * {_MOD}
""".strip()


def source_mixture_sample(ds: ray.data.Dataset, weights: "dict[str, float]",
                          source_col: str = "source",
                          id_col: str = "doc_id", seed: int = 17
                          ) -> ray.data.Dataset:
    """Deterministic data-mixing sampler: downsample each source so the
    KEPT corpus follows ``weights`` (relative mixture proportions, e.g.
    {"web": 5, "books": 2, "code": 1}) — the generalization the
    source_balanced docstring promises, as a real operator.

    The binding source is the one whose full count, scaled by 1/weight, is
    smallest: it is kept whole and every other source s keeps
    ``target_s = floor(cnt_bind · w_s / w_bind)`` docs in expectation.
    Membership is the module's integer-exact md5 test (keep iff
    ``h % MOD · cnt_s < target_s · MOD``) — partition-invariant and
    replayable in SQL (:func:`source_mixture_sample_sql`).  Sources absent
    from ``weights`` are dropped entirely.  Two passes like
    source_balanced_sample: tiny per-source count groupby, then a
    stateless filter."""
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be a non-empty dict of positive numbers")

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(source_col, as_index=False).agg(n=(id_col, "size"))

    counts = (ds.map_batches(_partial, batch_format="pandas")
              .groupby(source_col).sum("n"))
    cdf = counts.to_pandas()  # bounded: one row per distinct source
    if len(cdf) > SOURCE_CARD_CAP:
        raise ValueError(
            f"{len(cdf)} distinct values in {source_col!r} (cap "
            f"{SOURCE_CARD_CAP}) — is this really a source column?")
    ncol = "sum(n)" if "sum(n)" in cdf.columns else "n"
    cnt = {s: int(n) for s, n in zip(cdf[source_col], cdf[ncol])
           if s in weights}
    if not cnt:
        return ds.limit(0)
    # tie-break by source name — the SQL twin's ORDER BY cnt/wt, src
    bind = min(cnt, key=lambda s: (cnt[s] / weights[s], s))
    tgt = {s: int(cnt[bind] * weights[s] / weights[bind]) for s in cnt}

    def _keep(df: pd.DataFrame) -> pd.DataFrame:
        keys = [f"{v}|mix{seed}" for v in df[id_col]]
        h = md5_mod(keys)
        cs = df[source_col].map(cnt).to_numpy(dtype=np.float64)
        ts = df[source_col].map(tgt).to_numpy(dtype=np.float64)
        known = ~np.isnan(cs)
        cs_i = np.nan_to_num(cs).astype(np.int64)
        ts_i = np.nan_to_num(ts).astype(np.int64)
        return df[known & (h * cs_i < ts_i * _MOD)]

    return ds.map_batches(_keep, batch_format="pandas")


def source_mixture_sample_sql(weights: "dict[str, float]",
                              source_col: str = "source",
                              id_col: str = "doc_id", seed: int = 17,
                              table: str = "documents") -> str:
    """Exact DuckDB twin of :func:`source_mixture_sample`: same binding-
    source selection (min cnt/weight), same integer-exact keep test."""
    wrows = ", ".join(f"('{s}', CAST({w} AS DOUBLE))"
                      for s, w in weights.items())
    return f"""
WITH w(src, wt) AS (VALUES {wrows}),
c AS (
  SELECT {source_col} AS src, count(*) AS cnt
  FROM {table} GROUP BY {source_col}
),
cw AS (SELECT src, cnt, wt FROM c JOIN w USING (src)),
b AS (
  SELECT cnt AS bcnt, wt AS bwt FROM cw
  ORDER BY cnt / wt, src LIMIT 1
),
t AS (
  SELECT src, cnt,
         CAST(trunc(b.bcnt * cw.wt / b.bwt) AS BIGINT) AS tgt
  FROM cw, b
)
SELECT d.*
FROM {table} d JOIN t ON d.{source_col} = t.src
WHERE md5_number_lower(CAST(d.{id_col} AS VARCHAR) || '|mix{seed}')
      % {_MOD} * t.cnt < t.tgt * {_MOD}
""".strip()


# ---------------------------------------------------------------------------
# leakage-safe train/test split: split by NEAR-DUP COMPONENT, not by doc
# ---------------------------------------------------------------------------

def leakage_safe_split(sf_dir: str,
                       fractions: "dict[str, float] | None" = None,
                       threshold: float = 0.5,
                       method: str = "minhash",
                       seed: int = 17) -> ray.data.Dataset:
    """Train/test split where every near-duplicate CLUSTER lands whole on
    one side — the split a training pipeline needs so eval rows are never
    near-copies of training rows (doc-level hash splits leak: two
    near-dups of the same page straddle the boundary ~2·p·(1−p) of the
    time).  Composition: verified dup pairs → connected components →
    hash-split on the COMPONENT id (md5, partition-invariant) — the
    component labeling is ``neardup_components``' bounded-edge-list path
    and the split itself is the existing ``hash_split_stage``, so nothing
    new touches the exchange.  Output: (doc_id, dup_cluster_id, split).

    ``method='ngram'`` uses the exact n-gram Jaccard pair source so the
    DuckDB twin (:func:`leakage_safe_split_sql`) replays the whole
    operator bit-exactly (pytest parity)."""
    from .dedup import neardup_keep_set

    fractions = fractions or {"train": 0.8, "test": 0.2}
    comp = neardup_keep_set(sf_dir, threshold=threshold, method=method)
    out = hash_split_stage(comp, id_col="dup_cluster_id",
                           fractions=fractions, seed=seed)
    return out.select_columns(["doc_id", "dup_cluster_id", "split"])


def leakage_safe_split_sql(fractions: "dict[str, float] | None" = None,
                           threshold: float = 0.5, seed: int = 17) -> str:
    """DuckDB twin: the keep-set recursive-CTE component labeling wrapped
    with the hash-split CASE on the component id."""
    from .dedup import neardup_keep_set_sql

    fractions = fractions or {"train": 0.8, "test": 0.2}
    case = hash_split_sql_case("dup_cluster_id", fractions, seed=seed)
    return (f"SELECT doc_id, dup_cluster_id, {case} AS split FROM "
            f"({neardup_keep_set_sql(threshold)})")


# ---------------------------------------------------------------------------
# stratified sampling: exact k per stratum, deterministic hash priority
# ---------------------------------------------------------------------------

def stratified_sample(ds: ray.data.Dataset, stratum_col: str,
                      id_col: str, k_per_stratum: int,
                      seed: int = 17) -> ray.data.Dataset:
    """EXACT-k-per-stratum sample (stratified random sampling over stored
    data): every stratum contributes its ``k`` lowest-md5-priority rows —
    deterministic, partition-invariant (priority is a pure row-key
    function), and DuckDB-replayable (``row_number() OVER (PARTITION BY
    stratum ORDER BY md5)`` — :func:`stratified_sample_sql`).  One
    bucketed shuffle via ``group_topk`` with its map-side prune; per-batch
    cost is one md5 pass.  Unlike Bernoulli-per-row sampling the per-
    stratum count is exact, so small strata are never starved — the
    property a data-mixing pipeline needs when a rare source must keep
    a quorum."""
    from .shuffleops import group_topk

    def _prio(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__prio"] = md5_mod(
            [f"{v}|{seed}" for v in df[id_col]], mod=1 << 62)
        return df

    keyed = ds.map_batches(_prio, batch_format="pandas")
    out = group_topk(keyed, key=stratum_col, order_col="__prio",
                     k=k_per_stratum, descending=False,
                     tie_cols=[id_col])
    return out.drop_columns(["__prio"])


def stratified_sample_sql(table: str, stratum_col: str, id_col: str,
                          k_per_stratum: int, seed: int = 17,
                          cols: str = "*") -> str:
    """DuckDB twin: same md5 priority, same per-stratum rank."""
    return f"""
SELECT {cols} FROM (
  SELECT *, row_number() OVER (
    PARTITION BY {stratum_col}
    ORDER BY md5_number_lower(CAST({id_col} AS VARCHAR) || '|{seed}')
             % {1 << 62}, {id_col}) AS __rn
  FROM {table}
) WHERE __rn <= {k_per_stratum}
""".strip()
