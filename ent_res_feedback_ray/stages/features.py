"""Pairwise featurization: stateless ``map_batches`` over pair rows.

Reference analog: ``_single_pair_featurize`` — the 39-dim hand-crafted vector
(/root/reference/s2and/featurizer.py:301-517).  The web graft's feature set
(north_star): token/shingle Jaccard, length-normalized Levenshtein and
Jaro-Winkler over url+title/text tokens, plus length-ratio and language
agreement.  NaN is first-class "missing" (reference convention,
/root/reference/s2and/featurizer.py:698-703) — emitted as Arrow nulls.

Every feature has an exact DuckDB-SQL twin (the ``*_SQL`` constants) built
from exactly-rounded IEEE ops (+,*,/ and integer set cardinalities — no
transcendentals), so Ray output and oracle output are bit-identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.strsim import jaccard, levenshtein
from ..functions.textnorm import word_ngrams

LEV_PREFIX = 40  # bound the DP cost per pair; SQL uses left(norm, 40) too

FEATURE_COLS = ["token_jaccard", "shingle_jaccard", "lev_sim", "len_ratio", "lang_match"]

# DuckDB expression templates ({n1}/{n2}=normalized text cols, {l1}/{l2}=lang)
TOKEN_JACCARD_SQL = (
    "CASE WHEN {n1} = '' OR {n2} = '' THEN NULL ELSE "
    "CAST(len(list_intersect(list_distinct(string_split({n1}, ' ')), "
    "list_distinct(string_split({n2}, ' ')))) AS DOUBLE) / "
    "len(list_distinct(list_concat(string_split({n1}, ' '), string_split({n2}, ' ')))) END"
)
SHINGLES_SQL = (
    "CASE WHEN {n} = '' THEN [] "
    "WHEN len(string_split({n}, ' ')) < 3 THEN [{n}] "
    "ELSE list_distinct(list_transform(range(1, len(string_split({n}, ' ')) - 1), "
    "i -> string_split({n}, ' ')[i] || ' ' || string_split({n}, ' ')[i+1] || ' ' || "
    "string_split({n}, ' ')[i+2])) END"
)
SHINGLE_JACCARD_SQL = (
    "CASE WHEN len({s1}) = 0 OR len({s2}) = 0 THEN NULL ELSE "
    "CAST(len(list_intersect({s1}, {s2})) AS DOUBLE) / "
    "len(list_distinct(list_concat({s1}, {s2}))) END"
)
LEV_SIM_SQL = (
    "CASE WHEN {n1} = '' OR {n2} = '' THEN NULL ELSE "
    "1.0 - CAST(levenshtein(left({n1}, 40), left({n2}, 40)) AS DOUBLE) / "
    "greatest(len(left({n1}, 40)), len(left({n2}, 40))) END"
)
LEN_RATIO_SQL = (
    "CASE WHEN len({n1}) = 0 OR len({n2}) = 0 THEN NULL ELSE "
    "CAST(least(len({n1}), len({n2})) AS DOUBLE) / greatest(len({n1}), len({n2})) END"
)
LANG_MATCH_SQL = "CAST({l1} = {l2} AS DOUBLE)"

# deterministic linear score — exactly-rounded ops only, left-associated;
# the numpy twin in scoring.py mirrors the association order.
SCORE_SQL = (
    "least(1.0, greatest(0.0, "
    "((0.55 * coalesce({sj}, 0.0) + 0.25 * coalesce({tj}, 0.0)) "
    "+ 0.15 * coalesce({lv}, 0.0)) + 0.05 * coalesce({lr}, 0.0)))"
)


def _token_set(norm: str) -> frozenset:
    return frozenset(norm.split()) if norm else frozenset()


def _shingle_set(norm: str, n: int = 3) -> frozenset:
    if not norm:
        return frozenset()
    return frozenset(word_ngrams(norm.split(), n))


def featurize_pairs_batch(batch: pa.Table, norm1: str = "norm_text1",
                          norm2: str = "norm_text2", lang1: str = "lang1",
                          lang2: str = "lang2") -> pa.Table:
    """Compute FEATURE_COLS for a batch of pair rows.

    Per-doc token/shingle sets are memoized within the batch (a doc appears
    in many pairs of its block), so set construction is amortized."""
    n = batch.num_rows
    a = batch.column(norm1).to_pylist()
    b = batch.column(norm2).to_pylist()
    la = batch.column(lang1).to_pylist()
    lb = batch.column(lang2).to_pylist()

    tok_cache: dict[str, frozenset] = {}
    shg_cache: dict[str, frozenset] = {}

    def toks(s: str) -> frozenset:
        r = tok_cache.get(s)
        if r is None:
            r = _token_set(s)
            tok_cache[s] = r
        return r

    def shgs(s: str) -> frozenset:
        r = shg_cache.get(s)
        if r is None:
            r = _shingle_set(s)
            shg_cache[s] = r
        return r

    tj = np.empty(n); sj = np.empty(n); lv = np.empty(n); lr = np.empty(n)
    lm = np.empty(n)
    for i in range(n):
        x = a[i] or ""
        y = b[i] or ""
        tj[i] = jaccard(toks(x), toks(y))
        sj[i] = jaccard(shgs(x), shgs(y))
        if x and y:
            px, py = x[:LEV_PREFIX], y[:LEV_PREFIX]
            m = max(len(px), len(py))
            lv[i] = 1.0 - levenshtein(px, py) / m
            lr[i] = min(len(x), len(y)) / max(len(x), len(y))
        else:
            lv[i] = np.nan
            lr[i] = np.nan
        lm[i] = 1.0 if la[i] == lb[i] else 0.0

    def col(arr: np.ndarray) -> pa.Array:
        return pa.array(arr, pa.float64(), from_pandas=True)  # NaN -> null

    return (
        batch.append_column("token_jaccard", col(tj))
        .append_column("shingle_jaccard", col(sj))
        .append_column("lev_sim", col(lv))
        .append_column("len_ratio", col(lr))
        .append_column("lang_match", col(lm))
    )


def featurize_stage(ds: ray.data.Dataset, **kwargs) -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: featurize_pairs_batch(b, **kwargs), batch_format="pyarrow"
    )
