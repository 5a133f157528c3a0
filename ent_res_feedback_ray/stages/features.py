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
    """Compute FEATURE_COLS for a batch of pair rows — vectorized hot path.

    - strings are factorized once per batch; token/shingle sets are built per
      UNIQUE doc (a doc appears in many pairs of its block), then looked up
      by integer code — no per-pair string hashing;
    - Levenshtein runs through the bit-parallel Myers kernel on the unique
      prefix pairs (one uint64 word per pair, all pairs in lockstep);
    - length/lang features are pure numpy."""
    import pandas as pd

    from ..functions.strsim import levenshtein_batch_myers

    n = batch.num_rows
    a = pd.Series(batch.column(norm1).to_pylist(), dtype=object).fillna("")
    b = pd.Series(batch.column(norm2).to_pylist(), dtype=object).fillna("")
    la = np.asarray(batch.column(lang1).to_pylist(), dtype=object)
    lb = np.asarray(batch.column(lang2).to_pylist(), dtype=object)

    codes_a, uniques = pd.factorize(pd.concat([a, b], ignore_index=True))
    code1, code2 = codes_a[:n], codes_a[n:]
    uniq_toks = [_token_set(u) for u in uniques]
    uniq_shgs = [_shingle_set(u) for u in uniques]
    uniq_len = np.fromiter((len(u) for u in uniques), dtype=np.int64,
                           count=len(uniques))
    uniq_prefix = [u[:LEV_PREFIX] for u in uniques]

    tj = np.empty(n); sj = np.empty(n)
    for i in range(n):
        tj[i] = jaccard(uniq_toks[code1[i]], uniq_toks[code2[i]])
        sj[i] = jaccard(uniq_shgs[code1[i]], uniq_shgs[code2[i]])

    len1 = uniq_len[code1]
    len2 = uniq_len[code2]
    nonempty = (len1 > 0) & (len2 > 0)
    # Levenshtein on unique (prefix1, prefix2) pairs only
    pair_codes = code1.astype(np.int64) * len(uniques) + code2
    uniq_pairs, inv = np.unique(pair_codes[nonempty], return_inverse=True)
    up1 = uniq_pairs // len(uniques)
    up2 = uniq_pairs % len(uniques)
    from ..functions.strsim import encode_utf32, levenshtein_batch_myers_encoded

    U, ulen = encode_utf32(uniq_prefix, LEV_PREFIX)
    lev_u = levenshtein_batch_myers_encoded(U[up1], ulen[up1], U[up2], ulen[up2])
    plen_u = np.maximum(np.minimum(uniq_len[up1], LEV_PREFIX),
                        np.minimum(uniq_len[up2], LEV_PREFIX))
    lv = np.full(n, np.nan)
    lv[nonempty] = 1.0 - lev_u[inv] / plen_u[inv]
    lr = np.full(n, np.nan)
    lr[nonempty] = np.minimum(len1, len2)[nonempty] / np.maximum(len1, len2)[nonempty]
    lm = (la == lb).astype(np.float64)

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
        lambda b: featurize_pairs_batch(b, **kwargs), batch_format="pyarrow",
        # large batches amortize per-unique-doc set construction; capped so a
        # single oversized block doesn't become one straggler task
        batch_size=32768,
    )
