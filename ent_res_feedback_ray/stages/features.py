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

LEV_PREFIX = 24   # bounds the bit-parallel DP per pair (cost ~ LEV_PREFIX^2;
                  # 40 -> 24 cut the Myers kernel ~2.8x at equal oracle
                  # parity); every SQL twin derives its left(norm, N) from
                  # this constant
CHAR3_PREFIX = 100  # char-3-gram bags over left(norm, 100)
FTOK_LEN = 16     # jaro-winkler over the (short) leading token, capped
CJ_CLAMP = 5000   # counter_jaccard denominator clamp (reference featurizer)
TS_CLAMP_DAYS = 365.0  # |warc_ts diff| clamp (reference year_diff clamp=50)

# Feature registry — the reference's ``FeaturizationInfo`` feature-group
# table (/root/reference/s2and/featurizer.py:42-295): every feature belongs
# to a named group, callers select subsets by group, and the column order of
# the feature vector is fixed by this registry (both the string spec and the
# broadcast-signature fast path emit it).
FEATURE_GROUPS: dict[str, str] = {
    "token_jaccard": "tokens",
    "shingle_jaccard": "shingles",
    "lev_sim": "chars",
    "len_ratio": "lengths",
    "lang_match": "language",
    "jw_first": "chars",
    "char3_jaccard": "chars",
    "token_cjaccard": "tokens",
    "prefix_sim": "chars",
    "ts_diff_days": "time",
    # corpus-frequency pair features (reference ``name_counts``,
    # /root/reference/s2and/text.py:679-721: min/max corpus counts of shared
    # name parts as features): min/max DOCUMENT FREQUENCY over the tokens the
    # two sides share.  Computed only when a corpus DF table is broadcast
    # (token_df); NaN otherwise.  A shared token always has DF ≥ 2, so DF
    # tables may drop singletons losslessly.
    "df_min_shared": "corpus",
    "df_max_shared": "corpus",
}

FEATURE_COLS = list(FEATURE_GROUPS)


def feature_columns(groups: "list[str] | None" = None) -> list[str]:
    """Feature names, optionally restricted to named groups (registry
    order preserved — it defines the model's input vector layout)."""
    if groups is None:
        return list(FEATURE_COLS)
    want = set(groups)
    unknown = want - set(FEATURE_GROUPS.values())
    if unknown:
        raise KeyError(f"unknown feature groups: {sorted(unknown)}")
    return [c for c, g in FEATURE_GROUPS.items() if g in want]

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
    f"1.0 - CAST(levenshtein(left({{n1}}, {LEV_PREFIX}), left({{n2}}, {LEV_PREFIX})) AS DOUBLE) / "
    f"greatest(len(left({{n1}}, {LEV_PREFIX})), len(left({{n2}}, {LEV_PREFIX}))) END"
)
LEN_RATIO_SQL = (
    "CASE WHEN len({n1}) = 0 OR len({n2}) = 0 THEN NULL ELSE "
    "CAST(least(len({n1}), len({n2})) AS DOUBLE) / greatest(len({n1}), len({n2})) END"
)
LANG_MATCH_SQL = "CAST({l1} = {l2} AS DOUBLE)"

# jaro-winkler on the leading token (reference computes JW on short name
# strings, s2and/featurizer.py:361-377); our batch kernel is bit-identical
# to DuckDB's jaro_winkler_similarity (parity unit-tested), so no rounding.
JW_FIRST_SQL = (
    "CASE WHEN {n1} = '' OR {n2} = '' THEN NULL ELSE "
    "jaro_winkler_similarity(left(string_split({n1}, ' ')[1], 16), "
    "left(string_split({n2}, ' ')[1], 16)) END"
)
# char-3-gram set over left(norm, 100) (reference get_text_ngrams analog)
CHAR3_SQL = (
    "CASE WHEN {p} = '' THEN []::VARCHAR[] "
    "WHEN len({p}) < 3 THEN [{p}] "
    "ELSE list_distinct(list_transform(range(1, len({p}) - 1), "
    "i -> substr({p}, i, 3))) END"
)
CHAR3_JACCARD_SQL = (
    "CASE WHEN len({c1}) = 0 OR len({c2}) = 0 THEN NULL ELSE "
    "CAST(len(list_intersect({c1}, {c2})) AS DOUBLE) / "
    "len(list_distinct(list_concat({c1}, {c2}))) END"
)
# multiset (bag) intersection of token lists — reference counter_jaccard
# with the 5000 denominator clamp (s2and/text.py:576-601, featurizer.py:421)
CJ_INTER_SQL = (
    "CASE WHEN {n1} = '' OR {n2} = '' THEN 0 ELSE "
    "list_sum(list_transform(list_distinct({t1}), "
    "x -> least(len(list_filter({t1}, y -> y = x)), "
    "len(list_filter({t2}, y -> y = x))))) END"
)
TOKEN_CJACCARD_SQL = (
    "CASE WHEN {n1} = '' OR {n2} = '' THEN NULL ELSE "
    "CAST({inter} AS DOUBLE) / least(len({t1}) + len({t2}) - {inter}, 5000) END"
)
# longest-common-prefix similarity over left(norm, LEV_PREFIX) (reference
# prefix_dist, s2and/text.py:246-254, emitted as a similarity)
PREFIX_SIM_SQL = (
    "CASE WHEN {n1} = '' OR {n2} = '' THEN NULL ELSE "
    f"CAST(coalesce(nullif(list_position(list_transform(range(1, {LEV_PREFIX + 1}), "
    "i -> substr({p1}, i, 1) = substr({p2}, i, 1)), false), 0) - 1, "
    "least(len({p1}), len({p2}))) AS DOUBLE) / least(len({p1}), len({p2})) END"
)
# |warc_ts diff| in days, clamped (reference year_diff analog,
# s2and/featurizer.py:429-437).  Exact-int µs diff → ONE double division on
# both sides, so values are bit-identical.
TS_DIFF_SQL = (
    "least(CAST(abs(date_diff('microsecond', {t1}, {t2})) AS DOUBLE) "
    "/ 86400000000.0, 365.0)"
)

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
                          lang2: str = "lang2", ts1: str = "warc_ts1",
                          ts2: str = "warc_ts2",
                          features: list[str] | None = None,
                          token_df: "dict[str, int] | None" = None) -> pa.Table:
    """Compute FEATURE_COLS for a batch of pair rows — the readable SPEC path
    (stages/fastfeatures.py is the bit-identical broadcast-signature twin).

    - strings are factorized once per batch; token/shingle/char-gram sets are
      built per UNIQUE doc (a doc appears in many pairs of its block), then
      looked up by integer code — no per-pair string hashing;
    - Levenshtein and Jaro-Winkler run through batch kernels on the unique
      (doc, doc) pairs, all pairs in lockstep;
    - ``features`` restricts computation (e.g. the brute-force gold only
      needs ``shingle_jaccard`` — don't pay for the other nine)."""
    import collections

    import pandas as pd

    from ..functions.strsim import (
        counter_jaccard,
        encode_utf32,
        jaro_winkler_batch_encoded,
        lcp_batch_encoded,
        levenshtein_batch_myers_encoded,
    )
    from ..functions.textnorm import char_ngrams

    want = list(features) if features is not None else list(FEATURE_COLS)
    n = batch.num_rows
    a = pd.Series(batch.column(norm1).to_pylist(), dtype=object).fillna("")
    b = pd.Series(batch.column(norm2).to_pylist(), dtype=object).fillna("")

    codes_a, uniques = pd.factorize(pd.concat([a, b], ignore_index=True))
    code1, code2 = codes_a[:n], codes_a[n:]
    uniq_len = np.fromiter((len(u) for u in uniques), dtype=np.int64,
                           count=len(uniques))
    len1 = uniq_len[code1]
    len2 = uniq_len[code2]
    nonempty = (len1 > 0) & (len2 > 0)
    # unique (doc, doc) pairs — every per-pair kernel runs on these only
    pair_codes = code1.astype(np.int64) * len(uniques) + code2
    uniq_pairs, inv = np.unique(pair_codes[nonempty], return_inverse=True)
    up1 = (uniq_pairs // len(uniques)).astype(np.int64)
    up2 = (uniq_pairs % len(uniques)).astype(np.int64)

    def scatter(vals_u: np.ndarray) -> np.ndarray:
        out = np.full(n, np.nan)
        out[nonempty] = vals_u[inv]
        return out

    cols: dict[str, np.ndarray] = {}

    if "token_jaccard" in want:
        uniq_toks = [_token_set(u) for u in uniques]
        tj_u = np.fromiter(
            (jaccard(uniq_toks[i], uniq_toks[j]) for i, j in zip(up1, up2)),
            dtype=np.float64, count=len(up1))
        cols["token_jaccard"] = scatter(tj_u)
    if "shingle_jaccard" in want:
        uniq_shgs = [_shingle_set(u) for u in uniques]
        sj_u = np.fromiter(
            (jaccard(uniq_shgs[i], uniq_shgs[j]) for i, j in zip(up1, up2)),
            dtype=np.float64, count=len(up1))
        cols["shingle_jaccard"] = scatter(sj_u)
    if "lev_sim" in want or "prefix_sim" in want:
        uniq_prefix = [u[:LEV_PREFIX] for u in uniques]
        U, ulen = encode_utf32(uniq_prefix, LEV_PREFIX)
        if "lev_sim" in want:
            lev_u = levenshtein_batch_myers_encoded(
                U[up1], ulen[up1], U[up2], ulen[up2])
            plen_u = np.maximum(np.minimum(uniq_len[up1], LEV_PREFIX),
                                np.minimum(uniq_len[up2], LEV_PREFIX))
            cols["lev_sim"] = scatter(1.0 - lev_u / plen_u)
        if "prefix_sim" in want:
            lcp_u = lcp_batch_encoded(U[up1], ulen[up1], U[up2], ulen[up2])
            cols["prefix_sim"] = scatter(
                lcp_u / np.minimum(ulen[up1], ulen[up2]))
    if "len_ratio" in want:
        lr = np.full(n, np.nan)
        lr[nonempty] = (np.minimum(len1, len2)[nonempty]
                        / np.maximum(len1, len2)[nonempty])
        cols["len_ratio"] = lr
    if "lang_match" in want:
        la = np.asarray(batch.column(lang1).to_pylist(), dtype=object)
        lb = np.asarray(batch.column(lang2).to_pylist(), dtype=object)
        cols["lang_match"] = (la == lb).astype(np.float64)
    if "jw_first" in want:
        ftoks = [u.split(" ", 1)[0][:FTOK_LEN] for u in uniques]
        F, flen = encode_utf32(ftoks, FTOK_LEN)
        cols["jw_first"] = scatter(jaro_winkler_batch_encoded(
            F[up1], flen[up1], F[up2], flen[up2]))
    if "char3_jaccard" in want:
        uniq_ch3 = [frozenset(char_ngrams(u[:CHAR3_PREFIX], 3)) for u in uniques]
        c3_u = np.fromiter(
            (jaccard(uniq_ch3[i], uniq_ch3[j]) for i, j in zip(up1, up2)),
            dtype=np.float64, count=len(up1))
        cols["char3_jaccard"] = scatter(c3_u)
    if "token_cjaccard" in want:
        uniq_bags = [collections.Counter(u.split()) for u in uniques]
        cj_u = np.fromiter(
            (counter_jaccard(uniq_bags[i], uniq_bags[j], CJ_CLAMP)
             for i, j in zip(up1, up2)),
            dtype=np.float64, count=len(up1))
        cols["token_cjaccard"] = scatter(cj_u)
    if "df_min_shared" in want or "df_max_shared" in want:
        if token_df is None:
            nancol = np.full(n, np.nan)
            cols["df_min_shared"] = nancol
            cols["df_max_shared"] = nancol.copy()
        else:
            from itertools import chain as _chain

            from .tokendf import TokenDFView

            uniq_toks_df = [_token_set(u) for u in uniques]
            shared_lists = [sorted(uniq_toks_df[i] & uniq_toks_df[j])
                            for i, j in zip(up1, up2)]
            lens = np.fromiter((len(s) for s in shared_lists), np.int64,
                               count=len(shared_lists))
            flat = list(_chain.from_iterable(shared_lists))
            if isinstance(token_df, TokenDFView):
                vals = token_df.lookup_tokens(flat)
            elif flat:
                vals = np.array([token_df.get(t, 1) for t in flat],
                                np.float64)
            else:
                vals = np.empty(0, np.float64)
            mn = np.full(len(up1), np.nan)
            mx = np.full(len(up1), np.nan)
            has = lens > 0
            starts = np.concatenate(
                [[0], np.cumsum(lens)])[:-1][has].astype(np.int64)
            if len(starts):
                mn[has] = np.minimum.reduceat(vals, starts)
                mx[has] = np.maximum.reduceat(vals, starts)
            cols["df_min_shared"] = scatter(mn)
            cols["df_max_shared"] = scatter(mx)
    if "ts_diff_days" in want:
        if ts1 in batch.column_names and ts2 in batch.column_names:
            t1 = batch.column(ts1).to_numpy(zero_copy_only=False).astype(
                "datetime64[us]").astype(np.int64)
            t2 = batch.column(ts2).to_numpy(zero_copy_only=False).astype(
                "datetime64[us]").astype(np.int64)
            cols["ts_diff_days"] = np.minimum(
                np.abs(t1 - t2).astype(np.float64) / 86400000000.0,
                TS_CLAMP_DAYS)
        else:
            cols["ts_diff_days"] = np.full(n, np.nan)

    def col(arr: np.ndarray) -> pa.Array:
        return pa.array(arr, pa.float64(), from_pandas=True)  # NaN -> null

    for name in want:
        batch = batch.append_column(name, col(cols[name]))
    return batch


def featurize_stage(ds: ray.data.Dataset,
                    features: list[str] | None = None,
                    token_df_ref=None,
                    **kwargs) -> ray.data.Dataset:
    """``token_df_ref``: the corpus-DF side input enabling the corpus-DF
    pair features — a :class:`~.tokendf.ShardedTokenDF` handle (the
    production format: range-sharded plasma arrays, never a driver dict),
    or for tests a plain/ObjectRef'd ``{token: df}`` dict."""

    def _feat(b: pa.Table) -> pa.Table:
        tdf = None
        if token_df_ref is not None:
            import ray as _ray

            from .shuffleops import _broadcast_get
            from .tokendf import resolve_view

            obj = token_df_ref
            if isinstance(obj, _ray.ObjectRef):
                obj = _broadcast_get(obj)
            tdf = obj if isinstance(obj, dict) else resolve_view(obj)
        return featurize_pairs_batch(b, features=features, token_df=tdf,
                                     **kwargs)

    return ds.map_batches(
        _feat,
        batch_format="pyarrow",
        # large batches amortize per-unique-doc set construction; capped so a
        # single oversized block doesn't become one straggler task
        batch_size=32768,
    )
