"""Text-analysis stages over the documents table: token counting, quality
scoring, heuristic language ID, content fingerprinting.

Reference analogs: ``detect_language`` (fastText+cld2 ensemble,
/root/reference/s2and/text.py:266-309 — re-expressed as a deterministic
stopword heuristic since no model ships in this env), n-gram counting
(text.py:397-475), and the normalize chain.  All stateless vectorized
``map_batches``; fingerprints use md5 for DuckDB oracle parity.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.textnorm import normalize_text_array, token_count_array
from ..sources.tables import read_table

# tiny deterministic stopword table per language (public-knowledge lists;
# ascii-only because markers match POST-normalization tokens).  The SQL
# twin is GENERATED from this table (_lang_id_sql), so extending it keeps
# doc_lang_id / curate_corpus / lang_gate oracles in lockstep.
_LANG_MARKERS: dict[str, frozenset] = {
    "en": frozenset({"the", "and", "of", "to", "a", "in", "is"}),
    "fr": frozenset({"le", "la", "les", "de", "et", "un", "une"}),
    "de": frozenset({"der", "die", "das", "und", "ein", "ist"}),
    "es": frozenset({"el", "la", "los", "de", "y", "un", "es"}),
    "it": frozenset({"il", "di", "che", "per", "con", "non"}),
    "nl": frozenset({"het", "een", "van", "niet", "met", "voor"}),
    "pt": frozenset({"o", "que", "do", "da", "em", "um", "para"}),
}


# GPT-2-style pre-tokenizer, RE2-safe (no lookahead — RE2 has none, so the
# original `\s+(?!\S)` clause is dropped; both pyarrow and DuckDB run this
# exact pattern, making the piece count bit-identical across engines)
BPE_PIECE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_counts(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_tokens, n_chars_norm, n_bpe_pieces) — vectorized arrow
    kernels; ``n_bpe_pieces`` counts GPT-2-pre-tokenizer pieces over the
    RAW text (the LM-token-budget estimator)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _stats(t: pa.Table) -> pa.Table:
        norm = normalize_text_array(t.column("text"))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pc.cast(token_count_array(norm), pa.int64()),
            "n_chars_norm": pc.cast(pc.utf8_length(norm), pa.int64()),
            "n_bpe_pieces": pc.cast(pc.count_substring_regex(
                t.column("text"), BPE_PIECE_RE), pa.int64()),
        })

    return ds.map_batches(_stats, batch_format="pyarrow")


TOKEN_COUNTS_SQL = ("""
WITH norm AS (
  SELECT doc_id, text,
    trim(regexp_replace(lower(strip_accents(text)), '[^a-z0-9]+', ' ', 'g')) AS n
  FROM documents
)
SELECT doc_id,
  CASE WHEN n = '' THEN 0 ELSE len(string_split(n, ' ')) END AS n_tokens,
  len(n) AS n_chars_norm,
  len(regexp_extract_all(text, '{BPE}')) AS n_bpe_pieces
FROM norm
""".strip().replace("{BPE}", BPE_PIECE_RE.replace("'", "''")))


def quality_scores(sf_dir: str) -> ray.data.Dataset:
    """Quality heuristics: mean token length, stopword ratio ('the'/'a'),
    uniq-token ratio.  Exactly-rounded ops → bit-exact SQL twin."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(quality_metrics_batch, batch_format="pyarrow")


def quality_metrics_batch(t: pa.Table) -> pa.Table:
    # fully vectorized: token/char counts from Arrow kernels; stopword
    # hits via one RE2 pass; distinct-per-doc via the flat
    # fnv + lexsort segment trick (no per-doc Python loop)
    from itertools import chain

    from ..functions.hashing import fnv1a64

    norm_arr = normalize_text_array(t.column("text"))
    n = t.num_rows
    n_tok = pc.cast(token_count_array(norm_arr), pa.int64()) \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    n_chars = pc.utf8_length(norm_arr).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    # norm text is single-space-separated [a-z0-9]+ tokens, so
    # total token chars = len(norm) − (n_tok − 1) separators
    with np.errstate(invalid="ignore", divide="ignore"):
        mean_tok = np.where(n_tok > 0,
                            (n_chars - (n_tok - 1)) / n_tok, np.nan)
        stops = pc.count_substring_regex(
            norm_arr, r"\b(the|a)\b").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        stop_ratio = np.where(n_tok > 0, stops / n_tok, np.nan)
    # distinct tokens per doc: hash all tokens once, lexsort (doc, hash),
    # count segment-first rows per doc
    norms = norm_arr.to_pylist()
    tok_lists = [s.split() for s in norms]
    lens = np.fromiter((len(x) for x in tok_lists), np.int64, count=n)
    uniq_ratio = np.full(n, np.nan)
    # Gopher-style repetition signals (Rae et al. 2021 §A1.1 analogs):
    # top-bigram mass fraction + duplicate-trigram fraction, both from
    # the same flat token-hash array with doc-boundary-aware rolling
    # combines — no per-doc Python loop.
    top_bigram = np.full(n, np.nan)
    dup_trigram = np.full(n, np.nan)
    m = int(lens.sum())
    if m:
        from ..functions.hashing import _FNV_PRIME

        h = fnv1a64(list(chain.from_iterable(tok_lists)))
        doc = np.repeat(np.arange(n, dtype=np.int64), lens)
        order = np.lexsort((h, doc))
        hs, ds_ = h[order], doc[order]
        first = np.concatenate(
            [[True], (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])])
        nuniq = np.bincount(ds_[first], minlength=n).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            uniq_ratio = np.where(lens > 0, nuniq / lens, np.nan)
        if m >= 2:
            with np.errstate(over="ignore"):
                g2 = (h[:-1] * _FNV_PRIME) ^ h[1:]
            v = doc[:-1] == doc[1:]
            g2, d2 = g2[v], doc[:-1][v]
            if g2.size:
                o2 = np.lexsort((g2, d2))
                g2s, d2s = g2[o2], d2[o2]
                starts = np.flatnonzero(np.concatenate(
                    [[True], (g2s[1:] != g2s[:-1]) | (d2s[1:] != d2s[:-1])]))
                run_len = np.diff(np.append(starts, g2s.size))
                mx = np.zeros(n, dtype=np.int64)
                np.maximum.at(mx, d2s[starts], run_len)
                tot2 = np.bincount(d2, minlength=n)
                with np.errstate(invalid="ignore", divide="ignore"):
                    top_bigram = np.where(
                        tot2 > 0, mx / tot2.astype(np.float64), np.nan)
        if m >= 3:
            with np.errstate(over="ignore"):
                g3 = ((h[:-2] * _FNV_PRIME) ^ h[1:-1]) * _FNV_PRIME ^ h[2:]
            v = doc[:-2] == doc[2:]
            g3, d3 = g3[v], doc[:-2][v]
            if g3.size:
                o3 = np.lexsort((g3, d3))
                g3s, d3s = g3[o3], d3[o3]
                f3 = np.concatenate(
                    [[True], (g3s[1:] != g3s[:-1]) | (d3s[1:] != d3s[:-1])])
                dst = np.bincount(d3s[f3], minlength=n)
                tot3 = np.bincount(d3, minlength=n)
                with np.errstate(invalid="ignore", divide="ignore"):
                    dup_trigram = np.where(
                        tot3 > 0,
                        1.0 - dst / tot3.astype(np.float64), np.nan)
    return pa.table({
        "doc_id": t.column("doc_id"),
        "mean_token_len": pa.array(mean_tok, pa.float64(), from_pandas=True),
        "stopword_ratio": pa.array(stop_ratio, pa.float64(), from_pandas=True),
        "uniq_token_ratio": pa.array(uniq_ratio, pa.float64(), from_pandas=True),
        "top_bigram_ratio": pa.array(top_bigram, pa.float64(), from_pandas=True),
        "dup_trigram_ratio": pa.array(dup_trigram, pa.float64(), from_pandas=True),
    })


QUALITY_SQL = """
WITH norm AS (
  SELECT doc_id,
    trim(regexp_replace(lower(strip_accents(text)), '[^a-z0-9]+', ' ', 'g')) AS n
  FROM documents
),
toks AS (
  SELECT doc_id, string_split(n, ' ') AS ts, n FROM norm
),
big AS (
  SELECT doc_id, array_to_string(list_slice(ts, i, i + 1), ' ') AS g
  FROM toks, unnest(range(1, len(ts))) AS u(i)
  WHERE n <> '' AND len(ts) >= 2
),
bigc AS (
  SELECT doc_id, g, count(*) AS c FROM big GROUP BY doc_id, g
),
bigtop AS (
  SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_bigram_ratio
  FROM bigc GROUP BY doc_id
),
tri AS (
  SELECT doc_id, array_to_string(list_slice(ts, i, i + 2), ' ') AS g
  FROM toks, unnest(range(1, len(ts) - 1)) AS u(i)
  WHERE n <> '' AND len(ts) >= 3
),
tria AS (
  SELECT doc_id,
    1.0 - CAST(count(DISTINCT g) AS DOUBLE) / count(*) AS dup_trigram_ratio
  FROM tri GROUP BY doc_id
)
SELECT t.doc_id,
  CASE WHEN n = '' THEN NULL ELSE
    CAST(len(n) - (len(ts) - 1) AS DOUBLE) / len(ts) END AS mean_token_len,
  CASE WHEN n = '' THEN NULL ELSE
    CAST(len(list_filter(ts, x -> x = 'the' OR x = 'a')) AS DOUBLE) / len(ts) END AS stopword_ratio,
  CASE WHEN n = '' THEN NULL ELSE
    CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) END AS uniq_token_ratio,
  b.top_bigram_ratio,
  r.dup_trigram_ratio
FROM toks t
LEFT JOIN bigtop b USING (doc_id)
LEFT JOIN tria r USING (doc_id)
""".strip()


def lang_id(sf_dir: str) -> ray.data.Dataset:
    """Heuristic language ID: argmax marker-word hits, 'unk' when no marker
    (deterministic tie-break by language code).  Output mirrors the
    reference ``detect_language`` triple (is_reliable, is_english,
    predicted_language) from the fastText+cld2 ensemble
    (/root/reference/s2and/text.py:266-309): ``is_reliable`` = the two
    voters agree (marker argmax == declared lang column) AND the evidence
    is non-trivial (≥2 marker hits — the cld2 reliability-flag analog);
    ``is_english`` = predicted 'en'."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return ds.map_batches(lang_id_batch, batch_format="pyarrow")


def lang_id_batch(t: pa.Table) -> pa.Table:
    # vectorized: one RE2 presence pass per marker word (28 total) —
    # distinct-hit counts per language, then the same
    # strictly-greater argmax as the scalar loop (ties → first code)
    norm = normalize_text_array(t.column("text"))
    n = t.num_rows
    best_hits = np.zeros(n, dtype=np.int64)
    pred = np.full(n, "unk", dtype=object)
    for code in sorted(_LANG_MARKERS):
        hits = np.zeros(n, dtype=np.int64)
        for w in sorted(_LANG_MARKERS[code]):
            hits += pc.match_substring_regex(
                norm, rf"\b{w}\b").to_numpy(zero_copy_only=False)
        better = hits > best_hits
        pred[better] = code
        best_hits = np.where(better, hits, best_hits)
    langs = np.asarray(t.column("lang").to_pylist(), dtype=object)
    agree = pred == langs
    return pa.table({
        "doc_id": t.column("doc_id"),
        "pred_lang": pa.array(pred, pa.string()),
        "agrees_with_declared": pa.array(agree, pa.bool_()),
        "is_reliable": pa.array(agree & (best_hits >= 2), pa.bool_()),
        "is_english": pa.array(pred == "en", pa.bool_()),
    })


def _lang_id_sql() -> str:
    """Bit-exact twin of the stopword heuristic, GENERATED from
    ``_LANG_MARKERS`` so the Ray kernel and the SQL can never drift:
    per-language marker hits over the doc's DISTINCT normalized tokens,
    argmax with ties to the alphabetically-first code (the Python loop
    iterates sorted codes and only a STRICTLY greater count overrides —
    equivalently: the first code whose count ≥ every LATER code's),
    'unk' when no marker fires.  curate_corpus_sql composes this string,
    so adding a language updates every dependent oracle in lockstep."""
    codes = sorted(_LANG_MARKERS)
    hit_cols = ",\n    ".join(
        "len(list_filter(list_distinct(string_split(n, ' ')),\n"
        f"        x -> x IN ({', '.join(repr(w) for w in sorted(_LANG_MARKERS[c]))}))) AS h{c}"
        for c in codes)
    best = ", ".join(f"h{c}" for c in codes)
    whens = [f"WHEN greatest({best}) = 0 THEN 'unk'"]
    for i, c in enumerate(codes[:-1]):
        conds = " AND ".join(f"h{c} >= h{d}" for d in codes[i + 1:])
        whens.append(f"WHEN {conds} THEN '{c}'")
    case = "CASE " + "\n         ".join(whens) + f"\n         ELSE '{codes[-1]}' END"
    return f"""
WITH norm AS (
  SELECT doc_id, lang,
    trim(regexp_replace(lower(strip_accents(text)), '[^a-z0-9]+', ' ', 'g')) AS n
  FROM documents
),
hits AS (
  SELECT doc_id, lang,
    {hit_cols}
  FROM norm
),
pred AS (
  SELECT doc_id, lang, greatest({best}) AS best_hits,
    {case} AS pred_lang
  FROM hits
)
SELECT doc_id, pred_lang, pred_lang = lang AS agrees_with_declared,
       pred_lang = lang AND best_hits >= 2 AS is_reliable,
       pred_lang = 'en' AS is_english
FROM pred
""".strip()


LANG_ID_SQL = _lang_id_sql()


def fingerprints(sf_dir: str) -> ray.data.Dataset:
    """Content fingerprint: md5 of normalized text (DuckDB-parity) — the
    exact-dedup key."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _fp(t: pa.Table) -> pa.Table:
        norm = normalize_text_array(t.column("text")).to_pylist()
        fps = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in norm]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "fingerprint": pa.array(fps, pa.string()),
        })

    return ds.map_batches(_fp, batch_format="pyarrow")


FINGERPRINTS_SQL = """
SELECT doc_id,
  md5(trim(regexp_replace(lower(strip_accents(text)), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint
FROM documents
""".strip()


def token_document_frequency(sf_dir: str) -> ray.data.Dataset:
    """Corpus-level token document frequency — the name-counts analog
    (reference NameCounts, /root/reference/s2and/data.py:451-472: corpus
    frequencies built once, then broadcast).  Explode distinct tokens per doc
    (vectorized), then a high-cardinality bucketed count."""
    from ..stages.shuffleops import bucketed_aggregate

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pd.DataFrame:
        # flat split + C-speed per-doc distinct (drop_duplicates) + partial
        # count — no per-doc Python set() loop
        from itertools import chain

        norm = normalize_text_array(t.column("text")).to_pylist()
        tok_lists = [s.split() for s in norm]
        lens = np.fromiter((len(x) for x in tok_lists), np.int64,
                           count=len(tok_lists))
        flat = pd.DataFrame({
            "d": np.repeat(np.arange(len(tok_lists), dtype=np.int64), lens),
            "token": pd.Series(list(chain.from_iterable(tok_lists)),
                               dtype=object),
        }).drop_duplicates()
        g = flat["token"].value_counts()
        return pd.DataFrame({"token": g.index.to_numpy(dtype=object),
                             "df": g.to_numpy(dtype=np.int64)})

    partials = ds.map_batches(explode, batch_format="pyarrow", batch_size=4096)
    return bucketed_aggregate(partials, "token", df=("df", "sum"))


TOKEN_DF_SQL = """
WITH norm AS (
  SELECT doc_id,
    trim(regexp_replace(lower(strip_accents(text)), '[^a-z0-9]+', ' ', 'g')) AS n
  FROM documents
),
tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(n, ' '))) AS token
  FROM norm WHERE n <> ''
)
SELECT token, count(*) AS df FROM tok GROUP BY token
""".strip()


def heavy_hitters(
    ds: ray.data.Dataset,
    text_col: str = "text",
    k: int = 64,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """EXACT corpus heavy hitters with BOUNDED state: every token whose
    total count exceeds n_tokens/(k+1), with its exact count — the corpus
    top-token tracker a 100-TB curation pipeline runs to spot boilerplate
    without materializing the vocabulary (the anti-pattern the token-DF
    table would be at web scale).

    Two passes, both bounded:
    1. per-batch Misra–Gries summaries of ≤ k counters (vectorized: exact
       batch counts via value_counts, then one np.partition decrement —
       subtracting the (k+1)-th largest batch count preserves the MG
       guarantee error ≤ batch_tokens/(k+1), and summing summaries keeps
       total error ≤ n/(k+1), so every global heavy hitter survives with a
       positive summed estimate);
    2. candidates (≤ k per batch, deduped by a small bucketed sum) are
       broadcast as a frozenset and counted EXACTLY in one more stream
       pass; the integer filter cnt·(k+1) > n makes the output identical
       to the brute-force oracle (DuckDB HAVING twin, parity-tested).

    Returns a driver DataFrame (token, cnt): ≤ k rows by construction.
    """
    import ray as _ray

    from .shuffleops import _broadcast_get, bucketed_aggregate

    def _tokens(df: pd.DataFrame) -> "list[list[str]]":
        return df[text_col].str.split().to_list()

    def _mg_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = [t for row in _tokens(df) for t in (row or [])]
        n = len(toks)
        if n == 0:
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "est": pd.Series([], dtype=np.int64),
                                 "n_tok": pd.Series([], dtype=np.int64)})
        vc = pd.Series(toks, dtype=object).value_counts()
        c = vc.to_numpy(np.int64)
        if len(c) > k:
            d = np.partition(c, len(c) - k - 1)[len(c) - k - 1]
            keep = c - d > 0
            vc = vc[keep]
            c = c[keep] - d
        out = pd.DataFrame({"token": vc.index.to_numpy(dtype=object),
                            "est": c.astype(np.int64)})
        out["n_tok"] = 0
        if len(out):
            out.loc[out.index[0], "n_tok"] = n
        else:
            out = pd.DataFrame({"token": ["\x00"], "est": [0], "n_tok": [n]})
        return out

    partials = ds.map_batches(_mg_partial, batch_format="pandas")
    summed = bucketed_aggregate(partials, "token", est=("est", "sum"),
                                n_tok=("n_tok", "sum"),
                                num_buckets=num_buckets).to_pandas()
    n_total = int(summed["n_tok"].sum())
    cand = summed.loc[(summed["est"] > 0) & (summed["token"] != "\x00"),
                      "token"]
    cand_ref = _ray.put(frozenset(cand))

    def _exact(df: pd.DataFrame) -> pd.DataFrame:
        cs = _broadcast_get(cand_ref)
        toks = [t for row in _tokens(df) for t in (row or [])]
        if not toks:
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype=np.int64)})
        # count first (C path), THEN membership-filter the small distinct
        # index — no per-token Python `in`
        vc = pd.Series(toks, dtype=object).value_counts()
        vc = vc[vc.index.isin(cs)]
        return pd.DataFrame({"token": vc.index.to_numpy(dtype=object),
                             "cnt": vc.to_numpy(np.int64)})

    exact = bucketed_aggregate(
        ds.map_batches(_exact, batch_format="pandas"), "token",
        cnt=("cnt", "sum"), num_buckets=num_buckets).to_pandas()
    out = exact[exact["cnt"] * (k + 1) > n_total]
    return out.sort_values(["cnt", "token"],
                           ascending=[False, True]).reset_index(drop=True)


def heavy_hitters_docs(sf_dir: str, k: int = 64) -> pd.DataFrame:
    """Driver-surface row: exact bounded-state heavy hitters over the
    documents table (brute-force-count DuckDB twin, parity-tested)."""
    return heavy_hitters(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]), k=k)


def price_quantiles(sf_dir: str) -> pd.DataFrame:
    """Driver-surface row: exact distributed order-statistic quantiles of
    lineitem.l_extendedprice (sort → limit → Max per quantile; only |qs|
    scalars reach the driver)."""
    from .shuffleops import column_quantiles

    return column_quantiles(
        read_table(sf_dir, "lineitem", columns=["l_extendedprice"]),
        "l_extendedprice")


def price_quantiles_sql() -> str:
    from .shuffleops import column_quantiles_sql

    return column_quantiles_sql("lineitem", "l_extendedprice")


def heavy_hitters_sql(text_col: str = "text", k: int = 64) -> str:
    """Brute-force oracle: exact counts over ALL tokens with the identical
    integer threshold — equals heavy_hitters() output (parity-tested)."""
    return f"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim({text_col}), '\\s+')) AS token
  FROM documents WHERE trim({text_col}) <> ''
),
tot AS (SELECT count(*) AS n FROM tok)
SELECT token, count(*) AS cnt FROM tok, tot
GROUP BY token, n HAVING count(*) * ({k} + 1) > n
ORDER BY cnt DESC, token
""".strip()


# ---------------------------------------------------------------------------
# HyperLogLog approximate distinct count — bounded-state cardinality
# ---------------------------------------------------------------------------

_HLL_P = 12  # 4096 registers → σ ≈ 1.04/√4096 ≈ 1.6% relative error


def _hll_partial(values, p: int = _HLL_P) -> pd.DataFrame:
    """Sparse HLL registers for one batch of values: (idx, rank) rows for
    the registers this batch touches (≤ 2^p rows).  Fully vectorized —
    fnv1a64 hashes the values columnar, the rank is a log2 bit trick."""
    from ..functions.hashing import fnv1a64, splitmix64

    # FNV-1a is byte-sequential, not avalanche — its HIGH bits are biased
    # for short strings (observed: short int-strings touched ~7% of the
    # registers); the splitmix64 finalizer restores uniform high bits
    h = splitmix64(fnv1a64(values))
    if len(h) == 0:
        return pd.DataFrame({"idx": pd.Series([], dtype=np.int64),
                             "rank": pd.Series([], dtype=np.int64)})
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # sentinel low bits
    # rank = leading zeros of `rest` + 1 ∈ [1, 64-p+1]
    lz = np.uint64(63) - np.floor(np.log2(rest.astype(np.float64) + 1.0) - 1e-12).astype(np.uint64)
    rank = (lz + np.uint64(1)).astype(np.int64)
    df = pd.DataFrame({"idx": idx, "rank": rank})
    return df.groupby("idx", as_index=False).agg(rank=("rank", "max"))


def _hll_estimate(registers: np.ndarray) -> float:
    """Standard HLL estimator with the small-range (linear counting)
    correction; registers is the dense 2^p array (zeros included)."""
    m = len(registers)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds: ray.data.Dataset, col: str,
                    tokenize: bool = False, p: int = _HLL_P) -> float:
    """Approximate number of distinct values (or whitespace tokens when
    ``tokenize``) in ``col`` — the bounded-state cardinality pass a 100-TB
    pipeline runs instead of count(distinct) (which is a vocabulary-sized
    shuffle).  Per-batch sparse registers (≤ 2^p rows each) → one small
    bucketed max → a 2^p-row driver pull → estimate.  Deterministic AND
    partition-invariant: register merge is an order-free elementwise max,
    so any batching yields the identical estimate (pinned in tests;
    relative error vs exact ≈ 1.04/√2^p ≈ 1.6% at the default p=12)."""
    from .shuffleops import bucketed_aggregate

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        if tokenize:
            vals = [t for row in df[col].str.split().to_list()
                    for t in (row or [])]
        else:
            vals = df[col].astype(str).to_list()
        return _hll_partial(vals, p)

    sparse = bucketed_aggregate(
        ds.map_batches(_partial, batch_format="pandas"), "idx",
        rank=("rank", "max"), num_buckets=4).to_pandas()
    regs = np.zeros(1 << p, dtype=np.int64)
    regs[sparse["idx"].to_numpy(np.int64)] = sparse["rank"].to_numpy(np.int64)
    return _hll_estimate(regs)


# ---------------------------------------------------------------------------
# unigram log-loss quality score (model-free perplexity-filter analog)
# ---------------------------------------------------------------------------


def unigram_logloss(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-doc mean negative log-probability under the corpus's own
    unigram LM — the model-free analog of CCNet-style perplexity
    filtering: boilerplate scores LOW (common tokens), gibberish / wrong-
    language text scores HIGH.  Output (doc_id, n_tokens, logloss; NaN for
    empty docs), ``logloss = mean_i −ln(count(tok_i)/total_tokens)``.

    Two passes, both bounded: (1) the range-sharded TERM-frequency side
    input (stages/tokendf.py, the same plasma layout as the DF pair
    features — the vocabulary never lands on the driver) + one scalar
    total; (2) a stateless scoring map (hash → searchsorted lookup; a
    truncated-table miss counts 1, i.e. maximally surprising).  48-bit
    token-hash collisions merge counts with odds ~vocab²/2⁴⁸
    (documented; the pytest DuckDB twin over raw strings agrees at test
    scale, round-6)."""
    from .normalize import normalize_stage
    from .shuffleops import _broadcast_get
    from .tokendf import (
        ShardedTokenDF, build_token_df, resolve_view, token_hashes)

    import ray as _ray

    # no materialize: the scoring pass re-runs the (cheap, vectorized)
    # normalize rather than pinning the whole normalized corpus in plasma
    norm = normalize_stage(ds.select_columns([id_col, text_col])) \
        .select_columns([id_col, "norm_text"])
    tf: ShardedTokenDF = build_token_df(norm, n_shards=None, min_df=1,
                                        distinct_per_doc=False)

    @_ray.remote
    def _total(*shards) -> int:
        return int(sum(int(s[1].sum()) for s in shards))

    total_ref = _total.remote(*tf.refs)
    handle_ref = _ray.put(tf)

    def _score(t: pa.Table) -> pa.Table:
        view = resolve_view(_broadcast_get(handle_ref))
        total = float(_broadcast_get(total_ref))
        norms = t.column("norm_text").to_pylist()
        n = len(norms)
        tok_lists = [(s or "").split() for s in norms]
        lens = np.fromiter((len(x) for x in tok_lists), np.int64, count=n)
        out = np.full(n, np.nan)
        m = int(lens.sum())
        if m:
            from itertools import chain

            th = token_hashes(list(chain.from_iterable(tok_lists)))
            cnts = view.lookup_hashes(th)
            nll = -np.log(cnts / total)
            doc = np.repeat(np.arange(n, dtype=np.int64), lens)
            sums = np.zeros(n, np.float64)
            np.add.at(sums, doc, nll)
            with np.errstate(invalid="ignore", divide="ignore"):
                out = np.where(lens > 0, sums / np.maximum(lens, 1), np.nan)
        return pa.table({
            "doc_id": t.column(id_col),
            "n_tokens": pa.array(lens, pa.int64()),
            "logloss": pa.array(np.round(out, 6), pa.float64(),
                                from_pandas=True),
        })

    return norm.map_batches(_score, batch_format="pyarrow")


def doc_unigram_logloss(sf_dir: str) -> ray.data.Dataset:
    return unigram_logloss(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]))


UNIGRAM_LOGLOSS_SQL = """
WITH norm AS (
  SELECT doc_id,
    trim(regexp_replace(lower(strip_accents(text)), '[^a-z0-9]+', ' ', 'g')) AS n
  FROM documents
),
tok AS (
  SELECT doc_id, unnest(string_split(n, ' ')) AS token
  FROM norm WHERE n <> ''
),
tf AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM tok),
scored AS (
  SELECT k.doc_id, avg(-ln(tf.c / tot.t)) AS ll, count(*) AS n_tokens
  FROM tok k JOIN tf USING (token), tot GROUP BY k.doc_id
)
SELECT n.doc_id,
       coalesce(s.n_tokens, 0) AS n_tokens,
       round(s.ll, 6) AS logloss
FROM norm n LEFT JOIN scored s USING (doc_id)
""".strip()


# second, mechanism-independent language voter: discriminative character
# trigrams of common function words (normalized ascii).  The reference's
# detect_language is a fastText × cld2 ENSEMBLE whose is_reliable flag means
# "the two detectors agree" (/root/reference/s2and/text.py:266-309); no LID
# model exists in this env, so the two voters here are the marker-word
# argmax (word-boundary regex mechanism) and this trigram-mass argmax
# (substring-count mechanism) — independent failure modes, same agreement
# logic.  The SQL twin is GENERATED from the same table (lockstep).
_EXTRA_NGRAM_WORDS: dict[str, frozenset] = {
    "en": frozenset({"this", "that", "with", "from", "they", "which"}),
    "fr": frozenset({"pour", "dans", "avec", "sont", "vous", "nous"}),
    "de": frozenset({"nicht", "sich", "auch", "werden", "eine", "durch"}),
    "es": frozenset({"para", "como", "pero", "esta", "sobre", "entre"}),
    "it": frozenset({"sono", "anche", "come", "questo", "della", "delle"}),
    "nl": frozenset({"zijn", "deze", "ook", "maar", "naar", "worden"}),
    "pt": frozenset({"para", "como", "mais", "pelo", "cada", "sempre"}),
}


def _build_lang_trigrams() -> dict[str, tuple]:
    """Per-language padded-word trigrams UNIQUE to that language (shared
    trigrams carry no signal and are dropped), capped at 16, sorted —
    deterministic, so the generated SQL twin can never drift."""
    from collections import Counter

    raw: dict[str, set] = {}
    for c in sorted(_LANG_MARKERS):
        tri = set()
        for w in sorted(_LANG_MARKERS[c] | _EXTRA_NGRAM_WORDS[c]):
            p = f" {w} "
            tri.update(p[i:i + 3] for i in range(len(p) - 2))
        raw[c] = tri
    cnt = Counter(t for s in raw.values() for t in s)
    return {c: tuple(sorted(t for t in raw[c] if cnt[t] == 1))[:16]
            for c in sorted(raw)}


_LANG_TRIGRAMS = _build_lang_trigrams()


def lang_id_ensemble_batch(t: pa.Table) -> pa.Table:
    """Two-voter language ID with the reference ensemble-agreement logic:
    pred_marker (word-boundary stopword argmax — the lang_id voter),
    pred_ngram (discriminative-trigram substring-mass argmax),
    votes_agree, is_reliable = agree AND marker evidence ≥ 2 hits."""
    norm = normalize_text_array(t.column("text"))
    n = t.num_rows
    # voter A: marker-word distinct hits (same kernel as lang_id_batch)
    best_hits = np.zeros(n, dtype=np.int64)
    pred_a = np.full(n, "unk", dtype=object)
    for code in sorted(_LANG_MARKERS):
        hits = np.zeros(n, dtype=np.int64)
        for w in sorted(_LANG_MARKERS[code]):
            hits += pc.match_substring_regex(
                norm, rf"\b{w}\b").to_numpy(zero_copy_only=False)
        better = hits > best_hits
        pred_a[better] = code
        best_hits = np.where(better, hits, best_hits)
    # voter B: trigram occurrence mass over the padded text
    padded = pc.binary_join_element_wise(
        pa.array([" "] * n), norm, pa.array([" "] * n), "")
    best_mass = np.zeros(n, dtype=np.int64)
    pred_b = np.full(n, "unk", dtype=object)
    for code in sorted(_LANG_TRIGRAMS):
        mass = np.zeros(n, dtype=np.int64)
        for tri in _LANG_TRIGRAMS[code]:
            mass += pc.count_substring(
                padded, pattern=tri).to_numpy(zero_copy_only=False)
        better = mass > best_mass
        pred_b[better] = code
        best_mass = np.where(better, mass, best_mass)
    agree = pred_a == pred_b
    return pa.table({
        "doc_id": t.column("doc_id"),
        "pred_marker": pa.array(pred_a, pa.string()),
        "pred_ngram": pa.array(pred_b, pa.string()),
        "votes_agree": pa.array(agree, pa.bool_()),
        "is_reliable": pa.array(agree & (best_hits >= 2), pa.bool_()),
        "is_english": pa.array(pred_a == "en", pa.bool_()),
    })


def lang_id_ensemble(sf_dir: str) -> ray.data.Dataset:
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(lang_id_ensemble_batch, batch_format="pyarrow")


def _lang_id_ensemble_sql() -> str:
    """Twin GENERATED from _LANG_MARKERS + _LANG_TRIGRAMS (engine-parity:
    DuckDB replace() and Arrow count_substring both count non-overlapping
    occurrences left-to-right)."""
    codes = sorted(_LANG_MARKERS)
    hit_cols = ",\n    ".join(
        "len(list_filter(list_distinct(string_split(n, ' ')),\n"
        f"        x -> x IN ({', '.join(repr(w) for w in sorted(_LANG_MARKERS[c]))}))) AS h{c}"
        for c in codes)
    mass_cols = ",\n    ".join(
        " + ".join(
            f"(length(p) - length(replace(p, '{tri}', ''))) / 3"
            for tri in _LANG_TRIGRAMS[c]) + f" AS m{c}"
        for c in codes)
    besth = ", ".join(f"h{c}" for c in codes)
    bestm = ", ".join(f"m{c}" for c in codes)

    def argmax_case(prefix: str, best: str) -> str:
        whens = [f"WHEN greatest({best}) = 0 THEN 'unk'"]
        for i, c in enumerate(codes[:-1]):
            conds = " AND ".join(
                f"{prefix}{c} >= {prefix}{d}" for d in codes[i + 1:])
            whens.append(f"WHEN {conds} THEN '{c}'")
        return ("CASE " + "\n         ".join(whens)
                + f"\n         ELSE '{codes[-1]}' END")

    return f"""
WITH norm AS (
  SELECT doc_id,
    trim(regexp_replace(lower(strip_accents(text)), '[^a-z0-9]+', ' ', 'g')) AS n
  FROM documents
),
padded AS (
  SELECT doc_id, n, ' ' || n || ' ' AS p FROM norm
),
scores AS (
  SELECT doc_id,
    {hit_cols},
    {mass_cols}
  FROM padded
),
pred AS (
  SELECT doc_id, greatest({besth}) AS best_hits,
    {argmax_case("h", besth)} AS pred_marker,
    {argmax_case("m", bestm)} AS pred_ngram
  FROM scores
)
SELECT doc_id, pred_marker, pred_ngram,
       pred_marker = pred_ngram AS votes_agree,
       pred_marker = pred_ngram AND best_hits >= 2 AS is_reliable,
       pred_marker = 'en' AS is_english
FROM pred
""".strip()


LANG_ID_ENSEMBLE_SQL = _lang_id_ensemble_sql()
