"""Training-data curation stages: PII redaction and benchmark
decontamination over the documents table.

These extend the reference's corpus-hygiene surface (text cleaning in
/root/reference/s2and/text.py:1-60, dataset filtering in
/root/reference/s2and/data.py:279-320) with the two curation passes every
large-scale LM data pipeline runs before training:

* ``pii_redaction`` — RE2-regex detection + redaction of emails / phone
  numbers / IPv4 addresses, fully vectorized (one `pyarrow.compute` pass
  per pattern, no Python row loop).  The synthetic documents table contains
  no natural PII, so the registered query first PLANTS deterministic
  doc_id-derived PII strings (the same projection is applied in the DuckDB
  twin) so the oracle exercises real matches end to end.
* ``decontaminate`` — n-gram-overlap decontamination against a benchmark
  subset (GPT-3 appendix-C style 13-gram collision check): the benchmark
  side's distinct n-gram hashes are assembled INSIDE a Ray task (the
  driver only ever holds an ObjectRef), broadcast once via the object
  store, and every corpus batch counts its distinct n-grams that collide
  via a vectorized searchsorted — no shuffle, no driver materialization.
  Benchmark sets are small by definition; a loud cap guards the broadcast.

Scale notes (100 TB): both stages are embarrassingly parallel map_batches
passes.  PII redaction holds no state at all; decontamination broadcasts
one sorted uint64 array (8 bytes per distinct benchmark n-gram — a 1M-doc
benchmark suite is ~0.5 GiB, read zero-copy from plasma by every actor).
"""

from __future__ import annotations

from itertools import chain

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.hashing import _FNV_PRIME, fnv1a64
from ..functions.textnorm import normalize_text_array
from ..sources.tables import read_table

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# One pattern string per PII class, shared verbatim by the pyarrow kernels
# and the DuckDB twin — both engines are RE2, so match semantics agree.
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d[\d\-]{5,}\d"


def redact_pii(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Count and redact emails / IPv4s / phone numbers in ``text_col``.

    Counts are per-pattern over the ORIGINAL text; redaction applies
    email → ip → phone (the patterns are disjoint on any one span, so the
    order only matters for determinism).  Output keeps every input column
    except ``text_col``, plus n_emails / n_ips / n_phones / redacted_text.
    """

    def _redact(t: pa.Table) -> pa.Table:
        txt = t.column(text_col)
        cols = {c: t.column(c) for c in t.column_names if c != text_col}
        for name, pat in (("n_emails", EMAIL_RE), ("n_ips", IP_RE),
                          ("n_phones", PHONE_RE)):
            cols[name] = pc.cast(pc.count_substring_regex(txt, pat), pa.int64())
        red = pc.replace_substring_regex(txt, EMAIL_RE, "<EMAIL>")
        red = pc.replace_substring_regex(red, IP_RE, "<IP>")
        red = pc.replace_substring_regex(red, PHONE_RE, "<PHONE>")
        cols["redacted_text"] = red
        return pa.table(cols)

    return ds.map_batches(_redact, batch_format="pyarrow")


def _plant_pii(t: pa.Table) -> pa.Table:
    """Deterministically append doc_id-derived PII strings to `text` —
    email on doc_id%2==0, phone on %3==0, IPv4 on %5==0 — so the oracle
    run has real matches to find.  Mirrored exactly in PII_REDACTION_SQL."""
    ids = t.column("doc_id").combine_chunks()
    ids_np = np.asarray(ids)
    s = pc.cast(ids, pa.string())

    def _part(mask: np.ndarray, arr) -> pa.Array:
        return pc.if_else(pa.array(mask), arr, pa.scalar(""))

    email = _part(ids_np % 2 == 0, pc.binary_join_element_wise(
        " contact user", s, "@example.com", ""))
    phone = _part(ids_np % 3 == 0, pc.binary_join_element_wise(
        " call +1-555-", pc.cast(pa.array(ids_np % 10000), pa.string()), ""))
    ip = _part(ids_np % 5 == 0, pc.binary_join_element_wise(
        " host 10.", pc.cast(pa.array(ids_np % 256), pa.string()),
        ".", pc.cast(pa.array((ids_np // 7) % 256), pa.string()),
        ".", pc.cast(pa.array((ids_np // 13) % 256), pa.string()), ""))
    planted = pc.binary_join_element_wise(t.column("text"), email, phone, ip, "")
    return pa.table({"doc_id": ids, "text": planted})


def pii_redaction(sf_dir: str) -> ray.data.Dataset:
    """Registered query: plant deterministic PII into the documents table,
    then run the redaction stage.  (doc_id, n_emails, n_ips, n_phones,
    redacted_text)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return redact_pii(ds.map_batches(_plant_pii, batch_format="pyarrow"))


PII_REDACTION_SQL = """
WITH planted AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 2 = 0
            THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
            ELSE '' END
    || CASE WHEN doc_id % 3 = 0
            THEN ' call +1-555-' || CAST(doc_id % 10000 AS VARCHAR)
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
                 || '.' || CAST((doc_id // 7) % 256 AS VARCHAR)
                 || '.' || CAST((doc_id // 13) % 256 AS VARCHAR)
            ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
  len(regexp_extract_all(t, '{EMAIL}')) AS n_emails,
  len(regexp_extract_all(t, '{IP}')) AS n_ips,
  len(regexp_extract_all(t, '{PHONE}')) AS n_phones,
  regexp_replace(regexp_replace(regexp_replace(t,
      '{EMAIL}', '<EMAIL>', 'g'),
      '{IP}', '<IP>', 'g'),
      '{PHONE}', '<PHONE>', 'g') AS redacted_text
FROM planted
""".strip().replace("{EMAIL}", EMAIL_RE).replace("{IP}", IP_RE) \
    .replace("{PHONE}", PHONE_RE)


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram collision check)
# ---------------------------------------------------------------------------

# Loud guard on the broadcast: 64M distinct benchmark n-grams = 512 MiB.
BENCH_NGRAM_CAP = 64_000_000


def _doc_distinct_ngram_hashes(norm_texts: list, n: int
                               ) -> tuple[np.ndarray, np.ndarray]:
    """(doc_index, gram_hash) for the DISTINCT word n-grams of each
    normalized text — flat split, one fnv pass over all tokens, an
    (n-1)-step vectorized rolling combine, then lexsort segment-dedup.
    No per-row Python beyond str.split."""
    tok_lists = [s.split() for s in norm_texts]
    lens = np.fromiter((len(x) for x in tok_lists), np.int64,
                       count=len(tok_lists))
    m = int(lens.sum())
    if m < n:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    h = fnv1a64(list(chain.from_iterable(tok_lists)))
    doc = np.repeat(np.arange(len(tok_lists), dtype=np.int64), lens)
    acc = h[: m - n + 1].copy()
    with np.errstate(over="ignore"):
        for j in range(1, n):
            acc ^= h[j: j + acc.size]
            acc *= _FNV_PRIME
    valid = doc[: m - n + 1] == doc[n - 1:]
    g, gdoc = acc[valid], doc[: m - n + 1][valid]
    if not g.size:
        return gdoc, g
    order = np.lexsort((g, gdoc))
    g, gdoc = g[order], gdoc[order]
    first = np.concatenate(
        [[True], (g[1:] != g[:-1]) | (gdoc[1:] != gdoc[:-1])])
    return gdoc[first], g[first]


@ray.remote
def _merge_bench_hashes(cap: int, *blocks) -> np.ndarray:
    """Merge per-block distinct-hash tables into one sorted unique uint64
    array — runs as a Ray task so the driver never holds the set."""
    parts = [np.asarray(b.column("h")) for b in blocks if b.num_rows]
    if not parts:
        return np.empty(0, np.uint64)
    merged = np.unique(np.concatenate(parts))
    if merged.size > cap:
        raise ValueError(
            f"benchmark n-gram set has {merged.size} distinct grams "
            f"(cap {cap}); decontamination broadcasts the set — "
            "shard the benchmark or raise BENCH_NGRAM_CAP deliberately")
    return merged


class _DecontaminateBatch:
    """Actor-pool stage: benchmark hash set fetched from plasma once per
    actor (zero-copy), then per-batch vectorized searchsorted membership."""

    def __init__(self, bench_ref, n: int, bench_mod: int):
        self.bench = ray.get(bench_ref)
        self.n = n
        self.bench_mod = bench_mod

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("doc_id").combine_chunks())
        keep = ids % self.bench_mod != 0
        sub = t.filter(pa.array(keep))
        if sub.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_overlap_ngrams": pa.array([], pa.int64()),
                             "contaminated": pa.array([], pa.bool_())})
        norm = normalize_text_array(sub.column("text")).to_pylist()
        counts = _collision_counts(self.bench, norm, self.n)
        return pa.table({
            "doc_id": sub.column("doc_id"),
            "n_overlap_ngrams": pa.array(counts, pa.int64()),
            "contaminated": pa.array(counts > 0),
        })


def _bench_ngrams_ref(ds: ray.data.Dataset, n: int, bench_mod: int):
    """Assemble the benchmark side's distinct n-gram hash set INSIDE Ray
    tasks (the driver only ever holds the ObjectRef of the sorted array)."""

    def _bench_hashes(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("doc_id").combine_chunks())
        sub = t.filter(pa.array(ids % bench_mod == 0))
        if sub.num_rows == 0:
            return pa.table({"h": pa.array([], pa.uint64())})
        norm = normalize_text_array(sub.column("text")).to_pylist()
        _, g = _doc_distinct_ngram_hashes(norm, n)
        return pa.table({"h": pa.array(np.unique(g), pa.uint64())})

    bench_blocks = ds.map_batches(
        _bench_hashes, batch_format="pyarrow").to_arrow_refs()
    return _merge_bench_hashes.remote(BENCH_NGRAM_CAP, *bench_blocks)


def _collision_counts(bench: np.ndarray, norm_texts: list, n: int
                      ) -> np.ndarray:
    """Distinct n-grams of each normalized text colliding with the sorted
    benchmark hash array — the vectorized searchsorted membership kernel
    shared by _DecontaminateBatch and the fused curate_corpus verdict."""
    gdoc, g = _doc_distinct_ngram_hashes(norm_texts, n)
    counts = np.zeros(len(norm_texts), dtype=np.int64)
    if g.size and bench.size:
        idx = np.searchsorted(bench, g)
        idx_c = np.minimum(idx, bench.size - 1)
        hit = bench[idx_c] == g
        counts = np.bincount(gdoc[hit], minlength=len(norm_texts))
    return counts


def decontaminate(ds: ray.data.Dataset, n: int = 13, bench_mod: int = 97
                  ) -> ray.data.Dataset:
    """Flag corpus docs sharing any word n-gram with the benchmark subset
    (docs with doc_id % bench_mod == 0 stand in for the held-out suite).
    Returns (doc_id, n_overlap_ngrams, contaminated) for NON-benchmark
    docs; n_overlap_ngrams counts the doc's distinct colliding n-grams."""
    bench_ref = _bench_ngrams_ref(ds, n, bench_mod)
    return ds.map_batches(
        _DecontaminateBatch, fn_constructor_args=(bench_ref, n, bench_mod),
        batch_format="pyarrow", concurrency=(1, 8))


def decontaminate_docs(sf_dir: str, n: int = 13, bench_mod: int = 97
                       ) -> ray.data.Dataset:
    """Registered query wrapper over the documents table."""
    return decontaminate(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]),
        n=n, bench_mod=bench_mod)


DECONTAMINATE_SQL = """
WITH norm AS (
  SELECT doc_id,
    trim(regexp_replace(lower(strip_accents(text)), '[^a-z0-9]+', ' ', 'g')) AS nt
  FROM documents
),
toks AS (
  SELECT doc_id, string_split(nt, ' ') AS ts FROM norm WHERE nt <> ''
),
grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(ts, i, i + {NM1}), ' ') AS gs
  FROM toks, unnest(range(1, len(ts) - {NM2})) AS u(i)
  WHERE len(ts) >= {N}
),
bench AS (
  SELECT DISTINCT gs FROM grams WHERE doc_id % {MOD} = 0
),
hits AS (
  SELECT g.doc_id, count(*) AS n_overlap
  FROM grams g JOIN bench b USING (gs)
  WHERE g.doc_id % {MOD} <> 0
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       coalesce(h.n_overlap, 0) AS n_overlap_ngrams,
       coalesce(h.n_overlap, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {MOD} <> 0
""".strip()


def decontaminate_sql(n: int = 13, bench_mod: int = 97) -> str:
    return (DECONTAMINATE_SQL
            .replace("{NM1}", str(n - 1)).replace("{NM2}", str(n - 2))
            .replace("{N}", str(n)).replace("{MOD}", str(bench_mod)))


# ---------------------------------------------------------------------------
# URL canonicalization + URL-level dedup (WARC-style first-per-URL pass)
# ---------------------------------------------------------------------------

# scheme / host / rest-without-fragment — named groups for pyarrow
# extract_regex; DuckDB addresses the same groups by index (1, 2, 3).
URL_PARTS_RE = r"(?i)^(?P<s>https?://)(?P<h>[^/?#]+)(?P<r>[^#]*).*$"
TRACKING_RE = r"(?:utm_[a-z]+|fbclid|gclid|ref)=[^&]*&?"
PORT_RE = r":(?:80|443)$"


def canonicalize_url_array(urls: pa.Array) -> pa.Array:
    """Vectorized URL canonicalization: lowercase scheme+host, strip the
    default port, drop the fragment, remove tracking params
    (utm_*/fbclid/gclid/ref), tidy separators, strip trailing slashes.
    Non-URL strings pass through unchanged.  Every step is an RE2 kernel
    run with the exact pattern the DuckDB twin uses."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    parts = pc.extract_regex(urls, URL_PARTS_RE)
    scheme = pc.utf8_lower(pc.struct_field(parts, "s"))
    host = pc.replace_substring_regex(
        pc.utf8_lower(pc.struct_field(parts, "h")), PORT_RE, "")
    rest = pc.struct_field(parts, "r")
    rest = pc.replace_substring_regex(rest, TRACKING_RE, "")
    rest = pc.replace_substring_regex(rest, r"[?&]+$", "")
    rest = pc.replace_substring_regex(rest, r"\?&", "?")
    rest = pc.replace_substring_regex(rest, r"/+$", "")
    canon = pc.binary_join_element_wise(scheme, host, rest, "")
    return pc.if_else(pc.is_valid(parts), canon, urls)


# The same chain in DuckDB, over a column expression {U}
CANONICAL_URL_SQL_EXPR = """
CASE WHEN regexp_matches({U}, '{P}') THEN
  lower(regexp_extract({U}, '{P}', 1))
  || regexp_replace(lower(regexp_extract({U}, '{P}', 2)), '{PORT}', '')
  || regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       regexp_extract({U}, '{P}', 3),
       '{T}', '', 'g'), '[?&]+$', '', 'g'), '\\?&', '?', 'g'), '/+$', '', 'g')
ELSE {U} END
""".strip().replace("{P}", URL_PARTS_RE).replace("{T}", TRACKING_RE) \
    .replace("{PORT}", PORT_RE)


def url_dedup(pages: ray.data.Dataset, url_col: str = "url",
              id_col: str = "doc_id", num_buckets: int = 32
              ) -> ray.data.Dataset:
    """First-capture-per-canonical-URL election (the WARC refresh-crawl
    dedup): canonicalize every URL, then one bucketed aggregate keyed on
    the canonical form.  Output: (canonical_url, keeper_doc_id, n_dups)."""
    from .shuffleops import bucketed_aggregate

    def _canon(t: pa.Table) -> pa.Table:
        return pa.table({
            "canonical_url": canonicalize_url_array(t.column(url_col)),
            id_col: t.column(id_col),
        })

    canon = pages.map_batches(_canon, batch_format="pyarrow")
    agg = bucketed_aggregate(canon, "canonical_url", num_buckets,
                             keeper_doc_id=(id_col, "min"),
                             n=(id_col, "size"))

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "canonical_url": df["canonical_url"],
            "keeper_doc_id": df["keeper_doc_id"].astype(np.int64),
            "n_dups": (df["n"] - 1).astype(np.int64),
        })

    return agg.map_batches(_final, batch_format="pandas")


# ---------------------------------------------------------------------------
# composite quality filter (Gopher-rule style keep/drop with reasons)
# ---------------------------------------------------------------------------

# (rule name, metric column, lo, hi) — first violated rule wins; NULL
# metrics (empty docs) drop as 'empty'.  Bounds follow the Gopher-paper
# shape (Rae et al. 2021 §A1.1) adapted to this table's metrics.
QUALITY_RULES = (
    ("mean_token_len", "mean_token_len", 2.0, 12.0),
    ("stopword_ratio", "stopword_ratio", None, 0.5),
    ("uniq_token_ratio", "uniq_token_ratio", 0.2, None),
    ("top_bigram_ratio", "top_bigram_ratio", None, 0.25),
    ("dup_trigram_ratio", "dup_trigram_ratio", None, 0.3),
)


def quality_filter(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, keep, reason) over the documents table: Gopher-style
    threshold chain on the doc_quality metrics.  ``reason`` names the
    FIRST violated rule ('' when kept, 'empty' when the metrics are NULL).
    Stateless composition: quality_scores → one vectorized rule pass."""
    from .textstats import quality_scores

    def _rules(df: pd.DataFrame) -> pd.DataFrame:
        reason = quality_drop_reasons(df)
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "keep": reason == "",
            "reason": reason,
        })

    return quality_scores(sf_dir).map_batches(_rules, batch_format="pandas")


def quality_drop_reasons(df: pd.DataFrame) -> np.ndarray:
    """First-violated-rule name per row ('' = keep, 'empty' = NULL
    metrics) over the quality_metrics columns — shared by the standalone
    quality_filter query and the fused curate_corpus verdict pass."""
    n = len(df)
    reason = np.full(n, "", dtype=object)
    # NULL metrics = empty/degenerate doc (checked first, like the
    # SQL twin's leading CASE arm)
    empty = df["mean_token_len"].isna().to_numpy()
    reason[empty] = "empty"
    for name, col, lo, hi in QUALITY_RULES:
        v = df[col].to_numpy(np.float64)
        bad = np.zeros(n, bool)
        if lo is not None:
            bad |= v < lo
        if hi is not None:
            bad |= v > hi
        # top_bigram/dup_trigram may be NaN on 1-2-token docs that are
        # otherwise valid — NaN comparisons are False, so they pass
        hit = bad & ~empty & (reason == "")
        reason[hit] = name
    return reason


def quality_filter_sql() -> str:
    """DuckDB twin: QUALITY_SQL as a CTE + the same first-match CASE chain."""
    from .textstats import QUALITY_SQL

    arms = []
    for name, col, lo, hi in QUALITY_RULES:
        conds = []
        if lo is not None:
            conds.append(f"{col} < {lo}")
        if hi is not None:
            conds.append(f"{col} > {hi}")
        arms.append(f"WHEN {' OR '.join(conds)} THEN '{name}'")
    case = ("CASE WHEN mean_token_len IS NULL THEN 'empty' "
            + " ".join(arms) + " ELSE '' END")
    return (f"WITH q AS ({QUALITY_SQL})\n"
            f"SELECT doc_id, {case} = '' AS keep, {case} AS reason FROM q")


# ---------------------------------------------------------------------------
# curate_corpus: the full LM-data hygiene funnel in one pipeline
# ---------------------------------------------------------------------------

class _CurateVerdictBatch:
    """Fused per-doc verdict pass for curate_corpus: md5 fingerprint,
    language-ID, quality-rule reason, and benchmark n-gram contamination
    in ONE read of the corpus.  Reuses the standalone stages\' own batch
    kernels verbatim (textstats.lang_id_batch / quality_metrics_batch,
    _collision_counts), so the fused funnel stays bit-exact with the
    composed DuckDB twin."""

    def __init__(self, bench_ref, n: int, bench_mod: int):
        self.bench = ray.get(bench_ref)
        self.n = n
        self.bench_mod = bench_mod

    def __call__(self, t: pa.Table) -> pa.Table:
        import hashlib

        from .textstats import lang_id_batch, quality_metrics_batch

        lid = lang_id_batch(t)
        qm = quality_metrics_batch(t).to_pandas()
        norm = normalize_text_array(t.column("text")).to_pylist()
        fps = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in norm]
        contaminated = _collision_counts(self.bench, norm, self.n) > 0
        return pa.table({
            "doc_id": t.column("doc_id"),
            "fingerprint": pa.array(fps, pa.string()),
            "is_english": lid.column("is_english"),
            "q_reason": pa.array(quality_drop_reasons(qm), pa.string()),
            "contaminated": pa.array(contaminated),
        })


def curate_corpus(sf_dir: str, n: int = 13, bench_mod: int = 17
                  ) -> ray.data.Dataset:
    """End-to-end training-corpus curation over the documents table —
    the production composition of this module's stages, with
    first-dropping-stage attribution:

      benchmark > exact_dup > lang > quality > contaminated

    then survivors get corpus-level paragraph dedup + PII redaction.
    Output (one row per doc): (doc_id, kept, drop_stage, curated_text,
    n_paras_dropped); ``curated_text`` is '' for dropped docs.

    Scale shape: ONE fused verdict pass over the corpus (fingerprint +
    lang + quality + contamination flags in a single actor-pool
    map_batches — the benchmark n-gram set is a plasma broadcast), then
    ONE light shuffle on the fingerprint for the exact-dup election +
    precedence resolution.  Full text never enters a verdict exchange;
    the only text-bearing exchanges are the survivor semi-join and
    paragraph_dedup's fused drop⋈docs rebuild.
    """
    from .dedup import paragraph_dedup
    from .shuffleops import bucketed_group_apply, join_on_key

    docs3 = read_table(sf_dir, "documents",
                       columns=["doc_id", "text", "lang"])
    bench_ref = _bench_ngrams_ref(docs3, n, bench_mod)
    verdicts = docs3.map_batches(
        _CurateVerdictBatch, fn_constructor_args=(bench_ref, n, bench_mod),
        batch_format="pyarrow", concurrency=(1, 8))

    def _stage(part: pd.DataFrame) -> pd.DataFrame:
        ids = part["doc_id"].to_numpy(np.int64)
        canonical = part.groupby("fingerprint")["doc_id"] \
            .transform("min").to_numpy(np.int64)
        stage = np.full(len(part), "", dtype=object)
        for mask, name in (
            (ids % bench_mod == 0, "benchmark"),
            (ids != canonical, "exact_dup"),
            (~part["is_english"].to_numpy(bool), "lang"),
            ((part["q_reason"] != "").to_numpy(), "quality"),
            (part["contaminated"].to_numpy(bool), "contaminated"),
        ):
            stage[mask & (stage == "")] = name
        return pd.DataFrame({"doc_id": ids, "drop_stage": stage})

    # materialize the LIGHT verdict table (doc_id + stage name only — never
    # text): the dropped and kept branches below would otherwise each
    # re-execute the whole verdict subplan, and two copies of the
    # verdict actor pool can deadlock a small CPU budget
    v = bucketed_group_apply(verdicts, "fingerprint", _stage).materialize()

    def _dropped(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["drop_stage"] != ""]
        return pd.DataFrame({
            "doc_id": d["doc_id"].to_numpy(np.int64),
            "kept": np.zeros(len(d), bool),
            "drop_stage": d["drop_stage"],
            "curated_text": np.full(len(d), "", dtype=object),
            "n_paras_dropped": np.zeros(len(d), np.int64),
        })

    dropped = v.map_batches(_dropped, batch_format="pandas")

    kept_ids = v.map_batches(
        lambda df: df.loc[df["drop_stage"] == "", ["doc_id"]],
        batch_format="pandas")
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    # materialize: paragraph_dedup consumes its input TWICE (paragraph
    # election + rebuild join) — without a checkpoint the semi-join
    # shuffle would execute twice.  Blocks live in plasma and spill; the
    # kept corpus is the pipeline's output size, not an amplification.
    kept_docs = join_on_key(docs, kept_ids, "doc_id", how="semi") \
        .materialize()
    rebuilt = paragraph_dedup(kept_docs)                  # doc_id,text,n_paras,n_dropped
    red = redact_pii(rebuilt.select_columns(["doc_id", "text", "n_dropped"]))

    def _kept(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "kept": np.ones(len(df), bool),
            "drop_stage": np.full(len(df), "", dtype=object),
            "curated_text": df["redacted_text"],
            "n_paras_dropped": df["n_dropped"].to_numpy(np.int64),
        })

    return dropped.union(red.map_batches(_kept, batch_format="pandas"))


def curate_corpus_sql(n: int = 13, bench_mod: int = 17) -> str:
    """Composed DuckDB twin: every arm reuses the stage's own verified
    twin verbatim (nested-WITH derived tables), so the composite stays
    bit-exact by construction."""
    from .dedup import EXACT_DEDUP_SQL, PARAGRAPH_DEDUP_SQL
    from .textstats import LANG_ID_SQL

    para = PARAGRAPH_DEDUP_SQL.replace("FROM documents", "FROM kept_docs")
    return f"""
WITH lang AS (SELECT * FROM ({LANG_ID_SQL})),
qual AS (SELECT * FROM ({quality_filter_sql()})),
decon AS (SELECT * FROM ({decontaminate_sql(n, bench_mod)})),
fp AS (SELECT * FROM ({EXACT_DEDUP_SQL})),
verdict AS (
  SELECT d.doc_id,
    CASE WHEN d.doc_id % {bench_mod} = 0 THEN 'benchmark'
         WHEN f.canonical_id <> d.doc_id THEN 'exact_dup'
         WHEN NOT l.is_english THEN 'lang'
         WHEN q.reason <> '' THEN 'quality'
         WHEN coalesce(c.contaminated, FALSE) THEN 'contaminated'
         ELSE '' END AS drop_stage
  FROM documents d
  JOIN fp f USING (doc_id)
  JOIN lang l USING (doc_id)
  JOIN qual q USING (doc_id)
  LEFT JOIN decon c USING (doc_id)
),
kept_docs AS (
  SELECT d.doc_id, d.text FROM documents d JOIN verdict v USING (doc_id)
  WHERE v.drop_stage = ''
),
rebuilt AS (SELECT * FROM ({para})),
red AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(regexp_replace(text,
        '{EMAIL_RE}', '<EMAIL>', 'g'),
        '{IP_RE}', '<IP>', 'g'),
        '{PHONE_RE}', '<PHONE>', 'g') AS curated_text,
    n_dropped
  FROM rebuilt
)
SELECT v.doc_id,
       v.drop_stage = '' AS kept,
       v.drop_stage,
       coalesce(r.curated_text, '') AS curated_text,
       CAST(coalesce(r.n_dropped, 0) AS BIGINT) AS n_paras_dropped
FROM verdict v LEFT JOIN red r USING (doc_id)
""".strip()


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169; public method): score every raw doc by the hashed-
# unigram log importance ratio between a TARGET-domain sample and the raw
# corpus, then resample with seeded Gumbel-top-k.
# ---------------------------------------------------------------------------

def dsir_importance_weights(
    raw_docs: ray.data.Dataset,
    target_docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-doc mean hashed-unigram log importance ratio
    ``mean_tok [ln p_target(tok) − ln p_raw(tok)]`` — positive when a doc
    looks more like the target sample than like the raw corpus.  Both
    unigram LMs are the range-sharded term-frequency tables from
    stages/tokendf.py (the vocabulary never lands on the driver); the
    scoring pass is one stateless map with two searchsorted lookups per
    token.  Mean (not sum) over tokens so variable-length web docs are
    comparable — the paper scores fixed-length chunks; declared
    adaptation.  Smoothing: a token absent from a table counts 1 (the
    lookup floor — add-one-style, deterministic).  Output (doc_id,
    n_tokens, logweight; NaN for empty docs)."""
    import ray as _ray

    from .normalize import normalize_stage
    from .shuffleops import _broadcast_get
    from .tokendf import build_token_df, resolve_view, token_hashes

    raw_norm = normalize_stage(raw_docs.select_columns([id_col, text_col])) \
        .select_columns([id_col, "norm_text"])
    tgt_norm = normalize_stage(
        target_docs.select_columns([id_col, text_col])) \
        .select_columns([id_col, "norm_text"])
    tf_raw = build_token_df(raw_norm, min_df=1, distinct_per_doc=False)
    tf_tgt = build_token_df(tgt_norm, min_df=1, distinct_per_doc=False)

    @_ray.remote
    def _total(*shards) -> int:
        return int(sum(int(s[1].sum()) for s in shards))

    totals_ref = (_total.remote(*tf_raw.refs), _total.remote(*tf_tgt.refs))
    handles_ref = _ray.put((tf_raw, tf_tgt))

    def _score(t: pa.Table) -> pa.Table:
        raw_view = resolve_view(_broadcast_get(handles_ref)[0])
        tgt_view = resolve_view(_broadcast_get(handles_ref)[1])
        tot_raw = float(_broadcast_get(totals_ref[0]))
        tot_tgt = float(_broadcast_get(totals_ref[1]))
        norms = t.column("norm_text").to_pylist()
        n = len(norms)
        tok_lists = [(s or "").split() for s in norms]
        lens = np.fromiter((len(x) for x in tok_lists), np.int64, count=n)
        out = np.full(n, np.nan)
        m = int(lens.sum())
        if m:
            from itertools import chain

            th = token_hashes(list(chain.from_iterable(tok_lists)))
            lr = (np.log(tgt_view.lookup_hashes(th) / tot_tgt)
                  - np.log(raw_view.lookup_hashes(th) / tot_raw))
            doc = np.repeat(np.arange(n, dtype=np.int64), lens)
            sums = np.zeros(n, np.float64)
            np.add.at(sums, doc, lr)
            with np.errstate(invalid="ignore"):
                out = np.where(lens > 0, sums / np.maximum(lens, 1), np.nan)
        return pa.table({
            "doc_id": t.column(id_col),
            "n_tokens": pa.array(lens, pa.int64()),
            "logweight": pa.array(np.round(out, 9), pa.float64(),
                                  from_pandas=True),
        })

    return raw_norm.map_batches(_score, batch_format="pyarrow")


def dsir_select(
    raw_docs: ray.data.Dataset,
    target_docs: ray.data.Dataset,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 17,
    gumbel_scale: float = 1.0,
) -> ray.data.Dataset:
    """Gumbel-top-k importance resampling (the DSIR selection step):
    selection key = logweight + scale·Gumbel(seeded by doc_id) — sampling
    ∝ exp(logweight/scale) WITHOUT normalizing constants or a second
    pass; ``gumbel_scale=0`` degrades to deterministic top-k.  The noise
    is a pure function of (doc_id, seed) so the draw is deterministic and
    partition-invariant.  One global sort → limit(k); output (doc_id,
    n_tokens, logweight) of the selected docs."""
    from ..functions.hashing import splitmix64

    w = dsir_importance_weights(raw_docs, target_docs, text_col=text_col,
                                id_col=id_col)

    def _key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if gumbel_scale > 0:
            u = (splitmix64(df[id_col].to_numpy(np.int64), seed=seed)
                 .astype(np.float64) + 0.5) / 2.0 ** 64
            df["__key"] = df["logweight"] + gumbel_scale * -np.log(-np.log(u))
        else:
            df["__key"] = df["logweight"]
        return df

    def _prune(df: pd.DataFrame) -> pd.DataFrame:
        # map-side top-k prune (mixed order: key desc, id asc) — the final
        # sort then ranges over ≤ n_blocks·k rows, not the whole corpus
        return df.sort_values(["__key", id_col],
                              ascending=[False, True]).head(k)

    keyed = w.map_batches(_key, batch_format="pandas") \
        .map_batches(_prune, batch_format="pandas")
    return keyed.sort(["__key", id_col], descending=[True, False]) \
        .limit(k).drop_columns(["__key"])


# ---------------------------------------------------------------------------
# model-based quality filter (public method: the GPT-3 paper's trained
# quality classifier over reference-vs-corpus documents, Brown et al. 2020
# Appendix A; same family as FineWeb-Edu's classifier gate).  Train on the
# driver over a BOUNDED seeded sample — the reference's PairwiseModeler
# train-driver / infer-distributed split (/root/reference/s2and/model.py:
# 87-163) — then score every doc in an actor-pool map_batches.
# ---------------------------------------------------------------------------

def _seeded_doc_sample(ds: ray.data.Dataset, rate: float, seed: int,
                       id_col: str) -> ray.data.Dataset:
    """Deterministic Bernoulli doc sample on splitmix64(id) — partition-
    invariant, no shuffle."""
    from ..functions.hashing import splitmix64

    if rate >= 1.0:
        return ds

    def _keep(df: pd.DataFrame) -> pd.DataFrame:
        u = (splitmix64(df[id_col].to_numpy(np.int64), seed=seed)
             .astype(np.float64) + 0.5) / 2.0 ** 64
        return df[u < rate]

    return ds.map_batches(_keep, batch_format="pandas")


def train_quality_classifier(
    corpus: ray.data.Dataset,
    reference: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
    max_train_per_side: int = 10_000,
    seed: int = 31,
):
    """Fit a logistic quality classifier: reference docs (label 1) vs raw
    corpus docs (label 0) over hashed-TF-IDF features.  Each side is
    bounded by a seeded Bernoulli hash sample at rate max/n (bounded in
    EXPECTATION — binomial fluctuation can overshoot), then hard-capped at
    ``max_train_per_side`` rows after the pull (count once per side to
    pick the rate — bounded driver state is the model (dim+1 doubles),
    never the corpus).  Returns the fitted LogisticScorer (weights over
    the ``dim`` hashed buckets)."""
    from ..functions.textnorm import normalize_text_array
    from ..state.model import LogisticScorer
    from .similarity import hashed_tf_matrix

    def _side_matrix(ds: ray.data.Dataset, side_seed: int) -> np.ndarray:
        n = ds.count()
        rate = min(1.0, max_train_per_side / max(n, 1))
        sub = _seeded_doc_sample(ds.select_columns([id_col, text_col]),
                                 rate, side_seed, id_col)

        def _vec(t: pa.Table) -> pa.Table:
            norm = normalize_text_array(t.column(text_col)).to_pylist()
            mat = hashed_tf_matrix(norm, dim)
            return pa.table({"v": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), pa.float64()), dim)})

        df = sub.map_batches(_vec, batch_format="pyarrow").to_pandas()
        df = df.head(max_train_per_side)   # hard cap: Bernoulli can overshoot
        if not len(df):
            return np.zeros((0, dim), np.float64)
        return np.stack(df["v"].to_numpy()).astype(np.float64)

    Xn = _side_matrix(corpus, seed)
    Xp = _side_matrix(reference, seed + 1)
    X = np.concatenate([Xn, Xp])
    y = np.concatenate([np.zeros(len(Xn)), np.ones(len(Xp))])
    return LogisticScorer(seed=seed).fit(X, y)


def _quality_p_batch(t: pa.Table, w: np.ndarray, b: float, dim: int,
                     text_col: str) -> np.ndarray:
    """Per-batch classifier probability — the ONE scoring body shared by
    quality_model_scores and quality_model_gate (normalize → hashed
    scatter → GEMV → sigmoid), so the gate and the reported q_score can
    never diverge."""
    from ..functions.textnorm import normalize_text_array
    from .similarity import hashed_tf_matrix

    norm = normalize_text_array(t.column(text_col)).to_pylist()
    mat = hashed_tf_matrix(norm, dim)
    return 1.0 / (1.0 + np.exp(-(mat @ w + b)))


def quality_model_scores(
    docs: ray.data.Dataset,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
) -> ray.data.Dataset:
    """Distributed inference: (doc_id, q_score) with q_score = the
    classifier's P(reference | doc).  The model broadcasts once
    (``ray.put`` in the caller-visible ref); each batch is one hashed
    scatter + one GEMV."""
    ref = ray.put((np.asarray(model.w, np.float64), float(model.b)))

    class _Score:
        def __init__(self):
            from .shuffleops import _broadcast_get

            self.w, self.b = _broadcast_get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            p = _quality_p_batch(t, self.w, self.b, dim, text_col)
            return pa.table({
                id_col: t.column(id_col),
                "q_score": pa.array(p, pa.float64()),
            })

    return docs.select_columns([id_col, text_col]).map_batches(
        _Score, batch_format="pyarrow", concurrency=(1, 8))


def quality_model_gate(
    docs: ray.data.Dataset,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
    pareto_alpha: float = 9.0,
    seed: int = 37,
) -> ray.data.Dataset:
    """GPT-3-style stochastic keep rule, made DETERMINISTIC: keep doc iff
    ``pareto_sample(alpha, u(doc_id)) > 1 - q_score`` where u comes from
    splitmix64(doc_id) — the paper's np.random.pareto re-seeded per doc so
    the gate is partition/retry-invariant.  High-scoring docs are always
    kept; low scorers survive with heavy-tailed probability (keeps corpus
    diversity instead of a hard threshold).  Output: the surviving docs'
    (doc_id, text, q_score)."""
    from ..functions.hashing import splitmix64

    ref = ray.put((np.asarray(model.w, np.float64), float(model.b)))

    class _Gate:
        def __init__(self):
            from .shuffleops import _broadcast_get

            self.w, self.b = _broadcast_get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            p = _quality_p_batch(t, self.w, self.b, dim, text_col)
            ids = t.column(id_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            u = (splitmix64(ids, seed=seed).astype(np.float64) + 0.5) \
                / 2.0 ** 64
            # inverse-CDF Pareto (Lomax) sample: X = (1-u)^(-1/alpha) - 1
            x = np.power(1.0 - u, -1.0 / pareto_alpha) - 1.0
            keep = x > (1.0 - p)
            out = t.filter(pa.array(keep))
            return out.append_column(
                "q_score", pa.array(p[keep], pa.float64()))

    return docs.select_columns([id_col, text_col]).map_batches(
        _Gate, batch_format="pyarrow", concurrency=(1, 8))
