"""Deterministic constraint chain — per-pair distance overrides.

Reference analog: ``get_constraint`` (/root/reference/s2and/data.py:776-891)
with its strict precedence order (cluster seeds > hard identity rules >
language rule > soft compatibility), and the require/disallow sentinels
(require → distance 0, disallow → distance 1e4,
/root/reference/s2and/consts.py:41-43).  The constraint column overrides the
model score downstream (reference: /root/reference/s2and/model.py:277-298).

Web-graft precedence (documented; the F1 gate is won or lost here):
1. seed require  → constraint 0.0
2. seed disallow → constraint DISALLOW
3. same canonical url → require (trusted-id rule; the "ORCID low_value"
   rule the reference wishes for in /root/reference/s2and/data.py:796-797 —
   two crawls of one canonical page are the same entity by construction)
4. exact same normalized text and same language → require (trivial dup)
5. alias (known-compatible leading tokens) → require
6. leading tokens not prefixes of each other and not a known alias →
   DISALLOW (reference name-prefix rule, /root/reference/s2and/data.py:861-869)
7. middle-token initials both present and disjoint → DISALLOW
   (middle-initial conflict analog, /root/reference/s2and/data.py:870-889)
8. language mismatch → DISALLOW (reliable-language rule analog,
   /root/reference/s2and/data.py:855-859)
otherwise NULL (model decides).

Rules 3/6/7 are opt-in flags (default off): the default chain predates them
and every oracle-twinned query pins the default behavior; the full chain is
exercised (with its own DuckDB twin) by ``er_constraint_chain``.

Seed pairs are a small side input — broadcast via ``ray.put`` once and read
in ``__init__`` of the actor pool (never re-shipped per batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .features import FTOK_LEN

DISALLOW = 1.0e4
REQUIRE = 0.0


def canonical_alias_set(pairs) -> frozenset:
    """Canonicalize an alias side-input: unordered token pairs, truncated to
    ``FTOK_LEN`` chars.  The truncation is part of the alias-rule contract:
    the fast featurizer path stores first tokens as fixed-width FTOK_LEN
    signatures (fastfeatures.py), so the join path truncates identically to
    keep the two paths bit-identical."""
    return frozenset(
        tuple(sorted((str(a)[:FTOK_LEN], str(b)[:FTOK_LEN])))
        for a, b in (pairs or ()))


def first_token_array(norms: np.ndarray) -> np.ndarray:
    """Leading token of each normalized text, truncated to FTOK_LEN (see
    ``canonical_alias_set`` for why)."""
    out = np.empty(len(norms), dtype=object)
    for i, s in enumerate(norms):
        out[i] = s.split(" ", 1)[0][:FTOK_LEN] if s else ""
    return out


# Middle-token window (tokens 2..4, 1-based inclusive — Python [1:4]).  The
# reference's middle-initial rule reads the author's middle names
# (/root/reference/s2and/data.py:870-889); the webtext analog reads the
# document's early non-leading tokens, whose initials are as stable across
# near-duplicate crawls as middle initials are across citations.
MIDTOK_LO, MIDTOK_HI = 1, 4

# DuckDB twins (format with the column name).  Both sides MUST canonicalize
# identically — these templates are the contract.
MIDTOK_INI_SQL = (
    "list_distinct(list_transform("
    "string_split({n}, ' ')[{lo}:{hi}], t -> substr(t, 1, 1)))"
).format(n="{n}", lo=MIDTOK_LO + 1, hi=MIDTOK_HI)

_URL_STRIPPED = ("split_part(split_part(regexp_replace({u}, "
                 "'^[a-z][a-z0-9+.-]*://', ''), '?', 1), '#', 1)")
CANON_URL_SQL = (
    f"rtrim(CASE WHEN starts_with({_URL_STRIPPED}, 'www.') "
    f"THEN substr({_URL_STRIPPED}, 5) ELSE {_URL_STRIPPED} END, '/')"
)


def midtoken_initials(norms: np.ndarray) -> list[frozenset]:
    """Per row: the distinct initial characters of tokens MIDTOK_LO..MIDTOK_HI
    (0-based slice) of the normalized text."""
    out = []
    for s in norms:
        toks = s.split(" ")[MIDTOK_LO:MIDTOK_HI] if s else []
        out.append(frozenset(t[0] for t in toks if t))
    return out


def canonical_url_array(urls) -> np.ndarray:
    """Canonical form of a url: scheme, query string, fragment, leading
    ``www.`` and trailing slashes stripped.  Twin: ``CANON_URL_SQL`` (the
    strip order — scheme, '?', '#', www, '/' — is identical on both sides)."""
    import re

    scheme_re = re.compile(r"^[a-z][a-z0-9+.\-]*://")
    out = np.empty(len(urls), dtype=object)
    for i, u in enumerate(urls):
        s = str(u) if u is not None else ""
        s = scheme_re.sub("", s, count=1)
        q = s.find("?")
        if q >= 0:
            s = s[:q]
        q = s.find("#")
        if q >= 0:
            s = s[:q]
        if s.startswith("www."):
            s = s[4:]
        out[i] = s.rstrip("/")
    return out


def constraint_stage(ds: ray.data.Dataset, seeds: dict | None = None,
                     lang_rule: bool = True,
                     exact_text_rule: bool = True,
                     alias_pairs=None,
                     prefix_rule: bool = False,
                     midtoken_rule: bool = False,
                     url_rule: bool = False) -> ray.data.Dataset:
    """Stateless vectorized constraint stage.  Seeds and the alias set are
    broadcast via ``ray.put`` once; each task reads them zero-copy from the
    local object store (both are tiny by construction).

    Precedence (highest wins; applied lowest-first so later writes win):
    seeds > canonical-url (require) > exact-text (require) > alias (require)
    > prefix (disallow) > middle-token initials (disallow) > language
    (disallow).  See the module docstring for the reference analog of each
    rule.  ``url_rule=True`` requires ``url1``/``url2`` columns on the
    pair rows."""
    seeds_ref = ray.put(seeds or {})
    alias_ref = ray.put(canonical_alias_set(alias_pairs))

    def _constraints(batch: pa.Table) -> pa.Table:
        seed_map = ray.get(seeds_ref)
        aliases = ray.get(alias_ref)
        n = batch.num_rows
        out = np.full(n, np.nan)
        lang1 = batch.column("lang1").to_numpy(zero_copy_only=False)
        lang2 = batch.column("lang2").to_numpy(zero_copy_only=False)
        norm1 = batch.column("norm_text1").to_numpy(zero_copy_only=False)
        norm2 = batch.column("norm_text2").to_numpy(zero_copy_only=False)
        lang_eq = lang1 == lang2
        if lang_rule:
            out[~lang_eq] = DISALLOW
        if midtoken_rule:
            ini1 = midtoken_initials(norm1)
            ini2 = midtoken_initials(norm2)
            conflict = np.fromiter(
                (bool(a) and bool(b) and not (a & b)
                 for a, b in zip(ini1, ini2)),
                dtype=bool, count=n)
            out[conflict] = DISALLOW
        need_ftok = prefix_rule or bool(aliases)
        if need_ftok:
            f1 = first_token_array(norm1)
            f2 = first_token_array(norm2)
        if prefix_rule:
            incompat = np.fromiter(
                (a != "" and b != ""
                 and not (a.startswith(b) or b.startswith(a))
                 and tuple(sorted((a, b))) not in aliases
                 for a, b in zip(f1, f2)),
                dtype=bool, count=n)
            out[incompat] = DISALLOW
        if aliases:
            is_alias = np.fromiter(
                (tuple(sorted((a, b))) in aliases for a, b in zip(f1, f2)),
                dtype=bool, count=n)
            out[is_alias] = REQUIRE
        if exact_text_rule:
            exact = (norm1 == norm2) & (norm1 != "") & lang_eq
            out[exact] = REQUIRE
        if url_rule:
            cu1 = canonical_url_array(
                batch.column("url1").to_numpy(zero_copy_only=False))
            cu2 = canonical_url_array(
                batch.column("url2").to_numpy(zero_copy_only=False))
            same = (cu1 == cu2) & (cu1 != "")
            out[same] = REQUIRE
        if seed_map:
            id1 = batch.column("id1").to_pylist()
            id2 = batch.column("id2").to_pylist()
            for i in range(n):
                s = seed_map.get((id1[i], id2[i]))
                if s == "require":
                    out[i] = REQUIRE
                elif s == "disallow":
                    out[i] = DISALLOW
        return batch.append_column(
            "constraint", pa.array(out, pa.float64(), from_pandas=True))

    return ds.map_batches(_constraints, batch_format="pyarrow", batch_size=None)


def apply_constraints_to_distance(batch: pa.Table, score_col: str = "score",
                                  out_col: str = "distance") -> pa.Table:
    """distance = 1 − score, overridden by the constraint column when present
    (reference override point: /root/reference/s2and/model.py:277-298)."""
    score = batch.column(score_col).to_numpy(zero_copy_only=False).astype(np.float64)
    dist = 1.0 - score
    if "constraint" in batch.column_names:
        cons = batch.column("constraint").to_numpy(zero_copy_only=False).astype(np.float64)
        mask = ~np.isnan(cons)
        dist = np.where(mask, cons, dist)
    return batch.append_column(out_col, pa.array(dist, pa.float64()))
