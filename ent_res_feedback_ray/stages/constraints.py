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
3. exact same normalized text and same language → require (trivial dup)
4. language mismatch → DISALLOW (reliable-language rule analog)
otherwise NULL (model decides).

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


def constraint_stage(ds: ray.data.Dataset, seeds: dict | None = None,
                     lang_rule: bool = True,
                     exact_text_rule: bool = True,
                     alias_pairs=None) -> ray.data.Dataset:
    """Stateless vectorized constraint stage.  Seeds and the alias set are
    broadcast via ``ray.put`` once; each task reads them zero-copy from the
    local object store (both are tiny by construction).

    Precedence (highest wins; applied lowest-first so later writes win):
    seeds > exact-text > alias (known-compatible leading tokens → require)
    > language."""
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
        if aliases:
            f1 = first_token_array(norm1)
            f2 = first_token_array(norm2)
            is_alias = np.fromiter(
                (tuple(sorted((a, b))) in aliases for a, b in zip(f1, f2)),
                dtype=bool, count=n)
            out[is_alias] = REQUIRE
        if exact_text_rule:
            exact = (norm1 == norm2) & (norm1 != "") & lang_eq
            out[exact] = REQUIRE
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
