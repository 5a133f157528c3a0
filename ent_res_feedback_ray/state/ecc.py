"""Existential cluster constraints (ECC) — the reference's namesake
"exists a point with feature f in this cluster" constraint type
(/root/reference/ecc/ecc.py:30-377; constraint generation 615-866),
re-expressed for the Ray dataflow:

- an :class:`ExistsConstraint` says *the cluster containing* ``anchor``
  *must contain at least one doc whose feature* ``kind`` *equals*
  ``value`` (graft feature kinds: ``lang``, ``host``);
- constraints are synthesized from the gold/pred cluster diff (a split
  gold cluster yields "anchor's cluster must contain a doc with the other
  fragment's feature") — reference picks its constraint from the same
  diff;
- each round, violated constraints are COMPILED to pairwise require seeds:
  the best-scoring candidate pair joining the anchor's cluster to a
  feature-carrying doc (the reference instead re-solves the block's SDP —
  that solver shape doesn't distribute; a per-round greedy realization
  enforced through the seed mechanism does, and the loop re-checks and
  re-compiles every round, so the EXISTENTIAL semantics — any qualifying
  doc may satisfy it — are preserved);
- the bounded constraint list is checkpointed with the round state
  (reference dumps constraints for replay, ecc/ecc.py:1085-1100).

Scale notes: constraint lists are bounded (k per round); satisfaction
checks and seed compilation run as dataflow filters over assignments /
scored pairs with only per-constraint scalars on the driver.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import pandas as pd
import ray
import ray.data


class ExistsConstraint(NamedTuple):
    anchor: int   # doc id whose cluster carries the obligation
    kind: str     # feature kind: "lang" | "host"
    value: str    # required feature value


def url_host(url: str) -> str:
    """Host component of a url (the graft's second doc feature)."""
    try:
        rest = url.split("://", 1)[1]
        return rest.split("/", 1)[0]
    except (IndexError, AttributeError):
        return ""


def doc_features(pages_ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, lang, host) — the per-doc feature table the constraints
    range over; stateless map, no shuffle."""
    def _f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "lang": df["lang"],
            "host": [url_host(u) for u in df["url"]],
        })

    return pages_ds.map_batches(_f, batch_format="pandas")


def _anchor_clusters(assignments: ray.data.Dataset,
                     anchors: set[int]) -> dict[int, int]:
    """anchor doc id → cluster label (bounded: |anchors| rows pulled)."""
    ref = ray.put(anchors)

    def _pick(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.shuffleops import _broadcast_get

        a = _broadcast_get(ref)
        return df[df["node"].isin(a)]

    got = assignments.map_batches(_pick, batch_format="pandas").to_pandas()
    return dict(zip(got["node"].astype(int), got["label"].astype(int)))


def find_violations(assignments: ray.data.Dataset,
                    feats: ray.data.Dataset,
                    constraints: list[ExistsConstraint]) -> list[ExistsConstraint]:
    """Constraints whose anchor cluster contains NO doc with the required
    feature.  One dataflow pass: members of the (bounded) anchor clusters
    are joined with their features; only per-cluster feature presence
    reaches the driver."""
    if not constraints:
        return []
    a2c = _anchor_clusters(assignments, {c.anchor for c in constraints})
    want_clusters = set(a2c.values())
    cref = ray.put(want_clusters)

    def _members(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.shuffleops import _broadcast_get

        cl = _broadcast_get(cref)
        sub = df[df["label"].isin(cl)]
        return pd.DataFrame({"doc_id": sub["node"], "cluster": sub["label"]})

    members = assignments.map_batches(_members, batch_format="pandas")
    j = members.join(feats, "inner", num_partitions=4, on=("doc_id",))
    # distinct (cluster, lang) + (cluster, host) — bounded by cluster sizes
    present = j.map_batches(
        lambda df: pd.concat([
            pd.DataFrame({"cluster": df["cluster"], "kind": "lang",
                          "value": df["lang"]}),
            pd.DataFrame({"cluster": df["cluster"], "kind": "host",
                          "value": df["host"]}),
        ], ignore_index=True).drop_duplicates(),
        batch_format="pandas").to_pandas().drop_duplicates()
    have = set(zip(present["cluster"].astype(int), present["kind"],
                   present["value"]))
    out = []
    for c in constraints:
        cl = a2c.get(c.anchor)
        if cl is None or (cl, c.kind, c.value) not in have:
            out.append(c)
    return out


def compile_to_seeds(scored: ray.data.Dataset,
                     assignments: ray.data.Dataset,
                     feats: ray.data.Dataset,
                     violations: list[ExistsConstraint]) -> dict:
    """Each violated exists-constraint → ONE pairwise require seed: the
    best-scoring candidate pair joining the anchor's cluster to any doc
    carrying the required feature.  If no scored candidate exists, fall
    back to pairing the anchor with the minimum-id qualifying doc (the
    seed-union in resolve_pages guarantees it gets scored next round)."""
    if not violations:
        return {}
    a2c = _anchor_clusters(assignments, {c.anchor for c in violations})
    seeds: dict = {}
    for c in violations:
        cl = a2c.get(c.anchor)
        if cl is None:
            continue
        # member ids: bounded pull (one cluster's size)
        member_ids = set(assignments.map_batches(
            lambda df, l=cl: df.loc[df["label"] == l, ["node"]],
            batch_format="pandas").to_pandas()["node"].astype(int))
        mref = ray.put(member_ids)

        def _cand(t: "pa.Table") -> "pa.Table":
            # scored candidates with EXACTLY one member side; the other
            # side's feature qualification is resolved by the dataflow
            # join below — the qualifying-id set (e.g. lang="en": half
            # the corpus) NEVER reaches the driver (round-3 verdict #2).
            # Explicitly-typed Arrow output so EMPTY batches keep the
            # join-key schema stable.
            import pyarrow as pa

            from ..stages.shuffleops import _broadcast_get

            m = np.fromiter(_broadcast_get(mref), np.int64)
            id1 = t.column("id1").to_numpy(zero_copy_only=False)
            id2 = t.column("id2").to_numpy(zero_copy_only=False)
            in1m = np.isin(id1, m)
            in2m = np.isin(id2, m)
            keep = in1m ^ in2m
            sc = t.column("score").to_numpy(zero_copy_only=False)[keep]
            i1, i2 = id1[keep], id2[keep]
            other = np.where(in1m[keep], i2, i1)
            return pa.table({
                "id1": pa.array(i1, pa.int64()),
                "id2": pa.array(i2, pa.int64()),
                "score": pa.array(sc, pa.float64()),
                "other": pa.array(other.astype(np.int64), pa.int64()),
            })

        def _qual(t: "pa.Table", k=c.kind, v=c.value) -> "pa.Table":
            import pyarrow as pa
            import pyarrow.compute as pc

            sel = pc.equal(t.column(k), pa.scalar(v))
            ids = t.filter(pc.fill_null(sel, False)).column("doc_id")
            return pa.table({"other": ids.cast(pa.int64())})

        from ..stages.shuffleops import join_on_key

        cand = scored.map_batches(_cand, batch_format="pyarrow")
        qual = feats.map_batches(_qual, batch_format="pyarrow")
        # bucketed cogroup SEMI-join (qual doc ids are unique, so inner ==
        # semi); robust to empty partitions, unlike the Arrow hash join
        best = (join_on_key(cand, qual, "other", num_buckets=8, how="inner",
                            left_fields=[("id1", np.int64),
                                         ("id2", np.int64),
                                         ("score", np.float64),
                                         ("other", np.int64)],
                            right_fields=[("other", np.int64)])
                .sort(["score", "id1", "id2"],
                      descending=[True, False, False]).limit(1).to_pandas())
        if len(best):
            a, b = int(best["id1"].iloc[0]), int(best["id2"].iloc[0])
        else:
            # no scored candidate: pair the anchor with the minimum-id
            # qualifying doc (global top-1 in the dataflow, scalar pull)
            minq = qual.sort("other").limit(1).to_pandas()
            if not len(minq):
                continue
            a, b = sorted((int(c.anchor), int(minq["other"].iloc[0])))
        seeds[(min(a, b), max(a, b))] = "require"
    return seeds


def constraints_to_json(constraints: list[ExistsConstraint]) -> list:
    return [[int(c.anchor), c.kind, c.value] for c in constraints]


def constraints_from_json(rows: list) -> list[ExistsConstraint]:
    return [ExistsConstraint(int(a), k, v) for a, k, v in rows]


def synthesize_exists_constraints(assignments: ray.data.Dataset,
                                  gold: pd.DataFrame,
                                  feats: ray.data.Dataset,
                                  max_new: int = 3) -> list[ExistsConstraint]:
    """From the gold/pred diff: for each gold cluster split across predicted
    clusters, emit "the largest fragment's cluster must contain a doc with
    the second fragment's representative's feature" (lang; host when the
    langs already agree) — the graft analog of the reference's
    exists-feature pick from the same diff (ecc/ecc.py:615-866)."""
    from ..pipelines.feedback import _diff_cells

    cells = _diff_cells(assignments, gold)
    rep_ids: list[tuple[int, int]] = []  # (anchor_rep, other_rep)
    for gold_id, grp in sorted(
            cells.groupby("gold"), key=lambda kv: (-len(kv[1]), kv[0])):
        if len(rep_ids) >= max_new or len(grp) < 2:
            break
        top = grp.sort_values(["n_cell", "rep"],
                              ascending=[False, True]).head(2)
        rep_ids.append((int(top["rep"].iloc[0]), int(top["rep"].iloc[1])))
    if not rep_ids:
        return []
    need = {r for pair in rep_ids for r in pair}
    ref = ray.put(need)

    def _pick(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.shuffleops import _broadcast_get

        m = _broadcast_get(ref)
        return df[df["doc_id"].isin(m)]

    f = feats.map_batches(_pick, batch_format="pandas").to_pandas()
    f = f.set_index(f["doc_id"].astype(int))
    out = []
    for anchor, other in rep_ids:
        if other not in f.index or anchor not in f.index:
            continue
        if f.loc[anchor, "lang"] != f.loc[other, "lang"]:
            out.append(ExistsConstraint(anchor, "lang",
                                        str(f.loc[other, "lang"])))
        else:
            out.append(ExistsConstraint(anchor, "host",
                                        str(f.loc[other, "host"])))
    return out
