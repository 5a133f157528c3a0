"""Connected components: driver union-find (small edge sets) and distributed
min-label propagation to fixpoint (the scale path).

Reference analog: transitive clustering is per-block HAC in the reference
(/root/reference/s2and/model.py:456-531); the global transitive-closure
clustering over thresholded score edges is the north_star addition
(SURVEY.md §7.2 step 6b): iterative hash-partitioned label propagation —
repeat  label(v) ← min(label(v), min_{u∈N(v)} label(u))  until fixpoint.

Distributed implementation is join-free: each round is two groupby shuffles
over a tagged union (a cogroup), so it needs nothing beyond Ray Data's
groupby/map_groups and scales with the shuffle, not with driver RAM.
Convergence is detected by the (strictly decreasing, integer) global label
sum — one cheap aggregate per round, no change-count join.

SQL oracle twin: a recursive CTE computing min reachable id per node
(see pipelines/er.py) — min-label propagation converges to exactly the
per-component minimum id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


# --------------------------------------------------------------------------
# Driver-side union-find (used when the candidate edge set is provably small)
# --------------------------------------------------------------------------

def unionfind_numpy(src: np.ndarray, dst: np.ndarray,
                    nodes: np.ndarray | None = None) -> dict[int, int]:
    """Vectorized connected components; returns {node: min_id_of_component}.

    Index-space min-label propagation with pointer jumping — O((E+V)·log V)
    numpy passes, no per-edge Python.  ``nodes`` is sorted by np.unique, so
    the minimum *index* in a component corresponds to the minimum node id."""
    if nodes is None:
        nodes = np.unique(np.concatenate([src, dst])) if len(src) else np.empty(0, np.int64)
    node_arr, label_arr = unionfind_labels(src, dst, nodes)
    return {int(v): int(r) for v, r in zip(node_arr, label_arr)}


def unionfind_labels(src: np.ndarray, dst: np.ndarray,
                     nodes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Array-shaped variant of ``unionfind_numpy`` (no Python dict) —
    returns (sorted nodes, component-min label per node)."""
    nodes = np.unique(np.asarray(nodes, dtype=np.int64))
    n = len(nodes)
    if n == 0:
        return nodes, nodes.copy()
    labels = np.arange(n, dtype=np.int64)
    if len(src):
        si = np.searchsorted(nodes, np.asarray(src, dtype=np.int64))
        di = np.searchsorted(nodes, np.asarray(dst, dtype=np.int64))
        while True:
            m = np.minimum(labels[si], labels[di])
            before = labels.sum()
            np.minimum.at(labels, si, m)
            np.minimum.at(labels, di, m)
            labels = np.minimum(labels, labels[labels])
            labels = labels[labels]
            if labels.sum() == before:
                break
    return nodes, nodes[labels]


# --------------------------------------------------------------------------
# Distributed min-label propagation
# --------------------------------------------------------------------------

def _propagate_round(labels: ray.data.Dataset, sym_edges: ray.data.Dataset,
                     num_buckets: int = 32) -> ray.data.Dataset:
    """One round: label(v) ← min(label(v), min over neighbors' labels).

    Two bucketed shuffles (see stages/shuffleops.py — per-node Python would
    be ruinous at web scale): a cogroup that joins each edge's src label
    (vectorized pandas merge per bucket), then a min-reduce per dst node."""
    from ..stages.shuffleops import bucketed_group_apply, bucketed_min_label

    lab_tagged = labels.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["node"], "val": df["label"], "is_label": True}
        ),
        batch_format="pandas",
    )
    edge_tagged = sym_edges.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["src"], "val": df["dst"], "is_label": False}
        ),
        batch_format="pandas",
    )

    def emit_messages(part: pd.DataFrame) -> pd.DataFrame:
        # per bucket: label table ⋈ edge table on node (C-speed merge)
        lab = (part.loc[part["is_label"], ["node", "val"]]
               .groupby("node", as_index=False).min()
               .rename(columns={"val": "label"}))
        edges = part.loc[~part["is_label"], ["node", "val"]]
        joined = edges.merge(lab, on="node", how="inner")
        return pd.concat(
            [
                pd.DataFrame({"node": joined["val"].to_numpy(np.int64),
                              "cand": joined["label"].to_numpy(np.int64)}),
                pd.DataFrame({"node": lab["node"].to_numpy(np.int64),
                              "cand": lab["label"].to_numpy(np.int64)}),
            ],
            ignore_index=True,
        )

    messages = bucketed_group_apply(
        lab_tagged.union(edge_tagged), "node", emit_messages, num_buckets)
    new_labels = bucketed_min_label(messages, "node", "cand", num_buckets)
    return new_labels.map_batches(
        lambda df: df.rename(columns={"cand": "label"}), batch_format="pandas"
    )


def connected_components_distributed(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset | None = None,
    max_rounds: int = 50,
    checkpoint_dir: str | None = None,
) -> ray.data.Dataset:
    """Edges (src:int64, dst:int64) → (node:int64, label:int64 = min id of
    component).  Labels materialize each round (that IS the round state /
    checkpoint); everything else streams through two groupby shuffles."""
    sym = edges.map_batches(
        lambda df: pd.DataFrame(
            {
                "src": pd.concat([df["src"], df["dst"]], ignore_index=True),
                "dst": pd.concat([df["dst"], df["src"]], ignore_index=True),
            }
        ),
        batch_format="pandas",
    ).materialize()

    if nodes is None:
        from ..stages.shuffleops import distinct_values

        node_ds = distinct_values(
            sym.map_batches(
                lambda df: pd.DataFrame({"node": df["src"]}),
                batch_format="pandas"),
            "node",
        )
    else:
        node_ds = nodes
    labels = node_ds.map_batches(
        lambda df: pd.DataFrame({"node": df["node"], "label": df["node"]}),
        batch_format="pandas",
    ).materialize()

    prev_sum = labels.sum("label")
    for rnd in range(max_rounds):
        labels = _propagate_round(labels, sym).materialize()
        cur_sum = labels.sum("label")
        if checkpoint_dir is not None:
            labels.write_parquet(f"{checkpoint_dir}/cc_round={rnd}")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def connected_components(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset | None = None,
    driver_threshold: int = 2_000_000,
    max_rounds: int = 50,
) -> ray.data.Dataset:
    """Auto path: small edge sets collapse on the driver (provably bounded
    pull), large ones run the distributed fixpoint."""
    import os as _os
    import time as _time

    _prof = bool(_os.environ.get("GRAFT_ER_PROFILE"))
    _t = _time.perf_counter()

    def _tick(label):
        nonlocal _t
        if _prof:
            now = _time.perf_counter()
            print(f"CCPROF {label} {now - _t:.2f}", flush=True)
            _t = now

    # GRAFT_CC_DRIVER_THRESHOLD=0 forces the distributed fixpoint (used by
    # the scaling protocol to evidence that the >2M-edge path also scales)
    driver_threshold = int(_os.environ.get("GRAFT_CC_DRIVER_THRESHOLD",
                                           driver_threshold))
    edges = edges.materialize()  # one execution serves count + pull/propagate
    n_edges = edges.count()
    _tick("edges_materialize")
    if n_edges <= driver_threshold:
        src_l, dst_l = [], []
        for batch in edges.iter_batches(batch_format="pandas", batch_size=262_144):
            src_l.append(batch["src"].to_numpy(dtype=np.int64))
            dst_l.append(batch["dst"].to_numpy(dtype=np.int64))
        src = np.concatenate(src_l) if src_l else np.empty(0, np.int64)
        dst = np.concatenate(dst_l) if dst_l else np.empty(0, np.int64)
        _tick(f"edge_pull({n_edges})")
        # union-find over EDGE ENDPOINTS only (bounded by 2×threshold) —
        # the O(docs) node universe never reaches the driver: singletons
        # keep label = own id, filled DISTRIBUTED by mapping the nodes
        # dataset through the broadcast endpoint→label table.  (Callers pass
        # nodes ⊇ endpoints — every edge comes from a pair of known docs.)
        endpoints = (np.unique(np.concatenate([src, dst])) if len(src)
                     else np.empty(0, np.int64))
        node_arr, label_arr = unionfind_labels(src, dst, endpoints)
        _tick(f"unionfind({len(endpoints)})")
        if nodes is None:
            return ray.data.from_pandas(
                pd.DataFrame({"node": node_arr, "label": label_arr}))
        import ray as _ray

        from ..stages.shuffleops import _broadcast_get

        map_ref = _ray.put((node_arr, label_arr))

        def _fill(df: pd.DataFrame) -> pd.DataFrame:
            na, la = _broadcast_get(map_ref)
            nv = df["node"].to_numpy(np.int64)
            if len(na):
                pos = np.minimum(np.searchsorted(na, nv), len(na) - 1)
                lab = np.where(na[pos] == nv, la[pos], nv)
            else:
                lab = nv
            return pd.DataFrame({"node": nv, "label": lab})

        out = nodes.map_batches(_fill, batch_format="pandas")
        _tick("singleton_fill_launch")
        return out
    return connected_components_distributed(edges, nodes=nodes, max_rounds=max_rounds)
