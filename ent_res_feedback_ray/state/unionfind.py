"""Connected components: driver union-find (small edge sets) and distributed
min-label propagation to fixpoint (the scale path).

Reference analog: transitive clustering is per-block HAC in the reference
(/root/reference/s2and/model.py:456-531); the global transitive-closure
clustering over thresholded score edges is the north_star addition
(SURVEY.md §7.2 step 6b): iterative hash-partitioned label propagation —
repeat  label(v) ← min(label(v), min_{u∈N(v)} label(u))  until fixpoint.

Distributed implementation: a sharded-plasma delta-stepping fixpoint (see
the section comment below) — the graph is hash-sharded once, each round is
B emit + B reduce numpy tasks exchanging min-combined messages directly
task→task, only edges whose src label changed last round emit, and the
driver reads B changed-count ints per round.  Replaces the former
two-shuffles-per-round Dataset cogroup (measured ~3 s/round of pure
exchange overhead at 640k docs / 32 CPUs vs ~0.1 s/round now).

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
# Distributed min-label propagation — sharded-plasma delta-stepping fixpoint
#
# Why raw Ray tasks here (the Dataset API CAN express a round, but badly):
# an iterative fixpoint re-shuffles the SAME static edge set every round
# through two sort exchanges (measured: ~3 s/round for a 304k-edge /
# 640k-node graph at 32 CPUs — pure exchange overhead, the numpy work is
# milliseconds).  Instead the graph is hash-sharded ONCE into plasma:
#
# - shard b (static): sorted endpoint ids with shard(node)==b, plus the
#   outgoing symmetric edges (src_pos into the sorted ids, dst) — built by
#   a ranged task exchange (the tokendf pattern), driver holds refs only;
# - per round, shard b's EMIT task sends (dst, label) messages only for
#   edges whose src label changed last round (delta/active-frontier:
#   min-label propagation is monotone, an unchanged label can teach its
#   neighbors nothing new), pre-combined to min-per-dst inside the task;
#   messages route directly task→task by shard(dst) via num_returns;
# - shard b's REDUCE task min-folds incoming messages into its label
#   array and returns (new state ref, changed-count scalar): the driver
#   sees B ints per round, nothing else.
#
# Rounds = graph diameter (same as any min-label propagation), but a round
# is now B emit + B reduce numpy tasks over plasma arrays, and late rounds
# carry only the active frontier.  Partitioning assumption: per-shard state
# is O(endpoints / n_shards) and n_shards tracks the cluster CPU count.
# --------------------------------------------------------------------------

def _shard_of_node(v: np.ndarray, n_shards: int) -> np.ndarray:
    """splitmix64-style finalizer then mod — node ids are often sequential,
    a plain mod would stripe components across shards correlated with id."""
    x = np.asarray(v, dtype=np.int64).view(np.uint64).copy()
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return (x % np.uint64(n_shards)).astype(np.int64)


def _edge_cols(block) -> tuple[np.ndarray, np.ndarray]:
    """(src, dst) int64 arrays from an Arrow or pandas edge block; a
    zero-row upstream block can arrive with a column-less schema."""
    names = (block.columns if isinstance(block, pd.DataFrame)
             else block.schema.names)
    if "src" not in names:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if isinstance(block, pd.DataFrame):
        return (block["src"].to_numpy(np.int64),
                block["dst"].to_numpy(np.int64))
    return (block.column("src").to_numpy(zero_copy_only=False).astype(np.int64),
            block.column("dst").to_numpy(zero_copy_only=False).astype(np.int64))


@ray.remote
def _cc_edge_slice(n_shards: int, block):
    """One RAW edge block → n_shards slices of SYMMETRIZED (src, dst)
    pairs, routed by shard(src).  Symmetrization happens here so no
    doubled edge dataset is ever materialized."""
    s0, d0 = _edge_cols(block)
    src = np.concatenate([s0, d0])
    dst = np.concatenate([d0, s0])
    sid = _shard_of_node(src, n_shards)
    order = np.argsort(sid, kind="stable")
    src, dst, sid = src[order], dst[order], sid[order]
    bounds = np.searchsorted(sid, np.arange(n_shards + 1))
    out = tuple((src[bounds[i]:bounds[i + 1]], dst[bounds[i]:bounds[i + 1]])
                for i in range(n_shards))
    return out if n_shards > 1 else out[0]


@ray.remote(num_returns=2)
def _cc_shard_init(*slices):
    """All blocks' slices of one shard → (static graph, initial state).

    static: (sorted endpoint ids, src_pos into them per edge, dst per edge)
    state:  (labels = own ids, changed = all True)"""
    if slices:
        src = np.concatenate([s[0] for s in slices])
        dst = np.concatenate([s[1] for s in slices])
    else:
        src = dst = np.empty(0, np.int64)
    nodes = np.unique(src)  # symmetric ⇒ every endpoint appears as a src
    src_pos = np.searchsorted(nodes, src).astype(np.int64)
    return (nodes, src_pos, dst), (nodes.copy(), np.ones(len(nodes), bool))


@ray.remote
def _cc_emit(n_shards: int, static, state):
    """Messages (dst, candidate label) from edges whose src label changed
    last round, min-combined per dst, routed by shard(dst)."""
    _nodes, src_pos, dst = static
    labels, changed = state
    act = changed[src_pos] if len(src_pos) else np.empty(0, bool)
    d = dst[act]
    cand = labels[src_pos[act]]
    if len(d):
        order = np.lexsort((cand, d))
        d, cand = d[order], cand[order]
        first = np.concatenate([[True], d[1:] != d[:-1]])
        d, cand = d[first], cand[first]  # sorted by (d, cand) ⇒ min per dst
    sid = _shard_of_node(d, n_shards)
    order = np.argsort(sid, kind="stable")
    d, cand, sid = d[order], cand[order], sid[order]
    bounds = np.searchsorted(sid, np.arange(n_shards + 1))
    out = tuple((d[bounds[i]:bounds[i + 1]], cand[bounds[i]:bounds[i + 1]])
                for i in range(n_shards))
    return out if n_shards > 1 else out[0]


@ray.remote(num_returns=2)
def _cc_reduce(static, state, *msgs):
    """Min-fold incoming messages into this shard's labels; returns the new
    (labels, changed) state and the changed COUNT (the only thing the
    driver reads per round)."""
    nodes = static[0]
    old = state[0]
    labels = old.copy()
    for d, cand in msgs:
        if len(d) == 0:
            continue
        pos = np.searchsorted(nodes, d)
        np.minimum.at(labels, pos, cand)
    changed = labels < old
    return (labels, changed), int(changed.sum())


@ray.remote
def _cc_shard_table(static, state):
    import pyarrow as pa

    return pa.table({"node": pa.array(static[0], pa.int64()),
                     "label": pa.array(state[0], pa.int64())})


@ray.remote
def _cc_shard_pair(static, state):
    return static[0], state[0]


def connected_components_distributed(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset | None = None,
    max_rounds: int = 50,
    checkpoint_dir: str | None = None,
    n_shards: int | None = None,
    broadcast_fill_limit: int = 20_000_000,
) -> ray.data.Dataset:
    """Edges (src:int64, dst:int64) → (node:int64, label:int64 = min id of
    component).  See the module-section comment for the sharded-plasma
    delta-stepping design.  ``nodes`` (⊇ endpoints) adds singletons with
    label = own id: below ``broadcast_fill_limit`` endpoints the fill is a
    zero-shuffle sharded-side-table lookup; above it, one bucketed cogroup
    join (O(|nodes|) shuffle, bounded per-task memory)."""
    import os as _os
    import time as _time

    _prof = bool(_os.environ.get("GRAFT_ER_PROFILE"))
    _t = _time.perf_counter()

    def _tick(label):
        nonlocal _t
        if _prof:
            now = _time.perf_counter()
            print(f"CCPROF dist {label} {now - _t:.2f}", flush=True)
            _t = now

    block_refs = edges.materialize().to_arrow_refs()
    if n_shards is None:
        ncpu = max(1, int(ray.cluster_resources().get("CPU", 8)))
        n_shards = max(1, min(len(block_refs) * 2, ncpu, 64)) if block_refs else 1
    B = n_shards

    slice_lists = []
    for ref in block_refs:
        out = _cc_edge_slice.options(num_returns=B).remote(B, ref)
        slice_lists.append([out] if B == 1 else list(out))
    static_refs, state_refs = [], []
    for b in range(B):
        st, sta = _cc_shard_init.remote(*[sl[b] for sl in slice_lists])
        static_refs.append(st)
        state_refs.append(sta)
    _tick(f"shard_init(B={B})")

    def _labels_dataset():
        return ray.data.from_arrow_refs(
            [_cc_shard_table.remote(static_refs[b], state_refs[b])
             for b in range(B)])

    for rnd in range(max_rounds):
        emits = [_cc_emit.options(num_returns=B).remote(
            B, static_refs[b], state_refs[b]) for b in range(B)]
        emits = [[e] if B == 1 else list(e) for e in emits]
        counts = []
        new_state = []
        for b in range(B):
            sta, cnt = _cc_reduce.remote(
                static_refs[b], state_refs[b], *[em[b] for em in emits])
            new_state.append(sta)
            counts.append(cnt)
        state_refs = new_state
        if checkpoint_dir is not None:
            _labels_dataset().write_parquet(f"{checkpoint_dir}/cc_round={rnd}")
        n_changed = sum(ray.get(counts))
        _tick(f"round{rnd}(changed={n_changed})")
        if n_changed == 0:
            break
    else:
        print(f"CC WARNING: fixpoint not reached in {max_rounds} rounds "
              "(graph diameter exceeds max_rounds); labels are a refinement",
              flush=True)

    endpoint_labels = _labels_dataset()
    if nodes is None:
        return endpoint_labels

    # singleton fill over the full node universe
    n_endpoints = sum(ray.get([
        _cc_endpoint_count.remote(s) for s in static_refs]))
    if n_endpoints <= broadcast_fill_limit:
        pair_refs = [_cc_shard_pair.remote(static_refs[b], state_refs[b])
                     for b in range(B)]

        def _fill(df: pd.DataFrame) -> pd.DataFrame:
            from ..stages.shuffleops import _broadcast_get

            nv = df["node"].to_numpy(np.int64)
            lab = nv.copy()
            sid = _shard_of_node(nv, B)
            for s in np.unique(sid):
                ns, ls = _broadcast_get(pair_refs[s])
                if len(ns) == 0:
                    continue
                m = sid == s
                q = nv[m]
                pos = np.minimum(np.searchsorted(ns, q), len(ns) - 1)
                lab[m] = np.where(ns[pos] == q, ls[pos], q)
            return pd.DataFrame({"node": nv, "label": lab})

        out = nodes.map_batches(_fill, batch_format="pandas")
        _tick("singleton_fill_launch")
        return out

    # huge endpoint set: one bucketed cogroup fill (label side carries the
    # real labels; nodes absent from it keep their own id)
    from ..stages.shuffleops import bucketed_group_apply

    tagged_nodes = nodes.map_batches(
        lambda df: pd.DataFrame({"node": df["node"].astype(np.int64),
                                 "label": np.int64(0), "is_lab": False}),
        batch_format="pandas")
    tagged_labs = endpoint_labels.map_batches(
        lambda df: pd.DataFrame({"node": df["node"].astype(np.int64),
                                 "label": df["label"].astype(np.int64),
                                 "is_lab": True}),
        batch_format="pandas")

    def _merge(part: pd.DataFrame) -> pd.DataFrame:
        lab = part.loc[part["is_lab"], ["node", "label"]]
        base = part.loc[~part["is_lab"], ["node"]]
        out = base.merge(lab, on="node", how="left")
        nv = out["node"].to_numpy(np.int64)
        lv = out["label"].to_numpy(np.float64)
        return pd.DataFrame({"node": nv,
                             "label": np.where(np.isnan(lv), nv,
                                               lv).astype(np.int64)})

    out = bucketed_group_apply(tagged_nodes.union(tagged_labs), "node",
                               _merge, num_buckets=max(B, 32))
    _tick("singleton_fill_cogroup_launch")
    return out


@ray.remote
def _cc_endpoint_count(static) -> int:
    return int(len(static[0]))


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
