"""Connected components (driver vs distributed parity) and per-block HAC."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from ent_res_feedback_ray.stages.clustering import hac_average_cut, hac_block_clustering
from ent_res_feedback_ray.state.unionfind import (
    connected_components,
    connected_components_distributed,
    unionfind_numpy,
)


def test_unionfind_basic():
    src = np.array([1, 2, 10], dtype=np.int64)
    dst = np.array([2, 3, 11], dtype=np.int64)
    comp = unionfind_numpy(src, dst)
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10


def test_unionfind_chain_and_singletons():
    # chain 0-1-2-...-9 plus isolated node 100
    src = np.arange(9, dtype=np.int64)
    dst = src + 1
    comp = unionfind_numpy(src, dst, nodes=np.array(list(range(10)) + [100]))
    assert all(comp[i] == 0 for i in range(10))
    assert comp[100] == 100


def _random_edges(seed, n_nodes=60, n_edges=80):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    dst = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    keep = src != dst
    return src[keep], dst[keep]


def test_distributed_matches_driver():
    src, dst = _random_edges(7)
    expected = unionfind_numpy(src, dst)
    edges = ray.data.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    out = connected_components_distributed(edges, max_rounds=30).to_pandas()
    got = dict(zip(out["node"], out["label"]))
    assert got == expected


def test_distributed_cc_large_random_and_chain():
    # bigger random graph (exercises multi-shard message routing) plus a
    # long chain (exercises multi-round delta propagation: only the
    # frontier emits after round 0)
    rng = np.random.default_rng(23)
    src = rng.integers(0, 3000, 4000).astype(np.int64)
    dst = rng.integers(0, 3000, 4000).astype(np.int64)
    chain = np.arange(5000, 5040, dtype=np.int64)
    src = np.concatenate([src, chain[:-1]])
    dst = np.concatenate([dst, chain[1:]])
    keep = src != dst
    src, dst = src[keep], dst[keep]
    expected = unionfind_numpy(src, dst)
    edges = ray.data.from_pandas(
        pd.DataFrame({"src": src, "dst": dst})).repartition(8)
    out = connected_components_distributed(
        edges, max_rounds=60, n_shards=4).to_pandas()
    got = dict(zip(out["node"], out["label"]))
    assert got == expected


def test_distributed_cc_cogroup_fill_path():
    # force the O(|nodes|) cogroup singleton fill (broadcast_fill_limit=0)
    src, dst = _random_edges(13)
    nodes = ray.data.from_pandas(pd.DataFrame(
        {"node": np.arange(80, dtype=np.int64)}))
    edges = ray.data.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    out = connected_components_distributed(
        edges, nodes=nodes, broadcast_fill_limit=0).to_pandas()
    assert len(out) == 80
    expected = unionfind_numpy(src, dst, nodes=np.arange(80, dtype=np.int64))
    got = dict(zip(out["node"], out["label"]))
    assert got == expected


def test_connected_components_auto_small():
    src, dst = _random_edges(11)
    edges = ray.data.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    nodes = ray.data.from_pandas(pd.DataFrame(
        {"node": np.arange(70, dtype=np.int64)}))
    out = connected_components(edges, nodes=nodes).to_pandas()
    assert len(out) == 70  # singletons included
    expected = unionfind_numpy(src, dst, nodes=np.arange(70, dtype=np.int64))
    got = dict(zip(out["node"], out["label"]))
    assert got == expected


def test_hac_two_clear_clusters():
    # 0,1 close; 2,3 close; far apart
    d = np.array([
        [0.0, 0.1, 0.9, 0.95],
        [0.1, 0.0, 0.92, 0.9],
        [0.9, 0.92, 0.0, 0.05],
        [0.95, 0.9, 0.05, 0.0],
    ])
    labels = hac_average_cut(d, eps=0.5)
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]
    assert labels[0] != labels[2]
    # deterministic numbering by smallest member
    assert labels[0] == 0 and labels[2] == 1


def test_hac_eps_extremes():
    d = np.random.default_rng(0).random((6, 6))
    d = (d + d.T) / 2
    np.fill_diagonal(d, 0)
    assert len(set(hac_average_cut(d, eps=2.0))) == 1       # merge all
    assert len(set(hac_average_cut(d, eps=-1.0))) == 6      # merge none


def test_hac_average_linkage_semantics():
    # singleton chain where single-linkage would merge but average shouldn't:
    # points on a line at 0, 0.4, 1.0 with eps 0.45:
    # merge {0,1} (d=0.4); avg dist({0,1},2)= (1.0+0.6)/2 = 0.8 > eps
    d = np.array([
        [0.0, 0.4, 1.0],
        [0.4, 0.0, 0.6],
        [1.0, 0.6, 0.0],
    ])
    labels = hac_average_cut(d, eps=0.45)
    assert labels[0] == labels[1] != labels[2]


def test_hac_block_clustering_dataset():
    pairs = pd.DataFrame({
        "block_key": ["b1"] * 3 + ["b2"],
        "id1": np.array([1, 1, 2, 10], dtype=np.int64),
        "id2": np.array([2, 3, 3, 11], dtype=np.int64),
        "distance": [0.1, 0.9, 0.85, 0.05],
    })
    ds = ray.data.from_pandas(pairs)
    out = hac_block_clustering(ds, eps=0.5).to_pandas()
    by_id = dict(zip(out["id"], out["cluster_id"]))
    assert by_id[1] == by_id[2]
    assert by_id[3] != by_id[1]
    assert by_id[10] == by_id[11]
    assert by_id[1].startswith("b1_") and by_id[10].startswith("b2_")


def test_incremental_assign_tolerates_columnless_empty_blocks():
    # regression: a frozen-assignment lineage can deliver EMPTY blocks with
    # a column-less schema (block layout is nondeterministic — the driver's
    # sequential query run hit this; a lone er_incremental_clusters did not)
    import pyarrow as pa

    from ent_res_feedback_ray.stages.clustering import incremental_assign

    existing = ray.data.from_arrow([
        pa.table({"node": pa.array([1, 2], pa.int64()),
                  "label": pa.array([10, 10], pa.int64())}),
        pa.table({}),                       # zero columns, zero rows
    ])
    scored = ray.data.from_pandas(pd.DataFrame({
        "id1": np.array([1, 2], np.int64),
        "id2": np.array([3, 3], np.int64),
        "score": [0.9, 0.8],
    }))
    new_ids = pd.DataFrame({"node": np.array([3], np.int64)})
    out = incremental_assign(scored, existing, new_ids,
                             threshold=0.5).to_pandas()
    by = dict(zip(out["node"], out["label"]))
    assert by[1] == by[2] == by[3] == 10
