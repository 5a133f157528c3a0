"""Pair generation: canonical order, exhaustive vs windowed cap, partition
invariance (FIXTURES.md §D determinism requirement)."""

import numpy as np
import pandas as pd
import ray.data

from ent_res_feedback_ray.stages.pairs import dedup_pairs, emit_block_pairs, pairs_from_blocks


def _group(n, block="b"):
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64) + 100,
        "block_key": block,
        "norm_text": [f"text {i}" for i in range(n)],
    })


def test_exhaustive_pairs():
    g = _group(5)
    out = emit_block_pairs(g, id_col="doc_id", carry_cols=["norm_text"],
                           block_col="block_key", max_pairs_per_block=100)
    assert len(out) == 10
    assert (out["id1"] < out["id2"]).all()
    assert (out["pairs_possible"] == 10).all()
    # each unordered pair exactly once
    assert len(set(zip(out["id1"], out["id2"]))) == 10


def test_windowed_cap():
    g = _group(100)
    out = emit_block_pairs(g, id_col="doc_id", carry_cols=[],
                           block_col="block_key", max_pairs_per_block=300)
    assert len(out) <= 300
    assert (out["pairs_possible"] == 4950).all()
    assert (out["id1"] < out["id2"]).all()
    # sorted-neighborhood: only near-window pairs emitted
    assert ((out["id2"] - out["id1"]) <= 3).all()


def test_singleton_block_empty():
    out = emit_block_pairs(_group(1), id_col="doc_id", carry_cols=[],
                           block_col="block_key", max_pairs_per_block=10)
    assert len(out) == 0


def test_partition_invariance():
    df = pd.concat([_group(7, "x"), _group(5, "y")], ignore_index=True)
    # same data, different partition counts → identical pair sets
    outs = []
    for nparts in (1, 4):
        ds = ray.data.from_pandas(df).repartition(nparts)
        pairs = pairs_from_blocks(ds, block_col="block_key", id_col="doc_id",
                                  carry_cols=["norm_text"],
                                  max_pairs_per_block=1000)
        pdf = pairs.to_pandas().sort_values(
            ["block_key", "id1", "id2"]).reset_index(drop=True)
        outs.append(pdf)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_dedup_pairs():
    df = pd.DataFrame({
        "block_key": ["a", "b", "a"],
        "id1": np.array([1, 1, 1], dtype=np.int64),
        "id2": np.array([2, 2, 3], dtype=np.int64),
    })
    ds = ray.data.from_pandas(df)
    out = dedup_pairs(ds).to_pandas().sort_values(["id1", "id2"]).reset_index(drop=True)
    assert len(out) == 2
    assert set(zip(out["id1"], out["id2"])) == {(1, 2), (1, 3)}


def test_exclude_pairs_stage():
    import numpy as np
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.stages.pairs import exclude_pairs_stage

    pairs = pd.DataFrame({
        "id1": np.array([1, 1, 2, 3], dtype=np.int64),
        "id2": np.array([2, 3, 3, 4], dtype=np.int64),
        "score": [0.1, 0.2, 0.3, 0.4],
    })
    ex = pd.DataFrame({"id1": [1, 3], "id2": [3, 4]})
    out = exclude_pairs_stage(
        ray.data.from_pandas(pairs).repartition(2), ex).to_pandas()
    assert set(zip(out.id1, out.id2)) == {(1, 2), (2, 3)}
    # None / empty store = passthrough
    out2 = exclude_pairs_stage(ray.data.from_pandas(pairs), None).to_pandas()
    assert len(out2) == 4


def test_load_labeled_pairs(tmp_path):
    import pandas as pd

    from ent_res_feedback_ray.sources.tables import load_labeled_pairs

    p = tmp_path / "pairs.csv"
    pd.DataFrame({"a": [5, 2], "b": [1, 9],
                  "judgement": ["YES", "NO"]}).to_csv(p, index=False)
    out = load_labeled_pairs(str(p))
    assert out["label"].tolist() == [1.0, 0.0]
    assert out["id1"].tolist() == [1, 2]   # canonicalized id1 < id2
    assert out["id2"].tolist() == [5, 9]
    assert load_labeled_pairs(None) is None


def test_transitivity_preserving_sample_mode():
    """oversize_mode='sample': an oversized block draws k records and emits
    ALL k·(k−1)/2 pairs among them (the reference data.py:1486-1701
    property), invariant to input partitioning."""
    import itertools

    import ray.data
    from ent_res_feedback_ray.stages.pairs import pairs_from_blocks

    n = 40
    df = pd.DataFrame({"blk": "B", "doc_id": np.arange(n, dtype=np.int64)})
    cap = 45  # k = 10 → 45 pairs exactly
    outs = []
    for parts in (1, 5):
        ds = ray.data.from_pandas(df).repartition(parts)
        out = pairs_from_blocks(
            ds, block_col="blk", id_col="doc_id", carry_cols=[],
            max_pairs_per_block=cap, oversize_mode="sample").to_pandas()
        out = out.sort_values(["id1", "id2"]).reset_index(drop=True)
        outs.append(out)
    a, b = outs
    pd.testing.assert_frame_equal(a, b)  # partition-invariant
    # all-pairs-among-sample property: the pair set IS the complete graph
    # over exactly the sampled records
    sampled = sorted(set(a["id1"]) | set(a["id2"]))
    assert len(sampled) == 10
    expect = set(itertools.combinations(sampled, 2))
    got = set(zip(a["id1"], a["id2"]))
    assert got == expect
    # lineage: pairs_possible still reports the FULL block (truncation log)
    assert (a["pairs_possible"] == n * (n - 1) // 2).all()
    assert len(a) == 45


def test_window_vs_sample_lineage_distinguishable():
    """window mode emits n·w pairs (chains), sample mode emits a clique —
    the generated-pair count differs for the same budget, so lineage
    counters distinguish the two modes."""
    import ray.data
    from ent_res_feedback_ray.stages.pairs import pairs_from_blocks

    n = 40
    df = pd.DataFrame({"blk": "B", "doc_id": np.arange(n, dtype=np.int64)})
    cap = 45
    win = pairs_from_blocks(
        ray.data.from_pandas(df), block_col="blk", id_col="doc_id",
        carry_cols=[], max_pairs_per_block=cap,
        oversize_mode="window").to_pandas()
    # w = 45 // 40 = 1 → 39 adjacent pairs; sample mode → 45 clique pairs
    assert len(win) == 39


def _salt_fixture(seed=7):
    """One mega block (salted path), one windowed-but-small block, small
    exhaustive blocks, and a singleton."""
    import numpy as np
    import pandas as pd
    import ray.data

    rng = np.random.default_rng(seed)
    rows = []
    nid = 0

    def add_block(key, n):
        nonlocal nid
        for _ in range(n):
            rows.append({
                "block_key": key,
                "doc_id": np.int64(nid * 7919 % 100003),
                "txt": "t" + "".join(
                    rng.choice(list("abcdefgh"), size=6)),
            })
            nid += 1

    add_block("mega", 400)
    add_block("midsize", 60)
    add_block("tiny", 4)
    add_block("single", 1)
    df = pd.DataFrame(rows).sample(frac=1.0, random_state=3)
    return ray.data.from_pandas(df.reset_index(drop=True))


def _canon_pairs(df):
    cols = sorted(df.columns)
    return (df[cols].sort_values(cols, kind="mergesort")
            .reset_index(drop=True))


def test_salted_window_pairs_exact_equality(sf_dir):
    """The salted emission is the SAME pair set as the single-task
    windowed emission — chunk boundaries only move work, never pairs."""
    from ent_res_feedback_ray.stages.pairs import (
        pairs_from_blocks, salted_window_pairs)

    ds = _salt_fixture()
    kw = dict(block_col="block_key", id_col="doc_id", carry_cols=["txt"],
              max_pairs_per_block=800, sort_col="txt")
    base = pairs_from_blocks(ds, **kw, oversize_mode="window").to_pandas()
    salt = salted_window_pairs(ds, **kw, salt_threshold_rows=100,
                               chunk_rows=64).to_pandas()
    a, b = _canon_pairs(base), _canon_pairs(salt)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b)


def test_salted_window_pairs_merges_underfilled_chunks(sf_dir):
    """Adversarial: window width w exceeds the chunk target, so provisional
    chunks MUST merge (interior chunks ≥ w) or pairs would be lost."""
    from ent_res_feedback_ray.stages.pairs import (
        pairs_from_blocks, salted_window_pairs)

    ds = _salt_fixture(seed=11)
    kw = dict(block_col="block_key", id_col="doc_id", carry_cols=["txt"],
              max_pairs_per_block=8000, sort_col="txt")  # w = 20 for mega
    base = pairs_from_blocks(ds, **kw, oversize_mode="window").to_pandas()
    salt = salted_window_pairs(ds, **kw, salt_threshold_rows=100,
                               chunk_rows=16).to_pandas()
    pd.testing.assert_frame_equal(_canon_pairs(base), _canon_pairs(salt))


def test_salted_window_pairs_no_oversized_fallback(sf_dir):
    """With no block over the salt threshold the operator IS
    pairs_from_blocks."""
    from ent_res_feedback_ray.stages.pairs import (
        pairs_from_blocks, salted_window_pairs)

    ds = _salt_fixture(seed=13)
    kw = dict(block_col="block_key", id_col="doc_id", carry_cols=["txt"],
              max_pairs_per_block=800, sort_col="txt")
    base = pairs_from_blocks(ds, **kw, oversize_mode="window").to_pandas()
    salt = salted_window_pairs(ds, **kw, salt_threshold_rows=10_000).to_pandas()
    pd.testing.assert_frame_equal(_canon_pairs(base), _canon_pairs(salt))
