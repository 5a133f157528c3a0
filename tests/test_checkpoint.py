"""Checkpoint layout: atomic write, _SUCCESS gating, round-trip, and the
distributed CC per-round checkpoint."""

import os

import numpy as np
import pandas as pd
import pytest
import ray.data

from ent_res_feedback_ray.state.checkpoint import (
    is_complete,
    read_checkpoint,
    read_meta,
    stage_dir,
    write_checkpoint,
)
from ent_res_feedback_ray.state.unionfind import connected_components_distributed


def test_checkpoint_roundtrip(tmp_path):
    df = pd.DataFrame({"a": np.arange(100, dtype=np.int64), "b": "x"})
    path = str(tmp_path / "stage")
    write_checkpoint(ray.data.from_pandas(df), path, meta={"round": 3})
    assert is_complete(path)
    assert read_meta(path)["round"] == 3
    back = read_checkpoint(path).to_pandas().sort_values("a").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)


def test_incomplete_checkpoint_rejected(tmp_path):
    path = str(tmp_path / "partial")
    os.makedirs(path)
    with pytest.raises(FileNotFoundError):
        read_checkpoint(path)


def test_overwrite_is_atomic(tmp_path):
    path = str(tmp_path / "stage")
    write_checkpoint(ray.data.from_pandas(pd.DataFrame({"a": [1]})), path)
    write_checkpoint(ray.data.from_pandas(pd.DataFrame({"a": [2, 3]})), path)
    assert read_checkpoint(path).count() == 2


def test_stage_dir_layout(tmp_path):
    assert stage_dir("/out", 2, "assignments") == "/out/round=2/stage=assignments"


def test_distributed_cc_writes_round_checkpoints(tmp_path):
    edges = ray.data.from_pandas(pd.DataFrame({
        "src": np.array([0, 1, 5], dtype=np.int64),
        "dst": np.array([1, 2, 6], dtype=np.int64),
    }))
    out = connected_components_distributed(
        edges, max_rounds=10, checkpoint_dir=str(tmp_path)).to_pandas()
    got = dict(zip(out["node"], out["label"]))
    assert got[0] == got[1] == got[2] == 0
    assert got[5] == got[6] == 5
    rounds = [d for d in os.listdir(tmp_path) if d.startswith("cc_round=")]
    assert len(rounds) >= 1


def test_write_partitioned(tmp_path):
    import os

    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.state.checkpoint import (
        is_complete,
        write_partitioned,
    )

    df = pd.DataFrame({"doc_id": range(20),
                       "split": ["train"] * 15 + ["test"] * 5})
    path = str(tmp_path / "parts")
    write_partitioned(ray.data.from_pandas(df), path, ["split"])
    assert is_complete(path)
    subdirs = {d for d in os.listdir(path) if d.startswith("split=")}
    assert subdirs == {"split=train", "split=test"}
    # one partition readable alone (a resumed run touches only its splits)
    back = ray.data.read_parquet(os.path.join(path, "split=train"))
    assert back.count() == 15


def test_side_input_loaders(tmp_path):
    import pandas as pd

    from ent_res_feedback_ray.sources.tables import (
        load_alias_pairs,
        maybe_load_dataframe,
        maybe_load_list,
    )

    assert maybe_load_dataframe(None) is None
    csv = tmp_path / "side.csv"
    pd.DataFrame({"a": ["x", "nyc"], "b": ["y", "new"]}).to_csv(csv, index=False)
    ds = maybe_load_dataframe(str(csv))
    assert ds.count() == 2
    assert load_alias_pairs(str(csv)) == [("x", "y"), ("nyc", "new")]
    lst = tmp_path / "list.txt"
    lst.write_text("alpha\nbeta\n\n")
    assert maybe_load_list(str(lst)) == ["alpha", "beta"]
