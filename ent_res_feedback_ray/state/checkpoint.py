"""Round / stage checkpointing with _SUCCESS markers and lineage counters.

North-rule requirement: "resume any round from per-partition checkpoints with
lineage and counters (pairs generated, pairs scored, clusters merged) logged
per block".  Reference analog: stage pickles + ECC constraint dumps for
replay (/root/reference/s2and/featurizer.py:972-981,
/root/reference/ecc/ecc.py:1085-1100) — externalized here as Parquet
directories written atomically (temp dir + rename) and marked with
``_SUCCESS``, so a restarted driver skips finished stages/rounds.
"""

from __future__ import annotations

import json
import os
import shutil

import ray.data

SUCCESS = "_SUCCESS"


def stage_dir(root: str, round_no: int, stage: str) -> str:
    return os.path.join(root, f"round={round_no}", f"stage={stage}")


def is_complete(path: str) -> bool:
    return os.path.exists(os.path.join(path, SUCCESS))


def mark_success(path: str, meta: dict | None = None) -> None:
    with open(os.path.join(path, SUCCESS), "w") as f:
        json.dump(meta or {}, f)


def write_checkpoint(ds: ray.data.Dataset, path: str, meta: dict | None = None) -> None:
    """Atomic Parquet checkpoint: write to tmp, rename, mark _SUCCESS."""
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ds.write_parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    mark_success(path, meta)


def write_partitioned(ds: ray.data.Dataset, path: str,
                      partition_cols: list[str],
                      meta: dict | None = None) -> None:
    """Partitioned Parquet sink (reference ``store_featurized_pickles``'s
    per-split outputs, SURVEY.md §2.1): one hive directory per partition
    value, so a resumed run (or a reader needing one split) touches only its
    partitions.  Atomic like ``write_checkpoint``."""
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ds.write_parquet(tmp, partition_cols=partition_cols)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    mark_success(path, meta)


def read_checkpoint(path: str) -> ray.data.Dataset:
    if not is_complete(path):
        raise FileNotFoundError(f"checkpoint {path} incomplete (no {SUCCESS})")
    return ray.data.read_parquet(path, file_extensions=["parquet"])


def read_meta(path: str) -> dict:
    with open(os.path.join(path, SUCCESS)) as f:
        return json.load(f)
