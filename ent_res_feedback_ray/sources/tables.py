"""Column-pruned Parquet readers for the test/bench star schema.

At 100 TB the difference between ``read_parquet(path)`` and
``read_parquet(path, columns=[...])`` is the whole ballgame: only the
projected columns' pages leave storage.  Every pipeline in this repo reads
through these helpers and states its column list.
"""

from __future__ import annotations

import os

import ray.data


TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _auto_blocks(path: str) -> int:
    """Right-size read parallelism: ~8 MiB of file per block, capped at the
    CPU count.  Tiny files become a handful of blocks instead of Ray's
    default fan-out (64 micro-blocks of KBs each → per-task overhead swamps
    compute).  At real scale the 128 MiB target block size governs."""
    import ray

    try:
        size = os.path.getsize(path)
    except OSError:
        return 0
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    # floor at ncpu/2 so downstream map stages (and the shuffles whose reduce
    # fan-out follows block count) keep CPU-proportional parallelism — the
    # scaling path needs block count to grow with the cluster
    return max(1, min(ncpu, max(size // (4 << 20), ncpu // 2)))


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               **kwargs) -> ray.data.Dataset:
    """Read one star-schema table with column pruning."""
    path = table_path(sf_dir, name)
    if "override_num_blocks" not in kwargs:
        blocks = _auto_blocks(path)
        if blocks:
            kwargs["override_num_blocks"] = blocks
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def maybe_load_dataframe(path: str | None, columns: list[str] | None = None
                         ) -> "ray.data.Dataset | None":
    """Side-input loader by extension — CSV or Parquet, None passthrough
    (reference ``maybe_load_dataframe``, /root/reference/s2and/data.py:684-701).
    CSV rides ``ray.data.read_csv`` (Arrow CSV reader, distributed)."""
    if path is None:
        return None
    if path.endswith(".csv") or path.endswith(".csv.gz"):
        ds = ray.data.read_csv(path)
        if columns:
            ds = ds.select_columns(columns)
        return ds
    return ray.data.read_parquet(path, columns=columns)


def maybe_load_list(path: str | None) -> list | None:
    """Small-list side input: newline-delimited text (or .json array) →
    Python list, for broadcast via ``ray.put`` (reference
    ``maybe_load_list``, /root/reference/s2and/data.py:668-681)."""
    if path is None:
        return None
    if path.endswith(".json"):
        import json

        with open(path) as f:
            return json.load(f)
    with open(path) as f:
        return [line.rstrip("\n") for line in f if line.strip()]


LABEL_MAP = {"NO": 0.0, "YES": 1.0, "0": 0.0, "1": 1.0, 0: 0.0, 1: 1.0}


def load_labeled_pairs(path: str | None) -> "object | None":
    """Labeled-pairs side input: CSV/parquet (id1, id2, label) with
    YES/NO/0/1 judgements mapped to float labels (reference mapping
    /root/reference/s2and/data.py:1290-1305).  Returns a pandas frame —
    label stores are bounded by construction."""
    ds = maybe_load_dataframe(path)
    if ds is None:
        return None
    df = ds.to_pandas()
    id1, id2, lab = df.columns[:3]
    out = df.rename(columns={id1: "id1", id2: "id2", lab: "label"})
    out["label"] = out["label"].map(LABEL_MAP).astype(float)
    if out["label"].isna().any():
        bad = df[out["label"].isna()][lab].unique()[:5]
        raise ValueError(f"unmappable pair labels: {bad}")
    a = out[["id1", "id2"]].min(axis=1)
    b = out[["id1", "id2"]].max(axis=1)
    out["id1"], out["id2"] = a, b  # canonical id1 < id2
    return out[["id1", "id2", "label"]]


def load_alias_pairs(path: str | None) -> "list[tuple[str, str]] | None":
    """Alias token-pair side input (reference name-tuples broadcast set,
    /root/reference/s2and/data.py:704-741): CSV/parquet with two columns →
    list of (tok_a, tok_b) for the constraint chain's alias rule."""
    if path is None:
        return None
    ds = maybe_load_dataframe(path)
    df = ds.to_pandas()  # side inputs are small by contract
    a, b = df.columns[:2]
    return list(zip(df[a].astype(str), df[b].astype(str)))


def maybe_load_json(path_or_obj) -> "dict | list | None":
    """Dict/None passthrough, else load a JSON document (reference
    ``maybe_load_json``, /root/reference/s2and/data.py:643-662: pass dicts
    through, read small JSON side inputs from disk).  For RECORD-oriented
    JSONL corpora use :func:`read_jsonl_dataset` — this loader is for
    bounded side inputs (cluster seeds, constraint dumps, configs)."""
    if path_or_obj is None or isinstance(path_or_obj, (dict, list)):
        return path_or_obj
    import json

    with open(path_or_obj) as f:
        return json.load(f)


def read_jsonl_dataset(path: str, columns: list[str] | None = None
                       ) -> ray.data.Dataset:
    """Record-oriented JSON(L) corpus → Dataset (the reference corpus format,
    signatures/papers JSON — /root/reference/s2and/data.py:313-378 —
    re-expressed as a distributed read): ``ray.data.read_json`` (Arrow JSON
    reader) + column pruning."""
    ds = ray.data.read_json(path)
    if columns:
        ds = ds.select_columns(columns)
    return ds
