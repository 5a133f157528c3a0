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


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               **kwargs) -> ray.data.Dataset:
    """Read one star-schema table with column pruning."""
    return ray.data.read_parquet(table_path(sf_dir, name), columns=columns, **kwargs)
