"""Extraction + normalization stages (stateless ``map_batches``).

Reference analog: ``normalize_text`` (/root/reference/s2and/text.py:312-338)
and the paper-preprocessing map (/root/reference/s2and/data.py:1704-1749).

The per-row invariant (BASELINE.json ``input_hint``): extracted/normalized
text is byte-identical per url — a pure function of the input bytes, never of
batch or partition boundaries.  Pinned by tests/test_textnorm.py.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.textnorm import normalize_text_array

_TAG = re.compile(rb"<[^>]*>")
_WS = re.compile(rb"\s+")


def extract_text_from_html(html: bytes | None) -> str:
    """Deterministic HTML→text: strip tags, decode UTF-8 (replace errors),
    collapse whitespace.  (The reference consumes pre-extracted strings; this
    is the graft's ``html:binary`` → ``text`` stage.)"""
    if html is None:
        return ""
    stripped = _WS.sub(b" ", _TAG.sub(b" ", html)).strip()
    return stripped.decode("utf-8", errors="replace")


def extract_text_stage(ds: ray.data.Dataset, html_col: str = "html",
                       out_col: str = "extracted_text") -> ray.data.Dataset:
    def _extract(batch: pa.Table) -> pa.Table:
        html = batch.column(html_col).to_pylist()
        out = pa.array([extract_text_from_html(h) for h in html], pa.string())
        return batch.append_column(out_col, out)

    return ds.map_batches(_extract, batch_format="pyarrow")


def normalize_stage(ds: ray.data.Dataset, text_col: str = "text",
                    out_col: str = "norm_text") -> ray.data.Dataset:
    """Add the normalized-text column (vectorized pyarrow kernels)."""

    def _norm(batch: pa.Table) -> pa.Table:
        return batch.append_column(out_col, normalize_text_array(batch.column(text_col)))

    return ds.map_batches(_norm, batch_format="pyarrow")
