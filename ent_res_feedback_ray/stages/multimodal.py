"""Multimodal columns: opaque ``binary`` payloads with typed metadata,
decode / feature-extract as actor-pool ``map_batches`` stages.

The image/audio decode libraries are not in this container, so the decode
kernels are STUBS (clearly marked below): ``decode_image`` raises
``NotImplementedError`` unless ``allow_fake=True``, in which case a
deterministic fake decoder (byte-statistics "features") stands in.  The Ray
side — schema, batch sizing for large binary rows, actor signature, output
layout — is real and tested (tests/test_multimodal.py).

Scale notes: binary payloads make rows wide; the stage uses a small
``batch_size`` so batch × concurrency fits worker heap, and keeps the
payload column in Arrow (never pandas object dtype) until dropped.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data


def binary_metadata_stage(ds: ray.data.Dataset, binary_col: str = "payload",
                          id_col: str = "doc_id") -> ray.data.Dataset:
    """Typed metadata for an opaque binary column: byte length, sha1, magic
    prefix.  Stateless, zero-copy Arrow (buffers are never copied to Python
    except the 8-byte prefix)."""

    def _meta(t: pa.Table) -> pa.Table:
        col = t.column(binary_col)
        lengths = np.empty(t.num_rows, dtype=np.int64)
        sha1 = []
        magic = []
        for i in range(t.num_rows):
            v = col[i].as_py() or b""
            lengths[i] = len(v)
            sha1.append(hashlib.sha1(v).hexdigest())
            magic.append(v[:8].hex())
        return pa.table({
            id_col: t.column(id_col),
            "n_bytes": pa.array(lengths, pa.int64()),
            "sha1": pa.array(sha1, pa.string()),
            "magic": pa.array(magic, pa.string()),
        })

    return ds.map_batches(_meta, batch_format="pyarrow", batch_size=1024)


class ImageDecodeStage:
    """Actor-pool image decode / feature-extract stage.

    STUB: real decoding requires PIL/opencv (not in this container).  With
    ``allow_fake=True`` a deterministic byte-statistics extractor stands in
    (stable across runs/partitions) so the pipeline plumbing — actor state,
    batch shape, output schema ``(id, width, height, feature:list<float>[8])``
    — is fully exercised."""

    def __init__(self, allow_fake: bool = False, binary_col: str = "payload",
                 id_col: str = "doc_id"):
        self.allow_fake = allow_fake
        self.binary_col = binary_col
        self.id_col = id_col
        # real impl would load the decoder/model here (once per actor)

    def decode_one(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        if not self.allow_fake:
            raise NotImplementedError(
                "image decoding requires an image library not present in this "
                "environment; construct with allow_fake=True for the "
                "deterministic stand-in")
        # deterministic fake: derive a pseudo width/height + 8 byte-histogram
        # features from the payload bytes
        h = hashlib.blake2b(payload, digest_size=8).digest()
        width = 1 + h[0] % 64
        height = 1 + h[1] % 64
        arr = np.frombuffer(payload, dtype=np.uint8)
        if len(arr) == 0:
            feats = np.zeros(8)
        else:
            hist, _ = np.histogram(arr, bins=8, range=(0, 256))
            feats = hist / len(arr)
        return width, height, feats

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column(self.id_col)
        col = t.column(self.binary_col)
        widths = np.empty(t.num_rows, dtype=np.int64)
        heights = np.empty(t.num_rows, dtype=np.int64)
        feats = np.empty((t.num_rows, 8), dtype=np.float64)
        for i in range(t.num_rows):
            w, h, f = self.decode_one(col[i].as_py() or b"")
            widths[i], heights[i], feats[i] = w, h, f
        feat_col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), pa.float64()), 8)
        return pa.table({
            self.id_col: ids,
            "width": pa.array(widths, pa.int64()),
            "height": pa.array(heights, pa.int64()),
            "feature": feat_col,
        })


def image_features_stage(ds: ray.data.Dataset, allow_fake: bool = False,
                         concurrency=(1, 4), batch_size: int = 256,
                         **kwargs) -> ray.data.Dataset:
    """Actor-pool decode stage; small batch_size because binary rows are
    wide (batch × concurrency must fit worker heap)."""
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"allow_fake": allow_fake, **kwargs},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


class FrameSampleStage:
    """Video frame-sampling analog: one binary payload → one row per sampled
    frame (a one-to-many explode over wide binary rows).

    STUB decode (no video libs in this container): with ``allow_fake=True``
    the payload is chunked into fixed-size pseudo-frames deterministically;
    the real implementation would seek keyframes in ``__init__``-loaded
    codec state.  The Ray side — explode schema, small batches, actor pool —
    is real and tested."""

    def __init__(self, allow_fake: bool = False, every_n: int = 4,
                 frame_bytes: int = 64, binary_col: str = "payload",
                 id_col: str = "doc_id"):
        self.allow_fake = allow_fake
        self.every_n = every_n
        self.frame_bytes = frame_bytes
        self.binary_col = binary_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.allow_fake:
            raise NotImplementedError(
                "video decoding requires codec libraries not present in this "
                "environment; construct with allow_fake=True for the "
                "deterministic stand-in")
        ids, frame_no, means = [], [], []
        id_arr = t.column(self.id_col)
        col = t.column(self.binary_col)
        for i in range(t.num_rows):
            v = col[i].as_py() or b""
            arr = np.frombuffer(v, dtype=np.uint8)
            n_frames = max(1, len(arr) // self.frame_bytes)
            for f in range(0, n_frames, self.every_n):
                chunk = arr[f * self.frame_bytes:(f + 1) * self.frame_bytes]
                ids.append(id_arr[i].as_py())
                frame_no.append(f)
                means.append(float(chunk.mean()) if len(chunk) else 0.0)
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "frame_no": pa.array(frame_no, pa.int64()),
            "frame_mean": pa.array(means, pa.float64()),
        })


def frame_sample_stage(ds: ray.data.Dataset, allow_fake: bool = False,
                       concurrency=(1, 4), batch_size: int = 256,
                       **kwargs) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"allow_fake": allow_fake, **kwargs},
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)


def pages_image_features(sf_dir: str) -> ray.data.Dataset:
    """Driver-visible multimodal pipeline: html payloads → actor-pool decode
    stage with the DETERMINISTIC stand-in decoder (decode libs absent —
    declared stub; the plumbing is the deliverable).  Rows-only."""
    from ..sources.pages import load_pages

    ds = load_pages(sf_dir, with_html=True).map_batches(
        lambda t: t.select(["doc_id", "html"]).rename_columns(
            ["doc_id", "payload"]),
        batch_format="pyarrow")
    return image_features_stage(ds, allow_fake=True)


def pages_binary_metadata(sf_dir: str) -> ray.data.Dataset:
    """html:binary metadata over the derived pages table (oracle-checkable:
    byte length + md5 of the payload)."""
    from ..sources.pages import load_pages

    ds = load_pages(sf_dir, with_html=True)

    def _meta(t: pa.Table) -> pa.Table:
        col = t.column("html")
        lengths = np.empty(t.num_rows, dtype=np.int64)
        md5s = []
        for i in range(t.num_rows):
            v = col[i].as_py() or b""
            lengths[i] = len(v)
            md5s.append(hashlib.md5(v).hexdigest())
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_bytes": pa.array(lengths, pa.int64()),
            "payload_md5": pa.array(md5s, pa.string()),
        })

    return ds.map_batches(_meta, batch_format="pyarrow", batch_size=1024)


PAGES_BINARY_META_SQL = """
WITH h AS (
  SELECT doc_id, '<html><body><p>' || text || '</p></body></html>' AS html
  FROM documents
)
SELECT doc_id, octet_length(encode(html)) AS n_bytes, md5(html) AS payload_md5
FROM h
""".strip()
