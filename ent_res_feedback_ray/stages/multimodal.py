"""Multimodal columns: opaque ``binary`` payloads with typed metadata,
decode / feature-extract as actor-pool ``map_batches`` stages.

The image/video codec libraries are not in this container, so those decode
kernels are STUBS (clearly marked below): they raise ``NotImplementedError``
unless ``allow_fake=True``, in which case a deterministic fake decoder
(byte-statistics "features") stands in.  REAL kernels that need no external
library are implemented for real: WAV/PCM16 audio decode (``decode_wav``,
RIFF is a public container format) + windowed RMS/zero-crossing features,
and nearest-neighbor image resize (``resize_nearest``).  The Ray side —
schema, batch sizing for large binary rows, actor signature, output
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


def resize_nearest(pixels: np.ndarray, th: int, tw: int) -> np.ndarray:
    """REAL nearest-neighbor image resize (pure numpy index gather) — no
    image library needed once pixels exist as an array.  ``pixels``:
    (h, w[, c]) array; returns (th, tw[, c])."""
    h, w = pixels.shape[0], pixels.shape[1]
    if h == 0 or w == 0:
        return np.zeros((th, tw) + pixels.shape[2:], dtype=pixels.dtype)
    ri = np.minimum((np.arange(th) * h) // th, h - 1)
    ci = np.minimum((np.arange(tw) * w) // tw, w - 1)
    return pixels[ri][:, ci]


class ImageResizeStage:
    """Actor-pool resize stage: payload → fixed (th×tw) grayscale thumbnail
    (flattened ``list<uint8>``).  The RESIZE kernel is real (numpy
    nearest-neighbor); only the decode step shares ``ImageDecodeStage``'s
    declared stub (``allow_fake=True`` derives a deterministic pseudo-image
    by reshaping payload bytes into the fake decoder's width×height)."""

    def __init__(self, th: int = 8, tw: int = 8, allow_fake: bool = False,
                 binary_col: str = "payload", id_col: str = "doc_id"):
        self.th, self.tw = th, tw
        self.decoder = ImageDecodeStage(allow_fake=allow_fake,
                                        binary_col=binary_col, id_col=id_col)
        self.binary_col = binary_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column(self.binary_col)
        out = np.empty((t.num_rows, self.th * self.tw), dtype=np.uint8)
        for i in range(t.num_rows):
            payload = col[i].as_py() or b""
            w, h, _ = self.decoder.decode_one(payload)
            arr = np.frombuffer(payload, dtype=np.uint8)
            px = np.resize(arr, (h, w))  # deterministic pseudo-image (stub)
            out[i] = resize_nearest(px, self.th, self.tw).reshape(-1)
        thumb = pa.FixedSizeListArray.from_arrays(
            pa.array(out.reshape(-1), pa.uint8()), self.th * self.tw)
        return pa.table({self.id_col: t.column(self.id_col), "thumb": thumb})


def image_resize_stage(ds: ray.data.Dataset, allow_fake: bool = False,
                       concurrency=(1, 4), batch_size: int = 256,
                       **kwargs) -> ray.data.Dataset:
    return ds.map_batches(
        ImageResizeStage,
        fn_constructor_kwargs={"allow_fake": allow_fake, **kwargs},
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """REAL RIFF/WAVE PCM16 decoder (pure numpy — WAV is a public container
    format; no audio library needed).  Returns (sample_rate, mono float64
    samples in [-1, 1]).  Raises ValueError on non-WAV / non-PCM16 input."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sr, n_ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            n_ch = int.from_bytes(body[2:4], "little")
            sr = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt != 1 or bits != 16:
                raise ValueError("only PCM16 WAV is supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if sr is None or data is None or not n_ch:
        raise ValueError("missing fmt/data chunk")
    pcm = np.frombuffer(data[: (len(data) // 2) * 2], dtype="<i2")
    if n_ch > 1:
        pcm = pcm[: (len(pcm) // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
    return sr, np.asarray(pcm, dtype=np.float64) / 32768.0


class AudioFeatureStage:
    """Actor-pool audio decode + feature extraction: WAV payloads decode for
    REAL (``decode_wav``); per-window RMS energy and zero-crossing rate are
    plain numpy.  Non-WAV codecs need libraries absent from this container:
    those payloads raise ``NotImplementedError`` unless ``allow_fake=True``
    (byte-statistics stand-in, same contract as the image stub).

    Output: (id, sample_rate, n_samples, rms_mean, zcr_mean, n_windows)."""

    def __init__(self, window: int = 1024, allow_fake: bool = False,
                 binary_col: str = "payload", id_col: str = "doc_id"):
        self.window = window
        self.allow_fake = allow_fake
        self.binary_col = binary_col
        self.id_col = id_col

    def features_one(self, payload: bytes) -> tuple[int, int, float, float, int]:
        try:
            sr, x = decode_wav(payload)
        except ValueError:
            if not self.allow_fake:
                raise NotImplementedError(
                    "non-WAV audio requires codec libraries not present in "
                    "this environment; construct with allow_fake=True for "
                    "the deterministic stand-in")
            arr = np.frombuffer(payload, dtype=np.uint8)
            sr, x = 8000, (arr.astype(np.float64) - 127.5) / 127.5
        n = len(x)
        w = self.window
        n_win = n // w
        if n_win == 0:
            return sr, n, 0.0, 0.0, 0
        xw = x[: n_win * w].reshape(n_win, w)
        rms = np.sqrt((xw * xw).mean(axis=1))
        zcr = (np.diff(np.signbit(xw), axis=1) != 0).mean(axis=1)
        return sr, n, float(rms.mean()), float(zcr.mean()), n_win

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column(self.binary_col)
        rows = [self.features_one(col[i].as_py() or b"")
                for i in range(t.num_rows)]
        sr, ns, rms, zcr, nw = map(np.array, zip(*rows)) if rows else \
            (np.empty(0),) * 5
        return pa.table({
            self.id_col: t.column(self.id_col),
            "sample_rate": pa.array(np.asarray(sr, np.int64)),
            "n_samples": pa.array(np.asarray(ns, np.int64)),
            "rms_mean": pa.array(np.asarray(rms, np.float64)),
            "zcr_mean": pa.array(np.asarray(zcr, np.float64)),
            "n_windows": pa.array(np.asarray(nw, np.int64)),
        })


def audio_features_stage(ds: ray.data.Dataset, allow_fake: bool = False,
                         concurrency=(1, 4), batch_size: int = 256,
                         **kwargs) -> ray.data.Dataset:
    return ds.map_batches(
        AudioFeatureStage,
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
