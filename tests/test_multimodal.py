"""Multimodal plumbing: binary metadata, decode-stub behavior, actor-pool
stage shape."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ent_res_feedback_ray.stages.multimodal import (
    ImageDecodeStage,
    binary_metadata_stage,
    image_features_stage,
)


def _binary_ds():
    df = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "payload": [b"\x89PNG\r\n\x1a\nfakedata" * (i + 1) for i in range(5)],
    })
    return ray.data.from_arrow(pa.Table.from_pandas(df))


def test_binary_metadata():
    out = binary_metadata_stage(_binary_ds()).to_pandas().sort_values("doc_id")
    assert out["n_bytes"].tolist() == [16 * (i + 1) for i in range(5)]
    assert (out["magic"] == "89504e470d0a1a0a").all()
    assert out["sha1"].str.len().eq(40).all()


def test_decode_stub_raises_without_optin():
    stage = ImageDecodeStage(allow_fake=False)
    with pytest.raises(NotImplementedError):
        stage.decode_one(b"xx")


def test_fake_decode_deterministic():
    stage = ImageDecodeStage(allow_fake=True)
    w1, h1, f1 = stage.decode_one(b"payload-bytes")
    w2, h2, f2 = stage.decode_one(b"payload-bytes")
    assert (w1, h1) == (w2, h2)
    assert np.array_equal(f1, f2)
    assert 1 <= w1 <= 64 and 1 <= h1 <= 64
    assert f1.shape == (8,) and abs(f1.sum() - 1.0) < 1e-9


def test_image_features_stage_schema():
    out = image_features_stage(_binary_ds(), allow_fake=True, concurrency=2)
    tbl = out.to_pandas().sort_values("doc_id")
    assert list(tbl.columns) == ["doc_id", "width", "height", "feature"]
    assert len(tbl) == 5
    assert all(len(f) == 8 for f in tbl["feature"])


def test_frame_sample_stage_explodes_and_gates():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data

    from ent_res_feedback_ray.stages.multimodal import frame_sample_stage

    payloads = [bytes(range(256)) * 2, b"tiny"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    }))
    out = frame_sample_stage(ds, allow_fake=True, every_n=2,
                             frame_bytes=64).to_pandas()
    assert set(out["doc_id"]) == {1, 2}
    assert (out[out.doc_id == 1]["frame_no"].tolist() == [0, 2, 4, 6])
    # determinism
    out2 = frame_sample_stage(ds, allow_fake=True, every_n=2,
                              frame_bytes=64).to_pandas()
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  out2.reset_index(drop=True))
    # stub gate: without allow_fake the stage refuses loudly
    with pytest.raises(Exception):
        frame_sample_stage(ds, allow_fake=False).materialize()


# --------------------------------------------------------------------------
# round 3: REAL resize kernel + REAL WAV audio decode
# --------------------------------------------------------------------------

def _wav_bytes(freq=440.0, sr=8000, seconds=0.5, amp=0.5, n_ch=1):
    import numpy as np
    t = np.arange(int(sr * seconds)) / sr
    x = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    if n_ch == 2:
        x = np.column_stack([x, x]).reshape(-1)
    data = x.tobytes()
    import struct
    fmt = struct.pack("<HHIIHH", 1, n_ch, sr, sr * 2 * n_ch, 2 * n_ch, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_wav_roundtrip_and_stereo_downmix():
    import numpy as np

    from ent_res_feedback_ray.stages.multimodal import decode_wav

    sr, x = decode_wav(_wav_bytes())
    assert sr == 8000 and len(x) == 4000
    assert np.isclose(np.abs(x).max(), 0.5, atol=0.01)
    sr2, x2 = decode_wav(_wav_bytes(n_ch=2))
    assert sr2 == 8000 and len(x2) == 4000
    assert np.allclose(x, x2, atol=1e-4)
    import pytest

    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all, definitely not")


def test_audio_feature_stage_physics():
    """RMS of a 0.5-amp sine is 0.5/sqrt(2); ZCR is 2*f/sr per sample."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from ent_res_feedback_ray.stages.multimodal import audio_features_stage

    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([_wav_bytes(freq=440.0), _wav_bytes(freq=880.0)],
                            pa.binary()),
    })
    out = audio_features_stage(ray.data.from_arrow(tbl)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (out["sample_rate"] == 8000).all()
    assert (out["n_windows"] == 3).all()  # 4000 samples / 1024
    assert np.allclose(out["rms_mean"], 0.5 / np.sqrt(2), atol=0.01)
    assert np.isclose(out.loc[0, "zcr_mean"], 2 * 440 / 8000, atol=0.01)
    assert np.isclose(out.loc[1, "zcr_mean"], 2 * 880 / 8000, atol=0.01)


def test_audio_stage_non_wav_raises_unless_fake():
    import pyarrow as pa
    import pytest
    import ray.data

    from ent_res_feedback_ray.stages.multimodal import audio_features_stage

    tbl = pa.table({"doc_id": pa.array([1], pa.int64()),
                    "payload": pa.array([b"mp3junk" * 10], pa.binary())})
    with pytest.raises(Exception):
        audio_features_stage(ray.data.from_arrow(tbl)).to_pandas()
    out = audio_features_stage(ray.data.from_arrow(tbl),
                               allow_fake=True).to_pandas()
    assert len(out) == 1 and out["sample_rate"].iloc[0] == 8000


def test_resize_nearest_exact():
    import numpy as np

    from ent_res_feedback_ray.stages.multimodal import resize_nearest

    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    small = resize_nearest(px, 2, 2)
    assert small.tolist() == [[0, 2], [8, 10]]
    big = resize_nearest(px, 8, 8)
    assert big.shape == (8, 8)
    assert (np.unique(big) == np.unique(px)).all()


def test_image_resize_stage_shapes():
    import pyarrow as pa
    import ray.data

    from ent_res_feedback_ray.stages.multimodal import image_resize_stage

    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "payload": pa.array([b"x" * 500, b"y" * 300], pa.binary())})
    out = image_resize_stage(ray.data.from_arrow(tbl),
                             allow_fake=True).to_pandas()
    assert len(out) == 2
    assert all(len(v) == 64 for v in out["thumb"])
