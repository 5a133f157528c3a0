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
