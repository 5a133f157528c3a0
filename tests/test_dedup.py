

def test_paragraph_dedup_keeps_first_occurrence():
    """Corpus-level repeated-paragraph removal (Lee et al. 2022 style):
    boilerplate repeated across docs survives only at its first
    (doc_id, idx) occurrence; unique and short paragraphs pass through."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.stages.dedup import paragraph_dedup

    boiler = "subscribe to our newsletter for more content every week " * 2
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            f"unique alpha paragraph with plenty of characters here\n\n{boiler}",
            f"{boiler}\n\nunique beta paragraph with plenty of characters here",
            "unique gamma paragraph with plenty of characters here\n\nshort",
            f"{boiler}\n\n{boiler}",
        ],
    })
    out = paragraph_dedup(ray.data.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 4
    # doc 0 holds the first occurrence → keeps everything
    assert boiler in out.loc[0, "text"] and out.loc[0, "n_dropped"] == 0
    # docs 1 and 3 lose their copies
    assert boiler not in out.loc[1, "text"]
    assert "unique beta" in out.loc[1, "text"]
    assert out.loc[1, "n_dropped"] == 1
    assert out.loc[3, "text"] == "" and out.loc[3, "n_dropped"] == 2
    # short paragraph is never examined
    assert out.loc[2, "text"].endswith("short")
    assert out.loc[2, "n_dropped"] == 0
    # paragraph counts
    assert out["n_paras"].tolist() == [2, 2, 2, 2]
