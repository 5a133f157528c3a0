"""Two-voter language-ID ensemble (reference detect_language fastText×cld2
agreement, /root/reference/s2and/text.py:266-309): independent mechanisms
(word-boundary markers vs trigram substring mass), agreement-based
is_reliable, and a GENERATED DuckDB twin that can never drift from the
tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from ent_res_feedback_ray.stages.textstats import (
    LANG_ID_ENSEMBLE_SQL, _LANG_TRIGRAMS, lang_id_ensemble,
    lang_id_ensemble_batch)


def test_trigram_tables_are_discriminative():
    """Construction invariant: no trigram appears in two languages' tables
    (shared trigrams carry no vote signal and must be dropped)."""
    seen: dict = {}
    for c, tris in _LANG_TRIGRAMS.items():
        for t in tris:
            assert t not in seen, (t, c, seen[t])
            seen[t] = c
        assert 1 <= len(tris) <= 16


def test_ensemble_agreement_semantics():
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            # both voters say English, strong marker evidence → reliable
            "the cat and the dog went to the market in the morning",
            # marker words from one language, trigram mass from another:
            # French markers (le la les de) but the rest is English prose
            "le la les de consider considering consideration whichever",
            # no signal at all
            "zzz qqq 12345",
        ]),
    })
    out = lang_id_ensemble_batch(t).to_pandas()
    r1 = out[out.doc_id == 1].iloc[0]
    assert r1.pred_marker == "en" and r1.votes_agree and r1.is_reliable
    assert bool(r1.is_english)
    r3 = out[out.doc_id == 3].iloc[0]
    assert r3.pred_marker == "unk" and not r3.is_reliable
    # disagreement (whatever the votes) must imply not reliable
    assert ((out.votes_agree) | (~out.is_reliable)).all()


def test_lang_id_ensemble_duckdb_twin(sf_dir):
    got = (lang_id_ensemble(sf_dir).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    ora = (con.execute(LANG_ID_ENSEMBLE_SQL).df()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(got.columns) == list(ora.columns)
    for c in got.columns:
        a, b = got[c].to_numpy(), ora[c].to_numpy()
        assert np.array_equal(a, b), c
    # sanity: the two mechanisms mostly corroborate on clean fixture text
    assert got["votes_agree"].mean() > 0.5
