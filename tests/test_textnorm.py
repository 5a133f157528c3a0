"""Normalizer goldens — the byte-identical-per-input invariant
(FIXTURES.md §D; reference goldens /root/reference/tests/test_text.py:14-19)."""

import pyarrow as pa
import pytest

from ent_res_feedback_ray.functions.textnorm import (
    char_ngrams,
    normalize_text,
    normalize_text_array,
    token_count_array,
    word_ngrams,
)
from ent_res_feedback_ray.stages.normalize import extract_text_from_html


GOLDENS = [
    ("Hello, World!", "hello world"),
    ("  multiple   spaces\tand\nnewlines ", "multiple spaces and newlines"),
    ("café Résumé", "cafe resume"),
    ("UPPER lower MiXeD", "upper lower mixed"),
    ("digits 123 stay-456", "digits 123 stay 456"),
    ("", ""),
    ("!!!", ""),
    ("te'xt", "te xt"),  # apostrophe → space (non-alnum rule)
    (None, ""),
]


@pytest.mark.parametrize("raw,expected", GOLDENS)
def test_normalize_goldens(raw, expected):
    assert normalize_text(raw) == expected


def test_normalize_unicode_fold_deterministic():
    # without unidecode installed, non-ASCII non-decomposable chars drop;
    # the invariant is determinism + accent folding, pinned here
    assert normalize_text("te'漢字xt") == normalize_text("te'漢字xt")
    assert normalize_text("naïve Łódź") == normalize_text("naïve Łódź")
    assert normalize_text("àéîõü") == "aeiou"


def test_arrow_matches_scalar():
    raws = [g[0] for g in GOLDENS if g[0] is not None] + ["te'漢字xt", "ß straße"]
    arr = pa.array(raws, pa.string())
    out = normalize_text_array(arr).to_pylist()
    assert out == [normalize_text(r) for r in raws]


def test_normalize_idempotent():
    for raw, _ in GOLDENS:
        once = normalize_text(raw)
        assert normalize_text(once) == once


def test_ngrams():
    assert word_ngrams(["a", "b", "c", "d"], 3) == ["a b c", "b c d"]
    assert word_ngrams(["a", "b"], 3) == ["a b"]
    assert word_ngrams([], 3) == []
    assert char_ngrams("abcd", 2) == ["ab", "bc", "cd"]
    assert char_ngrams("a", 2) == ["a"]


def test_token_count_array():
    arr = pa.array(["a b c", "", "  ", "one", None], pa.string())
    assert token_count_array(arr).to_pylist() == [3, 0, 0, 1, 0]


def test_extract_text_from_html():
    html = b"<html><body><h1>Title</h1>\n<p>Some  text.</p></body></html>"
    assert extract_text_from_html(html) == "Title Some text."
    assert extract_text_from_html(None) == ""
    assert extract_text_from_html(b"") == ""
    # byte-identical per input: same bytes → same string, always
    assert extract_text_from_html(html) == extract_text_from_html(html)


def test_bpe_piece_regex_engine_parity():
    """BPE_PIECE_RE counts identically under pyarrow RE2 and DuckDB RE2
    (both engines run the exact same pattern string)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.compute as pc

    from ent_res_feedback_ray.stages.textstats import BPE_PIECE_RE

    texts = ["Hello world, it's 42 degrees!", "", "  spaces   and\ttabs",
             "naïve café №5", "a'b''c", "x" * 300]
    counts = pc.count_substring_regex(pa.array(texts), BPE_PIECE_RE).to_pylist()
    assert counts[0] == 8  # Hello/ world/,/ it/'s/ 42/ degrees/!
    con = duckdb.connect()
    for t, c in zip(texts, counts):
        d = con.execute("SELECT len(regexp_extract_all(?, ?))",
                        [t, BPE_PIECE_RE]).fetchone()[0]
        assert c == d, (t, c, d)


def test_fingerprints_matches_duckdb_twin(tmp_path):
    """doc_fingerprints retired from the driver registry (its md5 key is
    dedup_exact's grouping key) — the twin parity is pinned here instead."""
    import duckdb
    import numpy as np
    import pandas as pd

    from ent_res_feedback_ray.stages.textstats import (FINGERPRINTS_SQL,
                                                       fingerprints)

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["Héllo,  Wörld!", "hello world", "", "  ", "a b c",
                 "A-B_c"],
        "lang": ["en"] * 6, "source": ["t"] * 6,
    })
    docs["n_chars"] = docs["text"].str.len()
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.to_parquet(sf / "documents.parquet", index=False)

    got = fingerprints(str(sf)).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(FINGERPRINTS_SQL).df().sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype({"doc_id": np.int64}))
    # identical normalized content → identical key (the dedup_exact link)
    assert got.loc[0, "fingerprint"] == got.loc[1, "fingerprint"]
    assert got.loc[2, "fingerprint"] == got.loc[3, "fingerprint"]
