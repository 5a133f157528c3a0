"""Deterministic text normalization.

Reference analog: ``normalize_text`` (/root/reference/s2and/text.py:312-338):
ascii-fold → lower → (optional apostrophe strip) → non-alphanumeric → space →
collapse whitespace.  Re-implemented from scratch; the hot path is a
pyarrow.compute kernel chain (zero Python per row), with a scalar fallback
used for tests and for strings containing non-ASCII codepoints.

The per-row invariant of the engine ("byte-identical extracted text per url")
is pinned by golden tests in ``tests/test_textnorm.py`` — the same input byte
string always yields the same output byte string, independent of batch or
partition boundaries.

DuckDB-oracle parity: ``normalize_text`` on ASCII input is exactly
``trim(regexp_replace(lower(strip_accents(s)), '[^a-z0-9]+', ' ', 'g'))``.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

try:  # optional: exact reference-parity transliteration when available
    from unidecode import unidecode as _unidecode  # type: ignore
except ImportError:  # pragma: no cover - not installed in this environment
    _unidecode = None

_NON_ALNUM = re.compile(r"[^a-z0-9]+")
_WS = re.compile(r"\s+")


def ascii_fold(s: str) -> str:
    """Fold to ASCII: unidecode when installed, else NFKD + drop combining
    marks + drop remaining non-ASCII.  Deterministic either way."""
    if _unidecode is not None:
        return _unidecode(s)
    decomposed = unicodedata.normalize("NFKD", s)
    return "".join(
        ch for ch in decomposed if not unicodedata.combining(ch) and ord(ch) < 128
    )


def normalize_text(s: str | None) -> str:
    """Scalar normalizer (reference semantics, /root/reference/s2and/text.py:312-338)."""
    if s is None:
        return ""
    if not s.isascii():
        s = ascii_fold(s)
    s = s.lower()
    s = _NON_ALNUM.sub(" ", s)
    return s.strip()


def normalize_text_array(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized normalizer over an Arrow string column.

    Fast path is pure pyarrow.compute (lower → regex replace → trim); rows
    with non-ASCII bytes take the scalar path so output is identical to
    ``normalize_text`` row by row.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    is_ascii = pc.string_is_ascii(col)
    if not pc.all(is_ascii).as_py():
        # mixed batch: scalar path for the non-ASCII rows only
        py = col.to_pylist()
        mask = is_ascii.to_pylist()
        folded = [s if ok else ascii_fold(s) for s, ok in zip(py, mask)]
        col = pa.array(folded, type=pa.string())
    out = pc.utf8_lower(col)
    out = pc.replace_substring_regex(out, r"[^a-z0-9]+", " ")
    out = pc.utf8_trim_whitespace(out)
    return out


def tokens(s: str) -> list[str]:
    """Whitespace tokens of a normalized string."""
    return s.split()


def word_ngrams(words: list[str], n: int) -> list[str]:
    """Word n-grams joined by a single space (shingles)."""
    if len(words) < n:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


def char_ngrams(s: str, n: int) -> list[str]:
    """Character n-grams (reference analog get_text_ngrams,
    /root/reference/s2and/text.py:397-444 — simplified: no stopword carve)."""
    if len(s) < n:
        return [s] if s else []
    return [s[i : i + n] for i in range(len(s) - n + 1)]


NORMALIZE_SQL = (
    "trim(regexp_replace(lower(strip_accents({col})), '[^a-z0-9]+', ' ', 'g'))"
)
"""DuckDB expression equivalent to normalize_text for ASCII/latin input."""


def token_count_array(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Number of whitespace-separated tokens per row (vectorized)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    splits = pc.split_pattern_regex(col, r"\s+")
    counts = pc.list_value_length(splits)
    # empty string splits to [''] — count it as 0 tokens
    empty = pc.equal(pc.utf8_length(pc.utf8_trim_whitespace(col)), 0)
    return pc.if_else(empty, pa.scalar(0, pa.int32()), counts)


def stable_token_set_size(s: str) -> int:
    return len(set(s.split()))


__all__ = [
    "ascii_fold",
    "normalize_text",
    "normalize_text_array",
    "tokens",
    "word_ngrams",
    "char_ngrams",
    "token_count_array",
    "NORMALIZE_SQL",
]
