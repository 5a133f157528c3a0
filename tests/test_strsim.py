"""String-similarity goldens (reference analogs
/root/reference/tests/test_text.py:77-101) + DuckDB-parity spot checks."""

import math

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ent_res_feedback_ray.functions.strsim import (
    counter_jaccard,
    jaccard,
    jaro,
    jaro_winkler,
    levenshtein,
    levenshtein_sim,
    num_diff,
    prefix_dist,
)


def test_levenshtein_goldens():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "") == 3
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("flaw", "lawn") == 2


def test_jaro_winkler_goldens():
    assert jaro("martha", "marhta") == pytest.approx(0.9444444444444445)
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611111111111111)
    assert jaro_winkler("dixon", "dicksonx") == pytest.approx(0.8133333333333332)
    assert jaro_winkler("same", "same") == 1.0
    assert jaro_winkler("abc", "xyz") == 0.0


def test_duckdb_parity():
    con = duckdb.connect()
    cases = [("kitten", "sitting"), ("martha", "marhta"), ("dixon", "dicksonx"),
             ("abcdef", "f"), ("jellyfish", "smellyfish"), ("aaa", "aaa")]
    for a, b in cases:
        lev, jw = con.execute(
            "select levenshtein(?, ?), jaro_winkler_similarity(?, ?)",
            [a, b, a, b]).fetchone()
        assert levenshtein(a, b) == lev
        assert jaro_winkler(a, b) == pytest.approx(jw, abs=1e-12)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcde", max_size=12), st.text(alphabet="abcde", max_size=12))
def test_levenshtein_properties(a, b):
    d = levenshtein(a, b)
    assert d == levenshtein(b, a)
    assert d <= max(len(a), len(b))
    assert (d == 0) == (a == b)


def test_jaccards():
    assert jaccard({"a", "b"}, {"b", "c"}) == pytest.approx(1 / 3)
    assert math.isnan(jaccard(set(), {"a"}))
    assert math.isnan(jaccard(None, {"a"}))
    assert counter_jaccard({"a": 2, "b": 1}, {"a": 1, "c": 1}) == pytest.approx(1 / 4)
    assert counter_jaccard({"a": 1}, {"b": 1}) == 0.0
    # denominator clamp (reference featurizer.py:421,450 uses 5000)
    big_a = {str(i): 1 for i in range(100)}
    big_b = {str(i): 1 for i in range(50, 150)}
    assert counter_jaccard(big_a, big_b, denominator_max=100) == pytest.approx(0.5)


def test_prefix_and_diff():
    assert prefix_dist("abcd", "abxy") == pytest.approx(0.5)
    assert prefix_dist("abc", "abc") == 0.0
    assert math.isnan(prefix_dist("", "abc"))
    assert num_diff(3, 10) == 7
    assert num_diff(3, 100, clamp=50) == 50
    assert math.isnan(num_diff(None, 4))


def test_levenshtein_sim():
    assert levenshtein_sim("abcd", "abcd") == 1.0
    assert levenshtein_sim("abcd", "abce") == pytest.approx(0.75)
    assert math.isnan(levenshtein_sim("", "abc"))


def test_jaro_winkler_batch_parity():
    """The vectorized JW kernel must be bit-identical to the scalar spec AND
    to DuckDB's jaro_winkler_similarity (it feeds the jw_first oracle)."""
    import duckdb
    import numpy as np

    from ent_res_feedback_ray.functions.strsim import (
        encode_utf32,
        jaro_winkler_batch_encoded,
    )

    rng = np.random.default_rng(11)
    alpha = list("abcdef")
    strs = [""] + ["".join(rng.choice(alpha, size=rng.integers(1, 17)))
                   for _ in range(150)]
    xs = [strs[rng.integers(0, len(strs))] for _ in range(600)]
    ys = [strs[rng.integers(0, len(strs))] for _ in range(600)]
    A, la = encode_utf32(xs, 16)
    B, lb = encode_utf32(ys, 16)
    batch = jaro_winkler_batch_encoded(A, la, B, lb)
    for i in range(0, 600, 7):
        assert batch[i] == jaro_winkler(xs[i], ys[i]), (xs[i], ys[i])
    con = duckdb.connect()
    for i in range(0, 600, 23):
        db = con.execute("SELECT jaro_winkler_similarity(?, ?)",
                         [xs[i], ys[i]]).fetchone()[0]
        assert batch[i] == db, (xs[i], ys[i], batch[i], db)


def test_metric_lcs():
    import numpy as np

    from ent_res_feedback_ray.functions.strsim import metric_lcs

    def lcs_ref(a, b):
        m, n = len(a), len(b)
        dp = [[0] * (n + 1) for _ in range(m + 1)]
        for i in range(m):
            for j in range(n):
                dp[i + 1][j + 1] = (dp[i][j] + 1 if a[i] == b[j]
                                    else max(dp[i][j + 1], dp[i + 1][j]))
        return dp[m][n]

    rng = np.random.default_rng(5)
    for _ in range(60):
        a = "".join(rng.choice(list("abcd"), size=rng.integers(1, 12)))
        b = "".join(rng.choice(list("abcd"), size=rng.integers(1, 12)))
        expect = 1.0 - lcs_ref(a, b) / max(len(a), len(b))
        assert metric_lcs(a, b) == pytest.approx(expect, abs=1e-12), (a, b)
    assert math.isnan(metric_lcs("", "abc"))
    assert metric_lcs("abc", "abc") == 0.0


def test_equal_family_reference_semantics():
    import numpy as np

    from ent_res_feedback_ray.functions.strsim import (equal, equal_initial,
                                                       equal_middle)

    assert equal(" Foo", "foo ") == 1.0
    assert equal("foo", "bar") == 0.0
    assert np.isnan(equal("", "x")) and np.isnan(equal("-", "x"))
    assert np.isnan(equal(None, "x"))
    # middle: initials shortcut both directions
    assert equal_middle("j", "john") == 1.0
    assert equal_middle("john", "j") == 1.0
    assert equal_middle("john", "jane") == 0.0
    assert equal_middle("john", "john") == 1.0
    assert np.isnan(equal_middle("", "x"))
    # initial
    assert equal_initial(" Quark", "quasar") == 1.0
    assert equal_initial("a", "b") == 0.0
    assert np.isnan(equal_initial(None, "b"))
