"""Constraint chain — per-rule units, precedence, and the DuckDB twin of the
full chain (reference precedence chain /root/reference/s2and/data.py:776-891;
webtext analogs documented in stages/constraints.py)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ent_res_feedback_ray.stages.constraints import (
    DISALLOW,
    REQUIRE,
    canonical_url_array,
    constraint_stage,
    midtoken_initials,
)


def test_canonical_url_array():
    urls = [
        "https://www.example.com/a/b/",
        "http://example.com/a/b",
        "example.com/a/b",
        "https://example.com/a/b?utm=1",
        "https://example.com/a/b#frag",
        "ftp://www.example.com/a/b///",
        "",
        None,
    ]
    out = canonical_url_array(np.array(urls, dtype=object))
    assert list(out[:6]) == ["example.com/a/b"] * 6
    assert out[6] == "" and out[7] == ""


def test_midtoken_initials_window():
    assert midtoken_initials(np.array(["alpha beta gamma delta epsilon"],
                                      dtype=object))[0] == {"b", "g", "d"}
    assert midtoken_initials(np.array(["single"], dtype=object))[0] == frozenset()
    assert midtoken_initials(np.array([""], dtype=object))[0] == frozenset()


def _pairs_ds(rows):
    cols = ["id1", "id2", "norm_text1", "norm_text2", "lang1", "lang2",
            "url1", "url2"]
    df = pd.DataFrame(rows, columns=cols)
    return ray.data.from_pandas(df)


def test_full_chain_rules_and_precedence():
    rows = [
        # 1: same canonical url, different text → REQUIRE beats all disallows
        (1, 2, "alpha beta", "zzz yyy", "en", "fr",
         "https://www.h.com/x/", "http://h.com/x"),
        # 2: exact text same lang → REQUIRE
        (3, 4, "same text here", "same text here", "en", "en",
         "https://a.com/1", "https://b.com/2"),
        # 3: prefix-incompatible leading tokens → DISALLOW
        (5, 6, "alpha rest of doc", "beta rest of doc", "en", "en",
         "https://a.com/3", "https://b.com/4"),
        # 4: prefix-compatible but disjoint middle-token initials → DISALLOW
        (7, 8, "alpha bob carol dave x", "alpha xavier yuri zed x", "en", "en",
         "https://a.com/5", "https://b.com/6"),
        # 5: all compatible → NaN (model decides)
        (9, 10, "alpha bob carol dave", "alpha bob cat dog", "en", "en",
         "https://a.com/7", "https://b.com/8"),
        # 6: lang mismatch only → DISALLOW
        (11, 12, "alpha bob carol dave", "alpha bob cat dog", "en", "fr",
         "https://a.com/9", "https://b.com/10"),
    ]
    out = constraint_stage(_pairs_ds(rows), prefix_rule=True,
                           midtoken_rule=True, url_rule=True) \
        .to_pandas().sort_values("id1")["constraint"].tolist()
    assert out[0] == REQUIRE
    assert out[1] == REQUIRE
    assert out[2] == DISALLOW
    assert out[3] == DISALLOW
    assert np.isnan(out[4])
    assert out[5] == DISALLOW


def test_alias_overrides_prefix_disallow():
    rows = [(1, 2, "foo rest", "bar rest", "en", "en",
             "https://a.com/1", "https://b.com/2")]
    no_alias = constraint_stage(_pairs_ds(rows), prefix_rule=True) \
        .to_pandas()["constraint"].iloc[0]
    with_alias = constraint_stage(_pairs_ds(rows), prefix_rule=True,
                                  alias_pairs=[("foo", "bar")]) \
        .to_pandas()["constraint"].iloc[0]
    assert no_alias == DISALLOW
    assert with_alias == REQUIRE


def test_constraint_chain_matches_duckdb(sf_dir):
    import __ray_entry__ as entry
    from ent_res_feedback_ray.pipelines.er import constraint_chain

    ray_df = constraint_chain(sf_dir).to_pandas()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')")
    sql = entry.oracle_sql()["er_constraint_chain"]
    ora = con.execute(sql).fetchdf()

    key = ["block_key", "id1", "id2"]
    a = ray_df.sort_values(key).reset_index(drop=True)
    b = ora.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    pd.testing.assert_frame_equal(
        a[key], b[key].astype(a[key].dtypes.to_dict()))
    av = a["constraint_val"].to_numpy(np.float64)
    bv = b["constraint_val"].to_numpy(np.float64)
    assert np.array_equal(np.isnan(av), np.isnan(bv))
    assert np.allclose(av[~np.isnan(av)], bv[~np.isnan(bv)])
    # the chain must actually FIRE on real data: at least one disallow
    assert (av[~np.isnan(av)] == DISALLOW).any()
