"""Training-data export ops: deterministic shuffle, sequence packing,
heavy hitters — each pinned against a DuckDB twin or a pure-Python spec."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from ent_res_feedback_ray.stages.packing import (
    _greedy_pack,
    deterministic_shuffle,
    md5_u64,
    pack_sequences,
)
from ent_res_feedback_ray.stages.textstats import heavy_hitters, heavy_hitters_sql

SF = "/root/testdata/sf0.001"


def test_md5_u64_matches_duckdb():
    keys = [f"{i}|shuf17" for i in range(50)]
    ours = md5_u64(keys)
    theirs = duckdb.sql(
        "SELECT md5_number_lower(k) FROM (SELECT unnest(?) AS k)",
        params=[keys]).fetchnumpy()
    got = next(iter(theirs.values())).astype(np.uint64)
    assert np.array_equal(ours, got)


def test_deterministic_shuffle_matches_duckdb_order():
    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])
    out = deterministic_shuffle(docs, seed=17).to_pandas()
    ora = duckdb.sql(f"""
        SELECT doc_id FROM read_parquet('{SF}/documents.parquet')
        ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR) || '|shuf17'),
                 doc_id
    """).df()
    assert out["doc_id"].tolist() == ora["doc_id"].tolist()
    assert set(out.columns) == {"doc_id", "text"}  # hash dropped


def test_deterministic_shuffle_partition_invariant():
    df = pd.DataFrame({"doc_id": np.arange(200), "text": "x"})
    a = deterministic_shuffle(ray.data.from_pandas(df), seed=3) \
        .to_pandas()["doc_id"].tolist()
    b = deterministic_shuffle(
        ray.data.from_pandas(df).repartition(13), seed=3) \
        .to_pandas()["doc_id"].tolist()
    assert a == b
    assert a != sorted(a)  # it actually permutes


def test_greedy_pack_spec():
    pack, pos = _greedy_pack(np.array([5, 5, 5, 12, 1, 9, 2]), budget=10)
    # [5,5] | [5] | [12] oversized alone | [1,9] | [2]
    assert pack.tolist() == [0, 0, 1, 2, 3, 3, 4]
    assert pos.tolist() == [0, 1, 0, 0, 0, 1, 0]


def test_pack_sequences_invariants():
    rng = np.random.default_rng(7)
    n = 300
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [" ".join(["w"] * int(k))
                 for k in rng.integers(1, 40, size=n)],
    })
    budget = 64
    out = pack_sequences(ray.data.from_pandas(df), budget=budget,
                         n_shards=8, seed=5).to_pandas()
    # every doc exactly once
    assert sorted(out["doc_id"]) == list(range(n))
    g = out.groupby("pack_id")
    tot = g["n_tokens"].sum()
    sizes = g.size()
    # budget respected unless a single oversized doc owns the pack
    assert ((tot <= budget) | (sizes == 1)).all()
    # pack_pos is 0..len-1 within each pack
    assert (g["pack_pos"].max() + 1 == sizes).all()
    assert (g["pack_pos"].min() == 0).all()
    # pack_id namespace encodes the shard
    assert ((out["pack_id"].to_numpy(np.int64) >> 32)
            == out["shard"].to_numpy(np.int64)).all()
    # partition invariance
    out2 = pack_sequences(ray.data.from_pandas(df).repartition(11),
                          budget=budget, n_shards=8, seed=5).to_pandas()
    key = ["doc_id", "shard", "pack_id", "pack_pos", "n_tokens"]
    a = out.sort_values("doc_id")[key].reset_index(drop=True)
    b = out2.sort_values("doc_id")[key].reset_index(drop=True)
    assert a.equals(b)


def test_pack_sequences_oversized_doc_is_alone():
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["w " * 200, "w", "w w", "w " * 300, "w", "w"],
    })
    out = pack_sequences(ray.data.from_pandas(df), budget=16, n_shards=1,
                         seed=1).to_pandas()
    big = out[out["n_tokens"] > 16]
    assert len(big) == 2
    sizes = out.groupby("pack_id").size()
    assert (sizes.loc[big["pack_id"]] == 1).all()


def test_heavy_hitters_matches_bruteforce_oracle():
    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])
    k = 32
    out = heavy_hitters(docs, k=k)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    ora = con.execute(heavy_hitters_sql(k=k)).df()
    assert out["token"].tolist() == ora["token"].tolist()
    assert out["cnt"].tolist() == ora["cnt"].tolist()
    assert len(out) <= k


def test_heavy_hitters_planted_skew():
    """A token planted above the n/(k+1) threshold is always found with its
    exact count, regardless of batching."""
    rows = [{"doc_id": i, "text": "boiler plate " + f"unique{i} tail{i}"}
            for i in range(500)]
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(7)
    out = heavy_hitters(ds, k=8)
    got = dict(zip(out["token"], out["cnt"]))
    assert got.get("boiler") == 500
    assert got.get("plate") == 500
    assert not any(t.startswith("unique") for t in got)


def test_config_pipeline_shuffle_then_pack():
    """The export tail (shuffle → pack) composes from the Stage registry."""
    from ent_res_feedback_ray.pipelines.protocol import build_pipeline

    df = pd.DataFrame({"doc_id": np.arange(64, dtype=np.int64),
                       "text": "a b c d e"})
    run = build_pipeline([
        {"stage": "shuffle", "seed": 9},
        {"stage": "pack_sequences", "budget": 20, "n_shards": 4, "seed": 9},
    ])
    out = run(ray.data.from_pandas(df)).to_pandas()
    assert sorted(out["doc_id"]) == list(range(64))
    assert (out.groupby("pack_id")["n_tokens"].sum() <= 20).all()


def test_splitmix_shuffle_fast_path():
    """method='splitmix' (vectorized, no per-row Python) keeps the shuffle
    invariants: a deterministic, partition-invariant, seed-sensitive
    permutation."""
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                       "text": "x"})
    a = deterministic_shuffle(ray.data.from_pandas(df), seed=3,
                              method="splitmix").to_pandas()["doc_id"]
    b = deterministic_shuffle(ray.data.from_pandas(df).repartition(9),
                              seed=3, method="splitmix").to_pandas()["doc_id"]
    c = deterministic_shuffle(ray.data.from_pandas(df), seed=4,
                              method="splitmix").to_pandas()["doc_id"]
    assert a.tolist() == b.tolist()
    assert sorted(a) == list(range(300))
    assert a.tolist() != c.tolist() != sorted(a)


def test_column_quantiles_matches_duckdb():
    from ent_res_feedback_ray.stages.shuffleops import (
        column_quantiles, column_quantiles_sql)

    docs = ray.data.read_parquet(f"{SF}/lineitem.parquet",
                                 columns=["l_extendedprice"])
    out = column_quantiles(docs, "l_extendedprice")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{SF}/lineitem.parquet')")
    ora = con.execute(
        column_quantiles_sql("lineitem", "l_extendedprice")).df()
    a = out.sort_values("q").reset_index(drop=True)
    b = ora.sort_values("q").reset_index(drop=True)
    assert np.allclose(a["q"], b["q"])
    assert a["l_extendedprice"].tolist() == b["l_extendedprice"].tolist()


def test_column_quantiles_int_and_extremes():
    from ent_res_feedback_ray.stages.shuffleops import column_quantiles

    df = pd.DataFrame({"v": np.arange(101, dtype=np.int64)})
    out = column_quantiles(ray.data.from_pandas(df).repartition(7), "v",
                           qs=[0.0, 0.5, 1.0])
    assert out["v"].tolist() == [0, 50, 100]


def test_approx_distinct_error_and_invariance():
    from ent_res_feedback_ray.stages.textstats import approx_distinct

    df = pd.DataFrame({"v": (np.arange(30000, dtype=np.int64) % 7919)})
    a = approx_distinct(ray.data.from_pandas(df), "v")
    b = approx_distinct(ray.data.from_pandas(df).repartition(17), "v")
    assert a == b                      # register max is order-free
    assert abs(a - 7919) / 7919 < 0.05

    # token mode vs exact DuckDB count(distinct)
    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])
    est = approx_distinct(docs, "text", tokenize=True)
    exact = duckdb.sql(f"""
        SELECT count(DISTINCT token) FROM (
          SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
          FROM read_parquet('{SF}/documents.parquet')
          WHERE trim(text) <> '')
    """).fetchone()[0]
    assert abs(est - exact) / exact < 0.05


def test_group_topk_matches_duckdb_row_number():
    from ent_res_feedback_ray.stages.shuffleops import group_topk

    li = ray.data.read_parquet(f"{SF}/lineitem.parquet",
                               columns=["l_orderkey", "l_extendedprice",
                                        "l_linenumber"])
    out = group_topk(li.repartition(9), "l_orderkey", "l_extendedprice",
                     k=2, tie_cols=["l_linenumber"]).to_pandas()
    ora = duckdb.sql(f"""
        SELECT l_orderkey, l_extendedprice, l_linenumber FROM (
          SELECT *, row_number() OVER (
            PARTITION BY l_orderkey
            ORDER BY l_extendedprice DESC, l_linenumber) AS rn
          FROM read_parquet('{SF}/lineitem.parquet'))
        WHERE rn <= 2
    """).df()
    cols = ["l_orderkey", "l_extendedprice", "l_linenumber"]
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = ora[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_export_packed_corpus_resumes_per_shard(tmp_path):
    import os

    from ent_res_feedback_ray.stages.packing import export_packed_corpus

    df = pd.DataFrame({
        "doc_id": np.arange(120, dtype=np.int64),
        "text": ["tok " * (i % 9 + 1) for i in range(120)],
    })
    out = str(tmp_path / "export")
    r1 = export_packed_corpus(ray.data.from_pandas(df), out, budget=32,
                              n_shards=6, seed=2)
    assert r1 == {"n_shards": 6, "written": 6, "resumed": 0}
    full = ray.data.read_parquet(out, file_extensions=["parquet"]).to_pandas()
    assert sorted(full["doc_id"]) == list(range(120))
    assert (full.groupby("pack_id")["n_tokens"].sum() <= 32).all()
    assert "text" in full.columns

    # no-op resume: everything marked done
    r2 = export_packed_corpus(ray.data.from_pandas(df), out, budget=32,
                              n_shards=6, seed=2)
    assert r2 == {"n_shards": 6, "written": 0, "resumed": 6}

    # kill two shards → only those are rewritten, bytes elsewhere untouched
    import shutil

    mtimes = {s: os.path.getmtime(os.path.join(out, f"shard={s}", "_SUCCESS"))
              for s in range(6)}
    for s in (1, 4):
        shutil.rmtree(os.path.join(out, f"shard={s}"))
    r3 = export_packed_corpus(ray.data.from_pandas(df), out, budget=32,
                              n_shards=6, seed=2)
    assert r3 == {"n_shards": 6, "written": 2, "resumed": 4}
    for s in (0, 2, 3, 5):
        assert os.path.getmtime(
            os.path.join(out, f"shard={s}", "_SUCCESS")) == mtimes[s]
    again = ray.data.read_parquet(out, file_extensions=["parquet"]).to_pandas()
    key = ["doc_id", "pack_id", "pack_pos", "n_tokens"]
    a = full.sort_values("doc_id")[key].reset_index(drop=True)
    b = again.sort_values("doc_id")[key].reset_index(drop=True)
    assert a.equals(b)


def test_hashed_tfidf_vectors_similarity_pipeline():
    """Text → hashing-trick vectors → cosine: identical docs hit 1.0, a
    near-dup outranks unrelated docs, vectors are partition-invariant."""
    from ent_res_feedback_ray.stages.similarity import hashed_tfidf_vectors

    base = ("the miller grinds wheat beside the old stone bridge at dawn "
            "while carts roll past the frozen river toward the market")
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            base,
            base,                                   # identical → cos 1
            base + " and a single extra clause",    # near dup
            "unrelated text about volcanic rock formation and tides "
            "observed across the southern archipelago in winter storms",
        ],
    })
    vecs = hashed_tfidf_vectors(ray.data.from_pandas(df), dim=128) \
        .to_pandas().sort_values("vec_id")
    M = np.stack(vecs["embedding"].to_numpy())
    cos = M @ M.T
    assert cos[0, 1] == pytest.approx(1.0)
    assert cos[0, 2] > 0.9 > cos[0, 3]
    assert np.allclose(np.linalg.norm(M, axis=1), 1.0)

    vecs2 = hashed_tfidf_vectors(
        ray.data.from_pandas(df).repartition(3), dim=128) \
        .to_pandas().sort_values("vec_id")
    M2 = np.stack(vecs2["embedding"].to_numpy())
    assert np.array_equal(M, M2)


# ---------------------------------------------------------------------------
# hypothesis property pins for the new kernels
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=50), max_size=60),
       st.integers(min_value=1, max_value=40))
def test_greedy_pack_properties(tokens, budget):
    pack, pos = _greedy_pack(np.asarray(tokens, dtype=np.int64), budget)
    if not tokens:
        assert len(pack) == 0
        return
    # pack ids start at 0 and advance by at most 1, in order
    assert pack[0] == 0
    assert ((np.diff(pack) == 0) | (np.diff(pack) == 1)).all()
    # positions restart at 0 on every new pack and are contiguous
    expect_pos = 0
    for i in range(len(tokens)):
        if i and pack[i] != pack[i - 1]:
            expect_pos = 0
        assert pos[i] == expect_pos
        expect_pos += 1
    # each pack: total ≤ budget OR exactly one NON-EMPTY doc (zero-token
    # docs consume no budget, so they legitimately share an oversized pack)
    tot = {}
    nonempty = {}
    for p, t in zip(pack.tolist(), tokens):
        tot[p] = tot.get(p, 0) + t
        nonempty[p] = nonempty.get(p, 0) + (t > 0)
    for p in tot:
        assert tot[p] <= budget or nonempty[p] == 1
    # greedy is maximal: a new pack opens only because the doc didn't fit
    for i in range(1, len(tokens)):
        if pack[i] != pack[i - 1]:
            assert tot[pack[i - 1]] + tokens[i] > budget


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="abcdef", max_size=12), min_size=1,
                max_size=8),
       st.lists(st.text(alphabet="abcdef", max_size=12), min_size=1,
                max_size=8))
def test_myers_levenshtein_matches_scalar_dp(xs, ys):
    from ent_res_feedback_ray.functions.strsim import (
        levenshtein, levenshtein_batch_myers)

    n = min(len(xs), len(ys))
    xs, ys = xs[:n], ys[:n]
    got = levenshtein_batch_myers(xs, ys)
    want = np.array([levenshtein(a, b) for a, b in zip(xs, ys)])
    assert np.array_equal(got, want)


def test_splitmix64_injective_on_range():
    from ent_res_feedback_ray.functions.hashing import splitmix64

    x = np.arange(100_000, dtype=np.int64)
    h = splitmix64(x, seed=9)
    assert h.dtype == np.uint64
    assert len(np.unique(h)) == len(x)   # bijective finalizer → no collisions


def test_unigram_logloss_matches_duckdb_twin():
    from ent_res_feedback_ray.stages.textstats import (
        UNIGRAM_LOGLOSS_SQL, doc_unigram_logloss)

    out = doc_unigram_logloss(SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    ora = con.execute(UNIGRAM_LOGLOSS_SQL).df()
    cols = ["doc_id", "n_tokens", "logloss"]
    a = out[cols].sort_values("doc_id").reset_index(drop=True)
    b = ora[cols].sort_values("doc_id").reset_index(drop=True)
    b["n_tokens"] = b["n_tokens"].astype(np.int64)
    assert a.equals(b)


def test_unigram_logloss_orders_boilerplate_below_gibberish():
    from ent_res_feedback_ray.stages.textstats import unigram_logloss

    common = "the quick brown fox jumps over the lazy dog"
    df = pd.DataFrame({
        "doc_id": np.arange(12, dtype=np.int64),
        "text": [common] * 10 + [common + " zyxqv wvuqk jjqzx",
                                 "zzz qqq vvv kkk www yyy xxx"],
    })
    out = unigram_logloss(ray.data.from_pandas(df)).to_pandas() \
        .set_index("doc_id")["logloss"]
    assert out[0] < out[10] < out[11]   # boilerplate < mixed < gibberish


def test_approx_quantiles_rank_error_and_invariance():
    """Bottom-k priority-sample quantiles: partition-invariant (bottom-k
    is an order-free multiset reduce) and within the sketch's rank-error
    bound of the exact order statistics."""
    from ent_res_feedback_ray.stages.shuffleops import approx_quantiles

    n, k = 50_000, 2048
    df = pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "v": np.sqrt(np.arange(n, dtype=np.float64)),  # skewed but known
    })
    qs = [0.1, 0.5, 0.9, 0.99]
    a = approx_quantiles(ray.data.from_pandas(df), "v", "rid", qs=qs, k=k)
    b = approx_quantiles(ray.data.from_pandas(df).repartition(13), "v",
                         "rid", qs=qs, k=k)
    assert a["v"].tolist() == b["v"].tolist()
    # rank error: position of the estimate in the TRUE sorted data must be
    # within 5·sqrt(q(1-q)/k) of q (≈5σ of the sampling error)
    v_sorted = np.sort(df["v"].to_numpy())
    for q, est in zip(a["q"], a["v"]):
        rank = np.searchsorted(v_sorted, est) / (n - 1)
        tol = 5 * np.sqrt(max(q * (1 - q), 1e-4) / k)
        assert abs(rank - q) <= tol, (q, rank, tol)


def test_approx_quantiles_string_ids_and_empty():
    from ent_res_feedback_ray.stages.shuffleops import approx_quantiles

    df = pd.DataFrame({"rid": [f"id-{i}" for i in range(500)],
                       "v": np.arange(500, dtype=np.int64)})
    out = approx_quantiles(ray.data.from_pandas(df), "v", "rid",
                           qs=[0.0, 1.0], k=500)
    # k == n → the sample is exhaustive → exact extremes
    assert out["v"].tolist() == [0, 499]
    empty = approx_quantiles(
        ray.data.from_pandas(pd.DataFrame({"rid": pd.Series([], dtype=np.int64),
                                           "v": pd.Series([], dtype=float)})),
        "v", "rid", qs=[0.5])
    assert np.isnan(empty["v"]).all()
