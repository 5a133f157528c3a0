

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


def test_paragraph_dedup_matches_duckdb_twin():
    """Full SQL-twin parity for paragraph_dedup (window-function oracle:
    first occurrence by (doc_id, idx) per repeated paragraph, short
    paragraphs exempt) on a corpus with planted cross-doc boilerplate."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.stages.dedup import paragraph_dedup

    rng = np.random.default_rng(7)
    boiler = ["all rights reserved contact us about the team careers " * 2,
              "cookie consent banner text that follows you everywhere " * 2]
    rows = []
    for d in range(40):
        paras = [f"unique body paragraph {d} " + "x" * int(rng.integers(0, 60))]
        if d % 3 == 0:
            paras.append(boiler[0])
        if d % 5 == 0:
            paras.insert(0, boiler[1])
        if d % 7 == 0:
            paras.append("tiny")
        rows.append((d, "\n\n".join(paras)))
    docs = pd.DataFrame(rows, columns=["doc_id", "text"])

    out = paragraph_dedup(ray.data.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("docs", docs)
    sql = """
    WITH paras AS (
      SELECT doc_id,
             unnest(string_split(text, chr(10) || chr(10))) AS para,
             unnest(generate_series(1, len(string_split(text, chr(10) || chr(10))))) - 1 AS idx
      FROM docs
    ), marked AS (
      SELECT *,
        CASE WHEN len(para) >= 40
             THEN row_number() OVER (PARTITION BY para ORDER BY doc_id, idx)
             ELSE 1 END AS rn
      FROM paras
    )
    SELECT doc_id,
           coalesce(string_agg(para, chr(10) || chr(10) ORDER BY idx)
                    FILTER (WHERE rn = 1), '') AS text,
           count(*) AS n_paras,
           CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dropped
    FROM marked GROUP BY doc_id ORDER BY doc_id
    """
    ora = con.execute(sql).fetchdf()
    pd.testing.assert_frame_equal(
        out.astype({"n_paras": "int64", "n_dropped": "int64"}),
        ora.astype({"n_paras": "int64", "n_dropped": "int64"}))
    assert (out["n_dropped"] > 0).any()


def test_winnow_dedup_pairs_planted(tmp_path):
    """Winnowing-fingerprint near-dup: a doc sharing a long verbatim span
    with another is flagged with high containment overlap; unrelated docs
    are not."""
    import numpy as np
    import pandas as pd

    from ent_res_feedback_ray.stages.dedup import winnow_dedup_pairs

    span = ("the quick brown fox jumps over the lazy dog near the river "
            "bank every single morning before sunrise " * 3)
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            span + " unique tail alpha content here",
            "different opening words " + span,
            "totally unrelated document about quarterly earnings and "
            "financial statements for the fiscal year " * 3,
            "another unrelated piece on cooking pasta with fresh basil "
            "and ripe tomatoes from the garden " * 3,
        ],
        "lang": ["en"] * 4,
        "source": ["t"] * 4,
        "n_chars": [0] * 4,
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.to_parquet(sf / "documents.parquet", index=False)
    out = winnow_dedup_pairs(str(sf)).to_pandas()
    pairs = set(zip(out["id1"], out["id2"]))
    assert (0, 1) in pairs
    assert all(p == (0, 1) for p in pairs)
    row = out.set_index(["id1", "id2"]).loc[(0, 1)]
    assert row["overlap"] >= 0.5


def test_span_dedup_keeps_first_occurrence():
    """Exact token-span dedup (Lee et al. 2022 analog): a copied >=span_len
    token run survives only at its first (doc_id, start) occurrence, at ANY
    offset in the copying doc (stride-1 windows)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.stages.dedup import span_dedup

    run = " ".join(f"r{i}" for i in range(25))  # a 25-token run
    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": [
            "lead tokens here " + run + " tail tokens",
            "totally different prefix of seven tokens yes " + run,
            "short unique doc with no duplicated content at all",
        ],
    })
    out = span_dedup(ray.data.from_pandas(docs), span_len=20).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "n_tokens_removed"] == 0
    assert "r0" in out.loc[0, "text"] and "r24" in out.loc[0, "text"]
    # doc 1 loses the whole copied run (every token covered by a dup window)
    assert out.loc[1, "n_tokens_removed"] == 25
    assert "r0" not in out.loc[1, "text"]
    assert out.loc[1, "text"].startswith("totally different")
    assert out.loc[2, "n_tokens_removed"] == 0


def test_span_dedup_matches_duckdb_twin(tmp_path):
    """Full SQL-twin parity for span_dedup: stride-1 window election by
    (doc_id, start), coverage semantics (token dropped iff covered by any
    losing window)."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.stages.dedup import span_dedup

    L = 12
    rng = np.random.default_rng(9)
    vocab = np.array([f"t{i}" for i in range(40)])
    texts = []
    for d in range(30):
        texts.append(" ".join(rng.choice(vocab, int(rng.integers(8, 40)))))
    # plant cross-doc copies at misaligned offsets
    runA = texts[0].split()[2:2 + L + 4]
    texts[7] = " ".join(texts[7].split()[:5] + runA + texts[7].split()[5:])
    texts[19] = " ".join(runA + texts[19].split())
    # an in-doc repeat
    runB = [f"b{i}" for i in range(L)]
    texts[11] = " ".join(runB + texts[11].split()[:6] + runB)
    docs = pd.DataFrame({"doc_id": np.arange(30, dtype=np.int64),
                         "text": texts})

    out = span_dedup(ray.data.from_pandas(docs), span_len=L).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("docs", docs)
    sql = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM docs
    ),
    wins AS (
      SELECT doc_id, i - 1 AS start,
             array_to_string(list_slice(ts, i, i + {L - 1}), ' ') AS w
      FROM toks, unnest(range(1, len(ts) - {L} + 2)) AS u(i)
      WHERE len(ts) >= {L}
    ),
    marked AS (
      SELECT *, row_number() OVER (PARTITION BY w ORDER BY doc_id, start) rn,
             count(*) OVER (PARTITION BY w) cnt
      FROM wins
    ),
    drops AS (SELECT doc_id, start FROM marked WHERE cnt >= 2 AND rn > 1),
    tokidx AS (
      SELECT doc_id, unnest(ts) AS tok,
             unnest(generate_series(1, len(ts))) - 1 AS p, len(ts) AS n
      FROM toks
    ),
    keep AS (
      SELECT t.doc_id, t.tok, t.p, t.n,
        NOT EXISTS (SELECT 1 FROM drops d WHERE d.doc_id = t.doc_id
                    AND t.p >= d.start AND t.p < d.start + {L}) AS k
      FROM tokidx t
    )
    SELECT doc_id,
      coalesce(string_agg(tok, ' ' ORDER BY p) FILTER (WHERE k), '') AS text,
      any_value(n) AS n_tokens,
      CAST(count(*) FILTER (WHERE NOT k) AS BIGINT) AS n_tokens_removed
    FROM keep GROUP BY doc_id ORDER BY doc_id
    """
    ora = con.execute(sql).fetchdf()
    pd.testing.assert_frame_equal(
        out.astype({"n_tokens": "int64", "n_tokens_removed": "int64"}),
        ora.astype({"n_tokens": "int64", "n_tokens_removed": "int64"}))
    assert (out["n_tokens_removed"] > 0).sum() >= 3


def test_neardup_keep_set_matches_duckdb_recursive_twin(tmp_path):
    """pairs → connected components → keeper election, against a DuckDB
    recursive-CTE (min-label reachability) twin on planted dup CHAINS:
    a~b and b~c but a!~c must still land in ONE cluster (transitive
    closure — the property a pair-list alone doesn't give you)."""
    import duckdb
    import numpy as np
    import pandas as pd

    from ent_res_feedback_ray.stages.dedup import (neardup_keep_set,
                                                   neardup_keep_set_sql)

    base = ("large language models are trained on deduplicated web corpora "
            "because repeated content wastes compute and hurts quality ")
    rows = []
    for d in range(12):
        fam, pos = divmod(d, 3)
        # family-specific token suffix → cross-family jaccard is 0
        words = [f"{w}{fam}" for w in base.split()]
        # chain: member 1 shares a prefix with 0 and a suffix with 2,
        # while 0 and 2 overlap less
        if pos == 1:
            txt = " ".join(words)
        elif pos == 0:
            txt = " ".join(words[: int(len(words) * 0.8)]) + " head variant"
        else:
            txt = "tail variant " + " ".join(words[int(len(words) * 0.2):])
        rows.append({"doc_id": d, "text": txt, "lang": "en", "source": "t",
                     "n_chars": len(txt)})
    # plus singletons that must keep themselves
    for d in range(12, 16):
        rows.append({"doc_id": d,
                     "text": f"completely unrelated document {d} about "
                             f"topic {d * 7} with its own words only",
                     "lang": "en", "source": "t", "n_chars": 1})
    docs = pd.DataFrame(rows)
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.to_parquet(sf / "documents.parquet", index=False)

    got = (neardup_keep_set(str(sf), threshold=0.5, method="ngram")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(neardup_keep_set_sql(0.5)).df() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"dup_cluster_id": np.int64, "is_keeper": bool}),
        want.astype({"doc_id": np.int64, "dup_cluster_id": np.int64,
                     "is_keeper": bool}))
    # the planted chains actually closed transitively: 4 families of 3
    fam_sizes = got.groupby("dup_cluster_id").size()
    assert sorted(fam_sizes[fam_sizes > 1].tolist()) == [3, 3, 3, 3]
    assert got["is_keeper"].sum() == 4 + 4  # one keeper/family + singletons

    # the LSH scale path elects the same keepers on this high-sim corpus
    lsh = (neardup_keep_set(str(sf), threshold=0.5, method="minhash")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_series_equal(lsh["is_keeper"], got["is_keeper"])


def test_incremental_exact_dedup_matches_duckdb_twin(tmp_path):
    """New-shard-vs-frozen-store dedup: a shard doc whose fingerprint is in
    the store drops; within-shard duplicates keep only the min doc_id;
    bit-exact against the ANTI JOIN + window twin."""
    import duckdb
    import numpy as np
    import pandas as pd

    from ent_res_feedback_ray.stages.dedup import (
        incremental_exact_dedup_split, incremental_exact_dedup_sql)

    old_text = "an article already ingested in a previous crawl shard"
    rows = [{"doc_id": d, "text": f"{old_text} variant {d}"} for d in range(5)]
    rows += [
        {"doc_id": 10, "text": old_text + " variant 2"},   # in store → drop
        {"doc_id": 11, "text": "a genuinely new article about gardens"},
        {"doc_id": 12, "text": "A Genuinely NEW article about gardens!"},
        # normalizes equal to 11 → within-shard dup, 11 wins
        {"doc_id": 13, "text": "another new article about mountains"},
    ]
    docs = pd.DataFrame(rows).assign(lang="en", source="t", n_chars=1)
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.to_parquet(sf / "documents.parquet", index=False)

    got = (incremental_exact_dedup_split(str(sf), cutoff=10).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(incremental_exact_dedup_sql(10)).df() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": np.int64}), want.astype({"doc_id": np.int64}))
    assert got["doc_id"].tolist() == [11, 13]


def test_incremental_minhash_dedup_lsh_filter():
    """New shard vs frozen band store, LSH-only mode: exact and near copies
    of stored docs are dropped; fresh docs survive."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.stages.dedup import (
        band_store, incremental_minhash_dedup)

    base = ("the quick brown fox jumps over the lazy dog while the "
            "miller grinds wheat beside the old stone bridge at dawn")
    old = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "text": [f"{base} variant {i} " + " ".join(
            f"tok{i}{j}" for j in range(20)) for i in range(10)],
    })
    new = pd.DataFrame({
        "doc_id": np.arange(100, 106, dtype=np.int64),
        "text": [
            old.loc[3, "text"],                       # exact copy → drop
            old.loc[4, "text"] + " tail",             # near copy → drop
            "completely different content about rivers and mountains "
            + " ".join(f"u{j}" for j in range(30)),   # fresh → keep
            "another unrelated note on cooking and music "
            + " ".join(f"v{j}" for j in range(30)),   # fresh → keep
            old.loc[7, "text"].replace("variant", "edition"),  # near → drop
            "third novel doc " + " ".join(f"w{j}" for j in range(40)),
        ],
    })
    store = band_store(ray.data.from_pandas(old))
    out = incremental_minhash_dedup(
        ray.data.from_pandas(new), store).to_pandas()
    kept = set(out["doc_id"])
    assert 100 not in kept and 101 not in kept and 104 not in kept
    assert {102, 103, 105} <= kept
    assert set(out.columns) == {"doc_id", "text"}


def test_incremental_minhash_dedup_verified_matches_bruteforce():
    """Verified mode equals the brute-force jaccard-vs-store decision on a
    high-similarity fixture (LSH recall 1 there), and is a SUPERSET of
    brute-force survivors in general (LSH can only miss candidates)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.stages.dedup import (
        band_store, incremental_minhash_dedup)
    from ent_res_feedback_ray.stages.fastfeatures import (
        batch_pair_shingle_jaccard)
    from ent_res_feedback_ray.functions.textnorm import normalize_text

    rng = np.random.default_rng(11)
    vocab = [f"word{i}" for i in range(50)]
    old = pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64),
        "text": [" ".join(rng.choice(vocab, size=30)) for _ in range(20)],
    })
    new_rows = []
    for i in range(12):
        if i % 3 == 0:  # near copy of an old doc
            t = old.loc[i, "text"] + " extra"
        else:
            t = " ".join(rng.choice(vocab, size=30))
        new_rows.append({"doc_id": 1000 + i, "text": t})
    new = pd.DataFrame(new_rows)

    thr = 0.5
    # brute-force decision
    drops = set()
    for _, nr in new.iterrows():
        for _, orow in old.iterrows():
            j = batch_pair_shingle_jaccard(
                [normalize_text(nr["text"])], [normalize_text(orow["text"])])[0]
            if not np.isnan(j) and j >= thr:
                drops.add(nr["doc_id"])
                break
    expected = set(new["doc_id"]) - drops

    store = band_store(ray.data.from_pandas(old))
    out = incremental_minhash_dedup(
        ray.data.from_pandas(new), store,
        old_docs=ray.data.from_pandas(old), threshold=thr).to_pandas()
    got = set(out["doc_id"])
    assert expected <= got            # LSH misses only ADD survivors
    planted = {1000 + i for i in range(12) if i % 3 == 0}
    assert not (planted & got)        # high-sim plants always verified+dropped
    assert got - expected == set()    # verify kills every LSH false positive


def test_semdedup_planted_duplicates():
    """SemDeDup recovers planted near-identical vectors: exactly one
    survivor per duplicate set, and the survivor is the member with the
    LOWEST centroid similarity (paper keep rule; ties break on vec_id)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.stages.dedup import semdedup

    rng = np.random.default_rng(7)
    d = 16
    base = rng.normal(size=(20, d))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = [base[i] for i in range(20)]
    # plant a triple of near-duplicates of vector 0 (tiny distinct jitters)
    for j in range(3):
        v = base[0] + 1e-3 * (j + 1) * base[1]
        vecs.append(v / np.linalg.norm(v))
    emb = pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": [v.tolist() for v in vecs],
    })
    out = semdedup(ray.data.from_pandas(emb), eps=0.05, n_centroids=4,
                   seed=42).to_pandas().sort_values("vec_id")
    assert len(out) == len(vecs)
    dup_ids = [0, 20, 21, 22]
    dup = out[out["vec_id"].isin(dup_ids)]
    # the planted set collapses to one cluster and exactly one survivor
    assert dup["cluster"].nunique() == 1
    assert int(dup["keep"].sum()) == 1
    survivor = int(dup.loc[dup["keep"], "vec_id"].iloc[0])
    assert survivor == int(dup.loc[dup["centroid_sim"].idxmin(), "vec_id"])
    # non-duplicate vectors all survive
    rest = out[~out["vec_id"].isin(dup_ids)]
    assert rest["keep"].all()


def test_semdedup_determinism_and_oracle_consistency(sf_dir):
    """Same seed → identical keep set across runs; every dropped vector
    has a kept within-cluster neighbor at cosine ≥ 1-eps (keep-rule
    soundness), checked against exact cosines from the raw table."""
    import numpy as np
    import pandas as pd

    from ent_res_feedback_ray.stages.dedup import semdedup_keep_set

    eps = 0.55
    a = semdedup_keep_set(sf_dir, eps=eps).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    b = semdedup_keep_set(sf_dir, eps=eps).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    raw = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    raw = raw.set_index("vec_id").loc[a["vec_id"].to_numpy()]
    M = np.stack(raw["embedding"].to_numpy()).astype(np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    S = M @ M.T
    keep = a["keep"].to_numpy()
    cluster = a["cluster"].to_numpy()
    assert (~keep).sum() > 0, "fixture should contain semantic near-dups"
    for i in np.nonzero(~keep)[0]:
        mates = (cluster == cluster[i]) & keep
        assert (S[i, mates] >= 1 - eps - 1e-9).any(), \
            f"dropped vec {a['vec_id'][i]} has no kept neighbor"
