"""PII redaction + benchmark decontamination (stages/curation.py)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data


def test_redact_pii_planted_cases():
    from ent_res_feedback_ray.stages.curation import redact_pii

    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [
            "write to alice.smith+spam@mail-host.example.org today",
            "server at 192.168.0.1 and 10.0.0.255 responded",
            "call +1-555-0199 or +44-20-7946-0958 now",
            "no pii here at all",
            "mixed bob@x.io via 8.8.8.8 dial +1-202-555-0100",
        ],
    })
    out = redact_pii(ray.data.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["n_emails"].tolist() == [1, 0, 0, 0, 1]
    assert out["n_ips"].tolist() == [0, 2, 0, 0, 1]
    assert out["n_phones"].tolist() == [0, 0, 2, 0, 1]
    assert out.loc[0, "redacted_text"] == "write to <EMAIL> today"
    assert out.loc[1, "redacted_text"] == "server at <IP> and <IP> responded"
    assert out.loc[2, "redacted_text"] == "call <PHONE> or <PHONE> now"
    assert out.loc[3, "redacted_text"] == "no pii here at all"
    assert out.loc[4, "redacted_text"] == "mixed <EMAIL> via <IP> dial <PHONE>"


def test_pii_redaction_matches_duckdb_twin(tmp_path):
    """Full oracle parity for the registered query (planting projection
    included) on a synthetic documents table."""
    from ent_res_feedback_ray.stages.curation import (PII_REDACTION_SQL,
                                                      pii_redaction)

    rng = np.random.default_rng(11)
    words = np.array(["alpha", "beta", "gamma", "delta", "nine"])
    docs = pa.table({
        "doc_id": pa.array(np.arange(60, dtype=np.int64)),
        "text": pa.array([" ".join(rng.choice(words, 8)) for _ in range(60)]),
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(docs, sf / "documents.parquet")

    out = pii_redaction(str(sf)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    ora = con.execute(PII_REDACTION_SQL + " ORDER BY doc_id").fetchdf()
    pd.testing.assert_frame_equal(
        out[ora.columns.tolist()], ora, check_dtype=False)
    # every planted class fired
    assert out["n_emails"].sum() == 30
    assert out["n_phones"].sum() == 20
    assert out["n_ips"].sum() == 12


def _dup_corpus(n_docs: int = 60, mod: int = 10) -> pd.DataFrame:
    """Corpus where docs copy a run of >=13 tokens from benchmark docs
    (doc_id % mod == 0) — deterministic."""
    rng = np.random.default_rng(5)
    vocab = np.array([f"w{i}" for i in range(50)])
    texts = []
    bench_runs = {}
    for d in range(n_docs):
        toks = list(rng.choice(vocab, 30))
        if d % mod == 0:
            bench_runs[d] = toks[5:20]  # a 15-token run
        texts.append(" ".join(toks))
    # plant contamination: docs 1 mod 10 copy the previous benchmark run
    for d in range(n_docs):
        if d % mod == 1 and (d - 1) in bench_runs:
            toks = texts[d].split()
            texts[d] = " ".join(toks[:10] + bench_runs[d - 1] + toks[10:])
    return pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64),
                         "text": texts})


def test_decontaminate_flags_planted_overlap():
    from ent_res_feedback_ray.stages.curation import decontaminate

    docs = _dup_corpus()
    out = decontaminate(ray.data.from_pandas(docs), n=13, bench_mod=10) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # benchmark docs excluded from output
    assert not (out["doc_id"] % 10 == 0).any()
    flagged = set(out.loc[out["contaminated"], "doc_id"])
    planted = {d for d in range(60) if d % 10 == 1}
    assert planted <= flagged
    # a 15-token copied run contains 3 distinct 13-grams
    assert (out.set_index("doc_id").loc[sorted(planted),
            "n_overlap_ngrams"] >= 3).all()


def test_decontaminate_matches_duckdb_twin(tmp_path):
    from ent_res_feedback_ray.stages.curation import (decontaminate_docs,
                                                      decontaminate_sql)

    docs = _dup_corpus(80, mod=10)
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.Table.from_pandas(docs), sf / "documents.parquet")

    out = decontaminate_docs(str(sf), n=13, bench_mod=10).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    ora = con.execute(decontaminate_sql(n=13, bench_mod=10)
                      + " ORDER BY doc_id").fetchdf()
    pd.testing.assert_frame_equal(
        out[ora.columns.tolist()], ora, check_dtype=False)
    assert out["contaminated"].any()


def test_bench_ngram_cap_is_loud():
    from ent_res_feedback_ray.stages import curation

    old = curation.BENCH_NGRAM_CAP
    curation.BENCH_NGRAM_CAP = 2
    try:
        docs = _dup_corpus(30, mod=3)
        with pytest.raises(Exception, match="cap"):
            curation.decontaminate(
                ray.data.from_pandas(docs), n=13, bench_mod=3).to_pandas()
    finally:
        curation.BENCH_NGRAM_CAP = old


def test_quality_repetition_metrics(tmp_path):
    """Gopher-style repetition columns on doc_quality: top-bigram mass and
    duplicate-trigram fraction, hand-computed pins + NULL edges."""
    from ent_res_feedback_ray.stages.textstats import quality_scores

    docs = pa.table({
        "doc_id": pa.array(np.arange(4, dtype=np.int64)),
        "text": pa.array([
            "a b a b a b",      # bigrams ab,ba,ab,ba,ab -> top 3/5; tri dup 0.5
            "x y z w",           # all bigrams distinct -> 1/3; tri dup 0.0
            "solo",              # no bigrams/trigrams -> NULL
            "",                  # empty -> NULL everywhere
        ]),
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(docs, sf / "documents.parquet")
    out = quality_scores(str(sf)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "top_bigram_ratio"] == 3 / 5
    assert out.loc[0, "dup_trigram_ratio"] == 0.5
    assert out.loc[1, "top_bigram_ratio"] == 1 / 3
    assert out.loc[1, "dup_trigram_ratio"] == 0.0
    assert np.isnan(out.loc[2, "top_bigram_ratio"])
    assert np.isnan(out.loc[3, "dup_trigram_ratio"])


def test_canonicalize_url_goldens():
    from ent_res_feedback_ray.stages.curation import canonicalize_url_array

    urls = pa.array([
        "HTTPS://DUP.Example.COM:443/shared/7?utm_source=feed&id=3#frag",
        "https://a.example.com/doc/5/",
        "http://b.example.com:80/x?gclid=xyz&utm_medium=a",
        "https://c.example.com/p?id=1&utm_term=q&ref=hp",
        "https://d.example.com",
        "not a url",
    ])
    out = canonicalize_url_array(urls).to_pylist()
    assert out == [
        "https://dup.example.com/shared/7?id=3",
        "https://a.example.com/doc/5",
        "http://b.example.com/x",
        "https://c.example.com/p?id=1",
        "https://d.example.com",
        "not a url",
    ]


def test_url_dedup_matches_duckdb_twin(tmp_path):
    """First-per-canonical-URL election vs a DuckDB twin built from the
    same regex chain (CANONICAL_URL_SQL_EXPR), with planted mirrors,
    tracking junk, case noise and default ports."""
    from ent_res_feedback_ray.stages.curation import (
        CANONICAL_URL_SQL_EXPR, url_dedup)

    rows = []
    for d in range(60):
        if d % 5 == 1:
            u = f"https://MIRROR.Example.COM:443/shared/{d // 5}?utm_source=x"
        elif d % 5 == 2:
            u = f"https://mirror.example.com/shared/{d // 5}/#frag"
        else:
            u = f"https://s{d % 3}.example.com/doc/{d}"
            if d % 2 == 0:
                u += f"?utm_campaign=c{d}&fbclid=z"
            if d % 7 == 0:
                u += "#top"
    	# noqa
        rows.append((d, u))
    pages = pd.DataFrame(rows, columns=["doc_id", "url"])

    out = url_dedup(ray.data.from_pandas(pages)).to_pandas() \
        .sort_values("canonical_url").reset_index(drop=True)

    con = duckdb.connect()
    con.register("pages", pages)
    expr = CANONICAL_URL_SQL_EXPR.replace("{U}", "url")
    ora = con.execute(f"""
        SELECT {expr} AS canonical_url,
               min(doc_id) AS keeper_doc_id,
               count(*) - 1 AS n_dups
        FROM pages GROUP BY 1 ORDER BY 1
    """).fetchdf()
    pd.testing.assert_frame_equal(
        out.astype({"keeper_doc_id": "int64", "n_dups": "int64"}),
        ora.astype({"keeper_doc_id": "int64", "n_dups": "int64"}))
    # the planted mirror pairs collapsed: shared/{k} groups have 1 dup each
    assert (out.loc[out["canonical_url"].str.contains("/shared/"),
                    "n_dups"] == 1).all()


def test_quality_filter_matches_duckdb_twin(tmp_path):
    """Gopher-rule composite filter: first-violated-rule reasons match the
    SQL twin on crafted rule-trippers plus word-soup filler."""
    from ent_res_feedback_ray.stages.curation import (quality_filter,
                                                      quality_filter_sql)

    rng = np.random.default_rng(3)
    vocab = np.array([f"tok{i}" for i in range(30)])
    texts = [
        "a b c d e f",                      # mean_token_len < 2
        "the the the word word",            # stopword_ratio > 0.5
        "word word word word word word",    # uniq_token_ratio < 0.2
        "ab cd ab cd ab cd pq rs tu vw",    # top_bigram_ratio > 0.25
        "",                                 # empty
        "reasonable unique sentence with several different tokens inside",
    ] + [" ".join(rng.choice(vocab, 25)) for _ in range(40)]
    docs = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(docs, sf / "documents.parquet")

    out = quality_filter(str(sf)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    ora = con.execute(quality_filter_sql() + " ORDER BY doc_id").fetchdf()
    pd.testing.assert_frame_equal(out[ora.columns.tolist()], ora,
                                  check_dtype=False)
    assert out["reason"].tolist()[:6] == [
        "mean_token_len", "stopword_ratio", "uniq_token_ratio",
        "top_bigram_ratio", "empty", ""]


def test_curate_corpus_every_arm_matches_composed_twin(tmp_path):
    """The full curation funnel (benchmark > exact_dup > lang > quality >
    contaminated, survivors paragraph-deduped + PII-redacted) against the
    composed DuckDB twin, on a corpus crafted to hit EVERY drop arm."""
    from ent_res_feedback_ray.stages.curation import (curate_corpus,
                                                      curate_corpus_sql)

    boiler = ("subscribe to the newsletter and follow the weekly updates "
              "from a team of writers in the field ")
    bench_text = ("the quick brown fox jumps over the lazy dog in a "
                  "sunny meadow of wild flowers near the river")
    keepers = {
        1: "the first article is a long note about rivers and it keeps "
           "a steady mix of words in every line\n\n" + boiler,
        2: boiler + "\n\nthe second article is a different note about "
                    "mountains and it is written in plain words",
        3: "the third piece is a mail note to a friend at "
           "someone@example.org about the plan for a trip in the fall",
    }
    rows = []
    for d, t in keepers.items():
        rows.append({"doc_id": d, "text": t, "lang": "en"})
    # 0 mod 7 → benchmark (also the contamination source)
    rows.append({"doc_id": 0, "text": bench_text, "lang": "en"})
    # exact dup pair: 4 is canonical, 5 drops (same normalized text)
    dup = ("the fourth article is a short clean note about the sea and "
           "a boat trip in the morning sun with friends")
    rows.append({"doc_id": 4, "text": dup, "lang": "en"})
    rows.append({"doc_id": 5, "text": dup.upper(), "lang": "en"})
    # lang drop: German marker words dominate
    rows.append({"doc_id": 6, "text": "der hund und die katze das haus "
                                      "ist ein tier und der baum", "lang": "de"})
    # quality drop: stopword saturation
    rows.append({"doc_id": 8, "text": "the and of to a in is " * 6,
                 "lang": "en"})
    # contaminated: shares a 5-gram with benchmark doc 0
    rows.append({"doc_id": 9, "text": "the quick brown fox jumps over a "
                                      "fence and the story is a new one "
                                      "in every other way told by a kid",
                 "lang": "en"})
    docs = pd.DataFrame(rows).assign(source="t")
    docs["n_chars"] = docs["text"].str.len()
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.to_parquet(sf / "documents.parquet", index=False)

    got = (curate_corpus(str(sf), n=5, bench_mod=7).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(curate_corpus_sql(n=5, bench_mod=7)).df() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": np.int64, "kept": bool,
                    "n_paras_dropped": np.int64}),
        want[got.columns].astype({"doc_id": np.int64, "kept": bool,
                                  "n_paras_dropped": np.int64}))

    byid = got.set_index("doc_id")
    assert byid.loc[0, "drop_stage"] == "benchmark"
    assert byid.loc[4, "kept"] and byid.loc[5, "drop_stage"] == "exact_dup"
    assert byid.loc[6, "drop_stage"] == "lang"
    assert byid.loc[8, "drop_stage"] == "quality"
    assert byid.loc[9, "drop_stage"] == "contaminated"
    # survivors: boilerplate kept only at its first occurrence, PII gone
    assert boiler.strip() in byid.loc[1, "curated_text"]
    assert boiler.strip() not in byid.loc[2, "curated_text"]
    assert byid.loc[2, "n_paras_dropped"] == 1
    assert "<EMAIL>" in byid.loc[3, "curated_text"]
    assert "someone@example.org" not in byid.loc[3, "curated_text"]


def _dsir_corpora():
    """Raw corpus = half 'science' vocab, half 'spam' vocab; target
    sample = science-only.  DSIR must rank the science half higher."""
    sci = ("quantum entanglement spectroscopy theorem lattice boson "
           "manifold tensor eigenvalue proof").split()
    spam = ("click free winner prize offer deal buy now cheap "
            "subscribe").split()
    rng = np.random.default_rng(11)
    raw = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": [" ".join(rng.choice(sci if i < 20 else spam, size=30))
                 for i in range(40)],
    })
    target = pd.DataFrame({
        "doc_id": np.arange(1000, 1010, dtype=np.int64),
        "text": [" ".join(rng.choice(sci, size=30)) for _ in range(10)],
    })
    return raw, target


def test_dsir_weights_separate_domains_and_are_partition_invariant():
    from ent_res_feedback_ray.stages.curation import dsir_importance_weights

    raw, target = _dsir_corpora()
    w = dsir_importance_weights(
        ray.data.from_pandas(raw), ray.data.from_pandas(target)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    w2 = dsir_importance_weights(
        ray.data.from_pandas(raw).repartition(7),
        ray.data.from_pandas(target).repartition(3)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert w["logweight"].tolist() == w2["logweight"].tolist()
    sci_w = w.loc[w["doc_id"] < 20, "logweight"]
    spam_w = w.loc[w["doc_id"] >= 20, "logweight"]
    # every science doc outranks every spam doc in this clean separation
    assert sci_w.min() > spam_w.max()
    assert (sci_w > 0).all() and (spam_w < 0).all()
    assert (w["n_tokens"] == 30).all()


def test_dsir_select_enriches_target_and_is_deterministic():
    from ent_res_feedback_ray.stages.curation import dsir_select

    raw, target = _dsir_corpora()
    sel = dsir_select(ray.data.from_pandas(raw),
                      ray.data.from_pandas(target), k=15,
                      seed=17).to_pandas()
    sel2 = dsir_select(ray.data.from_pandas(raw).repartition(5),
                       ray.data.from_pandas(target), k=15,
                       seed=17).to_pandas()
    assert sel["doc_id"].tolist() == sel2["doc_id"].tolist()
    assert len(sel) == 15
    # heavy target enrichment (noise-free top-k would be 15/15 science;
    # gumbel at scale 1 may admit a stray spam doc on a 40-doc corpus)
    assert (sel["doc_id"] < 20).sum() >= 13
    # scale→0 degrades to exact top-k by weight: all-science selection
    hard = dsir_select(ray.data.from_pandas(raw),
                       ray.data.from_pandas(target), k=15,
                       gumbel_scale=0.0).to_pandas()
    assert (hard["doc_id"] < 20).all()
    # a different seed reshuffles the gumbel draw (weights unchanged)
    other = dsir_select(ray.data.from_pandas(raw),
                        ray.data.from_pandas(target), k=15,
                        seed=99).to_pandas()
    assert set(other["doc_id"]) != set(sel["doc_id"]) or \
        other["doc_id"].tolist() != sel["doc_id"].tolist()
