"""The web-page input table (`input_hint` schema) and its deterministic sources.

Schema (FIXTURES.md §A): ``(url:string, warc_ts:timestamp[us], html:binary,
text:large_string, lang:string)``.

Two sources:

1. ``load_pages(sf_dir)`` — derive pages *deterministically* from the driver's
   ``documents`` table so that every derived column is reproducible in ANSI
   SQL (``PAGES_CTE``) for the DuckDB oracle.  ``doc_id`` is retained as the
   integer key used by downstream oracle-checked queries.
2. ``synthesize_pages(...)`` — seeded generator planting entity clusters
   (near-duplicate pages across hosts) with a *separate* gold table, used by
   the pytest suite for end-to-end F1 gates (reference fixture analog:
   /root/reference/tests/dummy/ + clusters.json; recipe in FIXTURES.md §A).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .tables import read_table

# --- 1. pages derived from the documents table (SQL-reproducible) -----------

PAGES_CTE = """
pages AS (
  SELECT
    'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
    TIMESTAMP '2024-01-01 00:00:00' + to_minutes(doc_id) AS warc_ts,
    text,
    lang,
    doc_id
  FROM documents
)
""".strip()


def _derive_pages(batch: pa.Table) -> pa.Table:
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
    source = batch.column("source").to_pylist()
    urls = [f"https://{s}.example.com/doc/{d}" for s, d in zip(source, doc_id)]
    warc_ts = np.datetime64("2024-01-01T00:00:00", "us") + doc_id.astype(
        "timedelta64[m]"
    ).astype("timedelta64[us]")
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(warc_ts, pa.timestamp("us")),
            "text": batch.column("text"),
            "lang": batch.column("lang"),
            "doc_id": batch.column("doc_id"),
        }
    )


def load_pages(sf_dir: str, with_html: bool = False) -> ray.data.Dataset:
    """documents.parquet → pages Dataset (url, warc_ts, text, lang, doc_id).

    ``with_html=True`` adds the opaque ``html:binary`` column (not part of the
    SQL-checked surface; exercised by the multimodal stages).
    """
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    ds = ds.map_batches(_derive_pages, batch_format="pyarrow")
    if with_html:
        ds = ds.map_batches(_add_html, batch_format="pyarrow")
    return ds


def _add_html(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    html = [f"<html><body><p>{t}</p></body></html>".encode("utf-8") for t in texts]
    return batch.append_column("html", pa.array(html, pa.binary()))


# --- 2. synthetic pages with planted entities (tests / feedback rounds) -----

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega apple river stone cloud "
    "ember forest harbor island jungle meadow night ocean prairie quartz"
).split()

_LANGS = ("en", "en", "en", "fr", "de", "es")  # en-skewed like a real crawl


def synthesize_pages(
    n_entities: int = 120,
    mean_pages_per_entity: float = 3.0,
    n_hosts: int = 12,
    seed: int = 42,
    mega_host_fraction: float = 0.15,
    singleton_fraction: float = 0.3,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Seeded generator of (pages_df, gold_df).

    Per FIXTURES.md §A: each entity gets 1..K near-duplicate pages across
    hosts (token perturbations + case/punct/unicode noise that the normalizer
    must collapse); includes singletons, one skewed "mega-host", empty-text
    rows and non-English rows.  Gold labels live in the separate gold table.
    """
    rng = np.random.default_rng(seed)
    rows = []
    gold = []
    page_no = 0
    for ent in range(n_entities):
        base_len = int(rng.integers(20, 60))
        base_words = list(rng.choice(_WORDS, size=base_len))
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        if rng.random() < singleton_fraction:
            k = 1
        else:
            k = 1 + int(rng.poisson(mean_pages_per_entity - 1))
        for _ in range(max(1, k)):
            words = list(base_words)
            # token perturbations: drop / duplicate / swap a few tokens
            n_edits = int(rng.integers(0, max(2, base_len // 10)))
            for _ in range(n_edits):
                op = rng.integers(0, 3)
                pos = int(rng.integers(0, len(words)))
                if op == 0 and len(words) > 5:
                    words.pop(pos)
                elif op == 1:
                    words.insert(pos, words[pos])
                elif op == 2 and pos + 1 < len(words):
                    words[pos], words[pos + 1] = words[pos + 1], words[pos]
            text = " ".join(words)
            # surface noise the normalizer must collapse
            noise = rng.random()
            if noise < 0.2:
                text = text.upper()
            elif noise < 0.35:
                text = text.replace(" ", ",  ", 3) + "!"
            elif noise < 0.45:
                text = "café " + text  # accent fold check
            if rng.random() < mega_host_fraction:
                host = "mega.example.com"
            else:
                host = f"host{int(rng.integers(0, n_hosts))}.example.com"
            url = f"https://{host}/e{ent}/p{page_no}"
            ts = np.datetime64("2024-03-01T00:00:00", "us") + np.timedelta64(
                int(rng.integers(0, 90 * 24 * 3600)), "s"
            )
            rows.append(
                {
                    "url": url,
                    "warc_ts": ts,
                    "html": f"<html>{text}</html>".encode("utf-8"),
                    "text": text,
                    "lang": lang,
                }
            )
            gold.append({"url": url, "gold_entity_id": ent})
            page_no += 1
    # a few empty-text rows (their own singleton entities)
    for j in range(3):
        url = f"https://host0.example.com/empty/{j}"
        rows.append(
            {
                "url": url,
                "warc_ts": np.datetime64("2024-03-01T00:00:00", "us"),
                "html": b"<html></html>",
                "text": "",
                "lang": "en",
            }
        )
        gold.append({"url": url, "gold_entity_id": n_entities + j})
    pages = pd.DataFrame(rows)
    pages["warc_ts"] = pages["warc_ts"].astype("datetime64[us]")
    return pages, pd.DataFrame(gold)


def write_synthetic_pages(out_dir: str, **kwargs) -> tuple[str, str]:
    """Write pages.parquet + gold.parquet under ``out_dir``; returns paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    pages, gold = synthesize_pages(**kwargs)
    pages_path = os.path.join(out_dir, "pages.parquet")
    gold_path = os.path.join(out_dir, "gold.parquet")
    pages.to_parquet(pages_path, index=False)
    gold.to_parquet(gold_path, index=False)
    return pages_path, gold_path
