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

    def timed(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        # consume: force full execution
        if hasattr(out, "materialize"):
            out = out.materialize()
            n = out.count()
        else:
            n = len(out)
        timings[name] = round(time.perf_counter() - t0, 3)
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


def scaling_run(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    """Same input, two fresh processes at two parallelism levels."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir)
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    r_lo = run(lo)
    r_hi = run(hi)
    # scaling efficiency on the ER critical path (docs/sec) and on total
    tp_lo = r_lo["er_docs_per_sec"]
    tp_hi = r_hi["er_docs_per_sec"]
    eff_er = (tp_hi / tp_lo) / (hi / lo)
    eff_total = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "sf": sf_dir,
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "er_docs_per_sec_lo": tp_lo,
        "er_docs_per_sec_hi": tp_hi,
        "er_scaling_efficiency": round(eff_er, 3),
        "total_scaling_efficiency": round(eff_total, 3),
        "queries_lo": r_lo["queries"],
        "queries_hi": r_hi["queries"],
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        print(json.dumps(scaling_run(sf_dir)))
    else:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_benchmarks(sf_dir, num_cpus)))
