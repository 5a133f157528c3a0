"""Runnable ER pipeline entrypoint — the ``ray job submit`` target.

    python scripts/run_pipeline.py --input /root/testdata/sf0.001 \
        --output /tmp/er_out [--rounds 2] [--threshold 0.5] [--resume]

Runs the flagship blocking→scoring→clustering pipeline (or the feedback loop
with --rounds > 0 over a synthesized pages fixture) and writes the
north-rule resumable layout:

    out/
      round=R/stage=assignments/part-*.parquet + _SUCCESS
      round=R/stage=counters/...                       (per-block lineage)
      round=R/stage=round/{labels.parquet,model.npz,metrics.json,_SUCCESS}

A rerun with --resume skips every stage directory carrying _SUCCESS.
On a real cluster this script is submitted via
``ray job submit -- python scripts/run_pipeline.py ...`` — it owns the Ray
session (guarded init), unlike the library code.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="sf dir (documents.parquet …)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--rounds", type=int, default=0,
                    help=">0: run the feedback loop over a synthetic pages fixture")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    t0 = time.time()
    if args.rounds > 0:
        from ent_res_feedback_ray.pipelines.feedback import run_feedback_rounds
        from ent_res_feedback_ray.sources.pages import write_synthetic_pages

        fixture_dir = os.path.join(args.output, "fixture")
        pages_path = os.path.join(fixture_dir, "pages.parquet")
        if not os.path.exists(pages_path):
            write_synthetic_pages(fixture_dir, n_entities=120, seed=42)
        history = run_feedback_rounds(
            pages_path, os.path.join(fixture_dir, "gold.parquet"),
            args.output, n_rounds=args.rounds, threshold=args.threshold,
            resolve_kwargs={"use_key_blocks": False, "use_lsh": True})
        print(json.dumps({"rounds": len(history), "last": history[-1],
                          "sec": round(time.time() - t0, 1)}))
    else:
        from ent_res_feedback_ray.pipelines.er import load_pages, resolve_pages
        from ent_res_feedback_ray.state.checkpoint import (
            is_complete, stage_dir, write_checkpoint)

        a_dir = stage_dir(args.output, 0, "assignments")
        c_dir = stage_dir(args.output, 0, "counters")
        if args.resume and is_complete(a_dir) and is_complete(c_dir):
            print(json.dumps({"skipped": True, "assignments": a_dir}))
            ray.shutdown()
            return 0
        pages = load_pages(args.input)
        result = resolve_pages(pages, threshold=args.threshold)
        write_checkpoint(result["assignments"], a_dir)
        write_checkpoint(result["counters"], c_dir)
        n = result["assignments"].count()
        print(json.dumps({"assignments": a_dir, "rows": n,
                          "sec": round(time.time() - t0, 1)}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
