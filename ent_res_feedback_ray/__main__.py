"""CLI entry points — the rebuild's analog of the reference's script
surface (/root/reference/e2e_scripts/*.py, /root/reference/scripts/*.py,
SLURM-launched there; `ray job submit python -m ent_res_feedback_ray ...`
on a cluster here).

Subcommands:
  query     run any registered driver query over an sf_dir, write parquet
  resolve   flagship ER: pages parquet → (doc_id, cluster_id) assignments,
            partitioned parquet + _SUCCESS (resumable layout)
  feedback  checkpointed feedback rounds over a pages+gold pair
  list      print the registered query names

Owns its Ray session (guarded init — the library itself never calls
ray.init, per the driver contract)."""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray(num_cpus: int | None = None):
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True,
                  "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(address="local", **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _queries() -> dict:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    return entry.queries()


def cmd_list(_args) -> int:
    for name in sorted(_queries()):
        print(name)
    return 0


def cmd_query(args) -> int:
    _ensure_ray(args.num_cpus)
    q = _queries()
    if args.name not in q:
        print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2
    out = q[args.name](args.sf_dir)
    import pandas as pd
    import ray.data

    if isinstance(out, ray.data.Dataset):
        if args.out:
            out.write_parquet(args.out)
            print(f"wrote {args.out}")
        else:
            print(out.to_pandas().to_string())
    else:
        df = out if isinstance(out, pd.DataFrame) else pd.DataFrame(out)
        if args.out:
            df.to_parquet(args.out if args.out.endswith(".parquet")
                          else os.path.join(args.out, "part-0.parquet"))
            print(f"wrote {args.out}")
        else:
            print(df.to_string())
    return 0


def cmd_resolve(args) -> int:
    _ensure_ray(args.num_cpus)
    import ray.data

    from .pipelines.er import resolve_pages
    from .state.checkpoint import write_checkpoint

    pages = ray.data.read_parquet(args.pages, file_extensions=["parquet"])
    result = resolve_pages(pages, use_key_blocks=not args.lsh_only,
                           use_lsh=True, threshold=args.threshold,
                           keep_features=False)
    counters_dir = args.out.rstrip("/") + "_counters"
    write_checkpoint(result["assignments"], args.out)
    write_checkpoint(result["counters"], counters_dir)
    n = ray.data.read_parquet(
        args.out, file_extensions=["parquet"]).count()
    print(json.dumps({"assignments": args.out, "counters": counters_dir,
                      "rows": n}))
    return 0


def cmd_pipeline(args) -> int:
    """Run a config-driven Stage-protocol pipeline: JSON config =
    [{"stage": name, ...kwargs}, ...] (pipelines/protocol.py), input
    pages parquet → output parquet checkpoint."""
    _ensure_ray(args.num_cpus)
    import ray.data

    from .pipelines.protocol import build_pipeline
    from .sources.tables import maybe_load_json
    from .state.checkpoint import write_checkpoint

    config = maybe_load_json(args.config)
    if not isinstance(config, list):
        print("pipeline config must be a JSON list of stage dicts",
              file=sys.stderr)
        return 2
    run = build_pipeline(config)
    ds = ray.data.read_parquet(args.pages, file_extensions=["parquet"])
    out = run(ds)
    write_checkpoint(out, args.out)
    n = ray.data.read_parquet(args.out, file_extensions=["parquet"]).count()
    print(json.dumps({"out": args.out, "rows": n}))
    return 0


def cmd_feedback(args) -> int:
    _ensure_ray(args.num_cpus)
    from .pipelines.feedback import run_feedback_rounds

    history = run_feedback_rounds(
        args.pages, args.gold, args.out, n_rounds=args.rounds,
        k_per_round=args.k_per_round,
        constraints_per_round=args.constraints_per_round)
    print(json.dumps(history))
    return 0


def cmd_export(args) -> int:
    _ensure_ray(args.num_cpus)
    import ray.data

    from .stages.packing import export_packed_corpus

    docs = ray.data.read_parquet(args.pages, file_extensions=["parquet"])
    res = export_packed_corpus(docs, args.out, budget=args.budget,
                               n_shards=args.shards, seed=args.seed,
                               method=args.hash)
    print(json.dumps(res))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ent_res_feedback_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list")

    q = sub.add_parser("query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    q.add_argument("--out", default=None)

    r = sub.add_parser("resolve")
    r.add_argument("--pages", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--threshold", type=float, default=0.5)
    r.add_argument("--lsh-only", action="store_true")

    pl = sub.add_parser("pipeline")
    pl.add_argument("--config", required=True)
    pl.add_argument("--pages", required=True)
    pl.add_argument("--out", required=True)

    f = sub.add_parser("feedback")
    f.add_argument("--pages", required=True)
    f.add_argument("--gold", required=True)
    f.add_argument("--out", required=True)
    f.add_argument("--rounds", type=int, default=3)
    f.add_argument("--k-per-round", type=int, default=100)
    f.add_argument("--constraints-per-round", type=int, default=0)

    e = sub.add_parser("export")
    e.add_argument("--pages", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--budget", type=int, default=2048)
    e.add_argument("--shards", type=int, default=16)
    e.add_argument("--seed", type=int, default=17)
    e.add_argument("--hash", choices=["md5", "splitmix"], default="splitmix")

    args = p.parse_args(argv)
    return {"list": cmd_list, "query": cmd_query, "resolve": cmd_resolve,
            "pipeline": cmd_pipeline, "feedback": cmd_feedback,
            "export": cmd_export}[args.cmd](args)


if __name__ == "__main__":
    raise SystemExit(main())
