"""CLI entry points (the reference's six-scenario command dispatch,
nemo.py:433-464, re-expressed):

  python -m engine.cli synth --out DIR --convs N
  python -m engine.cli run --input DIR --out DIR [--buckets B]
  python -m engine.cli mentions --input DIR --out DIR [--levels ...]
  python -m engine.cli eval --gold DIR --pred DIR --keys subj,pred,obj
  python -m engine.cli docjson --input DIR --out DIR [--verbosity 0|1|2]
                               [--md-variant joint|md] [--include-lattices]
  python -m engine.cli serve --host H --port P

`docjson` is the batch analog of the reference's FastAPI surface
(api_main.py:470-742): Doc-shaped JSON per turn, verbosity-gated
fields, and the API route's standalone-`md` decode via --md-variant.
`serve` is the request-level analog of the same surface — the six
endpoints on a stdlib HTTP server (engine/serve.py).

On a real cluster these run via `ray job submit -- python -m engine.cli
run ...`; locally they auto-init Ray (guarded)."""

from __future__ import annotations

import argparse
import json


def _ensure_ray() -> bool:
    """Init Ray if this process doesn't own a session yet; returns
    whether WE started it (and so must shut it down)."""
    import ray

    started = not ray.is_initialized()
    if started:
        import os

        # under `ray job submit` RAY_ADDRESS points at the cluster; a
        # bare invocation (no env) starts a local session
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .pipeline import tune_for_session

    tune_for_session()
    return started


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="engine")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("synth")
    p.add_argument("--out", required=True)
    p.add_argument("--convs", type=int, default=1000)
    p.add_argument("--seed", type=int, default=42)

    p = sub.add_parser("run")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    # default None = auto_num_buckets from the input row count
    p.add_argument("--buckets", type=int, default=None)

    p = sub.add_parser("docjson")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--verbosity", type=int, default=0, choices=(0, 1, 2))
    p.add_argument("--md-variant", default="joint", choices=("joint", "md"))
    p.add_argument("--include-lattices", action="store_true")
    p.add_argument("--concurrency", type=int, default=4)

    p = sub.add_parser("mentions")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--levels", default=None)

    p = sub.add_parser("eval")
    p.add_argument("--gold", required=True)
    p.add_argument("--pred", required=True)
    p.add_argument("--keys", default="subj,pred,obj")

    p = sub.add_parser("query")
    p.add_argument("--name", required=True,
                   help="a queries() entry; --name list prints them")
    p.add_argument("--sf", default="/root/testdata/sf0.01")
    p.add_argument("--out", default=None,
                   help="parquet path; omit to print head to stdout")

    p = sub.add_parser("serve")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8090)

    args = ap.parse_args(argv)

    if args.cmd == "serve":
        # request-level surface (api_main.py analog) — pure per-sentence
        # chain, no Ray session (engine/serve.py docstring)
        from .serve import main as serve_main

        serve_main(args.host, args.port)
        return 0

    started = _ensure_ray()

    if args.cmd == "synth":
        from .synth import make_transcripts

        make_transcripts(args.out, args.convs, args.seed)
        print(json.dumps({"out": args.out, "convs": args.convs}))
    elif args.cmd == "run":
        from .pipeline import run_kg_pipeline

        metrics = run_kg_pipeline(args.input, args.out, num_buckets=args.buckets)
        print(json.dumps(metrics))
    elif args.cmd == "mentions":
        from .kgflow import SCENARIOS
        from .pipeline import mentions_dataset

        levels = tuple(args.levels.split(",")) if args.levels else SCENARIOS
        mentions_dataset(args.input, levels=levels).write_parquet(args.out)
        print(json.dumps({"out": args.out}))
    elif args.cmd == "docjson":
        from .docjson import DocJsonStage
        from .pipeline import read_transcripts

        read_transcripts(args.input).map_batches(
            DocJsonStage,
            fn_constructor_kwargs={
                "verbosity": args.verbosity,
                "include_lattices": args.include_lattices,
                "md_variant": args.md_variant,
            },
            batch_format="pandas",
            concurrency=args.concurrency,
        ).write_parquet(args.out)
        print(json.dumps({"out": args.out, "verbosity": args.verbosity,
                          "md_variant": args.md_variant}))
    elif args.cmd == "eval":
        import ray.data as rd

        from .eval import evaluate_datasets

        keys = args.keys.split(",")
        p_, r, f = evaluate_datasets(rd.read_parquet(args.gold),
                                     rd.read_parquet(args.pred), keys)
        print(json.dumps({"precision": p_, "recall": r, "f1": f}))
    elif args.cmd == "query":
        from .queries import QUERIES

        if args.name == "list":
            print(json.dumps(sorted(QUERIES)))
        else:
            if args.name not in QUERIES:
                raise SystemExit(f"unknown query {args.name!r}; "
                                 "try --name list")
            res = QUERIES[args.name](args.sf)
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            if args.out:
                df.to_parquet(args.out, index=False)
                print(json.dumps({"out": args.out, "rows": len(df)}))
            else:
                print(df.head(20).to_string())
                print(json.dumps({"rows": len(df)}))
    if started:
        import ray

        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
