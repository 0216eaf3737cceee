"""CLI entry point — ``ray job submit -- python -m graph_data_science_ray.run ...``.

Subcommands mirror the reference's procedure surface (north rule: jobs
run via ray job submit):

    ingest   <pages.parquet> <out_dir> [--buckets N] [--concurrency N]
    pagerank <edges_path> [--out DIR] [--iterations N] [--damping D]
             [--tolerance T] [--shards P] [--engine csr|dataflow]
             [--checkpoint-dir DIR] [--resume] [--top-k K]
    wcc      <edges_path> [--out DIR] [--engine csr|dataflow] ...
    lpa      <edges_path> [--out DIR] [--iterations N] ...
    triangles <edges_path> [--out DIR] [--max-degree N]

The script owns the Ray session (guarded init — under ``ray job submit``
RAY_ADDRESS is set and init attaches to the running cluster; standalone
it starts local).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# idle Ray worker poll loops starve driver-side numpy on this host
# (BENCH/BASELINE.md) — session owners reap idle workers fast
os.environ.setdefault("RAY_idle_worker_killing_time_threshold_ms", "2000")
os.environ.setdefault("RAY_num_workers_soft_limit", "8")


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")


def _edges(path: str, weighted: bool):
    from graph_data_science_ray.sources.edges import read_edges

    return read_edges(path, weighted=weighted)


def _finish(res, args, algo: str):
    from graph_data_science_ray.pipelines.modes import stats, stream, write

    out = {"algorithm": algo, **stats(res)}
    if getattr(args, "top_k", None):
        top = stream(res, top_k=args.top_k).to_pandas()
        out["top_k"] = top.to_dict("records")
    if args.out:
        write(res, args.out)
        out["written"] = args.out
    print(json.dumps(out, default=float))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="graph_data_science_ray.run")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest")
    pi.add_argument("pages")
    pi.add_argument("out_dir")
    pi.add_argument("--buckets", type=int, default=64)
    pi.add_argument("--concurrency", type=int, default=8)

    def graph_parser(name):
        pp = sub.add_parser(name)
        pp.add_argument("edges")
        pp.add_argument("--out", default=None)
        pp.add_argument("--engine", choices=["csr", "dataflow"], default="csr")
        pp.add_argument("--shards", type=int, default=8)
        pp.add_argument("--weighted", action="store_true")
        pp.add_argument("--checkpoint-dir", default=None)
        pp.add_argument("--resume", action="store_true")
        pp.add_argument("--top-k", type=int, default=None)
        pp.add_argument("--hub-threshold", type=int, default=100_000)
        return pp

    ppr = graph_parser("pagerank")
    ppr.add_argument("--iterations", type=int, default=20)
    ppr.add_argument("--damping", type=float, default=0.85)
    ppr.add_argument("--tolerance", type=float, default=1e-7)
    pw = graph_parser("wcc")
    pw.add_argument("--iterations", type=int, default=100)
    pl = graph_parser("lpa")
    pl.add_argument("--iterations", type=int, default=10)
    pt = sub.add_parser("triangles")
    pt.add_argument("edges")
    pt.add_argument("--out", default=None)
    pt.add_argument("--max-degree", type=int, default=None)
    pt.add_argument("--top-k", type=int, default=None)

    args = p.parse_args(argv)
    _init_ray()
    t0 = time.time()

    if args.cmd == "ingest":
        from graph_data_science_ray.pipelines.ingest import ingest_pages

        stats_ = ingest_pages(
            args.pages, args.out_dir, num_buckets=args.buckets, concurrency=args.concurrency
        )
        print(json.dumps({"algorithm": "ingest", **stats_, "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "triangles":
        from graph_data_science_ray.algos.triangles import triangle_count

        res = triangle_count(_edges(args.edges, False), max_degree=args.max_degree)

        class _A:  # minimal args shim for _finish
            out = args.out
            top_k = args.top_k

        _finish(res, _A, "triangles")
        return 0

    weighted = args.weighted
    ckpt = None
    if args.checkpoint_dir:
        from graph_data_science_ray.checkpoint import CheckpointManager

        cfg = {"cmd": args.cmd, "weighted": weighted}
        if args.cmd == "pagerank":
            cfg.update({"damping": args.damping, "tolerance": args.tolerance})
        ckpt = CheckpointManager(
            args.checkpoint_dir, cfg, num_partitions=args.shards,
            value_name={"pagerank": "rank", "wcc": "component", "lpa": "label"}[args.cmd],
        )

    if args.engine == "csr":
        from graph_data_science_ray.sources.edges import drop_self_loops, symmetrize
        from graph_data_science_ray.state.engine import CsrEngine

        edges = _edges(args.edges, weighted)
        if args.cmd in ("wcc", "lpa"):
            edges = symmetrize(edges, dedup=not weighted)
            if args.cmd == "lpa":
                edges = drop_self_loops(edges)
        eng = CsrEngine.build(
            edges, num_shards=args.shards, weighted=weighted, hub_threshold=args.hub_threshold
        )
        if args.cmd == "pagerank":
            res = eng.pagerank(
                damping=args.damping, max_iterations=args.iterations,
                tolerance=args.tolerance, checkpoint=ckpt, resume=args.resume,
            )
        elif args.cmd == "wcc":
            res = eng.wcc(max_iterations=args.iterations, checkpoint=ckpt, resume=args.resume)
        else:
            res = eng.label_propagation(
                max_iterations=args.iterations, checkpoint=ckpt, resume=args.resume
            )
    else:
        if args.cmd == "pagerank":
            from graph_data_science_ray.algos.pagerank import pagerank

            res = pagerank(
                _edges(args.edges, weighted), damping=args.damping,
                max_iterations=args.iterations, tolerance=args.tolerance,
                weighted=weighted, checkpoint=ckpt, resume=args.resume,
            )
        elif args.cmd == "wcc":
            from graph_data_science_ray.algos.wcc import wcc

            res = wcc(
                _edges(args.edges, weighted), max_iterations=args.iterations,
                checkpoint=ckpt, resume=args.resume,
            )
        else:
            from graph_data_science_ray.algos.labelprop import label_propagation

            res = label_propagation(
                _edges(args.edges, weighted), max_iterations=args.iterations,
                weighted=weighted, checkpoint=ckpt, resume=args.resume,
            )

    _finish(res, args, args.cmd)
    return 0


if __name__ == "__main__":
    sys.exit(main())
