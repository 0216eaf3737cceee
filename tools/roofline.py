"""Memory-bandwidth roofline for the CSR PageRank gather-scatter kernel.

Round-1 scaling runs showed 8→32-vCPU efficiency ~0.41 with the plateau
diagnosed (not proven) as single-socket DRAM saturation. This tool
PROVES it with two measurements a skeptic can re-run, no Ray involved:

1. ``triad``: STREAM-triad bandwidth (c = a + s*b over ~200 MB arrays)
   in K parallel processes, K ∈ {1, 2, 4, 8, 16} — the box's practical
   aggregate DRAM ceiling and its per-core saturation curve.
2. ``kernel``: the EXACT per-iteration shard kernel from state/csr.py
   (`contrib = scaled[edge_srcpos]`; `np.bincount(dst_group, contrib)`)
   on synthetic shards shaped like the 48M-edge bench graph (P=16:
   3.02M edges, 125k srcs, sorted dst groups), again in K processes.

If aggregate kernel bytes/s flattens at the same K and the same GB/s as
triad, the plateau is the memory wall, not the implementation — i.e.
the kernel is bandwidth-optimal and vCPU legs on one socket cannot
evidence multi-node scaling (each real node adds its own channels).

Traffic model per edge (the "bytes/edge" multiplier, all streams that
must touch DRAM when the working set exceeds LLC):
  read edge_srcpos (8) + gather read from scaled (8, random within the
  125k-entry src table -> mostly LLC-resident, counted 0) + write
  contrib (8) + re-read contrib (8) + read dst_group (8) + sequential
  accumulate into agg (LLC-resident, 0) = 32 B/edge.

Usage: python tools/roofline.py [--quick] [--out BENCH/roofline_r2.json]
Run on a QUIET host (no Ray session alive — idle Ray workers steal
20-30% CPU each, BENCH/BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time

import numpy as np

BYTES_PER_EDGE = 32.0


def _triad_worker(n_elems: int, reps: int, q) -> None:
    a = np.ones(n_elems)
    b = np.full(n_elems, 2.0)
    c = np.empty(n_elems)
    # warm-up
    np.add(a, b, out=c)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.multiply(b, 0.5, out=c)
        np.add(c, a, out=c)
        best = min(best, time.perf_counter() - t0)
    # triad moves 3 arrays (read a, read b, write c) + 1 extra read of c
    # from the two-op form = 4 streams of 8 B
    q.put(4.0 * 8.0 * n_elems / best / 1e9)


def _kernel_worker(n_edges: int, n_src: int, n_groups: int, reps: int, seed: int, q) -> None:
    rng = np.random.default_rng(seed)
    edge_srcpos = rng.integers(0, n_src, n_edges).astype(np.int64)
    dst_group = np.sort(rng.integers(0, n_groups, n_edges)).astype(np.int64)
    scaled = rng.random(n_src)
    # warm-up
    contrib = scaled[edge_srcpos]
    np.bincount(dst_group, weights=contrib, minlength=n_groups)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        contrib = scaled[edge_srcpos]
        np.bincount(dst_group, weights=contrib, minlength=n_groups)
        best = min(best, time.perf_counter() - t0)
    q.put(n_edges / best)


def _fan(worker, args_fn, ks: list[int]) -> dict[int, float]:
    out: dict[int, float] = {}
    for k in ks:
        q: mp.Queue = mp.Queue()
        procs = [mp.Process(target=worker, args=args_fn(i) + (q,)) for i in range(k)]
        for p in procs:
            p.start()
        vals = [q.get() for _ in procs]
        for p in procs:
            p.join()
        out[k] = float(sum(vals))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    reps = 3 if args.quick else 7
    ks = [1, 2, 4, 8] if args.quick else [1, 2, 4, 8, 16]
    n_triad = 12_500_000  # 100 MB/array -> 300 MB working set, far past LLC
    # bench-graph shard shape at P=16: 48.3M/16 edges, 2M/16 srcs/groups
    n_edges, n_src, n_groups = 3_020_000, 125_000, 125_000

    triad = _fan(_triad_worker, lambda i: (n_triad, reps), ks)
    kernel = _fan(_kernel_worker, lambda i: (n_edges, n_src, n_groups, reps, 42 + i), ks)

    peak_triad = max(triad.values())
    kernel_gbps = {k: v * BYTES_PER_EDGE / 1e9 for k, v in kernel.items()}
    peak_kernel_k = max(kernel, key=lambda k: kernel[k])
    result = {
        "host_cpus": os.cpu_count(),
        "triad_GBps_by_procs": triad,
        "kernel_edges_per_s_by_procs": kernel,
        "kernel_GBps_by_procs": kernel_gbps,
        "bytes_per_edge_model": BYTES_PER_EDGE,
        "peak_triad_GBps": peak_triad,
        "peak_kernel_edges_per_s": kernel[peak_kernel_k],
        "kernel_fraction_of_triad_peak": kernel_gbps[peak_kernel_k] / peak_triad,
        "triad_scaling_1_to_peak": peak_triad / triad[1],
        "kernel_scaling_1_to_peak": kernel[peak_kernel_k] / kernel[1],
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
