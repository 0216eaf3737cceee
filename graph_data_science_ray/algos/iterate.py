"""The iteration harness — this engine's Pregel-equivalent extension point.

The reference exposes a Pregel API (init/compute/messages, vote-to-halt)
as its user-extension surface (SURVEY.md §2.11). Ours is dataflow-shaped:
an iterative algorithm is

    state ──ray.put──▶ edges.map_batches(make_stage(state))   # scatter
          ──groupby(key).aggregate(aggs)──▶ gathered          # gather
          ──apply_fn(state, gathered)──▶ new state, residual  # apply

run until ``residual <= tolerance`` or ``max_iterations``. WCC and label
propagation are ~30-line instantiations (wcc.py / labelprop.py);
PageRank (pagerank.py) follows the same shape with a specialized
scatter. Each iteration optionally checkpoints per-partition state with
a lineage manifest (checkpoint.py).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.algos.common import BlockScanner, collect_arrow
from graph_data_science_ray.algos.pagerank import IterativeResult
from graph_data_science_ray.checkpoint import CheckpointManager
from graph_data_science_ray.context import configure_ray_data, shuffle_partitions_for


def run_iterative(
    edges: Dataset,
    node_ids: np.ndarray,
    init: np.ndarray,
    make_stage: Callable[[ray.ObjectRef], Callable[[pa.Table], pa.Table]],
    gather_key: str | list[str],
    gather_aggs: Callable[[], list],
    apply_fn: Callable[[np.ndarray, pa.Table, np.ndarray], tuple[np.ndarray, float]],
    max_iterations: int,
    tolerance: float = 0.0,
    value_name: str = "value",
    checkpoint: CheckpointManager | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
    materialize_edges: bool = True,
    reduce: str = "driver",
    driver_reduce: Callable[[pa.Table], pa.Table] | None = None,
    pass_frontier: bool = False,
) -> IterativeResult:
    """``reduce``: how the pre-aggregated scatter partials are combined.

    - "driver" (default): collect partials (≤ one row per key per batch)
      and merge with one vectorized numpy pass via ``driver_reduce`` —
      no shuffle; right whenever the node vector fits the driver, which
      is this implementation's standing assumption (algos/common.py).
    - "shuffle": a distributed ``groupby(key).aggregate`` hash shuffle —
      the scale path for node tables beyond driver memory; identical
      results (tested).

    ``pass_frontier``: broadcast ``(node_ids, state, changed)`` instead
    of ``(node_ids, state)`` — ``changed`` marks nodes whose value moved
    last round (all-True on round one and after resume). Correct for
    monotone operators (min-relaxation, OR-accumulation) where only a
    changed node can further improve its neighbors; turns O(rounds · m)
    total scatter volume into O(m) for BFS-like frontiers.
    """
    configure_ray_data()
    if materialize_edges:
        edges = edges.materialize()
    n = node_ids.shape[0]
    num_partitions = num_partitions or shuffle_partitions_for(n)

    state = init.copy()
    start_iter = 0
    if checkpoint is not None and resume:
        latest = checkpoint.latest()
        if latest is not None:
            it, ids, vals, _ = latest
            assert np.array_equal(ids, node_ids), "checkpoint node universe mismatch"
            state = vals.astype(init.dtype)
            start_iter = it + 1

    metrics: list[dict] = []
    converged = False
    iteration = start_iter - 1
    changed = np.ones(n, dtype=bool)
    # driver-reduce rounds scan the snapshot of edge blocks with plain
    # ray.remote tasks (BlockScanner) — a full map_batches stage launch
    # per round costs ~1-3 s of executor setup on this host, which
    # dominates every small/medium iterative job
    scanner = BlockScanner(edges) if (reduce == "driver" and driver_reduce is not None) else None
    for iteration in range(start_iter, max_iterations):
        state_ref = ray.put(
            (node_ids, state, changed) if pass_frontier else (node_ids, state)
        )
        if scanner is not None:
            gathered = driver_reduce(scanner.scan(make_stage(state_ref)))
        else:
            emitted = edges.map_batches(
                make_stage(state_ref), batch_format="pyarrow", zero_copy_batch=True
            )
            gathered_ds = emitted.groupby(gather_key, num_partitions=num_partitions).aggregate(
                *gather_aggs()
            )
            gathered = collect_arrow(gathered_ds)
        prev = state
        state, residual = apply_fn(state, gathered, node_ids)
        if pass_frontier:
            changed = state != prev  # inf != inf is False ⇒ unreached stay out
        metrics.append({"iteration": iteration, "residual": residual})
        if checkpoint is not None:
            checkpoint.write_iteration(iteration, node_ids, state, {"residual": residual})
        if residual <= tolerance:
            converged = True
            break

    return IterativeResult(
        node_ids=node_ids,
        values=state,
        value_name=value_name,
        iterations=iteration + 1,
        converged=converged,
        metrics=metrics,
    )
