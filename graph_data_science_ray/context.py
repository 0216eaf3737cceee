"""Ray Data execution-context tuning for this engine.

Verified Ray 2.49.2 facts (SURVEY.md §4.2b):

- Keyed ``repartition``, ``Dataset.join`` and hash aggregates require
  ``DataContext.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE``; the
  default sort-based strategy raises ``ValueError`` on keyed repartition.
- ``default_hash_shuffle_parallelism`` defaults to 200, which spawns
  hundreds of reducer actors and stalls small jobs for minutes — it MUST
  be sized to the data/CPU budget.

On a real multi-node cluster the shuffle parallelism should be roughly
2–4× total cores (and is the ``P`` recorded in checkpoint manifests); in
the sandbox we default it from the visible CPU budget.
"""

from __future__ import annotations

import os


def _cpu_budget() -> int:
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 0)) or (os.cpu_count() or 8)
    except Exception:
        pass
    return int(os.environ.get("RAY_GRAFT_CPUS", 0) or 0) or (os.cpu_count() or 8)


def configure_ray_data(
    shuffle_parallelism: int | None = None,
    target_max_block_size: int | None = None,
    quiet: bool = True,
) -> "ray.data.DataContext":
    """Apply the engine's DataContext settings; idempotent, cheap.

    Called by every pipeline entry point before building Datasets. Does
    NOT call ray.init() — Ray Data auto-initialises, or the caller owns
    the session.
    """
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    if shuffle_parallelism is None:
        # ~1 reducer per core; small jobs override per-op via num_partitions=.
        shuffle_parallelism = max(2, _cpu_budget())
    ctx.default_hash_shuffle_parallelism = shuffle_parallelism
    ctx.min_hash_shuffle_aggregator_wait_time_budget_s = 1.0
    if target_max_block_size is not None:
        ctx.target_max_block_size = target_max_block_size
    if quiet:
        import logging

        ctx.enable_progress_bars = False
        ctx.execution_options.verbose_progress = False
        logging.getLogger("ray.data").setLevel(logging.ERROR)
    ctx.execution_options.preserve_order = False
    return ctx


def shuffle_partitions_for(num_rows_hint: int | None = None) -> int:
    """Pick a per-op hash-shuffle partition count.

    Small inputs want few partitions (reducer-actor startup dominates);
    large inputs want ~cpu-budget partitions. At 100 TB scale the hint
    comes from dataset metadata and the cap is the cluster-wide core
    count times 2 — here, the sandbox budget.
    """
    budget = _cpu_budget()
    if num_rows_hint is not None and num_rows_hint < 100_000:
        return max(2, min(8, budget))
    return max(2, budget)
