"""The reference's four execution modes + estimate, re-expressed.

Neo4j GDS exposes every algorithm as stream / stats / mutate / write,
plus ``estimate`` (a memory gate that refuses runs that cannot fit —
SURVEY.md §2.9). Equivalents here:

- stream: Dataset of (node_id, value) [optionally top-k sorted]
- stats:  summary dict (min/mean/max/percentiles) — small, driver-side
- mutate: add the result as a column to a nodes Dataset (hash join)
- write:  partitioned parquet under a result dir
- estimate: bytes-needed calculator from node/edge counts, used as the
  admission gate for CSR actor pools.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from graph_data_science_ray.algos.pagerank import IterativeResult
from graph_data_science_ray.context import configure_ray_data


def stream(result: IterativeResult, top_k: int | None = None, descending: bool = True) -> Dataset:
    import ray.data

    t = result.to_table()
    if top_k is not None:
        vals = result.values
        order = np.lexsort((result.node_ids, -vals if descending else vals))[:top_k]
        t = pa.table(
            {
                "node_id": pa.array(result.node_ids[order], pa.int64()),
                result.value_name: pa.array(vals[order]),
            }
        )
    return ray.data.from_arrow(t)


def stats(result: IterativeResult) -> dict:
    v = result.values.astype(np.float64)
    if v.shape[0] == 0:
        return {"count": 0}
    return {
        "count": int(v.shape[0]),
        "min": float(v.min()),
        "max": float(v.max()),
        "mean": float(v.mean()),
        "stddev": float(v.std()),
        "p50": float(np.percentile(v, 50)),
        "p90": float(np.percentile(v, 90)),
        "p99": float(np.percentile(v, 99)),
        # duck-typed: every algo result carries node_ids/values; the
        # iteration metadata differs per family (e.g. SCC reports
        # outer_rounds, coloring reports n_colors)
        "iterations": getattr(result, "iterations", getattr(result, "outer_rounds", None)),
        "converged": getattr(result, "converged", True),
    }


def mutate(nodes: Dataset, result: IterativeResult, property_name: str | None = None) -> Dataset:
    """Append the computed property to a nodes Dataset (broadcast join —
    the node vector is the small side by construction)."""
    import ray

    configure_ray_data()
    name = property_name or result.value_name
    ref = ray.put((result.node_ids, result.values))

    def fn(t: pa.Table) -> pa.Table:
        ids_arr, vals = ray.get(ref)
        ids = t.column("node_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ids_arr, ids)
        pos = np.minimum(pos, max(0, ids_arr.shape[0] - 1))
        found = ids_arr.shape[0] > 0
        ok = (ids_arr[pos] == ids) if found else np.zeros(ids.shape[0], bool)
        out = np.where(ok, vals[pos] if found else 0, np.nan)
        return t.append_column(name, pa.array(out))

    return nodes.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def write(result: IterativeResult, path: str, num_partitions: int = 8) -> str:
    """Partitioned parquet result sink (bucketed like checkpoints)."""
    import ray.data

    from graph_data_science_ray.stages.ids import bucket_of

    t = result.to_table()
    b = bucket_of(result.node_ids, num_partitions)
    t = t.append_column("bucket", pa.array(b, pa.int64()))
    ray.data.from_arrow(t).write_parquet(path, partition_cols=["bucket"])
    return path


def estimate(n_nodes: int, n_edges: int, algorithm: str = "pagerank",
             num_shards: int = 8, weighted: bool = False, **algo_params) -> dict:
    """Bytes-needed estimate, mirroring the reference's estimation gate:
    CSR shard = edges×(8B srcpos + 8B group + 8B dst share) + unique
    srcs×17B; node state = ids+values+out_w. ``compact_indices`` builds
    (round 4) store the two m-sized index arrays int32 — 16 B/edge,
    measured 18.07 total on the sf0.1 projection — at a measured
    25-29% gather/bincount cost (numpy converts non-intp indices per
    kernel call), the same space/time trade as GDS's packed adjacency;
    the estimate reports the speed-default int64 layout. Used to
    size/admit the actor pool before building it.

    ``algo_params`` sizes the round-4 2-D shard-state shapes
    (cross-checked within 10% of ``CsrShard.mem_report`` state_bytes):

    - ``betweenness``: ``source_batch`` k (default 64) — (n,k) float64
      state + dist/sigma/delta aux + the n-sized Σδ accumulator.
    - ``sllpa``: ``max_iterations`` T (default 20) — (n,T+1) int64
      label memory.
    - ``celf``: ``simulations`` R (default 32) — (n,R) int64 comp +
      (n,R) float64 gain + n bool chosen.
    - everything else: the 1-D state + residual pair (16 B/node),
      already inside the 24 B/node base term.
    """
    per_edge = 24 + (8 if weighted else 0)
    per_node = 8 * 3
    if algorithm == "betweenness":
        k = int(algo_params.get("source_batch", 64))
        state_per_node = 8 * (4 * k + 1)
    elif algorithm == "sllpa":
        t = int(algo_params.get("max_iterations", 20))
        state_per_node = 8 * (t + 1)
    elif algorithm == "celf":
        r = int(algo_params.get("simulations", 32))
        state_per_node = 16 * r + 1
    else:
        state_per_node = 0  # covered by the base per_node term
    state_bytes = n_nodes * state_per_node
    shard_bytes = (n_edges * per_edge) // max(1, num_shards) + (
        n_nodes * (per_node + state_per_node)
    ) // max(1, num_shards)
    total = n_edges * per_edge + n_nodes * per_node + state_bytes
    # dataflow path additionally broadcasts one node vector per iteration
    broadcast_bytes = n_nodes * 16
    return {
        "algorithm": algorithm,
        "total_bytes": int(total),
        "per_shard_bytes": int(shard_bytes),
        "state_bytes": int(state_bytes),
        "broadcast_bytes_per_iteration": int(broadcast_bytes),
        "recommended_min_shards": max(1, int(np.ceil(total / (2 * 1024**3)))),
    }
