"""Topological sort — iterative zero-in-degree peeling with levels.

Reference semantics (``gds.dag.topologicalSort``,
[GDS-pub: algo/.../topologicalsort/]): a topological ordering of the
directed graph; **nodes on cycles are excluded** from the result (the
reference documents this, and its optional ``computeMaxDistanceFromSource``
returns each node's longest distance from any source — which is exactly
the peel level here, so we emit it for free).

Dataflow: classic Kahn peeling, one round per level: count in-degrees
of the still-active subgraph (one edge scan with per-batch count
partials, driver-merged), peel the zero-in-degree nodes, deactivate
their out-edges. Rounds = longest path length; self-loops make a node
cyclic by definition and are never peeled.

Output: (node_id, level) for acyclic nodes; ordering by (level,
node_id) is a valid deterministic topological order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.algos.common import collect_arrow, unique_node_ids
from graph_data_science_ray.context import configure_ray_data


class TopoResult:
    def __init__(self, node_ids, levels, has_cycle_nodes, rounds):
        self.node_ids = node_ids          # acyclic nodes only, sorted
        self.levels = levels
        self.values = levels              # modes.py duck-type contract
        self.value_name = "level"
        self.has_cycle_nodes = has_cycle_nodes
        self.rounds = rounds

    def as_dict(self) -> dict:
        return dict(zip(self.node_ids.tolist(), self.levels.tolist()))

    def to_table(self) -> pa.Table:
        order = np.lexsort((self.node_ids, self.levels))
        return pa.table(
            {
                "node_id": pa.array(self.node_ids[order], pa.int64()),
                "level": pa.array(self.levels[order], pa.int64()),
            }
        )


def topological_sort(
    edges: Dataset,
    max_rounds: int = 100_000,
    num_partitions: int | None = None,
) -> TopoResult:
    configure_ray_data()
    edges = edges.materialize()
    node_ids = unique_node_ids(edges)
    n = node_ids.shape[0]
    level = np.full(n, -1, dtype=np.int64)  # -1 = not yet peeled
    active = np.ones(n, dtype=bool)

    rounds = 0
    for rounds in range(1, max_rounds + 1):
        state_ref = ray.put((node_ids, active))

        def in_counts(t: pa.Table) -> pa.Table:
            ids, act = ray.get(state_ref)
            src = t.column("src_id").to_numpy(zero_copy_only=False)
            dst = t.column("dst_id").to_numpy(zero_copy_only=False)
            keep = act[np.searchsorted(ids, src)]  # only active sources count
            u, c = np.unique(dst[keep], return_counts=True)
            return pa.table(
                {
                    "node_id": pa.array(u, pa.int64()),
                    "c": pa.array(c.astype(np.int64), pa.int64()),
                }
            )

        t = collect_arrow(edges.map_batches(in_counts, batch_format="pyarrow", zero_copy_batch=True))
        indeg = np.zeros(n, dtype=np.int64)
        if t.num_rows:
            pos = np.searchsorted(node_ids, t.column("node_id").to_numpy(zero_copy_only=False))
            np.add.at(indeg, pos, t.column("c").to_numpy(zero_copy_only=False))
        peel = active & (indeg == 0)
        if not peel.any():
            break  # leftovers (if any) are on cycles
        level[peel] = rounds - 1
        active &= ~peel
        if not active.any():
            break

    acyclic = level >= 0
    return TopoResult(
        node_ids[acyclic], level[acyclic], bool((~acyclic).any()), rounds
    )
