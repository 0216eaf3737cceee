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

from graph_data_science_ray.algos.common import BlockScanner, collect_arrow, unique_node_ids
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


class LongestPathResult:
    def __init__(self, node_ids, costs, has_cycle_nodes, rounds):
        self.node_ids = node_ids          # acyclic nodes only, sorted
        self.costs = costs                # float64 longest distance from any source
        self.values = costs               # modes.py duck-type contract
        self.value_name = "cost"
        self.has_cycle_nodes = has_cycle_nodes
        self.rounds = rounds

    def as_dict(self) -> dict:
        return dict(zip(self.node_ids.tolist(), self.costs.tolist()))

    def to_table(self) -> pa.Table:
        return pa.table(
            {
                "node_id": pa.array(self.node_ids, pa.int64()),
                "cost": pa.array(self.costs, pa.float64()),
            }
        )


def longest_path(
    edges: Dataset,
    weighted: bool = False,
    max_rounds: int = 100_000,
    num_partitions: int | None = None,
) -> LongestPathResult:
    """``gds.dag.longestPath`` semantics [GDS-pub: algo/.../dag/]: for
    every node of the DAG, the maximum total cost over all paths from
    any source (in-degree-0) node; ``weighted`` reads the ``weight``
    column, else every hop costs 1 (then cost == Kahn peel level).
    Nodes on cycles are excluded, like ``topological_sort``.

    Dataflow: Kahn levels first (one peel loop), then one max-relax
    round per level — a level-r node's predecessors are all finalized
    at levels < r, so each round finalizes exactly that level. Each
    round is one streamed edge scan with a per-batch max combiner
    (shuffle volume bounded by the level's in-neighborhood, not E);
    rounds = DAG depth, the same bound as the peel itself.
    """
    configure_ray_data()
    edges = edges.materialize()
    topo = topological_sort(edges, max_rounds=max_rounds, num_partitions=num_partitions)
    node_ids = topo.node_ids
    levels = topo.levels
    n = node_ids.shape[0]
    dist = np.where(levels == 0, 0.0, -np.inf)
    depth = int(levels.max()) if n else 0
    scanner = BlockScanner(edges)

    for r in range(1, depth + 1):
        state_ref = ray.put((node_ids, dist, levels, r))

        def relax(t: pa.Table) -> pa.Table:
            ids, d, lev, rr = ray.get(state_ref)
            src = t.column("src_id").to_numpy(zero_copy_only=False)
            dst = t.column("dst_id").to_numpy(zero_copy_only=False)
            sp = np.minimum(np.searchsorted(ids, src), max(ids.shape[0] - 1, 0))
            dp = np.minimum(np.searchsorted(ids, dst), max(ids.shape[0] - 1, 0))
            keep = (
                (ids[sp] == src) & (ids[dp] == dst)  # both acyclic
                & (lev[dp] == rr) & np.isfinite(d[sp])
            )
            if not keep.any():
                return pa.schema(
                    [("node_id", pa.int64()), ("cand", pa.float64())]
                ).empty_table()
            if weighted:
                w = t.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)[keep]
            else:
                w = 1.0
            cand = d[sp[keep]] + w
            dk = dst[keep]
            order = np.argsort(dk, kind="stable")
            dk, cand = dk[order], cand[order]
            first = np.ones(dk.shape[0], dtype=bool)
            first[1:] = dk[1:] != dk[:-1]
            best = np.maximum.reduceat(cand, np.flatnonzero(first))
            return pa.table(
                {"node_id": pa.array(dk[first], pa.int64()), "cand": pa.array(best, pa.float64())}
            )

        t = scanner.scan(relax)
        if t.num_rows:
            ids = t.column("node_id").to_numpy(zero_copy_only=False)
            cand = t.column("cand").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(node_ids, ids)
            np.maximum.at(dist, pos, cand)

    return LongestPathResult(node_ids, dist, topo.has_cycle_nodes, depth)


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
    scanner = BlockScanner(edges)

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

        t = scanner.scan(in_counts)
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
