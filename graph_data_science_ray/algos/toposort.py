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


def _topo_csr_run(edges: Dataset, max_rounds: int, num_shards: int | None):
    """Kahn peeling as a sharded sum-Pregel (round-4 migration): state is
    the per-node peel level (-1 = active), a round's message is 1 per
    still-active source, and a node peels when its active in-degree sum
    hits zero — no driver-resident node vector, no per-round ray.put.
    The peel level lands in the ``level`` aux so a follow-up phase
    (longest_path) can seed from it on the same engine."""
    from graph_data_science_ray.state.engine import CsrEngine

    engine = CsrEngine.build(edges, num_shards=num_shards or 8,
                             weighted=False)

    def init(ids):
        return np.full(ids.shape[0], -1, np.int64)

    def send(s, b):
        return (s == -1).astype(np.int64)

    def upd(state, combined, has_msg, ids, ctx):
        peel = (state == -1) & (combined == 0)
        new = np.where(peel, ctx.iteration, state)
        ctx.aux["level"][...] = new
        return new

    res = engine.pregel(
        send, upd, init, combine="sum", is_int=True, residual="changed",
        wants_ctx=True, aux={"level": -1}, max_iterations=max_rounds,
        tolerance=0.0, value_name="level",
    )
    return engine, res


def _topo_result_from(res) -> TopoResult:
    t = pa.concat_tables(ray.get(res._state_refs))
    ids = t.column("node_id").to_numpy(zero_copy_only=False).astype(np.int64)
    lev = t.column("level").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids, lev = ids[order], lev[order]
    acyclic = lev >= 0
    return TopoResult(ids[acyclic], lev[acyclic], bool((~acyclic).any()),
                      res.iterations)


def longest_path(
    edges: Dataset,
    weighted: bool = False,
    max_rounds: int = 100_000,
    num_partitions: int | None = None,
    backend: str = "csr",
    num_shards: int | None = None,
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

    ``backend="csr"`` (default): both phases run on ONE sharded engine —
    the peel Pregel leaves levels in shard aux, the relax phase seeds
    from them (init_wants_aux) and finalizes exactly level r at round r.
    """
    if backend == "csr":
        return _longest_path_csr(edges, weighted, max_rounds, num_shards)
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


def _longest_path_csr(edges: Dataset, weighted: bool, max_rounds: int,
                      num_shards: int | None) -> LongestPathResult:
    from graph_data_science_ray.state.engine import CsrEngine

    configure_ray_data()
    if weighted:
        # the peel needs no weights but the relax phase's send does;
        # build the ONE engine weighted so the edge table carries them
        engine = CsrEngine.build(edges, num_shards=num_shards or 8, weighted=True)
    else:
        engine = CsrEngine.build(edges, num_shards=num_shards or 8)
    # phase 1: peel (same hooks as topological_sort)
    def init(ids):
        return np.full(ids.shape[0], -1, np.int64)

    def send(s, b):
        return (s == -1).astype(np.int64)

    def upd(state, combined, has_msg, ids, ctx):
        peel = (state == -1) & (combined == 0)
        new = np.where(peel, ctx.iteration, state)
        ctx.aux["level"][...] = new
        return new

    topo_res = engine.pregel(
        send, upd, init, combine="sum", is_int=True, residual="changed",
        wants_ctx=True, aux={"level": -1}, max_iterations=max_rounds,
        tolerance=0.0, value_name="level", fetch_state=False,
    )
    depth_raw = engine.aux_max("level")
    depth = int(depth_raw) if np.isfinite(depth_raw) and depth_raw > 0 else 0

    # phase 2: max-relax, one round finalizes exactly one level (a
    # level-r node's predecessors all sit at levels < r, already final;
    # not-yet-final senders carry -inf and are mask-filtered)
    def init_dist(ids, aux):
        return np.where(aux["level"] == 0, 0.0, -np.inf)

    if weighted:
        def send_relax(s, b):
            w = b.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
            return s + w
    else:
        def send_relax(s, b):
            return s + 1.0

    def upd_relax(state, combined, has_msg, ids, ctx):
        mask = ctx.aux["level"] == ctx.iteration + 1
        return np.where(mask, combined, state)

    if depth > 0:
        res = engine.pregel(
            send_relax, upd_relax, init_dist, combine="max", is_int=False,
            residual="changed", wants_ctx=True, aux=None, reset_aux=False,
            init_wants_aux=True, max_iterations=depth, tolerance=-1.0,
            value_name="cost",
        )
        state_refs = res._state_refs
    else:
        # dist never needed a relax round: seed state directly, read it
        ray.get([s.pregel_init.remote(init_dist, None, False, True)
                 for s in engine.shards])
        state_refs = [s.get_state_named.remote("cost", False)
                      for s in engine.shards]
    lev_refs = [s.get_aux_named.remote(["level"]) for s in engine.shards]
    cost_t = pa.concat_tables(ray.get(state_refs))
    lev_t = pa.concat_tables(ray.get(lev_refs))
    engine.shutdown()
    ids = cost_t.column("node_id").to_numpy(zero_copy_only=False).astype(np.int64)
    cost = cost_t.column("cost").to_numpy(zero_copy_only=False)
    lev = lev_t.column("level").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids, cost, lev = ids[order], cost[order], lev[order]
    acyclic = lev >= 0
    return LongestPathResult(ids[acyclic], cost[acyclic],
                             bool((~acyclic).any()), depth)


def topological_sort(
    edges: Dataset,
    max_rounds: int = 100_000,
    num_partitions: int | None = None,
    backend: str = "csr",
    num_shards: int | None = None,
) -> TopoResult:
    """``backend="csr"`` (default since round 4): Kahn peeling as a
    sharded sum-Pregel — see ``_topo_csr_run``; ``backend="dataflow"``
    is the broadcast-state scan loop (parity-tested)."""
    if backend == "csr":
        engine, res = _topo_csr_run(edges, max_rounds, num_shards)
        out = _topo_result_from(res)
        engine.shutdown()
        return out
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
