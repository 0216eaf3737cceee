"""A* source–target shortest path (goal-directed SSSP).

Reference semantics (``gds.shortestPath.astar`` [GDS-pub:
algo/.../paths/astar/]): Dijkstra with an admissible heuristic — the
reference hardwires haversine distance over latitude/longitude node
properties. Sequential A* orders a priority queue by f = g + h; that
ordering is inherently serial, so this engine uses the BSP formulation:

- frontier-limited synchronous relaxation (the engine's Bellman-Ford
  kernel — one edge scan per round, only edges leaving nodes whose
  distance improved last round are scattered), plus
- the A* termination bound: stop as soon as
  ``dist(target) <= min over frontier v of (dist(v) + h(v))``.

With non-negative weights and an admissible h (h(v) ≤ true remaining
cost, h(target) = 0), every yet-undiscovered path to the target extends
a prefix currently ending at a frontier node v and therefore costs at
least dist(v) + h(v) — so the bound certifies optimality without
draining the frontier. h ≡ 0 degrades gracefully to bidirectional-free
Dijkstra semantics (runs until the frontier dies). The heuristic prunes
ROUNDS and scattered volume, mirroring what the priority queue buys the
sequential reference.

The heuristic is a vectorized callable ``h(node_ids: int64[n]) ->
float64[n]`` evaluated ONCE on the node universe (node-vector-sized,
the dataflow path's standing assumption); ``haversine_heuristic`` builds
the reference's geographic h from a (node_id, latitude, longitude)
table.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.algos.common import BlockScanner, unique_node_ids
from graph_data_science_ray.context import configure_ray_data
from graph_data_science_ray.sources.edges import symmetrize


@dataclass
class AStarResult:
    source: int
    target: int
    cost: float           # inf when unreachable
    path: list[int]       # [] when unreachable
    iterations: int
    relaxed_rounds_saved_bound: float  # final frontier bound at stop
    metrics: list[dict]
    # final relaxation state (node universe + distances at stop) — the
    # stream surface derives the deterministic tight-edge path from it
    _node_arr: "np.ndarray | None" = None
    _dist: "np.ndarray | None" = None

    def to_table(self) -> pa.Table:
        n = len(self.path)
        return pa.table(
            {
                "index": pa.array(np.arange(n), pa.int64()),
                "node_id": pa.array(self.path, pa.int64()),
            }
        )


def haversine_heuristic(coords: pa.Table, target: int):
    """h(v) = haversine_km(v, target) — the reference's heuristic
    [GDS-pub: AStar uses great-circle distance on lat/long properties].
    Admissible when edge weights are inter-node distances in km.
    ``coords``: (node_id, latitude, longitude)."""
    ids = coords.column("node_id").to_numpy(zero_copy_only=False)
    lat = np.radians(coords.column("latitude").to_numpy(zero_copy_only=False))
    lon = np.radians(coords.column("longitude").to_numpy(zero_copy_only=False))
    order = np.argsort(ids)
    ids, lat, lon = ids[order], lat[order], lon[order]
    tpos = np.searchsorted(ids, target)
    if tpos >= ids.shape[0] or ids[tpos] != target:
        raise ValueError(f"target {target} not in coords table")
    tlat, tlon = lat[tpos], lon[tpos]

    def h(node_ids: np.ndarray) -> np.ndarray:
        pos = np.minimum(np.searchsorted(ids, node_ids), ids.shape[0] - 1)
        found = ids[pos] == node_ids
        a = (
            np.sin((tlat - lat[pos]) / 2) ** 2
            + np.cos(lat[pos]) * np.cos(tlat) * np.sin((tlon - lon[pos]) / 2) ** 2
        )
        d = 2 * 6371.0088 * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))
        return np.where(found, d, 0.0)  # unknown nodes: h=0 (admissible)

    return h


def a_star(
    edges: Dataset,
    source: int,
    target: int,
    heuristic=None,
    weighted: bool = True,
    undirected: bool = False,
    max_iterations: int = 10_000,
    num_partitions: int | None = None,
) -> AStarResult:
    """Exact source→target shortest path; ``heuristic`` as in the module
    docstring (None → h ≡ 0, i.e. plain goal-checked SSSP)."""
    configure_ray_data()
    g = symmetrize(edges, dedup=False, num_partitions=num_partitions) if undirected else edges
    g = g.materialize()
    node_arr = unique_node_ids(g)
    n = node_arr.shape[0]
    spos, tpos = np.searchsorted(node_arr, [source, target])
    if spos >= n or node_arr[spos] != source:
        raise ValueError(f"source node {source} not in graph")
    if tpos >= n or node_arr[tpos] != target:
        raise ValueError(f"target node {target} not in graph")

    h = np.zeros(n, dtype=np.float64) if heuristic is None else np.asarray(
        heuristic(node_arr), dtype=np.float64
    )
    if h.shape != (n,):
        raise ValueError("heuristic must return one value per node id")

    dist = np.full(n, np.inf, dtype=np.float64)
    pred = np.full(n, -1, dtype=np.int64)
    dist[spos] = 0.0
    frontier = np.zeros(n, dtype=bool)
    frontier[spos] = True

    def make_stage(state_ref):
        def fn(batch: pa.Table) -> pa.Table:
            ids, d, fr = ray.get(state_ref)
            src = batch.column("src_id").to_numpy(zero_copy_only=False)
            dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
            p = np.minimum(np.searchsorted(ids, src), ids.shape[0] - 1)
            active = fr[p] & (ids[p] == src)
            if not active.any():
                return pa.schema(
                    [("node_id", pa.int64()), ("cand", pa.float64()), ("pred", pa.int64())]
                ).empty_table()
            src, dst, p = src[active], dst[active], p[active]
            if weighted:
                w = batch.column("weight").to_numpy(zero_copy_only=False)
                w = w[active].astype(np.float64)
            else:
                w = np.ones(src.shape[0], dtype=np.float64)
            cand = d[p] + w
            # within-batch lexicographic argmin (cand, pred) per dst
            order = np.lexsort((src, cand, dst))
            dst, cand, src = dst[order], cand[order], src[order]
            first = np.ones(dst.shape[0], dtype=bool)
            first[1:] = dst[1:] != dst[:-1]
            return pa.table(
                {
                    "node_id": pa.array(dst[first], pa.int64()),
                    "cand": pa.array(cand[first], pa.float64()),
                    "pred": pa.array(src[first], pa.int64()),
                }
            )

        return fn

    metrics: list[dict] = []
    iterations = 0
    scanner = BlockScanner(g)
    bound = float(h[spos])
    for it in range(max_iterations):
        if not frontier.any():
            break
        bound = float((dist[frontier] + h[frontier]).min())
        if dist[tpos] <= bound:
            break  # A* optimality certificate
        ref = ray.put((node_arr, dist, frontier))
        t = scanner.scan(make_stage(ref))
        frontier = np.zeros(n, dtype=bool)
        changed = 0
        if t.num_rows:
            ids = t.column("node_id").to_numpy(zero_copy_only=False)
            cand = t.column("cand").to_numpy(zero_copy_only=False)
            cpred = t.column("pred").to_numpy(zero_copy_only=False)
            order = np.lexsort((cpred, cand, ids))
            ids, cand, cpred = ids[order], cand[order], cpred[order]
            first = np.ones(ids.shape[0], dtype=bool)
            first[1:] = ids[1:] != ids[:-1]
            ids, cand, cpred = ids[first], cand[first], cpred[first]
            pos = np.searchsorted(node_arr, ids)
            better = cand < dist[pos]
            tie = (cand == dist[pos]) & (pred[pos] >= 0) & (cpred < pred[pos])
            upd = better | tie
            dist[pos[upd]] = cand[upd]
            pred[pos[upd]] = cpred[upd]
            frontier[pos[better]] = True  # ties don't reopen nodes
            changed = int(upd.sum())
        iterations = it + 1
        metrics.append(
            {"iteration": iterations, "changed": changed,
             "frontier": int(frontier.sum()), "bound": bound,
             "best_target": float(dist[tpos])}
        )

    # path reconstruction (driver-side walk of the tiny pred chain)
    if not np.isfinite(dist[tpos]):
        return AStarResult(source, target, float("inf"), [], iterations, bound,
                           metrics, node_arr, dist)
    path = [int(target)]
    pos = tpos
    guard = n + 1
    while pred[pos] >= 0 and guard:
        nxt = int(pred[pos])
        path.append(nxt)
        pos = int(np.searchsorted(node_arr, nxt))
        guard -= 1
    return AStarResult(
        source, target, float(dist[tpos]), path[::-1], iterations, bound,
        metrics, node_arr, dist
    )


def a_star_stream(
    edges: Dataset,
    source: int,
    target: int,
    heuristic=None,
    weighted: bool = True,
    undirected: bool = False,
    max_iterations: int = 10_000,
    num_partitions: int | None = None,
) -> pa.Table:
    """``gds.shortestPath.astar.stream`` parity: the found path as
    exploded rows (target_node, step, node_id, cost); ``step`` counts
    from the target back (0 = target), ``cost`` is the cost from the
    source to ``node_id`` along the path.

    Determinism contract (oracle-replicable): the path follows the
    TIGHT-EDGE rule ``pred(v) = min{u : dist[u] + w(u,v) = dist[v]}``
    over the stopped A* state. With strictly positive weights every
    cost-optimal predecessor of every path node is settled when the A*
    bound fires (any unsettled node has a frontier ancestor with
    distance ≤ its true distance < dist(target) ≤ bound — contradiction),
    so this equals the full-fixpoint rule the SQL oracle replays. One
    extra edge scan computes the tight preds; the walk is path-sized."""
    configure_ray_data()
    g = symmetrize(edges, dedup=False, num_partitions=num_partitions) if undirected else edges
    g = g.materialize()
    res = a_star(
        g, source, target, heuristic=heuristic, weighted=weighted,
        undirected=False, max_iterations=max_iterations,
        num_partitions=num_partitions,
    )
    empty = pa.table(
        {
            "target_node": pa.array([], pa.int64()),
            "step": pa.array([], pa.int64()),
            "node_id": pa.array([], pa.int64()),
            "cost": pa.array([], pa.float64()),
        }
    )
    if not np.isfinite(res.cost):
        return empty
    node_arr, dist = res._node_arr, res._dist
    state_ref = ray.put((node_arr, dist, source))

    def tight_pred(t: pa.Table) -> pa.Table:
        ids, d, src_node = ray.get(state_ref)
        s = t.column("src_id").to_numpy(zero_copy_only=False)
        v = t.column("dst_id").to_numpy(zero_copy_only=False)
        w = (t.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
             if weighted else np.ones(s.shape[0]))
        sp = np.minimum(np.searchsorted(ids, s), ids.shape[0] - 1)
        dp = np.minimum(np.searchsorted(ids, v), ids.shape[0] - 1)
        hit = (ids[sp] == s) & (ids[dp] == v) & (d[sp] + w == d[dp]) & (v != src_node)
        if not hit.any():
            return pa.schema([("node_id", pa.int64()), ("pred", pa.int64())]).empty_table()
        v, s = v[hit], s[hit]
        order = np.lexsort((s, v))
        v, s = v[order], s[order]
        first = np.ones(v.shape[0], dtype=bool)
        first[1:] = v[1:] != v[:-1]
        return pa.table({"node_id": pa.array(v[first], pa.int64()),
                         "pred": pa.array(s[first], pa.int64())})

    t = BlockScanner(g).scan(tight_pred)
    pred = np.full(node_arr.shape[0], -1, dtype=np.int64)
    if t.num_rows:
        ids = t.column("node_id").to_numpy(zero_copy_only=False)
        ps = t.column("pred").to_numpy(zero_copy_only=False)
        order = np.lexsort((ps, ids))
        ids, ps = ids[order], ps[order]
        first = np.ones(ids.shape[0], dtype=bool)
        first[1:] = ids[1:] != ids[:-1]
        pos = np.searchsorted(node_arr, ids[first])
        pred[pos] = ps[first]

    path = [int(target)]
    pos = int(np.searchsorted(node_arr, target))
    guard = node_arr.shape[0] + 1
    while pred[pos] >= 0 and guard:
        nxt = int(pred[pos])
        path.append(nxt)
        pos = int(np.searchsorted(node_arr, nxt))
        guard -= 1
    nodes = np.array(path, dtype=np.int64)  # target → source order
    costs = dist[np.searchsorted(node_arr, nodes)]
    return pa.table(
        {
            "target_node": pa.array(np.full(nodes.shape[0], target), pa.int64()),
            "step": pa.array(np.arange(nodes.shape[0]), pa.int64()),
            "node_id": pa.array(nodes, pa.int64()),
            "cost": pa.array(costs, pa.float64()),
        }
    )
