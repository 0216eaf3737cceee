"""Prize-collecting Steiner tree — greedy path accretion + net-value
leaf pruning.

Reference semantics (``gds.prizeSteinerTree``
[GDS-pub: algo/.../steiner/ prize-collecting variant]): given
non-negative node prizes and edge costs, find a tree maximizing
``Σ prize(v in tree) − Σ cost(e in tree)`` (unrooted; the reference
ships a heuristic — the problem is NP-hard).

This engine's heuristic (public building blocks only):

1. Root at the max-prize node (min node id tie-break).
2. Accrete: run a **multi-source** ``shortest_path_tree`` from the
   current tree (one distributed Bellman-Ford per round — distances to
   the nearest tree node), compute each node's marginal gain
   ``prize(v) − dist(v)``, and attach EVERY strictly-positive node
   whose predecessor path is node-disjoint from paths already attached
   this round (greedy by gain; overlapping candidates wait one round —
   their gain only improves as the tree grows). Path nodes' own prizes
   are collected too, so the gain estimate is a lower bound and
   attaching never decreases the objective; batching keeps the round
   count near O(log) of the tree size instead of one SPT per node.
3. Stop when no strictly positive gain remains (or ``max_rounds``).
4. Prune: repeatedly drop any leaf whose subtree net value is negative
   (same worst-leaf loop shape as ``k_spanning_tree``) — after pruning
   every leaf pays for itself, a property the tests assert.

Each accretion round costs O(diameter) streamed edge scans; rounds are
bounded by the number of attached paths. Prizes are broadcast once via
``ray.put`` inside the relaxation state; the edge table is only ever
scanned, never shuffled.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from graph_data_science_ray.algos.paths import shortest_path_tree
from graph_data_science_ray.context import configure_ray_data


class PcstResult:
    def __init__(self, edges_table: pa.Table, nodes: np.ndarray, total_prize: float,
                 total_cost: float, rounds: int):
        self.edges = edges_table          # u, v, weight (u < v)
        self.nodes = nodes                # sorted node ids in the tree
        self.total_prize = total_prize
        self.total_cost = total_cost
        self.net_value = total_prize - total_cost
        self.rounds = rounds

    def to_table(self) -> pa.Table:
        return self.edges


def prize_steiner_tree(
    edges: Dataset,
    prizes: dict[int, float] | pa.Table,
    max_rounds: int = 64,
    max_iterations: int = 100,
    num_partitions: int | None = None,
) -> PcstResult:
    """``prizes``: node_id → prize (missing nodes prize 0), as a dict or
    a (node_id, prize) arrow table. Edges must carry ``weight`` ≥ 0 and
    are treated as undirected."""
    configure_ray_data()
    if isinstance(prizes, pa.Table):
        p_ids = prizes.column("node_id").to_numpy(zero_copy_only=False).astype(np.int64)
        p_val = prizes.column("prize").to_numpy(zero_copy_only=False).astype(np.float64)
    else:
        p_ids = np.array(sorted(prizes), dtype=np.int64)
        p_val = np.array([float(prizes[int(i)]) for i in p_ids], dtype=np.float64)
    if (p_val < 0).any():
        raise ValueError("prizes must be non-negative")

    # symmetrize + materialize ONCE — every accretion round re-scans this
    # (a lazy input would re-execute its whole upstream pipeline per round)
    from graph_data_science_ray.sources.edges import symmetrize

    g = symmetrize(edges, dedup=False, num_partitions=num_partitions).materialize()

    # root: max prize, min id tie-break
    best = np.lexsort((p_ids, -p_val))[0]
    root = int(p_ids[best])

    tree_nodes: set[int] = {root}
    tree_u: list[int] = []
    tree_v: list[int] = []
    tree_w: list[float] = []

    def prize_of(ids: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(p_ids, ids)
        ok = (pos < p_ids.shape[0]) & (p_ids[np.minimum(pos, max(p_ids.shape[0] - 1, 0))] == ids)
        out = np.zeros(ids.shape[0], dtype=np.float64)
        out[ok] = p_val[pos[ok]]
        return out

    rounds = 0
    for rounds in range(1, max_rounds + 1):
        res, pred = shortest_path_tree(
            g, weighted=True, max_iterations=max_iterations,
            undirected=False, num_partitions=num_partitions,
            sources=sorted(tree_nodes),
        )
        node_arr = res.node_ids
        dist = res.values
        gain = prize_of(node_arr) - dist
        in_tree = np.isin(node_arr, np.fromiter(tree_nodes, np.int64, len(tree_nodes)))
        gain[in_tree] = -np.inf
        gain[~np.isfinite(dist)] = -np.inf
        pos_order = np.lexsort((node_arr, -gain))
        attached_any = False
        used: set[int] = set()  # non-tree nodes claimed by a path this round
        for cand in pos_order:
            if not gain[cand] > 0:
                break
            target = int(node_arr[cand])
            if target in used or target in tree_nodes:
                continue
            # unfold the predecessor path back to the tree
            pos = int(np.searchsorted(node_arr, target))
            path = [target]
            while pred[pos] >= 0:
                nxt = int(pred[pos])
                path.append(nxt)
                pos = int(np.searchsorted(node_arr, nxt))
            # all nodes before the final tree endpoint must be unclaimed —
            # overlapping candidates wait for the next round
            if any(x in used or (x in tree_nodes and x != path[-1]) for x in path[:-1]):
                continue
            for a, b in zip(path, path[1:]):
                pa_, pb = np.searchsorted(node_arr, a), np.searchsorted(node_arr, b)
                w = float(dist[pa_] - dist[pb])
                tree_u.append(min(a, b))
                tree_v.append(max(a, b))
                tree_w.append(w)
            used.update(path[:-1])
            attached_any = True
        if not attached_any:
            break
        tree_nodes.update(used)

    # leaf pruning: drop negative-net leaves until every leaf pays
    u = np.array(tree_u, dtype=np.int64)
    v = np.array(tree_v, dtype=np.int64)
    w = np.array(tree_w, dtype=np.float64)
    alive = np.ones(u.shape[0], dtype=bool)
    nodes_alive = set(tree_nodes)
    while True:
        deg: dict[int, int] = {}
        for i in np.flatnonzero(alive):
            deg[u[i]] = deg.get(u[i], 0) + 1
            deg[v[i]] = deg.get(v[i], 0) + 1
        dropped = False
        for i in sorted(np.flatnonzero(alive), key=lambda j: (-w[j], u[j], v[j])):
            for leaf, other in ((u[i], v[i]), (v[i], u[i])):
                if deg.get(int(leaf), 0) == 1 and int(leaf) != root:
                    if float(prize_of(np.array([leaf]))[0]) < w[i]:
                        alive[i] = False
                        nodes_alive.discard(int(leaf))
                        dropped = True
                        break
            if dropped:
                break
        if not dropped:
            break

    u, v, w = u[alive], v[alive], w[alive]
    order = np.lexsort((v, u))
    nodes = np.array(sorted(nodes_alive), dtype=np.int64)
    total_prize = float(prize_of(nodes).sum())
    return PcstResult(
        pa.table(
            {
                "u": pa.array(u[order], pa.int64()),
                "v": pa.array(v[order], pa.int64()),
                "weight": pa.array(w[order], pa.float64()),
            }
        ),
        nodes,
        total_prize,
        float(w.sum()),
        rounds,
    )
