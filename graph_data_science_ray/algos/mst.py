"""Minimum (weight) spanning forest — Borůvka rounds over the edge table.

Reference semantics (``gds.spanningTree`` / ``gds.kSpanningTree``,
[GDS-pub: algo/.../spanningtree/]): minimum-weight spanning tree of the
undirected weighted view, rooted per component (forest when the graph is
disconnected). The reference runs sequential Prim; Prim's frontier is a
priority queue, a poor dataflow fit — this engine uses **Borůvka**
(public classic): every round, each current component picks its
minimum-weight outgoing edge, all picked edges join the forest, and the
components they connect merge. O(log n) rounds, each round = one scan
over the edge table with a per-batch (component → min candidate)
combiner merged on the driver, then a driver-side union-find pass over
the ≤ #components picked edges (component count shrinks ≥ 2× per
round).

Determinism: candidates are ordered by (weight, min endpoint, max
endpoint) lexicographically, so the forest is unique and stable across
runs and parallelism — with distinct weights it IS the unique MST, and
with ties the total weight still matches any valid MST (matroid
property, verified against the networkx oracle in tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.algos.common import BlockScanner, unique_node_ids
from graph_data_science_ray.context import configure_ray_data
from graph_data_science_ray.sources.edges import drop_self_loops


class ForestResult:
    def __init__(self, edges_table: pa.Table, total_weight: float, rounds: int, n_components: int):
        self.edges = edges_table  # u, v, weight (u < v)
        self.total_weight = total_weight
        self.rounds = rounds
        self.n_components = n_components


def minimum_spanning_forest(
    edges: Dataset,
    max_rounds: int = 64,
    num_partitions: int | None = None,
) -> ForestResult:
    """``edges`` must carry (src_id, dst_id, weight). Direction is
    ignored (undirected view); self-loops dropped."""
    configure_ray_data()
    edges = drop_self_loops(edges).materialize()
    node_ids = unique_node_ids(edges)
    n = node_ids.shape[0]
    comp = np.arange(n, dtype=np.int64)  # positional component labels

    picked_u: list[np.ndarray] = []
    picked_v: list[np.ndarray] = []
    picked_w: list[np.ndarray] = []

    rounds = 0
    scanner = BlockScanner(edges)
    for rounds in range(1, max_rounds + 1):
        state_ref = ray.put((node_ids, comp))

        def scatter(t: pa.Table) -> pa.Table:
            ids, cmp = ray.get(state_ref)
            src = t.column("src_id").to_numpy(zero_copy_only=False)
            dst = t.column("dst_id").to_numpy(zero_copy_only=False)
            w = t.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
            cs = cmp[np.searchsorted(ids, src)]
            cd = cmp[np.searchsorted(ids, dst)]
            cross = cs != cd
            if not cross.any():
                return pa.table(
                    {
                        "c": pa.array([], pa.int64()),
                        "w": pa.array([], pa.float64()),
                        "u": pa.array([], pa.int64()),
                        "v": pa.array([], pa.int64()),
                    }
                )
            src, dst, w, cs, cd = src[cross], dst[cross], w[cross], cs[cross], cd[cross]
            lo = np.minimum(src, dst)
            hi = np.maximum(src, dst)
            # each edge is a candidate for BOTH endpoint components
            c = np.concatenate([cs, cd])
            w2 = np.concatenate([w, w])
            lo2 = np.concatenate([lo, lo])
            hi2 = np.concatenate([hi, hi])
            # per-batch min candidate per component, (w, lo, hi) lexicographic
            order = np.lexsort((hi2, lo2, w2, c))
            c, w2, lo2, hi2 = c[order], w2[order], lo2[order], hi2[order]
            first = np.r_[True, c[1:] != c[:-1]]
            return pa.table(
                {
                    "c": pa.array(c[first], pa.int64()),
                    "w": pa.array(w2[first], pa.float64()),
                    "u": pa.array(lo2[first], pa.int64()),
                    "v": pa.array(hi2[first], pa.int64()),
                }
            )

        t = scanner.scan(scatter)
        if t.num_rows == 0:
            rounds -= 1
            break
        c = t.column("c").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u, w, c))
        c, w, u, v = c[order], w[order], u[order], v[order]
        first = np.r_[True, c[1:] != c[:-1]]
        w, u, v = w[first], u[first], v[first]

        # dedup edges picked by both sides (same (u,v) pair)
        pair_order = np.lexsort((v, u))
        u, v, w = u[pair_order], v[pair_order], w[pair_order]
        uniq = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
        u, v, w = u[uniq], v[uniq], w[uniq]

        # driver union-find over picked edges; then path-compress comp
        parent = comp.copy()

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        pu = np.searchsorted(node_ids, u)
        pv = np.searchsorted(node_ids, v)
        kept = np.zeros(u.shape[0], dtype=bool)
        for i in range(u.shape[0]):
            ru, rv = find(comp[pu[i]]), find(comp[pv[i]])
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
                kept[i] = True
        picked_u.append(u[kept])
        picked_v.append(v[kept])
        picked_w.append(w[kept])
        # vectorized pointer doubling: parent → root for every slot
        while True:
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
        comp = parent[comp]

    fu = np.concatenate(picked_u) if picked_u else np.array([], dtype=np.int64)
    fv = np.concatenate(picked_v) if picked_v else np.array([], dtype=np.int64)
    fw = np.concatenate(picked_w) if picked_w else np.array([], dtype=np.float64)
    order = np.lexsort((fv, fu))
    forest = pa.table(
        {
            "u": pa.array(fu[order], pa.int64()),
            "v": pa.array(fv[order], pa.int64()),
            "weight": pa.array(fw[order], pa.float64()),
        }
    )
    n_components = int(np.unique(comp).shape[0]) if n else 0
    return ForestResult(forest, float(fw.sum()), rounds, n_components)


def spanning_forest(
    edges: Dataset,
    objective: str = "minimum",
    max_rounds: int = 64,
    num_partitions: int | None = None,
) -> ForestResult:
    """``gds.spanningTree`` with the ``objective`` config key
    [GDS-pub: algo/.../spanningtree/ — Prim with min/max priority]:
    ``minimum`` is Borůvka as-is; ``maximum`` runs the same rounds on
    negated weights (arg-max = arg-min of −w, tie-breaks stay
    deterministic) and reports the original weights back."""
    if objective == "minimum":
        return minimum_spanning_forest(edges, max_rounds, num_partitions)
    if objective != "maximum":
        raise ValueError("objective must be 'minimum' or 'maximum'")

    def neg(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        i = t.schema.get_field_index("weight")
        return t.set_column(
            i, "weight", pc.negate(pc.cast(t.column("weight"), pa.float64()))
        )

    res = minimum_spanning_forest(
        edges.map_batches(neg, batch_format="pyarrow", zero_copy_batch=True),
        max_rounds, num_partitions,
    )
    f = res.edges
    i = f.schema.get_field_index("weight")
    import pyarrow.compute as pc

    flipped = f.set_column(i, "weight", pc.negate(f.column("weight")))
    return ForestResult(flipped, -res.total_weight, res.rounds, res.n_components)


def k_spanning_tree(
    edges: Dataset,
    k: int,
    objective: str = "minimum",
    num_partitions: int | None = None,
) -> ForestResult:
    """K-Spanning tree (``gds.kSpanningTree`` [GDS-pub:
    algo/.../spanningtree/KSpanningTree]): prune the spanning tree down
    to exactly ``k`` nodes by repeatedly removing the worst leaf edge
    (max weight for ``minimum`` objective, min weight for ``maximum``;
    ties → larger leaf id removed first).

    The distributed part is the Borůvka forest (one scan per round);
    pruning operates on the ≤ n-1 forest edges — node-vector-sized
    driver state, the dataflow path's standing assumption. Prunes the
    largest component of the forest (the reference prunes the root's
    component; we have no root parameter by default)."""
    import heapq

    forest = minimum_spanning_forest(edges, num_partitions=num_partitions)
    fu = forest.edges.column("u").to_numpy(zero_copy_only=False)
    fv = forest.edges.column("v").to_numpy(zero_copy_only=False)
    fw = forest.edges.column("weight").to_numpy(zero_copy_only=False)
    if fu.shape[0] == 0 or k <= 1:
        empty = pa.table({"u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64()),
                          "weight": pa.array([], pa.float64())})
        return ForestResult(empty, 0.0, forest.rounds, forest.n_components)

    # adjacency of the forest (tiny)
    import collections
    adj: dict[int, dict[int, float]] = collections.defaultdict(dict)
    for a, b, w in zip(fu.tolist(), fv.tolist(), fw.tolist()):
        adj[a][b] = w
        adj[b][a] = w

    # pick the largest component (tie → the one with the smallest node id)
    seen: set[int] = set()
    best_comp: list[int] = []
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = [], [start]
        seen.add(start)
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        if len(comp) > len(best_comp):
            best_comp = comp
    alive = set(best_comp)
    if k >= len(alive):
        keep = alive
    else:
        sign = -1.0 if objective == "maximum" else 1.0
        # heap of leaf edges: (sign*-weight … ) we pop the WORST leaf:
        # for minimum objective remove the heaviest leaf edge first
        def leaf_key(x):
            (nb, w), = adj[x].items()
            return (-sign * w, -x)

        heap = [(*leaf_key(x), x) for x in alive if len(adj[x]) == 1]
        heapq.heapify(heap)
        n_alive = len(alive)
        while n_alive > k and heap:
            kw, kx, x = heapq.heappop(heap)
            if x not in alive or len(adj[x]) != 1 or (*leaf_key(x),) != (kw, kx):
                continue  # stale entry
            (nb, _), = adj[x].items()
            alive.discard(x)
            del adj[nb][x]
            del adj[x]
            n_alive -= 1
            if len(adj[nb]) == 1 and nb in alive:
                heapq.heappush(heap, (*leaf_key(nb), nb))
        keep = alive

    mask = np.array([a in keep and b in keep for a, b in zip(fu.tolist(), fv.tolist())])
    out = pa.table({"u": pa.array(fu[mask], pa.int64()),
                    "v": pa.array(fv[mask], pa.int64()),
                    "weight": pa.array(fw[mask], pa.float64())})
    return ForestResult(out, float(fw[mask].sum()), forest.rounds, 1)


def spanning_tree(
    edges: Dataset,
    source_node: int,
    objective: str = "minimum",
    num_partitions: int | None = None,
) -> ForestResult:
    """``gds.spanningTree`` semantics [GDS-pub: algo/.../spanningtree/ +
    public docs]: the min- (or max-) weight spanning tree of the
    component CONTAINING ``source_node``. The reference runs Prim from
    the source; the Borůvka forest restricted to the source's component
    is the same tree (unique under this engine's deterministic
    tie-break), so this is a driver-side filter over the forest edges.

    ``objective='maximum'`` negates weights into the Borůvka pass
    (classic reduction) and restores them in the result."""
    if objective not in ("minimum", "maximum"):
        raise ValueError("objective must be 'minimum' or 'maximum'")
    if objective == "maximum":
        def neg(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            i = t.schema.get_field_index("weight")
            return t.set_column(i, "weight", pc.negate(t.column("weight")))

        edges = edges.map_batches(neg, batch_format="pyarrow", zero_copy_batch=True)
    forest = minimum_spanning_forest(edges, num_partitions=num_partitions)

    fu = forest.edges.column("u").to_numpy(zero_copy_only=False)
    fv = forest.edges.column("v").to_numpy(zero_copy_only=False)
    fw = forest.edges.column("weight").to_numpy(zero_copy_only=False)
    if objective == "maximum":
        fw = -fw

    # union-find over the ≤ n−1 forest edges → component of the source
    ids = np.unique(np.concatenate([fu, fv, np.array([source_node], np.int64)]))
    parent = np.arange(ids.shape[0], dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    pu = np.searchsorted(ids, fu)
    pv = np.searchsorted(ids, fv)
    for i in range(fu.shape[0]):
        ru, rv = find(pu[i]), find(pv[i])
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    root = find(int(np.searchsorted(ids, source_node)))
    mask = np.fromiter((find(int(a)) == root for a in pu), bool, pu.shape[0])

    out = pa.table({"u": pa.array(fu[mask], pa.int64()),
                    "v": pa.array(fv[mask], pa.int64()),
                    "weight": pa.array(fw[mask], pa.float64())})
    return ForestResult(out, float(fw[mask].sum()), forest.rounds, 1)
