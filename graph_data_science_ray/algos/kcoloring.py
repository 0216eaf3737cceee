"""K-1 Coloring — speculative greedy coloring with conflict resolution.

Reference semantics (``gds.k1coloring``, [GDS-pub: algo/.../k1coloring/]):
assign each node a color (small int) such that no two adjacent nodes
share one, using as few colors as the greedy scheme manages; iterative:
every round, uncolored/conflicted nodes speculatively take the smallest
color not used by any neighbor, then conflicts (adjacent equal colors)
are detected and exactly one endpoint — the larger id, a deterministic
priority rule — goes back to the active set. This is the classic
Gebremedhin–Manne parallel coloring (public algorithm), and both of its
phases are single dataflow rounds over the symmetrized edge table:

- **assign**: scatter neighbor colors → per-node *mex* (minimum
  excludant) computed vectorized from the merged (node, color) set;
- **detect**: scan edges, emit the larger endpoint of every
  monochromatic edge.

State is the node-sized color vector (driver-held, ``ray.put``
broadcast per round — algos/common.py standing assumption).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.algos.common import BlockScanner, unique_node_ids
from graph_data_science_ray.context import configure_ray_data
from graph_data_science_ray.sources.edges import drop_self_loops, symmetrize


class ColoringResult:
    def __init__(self, node_ids, values, iterations, converged, n_colors):
        self.node_ids = node_ids
        self.values = values
        self.value_name = "color"
        self.iterations = iterations
        self.converged = converged
        self.n_colors = n_colors

    def as_dict(self) -> dict:
        return dict(zip(self.node_ids.tolist(), self.values.tolist()))

    def to_table(self) -> pa.Table:
        return pa.table(
            {
                "node_id": pa.array(self.node_ids, pa.int64()),
                "color": pa.array(self.values, pa.int64()),
            }
        )


def _mex_per_node(node: np.ndarray, color: np.ndarray, node_ids: np.ndarray) -> np.ndarray:
    """Vectorized minimum-excludant of each node's distinct neighbor
    colors; nodes absent from ``node`` get mex 0."""
    key_order = np.lexsort((color, node))
    node, color = node[key_order], color[key_order]
    dedup = np.r_[True, (node[1:] != node[:-1]) | (color[1:] != color[:-1])]
    node, color = node[dedup], color[dedup]
    starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
    group_of = np.cumsum(np.r_[True, node[1:] != node[:-1]]) - 1
    rank = np.arange(node.shape[0]) - starts[group_of]
    # mex = rank of first color != rank, else group size
    big = np.iinfo(np.int64).max
    miss = np.where(color != rank, rank, big)
    sizes = np.diff(np.r_[starts, node.shape[0]])
    mex = np.full(starts.shape[0], big, dtype=np.int64)
    np.minimum.at(mex, group_of, miss)
    mex = np.minimum(mex, sizes)
    out = np.zeros(node_ids.shape[0], dtype=np.int64)
    out[np.searchsorted(node_ids, node[starts])] = mex
    return out


def _k1coloring_csr(
    edges: Dataset,
    max_iterations: int,
    num_partitions: int | None,
    num_shards: int | None,
) -> ColoringResult:
    """Sharded Gebremedhin–Manne (round-4 migration): color state lives
    on the CSR shard actors; each iteration is two keyed exchanges of
    distinct (dst, neighbor-color, min-src) rows — assign (mex) then
    conflict detect — with the driver moving only refs and the active
    count. No node vector or per-round ``ray.put`` on the driver."""
    from graph_data_science_ray.state.engine import CsrEngine

    configure_ray_data()
    sym = drop_self_loops(symmetrize(edges, dedup=True, num_partitions=num_partitions))
    engine = CsrEngine.build(sym, num_shards=num_shards or 8)
    shards, P = engine.shards, engine.P
    hub_i = np.empty(0, dtype=np.int64)
    hub_v = np.empty(0, dtype=np.float64)
    ray.get([s.init_state.remote("minus_ones") for s in shards])

    def exchange(apply_kind: str) -> list[float]:
        emits = [s.emit.options(num_returns=P).remote("color_pairs", hub_i, hub_v)
                 for s in shards]
        if P == 1:
            emits = [[e] for e in emits]
        return ray.get([
            shards[j].apply.remote(apply_kind, 0.0, *[emits[i][j] for i in range(P)])
            for j in range(P)
        ])

    iteration = 0
    converged = False
    for iteration in range(1, max_iterations + 1):
        exchange("color_mex")
        n_active = sum(exchange("color_detect"))
        if n_active == 0:
            converged = True
            break

    refs = [s.get_state_named.remote("color", True) for s in shards]
    parts = ray.get(refs)
    engine.shutdown()
    t = pa.concat_tables(parts)
    ids = t.column("node_id").to_numpy(zero_copy_only=False).astype(np.int64)
    col = t.column("color").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids, col = ids[order], col[order]
    # self-loop-only nodes are absent from the engine universe but get
    # color 0 on the dataflow backend (degree 0 after the drop) — union
    # them back (round-5 ADVICE fix)
    from graph_data_science_ray.algos.common import self_loop_only_nodes
    from graph_data_science_ray.algos.louvain import _union_isolated

    ids, col = _union_isolated(ids, col, self_loop_only_nodes(edges), fill=0)
    n_colors = int(np.unique(col).shape[0]) if ids.shape[0] else 0
    return ColoringResult(ids, col, iteration, converged, n_colors)


def k1coloring(
    edges: Dataset,
    max_iterations: int = 100,
    num_partitions: int | None = None,
    backend: str = "csr",
    num_shards: int | None = None,
) -> ColoringResult:
    """``backend="csr"`` (default since round 4): sharded speculative
    coloring — see ``_k1coloring_csr``; ``backend="dataflow"`` keeps the
    broadcast-state scan loop (parity-tested equal)."""
    if backend == "csr":
        return _k1coloring_csr(edges, max_iterations, num_partitions, num_shards)
    configure_ray_data()
    sym = drop_self_loops(symmetrize(edges, dedup=True, num_partitions=num_partitions)).materialize()
    node_ids = unique_node_ids(edges)
    n = node_ids.shape[0]
    scanner = BlockScanner(sym)
    colors = np.full(n, -1, dtype=np.int64)  # -1 = not yet colored
    active = np.ones(n, dtype=bool)
    iteration = 0
    converged = False

    for iteration in range(1, max_iterations + 1):
        # ---- assign: mex of neighbor colors, for active nodes only ----
        state_ref = ray.put((node_ids, colors, active))

        def scatter_colors(t: pa.Table) -> pa.Table:
            ids, col, act = ray.get(state_ref)
            src = t.column("src_id").to_numpy(zero_copy_only=False)
            dst = t.column("dst_id").to_numpy(zero_copy_only=False)
            dp = np.searchsorted(ids, dst)
            keep = act[dp]  # only receivers being recolored need input
            src, dp = src[keep], dp[keep]
            sc = col[np.searchsorted(ids, src)]
            colored = sc >= 0  # uncolored neighbors forbid nothing
            dp, sc = dp[colored], sc[colored]
            # distinct (dst, neighbor color) per batch
            width = sc.max() + 1 if sc.shape[0] else 1
            packed = np.unique(dp.astype(np.int64) * width + sc)
            return pa.table(
                {
                    "node_id": pa.array(ids[(packed // width)], pa.int64()),
                    "c": pa.array(packed % width, pa.int64()),
                }
            )

        t = scanner.scan(scatter_colors)
        mex = np.zeros(n, dtype=np.int64)
        if t.num_rows:
            node = t.column("node_id").to_numpy(zero_copy_only=False)
            c = t.column("c").to_numpy(zero_copy_only=False)
            mex = _mex_per_node(node, c, node_ids)
        colors = np.where(active, mex, colors)

        # ---- detect conflicts: larger endpoint of monochromatic edges -
        state_ref2 = ray.put((node_ids, colors))

        def detect(t2: pa.Table) -> pa.Table:
            ids, col = ray.get(state_ref2)
            src = t2.column("src_id").to_numpy(zero_copy_only=False)
            dst = t2.column("dst_id").to_numpy(zero_copy_only=False)
            same = col[np.searchsorted(ids, src)] == col[np.searchsorted(ids, dst)]
            loser = np.maximum(src[same], dst[same])
            return pa.table({"node_id": pa.array(np.unique(loser), pa.int64())})

        t2 = scanner.scan(detect)
        active = np.zeros(n, dtype=bool)
        if t2.num_rows == 0:
            converged = True
            break
        active[np.searchsorted(node_ids, t2.column("node_id").to_numpy(zero_copy_only=False))] = True

    n_colors = int(np.unique(colors).shape[0]) if n else 0
    return ColoringResult(node_ids, colors, iteration, converged, n_colors)
