"""Strongly connected components — trim + forward-backward coloring.

Reference semantics (``gds.scc``, [GDS-pub: algo/.../scc/]): partition
of the *directed* graph into maximal mutually-reachable node sets; each
node reports a componentId. The reference uses sequential Tarjan; that
is inherently DFS-ordered, so this engine uses the parallel
**coloring/FW-BW algorithm** (Fleischer/Hendrickson/Pinar; Slota et al.
— public results), whose primitives are exactly this engine's dataflow
rounds:

per outer round (on the still-active subgraph):
1. **Trim**: repeatedly deactivate nodes with in-degree 0 or out-degree
   0 in the active subgraph — each is its own singleton SCC. (Web
   graphs are dominated by trivial SCCs; trimming removes them in a few
   degree-counting rounds.)
2. **Color**: propagate ``color_v ← min(color_v, color_u : u→v)`` to a
   fixpoint (min-label rounds, same kernel family as WCC but directed).
   At the fixpoint, color[v] = smallest active id with a forward path
   to v; nodes with ``color == own id`` are roots.
3. **Backward sweep**: within each color class, mark nodes that reach
   their root (reverse-BFS rounds restricted to same-color edges); the
   marked set of root r IS the SCC of r — and r is provably the SCC's
   minimum member, so componentIds are canonical (min member) without a
   relabel pass.

Every inner step is one scan over the active edge table with a
per-batch partial (count / min / any-combiner) merged on the driver
(node-vector standing assumption, algos/common.py). The active edge
table is re-filtered and re-materialized once per outer round, so later
rounds scan only the shrinking residual subgraph.

Output: componentId = min node_id of the SCC (matches the networkx
``strongly_connected_components`` oracle after the same
canonicalization).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.algos.common import (
    BlockScanner,
    community_postprocess,
    unique_inverse,
    unique_node_ids,
)
from graph_data_science_ray.context import configure_ray_data
from graph_data_science_ray.sources.edges import drop_self_loops


class SccResult:
    def __init__(self, node_ids: np.ndarray, values: np.ndarray, outer_rounds: int, metrics: list):
        self.node_ids = node_ids
        self.values = values
        self.value_name = "component"
        self.outer_rounds = outer_rounds
        self.metrics = metrics

    def as_dict(self) -> dict:
        return dict(zip(self.node_ids.tolist(), self.values.tolist()))

    def to_table(self) -> pa.Table:
        return pa.table(
            {
                "node_id": pa.array(self.node_ids, pa.int64()),
                "component": pa.array(self.values, pa.int64()),
            }
        )


def _filter_active(edges: Dataset, ids_ref) -> Dataset:
    """Keep edges whose BOTH endpoints are in the active id set."""

    def fn(t: pa.Table) -> pa.Table:
        ids, active = ray.get(ids_ref)
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        dst = t.column("dst_id").to_numpy(zero_copy_only=False)
        n = ids.shape[0]
        sp = np.minimum(np.searchsorted(ids, src), n - 1)
        dp = np.minimum(np.searchsorted(ids, dst), n - 1)
        keep = (ids[sp] == src) & active[sp] & (ids[dp] == dst) & active[dp]
        return t.filter(pa.array(keep))

    return edges.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _degree_counts(active_edges: Dataset, node_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(out_deg, in_deg) over the active subgraph, driver-merged."""

    def fn(t: pa.Table) -> pa.Table:
        # two independent partial count tables concatenated row-wise,
        # tagged by kind (0 = out, 1 = in)
        parts = []
        for k, key in enumerate(("src_id", "dst_id")):
            ids = t.column(key).to_numpy(zero_copy_only=False)
            u, c = np.unique(ids, return_counts=True)
            parts.append((u, c, np.full(u.shape[0], k, dtype=np.int8)))
        node = np.concatenate([p[0] for p in parts])
        cnt = np.concatenate([p[1] for p in parts])
        kind = np.concatenate([p[2] for p in parts])
        return pa.table(
            {
                "node_id": pa.array(node, pa.int64()),
                "kind": pa.array(kind, pa.int8()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    t = BlockScanner(active_edges).scan(fn)
    out_deg = np.zeros(node_ids.shape[0], dtype=np.int64)
    in_deg = np.zeros(node_ids.shape[0], dtype=np.int64)
    if t.num_rows:
        node = t.column("node_id").to_numpy(zero_copy_only=False)
        kind = t.column("kind").to_numpy(zero_copy_only=False)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(node_ids, node)
        np.add.at(out_deg, pos[kind == 0], cnt[kind == 0])
        np.add.at(in_deg, pos[kind == 1], cnt[kind == 1])
    return out_deg, in_deg


def strongly_connected_components(
    edges: Dataset,
    max_outer: int = 50,
    max_inner: int = 200,
    num_partitions: int | None = None,
    consecutive_ids: bool = False,
    min_component_size: int | None = None,
) -> SccResult:
    """``consecutive_ids`` / ``min_component_size``: GDS output options —
    renumber components 0..k-1 / drop nodes in components below the
    size floor [GDS-pub: scc proc config]."""
    configure_ray_data()
    edges = drop_self_loops(edges)  # self-loops don't affect SCC membership
    node_ids = unique_node_ids(edges)
    n = node_ids.shape[0]
    scc = np.full(n, -1, dtype=np.int64)
    active = np.ones(n, dtype=bool)
    metrics: list[dict] = []

    current = edges.materialize()
    outer = 0
    for outer in range(1, max_outer + 1):
        if not active.any():
            break

        # -- trim rounds ------------------------------------------------
        trimmed_total = 0
        while True:
            out_deg, in_deg = _degree_counts(current, node_ids)
            trim = active & ((out_deg == 0) | (in_deg == 0))
            if not trim.any():
                break
            scc[trim] = node_ids[trim]
            active &= ~trim
            trimmed_total += int(trim.sum())
            ids_ref = ray.put((node_ids, active))
            current = _filter_active(current, ids_ref).materialize()
        if not active.any():
            metrics.append({"outer": outer, "trimmed": trimmed_total, "colored": 0})
            break

        # -- coloring to fixpoint --------------------------------------
        scanner = BlockScanner(current)  # fixed for both inner loops below
        color = node_ids.copy()
        for _ in range(max_inner):
            state_ref = ray.put((node_ids, color))

            def scatter_min(t: pa.Table) -> pa.Table:
                ids, col = ray.get(state_ref)
                src = t.column("src_id").to_numpy(zero_copy_only=False)
                dst = t.column("dst_id").to_numpy(zero_copy_only=False)
                sc = col[np.searchsorted(ids, src)]
                u, inv = unique_inverse(dst)
                best = np.full(u.shape[0], np.iinfo(np.int64).max, dtype=np.int64)
                np.minimum.at(best, inv, sc)
                return pa.table(
                    {"node_id": pa.array(u, pa.int64()), "m": pa.array(best, pa.int64())}
                )

            t = scanner.scan(scatter_min)
            new = color.copy()
            if t.num_rows:
                pos = np.searchsorted(node_ids, t.column("node_id").to_numpy(zero_copy_only=False))
                np.minimum.at(new, pos, t.column("m").to_numpy(zero_copy_only=False))
            if np.array_equal(new, color):
                break
            color = new

        # -- backward sweep: mark nodes reaching their root ------------
        reached = active & (color == node_ids)
        for _ in range(max_inner):
            state_ref = ray.put((node_ids, color, reached))

            def scatter_back(t: pa.Table) -> pa.Table:
                ids, col, rch = ray.get(state_ref)
                src = t.column("src_id").to_numpy(zero_copy_only=False)
                dst = t.column("dst_id").to_numpy(zero_copy_only=False)
                sp = np.searchsorted(ids, src)
                dp = np.searchsorted(ids, dst)
                # u→v, same color, v already reaches root ⇒ u reaches root
                mark = (col[sp] == col[dp]) & rch[dp] & ~rch[sp]
                u = np.unique(src[mark])
                return pa.table({"node_id": pa.array(u, pa.int64())})

            t = scanner.scan(scatter_back)
            if t.num_rows == 0:
                break
            pos = np.searchsorted(node_ids, t.column("node_id").to_numpy(zero_copy_only=False))
            before = int(reached.sum())
            reached[pos] = True
            if int(reached.sum()) == before:
                break

        extract = active & reached
        scc[extract] = color[extract]
        active &= ~extract
        metrics.append(
            {"outer": outer, "trimmed": trimmed_total, "colored": int(extract.sum())}
        )
        if active.any():
            ids_ref = ray.put((node_ids, active))
            current = _filter_active(current, ids_ref).materialize()

    node_ids, scc, _ = community_postprocess(
        node_ids, scc, consecutive_ids, min_component_size
    )
    return SccResult(node_ids, scc, outer, metrics)
