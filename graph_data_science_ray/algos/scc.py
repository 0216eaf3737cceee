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


def _scc_csr(
    edges: Dataset,
    max_outer: int,
    num_partitions: int | None,
    num_shards: int | None,
) -> SccResult:
    """Sharded-state FW-BW (round 3): every phase is either a CSR-shard
    Pregel or a partitioned hash join — the driver moves refs, counts
    and per-round scalars only.

    Per outer round over the shrinking active edge set:
    1. **Color** (forward engine): min-combine frontier Pregel with
       identity init → color[v] = min active id with a forward path
       to v (roots = color == id, provably the SCC minimum member).
    2. **Backward sweep**: filter the round's edges to SAME-COLOR pairs
       (two hash joins against the color Dataset), REVERSE them, build a
       second engine, and run the identical min-Pregel:
       b[v] = min same-color id forward-reachable FROM v. Membership is
       then just ``b == color`` — v reaches its root iff the minimum it
       reaches is the class minimum (no root bookkeeping, no per-class
       serialization; cross-color pollution is impossible because the
       sweep graph carries only same-color edges).
    3. Marked nodes leave with component = color; the next round's edge
       set drops any edge touching them (two anti-joins). Every class
       removes at least its root, so the loop terminates.
    Nodes never seen with a surviving edge are singleton SCCs
    (component = own id), assigned by one final anti-join."""
    import ray.data

    from graph_data_science_ray.functions.joins import hash_join
    from graph_data_science_ray.state.engine import CsrEngine

    configure_ray_data()
    g = drop_self_loops(edges.select_columns(["src_id", "dst_id"])).materialize()

    def _nodes_of(ds: Dataset) -> Dataset:
        def emit(t: pa.Table) -> pa.Table:
            ids = np.unique(np.concatenate([
                t.column("src_id").to_numpy(zero_copy_only=False),
                t.column("dst_id").to_numpy(zero_copy_only=False),
            ])) if t.num_rows else np.empty(0, np.int64)
            return pa.table({"node_id": pa.array(ids, pa.int64())})

        return (ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
                .groupby("node_id", num_partitions=num_partitions).count()
                .select_columns(["node_id"]))

    # full node set incl. self-loop-only nodes (parity with the dataflow
    # path's unique_node_ids-before-drop universe)
    all_nodes = _nodes_of(edges.select_columns(["src_id", "dst_id"])).materialize()

    def ident(ids: np.ndarray) -> np.ndarray:
        return ids.copy()

    def upd_min(state, combined, has_msg, ids):
        return np.minimum(state, combined)

    # fixpoint runs; 100k rounds bounds a pathological O(n)-diameter
    # chain without ever truncating a real web graph's propagation
    pregel_kw = dict(send=None, update=upd_min, init=ident, combine="min",
                     frontier=True, residual="changed", is_int=True,
                     max_iterations=100_000, tolerance=0.0)

    active = g
    done_parts: list[Dataset] = []
    metrics: list[dict] = []
    outer = 0
    for outer in range(1, max_outer + 1):
        active = active.materialize()
        n_edges = active.count()
        if n_edges == 0:
            outer -= 1
            break
        eng = CsrEngine.build(active, num_shards=num_shards or 8)
        color_res = eng.pregel(value_name="color", **pregel_kw)
        color_ds = ray.data.from_arrow_refs(color_res._state_refs).materialize()
        eng.shutdown()

        def as_src(t: pa.Table) -> pa.Table:
            return pa.table({"src_id": t.column("node_id"), "c_src": t.column("color")})

        def as_dst(t: pa.Table) -> pa.Table:
            return pa.table({"dst_id": t.column("node_id"), "c_dst": t.column("color")})

        j = hash_join(active,
                      color_ds.map_batches(as_src, batch_format="pyarrow",
                                           zero_copy_batch=True),
                      on=("src_id",), num_partitions=num_partitions)
        j = hash_join(j,
                      color_ds.map_batches(as_dst, batch_format="pyarrow",
                                           zero_copy_batch=True),
                      on=("dst_id",), num_partitions=num_partitions)

        def same_color_reversed(t: pa.Table) -> pa.Table:
            cs = t.column("c_src").to_numpy(zero_copy_only=False)
            cd = t.column("c_dst").to_numpy(zero_copy_only=False)
            tt = t.filter(pa.array(cs == cd))
            return pa.table({"src_id": tt.column("dst_id").cast(pa.int64()),
                             "dst_id": tt.column("src_id").cast(pa.int64())})

        same_rev = j.map_batches(
            same_color_reversed, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

        if same_rev.count():
            eng2 = CsrEngine.build(same_rev, num_shards=num_shards or 8)
            b_res = eng2.pregel(value_name="b", **pregel_kw)
            b_ds = ray.data.from_arrow_refs(b_res._state_refs)
            eng2.shutdown()
        else:
            b_ds = ray.data.from_arrow(
                pa.table({"node_id": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
            )

        jj = hash_join(color_ds, b_ds, on=("node_id",), join_type="left_outer",
                       num_partitions=num_partitions)

        def pick_marked(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ids = t.column("node_id").to_numpy(zero_copy_only=False)
            c = t.column("color").to_numpy(zero_copy_only=False)
            # fill_null BEFORE to_numpy: a nullable int64 otherwise
            # round-trips through float64 and corrupts 63-bit ids
            b = pc.fill_null(t.column("b"), pa.scalar(-1, pa.int64())).to_numpy(
                zero_copy_only=False).astype(np.int64)
            # absent from the sweep graph (no same-color edge) ⇒ b = self
            b = np.where(b == -1, ids, b)
            m = b == c
            return pa.table({"node_id": pa.array(ids[m], pa.int64()),
                             "component": pa.array(c[m].astype(np.int64), pa.int64())})

        marked = jj.map_batches(
            pick_marked, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        done_parts.append(marked)
        metrics.append({"outer": outer, "active_edges": int(n_edges),
                        "assigned": int(marked.count())})

        def as_key(col):
            def fn(t: pa.Table) -> pa.Table:
                return pa.table({col: t.column("node_id")})
            return fn

        active = hash_join(active,
                           marked.map_batches(as_key("src_id"), batch_format="pyarrow",
                                              zero_copy_batch=True),
                           on=("src_id",), join_type="left_anti",
                           num_partitions=num_partitions)
        active = hash_join(active,
                           marked.map_batches(as_key("dst_id"), batch_format="pyarrow",
                                              zero_copy_batch=True),
                           on=("dst_id",), join_type="left_anti",
                           num_partitions=num_partitions)

    # singleton SCCs: nodes never assigned
    done = done_parts[0] if done_parts else ray.data.from_arrow(
        pa.table({"node_id": pa.array([], pa.int64()),
                  "component": pa.array([], pa.int64())}))
    for p in done_parts[1:]:
        done = done.union(p)
    done = done.materialize()
    singles = hash_join(all_nodes, done.select_columns(["node_id"]),
                        on=("node_id",), join_type="left_anti",
                        num_partitions=num_partitions)

    def own(t: pa.Table) -> pa.Table:
        ids = t.column("node_id").cast(pa.int64())
        return pa.table({"node_id": ids, "component": ids})

    final = done.union(
        singles.map_batches(own, batch_format="pyarrow", zero_copy_batch=True)
    ).materialize()
    # empty join partitions yield schema-less blocks — drop before concat
    tabs = [b for b in ray.get(final.to_arrow_refs()) if b.num_rows]
    if not tabs:
        return SccResult(np.empty(0, np.int64), np.empty(0, np.int64), outer, metrics)
    t = pa.concat_tables(tabs).combine_chunks()
    ids = t.column("node_id").to_numpy(zero_copy_only=False)
    comp = t.column("component").to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    return SccResult(ids[order].astype(np.int64), comp[order].astype(np.int64),
                     outer, metrics)


def strongly_connected_components(
    edges: Dataset,
    max_outer: int = 50,
    max_inner: int = 200,
    num_partitions: int | None = None,
    consecutive_ids: bool = False,
    min_component_size: int | None = None,
    backend: str = "csr",
    num_shards: int | None = None,
) -> SccResult:
    """``consecutive_ids`` / ``min_component_size``: GDS output options —
    renumber components 0..k-1 / drop nodes in components below the
    size floor [GDS-pub: scc proc config].

    ``backend="csr"`` (DEFAULT since round 4): sharded-state FW-BW (see
    ``_scc_csr``) — the driver never holds a node vector during the
    computation (the returned SccResult materializes only at result
    delivery). ``backend="dataflow"`` is the trim+FW-BW broadcast-state
    path (parity-tested)."""
    configure_ray_data()
    if backend == "csr":
        res = _scc_csr(edges, max_outer, num_partitions, num_shards)
        if consecutive_ids or min_component_size is not None:
            res.node_ids, res.values, _ = community_postprocess(
                res.node_ids, res.values, consecutive_ids, min_component_size
            )
        return res
    # self-loops don't affect SCC membership, but the universe is the
    # PRE-drop node set: a self-loop-only node is its own component
    # (matches the csr default, which keeps such nodes — round-5 ADVICE
    # backend-universe alignment)
    node_ids = unique_node_ids(edges)
    edges = drop_self_loops(edges)
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
