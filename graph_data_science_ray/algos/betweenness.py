"""Betweenness centrality — batched multi-source Brandes.

Reference semantics (``gds.betweenness``,
[GDS-pub: algo/.../betweenness/]): Brandes' algorithm; for scale the
reference samples sources (RA-Brandes / Riondato-style) — exact when
every node is a source. This engine batches the whole source sample
through the dataflow at once:

- **forward**: unweighted BFS rounds; state is (k × n) ``dist`` /
  ``sigma`` (shortest-path counts) for k sources, driver-held and
  broadcast per round; a round is one edge scan emitting, per batch,
  the combined sigma contributions of depth-(ℓ−1) frontier nodes to
  their neighbors as sparse (node, source, val) partials.
- **backward**: Brandes' dependency accumulation
  δ(u) += σ(u)/σ(v) · (1 + δ(v)) over edges one depth at a time, from
  the deepest level up — again one scan per depth with sparse partials.

Total cost: 2 × diameter edge scans for the entire sample, independent
of k (k only widens the driver state: k × node-vector, which is the
sampling knob to fit memory). Deterministic: the sample is either
caller-given or the k smallest node ids.

Output convention matches networkx ``betweenness_centrality``
(endpoints excluded): raw Σ_s δ_s(v), halved for the undirected view;
exact equality with the networkx unnormalized values when sources =
all nodes (tested), and with its subset variant for partial samples.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.algos.common import BlockScanner, unique_inverse, unique_node_ids
from graph_data_science_ray.context import configure_ray_data
from graph_data_science_ray.sources.edges import drop_self_loops, symmetrize


def _sparse_rows(per_src: list[tuple[int, np.ndarray, np.ndarray]], ids: np.ndarray) -> pa.Table:
    """[(src_idx, dst_positions, vals)] → (node_id, s, v) table."""
    if not per_src:
        return pa.table(
            {
                "node_id": pa.array([], pa.int64()),
                "s": pa.array([], pa.int32()),
                "v": pa.array([], pa.float64()),
            }
        )
    node = np.concatenate([ids[p] for _, p, _ in per_src])
    sidx = np.concatenate([np.full(p.shape[0], s, dtype=np.int32) for s, p, _ in per_src])
    vals = np.concatenate([v for _, _, v in per_src])
    return pa.table(
        {
            "node_id": pa.array(node, pa.int64()),
            "s": pa.array(sidx, pa.int32()),
            "v": pa.array(vals, pa.float64()),
        }
    )


def betweenness_centrality(
    edges: Dataset,
    sources: np.ndarray | list | None = None,
    orientation: str = "undirected",
    max_depth: int = 10_000,
    num_partitions: int | None = None,
) -> pa.Table:
    configure_ray_data()
    g = drop_self_loops(edges)
    if orientation == "undirected":
        g = drop_self_loops(symmetrize(edges, dedup=True, num_partitions=num_partitions))
    g = g.materialize()
    scanner = BlockScanner(g)
    node_ids = unique_node_ids(edges)
    n = node_ids.shape[0]
    if sources is None:
        src = node_ids
    else:
        src = np.sort(np.asarray(sources, dtype=np.int64))
    k = src.shape[0]
    src_pos = np.searchsorted(node_ids, src)

    dist = np.full((k, n), -1, dtype=np.int32)
    sigma = np.zeros((k, n))
    dist[np.arange(k), src_pos] = 0
    sigma[np.arange(k), src_pos] = 1.0

    # ---------------- forward BFS rounds -----------------------------
    depth = 0
    for depth in range(1, max_depth + 1):
        state_ref = ray.put((node_ids, dist, sigma, depth))

        def fwd(t: pa.Table) -> pa.Table:
            ids, di, sg, ell = ray.get(state_ref)
            s_ = t.column("src_id").to_numpy(zero_copy_only=False)
            d_ = t.column("dst_id").to_numpy(zero_copy_only=False)
            sp = np.searchsorted(ids, s_)
            dp = np.searchsorted(ids, d_)
            out = []
            for si in range(di.shape[0]):
                m = (di[si, sp] == ell - 1) & (di[si, dp] == -1)
                if not m.any():
                    continue
                tgt = dp[m]
                vals = sg[si, sp[m]]
                u, inv = unique_inverse(tgt)
                sums = np.bincount(inv, weights=vals, minlength=u.shape[0])
                out.append((si, u, sums))
            return _sparse_rows(out, ids)

        t = scanner.scan(fwd)
        if t.num_rows == 0:
            depth -= 1
            break
        pos = np.searchsorted(node_ids, t.column("node_id").to_numpy(zero_copy_only=False))
        si = t.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column("v").to_numpy(zero_copy_only=False)
        np.add.at(sigma, (si, pos), v)
        dist[si, pos] = depth

    max_d = depth

    # ---------------- backward dependency rounds ---------------------
    delta = np.zeros((k, n))
    for ell in range(max_d, 0, -1):
        state_ref = ray.put((node_ids, dist, sigma, delta, ell))

        def bwd(t: pa.Table) -> pa.Table:
            ids, di, sg, de, lvl = ray.get(state_ref)
            s_ = t.column("src_id").to_numpy(zero_copy_only=False)
            d_ = t.column("dst_id").to_numpy(zero_copy_only=False)
            sp = np.searchsorted(ids, s_)
            dp = np.searchsorted(ids, d_)
            out = []
            for si in range(di.shape[0]):
                m = (di[si, sp] == lvl - 1) & (di[si, dp] == lvl)
                if not m.any():
                    continue
                u_pos = sp[m]
                contrib = sg[si, u_pos] / sg[si, dp[m]] * (1.0 + de[si, dp[m]])
                u, inv = unique_inverse(u_pos)
                sums = np.bincount(inv, weights=contrib, minlength=u.shape[0])
                out.append((si, u, sums))
            return _sparse_rows(out, ids)

        t = scanner.scan(bwd)
        if t.num_rows:
            pos = np.searchsorted(node_ids, t.column("node_id").to_numpy(zero_copy_only=False))
            si = t.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
            np.add.at(delta, (si, pos), t.column("v").to_numpy(zero_copy_only=False))

    delta[np.arange(k), src_pos] = 0.0  # endpoints excluded
    b = delta.sum(axis=0)
    if orientation == "undirected":
        b *= 0.5
    return pa.table(
        {
            "node_id": pa.array(node_ids, pa.int64()),
            "betweenness": pa.array(b, pa.float64()),
        }
    )

def betweenness_centrality_weighted(
    edges: Dataset,
    sources: np.ndarray | list | None = None,
    orientation: str = "undirected",
    max_rounds: int = 10_000,
    num_partitions: int | None = None,
) -> pa.Table:
    """Weighted betweenness (``gds.betweenness`` with
    relationshipWeightProperty): Brandes over shortest-path COSTS.

    Three fixpoint phases, each ≤ shortest-path-DAG depth edge scans
    with the same (k × n) driver state as the unweighted variant:

    1. dist: frontier-synchronous Bellman-Ford relaxation (non-negative
       weights assumed, Dijkstra semantics);
    2. sigma: path counts over the SP-DAG (edge u→v iff
       dist[u] + w == dist[v]), recomputed to fixpoint — leaves settle
       first, one DAG level per round;
    3. delta: Brandes dependency δ(u) = Σ σu/σv·(1 + δ(v)) over the same
       DAG, iterated to fixpoint from the deep end up.

    DAG membership tests float equality of path sums — ties between
    mathematically-equal paths are only recognized when their float sums
    agree exactly (same caveat as networkx's Dijkstra accumulation;
    exact for integer/dyadic weights)."""
    configure_ray_data()
    g = drop_self_loops(edges)
    if orientation == "undirected":
        # weight-preserving symmetrize: both directions, MIN-dedup (a
        # bidirectional pair keeps one weight per direction)
        from graph_data_science_ray.sources.edges import dedup_edges, reverse

        both = edges.union(reverse(edges).select_columns(["src_id", "dst_id", "weight"]))
        g = drop_self_loops(dedup_edges(both, "min", num_partitions=num_partitions))
    g = g.materialize()
    scanner = BlockScanner(g)
    node_ids = unique_node_ids(edges)
    n = node_ids.shape[0]
    src = node_ids if sources is None else np.sort(np.asarray(sources, dtype=np.int64))
    k = src.shape[0]
    src_pos = np.searchsorted(node_ids, src)

    # ---- phase 1: distances (frontier-limited synchronous relax) ----
    dist = np.full((k, n), np.inf)
    dist[np.arange(k), src_pos] = 0.0
    frontier = np.zeros((k, n), dtype=bool)
    frontier[np.arange(k), src_pos] = True
    for _ in range(max_rounds):
        if not frontier.any():
            break
        state_ref = ray.put((node_ids, dist, frontier))

        def relax(t: pa.Table) -> pa.Table:
            ids, di, fr = ray.get(state_ref)
            s_ = t.column("src_id").to_numpy(zero_copy_only=False)
            d_ = t.column("dst_id").to_numpy(zero_copy_only=False)
            w_ = t.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
            sp = np.searchsorted(ids, s_)
            dp = np.searchsorted(ids, d_)
            out = []
            for si in range(di.shape[0]):
                m = fr[si, sp]
                if not m.any():
                    continue
                cand = di[si, sp[m]] + w_[m]
                better = cand < di[si, dp[m]]
                if not better.any():
                    continue
                tgt, vals = dp[m][better], cand[better]
                order = np.lexsort((vals, tgt))
                tgt, vals = tgt[order], vals[order]
                first = np.r_[True, tgt[1:] != tgt[:-1]]  # min per dst
                out.append((si, tgt[first], vals[first]))
            return _sparse_rows(out, ids)

        t = scanner.scan(relax)
        frontier = np.zeros((k, n), dtype=bool)
        if t.num_rows == 0:
            break
        pos = np.searchsorted(node_ids, t.column("node_id").to_numpy(zero_copy_only=False))
        si = t.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column("v").to_numpy(zero_copy_only=False)
        np.minimum.at(dist, (si, pos), v)
        # frontier = any position whose dist now equals a proposed value
        frontier[si[v == dist[si, pos]], pos[v == dist[si, pos]]] = True

    # ---- phase 2: sigma over the SP-DAG, fixpoint --------------------
    base = np.zeros((k, n))
    base[np.arange(k), src_pos] = 1.0
    sigma = base.copy()
    for _ in range(max_rounds):
        state_ref = ray.put((node_ids, dist, sigma))

        def count(t: pa.Table) -> pa.Table:
            ids, di, sg = ray.get(state_ref)
            s_ = t.column("src_id").to_numpy(zero_copy_only=False)
            d_ = t.column("dst_id").to_numpy(zero_copy_only=False)
            w_ = t.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
            sp = np.searchsorted(ids, s_)
            dp = np.searchsorted(ids, d_)
            out = []
            for si in range(di.shape[0]):
                on_dag = np.isfinite(di[si, sp]) & (di[si, sp] + w_ == di[si, dp])
                on_dag &= sg[si, sp] > 0
                if not on_dag.any():
                    continue
                u, inv = unique_inverse(dp[on_dag])
                sums = np.bincount(inv, weights=sg[si, sp[on_dag]], minlength=u.shape[0])
                out.append((si, u, sums))
            return _sparse_rows(out, ids)

        t = scanner.scan(count)
        new_sigma = base.copy()
        if t.num_rows:
            pos = np.searchsorted(node_ids, t.column("node_id").to_numpy(zero_copy_only=False))
            si = t.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
            np.add.at(new_sigma, (si, pos), t.column("v").to_numpy(zero_copy_only=False))
        if np.array_equal(new_sigma, sigma):
            break
        sigma = new_sigma

    # ---- phase 3: delta backward over the SP-DAG, fixpoint -----------
    delta = np.zeros((k, n))
    for _ in range(max_rounds):
        state_ref = ray.put((node_ids, dist, sigma, delta))

        def accum(t: pa.Table) -> pa.Table:
            ids, di, sg, de = ray.get(state_ref)
            s_ = t.column("src_id").to_numpy(zero_copy_only=False)
            d_ = t.column("dst_id").to_numpy(zero_copy_only=False)
            w_ = t.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
            sp = np.searchsorted(ids, s_)
            dp = np.searchsorted(ids, d_)
            out = []
            for si in range(di.shape[0]):
                on_dag = np.isfinite(di[si, sp]) & (di[si, sp] + w_ == di[si, dp])
                on_dag &= (sg[si, sp] > 0) & (sg[si, dp] > 0)
                if not on_dag.any():
                    continue
                u_pos, v_pos = sp[on_dag], dp[on_dag]
                contrib = sg[si, u_pos] / sg[si, v_pos] * (1.0 + de[si, v_pos])
                u, inv = unique_inverse(u_pos)
                sums = np.bincount(inv, weights=contrib, minlength=u.shape[0])
                out.append((si, u, sums))
            return _sparse_rows(out, ids)

        t = scanner.scan(accum)
        new_delta = np.zeros((k, n))
        if t.num_rows:
            pos = np.searchsorted(node_ids, t.column("node_id").to_numpy(zero_copy_only=False))
            si = t.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
            np.add.at(new_delta, (si, pos), t.column("v").to_numpy(zero_copy_only=False))
        if np.array_equal(new_delta, delta):
            break
        delta = new_delta

    delta[np.arange(k), src_pos] = 0.0  # endpoints excluded
    b = delta.sum(axis=0)
    if orientation == "undirected":
        b *= 0.5
    return pa.table(
        {
            "node_id": pa.array(node_ids, pa.int64()),
            "betweenness": pa.array(b, pa.float64()),
        }
    )
