"""Bridges and articulation points — spanning forest + LCA covering.

Reference semantics (``gds.bridges`` / ``gds.articulationPoints``,
[GDS-pub: algo/.../bridges/ + articulationpoints/]): edges whose removal
disconnects the graph / nodes whose removal does. The reference runs
Tarjan's sequential DFS low-link; DFS ordering is inherently sequential,
so this engine uses the **tree-covering formulation** (public folklore,
the basis of parallel biconnectivity algorithms):

1. Build a deterministic spanning forest (this repo's Borůvka,
   algos/mst.py, unit weights) — node-sized, driver-held.
2. Root each tree; compute depth, parent and binary-lifting LCA tables
   on the driver (numpy level-BFS over the forest CSR; O(n log n)
   node-vector state, the standing assumption).
3. ONE scan over the canonical non-tree edges: each non-tree edge
   {u,v} "covers" the tree path u..v. Vectorized per batch: LCA via
   binary lifting, then difference counts (+1 at u, +1 at v, −2 at
   lca) and back-edge reach depths (min depth[lca] at u and v) — both
   node-sized per-batch partials, driver-merged.
4. Subtree aggregation (by-depth sweep, vectorized per level):
   - tree edge (v → parent) is a **bridge** iff its subtree's cover
     count is 0 (no cycle through it);
   - non-root v is an **articulation point** iff some child subtree
     reaches no shallower than v (``low ≥ depth[v]``); the root iff it
     has ≥ 2 tree children.

Exactness verified against networkx ``bridges`` /
``articulation_points`` in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Min, Sum

from graph_data_science_ray.algos.common import collect_arrow, unique_inverse, unique_node_ids
from graph_data_science_ray.algos.mst import minimum_spanning_forest
from graph_data_science_ray.context import configure_ray_data, shuffle_partitions_for
from graph_data_science_ray.sources.edges import drop_self_loops, symmetrize


def _forest_structure(node_ids: np.ndarray, fu: np.ndarray, fv: np.ndarray):
    """Root the forest: (parent_pos, depth, up-tables) via numpy level-BFS."""
    n = node_ids.shape[0]
    pu = np.searchsorted(node_ids, fu)
    pv = np.searchsorted(node_ids, fv)
    # forest CSR (both directions)
    a = np.concatenate([pu, pv])
    b = np.concatenate([pv, pu])
    order = np.argsort(a, kind="stable")
    a_s, b_s = a[order], b[order]
    indptr = np.searchsorted(a_s, np.arange(n + 1))

    parent = np.full(n, -1, dtype=np.int64)
    depth = np.full(n, -1, dtype=np.int64)
    # roots: smallest node in each tree — but any deterministic choice
    # works; use "not yet visited in id order" as BFS seeds
    visited = np.zeros(n, dtype=bool)
    frontier = np.array([], dtype=np.int64)
    # seed all components at once: iterate until all visited
    while not visited.all():
        if frontier.shape[0] == 0:
            seeds = np.flatnonzero(~visited)
            # one seed per *remaining* component: take all unvisited with
            # no visited neighbor yet — simpler: take the first unvisited
            s = seeds[0]
            frontier = np.array([s], dtype=np.int64)
            visited[s] = True
            depth[s] = 0
        # expand one level
        counts = indptr[frontier + 1] - indptr[frontier]
        total = int(counts.sum())
        if total == 0:
            frontier = np.array([], dtype=np.int64)
            continue
        starts = indptr[frontier]
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        nbr = b_s[np.repeat(starts, counts) + offs]
        par = np.repeat(frontier, counts)
        new = ~visited[nbr]
        nbr, par = nbr[new], par[new]
        # dedup multiple parents claiming the same child (keep first)
        uniq, first_idx = np.unique(nbr, return_index=True)
        par = par[first_idx]
        visited[uniq] = True
        parent[uniq] = par
        depth[uniq] = depth[par] + 1
        frontier = uniq

    # binary lifting tables
    logn = max(1, int(np.ceil(np.log2(max(2, int(depth.max()) + 2)))))
    up = np.empty((logn, n), dtype=np.int64)
    root_mask = parent < 0
    up[0] = np.where(root_mask, np.arange(n), parent)
    for j in range(1, logn):
        up[j] = up[j - 1][up[j - 1]]
    return parent, depth, up


def _ancestor_at(x: np.ndarray, target_depth: np.ndarray, depth: np.ndarray, up: np.ndarray) -> np.ndarray:
    """Vectorized: the ancestor of each x at the given (shallower) depth."""
    diff = depth[x] - target_depth
    out = x.copy()
    for j in range(up.shape[0]):
        lift = (diff >> j) & 1 == 1
        out = np.where(lift, up[j][out], out)
    return out


def _lca(u: np.ndarray, v: np.ndarray, depth: np.ndarray, up: np.ndarray) -> np.ndarray:
    """Vectorized LCA by binary lifting."""
    du, dv = depth[u], depth[v]
    # make u the deeper one
    swap = dv > du
    u2 = np.where(swap, v, u)
    v2 = np.where(swap, u, v)
    diff = np.abs(du - dv)
    for j in range(up.shape[0]):
        lift = (diff >> j) & 1 == 1
        u2 = np.where(lift, up[j][u2], u2)
    same = u2 == v2
    for j in range(up.shape[0] - 1, -1, -1):
        differs = up[j][u2] != up[j][v2]
        step = ~same & differs
        u2 = np.where(step, up[j][u2], u2)
        v2 = np.where(step, up[j][v2], v2)
    return np.where(same, u2, up[0][u2])


class BridgeResult:
    def __init__(self, bridges: pa.Table, articulation_points: pa.Table):
        self.bridges = bridges                      # u, v (u < v)
        self.articulation_points = articulation_points  # node_id


def bridges_and_articulation_points(
    edges: Dataset,
    num_partitions: int | None = None,
) -> BridgeResult:
    configure_ray_data()
    num_partitions = num_partitions or shuffle_partitions_for()

    # canonical undirected simple edge set (lo < hi), weight 1
    def lo_hi(t: pa.Table) -> pa.Table:
        s = t.column("src_id").to_numpy(zero_copy_only=False)
        d = t.column("dst_id").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {
                "src_id": pa.array(np.minimum(s, d), pa.int64()),
                "dst_id": pa.array(np.maximum(s, d), pa.int64()),
            }
        )

    canon = (
        edges.map_batches(lo_hi, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src_id", "dst_id"], num_partitions=num_partitions)
        .aggregate(Sum("src_id", alias_name="_x"))
        .drop_columns(["_x"])
        .materialize()
    )
    node_ids = unique_node_ids(canon)
    n = node_ids.shape[0]
    if n == 0:
        empty_e = pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
        return BridgeResult(empty_e, pa.table({"node_id": pa.array([], pa.int64())}))

    def add_w(t: pa.Table) -> pa.Table:
        return t.append_column("weight", pa.array(np.ones(t.num_rows), pa.float64()))

    forest = minimum_spanning_forest(
        canon.map_batches(add_w, batch_format="pyarrow", zero_copy_batch=True),
        num_partitions=num_partitions,
    )
    fu = forest.edges.column("u").to_numpy(zero_copy_only=False)
    fv = forest.edges.column("v").to_numpy(zero_copy_only=False)
    parent, depth, up = _forest_structure(node_ids, fu, fv)

    # tree-edge membership set for the scan (packed, sorted)
    pu = np.searchsorted(node_ids, fu)
    pv = np.searchsorted(node_ids, fv)
    t_lo = np.minimum(pu, pv).astype(np.int64)
    t_hi = np.maximum(pu, pv).astype(np.int64)
    tree_keys = np.sort(t_lo * n + t_hi)
    state_ref = ray.put((node_ids, depth, up, tree_keys))

    def scan(t: pa.Table) -> pa.Table:
        ids, dep, upt, tkeys = ray.get(state_ref)
        s = t.column("src_id").to_numpy(zero_copy_only=False)
        d = t.column("dst_id").to_numpy(zero_copy_only=False)
        ps = np.searchsorted(ids, s)
        pd = np.searchsorted(ids, d)
        key = np.minimum(ps, pd).astype(np.int64) * ids.shape[0] + np.maximum(ps, pd)
        pos = np.searchsorted(tkeys, key)
        pos = np.minimum(pos, max(0, tkeys.shape[0] - 1))
        is_tree = (tkeys[pos] == key) if tkeys.shape[0] else np.zeros(key.shape[0], bool)
        ps, pd = ps[~is_tree], pd[~is_tree]
        if ps.shape[0] == 0:
            return pa.table(
                {
                    "pos": pa.array([], pa.int64()),
                    "cover": pa.array([], pa.int64()),
                    "reach": pa.array([], pa.int64()),
                }
            )
        l = _lca(ps, pd, dep, upt)
        dl = dep[l]
        # per-batch node-sized partials: cover diffs + min reach depth
        cover = np.zeros(ids.shape[0], dtype=np.int64)
        np.add.at(cover, ps, 1)
        np.add.at(cover, pd, 1)
        np.add.at(cover, l, -2)
        reach = np.full(ids.shape[0], np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(reach, ps, dl)
        np.minimum.at(reach, pd, dl)
        touched = (cover != 0) | (reach != np.iinfo(np.int64).max)
        idx = np.flatnonzero(touched)
        part1 = pa.table(
            {
                "pos": pa.array(idx, pa.int64()),
                "cover": pa.array(cover[idx], pa.int64()),
                "reach": pa.array(reach[idx], pa.int64()),
                "m_lca": pa.array(np.full(idx.shape[0], -1, dtype=np.int64), pa.int64()),
                "m_cx": pa.array(np.full(idx.shape[0], -1, dtype=np.int64), pa.int64()),
                "m_cy": pa.array(np.full(idx.shape[0], -1, dtype=np.int64), pa.int64()),
            }
        )
        # child-merge pairs: a non-tree edge with lca v directly joins
        # the two child subtrees of v its endpoints sit in (bypassing v)
        prop = (ps != l) & (pd != l)  # endpoint == lca merges nothing
        if prop.any():
            cx = _ancestor_at(ps[prop], dl[prop] + 1, dep, upt)
            cy = _ancestor_at(pd[prop], dl[prop] + 1, dep, upt)
            key = np.stack([l[prop], np.minimum(cx, cy), np.maximum(cx, cy)], axis=1)
            u_key = np.unique(key, axis=0)
            part2 = pa.table(
                {
                    "pos": pa.array(np.full(u_key.shape[0], -1, dtype=np.int64), pa.int64()),
                    "cover": pa.array(np.zeros(u_key.shape[0], dtype=np.int64), pa.int64()),
                    "reach": pa.array(
                        np.full(u_key.shape[0], np.iinfo(np.int64).max, dtype=np.int64), pa.int64()
                    ),
                    "m_lca": pa.array(u_key[:, 0], pa.int64()),
                    "m_cx": pa.array(u_key[:, 1], pa.int64()),
                    "m_cy": pa.array(u_key[:, 2], pa.int64()),
                }
            )
            return pa.concat_tables([part1, part2])
        return part1

    tb = collect_arrow(canon.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True))
    cover = np.zeros(n, dtype=np.int64)
    low = depth.copy()  # a subtree always reaches its own top depth
    merge_cx = np.array([], dtype=np.int64)
    merge_cy = np.array([], dtype=np.int64)
    if tb.num_rows:
        rows_pos = tb.column("pos").to_numpy(zero_copy_only=False)
        keep = rows_pos >= 0
        pos = rows_pos[keep]
        np.add.at(cover, pos, tb.column("cover").to_numpy(zero_copy_only=False)[keep])
        np.minimum.at(low, pos, tb.column("reach").to_numpy(zero_copy_only=False)[keep])
        mk = tb.column("m_lca").to_numpy(zero_copy_only=False) >= 0
        if mk.any():
            mcx = tb.column("m_cx").to_numpy(zero_copy_only=False)[mk]
            mcy = tb.column("m_cy").to_numpy(zero_copy_only=False)[mk]
            packed = np.unique(mcx * np.int64(n) + mcy)
            merge_cx = packed // n
            merge_cy = packed % n

    # bottom-up sweep by depth level (vectorized per level)
    order = np.argsort(-depth, kind="stable")
    max_d = int(depth.max())
    by_depth = [order[(depth[order] == dd)] for dd in range(max_d, 0, -1)]
    sub_cover = cover.copy()
    sub_low = low.copy()
    for level_nodes in by_depth:
        par = parent[level_nodes]
        np.add.at(sub_cover, par, sub_cover[level_nodes])
        np.minimum.at(sub_low, par, sub_low[level_nodes])

    # bridges: tree edge (child v → parent) with subtree cover 0
    child = np.flatnonzero(parent >= 0)
    is_bridge = sub_cover[child] == 0
    bu = node_ids[child[is_bridge]]
    bv = node_ids[parent[child[is_bridge]]]
    lo = np.minimum(bu, bv)
    hi = np.maximum(bu, bv)
    bord = np.lexsort((hi, lo))
    bridges_t = pa.table(
        {"u": pa.array(lo[bord], pa.int64()), "v": pa.array(hi[bord], pa.int64())}
    )

    # articulation points — per-vertex child-subtree connectivity. The
    # DFS low-link root/child rules do NOT hold for an arbitrary
    # spanning tree (cross edges exist), so: children of v merge when a
    # non-tree edge's lca is v (the edge joins their subtrees bypassing
    # v); a child component "escapes" v when any member's sub_low is
    # shallower than v. Non-root v is an AP iff some component fails to
    # escape; the root iff its children form ≥ 2 components. Merge
    # pairs always join SIBLINGS (both are tree children of the lca),
    # so one global union-find is safe.
    uf = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        while uf[x] != x:
            uf[x] = uf[uf[x]]
            x = int(uf[x])
        return x

    for cx, cy in zip(merge_cx.tolist(), merge_cy.tolist()):
        rx, ry = find(cx), find(cy)
        if rx != ry:
            uf[max(rx, ry)] = min(rx, ry)

    ap = np.zeros(n, dtype=bool)
    if child.shape[0]:
        ch_parents = parent[child]
        roots_of = np.array([find(int(c)) for c in child], dtype=np.int64)
        esc = sub_low[child] < depth[ch_parents]
        # aggregate per (parent, component): does any member escape?
        key = ch_parents * np.int64(n) + roots_of
        u_key, inv = unique_inverse(key)
        comp_esc = np.zeros(u_key.shape[0], dtype=bool)
        np.logical_or.at(comp_esc, inv, esc)
        comp_parent = (u_key // n).astype(np.int64)
        parent_is_root = parent[comp_parent] < 0
        # non-root: AP iff any component does not escape
        np.logical_or.at(ap, comp_parent[~parent_is_root & ~comp_esc], True)
        # root: AP iff ≥ 2 components among children
        n_comp = np.bincount(comp_parent[parent_is_root], minlength=n)
        ap |= n_comp >= 2
    ap_t = pa.table({"node_id": pa.array(node_ids[np.flatnonzero(ap)], pa.int64())})
    return BridgeResult(bridges_t, ap_t)
