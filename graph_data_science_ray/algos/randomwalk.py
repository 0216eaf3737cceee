"""Random walks + random-walk-with-restart graph sampling.

Reference semantics (``gds.randomWalk`` [GDS-pub: algo/.../walking/],
``gds.graph.sample.rwr`` [GDS-pub: proc/catalog sampling]): uniform
random walks of fixed length from given start nodes (node2vec's
unbiased case: returnFactor = inOutFactor = 1), and subgraph sampling
by restart walks.

Determinism contract: this engine replaces the reference's PRNG draws
with **hash-based pseudo-randomness** — step t of walk w moving from
node u picks the neighbor d minimizing ``mix64(seed ⊕ w ⊕ t ⊕ d)``
(splitmix64 finalizer, same trick as FastRP/MinHash in this repo). The
walk set is then a pure function of (graph, seed), reproducible across
runs, partitionings and cluster sizes. A restart fires at step t when
``mix64(seed ⊕ w ⊕ t ⊕ SALT) mod 2^20 < restart_prob · 2^20``.

Dataflow shape: the walker table is small (walks ≤ thousands) and the
edge table is huge, so each step is ONE edge scan: broadcast the
(walk → current node) map via ``ray.put``, scan edges emitting the
arg-min candidate per walk per batch (combiner), driver-merge the
global arg-min. L-step walks cost L scans regardless of walk count —
no join, no shuffle. Walks that hit a sink (no out-edge) stop early,
matching the reference.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.algos.common import BlockScanner
from graph_data_science_ray.context import configure_ray_data
from graph_data_science_ray.sources.edges import symmetrize

_RESTART_SALT = 0x5CA1AB1E


def _mix(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _walk_key(seed: int, walk: np.ndarray, step: int, dst: np.ndarray) -> np.ndarray:
    m64 = (1 << 64) - 1
    base = np.uint64(((seed * 0x9E3779B97F4A7C15) ^ (step * 0x85EBCA6B + 1)) & m64)
    return _mix(walk.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F) ^ dst.astype(np.uint64) ^ base)


def random_walks(
    edges: Dataset,
    start_nodes: np.ndarray | list,
    walk_length: int = 80,
    walks_per_node: int = 1,
    restart_prob: float = 0.0,
    orientation: str = "natural",
    seed: int = 42,
    num_partitions: int | None = None,
    return_factor: float = 1.0,
    in_out_factor: float = 1.0,
) -> pa.Table:
    """(walk_id, step, node_id) — step 0 is the start node. Walk w's
    start = start_nodes[w // walks_per_node].

    ``return_factor`` / ``in_out_factor``: GDS randomWalk's p/q
    second-order bias [GDS-pub: proc/.../walking/RandomWalkProc] —
    delegated to the node2vec walker (same output schema); not
    combinable with ``restart_prob``."""
    if return_factor != 1.0 or in_out_factor != 1.0:
        if restart_prob:
            raise ValueError("p/q bias and restart_prob are mutually exclusive")
        from graph_data_science_ray.algos.node2vec import node2vec_walks

        return node2vec_walks(
            edges, start_nodes, walk_length=walk_length,
            walks_per_node=walks_per_node, return_factor=return_factor,
            in_out_factor=in_out_factor, orientation=orientation, seed=seed,
            num_partitions=num_partitions,
        )
    configure_ray_data()
    if orientation == "undirected":
        edges = symmetrize(edges, dedup=True, num_partitions=num_partitions)
    edges = edges.materialize()
    scanner = BlockScanner(edges)

    starts = np.repeat(np.asarray(start_nodes, dtype=np.int64), walks_per_node)
    n_walks = starts.shape[0]
    walk_ids = np.arange(n_walks, dtype=np.int64)
    cur = starts.copy()
    alive = np.ones(n_walks, dtype=bool)

    out_w = [walk_ids.copy()]
    out_s = [np.zeros(n_walks, dtype=np.int64)]
    out_n = [starts.copy()]

    thresh = np.uint64(int(restart_prob * (1 << 20)))
    for step in range(1, walk_length):
        if not alive.any():
            break
        # restart draw (before the neighbor step, as rwr does)
        if restart_prob > 0.0:
            draw = _walk_key(seed ^ _RESTART_SALT, walk_ids, step, cur) % np.uint64(1 << 20)
            restart = alive & (draw < thresh)
            cur = np.where(restart, starts, cur)

        state_ref = ray.put((walk_ids[alive], cur[alive]))

        def scatter(t: pa.Table, _step=step) -> pa.Table:
            wids, wcur = ray.get(state_ref)
            src = t.column("src_id").to_numpy(zero_copy_only=False)
            dst = t.column("dst_id").to_numpy(zero_copy_only=False)
            order = np.argsort(wcur, kind="stable")
            s_cur, s_wid = wcur[order], wids[order]
            lo = np.searchsorted(s_cur, src, side="left")
            hi = np.searchsorted(s_cur, src, side="right")
            span = hi - lo
            has = span > 0
            if not has.any():
                return pa.table(
                    {
                        "w": pa.array([], pa.int64()),
                        "k": pa.array([], pa.uint64()),
                        "d": pa.array([], pa.int64()),
                    }
                )
            # expand: one row per (walk at this node, out-edge)
            counts = span[has]
            e_idx = np.repeat(np.flatnonzero(has), counts)
            ends = np.cumsum(counts)
            offs = np.arange(int(ends[-1]), dtype=np.int64) - np.repeat(ends - counts, counts)
            w_pos = lo[e_idx] + offs
            ww = s_wid[w_pos]
            dd = dst[e_idx]
            key = _walk_key(seed, ww, _step, dd)
            # per-batch arg-min per walk
            o2 = np.lexsort((key, ww))
            ww, dd, key = ww[o2], dd[o2], key[o2]
            first = np.r_[True, ww[1:] != ww[:-1]]
            return pa.table(
                {
                    "w": pa.array(ww[first], pa.int64()),
                    "k": pa.array(key[first], pa.uint64()),
                    "d": pa.array(dd[first], pa.int64()),
                }
            )

        t = scanner.scan(scatter)
        nxt = np.full(n_walks, -1, dtype=np.int64)
        if t.num_rows:
            ww = t.column("w").to_numpy(zero_copy_only=False)
            kk = t.column("k").to_numpy(zero_copy_only=False)
            dd = t.column("d").to_numpy(zero_copy_only=False)
            o = np.lexsort((kk, ww))
            ww, kk, dd = ww[o], kk[o], dd[o]
            first = np.r_[True, ww[1:] != ww[:-1]]
            nxt[ww[first]] = dd[first]
        stopped = alive & (nxt < 0)
        alive = alive & ~stopped
        cur = np.where(alive, nxt, cur)
        if alive.any():
            out_w.append(walk_ids[alive].copy())
            out_s.append(np.full(int(alive.sum()), step, dtype=np.int64))
            out_n.append(cur[alive].copy())

    w = np.concatenate(out_w)
    s = np.concatenate(out_s)
    nn = np.concatenate(out_n)
    order = np.lexsort((s, w))
    return pa.table(
        {
            "walk_id": pa.array(w[order], pa.int64()),
            "step": pa.array(s[order], pa.int64()),
            "node_id": pa.array(nn[order], pa.int64()),
        }
    )


def _degrees(edges: Dataset) -> tuple[np.ndarray, np.ndarray]:
    """(sorted node ids, degree) over the src side of ``edges`` — callers
    pass the symmetrized table so this is the undirected degree."""

    def partial(t: pa.Table) -> pa.Table:
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        u, c = np.unique(src, return_counts=True)
        return pa.table(
            {"n": pa.array(u, pa.int64()), "c": pa.array(c.astype(np.int64), pa.int64())}
        )

    t = BlockScanner(edges).scan(partial)
    n = t.column("n").to_numpy(zero_copy_only=False)
    c = t.column("c").to_numpy(zero_copy_only=False)
    order = np.argsort(n, kind="stable")
    n, c = n[order], c[order]
    first = np.r_[True, n[1:] != n[:-1]]
    deg = np.add.reduceat(c, np.flatnonzero(first))
    return n[first], deg


def cnarw_walks(
    edges: Dataset,
    start_nodes: np.ndarray | list,
    walk_length: int = 80,
    walks_per_node: int = 1,
    restart_prob: float = 0.0,
    seed: int = 42,
    num_partitions: int | None = None,
) -> pa.Table:
    """Common-Neighbour-Aware Random Walk (``gds.graph.sample.cnarw``
    [GDS-pub: proc/catalog sampling]; Li et al., INFOCOM 2019): from
    node u, the step to neighbor v is weighted by
    ``1 − |N(u)∩N(v)| / min(deg(u), deg(v))`` — walks escape dense
    clusters faster than uniform RWR, giving better-spread samples.
    Undirected view always (the reference samples undirected).

    Same hash-determinism contract as ``random_walks``: the weighted
    draw is an exponential race ``−ln(hash_uniform)/weight`` so walks
    are a pure function of (graph, seed). If every candidate has weight
    0 (complete neighborhood overlap), the step falls back to the
    uniform hash argmin.

    Dataflow: per step, scan 1 collects each walker's candidate
    neighbor set (volume = Σ deg(current)); scan 2 counts common
    neighbors as wedges — an edge (m, x) contributes to walker w's
    candidate x when both m and x lie in N(u_w) — with a per-batch
    (walker, candidate) sum combiner. Degrees are computed once before
    the loop. Walker state is small (sampling starts from few seeds);
    the edge table is never shuffled, only scanned.
    """
    configure_ray_data()
    edges = symmetrize(edges, dedup=True, num_partitions=num_partitions).materialize()
    scanner = BlockScanner(edges)
    deg_ids, deg = _degrees(edges)

    starts = np.repeat(np.asarray(start_nodes, dtype=np.int64), walks_per_node)
    n_walks = starts.shape[0]
    walk_ids = np.arange(n_walks, dtype=np.int64)
    cur = starts.copy()
    alive = np.ones(n_walks, dtype=bool)

    out_w = [walk_ids.copy()]
    out_s = [np.zeros(n_walks, dtype=np.int64)]
    out_n = [starts.copy()]

    thresh = np.uint64(int(restart_prob * (1 << 20)))
    for step in range(1, walk_length):
        if not alive.any():
            break
        if restart_prob > 0.0:
            draw = _walk_key(seed ^ _RESTART_SALT, walk_ids, step, cur) % np.uint64(1 << 20)
            restart = alive & (draw < thresh)
            cur = np.where(restart, starts, cur)

        awids = walk_ids[alive]
        acur = cur[alive]
        cur_ref = ray.put(np.unique(acur))

        def gather_nbrs(t: pa.Table) -> pa.Table:
            cs = ray.get(cur_ref)
            src = t.column("src_id").to_numpy(zero_copy_only=False)
            dst = t.column("dst_id").to_numpy(zero_copy_only=False)
            p = np.searchsorted(cs, src)
            hit = (p < cs.shape[0]) & (cs[np.minimum(p, cs.shape[0] - 1)] == src)
            return pa.table(
                {
                    "u": pa.array(src[hit], pa.int64()),
                    "v": pa.array(dst[hit], pa.int64()),
                }
            )

        t = scanner.scan(gather_nbrs)
        if t.num_rows == 0:
            break  # every live walker sits on an isolated node
        nu = t.column("u").to_numpy(zero_copy_only=False)
        nv = t.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((nv, nu))
        nu, nv = nu[order], nv[order]
        # per-current-node neighbor lists (cur nodes sorted, slices via offsets)
        cur_nodes, cur_starts = np.unique(nu, return_index=True)
        cur_ends = np.r_[cur_starts[1:], nu.shape[0]]

        # compact candidate-node index space for membership keys
        cand_nodes = np.unique(nv)
        ncand = cand_nodes.shape[0]
        # membership keys per current node: cur_pos * ncand + cand_rank
        cand_rank_all = np.searchsorted(cand_nodes, nv)
        cur_pos_all = np.searchsorted(cur_nodes, nu)
        mem_keys = cur_pos_all * ncand + cand_rank_all  # sorted (nu, nv asc)

        o_mid = np.argsort(nv, kind="stable")
        mem_ref = ray.put((nv[o_mid], cur_pos_all[o_mid], cand_nodes, mem_keys))
        t3 = scanner.scan(_cnarw_wedge_stage(mem_ref))
        counts = np.zeros(0, dtype=np.int64)
        ckey = np.zeros(0, dtype=np.int64)
        if t3.num_rows:
            cp = t3.column("cp").to_numpy(zero_copy_only=False)
            cr = t3.column("cr").to_numpy(zero_copy_only=False)
            cc = t3.column("c").to_numpy(zero_copy_only=False)
            key = cp * ncand + cr
            o = np.argsort(key, kind="stable")
            key, cc = key[o], cc[o]
            first = np.r_[True, key[1:] != key[:-1]]
            ckey = key[first]
            counts = np.add.reduceat(cc, np.flatnonzero(first))

        # choose next hop per walker on the driver (walker count is small)
        nxt = np.full(n_walks, -1, dtype=np.int64)
        w_curpos = np.searchsorted(cur_nodes, acur)
        on_graph = (w_curpos < cur_nodes.shape[0]) & (
            cur_nodes[np.minimum(w_curpos, cur_nodes.shape[0] - 1)] == acur
        )
        deg_pos = np.searchsorted(deg_ids, acur)
        for i in np.flatnonzero(on_graph):
            cpos = w_curpos[i]
            s, e = cur_starts[cpos], cur_ends[cpos]
            vs = nv[s:e]
            du = deg[deg_pos[i]]
            dv = deg[np.searchsorted(deg_ids, vs)]
            common = np.zeros(vs.shape[0], dtype=np.int64)
            kq = cpos * ncand + np.searchsorted(cand_nodes, vs)
            kp = np.searchsorted(ckey, kq)
            okk = (kp < ckey.shape[0]) & (ckey[np.minimum(kp, max(ckey.shape[0] - 1, 0))] == kq)
            if ckey.shape[0]:
                common[okk] = counts[kp[okk]]
            weight = 1.0 - common / np.minimum(du, dv)
            u01 = (_walk_key(seed, np.full(vs.shape[0], awids[i]), step, vs).astype(np.float64) + 1.0) / float(2**64)
            with np.errstate(divide="ignore"):
                race = np.where(weight > 0.0, -np.log(u01) / np.maximum(weight, 1e-300), np.inf)
            if not np.isfinite(race).any():
                race = u01  # all-zero weights: uniform hash fallback
            j = np.lexsort((vs, race))[0]
            nxt[awids[i]] = vs[j]

        stopped = alive & (nxt < 0)
        alive = alive & ~stopped
        cur = np.where(alive, nxt, cur)
        if alive.any():
            out_w.append(walk_ids[alive].copy())
            out_s.append(np.full(int(alive.sum()), step, dtype=np.int64))
            out_n.append(cur[alive].copy())

    w = np.concatenate(out_w)
    s = np.concatenate(out_s)
    nn = np.concatenate(out_n)
    order = np.lexsort((s, w))
    return pa.table(
        {
            "walk_id": pa.array(w[order], pa.int64()),
            "step": pa.array(s[order], pa.int64()),
            "node_id": pa.array(nn[order], pa.int64()),
        }
    )


def _cnarw_wedge_stage(mem_ref):
    """Batch fn: count wedges (cur u, middle m, candidate x) where both
    m and x are neighbors of u — i.e. m ∈ N(u)∩N(x) — pre-summed per
    (u, x) within the batch. mem_ref holds the walker-neighborhood
    structures sorted by (cur_pos, nbr node)."""

    def fn(t: pa.Table) -> pa.Table:
        mid_sorted, mid_curpos, cand_nodes, mem_keys = ray.get(mem_ref)
        ncand = cand_nodes.shape[0]
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        dst = t.column("dst_id").to_numpy(zero_copy_only=False)
        lo = np.searchsorted(mid_sorted, src, side="left")
        hi = np.searchsorted(mid_sorted, src, side="right")
        span = hi - lo
        has = span > 0
        if not has.any():
            return pa.table(
                {"cp": pa.array([], pa.int64()), "cr": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        counts_per = span[has]
        e_idx = np.repeat(np.flatnonzero(has), counts_per)
        ends = np.cumsum(counts_per)
        offs = np.arange(int(ends[-1]), dtype=np.int64) - np.repeat(ends - counts_per, counts_per)
        mpos = lo[e_idx] + offs
        cp = mid_curpos[mpos]          # which walker-current-node
        x = dst[e_idx]                 # wedge endpoint candidate
        # keep only x that are candidates of that same current node
        xr = np.searchsorted(cand_nodes, x)
        in_cand = (xr < ncand) & (cand_nodes[np.minimum(xr, max(ncand - 1, 0))] == x)
        cp, xr = cp[in_cand], xr[in_cand]
        key = cp * ncand + xr
        kp = np.searchsorted(mem_keys, key)
        ok = (kp < mem_keys.shape[0]) & (
            mem_keys[np.minimum(kp, max(mem_keys.shape[0] - 1, 0))] == key
        )
        key = key[ok]
        if key.shape[0] == 0:
            return pa.table(
                {"cp": pa.array([], pa.int64()), "cr": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        key.sort()
        first = np.r_[True, key[1:] != key[:-1]]
        uk = key[first]
        c = np.diff(np.r_[np.flatnonzero(first), key.shape[0]])
        return pa.table(
            {
                "cp": pa.array(uk // ncand, pa.int64()),
                "cr": pa.array(uk % ncand, pa.int64()),
                "c": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    return fn


def sample_cnarw(
    edges: Dataset,
    start_nodes: np.ndarray | list,
    restart_prob: float = 0.1,
    walk_length: int = 80,
    walks_per_node: int = 4,
    seed: int = 42,
    num_partitions: int | None = None,
) -> Dataset:
    """CNARW subgraph sample (gds.graph.sample.cnarw shape): the induced
    edge table over all nodes visited by the common-neighbour-aware walks."""
    walks = cnarw_walks(
        edges,
        start_nodes,
        walk_length=walk_length,
        walks_per_node=walks_per_node,
        restart_prob=restart_prob,
        seed=seed,
        num_partitions=num_partitions,
    )
    visited = np.unique(walks.column("node_id").to_numpy(zero_copy_only=False))
    vis_ref = ray.put(visited)

    def induced(t: pa.Table) -> pa.Table:
        vis = ray.get(vis_ref)
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        dst = t.column("dst_id").to_numpy(zero_copy_only=False)
        keep = np.isin(src, vis) & np.isin(dst, vis)
        return t.filter(pa.array(keep))

    return edges.map_batches(induced, batch_format="pyarrow", zero_copy_batch=True)


def sample_rwr(
    edges: Dataset,
    start_nodes: np.ndarray | list,
    restart_prob: float = 0.1,
    walk_length: int = 80,
    walks_per_node: int = 4,
    orientation: str = "undirected",
    seed: int = 42,
    num_partitions: int | None = None,
) -> Dataset:
    """Random-walk-with-restart subgraph sample: the induced edge table
    over all nodes visited by the walks (gds.graph.sample.rwr shape)."""
    walks = random_walks(
        edges,
        start_nodes,
        walk_length=walk_length,
        walks_per_node=walks_per_node,
        restart_prob=restart_prob,
        orientation=orientation,
        seed=seed,
        num_partitions=num_partitions,
    )
    visited = np.unique(walks.column("node_id").to_numpy(zero_copy_only=False))
    vis_ref = ray.put(visited)

    def induced(t: pa.Table) -> pa.Table:
        vis = ray.get(vis_ref)
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        dst = t.column("dst_id").to_numpy(zero_copy_only=False)
        keep = np.isin(src, vis) & np.isin(dst, vis)
        return t.filter(pa.array(keep))

    return edges.map_batches(induced, batch_format="pyarrow", zero_copy_batch=True)
