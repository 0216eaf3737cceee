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

from graph_data_science_ray.algos.common import collect_arrow
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
) -> pa.Table:
    """(walk_id, step, node_id) — step 0 is the start node. Walk w's
    start = start_nodes[w // walks_per_node]."""
    configure_ray_data()
    if orientation == "undirected":
        edges = symmetrize(edges, dedup=True, num_partitions=num_partitions)
    edges = edges.materialize()

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

        t = collect_arrow(edges.map_batches(scatter, batch_format="pyarrow", zero_copy_batch=True))
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
