"""SLLPA — speaker-listener label propagation (overlapping communities).

Reference semantics (``gds.sllpa`` / SLPA, Xie-Szymanski — public
algorithm [GDS-pub: algo/.../sllpa/]): every node keeps a *memory* of
labels, seeded with its own id; for T rounds each listener collects ONE
label from every neighbor (the speaker picks it at random from its
memory, weighted by frequency) and appends the most frequent received
label to its own memory. Afterwards a node belongs to every community
whose label occupies ≥ ``threshold`` of its memory — an *overlapping*
cover, unlike LPA/Louvain partitions.

Determinism contract (repo-wide): the speaker's random draw is replaced
by hash-based pseudo-randomness — speaker u talking to listener v in
round t picks memory slot ``mix64(seed, u, v, t) mod |memory|``.
Picking a uniformly random *slot* of the memory multiset IS the
frequency-weighted draw of the reference. Ties in the listener's
most-frequent choice break to the smallest label.

Dataflow: one edge scan per round. Memory is the (n × (T+1)) driver
array (node-sized × rounds — the standing node-vector assumption, one
extra factor T); the scan emits per-batch (listener, label) count
partials, driver-merged, argmax per listener.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.algos.common import BlockScanner, unique_node_ids
from graph_data_science_ray.context import configure_ray_data
from graph_data_science_ray.sources.edges import drop_self_loops, symmetrize


def _mix(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


class SllpaResult:
    def __init__(self, node_ids, memberships: pa.Table, iterations: int):
        self.node_ids = node_ids
        self.memberships = memberships  # node_id, label, frequency
        self.iterations = iterations

    def to_table(self) -> pa.Table:
        return self.memberships

    def communities_of(self, node_id: int) -> list[int]:
        t = self.memberships
        mask = pa.compute.equal(t.column("node_id"), node_id)
        return t.filter(mask).column("label").to_pylist()


def _sllpa_csr(
    edges: Dataset,
    max_iterations: int,
    threshold: float,
    seed: int,
    num_partitions: int | None,
    num_shards: int | None,
) -> SllpaResult:
    """Sharded SLLPA (round-4 migration): the (n × (T+1)) label memory
    lives on the CSR shard actors — the driver previously re-broadcast
    it EVERY round (the standing-assumption shape at its worst, n×T).
    One keyed (listener, label, count) exchange per round; the hash-slot
    speaker draw, argmax merge, and threshold post-process all run
    shard-side, bit-for-bit the dataflow math (parity-tested)."""
    from graph_data_science_ray.state.engine import CsrEngine

    configure_ray_data()
    sym = drop_self_loops(symmetrize(edges, dedup=True, num_partitions=num_partitions))
    engine = CsrEngine.build(sym, num_shards=num_shards or 8)
    shards, P = engine.shards, engine.P
    T = max_iterations
    hub_i = np.empty(0, dtype=np.int64)
    hub_v = np.empty(0, dtype=np.float64)
    ray.get([s.sllpa_init.remote(T) for s in shards])
    for t in range(1, T + 1):
        emits = [s.sllpa_emit.options(num_returns=P).remote(t, seed, hub_i, hub_v)
                 for s in shards]
        if P == 1:
            emits = [[e] for e in emits]
        ray.get([
            shards[j].sllpa_apply.remote(t, *[emits[i][j] for i in range(P)])
            for j in range(P)
        ])
    parts = ray.get([s.sllpa_result.remote(T, threshold) for s in shards])
    own = ray.get([s.get_owned_ids.remote() for s in shards])
    engine.shutdown()
    t_all = pa.concat_tables(parts)
    node = t_all.column("node_id").to_numpy(zero_copy_only=False)
    lab = t_all.column("label").to_numpy(zero_copy_only=False)
    order = np.lexsort((lab, node))
    memberships = t_all.take(pa.array(order, pa.int64()))
    node_ids = np.sort(np.concatenate(own)) if own else np.empty(0, np.int64)
    return SllpaResult(node_ids, memberships, T)


def sllpa(
    edges: Dataset,
    max_iterations: int = 20,
    threshold: float = 0.1,
    seed: int = 42,
    num_partitions: int | None = None,
    backend: str = "csr",
    num_shards: int | None = None,
) -> SllpaResult:
    """``backend="csr"`` (default since round 4): sharded label memory —
    see ``_sllpa_csr``; ``backend="dataflow"`` keeps the broadcast-state
    loop (parity-tested equal)."""
    if backend == "csr":
        return _sllpa_csr(edges, max_iterations, threshold, seed,
                          num_partitions, num_shards)
    configure_ray_data()
    sym = drop_self_loops(
        symmetrize(edges, dedup=True, num_partitions=num_partitions)
    ).materialize()
    node_ids = unique_node_ids(sym)
    n = node_ids.shape[0]
    T = max_iterations

    memory = np.full((n, T + 1), -1, dtype=np.int64)
    memory[:, 0] = node_ids

    scanner = BlockScanner(sym)
    for t in range(1, T + 1):
        state_ref = ray.put((node_ids, memory, t))

        def scatter(t_: pa.Table, _round=t) -> pa.Table:
            ids, mem, rnd = ray.get(state_ref)
            src = t_.column("src_id").to_numpy(zero_copy_only=False)
            dst = t_.column("dst_id").to_numpy(zero_copy_only=False)
            sp = np.searchsorted(ids, src)
            # speaker picks a uniform memory slot via hash(seed,u,v,t)
            h = _mix(
                src.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
                ^ dst.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                ^ np.uint64((_round * 0x85EBCA6B + seed * 0x27D4EB2F) & 0xFFFFFFFFFFFFFFFF)
            )
            slot = (h % np.uint64(rnd)).astype(np.int64)
            label = mem[sp, slot]
            # per-batch (listener, label) counts. Labels are always node
            # ids (memory starts from ids and only circulates them), so
            # both key parts map to positions < n and pack into one
            # int64 — 1-D unique beats a 2-column row-sort by ~5-10×.
            n_ids = ids.shape[0]
            assert n_ids < (1 << 31), "packed pairing requires n < 2^31"
            dp = np.searchsorted(ids, dst)
            lp = np.searchsorted(ids, label)
            packed = dp.astype(np.int64) * n_ids + lp
            u_pack, cnt = np.unique(packed, return_counts=True)
            return pa.table(
                {
                    "node_id": pa.array(ids[u_pack // n_ids], pa.int64()),
                    "label": pa.array(ids[u_pack % n_ids], pa.int64()),
                    "c": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )

        tb = scanner.scan(scatter)
        if tb.num_rows == 0:
            break
        node = tb.column("node_id").to_numpy(zero_copy_only=False)
        lab = tb.column("label").to_numpy(zero_copy_only=False)
        cnt = tb.column("c").to_numpy(zero_copy_only=False)
        # merge partials then argmax (count desc, label asc) per node
        order = np.lexsort((lab, node))
        node, lab, cnt = node[order], lab[order], cnt[order]
        grp = np.r_[True, (node[1:] != node[:-1]) | (lab[1:] != lab[:-1])]
        gidx = np.cumsum(grp) - 1
        sums = np.zeros(gidx[-1] + 1, dtype=np.int64)
        np.add.at(sums, gidx, cnt)
        g_node = node[grp]
        g_lab = lab[grp]
        o2 = np.lexsort((g_lab, -sums, g_node))
        ns, ls = g_node[o2], g_lab[o2]
        first = np.r_[True, ns[1:] != ns[:-1]]
        pos = np.searchsorted(node_ids, ns[first])
        memory[pos, t] = ls[first]
        # nodes with no neighbors keep their own label filling the slot
        unset = memory[:, t] == -1
        memory[unset, t] = memory[unset, 0]

    # post-process: per node, labels with frequency ≥ threshold
    filled = memory[:, : T + 1]
    node_rep = np.repeat(node_ids, T + 1)
    flat = filled.reshape(-1)
    order = np.lexsort((flat, node_rep))
    nr, fl = node_rep[order], flat[order]
    grp = np.r_[True, (nr[1:] != nr[:-1]) | (fl[1:] != fl[:-1])]
    gidx = np.cumsum(grp) - 1
    counts = np.bincount(gidx)
    g_node, g_lab = nr[grp], fl[grp]
    freq = counts / (T + 1)
    keep = freq >= threshold
    order2 = np.lexsort((g_lab[keep], g_node[keep]))
    memberships = pa.table(
        {
            "node_id": pa.array(g_node[keep][order2], pa.int64()),
            "label": pa.array(g_lab[keep][order2], pa.int64()),
            "frequency": pa.array(np.round(freq[keep][order2], 6), pa.float64()),
        }
    )
    return SllpaResult(node_ids, memberships, T)
