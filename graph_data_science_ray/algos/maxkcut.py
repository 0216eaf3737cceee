"""Approximate maximum k-cut — deterministic local search.

Reference semantics (``gds.maxkcut``, [GDS-pub: algo/.../maxkcut/]):
partition nodes into k communities maximizing the total weight of
inter-community (cut) edges; the reference runs randomized VNS local
search (approximate — the problem is NP-hard). This engine's variant is
the deterministic analogue of its Louvain/Leiden machinery:

- initial assignment: ``splitmix64(node_id ⊕ seed) mod k`` (the
  deterministic stand-in for the reference's random init);
- phased synchronous local moving (``splitmix64(node_id ⊕ seed+1) mod
  C`` classes — a pure id function, so the class assignment needs no
  global rank and shards identically at any scale): a node
  moves to the community where its incident weight is SMALLEST
  (maximizing its cut contribution), ties to the smallest community id;
- the move set is accepted only if the exact recomputed cut weight
  strictly improves (monotone guard ⇒ termination), with the
  acceptance scan reused as the next round's candidate rows — ONE edge
  scan per round, exactly like algos/louvain.py.

Local-search guarantee (public): at a local optimum every node has at
most 1/k of its incident weight internal, so cut ≥ (k−1)/k · total —
asserted in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Min, Sum

from graph_data_science_ray.algos.common import unique_node_ids
from graph_data_science_ray.algos.louvain import _merge_partials, _neighbor_community_weights
from graph_data_science_ray.context import configure_ray_data, shuffle_partitions_for
from graph_data_science_ray.sources.edges import drop_self_loops, symmetrize


def _mix(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


class MaxKCutResult:
    def __init__(self, node_ids, values, cut_weight, total_weight, rounds):
        self.node_ids = node_ids
        self.values = values
        self.value_name = "community"
        self.cut_weight = cut_weight
        self.total_weight = total_weight
        self.rounds = rounds

    def as_dict(self) -> dict:
        return dict(zip(self.node_ids.tolist(), self.values.tolist()))

    def to_table(self) -> pa.Table:
        return pa.table(
            {
                "node_id": pa.array(self.node_ids, pa.int64()),
                "community": pa.array(self.values, pa.int64()),
            }
        )


def _max_k_cut_csr(sym: Dataset, k: int, max_rounds: int, seed: int,
                   num_shards: int | None) -> MaxKCutResult:
    """Sharded local search (round-4 migration): community vector and
    (n × k) incident-weight matrix live on the CSR shard actors; a round
    is one label_votes keyed exchange under the shard-side tentative
    assignment, with the driver reducing only (total, intra) scalars for
    the global accept test — identical move/accept math to the dataflow
    loop (parity-tested on integer-weight cuts)."""
    from graph_data_science_ray.state.engine import CsrEngine

    engine = CsrEngine.build(sym, num_shards=num_shards or 8, weighted=True)
    shards, P = engine.shards, engine.P
    hub_i = np.empty(0, dtype=np.int64)
    hub_v = np.empty(0, dtype=np.float64)
    C = 4
    ray.get([s.maxkcut_init.remote(k, seed, C) for s in shards])

    def exchange() -> tuple[float, float]:
        emits = [s.emit.options(num_returns=P).remote("label_votes", hub_i, hub_v)
                 for s in shards]
        if P == 1:
            emits = [[e] for e in emits]
        parts = ray.get([
            shards[j].apply.remote("maxkcut_gather", 0.0,
                                   *[emits[i][j] for i in range(P)])
            for j in range(P)
        ])
        return (sum(p[0] for p in parts), sum(p[1] for p in parts))

    # initial gather under the hash-seeded assignment
    ray.get([s.maxkcut_propose.remote(-1) for s in shards])  # state ← comm
    total_sym, intra_sym = exchange()
    ray.get([s.maxkcut_commit.remote(True) for s in shards])
    cut = (total_sym - intra_sym) / 2.0
    total_w = total_sym / 2.0

    stall = 0
    rounds = 0
    for rnd in range(max_rounds * C):
        ph = rnd % C
        movers = sum(ray.get([s.maxkcut_propose.remote(ph) for s in shards]))
        if movers == 0:
            stall += 1
            if stall >= C:
                break
            continue
        _, intra2 = exchange()
        new_cut = (total_sym - intra2) / 2.0
        rounds = rnd + 1
        if new_cut <= cut + 1e-12:
            ray.get([s.maxkcut_commit.remote(False) for s in shards])
            stall += 1
            if stall >= C:
                break
            continue
        ray.get([s.maxkcut_commit.remote(True) for s in shards])
        cut, stall = new_cut, 0

    refs = [s.get_state_named.remote("community", True) for s in shards]
    parts = ray.get(refs)
    engine.shutdown()
    t = pa.concat_tables(parts)
    ids = t.column("node_id").to_numpy(zero_copy_only=False).astype(np.int64)
    comm = t.column("community").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    return MaxKCutResult(ids[order], comm[order], cut, total_w, rounds)


def approx_max_k_cut(
    edges: Dataset,
    k: int = 2,
    max_rounds: int = 30,
    weighted: bool = False,
    seed: int = 42,
    num_partitions: int | None = None,
    backend: str = "csr",
    num_shards: int | None = None,
) -> MaxKCutResult:
    configure_ray_data()
    num_partitions = num_partitions or shuffle_partitions_for()

    base = edges
    if not weighted:
        def add_w(t: pa.Table) -> pa.Table:
            return t.select(["src_id", "dst_id"]).append_column(
                "weight", pa.array(np.ones(t.num_rows), pa.float64())
            )
        base = base.map_batches(add_w, batch_format="pyarrow", zero_copy_batch=True)

    def lo_hi(t: pa.Table) -> pa.Table:
        s = t.column("src_id").to_numpy(zero_copy_only=False)
        d = t.column("dst_id").to_numpy(zero_copy_only=False)
        w = t.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "src_id": pa.array(np.minimum(s, d), pa.int64()),
                "dst_id": pa.array(np.maximum(s, d), pa.int64()),
                "weight": pa.array(w, pa.float64()),
            }
        )

    agg = Sum("weight", alias_name="weight") if weighted else Min("weight", alias_name="weight")
    und = (
        drop_self_loops(base)
        .map_batches(lo_hi, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src_id", "dst_id"], num_partitions=num_partitions)
        .aggregate(agg)
    )
    sym = symmetrize(und.materialize(), dedup=False).materialize()
    if backend == "csr":
        return _max_k_cut_csr(sym, k, max_rounds, seed, num_shards)
    node_ids = unique_node_ids(sym)
    n = node_ids.shape[0]
    if n == 0:
        return MaxKCutResult(node_ids, np.empty(0, dtype=np.int64), 0.0, 0.0, 0)

    comm = (_mix(node_ids.astype(np.uint64) ^ np.uint64(seed)) % np.uint64(k)).astype(np.int64)

    def gather(assign: np.ndarray):
        """rows under ``assign`` → dense (n × k) incident-weight matrix,
        total sym weight, intra sym weight."""
        ids_ref = ray.put((node_ids, assign))
        part = _neighbor_community_weights(sym, ids_ref)
        M = np.zeros((n, k))
        intra = 0.0
        total = 0.0
        if part.num_rows:
            p, c, w = _merge_partials(part, max(k, 1))
            np.add.at(M, (p, c), w)
            total = float(w.sum())
            intra = float(w[assign[p] == c].sum())
        return M, total, intra

    M, total_sym, intra_sym = gather(comm)
    cut = (total_sym - intra_sym) / 2.0
    total_w = total_sym / 2.0

    C = 4
    cls = (_mix(node_ids.astype(np.uint64) ^ np.uint64(seed + 1)) % np.uint64(C)).astype(np.int64)
    stall = 0
    rounds = 0
    for rnd in range(max_rounds * C):
        ph = rnd % C
        best = np.argmin(M, axis=1)  # argmin ties → smallest community
        gain = M[np.arange(n), comm] - M[np.arange(n), best]
        movers = (best != comm) & (gain > 1e-12) & (cls == ph)
        if not movers.any():
            stall += 1
            if stall >= C:
                break
            continue
        new_comm = comm.copy()
        new_comm[movers] = best[movers]
        M2, _, intra2 = gather(new_comm)
        new_cut = (total_sym - intra2) / 2.0
        rounds = rnd + 1
        if new_cut <= cut + 1e-12:
            stall += 1
            if stall >= C:
                break
            continue
        comm, M, cut = new_comm, M2, new_cut
        stall = 0

    return MaxKCutResult(node_ids, comm, cut, total_w, rounds)
