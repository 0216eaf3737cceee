"""CELF influence maximization — live-edge cascades + lazy greedy.

Reference semantics (``gds.influenceMaximization.celf``,
[GDS-pub: algo/.../influenceMaximization/]): pick k seed nodes
maximizing expected spread under the Independent Cascade model
(each edge transmits independently with probability p), estimated by
Monte-Carlo simulation; CELF (Leskovec et al., public) is the
lazy-greedy that exploits submodularity to skip re-evaluations.

This engine's construction (public technique — live-edge / reachability
sketches): a cascade is equivalent to percolating each undirected edge
with probability p and spreading to the seed's connected component in
the surviving "live" subgraph. So:

1. For each of R simulations, filter the edge table by the repo's
   hash-determinism rule — pair {u,v} is live in simulation r iff
   ``mix64(seed, r, lo, hi) mod 2^20 < p·2^20`` (one scan, then this
   engine's own frontier-limited WCC on the survivor edges).
2. Per simulation keep the node→component map + component sizes
   (node-sized driver state × R).
3. Lazy greedy on the driver: marginal gain of u = (1/R) Σ_r
   |comp_r(u)| if comp_r(u) is not already covered by an earlier seed
   (0 if covered; 1 + nothing if u isolated in r). Submodular ⇒ CELF's
   stale-top re-evaluation is exact.

Deterministic end-to-end: same (graph, k, p, R, seed) → same seeds and
the same spread estimate, on any partitioning or cluster size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.algos.common import unique_inverse, unique_node_ids
from graph_data_science_ray.algos.wcc import wcc
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


class CelfResult:
    def __init__(self, seeds: list[int], spreads: list[float], expected_spread: float):
        self.seeds = seeds
        self.spreads = spreads  # cumulative expected spread after each seed
        self.expected_spread = expected_spread

    def to_table(self) -> pa.Table:
        return pa.table(
            {
                "seed_rank": pa.array(range(len(self.seeds)), pa.int64()),
                "node_id": pa.array(self.seeds, pa.int64()),
                "cumulative_spread": pa.array(
                    np.round(self.spreads, 6), pa.float64()
                ),
            }
        )


def _celf_csr(
    edges: Dataset,
    k: int,
    propagation_probability: float,
    simulations: int,
    seed: int,
    num_partitions: int | None,
    num_shards: int | None,
) -> CelfResult:
    """Sharded CELF (round 4 — the last driver-state family member):
    each simulation is a frontier min-label Pregel whose send hook masks
    dead edges by the percolation hash, component ids/sizes land in
    (n_owned × R) shard matrices via one keyed exchange per simulation,
    and seed selection is a per-round vectorized masked re-eval +
    per-shard argmax. Driver state: the covered-component sets (≤ k ids
    per simulation) and the seed list — no O(N) arrays. Outputs are
    bitwise equal to the dataflow path (gains are dyadic; fresh-argmax
    selection is what the lazy heap computes; parity-tested)."""
    from graph_data_science_ray.algos.louvain import _wrap1
    from graph_data_science_ray.state.engine import CsrEngine

    configure_ray_data()
    sym = drop_self_loops(symmetrize(edges, dedup=True, num_partitions=num_partitions))
    engine = CsrEngine.build(sym, num_shards=num_shards or 8)
    shards, P = engine.shards, engine.P
    n_glob = engine.n_nodes
    if n_glob == 0:
        engine.shutdown()
        return CelfResult([], [], 0.0)
    thresh = np.uint64(int(propagation_probability * (1 << 20)))
    R = simulations
    ray.get([s.celf_init.remote(R) for s in shards])

    def update(state, combined, has_msg, ids):
        return np.minimum(state, combined)

    for r in range(R):
        salt = np.uint64((seed * 0x9E3779B97F4A7C15 + r * 0xC2B2AE35) & ((1 << 64) - 1))

        def send(s_vals, b, _salt=salt, _th=thresh):
            from graph_data_science_ray.algos.celf import _mix

            sid = b.column("src_id").to_numpy(zero_copy_only=False)
            did = b.column("dst_id").to_numpy(zero_copy_only=False)
            lo = np.minimum(sid, did).astype(np.uint64)
            hi = np.maximum(sid, did).astype(np.uint64)
            h = _mix(lo * np.uint64(0x9E3779B97F4A7C15) ^ hi ^ _salt)
            live = (h % np.uint64(1 << 20)) < _th
            return np.where(live, s_vals, np.iinfo(np.int64).max)

        engine.pregel(
            send, update, init=lambda ids: ids.copy(), combine="min",
            is_int=True, residual="changed", frontier=True,
            max_iterations=10_000, tolerance=0.0, fetch_state=False,
        )
        ray.get([s.celf_store_comp.remote(r) for s in shards])
        parts = _wrap1([s.celf_size_partials.options(num_returns=P).remote(r)
                        for s in shards], P)
        ray.get([shards[o].celf_size_merge.remote(*[parts[i][o] for i in range(P)])
                 for o in range(P)])
        reqs = _wrap1([s.celf_size_request.options(num_returns=P).remote(r)
                       for s in shards], P)
        resps = _wrap1([shards[o].celf_size_respond.options(num_returns=P).remote(
            *[reqs[i][o] for i in range(P)]) for o in range(P)], P)
        ray.get([shards[j].celf_gain_fill.remote(r, *[resps[o][j] for o in range(P)])
                 for j in range(P)])

    covered = [np.empty(0, np.int64) for _ in range(R)]
    seeds: list[int] = []
    spreads: list[float] = []
    total = 0.0
    for _ in range(min(k, n_glob)):
        tops = ray.get([s.celf_best.remote(covered) for s in shards])
        best_j = 0
        for j in range(1, P):
            g, nid, _ = tops[j]
            bg, bnid, _ = tops[best_j]
            if g > bg or (g == bg and nid != -1 and (bnid == -1 or nid < bnid)):
                best_j = j
        g, nid, i = tops[best_j]
        comp_row = ray.get(shards[best_j].celf_take.remote(i))
        seeds.append(int(nid))
        total += g
        spreads.append(total)
        for r in range(R):
            covered[r] = np.unique(np.append(covered[r], comp_row[r]))
    engine.shutdown()
    return CelfResult(seeds, spreads, total)


def celf(
    edges: Dataset,
    k: int = 5,
    propagation_probability: float = 0.1,
    simulations: int = 32,
    seed: int = 42,
    num_partitions: int | None = None,
    backend: str = "csr",
    num_shards: int | None = None,
) -> CelfResult:
    """``backend="csr"`` (default since round 4): sharded simulations +
    selection — see ``_celf_csr``; ``backend="dataflow"`` keeps the
    broadcast-state path (bitwise parity-tested)."""
    if backend == "csr":
        return _celf_csr(edges, k, propagation_probability, simulations,
                         seed, num_partitions, num_shards)
    configure_ray_data()
    sym = drop_self_loops(
        symmetrize(edges, dedup=True, num_partitions=num_partitions)
    ).materialize()
    node_ids = unique_node_ids(sym)
    n = node_ids.shape[0]
    if n == 0:
        return CelfResult([], [], 0.0)
    thresh = np.uint64(int(propagation_probability * (1 << 20)))

    comp = np.empty((simulations, n), dtype=np.int64)   # component per node
    size = []                                            # per sim: comp id → size

    for r in range(simulations):
        salt = np.uint64((seed * 0x9E3779B97F4A7C15 + r * 0xC2B2AE35) & ((1 << 64) - 1))

        def live(t: pa.Table, _salt=salt) -> pa.Table:
            s = t.column("src_id").to_numpy(zero_copy_only=False)
            d = t.column("dst_id").to_numpy(zero_copy_only=False)
            lo = np.minimum(s, d).astype(np.uint64)
            hi = np.maximum(s, d).astype(np.uint64)
            h = _mix(lo * np.uint64(0x9E3779B97F4A7C15) ^ hi ^ _salt)
            return t.filter(pa.array((h % np.uint64(1 << 20)) < thresh))

        live_edges = sym.map_batches(live, batch_format="pyarrow", zero_copy_batch=True)
        res = wcc(live_edges.materialize(), pre_symmetrized=True, num_partitions=num_partitions)
        # map live-graph components onto the full node universe; nodes
        # with no live edge are their own singleton component
        comp_r = node_ids.copy()
        if res.node_ids.shape[0]:
            pos = np.searchsorted(node_ids, res.node_ids)
            comp_r[pos] = res.values
        comp[r] = comp_r
        u, inv = unique_inverse(comp_r)
        sizes = np.bincount(inv)
        # store as dense lookup aligned with comp_r via searchsorted
        size.append((u, sizes))

    # per (sim, node): component size
    gain_tbl = np.empty((simulations, n), dtype=np.float64)
    for r in range(simulations):
        u, sizes = size[r]
        gain_tbl[r] = sizes[np.searchsorted(u, comp[r])]

    covered = [set() for _ in range(simulations)]
    base_gain = gain_tbl.mean(axis=0)

    # CELF lazy greedy
    order = np.argsort(-base_gain, kind="stable")
    cand_gain = base_gain.copy()
    stale = np.zeros(n, dtype=np.int64)  # last seed-round the gain was computed
    seeds: list[int] = []
    spreads: list[float] = []
    total = 0.0
    chosen = np.zeros(n, dtype=bool)
    import heapq

    heap = [(-cand_gain[i], int(node_ids[i]), int(i)) for i in range(n)]
    heapq.heapify(heap)
    for round_i in range(min(k, n)):
        while True:
            negg, nid, i = heapq.heappop(heap)
            if chosen[i]:
                continue
            if stale[i] == round_i:
                break
            # re-evaluate marginal gain against current coverage
            g = 0.0
            for r in range(simulations):
                c = comp[r, i]
                if c not in covered[r]:
                    g += gain_tbl[r, i]
            g /= simulations
            stale[i] = round_i
            heapq.heappush(heap, (-g, nid, i))
        chosen[i] = True
        seeds.append(int(node_ids[i]))
        total += -negg
        spreads.append(total)
        for r in range(simulations):
            covered[r].add(comp[r, i])

    return CelfResult(seeds, spreads, total)


def greedy_influence_maximization(
    edges: Dataset,
    k: int = 5,
    propagation_probability: float = 0.1,
    simulations: int = 32,
    seed: int = 42,
    num_partitions: int | None = None,
) -> CelfResult:
    """``gds.influenceMaximization.greedy`` parity [GDS-pub:
    algo/.../influenceMaximization/]: plain greedy hill-climbing over
    expected IC spread. CELF's lazy evaluation is an exact acceleration
    of the same greedy (Leskovec et al. 2007) — identical seed sets and
    spreads by submodularity — so this is the named wrapper."""
    return celf(
        edges, k=k, propagation_probability=propagation_probability,
        simulations=simulations, seed=seed, num_partitions=num_partitions,
    )
