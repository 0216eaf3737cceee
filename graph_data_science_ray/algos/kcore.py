"""K-Core decomposition — per-node core value via h-index iteration.

Reference semantics (``gds.kcore``, [GDS-pub: algo/.../kcore/]): the
core value of node v is the largest k such that v belongs to a subgraph
where every node has degree ≥ k (undirected view, self-loops ignored).
The reference peels iteratively (repeatedly remove min-degree nodes);
peeling is inherently sequential, so this engine uses the *h-index
iteration* instead (Lü et al., "The H-index of a network node and its
relation to degree and coreness", Nat. Commun. 2016 — public result):
start from the degree and repeatedly set

    c_v ← H({ c_u : u ∈ N(v) })

where H is the h-index operator (largest k with ≥ k values ≥ k). The
sequence is monotonically non-increasing and converges exactly to the
coreness — and each step is a dataflow round: scatter neighbor values
over the edge table, gather per-node multisets as (node, value, count)
histograms, apply H. Neighbor values are clipped to the receiver's
current value before emission (provably result-preserving, since
c_v never increases), which bounds the histogram's distinct values and
shrinks shuffle volume as the iteration converges.

Scale shape: one edge scan per round; the scatter emits per-batch
histogram partials (≤ one row per (dst, distinct clipped value) per
batch), merged either on the driver (node-vector standing assumption)
or via a ``groupby(["node_id","val"]).sum`` hash shuffle (scale path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from graph_data_science_ray.algos.common import (
    self_loop_only_nodes,
    unique_inverse,
    unique_node_ids,
)
from graph_data_science_ray.algos.iterate import run_iterative
from graph_data_science_ray.algos.pagerank import IterativeResult
from graph_data_science_ray.checkpoint import CheckpointManager
from graph_data_science_ray.sources.edges import drop_self_loops, symmetrize


def _make_stage(state_ref):
    def fn(batch: pa.Table) -> pa.Table:
        ids, core = ray.get(state_ref)
        src = batch.column("src_id").to_numpy(zero_copy_only=False)
        dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
        n = ids.shape[0]
        src_val = core[np.minimum(np.searchsorted(ids, src), n - 1)]
        dst_cap = core[np.minimum(np.searchsorted(ids, dst), n - 1)]
        val = np.minimum(src_val, dst_cap)  # clip: provably result-preserving
        # per-batch histogram partial: (dst, val) → count
        u_dst, inv = unique_inverse(dst)
        width = int(val.max()) + 1 if val.shape[0] else 1
        packed = inv.astype(np.int64) * width + val
        u_pack, counts = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "node_id": pa.array(u_dst[u_pack // width], pa.int64()),
                "val": pa.array(u_pack % width, pa.int64()),
                "cnt": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return fn


def _h_from_histogram(node: np.ndarray, val: np.ndarray, cnt: np.ndarray, node_ids: np.ndarray) -> np.ndarray:
    """Vectorized per-node h-index from a merged (node, val, count)
    histogram: sort by (node, val desc), cumulative count within node,
    h = max over rows of min(val, cum)."""
    order = np.lexsort((-val, node))
    node, val, cnt = node[order], val[order], cnt[order]
    cum = np.cumsum(cnt)
    starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
    offsets = np.zeros(node.shape[0], dtype=np.int64)
    offsets[starts] = np.r_[0, cum[starts[1:] - 1]]
    np.maximum.accumulate(offsets, out=offsets)
    within = cum - offsets
    cand = np.minimum(val, within)
    pos = np.searchsorted(node_ids, node)
    h = np.zeros(node_ids.shape[0], dtype=np.int64)
    np.maximum.at(h, pos, cand)
    return h


def _merge_histogram(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    node = t.column("node_id").to_numpy(zero_copy_only=False)
    val = t.column("val").to_numpy(zero_copy_only=False)
    cnt = t.column("cnt").to_numpy(zero_copy_only=False)
    return node, val, cnt


def _apply(state: np.ndarray, gathered: pa.Table, node_ids: np.ndarray):
    new = np.zeros_like(state)  # isolated nodes (no rows) → core 0
    if gathered.num_rows:
        node, val, cnt = _merge_histogram(gathered)
        new = _h_from_histogram(node, val, cnt, node_ids)
    changed = int((new != state).sum())
    return new, float(changed)


def core_decomposition(
    edges: Dataset,
    max_iterations: int = 200,
    num_partitions: int | None = None,
    checkpoint: CheckpointManager | None = None,
    resume: bool = False,
    reduce: str = "driver",
    backend: str = "csr",
    num_shards: int | None = None,
) -> IterativeResult:
    """Per-node core value over the undirected simple view. Converges
    when no value changes (guaranteed; the sequence is monotone).

    ``backend="csr"`` (DEFAULT since round 4 — the scale path is what
    users get by calling the defaults): sharded core state on the CSR
    actors (CsrEngine.kcore) — init is the owned degree, so csr round k
    equals dataflow round k+1 (the dataflow path spends its first round
    materializing the degree); converged values are identical
    (parity-tested). ``backend="dataflow"`` keeps the broadcast-state
    path with the checkpoint/reduce surface."""
    sym = drop_self_loops(symmetrize(edges, dedup=True, num_partitions=num_partitions))
    if backend == "csr":
        from graph_data_science_ray.state.engine import CsrEngine

        engine = CsrEngine.build(sym, num_shards=num_shards or 8)
        # csr round k == dataflow round k+1 (degree init skips the
        # dataflow's materialization round), so burn one round to keep
        # the BOUNDED-iterations contract identical across backends —
        # at sf0.1 the kcore_h8 bound actually binds and the off-by-one
        # flipped values (caught round 4); converged runs are unaffected
        res = engine.kcore(max_iterations=max(0, max_iterations - 1),
                           checkpoint=checkpoint, resume=resume)
        engine.shutdown()
        # self-loop-only nodes: absent from the engine (loops dropped at
        # build) but core 0 on the dataflow backend — round-5 ADVICE fix
        res.union_missing(self_loop_only_nodes(edges), 0, np.int64)
        return res
    node_ids = unique_node_ids(edges)
    # init = undirected degree, computed by one extra round against a
    # +inf-like cap (clip against init makes round 0 emit degree counts)
    big = np.full(node_ids.shape[0], np.iinfo(np.int32).max, dtype=np.int64)

    return run_iterative(
        sym,
        node_ids,
        big,
        _make_stage,
        gather_key=["node_id", "val"],
        gather_aggs=lambda: [Sum("cnt", alias_name="cnt")],
        apply_fn=_apply,
        max_iterations=max_iterations,
        tolerance=0.0,
        value_name="core",
        checkpoint=checkpoint,
        resume=resume,
        num_partitions=num_partitions,
        reduce=reduce,
        driver_reduce=_driver_merge,
    )


def _driver_merge(t: pa.Table) -> pa.Table:
    """Merge per-batch histogram partials: sum counts per (node, val)."""
    if t.num_rows == 0:
        return t
    node, val, cnt = _merge_histogram(t)
    width = int(val.max()) + 1
    u_node, inv = unique_inverse(node)
    packed = inv.astype(np.int64) * width + val
    u_pack = np.unique(packed)
    sums = np.zeros(u_pack.shape[0], dtype=np.int64)
    np.add.at(sums, np.searchsorted(u_pack, packed), cnt)
    return pa.table(
        {
            "node_id": pa.array(u_node[u_pack // width], pa.int64()),
            "val": pa.array(u_pack % width, pa.int64()),
            "cnt": pa.array(sums, pa.int64()),
        }
    )
