"""PageRank — power iteration over a Dataset edge table, GDS convention.

Reference semantics (Neo4j GDS PageRank, public docs — SURVEY.md §2.9;
/root/reference is empty so no file:line cites are possible):

    p(v) = (1 - d) + d * Σ_{u ∈ in(v)} p(u) * w(u,v) / W_out(u)

- damping d = 0.85, maxIterations = 20, tolerance = 1e-7 defaults;
- scores are NOT normalized to a distribution (isolated node → 0.15);
- dangling-node mass is NOT redistributed;
- converged when max per-node change < tolerance.

Dataflow shape per iteration (one shuffle):

    edges ──map_batches(contrib = scaled[src] * w, pre-agg by dst)──▶
          ──groupby(dst).sum()──▶ (node, in_sum) ──apply damping──▶ ranks

where ``scaled = ranks / out_weight`` is computed once per iteration on
the node vector and broadcast via ``ray.put`` (the node vector is the
small side of a link graph; see algos/common.py for the scale story and
state/csr.py for the sharded-node-state implementation).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from graph_data_science_ray.algos.common import NodeVector, collect_arrow, unique_inverse, unique_node_ids
from graph_data_science_ray.checkpoint import CheckpointManager
from graph_data_science_ray.context import configure_ray_data, shuffle_partitions_for


@dataclass
class IterativeResult:
    node_ids: np.ndarray
    values: np.ndarray
    value_name: str
    iterations: int
    converged: bool
    metrics: list[dict]

    def to_table(self) -> pa.Table:
        return pa.table(
            {
                "node_id": pa.array(self.node_ids, pa.int64()),
                self.value_name: pa.array(self.values),
            }
        )

    def to_dataset(self) -> Dataset:
        import ray.data

        return ray.data.from_arrow(self.to_table())

    def as_dict(self) -> dict:
        return dict(zip(self.node_ids.tolist(), self.values.tolist()))


def _contrib_stage(state_ref, weighted: bool):
    """Batch fn: edges → per-batch pre-aggregated (dst_id, contrib).

    The within-batch combiner (np.unique + bincount) collapses repeated
    dsts BEFORE the shuffle — the high-in-degree-hub mitigation of
    SURVEY.md §4.3: the groupby then sums partials, not raw edges.
    """

    def fn(batch: pa.Table) -> pa.Table:
        ids, scaled = ray.get(state_ref)
        src = batch.column("src_id").to_numpy(zero_copy_only=False)
        dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ids, src)
        contrib = scaled[np.minimum(pos, ids.shape[0] - 1)]
        if weighted:
            contrib = contrib * batch.column("weight").to_numpy(zero_copy_only=False)
        u_dst, inv = unique_inverse(dst)
        partial = np.bincount(inv, weights=contrib, minlength=u_dst.shape[0])
        return pa.table(
            {"dst_id": pa.array(u_dst, pa.int64()), "contrib": pa.array(partial, pa.float64())}
        )

    return fn


def _out_weight(edges: Dataset, node_vec_ids: np.ndarray, weighted: bool) -> np.ndarray:
    """W_out per node (0.0 for dangling), aligned with node_vec_ids.
    Per-batch partial sums (combiner) + driver merge — shuffle-free."""

    def partials(t: pa.Table) -> pa.Table:
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        w = (
            t.column("weight").to_numpy(zero_copy_only=False)
            if weighted
            else np.ones(src.shape[0])
        )
        u, inv = unique_inverse(src)
        s = np.bincount(inv, weights=w, minlength=u.shape[0])
        return pa.table({"src_id": pa.array(u, pa.int64()), "w": pa.array(s, pa.float64())})

    t = collect_arrow(edges.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True))
    out = np.zeros(node_vec_ids.shape[0], dtype=np.float64)
    if t.num_rows:
        from graph_data_science_ray.algos.common import merge_sum

        ids, w = merge_sum(t, "src_id", "w")
        pos = np.searchsorted(node_vec_ids, ids)
        out[pos] = w
    return out


def pagerank(
    edges: Dataset,
    damping: float = 0.85,
    max_iterations: int = 20,
    tolerance: float = 1e-7,
    weighted: bool = False,
    source_nodes: list[int] | None = None,
    checkpoint: CheckpointManager | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
    reduce: str = "driver",
    scaler: str | None = None,
) -> IterativeResult:
    """GDS-convention PageRank over an ``(src_id, dst_id[, weight])``
    Dataset. Returns per-node scores matching the reference within 1e-6
    at convergence (tested against the FIXTURES.md §3 oracle).
    ``scaler``: GDS's scaler config — post-scales the final scores with
    ``functions/scalers.scale_values`` (minmax/l1norm/...).

    ``reduce``: "driver" merges the pre-aggregated per-batch contribution
    partials in one numpy pass on the driver (no shuffle; valid while the
    node vector fits, the dataflow path's standing assumption);
    "shuffle" uses the distributed ``groupby(dst).sum`` hash shuffle
    (identical results, the beyond-driver-memory scale path)."""
    configure_ray_data()
    edges = edges.materialize()  # iterated over; blocks pinned/spilled by Ray
    node_arr = unique_node_ids(edges)
    n = node_arr.shape[0]
    num_partitions = num_partitions or shuffle_partitions_for(n)
    out_w = _out_weight(edges, node_arr, weighted)

    # personalized PageRank (GDS sourceNodes): the (1-d) teleport base is
    # applied only at the source nodes; everything else starts/bases at 0
    if source_nodes is not None:
        base = np.zeros(n, dtype=np.float64)
        pos = np.searchsorted(node_arr, np.asarray(sorted(source_nodes), dtype=np.int64))
        pos = pos[(pos < n)]
        base[pos] = 1.0 - damping
        ranks = base.copy()
    else:
        base = None
        ranks = np.ones(n, dtype=np.float64)
    start_iter = 0
    metrics: list[dict] = []
    if checkpoint is not None and resume:
        latest = checkpoint.latest()
        if latest is not None:
            it, ids, vals, m = latest
            assert np.array_equal(ids, node_arr), "checkpoint node universe mismatch"
            ranks = vals.astype(np.float64)
            start_iter = it + 1

    converged = False
    iteration = start_iter - 1
    from graph_data_science_ray.algos.common import BlockScanner

    scanner = BlockScanner(edges) if reduce == "driver" else None
    for iteration in range(start_iter, max_iterations):
        scaled = np.divide(ranks, out_w, out=np.zeros_like(ranks), where=out_w > 0)
        state_ref = ray.put((node_arr, scaled))
        new_ranks = base.copy() if base is not None else np.full(n, 1.0 - damping, dtype=np.float64)
        if reduce == "driver":
            t = scanner.scan(_contrib_stage(state_ref, weighted))
            if t.num_rows:
                from graph_data_science_ray.algos.common import merge_sum

                ids, sums = merge_sum(t, "dst_id", "contrib")
                pos = np.searchsorted(node_arr, ids)
                new_ranks[pos] += damping * sums
        else:
            contribs = edges.map_batches(
                _contrib_stage(state_ref, weighted),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            summed = contribs.groupby("dst_id", num_partitions=num_partitions).aggregate(
                Sum("contrib", alias_name="in_sum")
            )
            t = collect_arrow(summed)
            if t.num_rows:
                ids = t.column("dst_id").to_numpy(zero_copy_only=False)
                sums = t.column("in_sum").to_numpy(zero_copy_only=False)
                pos = np.searchsorted(node_arr, ids)
                new_ranks[pos] += damping * sums
        residual = float(np.abs(new_ranks - ranks).max()) if n else 0.0
        ranks = new_ranks
        metrics.append({"iteration": iteration, "residual": residual})
        if checkpoint is not None:
            checkpoint.write_iteration(iteration, node_arr, ranks, {"residual": residual})
        if residual < tolerance:
            converged = True
            break

    if scaler is not None:
        from graph_data_science_ray.functions.scalers import scale_values

        ranks = scale_values(ranks, scaler)

    return IterativeResult(
        node_ids=node_arr,
        values=ranks,
        value_name="rank",
        iterations=iteration + 1,
        converged=converged,
        metrics=metrics,
    )
