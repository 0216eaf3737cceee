"""Driver orchestration for the CSR shard actors (state/csr.py).

``CsrEngine.build`` routes an edge Dataset into P shard parquet
partitions (one streaming Ray Data pass — hub edges routed by dst, the
rest by src), spins up P ``CsrShard`` actors that each load their own
partition, and exposes the three iterative algorithms. Per iteration the
driver moves only ObjectRefs and per-shard residual scalars; all data
motion is shard→shard through the object store.

This is the beyond-driver-memory path: node state is sharded across the
actors by the same bucket function used for checkpoint partitions, so a
checkpoint written by shard b IS partition b of checkpoint.py's layout.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.algos.common import collect_arrow, unique_inverse
from graph_data_science_ray.algos.pagerank import IterativeResult
from graph_data_science_ray.checkpoint import CheckpointManager
from graph_data_science_ray.context import configure_ray_data
from graph_data_science_ray.stages.ids import bucket_of
from graph_data_science_ray.state.csr import CsrShard


def _universe_partials(edges: Dataset, weighted: bool) -> tuple:
    """ONE scan for ALL build inputs: per-src out-weight sums, the unique
    dst universe AND the full src∪dst universe, returned as
    (src_ids, src_w, dst_ids, all_ids), each sorted ascending (kind 0 =
    src row with weight, kind 1 = dst row, kind 2 = union row). Every
    merge/sort runs worker-side via Arrow hash aggregation — the driver
    only slices; see the combine notes below for the measured hazards
    (idle-worker-starved driver merges, allocation-heavy numpy sorts)."""

    def partials(t: pa.Table) -> pa.Table:
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        w = (
            t.column("weight").to_numpy(zero_copy_only=False)
            if weighted
            else np.ones(src.shape[0])
        )
        u, inv = unique_inverse(src)
        sw = np.bincount(inv, weights=w, minlength=u.shape[0])
        ud = np.unique(t.column("dst_id").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "node_id": pa.array(np.concatenate([u, ud]), pa.int64()),
                "w": pa.array(np.concatenate([sw, np.zeros(ud.shape[0])]), pa.float64()),
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(u.shape[0], np.int8), np.ones(ud.shape[0], np.int8)]
                    ),
                    pa.int8(),
                ),
            }
        )

    # Merge with Arrow's C++ hash aggregation, NOT a numpy
    # unique_inverse: radix-argsorting ~12M-row partial blocks allocates
    # ~100 MB per sort and measured 136 s on this host (fresh-page-fault
    # throttling; the same merge via group_by is 2.8 s — see
    # BENCH/BASELINE.md). Grouping on (kind, node_id) is also immune to
    # the int64-key-packing overflow for 63-bit url-hash ids.
    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        g = t.group_by(["kind", "node_id"], use_threads=False).aggregate([("w", "sum")])
        return pa.table(
            {"node_id": g.column("node_id"), "w": g.column("w_sum"), "kind": g.column("kind")}
        )

    def combine_final(t: pa.Table) -> pa.Table:
        t = combine(t)
        if t.num_rows == 0:
            return t
        # kind 2 = src ∪ dst universe, computed here so the driver never
        # sorts either (build's np.union1d is the same starvation hazard)
        import pyarrow.compute as pc

        uni = pc.unique(t.column("node_id"))
        t = pa.concat_tables(
            [
                t,
                pa.table(
                    {
                        "node_id": uni,
                        "w": pa.array(np.zeros(len(uni)), pa.float64()),
                        "kind": pa.array(np.full(len(uni), 2, np.int8), pa.int8()),
                    }
                ),
            ]
        )
        return t.sort_by([("kind", "ascending"), ("node_id", "ascending")])

    # two combine levels, the SECOND over one block: both the final merge
    # AND the final sort run in a busy worker, so the driver only slices
    # (a 4M-row driver lexsort right after the big scan measured 12.9 s
    # under the same idle-worker starvation vs ~0.5 s worker-side).
    t = collect_arrow(
        edges.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(4)
        .map_batches(combine, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .repartition(1)
        .map_batches(combine_final, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )
    if t.num_rows == 0:
        e = np.empty(0, np.int64)
        return (e, np.empty(0, np.float64), e, e)
    ids = t.column("node_id").to_numpy(zero_copy_only=False)
    w = t.column("w").to_numpy(zero_copy_only=False)
    kind = t.column("kind").to_numpy(zero_copy_only=False)
    s1 = int(np.searchsorted(kind, 1))  # kind-sorted: src, dst, union rows
    s2 = int(np.searchsorted(kind, 2))
    return ids[:s1], w[:s1], ids[s1:s2], ids[s2:]


class CsrEngine:
    def __init__(self, shards, num_shards: int, node_ids: np.ndarray, out_w: np.ndarray,
                 hub_ids: np.ndarray, hub_out_w: np.ndarray):
        self.shards = shards
        self.P = num_shards
        self.node_ids = node_ids          # full sorted universe (driver keeps ids only)
        self.out_w = out_w
        self.hub_ids = hub_ids            # sorted
        self.hub_out_w = hub_out_w
        self.hub_owner = bucket_of(hub_ids, num_shards) if hub_ids.shape[0] else np.empty(0, np.int64)

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls,
        edges: Dataset,
        num_shards: int = 8,
        weighted: bool = False,
        hub_threshold: int | None = None,
        spill_dir: str | None = None,
        routing: str = "auto",  # auto | scan | spill
        scan_threshold: int = 100_000_000,
    ) -> "CsrEngine":
        """One routing pass + parallel shard builds.

        routing="scan": every shard filters its rows from the shared
        materialized blocks (zero-copy, no disk round-trip; P× scan
        amplification — single-node/small-graph win). routing="spill":
        one streaming pass writes shard-partitioned parquet and each
        actor reads only its own partition (the cluster-scale path).
        auto picks scan below ``scan_threshold`` edges."""
        configure_ray_data()
        P = num_shards
        # prune + materialize ONCE: the degree scan, the dst-universe
        # scan, and the shard ingest all reuse these blocks — a lazy
        # input (read→union→rename pipeline) would otherwise be
        # re-executed three times over (measured 3-4x of build wall)
        cols = ["src_id", "dst_id"] + (["weight"] if weighted else [])
        edges = edges.select_columns(cols).materialize()
        # out-degrees + dst universe from ONE fused scan, merged while
        # NO actor is alive (idle actors starve long driver-side numpy)
        src_ids, src_w, dst_ids, all_ids = _universe_partials(edges, weighted)
        if hub_threshold is not None:
            hub_mask = src_w > hub_threshold
            hub_ids = src_ids[hub_mask]
        else:
            hub_ids = np.empty(0, dtype=np.int64)

        n_total_edges = int(src_w.sum()) if not weighted and src_w.shape[0] else None
        if routing == "auto":
            routing = (
                "scan"
                if (n_total_edges is not None and n_total_edges <= scan_threshold)
                else "spill"
            )

        if routing == "spill":
            # route edges → shard parquet partitions (single streaming pass)
            spill_dir = spill_dir or tempfile.mkdtemp(prefix="csr_shards_", dir="/tmp")
            hub_ref = ray.put(hub_ids)

            def route(t: pa.Table) -> pa.Table:
                hubs = ray.get(hub_ref)
                src = t.column("src_id").to_numpy(zero_copy_only=False)
                dst = t.column("dst_id").to_numpy(zero_copy_only=False)
                shard = bucket_of(src, P)
                if hubs.shape[0]:
                    is_hub = np.isin(src, hubs)
                    shard = np.where(is_hub, bucket_of(dst, P), shard)
                return t.append_column("shard", pa.array(shard, pa.int64()))

            edges.map_batches(route, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
                spill_dir, partition_cols=["shard"]
            )

        # estimate gate (the reference's memory-estimation admission,
        # pipelines/modes.estimate): refuse silently-doomed builds
        from graph_data_science_ray.pipelines.modes import estimate

        n_edges_hint = int(src_w.sum()) if not weighted else None
        if n_edges_hint:
            est = estimate(len(src_ids) or 1, n_edges_hint, num_shards=P, weighted=weighted)
            avail = ray.available_resources().get("memory", None)
            if avail is not None and est["per_shard_bytes"] * P > avail * 4:
                raise MemoryError(
                    f"estimated CSR footprint {est['total_bytes']>>20} MiB exceeds "
                    f"4x available cluster memory — raise num_shards/cluster size "
                    f"or use the dataflow implementations"
                )

        shards = [CsrShard.remote(b, P, weighted) for b in range(P)]
        if routing == "spill":
            # each shard loads only its own partition directory
            loads = []
            for b, s in enumerate(shards):
                d = os.path.join(spill_dir, f"shard={b}")
                files = (
                    [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
                    if os.path.isdir(d)
                    else []
                )
                loads.append(s.ingest_parquet.remote(files))
            ray.get(loads)
        else:
            # scan routing: shards filter their rows from the shared
            # blocks materialized once at the top of build
            block_refs = edges.to_arrow_refs()
            ray.get(
                [s.ingest_routed_blocks.remote(hub_ids, *block_refs) for s in shards]
            )
        ray.get([s.build.remote(hub_ids) for s in shards])

        out_w = np.zeros(all_ids.shape[0], dtype=np.float64)
        if src_ids.shape[0]:
            out_w[np.searchsorted(all_ids, src_ids)] = src_w
        hub_out_w = out_w[np.searchsorted(all_ids, hub_ids)] if hub_ids.shape[0] else np.empty(0)

        # hand each shard its owned slice of (ids, out_w)
        owner = bucket_of(all_ids, P)
        sets = []
        for b, s in enumerate(shards):
            m = owner == b
            sets.append(s.set_owned.remote(all_ids[m], out_w[m]))
        ray.get(sets)

        # static routing-layout exchange (once): each shard publishes ONE
        # coalesced (offsets, ids) object; every destination slices its
        # segment and caches positions — later iterations ship values only
        layouts = [s.get_layouts.remote() for s in shards]
        ray.get([shards[j].register_incoming.remote(j, *layouts) for j in range(P)])
        return cls(shards, P, all_ids, out_w, hub_ids, hub_out_w)

    def shutdown(self) -> None:
        """Kill shard actors and release their CSR + state memory NOW
        (dropping the handles only releases at GC time — a sequence of
        engines in one process otherwise accumulates into spilling)."""
        for s in self.shards:
            try:
                ray.kill(s)
            except Exception:
                pass
        self.shards = []

    # ------------------------------------------------------------------
    def _hub_values(self) -> np.ndarray:
        """Current state values of hub nodes, fetched from their owners."""
        if self.hub_ids.shape[0] == 0:
            return np.empty(0, dtype=np.float64)
        futs = []
        for b in range(self.P):
            m = self.hub_owner == b
            if m.any():
                futs.append((m, self.shards[b].get_values.remote(self.hub_ids[m])))
        parts = [(m, ray.get(f)) for m, f in futs]
        # dtype follows the shard state (float64 ranks, int64 labels)
        vals = np.empty(self.hub_ids.shape[0], dtype=parts[0][1].dtype)
        for m, v in parts:
            vals[m] = v
        return vals

    def _exchange(self, kind_emit: str, kind_apply: str, hub_vals: np.ndarray, damping: float = 0.85) -> float:
        """One iteration's shard↔shard exchange. PageRank and WCC use the
        values-only fast path (static layout registered at build); LPA's
        keys change per iteration so it ships keyed tables."""
        values_path = kind_emit in ("pagerank_contrib", "min_label")
        if values_path:
            # coalesced exchange: P emit objects total; every apply takes
            # all of them as TOP-LEVEL args (raylet-resolved, zero-copy)
            # and slices its own segment
            emits = [
                s.emit_values.remote(kind_emit, self.hub_ids, hub_vals) for s in self.shards
            ]
            applies = [
                self.shards[j].apply_values.remote(kind_apply, damping, *emits)
                for j in range(self.P)
            ]
        else:
            emits = [
                s.emit.options(num_returns=self.P).remote(kind_emit, self.hub_ids, hub_vals)
                for s in self.shards
            ]
            if self.P == 1:
                emits = [[e] for e in emits]  # num_returns=1 gives a bare ref
            applies = [
                self.shards[j].apply.remote(
                    kind_apply, damping, *[emits[i][j] for i in range(self.P)]
                )
                for j in range(self.P)
            ]
        residuals = ray.get(applies)
        return max(residuals) if kind_apply == "pagerank" else sum(residuals)

    def _run(
        self,
        kind_emit: str,
        kind_apply: str,
        init_kind: str,
        value_name: str,
        max_iterations: int,
        tolerance: float,
        damping: float = 0.85,
        hub_transform=None,
        checkpoint: CheckpointManager | None = None,
        resume: bool = False,
    ) -> IterativeResult:
        start_iter = 0
        resumed = False
        if checkpoint is not None and resume:
            latest = checkpoint.latest()
            if latest is not None:
                it, ids, vals, _ = latest
                assert np.array_equal(ids, self.node_ids), "checkpoint universe mismatch"
                owner = bucket_of(ids, self.P)
                ray.get(
                    [
                        self.shards[b].init_state.remote("values", vals[owner == b])
                        for b in range(self.P)
                    ]
                )
                start_iter, resumed = it + 1, True
        if not resumed:
            ray.get([s.init_state.remote(init_kind) for s in self.shards])

        metrics: list[dict] = []
        converged = False
        iteration = start_iter - 1
        for iteration in range(start_iter, max_iterations):
            hub_vals = self._hub_values()
            if hub_transform is not None and hub_vals.shape[0]:
                hub_vals = hub_transform(hub_vals)
            residual = self._exchange(kind_emit, kind_apply, hub_vals, damping)
            metrics.append({"iteration": iteration, "residual": residual})
            if checkpoint is not None:
                parts = ray.get(
                    [
                        s.checkpoint.remote(checkpoint.part_path(iteration, b), checkpoint.value_name)
                        for b, s in enumerate(self.shards)
                    ]
                )
                for p, b in zip(parts, range(self.P)):
                    p["file"] = f"iter_{iteration:05d}/part-{b:05d}.parquet"
                checkpoint.commit_manifest(iteration, parts, {"residual": residual})
            if residual <= tolerance:
                converged = True
                break

        t = pa.concat_tables(ray.get([s.get_state.remote() for s in self.shards]))
        ids = t.column("node_id").to_numpy(zero_copy_only=False)
        vals = t.column("val").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        return IterativeResult(
            node_ids=ids[order],
            values=vals[order],
            value_name=value_name,
            iterations=iteration + 1,
            converged=converged,
            metrics=metrics,
        )

    # ------------------------------------------------------------------
    def pagerank(
        self,
        damping: float = 0.85,
        max_iterations: int = 20,
        tolerance: float = 1e-7,
        checkpoint: CheckpointManager | None = None,
        resume: bool = False,
    ) -> IterativeResult:
        hub_ow = self.hub_out_w

        def to_scaled(hub_ranks: np.ndarray) -> np.ndarray:
            return np.divide(
                hub_ranks, hub_ow, out=np.zeros_like(hub_ranks), where=hub_ow > 0
            )

        return self._run(
            "pagerank_contrib",
            "pagerank",
            "ones",
            "rank",
            max_iterations,
            tolerance,
            damping,
            hub_transform=to_scaled,
            checkpoint=checkpoint,
            resume=resume,
        )

    def wcc(self, max_iterations: int = 100, checkpoint=None, resume=False) -> IterativeResult:
        res = self._run(
            "min_label", "min_label", "identity", "component", max_iterations, 0.0,
            checkpoint=checkpoint, resume=resume,
        )
        res.values = res.values.astype(np.int64)
        return res

    def label_propagation(self, max_iterations: int = 10, checkpoint=None, resume=False) -> IterativeResult:
        res = self._run(
            "label_votes", "label_argmax", "identity", "label", max_iterations, 0.0,
            checkpoint=checkpoint, resume=resume,
        )
        res.values = res.values.astype(np.int64)
        return res
