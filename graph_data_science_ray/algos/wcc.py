"""Weakly connected components — iterative min-label hash shuffle.

Reference semantics (Neo4j GDS WCC, public docs): components of the
undirected view; each node reports a componentId; the partition (not the
specific ids) is the contract. We canonicalize componentId = min node_id
in the component, which is stable and matches the networkx oracle after
the same canonicalization (FIXTURES.md §3).

Implementation: min-label propagation on the symmetrized edge table —
per iteration each node's label becomes min(own, labels of neighbors);
one ``groupby(node).min`` shuffle per iteration, with a within-batch
min-combiner before the shuffle. Converges in O(diameter) iterations;
web graphs have small effective diameter, and the per-iteration volume
shrinks as labels stabilize (only changed labels need re-emission — kept
simple here by re-emitting all, which keeps iterations idempotent and
checkpoints self-contained).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Min

from graph_data_science_ray.algos.common import unique_inverse, unique_node_ids
from graph_data_science_ray.algos.iterate import run_iterative
from graph_data_science_ray.algos.pagerank import IterativeResult
from graph_data_science_ray.checkpoint import CheckpointManager
from graph_data_science_ray.sources.edges import symmetrize


def _make_stage(state_ref):
    def fn(batch: pa.Table) -> pa.Table:
        ids, labels, frontier = ray.get(state_ref)
        src = batch.column("src_id").to_numpy(zero_copy_only=False)
        dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
        sp = np.minimum(np.searchsorted(ids, src), ids.shape[0] - 1)
        # frontier-limited: only a label that DECREASED last round can
        # decrease a neighbor (min-propagation is monotone)
        active = frontier[sp]
        src, dst, sp = src[active], dst[active], sp[active]
        if src.shape[0] == 0:
            return pa.schema([("node_id", pa.int64()), ("nbr_min", pa.int64())]).empty_table()
        src_label = labels[sp]
        # within-batch combiner: min src-label per dst before the shuffle
        u_dst, inv = unique_inverse(dst)
        best = np.full(u_dst.shape[0], np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(best, inv, src_label)
        return pa.table(
            {"node_id": pa.array(u_dst, pa.int64()), "nbr_min": pa.array(best, pa.int64())}
        )

    return fn


def _apply(state: np.ndarray, gathered: pa.Table, node_ids: np.ndarray):
    new = state.copy()
    if gathered.num_rows:
        ids = gathered.column("node_id").to_numpy(zero_copy_only=False)
        mins = gathered.column("nbr_min").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(node_ids, ids)
        np.minimum.at(new, pos, mins)
    changed = int((new != state).sum())
    return new, float(changed)


def _driver_reduce(partials: pa.Table) -> pa.Table:
    from graph_data_science_ray.algos.common import merge_min

    if partials.num_rows == 0:
        return partials
    ids, mins = merge_min(partials, "node_id", "nbr_min")
    return pa.table({"node_id": pa.array(ids, pa.int64()), "nbr_min": pa.array(mins, pa.int64())})


def wcc(
    edges: Dataset,
    max_iterations: int = 100,
    checkpoint: CheckpointManager | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
    pre_symmetrized: bool = False,
    reduce: str = "driver",
    seeds: dict[int, int] | None = None,
) -> IterativeResult:
    """Component id per node (= min node_id in its component).
    ``seeds``: GDS seedProperty equivalent — initial label per node id
    (unlisted nodes start from their own id).

    Symmetrization skips deduplication: the min aggregate is idempotent
    under parallel edges, and the dedup shuffle would cost more than the
    duplicate emissions the within-batch combiner absorbs."""
    und = edges if pre_symmetrized else symmetrize(
        edges, dedup=False, num_partitions=num_partitions
    )
    und = und.materialize()
    node_arr = unique_node_ids(und)
    init = node_arr.copy()
    if seeds:
        sk = np.asarray(sorted(seeds), dtype=np.int64)
        sv = np.asarray([seeds[k] for k in sk.tolist()], dtype=np.int64)
        pos = np.searchsorted(node_arr, sk)
        ok = (pos < node_arr.shape[0]) & (node_arr[np.minimum(pos, node_arr.shape[0] - 1)] == sk)
        init[pos[ok]] = sv[ok]
    res = run_iterative(
        edges=und,
        node_ids=node_arr,
        init=init,
        make_stage=_make_stage,
        gather_key="node_id",
        gather_aggs=lambda: [Min("nbr_min", alias_name="nbr_min")],
        apply_fn=_apply,
        max_iterations=max_iterations,
        tolerance=0.0,  # converged when zero labels changed
        value_name="component",
        checkpoint=checkpoint,
        resume=resume,
        num_partitions=num_partitions,
        materialize_edges=False,
        reduce=reduce,
        driver_reduce=_driver_reduce,
        pass_frontier=True,
    )
    return res
