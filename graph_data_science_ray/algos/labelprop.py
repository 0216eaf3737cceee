"""Label propagation — synchronous, weighted votes, min-label tie-break.

Reference semantics (Neo4j GDS Label Propagation, public docs): nodes
start with their own id (or a seed property); each iteration a node
adopts the neighbor label with the maximum total incident weight;
``maxIterations`` default 10; converges when no label changes. The
reference's parallel tie behavior is order-dependent; we fix ties to the
MIN label so the result is deterministic — partition-level equality with
the reference is the test contract (SURVEY.md §7 hard part (c)), and the
in-repo oracle (oracles.lpa_oracle) implements the same deterministic
variant.

Per iteration: scatter (nbr_node, my_label, w) over the symmetrized
edges with a within-batch (node,label) sum-combiner, gather
``groupby([node,label]).sum(w)`` (the one shuffle), then a vectorized
arg-max with min-tie-break.  The argmax runs on the collected vote
table — sized O(nodes × distinct neighbor labels), which collapses
rapidly after the first iterations; at 10^12-edge scale the same argmax
can run as a second keyed aggregate (AggregateFnV2) without collecting.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from graph_data_science_ray.algos.common import group_pairs, unique_node_ids
from graph_data_science_ray.algos.iterate import run_iterative
from graph_data_science_ray.algos.pagerank import IterativeResult
from graph_data_science_ray.checkpoint import CheckpointManager
from graph_data_science_ray.sources.edges import drop_self_loops, symmetrize


def _make_stage(weighted: bool, node_w_ref=None):
    def make(state_ref):
        def fn(batch: pa.Table) -> pa.Table:
            ids, labels = ray.get(state_ref)
            src = batch.column("src_id").to_numpy(zero_copy_only=False)
            dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
            w = (
                batch.column("weight").to_numpy(zero_copy_only=False)
                if weighted
                else np.ones(src.shape[0], dtype=np.float64)
            )
            sp = np.minimum(np.searchsorted(ids, src), ids.shape[0] - 1)
            if node_w_ref is not None:
                # GDS nodeWeightProperty: a vote counts w_rel x w_node(src)
                w = w * ray.get(node_w_ref)[sp]
            src_label = labels[sp]
            # within-batch combiner: sum weight per (dst, label) —
            # lexsort grouping (group_pairs), same lexicographic output
            # order as np.unique(axis=0) but radix-sorted
            order, u_dst, u_lab, gid = group_pairs(dst, src_label)
            votes = np.bincount(gid, weights=w[order], minlength=u_dst.shape[0])
            return pa.table(
                {
                    "node_id": pa.array(u_dst, pa.int64()),
                    "label": pa.array(u_lab, pa.int64()),
                    "w": pa.array(votes, pa.float64()),
                }
            )

        return fn

    return make


def _apply(state: np.ndarray, gathered: pa.Table, node_ids: np.ndarray):
    new = state.copy()
    if gathered.num_rows:
        nodes = gathered.column("node_id").to_numpy(zero_copy_only=False)
        labels = gathered.column("label").to_numpy(zero_copy_only=False)
        w = gathered.column("w").to_numpy(zero_copy_only=False)
        # vectorized argmax with min-label tie-break: sort by (node, -w, label)
        order = np.lexsort((labels, -w, nodes))
        nodes_s, labels_s = nodes[order], labels[order]
        _, first = np.unique(nodes_s, return_index=True)
        pos = np.searchsorted(node_ids, nodes_s[first])
        new[pos] = labels_s[first]
    changed = int((new != state).sum())
    return new, float(changed)


def _driver_reduce(partials: pa.Table) -> pa.Table:
    from graph_data_science_ray.algos.common import merge_sum2

    if partials.num_rows == 0:
        return partials
    nodes, labels, w = merge_sum2(partials, ("node_id", "label"), "w")
    return pa.table(
        {
            "node_id": pa.array(nodes, pa.int64()),
            "label": pa.array(labels, pa.int64()),
            "w": pa.array(w, pa.float64()),
        }
    )


def label_propagation(
    edges: Dataset,
    max_iterations: int = 10,
    weighted: bool = False,
    checkpoint: CheckpointManager | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
    pre_symmetrized: bool = False,
    reduce: str = "driver",
    seeds: dict[int, int] | None = None,
    node_weights: dict[int, float] | None = None,
    consecutive_ids: bool = False,
    min_community_size: int | None = None,
) -> IterativeResult:
    """Community label per node (deterministic min-tie-break variant).
    ``seeds``: GDS seedProperty — initial label per node id (unlisted
    nodes start from their own id). ``node_weights``: GDS
    nodeWeightProperty — a node's vote counts relationship-weight x its
    node weight (unlisted nodes weigh 1.0). ``consecutive_ids`` /
    ``min_community_size``: GDS output options (renumber 0..k-1 /
    drop nodes in communities below the size floor)."""
    und = edges if pre_symmetrized else symmetrize(
        edges, dedup=not weighted, num_partitions=num_partitions
    )
    if weighted and not pre_symmetrized:
        from graph_data_science_ray.sources.edges import dedup_edges

        und = dedup_edges(und, "sum", num_partitions=num_partitions)
    und = drop_self_loops(und).materialize()
    node_arr = unique_node_ids(und)
    init = node_arr.copy()
    if seeds:
        sk = np.asarray(sorted(seeds), dtype=np.int64)
        sv = np.asarray([seeds[k] for k in sk.tolist()], dtype=np.int64)
        pos = np.searchsorted(node_arr, sk)
        ok = (pos < node_arr.shape[0]) & (node_arr[np.minimum(pos, node_arr.shape[0] - 1)] == sk)
        init[pos[ok]] = sv[ok]
    node_w_ref = None
    if node_weights:
        nw = np.ones(node_arr.shape[0], dtype=np.float64)
        wk = np.asarray(sorted(node_weights), dtype=np.int64)
        wv = np.asarray([node_weights[k] for k in wk.tolist()], dtype=np.float64)
        posw = np.searchsorted(node_arr, wk)
        okw = (posw < node_arr.shape[0]) & (node_arr[np.minimum(posw, node_arr.shape[0] - 1)] == wk)
        nw[posw[okw]] = wv[okw]
        node_w_ref = ray.put(nw)
    res = run_iterative(
        edges=und,
        node_ids=node_arr,
        init=init,
        make_stage=_make_stage(weighted, node_w_ref),
        gather_key=["node_id", "label"],
        gather_aggs=lambda: [Sum("w", alias_name="w")],
        apply_fn=_apply,
        max_iterations=max_iterations,
        tolerance=0.0,
        value_name="label",
        checkpoint=checkpoint,
        resume=resume,
        num_partitions=num_partitions,
        materialize_edges=False,
        reduce=reduce,
        driver_reduce=_driver_reduce,
    )
    if consecutive_ids or min_community_size is not None:
        from graph_data_science_ray.algos.common import community_postprocess

        res.node_ids, res.values, _ = community_postprocess(
            res.node_ids, res.values, consecutive_ids, min_community_size
        )
    return res
