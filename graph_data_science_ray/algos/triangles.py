"""Node-wise triangle counting — degree-ordered wedge join, fully dataflow.

Reference semantics (Neo4j GDS Triangle Count, public docs): undirected
simple graph, self-loops excluded; per-node triangle count plus global
total = Σ/3; optional ``max_degree`` cutoff — nodes above it are excluded
from the computation entirely and report -1.

Algorithm (the classic distributed formulation; cf. Cohen, "Graph twiddling
in a MapReduce world" and the GDS adjacency-intersection counter):

1. canonicalize: undirected simple edges as (a < b), self-loops dropped;
2. orient every edge from lower to higher DEGREE RANK (degree, then id) —
   bounds per-node out-degree to O(sqrt(m)), so the wedge count is
   O(m^{3/2}) even on power-law graphs (the hub-skew mitigation);
3. wedges = oriented ⋈ oriented on the shared lower-rank endpoint u,
   keeping pairs (v, w) with rank(v) < rank(w);
4. triangles = wedges ⋈ oriented edges on (v, w) — every match is one
   triangle, counted exactly once;
5. per-node counts: explode each triangle to its 3 corners, groupby-count.

Both joins are Ray Data hash joins (distributed hash shuffle); rank
positions ride along as columns so step 3's filter is a vectorized
comparison — no broadcast state in the join path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count

from graph_data_science_ray.algos.common import collect_arrow, unique_node_ids
from graph_data_science_ray.algos.pagerank import IterativeResult
from graph_data_science_ray.context import configure_ray_data, shuffle_partitions_for
from graph_data_science_ray.sources.edges import drop_self_loops, symmetrize


def _canonical_undirected(edges: Dataset, num_partitions: int | None) -> Dataset:
    """Undirected simple edge set with src_id < dst_id, exactly once."""
    und = symmetrize(edges, num_partitions=num_partitions)  # dedups both directions
    und = drop_self_loops(und)
    return und.map_batches(
        lambda t: t.filter(pc.less(t.column("src_id"), t.column("dst_id"))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def triangle_count(
    edges: Dataset,
    max_degree: int | None = None,
    num_partitions: int | None = None,
    pre_canonical: bool = False,
) -> IterativeResult:
    """Per-node triangle counts (column ``triangles``; -1 for nodes
    excluded by ``max_degree``). ``.metrics[0]['global']`` = Σ/3."""
    configure_ray_data()
    canon = edges if pre_canonical else _canonical_undirected(edges, num_partitions)
    canon = canon.materialize()
    node_arr = unique_node_ids(canon)
    n = node_arr.shape[0]
    num_partitions = num_partitions or shuffle_partitions_for(n)

    # degrees on the canonical set (per-batch partial counts → small groupby)
    def deg_partials(t: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [
                t.column("src_id").to_numpy(zero_copy_only=False),
                t.column("dst_id").to_numpy(zero_copy_only=False),
            ]
        )
        u, c = np.unique(ids, return_counts=True)
        return pa.table({"node_id": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())})

    from ray.data.aggregate import Sum

    deg_t = collect_arrow(
        canon.map_batches(deg_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node_id", num_partitions=num_partitions)
        .aggregate(Sum("c", alias_name="deg"))
    )
    deg = np.zeros(n, dtype=np.int64)
    if deg_t.num_rows:
        pos = np.searchsorted(node_arr, deg_t.column("node_id").to_numpy(zero_copy_only=False))
        deg[pos] = deg_t.column("deg").to_numpy(zero_copy_only=False)

    excluded = np.zeros(n, dtype=bool)
    if max_degree is not None:
        excluded = deg > max_degree

    # rank position: total order by (degree, node_id); rank[i] for node_arr[i]
    order = np.lexsort((node_arr, deg))
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n, dtype=np.int64)

    import ray

    rank_ref = ray.put((node_arr, rank, excluded))

    def orient(t: pa.Table) -> pa.Table:
        ids, rk, excl = ray.get(rank_ref)
        a = t.column("src_id").to_numpy(zero_copy_only=False)
        b = t.column("dst_id").to_numpy(zero_copy_only=False)
        pa_ = np.searchsorted(ids, a)
        pb_ = np.searchsorted(ids, b)
        keep = ~(excl[pa_] | excl[pb_])
        a, b, ra, rb = a[keep], b[keep], rk[pa_[keep]], rk[pb_[keep]]
        lo = ra < rb
        u = np.where(lo, a, b)
        v = np.where(lo, b, a)
        vrank = np.where(lo, rb, ra)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "vrank": pa.array(vrank, pa.int64()),
            }
        )

    oriented = canon.map_batches(orient, batch_format="pyarrow", zero_copy_batch=True).materialize()

    if oriented.count() == 0:
        counts = np.zeros(n, dtype=np.int64)
        counts[excluded] = -1
        return IterativeResult(
            node_ids=node_arr,
            values=counts,
            value_name="triangles",
            iterations=1,
            converged=True,
            metrics=[{"global": 0}],
        )

    # wedges: self-join on u; keep rank(v) < rank(w) so each unordered
    # pair appears once (engine hash_join — see functions/joins.py for
    # why not Dataset.join)
    from graph_data_science_ray.functions.joins import hash_join

    right = oriented.rename_columns({"v": "w", "vrank": "wrank"})

    def keep_ordered(t: pa.Table) -> pa.Table:
        m = pc.less(t.column("vrank"), t.column("wrank"))
        kept = t.filter(m)
        return pa.table(
            {"u": kept.column("u"), "v": kept.column("v"), "w": kept.column("w")}
        )

    wedges = hash_join(oriented, right, on=["u"], num_partitions=num_partitions).map_batches(
        keep_ordered, batch_format="pyarrow", zero_copy_batch=True
    )

    # close the wedge: (v, w) must itself be an oriented edge
    closing = oriented.map_batches(
        lambda t: pa.table({"v": t.column("u"), "w": t.column("v")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    tris = hash_join(wedges, closing, on=["v", "w"], num_partitions=num_partitions)

    # per-node counts: each triangle contributes to u, v and w
    def corners(t: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [
                t.column("u").to_numpy(zero_copy_only=False),
                t.column("v").to_numpy(zero_copy_only=False),
                t.column("w").to_numpy(zero_copy_only=False),
            ]
        )
        uu, cc = np.unique(ids, return_counts=True)
        return pa.table({"node_id": pa.array(uu, pa.int64()), "c": pa.array(cc, pa.int64())})

    counts_t = collect_arrow(
        tris.map_batches(corners, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node_id", num_partitions=num_partitions)
        .aggregate(Sum("c", alias_name="triangles"))
    )
    counts = np.zeros(n, dtype=np.int64)
    if counts_t.num_rows:
        pos = np.searchsorted(node_arr, counts_t.column("node_id").to_numpy(zero_copy_only=False))
        counts[pos] = counts_t.column("triangles").to_numpy(zero_copy_only=False)
    counts[excluded] = -1
    global_count = int(counts[~excluded].sum() // 3)

    return IterativeResult(
        node_ids=node_arr,
        values=counts,
        value_name="triangles",
        iterations=1,
        converged=True,
        metrics=[{"global": global_count}],
    )
