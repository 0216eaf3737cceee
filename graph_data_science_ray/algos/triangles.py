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
    """Undirected simple edge set with src_id < dst_id, exactly once.

    One vectorized (min,max) projection + ONE dedup shuffle — NOT
    symmetrize-then-filter, which unions 2× the rows and shuffles twice
    for the same result."""
    import numpy as np

    def canon(t: pa.Table) -> pa.Table:
        a = t.column("src_id").to_numpy(zero_copy_only=False)
        b = t.column("dst_id").to_numpy(zero_copy_only=False)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table(
            {
                "src_id": pa.array(np.minimum(a, b), pa.int64()),
                "dst_id": pa.array(np.maximum(a, b), pa.int64()),
            }
        )

    projected = edges.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
    from graph_data_science_ray.sources.edges import dedup_edges

    return dedup_edges(projected, "single", num_partitions=num_partitions)


def _triangles_broadcast(
    canon: Dataset, node_arr: np.ndarray, deg: np.ndarray, excluded: np.ndarray,
) -> np.ndarray:
    """Broadcast-CSR path: the whole canonical edge set is ray.put once
    (rank-packed, sorted); workers enumerate each node's wedges fully
    vectorized (triangular-number inversion) and close them with a single
    packed binary search — NO wedge ever shuffles. Right whenever the
    edge set fits worker memory (the small-side-broadcast idiom); the
    join path below is the beyond-memory fallback."""
    import ray
    import ray.data

    from graph_data_science_ray.algos.common import collect_arrow

    n = node_arr.shape[0]
    t = collect_arrow(canon)
    a = t.column("src_id").to_numpy(zero_copy_only=False)
    b = t.column("dst_id").to_numpy(zero_copy_only=False)
    pa_ = np.searchsorted(node_arr, a)
    pb_ = np.searchsorted(node_arr, b)
    keep = ~(excluded[pa_] | excluded[pb_])
    pa_, pb_ = pa_[keep], pb_[keep]
    # degree rank order (degree, then id) — dense ranks 0..n-1
    order = np.lexsort((node_arr, deg))
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n, dtype=np.int64)
    ra, rb = rank[pa_], rank[pb_]
    lo = ra < rb
    ru = np.where(lo, ra, rb)
    rv = np.where(lo, rb, ra)
    # oriented CSR in rank space, adjacency sorted ascending per list
    sort_idx = np.lexsort((rv, ru))
    ru_s, rv_s = ru[sort_idx], rv[sort_idx]
    indptr = np.searchsorted(ru_s, np.arange(n + 1, dtype=np.int64))
    # packed sorted edge keys for membership (ranks < 2^31 ⇒ no overflow)
    assert n < (1 << 31), "broadcast path requires dense rank < 2^31"
    pk = ru_s * n + rv_s  # sorted because (ru_s, rv_s) lexsorted
    graph_ref = ray.put((indptr, rv_s, pk, n))

    def count_batch(batch) -> "pa.Table":
        indptr_, adj, pk_, n_ = ray.get(graph_ref)
        ranks = batch.column("id").to_numpy(zero_copy_only=False)
        lens = indptr_[ranks + 1] - indptr_[ranks]
        K = lens * (lens - 1) // 2
        total = int(K.sum())
        if total == 0:
            return pa.table({"rank": pa.array([], pa.int64()), "c": pa.array([], pa.int64())})
        node_rep = np.repeat(ranks, K)
        start_rep = np.repeat(indptr_[ranks], K)
        offs = np.cumsum(K) - K
        w = np.arange(total, dtype=np.int64) - np.repeat(offs, K)
        # invert pair index: w = j*(j-1)/2 + i with i < j
        j = ((1.0 + np.sqrt(1.0 + 8.0 * w)) / 2.0).astype(np.int64)
        j -= (j * (j - 1) // 2 > w).astype(np.int64)  # float fix-up
        i = w - j * (j - 1) // 2
        v = adj[start_rep + i]
        wv = adj[start_rep + j]
        hit_pos = np.searchsorted(pk_, v * n_ + wv)
        hit_pos = np.minimum(hit_pos, pk_.shape[0] - 1)
        hits = pk_[hit_pos] == (v * n_ + wv)
        corners = np.concatenate([node_rep[hits], v[hits], wv[hits]])
        u_, c_ = np.unique(corners, return_counts=True)
        return pa.table({"rank": pa.array(u_, pa.int64()), "c": pa.array(c_, pa.int64())})

    # ray.data.range(n) yields ONE tiny block → one task → one core, and
    # contiguous rank ranges skew (high ranks = high degree). Interleave
    # ranks across CPU-proportional blocks so every task spans the
    # degree spectrum and wedge work balances.
    try:
        cpus = int(ray.cluster_resources().get("CPU", 0)) or 8
    except Exception:
        cpus = 8
    tb = min(max(cpus * 4, 16), max(n, 1))
    perm = np.argsort(np.arange(n, dtype=np.int64) % tb, kind="stable")
    ids_ds = ray.data.from_arrow(pa.table({"id": pa.array(perm, pa.int64())})).repartition(tb)
    partials = collect_arrow(
        ids_ds.map_batches(count_batch, batch_format="pyarrow", batch_size=None)
    )
    counts_r = np.zeros(n, dtype=np.int64)
    if partials.num_rows:
        from graph_data_science_ray.algos.common import merge_sum

        rr, cc = merge_sum(partials, "rank", "c")
        counts_r[rr] = cc.astype(np.int64)
    counts = np.zeros(n, dtype=np.int64)
    counts[order] = counts_r  # rank space → node space
    return counts


def _degrees(canon: Dataset, node_arr: np.ndarray) -> np.ndarray:
    """Undirected degrees on the canonical edge set — per-batch partial
    counts + driver merge, no shuffle (node-sized result)."""
    from graph_data_science_ray.algos.common import merge_sum

    def deg_partials(t: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [
                t.column("src_id").to_numpy(zero_copy_only=False),
                t.column("dst_id").to_numpy(zero_copy_only=False),
            ]
        )
        u, c = np.unique(ids, return_counts=True)
        return pa.table({"node_id": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())})

    deg_t = collect_arrow(
        canon.map_batches(deg_partials, batch_format="pyarrow", zero_copy_batch=True)
    )
    deg = np.zeros(node_arr.shape[0], dtype=np.int64)
    if deg_t.num_rows:
        ids_, c_ = merge_sum(deg_t, "node_id", "c")
        deg[np.searchsorted(node_arr, ids_)] = c_.astype(np.int64)
    return deg


def _join_triangles(
    canon: Dataset,
    node_arr: np.ndarray,
    deg: np.ndarray,
    excluded: np.ndarray,
    num_partitions: int,
) -> Dataset | None:
    """Join-path triangle enumeration: Dataset of (u, v, w) — one row per
    distinct triangle, corners ordered by degree rank. None if the
    oriented edge set is empty."""
    n = node_arr.shape[0]
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
        return None

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
    return hash_join(wedges, closing, on=["v", "w"], num_partitions=num_partitions)


def triangle_stream(
    edges: Dataset,
    max_degree: int | None = None,
    num_partitions: int | None = None,
    pre_canonical: bool = False,
) -> Dataset:
    """``gds.alpha.triangles`` parity (public docs: streams nodeA/nodeB/
    nodeC per triangle): Dataset of (node_a, node_b, node_c) with
    node_a < node_b < node_c by id, one row per distinct triangle.
    Always the join path — the output is edge-sized, so there is no
    small-result shortcut to exploit."""
    configure_ray_data()
    canon = edges if pre_canonical else _canonical_undirected(edges, num_partitions)
    canon = canon.materialize()
    node_arr = unique_node_ids(canon)
    num_partitions = num_partitions or shuffle_partitions_for(node_arr.shape[0])
    deg = _degrees(canon, node_arr)
    excluded = deg > max_degree if max_degree is not None else np.zeros(node_arr.shape[0], bool)
    tris = _join_triangles(canon, node_arr, deg, excluded, num_partitions)
    empty = pa.table(
        {
            "node_a": pa.array([], pa.int64()),
            "node_b": pa.array([], pa.int64()),
            "node_c": pa.array([], pa.int64()),
        }
    )
    if tris is None:
        import ray.data

        return ray.data.from_arrow(empty)

    def ids_sorted(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        m = np.stack(
            [
                t.column("u").to_numpy(zero_copy_only=False),
                t.column("v").to_numpy(zero_copy_only=False),
                t.column("w").to_numpy(zero_copy_only=False),
            ]
        )
        m.sort(axis=0)  # rank order → id order per triangle
        return pa.table(
            {
                "node_a": pa.array(m[0], pa.int64()),
                "node_b": pa.array(m[1], pa.int64()),
                "node_c": pa.array(m[2], pa.int64()),
            }
        )

    return tris.map_batches(ids_sorted, batch_format="pyarrow", zero_copy_batch=True)


def triangle_count(
    edges: Dataset,
    max_degree: int | None = None,
    num_partitions: int | None = None,
    pre_canonical: bool = False,
    implementation: str = "auto",  # auto | broadcast | join
    broadcast_threshold: int = 20_000_000,
) -> IterativeResult:
    """Per-node triangle counts (column ``triangles``; -1 for nodes
    excluded by ``max_degree``). ``.metrics[0]['global']`` = Σ/3."""
    configure_ray_data()
    canon = edges if pre_canonical else _canonical_undirected(edges, num_partitions)
    canon = canon.materialize()
    node_arr = unique_node_ids(canon)
    n = node_arr.shape[0]
    num_partitions = num_partitions or shuffle_partitions_for(n)

    deg = _degrees(canon, node_arr)

    excluded = np.zeros(n, dtype=bool)
    if max_degree is not None:
        excluded = deg > max_degree

    if implementation == "auto":
        n_canon_edges = canon.count()
        implementation = "broadcast" if n_canon_edges <= broadcast_threshold else "join"
    if implementation == "broadcast":
        counts = _triangles_broadcast(canon, node_arr, deg, excluded)
        counts[excluded] = -1
        return IterativeResult(
            node_ids=node_arr,
            values=counts,
            value_name="triangles",
            iterations=1,
            converged=True,
            metrics=[{"global": int(counts[~excluded].sum() // 3)}],
        )

    tris = _join_triangles(canon, node_arr, deg, excluded, num_partitions)
    if tris is None:
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
    )
    counts = np.zeros(n, dtype=np.int64)
    if counts_t.num_rows:
        from graph_data_science_ray.algos.common import merge_sum

        ids_, c_ = merge_sum(counts_t, "node_id", "c")
        counts[np.searchsorted(node_arr, ids_)] = c_.astype(np.int64)
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
