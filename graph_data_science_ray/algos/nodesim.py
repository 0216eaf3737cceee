"""Node Similarity — neighborhood Jaccard with top-k, per Neo4j GDS
``gds.nodeSimilarity`` (public docs): compare nodes by their OUT-neighbor
sets; J(a,b) = |N(a) ∩ N(b)| / |N(a) ∪ N(b)|; only node pairs that share
at least one neighbor are candidates; emit the top-k most similar
neighbors per node (ties broken by the other node's id — deterministic,
unlike the reference's unordered ties).

Dataflow: the common-neighbor pair generation is the heavy part — a
self-join of the edge table on the shared neighbor, pre-aggregated per
batch, shuffled once on the pair key. Hub destinations blow this up
quadratically (Σ indeg²); ``degree_cutoff`` drops neighbors above the
cutoff first (the reference's mitigation). Degrees ride along broadcast;
the per-source top-k runs vectorized on the collected pair-count table
(pair-count-sized; push into a keyed aggregate when that outgrows the
driver).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset


from graph_data_science_ray.algos.common import collect_arrow, merge_sum
from graph_data_science_ray.context import configure_ray_data, shuffle_partitions_for


def node_similarity(
    edges: Dataset,
    top_k: int = 10,
    similarity_cutoff: float = 1e-42,
    degree_cutoff: int | None = None,
    num_partitions: int | None = None,
    source_filter: "np.ndarray | list | None" = None,
    target_filter: "np.ndarray | list | None" = None,
    metric: str = "jaccard",
    bottom_k: bool = False,
    weighted: bool = False,
    top_n: int = 0,
) -> pa.Table:
    """→ (node1, node2, similarity) — top_k per node1, sorted
    (node1, -similarity, node2). Self-pairs excluded.

    ``source_filter`` / ``target_filter``: the reference's
    ``gds.nodeSimilarity.filtered`` variant — restrict node1 to the
    source set and node2 to the target set BEFORE top-k selection, so
    each source gets its k best among allowed targets.

    ``metric``: the reference's ``similarityMetric`` — JACCARD
    |A∩B|/|A∪B| (default), OVERLAP |A∩B|/min(|A|,|B|), COSINE
    |A∩B|/sqrt(|A||B|) on unweighted neighbor sets.

    ``bottom_k``: the reference's ``bottomK`` — keep the k LEAST similar
    per node1 instead (still only pairs sharing ≥1 neighbor; ties broken
    by node2 ascending, matching the deterministic top-k contract).

    ``weighted``: the reference's ``relationshipWeightProperty`` —
    treat the neighborhood as a weight vector (``weight`` column
    required): Jaccard Σmin/Σmax, overlap Σmin/min(Σw_a, Σw_b), cosine
    Σ(w_a·w_b)/(‖w_a‖‖w_b‖), all over shared neighbors in the
    numerator.

    ``top_n``: the reference's ``topN``/``bottomN`` — a GLOBAL limit on
    the number of result pairs, applied after per-node top-k (0 = no
    limit; with ``bottom_k`` the globally least-similar survive)."""
    configure_ray_data()
    metric = metric.lower()
    if metric not in ("jaccard", "overlap", "cosine"):
        raise ValueError(f"unknown similarityMetric: {metric}")
    num_partitions = num_partitions or shuffle_partitions_for()
    edges = edges.materialize()

    # out-degrees (per-batch partials + driver merge); weighted mode
    # needs Σw (jaccard/overlap) or Σw² (cosine norm) per node instead
    def deg_partials(t: pa.Table) -> pa.Table:
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        if weighted:
            w = t.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
            if metric == "cosine":
                w = w * w
            u, inv = np.unique(src, return_inverse=True)
            c = np.bincount(inv, weights=w, minlength=u.shape[0])
            return pa.table({"node_id": pa.array(u, pa.int64()), "c": pa.array(c, pa.float64())})
        u, c = np.unique(src, return_counts=True)
        return pa.table({"node_id": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())})

    dt = collect_arrow(edges.map_batches(deg_partials, batch_format="pyarrow", zero_copy_batch=True))
    if dt.num_rows == 0:
        return pa.table(
            {"node1": pa.array([], pa.int64()), "node2": pa.array([], pa.int64()),
             "similarity": pa.array([], pa.float64())}
        )
    deg_ids, deg_c = merge_sum(dt, "node_id", "c")
    deg_c = deg_c.astype(np.float64) if weighted else deg_c.astype(np.int64)

    # optionally drop hub DESTINATIONS (in-degree cutoff) before pairing
    if degree_cutoff is not None:
        def in_partials(t: pa.Table) -> pa.Table:
            u, c = np.unique(t.column("dst_id").to_numpy(zero_copy_only=False), return_counts=True)
            return pa.table({"node_id": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())})

        it = collect_arrow(
            edges.map_batches(in_partials, batch_format="pyarrow", zero_copy_batch=True)
        )
        in_ids, in_c = merge_sum(it, "node_id", "c")
        hubs = in_ids[in_c.astype(np.int64) > degree_cutoff]
        hub_ref = ray.put(hubs)

        def drop_hubs(t: pa.Table) -> pa.Table:
            h = ray.get(hub_ref)
            dst = t.column("dst_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(~np.isin(dst, h)))

        edges = edges.map_batches(drop_hubs, batch_format="pyarrow", zero_copy_batch=True).materialize()
        if edges.count() == 0:
            return pa.table(
                {"node1": pa.array([], pa.int64()), "node2": pa.array([], pa.int64()),
                 "similarity": pa.array([], pa.float64())}
            )

    # common-neighbor pairs: group edges by dst, pair the sources.
    # groupby(dst).map_groups gives dst-pure groups; within a group the
    # pair generation is vectorized (meshgrid upper triangle).
    def pairs(g: pa.Table) -> pa.Table:
        src = g.column("src_id").to_numpy(zero_copy_only=False)
        if weighted:
            w = g.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
            order = np.argsort(src)
            srcs, w = src[order], w[order]  # src unique per dst (deduped)
        else:
            srcs = np.unique(src)
        m = srcs.shape[0]
        if m < 2:
            return pa.table(
                {"node1": pa.array([], pa.int64()), "node2": pa.array([], pa.int64()),
                 "c": pa.array([], pa.float64() if weighted else pa.int64())}
            )
        ii, jj = np.triu_indices(m, k=1)
        if weighted:
            # per-pair contribution of THIS shared neighbor:
            # min(w_i, w_j) for jaccard/overlap, w_i*w_j for cosine
            c = w[ii] * w[jj] if metric == "cosine" else np.minimum(w[ii], w[jj])
            c = pa.array(c, pa.float64())
        else:
            c = pa.array(np.ones(ii.shape[0], dtype=np.int64))
        return pa.table(
            {
                "node1": pa.array(srcs[ii], pa.int64()),
                "node2": pa.array(srcs[jj], pa.int64()),
                "c": c,
            }
        )

    # distributed pair generation; the final (node1,node2) reduction runs
    # on the driver — pairs are ~all-unique (no combining to exploit) and
    # Ray's hash aggregate over ~1M single-row groups costs 15x more than
    # one vectorized merge of the collected partials (measured); the top-k
    # below needs the table collected anyway
    pair_partials = edges.groupby("dst_id", num_partitions=num_partitions).map_groups(
        pairs, batch_format="pyarrow"
    )
    pp_t = collect_arrow(pair_partials)
    if pp_t.num_rows:
        from graph_data_science_ray.algos.common import merge_sum2

        m1, m2, mc = merge_sum2(pp_t, ("node1", "node2"), "c")
        pc_t = pa.table(
            {
                "node1": pa.array(m1, pa.int64()),
                "node2": pa.array(m2, pa.int64()),
                "common": pa.array(mc.astype(np.float64), pa.float64())
                if weighted
                else pa.array(mc.astype(np.int64), pa.int64()),
            }
        )
    else:
        pc_t = pa.table({})
    if pc_t.num_rows == 0:
        return pa.table(
            {"node1": pa.array([], pa.int64()), "node2": pa.array([], pa.int64()),
             "similarity": pa.array([], pa.float64())}
        )

    n1 = pc_t.column("node1").to_numpy(zero_copy_only=False)
    n2 = pc_t.column("node2").to_numpy(zero_copy_only=False)
    common = pc_t.column("common").to_numpy(zero_copy_only=False).astype(np.float64)
    d1 = deg_c[np.searchsorted(deg_ids, n1)].astype(np.float64)
    d2 = deg_c[np.searchsorted(deg_ids, n2)].astype(np.float64)
    if metric == "jaccard":
        sim = common / (d1 + d2 - common)
    elif metric == "overlap":
        sim = common / np.minimum(d1, d2)
    else:  # cosine on unweighted sets
        sim = common / np.sqrt(d1 * d2)

    # symmetric: each unordered pair yields rows for both directions
    a = np.concatenate([n1, n2])
    b = np.concatenate([n2, n1])
    s = np.concatenate([sim, sim])
    keep = s >= similarity_cutoff
    if source_filter is not None:
        keep &= np.isin(a, np.asarray(source_filter, dtype=np.int64))
    if target_filter is not None:
        keep &= np.isin(b, np.asarray(target_filter, dtype=np.int64))
    a, b, s = a[keep], b[keep], s[keep]

    # vectorized per-node top-k: sort (node1, -sim, node2), take first k
    order = np.lexsort((b, s if bottom_k else -s, a))
    a, b, s = a[order], b[order], s[order]
    _, starts = np.unique(a, return_index=True)
    ranks = np.arange(a.shape[0]) - np.repeat(starts, np.diff(np.append(starts, a.shape[0])))
    keep = ranks < top_k
    a, b, s = a[keep], b[keep], s[keep]
    if top_n and a.shape[0] > top_n:
        # GDS topN / bottomN: global limit applied AFTER per-node top-k
        # (bottom_k selects per-node least-similar, so the global pass
        # keeps the n least-similar of those); deterministic tie-break
        # (node1, node2) ascending
        g = np.lexsort((b, a, s if bottom_k else -s))[:top_n]
        g.sort()  # preserve (node1, -sim, node2) output ordering
        a, b, s = a[g], b[g], s[g]
    return pa.table(
        {
            "node1": pa.array(a, pa.int64()),
            "node2": pa.array(b, pa.int64()),
            "similarity": pa.array(s, pa.float64()),
        }
    )
