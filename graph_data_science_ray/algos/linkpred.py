"""Topological link-prediction pair scores.

Reference semantics (``gds.alpha.linkprediction.*`` scalar functions
[GDS-pub: algo/.../linkprediction/ + functions/]): for a node pair
(a, b) over the undirected neighbor sets N(·),

- ``commonNeighbors``        = |N(a) ∩ N(b)|
- ``adamicAdar``             = Σ_{u ∈ N(a)∩N(b)} 1 / ln(deg(u))
- ``resourceAllocation``     = Σ_{u ∈ N(a)∩N(b)} 1 / deg(u)
- ``preferentialAttachment`` = deg(a) · deg(b)
- ``totalNeighbors``         = |N(a) ∪ N(b)|
- ``sameCommunity``          = 1 iff the community property matches

The reference evaluates these one pair at a time from Cypher; the
engine's batch form scores EVERY candidate pair with ≥1 common
neighbor in one distributed pass (pairs with no common neighbor score
0 / deg-product only and are not interesting candidates).

Dataflow (same shape as algos/nodesim.py): symmetrize + dedup the edge
table, then group by the shared MIDDLE node — inside a group the
middle's undirected degree is simply the group's neighbor count, so
the per-pair contributions (1, 1/ln d, 1/d) need NO degree broadcast —
emit upper-triangle pairs, one hash shuffle on the pair key, driver
merge of the (~all-unique) pair partials as in nodesim. deg(a)·deg(b)
terms attach from the merged degree vector at the end. Hub middles
cost Σ deg² — ``degree_cutoff`` drops them (documented semantic
change, mirrors nodeSimilarity's mitigation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from graph_data_science_ray.algos.common import collect_arrow, merge_sum
from graph_data_science_ray.context import configure_ray_data, shuffle_partitions_for
from graph_data_science_ray.sources.edges import drop_self_loops, symmetrize

_EMPTY = pa.table(
    {
        "node1": pa.array([], pa.int64()),
        "node2": pa.array([], pa.int64()),
        "common_neighbors": pa.array([], pa.int64()),
        "adamic_adar": pa.array([], pa.float64()),
        "resource_allocation": pa.array([], pa.float64()),
        "preferential_attachment": pa.array([], pa.int64()),
        "total_neighbors": pa.array([], pa.int64()),
    }
)


def link_prediction(
    edges: Dataset,
    degree_cutoff: int | None = None,
    pairs: "pa.Table | None" = None,
    top_k: int | None = None,
    num_partitions: int | None = None,
) -> pa.Table:
    """Score all candidate pairs (a < b) sharing ≥1 common neighbor.

    → (node1, node2, common_neighbors, adamic_adar,
       resource_allocation, preferential_attachment, total_neighbors),
    sorted by (-common_neighbors, node1, node2).

    ``pairs``: optional (node1, node2) table restricting output to the
    given unordered pairs. ``top_k``: keep only the first k rows of the
    global ordering (deterministic: integer primary key + id
    tie-break).
    """
    configure_ray_data()
    num_partitions = num_partitions or shuffle_partitions_for()
    # symmetrize BEFORE the self-loop filter: columns() is None on lazy
    # map_batches stages (see CLAUDE.md); (a,a) symmetrizes to itself so
    # the order is semantics-neutral
    und = drop_self_loops(
        symmetrize(edges, dedup=True, num_partitions=num_partitions)
    ).materialize()

    # undirected degree = out-degree of the symmetrized table
    def deg_partials(t: pa.Table) -> pa.Table:
        u, c = np.unique(t.column("src_id").to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"node_id": pa.array(u, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    dt = collect_arrow(und.map_batches(deg_partials, batch_format="pyarrow",
                                       zero_copy_batch=True))
    if dt.num_rows == 0:
        return _EMPTY
    deg_ids, deg_c = merge_sum(dt, "node_id", "c")
    deg_c = deg_c.astype(np.int64)

    # wedge partials grouped by the middle node: rows (mid=src, nb=dst);
    # the group IS N(mid), so deg(mid) = group size — no broadcast
    def wedge(g: pa.Table) -> pa.Table:
        nbs = np.unique(g.column("dst_id").to_numpy(zero_copy_only=False))
        d = nbs.shape[0]
        if d < 2 or (degree_cutoff is not None and d > degree_cutoff):
            return pa.table(
                {"node1": pa.array([], pa.int64()),
                 "node2": pa.array([], pa.int64()),
                 "cn": pa.array([], pa.int64()),
                 "aa": pa.array([], pa.float64()),
                 "ra": pa.array([], pa.float64())}
            )
        ii, jj = np.triu_indices(d, k=1)
        k = ii.shape[0]
        return pa.table(
            {
                "node1": pa.array(nbs[ii], pa.int64()),
                "node2": pa.array(nbs[jj], pa.int64()),
                "cn": pa.array(np.ones(k, dtype=np.int64)),
                "aa": pa.array(np.full(k, 1.0 / np.log(d))),
                "ra": pa.array(np.full(k, 1.0 / d)),
            }
        )

    wp = collect_arrow(
        und.groupby("src_id", num_partitions=num_partitions).map_groups(
            wedge, batch_format="pyarrow"
        )
    )
    if wp.num_rows == 0:
        return _EMPTY
    # driver merge of pair partials (see nodesim.py for the measured
    # rationale: ~all-unique single-row groups make Ray's hash aggregate
    # 15x slower than one vectorized merge); one unique, three bincounts
    k = np.stack(
        [wp.column("node1").to_numpy(zero_copy_only=False),
         wp.column("node2").to_numpy(zero_copy_only=False)],
        axis=1,
    )
    u, inv = np.unique(k, axis=0, return_inverse=True)
    n1, n2 = u[:, 0], u[:, 1]
    cn = np.bincount(
        inv, weights=wp.column("cn").to_numpy(zero_copy_only=False),
        minlength=u.shape[0]).astype(np.int64)
    aa = np.bincount(
        inv, weights=wp.column("aa").to_numpy(zero_copy_only=False),
        minlength=u.shape[0])
    ra = np.bincount(
        inv, weights=wp.column("ra").to_numpy(zero_copy_only=False),
        minlength=u.shape[0])

    d1 = deg_c[np.searchsorted(deg_ids, n1)]
    d2 = deg_c[np.searchsorted(deg_ids, n2)]
    pref = d1 * d2
    tot = d1 + d2 - cn

    if pairs is not None:
        qa = pairs.column("node1").to_numpy(zero_copy_only=False)
        qb = pairs.column("node2").to_numpy(zero_copy_only=False)
        lo = np.minimum(qa, qb).astype(np.int64)
        hi = np.maximum(qa, qb).astype(np.int64)
        want = np.unique(lo.astype(np.float64) * 2**32 + hi)  # ids < 2^31
        key = n1.astype(np.float64) * 2**32 + n2
        keep = np.isin(key, want)
        n1, n2, cn, aa, ra, pref, tot = (
            x[keep] for x in (n1, n2, cn, aa, ra, pref, tot)
        )

    order = np.lexsort((n2, n1, -cn))
    if top_k is not None:
        order = order[:top_k]
    return pa.table(
        {
            "node1": pa.array(n1[order], pa.int64()),
            "node2": pa.array(n2[order], pa.int64()),
            "common_neighbors": pa.array(cn[order], pa.int64()),
            "adamic_adar": pa.array(aa[order], pa.float64()),
            "resource_allocation": pa.array(ra[order], pa.float64()),
            "preferential_attachment": pa.array(pref[order], pa.int64()),
            "total_neighbors": pa.array(tot[order], pa.int64()),
        }
    )


def same_community(pairs: pa.Table, communities: pa.Table,
                   community_col: str = "community") -> pa.Table:
    """``gds.alpha.linkprediction.sameCommunity``: 1 iff both nodes carry
    the same (non-null) community id. ``communities``: (node_id, <col>).
    Nodes absent from the table never match (reference: null ⇒ 0)."""
    cid = communities.column("node_id").to_numpy(zero_copy_only=False)
    cval = communities.column(community_col).to_numpy(zero_copy_only=False)
    o = np.argsort(cid, kind="stable")
    cid, cval = cid[o], cval[o]

    def look(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        pos = np.searchsorted(cid, x)
        ok = (pos < cid.shape[0]) & (cid[np.minimum(pos, cid.shape[0] - 1)] == x)
        val = np.where(ok, cval[np.minimum(pos, cid.shape[0] - 1)], -1)
        return ok, val

    a = pairs.column("node1").to_numpy(zero_copy_only=False)
    b = pairs.column("node2").to_numpy(zero_copy_only=False)
    oka, va = look(a)
    okb, vb = look(b)
    same = (oka & okb & (va == vb)).astype(np.int64)
    return pa.table(
        {"node1": pa.array(a, pa.int64()), "node2": pa.array(b, pa.int64()),
         "same_community": pa.array(same, pa.int64())}
    )
