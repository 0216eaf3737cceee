"""Community quality metrics — modularity and conductance.

Reference scope (SURVEY.md §2.9 catalog): the reference ships
``gds.modularity`` (per-community + total modularity of a given node
partition) and ``gds.conductance`` (per-community conductance)
[GDS-pub: algo/.../modularity/ + algo/.../conductance/]. Both are
*metrics over an existing community assignment* (a node property), not
community-detection algorithms — so they are single-pass dataflow:
one scatter over the symmetrized edge table with a per-batch partial
aggregate, one small ``groupby(community).sum`` shuffle, then a
streaming finalize with two broadcast scalars. Nothing node-sized is
materialized except the community lookup vector itself (the engine's
standing node-scalar assumption, algos/common.py).

Semantics (undirected view, self-loops dropped — the engine's simple
graph convention):

- ``modularity``: Q_c = in_c / m − (vol_c / 2m)², where in_c = number
  of undirected intra-community edges, vol_c = Σ degrees of the
  community's nodes, m = total undirected edge count. Total Q = Σ Q_c —
  identical to networkx ``community.modularity`` (γ=1).
- ``conductance``: φ_c = cut_c / min(vol_c, 2m − vol_c), where cut_c =
  number of undirected edges with exactly one endpoint in c (0 when the
  denominator is 0). This is the standard graph-conductance definition
  the reference documents.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from graph_data_science_ray.algos.common import NodeVector, collect_arrow, unique_inverse
from graph_data_science_ray.context import configure_ray_data, shuffle_partitions_for
from graph_data_science_ray.sources.edges import drop_self_loops, symmetrize


def _community_vector(communities) -> NodeVector:
    """Accept a Dataset/Arrow table of (node_id, community) → NodeVector."""
    if isinstance(communities, NodeVector):
        return communities
    t = collect_arrow(communities) if isinstance(communities, Dataset) else communities
    ids = t.column("node_id").to_numpy(zero_copy_only=False).astype(np.int64)
    com = t.column(t.column_names[1] if t.column_names[0] == "node_id" else 0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    return NodeVector(ids[order], com[order])


def community_stats(
    edges: Dataset,
    communities,
    *,
    num_partitions: int | None = None,
) -> Dataset:
    """Per-community raw tallies over the undirected simple view:
    ``(community, internal_edges, cut_edges, volume)``.

    internal_edges counts each undirected intra-community edge once;
    cut_edges counts undirected edges leaving the community; volume is
    the degree sum of the community's nodes. One shuffle total.
    """
    configure_ray_data()
    num_partitions = num_partitions or shuffle_partitions_for()
    # symmetrize first: it needs a known schema, which a lazy filter
    # (drop_self_loops = map_batches) can't report before execution
    sym = drop_self_loops(symmetrize(edges, dedup=True, num_partitions=num_partitions))
    vec = _community_vector(communities)
    state_ref = ray.put((vec.node_ids, vec.values))

    def partials(t: pa.Table) -> pa.Table:
        ids, com = ray.get(state_ref)
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        dst = t.column("dst_id").to_numpy(zero_copy_only=False)
        n = ids.shape[0]
        src_c = com[np.minimum(np.searchsorted(ids, src), n - 1)]
        dst_c = com[np.minimum(np.searchsorted(ids, dst), n - 1)]
        internal = (src_c == dst_c).astype(np.int64)
        u, inv = unique_inverse(src_c)
        deg = np.bincount(inv, minlength=u.shape[0]).astype(np.int64)
        int_sym = np.zeros(u.shape[0], dtype=np.int64)
        np.add.at(int_sym, inv, internal)
        return pa.table(
            {
                "community": pa.array(u, pa.int64()),
                "_sym_internal": pa.array(int_sym, pa.int64()),
                "_sym_deg": pa.array(deg, pa.int64()),
            }
        )

    agg = (
        sym.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("community", num_partitions=num_partitions)
        .aggregate(
            Sum("_sym_internal", alias_name="_si"),
            Sum("_sym_deg", alias_name="volume"),
        )
    )

    # Each undirected internal edge appears twice in the symmetrized
    # table (u→v and v→u, both intra); cut edges appear twice too but
    # split across the two endpoint communities, so per community the
    # outgoing count is volume − _si.
    def finalize(t: pa.Table) -> pa.Table:
        si = t.column("_si").to_numpy(zero_copy_only=False)
        vol = t.column("volume").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "community": t.column("community"),
                "internal_edges": pa.array(si // 2, pa.int64()),
                "cut_edges": pa.array(vol - si, pa.int64()),
                "volume": pa.array(vol, pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def modularity(
    edges: Dataset,
    communities,
    *,
    num_partitions: int | None = None,
) -> tuple[Dataset, float]:
    """(per-community Dataset with ``modularity_contrib``, total Q).

    The heavy edge scan runs once: the per-community aggregate is tiny
    (one row per community) and is materialized before the two cheap
    passes (global Σ volume, then the contrib map).
    """
    stats = community_stats(edges, communities, num_partitions=num_partitions).materialize()
    two_m = float(stats.sum("volume"))

    def contrib(t: pa.Table) -> pa.Table:
        internal = t.column("internal_edges").to_numpy(zero_copy_only=False)
        vol = t.column("volume").to_numpy(zero_copy_only=False)
        q = internal / (two_m / 2.0) - (vol / two_m) ** 2
        return t.append_column("modularity_contrib", pa.array(q, pa.float64()))

    per_comm = stats.map_batches(contrib, batch_format="pyarrow", zero_copy_batch=True)
    total = float(per_comm.sum("modularity_contrib"))
    return per_comm, total


def conductance(
    edges: Dataset,
    communities,
    *,
    num_partitions: int | None = None,
) -> Dataset:
    """Per-community ``(community, conductance)`` Dataset."""
    stats = community_stats(edges, communities, num_partitions=num_partitions).materialize()
    two_m = float(stats.sum("volume"))

    def phi(t: pa.Table) -> pa.Table:
        cut = t.column("cut_edges").to_numpy(zero_copy_only=False).astype(np.float64)
        vol = t.column("volume").to_numpy(zero_copy_only=False).astype(np.float64)
        denom = np.minimum(vol, two_m - vol)
        out = np.divide(cut, denom, out=np.zeros_like(cut), where=denom > 0)
        return pa.table(
            {
                "community": t.column("community"),
                "conductance": pa.array(out, pa.float64()),
            }
        )

    return stats.map_batches(phi, batch_format="pyarrow", zero_copy_batch=True)
