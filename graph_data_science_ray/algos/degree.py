"""Degree centrality (gds.degree equivalent): out/in/undirected degree,
optionally weighted — a single pre-aggregated groupby."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from graph_data_science_ray.context import configure_ray_data, shuffle_partitions_for
from graph_data_science_ray.sources.edges import symmetrize
from graph_data_science_ray.algos.common import unique_inverse


def degree(
    edges: Dataset,
    orientation: str = "natural",  # natural=out | reverse=in | undirected
    weighted: bool = False,
    num_partitions: int | None = None,
    alias: str = "degree",
) -> Dataset:
    """Dataset of (node_id, <alias>) — nodes with degree 0 omitted (join
    against the node table to densify, as the stats/write modes do)."""
    configure_ray_data()
    num_partitions = num_partitions or shuffle_partitions_for()
    if orientation == "undirected":
        edges = symmetrize(edges, dedup=False, num_partitions=num_partitions)
    key = "dst_id" if orientation == "reverse" else "src_id"

    def partials(t: pa.Table) -> pa.Table:
        ids = t.column(key).to_numpy(zero_copy_only=False)
        w = (
            t.column("weight").to_numpy(zero_copy_only=False)
            if weighted
            else np.ones(ids.shape[0])
        )
        u, inv = unique_inverse(ids)
        s = np.bincount(inv, weights=w, minlength=u.shape[0])
        col = pa.array(s, pa.float64()) if weighted else pa.array(s.astype(np.int64), pa.int64())
        return pa.table({"node_id": pa.array(u, pa.int64()), "_d": col})

    return (
        edges.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node_id", num_partitions=num_partitions)
        .aggregate(Sum("_d", alias_name=alias))
    )
