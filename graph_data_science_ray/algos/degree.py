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


def degree_distribution(
    edges: Dataset,
    orientation: str = "natural",
    num_partitions: int | None = None,
) -> pa.Table:
    """Single-row degree-distribution summary — the reference's
    ``gds.graph.list`` degreeDistribution field (min/mean/max +
    p50/p75/p90/p95/p99/p999), computed over nodes WITH at least one
    edge in the chosen orientation (zero-degree nodes can't appear in an
    edge-only projection). Percentiles are exact discrete lower
    quantiles (type-1: value at ceil(p·n)−1), matching DuckDB
    ``quantile_disc`` at every n (the earlier floor(p·(n−1)) form
    diverged at e.g. n=1473, p=0.999); the reference's HdrHistogram is
    approximate, so exact is a strict refinement."""
    from graph_data_science_ray.algos.common import collect_arrow

    configure_ray_data()
    d = collect_arrow(degree(edges, orientation=orientation, num_partitions=num_partitions))
    if d.num_rows == 0:
        cols = ["n_nodes", "min", "mean_ppm", "max", "p50", "p75", "p90", "p95", "p99", "p999"]
        return pa.table({c: pa.array([], pa.int64()) for c in cols})
    vals = np.sort(d.column("degree").to_numpy(zero_copy_only=False).astype(np.int64))
    n = vals.shape[0]

    def q(p: float) -> int:
        return int(vals[max(0, int(np.ceil(p * n)) - 1)])

    return pa.table(
        {
            "n_nodes": pa.array([n], pa.int64()),
            "min": pa.array([int(vals[0])], pa.int64()),
            "mean_ppm": pa.array([int(round(vals.mean() * 1e6))], pa.int64()),
            "max": pa.array([int(vals[-1])], pa.int64()),
            "p50": pa.array([q(0.50)], pa.int64()),
            "p75": pa.array([q(0.75)], pa.int64()),
            "p90": pa.array([q(0.90)], pa.int64()),
            "p95": pa.array([q(0.95)], pa.int64()),
            "p99": pa.array([q(0.99)], pa.int64()),
            "p999": pa.array([q(0.999)], pa.int64()),
        }
    )
