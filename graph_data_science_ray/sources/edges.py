"""Edge-table sources and graph projections.

The reference "projects" a graph out of a database store with per-type
filters, orientation and parallel-edge aggregation (SURVEY.md §2.1); here
a projection is any Dataset expression producing ``(src_id, dst_id
[, weight])``. These helpers cover the common projections:

- ``read_edges`` — parquet edge table (column-pruned read).
- ``from_arrow`` — in-memory fixture tables.
- ``dedup_edges`` — GDS ``Aggregation``: SINGLE / SUM / MIN / MAX / COUNT.
- ``symmetrize`` — GDS ``Orientation.UNDIRECTED`` (store both directions).
- ``reverse`` — GDS ``Orientation.REVERSE``.
- ``generate_graph`` — seeded synthetic graphs (gds.graph.generate).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum

from graph_data_science_ray.context import configure_ray_data, shuffle_partitions_for


def read_edges(path: str, weighted: bool = False, columns: list[str] | None = None) -> Dataset:
    configure_ray_data()
    cols = columns or (["src_id", "dst_id", "weight"] if weighted else ["src_id", "dst_id"])
    return ray.data.read_parquet(path, columns=cols)


def from_arrow(table: pa.Table) -> Dataset:
    configure_ray_data()
    return ray.data.from_arrow(table)


def dedup_edges(
    edges: Dataset,
    aggregation: str = "single",
    num_partitions: int | None = None,
) -> Dataset:
    """Collapse parallel edges — the reference's load-time ``Aggregation``
    (GDS-pub: org.neo4j.gds.core.Aggregation; SURVEY.md §2.7).

    single: keep one unweighted edge per (src, dst);
    sum/min/max: aggregate the weight column; count: weight = multiplicity.
    Implemented as a hash-partitioned groupby on (src_id, dst_id).
    """
    num_partitions = num_partitions or shuffle_partitions_for()
    gb = edges.groupby(["src_id", "dst_id"], num_partitions=num_partitions)
    agg = aggregation.lower()
    if agg == "single":
        out = gb.aggregate(Count(alias_name="_n"))
        return out.drop_columns(["_n"])
    if agg == "count":
        out = gb.aggregate(Count(alias_name="weight"))
        return out.map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("weight"), "weight", t.column("weight").cast(pa.float64())
            ),
            batch_format="pyarrow",
        )
    fn = {"sum": Sum, "min": Min, "max": Max}[agg]
    return gb.aggregate(fn("weight", alias_name="weight"))


def reverse(edges: Dataset) -> Dataset:
    """Orientation.REVERSE: swap src and dst."""
    return edges.rename_columns({"src_id": "dst_id", "dst_id": "src_id"})


def symmetrize(edges: Dataset, dedup: bool = True, num_partitions: int | None = None) -> Dataset:
    """Orientation.UNDIRECTED: each edge stored in both directions, then
    deduped (so a pre-symmetrized input is idempotent). Self-loops kept;
    algorithms drop them where the reference's semantics require."""
    both = edges.union(reverse(edges).select_columns(edges.columns()))
    if dedup:
        return dedup_edges(both, "single", num_partitions=num_partitions)
    return both


def drop_self_loops(edges: Dataset) -> Dataset:
    import pyarrow.compute as pc

    return edges.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t.column("src_id"), t.column("dst_id")))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def node_ids(edges: Dataset, num_partitions: int | None = None) -> Dataset:
    """Distinct node ids from src ∪ dst (the IdMap's key set)."""
    num_partitions = num_partitions or shuffle_partitions_for()
    ids = edges.select_columns(["src_id"]).rename_columns({"src_id": "node_id"}).union(
        edges.select_columns(["dst_id"]).rename_columns({"dst_id": "node_id"})
    )
    return ids.groupby("node_id", num_partitions=num_partitions).aggregate(
        Count(alias_name="_n")
    ).drop_columns(["_n"])


def generate_graph(n: int, mean_degree: float = 8.0, seed: int = 42) -> Dataset:
    """Seeded synthetic power-law graph as a Dataset — the equivalent of
    the reference's gds.graph.generate (SURVEY.md §2.1). Deterministic for
    a given (n, mean_degree, seed) regardless of parallelism: each block
    generates edges for its own src-id range with a per-range rng."""
    import numpy as np

    configure_ray_data()

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        rng = np.random.default_rng(seed ^ int(ids[0]))
        deg = np.minimum(rng.zipf(1.3, size=len(ids)), n - 1)
        deg = np.maximum((deg * mean_degree / 3.0).astype(np.int64), 1)
        deg = np.minimum(deg, n - 1)
        src = np.repeat(ids, deg)
        dst = rng.integers(0, n, size=src.shape[0], dtype=np.int64)
        keep = src != dst
        return pa.table(
            {"src_id": pa.array(src[keep], pa.int64()), "dst_id": pa.array(dst[keep], pa.int64())}
        )

    return ray.data.range(n).rename_columns({"id": "id"}).map_batches(
        gen, batch_format="pyarrow", batch_size=65536
    )


def lineitem_projection(sf_dir: str) -> Dataset:
    """The driver-testdata edge projection used by the correctness
    harness: SELECT DISTINCT l_orderkey AS src_id, l_partkey AS dst_id
    FROM lineitem (FIXTURES.md §3)."""
    configure_ray_data()
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).rename_columns({"l_orderkey": "src_id", "l_partkey": "dst_id"})
    return dedup_edges(ds, "single")
