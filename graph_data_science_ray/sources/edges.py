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
from ray.data.aggregate import Count

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
    agg = aggregation.lower()
    if agg not in ("single", "count", "sum", "min", "max"):
        raise ValueError(f"unknown aggregation {aggregation!r}")
    # Ray's hash aggregate costs ~15x a vectorized merge when groups are
    # ~all-unique (the typical edge table — measured, see nodesim.py):
    # one hash shuffle on the PAIR key, then a lexsort-based merge of
    # each bucket in one vectorized task (functions/shuffle.py).
    import numpy as np

    from graph_data_science_ray.functions.shuffle import bucketed_merge

    sentinel: dict = {"src_id": 0, "dst_id": 0}
    if agg in ("sum", "min", "max"):
        sentinel["weight"] = 0.0

    def merge_bucket(g: pa.Table) -> pa.Table:
        from graph_data_science_ray.algos.common import group_pairs

        src = g.column("src_id").to_numpy(zero_copy_only=False)
        dst = g.column("dst_id").to_numpy(zero_copy_only=False)
        order, u1, u2, gid = group_pairs(src, dst)
        cols = {"src_id": pa.array(u1, pa.int64()), "dst_id": pa.array(u2, pa.int64())}
        if agg == "count":
            w = np.bincount(gid, minlength=u1.shape[0]).astype(np.float64)
            cols["weight"] = pa.array(w, pa.float64())
        elif agg != "single":
            wv = g.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)[order]
            if agg == "sum":
                w = np.bincount(gid, weights=wv, minlength=u1.shape[0])
            elif wv.shape[0]:
                starts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
                red = np.minimum if agg == "min" else np.maximum
                w = red.reduceat(wv, starts)
            else:
                w = wv
            cols["weight"] = pa.array(w, pa.float64())
        return pa.table(cols)

    return bucketed_merge(
        edges, ["src_id", "dst_id"], merge_bucket, sentinel,
        num_partitions=num_partitions,
    )


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


def generate_graph(
    n: int, mean_degree: float = 8.0, seed: int = 42, alpha: float = 2.3
) -> Dataset:
    """Seeded synthetic power-law graph as a Dataset — the equivalent of
    the reference's gds.graph.generate (SURVEY.md §2.1).

    Out-degree of node i is a PURE FUNCTION of (i, seed): a bounded-Pareto
    inverse transform over a splitmix64 uniform — deterministic regardless
    of block boundaries / parallelism, with a web-like degree exponent
    ``alpha`` (finite mean; a naive ``rng.zipf(1.3)`` has an unbounded
    mean and explodes at large n). Targets are uniform, seeded per edge.
    """
    import numpy as np

    from graph_data_science_ray.stages.ids import bucket_of  # noqa: F401  (same mix)

    configure_ray_data()
    x_m = max(1.0, mean_degree * (alpha - 2.0) / (alpha - 1.0))
    cap = max(16, n // 50)

    def _mix(x: "np.ndarray") -> "np.ndarray":
        x = x.astype(np.uint64, copy=True)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        return x

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        u = (_mix(ids ^ np.uint64(seed)) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        u = np.clip(u, 1e-12, 1.0)
        deg = np.minimum(np.ceil(x_m * u ** (-1.0 / (alpha - 1.0))).astype(np.int64), cap)
        src = np.repeat(ids, deg)
        # per-edge deterministic targets: mix(src * C + within-src index)
        idx = np.arange(src.shape[0], dtype=np.uint64)
        starts = np.repeat(np.cumsum(deg) - deg, deg).astype(np.uint64)
        within = idx - starts
        dst = (_mix(src.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + within + np.uint64(seed))
               % np.uint64(n)).astype(np.int64)
        keep = src != dst
        return pa.table(
            {"src_id": pa.array(src[keep], pa.int64()), "dst_id": pa.array(dst[keep], pa.int64())}
        )

    return ray.data.range(n).map_batches(gen, batch_format="pyarrow", batch_size=65536)


def to_undirected(edges: Dataset, num_partitions: int | None = None) -> Dataset:
    """gds.graph.toUndirected equivalent (alias of symmetrize)."""
    return symmetrize(edges, num_partitions=num_partitions)


def collapse_path(first: Dataset, second: Dataset, num_partitions: int | None = None) -> Dataset:
    """gds.collapsePath equivalent: (a→b) ∈ first, (b→c) ∈ second ⇒ a→c,
    deduped. A single partitioned hash join on the middle node."""
    from graph_data_science_ray.functions.joins import hash_join

    left = first.rename_columns({"dst_id": "mid"}).select_columns(["src_id", "mid"])
    right = second.rename_columns({"src_id": "mid"}).select_columns(["mid", "dst_id"])
    joined = hash_join(left, right, on=["mid"], num_partitions=num_partitions)
    out = joined.select_columns(["src_id", "dst_id"])
    return dedup_edges(out, "single", num_partitions=num_partitions)


def lineitem_projection(sf_dir: str) -> Dataset:
    """The driver-testdata edge projection used by the correctness
    harness: SELECT DISTINCT l_orderkey AS src_id, l_partkey AS dst_id
    FROM lineitem (FIXTURES.md §3)."""
    configure_ray_data()
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).rename_columns({"l_orderkey": "src_id", "l_partkey": "dst_id"})
    return dedup_edges(ds, "single")


def split_relationships(
    edges: Dataset, holdout_fraction: float = 0.2, seed: int = 42
) -> tuple[Dataset, Dataset]:
    """``gds.alpha.ml.splitRelationships`` equivalent [GDS-pub: proc/ml +
    public docs]: deterministically split the edge set into (remaining,
    holdout) by a splitmix64 hash of the UNORDERED pair and the seed —
    a pure per-row predicate (two lazy filters, no shuffle), stable
    across runs, workers and partitionings; both orientations of the
    same undirected pair land on the same side."""
    import numpy as np

    from graph_data_science_ray.functions.joins import _mix64

    salt = np.uint64((0x9E3779B97F4A7C15 * (seed + 1)) & 0xFFFFFFFFFFFFFFFF)

    def side(t: pa.Table, keep_holdout: bool) -> pa.Table:
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        dst = t.column("dst_id").to_numpy(zero_copy_only=False)
        lo = np.minimum(src, dst).astype(np.uint64)
        hi = np.maximum(src, dst).astype(np.uint64)
        u = (_mix64(_mix64(lo ^ salt) ^ hi).astype(np.float64) + 1.0) / float(2**64)
        mask = u < holdout_fraction
        return t.filter(pa.array(mask if keep_holdout else ~mask))

    remaining = edges.map_batches(
        lambda t: side(t, False), batch_format="pyarrow", zero_copy_batch=True)
    holdout = edges.map_batches(
        lambda t: side(t, True), batch_format="pyarrow", zero_copy_batch=True)
    return remaining, holdout


def filter_graph(
    edges: Dataset,
    node_filter=None,
    nodes: "Dataset | pa.Table | None" = None,
    relationship_filter=None,
    strategy: str = "auto",
    num_partitions: int | None = None,
    broadcast_threshold: int = 4_000_000,
) -> Dataset:
    """Subgraph projection (``gds.graph.filter`` [GDS-pub: proc/catalog
    GraphFilterProc + public docs]): keep the relationships that pass
    ``relationship_filter`` AND whose BOTH endpoints pass ``node_filter``.

    The reference takes string expressions over properties ("n.prop >
    42"); here the filters are vectorized batch predicates — callables
    taking a ``pyarrow.Table`` and returning a boolean mask (pyarrow
    BooleanArray or numpy bool array). ``node_filter`` is evaluated over
    ``nodes`` (a node-property table carrying ``node_id``; nodes absent
    from it fail the filter, matching the reference's missing-property
    semantics); ``relationship_filter`` over edge batches.

    Scale strategy for the endpoint membership test:

    - ``"broadcast"`` — collect the passing node-id set once, ``ray.put``
      it, and mask each edge batch with a sorted-array membership probe
      (no shuffle; right whenever the surviving node set fits in memory —
      a node-vector-sized object, the engine's standing assumption).
    - ``"semijoin"`` — two partitioned ``left_semi`` hash joins (src then
      dst); no driver materialization, right when the filter keeps
      billions of nodes.
    - ``"auto"`` — broadcast iff the passing set ≤ ``broadcast_threshold``.
    """
    import numpy as np

    configure_ray_data()
    out = edges
    if relationship_filter is not None:
        def rel_mask(t: pa.Table) -> pa.Table:
            m = relationship_filter(t)
            if isinstance(m, np.ndarray):
                m = pa.array(m)
            return t.filter(m)

        out = out.map_batches(rel_mask, batch_format="pyarrow", zero_copy_batch=True)

    if node_filter is None:
        return out
    if nodes is None:
        raise ValueError("node_filter requires a `nodes` property table")

    def keep_ids(t: pa.Table) -> pa.Table:
        m = node_filter(t)
        if isinstance(m, np.ndarray):
            m = pa.array(m)
        return t.filter(m).select(["node_id"])

    if isinstance(nodes, pa.Table):
        keep_tbl = keep_ids(nodes)
        keep_ds = None
        n_keep = keep_tbl.num_rows
    else:
        keep_ds = nodes.map_batches(keep_ids, batch_format="pyarrow", zero_copy_batch=True)
        keep_tbl = None
        n_keep = keep_ds.count() if strategy == "auto" else None

    use_broadcast = (
        strategy == "broadcast"
        or keep_tbl is not None
        or (strategy == "auto" and n_keep is not None and n_keep <= broadcast_threshold)
    )
    if use_broadcast:
        if keep_tbl is None:
            from graph_data_science_ray.algos.common import collect_arrow

            keep_tbl = collect_arrow(keep_ds)
        if keep_tbl.num_rows == 0 or "node_id" not in keep_tbl.column_names:
            ids = np.array([], dtype=np.int64)
        else:
            ids = np.sort(keep_tbl.column("node_id").to_numpy(zero_copy_only=False))
        ids_ref = ray.put(ids)

        def endpoint_mask(t: pa.Table) -> pa.Table:
            s = ray.get(ids_ref)
            if s.shape[0] == 0:
                return t.slice(0, 0)

            def member(v: np.ndarray) -> np.ndarray:
                i = np.searchsorted(s, v)
                i_c = np.minimum(i, s.shape[0] - 1)
                return (i < s.shape[0]) & (s[i_c] == v)

            src = t.column("src_id").to_numpy(zero_copy_only=False)
            dst = t.column("dst_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(member(src) & member(dst)))

        return out.map_batches(endpoint_mask, batch_format="pyarrow", zero_copy_batch=True)

    from graph_data_science_ray.functions.joins import hash_join

    out = hash_join(
        out, keep_ds.rename_columns({"node_id": "src_id"}),
        on=("src_id",), join_type="left_semi", num_partitions=num_partitions)
    return hash_join(
        out, keep_ds.rename_columns({"node_id": "dst_id"}),
        on=("dst_id",), join_type="left_semi", num_partitions=num_partitions)
