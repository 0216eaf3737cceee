"""Shared plumbing for the iterative graph algorithms.

Architecture (SURVEY.md §3.2): the EDGE table is the big, distributed
side — it streams through ``map_batches`` and ``groupby`` shuffles every
iteration. The per-node STATE (rank / label vector, one scalar per node)
is orders of magnitude smaller than the edges for link graphs; in the
dataflow implementation it is held as sorted numpy arrays, broadcast to
workers via ``ray.put`` once per iteration (zero-copy reads from the
object store), and updated on the driver from the shuffle's aggregate
output. When the node table itself outgrows single-process memory, the
sharded CSR-actor implementation (state/csr.py) partitions node state
across P actors with the same bucket function — same semantics, tested
for equality.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset


def collect_arrow(ds: Dataset) -> pa.Table:
    """Materialize a (small) Dataset result as one Arrow table without a
    per-row driver loop: fetch block refs, concat zero-copy."""
    refs = ds.to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows > 0]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default").combine_chunks()


@ray.remote
def _scan_chunk(fn, *blocks):
    outs = []
    for b in blocks:
        if b.num_rows == 0:
            continue
        t = fn(b)
        if t is not None and t.num_rows > 0:
            outs.append(t)
    if not outs:
        return None
    if len(outs) == 1:
        return outs[0]
    return pa.concat_tables(outs, promote_options="default").combine_chunks()


class BlockScanner:
    """Per-iteration edge scans without a Ray Data stage launch.

    Snapshots a materialized Dataset's Arrow block refs ONCE; each
    ``scan(fn)`` runs plain ``ray.remote`` tasks over those refs (block
    refs are top-level task args, so the raylet resolves them locally —
    nothing is re-shipped) and concatenates the per-block partial tables
    on the driver. Semantically identical to
    ``collect_arrow(ds.map_batches(fn, batch_format="pyarrow",
    zero_copy_batch=True))`` for batch-size-invariant fns — which every
    scatter combiner here is (partition-invariance is tested) — but a
    round costs milliseconds of task launch instead of a full
    streaming-executor stage (~1-3 s on this host), the dominant cost of
    iterative jobs on small/medium graphs.

    Scale note: the partials stay combiner-sized (≤ one row per distinct
    key per block), so the driver concat is node-vector-sized — the same
    standing assumption as the dataflow path itself. The block list is
    cluster-wide; tasks schedule wherever the block lives.
    """

    def __init__(self, ds_or_refs, max_tasks: int | None = None):
        if isinstance(ds_or_refs, Dataset):
            self.refs = list(ds_or_refs.to_arrow_refs())
        else:
            self.refs = list(ds_or_refs)
        if max_tasks is None:
            try:
                cpus = int(ray.cluster_resources().get("CPU", 0)) or 8
            except Exception:
                cpus = 8
            max_tasks = max(1, cpus)
        k = max(1, -(-len(self.refs) // max_tasks))
        self.chunks = [self.refs[i : i + k] for i in range(0, len(self.refs), k)]

    def scan(self, fn) -> pa.Table:
        """Apply ``fn(block: pa.Table) -> pa.Table`` to every block;
        return the concatenated non-empty partials (empty table if none)."""
        tasks = [_scan_chunk.remote(fn, *c) for c in self.chunks]
        tables = [t for t in ray.get(tasks) if t is not None]
        if not tables:
            return pa.table({})
        if len(tables) == 1:
            return tables[0]
        return pa.concat_tables(tables, promote_options="default").combine_chunks()


@dataclass
class NodeVector:
    """A per-node scalar vector keyed by sorted node ids.

    Lookup is vectorized ``np.searchsorted`` — O(log n) per probe, no
    Python loop. Shared with workers through ``ray.put`` (one copy in the
    local object store; tasks map it zero-copy).
    """

    node_ids: np.ndarray  # int64, sorted ascending, unique
    values: np.ndarray    # same length

    def __post_init__(self) -> None:
        assert self.node_ids.shape == self.values.shape

    @classmethod
    def from_ids(cls, node_ids: np.ndarray, fill: float | int, dtype=np.float64) -> "NodeVector":
        ids = np.sort(np.asarray(node_ids, dtype=np.int64))
        return cls(ids, np.full(ids.shape[0], fill, dtype=dtype))

    @classmethod
    def identity(cls, node_ids: np.ndarray) -> "NodeVector":
        """value[i] = node_id[i] (WCC / LPA initial labels)."""
        ids = np.sort(np.asarray(node_ids, dtype=np.int64))
        return cls(ids, ids.copy())

    def lookup(self, ids: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(self.node_ids, ids)
        pos = np.minimum(pos, self.node_ids.shape[0] - 1)
        # ids not present map to an arbitrary slot; callers guarantee
        # ids ⊆ node_ids (the id universe is fixed at projection time,
        # mirroring the reference's immutable IdMap).
        return self.values[pos]

    def updated(self, ids: np.ndarray, values: np.ndarray, default: float | int | None = None) -> "NodeVector":
        """New vector: positions named in `ids` take `values`; the rest
        keep their current value, or `default` if given."""
        if default is None:
            out = self.values.copy()
        else:
            out = np.full(self.values.shape[0], default, dtype=self.values.dtype)
        pos = np.searchsorted(self.node_ids, ids)
        valid = (pos < self.node_ids.shape[0])
        pos_c = np.minimum(pos, self.node_ids.shape[0] - 1)
        valid &= self.node_ids[pos_c] == ids
        out[pos_c[valid]] = values[valid]
        return NodeVector(self.node_ids, out)

    def to_table(self, value_name: str) -> pa.Table:
        return pa.table(
            {"node_id": pa.array(self.node_ids, pa.int64()),
             value_name: pa.array(self.values)}
        )


def unique_node_ids(edges_table_or_ds) -> np.ndarray:
    """Distinct src ∪ dst as a sorted numpy array (driver-side; the node
    universe of the dataflow implementation).

    Shuffle-free: per-batch distinct (a combiner — output is bounded by
    the batch's distinct ids, tiny under hub skew) then a driver-side
    merge. The node vector must fit the driver in this implementation by
    construction; the sharded CSR path lifts that limit."""
    if isinstance(edges_table_or_ds, pa.Table):
        t = edges_table_or_ds
        return np.union1d(
            t.column("src_id").to_numpy(zero_copy_only=False),
            t.column("dst_id").to_numpy(zero_copy_only=False),
        )

    def partial(t: pa.Table) -> pa.Table:
        ids = np.unique(
            np.concatenate(
                [
                    t.column("src_id").to_numpy(zero_copy_only=False),
                    t.column("dst_id").to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"node_id": pa.array(ids, pa.int64())})

    def combine(t: pa.Table) -> pa.Table:
        ids = np.unique(t.column("node_id").to_numpy(zero_copy_only=False))
        return pa.table({"node_id": pa.array(ids, pa.int64())})

    partials = edges_table_or_ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    # worker-side tree combine: the driver merge input shrinks from
    # O(blocks × per-block uniques) to O(few × node count) — the heavy
    # sorts run in BUSY worker processes. (Long driver-side numpy runs
    # 10–100× slower here whenever idle Ray workers/actors are alive —
    # their poll loops each burn ~29% CPU on this box; measured in
    # BENCH/BASELINE.md. Keeping the big merge off the driver sidesteps
    # that and is the right shape for a multi-node cluster anyway.)
    t = collect_arrow(
        partials.repartition(4).map_batches(
            combine, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    )
    if t.num_rows == 0:
        return np.empty(0, dtype=np.int64)
    return np.unique(t.column("node_id").to_numpy(zero_copy_only=False))


def self_loop_only_nodes(edges) -> np.ndarray:
    """Sorted ids of nodes whose EVERY edge is a self-loop (round-5
    ADVICE fix): these vanish from the CSR engine universe (built over
    the self-loop-dropped symmetrized view) while the dataflow backends
    emit them with degree-0 defaults. One narrow pass over the raw edge
    table — per-batch partial (node_id, has-non-loop-edge flag), then a
    tiny max-merge; no symmetrize re-execution. Empty on loop-free
    inputs, which is the common case and costs one cheap scan."""
    def partial(t: pa.Table) -> pa.Table:
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        dst = t.column("dst_id").to_numpy(zero_copy_only=False)
        loop = src == dst
        nl = np.unique(np.concatenate([src[~loop], dst[~loop]]))
        lp = np.unique(src[loop])
        lp = lp[np.isin(lp, nl, invert=True, assume_unique=True)]
        return pa.table({
            "node_id": pa.array(np.concatenate([nl, lp]), pa.int64()),
            "nonloop": pa.array(
                np.r_[np.ones(nl.shape[0], np.int64), np.zeros(lp.shape[0], np.int64)]
            ),
        })

    t = collect_arrow(edges.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ))
    if t.num_rows == 0:
        return np.empty(0, dtype=np.int64)
    ids = t.column("node_id").to_numpy(zero_copy_only=False)
    fl = t.column("nonloop").to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    ids, fl = ids[order], fl[order]
    first = np.r_[True, ids[1:] != ids[:-1]]
    gidx = np.cumsum(first) - 1
    mx = np.zeros(gidx[-1] + 1, dtype=np.int64)
    np.maximum.at(mx, gidx, fl)
    return ids[first][mx == 0]


# ---------------------------------------------------------------------------
# Driver-side final reduction of per-batch partials.
#
# The scatter stages emit PRE-AGGREGATED partials (≤ one row per distinct
# key per batch). Merging those partials is a combiner-tree final step:
# when the keyed result is node-vector-sized (the dataflow path's standing
# assumption) it is cheapest on the driver as one vectorized numpy pass —
# no shuffle, no aggregator actors. `reduce="shuffle"` in the harness
# keeps the distributed groupby alternative for node tables beyond driver
# memory.
# ---------------------------------------------------------------------------


def unique_inverse(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Drop-in replacement for 1-D ``np`` ``unique(..., return_inverse=True)``.

    One stable argsort (radix for int dtypes) + mask + inverse scatter.
    numpy 1.26's ``return_inverse`` path argsorts with quicksort, which
    is ~13x slower than radix on large random int64 (measured interleaved
    on this host; BENCH/BASELINE.md) — and this pattern sits in nearly
    every per-batch combiner, so it IS the hot path."""
    if a.shape[0] == 0:
        return a[:0].copy(), np.empty(0, np.int64)
    o = np.argsort(a, kind="stable")
    s = a[o]
    newu = np.empty(s.shape[0], dtype=bool)
    newu[0] = True
    np.not_equal(s[1:], s[:-1], out=newu[1:])
    gid = np.cumsum(newu) - 1
    inv = np.empty(a.shape[0], dtype=np.int64)
    inv[o] = gid
    return s[newu], inv


def community_postprocess(
    node_ids: np.ndarray,
    values: np.ndarray,
    consecutive_ids: bool = False,
    min_community_size: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """GDS community-output options [GDS-pub: config/CommunitySizeConfig,
    ConsecutiveIdsConfig]: ``minCommunitySize`` drops nodes whose
    community has fewer members from the stream/write output;
    ``consecutiveIds`` renumbers the surviving communities 0..k-1
    (ascending original-id order, so deterministic). Filter runs first,
    renumber second. Returns (node_ids, values, kept_mask) with
    kept_mask=None when no filtering happened."""
    mask = None
    if min_community_size is not None and int(min_community_size) > 1 and values.size:
        u, inv = unique_inverse(values)
        counts = np.bincount(inv, minlength=u.shape[0])
        mask = counts[inv] >= int(min_community_size)
        node_ids, values = node_ids[mask], values[mask]
    if consecutive_ids and values.size:
        _, values = unique_inverse(values)
    return node_ids, values, mask


def merge_sum(t: pa.Table, key: str, val: str) -> tuple[np.ndarray, np.ndarray]:
    ids = t.column(key).to_numpy(zero_copy_only=False)
    vals = t.column(val).to_numpy(zero_copy_only=False)
    u, inv = unique_inverse(ids)
    return u, np.bincount(inv, weights=vals, minlength=u.shape[0])


def merge_min(t: pa.Table, key: str, val: str) -> tuple[np.ndarray, np.ndarray]:
    ids = t.column(key).to_numpy(zero_copy_only=False)
    vals = t.column(val).to_numpy(zero_copy_only=False)
    u, inv = unique_inverse(ids)
    out = np.full(u.shape[0], np.iinfo(np.int64).max, dtype=vals.dtype)
    np.minimum.at(out, inv, vals)
    return u, out


def group_pairs(k1: np.ndarray, k2: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized 2-key grouping WITHOUT ``np.unique(axis=0)`` (whose
    void-dtype view is ~10x slower than a lexsort at 10M+ rows).

    Returns (order, unique_k1, unique_k2, gid) where ``gid[i]`` is the
    group index of row ``order[i]`` and groups are sorted by (k1, k2)."""
    order = np.lexsort((k2, k1))
    s1, s2 = k1[order], k2[order]
    if s1.shape[0] == 0:
        return order, s1, s2, np.empty(0, np.int64)
    new = np.r_[True, (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])]
    gid = np.cumsum(new) - 1
    return order, s1[new], s2[new], gid


def merge_sums2(
    t: pa.Table, keys: tuple[str, str], vals: list[str]
) -> tuple[np.ndarray, np.ndarray, list[np.ndarray]]:
    """Sum several value columns per (key1, key2) with ONE lexsort."""
    k1 = t.column(keys[0]).to_numpy(zero_copy_only=False)
    k2 = t.column(keys[1]).to_numpy(zero_copy_only=False)
    order, u1, u2, gid = group_pairs(k1, k2)
    n = u1.shape[0]
    sums = [
        np.bincount(gid, weights=t.column(v).to_numpy(zero_copy_only=False)[order],
                    minlength=n)
        for v in vals
    ]
    return u1, u2, sums


def merge_sum2(t: pa.Table, keys: tuple[str, str], val: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    u1, u2, sums = merge_sums2(t, keys, [val])
    return u1, u2, sums[0]
