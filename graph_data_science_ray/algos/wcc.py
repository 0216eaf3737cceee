"""Weakly connected components — iterative min-label hash shuffle.

Reference semantics (Neo4j GDS WCC, public docs): components of the
undirected view; each node reports a componentId; the partition (not the
specific ids) is the contract. We canonicalize componentId = min node_id
in the component, which is stable and matches the networkx oracle after
the same canonicalization (FIXTURES.md §3).

Implementation: min-label propagation on the symmetrized edge table —
per iteration each node's label becomes min(own, labels of neighbors);
one ``groupby(node).min`` shuffle per iteration, with a within-batch
min-combiner before the shuffle. Converges in O(diameter) iterations;
web graphs have small effective diameter, and the per-iteration volume
shrinks as labels stabilize (only changed labels need re-emission — kept
simple here by re-emitting all, which keeps iterations idempotent and
checkpoints self-contained).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Min

from graph_data_science_ray.algos.common import unique_inverse, unique_node_ids
from graph_data_science_ray.algos.iterate import run_iterative
from graph_data_science_ray.algos.pagerank import IterativeResult
from graph_data_science_ray.checkpoint import CheckpointManager
from graph_data_science_ray.sources.edges import symmetrize


def _make_stage(state_ref):
    def fn(batch: pa.Table) -> pa.Table:
        ids, labels, frontier = ray.get(state_ref)
        src = batch.column("src_id").to_numpy(zero_copy_only=False)
        dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
        sp = np.minimum(np.searchsorted(ids, src), ids.shape[0] - 1)
        # frontier-limited: only a label that DECREASED last round can
        # decrease a neighbor (min-propagation is monotone)
        active = frontier[sp]
        src, dst, sp = src[active], dst[active], sp[active]
        if src.shape[0] == 0:
            return pa.schema([("node_id", pa.int64()), ("nbr_min", pa.int64())]).empty_table()
        src_label = labels[sp]
        # within-batch combiner: min src-label per dst before the shuffle
        u_dst, inv = unique_inverse(dst)
        best = np.full(u_dst.shape[0], np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(best, inv, src_label)
        return pa.table(
            {"node_id": pa.array(u_dst, pa.int64()), "nbr_min": pa.array(best, pa.int64())}
        )

    return fn


def _apply(state: np.ndarray, gathered: pa.Table, node_ids: np.ndarray):
    new = state.copy()
    if gathered.num_rows:
        ids = gathered.column("node_id").to_numpy(zero_copy_only=False)
        mins = gathered.column("nbr_min").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(node_ids, ids)
        np.minimum.at(new, pos, mins)
    changed = int((new != state).sum())
    return new, float(changed)


def _driver_reduce(partials: pa.Table) -> pa.Table:
    from graph_data_science_ray.algos.common import merge_min

    if partials.num_rows == 0:
        return partials
    ids, mins = merge_min(partials, "node_id", "nbr_min")
    return pa.table({"node_id": pa.array(ids, pa.int64()), "nbr_min": pa.array(mins, pa.int64())})


def wcc(
    edges: Dataset,
    max_iterations: int = 100,
    checkpoint: CheckpointManager | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
    pre_symmetrized: bool = False,
    reduce: str = "driver",
    seeds: dict[int, int] | None = None,
    threshold: float | None = None,
    consecutive_ids: bool = False,
    min_component_size: int | None = None,
) -> IterativeResult:
    """Component id per node (= min node_id in its component).
    ``seeds``: GDS seedProperty equivalent — initial label per node id
    (unlisted nodes start from their own id). ``threshold``: GDS's
    weight cutoff — relationships with ``weight`` ≤ threshold are
    ignored for propagation, but their endpoints stay in the node
    universe (they report their own component).

    Symmetrization skips deduplication: the min aggregate is idempotent
    under parallel edges, and the dedup shuffle would cost more than the
    duplicate emissions the within-batch combiner absorbs."""
    und = edges if pre_symmetrized else symmetrize(
        edges, dedup=False, num_partitions=num_partitions
    )
    und = und.materialize()
    node_arr = unique_node_ids(und)
    if threshold is not None:
        thr = float(threshold)

        def above(t: pa.Table) -> pa.Table:
            w = t.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
            return t.filter(pa.array(w > thr))

        und = und.map_batches(above, batch_format="pyarrow", zero_copy_batch=True).materialize()
    init = node_arr.copy()
    if seeds:
        sk = np.asarray(sorted(seeds), dtype=np.int64)
        sv = np.asarray([seeds[k] for k in sk.tolist()], dtype=np.int64)
        pos = np.searchsorted(node_arr, sk)
        ok = (pos < node_arr.shape[0]) & (node_arr[np.minimum(pos, node_arr.shape[0] - 1)] == sk)
        init[pos[ok]] = sv[ok]
    res = run_iterative(
        edges=und,
        node_ids=node_arr,
        init=init,
        make_stage=_make_stage,
        gather_key="node_id",
        gather_aggs=lambda: [Min("nbr_min", alias_name="nbr_min")],
        apply_fn=_apply,
        max_iterations=max_iterations,
        tolerance=0.0,  # converged when zero labels changed
        value_name="component",
        checkpoint=checkpoint,
        resume=resume,
        num_partitions=num_partitions,
        materialize_edges=False,
        reduce=reduce,
        driver_reduce=_driver_reduce,
        pass_frontier=True,
    )
    if consecutive_ids or min_component_size is not None:
        # GDS consecutiveIds / minComponentSize output options
        # (renumber 0..k-1 ascending min-id order / drop small components)
        from graph_data_science_ray.algos.common import community_postprocess

        res.node_ids, res.values, _ = community_postprocess(
            res.node_ids, res.values, consecutive_ids, min_component_size
        )
    return res


# ---------------------------------------------------------------------------
# Large-star / small-star WCC (Kiveris et al., "Connected Components in
# MapReduce and Beyond", SoCC'14) — the beyond-driver-memory path.
#
# Unlike `wcc` above (min-label over a driver-held node vector, rounds =
# graph diameter), this variant keeps ALL state in the edge list itself:
# each round rewrites the pair set via two per-node grouped transforms,
# converging to star graphs rooted at each component's minimum id in
# O(log n) rounds. Every step is a functions/shuffle.bucketed_merge hash
# shuffle + vectorized per-bucket merge; the driver holds two scalars
# (distinct-pair count + order-independent checksum) per cycle. This is
# the WCC that still works when the node vector no longer fits anywhere.
# ---------------------------------------------------------------------------


def _pairs_min_first(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """sorted-by-(a,b) arrays + group-first mask for a 2-col pair table."""
    a = t.column("a").to_numpy(zero_copy_only=False)
    b = t.column("b").to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    first = np.r_[True, a[1:] != a[:-1]]
    return a, b, first


def _distinct_pairs(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    if a.shape[0] == 0:
        return a, b
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    return a[keep], b[keep]


def _pair_table(a: np.ndarray, b: np.ndarray) -> pa.Table:
    return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})


_EMPTY_PAIRS = {"a": -1, "b": -1}


def _large_star(pairs: Dataset, num_partitions: int | None):
    """Group the SYMMETRIC view by node u; with m = min(N(u) ∪ {u}),
    emit (v, m) for each neighbor v > u. Output stays ≤ one row per
    input undirected pair and is always oriented hi→lo."""
    from graph_data_science_ray.functions.shuffle import bucketed_merge

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": pa.array(np.concatenate([a, b]), pa.int64()),
                "b": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    sym = pairs.map_batches(both_dirs, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _pair_table(np.empty(0, np.int64), np.empty(0, np.int64))
        a, b, firstm = _pairs_min_first(g)
        # m per group: min(first b in sorted order, u)
        m_grp = np.minimum(b[firstm], a[firstm])
        m = np.repeat(m_grp, np.diff(np.r_[np.flatnonzero(firstm), a.shape[0]]))
        keep = b > a
        return _pair_table(*_distinct_pairs(b[keep], m[keep]))

    return bucketed_merge(sym, ["a"], merge, sentinel_row=_EMPTY_PAIRS, num_partitions=num_partitions)


def _small_star(pairs: Dataset, num_partitions: int | None):
    """Pairs arrive oriented (hi, lo). Group by hi=u; with m = min
    neighbor, emit (u, m) and (v, m) for the other small neighbors."""
    from graph_data_science_ray.functions.shuffle import bucketed_merge

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _pair_table(np.empty(0, np.int64), np.empty(0, np.int64))
        a, b, firstm = _pairs_min_first(g)
        counts = np.diff(np.r_[np.flatnonzero(firstm), a.shape[0]])
        m_grp = b[firstm]  # all b < a, so the group min IS min(N∪{u})
        m = np.repeat(m_grp, counts)
        keep = b != m
        out_a = np.concatenate([a[firstm], b[keep]])
        out_b = np.concatenate([m_grp, m[keep]])
        return _pair_table(*_distinct_pairs(out_a, out_b))

    return bucketed_merge(pairs, ["a"], merge, sentinel_row=_EMPTY_PAIRS, num_partitions=num_partitions)


def _dedup_pairs(pairs: Dataset, num_partitions: int | None):
    from graph_data_science_ray.functions.shuffle import bucketed_merge

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _pair_table(np.empty(0, np.int64), np.empty(0, np.int64))
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        return _pair_table(*_distinct_pairs(a, b))

    return bucketed_merge(
        pairs, ["a", "b"], merge, sentinel_row=_EMPTY_PAIRS, num_partitions=num_partitions
    )


def _pairs_signature(pairs: Dataset) -> tuple[int, int]:
    """(count, order-independent checksum) over a DISTINCT pair dataset."""

    def partial(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.uint64)
        x = a * np.uint64(0x9E3779B97F4A7C15) ^ (b + np.uint64(0x85EBCA6B))
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        return pa.table(
            {
                "n": pa.array([int(a.shape[0])], pa.int64()),
                "h": pa.array([int(x.sum(dtype=np.uint64)) & ((1 << 63) - 1)], pa.int64()),
            }
        )

    from graph_data_science_ray.algos.common import collect_arrow

    t = collect_arrow(pairs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    if t.num_rows == 0:
        return 0, 0
    n = int(t.column("n").to_numpy().sum())
    h = int(t.column("h").to_numpy(zero_copy_only=False).astype(np.uint64).sum(dtype=np.uint64)) & ((1 << 63) - 1)
    return n, h


def wcc_star(
    edges: Dataset,
    max_cycles: int = 64,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> Dataset:
    """Fully-distributed WCC: returns a (node_id, component) Dataset with
    component = the component's minimum node id (same contract as
    ``wcc``). See the module-bottom block comment for the algorithm.

    ``checkpoint_dir``: per-cycle edge-list checkpoints — each completed
    cycle writes its deduped pair set as parquet under ``cycle=K/`` plus
    a ``MANIFEST.json`` (cycle, count, checksum) committed LAST, so a
    killed run resumes (``resume=True``) from the latest complete cycle
    and the restart is bitwise-identical to an uninterrupted run (the
    pair set IS the whole algorithm state)."""
    from graph_data_science_ray.context import configure_ray_data
    from graph_data_science_ray.functions.shuffle import bucketed_merge

    configure_ray_data()

    def init_orient(t: pa.Table) -> pa.Table:
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        dst = t.column("dst_id").to_numpy(zero_copy_only=False)
        keep = src != dst
        hi = np.maximum(src[keep], dst[keep])
        lo = np.minimum(src[keep], dst[keep])
        # self-loop-only nodes must still appear in the result
        selfs = np.unique(src[~keep])
        return pa.table(
            {
                "a": pa.array(np.concatenate([hi, selfs]), pa.int64()),
                "b": pa.array(np.concatenate([lo, selfs]), pa.int64()),
            }
        )

    pairs = _dedup_pairs(
        edges.map_batches(init_orient, batch_format="pyarrow", zero_copy_batch=True),
        num_partitions,
    ).materialize()

    def drop_selfs(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(a != b))

    def only_selfs(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(a == b))

    singletons = pairs.map_batches(only_selfs, batch_format="pyarrow", zero_copy_batch=True)
    work = pairs.map_batches(drop_selfs, batch_format="pyarrow", zero_copy_batch=True).materialize()

    start_cycle = 0
    if checkpoint_dir is not None:
        import json
        import os

        os.makedirs(checkpoint_dir, exist_ok=True)
        if resume:
            import ray.data as _rd

            done = []
            for d in os.listdir(checkpoint_dir):
                mf = os.path.join(checkpoint_dir, d, "MANIFEST.json")
                if d.startswith("cycle=") and os.path.exists(mf):
                    done.append((int(d.split("=")[1]), mf))
            if done:
                cyc, mf = max(done)
                work = _rd.read_parquet(os.path.join(checkpoint_dir, f"cycle={cyc}", "pairs")).materialize()
                start_cycle = cyc + 1

    sig = _pairs_signature(work)
    for cycle in range(start_cycle, max_cycles):
        stepped = _small_star(_large_star(work, num_partitions), num_partitions)
        work = _dedup_pairs(stepped, num_partitions).materialize()
        new_sig = _pairs_signature(work)
        if checkpoint_dir is not None:
            import json
            import os

            cdir = os.path.join(checkpoint_dir, f"cycle={cycle}")
            os.makedirs(cdir, exist_ok=True)
            work.write_parquet(os.path.join(cdir, "pairs"))
            with open(os.path.join(cdir, "MANIFEST.json"), "w") as f:
                json.dump({"cycle": cycle, "count": new_sig[0], "checksum": new_sig[1]}, f)
        if new_sig == sig:
            break
        sig = new_sig

    # star edges (v, root) → rows (v, root) ∪ (root, root) ∪ singletons,
    # min-merged per node (a self-loop node with real edges resolves to
    # its component root)
    def explode(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": pa.array(np.concatenate([a, b]), pa.int64()),
                "b": pa.array(np.concatenate([b, b]), pa.int64()),
            }
        )

    def min_per_node(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"node_id": pa.array([], pa.int64()), "component": pa.array([], pa.int64())}
            )
        a, b, firstm = _pairs_min_first(g)
        return pa.table(
            {
                "node_id": pa.array(a[firstm], pa.int64()),
                "component": pa.array(b[firstm], pa.int64()),
            }
        )

    allrows = work.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True).union(
        singletons
    )
    return bucketed_merge(
        allrows, ["a"], min_per_node, sentinel_row=_EMPTY_PAIRS, num_partitions=num_partitions
    )
