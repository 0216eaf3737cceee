"""The iteration harness — this engine's Pregel-equivalent extension point.

The reference exposes a Pregel API (init/compute/messages, vote-to-halt)
as its user-extension surface (SURVEY.md §2.11). Ours is dataflow-shaped:
an iterative algorithm is

    state ──ray.put──▶ edges.map_batches(make_stage(state))   # scatter
          ──groupby(key).aggregate(aggs)──▶ gathered          # gather
          ──apply_fn(state, gathered)──▶ new state, residual  # apply

run until ``residual <= tolerance`` or ``max_iterations``. WCC and label
propagation are ~30-line instantiations (wcc.py / labelprop.py);
PageRank (pagerank.py) follows the same shape with a specialized
scatter. Each iteration optionally checkpoints per-partition state with
a lineage manifest (checkpoint.py).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.algos.common import BlockScanner, collect_arrow
from graph_data_science_ray.algos.pagerank import IterativeResult
from graph_data_science_ray.checkpoint import CheckpointManager
from graph_data_science_ray.context import configure_ray_data, shuffle_partitions_for


def pregel(
    edges: Dataset,
    send: Callable[[np.ndarray, pa.Table], np.ndarray],
    update: Callable[[np.ndarray, np.ndarray, np.ndarray, np.ndarray], np.ndarray],
    init: "float | int | np.ndarray | Callable[[np.ndarray], np.ndarray]" = 0.0,
    combine: str = "sum",
    master: Callable[[np.ndarray], np.ndarray] | None = None,
    vote_to_halt: bool = False,
    max_iterations: int = 20,
    tolerance: float = 0.0,
    value_name: str = "value",
    node_ids: np.ndarray | None = None,
    checkpoint: CheckpointManager | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
    reduce: str = "driver",
    backend: str = "dataflow",
    engine=None,
    num_shards: int | None = None,
    weighted: bool = False,
    aux: dict | None = None,
    wants_ctx: bool = False,
    on_global=None,
    master_partial=None,
    master_finish=None,
) -> IterativeResult:
    """GDS-Pregel-parity user extension surface (SURVEY.md §2.11; the
    reference exposes init/compute/sendToNeighbors/voteToHalt plus
    masterCompute as ITS extension API). The dataflow mapping, all hooks
    user-supplied and vectorized:

    - ``init``: scalar fill, per-node array, or ``f(node_ids) → array``
      (GDS ``init``; dtype decides int/float residual semantics).
    - ``send(src_state_per_edge, edge_batch) → message value per edge``
      (GDS ``compute`` + ``sendToNeighbors``): an arbitrary numpy kernel
      over the source states and the batch's edge columns (weights,
      properties …).
    - ``combine``: "sum" | "min" | "max" — the message combiner (GDS
      ``Reducer``), applied BOTH within each scatter batch and in the
      gather, so the shuffle only moves pre-combined partials.
    - ``update(state, combined, has_msg, node_ids) → new state`` (GDS
      ``compute`` on received messages): vectorized over ALL nodes;
      ``has_msg`` marks nodes that received any message this round.
    - ``master`` (GDS ``masterCompute``): optional global step applied
      to the full state vector after every round (normalization,
      global thresholds …).
    - ``vote_to_halt``: every node halts unless its value changed; a
      changed neighbor's messages reactivate it next round (the
      frontier semantics monotone algorithms want — only active
      sources scatter). Without it, every node computes every round.

    Residual: max |Δ| for float state, #changed for int state; the run
    halts at ``residual <= tolerance`` or ``max_iterations``. Returns an
    ``IterativeResult``, so stream/stats/mutate/write and the estimate
    gate (pipelines/modes) come for free — mode parity with GDS Pregel.

    Scale shape: ``backend="dataflow"`` (default) broadcasts the state
    vector via ``ray.put`` with per-batch combiners (``reduce="shuffle"``
    for the beyond-driver gather); ``backend="csr"`` is the SHARDED-STATE
    path — the same hooks run inside the CSR shard actors
    (state/engine.CsrEngine.pregel), node state never touches the
    driver, messages ride the static values-only exchange, and global
    steps are two-phase ``master_partial``/``master_finish`` (per-shard
    partial → driver scalar reduce → per-shard finish) instead of the
    full-vector ``master``. ``aux`` registers persistent per-node
    accumulator arrays and ``wants_ctx=True`` passes the update hook a
    ctx (superstep number, aux dict, ``emit_global`` slot consumed
    driver-side by ``on_global``) — GDS ``ComputeContext`` parity. Both
    backends run identical hook math (parity-tested)."""
    from ray.data.aggregate import Max, Min, Sum

    from graph_data_science_ray.algos.common import merge_min, merge_sum, unique_inverse

    if backend == "csr":
        if master is not None:
            # also when master_finish IS given: silently dropping master
            # would make the two backends diverge for that hook combo
            raise ValueError(
                "backend='csr' needs the two-phase master_partial/master_finish "
                "(a full-vector master would materialize state on the driver)"
            )
        built_engine = engine is None
        if engine is None:
            from graph_data_science_ray.state.engine import CsrEngine

            engine = CsrEngine.build(
                edges, num_shards=num_shards or 8, weighted=weighted
            )
        if isinstance(init, np.ndarray) and node_ids is None:
            raise ValueError("backend='csr' with ndarray init needs node_ids "
                             "(the array's alignment)")
        if isinstance(init, np.ndarray) and node_ids is not None:
            glob_ids, glob_init = node_ids, init

            def init(ids, _gi=glob_ids, _gv=glob_init):  # noqa: F811
                return _gv[np.searchsorted(_gi, ids)]
        res = engine.pregel(
            send, update, init, combine=combine,
            max_iterations=max_iterations, tolerance=tolerance,
            value_name=value_name, aux=aux, wants_ctx=wants_ctx,
            frontier=vote_to_halt and combine == "or",
            master_partial=master_partial, master_finish=master_finish,
            on_global=on_global,
            checkpoint=checkpoint, resume=resume,
        )
        if built_engine:
            # internally-built engine: release the 8 shard actors NOW
            # (shutdown drains, so the result refs are already in plasma;
            # handle-drop GC would leave idle actors spinning CPU)
            engine.shutdown()
        return res
    if combine not in ("sum", "min", "max"):
        raise ValueError("combine must be sum|min|max")
    if master_finish is not None:
        # run the two-phase global step as the single-partition case so
        # both backends execute identical math
        _mp, _mf = master_partial, master_finish
        user_master = master

        def master(v, _mp=_mp, _mf=_mf, _um=user_master):  # noqa: F811
            v = _mf(v, _mp(v))
            return _um(v) if _um is not None else v

    configure_ray_data()
    edges = edges.materialize()
    if node_ids is None:
        from graph_data_science_ray.algos.common import unique_node_ids

        node_ids = unique_node_ids(edges)
    if callable(init):
        init_arr = np.asarray(init(node_ids))
    elif isinstance(init, np.ndarray):
        init_arr = init
    else:
        init_arr = np.full(
            node_ids.shape[0], init,
            dtype=np.int64 if isinstance(init, (int, np.integer)) else np.float64,
        )
    is_int = np.issubdtype(init_arr.dtype, np.integer)

    def make_stage(state_ref):
        def fn(batch: pa.Table) -> pa.Table:
            got = ray.get(state_ref)
            ids, st = got[0], got[1]
            changed = got[2] if len(got) > 2 else None
            src = batch.column("src_id").to_numpy(zero_copy_only=False)
            spos = np.minimum(np.searchsorted(ids, src), ids.shape[0] - 1)
            if changed is not None:
                act = changed[spos]
                if not act.any():
                    return pa.table(
                        {"node_id": pa.array([], pa.int64()),
                         "msg": pa.array([], pa.from_numpy_dtype(st.dtype))}
                    )
                batch = batch.filter(pa.array(act))
                spos = spos[act]
            msg = st[spos] if send is None else np.asarray(send(st[spos], batch))
            dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
            keep = np.isfinite(msg) if not is_int else np.ones(msg.shape[0], bool)
            dst, msg = dst[keep], msg[keep]
            u, inv = unique_inverse(dst)
            if combine == "sum":
                agg = np.bincount(inv, weights=msg, minlength=u.shape[0]).astype(msg.dtype)
            else:
                fill = (np.iinfo(np.int64).max if is_int else np.inf)
                agg = np.full(u.shape[0], fill if combine == "min" else -fill, dtype=msg.dtype)
                (np.minimum if combine == "min" else np.maximum).at(agg, inv, msg)
            return pa.table({"node_id": pa.array(u, pa.int64()), "msg": pa.array(agg)})

        return fn

    def gather_aggs():
        return [
            {"sum": Sum, "min": Min, "max": Max}[combine]("msg", alias_name="msg")
        ]

    def driver_reduce(partials: pa.Table) -> pa.Table:
        if partials.num_rows == 0 or "node_id" not in partials.column_names:
            return pa.table({"node_id": pa.array([], pa.int64()),
                             "msg": pa.array([], pa.from_numpy_dtype(init_arr.dtype))})
        if combine == "sum":
            u, v = merge_sum(partials, "node_id", "msg")
        elif combine == "min":
            u, v = merge_min(partials, "node_id", "msg")
        else:
            neg = pa.table({"node_id": partials.column("node_id"),
                            "msg": pa.array(-partials.column("msg").to_numpy(
                                zero_copy_only=False))})
            u, v = merge_min(neg, "node_id", "msg")
            v = -v
        return pa.table({"node_id": pa.array(u, pa.int64()), "msg": pa.array(v)})

    aux_arrays = (
        {
            k: (np.asarray(v(node_ids)).copy() if callable(v)
                else np.full(node_ids.shape[0], v,
                             dtype=np.int64 if isinstance(v, (int, np.integer))
                             else np.float64))
            for k, v in aux.items()
        }
        if aux is not None
        else None
    )
    it_box = [0]  # apply_fn runs once per iteration, in order

    def apply_fn(state, gathered, ids):
        combined = np.zeros(ids.shape[0], dtype=state.dtype)
        has_msg = np.zeros(ids.shape[0], dtype=bool)
        if gathered.num_rows and "node_id" in gathered.column_names:
            g_ids = gathered.column("node_id").to_numpy(zero_copy_only=False)
            g_vals = gathered.column("msg").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ids, g_ids)
            combined[pos] = g_vals.astype(state.dtype)
            has_msg[pos] = True
        if wants_ctx:
            import types

            ctx = types.SimpleNamespace(
                iteration=it_box[0], aux=aux_arrays, node_ids=ids, emit_global=None
            )
            new = np.asarray(update(state, combined, has_msg, ids, ctx), dtype=state.dtype)
            if on_global is not None and ctx.emit_global is not None:
                on_global(it_box[0], [ctx.emit_global])
        else:
            new = np.asarray(update(state, combined, has_msg, ids), dtype=state.dtype)
        it_box[0] += 1
        if master is not None:
            new = np.asarray(master(new), dtype=state.dtype)
        if is_int:
            residual = float((new != state).sum())
        else:
            residual = float(np.abs(new - state).max()) if ids.shape[0] else 0.0
        return new, residual

    return run_iterative(
        edges=edges,
        node_ids=node_ids,
        init=init_arr,
        make_stage=make_stage,
        gather_key="node_id",
        gather_aggs=gather_aggs,
        apply_fn=apply_fn,
        max_iterations=max_iterations,
        tolerance=tolerance,
        value_name=value_name,
        checkpoint=checkpoint,
        resume=resume,
        num_partitions=num_partitions,
        materialize_edges=False,
        reduce=reduce,
        driver_reduce=driver_reduce,
        pass_frontier=vote_to_halt,
    )


def run_iterative(
    edges: Dataset,
    node_ids: np.ndarray,
    init: np.ndarray,
    make_stage: Callable[[ray.ObjectRef], Callable[[pa.Table], pa.Table]],
    gather_key: str | list[str],
    gather_aggs: Callable[[], list],
    apply_fn: Callable[[np.ndarray, pa.Table, np.ndarray], tuple[np.ndarray, float]],
    max_iterations: int,
    tolerance: float = 0.0,
    value_name: str = "value",
    checkpoint: CheckpointManager | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
    materialize_edges: bool = True,
    reduce: str = "driver",
    driver_reduce: Callable[[pa.Table], pa.Table] | None = None,
    pass_frontier: bool = False,
) -> IterativeResult:
    """``reduce``: how the pre-aggregated scatter partials are combined.

    - "driver" (default): collect partials (≤ one row per key per batch)
      and merge with one vectorized numpy pass via ``driver_reduce`` —
      no shuffle; right whenever the node vector fits the driver, which
      is this implementation's standing assumption (algos/common.py).
    - "shuffle": a distributed ``groupby(key).aggregate`` hash shuffle —
      the scale path for node tables beyond driver memory; identical
      results (tested).

    ``pass_frontier``: broadcast ``(node_ids, state, changed)`` instead
    of ``(node_ids, state)`` — ``changed`` marks nodes whose value moved
    last round (all-True on round one and after resume). Correct for
    monotone operators (min-relaxation, OR-accumulation) where only a
    changed node can further improve its neighbors; turns O(rounds · m)
    total scatter volume into O(m) for BFS-like frontiers.
    """
    configure_ray_data()
    if materialize_edges:
        edges = edges.materialize()
    n = node_ids.shape[0]
    num_partitions = num_partitions or shuffle_partitions_for(n)

    state = init.copy()
    start_iter = 0
    if checkpoint is not None and resume:
        latest = checkpoint.latest()
        if latest is not None:
            it, ids, vals, _ = latest
            assert np.array_equal(ids, node_ids), "checkpoint node universe mismatch"
            state = vals.astype(init.dtype)
            start_iter = it + 1

    metrics: list[dict] = []
    converged = False
    iteration = start_iter - 1
    changed = np.ones(n, dtype=bool)
    # driver-reduce rounds scan the snapshot of edge blocks with plain
    # ray.remote tasks (BlockScanner) — a full map_batches stage launch
    # per round costs ~1-3 s of executor setup on this host, which
    # dominates every small/medium iterative job
    scanner = BlockScanner(edges) if (reduce == "driver" and driver_reduce is not None) else None
    for iteration in range(start_iter, max_iterations):
        state_ref = ray.put(
            (node_ids, state, changed) if pass_frontier else (node_ids, state)
        )
        if scanner is not None:
            gathered = driver_reduce(scanner.scan(make_stage(state_ref)))
        else:
            emitted = edges.map_batches(
                make_stage(state_ref), batch_format="pyarrow", zero_copy_batch=True
            )
            gathered_ds = emitted.groupby(gather_key, num_partitions=num_partitions).aggregate(
                *gather_aggs()
            )
            gathered = collect_arrow(gathered_ds)
        prev = state
        state, residual = apply_fn(state, gathered, node_ids)
        if pass_frontier:
            changed = state != prev  # inf != inf is False ⇒ unreached stay out
        metrics.append({"iteration": iteration, "residual": residual})
        if checkpoint is not None:
            checkpoint.write_iteration(iteration, node_ids, state, {"residual": residual})
        if residual <= tolerance:
            converged = True
            break

    return IterativeResult(
        node_ids=node_ids,
        values=state,
        value_name=value_name,
        iterations=iteration + 1,
        converged=converged,
        metrics=metrics,
    )
