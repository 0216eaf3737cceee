"""Distributed equi-joins for the engine (SURVEY.md §2.4).

``Dataset.join`` in Ray 2.49.2 crashes when a hash partition receives zero
blocks on one side (its aggregator builds an empty, schema-less Arrow
table and ``pyarrow.Table.join`` then fails on the missing key field) —
easy to hit with skewed or small inputs. This module implements the
portable partitioned-hash-join pattern instead:

    1. both sides are tagged and projected onto the union schema
       (absent columns become typed nulls),
    2. a deterministic ``__bucket = mix(key) % B`` column is added,
    3. one ``groupby(__bucket)`` hash shuffle co-locates both sides,
    4. each bucket is joined locally with ``pyarrow.Table.join``
       (zero-copy, C++), empty sides included — schemas are always
       concrete because they derive from the union schema.

Also provides ``broadcast_join`` — the small-side pattern: ``ray.put``
the small table once, map over the big side with a vectorized lookup; no
shuffle at all (SURVEY.md §2.4 "broadcast small side").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.context import configure_ray_data, shuffle_partitions_for

_PA_JOIN_TYPE = {
    "inner": "inner",
    "left_outer": "left outer",
    "right_outer": "right outer",
    "full_outer": "full outer",
    "left_semi": "left semi",
    "left_anti": "left anti",
}


def _mix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _key_hash(t: pa.Table, keys: list[str]) -> np.ndarray:
    h = np.zeros(t.num_rows, dtype=np.uint64)
    for k in keys:
        col = t.column(k)
        if pa.types.is_integer(col.type):
            v = col.to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            # string keys: stable per-value hash via dictionary encoding +
            # python hash of uniques (few uniques per batch in practice)
            import hashlib

            enc = col.combine_chunks().dictionary_encode()
            uniq = enc.dictionary.to_pylist()
            uh = np.array(
                [
                    int.from_bytes(hashlib.sha256(str(s).encode()).digest()[:8], "big")
                    for s in uniq
                ],
                dtype=np.uint64,
            ).astype(np.int64)
            v = uh[enc.indices.to_numpy(zero_copy_only=False)]
        h = _mix64(h ^ _mix64(v))
    return h


def hash_join(
    left: Dataset,
    right: Dataset,
    on: list[str] | tuple[str, ...],
    join_type: str = "inner",
    num_partitions: int | None = None,
    post_fn=None,
) -> Dataset:
    """Partitioned hash join of two Datasets on shared key column names.

    Non-key column names must be disjoint between the sides (project /
    rename first — deliberate, same contract as the reference's explicit
    projections).

    ``post_fn(joined: pa.Table) -> pa.Table``: optional per-PARTITION
    transform applied inside the join task, BEFORE Ray's dynamic block
    splitting can carve an oversized output into multiple blocks — the
    only place a consumer can rely on "all rows of a key are in one
    table" (downstream ``map_batches(batch_size=None)`` sees post-split
    blocks, which breaks that invariant exactly in the wide-payload
    regime)."""
    configure_ray_data()
    on = list(on)
    num_partitions = num_partitions or shuffle_partitions_for()
    l_schema = left.schema()
    r_schema = right.schema()
    l_names = list(l_schema.names)
    r_names = list(r_schema.names)
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    overlap = (set(l_names) & set(r_names)) - set(on)
    if overlap:
        raise ValueError(f"non-key column name overlap: {overlap}")
    union_fields = [(n, l_types[n]) for n in l_names] + [
        (n, r_types[n]) for n in r_names if n not in on
    ]

    def _project(side: int):
        own = l_names if side == 0 else r_names

        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {}
            for name, typ in union_fields:
                if name in own and name in t.column_names:
                    cols[name] = t.column(name).cast(typ)
                else:
                    cols[name] = pa.nulls(n, typ)
            cols["__side"] = pa.array(np.full(n, side, dtype=np.int8), pa.int8())
            cols["__bucket"] = pa.array(
                (_key_hash(t, on) % np.uint64(num_partitions)).astype(np.int64), pa.int64()
            )
            return pa.table(cols)

        return fn

    # keep-alive sentinels (same guard as functions/shuffle.bucketed_merge,
    # round-3 strengthening): all-null rows with __side=2 whose
    # out-of-range bucket values COVER EVERY SHUFFLE PARTITION, so the
    # groupby never finalizes a schema-less partition even when Ray's
    # once-only schema broadcast was burned by a 0-row first block;
    # join_bucket's side-0/side-1 filters drop them for free
    from graph_data_science_ray.functions.shuffle import _partition_covering_buckets

    _sb = _partition_covering_buckets(num_partitions)
    sent_cols: dict = {
        name: pa.nulls(_sb.shape[0], typ) for name, typ in union_fields
    }
    sent_cols["__side"] = pa.array(np.full(_sb.shape[0], 2, np.int8), pa.int8())
    sent_cols["__bucket"] = pa.array(_sb, pa.int64())
    import ray.data as _rd

    combined = (
        left.map_batches(_project(0), batch_format="pyarrow")
        .union(right.map_batches(_project(1), batch_format="pyarrow"))
        .union(_rd.from_arrow(pa.table(sent_cols)))
    )

    pa_join = _PA_JOIN_TYPE[join_type]
    l_all = l_names
    r_all = on + [n for n in r_names if n not in on]

    def join_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = group.column("__side")
        lt = group.filter(pc.equal(side, pa.scalar(0, pa.int8()))).select(l_all)
        rt = group.filter(pc.equal(side, pa.scalar(1, pa.int8()))).select(r_all)
        j = lt.join(rt, keys=on, join_type=pa_join)
        return post_fn(j) if post_fn is not None else j

    return combined.groupby("__bucket", num_partitions=num_partitions).map_groups(
        join_bucket, batch_format="pyarrow"
    )


def asof_join(
    left: Dataset,
    right: Dataset,
    key_col: str,
    ts_col: str,
    join_type: str = "inner",
    suffix: str = "_r",
    num_partitions: int | None = None,
) -> Dataset:
    """As-of join (backward): for each left row, attach the right row
    with the greatest ``ts_col`` ≤ the left row's, within the same
    ``key_col`` — DuckDB's ``ASOF JOIN`` / pandas ``merge_asof``
    semantics. ``join_type``: ``inner`` drops unmatched left rows,
    ``left`` keeps them with nulls.

    Right columns (except the key) come back suffixed. Ties on right
    ``ts_col`` resolve deterministically to the row that sorts last by
    the remaining right columns.

    Dataflow: ONE hash shuffle co-locating both sides by key (the same
    ``__bucket`` pattern hash_join uses), then a vectorized
    searchsorted per key group — per-KEY history must fit a worker
    (same partitioning assumption as session_windows)."""
    configure_ray_data()
    if join_type not in ("inner", "left"):
        raise ValueError("join_type must be 'inner' or 'left'")
    num_partitions = num_partitions or shuffle_partitions_for()
    l_schema = left.schema()
    r_schema = right.schema()
    l_names = list(l_schema.names)
    r_names = [n for n in r_schema.names if n != key_col]
    r_out = {n: (n + suffix if n in l_names or n == ts_col else n) for n in r_names}
    overlap = set(r_out.values()) & set(l_names)
    if overlap:
        raise ValueError(f"column name overlap after suffixing: {overlap}")
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    union_fields = [(n, l_types[n]) for n in l_names] + [
        (r_out[n], r_types[n]) for n in r_names
    ]

    def _project(side: int):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {}
            for name, typ in union_fields:
                src = None
                if side == 0 and name in t.column_names and name in l_names:
                    src = name
                elif side == 1:
                    orig = next((o for o, nn in r_out.items() if nn == name), None)
                    if orig is not None and orig in t.column_names:
                        src = orig
                    elif name == key_col and key_col in t.column_names:
                        src = key_col
                cols[name] = t.column(src).cast(typ) if src else pa.nulls(n, typ)
            if side == 1:
                cols[key_col] = t.column(key_col).cast(l_types[key_col])
            cols["__side"] = pa.array(np.full(n, side, dtype=np.int8), pa.int8())
            cols["__bucket"] = pa.array(
                (_key_hash(t, [key_col]) % np.uint64(num_partitions)).astype(np.int64),
                pa.int64(),
            )
            return pa.table(cols)

        return fn

    from graph_data_science_ray.functions.shuffle import _partition_covering_buckets

    _sb = _partition_covering_buckets(num_partitions)  # see hash_join's note
    sent_cols: dict = {name: pa.nulls(_sb.shape[0], typ) for name, typ in union_fields}
    sent_cols["__side"] = pa.array(np.full(_sb.shape[0], 2, np.int8), pa.int8())
    sent_cols["__bucket"] = pa.array(_sb, pa.int64())
    import ray.data as _rd

    combined = (
        left.map_batches(_project(0), batch_format="pyarrow")
        .union(right.map_batches(_project(1), batch_format="pyarrow"))
        .union(_rd.from_arrow(pa.table(sent_cols)))
    )

    r_ts_out = r_out[ts_col]
    r_val_names = [r_out[n] for n in r_names]

    def match_bucket(group: pa.Table) -> pa.Table:
        side = group.column("__side").to_numpy(zero_copy_only=False)
        lt = group.filter(pa.array(side == 0)).select(l_names)
        rt = group.filter(pa.array(side == 1)).select([key_col] + r_val_names)
        if lt.num_rows == 0 or (rt.num_rows == 0 and join_type == "inner"):
            empty_out = {n: lt.column(n).slice(0, 0) for n in l_names}
            empty_out.update(
                {n: pa.nulls(0, dict(union_fields)[n]) for n in r_val_names}
            )
            return pa.table(empty_out)
        lk = lt.column(key_col).to_numpy(zero_copy_only=False)
        lts = lt.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        n_l = lk.shape[0]
        if rt.num_rows == 0:
            idx_orig = np.full(n_l, -1, dtype=np.int64)
            matched = np.zeros(n_l, dtype=bool)
        else:
            rk = rt.column(key_col).to_numpy(zero_copy_only=False)
            rts = rt.column(r_ts_out).cast(pa.int64()).to_numpy(zero_copy_only=False)
            # sort right by (key, ts, remaining numeric cols) — ties on
            # equal (key, ts) resolve to the lexicographically-LAST row
            # (string tie columns skipped; then stable order decides)
            tie_keys = []
            for n in r_val_names:
                if n == r_ts_out:
                    continue
                try:
                    tie_keys.append(rt.column(n).to_numpy(zero_copy_only=False))
                except Exception:
                    pass
            r_order = np.lexsort(tuple(tie_keys) + (rts, rk))
            rk_s, rts_s = rk[r_order], rts[r_order]
            # vectorized (key, ts) tuple-searchsorted: dense key ranks ×
            # span-normalized timestamps packed into one int64 composite
            uk = np.unique(np.concatenate([rk_s, lk]))
            t_lo = min(rts_s.min(), lts.min())
            t_hi = max(rts_s.max(), lts.max())
            span = np.int64(t_hi - t_lo + 2)
            if uk.shape[0] < np.iinfo(np.int64).max // max(span, 1):
                comp_r = np.searchsorted(uk, rk_s) * span + (rts_s - t_lo)
                comp_l = np.searchsorted(uk, lk) * span + (lts - t_lo)
                idx = np.searchsorted(comp_r, comp_l, side="right") - 1
                # candidate must be the same key to count as a match
                valid = (idx >= 0) & (rk_s[np.maximum(idx, 0)] == lk)
                idx = np.where(valid, idx, -1)
            else:  # composite would overflow — per-row fallback
                starts = np.searchsorted(rk_s, lk, side="left")
                ends = np.searchsorted(rk_s, lk, side="right")
                idx = np.empty(n_l, dtype=np.int64)
                for i in range(n_l):
                    j = np.searchsorted(rts_s[starts[i] : ends[i]], lts[i], side="right")
                    idx[i] = starts[i] + j - 1 if j > 0 else -1
            matched = idx >= 0
            idx_orig = np.where(matched, r_order[np.maximum(idx, 0)], -1)
        if join_type == "inner":
            lt = lt.filter(pa.array(matched))
            idx_orig = idx_orig[matched]
            matched = np.ones(idx_orig.shape[0], dtype=bool)
        out = {n: lt.column(n) for n in l_names}
        take = pa.array(np.maximum(idx_orig, 0), pa.int64(), mask=~matched)
        for n in r_val_names:
            out[n] = rt.column(n).take(take) if rt.num_rows else pa.nulls(
                idx_orig.shape[0], dict(union_fields)[n]
            )
        return pa.table(out)

    return combined.groupby("__bucket", num_partitions=num_partitions).map_groups(
        match_bucket, batch_format="pyarrow"
    )


def range_join(
    points: Dataset,
    intervals: Dataset,
    key_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    join_type: str = "inner",
    suffix: str = "_r",
    num_partitions: int | None = None,
) -> Dataset:
    """Point-in-interval join: each point row matched to the per-key
    interval with ``start ≤ ts ≤ end`` (closed). Intervals of one key
    must be NON-OVERLAPPING (e.g. session windows) — the match is then
    unique and the join is exactly as-of(backward on start) + a
    containment filter, one hash shuffle total. Overlapping intervals
    resolve deterministically to the latest start, never fan out.

    ``join_type``: ``inner`` drops uncontained points, ``left`` keeps
    them with nulls. Interval columns come back suffixed like
    ``asof_join`` (the start column returns as ``ts_col + suffix``)."""
    configure_ray_data()
    if join_type not in ("inner", "left"):
        raise ValueError("join_type must be 'inner' or 'left'")
    p_names = list(points.schema().names)
    i_names = list(intervals.schema().names)
    if ts_col in i_names:
        raise ValueError(f"intervals side already has a column named {ts_col!r}")

    # rename start→ts_col via full-schema projection (Ray's
    # rename_columns duplicates columns on partial overlap — CLAUDE.md)
    def ren(t: pa.Table) -> pa.Table:
        return pa.table(
            {(ts_col if n == start_col else n): t.column(n) for n in t.column_names}
        )

    right = intervals.map_batches(ren, batch_format="pyarrow", zero_copy_batch=True)
    joined = asof_join(
        points, right, key_col, ts_col,
        join_type=join_type, suffix=suffix, num_partitions=num_partitions,
    )
    renamed = [ts_col if n == start_col else n for n in i_names if n != key_col]
    r_out = [n + suffix if n in p_names or n == ts_col else n for n in renamed]
    end_out = end_col + suffix if end_col in p_names else end_col

    def contain(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        inb = pc.and_kleene(
            pc.is_valid(t.column(end_out)),
            pc.greater_equal(
                pc.cast(t.column(end_out), pa.int64()),
                pc.cast(t.column(ts_col), pa.int64()),
            ),
        )
        if join_type == "inner":
            return t.filter(inb)
        out = {}
        for n in t.column_names:
            col = t.column(n)
            out[n] = (
                pc.if_else(inb, col, pa.nulls(t.num_rows, t.schema.field(n).type))
                if n in r_out
                else col
            )
        return pa.table(out)

    return joined.map_batches(contain, batch_format="pyarrow", zero_copy_batch=True)


def broadcast_join(
    big: Dataset,
    small: pa.Table,
    on: list[str] | tuple[str, ...],
    join_type: str = "inner",
) -> Dataset:
    """Join a big Dataset against a SMALL in-memory table without any
    shuffle: the small side is ``ray.put`` once and joined per batch with
    pyarrow (zero-copy reads from the object store)."""
    configure_ray_data()
    on = list(on)
    small_ref = ray.put(small)
    pa_join = _PA_JOIN_TYPE[join_type]

    def fn(batch: pa.Table) -> pa.Table:
        s = ray.get(small_ref)
        return batch.join(s, keys=on, join_type=pa_join)

    return big.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
