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
) -> Dataset:
    """Partitioned hash join of two Datasets on shared key column names.

    Non-key column names must be disjoint between the sides (project /
    rename first — deliberate, same contract as the reference's explicit
    projections)."""
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

    # keep-alive sentinel (same guard as functions/shuffle.bucketed_merge):
    # one all-null row with __side=2 in out-of-range bucket P so the
    # groupby shuffle never finalizes a fully-empty, schema-less input;
    # join_bucket's side-0/side-1 filters drop it for free
    sent_cols: dict = {
        name: pa.nulls(1, typ) for name, typ in union_fields
    }
    sent_cols["__side"] = pa.array([2], pa.int8())
    sent_cols["__bucket"] = pa.array([num_partitions], pa.int64())
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
        return lt.join(rt, keys=on, join_type=pa_join)

    return combined.groupby("__bucket", num_partitions=num_partitions).map_groups(
        join_bucket, batch_format="pyarrow"
    )


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
