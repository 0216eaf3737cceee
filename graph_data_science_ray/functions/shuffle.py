"""Hash-bucketed vectorized group merges.

Ray's hash aggregate pays per-group overhead that dominates when groups
are ~all-unique (edge dedup, pair-score merges — measured ~15x, see
algos/nodesim.py). The scalable alternative used across this engine:
ONE hash shuffle on a bucket column derived from the key tuple, then a
single vectorized (lexsort-based) merge task per bucket. Keys never
split across buckets, so per-bucket merges are exact and the result is
the concatenation.

``bucketed_merge`` also guards Ray 2.49's schemaless-empty-block crash
(ArrowInvalid in hash_shuffle finalize when the input Dataset is fully
empty) by unioning one sentinel row in an out-of-range bucket that the
merge step drops.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

import ray.data
from ray.data import Dataset

from graph_data_science_ray.context import shuffle_partitions_for
from graph_data_science_ray.functions.joins import _key_hash


def bucketed_merge(
    ds: Dataset,
    key_cols: list[str],
    merge_fn: Callable[[pa.Table], pa.Table],
    sentinel_row: dict,
    num_partitions: int | None = None,
    combine_fn: Callable[[pa.Table], pa.Table] | None = None,
) -> Dataset:
    """Shuffle ``ds`` into hash buckets of the key tuple and apply
    ``merge_fn`` to each full bucket (vectorized, bucket-exact).

    ``sentinel_row``: column→python-value dict matching the schema of
    the (projected) input — one keep-alive row routed to bucket P and
    dropped before ``merge_fn`` sees the data.

    ``combine_fn``: optional pre-shuffle combiner applied per batch
    (schema-preserving partial aggregation — cuts shuffle volume when
    keys repeat within a producer block)."""
    num_partitions = num_partitions or shuffle_partitions_for()
    cols = list(sentinel_row.keys())

    # a value may be a pre-built 1-row pa.Array when python-value type
    # inference would mismatch the input schema (timestamps, binary)
    sent = {k: (v if isinstance(v, pa.Array) else pa.array([v]))
            for k, v in sentinel_row.items()}
    sent["__bucket"] = pa.array([num_partitions], pa.int64())
    empty_typed = pa.table({k: v.slice(0, 0) for k, v in sent.items()})

    def bucketize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or any(c not in t.column_names for c in cols):
            # a fully-empty shuffle partition upstream yields a
            # SCHEMA-LESS block (pa.table({})); emit a typed empty block
            # so the __bucket groupby never sees a missing key column
            # (flaked once in the 129-query single-session sweep — the
            # chained wcc_star rounds shrink into many empty partitions)
            return empty_typed
        t = t.select(cols)
        if combine_fn is not None:
            t = combine_fn(t).select(cols)
        b = (_key_hash(t, key_cols) % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))
    first = next(iter(sentinel_row))

    def merge_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows and g.column("__bucket")[0].as_py() == num_partitions:
            g = g.slice(0, 0)
        return merge_fn(g.select(cols))

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .union(ray.data.from_arrow(pa.table(sent)))
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(merge_bucket, batch_format="pyarrow")
    )
