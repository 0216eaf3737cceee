"""Hash-bucketed vectorized group merges.

Ray's hash aggregate pays per-group overhead that dominates when groups
are ~all-unique (edge dedup, pair-score merges — measured ~15x, see
algos/nodesim.py). The scalable alternative used across this engine:
ONE hash shuffle on a bucket column derived from the key tuple, then a
single vectorized (lexsort-based) merge task per bucket. Keys never
split across buckets, so per-bucket merges are exact and the result is
the concatenation.

``bucketed_merge`` also guards Ray 2.49's schemaless-empty-partition
crash: HashShuffleAggregator broadcasts schemas only with the FIRST
shuffled block of an input — if that block happens to be 0-row (e.g. an
empty partition from a previous chained shuffle), `_shuffle_block`
early-returns WITHOUT broadcasting, the once-only flag is burned, and
any partition that then receives no shard finalizes as a schema-less
table whose key sort raises ArrowInvalid (flaked wcc_star twice in the
129-query sweep; block arrival order decides, so solo runs pass). Fix:
union sentinel rows whose out-of-range bucket values are CHOSEN TO
COVER EVERY SHUFFLE PARTITION (``_partition_covering_buckets`` — the
partitioner is the deterministic, non-seed-randomized
``hash((pa.scalar(v),)) % P`` of transform_pyarrow.hash_partition, so
coverage is computable up front), guaranteeing every partition receives
a non-empty shard regardless of block order; the merge step drops
sentinel groups by their ≥P bucket value.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

import ray.data
from ray.data import Dataset

from graph_data_science_ray.context import shuffle_partitions_for
from graph_data_science_ray.functions.joins import _key_hash


def _partition_covering_buckets(num_partitions: int, max_scan: int | None = None) -> np.ndarray:
    """Out-of-range bucket values (≥ num_partitions) whose
    ``hash((pa.scalar(v),)) % num_partitions`` — Ray 2.49's
    transform_pyarrow.hash_partition assignment, deterministic because
    Python int hashing is not seed-randomized — covers every shuffle
    partition. Guarantees each partition receives ≥1 sentinel row, so
    HashShuffleAggregator.finalize never builds a schema-less block
    even when the once-only schema broadcast was burned by a 0-row
    first block. Coupon-collector scan, cached per partition count; if
    a future Ray changes the hash the scan falls back to the first
    ``num_partitions`` values (old single-sentinel behavior, no worse)."""
    cached = _COVER_CACHE.get(num_partitions)
    if cached is not None:
        return cached
    max_scan = max_scan or max(64, 40 * num_partitions)
    seen: dict[int, int] = {}
    v = num_partitions
    while len(seen) < num_partitions and v < num_partitions + max_scan:
        p = hash((pa.scalar(v, pa.int64()),)) % num_partitions
        if p not in seen:
            seen[p] = v
        v += 1
    out = np.array(sorted(seen.values()), dtype=np.int64)
    _COVER_CACHE[num_partitions] = out
    return out


_COVER_CACHE: dict[int, np.ndarray] = {}


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
    # inference would mismatch the input schema (timestamps, binary);
    # one sentinel row per COVERED SHUFFLE PARTITION (module docstring)
    sent_buckets = _partition_covering_buckets(num_partitions)
    k_sent = sent_buckets.shape[0]
    sent = {
        k: (pa.concat_arrays([v] * k_sent) if isinstance(v, pa.Array)
            else pa.array([v] * k_sent))
        for k, v in sentinel_row.items()
    }
    sent["__bucket"] = pa.array(sent_buckets, pa.int64())
    empty_typed = pa.table({k: v.slice(0, 0) for k, v in sent.items()})

    def bucketize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or any(c not in t.column_names for c in cols):
            # a fully-empty shuffle partition upstream yields a
            # SCHEMA-LESS block (pa.table({})); emit a typed empty block
            # so the __bucket groupby never sees a missing key column
            return empty_typed
        t = t.select(cols)
        if combine_fn is not None:
            t = combine_fn(t).select(cols)
        b = (_key_hash(t, key_cols) % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))
    first = next(iter(sentinel_row))

    def merge_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows and g.column("__bucket")[0].as_py() >= num_partitions:
            g = g.slice(0, 0)  # sentinel-only group (out-of-range bucket)
        return merge_fn(g.select(cols))

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .union(ray.data.from_arrow(pa.table(sent)))
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(merge_bucket, batch_format="pyarrow")
    )
