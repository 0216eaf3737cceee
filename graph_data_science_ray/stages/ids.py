"""url → node_id hashing and edge-bucket assignment (vectorized batch fns).

node_id = stable 63-bit hash (first 8 bytes of sha256, sign bit masked) —
the engine's replacement for the reference's dense-consecutive IdMap
(SURVEY.md §1.2): requires no global counter and therefore no cluster-wide
coordination at 10^12-document scale.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MASK63 = 0x7FFF_FFFF_FFFF_FFFF


def hash64_array(strings: pa.Array | pa.ChunkedArray | list[str]) -> pa.Array:
    """sha256-based 63-bit ids for a string column.

    sha256 is per-string C code; the Python loop only shuttles bytes.
    A per-batch memo avoids rehashing repeated urls (hub targets repeat
    heavily under Zipf skew).
    """
    if isinstance(strings, (pa.Array, pa.ChunkedArray)):
        strings = strings.to_pylist()
    memo: dict[str, int] = {}
    out = np.empty(len(strings), dtype=np.int64)
    for i, s in enumerate(strings):
        v = memo.get(s)
        if v is None:
            h = hashlib.sha256(s.encode("utf-8")).digest()
            v = int.from_bytes(h[:8], "big") & MASK63
            memo[s] = v
        out[i] = v
    return pa.array(out, pa.int64())


def urls_to_edge_ids(batch: pa.Table) -> pa.Table:
    """(src_url, dst_url) → (src_id, dst_id). Pure batch fn for map_batches."""
    return pa.table(
        {
            "src_id": hash64_array(batch.column("src_url")),
            "dst_id": hash64_array(batch.column("dst_url")),
        }
    )


def bucket_of(ids: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic bucket assignment for CSR sharding: a cheap integer
    mix (splitmix64 finalizer) then mod P — NOT raw id % P, because node
    ids are themselves hashes whose low bits may correlate with source."""
    x = ids.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return (x % np.uint64(num_buckets)).astype(np.int64)


def add_bucket_column(batch: pa.Table, key: str = "src_id", num_buckets: int = 64) -> pa.Table:
    ids = batch.column(key).to_numpy(zero_copy_only=False)
    return batch.append_column("bucket", pa.array(bucket_of(ids, num_buckets), pa.int64()))
