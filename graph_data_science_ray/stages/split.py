"""Dataset splitting + sequence packing for training-data pipelines.

``hash_split``: deterministic train/val/test assignment from a key
column — the Knuth multiplicative hash ``(key * 2654435761) mod 2^32``
scaled to [0, 1) and cut at cumulative fractions. Pure int64 batch
arithmetic, embarrassingly parallel, and exactly replicable in ANSI SQL
(the harness oracle runs the same expression in DuckDB), unlike md5- or
PRNG-based splitters. Rows follow their key: splitting two tables on
the same key column keeps them consistent.

``pack_documents``: greedy sample packing (the "pack short documents
into fixed-token-budget training sequences" step). Docs are
hash-bucketed by id (ONE shuffle via functions/shuffle.bucketed_merge),
then each bucket packs its docs in ascending-id order, first-fit-in-
order, into chunks of ≤ ``max_tokens`` (an oversized doc gets its own
chunk). Chunk ids are globally unique (bucket-prefixed) and the whole
assignment is a pure function of (data, num_buckets) — independent of
input partitioning, which the tests assert.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from graph_data_science_ray.context import configure_ray_data

_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(1 << 32)


def split_of(keys: np.ndarray, fractions: list[float], labels: list[str]) -> np.ndarray:
    """Vectorized split assignment for int64 keys (the batch kernel)."""
    h = (keys.astype(np.uint64) * _KNUTH) % _MOD32
    u = h.astype(np.float64) / float(_MOD32)
    cuts = np.cumsum(np.asarray(fractions, dtype=np.float64))
    idx = np.searchsorted(cuts, u, side="right")
    idx = np.minimum(idx, len(labels) - 1)
    return np.asarray(labels, dtype=object)[idx]


def hash_split(
    ds: Dataset,
    key_col: str,
    fractions: list[float] | None = None,
    labels: list[str] | None = None,
    out_col: str = "split",
) -> Dataset:
    """Append ``out_col`` with a deterministic split label per row.
    ``fractions`` must sum to 1 (default 0.8/0.1/0.1 train/val/test)."""
    configure_ray_data()
    fractions = fractions if fractions is not None else [0.8, 0.1, 0.1]
    labels = labels if labels is not None else ["train", "val", "test"]
    if len(fractions) != len(labels):
        raise ValueError("fractions and labels must align")
    if abs(sum(fractions) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")

    def assign(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(out_col, pa.array(split_of(keys, fractions, labels).tolist(), pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def pack_documents(
    ds: Dataset,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
    num_partitions: int | None = None,
) -> Dataset:
    """(id, n_tokens, bucket, chunk_id, chunk_pos): greedy first-fit-in-
    id-order packing of documents into ≤ ``max_tokens`` chunks per hash
    bucket. ``chunk_id = bucket * 2^40 + local_chunk`` is globally
    unique; every input doc appears exactly once."""
    configure_ray_data()
    from graph_data_science_ray.functions.shuffle import bucketed_merge
    from graph_data_science_ray.stages.textstats import TokenStats

    counted = ds.map_batches(
        TokenStats(id_col, text_col), batch_format="pyarrow", zero_copy_batch=True
    ).select_columns([id_col, "n_tokens"])

    def pack_bucket(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        nt = g.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, nt = ids[order], nt[order]
        chunk = np.zeros(ids.shape[0], dtype=np.int64)
        pos = np.zeros(ids.shape[0], dtype=np.int64)
        bucket = -1
        if ids.shape[0]:
            h = (ids.astype(np.uint64) * _KNUTH) % _MOD32
            bucket = int(h[0] % np.uint64(num_buckets))
        cur_chunk, cur_fill, cur_pos = 0, 0, 0
        for i in range(ids.shape[0]):
            n = int(nt[i])
            if cur_fill > 0 and cur_fill + n > max_tokens:
                cur_chunk += 1
                cur_fill, cur_pos = 0, 0
            chunk[i] = cur_chunk
            pos[i] = cur_pos
            cur_fill += n
            cur_pos += 1
            if cur_fill >= max_tokens:
                cur_chunk += 1
                cur_fill, cur_pos = 0, 0
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(nt, pa.int64()),
                "bucket": pa.array(np.full(ids.shape[0], bucket), pa.int64()),
                "chunk_id": pa.array(bucket * (1 << 40) + chunk, pa.int64()),
                "chunk_pos": pa.array(pos, pa.int64()),
            }
        )

    # route whole id-buckets to one packer each: bucketed_merge's key hash
    # already co-locates equal keys; use the SAME knuth bucket as the key
    def add_bucket(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = ((ids.astype(np.uint64) * _KNUTH) % _MOD32 % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("pack_bucket", pa.array(b, pa.int64()))

    withb = counted.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.schema(
                [
                    (id_col, pa.int64()),
                    ("n_tokens", pa.int64()),
                    ("bucket", pa.int64()),
                    ("chunk_id", pa.int64()),
                    ("chunk_pos", pa.int64()),
                ]
            ).empty_table()
        out = []
        b = g.column("pack_bucket").to_numpy(zero_copy_only=False)
        for bb in np.unique(b):
            out.append(pack_bucket(g.filter(pa.array(b == bb)).drop_columns(["pack_bucket"])))
        return pa.concat_tables(out)

    return bucketed_merge(
        withb,
        ["pack_bucket"],
        merge,
        sentinel_row={id_col: -1, "n_tokens": 0, "pack_bucket": -1},
        num_partitions=num_partitions,
    )
