"""HashGNN — trainless binary node embeddings via min-hash message passing.

Reference semantics (``gds.hashgnn``, [GDS-pub: algo/.../embeddings/hashgnn/]):
iterative locality-sensitive hashing over binary feature sets — no
training, no floats: each iteration every node rebuilds its feature set
by drawing, for each of ``embedding_density`` K slots, the min-hash
winner among its OWN features (hash family 1) and its NEIGHBORS'
features (hash family 2), with ``neighbor_influence`` biasing the
choice toward neighbors. Repeating ``iterations`` times mixes r-hop
neighborhoods; similar neighborhoods → similar bit sets (the MinHash
∝ Jaccard guarantee). The reference seeds its hash functions from
``randomSeed``; the exact hash constants are internal, so this engine
defines its own splitmix64 families — same construction, same
similarity semantics, deterministic under (graph, seed, config).

Input features: ``generate_features`` equivalent — each node starts
with ``base_density`` pseudo-random feature ids in [0, dimension)
derived from (node_id, seed), matching the reference's feature
generation mode for graphs without node properties.

Dataflow shape: per iteration ONE edge scan. The per-(node, slot)
min over a node's own features is precomputed on the driver
(vectorized, node-sized × K state); the scan min-reduces neighbors'
packed (hash « 32 | feature) words per (dst, slot) — min of packed
words IS argmin-by-hash carrying the feature id, so the gather is a
plain decomposable min like WCC's.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.algos.common import (
    BlockScanner,
    unique_inverse,
    unique_node_ids,
)
from graph_data_science_ray.context import configure_ray_data
from graph_data_science_ray.sources.edges import symmetrize

_INF = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _hash_feats(feats: np.ndarray, slot: int, seed: int, family: int) -> np.ndarray:
    """32-bit hash of feature ids for (slot, family); -1 features → max."""
    salt = (seed * 0x9E3779B9 ^ slot * 0x85EBCA6B ^ family * 0xC2B2AE35) & ((1 << 63) - 1)
    h = _mix(feats.astype(np.uint64) ^ np.uint64(salt)) >> np.uint64(32)
    h = np.where(feats < 0, np.uint64(0xFFFFFFFF), h)
    return h


def _pack(h32: np.ndarray, feat: np.ndarray) -> np.ndarray:
    """(hash « 32) | feature — min picks min-hash, carries the feature."""
    out = (h32.astype(np.uint64) << np.uint64(32)) | feat.astype(np.uint64)
    return np.where(feat < 0, _INF, out)


def generate_features(node_ids: np.ndarray, dimension: int, base_density: int, seed: int) -> np.ndarray:
    """(n × base_density) int32 feature ids — pure function of inputs."""
    n = node_ids.shape[0]
    cols = []
    for j in range(base_density):
        salt = np.uint64((seed * 0x9E3779B97F4A7C15 + j * 0xDEADBEEF) & ((1 << 64) - 1))
        h = _mix(node_ids.astype(np.uint64) ^ salt)
        cols.append((h % np.uint64(dimension)).astype(np.int32))
    return np.stack(cols, axis=1)


def hashgnn(
    edges: Dataset,
    dimension: int = 256,
    base_density: int = 4,
    embedding_density: int = 16,
    iterations: int = 2,
    neighbor_influence: float = 1.0,
    orientation: str = "undirected",
    seed: int = 42,
    features: np.ndarray | None = None,
    num_partitions: int | None = None,
) -> pa.Table:
    """(node_id, features: list<int32>) — sorted distinct active feature
    ids per node (the binary embedding's set bits)."""
    configure_ray_data()
    g = edges
    if orientation == "undirected":
        g = symmetrize(edges, dedup=True, num_partitions=num_partitions)
    g = g.materialize()
    node_ids = unique_node_ids(edges)
    n = node_ids.shape[0]
    K = embedding_density

    feats = features if features is not None else generate_features(node_ids, dimension, base_density, seed)
    assert feats.shape[0] == n

    scanner = BlockScanner(g)
    for it in range(iterations):
        # ---- per-(node, slot) packed minima over OWN features --------
        own = np.full((n, K), _INF, dtype=np.uint64)
        nbr_msg = np.full((n, K), _INF, dtype=np.uint64)
        for k in range(K):
            h1 = _hash_feats(feats, k + it * K, seed, family=1)
            own[:, k] = _pack(h1, feats).min(axis=1)
            h2 = _hash_feats(feats, k + it * K, seed, family=2)
            nbr_msg[:, k] = _pack(h2, feats).min(axis=1)

        # ---- ONE edge scan: per (dst, slot) min of neighbors' words --
        state_ref = ray.put((node_ids, nbr_msg))

        def scatter(t: pa.Table) -> pa.Table:
            ids, msg = ray.get(state_ref)
            src = t.column("src_id").to_numpy(zero_copy_only=False)
            dst = t.column("dst_id").to_numpy(zero_copy_only=False)
            sp = np.searchsorted(ids, src)
            u, inv = unique_inverse(dst)
            acc = np.full((u.shape[0], msg.shape[1]), _INF, dtype=np.uint64)
            np.minimum.at(acc, inv, msg[sp])
            cols = {"node_id": pa.array(u, pa.int64())}
            for k in range(msg.shape[1]):
                cols[f"m{k}"] = pa.array(acc[:, k], pa.uint64())
            return pa.table(cols)

        t = scanner.scan(scatter)
        nbr_min = np.full((n, K), _INF, dtype=np.uint64)
        if t.num_rows:
            pos = np.searchsorted(node_ids, t.column("node_id").to_numpy(zero_copy_only=False))
            for k in range(K):
                np.minimum.at(nbr_min[:, k], pos, t.column(f"m{k}").to_numpy(zero_copy_only=False))

        # ---- select per slot: own vs neighbor, influence-scaled ------
        # neighbor wins iff nbr_hash < own_hash · neighbor_influence
        own_h = (own >> np.uint64(32)).astype(np.float64)
        nbr_h = (nbr_min >> np.uint64(32)).astype(np.float64)
        take_nbr = nbr_h < own_h * neighbor_influence
        chosen = np.where(take_nbr, nbr_min, own)
        new_feats = (chosen & np.uint64(0xFFFFFFFF)).astype(np.int64).astype(np.int32)
        new_feats = np.where(chosen == _INF, np.int32(-1), new_feats)
        feats = new_feats

    # sorted distinct active features per node, vectorized into a
    # ListArray via offsets (no per-node Python loop)
    feats_sorted = np.sort(feats, axis=1)
    keep = feats_sorted >= 0
    keep[:, 1:] &= feats_sorted[:, 1:] != feats_sorted[:, :-1]
    counts = keep.sum(axis=1).astype(np.int32)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    values = feats_sorted[keep]
    return pa.table(
        {
            "node_id": pa.array(node_ids, pa.int64()),
            "features": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(values, pa.int32())
            ),
        }
    )
