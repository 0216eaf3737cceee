"""Node2Vec walk-bias and embedding invariants (no closed-form oracle;
the p/q bias is checked statistically on graphs where the biased and
uniform distributions differ sharply)."""

import numpy as np
import pyarrow as pa

from graph_data_science_ray import fixtures
from graph_data_science_ray.algos.node2vec import node2vec, node2vec_walks
from graph_data_science_ray.sources.edges import from_arrow


def _complete(n):
    src, dst = [], []
    for a in range(n):
        for b in range(n):
            if a != b:
                src.append(a)
                dst.append(b)
    return pa.table({"src_id": pa.array(src, pa.int64()),
                     "dst_id": pa.array(dst, pa.int64())})


def _return_fraction(walks):
    """Fraction of steps ≥2 that return to the node two steps back."""
    w = walks.column("walk_id").to_numpy(zero_copy_only=False)
    s = walks.column("step").to_numpy(zero_copy_only=False)
    n = walks.column("node_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((s, w))
    w, n = w[order], n[order]
    same = (w[2:] == w[:-2])
    ret = (n[2:] == n[:-2]) & same
    return ret.sum() / max(1, same.sum())


def test_walks_follow_edges():
    t = fixtures.er_random(40, 0.15, seed=5)
    edges = set(zip(t.column("src_id").to_pylist(), t.column("dst_id").to_pylist()))
    und = edges | {(b, a) for a, b in edges}
    nodes = sorted({x for e in und for x in e})
    walks = node2vec_walks(from_arrow(t), nodes[:10], walk_length=8,
                           walks_per_node=2, orientation="undirected")
    w = walks.column("walk_id").to_pylist()
    n = walks.column("node_id").to_pylist()
    for i in range(1, len(w)):
        if w[i] == w[i - 1]:
            assert (n[i - 1], n[i]) in und


def test_return_factor_bias():
    t = _complete(8)
    nodes = list(range(8))
    # tiny p → 1/p huge → strongly biased toward returning
    ret_hi = _return_fraction(node2vec_walks(
        from_arrow(t), nodes, walk_length=20, walks_per_node=4,
        return_factor=0.01, seed=1))
    # huge p → 1/p tiny → almost never returns
    ret_lo = _return_fraction(node2vec_walks(
        from_arrow(t), nodes, walk_length=20, walks_per_node=4,
        return_factor=100.0, seed=1))
    # uniform baseline on K8: ~1/7 ≈ 0.14
    assert ret_hi > 0.6
    assert ret_lo < 0.05


def test_in_out_factor_bias():
    # barbell: two K4s joined by a bridge. Low q (1/q big) = outward/
    # exploring; high q = stays near prev's neighborhood. Measure the
    # fraction of steps landing outside the previous node's neighborhood.
    src, dst = [], []
    for base in (0, 4):
        for a in range(4):
            for b in range(4):
                if a != b:
                    src.append(base + a)
                    dst.append(base + b)
    src += [0, 4]
    dst += [4, 0]
    t = pa.table({"src_id": pa.array(src, pa.int64()),
                  "dst_id": pa.array(dst, pa.int64())})
    und = set(zip(src, dst)) | {(b, a) for a, b in zip(src, dst)}

    def cross_frac(q):
        walks = node2vec_walks(from_arrow(t), list(range(8)), walk_length=30,
                               walks_per_node=4, in_out_factor=q, seed=3)
        w = walks.column("walk_id").to_numpy(zero_copy_only=False)
        s = walks.column("step").to_numpy(zero_copy_only=False)
        n = walks.column("node_id").to_numpy(zero_copy_only=False)
        o = np.lexsort((s, w))
        w, n = w[o], n[o]
        tot = hit = 0
        for i in range(2, len(w)):
            if w[i] == w[i - 2]:
                tot += 1
                prev, nxt = n[i - 2], n[i]
                if nxt != prev and (prev, nxt) not in und:
                    hit += 1
        return hit / max(1, tot)

    assert cross_frac(0.1) > cross_frac(10.0)


def test_embeddings_cluster_structure_and_determinism():
    src, dst = [], []
    for base in (0, 5):
        for a in range(5):
            for b in range(5):
                if a != b:
                    src.append(base + a)
                    dst.append(base + b)
    src.append(0)
    dst.append(5)
    t = pa.table({"src_id": pa.array(src, pa.int64()),
                  "dst_id": pa.array(dst, pa.int64())})
    res = node2vec(from_arrow(t), dimension=16, walk_length=15,
                   walks_per_node=6, window=3, epochs=3, seed=9)
    res2 = node2vec(from_arrow(t), dimension=16, walk_length=15,
                    walks_per_node=6, window=3, epochs=3, seed=9)
    assert res.equals(res2)
    ids = res.column("node_id").to_pylist()
    E = np.array(res.column("embedding").to_pylist())
    E = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
    idx = {u: i for i, u in enumerate(ids)}
    same, cross = [], []
    for a in range(10):
        for b in range(a + 1, 10):
            sim = float(E[idx[a]] @ E[idx[b]])
            ((same if (a < 5) == (b < 5) else cross)).append(sim)
    assert np.mean(same) > np.mean(cross)
