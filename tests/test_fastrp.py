"""FastRP invariants (no closed-form oracle; properties + a dense
numpy replica of the same spec)."""

import numpy as np
import pytest

from graph_data_science_ray import fixtures
from graph_data_science_ray.algos.fastrp import _row_normalize, _sparse_init, fastrp
from graph_data_science_ray.sources.edges import from_arrow


def _dense_replica(pairs, node_ids, dim, weights, seed):
    idx = {u: i for i, u in enumerate(node_ids)}
    n = len(node_ids)
    A = np.zeros((n, n))
    outd = np.zeros(n)
    for s, d in pairs:
        A[idx[s], idx[d]] = 1.0
        outd[idx[s]] += 1.0
    h = _row_normalize(_sparse_init(np.asarray(node_ids, dtype=np.int64), dim, seed))
    emb = weights[0] * h
    for w in weights[1:]:
        scaled = np.divide(h, outd[:, None], out=np.zeros_like(h), where=outd[:, None] > 0)
        h = _row_normalize(A.T @ scaled)
        emb = emb + w * h
    return emb


def test_fastrp_matches_dense_replica():
    t = fixtures.er_random(50, 0.1, seed=71)
    pairs = list(zip(t.column("src_id").to_pylist(), t.column("dst_id").to_pylist()))
    ids, emb = fastrp(from_arrow(t), embedding_dimension=16, seed=7)
    want = _dense_replica(pairs, ids.tolist(), 16, (0.0, 1.0, 1.0), 7)
    assert np.allclose(emb, want, atol=1e-10)


def test_fastrp_deterministic_across_runs():
    t = fixtures.powerlaw(200, seed=3)
    ids1, e1 = fastrp(from_arrow(t), embedding_dimension=8)
    ids2, e2 = fastrp(from_arrow(t), embedding_dimension=8)
    assert np.array_equal(ids1, ids2)
    assert np.array_equal(e1, e2)


def test_fastrp_similar_neighbors():
    # two cliques joined by one edge: same-clique nodes embed closer
    # than cross-clique ones (structural sanity)
    pairs = []
    for a in range(5):
        for b in range(5):
            if a != b:
                pairs.append((a, b))
                pairs.append((a + 5, b + 5))
    pairs.append((0, 5))
    import pyarrow as pa

    t = pa.table(
        {
            "src_id": pa.array([p[0] for p in pairs], pa.int64()),
            "dst_id": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    ids, emb = fastrp(from_arrow(t), embedding_dimension=32, seed=5)
    e = {i: emb[k] for k, i in enumerate(ids.tolist())}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    same = cos(e[1], e[2])
    cross = cos(e[1], e[7])
    assert same > cross


def test_hashgnn_deterministic_and_similarity():
    import numpy as np

    from graph_data_science_ray import fixtures
    from graph_data_science_ray.algos.hashgnn import hashgnn
    from graph_data_science_ray.sources.edges import from_arrow

    # two 6-cliques joined by one bridge
    pairs = []
    for base in (0, 100):
        for i in range(6):
            for j in range(i + 1, 6):
                pairs.append((base + i, base + j))
    pairs.append((0, 100))
    t = fixtures.edges_table(pairs)

    e1 = hashgnn(from_arrow(t), dimension=128, embedding_density=24, iterations=2, seed=5, num_partitions=2)
    e2 = hashgnn(from_arrow(t), dimension=128, embedding_density=24, iterations=2, seed=5, num_partitions=3)
    assert e1.equals(e2), "must be partitioning-invariant"

    emb = {r["node_id"]: set(r["features"]) for r in e1.to_pylist()}

    def jac(a, b):
        return len(emb[a] & emb[b]) / max(1, len(emb[a] | emb[b]))

    # within-clique similarity (non-bridge members) far above cross-clique
    within = np.mean([jac(1, 2), jac(2, 3), jac(101, 102), jac(102, 103)])
    across = np.mean([jac(1, 101), jac(2, 102), jac(3, 103)])
    assert within > across + 0.2, (within, across)

    # different seed → different embeddings
    e3 = hashgnn(from_arrow(t), dimension=128, embedding_density=24, iterations=2, seed=6, num_partitions=2)
    assert not e1.equals(e3)


def test_hashgnn_isolated_node_keeps_own_features():
    import pyarrow as pa

    from graph_data_science_ray import fixtures
    from graph_data_science_ray.algos.hashgnn import generate_features, hashgnn
    from graph_data_science_ray.sources.edges import from_arrow

    t = fixtures.edges_table([(1, 2), (7, 7)])  # 7 only self-loops
    e = hashgnn(from_arrow(t), dimension=64, base_density=3, embedding_density=8, iterations=1, seed=9, num_partitions=2)
    got = {r["node_id"]: set(r["features"]) for r in e.to_pylist()}
    assert got[7], "node with only a self-loop still has features"


def test_knn_graph_matches_numpy_oracle():
    import numpy as np

    from graph_data_science_ray import fixtures
    from graph_data_science_ray.algos.fastrp import fastrp
    from graph_data_science_ray.algos.knn import knn_graph, knn_matrix
    from graph_data_science_ray.sources.edges import from_arrow

    t = fixtures.powerlaw(80, seed=4)
    ids, emb = fastrp(from_arrow(t), embedding_dimension=32, seed=7)
    got = knn_matrix(ids, emb, k=3, num_partitions=2).take_all()
    # numpy oracle
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    m = np.divide(emb, norms, out=np.zeros_like(emb), where=norms > 0)
    sims = m @ m.T
    np.fill_diagonal(sims, -np.inf)
    by_node = {}
    for r in got:
        by_node.setdefault(r["node_id"], []).append((r["neighbour_id"], r["similarity"]))
    for i, nid in enumerate(ids.tolist()):
        exp_order = sorted(
            ((ids[j], round(sims[i, j], 9)) for j in range(len(ids)) if j != i),
            key=lambda x: (-x[1], x[0]),
        )[:3]
        assert by_node[nid] == exp_order, nid

    a = knn_graph(from_arrow(t), k=3, embedding_dimension=32, num_partitions=2).take_all()
    b = knn_graph(from_arrow(t), k=3, embedding_dimension=32, num_partitions=3).take_all()
    key = lambda r: (r["node_id"], r["neighbour_id"])
    assert sorted(a, key=key) == sorted(b, key=key)


def test_filtered_knn_source_target_sets():
    import numpy as np

    from graph_data_science_ray import fixtures
    from graph_data_science_ray.algos.fastrp import fastrp
    from graph_data_science_ray.algos.knn import filtered_knn_graph, knn_matrix
    from graph_data_science_ray.sources.edges import from_arrow

    t = fixtures.powerlaw(60, seed=9)
    ids, emb = fastrp(from_arrow(t), embedding_dimension=16, seed=3)
    sources = set(ids[:10].tolist())
    targets = set(ids[20:40].tolist())
    got = knn_matrix(ids, emb, k=4, num_partitions=2,
                     source_nodes=sources, target_nodes=targets).take_all()
    assert got, "non-empty result"
    assert {r["node_id"] for r in got} <= sources
    assert {r["neighbour_id"] for r in got} <= targets
    # numpy oracle on the restricted candidate set
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    m = np.divide(emb, norms, out=np.zeros_like(emb), where=norms > 0)
    sims = m @ m.T
    np.fill_diagonal(sims, -np.inf)
    tmask = np.isin(ids, np.array(sorted(targets)))
    by_node = {}
    for r in got:
        by_node.setdefault(r["node_id"], []).append((r["neighbour_id"], r["similarity"]))
    for i, nid in enumerate(ids.tolist()):
        if nid not in sources:
            continue
        exp = sorted(
            ((ids[j], round(sims[i, j], 9)) for j in range(len(ids))
             if j != i and tmask[j]),
            key=lambda x: (-x[1], x[0]),
        )[:4]
        assert by_node.get(nid, []) == exp, nid

    # end-to-end wrapper path + self-exclusion when source ∈ targets
    e2e = filtered_knn_graph(from_arrow(t), k=2, source_nodes=targets,
                             target_nodes=targets, embedding_dimension=16,
                             seed=3, num_partitions=2).take_all()
    assert all(r["node_id"] != r["neighbour_id"] for r in e2e)
    assert {r["node_id"] for r in e2e} <= targets


def test_fastrp_weighted_matches_dense_replica():
    import pyarrow as pa

    t = fixtures.er_random(40, 0.12, seed=31)
    rng = np.random.default_rng(5)
    w = rng.uniform(0.5, 2.0, size=t.num_rows)
    tw = t.set_column(t.schema.get_field_index("weight"), "weight", pa.array(w)) \
        if "weight" in t.column_names else t.append_column("weight", pa.array(w))
    pairs = list(zip(t.column("src_id").to_pylist(), t.column("dst_id").to_pylist()))
    ids, emb = fastrp(from_arrow(tw), embedding_dimension=12, seed=9, weighted=True)

    idx = {u: i for i, u in enumerate(ids.tolist())}
    n = len(ids)
    A = np.zeros((n, n))
    outw = np.zeros(n)
    for (s, d_), ww in zip(pairs, w):
        A[idx[s], idx[d_]] += ww
        outw[idx[s]] += ww
    h = _row_normalize(_sparse_init(ids, 12, 9))
    want = 0.0 * h
    for wi in (1.0, 1.0):
        scaled = np.divide(h, outw[:, None], out=np.zeros_like(h), where=outw[:, None] > 0)
        h = _row_normalize(A.T @ scaled)
        want = want + wi * h
    assert np.allclose(emb, want, atol=1e-10)


def test_fastrp_feature_properties():
    import pyarrow as pa

    t = fixtures.er_random(40, 0.12, seed=32)
    ids_all = sorted(set(t.column("src_id").to_pylist()) | set(t.column("dst_id").to_pylist()))
    rng = np.random.default_rng(6)
    feats = pa.table({
        "node_id": pa.array(ids_all, pa.int64()),
        "f0": pa.array(rng.normal(size=len(ids_all))),
        "f1": pa.array(rng.normal(size=len(ids_all))),
    })
    ids, emb = fastrp(from_arrow(t), embedding_dimension=16, seed=9,
                      feature_table=feats, property_ratio=0.5)
    assert emb.shape == (len(ids), 16)
    assert np.isfinite(emb).all()
    # deterministic
    _, emb2 = fastrp(from_arrow(t), embedding_dimension=16, seed=9,
                     feature_table=feats, property_ratio=0.5)
    assert np.array_equal(emb, emb2)
    # property part actually differs from the structural-only embedding
    _, emb0 = fastrp(from_arrow(t), embedding_dimension=16, seed=9)
    assert not np.allclose(emb, emb0)
    # ratio 1.0: init entirely from properties
    _, embp = fastrp(from_arrow(t), embedding_dimension=8, seed=9,
                     feature_table=feats, property_ratio=1.0)
    assert np.isfinite(embp).all()
    import pytest as _pt
    with _pt.raises(ValueError):
        fastrp(from_arrow(t), property_ratio=0.5)


def test_knn_boundary_tie_breaks_by_id():
    """Ties AT the k boundary must resolve to the smallest neighbour ids
    (full (-score, id) selection, not argpartition's arbitrary pick):
    duplicate vectors give exact score ties."""
    import numpy as np

    from graph_data_science_ray.algos.knn import knn_matrix

    ids = np.arange(10, dtype=np.int64)
    emb = np.zeros((10, 4))
    emb[0] = [1.0, 0.0, 0.0, 0.0]
    emb[1:] = [0.0, 1.0, 0.0, 0.0]  # 9 identical candidates for node 0
    got = knn_matrix(ids, emb, k=3, num_partitions=2).take_all()
    nbrs0 = sorted(r["neighbour_id"] for r in got if r["node_id"] == 0)
    assert nbrs0 == [1, 2, 3], nbrs0  # smallest ids win the tie
