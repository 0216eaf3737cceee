"""GraphSAGE: deterministic training, structure recovery, inference
invariants (unit norm, partitioning invariance of the broadcast path)."""

import numpy as np
import pyarrow as pa

import ray.data

from graph_data_science_ray.algos.graphsage import (
    GraphSageModel,
    graphsage_embeddings,
    graphsage_table,
    graphsage_train,
)
from graph_data_science_ray.sources.edges import from_arrow


def _two_clique_edges(k):
    src, dst = [], []
    for base in (0, k):
        for a in range(k):
            for b in range(a + 1, k):
                src.append(base + a)
                dst.append(base + b)
    src.append(0)
    dst.append(k)
    return pa.table({"src_id": pa.array(src, pa.int64()),
                     "dst_id": pa.array(dst, pa.int64())})


def _blob_features(k, d, seed):
    rng = np.random.default_rng(seed)
    X = np.vstack([rng.normal(-1, 0.2, (k, d)), rng.normal(1, 0.2, (k, d))])
    return pa.table(
        {"node_id": pa.array(np.arange(2 * k, dtype=np.int64), pa.int64()),
         "embedding": pa.array([r.tolist() for r in X], pa.list_(pa.float64()))}
    )


def test_graphsage_deterministic_and_unit_norm():
    edges = from_arrow(_two_clique_edges(8))
    feats = _blob_features(8, 4, seed=2)
    t1 = graphsage_table(edges, features=feats, embedding_dimension=8,
                         epochs=10, seed=5)
    t2 = graphsage_table(edges, features=feats, embedding_dimension=8,
                         epochs=10, seed=5)
    # node set identical; values allclose rather than bitwise — the
    # distributed neighbor-mean sums float partials per batch, and Ray
    # may split blocks differently under load, reordering the additions
    assert t1.column("node_id").equals(t2.column("node_id"))
    E2 = np.array(t2.column("embedding").to_pylist())
    E = np.array(t1.column("embedding").to_pylist())
    assert np.allclose(E, E2, atol=1e-9)
    assert E.shape == (16, 8)
    norms = np.linalg.norm(E, axis=1)
    assert np.allclose(norms[norms > 1e-9], 1.0, atol=1e-9)


def test_graphsage_recovers_cluster_structure():
    k = 10
    edges = from_arrow(_two_clique_edges(k))
    feats = _blob_features(k, 6, seed=3)
    t = graphsage_table(edges, features=feats, embedding_dimension=8,
                        epochs=40, seed=7)
    ids = np.array(t.column("node_id").to_pylist())
    E = np.array(t.column("embedding").to_pylist())
    E = E[np.argsort(ids)]
    S = E @ E.T
    a = np.triu_indices(k, 1)
    within = np.concatenate([S[:k, :k][a], S[k:, k:][a]]).mean()
    across = S[:k, k:].mean()
    assert within > across + 0.1


def test_graphsage_training_improves_separation():
    k = 10
    edges = from_arrow(_two_clique_edges(k))
    feats = _blob_features(k, 6, seed=3)

    def sep(epochs):
        t = graphsage_table(edges, features=feats, embedding_dimension=8,
                            epochs=epochs, seed=7)
        ids = np.array(t.column("node_id").to_pylist())
        E = np.array(t.column("embedding").to_pylist())[np.argsort(ids)]
        S = E @ E.T
        a = np.triu_indices(k, 1)
        within = np.concatenate([S[:k, :k][a], S[k:, k:][a]]).mean()
        return within - S[:k, k:].mean()

    assert sep(40) > sep(1)


def test_graphsage_degree_fallback_and_model_reuse():
    edges = from_arrow(_two_clique_edges(6))
    model = graphsage_train(edges, features=None, embedding_dimension=4,
                            epochs=5, seed=1)
    assert isinstance(model, GraphSageModel)
    assert model.feature_dim == 1
    ids, emb = graphsage_embeddings(edges, model, features=None)
    assert ids.shape[0] == 12 and emb.shape == (12, 4)
    # inference is a pure function of (model, graph): re-run equal
    ids2, emb2 = graphsage_embeddings(edges, model, features=None)
    assert np.array_equal(ids, ids2) and np.array_equal(emb, emb2)


def test_graphsage_partitioning_invariance():
    edges_t = _two_clique_edges(7)
    feats = _blob_features(7, 3, seed=11)
    one = from_arrow(edges_t)
    many = ray.data.from_arrow(
        [edges_t.slice(0, 13), edges_t.slice(13, 20), edges_t.slice(33)]
    )
    ta = graphsage_table(one, features=feats, embedding_dimension=4, epochs=8, seed=9)
    tb = graphsage_table(many, features=feats, embedding_dimension=4, epochs=8, seed=9)
    # float partial sums are partitioning-dependent at ~1e-15; the
    # result must agree to numerical noise, node set exactly
    assert ta.column("node_id").equals(tb.column("node_id"))
    Ea = np.array(ta.column("embedding").to_pylist())
    Eb = np.array(tb.column("embedding").to_pylist())
    assert np.allclose(Ea, Eb, atol=1e-10)
