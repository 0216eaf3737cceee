"""Round-2 additions: exact-similarity auto-dispatch guards and the
distributed shortest-path stream (GDS .stream parity)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data


def _emb_ds(n=40, d=8, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d))
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(m.tolist(), pa.list_(pa.float64())),
            }
        )
    ), m


def test_brute_force_dispatches_to_ivf_above_cap(caplog):
    from graph_data_science_ray.stages.embed import brute_force_topk

    ds, m = _emb_ds()
    with caplog.at_level("WARNING", logger="graph_data_science_ray.similarity"):
        out = brute_force_topk(ds, np.array([m[5]]), k=3, max_exact_rows=10)
    assert any("dispatching to" in r.message for r in caplog.records)
    # IVF with default probes still finds the identical self row as top-1
    assert out.column("vec_id").to_pylist()[0] == 5


def test_brute_force_refuses_non_cosine_above_cap():
    from graph_data_science_ray.stages.embed import brute_force_topk

    ds, m = _emb_ds()
    with pytest.raises(ValueError, match="no approximate twin"):
        brute_force_topk(ds, np.array([m[0]]), k=3, metric="pearson", max_exact_rows=10)


def test_brute_force_exact_logs_below_cap(caplog):
    from graph_data_science_ray.stages.embed import brute_force_topk

    ds, m = _emb_ds()
    with caplog.at_level("INFO", logger="graph_data_science_ray.similarity"):
        brute_force_topk(ds, np.array([m[0]]), k=3, max_exact_rows=1000)
    assert any("exact O(n" in r.message for r in caplog.records)


def test_top_similar_pairs_refuses_or_routes_above_cap(caplog):
    from graph_data_science_ray.stages.embed import top_similar_pairs

    ds, _ = _emb_ds()
    with pytest.raises(ValueError, match="O\\(n"):
        top_similar_pairs(ds, n=5, max_exact_rows=10)
    with caplog.at_level("WARNING", logger="graph_data_science_ray.similarity"):
        out = top_similar_pairs(ds, n=5, similarity_cutoff=0.0, max_exact_rows=10)
    assert any("LSH-bucketed" in r.message for r in caplog.records)
    assert out.num_rows <= 5
    sc = out.column("score").to_numpy(zero_copy_only=False)
    assert (sc >= 0.0).all()


def test_knn_matrix_dispatches_to_nndescent_above_cap(caplog):
    from graph_data_science_ray.algos.knn import knn_matrix

    rng = np.random.default_rng(11)
    ids = np.arange(30, dtype=np.int64)
    emb = rng.standard_normal((30, 6))
    with caplog.at_level("WARNING", logger="graph_data_science_ray.similarity"):
        res = knn_matrix(ids, emb, k=3, max_exact_rows=5, num_partitions=2)
    assert any("NN-Descent" in r.message for r in caplog.records)
    t = res.to_pandas()
    assert set(t.columns) >= {"node_id", "neighbour_id", "similarity"}
    assert t.groupby("node_id").size().max() <= 3
    # filters refuse above the cap
    with pytest.raises(ValueError, match="filtered"):
        knn_matrix(ids, emb, k=3, max_exact_rows=5, source_nodes=[1, 2])


def _edge_ds(rows):
    src, dst, w = zip(*rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "src_id": pa.array(src, pa.int64()),
                "dst_id": pa.array(dst, pa.int64()),
                "weight": pa.array(w, pa.float64()),
            }
        )
    )


def test_shortest_path_stream_unfolds_full_paths():
    from graph_data_science_ray.algos.paths import shortest_path_stream

    # 0 →1→ 1 →1→ 2 ; 0 →5→ 2 (longer direct edge); 0 →1→ 3 ; 4 unreachable
    edges = _edge_ds([(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0), (0, 3, 1.0), (4, 4, 1.0)])
    out = (
        shortest_path_stream(edges, source=0, num_partitions=2)
        .to_pandas()
        .sort_values(["target_node", "step"])
    )
    by_target = {
        t: list(g.node_id) for t, g in out.groupby("target_node")
    }
    assert by_target[2] == [2, 1, 0]  # via the cheaper 2-hop path
    assert by_target[1] == [1, 0]
    assert by_target[3] == [3, 0]
    assert by_target[0] == [0]
    assert 4 not in by_target  # unreachable targets don't stream
    c = {(r.target_node, r.node_id): r.cost for r in out.itertuples()}
    assert c[(2, 2)] == 2.0 and c[(2, 1)] == 1.0 and c[(2, 0)] == 0.0


def test_shortest_path_stream_tie_breaks_smallest_pred():
    from graph_data_science_ray.algos.paths import shortest_path_stream

    # two equal-cost 2-hop routes 0→1→3 and 0→2→3: pred(3) must be 1
    edges = _edge_ds([(0, 1, 1.0), (0, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0)])
    out = (
        shortest_path_stream(edges, source=0, num_partitions=2)
        .to_pandas()
        .sort_values(["target_node", "step"])
    )
    path3 = list(out[out.target_node == 3].node_id)
    assert path3 == [3, 1, 0]


def test_shortest_path_stream_targets_subset():
    from graph_data_science_ray.algos.paths import shortest_path_stream

    edges = _edge_ds([(0, 1, 1.0), (1, 2, 1.0), (0, 3, 2.0)])
    out = shortest_path_stream(edges, source=0, targets=[2], num_partitions=2).to_pandas()
    assert set(out.target_node) == {2}
    assert list(out.sort_values("step").node_id) == [2, 1, 0]
