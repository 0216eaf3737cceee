"""Path finding (algos/paths.py) vs networkx on fixture + random graphs."""

import networkx as nx
import numpy as np
import pytest

from graph_data_science_ray import fixtures
from graph_data_science_ray.algos.paths import (
    bellman_ford,
    bfs_hops,
    reconstruct_path,
    shortest_path_tree,
)
from graph_data_science_ray.sources.edges import from_arrow

NP = 2


def _nx_digraph(t, weighted=False):
    g = nx.DiGraph()
    src = t.column("src_id").to_pylist()
    dst = t.column("dst_id").to_pylist()
    w = t.column("weight").to_pylist() if weighted else [1.0] * len(src)
    for s, d, ww in zip(src, dst, w):
        # parallel edges: keep the min weight (matches dedup 'min')
        if g.has_edge(s, d):
            g[s][d]["weight"] = min(g[s][d]["weight"], ww)
        else:
            g.add_edge(s, d, weight=ww)
    return g


@pytest.mark.parametrize("name", ["tiny_chain", "tiny_cycle", "paper_graph", "two_components"])
def test_bfs_hops_fixtures(name):
    t = getattr(fixtures, name)()
    res = bfs_hops(from_arrow(t), num_partitions=NP)
    g = _nx_digraph(t)
    source = min(t.column("src_id").to_pylist())
    want = nx.single_source_shortest_path_length(g, source)
    got = res.as_dict()
    for node, d in got.items():
        if d < 0:
            assert node not in want
        else:
            assert want[node] == d, (name, node)
    assert all(n in got for n in want)


def test_bfs_hops_undirected_and_random():
    t = fixtures.er_random(300, 0.01, seed=11)
    source = min(t.column("src_id").to_pylist())
    res = bfs_hops(from_arrow(t), source=source, undirected=True, num_partitions=NP)
    g = _nx_digraph(t).to_undirected()
    want = nx.single_source_shortest_path_length(g, source)
    got = {k: v for k, v in res.as_dict().items() if v >= 0}
    assert got == {k: v for k, v in want.items()}


def test_bfs_hop_bounded_contract():
    # after k rounds values are min hops over paths of <= k edges
    t = fixtures.edges_table([(1, 2), (2, 3), (3, 4), (4, 5)])
    res = bfs_hops(from_arrow(t), source=1, max_iterations=2, num_partitions=NP)
    assert res.as_dict() == {1: 0, 2: 1, 3: 2, 4: -1, 5: -1}


def test_bellman_ford_vs_nx_dijkstra():
    rng = np.random.default_rng(5)
    t = fixtures.er_random(200, 0.02, seed=3)
    w = rng.integers(1, 10, size=t.num_rows).astype(np.float64)
    t = t.append_column("weight", __import__("pyarrow").array(w))
    res = bellman_ford(from_arrow(t), num_partitions=NP)
    g = _nx_digraph(t, weighted=True)
    source = min(t.column("src_id").to_pylist())
    want = nx.single_source_dijkstra_path_length(g, source, weight="weight")
    got = res.as_dict()
    for node, cost in got.items():
        if np.isinf(cost):
            assert node not in want
        else:
            assert want[node] == pytest.approx(cost, abs=1e-9), node
    assert all(n in got for n in want)


def test_shortest_path_tree_and_reconstruct():
    t = fixtures.weighted_tri()
    res, pred = shortest_path_tree(from_arrow(t), weighted=True, num_partitions=NP)
    g = _nx_digraph(t, weighted=True)
    source = min(t.column("src_id").to_pylist())
    want = nx.single_source_dijkstra_path_length(g, source, weight="weight")
    got = res.as_dict()
    for node, cost in want.items():
        assert got[node] == pytest.approx(cost, abs=1e-9)
    # every reconstructed path is a valid path of the claimed cost
    for node, cost in want.items():
        path = reconstruct_path(res, pred, node)
        assert path[0] == source and path[-1] == node
        total = sum(g[a][b]["weight"] for a, b in zip(path, path[1:]))
        assert total == pytest.approx(cost, abs=1e-9)


def test_shortest_path_tree_unweighted_deterministic():
    # diamond with tied paths: tree must pick the smaller predecessor
    t = fixtures.edges_table([(1, 2), (1, 3), (2, 4), (3, 4)])
    res, pred = shortest_path_tree(from_arrow(t), source=1, num_partitions=NP)
    assert reconstruct_path(res, pred, 4) == [1, 2, 4]
