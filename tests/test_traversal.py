"""DFS visit order vs networkx (ascending-neighbour convention)."""

import networkx as nx
import numpy as np
import pyarrow as pa

from graph_data_science_ray import fixtures
from graph_data_science_ray.algos.traversal import dfs
from graph_data_science_ray.sources.edges import from_arrow


def _nx_digraph_sorted(t):
    g = nx.DiGraph()
    pairs = sorted(zip(t.column("src_id").to_pylist(), t.column("dst_id").to_pylist()))
    g.add_edges_from(pairs)  # insertion order = ascending neighbours
    return g


def test_dfs_matches_networkx_preorder():
    t = fixtures.er_random(40, 0.1, seed=11)
    g = _nx_digraph_sorted(t)
    src = min(g.nodes)
    got = dfs(from_arrow(t), source=src)
    exp = list(nx.dfs_preorder_nodes(g, source=src))
    assert got.column("node_id").to_pylist() == exp
    # depth column: each node's depth is ≥ 1 more than 0 for non-source
    d = got.column("depth").to_pylist()
    assert d[0] == 0 and all(x >= 1 for x in d[1:])


def test_dfs_max_depth_and_targets():
    # chain 1→2→3→4 with branch 1→5
    t = pa.table(
        {
            "src_id": pa.array([1, 2, 3, 1], pa.int64()),
            "dst_id": pa.array([2, 3, 4, 5], pa.int64()),
        }
    )
    full = dfs(from_arrow(t), source=1)
    assert full.column("node_id").to_pylist() == [1, 2, 3, 4, 5]
    lim = dfs(from_arrow(t), source=1, max_depth=1)
    assert lim.column("node_id").to_pylist() == [1, 2, 5]
    tgt = dfs(from_arrow(t), source=1, target_nodes=[3])
    assert tgt.column("node_id").to_pylist() == [1, 2, 3]


def test_dfs_undirected_and_isolated_source():
    t = pa.table(
        {
            "src_id": pa.array([2], pa.int64()),
            "dst_id": pa.array([1], pa.int64()),
        }
    )
    # directed: source 1 reaches nothing
    assert dfs(from_arrow(t), source=1).column("node_id").to_pylist() == [1]
    # undirected: reaches 2
    got = dfs(from_arrow(t), source=1, undirected=True)
    assert got.column("node_id").to_pylist() == [1, 2]
