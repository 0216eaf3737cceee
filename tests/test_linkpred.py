"""Link-prediction pair scores vs networkx exact oracles
(adamic_adar_index / resource_allocation_index / common neighbors /
preferential_attachment on the undirected view)."""

import math

import networkx as nx
import numpy as np
import pyarrow as pa

from graph_data_science_ray import fixtures
from graph_data_science_ray.algos.linkpred import link_prediction, same_community
from graph_data_science_ray.sources.edges import from_arrow


def _nx_graph(t):
    g = nx.Graph()
    g.add_edges_from(
        (a, b)
        for a, b in zip(t.column("src_id").to_pylist(), t.column("dst_id").to_pylist())
        if a != b
    )
    return g


def test_scores_match_networkx():
    t = fixtures.er_random(60, 0.08, seed=13)
    g = _nx_graph(t)
    got = link_prediction(from_arrow(t))
    rows = {
        (r["node1"], r["node2"]): r for r in got.to_pylist()
    }
    # every pair with >=1 common neighbor must be present, with exact scores
    nodes = sorted(g.nodes)
    n_checked = 0
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            cn = sorted(nx.common_neighbors(g, a, b))
            if not cn:
                assert (a, b) not in rows
                continue
            r = rows[(a, b)]
            n_checked += 1
            assert r["common_neighbors"] == len(cn)
            assert math.isclose(
                r["adamic_adar"], sum(1.0 / math.log(g.degree(u)) for u in cn),
                rel_tol=1e-12)
            assert math.isclose(
                r["resource_allocation"], sum(1.0 / g.degree(u) for u in cn),
                rel_tol=1e-12)
            assert r["preferential_attachment"] == g.degree(a) * g.degree(b)
            assert r["total_neighbors"] == len(set(g[a]) | set(g[b]))
    assert n_checked > 50
    assert len(rows) == n_checked


def _tables_match(a: pa.Table, b: pa.Table) -> bool:
    # int columns exact; float columns allclose — adamic_adar /
    # resource_allocation are partial SUMS whose addition order depends
    # on Ray's block arrival order, so bitwise equality across two
    # separate runs is flaky at the last ulp
    if a.column_names != b.column_names or a.num_rows != b.num_rows:
        return False
    for col in a.column_names:
        x, y = a.column(col), b.column(col)
        if pa.types.is_floating(x.type):
            if not np.allclose(x.to_numpy(zero_copy_only=False),
                               y.to_numpy(zero_copy_only=False),
                               rtol=1e-12, atol=1e-15):
                return False
        elif not x.equals(y):
            return False
    return True


def test_pairs_filter_and_topk():
    t = fixtures.er_random(40, 0.15, seed=2)
    full = link_prediction(from_arrow(t))
    k5 = link_prediction(from_arrow(t), top_k=5)
    assert k5.num_rows == 5
    assert _tables_match(k5, full.slice(0, 5))
    # ordering: cn descending, then ids
    cn = full.column("common_neighbors").to_pylist()
    assert cn == sorted(cn, reverse=True) or all(
        cn[i] >= cn[i + 1] for i in range(len(cn) - 1)
    )
    want = pa.table(
        {"node1": full.column("node2").slice(0, 3),  # reversed order pairs
         "node2": full.column("node1").slice(0, 3)}
    )
    sub = link_prediction(from_arrow(t), pairs=want)
    assert sub.num_rows == 3
    assert _tables_match(sub, full.slice(0, 3))


def test_degree_cutoff_drops_hub_middles():
    # star: hub 0 connects 1..10; also edge 1-2. Common neighbors of
    # (1,2) = {0} via the hub; cutoff below 10 removes those wedges.
    src = [0] * 10 + [1]
    dst = list(range(1, 11)) + [2]
    t = pa.table({"src_id": pa.array(src, pa.int64()),
                  "dst_id": pa.array(dst, pa.int64())})
    full = link_prediction(from_arrow(t))
    # 45 leaf pairs via the hub + (0,1) via middle 2 + (0,2) via middle 1
    assert full.num_rows == 47
    cut = link_prediction(from_arrow(t), degree_cutoff=5)
    # hub middle removed; only middles 1 and 2 (deg 2 each) remain
    pairs = set(zip(cut.column("node1").to_pylist(), cut.column("node2").to_pylist()))
    assert pairs == {(0, 2), (0, 1)}


def test_same_community():
    pairs = pa.table({"node1": pa.array([1, 2, 3], pa.int64()),
                      "node2": pa.array([2, 3, 9], pa.int64())})
    comm = pa.table({"node_id": pa.array([1, 2, 3], pa.int64()),
                     "community": pa.array([7, 7, 8], pa.int64())})
    got = same_community(pairs, comm)
    assert got.column("same_community").to_pylist() == [1, 0, 0]


def test_empty():
    t = pa.table({"src_id": pa.array([], pa.int64()),
                  "dst_id": pa.array([], pa.int64())})
    assert link_prediction(from_arrow(t)).num_rows == 0
