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


def test_random_walks_deterministic_and_valid():
    import numpy as np

    from graph_data_science_ray import fixtures
    from graph_data_science_ray.algos.randomwalk import random_walks
    from graph_data_science_ray.sources.edges import from_arrow

    t = fixtures.powerlaw(120, seed=3)
    adj = {}
    for s, d in zip(t["src_id"].to_pylist(), t["dst_id"].to_pylist()):
        adj.setdefault(s, set()).add(d)
    starts = sorted(adj.keys())[:10]
    w1 = random_walks(from_arrow(t), starts, walk_length=12, walks_per_node=2, seed=7, num_partitions=2)
    w2 = random_walks(from_arrow(t), starts, walk_length=12, walks_per_node=2, seed=7, num_partitions=3)
    assert w1.equals(w2), "walks must be partitioning-invariant"
    # every consecutive step follows a real edge
    rows = list(zip(w1["walk_id"].to_pylist(), w1["step"].to_pylist(), w1["node_id"].to_pylist()))
    by_walk = {}
    for wid, st, node in rows:
        by_walk.setdefault(wid, []).append((st, node))
    for wid, seq in by_walk.items():
        seq.sort()
        assert seq[0] == (0, starts[wid // 2])
        for (s0, a), (s1, b) in zip(seq, seq[1:]):
            assert s1 == s0 + 1
            assert b in adj.get(a, set()), (wid, a, b)
    # different seed → different walks (overwhelmingly)
    w3 = random_walks(from_arrow(t), starts, walk_length=12, walks_per_node=2, seed=8, num_partitions=2)
    assert not w1.equals(w3)


def test_sample_rwr_induced_subgraph():
    from graph_data_science_ray import fixtures
    from graph_data_science_ray.algos.randomwalk import sample_rwr
    from graph_data_science_ray.sources.edges import from_arrow

    t = fixtures.powerlaw(150, seed=9)
    sub = sample_rwr(from_arrow(t), [t["src_id"][0].as_py()], walk_length=20, walks_per_node=4, seed=1, num_partitions=2)
    st = sub.take_all()
    full = set(zip(t["src_id"].to_pylist(), t["dst_id"].to_pylist()))
    assert 0 < len(st) < len(full)
    assert all((r["src_id"], r["dst_id"]) in full for r in st)


def test_toposort_matches_networkx_generations():
    import networkx as nx
    import numpy as np
    import pyarrow as pa

    from graph_data_science_ray import fixtures
    from graph_data_science_ray.algos.toposort import topological_sort
    from graph_data_science_ray.sources.edges import from_arrow

    # random DAG: keep only edges low→high
    t0 = fixtures.er_random(60, 0.08, seed=12)
    s = np.array(t0["src_id"].to_pylist())
    d = np.array(t0["dst_id"].to_pylist())
    keep = s < d
    t = pa.table({"src_id": pa.array(s[keep], pa.int64()), "dst_id": pa.array(d[keep], pa.int64())})
    res = topological_sort(from_arrow(t), num_partitions=2)
    assert not res.has_cycle_nodes
    g = nx.DiGraph(zip(s[keep].tolist(), d[keep].tolist()))
    exp = {}
    for lvl, gen in enumerate(nx.topological_generations(g)):
        for u in gen:
            exp[u] = lvl
    assert res.as_dict() == exp


def test_toposort_excludes_cycle_nodes():
    from graph_data_science_ray import fixtures
    from graph_data_science_ray.algos.toposort import topological_sort
    from graph_data_science_ray.sources.edges import from_arrow

    # DAG part 0→1→2 feeding a cycle {5,6}, plus downstream 6→9 (cyclic-reachable nodes stay excluded? no: 9 has indeg from 6 which never peels → 9 excluded too)
    pairs = [(0, 1), (1, 2), (2, 5), (5, 6), (6, 5), (6, 9)]
    res = topological_sort(from_arrow(fixtures.edges_table(pairs)), num_partitions=2)
    assert res.has_cycle_nodes
    assert res.as_dict() == {0: 0, 1: 1, 2: 2}


def test_steiner_tree_valid_and_competitive():
    import networkx as nx
    import numpy as np
    import pyarrow as pa

    from graph_data_science_ray import fixtures
    from graph_data_science_ray.algos.steiner import steiner_tree
    from graph_data_science_ray.sources.edges import from_arrow

    rng = np.random.default_rng(33)
    t0 = fixtures.er_random(40, 0.12, seed=15)
    w = np.round(rng.random(t0.num_rows) * 9 + 1, 3)
    t = t0.append_column("weight", pa.array(w, pa.float64()))
    g = nx.Graph()
    for s, d, ww in zip(t["src_id"].to_pylist(), t["dst_id"].to_pylist(), w):
        if s == d:
            continue
        if g.has_edge(s, d):
            g[s][d]["weight"] = min(g[s][d]["weight"], ww)
        else:
            g.add_edge(s, d, weight=ww)
    comp = max(nx.connected_components(g), key=len)
    terms = sorted(comp)[:5]
    res = steiner_tree(from_arrow(t), terms, num_partitions=2)
    # validity: subgraph, connects all terminals
    sub = nx.Graph()
    for u, v, ww in zip(res.edges["u"].to_pylist(), res.edges["v"].to_pylist(), res.edges["weight"].to_pylist()):
        assert g.has_edge(u, v) and abs(g[u][v]["weight"] - ww) < 1e-9
        sub.add_edge(u, v)
    assert all(tm in sub for tm in terms)
    assert nx.is_connected(sub)
    # 2-approx bound vs networkx' own metric-closure steiner tree
    nx_st = nx.algorithms.approximation.steiner_tree(g, terms, weight="weight")
    nx_w = sum(d["weight"] for _, _, d in nx_st.edges(data=True))
    assert res.total_weight <= 2.0 * nx_w + 1e-9
    assert res.total_weight >= 0.5 * nx_w - 1e-9


def test_steiner_tree_exact_small():
    from graph_data_science_ray import fixtures
    from graph_data_science_ray.algos.steiner import steiner_tree
    from graph_data_science_ray.sources.edges import from_arrow

    # path graph 0-1-2-3-4, terminals {0, 4} → whole path, weight 4
    pairs = [(i, i + 1) for i in range(4)]
    t = fixtures.edges_table(pairs, weights=[1.0] * 4)
    res = steiner_tree(from_arrow(t), [0, 4], num_partitions=2)
    assert res.total_weight == 4.0
    assert res.edges.num_rows == 4


def test_yens_k_shortest_matches_networkx():
    import networkx as nx
    import numpy as np
    import pyarrow as pa

    from graph_data_science_ray import fixtures
    from graph_data_science_ray.algos.yens import yens_k_shortest_paths
    from graph_data_science_ray.sources.edges import from_arrow

    rng = np.random.default_rng(41)
    t0 = fixtures.er_random(25, 0.2, seed=19)
    w = np.round(rng.random(t0.num_rows) * 9 + 1, 3)
    t = t0.append_column("weight", pa.array(w, pa.float64()))
    g = nx.Graph()
    for s, d, ww in zip(t["src_id"].to_pylist(), t["dst_id"].to_pylist(), w):
        if s == d:
            continue
        if g.has_edge(s, d):
            g[s][d]["weight"] = min(g[s][d]["weight"], ww)
        else:
            g.add_edge(s, d, weight=ww)
    comp = sorted(max(nx.connected_components(g), key=len))
    src, dst = comp[0], comp[-1]
    got = yens_k_shortest_paths(from_arrow(t), src, dst, k=3, num_partitions=2)
    # parse paths
    rows = got.to_pylist()
    paths = {}
    for r in rows:
        paths.setdefault(r["path_rank"], {"cost": r["total_cost"], "nodes": []})
        paths[r["path_rank"]]["nodes"].append((r["seq"], r["node_id"]))
    got_costs = []
    for rank in sorted(paths):
        seq = [n for _, n in sorted(paths[rank]["nodes"])]
        assert seq[0] == src and seq[-1] == dst
        assert len(set(seq)) == len(seq), "paths must be loopless"
        cost = sum(g[a][b]["weight"] for a, b in zip(seq, seq[1:]))
        assert abs(cost - paths[rank]["cost"]) < 1e-6
        got_costs.append(round(paths[rank]["cost"], 6))
    exp_costs = []
    for i, p in enumerate(nx.shortest_simple_paths(g, src, dst, weight="weight")):
        if i >= 3:
            break
        exp_costs.append(round(sum(g[a][b]["weight"] for a, b in zip(p, p[1:])), 6))
    assert got_costs == exp_costs, (got_costs, exp_costs)


def test_yens_path_stream_cumulative_costs():
    """yens_path_stream: same paths as yens_k_shortest_paths, plus
    per-node cumulative costs that telescope to the edge weights."""
    import pyarrow as pa

    from graph_data_science_ray.algos.yens import yens_k_shortest_paths, yens_path_stream

    rng = np.random.default_rng(41)
    t0 = fixtures.er_random(25, 0.2, seed=19)
    w = np.round(rng.random(t0.num_rows) * 9 + 1, 3)
    t = t0.append_column("weight", pa.array(w, pa.float64()))
    g = _nx_digraph(t, weighted=True).to_undirected()
    comp = sorted(max(nx.connected_components(g), key=len))
    src, dst = comp[0], comp[-1]
    base = yens_k_shortest_paths(from_arrow(t), src, dst, k=3, num_partitions=2).to_pylist()
    strm = yens_path_stream(from_arrow(t), src, dst, k=3, num_partitions=2).to_pylist()
    by_rank_base, by_rank_strm = {}, {}
    for r in base:
        by_rank_base.setdefault(r["path_rank"], []).append((r["seq"], r["node_id"]))
    for r in strm:
        by_rank_strm.setdefault(r["path_rank"], []).append(
            (r["step"], r["node_id"], r["cost"], r["total_cost"])
        )
    assert sorted(by_rank_base) == sorted(by_rank_strm)
    for rank, rows in by_rank_strm.items():
        seq_base = [n for _, n in sorted(by_rank_base[rank])]
        rows = sorted(rows, reverse=True)  # step desc = source → target
        seq_strm = [n for _, n, _, _ in rows]
        assert seq_strm == seq_base  # step counts back from the target
        costs = [c for _, _, c, _ in rows]
        assert costs[0] == 0.0
        for (a, b, ca, cb) in ((seq_strm[i], seq_strm[i + 1], costs[i], costs[i + 1])
                               for i in range(len(seq_strm) - 1)):
            assert abs((cb - ca) - g[a][b]["weight"]) < 1e-6
        assert abs(costs[-1] - rows[0][3]) < 1e-9  # cum at target == total


def test_astar_stream_matches_astar_path():
    import pyarrow as pa

    from graph_data_science_ray.algos.astar import a_star, a_star_stream

    rng = np.random.default_rng(7)
    t0 = fixtures.er_random(40, 0.12, seed=29)
    w = (rng.integers(1, 9, t0.num_rows)).astype(np.float64)
    t = t0.append_column("weight", pa.array(w, pa.float64()))
    g = _nx_digraph(t, weighted=True)
    # pick a reachable target from the smallest node
    src = min(g.nodes)
    reach = nx.single_source_dijkstra_path_length(g, src)
    tgt = max(reach)
    res = a_star(from_arrow(t), src, tgt, heuristic=None)
    strm = a_star_stream(from_arrow(t), src, tgt, heuristic=None).to_pylist()
    assert strm, "stream empty for reachable target"
    rows = sorted(strm, key=lambda r: -r["step"])  # source → target
    seq = [r["node_id"] for r in rows]
    assert seq[0] == src and seq[-1] == tgt
    assert rows[0]["cost"] == 0.0
    assert abs(rows[-1]["cost"] - res.cost) < 1e-9
    # cumulative costs telescope along real edges
    for a, b, ca, cb in ((seq[i], seq[i + 1], rows[i]["cost"], rows[i + 1]["cost"])
                         for i in range(len(seq) - 1)):
        assert g.has_edge(a, b)
        assert abs((cb - ca) - g[a][b]["weight"]) < 1e-9
    assert abs(res.cost - reach[tgt]) < 1e-9


def test_astar_stream_unreachable_empty():
    from graph_data_science_ray.algos.astar import a_star_stream

    t = fixtures.tiny_chain()  # 1→2→3... directed chain
    ids = sorted(set(t["src_id"].to_pylist()) | set(t["dst_id"].to_pylist()))
    out = a_star_stream(from_arrow(t), ids[-1], ids[0], weighted=False)
    assert out.num_rows == 0


def test_dijkstra_wrappers():
    import pyarrow as pa
    import numpy as np
    import pytest

    from graph_data_science_ray import fixtures
    from graph_data_science_ray.algos.paths import (
        bellman_ford,
        dijkstra_single_source,
        dijkstra_source_target,
    )
    from graph_data_science_ray.sources.edges import from_arrow

    rng = np.random.default_rng(31)
    t0 = fixtures.er_random(40, 0.12, seed=3)
    t = t0.append_column(
        "weight", pa.array(np.round(rng.random(t0.num_rows) * 4 + 0.5, 3), pa.float64())
    )
    bf = bellman_ford(from_arrow(t))
    dj = dijkstra_single_source(from_arrow(t))
    assert np.array_equal(bf.node_ids, dj.node_ids)
    assert np.allclose(bf.values, dj.values, equal_nan=True)

    from graph_data_science_ray.algos.paths import delta_stepping

    ds_res = delta_stepping(from_arrow(t), delta=2.0)  # Δ-independent
    assert np.array_equal(bf.node_ids, ds_res.node_ids)
    assert np.allclose(bf.values, ds_res.values, equal_nan=True)

    finite = np.isfinite(bf.values) & (bf.values > 0)
    if finite.any():
        src = int(bf.node_ids[bf.values == 0][0])
        tgt = int(bf.node_ids[np.where(finite)[0][0]])
        st = dijkstra_source_target(from_arrow(t), src, tgt)
        assert st.cost == pytest.approx(float(bf.values[np.searchsorted(bf.node_ids, tgt)]))
        assert st.path[0] == src and st.path[-1] == tgt

    neg = pa.table(
        {
            "src_id": pa.array([1], pa.int64()),
            "dst_id": pa.array([2], pa.int64()),
            "weight": pa.array([-1.0], pa.float64()),
        }
    )
    with pytest.raises(ValueError):
        dijkstra_single_source(from_arrow(neg))


def test_modularity_optimization_is_level1_louvain():
    import pyarrow as pa  # noqa: F401
    from graph_data_science_ray import fixtures
    from graph_data_science_ray.algos.louvain import louvain, modularity_optimization
    from graph_data_science_ray.sources.edges import from_arrow

    t = fixtures.er_random(60, 0.08, seed=21)
    a = modularity_optimization(from_arrow(t), max_rounds=5)
    b = louvain(from_arrow(t), max_levels=1, max_rounds_per_level=5)
    ta, tb = a.to_table(), b.to_table()
    assert ta.equals(tb)


def test_longest_path_unweighted_equals_levels_and_dp():
    import pyarrow as pa

    from graph_data_science_ray.algos.toposort import longest_path, topological_sort

    t0 = fixtures.er_random(60, 0.08, seed=21)
    s = np.array(t0["src_id"].to_pylist())
    d = np.array(t0["dst_id"].to_pylist())
    keep = s < d
    s, d = s[keep], d[keep]
    rng = np.random.default_rng(5)
    w = rng.integers(1, 9, s.shape[0]).astype(np.float64)
    t = pa.table(
        {
            "src_id": pa.array(s, pa.int64()),
            "dst_id": pa.array(d, pa.int64()),
            "weight": pa.array(w, pa.float64()),
        }
    )
    # unweighted longest distance from any source == Kahn level
    topo = topological_sort(from_arrow(t), num_partitions=NP)
    res_u = longest_path(from_arrow(t), weighted=False, num_partitions=NP)
    assert res_u.node_ids.tolist() == topo.node_ids.tolist()
    assert res_u.costs.astype(np.int64).tolist() == topo.levels.tolist()

    # weighted: numpy DP reference in ascending id order (edges go low→high)
    res_w = longest_path(from_arrow(t), weighted=True, num_partitions=NP)
    nodes = np.union1d(s, d)
    dp = np.zeros(nodes.shape[0])
    si, di = np.searchsorted(nodes, s), np.searchsorted(nodes, d)
    # parallel (s,d) edges may repeat with different w: relax per edge
    for k in np.argsort(d, kind="stable"):
        dp[di[k]] = max(dp[di[k]], dp[si[k]] + w[k])
    assert res_w.node_ids.tolist() == nodes.tolist()
    np.testing.assert_allclose(res_w.costs, dp)


def test_longest_path_excludes_cycle_nodes():
    from graph_data_science_ray.algos.toposort import longest_path

    pairs = [(0, 1), (1, 2), (2, 5), (5, 6), (6, 5), (6, 9)]
    res = longest_path(from_arrow(fixtures.edges_table(pairs)), num_partitions=NP)
    assert res.has_cycle_nodes
    assert res.as_dict() == {0: 0.0, 1: 1.0, 2: 2.0}


def test_bellman_ford_negative_weights_no_cycle():
    import pyarrow as pa

    from graph_data_science_ray.algos.paths import bellman_ford_negative_cycles

    # DAG (low→high ids) with negative weights: no cycle possible
    t0 = fixtures.er_random(40, 0.12, seed=31)
    s = np.array(t0["src_id"].to_pylist())
    d = np.array(t0["dst_id"].to_pylist())
    keep = s < d
    s, d = s[keep], d[keep]
    rng = np.random.default_rng(7)
    w = rng.integers(-4, 10, s.shape[0]).astype(np.float64)
    t = pa.table(
        {
            "src_id": pa.array(s, pa.int64()),
            "dst_id": pa.array(d, pa.int64()),
            "weight": pa.array(w, pa.float64()),
        }
    )
    res, has_cycle = bellman_ford_negative_cycles(from_arrow(t), num_partitions=NP)
    assert not has_cycle
    g = nx.DiGraph()
    for a, b, ww in zip(s.tolist(), d.tolist(), w.tolist()):
        if g.has_edge(a, b):
            g[a][b]["weight"] = min(g[a][b]["weight"], ww)
        else:
            g.add_edge(a, b, weight=ww)
    source = int(s.min())
    want = nx.single_source_bellman_ford_path_length(g, source, weight="weight")
    got = dict(zip(res.node_ids.tolist(), res.values.tolist()))
    for node, cost in want.items():
        assert got[node] == pytest.approx(cost), node
    for node, cost in got.items():
        if np.isfinite(cost):
            assert node in want or node == source


def test_bellman_ford_negative_cycle_detection():
    from graph_data_science_ray.algos.paths import bellman_ford_negative_cycles

    # 0→1→2 (costs 1,1); cycle 2→3→2 at total -1; 3→4; separate 0→5 leg
    pairs = [(0, 1), (1, 2), (2, 3), (3, 2), (3, 4), (0, 5)]
    weights = [1.0, 1.0, 2.0, -3.0, 1.0, 7.0]
    t = fixtures.edges_table(pairs, weights)
    res, has_cycle = bellman_ford_negative_cycles(from_arrow(t), source=0, num_partitions=NP)
    assert has_cycle
    got = dict(zip(res.node_ids.tolist(), res.values.tolist()))
    # nodes on / downstream of the negative cycle are -inf
    assert got[2] == -np.inf and got[3] == -np.inf and got[4] == -np.inf
    # nodes not touched by the cycle keep exact costs
    assert got[0] == 0.0 and got[1] == 1.0 and got[5] == 7.0


def test_cnarw_walks_edge_valid_and_partition_invariant():
    import pyarrow as pa

    from graph_data_science_ray.algos.randomwalk import cnarw_walks
    from graph_data_science_ray.sources.edges import from_arrow

    t = fixtures.powerlaw(300, seed=11)
    starts = sorted({t["src_id"][i].as_py() for i in range(6)})
    w1 = cnarw_walks(from_arrow(t), starts, walk_length=10, walks_per_node=2, seed=3, num_partitions=2)
    w2 = cnarw_walks(from_arrow(t), starts, walk_length=10, walks_per_node=2, seed=3, num_partitions=3)
    assert w1.equals(w2), "walks must be partitioning-invariant"
    # undirected adjacency for validity
    adj = {}
    for s, d in zip(t["src_id"].to_pylist(), t["dst_id"].to_pylist()):
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    seq = {}
    for wid, st, node in zip(
        w1["walk_id"].to_pylist(), w1["step"].to_pylist(), w1["node_id"].to_pylist()
    ):
        seq.setdefault(wid, []).append((st, node))
    for wid, steps in seq.items():
        steps.sort()
        for (s0, a), (s1, b) in zip(steps, steps[1:]):
            assert s1 == s0 + 1
            assert b in adj[a], (wid, a, b)
    w3 = cnarw_walks(from_arrow(t), starts, walk_length=10, walks_per_node=2, seed=4, num_partitions=2)
    assert not w1.equals(w3)


def test_cnarw_weights_match_bruteforce_reference():
    import pyarrow as pa

    from graph_data_science_ray.algos.randomwalk import _walk_key, cnarw_walks
    from graph_data_science_ray.sources.edges import from_arrow

    # u=0 with neighbors 1,2,3; 1-2 edge (common nbrs); 3 hangs free
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2)]
    t = fixtures.edges_table(pairs)
    n_walks = 64
    got = cnarw_walks(from_arrow(t), [0], walk_length=2, walks_per_node=n_walks, seed=9, num_partitions=2)
    first_step = {
        wid: node
        for wid, st, node in zip(
            got["walk_id"].to_pylist(), got["step"].to_pylist(), got["node_id"].to_pylist()
        )
        if st == 1
    }
    # brute-force reference: deg/common over the undirected graph
    adj = {0: {1, 2, 3}, 1: {0, 2}, 2: {0, 1}, 3: {0}}
    deg = {k: len(v) for k, v in adj.items()}
    for wid in range(n_walks):
        cands = np.array(sorted(adj[0]), dtype=np.int64)
        weight = np.array(
            [1.0 - len(adj[0] & adj[v] - {0, v}) / min(deg[0], deg[v]) for v in cands]
        )
        u01 = (_walk_key(9, np.full(len(cands), wid), 1, cands).astype(np.float64) + 1.0) / float(2**64)
        with np.errstate(divide="ignore"):
            race = np.where(weight > 0, -np.log(u01) / np.maximum(weight, 1e-300), np.inf)
        want = cands[np.lexsort((cands, race))[0]]
        assert first_step[wid] == want, wid
    # and the aggregate bias: the overlap-free neighbor wins most often
    from collections import Counter

    freq = Counter(first_step.values())
    assert freq[3] > freq[1] and freq[3] > freq[2]


def test_sample_cnarw_induced_subgraph():
    from graph_data_science_ray.algos.randomwalk import sample_cnarw
    from graph_data_science_ray.sources.edges import from_arrow

    t = fixtures.powerlaw(150, seed=9)
    sub = sample_cnarw(from_arrow(t), [t["src_id"][0].as_py()], walk_length=15, walks_per_node=4, seed=1, num_partitions=2)
    st = sub.take_all()
    full = set(zip(t["src_id"].to_pylist(), t["dst_id"].to_pylist()))
    assert 0 < len(st) < len(full)
    assert all((r["src_id"], r["dst_id"]) in full for r in st)


def _pcst_bruteforce(pairs, weights, prizes):
    """Exact PCST by subset enumeration: best Σprize(S) − MST(induced S)."""
    import itertools

    import networkx as nx

    g = nx.Graph()
    for (a, b), w in zip(pairs, weights):
        if g.has_edge(a, b):
            g[a][b]["weight"] = min(g[a][b]["weight"], w)
        else:
            g.add_edge(a, b, weight=w)
    nodes = sorted(g)
    best = max(prizes.values())  # single node, no edges
    for r in range(2, len(nodes) + 1):
        for S in itertools.combinations(nodes, r):
            sub = g.subgraph(S)
            if not nx.is_connected(sub):
                continue
            mst_w = sum(d["weight"] for _, _, d in nx.minimum_spanning_edges(sub, data=True))
            best = max(best, sum(prizes.get(x, 0.0) for x in S) - mst_w)
    return best


def test_prize_steiner_tree_validity_and_quality():
    import pyarrow as pa

    from graph_data_science_ray.algos.pcst import prize_steiner_tree

    rng = np.random.default_rng(41)
    t0 = fixtures.er_random(9, 0.45, seed=19)
    pairs = [
        (s, d)
        for s, d in zip(t0["src_id"].to_pylist(), t0["dst_id"].to_pylist())
        if s != d
    ]
    weights = np.round(rng.random(len(pairs)) * 4 + 0.5, 3).tolist()
    nodes = sorted({x for p in pairs for x in p})
    prizes = {n: float(np.round(rng.random() * 6, 3)) for n in nodes}
    t = fixtures.edges_table(pairs, weights)

    res = prize_steiner_tree(from_arrow(t), prizes, num_partitions=NP)
    # validity: a tree (|E| = |V|-1), edges exist in the graph
    assert res.edges.num_rows == len(res.nodes) - 1
    eset = {}
    for (a, b), w in zip(pairs, weights):
        k = (min(a, b), max(a, b))
        eset[k] = min(eset.get(k, np.inf), w)
    for u, v, w in zip(
        res.edges["u"].to_pylist(), res.edges["v"].to_pylist(), res.edges["weight"].to_pylist()
    ):
        assert (u, v) in eset and w == pytest.approx(eset[(u, v)])
    # connected (union-find over reported edges)
    parent = {n: n for n in res.nodes.tolist()}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(res.edges["u"].to_pylist(), res.edges["v"].to_pylist()):
        parent[find(u)] = find(v)
    assert len({find(n) for n in res.nodes.tolist()}) == 1
    # every leaf pays for itself after pruning
    deg = {}
    wt = {}
    for u, v, w in zip(
        res.edges["u"].to_pylist(), res.edges["v"].to_pylist(), res.edges["weight"].to_pylist()
    ):
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
        wt[(u, v)] = w
    root = max(prizes, key=lambda n: (prizes[n], -n))
    for (u, v), w in wt.items():
        for leaf in (u, v):
            if deg[leaf] == 1 and leaf != root:
                assert prizes.get(leaf, 0.0) >= w, (leaf, w)
    # quality: within 75% of the exact optimum (deterministic, so stable)
    opt = _pcst_bruteforce(pairs, weights, prizes)
    assert res.net_value >= 0.75 * opt - 1e-9, (res.net_value, opt)
    # deterministic
    res2 = prize_steiner_tree(from_arrow(t), prizes, num_partitions=3)
    assert res.edges.equals(res2.edges)


def test_prize_steiner_tree_cheap_path_exact():
    from graph_data_science_ray.algos.pcst import prize_steiner_tree

    # two big prizes joined by a cheap 2-hop path through a zero-prize node,
    # plus an expensive distractor edge
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3)]
    weights = [0.5, 0.5, 10.0, 5.0]
    prizes = {0: 5.0, 1: 0.0, 2: 5.0, 3: 1.0}
    res = prize_steiner_tree(from_arrow(fixtures.edges_table(pairs, weights)), prizes, num_partitions=NP)
    assert sorted(res.nodes.tolist()) == [0, 1, 2]
    assert res.net_value == pytest.approx(10.0 - 1.0)


def test_random_walks_pq_bias_delegates():
    """GDS returnFactor/inOutFactor on gds.randomWalk — delegated to the
    exact p/q node2vec walker; same schema, deterministic, edge-valid."""
    import numpy as np
    import pytest

    from graph_data_science_ray import fixtures
    from graph_data_science_ray.algos.node2vec import node2vec_walks
    from graph_data_science_ray.algos.randomwalk import random_walks
    from graph_data_science_ray.sources.edges import from_arrow

    t = fixtures.powerlaw(120, seed=3)
    starts = sorted(set(t["src_id"].to_pylist()))[:8]
    w = random_walks(from_arrow(t), starts, walk_length=10, walks_per_node=2,
                     seed=7, num_partitions=2, return_factor=4.0, in_out_factor=0.5)
    ref = node2vec_walks(from_arrow(t), starts, walk_length=10, walks_per_node=2,
                         seed=7, num_partitions=2, return_factor=4.0, in_out_factor=0.5)
    assert w.equals(ref)
    assert set(w.column_names) == {"walk_id", "step", "node_id"}
    with pytest.raises(ValueError):
        random_walks(from_arrow(t), starts, restart_prob=0.2, return_factor=2.0)


def test_all_shortest_paths_weighted_vs_nx():
    from graph_data_science_ray.algos.paths import all_shortest_paths_weighted

    rng = np.random.default_rng(11)
    t = fixtures.er_random(120, 0.03, seed=9)
    w = rng.integers(1, 9, size=t.num_rows).astype(np.float64)
    t = t.append_column("weight", __import__("pyarrow").array(w))
    g = _nx_digraph(t, weighted=True)
    nodes = sorted(set(t.column("src_id").to_pylist()) | set(t.column("dst_id").to_pylist()))
    srcs = nodes[:5]
    pairs, rounds, converged = all_shortest_paths_weighted(
        from_arrow(t), srcs, num_partitions=NP)
    assert converged
    got = {(s, d): c for s, d, c in zip(pairs.column("source_id").to_pylist(),
                                        pairs.column("target_id").to_pylist(),
                                        pairs.column("cost").to_pylist())}
    for s in srcs:
        want = nx.single_source_dijkstra_path_length(g, s, weight="weight")
        for d, c in want.items():
            assert got[(s, d)] == pytest.approx(c, abs=1e-9), (s, d)
        assert {d for (ss, d) in got if ss == s} == set(want)
    # sorted output, partitioning-invariant
    p2, _, _ = all_shortest_paths_weighted(from_arrow(t).repartition(5), srcs,
                                           num_partitions=3)
    assert pairs.equals(p2)


def test_all_shortest_paths_weighted_hop_bound_and_undirected():
    from graph_data_science_ray.algos.paths import all_shortest_paths_weighted

    pa_ = __import__("pyarrow")
    t = fixtures.edges_table([(1, 2), (2, 3), (3, 4)])
    t = t.append_column("weight", pa_.array([5.0, 1.0, 2.0]))
    # 2 rounds: costs over paths of <= 2 edges only
    pairs, rounds, converged = all_shortest_paths_weighted(
        from_arrow(t), [1], max_iterations=2, num_partitions=NP)
    got = {(s, d): c for s, d, c in zip(pairs.column("source_id").to_pylist(),
                                        pairs.column("target_id").to_pylist(),
                                        pairs.column("cost").to_pylist())}
    assert got == {(1, 1): 0.0, (1, 2): 5.0, (1, 3): 6.0}
    assert rounds == 2 and not converged
    # undirected view reaches backwards
    pairs_u, _, conv_u = all_shortest_paths_weighted(
        from_arrow(t), [4], undirected=True, num_partitions=NP)
    gu = {(s, d): c for s, d, c in zip(pairs_u.column("source_id").to_pylist(),
                                       pairs_u.column("target_id").to_pylist(),
                                       pairs_u.column("cost").to_pylist())}
    assert conv_u and gu == {(4, 4): 0.0, (4, 3): 2.0, (4, 2): 3.0, (4, 1): 8.0}
