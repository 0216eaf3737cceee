"""A*: exactness vs networkx, admissible-heuristic early stop, edge cases."""

import numpy as np
import pyarrow as pa
import pytest

from graph_data_science_ray.algos.astar import AStarResult, a_star, haversine_heuristic
from graph_data_science_ray.sources.edges import from_arrow


def _grid(w=6, h=6):
    """Directed 4-neighbour grid, weight = euclidean step (1.0), plus a
    few diagonal shortcuts; node id = y*w + x."""
    src, dst, wt = [], [], []
    for y in range(h):
        for x in range(w):
            u = y * w + x
            if x + 1 < w:
                src += [u, u + 1]
                dst += [u + 1, u]
                wt += [1.0, 1.0]
            if y + 1 < h:
                src += [u, u + w]
                dst += [u + w, u]
                wt += [1.0, 1.0]
    t = pa.table(
        {
            "src_id": pa.array(src, pa.int64()),
            "dst_id": pa.array(dst, pa.int64()),
            "weight": pa.array(wt, pa.float64()),
        }
    )
    coords = {u: (u % w, u // w) for u in range(w * h)}
    return t, coords


def _euclid_h(coords, target):
    tx, ty = coords[target]

    def h(ids):
        xs = np.array([coords[int(i)][0] for i in ids], dtype=np.float64)
        ys = np.array([coords[int(i)][1] for i in ids], dtype=np.float64)
        return np.hypot(xs - tx, ys - ty)

    return h


def test_astar_matches_networkx_grid():
    import networkx as nx

    t, coords = _grid()
    target = 35
    res = a_star(from_arrow(t), source=0, target=target,
                 heuristic=_euclid_h(coords, target), num_partitions=2)
    g = nx.DiGraph()
    for s, d, w in zip(t["src_id"].to_pylist(), t["dst_id"].to_pylist(), t["weight"].to_pylist()):
        g.add_edge(s, d, weight=w)
    exp_cost = nx.dijkstra_path_length(g, 0, target)
    assert res.cost == pytest.approx(exp_cost)
    # path validity: consecutive edges exist and sum to cost
    assert res.path[0] == 0 and res.path[-1] == target
    total = 0.0
    for a, b in zip(res.path, res.path[1:]):
        assert g.has_edge(a, b)
        total += g[a][b]["weight"]
    assert total == pytest.approx(res.cost)


def test_astar_early_stop_vs_h0():
    t, coords = _grid(8, 8)
    target = 9  # near the source corner — good h stops well before h=0
    r_h = a_star(from_arrow(t), 0, target, heuristic=_euclid_h(coords, target))
    r_0 = a_star(from_arrow(t), 0, target, heuristic=None)
    assert r_h.cost == pytest.approx(r_0.cost)
    assert r_h.iterations <= r_0.iterations
    assert r_h.iterations < 14  # eccentricity of the 8x8 grid from corner


def test_astar_matches_bellman_ford_distance():
    from graph_data_science_ray import fixtures
    from graph_data_science_ray.algos.paths import bellman_ford

    rng = np.random.default_rng(23)
    t0 = fixtures.er_random(50, 0.1, seed=5)
    t = t0.append_column("weight", pa.array(np.round(rng.random(t0.num_rows) * 5 + 0.1, 3), pa.float64()))
    bf = bellman_ford(from_arrow(t), source=None)
    src = int(bf.node_ids[np.argmin(np.where(bf.values == 0, 0, 1))])
    finite = np.isfinite(bf.values) & (bf.values > 0)
    if finite.any():
        tgt = int(bf.node_ids[np.where(finite)[0][-1]])
        res = a_star(from_arrow(t), src, tgt, heuristic=None)
        exp = float(bf.values[np.searchsorted(bf.node_ids, tgt)])
        assert res.cost == pytest.approx(exp)


def test_astar_unreachable_and_haversine():
    t = pa.table(
        {
            "src_id": pa.array([1, 3], pa.int64()),
            "dst_id": pa.array([2, 4], pa.int64()),
            "weight": pa.array([1.0, 1.0], pa.float64()),
        }
    )
    res = a_star(from_arrow(t), 1, 4, heuristic=None)
    assert res.cost == float("inf") and res.path == []

    coords = pa.table(
        {
            "node_id": pa.array([1, 2, 3, 4], pa.int64()),
            "latitude": pa.array([0.0, 0.0, 1.0, 1.0], pa.float64()),
            "longitude": pa.array([0.0, 1.0, 0.0, 1.0], pa.float64()),
        }
    )
    h = haversine_heuristic(coords, target=4)
    vals = h(np.array([1, 2, 3, 4], dtype=np.int64))
    assert vals[3] == pytest.approx(0.0)
    assert (vals[:3] > 0).all()
    # ~111 km per degree at the equator
    assert vals[1] == pytest.approx(111.19, rel=0.01)
