"""Engine algorithms (dataflow path) vs the in-repo oracles on the
FIXTURES.md graph fixtures — the allclose-1e-6 / exact contracts."""

import numpy as np
import pytest

from graph_data_science_ray import fixtures
from graph_data_science_ray.algos.labelprop import label_propagation
from graph_data_science_ray.algos.pagerank import pagerank
from graph_data_science_ray.algos.triangles import triangle_count
from graph_data_science_ray.algos.wcc import wcc
from graph_data_science_ray.oracles import (
    lpa_oracle,
    pagerank_oracle,
    partitions_equal,
    triangles_oracle,
    wcc_oracle,
)
from graph_data_science_ray.sources.edges import from_arrow

NP = 2  # tiny shuffle parallelism for toy graphs


def _pairs(t):
    cols = [t.column("src_id").to_pylist(), t.column("dst_id").to_pylist()]
    if "weight" in t.column_names:
        cols.append(t.column("weight").to_pylist())
    return list(zip(*cols))


FIXES = {
    "tiny_chain": fixtures.tiny_chain,
    "tiny_cycle": fixtures.tiny_cycle,
    "star_hub": fixtures.star_hub,
    "two_components": fixtures.two_components,
    "paper_graph": fixtures.paper_graph,
    "self_loop": fixtures.self_loop,
}


@pytest.mark.parametrize("name", ["tiny_chain", "tiny_cycle", "star_hub", "paper_graph", "self_loop"])
def test_pagerank_allclose_fixtures(name):
    t = FIXES[name]()
    res = pagerank(from_arrow(t), max_iterations=30, tolerance=1e-9, num_partitions=NP)
    want = pagerank_oracle(_pairs(t), max_iter=30, tol=1e-9)
    got = res.as_dict()
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6), (name, k)


def test_pagerank_weighted():
    t = fixtures.weighted_tri()
    res = pagerank(from_arrow(t), weighted=True, max_iterations=40, tolerance=1e-10, num_partitions=NP)
    want = pagerank_oracle(_pairs(t), weighted=True, max_iter=40, tol=1e-10)
    for k, v in want.items():
        assert res.as_dict()[k] == pytest.approx(v, abs=1e-6)


def test_pagerank_random_graph():
    t = fixtures.er_random(120, 0.05, seed=11)
    res = pagerank(from_arrow(t), max_iterations=25, num_partitions=NP)
    want = pagerank_oracle(_pairs(t), max_iter=25)
    got = res.as_dict()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)


@pytest.mark.parametrize("name", ["two_components", "tiny_chain", "self_loop"])
def test_wcc_exact_fixtures(name):
    t = FIXES[name]()
    res = wcc(from_arrow(t), num_partitions=NP)
    want = wcc_oracle(_pairs(t))
    assert res.converged
    assert res.as_dict() == want


def test_wcc_random_graph():
    t = fixtures.er_random(150, 0.01, seed=21)
    res = wcc(from_arrow(t), num_partitions=NP)
    assert res.converged
    assert res.as_dict() == wcc_oracle(_pairs(t))


def test_lpa_matches_deterministic_oracle():
    t = fixtures.two_components()
    res = label_propagation(from_arrow(t), max_iterations=10, num_partitions=NP)
    want = lpa_oracle(_pairs(t), max_iter=10)
    assert res.as_dict() == want


def test_lpa_labels_stay_in_component_random():
    t = fixtures.er_random(80, 0.04, seed=31)
    res = label_propagation(from_arrow(t), max_iterations=10, num_partitions=NP)
    comps = wcc_oracle(_pairs(t))
    got = res.as_dict()
    want = lpa_oracle(_pairs(t), max_iter=10)
    assert got == want
    for u, lab in got.items():
        assert comps[lab] == comps[u]


@pytest.mark.parametrize("name", ["two_components", "self_loop", "paper_graph"])
def test_triangles_exact_fixtures(name):
    t = FIXES[name]()
    res = triangle_count(from_arrow(t), num_partitions=NP)
    want = triangles_oracle(_pairs(t))
    assert res.as_dict() == want
    assert res.metrics[0]["global"] == sum(want.values()) // 3


def test_triangles_random_graph():
    t = fixtures.er_random(70, 0.1, seed=41)
    res = triangle_count(from_arrow(t), num_partitions=NP)
    want = triangles_oracle(_pairs(t))
    assert res.as_dict() == want


def test_triangle_stream_matches_networkx_enumeration():
    import networkx as nx

    from graph_data_science_ray.algos.triangles import triangle_stream

    t = fixtures.er_random(70, 0.1, seed=41)
    g = nx.Graph()
    g.add_edges_from(_pairs(t))
    g.remove_edges_from(nx.selfloop_edges(g))
    # canonical: every triangle exactly once, ordered corners
    want = {
        tuple(sorted((a, b, c)))
        for a in g
        for b in g[a]
        for c in g[a]
        if b < c and g.has_edge(b, c)
    }
    got = triangle_stream(from_arrow(t), num_partitions=NP).take_all()
    got_set = {(r["node_a"], r["node_b"], r["node_c"]) for r in got}
    assert len(got) == len(got_set)  # no duplicate rows
    assert got_set == want
    assert all(a < b < c for a, b, c in got_set)


def test_triangles_max_degree_cutoff():
    # star: hub 0 has degree 9 → excluded at max_degree=5, reports -1
    t = fixtures.star_hub()
    res = triangle_count(from_arrow(t), max_degree=5, num_partitions=NP)
    got = res.as_dict()
    assert got[0] == -1
    assert all(v == 0 for k, v in got.items() if k != 0)


def test_wcc_star_matches_networkx_partitions():
    import networkx as nx

    from graph_data_science_ray.algos.wcc import wcc_star
    from graph_data_science_ray.sources.edges import from_arrow

    t = fixtures.er_random(150, 0.02, seed=77)
    got = wcc_star(from_arrow(t), num_partitions=3).to_pandas()
    g = nx.Graph(zip(t["src_id"].to_pylist(), t["dst_id"].to_pylist()))
    g.remove_edges_from(nx.selfloop_edges(g))
    g.add_nodes_from(t["src_id"].to_pylist())
    want = {}
    for comp in nx.connected_components(g):
        root = min(comp)
        for n in comp:
            want[n] = root
    assert dict(zip(got["node_id"], got["component"])) == want
    assert got["node_id"].is_unique


def test_wcc_star_long_path_and_self_loops():
    from graph_data_science_ray.algos.wcc import wcc_star
    from graph_data_science_ray.sources.edges import from_arrow

    # 200-hop path — diameter >> O(log n) star-contraction rounds —
    # plus a self-loop-only node 999
    pairs = [(i, i + 1) for i in range(200)] + [(999, 999)]
    got = wcc_star(from_arrow(fixtures.edges_table(pairs)), num_partitions=2).to_pandas()
    comp = dict(zip(got["node_id"], got["component"]))
    assert all(comp[i] == 0 for i in range(201))
    assert comp[999] == 999

    # partition invariance
    got2 = wcc_star(from_arrow(fixtures.edges_table(pairs)), num_partitions=5).to_pandas()
    assert dict(zip(got2["node_id"], got2["component"])) == comp


def test_wcc_weight_threshold():
    import networkx as nx

    from graph_data_science_ray.algos.wcc import wcc
    from graph_data_science_ray.sources.edges import from_arrow

    # chain 0-1-2-3 with a weak 1-2 link, plus strong 4-5
    pairs = [(0, 1), (1, 2), (2, 3), (4, 5)]
    weights = [5.0, 0.5, 5.0, 5.0]
    t = fixtures.edges_table(pairs, weights)
    res = wcc(from_arrow(t), threshold=1.0, num_partitions=2)
    comp = dict(zip(res.node_ids.tolist(), res.values.astype(int).tolist()))
    # the weak edge is ignored: {0,1} {2,3} {4,5}; all nodes present
    assert comp == {0: 0, 1: 0, 2: 2, 3: 2, 4: 4, 5: 4}
    # without threshold the chain is one component
    res2 = wcc(from_arrow(t), num_partitions=2)
    comp2 = dict(zip(res2.node_ids.tolist(), res2.values.astype(int).tolist()))
    assert comp2 == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4}


def test_wcc_consecutive_ids_and_pagerank_scaler():
    import numpy as np

    from graph_data_science_ray.algos.pagerank import pagerank
    from graph_data_science_ray.algos.wcc import wcc
    from graph_data_science_ray.sources.edges import from_arrow

    pairs = [(10, 11), (11, 12), (40, 41), (99, 99)]
    res = wcc(from_arrow(fixtures.edges_table(pairs)), consecutive_ids=True, num_partitions=2)
    comp = dict(zip(res.node_ids.tolist(), res.values.tolist()))
    assert comp == {10: 0, 11: 0, 12: 0, 40: 1, 41: 1, 99: 2}

    t = fixtures.er_random(50, 0.1, seed=3)
    raw = pagerank(from_arrow(t), max_iterations=5, tolerance=0.0, num_partitions=2)
    l1 = pagerank(
        from_arrow(t), max_iterations=5, tolerance=0.0, num_partitions=2, scaler="l1norm"
    )
    np.testing.assert_allclose(l1.values, raw.values / np.abs(raw.values).sum())
    assert abs(np.abs(l1.values).sum() - 1.0) < 1e-12
    mm = pagerank(
        from_arrow(t), max_iterations=5, tolerance=0.0, num_partitions=2, scaler="minmax"
    )
    assert mm.values.min() == 0.0 and mm.values.max() == 1.0


def test_label_propagation_seeds():
    from graph_data_science_ray.algos.labelprop import label_propagation
    from graph_data_science_ray.sources.edges import from_arrow

    # two triangles; seed both into the same label space
    pairs = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    res = label_propagation(
        from_arrow(fixtures.edges_table(pairs)),
        seeds={0: 7, 1: 7, 2: 7, 10: 7, 11: 7, 12: 7},
        num_partitions=2,
    )
    assert set(res.values.tolist()) == {7}
    res2 = label_propagation(from_arrow(fixtures.edges_table(pairs)), num_partitions=2)
    assert len(set(res2.values.tolist())) == 2


def test_label_propagation_node_weights():
    from graph_data_science_ray.algos.labelprop import label_propagation
    from graph_data_science_ray.sources.edges import from_arrow

    # star: center 0 hears ties from 1,2,3 -> min label wins unweighted;
    # a heavy node weight on 3 flips the center's first-round vote
    pairs = [(0, 1), (0, 2), (0, 3)]
    base = label_propagation(
        from_arrow(fixtures.edges_table(pairs)), max_iterations=1, num_partitions=2
    )
    assert base.as_dict()[0] == 1
    heavy = label_propagation(
        from_arrow(fixtures.edges_table(pairs)), max_iterations=1, num_partitions=2,
        node_weights={3: 10.0},
    )
    assert heavy.as_dict()[0] == 3


def test_wcc_star_checkpoint_resume(tmp_path):
    from graph_data_science_ray.algos.wcc import wcc_star
    from graph_data_science_ray.sources.edges import from_arrow

    pairs = [(i, i + 1) for i in range(60)] + [(100, 101)]
    t = fixtures.edges_table(pairs)
    full = wcc_star(from_arrow(t), num_partitions=2).to_pandas().sort_values("node_id")

    ck = str(tmp_path / "wcc_ck")
    # "killed" run: only 2 cycles complete
    wcc_star(from_arrow(t), max_cycles=2, num_partitions=2, checkpoint_dir=ck)
    import os

    assert os.path.exists(os.path.join(ck, "cycle=1", "MANIFEST.json"))
    resumed = (
        wcc_star(from_arrow(t), num_partitions=2, checkpoint_dir=ck, resume=True)
        .to_pandas()
        .sort_values("node_id")
    )
    assert full.reset_index(drop=True).equals(resumed.reset_index(drop=True))
