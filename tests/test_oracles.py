"""Sanity for the in-repo oracles themselves (FIXTURES.md §3) — cross-checked
against networkx where an in-sandbox oracle exists."""

import numpy as np
import pytest

from graph_data_science_ray import fixtures
from graph_data_science_ray.oracles import (
    lpa_oracle,
    pagerank_oracle,
    partitions_equal,
    triangles_oracle,
    wcc_oracle,
)


def _pairs(t):
    return list(zip(t.column("src_id").to_pylist(), t.column("dst_id").to_pylist()))


def test_pagerank_cycle_is_one():
    r = pagerank_oracle(_pairs(fixtures.tiny_cycle()))
    assert all(abs(v - 1.0) < 1e-9 for v in r.values())


def test_pagerank_star_sources():
    r = pagerank_oracle(_pairs(fixtures.star_hub()))
    for i in range(1, 10):
        assert abs(r[i] - 0.15) < 1e-12
    assert r[0] == pytest.approx(0.15 + 0.85 * 9 * 0.15, abs=1e-9)


def test_pagerank_matches_networkx_times_n_on_no_dangling():
    from networkx import DiGraph
    from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python

    t = fixtures.er_random(60, 0.12, seed=3)
    pairs = _pairs(t)
    # ensure no dangling: er graph may have sink nodes; add back-edge to 0
    nodes = {u for p in pairs for u in p}
    outs = {p[0] for p in pairs}
    for u in nodes - outs:
        pairs.append((u, 0))
    g = DiGraph(pairs)
    nx = _pagerank_python(g, alpha=0.85, tol=1e-10, max_iter=200)
    ours = pagerank_oracle(pairs, max_iter=200, tol=1e-12)
    n = g.number_of_nodes()
    for u in g:
        assert ours[u] == pytest.approx(nx[u] * n, abs=1e-6)


def test_wcc_matches_networkx():
    import networkx as nx

    t = fixtures.er_random(80, 0.02, seed=5)
    pairs = _pairs(t)
    ours = wcc_oracle(pairs)
    g = nx.Graph(pairs)
    theirs = {}
    for comp in nx.connected_components(g):
        m = min(comp)
        for u in comp:
            theirs[u] = m
    assert ours == theirs


def test_triangles_match_networkx():
    import networkx as nx

    t = fixtures.er_random(50, 0.15, seed=9)
    pairs = _pairs(t)
    ours = triangles_oracle(pairs)
    g = nx.Graph(pairs)
    theirs = nx.triangles(g)
    assert ours == {u: theirs[u] for u in ours}


def test_lpa_labels_within_components():
    t = fixtures.two_components()
    pairs = _pairs(t)
    labels = lpa_oracle(pairs)
    comps = wcc_oracle(pairs)
    # a label must name a node of the same component
    for u, lab in labels.items():
        assert comps[lab] == comps[u]


def test_partitions_equal_helper():
    assert partitions_equal({1: 0, 2: 0, 3: 9}, {1: 5, 2: 5, 3: 7})
    assert not partitions_equal({1: 0, 2: 0}, {1: 0, 2: 1})


def test_discrete_quantile_matches_duckdb_quantile_disc():
    """Pin the degree_distribution percentile convention (type-1:
    index ceil(p*n)-1) to DuckDB quantile_disc across sizes — the
    floor(p*(n-1)) form diverged at n=1473, p=0.999."""
    import duckdb

    con = duckdb.connect()
    rng = np.random.default_rng(7)
    for n in (1, 2, 3, 7, 10, 100, 1473):
        vals = np.sort(rng.integers(1, 50, size=n))
        con.execute("CREATE OR REPLACE TABLE t(c BIGINT)")
        con.executemany("INSERT INTO t VALUES (?)", [(int(v),) for v in vals])
        for p in (0.5, 0.75, 0.9, 0.95, 0.99, 0.999):
            want = con.execute(f"SELECT quantile_disc(c, {p}) FROM t").fetchone()[0]
            got = int(vals[max(0, int(np.ceil(p * n)) - 1)])
            assert got == want, (n, p, got, want)
