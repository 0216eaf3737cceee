"""ArticleRank / eigenvector / LCC + graph catalog + CLI smoke."""

import numpy as np
import pytest

from graph_data_science_ray import fixtures
from graph_data_science_ray.sources.edges import from_arrow


def _pairs(t):
    return list(zip(t.column("src_id").to_pylist(), t.column("dst_id").to_pylist()))


def test_article_rank_oracle():
    from collections import defaultdict

    from graph_data_science_ray.algos.centrality import article_rank

    t = fixtures.er_random(80, 0.06, seed=13)
    pairs = _pairs(t)
    res = article_rank(from_arrow(t), max_iterations=15)
    # dense numpy oracle with the GDS ArticleRank denominator
    outdeg = defaultdict(int)
    for s, _ in pairs:
        outdeg[s] += 1
    avg = sum(outdeg.values()) / len(outdeg)
    nodes = sorted({u for p in pairs for u in p})
    idx = {u: i for i, u in enumerate(nodes)}
    r = np.ones(len(nodes))
    for _ in range(15):
        contrib = np.zeros(len(nodes))
        for s, d in pairs:
            contrib[idx[d]] += r[idx[s]] / (outdeg[s] + avg)
        r = 0.15 + 0.85 * contrib
    got = res.as_dict()
    for u in nodes:
        assert got[u] == pytest.approx(r[idx[u]], abs=1e-6)


def test_eigenvector_cycle_uniform():
    from graph_data_science_ray.algos.centrality import eigenvector

    res = eigenvector(from_arrow(fixtures.tiny_cycle()), max_iterations=30)
    assert np.allclose(res.values, 1 / np.sqrt(3), atol=1e-6)


def test_lcc_triangle_is_one():
    from graph_data_science_ray.algos.centrality import local_clustering_coefficient

    res = local_clustering_coefficient(from_arrow(fixtures.two_components()), num_partitions=2)
    got = res.as_dict()
    assert got[0] == got[1] == got[2] == 1.0
    assert got[3] == got[4] == 0.0


def test_catalog_project_list_drop(tmp_path):
    from graph_data_science_ray.catalog import GraphCatalog

    cat = GraphCatalog()
    e = cat.project("g1", from_arrow(fixtures.two_components()), orientation="undirected")
    n, m = e.counts()
    assert n == 5 and m == 8  # symmetrized: 3 cycle edges ×2 + 1 edge ×2
    assert [g["name"] for g in cat.list()] == ["g1"]
    with pytest.raises(ValueError):
        cat.project("g1", from_arrow(fixtures.tiny_cycle()))
    cat.export("g1", str(tmp_path / "exp"))
    import os

    assert os.listdir(str(tmp_path / "exp"))
    cat.export_csv("g1", str(tmp_path / "exp_csv"))
    csvs = [f for f in os.listdir(str(tmp_path / "exp_csv")) if f.endswith(".csv")]
    assert csvs
    import pandas as pd

    back = pd.concat(
        [pd.read_csv(str(tmp_path / "exp_csv" / f)) for f in csvs], ignore_index=True
    )
    assert len(back) == 8 and set(back.columns) >= {"src_id", "dst_id"}
    cat.drop("g1")
    assert cat.list() == []


def test_cli_pagerank_and_ingest(tmp_path):
    import json

    import pyarrow.parquet as pq

    from graph_data_science_ray.run import main

    pq.write_table(fixtures.paper_graph(), str(tmp_path / "edges.parquet"))
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(
            [
                "pagerank",
                str(tmp_path / "edges.parquet"),
                "--engine", "csr", "--shards", "2", "--iterations", "20", "--top-k", "3",
                "--out", str(tmp_path / "ranks"),
            ]
        )
    assert rc == 0
    out = json.loads(buf.getvalue())
    assert out["algorithm"] == "pagerank" and out["count"] == 8
    assert len(out["top_k"]) == 3
    import os

    assert any(d.startswith("bucket=") for d in os.listdir(str(tmp_path / "ranks")))


def test_hits_vs_numpy_reference():
    import numpy as np
    import pytest as _pt

    from graph_data_science_ray import fixtures
    from graph_data_science_ray.algos.centrality import hits
    from graph_data_science_ray.sources.edges import from_arrow

    t = fixtures.paper_graph()
    hub, auth = hits(from_arrow(t), max_iterations=25, tolerance=0.0)

    src = np.array(t.column("src_id").to_pylist())
    dst = np.array(t.column("dst_id").to_pylist())
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(nodes)}
    a_mat = np.zeros((nodes.size, nodes.size))
    for s, d in zip(src, dst):
        a_mat[idx[int(s)], idx[int(d)]] = 1.0
    h = np.ones(nodes.size)
    for _ in range(25):
        a = a_mat.T @ h
        a = a / np.linalg.norm(a)
        h = a_mat @ a
        h = h / np.linalg.norm(h)

    assert np.array_equal(hub.node_ids, nodes)
    np.testing.assert_allclose(hub.values, h, atol=1e-6)
    np.testing.assert_allclose(auth.values, a, atol=1e-6)
    assert _pt.approx(np.linalg.norm(auth.values), abs=1e-9) == 1.0


def test_filter_graph_both_strategies_match_reference():
    """gds.graph.filter parity: broadcast vs semijoin endpoint filtering
    both equal a pure-python reference (keep out_degree>=2 nodes and
    src<dst edges)."""
    import pyarrow.compute as pc

    from graph_data_science_ray.algos.common import collect_arrow
    from graph_data_science_ray.algos.degree import degree
    from graph_data_science_ray.sources.edges import filter_graph

    t = fixtures.er_random(60, 0.08, seed=21)
    pairs = _pairs(t)
    outdeg = {}
    for s, _ in pairs:
        outdeg[s] = outdeg.get(s, 0) + 1
    keep = {u for u, d in outdeg.items() if d >= 2}
    want = sorted((s, d) for s, d in pairs if s < d and s in keep and d in keep)

    edges = from_arrow(t)
    nodes = degree(edges, "natural", alias="out_degree")
    node_f = lambda tb: pc.greater_equal(tb.column("out_degree"), 2)  # noqa: E731
    rel_f = lambda tb: pc.less(tb.column("src_id"), tb.column("dst_id"))  # noqa: E731
    for strategy in ("broadcast", "semijoin"):
        got = collect_arrow(
            filter_graph(edges, node_filter=node_f, nodes=nodes,
                         relationship_filter=rel_f, strategy=strategy))
        assert sorted(_pairs(got)) == want, strategy


def test_filter_graph_empty_keep_and_catalog():
    import pyarrow.compute as pc

    from graph_data_science_ray.algos.common import collect_arrow
    from graph_data_science_ray.algos.degree import degree
    from graph_data_science_ray.catalog import GraphCatalog
    from graph_data_science_ray.sources.edges import filter_graph

    t = fixtures.er_random(30, 0.1, seed=5)
    edges = from_arrow(t)
    nodes = degree(edges, "natural", alias="out_degree")
    # impossible predicate -> empty subgraph, schema preserved
    got = collect_arrow(
        filter_graph(edges, node_filter=lambda tb: pc.greater(tb.column("out_degree"), 10**9),
                     nodes=nodes))
    assert got.num_rows == 0

    cat = GraphCatalog()
    cat.project("g", edges)
    sub = cat.filter("g_fwd", "g",
                     relationship_filter=lambda tb: pc.less(tb.column("src_id"),
                                                            tb.column("dst_id")))
    pairs = _pairs(t)
    want = sorted({(s, d) for s, d in pairs if s < d})
    assert sorted(_pairs(collect_arrow(sub.edges))) == want
    assert {e["name"] for e in cat.list()} == {"g", "g_fwd"}


def test_weighted_article_rank_and_eigenvector_match_numpy():
    import numpy as np
    import pyarrow as pa

    from graph_data_science_ray.algos.centrality import article_rank, eigenvector

    t = fixtures.er_random(40, 0.12, seed=13)
    rng = np.random.default_rng(2)
    w = rng.uniform(0.5, 3.0, size=t.num_rows)
    tw = t.append_column("weight", pa.array(w)) if "weight" not in t.column_names else t
    pairs = _pairs(t)
    ids = sorted({x for p in pairs for x in p})
    idx = {u: i for i, u in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for (s, d), ww in zip(pairs, w):
        A[idx[s], idx[d]] += ww
    outw = A.sum(axis=1)

    # weighted ArticleRank replica
    avg = outw[outw > 0].mean()
    r = np.ones(n)
    for _ in range(5):
        contrib = np.divide(r, outw + avg, out=np.zeros(n), where=outw > 0)
        r = 0.15 + 0.85 * (A.T @ contrib)
    res = article_rank(from_arrow(tw), max_iterations=5, tolerance=0.0, weighted=True)
    assert np.allclose(res.values, r, atol=1e-10)

    # weighted eigenvector replica
    v = np.full(n, 1.0 / np.sqrt(n))
    for _ in range(8):
        s = A.T @ v
        nrm = np.linalg.norm(s)
        v = s / nrm if nrm > 0 else v
    rese = eigenvector(from_arrow(tw), max_iterations=8, tolerance=0.0, weighted=True)
    assert np.allclose(rese.values, v, atol=1e-10)


def test_eigenvector_source_nodes():
    import numpy as np

    from graph_data_science_ray.algos.centrality import eigenvector

    t = fixtures.er_random(30, 0.15, seed=9)
    full = eigenvector(from_arrow(t), max_iterations=50, tolerance=1e-12)
    ids = full.node_ids
    # restricted start converges to the same principal direction on a
    # (almost surely) connected ER graph
    seeded = eigenvector(from_arrow(t), max_iterations=50, tolerance=1e-12,
                         source_nodes=ids[:3])
    assert np.allclose(full.values, seeded.values, atol=1e-6)
    # one iteration from a single source differs from the uniform start
    one_u = eigenvector(from_arrow(t), max_iterations=1, tolerance=0.0)
    one_s = eigenvector(from_arrow(t), max_iterations=1, tolerance=0.0,
                        source_nodes=ids[:1])
    assert not np.allclose(one_u.values, one_s.values)


def test_centrality_scaler_option():
    """GDS `scaler` config on ArticleRank / Eigenvector: post-scales the
    converged scores with the shared scaler kernels (same contract as
    PageRank's scaler, test_algos.test_wcc_consecutive_ids_and_pagerank_scaler)."""
    from graph_data_science_ray.algos.centrality import article_rank, eigenvector

    t = fixtures.er_random(60, 0.08, seed=21)
    raw = article_rank(from_arrow(t), max_iterations=8)
    mm = article_rank(from_arrow(t), max_iterations=8, scaler="minmax")
    lo, hi = raw.values.min(), raw.values.max()
    np.testing.assert_allclose(mm.values, (raw.values - lo) / (hi - lo))

    raw_e = eigenvector(from_arrow(t), max_iterations=8)
    l1 = eigenvector(from_arrow(t), max_iterations=8, scaler="l1norm")
    np.testing.assert_allclose(l1.values, raw_e.values / np.abs(raw_e.values).sum())
