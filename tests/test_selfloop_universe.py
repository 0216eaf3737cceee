"""Round-5 ADVICE regression: a node whose ONLY edges are self-loops must
appear in csr-default results with the dataflow backend's degree-0 default
(own community / color 0 / core 0 / betweenness 0 / own SCC). The round-4
parity suites used self-loop-free powerlaw fixtures, which is exactly why
the backend flip could not catch this divergence."""

import numpy as np
import pyarrow as pa

from graph_data_science_ray import fixtures
from graph_data_science_ray.sources.edges import from_arrow


def _with_loops(t: pa.Table) -> pa.Table:
    """Append two self-loop-ONLY nodes (ids beyond the fixture range, one
    of them smaller than some existing ids to exercise sort-merge) plus a
    self-loop on an existing node (must NOT change that node's result)."""
    n = t.num_rows
    src = t.column("src_id").to_pylist() + [100000, 3, 100001]
    dst = t.column("dst_id").to_pylist() + [100000, 3, 100001]
    cols = {"src_id": pa.array(src, pa.int64()), "dst_id": pa.array(dst, pa.int64())}
    if "weight" in t.column_names:
        cols["weight"] = pa.array(t.column("weight").to_pylist() + [1.0, 1.0, 1.0])
    return pa.table(cols)


def _table_ids_vals(res):
    if isinstance(res, pa.Table):
        ids = res.column("node_id").to_numpy(zero_copy_only=False)
        vals = res.column(res.column_names[1]).to_numpy(zero_copy_only=False)
        return ids, vals
    return np.asarray(res.node_ids), np.asarray(res.values)


def _assert_parity(a, b, atol=0.0):
    ia, va = _table_ids_vals(a)
    ib, vb = _table_ids_vals(b)
    assert ia.tolist() == ib.tolist()
    if atol:
        assert np.allclose(va, vb, atol=atol)
    else:
        assert va.tolist() == vb.tolist()


def test_self_loop_only_nodes_helper():
    from graph_data_science_ray.algos.common import self_loop_only_nodes

    t = _with_loops(fixtures.powerlaw(60, seed=31))
    got = self_loop_only_nodes(from_arrow(t))
    assert got.tolist() == [100000, 100001]
    # loop-free input → empty
    clean = fixtures.powerlaw(60, seed=31)
    assert self_loop_only_nodes(from_arrow(clean)).shape[0] == 0


def test_louvain_selfloop_universe():
    from graph_data_science_ray.algos.louvain import louvain

    t = _with_loops(fixtures.powerlaw(80, seed=32))
    a = louvain(from_arrow(t), backend="dataflow", num_partitions=2)
    b = louvain(from_arrow(t), backend="csr", num_shards=2, num_partitions=2)
    _assert_parity(a, b)
    assert 100000 in b.node_ids.tolist()


def test_leiden_selfloop_universe():
    from graph_data_science_ray.algos.leiden import leiden

    t = _with_loops(fixtures.powerlaw(80, seed=33))
    a = leiden(from_arrow(t), backend="dataflow", num_partitions=2)
    b = leiden(from_arrow(t), backend="csr", num_shards=2, num_partitions=2)
    _assert_parity(a, b)


def test_k1coloring_selfloop_universe():
    from graph_data_science_ray.algos.kcoloring import k1coloring

    t = _with_loops(fixtures.powerlaw(80, seed=34))
    a = k1coloring(from_arrow(t), backend="dataflow", num_partitions=2)
    b = k1coloring(from_arrow(t), backend="csr", num_shards=2, num_partitions=2)
    _assert_parity(a, b)
    assert a.n_colors == b.n_colors


def test_kcore_selfloop_universe():
    from graph_data_science_ray.algos.kcore import core_decomposition

    t = _with_loops(fixtures.powerlaw(80, seed=35))
    a = core_decomposition(from_arrow(t), backend="dataflow", num_partitions=2)
    b = core_decomposition(from_arrow(t), backend="csr", num_shards=2)
    _assert_parity(a, b)
    pos = np.searchsorted(np.asarray(b.node_ids), 100000)
    assert b.values[pos] == 0


def test_scc_selfloop_universe():
    from graph_data_science_ray.algos.scc import strongly_connected_components

    t = _with_loops(fixtures.powerlaw(80, seed=36))
    a = strongly_connected_components(from_arrow(t), backend="dataflow", num_partitions=2)
    b = strongly_connected_components(from_arrow(t), backend="csr", num_shards=2)
    _assert_parity(a, b)
    # a self-loop-only node is its own component on BOTH backends
    pos = np.searchsorted(np.asarray(a.node_ids), 100001)
    assert a.values[pos] == 100001


def test_betweenness_selfloop_universe():
    from graph_data_science_ray.algos.betweenness import betweenness_centrality

    t = _with_loops(fixtures.powerlaw(60, seed=37))
    a = betweenness_centrality(from_arrow(t), backend="dataflow", num_partitions=2)
    b = betweenness_centrality(from_arrow(t), backend="csr", num_shards=2)
    _assert_parity(a, b, atol=1e-9)
