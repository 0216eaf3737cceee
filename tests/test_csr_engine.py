"""CSR shard actor engine vs the dataflow implementations and oracles —
including the hub-splitting path and checkpoint/resume parity."""

import numpy as np
import pytest

from graph_data_science_ray import fixtures
from graph_data_science_ray.oracles import lpa_oracle, pagerank_oracle, wcc_oracle
from graph_data_science_ray.sources.edges import drop_self_loops, from_arrow, symmetrize
from graph_data_science_ray.state.engine import CsrEngine


def _pairs(t):
    return list(zip(t.column("src_id").to_pylist(), t.column("dst_id").to_pylist()))


@pytest.fixture(scope="module")
def er_graph():
    return fixtures.er_random(150, 0.04, seed=77)


def test_csr_pagerank_matches_oracle(er_graph, tmp_path_factory):
    eng = CsrEngine.build(
        from_arrow(er_graph), num_shards=4,
        spill_dir=str(tmp_path_factory.mktemp("csr_pr")),
    )
    res = eng.pagerank(max_iterations=25)
    want = pagerank_oracle(_pairs(er_graph), max_iter=25)
    got = res.as_dict()
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)


def test_csr_pagerank_hub_splitting_same_result(er_graph, tmp_path_factory):
    # force hub routing with a tiny threshold: results must be identical
    eng = CsrEngine.build(
        from_arrow(er_graph), num_shards=4, hub_threshold=3,
        spill_dir=str(tmp_path_factory.mktemp("csr_hub")),
    )
    assert eng.hub_ids.shape[0] > 0, "threshold should classify hubs"
    res = eng.pagerank(max_iterations=25)
    want = pagerank_oracle(_pairs(er_graph), max_iter=25)
    got = res.as_dict()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_csr_wcc_and_lpa_match_oracles(tmp_path_factory):
    t = fixtures.er_random(120, 0.015, seed=99)
    und = drop_self_loops(symmetrize(from_arrow(t), num_partitions=2))
    eng = CsrEngine.build(und, num_shards=3, spill_dir=str(tmp_path_factory.mktemp("csr_wcc")))
    comp = eng.wcc()
    assert comp.converged
    assert comp.as_dict() == wcc_oracle(_pairs(t))
    lab = eng.label_propagation(max_iterations=10)
    assert lab.as_dict() == lpa_oracle(_pairs(t), max_iter=10)


def test_csr_checkpoint_resume_bitwise(tmp_path, tmp_path_factory):
    from graph_data_science_ray.checkpoint import CheckpointManager

    t = fixtures.powerlaw(300, seed=5)
    cfg = {"algo": "pagerank", "d": 0.85}
    eng = CsrEngine.build(from_arrow(t), num_shards=4,
                          spill_dir=str(tmp_path_factory.mktemp("csr_ck")))
    cm = CheckpointManager(str(tmp_path / "ck"), cfg, num_partitions=4, value_name="rank")
    eng.pagerank(max_iterations=3, checkpoint=cm)
    resumed = eng.pagerank(max_iterations=10, checkpoint=cm, resume=True)
    straight = eng.pagerank(max_iterations=10)
    assert np.array_equal(resumed.values, straight.values)
    assert resumed.metrics[0]["iteration"] == 3


def test_csr_spill_routing_matches_scan(er_graph, tmp_path_factory):
    """routing="spill" (the cluster-scale path: route to shard-partitioned
    parquet, each actor reads only its partition) must agree with scan
    routing bit-for-bit — auto never picks it at test scale, so force it."""
    want = pagerank_oracle(_pairs(er_graph), max_iter=20)
    eng = CsrEngine.build(
        from_arrow(er_graph), num_shards=4, routing="spill",
        spill_dir=str(tmp_path_factory.mktemp("csr_spill")),
        hub_threshold=3,
    )
    res = eng.pagerank(max_iterations=20)
    got = res.as_dict()
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)
    eng.shutdown()


def test_csr_spill_vs_scan_bitwise(er_graph, tmp_path_factory):
    """Round 3: with src_id as the build sort's tertiary key, edge order
    (hence every float bincount sum) is a pure function of the edge SET
    — spill- and scan-built engines must agree BITWISE, not just 1e-6."""
    import numpy as np

    vals = {}
    for routing in ("scan", "spill"):
        eng = CsrEngine.build(
            from_arrow(er_graph), num_shards=4, routing=routing,
            spill_dir=str(tmp_path_factory.mktemp("csr_rt")), hub_threshold=3,
        )
        t = eng.pagerank(max_iterations=7, tolerance=0.0).to_table()
        vals[routing] = (t.column("node_id").to_numpy(),
                         t.column("rank").to_numpy())
        eng.shutdown()
    assert np.array_equal(vals["scan"][0], vals["spill"][0])
    assert np.array_equal(vals["scan"][1], vals["spill"][1])


def test_pipelined_exchange_bitwise_vs_sync(tmp_path_factory):
    """The no-barrier pipelined loop (tolerance<=0, or min_label) must be
    bitwise-identical to the per-iteration sync loop, with and without
    hub splitting, including WCC's early-stop iteration count. A tiny
    positive tolerance (5e-324) forces the sync path for pagerank
    without ever early-stopping."""
    t = fixtures.powerlaw(400, seed=11)
    for thr in (3, 10**9):  # hubs present / absent
        eng = CsrEngine.build(from_arrow(t), num_shards=4, hub_threshold=thr)
        a = eng.pagerank(max_iterations=7, tolerance=0.0)        # pipelined
        b = eng.pagerank(max_iterations=7, tolerance=5e-324)     # sync
        assert np.array_equal(np.sort(a.node_ids), np.sort(b.node_ids))
        oa = np.argsort(a.node_ids)
        ob = np.argsort(b.node_ids)
        assert np.array_equal(a.values[oa], b.values[ob])
        assert a.iterations == b.iterations == 7
        w1 = eng.wcc()   # pipelined with windowed early stop
        w2 = eng.wcc()
        o1, o2 = np.argsort(w1.node_ids), np.argsort(w2.node_ids)
        assert np.array_equal(w1.values[o1], w2.values[o2])
        assert w1.converged and w1.iterations == w2.iterations
        eng.shutdown()


def test_exchange_variants_bitwise_equal():
    """round-4 ask #5: the coalesced / per_dest exchange variants (kept
    selectable; measured slower than direct at bench scale) produce
    bitwise-identical PageRank and WCC state."""
    import numpy as np

    from graph_data_science_ray import fixtures
    from graph_data_science_ray.state.engine import CsrEngine
    from ray.data import from_arrow

    t = fixtures.powerlaw(800, seed=19)
    eng = CsrEngine.build(from_arrow(t), num_shards=3)
    outs = {}
    for mode in ("direct", "coalesced", "per_dest"):
        eng.exchange = mode
        outs[mode] = eng.pagerank(max_iterations=10, tolerance=0.0).values
    assert np.array_equal(outs["direct"], outs["coalesced"])
    assert np.array_equal(outs["direct"], outs["per_dest"])
    wcc = {}
    for mode in ("direct", "per_dest"):
        eng.exchange = mode
        wcc[mode] = eng.wcc().values
    assert np.array_equal(wcc["direct"], wcc["per_dest"])
    eng.shutdown()


def test_compact_indices_bitwise_equal():
    """compact_indices=True (int32 local indices — the memory-bound
    opt-in) produces bitwise-identical pagerank/wcc state to the int64
    speed default."""
    import numpy as np

    from graph_data_science_ray import fixtures
    from graph_data_science_ray.state.engine import CsrEngine
    from ray.data import from_arrow

    t = fixtures.powerlaw(600, seed=23)
    a = CsrEngine.build(from_arrow(t), num_shards=3)
    b = CsrEngine.build(from_arrow(t), num_shards=3, compact_indices=True)
    import ray as _ray

    rep = _ray.get(b.shards[0].mem_report.remote())
    assert rep["index_dtype"] == "int32"
    pa_ = a.pagerank(max_iterations=8, tolerance=0.0).values
    pb_ = b.pagerank(max_iterations=8, tolerance=0.0).values
    assert np.array_equal(pa_, pb_)
    wa = a.wcc().values
    wb = b.wcc().values
    assert np.array_equal(wa, wb)
    a.shutdown()
    b.shutdown()
