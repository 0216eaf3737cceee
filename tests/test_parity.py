"""Cross-implementation parity: driver-reduce vs shuffle-reduce, dataflow
vs CSR, weighted paths, parallelism invariance, windows."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from graph_data_science_ray import fixtures
from graph_data_science_ray.sources.edges import from_arrow


def test_pagerank_shuffle_reduce_parity():
    from graph_data_science_ray.algos.pagerank import pagerank

    t = fixtures.er_random(100, 0.05, seed=51)
    a = pagerank(from_arrow(t), max_iterations=10, num_partitions=2, reduce="driver")
    b = pagerank(from_arrow(t), max_iterations=10, num_partitions=2, reduce="shuffle")
    assert np.allclose(a.values, b.values, atol=1e-12)


def test_wcc_shuffle_reduce_parity():
    from graph_data_science_ray.algos.wcc import wcc

    t = fixtures.er_random(100, 0.02, seed=52)
    a = wcc(from_arrow(t), num_partitions=2, reduce="driver")
    b = wcc(from_arrow(t), num_partitions=2, reduce="shuffle")
    assert a.as_dict() == b.as_dict()


def test_csr_weighted_pagerank(tmp_path_factory):
    from graph_data_science_ray.oracles import pagerank_oracle
    from graph_data_science_ray.state.engine import CsrEngine

    t = fixtures.weighted_tri()
    eng = CsrEngine.build(
        from_arrow(t), num_shards=2, weighted=True,
        spill_dir=str(tmp_path_factory.mktemp("csr_w")),
    )
    res = eng.pagerank(max_iterations=30, tolerance=1e-10)
    pairs = list(
        zip(
            t.column("src_id").to_pylist(),
            t.column("dst_id").to_pylist(),
            t.column("weight").to_pylist(),
        )
    )
    want = pagerank_oracle(pairs, weighted=True, max_iter=30, tol=1e-10)
    for k, v in want.items():
        assert res.as_dict()[k] == pytest.approx(v, abs=1e-6)
    eng.shutdown()


def test_lpa_weighted_matches_oracle():
    from graph_data_science_ray.algos.labelprop import label_propagation
    from graph_data_science_ray.oracles import lpa_oracle

    t = fixtures.weighted_tri()
    res = label_propagation(from_arrow(t), weighted=True, max_iterations=10, num_partitions=2)
    pairs = list(
        zip(
            t.column("src_id").to_pylist(),
            t.column("dst_id").to_pylist(),
            t.column("weight").to_pylist(),
        )
    )
    assert res.as_dict() == lpa_oracle(pairs, weighted=True, max_iter=10)


def test_shard_count_invariance(tmp_path_factory):
    from graph_data_science_ray.state.engine import CsrEngine

    t = fixtures.powerlaw(400, seed=9)
    results = []
    for p in (2, 7):
        eng = CsrEngine.build(
            from_arrow(t), num_shards=p,
            spill_dir=str(tmp_path_factory.mktemp(f"csr_p{p}")),
        )
        results.append(eng.pagerank(max_iterations=10).as_dict())
        eng.shutdown()
    a, b = results
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)


def test_wcc_seeds():
    from graph_data_science_ray.algos.wcc import wcc

    t = fixtures.two_components()
    # seed node 3's side with label -7: whole {3,4} component adopts it
    res = wcc(from_arrow(t), num_partitions=2, seeds={4: -7})
    got = res.as_dict()
    assert got[3] == got[4] == -7
    assert got[0] == got[1] == got[2] == 0


def test_tumbling_window_matches_pandas():
    from graph_data_science_ray.stages.windows import tumbling_window

    rng = np.random.default_rng(5)
    n = 500
    ts = rng.integers(0, 10 * 3600, n) * 1_000_000  # us
    key = rng.integers(0, 5, n)
    val = rng.random(n)
    t = pa.table(
        {
            "k": pa.array(key, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "v": pa.array(val, pa.float64()),
        }
    )
    out = tumbling_window(ray.data.from_arrow(t), "k", "ts", "v", 3600, num_partitions=2).to_pandas()
    import pandas as pd

    df = pd.DataFrame({"k": key, "w": (ts // 1_000_000) // 3600 * 3600, "v": val})
    want = df.groupby(["k", "w"]).agg(n=("v", "size"), s=("v", "sum")).reset_index()
    got = out.sort_values(["k", "window_start"]).reset_index(drop=True)
    want = want.sort_values(["k", "w"]).reset_index(drop=True)
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
    assert np.allclose(got["sum_value"], want["s"])


def test_session_windows():
    from graph_data_science_ray.stages.windows import session_windows

    ts = [0, 100, 200, 5000, 5100, 20000]  # gaps: session breaks at 5000? gap 4800>1800 → yes; 20000 → yes
    t = pa.table(
        {
            "k": pa.array([1] * 6, pa.int64()),
            "ts": pa.array([x * 1_000_000 for x in ts], pa.timestamp("us")),
        }
    )
    out = (
        session_windows(ray.data.from_arrow(t), "k", "ts", gap_s=1800, num_partitions=2)
        .to_pandas()
        .sort_values("session_start")
        .reset_index(drop=True)
    )
    assert len(out) == 3
    assert out.loc[0, "n_events"] == 3 and out.loc[0, "session_end"] == 200
    assert out.loc[1, "n_events"] == 2
    assert out.loc[2, "n_events"] == 1
