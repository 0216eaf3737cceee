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


def test_hopping_window_matches_pandas():
    from graph_data_science_ray.stages.windows import hopping_window

    rng = np.random.default_rng(6)
    n = 400
    ts = rng.integers(0, 10 * 3600, n) * 1_000_000  # us
    key = rng.integers(0, 4, n)
    val = rng.random(n)
    t = pa.table(
        {
            "k": pa.array(key, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "v": pa.array(val, pa.float64()),
        }
    )
    out = hopping_window(
        ray.data.from_arrow(t), "k", "ts", "v", window_s=7200, hop_s=3600, num_partitions=2
    ).to_pandas()
    import pandas as pd

    secs = ts // 1_000_000
    last = secs // 3600 * 3600
    df = pd.DataFrame(
        {
            "k": np.repeat(key, 2),
            "w": np.stack([last, last - 3600], axis=1).ravel(),
            "v": np.repeat(val, 2),
        }
    )
    want = df.groupby(["k", "w"]).agg(n=("v", "size"), s=("v", "sum")).reset_index()
    got = out.sort_values(["k", "window_start"]).reset_index(drop=True)
    want = want.sort_values(["k", "w"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
    assert np.allclose(got["sum_value"], want["s"])


def test_asof_join_matches_pandas_merge_asof():
    from graph_data_science_ray.functions.joins import asof_join

    import pandas as pd

    rng = np.random.default_rng(7)
    nl, nr = 300, 200
    lk = rng.integers(0, 6, nl)
    lts = rng.integers(0, 100_000, nl)
    rk = rng.integers(0, 6, nr)
    rts = rng.integers(0, 100_000, nr)
    rv = np.round(rng.random(nr), 6)
    left = pa.table(
        {
            "uid": pa.array(lk, pa.int64()),
            "sec": pa.array(lts, pa.int64()),
            "lval": pa.array(np.arange(nl), pa.int64()),
        }
    )
    # dedup right (uid, sec) so the match is unique → exact comparison
    rdf = (
        pd.DataFrame({"uid": rk, "sec": rts, "rv": rv})
        .groupby(["uid", "sec"], as_index=False)
        .agg(rv=("rv", "max"))
    )
    right = pa.table(
        {
            "uid": pa.array(rdf["uid"].to_numpy(), pa.int64()),
            "sec": pa.array(rdf["sec"].to_numpy(), pa.int64()),
            "rv": pa.array(rdf["rv"].to_numpy(), pa.float64()),
        }
    )
    got = (
        asof_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            key_col="uid",
            ts_col="sec",
            join_type="inner",
            num_partitions=3,
        )
        .to_pandas()
        .sort_values("lval")
        .reset_index(drop=True)
    )
    ldf = pd.DataFrame({"uid": lk, "sec": lts, "lval": np.arange(nl)})
    want = pd.merge_asof(
        ldf.sort_values("sec"),
        rdf.rename(columns={"sec": "sec_r"}).sort_values("sec_r"),
        left_on="sec",
        right_on="sec_r",
        by="uid",
        direction="backward",
    ).dropna(subset=["rv"]).sort_values("lval").reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["lval"].to_numpy() == want["lval"].to_numpy()).all()
    assert (got["sec_r"].to_numpy() == want["sec_r"].to_numpy().astype(np.int64)).all()
    assert np.allclose(got["rv"], want["rv"])

    # left join keeps unmatched rows with nulls
    got_left = asof_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        key_col="uid",
        ts_col="sec",
        join_type="left",
        num_partitions=3,
    ).to_pandas()
    assert len(got_left) == nl
    assert got_left["rv"].isna().sum() == nl - len(want)


def test_range_join_matches_bruteforce():
    from graph_data_science_ray.functions.joins import range_join

    rng = np.random.default_rng(8)
    # non-overlapping intervals per key from sorted breakpoints
    ik, istart, iend = [], [], []
    for k in range(5):
        bp = np.sort(rng.choice(10_000, size=20, replace=False))
        for a, b in zip(bp[::2], bp[1::2]):
            ik.append(k); istart.append(int(a)); iend.append(int(b))
    intervals = pa.table(
        {
            "uid": pa.array(ik, pa.int64()),
            "s": pa.array(istart, pa.int64()),
            "e": pa.array(iend, pa.int64()),
            "ival": pa.array(np.arange(len(ik)), pa.int64()),
        }
    )
    npts = 500
    pk = rng.integers(0, 5, npts)
    pt = rng.integers(0, 10_000, npts)
    points = pa.table(
        {
            "uid": pa.array(pk, pa.int64()),
            "sec": pa.array(pt, pa.int64()),
            "pid": pa.array(np.arange(npts), pa.int64()),
        }
    )
    got = (
        range_join(
            ray.data.from_arrow(points), ray.data.from_arrow(intervals),
            key_col="uid", ts_col="sec", start_col="s", end_col="e",
            join_type="inner", num_partitions=3,
        )
        .to_pandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    want = {}
    for kk, ss, ee, vv in zip(ik, istart, iend, range(len(ik))):
        for i in range(npts):
            if pk[i] == kk and ss <= pt[i] <= ee:
                want[i] = (ss, ee, vv)
    assert got["pid"].tolist() == sorted(want)
    for _, row in got.iterrows():
        ss, ee, vv = want[row["pid"]]
        assert (row["sec_r"], row["e"], row["ival"]) == (ss, ee, vv)

    got_left = range_join(
        ray.data.from_arrow(points), ray.data.from_arrow(intervals),
        key_col="uid", ts_col="sec", start_col="s", end_col="e",
        join_type="left", num_partitions=3,
    ).to_pandas()
    assert len(got_left) == npts
    assert got_left["ival"].notna().sum() == len(want)


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
