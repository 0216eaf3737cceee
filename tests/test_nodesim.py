"""Node similarity vs a tiny dense-python oracle."""

from collections import defaultdict

import numpy as np
import pytest

from graph_data_science_ray import fixtures
from graph_data_science_ray.algos.nodesim import node_similarity
from graph_data_science_ray.sources.edges import from_arrow


def _oracle(pairs, top_k):
    out_nbrs = defaultdict(set)
    for s, d in pairs:
        out_nbrs[s].add(d)
    rows = []
    nodes = sorted(out_nbrs)
    for a in nodes:
        sims = []
        for b in nodes:
            if a == b:
                continue
            inter = len(out_nbrs[a] & out_nbrs[b])
            if inter == 0:
                continue
            union = len(out_nbrs[a] | out_nbrs[b])
            sims.append((inter / union, b))
        sims.sort(key=lambda t: (-t[0], t[1]))
        for s, b in sims[:top_k]:
            rows.append((a, b, s))
    return rows


def test_node_similarity_matches_oracle():
    t = fixtures.er_random(60, 0.08, seed=61)
    pairs = list(zip(t.column("src_id").to_pylist(), t.column("dst_id").to_pylist()))
    got = node_similarity(from_arrow(t), top_k=3, num_partitions=2)
    got_rows = list(
        zip(
            got.column("node1").to_pylist(),
            got.column("node2").to_pylist(),
            got.column("similarity").to_pylist(),
        )
    )
    want = _oracle(pairs, 3)
    assert len(got_rows) == len(want)
    for (g1, g2, gs), (w1, w2, ws) in zip(got_rows, want):
        assert (g1, g2) == (w1, w2)
        assert gs == pytest.approx(ws, abs=1e-12)


def test_node_similarity_degree_cutoff():
    # star: every leaf shares hub 0 as neighbor → cutoff on hub in-degree
    # removes all candidate pairs
    t = fixtures.star_hub()
    full = node_similarity(from_arrow(t), top_k=5, num_partitions=2)
    assert full.num_rows > 0
    cut = node_similarity(from_arrow(t), top_k=5, degree_cutoff=5, num_partitions=2)
    assert cut.num_rows == 0


def test_node_similarity_filtered():
    from graph_data_science_ray import fixtures
    from graph_data_science_ray.algos.nodesim import node_similarity
    from graph_data_science_ray.sources.edges import from_arrow

    t = fixtures.er_random(40, 0.15, seed=12)
    full = node_similarity(from_arrow(t), top_k=3, num_partitions=2)
    srcs = sorted(set(full["node1"].to_pylist()))[:5]
    tgts = sorted(set(full["node2"].to_pylist()))[:10]
    filt = node_similarity(
        from_arrow(t), top_k=3, num_partitions=2, source_filter=srcs, target_filter=tgts
    )
    assert set(filt["node1"].to_pylist()) <= set(srcs)
    assert set(filt["node2"].to_pylist()) <= set(tgts)
    # per source: results are the top-3 among allowed targets of the
    # UNFILTERED top-k=everything ranking
    unrestricted = node_similarity(from_arrow(t), top_k=10**9, num_partitions=2)
    by_src = {}
    for r in unrestricted.to_pylist():
        if r["node1"] in srcs and r["node2"] in tgts:
            by_src.setdefault(r["node1"], []).append((r["node2"], r["similarity"]))
    got = {}
    for r in filt.to_pylist():
        got.setdefault(r["node1"], []).append((r["node2"], r["similarity"]))
    for s_ in got:
        exp = sorted(by_src[s_], key=lambda x: (-x[1], x[0]))[:3]
        assert got[s_] == exp


def test_knn_similarity_cutoff():
    import numpy as np

    from graph_data_science_ray.algos.knn import knn_matrix

    rng = np.random.default_rng(3)
    ids = np.arange(40, dtype=np.int64)
    emb = rng.normal(size=(40, 8))
    base = knn_matrix(ids, emb, k=5, num_partitions=2).to_pandas()
    cut = float(base["similarity"].median())
    got = knn_matrix(ids, emb, k=5, num_partitions=2, similarity_cutoff=cut).to_pandas()
    want = base[base["similarity"] >= cut]
    key = ["node_id", "neighbour_id"]
    assert got.sort_values(key).reset_index(drop=True).equals(
        want.sort_values(key).reset_index(drop=True)
    )
    assert (got["similarity"] >= cut).all()


def test_node_similarity_metrics_and_bottomk():
    t = fixtures.er_random(60, 0.08, seed=61)
    pairs = list(zip(t.column("src_id").to_pylist(), t.column("dst_id").to_pylist()))
    out_nbrs = defaultdict(set)
    for s, d in pairs:
        out_nbrs[s].add(d)

    def brute(metric, reverse):
        rows = []
        for a in sorted(out_nbrs):
            sims = []
            for b in sorted(out_nbrs):
                if a == b:
                    continue
                inter = len(out_nbrs[a] & out_nbrs[b])
                if inter == 0:
                    continue
                da, db = len(out_nbrs[a]), len(out_nbrs[b])
                if metric == "overlap":
                    s_ = inter / min(da, db)
                elif metric == "cosine":
                    s_ = inter / (da * db) ** 0.5
                else:
                    s_ = inter / (da + db - inter)
                sims.append((s_, b))
            sims.sort(key=lambda x: (-x[0] if not reverse else x[0], x[1]))
            rows.extend((a, b, s_) for s_, b in sims[:3])
        return rows

    for metric, reverse in (("overlap", False), ("cosine", False), ("jaccard", True)):
        got = node_similarity(
            from_arrow(t), top_k=3, num_partitions=2, metric=metric, bottom_k=reverse
        )
        got_rows = list(
            zip(
                got.column("node1").to_pylist(),
                got.column("node2").to_pylist(),
                got.column("similarity").to_pylist(),
            )
        )
        want = brute(metric, reverse)
        assert len(got_rows) == len(want), metric
        for (g1, g2, gs), (w1, w2, ws) in zip(got_rows, want):
            assert (g1, g2) == (w1, w2), metric
            assert gs == pytest.approx(ws, abs=1e-12)


def test_node_similarity_weighted_metrics():
    import pyarrow as pa

    t = fixtures.er_random(50, 0.1, seed=17)
    rng = np.random.default_rng(4)
    w = rng.uniform(0.5, 4.0, size=t.num_rows)
    tw = pa.table({"src_id": t.column("src_id"), "dst_id": t.column("dst_id"),
                   "weight": pa.array(w)})

    nbrs = defaultdict(dict)
    for s, d, ww in zip(tw.column("src_id").to_pylist(), tw.column("dst_id").to_pylist(),
                        tw.column("weight").to_pylist()):
        nbrs[s][d] = ww  # er_random edges are distinct, no collision

    def brute(metric):
        rows = []
        for a in sorted(nbrs):
            sims = []
            for b in sorted(nbrs):
                if a == b:
                    continue
                shared = set(nbrs[a]) & set(nbrs[b])
                if not shared:
                    continue
                if metric == "cosine":
                    num = sum(nbrs[a][x] * nbrs[b][x] for x in shared)
                    den = (sum(v * v for v in nbrs[a].values())
                           * sum(v * v for v in nbrs[b].values())) ** 0.5
                else:
                    num = sum(min(nbrs[a][x], nbrs[b][x]) for x in shared)
                    ta, tb = sum(nbrs[a].values()), sum(nbrs[b].values())
                    den = (ta + tb - num) if metric == "jaccard" else min(ta, tb)
                sims.append((num / den, b))
            sims.sort(key=lambda x: (-x[0], x[1]))
            rows.extend((a, b, s_) for s_, b in sims[:3])
        return rows

    for metric in ("jaccard", "overlap", "cosine"):
        got = node_similarity(from_arrow(tw), top_k=3, num_partitions=2,
                              metric=metric, weighted=True)
        got_rows = list(zip(got.column("node1").to_pylist(),
                            got.column("node2").to_pylist(),
                            got.column("similarity").to_pylist()))
        want = brute(metric)
        assert len(got_rows) == len(want), metric
        for (g1, g2, gs), (w1, w2, ws) in zip(got_rows, want):
            assert (g1, g2) == (w1, w2), metric
            assert gs == pytest.approx(ws, abs=1e-12)


def test_node_similarity_top_n_global_limit():
    t = fixtures.er_random(60, 0.08, seed=61)
    full = node_similarity(from_arrow(t), top_k=3, num_partitions=2)
    n = 7
    lim = node_similarity(from_arrow(t), top_k=3, top_n=n, num_partitions=2)
    assert lim.num_rows == n
    # the survivors are exactly the n globally most-similar of the
    # per-node top-k rows (ties by node1, node2 ascending)
    rows = sorted(
        zip(
            full.column("similarity").to_pylist(),
            full.column("node1").to_pylist(),
            full.column("node2").to_pylist(),
        ),
        key=lambda r: (-r[0], r[1], r[2]),
    )[:n]
    want = sorted((a, b, s) for s, a, b in rows)
    got = sorted(
        zip(
            lim.column("node1").to_pylist(),
            lim.column("node2").to_pylist(),
            lim.column("similarity").to_pylist(),
        )
    )
    assert got == want
    # bottom variant: globally least similar survive
    lb = node_similarity(from_arrow(t), top_k=3, top_n=n, bottom_k=True, num_partitions=2)
    assert lb.num_rows == n
    assert max(lb.column("similarity").to_pylist()) <= min(r[0] for r in rows)
