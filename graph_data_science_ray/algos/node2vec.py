"""Node2Vec: biased second-order random walks + skip-gram training.

Reference semantics (``gds.node2vec`` [GDS-pub: algo/.../embeddings/
node2vec/]; Grover & Leskovec 2016, public): walks biased by
returnFactor p and inOutFactor q — stepping from u (previous node t),
the unnormalized probability of neighbor x is 1/p if x == t, 1 if x is
a neighbor of t, else 1/q — then skip-gram with negative sampling over
the walk corpus produces d-dim embeddings.

Ray-Data-first decomposition:

- **Walks** extend the engine's hash-deterministic walk kernel
  (algos/randomwalk.py): per step, scan 1 collects the adjacency of the
  walks' PREVIOUS nodes (needed for the "x neighbor of t" test — rows
  with src ∈ prev-set, a per-batch filter + driver concat bounded by
  Σ deg(prev) over the walk set), scan 2 scatters candidate neighbors
  of the current nodes and picks per walk the candidate minimizing the
  **exponential race key** ``-ln(hash_uniform) / weight`` — the
  weighted generalization of the repo's argmin-by-hash idiom
  (deterministic weighted sampling; a candidate with weight w wins with
  probability w/Σw). Per-batch combiner keeps one candidate per walk.
- **Training** is driver-side vectorized numpy SGNS over the collected
  walk corpus — walks are orders of magnitude smaller than the edge
  table, and the reference likewise trains inside one JVM; the
  distributed part of node2vec is the graph-sized walk generation.
  Determinism: fixed pair ordering, hash-drawn negatives, fixed batch
  schedule — the result is a pure function of (graph, seed, config).
  Negative sampling is uniform over the walk vocabulary (the
  reference's unigram^0.75 table is a documented deviation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.algos.common import BlockScanner
from graph_data_science_ray.algos.randomwalk import _walk_key
from graph_data_science_ray.context import configure_ray_data
from graph_data_science_ray.sources.edges import symmetrize


def node2vec_walks(
    edges: Dataset,
    start_nodes,
    walk_length: int = 40,
    walks_per_node: int = 2,
    return_factor: float = 1.0,
    in_out_factor: float = 1.0,
    orientation: str = "natural",
    seed: int = 42,
    num_partitions: int | None = None,
) -> pa.Table:
    """(walk_id, step, node_id) with exact p/q second-order bias."""
    configure_ray_data()
    if orientation == "undirected":
        edges = symmetrize(edges, dedup=True, num_partitions=num_partitions)
    edges = edges.materialize()
    scanner = BlockScanner(edges)

    starts = np.repeat(np.asarray(start_nodes, dtype=np.int64), walks_per_node)
    n_walks = starts.shape[0]
    walk_ids = np.arange(n_walks, dtype=np.int64)
    cur = starts.copy()
    prev = np.full(n_walks, -1, dtype=np.int64)
    alive = np.ones(n_walks, dtype=bool)
    inv_p = 1.0 / return_factor
    inv_q = 1.0 / in_out_factor

    out_w = [walk_ids.copy()]
    out_s = [np.zeros(n_walks, dtype=np.int64)]
    out_n = [starts.copy()]

    for step in range(1, walk_length):
        if not alive.any():
            break
        prev_set = np.unique(prev[alive & (prev >= 0)])

        adj_prev_idx = np.empty(0, np.int64)
        adj_dst_rank = np.empty(0, np.int64)
        dst_vocab = np.empty(0, np.int64)
        if prev_set.shape[0]:
            pref = ray.put(prev_set)

            def prev_adj(t: pa.Table) -> pa.Table:
                ps = ray.get(pref)
                src = t.column("src_id").to_numpy(zero_copy_only=False)
                dst = t.column("dst_id").to_numpy(zero_copy_only=False)
                pos = np.searchsorted(ps, src)
                hit = (pos < ps.shape[0]) & (ps[np.minimum(pos, ps.shape[0] - 1)] == src)
                return pa.table(
                    {
                        "p": pa.array(src[hit], pa.int64()),
                        "d": pa.array(dst[hit], pa.int64()),
                    }
                )

            at = scanner.scan(prev_adj)
            if at.num_rows:
                ap = at.column("p").to_numpy(zero_copy_only=False)
                ad = at.column("d").to_numpy(zero_copy_only=False)
                dst_vocab = np.unique(ad)
                adj_prev_idx = np.searchsorted(prev_set, ap)
                adj_dst_rank = np.searchsorted(dst_vocab, ad)

        # membership keys: prev_idx * |vocab| + dst_rank (both < 2^31)
        vocab_n = max(1, dst_vocab.shape[0])
        member = np.unique(adj_prev_idx * vocab_n + adj_dst_rank)

        aw = walk_ids[alive]
        state_ref = ray.put(
            (aw, cur[alive], prev[alive], prev_set, dst_vocab, member)
        )

        def scatter(t: pa.Table, _step=step) -> pa.Table:
            wids, wcur, wprev, pset, vocab, mem = ray.get(state_ref)
            src = t.column("src_id").to_numpy(zero_copy_only=False)
            dst = t.column("dst_id").to_numpy(zero_copy_only=False)
            order = np.argsort(wcur, kind="stable")
            s_cur, s_wid, s_prev = wcur[order], wids[order], wprev[order]
            lo = np.searchsorted(s_cur, src, side="left")
            hi = np.searchsorted(s_cur, src, side="right")
            span = hi - lo
            has = span > 0
            if not has.any():
                return pa.table(
                    {"w": pa.array([], pa.int64()), "k": pa.array([], pa.float64()),
                     "d": pa.array([], pa.int64())}
                )
            counts = span[has]
            e_idx = np.repeat(np.flatnonzero(has), counts)
            ends = np.cumsum(counts)
            offs = np.arange(int(ends[-1]), dtype=np.int64) - np.repeat(ends - counts, counts)
            w_pos = lo[e_idx] + offs
            ww = s_wid[w_pos]
            pv = s_prev[w_pos]
            dd = dst[e_idx]
            # second-order weight: default "going outward" = 1/q
            weight = np.full(dd.shape[0], inv_q)
            is_ret = dd == pv
            weight[is_ret] = inv_p
            if vocab.shape[0]:
                pidx = np.searchsorted(pset, pv)
                in_p = (pidx < pset.shape[0]) & (
                    pset[np.minimum(pidx, pset.shape[0] - 1)] == pv
                )
                drank = np.searchsorted(vocab, dd)
                in_v = (drank < vocab.shape[0]) & (
                    vocab[np.minimum(drank, vocab.shape[0] - 1)] == dd
                )
                cand = in_p & in_v & ~is_ret
                if cand.any():
                    key = (
                        pidx[cand] * max(1, vocab.shape[0]) + drank[cand]
                    )
                    mpos = np.searchsorted(mem, key)
                    ok = (mpos < mem.shape[0]) & (
                        mem[np.minimum(mpos, mem.shape[0] - 1)] == key
                    )
                    sel = np.flatnonzero(cand)[ok]
                    weight[sel] = 1.0
            # first step has no prev (pv = -1): uniform
            weight[pv < 0] = 1.0
            # exponential race: -ln(u)/w, u from the walk-step hash
            u = (
                _walk_key(seed, ww, _step, dd).astype(np.float64) + 1.0
            ) / float(2**64)
            race = -np.log(u) / weight
            o2 = np.lexsort((dd, race, ww))
            ww, dd, race = ww[o2], dd[o2], race[o2]
            first = np.r_[True, ww[1:] != ww[:-1]]
            return pa.table(
                {"w": pa.array(ww[first], pa.int64()),
                 "k": pa.array(race[first], pa.float64()),
                 "d": pa.array(dd[first], pa.int64())}
            )

        t = scanner.scan(scatter)
        nxt = np.full(n_walks, -1, dtype=np.int64)
        if t.num_rows:
            ww = t.column("w").to_numpy(zero_copy_only=False)
            kk = t.column("k").to_numpy(zero_copy_only=False)
            dd = t.column("d").to_numpy(zero_copy_only=False)
            o = np.lexsort((dd, kk, ww))
            ww, kk, dd = ww[o], kk[o], dd[o]
            first = np.r_[True, ww[1:] != ww[:-1]]
            nxt[ww[first]] = dd[first]
        stopped = alive & (nxt < 0)
        alive = alive & ~stopped
        prev = np.where(alive, cur, prev)
        cur = np.where(alive, nxt, cur)
        if alive.any():
            out_w.append(walk_ids[alive].copy())
            out_s.append(np.full(int(alive.sum()), step, dtype=np.int64))
            out_n.append(cur[alive].copy())

    w = np.concatenate(out_w)
    s = np.concatenate(out_s)
    nn = np.concatenate(out_n)
    order = np.lexsort((s, w))
    return pa.table(
        {
            "walk_id": pa.array(w[order], pa.int64()),
            "step": pa.array(s[order], pa.int64()),
            "node_id": pa.array(nn[order], pa.int64()),
        }
    )


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -30, 30)))


def node2vec(
    edges: Dataset,
    start_nodes=None,
    dimension: int = 64,
    walk_length: int = 40,
    walks_per_node: int = 4,
    window: int = 5,
    return_factor: float = 1.0,
    in_out_factor: float = 1.0,
    negatives: int = 5,
    epochs: int = 2,
    learning_rate: float = 0.025,
    orientation: str = "undirected",
    seed: int = 42,
    num_partitions: int | None = None,
) -> pa.Table:
    """(node_id, embedding: list<float64>) for every node visited by the
    walk corpus. ``start_nodes=None`` starts from every node."""
    from graph_data_science_ray.algos.common import unique_node_ids

    configure_ray_data()
    if start_nodes is None:
        start_nodes = unique_node_ids(edges)
    walks_t = node2vec_walks(
        edges, start_nodes, walk_length=walk_length,
        walks_per_node=walks_per_node, return_factor=return_factor,
        in_out_factor=in_out_factor, orientation=orientation, seed=seed,
        num_partitions=num_partitions,
    )
    wid = walks_t.column("walk_id").to_numpy(zero_copy_only=False)
    nid = walks_t.column("node_id").to_numpy(zero_copy_only=False)
    vocab = np.unique(nid)
    n = vocab.shape[0]
    pos_seq = np.searchsorted(vocab, nid)

    # (center, context) pairs within the window — vectorized per offset;
    # the walks table is (walk, step)-sorted so a shift of k pairs each
    # node with its k-th successor in the same walk
    centers: list[np.ndarray] = []
    contexts: list[np.ndarray] = []
    for k in range(1, window + 1):
        same = wid[k:] == wid[:-k]
        a = pos_seq[:-k][same]
        b = pos_seq[k:][same]
        centers.append(np.concatenate([a, b]))  # symmetric
        contexts.append(np.concatenate([b, a]))
    if not centers or not any(c.shape[0] for c in centers):
        emb = np.zeros((n, dimension))
        return pa.table(
            {"node_id": pa.array(vocab, pa.int64()),
             "embedding": pa.array(list(emb), pa.list_(pa.float64()))}
        )
    C = np.concatenate(centers)
    X = np.concatenate(contexts)

    # deterministic init: one splitmix64 uniform per (node, dim) — the
    # repo's hash idiom (partitioning-invariant, replayable in SQL),
    # not a stateful RNG stream
    hk = _walk_key(seed, np.repeat(vocab, dimension),
                   0, np.tile(np.arange(dimension, dtype=np.int64), n))
    W = (((hk.astype(np.float64) + 1.0) / float(2**64)) - 0.5).reshape(
        n, dimension) / dimension
    Cm = np.zeros((n, dimension))

    n_pairs = C.shape[0]
    batch = 8192
    total_steps = epochs * ((n_pairs + batch - 1) // batch)
    step_i = 0
    for ep in range(epochs):
        for off in range(0, n_pairs, batch):
            lr = learning_rate * max(0.1, 1.0 - step_i / max(1, total_steps))
            step_i += 1
            c = C[off:off + batch]
            x = X[off:off + batch]
            b = c.shape[0]
            # negatives: hash-drawn uniform over the vocab
            negs = (
                _walk_key(seed ^ 0xABCDEF,
                          np.repeat(np.arange(off, off + b, dtype=np.int64), negatives),
                          ep,
                          np.tile(np.arange(negatives, dtype=np.int64), b))
                % np.uint64(n)
            ).astype(np.int64).reshape(b, negatives)
            wc = W[c]                      # (b, d)
            cx = Cm[x]                     # (b, d)
            cn = Cm[negs]                  # (b, neg, d)
            s_pos = _sigmoid((wc * cx).sum(axis=1))          # (b,)
            s_neg = _sigmoid(np.einsum("bd,bnd->bn", wc, cn))  # (b, neg)
            g_pos = (1.0 - s_pos)[:, None]                   # maximize
            g_neg = -s_neg[..., None]                        # minimize
            grad_w = g_pos * cx + (g_neg * cn).sum(axis=1)
            grad_cx = g_pos * wc
            grad_cn = g_neg * wc[:, None, :]
            np.add.at(W, c, lr * grad_w)
            np.add.at(Cm, x, lr * grad_cx)
            np.add.at(Cm, negs.ravel(), lr * grad_cn.reshape(-1, dimension))

    return pa.table(
        {"node_id": pa.array(vocab, pa.int64()),
         "embedding": pa.array([row.tolist() for row in W], pa.list_(pa.float64()))}
    )
