"""Similarity search over an embedding column (list<float>).

- brute_force_topk: the exact baseline — the query matrix is broadcast
  once (``ray.put``), each batch does one numpy matmul and emits only its
  LOCAL top-k per query (a combiner), the driver merges the tiny partials.
- lsh_topk: the scale path — random-hyperplane LSH buckets embeddings;
  a query probes only its own bucket (and optional neighbor probes),
  turning an O(N·Q) scan into an O(N/2^bits · Q) bucketed search.
- embedding_cosine_dedup: near-duplicate pairs by cosine ≥ threshold
  within LSH buckets.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.context import configure_ray_data, shuffle_partitions_for

_LOG = logging.getLogger("graph_data_science_ray.similarity")

# Auto-dispatch guard for the exact O(n·Q)/O(n²) broadcast-matrix family
# (round-1 finding #3: nothing routed to the bucketed scale paths and
# nothing logged when the quadratic path ran). Above this many corpus
# rows the exact kernels route to IVF/LSH (or refuse when no approximate
# twin preserves the semantics); at or below it they LOG the exact path.
EXACT_SIM_MAX_ROWS = 500_000


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch.column(vec_col)
    if col.num_chunks > 1:
        col = col.combine_chunks()
    flat = col.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    n = len(col)
    return flat.reshape(n, -1).astype(np.float64, copy=False)


def _normalize(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return m / norm


def brute_force_topk(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    max_exact_rows: int | None = None,
) -> pa.Table:
    """Exact similarity top-k for each query row. Returns
    (query_idx, vec_id, score) sorted by (query_idx, -score, vec_id).

    ``metric``: the gds.similarity.* scalar family over vectors —
    ``cosine`` (default), ``pearson`` (= cosine of mean-centered
    vectors, functions/similarity.pearson_sim), or ``euclidean``
    (similarity 1/(1+distance), functions/similarity.euclidean_sim;
    top-k by similarity = nearest by distance).

    Auto-dispatch: corpora above ``max_exact_rows`` (default
    EXACT_SIM_MAX_ROWS) route to ``ivf_topk`` for cosine — logged — and
    refuse for pearson/euclidean (no approximate twin preserves those
    semantics); at or below, the exact path logs that it ran exact."""
    if metric not in ("cosine", "pearson", "euclidean"):
        raise ValueError("metric must be cosine|pearson|euclidean")
    configure_ray_data()
    cap = EXACT_SIM_MAX_ROWS if max_exact_rows is None else int(max_exact_rows)
    n_rows = ds.count()
    if n_rows > cap:
        if metric == "cosine":
            _LOG.warning(
                "brute_force_topk: %d rows > max_exact_rows=%d — dispatching to "
                "ivf_topk (approximate)", n_rows, cap,
            )
            return ivf_topk(ds, queries, k=k, id_col=id_col, vec_col=vec_col)
        raise ValueError(
            f"brute_force_topk: {n_rows} rows > max_exact_rows={cap} and metric="
            f"{metric!r} has no approximate twin — raise max_exact_rows explicitly "
            "to force the O(n·Q) exact scan"
        )
    _LOG.info("brute_force_topk: exact O(n·Q) path over %d rows (cap %d)", n_rows, cap)
    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    if metric == "pearson":
        q = q - q.mean(axis=1, keepdims=True)
    if metric != "euclidean":
        q = _normalize(q)
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        m = _batch_matrix(batch, vec_col)
        if metric == "euclidean":
            # ‖q−x‖² by dot expansion — O(Q·n) memory, one gemm; the
            # float64 expansion error (~1e-12 relative) is far below
            # the round-6 comparison grain, negatives clipped to 0
            d2 = (
                (qm * qm).sum(axis=1)[:, None]
                - 2.0 * (qm @ m.T)
                + (m * m).sum(axis=1)[None, :]
            )
            sims = 1.0 / (1.0 + np.sqrt(np.maximum(d2, 0.0)))
        else:
            if metric == "pearson":
                m = m - m.mean(axis=1, keepdims=True)
            m = _normalize(m)
            sims = qm @ m.T  # (Q, n)
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        qi = np.repeat(np.arange(qm.shape[0], dtype=np.int64), kk)
        vi = ids[part.ravel()]
        sc = np.take_along_axis(sims, part, axis=1).ravel()
        return pa.table(
            {
                "query_idx": pa.array(qi),
                id_col: pa.array(vi),
                "score": pa.array(sc, pa.float64()),
            }
        )

    from graph_data_science_ray.algos.common import collect_arrow

    part = collect_arrow(ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True))
    qi = part.column("query_idx").to_numpy(zero_copy_only=False)
    vi = part.column(id_col).to_numpy(zero_copy_only=False)
    sc = part.column("score").to_numpy(zero_copy_only=False)
    order = np.lexsort((vi, -sc, qi))
    qi, vi, sc = qi[order], vi[order], sc[order]
    keep = np.zeros(qi.shape[0], dtype=bool)
    for qq in np.unique(qi):
        idx = np.nonzero(qi == qq)[0][:k]
        keep[idx] = True
    return pa.table(
        {
            "query_idx": pa.array(qi[keep]),
            id_col: pa.array(vi[keep]),
            "score": pa.array(sc[keep], pa.float64()),
        }
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((bits, dim))


def add_lsh_bucket(
    ds: Dataset, vec_col: str = "embedding", bits: int = 8, seed: int = 42, dim: int | None = None
) -> Dataset:
    """Append ``lsh_bucket`` = sign-pattern of ``bits`` random hyperplanes."""
    configure_ray_data()
    planes_ref = None

    def fn(batch: pa.Table) -> pa.Table:
        nonlocal planes_ref
        m = _batch_matrix(batch, vec_col)
        planes = _hyperplanes(m.shape[1], bits, seed)
        signs = (m @ planes.T) > 0
        bucket = signs @ (1 << np.arange(bits, dtype=np.int64))
        return batch.append_column("lsh_bucket", pa.array(bucket.astype(np.int64)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def lsh_topk(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    seed: int = 42,
) -> pa.Table:
    """Approximate top-k: brute-force, but only inside each query's LSH
    bucket (single-probe). Recall < 1 by construction; raise ``bits``
    resolution / add multi-probe for the recall/cost trade."""
    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    planes = _hyperplanes(q.shape[1], bits, seed)
    q_buckets = ((q @ planes.T) > 0) @ (1 << np.arange(bits, dtype=np.int64))
    bucketed = add_lsh_bucket(ds, vec_col, bits, seed)
    wanted = set(q_buckets.tolist())

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t.column("lsh_bucket"), value_set=pa.array(sorted(wanted))))

    sub = bucketed.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    out = brute_force_topk(sub, q, k=k, id_col=id_col, vec_col=vec_col)
    return out


def embedding_cosine_pairs(
    ds: Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 6,
    seed: int = 42,
    num_partitions: int | None = None,
) -> Dataset:
    """Near-duplicate pairs (id_a < id_b, cosine ≥ threshold) found within
    LSH buckets — the embedding-space member of the dedup family."""
    configure_ray_data()
    num_partitions = num_partitions or shuffle_partitions_for()
    bucketed = add_lsh_bucket(ds.select_columns([id_col, vec_col]), vec_col, bits, seed)

    def pairs(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        m = _normalize(_batch_matrix(g, vec_col))
        sims = m @ m.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        a, b = ids[ii], ids[jj]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "id_a": pa.array(lo, pa.int64()),
                "id_b": pa.array(hi, pa.int64()),
                "score": pa.array(sims[ii, jj], pa.float64()),
            }
        )

    return bucketed.groupby("lsh_bucket", num_partitions=num_partitions).map_groups(
        pairs, batch_format="pyarrow"
    )


def ivf_topk(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_train_iterations: int = 5,
    train_delta_threshold: float = 0.05,
) -> pa.Table:
    """FAISS-style IVF-Flat approximate top-k: coarse-quantize the
    vectors into ``n_lists`` k-means cells (the engine's deterministic
    farthest-first k-means), then each query scores ONLY rows whose cell
    is among its ``n_probe`` nearest centroids. ``n_probe == n_lists``
    degenerates to exact brute force (tested). One training pass +
    one search scan; centroids and probe lists ride along broadcast —
    the batch never ships, the (n_lists × d) matrix does.

    Returns (query_idx, vec_id, score) like ``brute_force_topk``."""
    from graph_data_science_ray.algos.common import collect_arrow
    from graph_data_science_ray.algos.kmeans import kmeans

    configure_ray_data()
    res = kmeans(ds, k=n_lists, max_iterations=max_train_iterations,
                 delta_threshold=train_delta_threshold, id_col=id_col, vec_col=vec_col)
    cents = res.centroids
    qraw = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qn = _normalize(qraw)
    d2 = (
        (qraw * qraw).sum(axis=1, keepdims=True)
        - 2.0 * (qraw @ cents.T)
        + (cents * cents).sum(axis=1)[None, :]
    )
    npr = min(n_probe, cents.shape[0])
    probes = np.argsort(d2, axis=1)[:, :npr]  # (Q, P) cell ids per query
    probe_union = np.unique(probes)
    state_ref = ray.put((qn, cents, probes, probe_union))

    def local_topk(batch: pa.Table) -> pa.Table:
        qm, c, pr, pu = ray.get(state_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        m_raw = _batch_matrix(batch, vec_col)
        if m_raw.shape[0] == 0:
            return pa.table({"query_idx": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        a = (
            (m_raw * m_raw).sum(axis=1, keepdims=True)
            - 2.0 * (m_raw @ c.T)
            + (c * c).sum(axis=1)[None, :]
        ).argmin(axis=1)
        keep_rows = np.isin(a, pu)
        if not keep_rows.any():
            return pa.table({"query_idx": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        ids, a = ids[keep_rows], a[keep_rows]
        m = _normalize(m_raw[keep_rows])
        sims = qm @ m.T  # (Q, n')
        allowed = (a[None, None, :] == pr[:, :, None]).any(axis=1)  # (Q, n')
        sims = np.where(allowed, sims, -np.inf)
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        qi = np.repeat(np.arange(qm.shape[0], dtype=np.int64), kk)
        vi = ids[part.ravel()]
        sc = np.take_along_axis(sims, part, axis=1).ravel()
        fin = np.isfinite(sc)
        return pa.table(
            {
                "query_idx": pa.array(qi[fin]),
                id_col: pa.array(vi[fin]),
                "score": pa.array(sc[fin], pa.float64()),
            }
        )

    part = collect_arrow(ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True))
    if part.num_rows == 0:
        return pa.table({"query_idx": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    qi = part.column("query_idx").to_numpy(zero_copy_only=False)
    vi = part.column(id_col).to_numpy(zero_copy_only=False)
    sc = part.column("score").to_numpy(zero_copy_only=False)
    order = np.lexsort((vi, -sc, qi))
    qi, vi, sc = qi[order], vi[order], sc[order]
    _, starts = np.unique(qi, return_index=True)
    ranks = np.arange(qi.shape[0]) - np.repeat(starts, np.diff(np.append(starts, qi.shape[0])))
    keep = ranks < k
    return pa.table(
        {
            "query_idx": pa.array(qi[keep]),
            id_col: pa.array(vi[keep]),
            "score": pa.array(sc[keep], pa.float64()),
        }
    )


def top_similar_pairs(
    ds: Dataset,
    n: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    similarity_cutoff: float = -1.0,
    max_exact_rows: int | None = None,
) -> pa.Table:
    """Exact global top-N most-similar pairs by cosine (id_a < id_b) —
    the embedding near-dup primitive when no threshold is known a priori
    (``similarity_cutoff`` turns it into threshold near-dup). Same
    broadcast + per-batch-combiner shape as brute_force_topk: each batch
    scores its rows against the broadcast matrix, masks j ≤ i, keeps the
    batch-local top-N; the driver merges |blocks|·N partial rows.
    Returns (id_a, id_b, score) by (-score, id_a, id_b), score round-6.

    Auto-dispatch: above ``max_exact_rows`` (default EXACT_SIM_MAX_ROWS)
    the O(n²) scan refuses unless a ``similarity_cutoff`` > -1 is given,
    in which case it routes to the LSH-bucketed ``embedding_cosine_pairs``
    and takes the top-N of the thresholded pairs (logged)."""
    configure_ray_data()
    from graph_data_science_ray.algos.common import collect_arrow

    cap = EXACT_SIM_MAX_ROWS if max_exact_rows is None else int(max_exact_rows)
    n_rows = ds.count()
    if n_rows > cap:
        if similarity_cutoff > -1.0:
            _LOG.warning(
                "top_similar_pairs: %d rows > max_exact_rows=%d — dispatching to "
                "LSH-bucketed embedding_cosine_pairs(threshold=%s) + top-%d",
                n_rows, cap, similarity_cutoff, n,
            )
            pairs = embedding_cosine_pairs(
                ds, threshold=similarity_cutoff, id_col=id_col, vec_col=vec_col
            )
            t = collect_arrow(pairs)
            if t.num_rows == 0 or "id_a" not in t.column_names:
                return pa.table({"id_a": pa.array([], pa.int64()),
                                 "id_b": pa.array([], pa.int64()),
                                 "score": pa.array([], pa.float64())})
            a = t.column("id_a").to_numpy(zero_copy_only=False)
            b = t.column("id_b").to_numpy(zero_copy_only=False)
            sc = np.round(t.column("score").to_numpy(zero_copy_only=False), 6)
            o = np.lexsort((b, a, -sc))[:n]
            return pa.table({"id_a": pa.array(a[o], pa.int64()),
                             "id_b": pa.array(b[o], pa.int64()),
                             "score": pa.array(sc[o], pa.float64())})
        raise ValueError(
            f"top_similar_pairs: {n_rows} rows > max_exact_rows={cap} — the exact "
            "global-pair scan is O(n²); pass similarity_cutoff to enable the "
            "LSH-bucketed route, or raise max_exact_rows explicitly"
        )
    _LOG.info("top_similar_pairs: exact O(n²) path over %d rows (cap %d)", n_rows, cap)
    full = collect_arrow(ds.select_columns([id_col, vec_col]))
    ids = full.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    M = _normalize(_batch_matrix(full, vec_col))[order]
    ids = ids[order]
    mat_ref = ray.put((ids, M))

    def local_top(batch: pa.Table) -> pa.Table:
        all_ids, Mm = ray.get(mat_ref)
        bid = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(all_ids, bid)
        sims = Mm[pos] @ Mm.T  # (b, N)
        sims = np.where(bid[:, None] < all_ids[None, :], sims, -np.inf)
        # select on ROUND-6 scores and keep every pair tied with the
        # n-th best — the global merge (and the SQL oracle) rank by
        # rounded score with id tie-breaks, so boundary ties must all
        # survive the batch-local cut
        flat = np.round(sims.ravel(), 6)
        kk = min(n, flat.shape[0])
        kth = -np.partition(-flat, kk - 1)[kk - 1]
        top = np.flatnonzero(flat >= kth)
        r, c = np.unravel_index(top, sims.shape)
        sc = flat[top]
        ok = np.isfinite(sc) & (sc >= similarity_cutoff)
        return pa.table({"id_a": pa.array(bid[r[ok]], pa.int64()),
                         "id_b": pa.array(all_ids[c[ok]], pa.int64()),
                         "score": pa.array(sc[ok], pa.float64())})

    part = collect_arrow(ds.map_batches(local_top, batch_format="pyarrow",
                                        zero_copy_batch=True))
    if part.num_rows == 0 or "id_a" not in part.column_names:
        # collect_arrow drops all-empty partials schema-lessly
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    a = part.column("id_a").to_numpy(zero_copy_only=False)
    b = part.column("id_b").to_numpy(zero_copy_only=False)
    sc = part.column("score").to_numpy(zero_copy_only=False)  # already round-6
    o = np.lexsort((b, a, -sc))[:n]
    return pa.table({"id_a": pa.array(a[o], pa.int64()),
                     "id_b": pa.array(b[o], pa.int64()),
                     "score": pa.array(sc[o], pa.float64())})
