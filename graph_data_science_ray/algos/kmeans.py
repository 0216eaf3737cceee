"""K-Means node clustering over a node-property vector.

Reference semantics (``gds.kmeans``, [GDS-pub: algo/.../kmeans/]):
cluster nodes by Euclidean distance on a ``double[]`` node property into
``k`` communities with Lloyd iterations; convergence when the fraction
of nodes changing cluster drops to ``delta_threshold`` (GDS default
0.05) or ``max_iterations`` is hit. GDS seeds via uniform or kmeans++
sampling with a random seed; this engine replaces the randomized
initializer with the deterministic **farthest-first traversal** (greedy
k-center): centroid 0 = the point with the smallest id, each next
centroid = the point maximizing distance-to-nearest-chosen (ties → min
id). Deterministic and partitioning-invariant — the documented
deviation mirrors the engine's synchronous/min-tie treatment of LPA.

Ray-Data-first layout (the 100-TB shape):

- the point table (``id, vector``) is the big distributed side — it
  streams through ``map_batches`` once per pass, never materializing;
- centroids are tiny (k × d) — broadcast via ``ray.put`` once per pass
  and read zero-copy in every task;
- each batch emits PRE-AGGREGATED partials (k rows: count + vector
  sum + change count), so the per-pass reduce is a driver merge of
  P × k small rows — no shuffle at all;
- the final labeling pass is an ordinary ``map_batches`` projection,
  so the result stays a streaming Dataset.

Every pass is one scan; init costs ``k`` scans (k is small). The
node-count-sized state here is only the k × d centroid matrix — unlike
the graph algorithms there is NO per-node driver state, so this scales
to any point count the cluster can scan.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.context import configure_ray_data


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch.column(vec_col)
    flat = col.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(col), -1).astype(np.float64, copy=False)


def _dists_to(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Squared Euclidean distances (b, k) — the |x|² term is constant
    per row and irrelevant for argmin, but kept so reported distances
    are true distances."""
    # (b,k) = |x|² - 2 x·c + |c|²
    return (
        (m * m).sum(axis=1, keepdims=True)
        - 2.0 * (m @ cents.T)
        + (cents * cents).sum(axis=1)[None, :]
    )


@dataclass
class KMeansResult:
    node_ids: np.ndarray          # only for .to_table() of small results
    assignments: Dataset          # (id_col, cluster, distance) — streaming
    centroids: np.ndarray         # (k, d)
    iterations: int
    converged: bool
    metrics: list[dict]
    id_col: str = "node_id"

    def to_table(self) -> pa.Table:
        from graph_data_science_ray.algos.common import collect_arrow

        return collect_arrow(self.assignments)


def kmeans(
    ds: Dataset,
    k: int = 10,
    max_iterations: int = 10,
    delta_threshold: float = 0.05,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_centroids: "np.ndarray | list | None" = None,
    number_of_restarts: int = 1,
) -> KMeansResult:
    """Lloyd k-means with deterministic farthest-first init.

    ``ds`` must have (id_col: int64, vec_col: fixed-width list<float>).
    Returns assignments as a streaming Dataset of
    (id_col, cluster: int64, distance: float64).

    ``seed_centroids``: the reference's ``seedCentroids`` — explicit
    (k × d) initial centroids; skips the farthest-first init (and, as in
    GDS, forces numberOfRestarts to 1 since the start is fixed).

    ``number_of_restarts``: the reference's ``numberOfRestarts`` — run
    the whole fit R times and keep the lowest total within-cluster
    squared distance (GDS restarts from different random samples; this
    engine restarts farthest-first from the point with the r-th smallest
    id, keeping determinism). Each restart costs k init scans + the
    Lloyd passes + one cost scan.
    """
    configure_ray_data()
    if k < 1:
        raise ValueError("k must be >= 1")
    if seed_centroids is not None:
        seed_centroids = np.asarray(seed_centroids, dtype=np.float64)
        if seed_centroids.ndim != 2 or seed_centroids.shape[0] != k:
            raise ValueError("seedCentroids must be a (k, d) matrix")
        number_of_restarts = 1
    if number_of_restarts < 1:
        raise ValueError("numberOfRestarts must be >= 1")

    from graph_data_science_ray.algos.common import BlockScanner

    ds = ds.materialize()
    scanner = BlockScanner(ds)  # init scans + Lloyd passes below

    best: KMeansResult | None = None
    best_cost = np.inf
    for r in range(number_of_restarts):
        res, cost = _kmeans_once(
            ds, scanner, k, max_iterations, delta_threshold, id_col, vec_col,
            seed_centroids, start_rank=r,
        )
        if res is None:
            break  # empty input — res built below by the rank-0 path
        res.metrics.append({"restart": r, "cost": cost})
        if cost < best_cost:  # strict: ties keep the earliest restart
            best, best_cost = res, cost
        if res.centroids.shape[0] < k and r + 1 < number_of_restarts:
            # fewer distinct points than k: every restart degenerates
            break
    if best is not None:
        return best
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "cluster": pa.array([], pa.int64()),
                      "distance": pa.array([], pa.float64())})
    import ray.data as rd
    return KMeansResult(np.empty(0, np.int64), rd.from_arrow(empty),
                        np.empty((0, 0)), 0, True, [], id_col)


def _kmeans_once(
    ds: Dataset,
    scanner,
    k: int,
    max_iterations: int,
    delta_threshold: float,
    id_col: str,
    vec_col: str,
    seed_centroids: "np.ndarray | None",
    start_rank: int = 0,
) -> "tuple[KMeansResult | None, float]":
    if seed_centroids is not None:
        cents = seed_centroids
    else:
        # ---- init: farthest-first traversal, one scan per centroid ----
        # pass 0: the point with the (start_rank+1)-th smallest global id
        # (rank 0 = min id; later restarts start elsewhere, deterministic)
        m_rank = start_rank + 1

        def first_point(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            if ids.shape[0] == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 vec_col: t.column(vec_col).slice(0, 0)})
            take = np.argsort(ids)[:m_rank]  # per-batch m smallest (combiner)
            return pa.table({id_col: pa.array(ids[take], pa.int64()),
                             vec_col: t.column(vec_col).take(take)})

        cand = scanner.scan(first_point)
        if cand.num_rows == 0:
            return None, np.inf
        cids = cand.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(cids)
        j = int(order[min(start_rank, order.shape[0] - 1)])
        cents = _batch_matrix(cand, vec_col)[j:j + 1]

    for _ in range(0 if seed_centroids is not None else k - 1):
        cref = ray.put(cents)

        def far_point(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            if ids.shape[0] == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "d2": pa.array([], pa.float64()),
                                 vec_col: t.column(vec_col).slice(0, 0)})
            m = _batch_matrix(t, vec_col)
            d2 = _dists_to(m, ray.get(cref)).min(axis=1)
            # per-batch champion: max d2, tie → min id (combiner)
            best = np.lexsort((ids, -d2))[0]
            return pa.table({id_col: pa.array([ids[best]], pa.int64()),
                             "d2": pa.array([d2[best]], pa.float64()),
                             vec_col: t.column(vec_col).slice(int(best), 1)})

        champs = scanner.scan(far_point)
        ids = champs.column(id_col).to_numpy(zero_copy_only=False)
        d2 = champs.column("d2").to_numpy(zero_copy_only=False)
        best = np.lexsort((ids, -d2))[0]
        if d2[best] <= 0.0:
            break  # fewer distinct points than k
        cents = np.vstack([cents, _batch_matrix(champs, vec_col)[best:best + 1]])

    kk = cents.shape[0]

    # ---- Lloyd passes -------------------------------------------------
    n_total = None
    iterations = 0
    converged = False
    metrics: list[dict] = []
    prev_cents = None
    for it in range(max_iterations):
        pair_ref = ray.put((cents, prev_cents))

        def partials(t: pa.Table) -> pa.Table:
            c_now, c_prev = ray.get(pair_ref)
            m = _batch_matrix(t, vec_col)
            b = m.shape[0]
            if b == 0:
                return pa.table({"cluster": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64()),
                                 "changed": pa.array([], pa.int64()),
                                 "sumvec": pa.array([], pa.list_(pa.float64()))})
            a = _dists_to(m, c_now).argmin(axis=1)
            changed = b
            if c_prev is not None:
                a_prev = _dists_to(m, c_prev).argmin(axis=1)
                changed = int((a != a_prev).sum())
            kknow = c_now.shape[0]
            cnt = np.bincount(a, minlength=kknow)
            # bincount per column beats np.add.at ~5× (same finding as
            # the pagerank scatter; d is small, b is the hot dimension)
            sums = np.stack(
                [np.bincount(a, weights=m[:, j], minlength=kknow)
                 for j in range(m.shape[1])], axis=1
            )
            ch = np.zeros(kknow, dtype=np.int64)
            ch[0] = changed  # carried on one row; summed on the driver
            return pa.table({"cluster": pa.array(np.arange(kknow), pa.int64()),
                             "n": pa.array(cnt, pa.int64()),
                             "changed": pa.array(ch, pa.int64()),
                             "sumvec": pa.array(list(sums), pa.list_(pa.float64()))})

        part = scanner.scan(partials)
        cl = part.column("cluster").to_numpy(zero_copy_only=False)
        n = part.column("n").to_numpy(zero_copy_only=False)
        changed = int(part.column("changed").to_numpy(zero_copy_only=False).sum())
        sums = np.stack(part.column("sumvec").to_pylist())
        counts = np.zeros(kk, dtype=np.int64)
        np.add.at(counts, cl, n)
        vecsum = np.zeros((kk, cents.shape[1]))
        np.add.at(vecsum, cl, sums)
        n_total = int(counts.sum())

        new_cents = cents.copy()
        nz = counts > 0
        new_cents[nz] = vecsum[nz] / counts[nz, None]
        prev_cents, cents = cents, new_cents
        iterations = it + 1
        frac = (changed / n_total) if n_total else 0.0
        metrics.append({"iteration": iterations, "changed": changed,
                        "changed_fraction": frac})
        # GDS deltaThreshold: stop once the reassignment fraction between
        # consecutive passes is within threshold (first pass assigns all)
        if it > 0 and frac <= delta_threshold:
            converged = True
            break

    # ---- final labeling pass (streaming) ------------------------------
    final_ref = ray.put(cents)

    def label(t: pa.Table) -> pa.Table:
        c = ray.get(final_ref)
        m = _batch_matrix(t, vec_col)
        if m.shape[0] == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "distance": pa.array([], pa.float64())})
        d2 = _dists_to(m, c)
        a = d2.argmin(axis=1)
        dist = np.sqrt(np.maximum(d2[np.arange(m.shape[0]), a], 0.0))
        return pa.table({id_col: t.column(id_col),
                         "cluster": pa.array(a, pa.int64()),
                         "distance": pa.array(np.round(dist, 9), pa.float64())})

    assign = ds.map_batches(label, batch_format="pyarrow", zero_copy_batch=True)

    # total within-cluster squared distance (restart selection objective);
    # one combiner scan — a single float per block
    def cost_partial(t: pa.Table) -> pa.Table:
        c = ray.get(final_ref)
        m = _batch_matrix(t, vec_col)
        if m.shape[0] == 0:
            return pa.table({"cost": pa.array([], pa.float64())})
        d2 = _dists_to(m, c).min(axis=1)
        return pa.table({"cost": pa.array([float(np.maximum(d2, 0.0).sum())])})

    cost_t = scanner.scan(cost_partial)
    cost = float(cost_t.column("cost").to_numpy(zero_copy_only=False).sum()) if cost_t.num_rows else 0.0
    return KMeansResult(np.empty(0, np.int64), assign, cents, iterations,
                        converged, metrics, id_col), cost
