"""HDBSCAN over a node-property vector (density-based clustering).

Reference semantics (``gds.hdbscan``, added to the GDS catalog in 2.13
[GDS-pub: algo/.../hdbscan/]; algorithm: Campello, Moulavi & Sander
2013, public): hierarchical DBSCAN — single-linkage over the mutual
reachability metric, condensed by ``min_cluster_size`` and flattened by
excess-of-mass stability; points in no stable cluster are noise (-1).

Ray-Data-first decomposition:

1. **Core distances** (distance to the ``min_samples``-th nearest OTHER
   point — self excluded; documented convention): the broadcast-matrix
   idiom — the (n × d) matrix is ``ray.put`` once, point positions
   stream through ``map_batches``, each batch computing its rows'
   distances against the broadcast and keeping the k-th smallest. One
   scan, vectorized.
2. **Mutual-reachability candidate edges**: second streaming pass emits
   each point's ``knn_k`` nearest neighbours as
   (src, dst, max(core_s, core_d, d)) rows — a Dataset, never
   materialized on the driver. ``candidate="all_pairs"`` emits the
   exact complete graph (small n only); the KNN candidate set is the
   standard scale approximation (exact whenever the true MR-MST edges
   are within each point's knn_k neighbourhood — always the case for
   separated clusters).
3. **MST**: default ``candidate="exact"`` runs Borůvka over the
   IMPLICIT complete MR graph — no n² edge materialization: each round
   streams point positions through ``map_batches``, every batch
   computes its rows' MR distances against the broadcast matrix, masks
   same-component columns and emits one champion edge per component
   (a combiner); the driver merges champions and unions components —
   O(log n) rounds. This is exact because every component's minimum
   outgoing edge is found over ALL pairs. ``candidate="knn"`` instead
   materializes each point's knn_k-nearest MR edges as a Dataset and
   runs ``algos.mst.minimum_spanning_forest`` — cheaper at scale but a
   documented approximation: a KNN graph can miss true MST edges
   between clusters (they then connect through longer chains, which
   can pull boundary noise into clusters). ``candidate="all_pairs"``
   materializes the complete graph (small n only; equals exact).
4. **Hierarchy extraction** (single-linkage → condensed tree →
   stability selection): driver-side over the ≤ n-1 forest edges —
   node-vector-sized state, the dataflow path's standing assumption.
   A disconnected candidate forest is processed per component (far
   components can never share a cluster); the single-root exclusion
   (GDS/hdbscan ``allow_single_cluster=False``) applies only when the
   whole forest is one component.

Determinism: every step is deterministic (lexicographic tie-breaks in
the Borůvka forest; sorted edge processing here), so results are
partitioning-invariant — verified in tests.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data import Dataset

from graph_data_science_ray.algos.common import collect_arrow
from graph_data_science_ray.algos.mst import minimum_spanning_forest
from graph_data_science_ray.context import configure_ray_data, shuffle_partitions_for

_EPS = 1e-12


@dataclass
class HdbscanResult:
    table: pa.Table          # (id_col, cluster:int64, probability? no) — -1 = noise
    n_clusters: int
    core_distances: np.ndarray
    node_ids: np.ndarray
    metrics: list[dict]

    def to_table(self) -> pa.Table:
        return self.table


def _load_matrix(ds: Dataset, id_col: str, vec_col: str):
    t = collect_arrow(ds)
    if t.num_rows == 0:
        return np.empty(0, np.int64), np.empty((0, 0))
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    col = t.column(vec_col).combine_chunks()
    m = col.flatten().to_numpy(zero_copy_only=False).reshape(t.num_rows, -1)
    order = np.argsort(ids)
    return ids[order], m[order].astype(np.float64, copy=False)


def _stream_positions(n: int, num_partitions: int) -> Dataset:
    rows = pa.table({"pos": pa.array(np.arange(n), pa.int64())})
    return ray.data.from_arrow(rows).repartition(min(num_partitions, max(1, n)))


def _exact_mst_mr(
    ids: np.ndarray, m: np.ndarray, core: np.ndarray, num_partitions: int,
    max_rounds: int = 64,
):
    """Borůvka over the implicit complete mutual-reachability graph.
    Per round: one streamed scan; each batch emits ≤ one champion edge
    per component (min (w, lo, hi) lexicographic — ties on w are common
    because MR is frequently core-dominated)."""
    n = ids.shape[0]
    comp = np.arange(n, dtype=np.int64)
    fu: list[int] = []
    fv: list[int] = []
    fw: list[float] = []
    from graph_data_science_ray.algos.common import BlockScanner

    scanner = BlockScanner(_stream_positions(n, num_partitions))
    for _ in range(max_rounds):
        if np.unique(comp).shape[0] <= 1:
            break
        state = ray.put((m, core, comp))

        def champions(batch: pa.Table) -> pa.Table:
            mm, cr, cp = ray.get(state)
            pos = batch.column("pos").to_numpy(zero_copy_only=False)
            d2 = (
                (mm[pos] * mm[pos]).sum(axis=1, keepdims=True)
                - 2.0 * (mm[pos] @ mm.T)
                + (mm * mm).sum(axis=1)[None, :]
            )
            mr = np.maximum(
                np.maximum(cr[pos][:, None], cr[None, :]),
                np.sqrt(np.maximum(d2, 0.0)),
            )
            same = cp[pos][:, None] == cp[None, :]
            mr[same] = np.inf
            rowmin = mr.min(axis=1)
            ok = np.isfinite(rowmin)
            if not ok.any():
                return pa.table({"c": pa.array([], pa.int64()),
                                 "w": pa.array([], pa.float64()),
                                 "u": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64())})
            # tie-break: first tied column = smallest position = the
            # lexicographically smallest (lo, hi) pair for this row
            j = (mr == rowmin[:, None]).argmax(axis=1)
            r, j, w = pos[ok], j[ok], rowmin[ok]
            lo, hi = np.minimum(r, j), np.maximum(r, j)
            c = cp[r]
            order = np.lexsort((hi, lo, w, c))
            c, w, lo, hi = c[order], w[order], lo[order], hi[order]
            first = np.r_[True, c[1:] != c[:-1]]
            return pa.table({"c": pa.array(c[first], pa.int64()),
                             "w": pa.array(w[first], pa.float64()),
                             "u": pa.array(lo[first], pa.int64()),
                             "v": pa.array(hi[first], pa.int64())})

        t = scanner.scan(champions)
        if t.num_rows == 0:
            break
        c = t.column("c").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u, w, c))
        c, w, u, v = c[order], w[order], u[order], v[order]
        first = np.r_[True, c[1:] != c[:-1]]
        w, u, v = w[first], u[first], v[first]
        pair = np.lexsort((v, u))
        u, v, w = u[pair], v[pair], w[pair]
        uniq = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
        u, v, w = u[uniq], v[uniq], w[uniq]

        parent = comp.copy()

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i in range(u.shape[0]):
            ru, rv = find(comp[u[i]]), find(comp[v[i]])
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
                fu.append(int(ids[u[i]]))
                fv.append(int(ids[v[i]]))
                fw.append(float(w[i]))
        while True:
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
        comp = parent[comp]
    return (np.asarray(fu, np.int64), np.asarray(fv, np.int64),
            np.asarray(fw, np.float64), int(np.unique(comp).shape[0]))


def hdbscan(
    ds: Dataset,
    min_cluster_size: int = 5,
    min_samples: int | None = None,
    knn_k: int | None = None,
    candidate: str = "exact",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_partitions: int | None = None,
) -> HdbscanResult:
    configure_ray_data()
    num_partitions = num_partitions or shuffle_partitions_for()
    if min_samples is None:
        min_samples = min_cluster_size
    ids, m = _load_matrix(ds, id_col, vec_col)
    n = ids.shape[0]
    if n == 0:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "cluster": pa.array([], pa.int64())})
        return HdbscanResult(empty, 0, np.empty(0), ids, [])
    if n <= min_cluster_size:
        out = pa.table({id_col: pa.array(ids, pa.int64()),
                        "cluster": pa.array(np.full(n, -1), pa.int64())})
        return HdbscanResult(out, 0, np.zeros(n), ids, [])

    k_core = min(min_samples, n - 1)
    kk = min(knn_k or max(min_samples, 16), n - 1)
    mat_ref = ray.put((ids, m))

    # ---- pass 1: core distances (streamed, tiny output) ---------------
    def core_stage(batch: pa.Table) -> pa.Table:
        bids, mm = ray.get(mat_ref)
        pos = batch.column("pos").to_numpy(zero_copy_only=False)
        d2 = (
            (mm[pos] * mm[pos]).sum(axis=1, keepdims=True)
            - 2.0 * (mm[pos] @ mm.T)
            + (mm * mm).sum(axis=1)[None, :]
        )
        d2[np.arange(pos.shape[0]), pos] = np.inf  # self excluded
        kth = np.partition(d2, k_core - 1, axis=1)[:, k_core - 1]
        return pa.table({"pos": pa.array(pos, pa.int64()),
                         "core": pa.array(np.sqrt(np.maximum(kth, 0.0)), pa.float64())})

    ct = collect_arrow(
        _stream_positions(n, num_partitions).map_batches(
            core_stage, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    core = np.zeros(n, dtype=np.float64)
    core[ct.column("pos").to_numpy(zero_copy_only=False)] = ct.column("core").to_numpy(
        zero_copy_only=False
    )

    if candidate == "exact":
        fu, fv, fw, n_comp = _exact_mst_mr(ids, m, core, num_partitions)
        labels = _extract_labels(ids, fu, fv, fw, min_cluster_size)
        n_clusters = int(labels.max() + 1) if labels.size and labels.max() >= 0 else 0
        out = pa.table({id_col: pa.array(ids, pa.int64()),
                        "cluster": pa.array(labels, pa.int64())})
        return HdbscanResult(
            out, n_clusters, core, ids,
            [{"mst_edges": int(fu.shape[0]), "components": n_comp,
              "n_clusters": n_clusters}],
        )

    # ---- pass 2: mutual-reachability candidate edges (a Dataset) ------
    state_ref = ray.put((ids, m, core))

    def mr_edges(batch: pa.Table) -> pa.Table:
        bids, mm, cr = ray.get(state_ref)
        pos = batch.column("pos").to_numpy(zero_copy_only=False)
        d2 = (
            (mm[pos] * mm[pos]).sum(axis=1, keepdims=True)
            - 2.0 * (mm[pos] @ mm.T)
            + (mm * mm).sum(axis=1)[None, :]
        )
        d2[np.arange(pos.shape[0]), pos] = np.inf
        if candidate == "all_pairs":
            nbr = np.tile(np.arange(mm.shape[0]), (pos.shape[0], 1))
            keep_n = mm.shape[0]
        else:
            nbr = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
            keep_n = kk
        d = np.sqrt(np.maximum(np.take_along_axis(d2, nbr, axis=1), 0.0))
        src = np.repeat(pos, keep_n)
        dst = nbr.ravel()
        dd = d.ravel()
        ok = np.isfinite(dd)
        src, dst, dd = src[ok], dst[ok], dd[ok]
        mr = np.maximum(np.maximum(cr[src], cr[dst]), dd)
        return pa.table(
            {
                "src_id": pa.array(bids[src], pa.int64()),
                "dst_id": pa.array(bids[dst], pa.int64()),
                "weight": pa.array(mr, pa.float64()),
            }
        )

    cand_ds = _stream_positions(n, num_partitions).map_batches(
        mr_edges, batch_format="pyarrow", zero_copy_batch=True
    )

    # ---- pass 3: distributed Borůvka MST over MR weights --------------
    forest = minimum_spanning_forest(cand_ds, num_partitions=num_partitions)
    fu = forest.edges.column("u").to_numpy(zero_copy_only=False)
    fv = forest.edges.column("v").to_numpy(zero_copy_only=False)
    fw = forest.edges.column("weight").to_numpy(zero_copy_only=False)

    labels = _extract_labels(ids, fu, fv, fw, min_cluster_size)
    n_clusters = int(labels.max() + 1) if labels.size and labels.max() >= 0 else 0
    out = pa.table({id_col: pa.array(ids, pa.int64()),
                    "cluster": pa.array(labels, pa.int64())})
    return HdbscanResult(
        out, n_clusters, core, ids,
        [{"mst_edges": int(fu.shape[0]), "components": forest.n_components,
          "n_clusters": n_clusters}],
    )


def _extract_labels(
    ids: np.ndarray, fu: np.ndarray, fv: np.ndarray, fw: np.ndarray,
    min_cluster_size: int,
) -> np.ndarray:
    """Single-linkage dendrogram → condensed tree → excess-of-mass
    selection → labels. Pure driver-side numpy/python over ≤ n-1 edges."""
    n = ids.shape[0]
    pu = np.searchsorted(ids, fu)
    pv = np.searchsorted(ids, fv)
    order = np.argsort(fw, kind="stable")
    pu, pv, w = pu[order], pv[order], fw[order]

    # -- single linkage union-find: internal nodes n..n+m-1 -------------
    parent = np.arange(n + pu.shape[0], dtype=np.int64)
    uf_root = np.arange(n + pu.shape[0], dtype=np.int64)  # current tree top per set
    left = np.full(pu.shape[0], -1, dtype=np.int64)
    right = np.full(pu.shape[0], -1, dtype=np.int64)
    height = np.zeros(pu.shape[0], dtype=np.float64)
    size = np.ones(n + pu.shape[0], dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    m_int = 0
    for i in range(pu.shape[0]):
        ra, rb = find(pu[i]), find(pv[i])
        if ra == rb:
            continue
        node = n + m_int
        left[m_int], right[m_int] = uf_root[ra], uf_root[rb]
        height[m_int] = w[i]
        parent[ra] = node
        parent[rb] = node
        parent[node] = node
        uf_root[node] = node
        size[node] = size[uf_root[ra]] + size[uf_root[rb]]
        m_int += 1
    roots = {int(find(x)) for x in range(n)}

    # -- condensed tree --------------------------------------------------
    # cluster records: birth_lambda, parent_cluster, stability pieces
    cl_parent: list[int] = []
    cl_birth: list[float] = []
    cl_children: list[list[int]] = []
    cl_stab: list[float] = []
    # per point: (cluster, lambda_leave)
    pt_cluster = np.full(n, -1, dtype=np.int64)
    pt_lambda = np.zeros(n, dtype=np.float64)
    single_root = len(roots) == 1

    def new_cluster(parent_c: int, birth: float) -> int:
        cl_parent.append(parent_c)
        cl_birth.append(birth)
        cl_children.append([])
        cl_stab.append(0.0)
        c = len(cl_parent) - 1
        if parent_c >= 0:
            cl_children[parent_c].append(c)
        return c

    def leaves_of(node: int) -> np.ndarray:
        out = []
        stack = [node]
        while stack:
            x = stack.pop()
            if x < n:
                out.append(x)
            else:
                stack.append(int(left[x - n]))
                stack.append(int(right[x - n]))
        return np.asarray(out, dtype=np.int64)

    root_small: set[int] = set()  # component roots below min_cluster_size
    work: list[tuple[int, int]] = []  # (dendro node, cluster id)
    for r in sorted(roots):
        c = new_cluster(-1, 0.0)
        if (size[r] if r >= n else 1) < min_cluster_size:
            root_small.add(c)
        work.append((r, c))

    while work:
        node, c = work.pop()
        if node < n:
            # singleton "cluster" — point leaves immediately
            pt_cluster[node] = c
            pt_lambda[node] = np.inf
            continue
        i = node - n
        lam = 1.0 / max(height[i], _EPS)
        a, b = int(left[i]), int(right[i])
        sa = size[a] if a >= n else 1
        sb = size[b] if b >= n else 1
        big_a, big_b = sa >= min_cluster_size, sb >= min_cluster_size
        if big_a and big_b:
            # true split: all of c's current points leave at lam
            # (contribution (lam - birth) each); two child clusters born
            for child in (a, b):
                cc = new_cluster(c, lam)
                work.append((child, cc))
            cnt = int(size[node])
            cl_stab[c] += (lam - cl_birth[c]) * cnt
        elif big_a or big_b:
            big, small = (a, b) if big_a else (b, a)
            lv = leaves_of(small)
            pt_cluster[lv] = c
            pt_lambda[lv] = lam
            work.append((big, c))
        else:
            lv = leaves_of(node)
            pt_cluster[lv] = c
            pt_lambda[lv] = lam

    # -- stability: sum over point fallout + split contributions ---------
    for p in range(n):
        c = int(pt_cluster[p])
        if c >= 0:
            lam = pt_lambda[p]
            if not np.isfinite(lam):
                lam = 1.0 / _EPS
            cl_stab[c] += lam - cl_birth[c]

    # -- excess-of-mass selection (leaves-up) ----------------------------
    n_cl = len(cl_parent)
    selected = np.zeros(n_cl, dtype=bool)
    subtree_stab = np.array(cl_stab, dtype=np.float64)
    # children before parents: clusters are created parent-first, so
    # reverse creation order is a valid bottom-up order
    for c in range(n_cl - 1, -1, -1):
        kids = cl_children[c]
        kid_sum = float(sum(subtree_stab[k] for k in kids))
        is_root = cl_parent[c] < 0
        # the global single root is never selectable (hdbscan
        # allow_single_cluster=False convention); a per-component root
        # IS (a lone tight component is a genuine cluster) unless the
        # component is smaller than min_cluster_size
        allow = not (is_root and (single_root or c in root_small))
        if not allow or (kids and kid_sum > subtree_stab[c]):
            subtree_stab[c] = kid_sum
            selected[c] = False
        else:
            selected[c] = True

    # deselect descendants of selected clusters (top-down)
    for c in range(n_cl):
        if cl_parent[c] >= 0:
            anc = cl_parent[c]
            blocked = False
            while anc >= 0:
                if selected[anc]:
                    blocked = True
                    break
                anc = cl_parent[anc]
            if blocked:
                selected[c] = False

    # -- labels: nearest selected ancestor-or-self of the fallout cluster
    label_of_cluster = np.full(n_cl, -1, dtype=np.int64)
    next_label = 0
    for c in range(n_cl):
        if selected[c]:
            label_of_cluster[c] = next_label
            next_label += 1
    labels = np.full(n, -1, dtype=np.int64)
    for p in range(n):
        c = int(pt_cluster[p])
        while c >= 0 and not selected[c]:
            c = cl_parent[c]
        if c >= 0:
            labels[p] = label_of_cluster[c]
    # canonical output labeling: clusters numbered by their smallest
    # member (ids are sorted, so position order == id order) — the
    # DFS-creation-order numbering above is traversal-dependent, which
    # a replayed oracle cannot know without replaying the stack
    present = [int(l) for l in np.unique(labels) if l >= 0]
    if present:
        firsts = {l: int(np.flatnonzero(labels == l)[0]) for l in present}
        remap = {l: k for k, (_, l) in enumerate(
            sorted((f, l) for l, f in firsts.items()))}
        labels = np.array([remap.get(int(l), -1) for l in labels], dtype=np.int64)
    return labels
