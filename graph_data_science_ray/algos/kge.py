"""Knowledge-graph-embedding link scoring — ``gds.ml.kge.predict``.

Reference surface (``gds.ml.kge.predictTransE`` / ``predictDistMult``
[GDS-pub: ml/ml-algo KGEPredict + proc/ml; public docs]): given trained
node embeddings, a RELATION embedding vector and a set of source nodes,
score every candidate target and stream the top-k (sourceNode,
targetNode, score) triples per source.

Scoring functions (public KGE literature — Bordes et al. NeurIPS'13
TransE; Yang et al. ICLR'15 DistMult):

- ``transe``:   score(h, r, t) = −‖h + r − t‖₂  (higher = better)
- ``distmult``: score(h, r, t) = Σ_d h_d · r_d · t_d

Ray-Data-first plan (the broadcast + per-batch-combiner idiom, same as
stages/embed.brute_force_topk): the source-embedding matrix (S, d) and
the relation vector ride in ONE ``ray.put``; each embeddings batch
computes the (S, batch) score matrix vectorized and emits only its local
top-k rows per source — the driver merge sees |blocks|·S·k partials, not
the full n·S score matrix. The embeddings Dataset streams; nothing
materializes. Tie-break: score desc, then target id asc — deterministic
and partitioning-invariant."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.algos.common import collect_arrow
from graph_data_science_ray.context import configure_ray_data

_SCORERS = ("transe", "distmult")


def _collect_rows(ds: Dataset, ids: np.ndarray, id_col: str, vec_col: str) -> np.ndarray:
    """(len(ids), d) matrix for the given ids (order-aligned)."""
    want = np.sort(np.unique(ids))
    want_ref = ray.put(want)

    def pick(t: pa.Table) -> pa.Table:
        w = ray.get(want_ref)
        nid = t.column(id_col).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(w, nid)
        hit = (pos < w.shape[0]) & (w[np.minimum(pos, w.shape[0] - 1)] == nid)
        return t.filter(pa.array(hit))

    got = collect_arrow(ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True))
    if got.num_rows == 0:
        raise ValueError(f"source ids missing embeddings: {ids[:5]}")
    gid = got.column(id_col).to_numpy(zero_copy_only=False)
    gX = np.array(got.column(vec_col).to_pylist(), dtype=np.float64)
    order = np.argsort(gid, kind="stable")
    gid, gX = gid[order], gX[order]
    pos = np.searchsorted(gid, ids)
    missing = (pos >= gid.shape[0]) | (gid[np.minimum(pos, gid.shape[0] - 1)] != ids)
    if missing.any():
        raise ValueError(f"source ids missing embeddings: {ids[missing][:5]}")
    return gX[pos]


def kge_predict(
    embeddings: Dataset,
    source_ids,
    relation: np.ndarray | list,
    top_k: int = 10,
    scoring_function: str = "transe",
    id_col: str = "node_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Top-k targets per source under the relation. Returns
    (source_id, target_id, score, rank) sorted by (source_id, rank);
    rank 1 = best; a source never scores itself."""
    if scoring_function not in _SCORERS:
        raise ValueError(f"scoring_function must be one of {_SCORERS}")
    configure_ray_data()
    srcs = np.asarray(source_ids, dtype=np.int64)
    r = np.asarray(relation, dtype=np.float64)
    H = _collect_rows(embeddings, srcs, id_col, vec_col)
    if H.shape[1] != r.shape[0]:
        raise ValueError(f"relation dim {r.shape[0]} != embedding dim {H.shape[1]}")
    if scoring_function == "transe":
        Q = H + r[None, :]  # score = -||Q - t||
    else:
        Q = H * r[None, :]  # score = Q . t
    state_ref = ray.put((srcs, Q, scoring_function, top_k))

    def local_topk(batch: pa.Table) -> pa.Table:
        s_ids, Qm, fn, k = ray.get(state_ref)
        tid = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        T = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if T.shape[0] == 0:
            return pa.table({"source_id": pa.array([], pa.int64()),
                             "target_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        # einsum (optimize=False) instead of BLAS gemm: gemm picks
        # blocking/reduction order by matrix SHAPE, so the same (s, t)
        # pair can score differently (~1 ulp) under different batch
        # boundaries — einsum's fixed C loop keeps scores bit-identical
        # across partitionings (the invariance the merge relies on).
        dots = np.einsum("sd,nd->sn", Qm, T)
        if fn == "transe":
            # -||q - t|| via the expanded form: no (S,n,d) temp
            sq = (Qm * Qm).sum(axis=1)[:, None] + (T * T).sum(axis=1)[None, :]
            scores = -np.sqrt(np.maximum(sq - 2.0 * dots, 0.0))
        else:
            scores = dots  # (S, n)
        # mask self-targets
        self_hit = s_ids[:, None] == tid[None, :]
        scores = np.where(self_hit, -np.inf, scores)
        kk = min(k, scores.shape[1])
        # keep EVERY target tied with the k-th best per source (ties at
        # the boundary must all reach the driver merge, which breaks
        # them by smallest target id like the oracle)
        kth = -np.partition(-scores, kk - 1, axis=1)[:, kk - 1]
        mask = scores >= kth[:, None]
        rows, cols = np.nonzero(mask)
        si = s_ids[rows]
        ti = tid[cols]
        sc = scores[rows, cols]
        ok = np.isfinite(sc)
        return pa.table({"source_id": pa.array(si[ok], pa.int64()),
                         "target_id": pa.array(ti[ok], pa.int64()),
                         "score": pa.array(sc[ok], pa.float64())})

    part = collect_arrow(embeddings.map_batches(local_topk, batch_format="pyarrow",
                                                zero_copy_batch=True))
    if part.num_rows == 0 or "source_id" not in part.column_names:
        # collect_arrow drops all-empty partials schema-lessly
        return pa.table({"source_id": pa.array([], pa.int64()),
                         "target_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64()),
                         "rank": pa.array([], pa.int64())})
    si = part.column("source_id").to_numpy(zero_copy_only=False)
    ti = part.column("target_id").to_numpy(zero_copy_only=False)
    sc = part.column("score").to_numpy(zero_copy_only=False)
    order = np.lexsort((ti, -sc, si))
    si, ti, sc = si[order], ti[order], sc[order]
    # first top_k rows per source (si is grouped after the lexsort)
    first = np.r_[True, si[1:] != si[:-1]]
    grp_start = np.flatnonzero(first)
    offs = np.arange(si.shape[0]) - np.repeat(grp_start, np.diff(np.r_[grp_start, si.shape[0]]))
    keep = offs < top_k
    return pa.table({"source_id": pa.array(si[keep], pa.int64()),
                     "target_id": pa.array(ti[keep], pa.int64()),
                     "score": pa.array(sc[keep], pa.float64()),
                     "rank": pa.array(offs[keep] + 1, pa.int64())})
