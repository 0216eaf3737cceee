"""Scalar similarity functions — the reference's gds.similarity.* family
(jaccard, overlap, cosine, pearson, euclidean / euclideanDistance), as
pure numpy kernels plus vectorized batch variants for list<float> columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def jaccard_sim(a, b) -> float:
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def overlap_sim(a, b) -> float:
    sa, sb = set(a), set(b)
    d = min(len(sa), len(sb))
    return len(sa & sb) / d if d else 1.0


def cosine_sim(a, b) -> float:
    va, vb = np.asarray(a, float), np.asarray(b, float)
    na, nb = np.linalg.norm(va), np.linalg.norm(vb)
    if na == 0 or nb == 0:
        return 0.0
    return float(va @ vb / (na * nb))


def pearson_sim(a, b) -> float:
    va, vb = np.asarray(a, float), np.asarray(b, float)
    va, vb = va - va.mean(), vb - vb.mean()
    na, nb = np.linalg.norm(va), np.linalg.norm(vb)
    if na == 0 or nb == 0:
        return 0.0
    return float(va @ vb / (na * nb))


def euclidean_distance(a, b) -> float:
    return float(np.linalg.norm(np.asarray(a, float) - np.asarray(b, float)))


def euclidean_sim(a, b) -> float:
    return 1.0 / (1.0 + euclidean_distance(a, b))


def batch_cosine_to_query(batch: pa.Table, query: np.ndarray, vec_col: str = "embedding",
                          out_col: str = "score") -> pa.Table:
    """Vectorized cosine of every row's vector against one query vector."""
    col = batch.column(vec_col)
    if col.num_chunks > 1:
        col = col.combine_chunks()
    flat = col.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    m = flat.reshape(len(col), -1).astype(np.float64, copy=False)
    q = np.asarray(query, np.float64)
    qn = np.linalg.norm(q)
    mn = np.linalg.norm(m, axis=1)
    denom = mn * qn
    sims = np.divide(m @ q, denom, out=np.zeros(m.shape[0]), where=denom > 0)
    return batch.append_column(out_col, pa.array(sims, pa.float64()))
