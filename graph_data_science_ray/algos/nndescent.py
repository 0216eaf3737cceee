"""NN-Descent KNN — the reference's actual ``gds.knn`` algorithm.

Reference semantics (``gds.knn`` [GDS-pub: algo/.../similarity/knn/ —
Knn.java, public docs], after Dong, Moses & Li, "Efficient k-nearest
neighbor graph construction for generic similarity measures", WWW'11):
start every node with random neighbor candidates, then repeatedly let
each node compare its neighbors' neighbors ("a friend of a friend is
likely a friend"), keeping the best k — converging in a handful of
rounds with O(n·k²) comparisons per round instead of the exact kernel's
O(n²). Config mirrored: ``sampleRate`` (default 0.5), ``deltaThreshold``
(0.001), ``maxIterations`` (100), ``randomJoins`` (10),
``similarityCutoff``.

Ray-Data-first plan — NO broadcast similarity matrix (that is the exact
kernel in algos/knn.py, whose (n × d) ray.put breaks beyond worker
memory); this is the beyond-memory scale path:

- state = a Dataset (node_id, nbr_id, sim, new) of n·k rows — always
  edge-list-shaped, never a driver structure;
- each round: (1) symmetrize the state and hash-bucket it by node
  (``bucketed_merge``) to sample ρk new + ρk old entries per node and
  emit the new×all candidate pairs vectorized; (2) attach both
  endpoint vectors via two partitioned hash joins against the packed
  (node_id, vector-blob) table (Acero rejects list<> payloads — the
  same fixed-width binary ride-along used by pipelines/ml); (3) score
  cosine per batch; (4) union with the old state and keep per-node
  top-k in one more ``bucketed_merge`` (lexsort, vectorized);
- convergence: count entries not present in the previous round's lists;
  stop when ≤ deltaThreshold·n·k (GDS's update-counter rule).

Everything random is splitmix64-hash-of-(id, round, seed): restarts and
repartitioning cannot change the result. The only driver-resident state
is the sorted node-id array (for init sampling), n×8 bytes — the same
standing assumption the rest of the engine documents.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data import Dataset

from graph_data_science_ray.algos.common import collect_arrow
from graph_data_science_ray.context import configure_ray_data, shuffle_partitions_for
from graph_data_science_ray.functions.joins import _mix64, hash_join
from graph_data_science_ray.functions.shuffle import bucketed_merge


def _pack_vectors(embeddings: Dataset, id_col: str, vec_col: str,
                  key_out: str, blob_out: str) -> Dataset:
    def pack(t: pa.Table) -> pa.Table:
        vecs = [np.asarray(v, dtype=np.float64).tobytes()
                for v in t.column(vec_col).to_pylist()]
        return pa.table({key_out: t.column(id_col).cast(pa.int64()),
                         blob_out: pa.array(vecs, pa.binary())})

    return embeddings.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)


def _decode(col: pa.ChunkedArray, d: int) -> np.ndarray:
    buf = b"".join(col.to_pylist())
    return np.frombuffer(buf, dtype=np.float64).reshape(-1, d)


def _state_schema() -> dict:
    return {"node_id": -1, "nbr_id": -1, "sim": 0.0, "new": 0}


def knn_nndescent(
    embeddings: Dataset,
    k: int = 10,
    sample_rate: float = 0.5,
    delta_threshold: float = 0.001,
    max_iterations: int = 100,
    random_joins: int = 10,
    similarity_cutoff: float = -1.0,
    seed: int = 42,
    id_col: str = "node_id",
    vec_col: str = "embedding",
    num_partitions: int | None = None,
    vector_mode: str = "auto",  # auto | broadcast | join
    broadcast_threshold: int = 400_000_000,  # max n·d matrix ENTRIES (~3.2 GB f64)
) -> tuple[Dataset, int]:
    """Approximate per-node cosine top-k. Returns (Dataset (node_id,
    neighbour_id, similarity) sorted per node by (-sim, nbr), rounds
    run). Exactness is not guaranteed — see tests for recall floors.

    ``vector_mode``: how candidate pairs get their endpoint vectors.
    ``broadcast`` ships the normalized (n × d) matrix once via
    ``ray.put`` (right while it fits worker memory — the small-side-
    broadcast idiom); ``join`` attaches vectors with two partitioned
    hash joins per round (the beyond-memory path — scoring cost becomes
    2 shuffles of the candidate-pair table, never an n×d residency).
    Both modes produce IDENTICAL results (verified in tests)."""
    configure_ray_data()
    num_partitions = num_partitions or shuffle_partitions_for()

    ids_t = collect_arrow(embeddings.select_columns([id_col]))
    node_arr = np.sort(ids_t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64))
    n = node_arr.shape[0]
    if n <= 1:
        empty = pa.table({"node_id": pa.array([], pa.int64()),
                          "neighbour_id": pa.array([], pa.int64()),
                          "similarity": pa.array([], pa.float64())})
        return ray.data.from_arrow(empty), 0
    kk = min(k, n - 1)
    s = max(1, int(round(sample_rate * kk)))
    node_ref = ray.put(node_arr)

    d = len(embeddings.limit(1).take(1)[0][vec_col])
    if vector_mode == "auto":
        # gate on MATRIX ENTRIES (n·d), not rows — n=4M at d=512 is a
        # 16 GB ray.put, exactly what join mode exists to avoid
        vector_mode = "broadcast" if n * d <= broadcast_threshold else "join"
    if vector_mode == "broadcast":
        emb_t = collect_arrow(embeddings.select_columns([id_col, vec_col]))
        eid = emb_t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        M = np.array(emb_t.column(vec_col).to_pylist(), dtype=np.float64)
        M = M[np.argsort(eid, kind="stable")]  # align with node_arr order
        # UNNORMALIZED on purpose: scoring below must be the bit-exact
        # same float expression as join mode (norm computed per pair)
        mat_ref = ray.put(M)
        packed_a = packed_b = None
    else:
        mat_ref = None
        packed_a = _pack_vectors(embeddings, id_col, vec_col, "pa_", "ea_").materialize()
        # second join side: lazy column rename over the SAME materialized
        # blocks — no second pack pass, no second object-store copy
        packed_b = packed_a.map_batches(
            lambda t: pa.table({"pb_": t.column("pa_"), "eb_": t.column("ea_")}),
            batch_format="pyarrow", zero_copy_batch=True)

    def init_candidates(t: pa.Table) -> pa.Table:
        ids_sorted = ray.get(node_ref)
        nid = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        reps = np.repeat(nid, kk)
        j = np.tile(np.arange(kk, dtype=np.int64), nid.shape[0])
        h = _mix64(reps.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                   ^ _mix64(j.astype(np.uint64) ^ np.uint64(seed)))
        # draw in [0, n-1) then skip self to guarantee nbr != node
        draw = (h % np.uint64(n - 1)).astype(np.int64)
        self_pos = np.searchsorted(ids_sorted, reps)
        draw = np.where(draw >= self_pos, draw + 1, draw)
        return pa.table({"pa_": pa.array(reps, pa.int64()),
                         "pb_": pa.array(ids_sorted[draw], pa.int64())})

    def _cos_table(a_ids, b_ids, A: np.ndarray, B: np.ndarray) -> pa.Table:
        na = np.linalg.norm(A, axis=1)
        nb = np.linalg.norm(B, axis=1)
        denom = np.maximum(na * nb, 1e-300)
        sim = np.round((A * B).sum(axis=1) / denom, 9)
        return pa.table({"pa_": a_ids, "pb_": b_ids,
                         "sim": pa.array(sim, pa.float64())})

    _empty_scored = pa.table({"pa_": pa.array([], pa.int64()),
                              "pb_": pa.array([], pa.int64()),
                              "sim": pa.array([], pa.float64())})

    def score_pairs(pairs: Dataset) -> Dataset:
        """(pa_, pb_) → (pa_, pb_, sim); broadcast lookup or two
        partitioned joins, same float expression either way."""
        if mat_ref is not None:
            def cos_bcast(t: pa.Table) -> pa.Table:
                if t.num_rows == 0:
                    return _empty_scored
                ids_sorted = ray.get(node_ref)
                Mm = ray.get(mat_ref)
                a = t.column("pa_").to_numpy(zero_copy_only=False)
                b = t.column("pb_").to_numpy(zero_copy_only=False)
                A = Mm[np.searchsorted(ids_sorted, a)]
                B = Mm[np.searchsorted(ids_sorted, b)]
                return _cos_table(t.column("pa_"), t.column("pb_"), A, B)

            return pairs.map_batches(cos_bcast, batch_format="pyarrow",
                                     zero_copy_batch=True)

        j1 = hash_join(pairs, packed_a, on=("pa_",), num_partitions=num_partitions)
        j2 = hash_join(j1, packed_b, on=("pb_",), num_partitions=num_partitions)

        def cos_join(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _empty_scored
            A = _decode(t.column("ea_"), d)
            B = _decode(t.column("eb_"), d)
            return _cos_table(t.column("pa_"), t.column("pb_"), A, B)

        return j2.map_batches(cos_join, batch_format="pyarrow", zero_copy_batch=True)

    def both_directions(t: pa.Table, new: int) -> pa.Table:
        a = t.column("pa_").to_numpy(zero_copy_only=False)
        b = t.column("pb_").to_numpy(zero_copy_only=False)
        sim = t.column("sim").to_numpy(zero_copy_only=False)
        return pa.table({"node_id": pa.array(np.concatenate([a, b]), pa.int64()),
                         "nbr_id": pa.array(np.concatenate([b, a]), pa.int64()),
                         "sim": pa.array(np.concatenate([sim, sim]), pa.float64()),
                         "new": pa.array(np.full(2 * a.shape[0], new, np.int64), pa.int64())})

    def topk_merge(g: pa.Table) -> pa.Table:
        """Per-node dedup (keep old over new on the same nbr) + top-k."""
        if g.num_rows == 0:
            return pa.table({"node_id": pa.array([], pa.int64()),
                             "nbr_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64()),
                             "new": pa.array([], pa.int64())})
        nid = g.column("node_id").to_numpy(zero_copy_only=False)
        nbr = g.column("nbr_id").to_numpy(zero_copy_only=False)
        sim = g.column("sim").to_numpy(zero_copy_only=False)
        new = g.column("new").to_numpy(zero_copy_only=False)
        # dedup (node, nbr): old (new=0) wins so survivors keep old flags
        o = np.lexsort((new, nbr, nid))
        nid, nbr, sim, new = nid[o], nbr[o], sim[o], new[o]
        first = np.r_[True, (nid[1:] != nid[:-1]) | (nbr[1:] != nbr[:-1])]
        nid, nbr, sim, new = nid[first], nbr[first], sim[first], new[first]
        # top-k by (-sim, nbr) within node
        o = np.lexsort((nbr, -sim, nid))
        nid, nbr, sim, new = nid[o], nbr[o], sim[o], new[o]
        starts = np.r_[True, nid[1:] != nid[:-1]]
        grp = np.flatnonzero(starts)
        offs = np.arange(nid.shape[0]) - np.repeat(grp, np.diff(np.r_[grp, nid.shape[0]]))
        keep = offs < kk
        return pa.table({"node_id": pa.array(nid[keep], pa.int64()),
                         "nbr_id": pa.array(nbr[keep], pa.int64()),
                         "sim": pa.array(sim[keep], pa.float64()),
                         "new": pa.array(new[keep], pa.int64())})

    # ---- init: hash-random candidate lists, scored once -------------
    init_pairs = embeddings.map_batches(init_candidates, batch_format="pyarrow",
                                        zero_copy_batch=True)
    state = bucketed_merge(
        score_pairs(init_pairs).map_batches(
            lambda t: both_directions(t, 1), batch_format="pyarrow", zero_copy_batch=True),
        ["node_id"], topk_merge, _state_schema(), num_partitions=num_partitions,
    ).materialize()

    rounds = 0
    for it in range(1, max_iterations + 1):
        rounds = it
        rj = random_joins
        salt = np.uint64((seed * 0x9E3779B97F4A7C15 + it * 0xC2B2AE3D27D4EB4F) & (2**64 - 1))

        def gen_pairs(g: pa.Table, salt=salt, rj=rj) -> pa.Table:
            """Sample ρk new + ρk old per node, emit new×all pairs plus
            randomJoins hash-random probes (vectorized per bucket)."""
            empty = pa.table({"pa_": pa.array([], pa.int64()),
                              "pb_": pa.array([], pa.int64())})
            if g.num_rows == 0:
                return empty
            nid = g.column("node_id").to_numpy(zero_copy_only=False)
            nbr = g.column("nbr_id").to_numpy(zero_copy_only=False)
            new = g.column("new").to_numpy(zero_copy_only=False)
            # dedup (node, nbr) — forward ∪ reverse repeats entries and
            # identical hash ranks would waste sample slots; new wins
            o = np.lexsort((-new, nbr, nid))
            nid, nbr, new = nid[o], nbr[o], new[o]
            fst = np.r_[True, (nid[1:] != nid[:-1]) | (nbr[1:] != nbr[:-1])]
            nid, nbr, new = nid[fst], nbr[fst], new[fst]
            # per (node, new-status) hash ranking → keep first s of each
            h = _mix64(nbr.astype(np.uint64) ^ salt)
            o = np.lexsort((h, -new, nid))
            nid, nbr, new = nid[o], nbr[o], new[o]
            starts = np.r_[True, (nid[1:] != nid[:-1]) | (new[1:] != new[:-1])]
            grp = np.flatnonzero(starts)
            offs = np.arange(nid.shape[0]) - np.repeat(grp, np.diff(np.r_[grp, nid.shape[0]]))
            keep = offs < s
            nid, nbr, new = nid[keep], nbr[keep], new[keep]
            # segment per node: pairs = sampled-new × sampled-all
            nstart = np.r_[True, nid[1:] != nid[:-1]]
            out_a, out_b = [], []
            bounds = np.r_[np.flatnonzero(nstart), nid.shape[0]]
            for si in range(bounds.shape[0] - 1):
                lo, hi = bounds[si], bounds[si + 1]
                members = nbr[lo:hi]
                news = members[new[lo:hi] == 1]
                if news.shape[0] == 0:
                    continue
                a = np.repeat(news, members.shape[0])
                b = np.tile(members, news.shape[0])
                m = a != b
                out_a.append(a[m])
                out_b.append(b[m])
            ids_sorted = ray.get(node_ref)
            if rj > 0:
                uniq = nid[nstart]
                reps = np.repeat(uniq, rj)
                jj = np.tile(np.arange(rj, dtype=np.int64), uniq.shape[0])
                hh = _mix64(reps.astype(np.uint64) ^ _mix64(jj.astype(np.uint64) ^ salt))
                draw = (hh % np.uint64(n - 1)).astype(np.int64)
                self_pos = np.searchsorted(ids_sorted, reps)
                draw = np.where(draw >= self_pos, draw + 1, draw)
                out_a.append(reps)
                out_b.append(ids_sorted[draw])
            if not out_a:
                return empty
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
            lo = np.minimum(a, b)
            hi = np.maximum(a, b)
            # bucket-local dedup of unordered pairs
            o = np.lexsort((hi, lo))
            lo, hi = lo[o], hi[o]
            first = np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])]
            return pa.table({"pa_": pa.array(lo[first], pa.int64()),
                             "pb_": pa.array(hi[first], pa.int64())})

        def reverse(t: pa.Table) -> pa.Table:
            """R[v] = {u : v ∈ K[u]} — the WWW'11 general-neighbor set
            B[v] = K[v] ∪ R[v] that pair generation samples from."""
            return pa.table({"node_id": t.column("nbr_id"),
                             "nbr_id": t.column("node_id"),
                             "sim": t.column("sim"), "new": t.column("new")})

        general = state.union(state.map_batches(reverse, batch_format="pyarrow",
                                                zero_copy_batch=True))
        pairs = bucketed_merge(general, ["node_id"], gen_pairs,
                               _state_schema(), num_partitions=num_partitions)
        scored = score_pairs(pairs).map_batches(
            lambda t: both_directions(t, 1), batch_format="pyarrow", zero_copy_batch=True)

        def age(t: pa.Table) -> pa.Table:
            return t.set_column(t.schema.get_field_index("new"), "new",
                                pa.array(np.zeros(t.num_rows, np.int64), pa.int64()))

        merged = bucketed_merge(
            state.map_batches(age, batch_format="pyarrow", zero_copy_batch=True).union(scored),
            ["node_id"], topk_merge, _state_schema(), num_partitions=num_partitions,
        ).materialize()
        changes = merged.sum("new") or 0  # new is 0/1 — sum = update count
        state = merged
        if changes <= delta_threshold * n * kk:
            break

    cutoff = similarity_cutoff

    def finalize(t: pa.Table) -> pa.Table:
        m = t.column("sim").to_numpy(zero_copy_only=False) >= cutoff
        kept = t.filter(pa.array(m))
        return pa.table({"node_id": kept.column("node_id"),
                         "neighbour_id": kept.column("nbr_id"),
                         "similarity": kept.column("sim")})

    return state.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True), rounds
