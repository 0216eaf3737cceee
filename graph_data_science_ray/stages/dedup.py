"""Deduplication operators for training-data pipelines.

- exact_dedup: hash-partitioned groupby, keep the min-id row per key.
- MinHash + LSH near-dup: shingle → minhash signature → banded bucket
  groupby → candidate pairs → Jaccard verify → duplicate CLUSTERS via the
  engine's own WCC over the candidate-pair edge table (the near-dup graph
  is just another graph).
- SimHash: 64-bit signature, banded into 4×16-bit tables for candidate
  generation.
- n-gram Jaccard: the verify kernel, exposed standalone.

Shingle/minhash computation is vectorized numpy over mix64
(splitmix64-finalizer) shingle hashes — deterministic across processes
(Python's builtin hash() is salted and MUST NOT be used here) and
bit-exactly SQL-expressible, which is what gives minhash_candidates
and simhash_signatures their DuckDB oracles (crc32, the previous sketch
hash, has no DuckDB 1.0 equivalent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Min

from graph_data_science_ray.context import configure_ray_data, shuffle_partitions_for
from graph_data_science_ray.functions.joins import _mix64


def _perm_salts(num_perm: int, seed: int = 42) -> np.ndarray:
    """Per-permutation 64-bit salts; perm_i(x) = mix64(x ^ salt_i)."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 64, size=num_perm, dtype=np.uint64)


def _codes(text: str) -> np.ndarray:
    """Lowercased text → uint64 codepoint array (ASCII fast path)."""
    t = (text or "").lower()
    b = t.encode("utf-8")
    if len(b) == len(t):
        return np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    return np.fromiter(map(ord, t), dtype=np.uint64, count=len(t))


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct hashes of the k-char shingles of the lowercased text:
    a mix64 fold over the window's codepoints (h ← mix64(h ⊕ c), h₀=0),
    vectorized ACROSS windows (k passes over the code array, no per-
    shingle Python loop). The whole text is the single shingle when
    shorter than k. The __ray_entry__ minhash oracle mirrors this fold
    bit-for-bit with chained _sql_mix64 steps."""
    c = _codes(text)
    n = c.shape[0]
    if n < k:
        h = np.zeros(1, dtype=np.uint64)
        for j in range(n):
            h = _mix64(h ^ c[j : j + 1])
        return h
    m = n - k + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        h = _mix64(h ^ c[j : j + m])
    return np.unique(h)


def minhash_signature(text: str, salts: np.ndarray, k: int = 5) -> np.ndarray:
    sh = shingle_hashes(text, k)
    # mix64(x ^ salt_i), min over shingles, per permutation — one outer product
    vals = _mix64(sh[:, None] ^ salts[None, :])
    return vals.min(axis=0)


def minhash_signatures_batch(
    texts: pa.Array | pa.ChunkedArray, salts: np.ndarray, k: int = 5
) -> np.ndarray:
    """(n × num_perm) MinHash signatures for a whole Arrow string column,
    vectorized ACROSS documents — no per-document Python loop on the
    ASCII fast path (the overwhelming majority of a web corpus).

    All ASCII docs are processed as ONE concatenated byte array: the
    k-pass mix64 window fold runs over every global window once, a
    ragged-arange gather selects the windows that stay inside a single
    document, and per-permutation minima come from np.minimum.reduceat
    over the per-doc segments. Duplicate shingles need no dedup — min is
    idempotent — so the result is bit-identical to per-doc
    ``minhash_signature`` (which uniquifies first). Non-ASCII or
    shorter-than-k docs fall back to the scalar kernel."""
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    num_perm = salts.shape[0]
    sigs = np.empty((n, num_perm), dtype=np.uint64)
    if n == 0:
        return sigs
    lower = pc.utf8_lower(pc.fill_null(texts, ""))
    if isinstance(lower, pa.ChunkedArray):
        lower = lower.combine_chunks()
    off_dtype = np.int64 if pa.types.is_large_string(lower.type) else np.int32
    offs = np.frombuffer(lower.buffers()[1], dtype=off_dtype)[
        lower.offset : lower.offset + n + 1
    ].astype(np.int64)
    dbuf = lower.buffers()[2]
    data = np.frombuffer(dbuf, dtype=np.uint8) if dbuf is not None else np.empty(0, np.uint8)
    byte_lens = np.diff(offs)
    cp_lens = pc.utf8_length(lower).to_numpy(zero_copy_only=False).astype(np.int64)
    fast = (byte_lens == cp_lens) & (byte_lens >= k)  # pure-ASCII, full windows
    slow_idx = np.nonzero(~fast)[0]
    for i in slow_idx:  # rare: non-ASCII or shorter-than-k docs
        sigs[i] = minhash_signature(str(lower[i]), salts, k)
    fidx = np.nonzero(fast)[0]
    if fidx.size == 0:
        return sigs
    # the Arrow data buffer is already the concatenation of all docs —
    # fold over it contiguously (5 strided passes, no gather, no copy per
    # doc), then pick the window positions that belong to fast docs
    blob = data[offs[0] : offs[-1]].astype(np.uint64)
    base = offs[0]
    total_b = blob.shape[0]
    if total_b < k:
        for i in fidx:
            sigs[i] = minhash_signature(str(lower[i]), salts, k)
        return sigs
    M = total_b - k + 1
    hg = np.zeros(M, dtype=np.uint64)
    for j in range(k):
        hg = _mix64(hg ^ blob[j : j + M])
    m = byte_lens[fidx] - k + 1  # windows per fast doc
    total = int(m.sum())
    # ragged arange: global window-start index of every valid window
    starts = np.repeat(offs[fidx] - base, m) + (
        np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
    )
    h = hg[starts]
    seg_starts = np.concatenate([[0], np.cumsum(m)])[:-1]
    # cache-blocked salt-min: process docs in blocks whose (windows × perms)
    # 2D outer product stays L2-resident — a single global per-perm pass
    # streams ~6 temporaries of the full window array per mix64 and is
    # memory-bandwidth-bound (measured 4× slower than this)
    target = max(1, 1024 // max(1, int(m.mean())))
    for b0 in range(0, fidx.size, target):
        b1 = min(b0 + target, fidx.size)
        lo, hi = seg_starts[b0], seg_starts[b1 - 1] + m[b1 - 1]
        vals = _mix64(h[lo:hi, None] ^ salts[None, :])
        sigs[fidx[b0:b1]] = np.minimum.reduceat(vals, seg_starts[b0:b1] - lo, axis=0)
    return sigs


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa, sb = set(shingle_hashes(text_a, k).tolist()), set(shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def exact_dedup(
    ds: Dataset,
    key_cols: list[str],
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> Dataset:
    """One row per distinct key: (key_cols..., <id_col> = min id, n_dups).
    hash-partition + per-group-first, ties by min id (deterministic)."""
    configure_ray_data()
    num_partitions = num_partitions or shuffle_partitions_for()
    return ds.select_columns(key_cols + [id_col]).groupby(
        key_cols, num_partitions=num_partitions
    ).aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n_dups"))


class MinHashStage:
    """map_batches actor: (id, text) → (id, band_id, band_hash) rows,
    ``bands`` rows per document. Permutation params built once per actor."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 num_perm: int = 64, bands: int = 16, shingle_k: int = 5, seed: int = 42):
        assert num_perm % bands == 0
        self.id_col, self.text_col = id_col, text_col
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.rows_per_band = num_perm // bands
        self.salts = _perm_salts(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        n = batch.num_rows
        out_id = np.repeat(ids, self.bands)
        out_band = np.tile(np.arange(self.bands, dtype=np.int64), n)
        sigs = minhash_signatures_batch(batch.column(self.text_col), self.salts, self.k)
        # band hash = mix64 fold over the band's signature values
        # (h ← mix64(h ⊕ v), h₀=0) — vectorized across all docs × bands
        s = sigs.reshape(n * self.bands, self.rows_per_band)
        h = np.zeros(n * self.bands, dtype=np.uint64)
        for r in range(self.rows_per_band):
            h = _mix64(h ^ s[:, r])
        out_hash = h.view(np.int64)
        return pa.table(
            {
                self.id_col: pa.array(out_id),
                "band_id": pa.array(out_band),
                "band_hash": pa.array(out_hash),
            }
        )


def minhash_candidates(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    num_partitions: int | None = None,
) -> Dataset:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash-LSH:
    shingle → minhash → (band, hash) explode → bucket groupby → in-bucket
    pairing against the bucket minimum (star pairing keeps output linear
    in bucket size; transitive closure happens in the cluster step)."""
    configure_ray_data()
    num_partitions = num_partitions or shuffle_partitions_for()
    bands_ds = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, num_perm=num_perm, bands=bands, shingle_k=shingle_k
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    grouped = bands_ds.groupby(["band_id", "band_hash"], num_partitions=num_partitions)

    def pairs(g: pa.Table) -> pa.Table:
        ids = np.unique(g.column(id_col).to_numpy(zero_copy_only=False))
        if ids.shape[0] < 2:
            return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        lo = ids[0]
        return pa.table(
            {"id_a": pa.array(np.full(ids.shape[0] - 1, lo)), "id_b": pa.array(ids[1:])}
        )

    cand = grouped.map_groups(pairs, batch_format="pyarrow")
    # distinct pairs
    return cand.groupby(["id_a", "id_b"], num_partitions=num_partitions).aggregate(
        Count(alias_name="_n")
    ).drop_columns(["_n"])


def minhash_dedup_clusters(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    num_partitions: int | None = None,
) -> Dataset:
    """(id, cluster_id) for near-duplicate groups — fully distributed,
    nothing corpus-sized ever lands on the driver:

        LSH candidates → texts attached to pairs via two partitioned
        hash joins (the ngram_jaccard pattern) → per-batch vectorized
        Jaccard verify over true shingle-hash sets → connected
        components via ``wcc_star`` (all state stays in the edge list)
        → cluster assignment via a left-outer hash join back onto the
        corpus ids (no-dup docs map to their own id).

    The round-1 version broadcast the whole corpus text as a driver
    dict and the WCC labels as another — a 100-TB scale-killer; this
    shape shuffles texts only for candidate pairs (LSH output, linear
    in corpus size) and never materializes global state."""
    from graph_data_science_ray.algos.wcc import wcc_star
    from graph_data_science_ray.functions.joins import hash_join

    configure_ray_data()
    num_partitions = num_partitions or shuffle_partitions_for()

    def _all_singletons() -> Dataset:
        def own(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).cast(pa.int64())
            return pa.table({id_col: ids, "cluster_id": ids})

        return ds.select_columns([id_col]).map_batches(
            own, batch_format="pyarrow", zero_copy_batch=True
        )

    cand = minhash_candidates(
        ds, id_col, text_col, num_perm, bands, shingle_k, num_partitions
    ).materialize()
    if cand.count() == 0:  # no LSH collisions at all — every doc is its own cluster
        return _all_singletons()

    docs = ds.select_columns([id_col, text_col])

    def _as(side: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({f"id_{side}": t.column(id_col).cast(pa.int64()),
                             f"text_{side}": t.column(text_col)})
        return fn

    ta = docs.map_batches(_as("a"), batch_format="pyarrow", zero_copy_batch=True)
    tb = docs.map_batches(_as("b"), batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(cand, ta, on=("id_a",), num_partitions=num_partitions)
    j = hash_join(j, tb, on=("id_b",), num_partitions=num_partitions)

    thr = float(jaccard_threshold)

    def verify(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({"src_id": pa.array([], pa.int64()),
                             "dst_id": pa.array([], pa.int64())})
        a_ids = t.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b_ids = t.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
        a_txt = t.column("text_a").to_pylist()
        b_txt = t.column("text_b").to_pylist()
        # shingle sets computed once per distinct doc in the batch
        # (sorted-unique arrays from shingle_hashes → C-speed intersect)
        cache: dict[int, np.ndarray] = {}
        for ids_, txts_ in ((a_ids, a_txt), (b_ids, b_txt)):
            for i, txt in zip(ids_.tolist(), txts_):
                if i not in cache:
                    cache[i] = shingle_hashes(txt or "", shingle_k)
        # round-3 ask #7, measured engineering: two fully-vectorized
        # replacements for the per-pair loop were built and benched on
        # the real sf0.1 candidate set (23k pairs, ~234 shingles/doc) —
        # a global (pair, value) lexsort + adjacent-dup bincount ran
        # 0.06× and per-pair searchsorted 0.7× of the intersect1d loop;
        # per-pair C work at these shapes is memory-bound optimal. What
        # DOES win (1.9× measured, bitwise-identical keeps): an EXACT
        # size-bound prefilter — inter ≤ min(|A|,|B|) ⇒ jaccard ≤
        # min/max — prunes half the LSH false positives without touching
        # shingles, and an inline sort+count for survivors (intersect1d
        # allocates the intersection ARRAY; only the count is needed).
        sa_l = [cache[int(i)] for i in a_ids]
        sb_l = [cache[int(i)] for i in b_ids]
        la = np.fromiter((x.size for x in sa_l), np.int64, n)
        lb = np.fromiter((x.size for x in sb_l), np.int64, n)
        mn = np.minimum(la, lb)
        mx = np.maximum(la, lb)
        keep = mx == 0  # both empty: union 0 ⇒ duplicate by convention
        # conservative prune (1e-12 guard covers the ÷ vs bound rounding)
        possible = np.flatnonzero(
            (mx > 0) & (mn / np.maximum(mx, 1) >= thr - 1e-12)
        )
        for r in possible:
            c = np.concatenate((sa_l[r], sb_l[r]))
            c.sort()
            inter = int((c[1:] == c[:-1]).sum())
            union = la[r] + lb[r] - inter
            keep[r] = inter / union >= thr
        return pa.table({"src_id": pa.array(a_ids[keep], pa.int64()),
                         "dst_id": pa.array(b_ids[keep], pa.int64())})

    edges = j.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True).materialize()
    if edges.count() == 0:  # every candidate failed verify
        return _all_singletons()
    comp = wcc_star(edges, num_partitions=num_partitions)

    def _comp_proj(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t.column("node_id").cast(pa.int64()),
                         "cluster_id": t.column("component").cast(pa.int64())})

    compp = comp.map_batches(_comp_proj, batch_format="pyarrow", zero_copy_batch=True)
    joined = hash_join(
        ds.select_columns([id_col]), compp, on=(id_col,),
        join_type="left_outer", num_partitions=num_partitions,
    )

    def fill_own(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cl = t.column("cluster_id").to_numpy(zero_copy_only=False)
        cl = np.where(pa.compute.is_null(t.column("cluster_id")).to_numpy(
            zero_copy_only=False), ids, cl).astype(np.int64)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "cluster_id": pa.array(cl, pa.int64())})

    return joined.map_batches(fill_own, batch_format="pyarrow", zero_copy_batch=True)


def _fold_hashes(words: list[str]) -> np.ndarray:
    """64-bit hash per word: the same mix64-over-codepoints fold as
    shingle_hashes (h ← mix64(h ⊕ c), h₀=0), vectorized across words of
    equal length. SQL mirror: list_reduce over the codepoint list (the
    simhash_signatures oracle)."""
    n = len(words)
    out = np.empty(n, dtype=np.uint64)
    if not n:
        return out
    lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=n)
    for length in np.unique(lens):
        idx = np.nonzero(lens == length)[0]
        if length == 0:
            out[idx] = 0
            continue
        blob = "".join(words[i] for i in idx).encode("utf-8")
        if len(blob) == length * idx.size:  # ASCII fast path
            mat = np.frombuffer(blob, dtype=np.uint8).astype(np.uint64)
        else:
            mat = np.fromiter(
                (ord(ch) for i in idx for ch in words[i]),
                dtype=np.uint64,
                count=int(length * idx.size),
            )
        mat = mat.reshape(idx.size, int(length))
        h = np.zeros(idx.size, dtype=np.uint64)
        for j in range(int(length)):
            h = _mix64(h ^ mat[:, j])
        out[idx] = h
    return out


# \w over lowercased ASCII = [a-z0-9_] (plus the dead A-Z range for
# safety); bytes classified via a 256-entry lookup table
_WORD_BYTE = np.zeros(256, dtype=bool)
for _c in (b"abcdefghijklmnopqrstuvwxyz" b"ABCDEFGHIJKLMNOPQRSTUVWXYZ"
           b"0123456789_"):
    _WORD_BYTE[_c] = True


def simhash_batch(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """64-bit simhash per document, vectorized ACROSS documents on the
    ASCII fast path (bit-identical to the original per-doc kernel):

    tokenization is a byte-class mask over the column's concatenated
    UTF-8 buffer (token start = word-byte with a non-word predecessor,
    with forced starts at doc boundaries so runs never cross docs); the
    mix64 codepoint fold runs round-robin over position-within-token
    (cost O(total token bytes), active-set shrinking per round); the
    per-doc majority vote is one add.reduceat over the token×64 bit
    matrix. Non-ASCII docs fall back to the scalar path (re + Python
    str.lower, preserving Unicode \\w semantics exactly)."""
    import re

    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    sims = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return sims
    lower = pc.utf8_lower(pc.fill_null(texts, ""))
    if isinstance(lower, pa.ChunkedArray):
        lower = lower.combine_chunks()
    off_dtype = np.int64 if pa.types.is_large_string(lower.type) else np.int32
    offs = np.frombuffer(lower.buffers()[1], dtype=off_dtype)[
        lower.offset : lower.offset + n + 1
    ].astype(np.int64)
    dbuf = lower.buffers()[2]
    data = np.frombuffer(dbuf, dtype=np.uint8) if dbuf is not None else np.empty(0, np.uint8)
    byte_lens = np.diff(offs)
    cp_lens = pc.utf8_length(lower).to_numpy(zero_copy_only=False).astype(np.int64)
    fast = byte_lens == cp_lens  # pure-ASCII docs
    slow_idx = np.nonzero(~fast)[0]
    if slow_idx.size:
        word_re = re.compile(r"\w+")
        raw = pc.fill_null(texts, "")
        for i in slow_idx:
            toks = word_re.findall(str(raw[i]).lower())
            if not toks:
                continue
            h64 = _fold_hashes(toks)
            bits = ((h64[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            sims[i] = np.uint64(
                int("".join("1" if v > 0 else "0" for v in votes[::-1]), 2)
            )
    fidx = np.nonzero(fast)[0]
    if fidx.size == 0:
        return sims
    blob = data[offs[0] : offs[-1]]
    if blob.size == 0:
        # every fast-path doc is empty/null — no tokens, nothing to vote on
        return sims
    base = offs[0]
    word = _WORD_BYTE[blob]
    # mark non-fast doc spans as non-word so they produce no tokens here
    if slow_idx.size:
        span = np.zeros(blob.shape[0] + 1, dtype=np.int8)
        span[offs[slow_idx] - base] = 1
        span[offs[slow_idx + 1] - base] -= 1
        word &= np.cumsum(span[:-1]) == 0
    prev = np.empty_like(word)
    prev[0] = False
    prev[1:] = word[:-1]
    # force token breaks at every doc boundary
    bounds = offs[1:-1] - base
    prev[bounds[(bounds >= 0) & (bounds < prev.shape[0])]] = False
    starts_mask = word & ~prev
    tok_starts = np.nonzero(starts_mask)[0]
    n_tok = tok_starts.shape[0]
    if n_tok == 0:
        return sims
    # token end = next non-word position (runs never cross docs now);
    # compute via the run-length trick on the word mask
    is_end = np.empty_like(word)
    is_end[:-1] = word[:-1] & ~word[1:]
    is_end[-1] = word[-1]
    # doc boundaries also end tokens
    nb = bounds[(bounds > 0) & (bounds <= is_end.shape[0])]
    is_end[nb - 1] |= word[nb - 1]
    tok_ends = np.nonzero(is_end)[0]
    # pair starts with the first end >= start
    tok_ends = tok_ends[np.searchsorted(tok_ends, tok_starts)]
    tok_lens = tok_ends - tok_starts + 1
    # fold: h <- mix64(h ^ byte), round-robin over within-token position
    h = np.zeros(n_tok, dtype=np.uint64)
    alive = np.arange(n_tok)
    j = 0
    blob64 = blob.astype(np.uint64)
    while alive.size:
        h[alive] = _mix64(h[alive] ^ blob64[tok_starts[alive] + j])
        j += 1
        alive = alive[tok_lens[alive] > j]
    # doc of each token + per-doc majority vote over the 64 bit columns
    doc_of_tok = np.searchsorted(offs - base, tok_starts, "right") - 1
    # tokens are in blob order = doc order → reduceat segments
    seg_first = np.nonzero(np.r_[True, doc_of_tok[1:] != doc_of_tok[:-1]])[0]
    seg_docs = doc_of_tok[seg_first]
    # per-bit-plane vote: 64 reduceats over an n_tok int8 vector — no
    # n_tok×64 uint64 broadcast (that intermediate is 0.5 GB at 1M
    # tokens and dominates wall time)
    cnt = np.diff(np.r_[seg_first, n_tok]).astype(np.int64)
    acc = np.zeros(seg_first.shape[0], dtype=np.uint64)
    for b in range(64):
        bit = ((h >> np.uint64(b)) & np.uint64(1)).astype(np.int8)
        ones_b = np.add.reduceat(bit, seg_first, dtype=np.int64)
        acc |= (2 * ones_b - cnt > 0).astype(np.uint64) << np.uint64(b)
    sims[seg_docs] = acc
    return sims


class SimHashStage:
    """(id, text) → (id, simhash64, band0..band3) — 64-bit simhash over
    mix64-fold token hashes; 16-bit bands for candidate bucketing. Bit b
    of the signature = majority vote of bit b across all token
    occurrences (ties → 0). Batch-vectorized (simhash_batch)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        sims = simhash_batch(batch.column(self.text_col))
        cols = {self.id_col: ids, "simhash": pa.array(sims.view(np.int64))}
        for b in range(4):
            cols[f"band{b}"] = pa.array(
                ((sims >> np.uint64(16 * b)) & np.uint64(0xFFFF)).view(np.int64)
            )
        return pa.table(cols)


def simhash_signatures(ds: Dataset, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    return ds.map_batches(
        SimHashStage,
        fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


def ngram_jaccard_pairs(
    docs: Dataset,
    pairs: pa.Table,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> pa.Table:
    """Exact k-gram Jaccard for the given candidate pairs — the VERIFY
    stage after MinHash-LSH candidate generation (raw character grams,
    not crc32 sketches, so the result is collision-free and has an exact
    DuckDB twin).

    ``pairs``: in-memory (doc_a, doc_b) table (candidate batches are
    driver-sized by construction — LSH output per band bucket). Docs are
    pre-filtered to the pair membership via one broadcast set, so only
    needed documents explode; the intersection is two partitioned hash
    joins on (doc, gram) — gram rows never collect centrally. Returns
    (doc_a, doc_b, n_common, jaccard_ppm) sorted by (doc_a, doc_b);
    jaccard_ppm = (10^6 · |∩|) // |∪| in exact integer arithmetic.

    Gram convention (mirrors shingle_hashes): lowercased text, k-char
    windows over codepoints, whole text as the single gram when shorter
    than k, DISTINCT per document."""
    import ray

    from graph_data_science_ray.functions.joins import hash_join

    configure_ray_data()
    num_partitions = num_partitions or shuffle_partitions_for()
    a_ids = pairs.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
    b_ids = pairs.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
    need = np.unique(np.concatenate([a_ids, b_ids]))
    need_ref = ray.put(need)

    def explode(t: pa.Table) -> pa.Table:
        want = ray.get(need_ref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(want, ids)
        hit = (pos < want.shape[0]) & (want[np.minimum(pos, want.shape[0] - 1)] == ids)
        ids = ids[hit]
        texts = t.filter(pa.array(hit)).column(text_col).to_pylist()
        out_id, out_g = [], []
        for i, txt in zip(ids, texts):
            tl = (txt or "").lower()
            grams = {tl[j:j + k] for j in range(len(tl) - k + 1)} if len(tl) >= k else {tl}
            out_id.extend([i] * len(grams))
            out_g.extend(sorted(grams))
        return pa.table({"doc": pa.array(out_id, pa.int64()),
                         "gram": pa.array(out_g, pa.string())})

    import ray.data

    grams = docs.map_batches(explode, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()

    # per-doc gram counts (bounded by the pair membership) — driver merge
    from graph_data_science_ray.algos.common import collect_arrow, merge_sum

    cnt_part = collect_arrow(grams.map_batches(
        lambda t: pa.table({"doc": t.column("doc"),
                            "c": pa.array(np.ones(t.num_rows, np.int64), pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True))
    sizes = np.zeros(need.shape[0], dtype=np.int64)
    if cnt_part.num_rows:
        ids_, c_ = merge_sum(cnt_part, "doc", "c")
        sizes[np.searchsorted(need, ids_)] = c_.astype(np.int64)

    cand = ray.data.from_arrow(pa.table({"doc_a": pa.array(a_ids, pa.int64()),
                                         "doc_b": pa.array(b_ids, pa.int64())}))
    ga = grams.map_batches(
        lambda t: pa.table({"doc_a": t.column("doc"), "gram": t.column("gram")}),
        batch_format="pyarrow", zero_copy_batch=True)
    gb = grams.map_batches(
        lambda t: pa.table({"doc_b": t.column("doc"), "gram": t.column("gram")}),
        batch_format="pyarrow", zero_copy_batch=True)
    j1 = hash_join(cand, ga, on=("doc_a",), num_partitions=num_partitions)
    j2 = hash_join(j1, gb, on=("doc_b", "gram"), num_partitions=num_partitions)
    nn = np.int64(need.shape[0])

    def pack_pairs(t: pa.Table) -> pa.Table:
        # pack POSITIONS in the broadcast membership (dense, so the
        # int64 key never overflows regardless of raw id magnitude)
        w = ray.get(need_ref)
        ap = np.searchsorted(w, t.column("doc_a").to_numpy(zero_copy_only=False))
        bp = np.searchsorted(w, t.column("doc_b").to_numpy(zero_copy_only=False))
        return pa.table({"key": pa.array(ap * nn + bp, pa.int64()),
                         "c": pa.array(np.ones(t.num_rows, np.int64), pa.int64())})

    inter_part = collect_arrow(j2.map_batches(pack_pairs, batch_format="pyarrow",
                                              zero_copy_batch=True))

    inter = np.zeros(a_ids.shape[0], dtype=np.int64)
    pk = np.searchsorted(need, a_ids) * nn + np.searchsorted(need, b_ids)
    order = np.argsort(pk, kind="stable")
    if inter_part.num_rows:
        ik, ic = merge_sum(inter_part, "key", "c")
        pos = np.searchsorted(pk[order], ik)
        ok = (pos < pk.shape[0]) & (pk[order][np.minimum(pos, pk.shape[0] - 1)] == ik)
        inter[order[pos[ok]]] = ic[ok].astype(np.int64)

    na = sizes[np.searchsorted(need, a_ids)]
    nb = sizes[np.searchsorted(need, b_ids)]
    union = np.maximum(na + nb - inter, 1)
    ppm = (np.int64(1_000_000) * inter) // union
    out = np.lexsort((b_ids, a_ids))
    return pa.table({"doc_a": pa.array(a_ids[out], pa.int64()),
                     "doc_b": pa.array(b_ids[out], pa.int64()),
                     "n_common": pa.array(inter[out], pa.int64()),
                     "jaccard_ppm": pa.array(ppm[out], pa.int64())})
