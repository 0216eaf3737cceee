"""Property-based tests (hypothesis) for the pure-numpy kernels that sit
under every per-batch combiner. No Ray session needed — these run first
and fast. Reference semantics: numpy/pandas equivalents."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from graph_data_science_ray.algos.common import (
    community_postprocess,
    group_pairs,
    merge_min,
    merge_sum,
    unique_inverse,
)

int64s = st.integers(min_value=-(2**62), max_value=2**62)


@given(arrays(np.int64, st.integers(0, 200), elements=int64s))
@settings(max_examples=200, deadline=None)
def test_unique_inverse_matches_numpy(a):
    u, inv = unique_inverse(a)
    nu, ninv = np.unique(a, return_inverse=True)
    np.testing.assert_array_equal(u, nu)
    np.testing.assert_array_equal(inv, ninv.astype(np.int64))
    if a.size:
        np.testing.assert_array_equal(u[inv], a)


@given(
    arrays(np.int64, st.integers(0, 150), elements=st.integers(-50, 50)),
    st.integers(0, 149),
)
@settings(max_examples=150, deadline=None)
def test_group_pairs_matches_numpy(k1, split):
    k2 = np.roll(k1, split)  # correlated second key exercises ties
    order, u1, u2, gid = group_pairs(k1, k2)
    # groups sorted by (k1, k2), gid maps ordered rows to groups
    if k1.size:
        packed = sorted(set(zip(k1.tolist(), k2.tolist())))
        assert list(zip(u1.tolist(), u2.tolist())) == packed
        np.testing.assert_array_equal(u1[gid], k1[order])
        np.testing.assert_array_equal(u2[gid], k2[order])


@given(
    arrays(np.int64, st.integers(1, 120), elements=st.integers(-20, 20)),
    arrays(np.float64, st.integers(1, 120), elements=st.floats(-1e6, 1e6)),
)
@settings(max_examples=150, deadline=None)
def test_merge_sum_min_match_pandas(ids, vals):
    import pandas as pd

    n = min(ids.shape[0], vals.shape[0])
    ids, vals = ids[:n], vals[:n]
    t = pa.table({"k": pa.array(ids, pa.int64()), "v": pa.array(vals, pa.float64())})
    u, s = merge_sum(t, "k", "v")
    ref = pd.Series(vals).groupby(ids).sum()
    np.testing.assert_array_equal(u, ref.index.to_numpy())
    np.testing.assert_allclose(s, ref.to_numpy(), rtol=1e-12, atol=1e-9)
    u2, m = merge_min(t, "k", "v")
    refm = pd.Series(vals).groupby(ids).min()
    np.testing.assert_array_equal(u2, refm.index.to_numpy())
    np.testing.assert_allclose(m, refm.to_numpy())


@given(
    arrays(np.int64, st.integers(0, 100), elements=st.integers(0, 30)),
    st.integers(1, 6),
    st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_community_postprocess_invariants(comm, min_size, consecutive):
    node_ids = np.arange(comm.shape[0], dtype=np.int64) * 7 + 3
    out_ids, out_vals, mask = community_postprocess(
        node_ids, comm.copy(), consecutive_ids=consecutive, min_community_size=min_size
    )
    # filtering: survivors are exactly the nodes in big-enough communities
    sizes = {c: int((comm == c).sum()) for c in set(comm.tolist())}
    want_ids = [nid for nid, c in zip(node_ids.tolist(), comm.tolist())
                if min_size <= 1 or sizes[c] >= min_size]
    assert out_ids.tolist() == want_ids
    # the partition is preserved: same-community iff same output value
    kept_comm = [c for c in comm.tolist() if min_size <= 1 or sizes[c] >= min_size]
    pairs = set(zip(kept_comm, out_vals.tolist()))
    assert len(pairs) == len(set(kept_comm))
    assert len({p[1] for p in pairs}) == len(pairs)
    if consecutive and out_vals.size:
        assert sorted(set(out_vals.tolist())) == list(range(len(set(out_vals.tolist()))))
        # ascending original-id order preserved under renumbering
        order_orig = sorted(set(kept_comm))
        mapping = dict(pairs)
        assert [mapping[c] for c in order_orig] == list(range(len(order_orig)))
