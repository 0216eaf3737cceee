"""Estimate-gate parity for the round-4 2-D shard-state shapes.

The r4 sharded migrations gave betweenness (n,k) dist/sigma/delta
matrices, SLLPA an (n,T+1) label memory and CELF (n,R) comp/gain
matrices per shard; the estimate gate (pipelines/modes.estimate) must
reflect those shapes like it does the CSR arrays (round-4 verdict ask
#7).  Each case allocates the real shard-side state on a live engine
and compares ``mem_report()``'s measured state bytes against
``estimate()``'s state term — required within 10%.
"""

import numpy as np
import ray

from graph_data_science_ray import fixtures
from graph_data_science_ray.pipelines.modes import estimate
from graph_data_science_ray.state.engine import CsrEngine

P = 3
K = 64  # betweenness source_batch


def _measured_state(eng) -> int:
    reps = ray.get([s.mem_report.remote() for s in eng.shards])
    return sum(r["state_total_bytes"] for r in reps)


def _reset(eng) -> None:
    ray.get([s.state_release.remote() for s in eng.shards])


def test_estimate_r4_state_shapes():
    # closures (not module-level defs) so Ray ships them by value —
    # worker processes cannot import the test module by name
    def _init2d(ids):
        return np.zeros((ids.shape[0], K))

    def _aux2d(ids):
        return np.zeros((ids.shape[0], K))

    from ray.data import from_arrow

    eng = CsrEngine.build(from_arrow(fixtures.powerlaw(1500, seed=11)), num_shards=P)
    try:
        reps = ray.get([s.mem_report.remote() for s in eng.shards])
        n_nodes = sum(r["owned_nodes"] for r in reps)
        n_edges = sum(r["edges"] for r in reps)

        # --- CELF: (n,R) int64 comp + (n,R) float64 gain + n bool chosen
        R = 32
        _reset(eng)
        ray.get([s.celf_init.remote(R) for s in eng.shards])
        est = estimate(n_nodes, n_edges, algorithm="celf", num_shards=P,
                       simulations=R)
        meas = _measured_state(eng)
        assert meas > 0 and abs(est["state_bytes"] - meas) <= 0.1 * meas

        # --- SLLPA: (n,T+1) int64 label memory (lives in self.state)
        T = 20
        _reset(eng)
        ray.get([s.sllpa_init.remote(T) for s in eng.shards])
        est = estimate(n_nodes, n_edges, algorithm="sllpa", num_shards=P,
                       max_iterations=T)
        meas = _measured_state(eng)
        assert meas > 0 and abs(est["state_bytes"] - meas) <= 0.1 * meas

        # --- betweenness: (n,k) state + dist/sigma/delta aux + n-sized Σδ
        _reset(eng)
        aux = {"dist": _aux2d, "sigma": _aux2d, "delta": _aux2d}
        ray.get([s.pregel_init.remote(_init2d, aux, True) for s in eng.shards])
        ray.get([s.acc_add_rowsum.remote("delta", 0.5) for s in eng.shards])
        est = estimate(n_nodes, n_edges, algorithm="betweenness", num_shards=P,
                       source_batch=K)
        meas = _measured_state(eng)
        assert meas > 0 and abs(est["state_bytes"] - meas) <= 0.1 * meas

        # sanity: the CSR-array term tracks the measured arrays too
        csr_meas = sum(r["total_bytes"] for r in reps)
        base = estimate(n_nodes, n_edges, num_shards=P)
        assert abs(base["total_bytes"] - csr_meas) <= 0.25 * csr_meas
    finally:
        eng.shutdown()
