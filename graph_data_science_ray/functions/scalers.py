"""Property scalers — the reference's ``scaleProperties`` family
(MinMax, Mean, Log, L1Norm, L2Norm, StdScore, Center), as two-pass
Dataset transforms: one aggregate pass for the statistics (per-batch
partials + driver merge), one vectorized map pass to scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.algos.common import collect_arrow
from graph_data_science_ray.context import configure_ray_data

SCALERS = ("minmax", "mean", "log", "l1norm", "l2norm", "stdscore", "center")


def _global_stats(ds: Dataset, col: str) -> dict:
    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        if v.shape[0] == 0:
            return pa.table({k: pa.array([], pa.float64()) for k in
                             ("n", "s", "s2", "mn", "mx", "l1")})
        return pa.table(
            {
                "n": pa.array([float(v.shape[0])]),
                "s": pa.array([float(v.sum())]),
                "s2": pa.array([float((v * v).sum())]),
                "mn": pa.array([float(v.min())]),
                "mx": pa.array([float(v.max())]),
                "l1": pa.array([float(np.abs(v).sum())]),
            }
        )

    t = collect_arrow(ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    n = t.column("n").to_numpy().sum()
    s = t.column("s").to_numpy().sum()
    s2 = t.column("s2").to_numpy().sum()
    mean = s / n if n else 0.0
    var = max(0.0, s2 / n - mean * mean) if n else 0.0
    return {
        "n": n,
        "sum": s,
        "mean": mean,
        "std": var**0.5,
        "min": float(t.column("mn").to_numpy().min()) if n else 0.0,
        "max": float(t.column("mx").to_numpy().max()) if n else 0.0,
        "l1": float(t.column("l1").to_numpy().sum()),
        "l2": float(s2**0.5),
    }


def scale_property(ds: Dataset, col: str, scaler: str, out_col: str | None = None) -> Dataset:
    """GDS semantics: minmax → (x-min)/(max-min); mean → (x-mean)/(max-min);
    log → ln(x); l1norm → x/Σ|x|; l2norm → x/‖x‖₂; stdscore → (x-μ)/σ;
    center → x-μ. Degenerate denominators scale to 0 (GDS convention)."""
    configure_ray_data()
    scaler = scaler.lower()
    if scaler not in SCALERS:
        raise ValueError(f"unknown scaler {scaler}; choose from {SCALERS}")
    out_col = out_col or f"{col}_{scaler}"
    st = _global_stats(ds, col) if scaler != "log" else None
    st_ref = ray.put(st)

    def fn(t: pa.Table) -> pa.Table:
        s = ray.get(st_ref)
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        if scaler == "log":
            out = np.log(v)
        elif scaler == "minmax":
            d = s["max"] - s["min"]
            out = (v - s["min"]) / d if d else np.zeros_like(v)
        elif scaler == "mean":
            d = s["max"] - s["min"]
            out = (v - s["mean"]) / d if d else np.zeros_like(v)
        elif scaler == "l1norm":
            out = v / s["l1"] if s["l1"] else np.zeros_like(v)
        elif scaler == "l2norm":
            out = v / s["l2"] if s["l2"] else np.zeros_like(v)
        elif scaler == "stdscore":
            out = (v - s["mean"]) / s["std"] if s["std"] else np.zeros_like(v)
        else:  # center
            out = v - s["mean"]
        return t.append_column(out_col, pa.array(out, pa.float64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def scale_values(v: np.ndarray, scaler: str) -> np.ndarray:
    """The same GDS scaler formulas over an in-memory float64 vector —
    the post-processing hook algorithms expose as their ``scaler``
    config (e.g. PageRank's [GDS-pub: algo scaler option])."""
    scaler = scaler.lower()
    if scaler not in SCALERS:
        raise ValueError(f"unknown scaler {scaler}; choose from {SCALERS}")
    v = v.astype(np.float64)
    if scaler == "log":
        return np.log(v)
    if scaler == "minmax":
        d = v.max() - v.min()
        return (v - v.min()) / d if d else np.zeros_like(v)
    if scaler == "mean":
        d = v.max() - v.min()
        return (v - v.mean()) / d if d else np.zeros_like(v)
    if scaler == "l1norm":
        s = np.abs(v).sum()
        return v / s if s else np.zeros_like(v)
    if scaler == "l2norm":
        s = np.linalg.norm(v)
        return v / s if s else np.zeros_like(v)
    if scaler == "stdscore":
        s = v.std()
        return (v - v.mean()) / s if s else np.zeros_like(v)
    return v - v.mean()  # center
