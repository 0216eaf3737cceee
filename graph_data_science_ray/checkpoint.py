"""Per-iteration, per-partition checkpoints with lineage manifests.

North-rule requirement (BASELINE.json): every iteration checkpoints
per-partition node state with lineage metadata so a killed job resumes
from the last complete iteration and produces bit-identical results.

Layout::

    <dir>/
      iter_00003/part-00000.parquet   # node state rows for bucket 0
      iter_00003/part-00001.parquet
      manifest_00003.json             # written AFTER all parts land

Commit protocol: parts are written into the iteration directory, then the
manifest is written to a temp file and atomically renamed — a manifest's
existence certifies the whole iteration. Resume = max(iter) with a
manifest whose config_hash matches. The same layout is produced by the
driver (dataflow path, node state is driver-resident) and by the CSR
shard actors (each actor writes its own partition file — SURVEY.md §4.3).
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from graph_data_science_ray.stages.ids import bucket_of

_MANIFEST_RE = re.compile(r"manifest_(\d{5})\.json$")


def config_hash(config: dict[str, Any]) -> str:
    return hashlib.sha256(json.dumps(config, sort_keys=True).encode()).hexdigest()[:16]


@dataclass
class CheckpointManager:
    dir: str
    config: dict[str, Any]
    num_partitions: int = 8
    value_name: str = "value"
    _hash: str = field(init=False)

    def __post_init__(self) -> None:
        self._hash = config_hash(self.config)
        os.makedirs(self.dir, exist_ok=True)

    # -- write -----------------------------------------------------------
    def write_iteration(
        self, iteration: int, node_ids: np.ndarray, values: np.ndarray, metrics: dict[str, Any]
    ) -> None:
        it_dir = os.path.join(self.dir, f"iter_{iteration:05d}")
        os.makedirs(it_dir, exist_ok=True)
        buckets = bucket_of(node_ids, self.num_partitions)
        parts = []
        for b in range(self.num_partitions):
            mask = buckets == b
            t = pa.table(
                {
                    "node_id": pa.array(node_ids[mask], pa.int64()),
                    self.value_name: pa.array(values[mask]),
                }
            )
            path = os.path.join(it_dir, f"part-{b:05d}.parquet")
            pq.write_table(t, path)
            parts.append({"bucket": b, "file": f"iter_{iteration:05d}/part-{b:05d}.parquet", "rows": t.num_rows})
        self.commit_manifest(iteration, parts, metrics)

    def commit_manifest(self, iteration: int, parts: list[dict], metrics: dict[str, Any]) -> None:
        manifest = {
            "iteration": iteration,
            "config_hash": self._hash,
            "config": self.config,
            "num_partitions": self.num_partitions,
            "value_name": self.value_name,
            "parts": parts,
            "metrics": metrics,
        }
        tmp = os.path.join(self.dir, f".manifest_{iteration:05d}.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.dir, f"manifest_{iteration:05d}.json"))

    def part_path(self, iteration: int, bucket: int) -> str:
        it_dir = os.path.join(self.dir, f"iter_{iteration:05d}")
        os.makedirs(it_dir, exist_ok=True)
        return os.path.join(it_dir, f"part-{bucket:05d}.parquet")

    # -- resume ----------------------------------------------------------
    def latest_meta(self) -> dict[str, Any] | None:
        """Manifest dict of the newest complete iteration with a matching
        config hash, WITHOUT loading any state partitions — resume can
        then be per-partition (each CSR shard reads only its own part)."""
        best = None
        for name in os.listdir(self.dir):
            m = _MANIFEST_RE.match(name)
            if not m:
                continue
            with open(os.path.join(self.dir, name)) as f:
                manifest = json.load(f)
            if manifest.get("config_hash") != self._hash:
                continue
            if best is None or manifest["iteration"] > best["iteration"]:
                best = manifest
        return best

    def latest(self) -> tuple[int, np.ndarray, np.ndarray, dict[str, Any]] | None:
        """(iteration, node_ids, values, metrics) of the newest complete
        iteration with a matching config hash, else None."""
        best = None
        for name in os.listdir(self.dir):
            m = _MANIFEST_RE.match(name)
            if not m:
                continue
            with open(os.path.join(self.dir, name)) as f:
                manifest = json.load(f)
            if manifest.get("config_hash") != self._hash:
                continue
            if best is None or manifest["iteration"] > best["iteration"]:
                best = manifest
        if best is None:
            return None
        tables = []
        for part in best["parts"]:
            tables.append(pq.read_table(os.path.join(self.dir, part["file"])))
        t = pa.concat_tables(tables)
        ids = t.column("node_id").to_numpy(zero_copy_only=False)
        vals = t.column(best.get("value_name", self.value_name)).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        return best["iteration"], ids[order], vals[order], best.get("metrics", {})
