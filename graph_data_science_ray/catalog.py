"""Graph catalog — the engine's equivalent of GDS's in-memory
GraphStoreCatalog (``gds.graph.project`` / ``.list`` / ``.drop`` /
``.export``; SURVEY.md §1.1).

A catalog entry binds a name to an edge Dataset (optionally materialized)
plus projection metadata; algorithms run against entries. Single-process
registry — at cluster scale the entry's payload is the bucketed parquet
layout on shared storage, so the catalog is just names + paths +
fingerprints (cheap to reconstruct, no distributed state).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from ray.data import Dataset


@dataclass
class GraphEntry:
    name: str
    edges: Dataset
    orientation: str = "natural"          # natural | reverse | undirected
    aggregation: str = "single"           # GDS Aggregation at projection
    weighted: bool = False
    created_at: float = field(default_factory=time.time)
    node_count: int | None = None
    edge_count: int | None = None

    def counts(self) -> tuple[int, int]:
        if self.edge_count is None:
            self.edge_count = self.edges.count()
        if self.node_count is None:
            from graph_data_science_ray.algos.common import unique_node_ids

            self.node_count = int(unique_node_ids(self.edges).shape[0])
        return self.node_count, self.edge_count


class GraphCatalog:
    def __init__(self) -> None:
        self._graphs: dict[str, GraphEntry] = {}

    def project(
        self,
        name: str,
        edges: Dataset,
        orientation: str = "natural",
        aggregation: str = "single",
        weighted: bool = False,
        materialize: bool = True,
    ) -> GraphEntry:
        """Project an edge Dataset into the catalog (immutable snapshot —
        materialized so later mutation of the source doesn't leak in,
        mirroring the reference's project-once semantics)."""
        if name in self._graphs:
            raise ValueError(f"graph '{name}' already exists")
        from graph_data_science_ray.sources.edges import dedup_edges, reverse, symmetrize

        ds = edges
        if aggregation != "none":
            ds = dedup_edges(ds, aggregation)
        if orientation == "reverse":
            ds = reverse(ds)
        elif orientation == "undirected":
            ds = symmetrize(ds, dedup=not weighted)
        if materialize:
            ds = ds.materialize()
        entry = GraphEntry(name, ds, orientation, aggregation, weighted)
        self._graphs[name] = entry
        return entry

    def filter(
        self,
        name: str,
        from_name: str,
        node_filter=None,
        nodes=None,
        relationship_filter=None,
        strategy: str = "auto",
        materialize: bool = True,
    ) -> GraphEntry:
        """``gds.graph.filter`` — project a filtered subgraph of an
        existing entry under a new name (sources/edges.filter_graph for
        the predicate semantics and the broadcast/semijoin strategy)."""
        if name in self._graphs:
            raise ValueError(f"graph '{name}' already exists")
        src = self.get(from_name)
        from graph_data_science_ray.sources.edges import filter_graph

        ds = filter_graph(
            src.edges, node_filter=node_filter, nodes=nodes,
            relationship_filter=relationship_filter, strategy=strategy)
        if materialize:
            ds = ds.materialize()
        entry = GraphEntry(name, ds, src.orientation, src.aggregation, src.weighted)
        self._graphs[name] = entry
        return entry

    def get(self, name: str) -> GraphEntry:
        try:
            return self._graphs[name]
        except KeyError:
            raise KeyError(f"graph '{name}' not in catalog; have {sorted(self._graphs)}") from None

    def list(self) -> list[dict]:
        return [
            {
                "name": e.name,
                "orientation": e.orientation,
                "aggregation": e.aggregation,
                "weighted": e.weighted,
                "created_at": e.created_at,
            }
            for e in self._graphs.values()
        ]

    def drop(self, name: str) -> None:
        self._graphs.pop(name, None)

    def export(self, name: str, path: str) -> str:
        self.get(name).edges.write_parquet(path)
        return path

    def export_csv(self, name: str, path: str) -> str:
        """``gds.beta.graph.export.csv`` parity [GDS-pub: io/csv]: dump
        the projected edge table as partitioned CSV (one file per block,
        resumable layout like the parquet export)."""
        self.get(name).edges.write_csv(path)
        return path


# module-level default catalog (the per-user catalog of the reference)
default_catalog = GraphCatalog()
