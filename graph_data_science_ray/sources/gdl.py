"""Minimal GDL-style inline graph parser — the reference's tests define
fixture graphs as GDL strings (`@GdlGraph` / s1ck/gdl, SURVEY.md §2.1);
this loader accepts the common subset so fixture graphs can be written
the same way here:

    (a)-->(b), (b)-[:REL]->(c), (c)-[{weight: 2.5}]->(a), (d)

- nodes: ``(name)`` or ``(name:Label)`` — labels parsed and returned but
  not otherwise interpreted in v1
- relationships: ``-->``, ``-[:TYPE]->``, ``-[{weight: W}]->``,
  ``-[:TYPE {weight: W}]->``
- standalone node clauses register isolated nodes
- node names map to deterministic ids 0..n-1 in first-appearance order

Returns (edges_table, node_ids, node_labels). ``from_gdl`` wraps it into
a Ray Dataset.
"""

from __future__ import annotations

import re

import pyarrow as pa

_NODE_RE = re.compile(r"\(\s*([A-Za-z_]\w*)\s*(?::\s*([A-Za-z_]\w*(?:\s*:\s*\w+)*))?\s*\)")
_REL_RE = re.compile(
    r"-\s*(?:\[\s*(?::\s*(?P<type>[A-Za-z_]\w*))?\s*"
    r"(?:\{\s*weight\s*:\s*(?P<weight>-?\d+(?:\.\d+)?)\s*\})?\s*\])?\s*->"
)


class GdlParseError(ValueError):
    pass


def parse_gdl(text: str):
    """→ (edges: pa.Table(src_id, dst_id[, weight]),
         node_ids: dict[name, int], node_labels: dict[name, list[str]])."""
    node_ids: dict[str, int] = {}
    node_labels: dict[str, list[str]] = {}
    srcs: list[int] = []
    dsts: list[int] = []
    weights: list[float] = []
    any_weight = False

    def intern(name: str, labels: str | None) -> int:
        if name not in node_ids:
            node_ids[name] = len(node_ids)
            node_labels[name] = []
        if labels:
            for lab in re.split(r"\s*:\s*", labels):
                if lab and lab not in node_labels[name]:
                    node_labels[name].append(lab)
        return node_ids[name]

    for clause in text.split(","):
        clause = clause.strip()
        if not clause:
            continue
        pos = 0
        prev: int | None = None
        pending_weight: float | None = None
        while pos < len(clause):
            m = _NODE_RE.match(clause, pos)
            if m:
                nid = intern(m.group(1), m.group(2))
                if prev is not None:
                    srcs.append(prev)
                    dsts.append(nid)
                    weights.append(pending_weight if pending_weight is not None else 1.0)
                prev = nid
                pos = m.end()
                continue
            r = _REL_RE.match(clause, pos)
            if r:
                if prev is None:
                    raise GdlParseError(f"relationship before any node in: {clause!r}")
                pending_weight = float(r.group("weight")) if r.group("weight") else None
                if pending_weight is not None:
                    any_weight = True
                pos = r.end()
                continue
            raise GdlParseError(f"cannot parse at {clause[pos:]!r}")

    cols = {
        "src_id": pa.array(srcs, pa.int64()),
        "dst_id": pa.array(dsts, pa.int64()),
    }
    if any_weight:
        cols["weight"] = pa.array(weights, pa.float64())
    return pa.table(cols), node_ids, node_labels


def from_gdl(text: str):
    """GDL string → Ray Dataset of edges (plus the name→id map)."""
    import ray.data

    from graph_data_science_ray.context import configure_ray_data

    configure_ray_data()
    table, node_ids, node_labels = parse_gdl(text)
    return ray.data.from_arrow(table), node_ids, node_labels
