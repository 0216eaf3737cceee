"""In-repo correctness oracles (FIXTURES.md §3) — pure numpy/python.

These are the behavioral specification the Ray pipelines are tested
against. They implement the *reference's* documented semantics (Neo4j GDS
conventions, from public docs — SURVEY.md §2.9), not an optimized engine.

- PageRank: GDS convention p(v) = (1-d) + d * Σ_u∈in(v) p(u) * w(u,v)/W_out(u).
  Scores are NOT a probability distribution (isolated node → 1-d = 0.15);
  dangling mass is NOT redistributed. Equals networkx.pagerank * N on
  graphs without dangling nodes (numerically verified, SURVEY.md §0).
- WCC: connected components of the undirected view; canonical component
  id = min node_id in the component.
- Label propagation: synchronous pull-based update, adopt the neighbor
  label with the maximum total incident weight, ties broken by MIN label
  (deterministic; documented deviation from the reference's
  order-dependent tie behavior — partition-level equality is the
  contract, SURVEY.md §7 hard part (c)).
- Triangles: per-node triangle count on the undirected simple view,
  self-loops excluded; global = Σ/3.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np


def _index_nodes(edges: list[tuple]) -> tuple[dict, list]:
    nodes = sorted({u for e in edges for u in (e[0], e[1])})
    return {u: i for i, u in enumerate(nodes)}, nodes


def pagerank_oracle(
    edges: list[tuple],
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-7,
    weighted: bool = False,
) -> dict[int, float]:
    """Dense GDS-convention power iteration. edges: (src, dst[, weight])."""
    idx, nodes = _index_nodes(edges)
    n = len(nodes)
    if n == 0:
        return {}
    out_w = np.zeros(n)
    for e in edges:
        w = float(e[2]) if weighted and len(e) > 2 else 1.0
        out_w[idx[e[0]]] += w
    r = np.ones(n)
    for _ in range(max_iter):
        contrib = np.zeros(n)
        for e in edges:
            w = float(e[2]) if weighted and len(e) > 2 else 1.0
            u, v = idx[e[0]], idx[e[1]]
            contrib[v] += r[u] * w / out_w[u]
        r_new = (1.0 - damping) + damping * contrib
        delta = np.abs(r_new - r).max()
        r = r_new
        if delta < tol:
            break
    return {nodes[i]: float(r[i]) for i in range(n)}


def wcc_oracle(edges: list[tuple]) -> dict[int, int]:
    """Union-find on the undirected view; component id = min member."""
    parent: dict[int, int] = {}

    def find(x):
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for e in edges:
        a, b = find(e[0]), find(e[1])
        if a != b:
            parent[max(a, b)] = min(a, b)
    comp_min: dict[int, int] = {}
    for u in list(parent):
        root = find(u)
        comp_min[root] = min(comp_min.get(root, u), u)
    return {u: comp_min[find(u)] for u in parent}


def lpa_oracle(
    edges: list[tuple], max_iter: int = 10, weighted: bool = False
) -> dict[int, int]:
    """Synchronous label propagation, min-label tie-break, undirected view."""
    adj: dict[int, dict[int, float]] = defaultdict(lambda: defaultdict(float))
    for e in edges:
        if e[0] == e[1]:
            continue
        if weighted:
            w = float(e[2]) if len(e) > 2 else 1.0
            adj[e[0]][e[1]] += w
            adj[e[1]][e[0]] += w
        else:
            # undirected SIMPLE view: parallel/reverse duplicates collapse
            adj[e[0]][e[1]] = 1.0
            adj[e[1]][e[0]] = 1.0
    labels = {u: u for u in adj}
    for _ in range(max_iter):
        new_labels = {}
        for u, nbrs in adj.items():
            votes: dict[int, float] = defaultdict(float)
            for v, w in nbrs.items():
                votes[labels[v]] += w
            best = min(votes, key=lambda l: (-votes[l], l))
            new_labels[u] = best
        if new_labels == labels:
            break
        labels = new_labels
    return labels


def triangles_oracle(edges: list[tuple]) -> dict[int, int]:
    """Per-node triangle counts, undirected simple view, self-loops dropped."""
    adj: dict[int, set] = defaultdict(set)
    for e in edges:
        if e[0] == e[1]:
            continue
        adj[e[0]].add(e[1])
        adj[e[1]].add(e[0])
    counts = {u: 0 for u in adj}
    for u, nbrs in adj.items():
        for v in nbrs:
            if v <= u:
                continue
            common = nbrs & adj[v]
            for w in common:
                if w > v:
                    counts[u] += 1
                    counts[v] += 1
                    counts[w] += 1
    return counts


def partitions_equal(a: dict[int, int], b: dict[int, int]) -> bool:
    """Compare two labelings as partitions (label values may differ)."""
    if set(a) != set(b):
        return False
    grp_a: dict[int, set] = defaultdict(set)
    grp_b: dict[int, set] = defaultdict(set)
    for k, v in a.items():
        grp_a[v].add(k)
    for k, v in b.items():
        grp_b[v].add(k)
    return sorted(map(frozenset, grp_a.values())) == sorted(map(frozenset, grp_b.values()))
