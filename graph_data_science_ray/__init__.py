"""graph_data_science_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch rewrite (NOT a port) of the capabilities of the reference
``chrisbloecker/graph-data-science`` (a fork of Neo4j GDS; the reference
checkout at /root/reference is empty — see SURVEY.md §0 for the provenance
policy): PageRank (power iteration, damping 0.85, GDS score convention),
weakly-connected components (iterative min-label hash shuffle), label
propagation (synchronous, min-label tie break) and node-wise triangle
counting — expressed over ``ray.data.Dataset`` pipelines of Arrow blocks.

Input data model (BASELINE.json input_hint): a Parquet table of
Common-Crawl-style web pages ``(url, warc_ts, html, text, lang)``; a
stateful actor-pool stage extracts text + links per page (byte-identical,
deterministic), a deduped ``(src_id, dst_id)`` edge table is materialized,
and every algorithm iteration is a batch transform + ``groupby`` aggregate
under the streaming executor.

Nothing in this package calls ``ray.init``/``ray.shutdown`` — session
ownership belongs to entry points (bench.py, CLI, test fixture, driver).
"""

from graph_data_science_ray.context import configure_ray_data
from graph_data_science_ray.algos.pagerank import pagerank
from graph_data_science_ray.algos.wcc import wcc
from graph_data_science_ray.algos.labelprop import label_propagation
from graph_data_science_ray.algos.triangles import triangle_count, triangle_stream
from graph_data_science_ray.algos.degree import degree
from graph_data_science_ray.algos.betweenness import betweenness_centrality
from graph_data_science_ray.algos.community import conductance, modularity
from graph_data_science_ray.algos.fastrp import fastrp
from graph_data_science_ray.algos.graphsage import graphsage_embeddings, graphsage_train
from graph_data_science_ray.algos.hashgnn import hashgnn
from graph_data_science_ray.algos.kcore import core_decomposition
from graph_data_science_ray.algos.kmeans import kmeans
from graph_data_science_ray.algos.kcoloring import k1coloring
from graph_data_science_ray.algos.leiden import leiden
from graph_data_science_ray.algos.louvain import louvain
from graph_data_science_ray.algos.msbfs import (
    all_shortest_paths,
    closeness_centrality,
    harmonic_centrality,
)
from graph_data_science_ray.algos.astar import a_star, haversine_heuristic
from graph_data_science_ray.algos.hdbscan import hdbscan
from graph_data_science_ray.algos.knn import filtered_knn_graph, knn_graph
from graph_data_science_ray.algos.mst import k_spanning_tree, minimum_spanning_forest
from graph_data_science_ray.algos.nodesim import node_similarity
from graph_data_science_ray.algos.louvain import modularity_optimization
from graph_data_science_ray.algos.paths import (
    bellman_ford,
    bfs_hops,
    delta_stepping,
    dijkstra_single_source,
    dijkstra_source_target,
)
from graph_data_science_ray.algos.randomwalk import random_walks, sample_rwr
from graph_data_science_ray.algos.scc import strongly_connected_components
from graph_data_science_ray.algos.sllpa import sllpa
from graph_data_science_ray.algos.celf import celf
from graph_data_science_ray.algos.steiner import steiner_tree
from graph_data_science_ray.algos.yens import yens_k_shortest_paths
from graph_data_science_ray.algos.toposort import topological_sort

__all__ = [
    "configure_ray_data",
    "pagerank",
    "wcc",
    "label_propagation",
    "triangle_count",
    "triangle_stream",
    "degree",
    "betweenness_centrality",
    "modularity",
    "conductance",
    "fastrp",
    "graphsage_embeddings",
    "graphsage_train",
    "hashgnn",
    "core_decomposition",
    "kmeans",
    "k1coloring",
    "leiden",
    "louvain",
    "closeness_centrality",
    "all_shortest_paths",
    "harmonic_centrality",
    "a_star",
    "haversine_heuristic",
    "filtered_knn_graph",
    "hdbscan",
    "knn_graph",
    "k_spanning_tree",
    "minimum_spanning_forest",
    "node_similarity",
    "bellman_ford",
    "bfs_hops",
    "delta_stepping",
    "dijkstra_single_source",
    "dijkstra_source_target",
    "modularity_optimization",
    "random_walks",
    "sample_rwr",
    "strongly_connected_components",
    "sllpa",
    "celf",
    "steiner_tree",
    "yens_k_shortest_paths",
    "topological_sort",
]

__version__ = "0.1.0"
