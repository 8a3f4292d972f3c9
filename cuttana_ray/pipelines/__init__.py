from cuttana_ray.pipelines.betweenness import betweenness
from cuttana_ray.pipelines.bfs import (
    bfs_distances,
    closeness,
    eccentricity,
    harmonic_centrality,
)
from cuttana_ray.pipelines.components import connected_components
from cuttana_ray.pipelines.mis import mis_rounds
from cuttana_ray.pipelines.graph import (
    Graph,
    build_graph_from_events,
    build_graph_from_transcripts,
    directed_edges_from_events,
    graph_adjacency,
)
from cuttana_ray.pipelines.hits import HitsResult, hits
from cuttana_ray.pipelines.kcore import coreness, kcore
from cuttana_ray.pipelines.labelprop import label_propagation
from cuttana_ray.pipelines.linkpred import common_neighbor_pairs
from cuttana_ray.pipelines.pagerank import IterativeResult, pagerank
from cuttana_ray.pipelines.randomwalk import random_walks
from cuttana_ray.pipelines.scc import strongly_connected_components
from cuttana_ray.pipelines.sssp import shortest_paths
from cuttana_ray.pipelines.triangles import TriangleResult, triangle_count

__all__ = [
    "Graph",
    "HitsResult",
    "IterativeResult",
    "TriangleResult",
    "betweenness",
    "bfs_distances",
    "closeness",
    "build_graph_from_events",
    "build_graph_from_transcripts",
    "common_neighbor_pairs",
    "connected_components",
    "harmonic_centrality",
    "mis_rounds",
    "coreness",
    "directed_edges_from_events",
    "eccentricity",
    "graph_adjacency",
    "hits",
    "kcore",
    "label_propagation",
    "pagerank",
    "random_walks",
    "shortest_paths",
    "strongly_connected_components",
    "triangle_count",
]
