from cuttana_ray.pipelines.components import connected_components
from cuttana_ray.pipelines.graph import (
    Graph,
    build_graph_from_events,
    build_graph_from_transcripts,
    graph_adjacency,
)
from cuttana_ray.pipelines.labelprop import label_propagation
from cuttana_ray.pipelines.pagerank import IterativeResult, pagerank
from cuttana_ray.pipelines.triangles import TriangleResult, triangle_count

__all__ = [
    "Graph",
    "IterativeResult",
    "TriangleResult",
    "build_graph_from_events",
    "build_graph_from_transcripts",
    "connected_components",
    "graph_adjacency",
    "label_propagation",
    "pagerank",
    "triangle_count",
]
