"""Operator surface (SURVEY.md §2 inventory → Spark-first implementations)."""

from halvesting_geometric_spark.operators.components import connected_components
from halvesting_geometric_spark.operators.extract import (
    extract_conv_edges,
    ordered_turns,
)
from halvesting_geometric_spark.operators.graph import (
    PropertyGraph,
    build_graph,
    canonical_edges,
    in_degrees,
    out_degrees,
    undirected,
)
from halvesting_geometric_spark.operators.ids import (
    build_vertices,
    dense_ids_scalable,
    dense_ids_window,
    edges_to_ids,
)
from halvesting_geometric_spark.operators.labelprop import label_propagation
from halvesting_geometric_spark.operators.pagerank import pagerank
from halvesting_geometric_spark.operators.triangles import triangle_count

__all__ = [
    "PropertyGraph",
    "build_graph",
    "build_vertices",
    "canonical_edges",
    "connected_components",
    "dense_ids_scalable",
    "dense_ids_window",
    "edges_to_ids",
    "extract_conv_edges",
    "in_degrees",
    "label_propagation",
    "ordered_turns",
    "out_degrees",
    "pagerank",
    "triangle_count",
    "undirected",
]
