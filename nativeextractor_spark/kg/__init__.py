from nativeextractor_spark.kg.triples import extract_triples, document_triples
from nativeextractor_spark.kg.linking import link_mentions
from nativeextractor_spark.kg.components import connected_components
from nativeextractor_spark.kg.canonicalize import canonicalize_surfaces
from nativeextractor_spark.kg.graph import build_graph, merge_into
from nativeextractor_spark.kg.pipeline import run_pipeline

__all__ = [
    "extract_triples",
    "document_triples",
    "link_mentions",
    "connected_components",
    "canonicalize_surfaces",
    "build_graph",
    "merge_into",
    "run_pipeline",
]
