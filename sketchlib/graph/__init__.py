"""Sketch-native graph operators over web-scale link graphs.

``links``     — HTML outlink extraction + host-graph construction (pure JVM
                column expressions; no Python in the hot path).
``hyperball`` — HyperBall / HyperANF: the neighborhood function and
                distance-based centralities of a billion-node graph via one
                HLL counter per node (Boldi & Vigna, "In-Core Computation of
                Geometric Centralities with HyperBall", 2013; Palmer et al.
                ANF, KDD 2002), expressed as iterative blob-only DataFrame
                rounds.
"""

from .hyperball import (  # noqa: F401
    closeness_centrality,
    effective_diameter,
    harmonic_centrality,
    hyperball,
    neighborhood_function,
)
from .links import (  # noqa: F401
    extract_links,
    extract_links_expr,
    host_edges,
)
from .pagerank import pagerank  # noqa: F401
