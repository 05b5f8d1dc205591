"""Shared exception types mirroring the reference's error surface.

- :class:`PowerIterationFailedConvergence` —
  ``networkx.PowerIterationFailedConvergence``
  (``networkx/exception.py:182``): raised by the iterative fixpoint
  algorithms (pagerank, hits, eigenvector/katz centrality) after
  ``max_iter`` iterations without convergence.
- :class:`NotImplementedForDirected` — stands in for
  ``networkx.NetworkXNotImplemented`` as raised by
  ``@not_implemented_for("directed")`` (``networkx/utils/decorators.py:60``)
  on algorithms whose semantics are undirected-only (triangles/clustering,
  label propagation, k-truss).
"""

from __future__ import annotations


class PowerIterationFailedConvergence(Exception):
    """Raised when power iteration fails to converge within ``max_iter``
    iterations (mirror of ``networkx.PowerIterationFailedConvergence``)."""

    def __init__(self, num_iterations: int):
        self.num_iterations = num_iterations
        super().__init__(
            f"power iteration failed to converge within {num_iterations} iterations"
        )


class NotImplementedForDirected(Exception):
    """Mirror of ``networkx.NetworkXNotImplemented`` for directed input."""


class NetworkXError(Exception):
    """Mirror of ``networkx.NetworkXError`` (``networkx/exception.py:19``)
    for semantic errors like 2-coloring a non-bipartite graph."""


class AmbiguousSolution(Exception):
    """Mirror of ``networkx.AmbiguousSolution`` (``networkx/exception.py:168``):
    bipartite ``sets`` of a disconnected graph are not unique."""
