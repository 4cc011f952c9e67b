"""Graph coloring for parallel block-Gibbs updates.

The Gibbs sampler that replaces the reference's quantum annealer (reference
negative-phase call sites: src/model_wrapper.py:308-316, src/losses.py:38-63)
updates all spins of one color class simultaneously: within a color class no
two spins are adjacent, so their conditional distributions are independent
given the rest — a sweep over color classes is a valid systematic-scan Gibbs
sweep, and each class update is a dense (chains × n) · (n × n_c) matmul that
maps straight onto the TPU MXU.

This module computes a greedy (largest-degree-first) proper coloring and
packs the result into padded index arrays suitable for static-shape XLA/
Pallas kernels.
"""

from __future__ import annotations

from dataclasses import dataclass

import networkx as nx
import numpy as np

__all__ = ["greedy_coloring", "ColorClasses", "color_classes"]


def greedy_coloring(graph: nx.Graph) -> dict:
    """Proper vertex coloring via greedy largest-degree-first.

    Deterministic for a fixed graph (ties broken by node order).  Returns
    {node: color}.  Pegasus/Zephyr subgraphs typically need ≤ max_degree+1
    colors; the sampler's correctness only needs *properness*, which is
    asserted here.
    """
    order = sorted(graph.nodes(), key=lambda v: (-graph.degree(v), v))
    colors: dict = {}
    for v in order:
        used = {colors[n] for n in graph.neighbors(v) if n in colors}
        c = 0
        while c in used:
            c += 1
        colors[v] = c
    for u, v in graph.edges():
        assert colors[u] != colors[v], "coloring is not proper"
    return colors


@dataclass(frozen=True)
class ColorClasses:
    """Static-shape packing of a proper coloring for XLA kernels.

    Attributes:
      n: number of spins.
      n_colors: number of color classes.
      class_size: padded per-class size (max class size, rounded up to
        ``pad_to``; padding slots point at index ``n`` — one past the end —
        so kernels can scatter into an (n+1)-wide buffer and drop the tail,
        or mask with ``valid``).
      indices: int32 (n_colors, class_size) spin indices per class.
      valid: bool (n_colors, class_size) mask of real (non-padding) slots.
      color_of: int32 (n,) color id per spin.
    """

    n: int
    n_colors: int
    class_size: int
    indices: np.ndarray
    valid: np.ndarray
    color_of: np.ndarray


def color_classes(graph: nx.Graph, pad_to: int = 128) -> ColorClasses:
    """Compute padded color classes for a graph with nodes 0..n-1.

    ``pad_to`` rounds the class size up so the per-class matmul's output
    dimension is lane-aligned (TPU lane width 128).
    """
    n = graph.number_of_nodes()
    if set(graph.nodes()) != set(range(n)):
        raise ValueError("graph nodes must be logical ints 0..n-1 (relabel first)")
    coloring = greedy_coloring(graph)
    n_colors = max(coloring.values()) + 1 if n else 0
    classes = [[] for _ in range(n_colors)]
    for v, c in coloring.items():
        classes[c].append(v)
    max_size = max(len(c) for c in classes)
    class_size = -(-max_size // pad_to) * pad_to

    indices = np.full((n_colors, class_size), n, dtype=np.int32)
    valid = np.zeros((n_colors, class_size), dtype=bool)
    for c, members in enumerate(classes):
        members = sorted(members)
        indices[c, : len(members)] = members
        valid[c, : len(members)] = True
    color_of = np.zeros(n, dtype=np.int32)
    for v, c in coloring.items():
        color_of[v] = c
    return ColorClasses(
        n=n,
        n_colors=n_colors,
        class_size=class_size,
        indices=indices,
        valid=valid,
        color_of=color_of,
    )
