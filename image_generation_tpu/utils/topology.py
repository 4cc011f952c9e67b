"""QPU topology generators: Chimera, Pegasus and Zephyr coupling graphs.

The reference obtains its coupling graph from live hardware
(``DWaveSampler(solver=qpu).to_networkx_graph()``, reference:
src/utils/common.py:123-124) and from ``dwave_networkx``
(``pegasus_graph``/``zephyr_graph``/``chimera_graph`` + layouts, reference:
src/utils/callback_helpers.py:366-376).  This module provides offline,
first-party generators for the same graph families, derived directly from the
published geometric constructions (Boothby, Bunyk, Raymond & Roy,
"Next-Generation Topology of D-Wave Quantum Processors", and the Zephyr
topology report) — qubits are axis-aligned segments on an integer grid and
couplers arise from segment crossings/adjacency.  No code is taken from
dwave_networkx; graphs are ideal (no dead qubits), deterministic, and
validated structurally in tests (node counts, degree histograms).

All generators return ``networkx.Graph`` whose nodes are integer linear
indices (the standard D-Wave linear indexing for each family) and carry the
graph-level metadata the app layer needs (``family``, ``rows``, ``columns``,
``tile``) plus per-node 2-D ``pos`` for plotting (the dwave_networkx
``*_layout`` equivalent, reference: src/utils/callback_helpers.py:369-376).
"""

from __future__ import annotations

from typing import Optional, Sequence

import networkx as nx

__all__ = [
    "chimera_graph",
    "pegasus_graph",
    "zephyr_graph",
    "graph_for_qpu",
    "graph_layout",
    "QPU_TOPOLOGIES",
]

# Known QPU product names → (family, size) so the app can work fully offline.
# The reference discovers these from the Leap cloud (demo_interface.py:46-54);
# here they are a static registry (extensible via graph_for_qpu kwargs).
QPU_TOPOLOGIES = {
    "Advantage_system4": ("pegasus", 16),
    "Advantage_system6": ("pegasus", 16),
    "Advantage2_system1": ("zephyr", 15),
    "Advantage2_prototype": ("zephyr", 6),
    "DW_2000Q": ("chimera", 16),
}


# ---------------------------------------------------------------------------
# Chimera
# ---------------------------------------------------------------------------

def chimera_graph(m: int, n: Optional[int] = None, t: int = 4) -> nx.Graph:
    """Ideal Chimera graph C(m, n, t).

    An m×n grid of K_{t,t} unit cells.  Within a cell, every "vertical"
    qubit (u=0) couples to every "horizontal" qubit (u=1).  Vertical qubits
    couple to the vertical qubit with the same (j, k) in the cell below;
    horizontal qubits to the one in the cell to the right.

    Linear index of (i, j, u, k) = ((i * n + j) * 2 + u) * t + k.
    """
    if n is None:
        n = m
    g = nx.Graph(family="chimera", rows=m, columns=n, tile=t)

    def idx(i: int, j: int, u: int, k: int) -> int:
        return ((i * n + j) * 2 + u) * t + k

    for i in range(m):
        for j in range(n):
            # intra-cell K_{t,t}
            for k0 in range(t):
                for k1 in range(t):
                    g.add_edge(idx(i, j, 0, k0), idx(i, j, 1, k1))
            # external couplers
            for k in range(t):
                if i + 1 < m:
                    g.add_edge(idx(i, j, 0, k), idx(i + 1, j, 0, k))
                if j + 1 < n:
                    g.add_edge(idx(i, j, 1, k), idx(i, j + 1, 1, k))

    # plotting coordinates: spread the t qubits of each orientation inside
    # the cell, vertical qubits as columns and horizontal as rows.
    pos = {}
    for i in range(m):
        for j in range(n):
            for k in range(t):
                pos[idx(i, j, 0, k)] = (j + 0.15 + 0.7 * k / max(t - 1, 1), -(i + 0.5))
                pos[idx(i, j, 1, k)] = (j + 0.5, -(i + 0.15 + 0.7 * k / max(t - 1, 1)))
    nx.set_node_attributes(g, pos, "pos")
    return g


# ---------------------------------------------------------------------------
# Pegasus
# ---------------------------------------------------------------------------

# Default qubit-offset lists (vertical, horizontal) of the production Pegasus
# lattice: shifts cycle through {2, 6, 10} in triples, with the horizontal
# list rotated by one triple relative to the vertical list.
_PEGASUS_SHIFTS_V = (2, 2, 2, 6, 6, 6, 10, 10, 10, 2, 2, 2)
_PEGASUS_SHIFTS_H = (6, 6, 6, 10, 10, 10, 2, 2, 2, 6, 6, 6)


def pegasus_graph(
    m: int,
    fabric_only: bool = True,
    shifts_v: Sequence[int] = _PEGASUS_SHIFTS_V,
    shifts_h: Sequence[int] = _PEGASUS_SHIFTS_H,
) -> nx.Graph:
    """Ideal Pegasus graph P(m).

    Geometric construction.  A qubit has coordinate (u, w, k, z) with
    orientation u ∈ {0 (vertical), 1 (horizontal)}, perpendicular tile offset
    w ∈ [0, m), wire index k ∈ [0, 12), and parallel tile offset
    z ∈ [0, m-1).  A vertical qubit (0, w, k, z) is the segment at column
    x = 12·w + k spanning rows [12·z + s_v[k], 12·z + s_v[k] + 12); a
    horizontal qubit (1, w, k, z) is the segment at row y = 12·w + k spanning
    columns [12·z + s_h[k], 12·z + s_h[k] + 12).

    Couplers:
      * internal — a vertical and a horizontal qubit that cross (each one's
        axis position lies inside the other's span);
      * external — collinear qubits whose spans abut: (u,w,k,z)–(u,w,k,z+1);
      * odd      — the two qubits of an adjacent wire pair at the same
        offset: (u,w,2j,z)–(u,w,2j+1,z).

    Interior qubits have degree 12 (internal) + 2 (external) + 1 (odd) = 15.

    Linear index of (u, w, k, z) = ((u·m + w)·12 + k)·(m−1) + z.

    With ``fabric_only`` (default), qubits with no internal couplers — the
    boundary wires whose span lies entirely outside the crossing region — are
    dropped, matching the usable fabric of production chips (for P(16):
    5640 of the nominal 5760 qubits).
    """
    g = nx.Graph(family="pegasus", rows=m, columns=m, tile=12)
    zmax = m - 1

    def idx(u: int, w: int, k: int, z: int) -> int:
        return ((u * m + w) * 12 + k) * zmax + z

    # external couplers: spans [12z+s, 12z+s+12) and [12(z+1)+s, ...) abut.
    for u in range(2):
        for w in range(m):
            for k in range(12):
                for z in range(zmax - 1):
                    g.add_edge(idx(u, w, k, z), idx(u, w, k, z + 1))

    # odd couplers: wire pairs (2j, 2j+1) share a shift triple.
    for u in range(2):
        for w in range(m):
            for j in range(6):
                for z in range(zmax):
                    g.add_edge(idx(u, w, 2 * j, z), idx(u, w, 2 * j + 1, z))

    # internal couplers: mutual crossing.  For a vertical qubit at column
    # x = 12w+k with row span [12z+sv[k], +12), the horizontal qubits it
    # crosses have row y in that span and column span containing x.
    for wv in range(m):
        for kv in range(12):
            x = 12 * wv + kv
            for zv in range(zmax):
                lo = 12 * zv + shifts_v[kv]
                for y in range(lo, lo + 12):
                    wh, kh = divmod(y, 12)
                    if not (0 <= wh < m):
                        continue
                    # horizontal span [12*zh + sh[kh], +12) must contain x
                    zh, r = divmod(x - shifts_h[kh], 12)
                    if 0 <= zh < zmax:
                        g.add_edge(idx(0, wv, kv, zv), idx(1, wh, kh, zh))

    if fabric_only:
        dead = [
            node
            for node in g.nodes
            if not any(_peg_u(nbr, m) != _peg_u(node, m) for nbr in g.neighbors(node))
        ]
        g.remove_nodes_from(dead)

    # plotting coordinates: the segment midpoint.
    pos = {}
    for node in g.nodes:
        u, w, k, z = _peg_coords(node, m)
        axis = 12 * w + k
        center = 12 * z + (shifts_v[k] if u == 0 else shifts_h[k]) + 5.5
        pos[node] = (axis, -center) if u == 0 else (center, -axis)
    nx.set_node_attributes(g, pos, "pos")
    return g


def _peg_coords(node: int, m: int):
    zmax = m - 1
    node, z = divmod(node, zmax)
    node, k = divmod(node, 12)
    u, w = divmod(node, m)
    return u, w, k, z


def _peg_u(node: int, m: int) -> int:
    return node // ((m - 1) * 12 * m)


# ---------------------------------------------------------------------------
# Zephyr
# ---------------------------------------------------------------------------

def zephyr_graph(m: int, t: int = 4) -> nx.Graph:
    """Ideal Zephyr graph Z(m, t).

    A qubit has coordinate (u, w, k, j, z) with orientation u ∈ {0, 1},
    perpendicular offset w ∈ [0, 2m], wire index k ∈ [0, t), half-offset
    j ∈ {0, 1} and parallel offset z ∈ [0, m).  A vertical qubit
    (0, w, k, j, z) is a segment at column w spanning rows
    [2z + j, 2z + j + 2]; horizontal qubits are the transpose.

    Couplers (Boothby, Raymond & King, "Zephyr Topology of D-Wave Quantum
    Processors"; counts verified against the closed forms below in
    tests/test_topology.py):

      * internal — a vertical qubit (0, wv, kv, jv, zv) couples all t wires
        of the four horizontal offset classes (wh, jh) with
        wh ∈ {2·zv + 1, 2·zv + 2·jh}, jh ∈ {0, 1}, at the single parallel
        offset zh = (wv−1)/2 (wv odd) or wv/2 − jv (wv even), when
        0 ≤ zh < m.  Geometrically: a span endpoint meets an orthogonal
        span's midpoint, with boundary contacts retained by clipping spans
        to the [0, 2m] frame rather than dropping them — so exactly the two
        half-outside wire classes (w=0, j=1) and (w=2m, j=0) per orientation
        have no internal couplers, and every other qubit has the full 4t.
        Count: 16·t²·m².
      * external — collinear spans abutting end-to-end:
        (u,w,k,j,z)–(u,w,k,j,z+1).  Count: 4·t·(2m+1)·(m−1).
      * odd      — collinear spans overlapping by one unit:
        (u,w,k,0,z)–(u,w,k,1,z) and (u,w,k,1,z)–(u,w,k,0,z+1).
        Count: 2·t·(2m+1)·(2m−1).

    Total |E| = 16·t²·m² + 2·t·(2m+1)·(4m−3); interior degree
    4t + 2 + 2 = 20 for t = 4 (the Advantage2 generation's published 20-way
    connectivity).  Node count is 4·t·m·(2m+1) — Z(15, 4) has 7440 qubits
    and 71,736 couplers, matching the Advantage2 generation whose
    checkpoints the reference ships (models/Advantage2_system1_*).

    Linear index of (u, w, k, j, z) = (((u·(2m+1) + w)·t + k)·2 + j)·m + z.
    """
    g = nx.Graph(family="zephyr", rows=m, columns=m, tile=t)
    W = 2 * m + 1

    def idx(u: int, w: int, k: int, j: int, z: int) -> int:
        return (((u * W + w) * t + k) * 2 + j) * m + z

    for u in range(2):
        for w in range(W):
            for k in range(t):
                # external couplers
                for j in range(2):
                    for z in range(m - 1):
                        g.add_edge(idx(u, w, k, j, z), idx(u, w, k, j, z + 1))
                # odd couplers
                for z in range(m):
                    g.add_edge(idx(u, w, k, 0, z), idx(u, w, k, 1, z))
                    if z + 1 < m:
                        g.add_edge(idx(u, w, k, 1, z), idx(u, w, k, 0, z + 1))

    # internal couplers — canonical rule (docstring above).  One vertical
    # offset class (wv, jv) meets horizontals at exactly one zh; each zv row
    # contributes the four (wh, jh) partner classes, t×t wires each.
    for wv in range(W):
        for jv in range(2):
            zh = (wv - 1) // 2 if wv % 2 else wv // 2 - jv
            if not (0 <= zh < m):
                continue  # the half-outside classes (0, j=1) / (2m, j=0)
            for zv in range(m):
                for jh in range(2):
                    for wh in (2 * zv + 1, 2 * zv + 2 * jh):
                        for kv in range(t):
                            for kh in range(t):
                                g.add_edge(
                                    idx(0, wv, kv, jv, zv), idx(1, wh, kh, jh, zh)
                                )

    # plotting coordinates: segment midpoint, wires fanned slightly.
    pos = {}
    for node in g.nodes:
        u, w, k, j, z = _zeph_coords(node, m, t)
        axis = w + 0.08 * (k - (t - 1) / 2)
        center = 2 * z + j + 1
        pos[node] = (axis, -center) if u == 0 else (center, -axis)
    nx.set_node_attributes(g, pos, "pos")
    return g


def _zeph_coords(node: int, m: int, t: int):
    node, z = divmod(node, m)
    node, j = divmod(node, 2)
    node, k = divmod(node, t)
    u, w = divmod(node, 2 * m + 1)
    return u, w, k, j, z


# ---------------------------------------------------------------------------
# Registry helpers
# ---------------------------------------------------------------------------

def graph_for_qpu(qpu: str, **overrides) -> nx.Graph:
    """Return the ideal coupling graph for a named QPU product.

    Offline replacement for ``DWaveSampler(solver=qpu).to_networkx_graph()``
    (reference: src/utils/common.py:123-124).  Unknown names fall back to
    Zephyr Z(15) (the reference default QPU is Advantage2_system1,
    demo_configs.py DEFAULT_QPU).
    """
    family, size = QPU_TOPOLOGIES.get(qpu, ("zephyr", 15))
    family = overrides.pop("family", family)
    size = overrides.pop("size", size)
    if family == "pegasus":
        return pegasus_graph(size, **overrides)
    if family == "zephyr":
        return zephyr_graph(size, **overrides)
    if family == "chimera":
        return chimera_graph(size, **overrides)
    raise ValueError(f"unknown topology family: {family}")


def graph_layout(graph: nx.Graph) -> dict:
    """2-D positions for plotting; normalized to the unit square.

    Equivalent of dwave_networkx's ``pegasus_layout``/``zephyr_layout``/
    ``chimera_layout`` as used by the reference's topology figures
    (src/utils/callback_helpers.py:369-376).  Uses the geometric ``pos``
    attributes set by the generators; falls back to a spring layout.
    """
    pos = nx.get_node_attributes(graph, "pos")
    if len(pos) != graph.number_of_nodes():
        pos = nx.spring_layout(graph, seed=0)
    xs = [p[0] for p in pos.values()]
    ys = [p[1] for p in pos.values()]
    x0, x1 = min(xs), max(xs)
    y0, y1 = min(ys), max(ys)
    sx = (x1 - x0) or 1.0
    sy = (y1 - y0) or 1.0
    return {n: ((x - x0) / sx, (y - y0) / sy) for n, (x, y) in pos.items()}
