"""Plotly-schema figure JSON without the plotly dependency.

The reference UI communicates through plotly figure JSON files written by
the training process and polled by the Dash app (reference:
``fig.to_json()`` writes in src/model_wrapper.py:396-397, 432-439, 488-489
and src/utils/callback_helpers.py:192-218).  This module emits dicts with
the same schema (``{"data": [...], "layout": {...}}``) so (a) any plotly/
Dash front-end renders them unchanged and (b) the bundled lightweight web UI
can consume them, with zero chart-library imports in the training path.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

import numpy as np

__all__ = [
    "imshow_figure",
    "loss_figure",
    "topology_figure",
    "write_figure",
]

_BARE_LAYOUT = {"margin": {"t": 0, "l": 0, "b": 0, "r": 0}}


def imshow_figure(image: np.ndarray) -> dict:
    """Grayscale image as a heatmap figure (the px.imshow equivalent used
    for generated/reconstructed grids, src/model_wrapper.py:389-394).

    z is 8-bit quantized (ints 0-255, ``zmax`` 255): precision-identical to
    the PNG the page renders from it (render_heatmap_png quantizes to uint8
    anyway) and ~3× cheaper to JSON-serialize than rounded floats — on the
    serving path the figure encode was the single biggest host cost
    (runs/warm_serving_load.json).  Consumers scale by the figure's own
    ``zmax``, so pre-r4 float figures (zmax 1.0) on disk keep rendering."""
    img = np.asarray(image)
    if img.ndim == 3:
        img = img[..., 0]
    z = np.flipud(img)  # heatmap y-axis points up; images point down
    z8 = np.round(np.clip(z.astype(np.float64), 0.0, 1.0) * 255.0)
    return {
        "data": [
            {
                "type": "heatmap",
                "z": z8.astype(np.uint8).tolist(),
                "colorscale": "Greys",
                "reversescale": True,
                "showscale": False,
                "zmin": 0,
                "zmax": 255,
            }
        ],
        "layout": {
            **_BARE_LAYOUT,
            "xaxis": {"showticklabels": False, "visible": False},
            "yaxis": {
                "showticklabels": False,
                "visible": False,
                "scaleanchor": "x",
            },
        },
    }


def loss_figure(losses: Sequence[float], title_y: str = "Loss") -> dict:
    """Per-batch loss curve (reference: generate_loss_plot,
    src/model_wrapper.py:401-445)."""
    ys = [float(v) for v in losses]
    return {
        "data": [{"type": "scatter", "mode": "lines", "x": list(range(len(ys))), "y": ys}],
        "layout": {
            **_BARE_LAYOUT,
            "xaxis": {"title": {"text": "Batch"}},
            "yaxis": {"title": {"text": title_y}},
        },
    }


def topology_figure(
    graph,
    layout: dict,
    node_values: Optional[Sequence[float]] = None,
    colors=("#FF7006", "#17BEBB"),
) -> dict:
    """QPU-topology scatter: edge trace + node trace colored by spin value
    (reference: get_fig/get_node_trace/get_edge_trace,
    src/utils/callback_helpers.py:224-343; colors demo_configs.GRAPH_COLORS)."""
    xe, ye = [], []
    for u, v in graph.edges():
        xe += [layout[u][0], layout[v][0], None]
        ye += [layout[u][1], layout[v][1], None]
    nodes = list(graph.nodes())
    xn = [layout[n][0] for n in nodes]
    yn = [layout[n][1] for n in nodes]
    if node_values is None:
        node_colors = [colors[1]] * len(nodes)
    else:
        node_colors = [colors[1] if v > 0 else colors[0] for v in node_values]
    return {
        "data": [
            {
                "type": "scatter",
                "mode": "lines",
                "x": xe,
                "y": ye,
                "line": {"width": 0.5, "color": "#888"},
                "hoverinfo": "none",
            },
            {
                "type": "scatter",
                "mode": "markers",
                "x": xn,
                "y": yn,
                "marker": {"size": 6, "color": node_colors},
                "hoverinfo": "text",
                "text": [str(n) for n in nodes],
            },
        ],
        "layout": {
            **_BARE_LAYOUT,
            "showlegend": False,
            "xaxis": {"visible": False},
            "yaxis": {"visible": False, "scaleanchor": "x"},
        },
    }


def write_figure(fig: dict, path) -> None:
    with open(path, "w") as f:
        json.dump(fig, f, separators=(",", ":"))  # compact: grids are ~1 MB


_FULL_GRAPH_CACHE: dict = {}


def model_topology_figure(model_dir, latent_values=None) -> dict:
    """Topology figure for a saved model's latent coupling graph.

    Rebuilds the reference's "Machine Learning Model" tab graphs
    (src/utils/callback_helpers.py:344-381): the model's GRBM graph drawn at
    its physical QPU coordinates (when ``physical_nodes`` was persisted by
    this framework's Trainer) with nodes colored by ``latent_values`` (±1).
    Falls back to a spring layout for reference-written checkpoints, which
    lack the mapping.
    """
    import json as _json
    from pathlib import Path

    import networkx as nx

    from image_generation_tpu.io.torch_pth import grbm_from_state_dict, load_state_dict
    from image_generation_tpu.utils.topology import graph_for_qpu

    model_dir = Path(model_dir)
    _, graph = grbm_from_state_dict(load_state_dict(model_dir / "grbm.pth"))
    g = graph.to_networkx()
    meta = {}
    pj = model_dir / "parameters.json"
    if pj.exists():
        meta = _json.loads(pj.read_text())

    physical = meta.get("physical_nodes")
    layout = None
    if physical and len(physical) == graph.n:
        qpu = meta.get("qpu", "Advantage2_system1")
        full = _FULL_GRAPH_CACHE.get(qpu)
        if full is None:
            full = graph_for_qpu(qpu)
            _FULL_GRAPH_CACHE[qpu] = full
        pos = nx.get_node_attributes(full, "pos")
        if all(p in pos for p in physical):
            raw = {i: pos[p] for i, p in enumerate(physical)}
            xs = [v[0] for v in raw.values()]
            ys = [v[1] for v in raw.values()]
            sx = (max(xs) - min(xs)) or 1.0
            sy = (max(ys) - min(ys)) or 1.0
            layout = {
                i: ((x - min(xs)) / sx, (y - min(ys)) / sy)
                for i, (x, y) in raw.items()
            }
    if layout is None:
        layout = nx.spring_layout(g, seed=0)
        layout = {k: (float(v[0]), float(v[1])) for k, v in layout.items()}
    return topology_figure(g, layout, latent_values)
