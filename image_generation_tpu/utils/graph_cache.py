"""On-disk cache of selected latent graphs.

Building a full Zephyr/Pegasus fabric and greedily selecting a subgraph is
pure Python (~tens of seconds for Z15/P16) and fully deterministic in
(qpu, n_latents, seed) — so every process (CLI run, bench, web job) caching
it saves a minute of setup.  Stored as npz edge lists + the physical-node
mapping under ``~/.cache/image_generation_tpu`` (override with
``IMGGEN_CACHE_DIR``; set ``IMGGEN_NO_GRAPH_CACHE=1`` to disable).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

__all__ = ["cached_latent_graph"]


def _cache_dir() -> Path:
    d = os.environ.get("IMGGEN_CACHE_DIR")
    return Path(d) if d else Path.home() / ".cache" / "image_generation_tpu"


def cached_latent_graph(
    qpu: str, n_latents: int, random_seed: Optional[int]
) -> Tuple["object", list]:
    """(GRBMGraph, physical_nodes) for a QPU/latent-size/seed triple.

    Cache-first; on miss builds the topology, runs the greedy selection and
    persists the result.
    """
    from image_generation_tpu.models.grbm import GRBMGraph
    from image_generation_tpu.utils.subgraph import select_latent_graph
    from image_generation_tpu.utils.topology import graph_for_qpu

    # v2: Zephyr boundary couplers fixed to the canonical convention
    # (topology.zephyr_graph docstring) — old cached selections are stale
    key = f"{qpu}_{n_latents}_{random_seed}_v2.npz"
    path = _cache_dir() / key
    if not os.environ.get("IMGGEN_NO_GRAPH_CACHE") and path.exists():
        try:
            with np.load(path) as z:
                graph = GRBMGraph(
                    n=int(z["n"]), edge_i=z["edge_i"], edge_j=z["edge_j"]
                )
                return graph, z["physical"].tolist()
        except Exception:
            pass  # corrupt cache: rebuild

    full = graph_for_qpu(qpu)
    latent, mapping = select_latent_graph(full, n_latents, random_seed)
    graph = GRBMGraph.from_networkx(latent)
    physical = [None] * len(mapping)
    for phys, logical in mapping.items():
        physical[logical] = phys
    if not os.environ.get("IMGGEN_NO_GRAPH_CACHE"):
        try:
            path.parent.mkdir(parents=True, exist_ok=True)
            np.savez_compressed(
                path,
                n=graph.n,
                edge_i=graph.edge_i,
                edge_j=graph.edge_j,
                physical=np.asarray(physical, np.int64),
            )
        except OSError:
            pass
    return graph, physical
