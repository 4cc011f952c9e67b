"""Sampler + latent-graph factory: the reference's setup entry point.

Offline, first-party equivalent of ``get_sampler_and_sampler_kwargs``
(reference: src/utils/common.py:103-140): resolve the QPU's coupling graph,
greedily select and relabel the n-latent subgraph, construct the sampler
backend, and return the hardware parameter ranges — same 5-tuple contract,
no cloud session.
"""

from __future__ import annotations

from typing import Optional, Tuple

from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.samplers.base import SamplerBackend, get_sampler
from image_generation_tpu.utils.subgraph import select_latent_graph
from image_generation_tpu.utils.topology import graph_for_qpu

__all__ = ["get_sampler_and_graph"]

# Production hardware parameter ranges (the reference reads these from live
# solver properties, src/utils/common.py:129).
H_RANGE = (-4.0, 4.0)
J_RANGE = (-1.0, 1.0)


def get_sampler_and_graph(
    num_reads: int,
    n_latents: int,
    random_seed: Optional[int],
    qpu: str,
    sampler: str = "gibbs",
    **sampler_kwargs,
) -> Tuple[SamplerBackend, dict, GRBMGraph, Tuple[float, float], Tuple[float, float]]:
    """Returns (sampler, sample_kwargs, grbm_graph, linear_range, quadratic_range).

    ``sample_kwargs`` carries num_reads like the reference's sampler_kwargs
    dict (answer_mode/auto_scale/annealing_time have no Gibbs analog; raw
    unaggregated reads and no auto-scaling are this framework's only mode).
    """
    full = graph_for_qpu(qpu)
    latent, _ = select_latent_graph(full, n_latents, random_seed)
    graph = GRBMGraph.from_networkx(latent)
    backend = get_sampler(sampler, **sampler_kwargs)
    return backend, {"num_reads": num_reads}, graph, H_RANGE, J_RANGE
