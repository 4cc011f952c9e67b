"""Sampler backend protocol: the annealer-replacement surface.

The reference reaches its sampler through the Ocean SDK
(``DWaveSampler`` + 1:1 ``FixedEmbeddingComposite``; call contract
``sampler.sample_ising(h, J, num_reads=…, answer_mode="raw",
auto_scale=False, annealing_time=…)`` — reference src/utils/common.py:103-140
and the plugin's ``grbm.sample``).  Here a sampler backend is anything with

    sample(h, quadratic, graph, num_reads, key, **kwargs) -> SampleSet

where ``h``/``quadratic`` are the ALREADY prefactor-scaled, range-clipped
parameters (``models.grbm.scaled_ising`` — mirroring ``auto_scale=False``)
and ``graph`` is the GRBMGraph.  Returned spins are ±1 in original spin
order, one row per read ("raw": no aggregation).

Backends:
  * ``GibbsSampler``  — on-device block-Gibbs (default; ops/gibbs.py)
  * ``PTSampler``     — parallel tempering for stiff models
  * ``ExactSampler``  — exact enumeration, n ≤ 20 (tests / fake annealer)
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import jax

from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.utils.sampleset import SampleSet

__all__ = ["SamplerBackend", "get_sampler"]


@runtime_checkable
class SamplerBackend(Protocol):
    name: str

    def sample(
        self,
        h,
        quadratic,
        graph: GRBMGraph,
        num_reads: int,
        key: jax.Array,
        **kwargs,
    ) -> SampleSet: ...


def get_sampler(name: str, **kwargs) -> "SamplerBackend":
    """Backend factory (the solver-selection equivalent of the reference's
    Leap solver dropdown, demo_interface.py:46-54)."""
    from image_generation_tpu.samplers.gibbs_sampler import GibbsSampler, PTSampler
    from image_generation_tpu.samplers.exact_sampler import ExactSampler

    table = {"gibbs": GibbsSampler, "pt": PTSampler, "exact": ExactSampler}
    if name not in table:
        raise ValueError(f"unknown sampler backend: {name!r} (have {sorted(table)})")
    return table[name](**kwargs)
