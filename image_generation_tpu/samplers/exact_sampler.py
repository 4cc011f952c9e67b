"""Exact enumeration sampler backend (the host "fake annealer").

For n ≤ 20 spins draws exact Boltzmann samples — the test strategy's oracle
backend (SURVEY.md §4): validates the on-device samplers and lets the full
pipeline run with a provably correct negative phase on tiny graphs.
"""

from __future__ import annotations

import numpy as np

from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.ops.exact import exact_sample
from image_generation_tpu.utils.sampleset import SampleSet

__all__ = ["ExactSampler"]


class ExactSampler:
    name = "exact"

    def __init__(self, beta: float = 1.0):
        self.beta = beta

    def sample(self, h, quadratic, graph: GRBMGraph, num_reads, key, **_) -> SampleSet:
        h = np.asarray(h)
        q = np.asarray(quadratic)
        spins = np.asarray(
            exact_sample(key, h, graph.edge_i, graph.edge_j, q, num_reads, self.beta)
        )
        energies = spins @ h + (spins[:, graph.edge_i] * spins[:, graph.edge_j]) @ q
        return SampleSet(spins=spins, energies=energies, info={"sampler": self.name})
