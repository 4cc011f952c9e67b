"""On-device Gibbs and parallel-tempering sampler backends.

These wrap ops/gibbs.py behind the SamplerBackend protocol with a per-graph
plan/compile cache, so app-level code (generation, the persistent helper,
tests) gets one-call sampling with the same ergonomics as the reference's
``grbm.sample(sampler, …)`` (src/model_wrapper.py:308-316) — minus the
network round-trip.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.ops.gibbs import (
    GibbsPlan,
    build_plan,
    gibbs_sweeps,
    ising_energies,
    permuted_model,
    pt_sample,
    random_spins,
    to_original,
)
from image_generation_tpu.utils.sampleset import SampleSet

__all__ = ["GibbsSampler", "PTSampler"]


class _PlanCache:
    def __init__(self):
        # value holds the graph too: keying by id() alone is unsafe once a
        # graph is garbage-collected and its address reused
        self._plans: Dict[int, tuple] = {}

    def plan(self, graph: GRBMGraph) -> GibbsPlan:
        entry = self._plans.get(id(graph))
        if entry is None or entry[0] is not graph:
            entry = (graph, build_plan(graph))
            self._plans[id(graph)] = entry
        return entry[1]


class GibbsSampler(_PlanCache):
    """Block-Gibbs with burn-in; optionally persistent chains across calls
    (the working realization of the reference's intended sample reuse,
    src/utils/persistent_qpu_sampler.py)."""

    name = "gibbs"

    def __init__(self, n_sweeps: int = 64, persistent: bool = False):
        super().__init__()
        self.n_sweeps = n_sweeps
        self.persistent = persistent
        self._chains: Dict[int, jax.Array] = {}

    def sample(self, h, quadratic, graph, num_reads, key, n_sweeps=None, **_) -> SampleSet:
        plan = self.plan(graph)
        sweeps = self.n_sweeps if n_sweeps is None else n_sweeps
        k1, k2 = jax.random.split(jnp.asarray(key))
        chains = self._chains.get(id(graph)) if self.persistent else None
        if chains is None or chains.shape[0] != num_reads:
            chains = random_spins(k1, plan, num_reads)
        hp, cp = permuted_model(plan, jnp.asarray(h), jnp.asarray(quadratic))
        chains = gibbs_sweeps(k2, hp, cp, plan, chains, sweeps)
        if self.persistent:
            self._chains[id(graph)] = chains
        spins = to_original(plan, chains)
        energies = ising_energies(hp, cp, chains)
        return SampleSet(
            spins=np.asarray(spins),
            energies=np.asarray(energies),
            info={"sampler": self.name, "n_sweeps": sweeps},
        )


class PTSampler(_PlanCache):
    """Parallel tempering: a β ladder with replica exchange; returns the
    target-temperature chains.  For stiff/frustrated models (large latent
    graphs, low temperature) where plain Gibbs mixes slowly."""

    name = "pt"

    def __init__(
        self,
        n_betas: int = 8,
        beta_min: float = 0.25,
        n_rounds: int = 16,
        sweeps_per_round: int = 4,
        persistent: bool = False,
        betas=None,
    ):
        super().__init__()
        # explicit ladder (e.g. feedback-optimized via ops/pt_tune.py,
        # plumbed from TrainingConfig.PT_BETAS) overrides geomspace
        self.betas = (
            jnp.asarray(betas, jnp.float32)
            if betas is not None
            else jnp.geomspace(beta_min, 1.0, n_betas)
        )
        self.n_rounds = n_rounds
        self.sweeps_per_round = sweeps_per_round
        self.persistent = persistent
        self._ladders: Dict[int, jax.Array] = {}

    def sample(self, h, quadratic, graph, num_reads, key, **_) -> SampleSet:
        plan = self.plan(graph)
        hp, cp = permuted_model(plan, jnp.asarray(h), jnp.asarray(quadratic))
        init = self._ladders.get(id(graph)) if self.persistent else None
        if init is not None and init.shape[1] != num_reads:
            init = None
        target, ladder = pt_sample(
            jnp.asarray(key), hp, cp, plan,
            n_chains=num_reads, betas=self.betas,
            n_rounds=self.n_rounds, sweeps_per_round=self.sweeps_per_round,
            init_spins=init,
        )
        if self.persistent:
            self._ladders[id(graph)] = ladder
        spins = to_original(plan, target)
        energies = ising_energies(hp, cp, target)
        return SampleSet(
            spins=np.asarray(spins),
            energies=np.asarray(energies),
            info={
                "sampler": self.name,
                "n_betas": int(self.betas.shape[0]),
                "n_rounds": self.n_rounds,
            },
        )
