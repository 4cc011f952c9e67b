"""Compute ops: Gibbs kernels, MMD loss, exact enumeration oracle."""

from image_generation_tpu.ops.gibbs import (  # noqa: F401
    GibbsPlan,
    build_plan,
    gibbs_sweeps,
    ising_energies,
    permuted_model,
    pt_round,
    pt_sample,
    random_spins,
    to_original,
)
from image_generation_tpu.ops.exact import (  # noqa: F401
    enumerate_states,
    exact_moments,
    exact_sample,
)
