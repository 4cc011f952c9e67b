"""Compute ops: Gibbs kernels, MMD loss, exact enumeration oracle."""

from image_generation_tpu.ops.gibbs import (  # noqa: F401
    GibbsPlan,
    build_plan,
    gibbs_sweeps,
    ising_energies,
    pt_round,
    pt_sample,
)
from image_generation_tpu.ops.exact import (  # noqa: F401
    enumerate_states,
    exact_moments,
    exact_sample,
)
