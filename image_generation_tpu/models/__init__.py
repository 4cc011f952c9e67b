"""Model layer: Flax DVAE (encoder/decoder/spin bottleneck) and the GRBM."""

from image_generation_tpu.models.grbm import (  # noqa: F401
    GRBMGraph,
    GRBMParams,
    energy,
    nll_grads,
    nll_value,
    scaled_ising,
    suff_stats,
)
