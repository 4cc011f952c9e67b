"""Sampler backends (the annealer-replacement layer)."""

from image_generation_tpu.samplers.base import SamplerBackend, get_sampler  # noqa: F401
from image_generation_tpu.samplers.exact_sampler import ExactSampler  # noqa: F401
from image_generation_tpu.samplers.factory import get_sampler_and_graph  # noqa: F401
from image_generation_tpu.samplers.gibbs_sampler import GibbsSampler, PTSampler  # noqa: F401
from image_generation_tpu.samplers.persistent import (  # noqa: F401
    PersistentSampleCache,
    push_to_deque,
)
