"""Persistent sample cache: the reference's deque helper, with the bug fixed.

The reference's ``PersistentQPUSampleHelper`` (src/utils/
persistent_qpu_sampler.py:41-105) was *intended* to keep a FIFO deque of
past QPU reads and only resample every ``iterations_before_resampling``
calls — but it resets its own state at the top of every ``sample()`` call
(lines 61-63), so the cache path is dead code and the annealer is hit every
call (documented in SURVEY.md §2 C9).

This implementation provides the intended semantics, working:

  * a FIFO buffer of up to ``max_deque_size`` past samples;
  * while the buffer is filling OR every ``iterations_before_resampling``
    calls, draw fresh samples from the backend and push them in;
  * otherwise serve a uniform random subset of the buffer.

With the on-device Gibbs backend the cache is rarely needed for latency
(sampling is microseconds, not a cloud round-trip), but it remains useful
for sample diversity (a reservoir of draws from older parameter iterates,
PCD-flavored) and for API parity.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.utils.sampleset import SampleSet

__all__ = ["PersistentSampleCache", "push_to_deque"]


def push_to_deque(deque: np.ndarray, x: np.ndarray, deque_size: int) -> np.ndarray:
    """FIFO push of rows of ``x`` into ``deque``, keeping ≤ deque_size rows
    (same contract as the reference's push_to_deque,
    persistent_qpu_sampler.py:12-38)."""
    out = np.concatenate([deque, x], axis=0)
    return out[-deque_size:]


class PersistentSampleCache:
    def __init__(
        self,
        backend,
        max_deque_size: int = 4096,
        iterations_before_resampling: int = 100,
    ):
        self.backend = backend
        self.max_deque_size = max_deque_size
        self.iterations_before_resampling = iterations_before_resampling
        self.deque: Optional[np.ndarray] = None
        self.iterations_since_last_resampling = 0
        self._last_energies: Optional[np.ndarray] = None

    @property
    def current_deque_size(self) -> int:
        return 0 if self.deque is None else self.deque.shape[0]

    def reset(self) -> None:
        """Drop all cached samples.  Call when the model's parameters change:
        a filled deque would otherwise keep serving draws from the OLD model
        for up to ``iterations_before_resampling`` calls, whereas the
        reference's generation path always samples the current model
        (src/model_wrapper.py:369-376)."""
        self.deque = None
        self.iterations_since_last_resampling = 0
        self._last_energies = None

    def sample(
        self, h, quadratic, graph: GRBMGraph, num_reads: int, key: jax.Array, **kw
    ) -> SampleSet:
        resample = (
            self.current_deque_size < self.max_deque_size
            or self.iterations_since_last_resampling >= self.iterations_before_resampling
        )
        if resample:
            ss = self.backend.sample(h, quadratic, graph, num_reads, key, **kw)
            if self.deque is None:
                self.deque = ss.spins.copy()
            else:
                self.deque = push_to_deque(self.deque, ss.spins, self.max_deque_size)
            self.iterations_since_last_resampling = 0
            self._last_energies = ss.energies
            return ss
        self.iterations_since_last_resampling += 1
        idx = np.asarray(
            jax.random.randint(key, (num_reads,), 0, self.current_deque_size)
        )
        spins = self.deque[idx]
        h = np.asarray(h)
        q = np.asarray(quadratic)
        energies = spins @ h + (spins[:, graph.edge_i] * spins[:, graph.edge_j]) @ q
        return SampleSet(spins=spins, energies=energies, info={"sampler": "cache"})
