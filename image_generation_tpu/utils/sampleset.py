"""Sample container: the framework's `dimod.SampleSet` equivalent.

The reference passes annealer results around as ``dimod.SampleSet`` objects
(vartype, per-read spins, energies — reference: src/utils/
persistent_qpu_sampler.py:84-88, src/losses.py:59).  Here samples are plain
device arrays plus this small dataclass for the places that need the record
structure (UI problem-details table, persistent helper, loss bookkeeping).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

__all__ = ["SampleSet"]


@dataclass
class SampleSet:
    """A batch of spin samples with their energies.

    Attributes:
      spins: (num_reads, n) array with entries in {-1, +1}.
      energies: (num_reads,) energies of each read under the *sampled*
        (prefactor-scaled, range-clipped) Ising model — mirroring the
        annealer's ``record.energy``.
      vartype: always "SPIN" for this framework (the reference trains
        spin-valued GRBMs).
      info: free-form metadata (sampler name, sweeps, beta ladder, timing).
    """

    spins: np.ndarray
    energies: Optional[np.ndarray] = None
    vartype: str = "SPIN"
    info: dict = field(default_factory=dict)

    def __post_init__(self):
        self.spins = np.asarray(self.spins)
        if self.energies is not None:
            self.energies = np.asarray(self.energies)

    def __len__(self) -> int:
        return self.spins.shape[0]

    @property
    def num_variables(self) -> int:
        return self.spins.shape[1]

    def first(self):
        """(spins, energy) of the lowest-energy read (dimod's ``.first``)."""
        if self.energies is None:
            return self.spins[0], None
        k = int(np.argmin(self.energies))
        return self.spins[k], float(self.energies[k])
