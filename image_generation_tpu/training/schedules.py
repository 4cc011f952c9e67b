"""Learning-rate schedules reproducing the reference's semantics.

The reference builds ``np.geomspace(initial, final, total_opt_steps + 1)``
tables and writes ``schedule[opt_step]`` into the optimizer *after* each
step, with ``opt_step`` incremented afterwards (src/model_wrapper.py:263-268,
346-351).  Net effect: step 0 runs at the initial LR and step k ≥ 1 runs at
``schedule[k−1]`` — a one-step lag this closed form reproduces exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["geomspace_lr"]


def geomspace_lr(initial: float, final: float, total_steps: int):
    """Closed-form geomspace schedule with the reference's one-step lag.

    ``geomspace(a, b, N+1)[i] = a · (b/a)^(i/N)``; the LR used at step k is
    entry ``max(k−1, 0)``.
    """
    ratio = final / initial
    n = max(total_steps, 1)

    def lr(step):
        i = jnp.clip(step - 1, 0, n)
        return initial * ratio ** (i / n)

    return lr
