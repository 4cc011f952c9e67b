"""Optimizer transforms beyond stock optax.

``scale_by_adam_moments`` is optax.scale_by_adam with BOTH moments stored in
a configurable dtype.  Motivation (BENCHMARKS.md, runs/
scaled_attribution_dvae.json): at the scaled 5640-latent config the
decoder's 127M-param dense layer makes the Adam moment pass HBM-bound —
~3.5 GB/step of pure optimizer-state traffic (read p,g,mu,nu; write
p,mu,nu), a measured 4.6 ms floor.  Storing mu/nu in bf16 cuts that state
traffic in half while all arithmetic stays f32:

    mu, nu are READ as f32 (upcast), updated in f32, STORED in bf16.

The torch-Adam semantics the training step reproduces
(reference: torch.optim.Adam inside src/model_wrapper.py:252-262) are
unchanged — only the storage precision of the running moments differs.
bf16 has 8 mantissa bits: the update direction mu/√nu sees a ~0.4% relative
perturbation, far below the gradient noise at any batch size used here;
convergence is validated against the f32 trajectory in
tests/test_training.py and scripts/train_scaled_demo.py.  f32 remains the
default (``TrainingConfig.ADAM_MOMENT_DTYPE``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

__all__ = ["scale_by_adam_moments"]


def scale_by_adam_moments(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    moment_dtype=None,
) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with mu AND nu stored in ``moment_dtype``.

    ``moment_dtype=None`` stores moments in each parameter's dtype
    (identical to stock optax) — use jnp.bfloat16 to halve optimizer-state
    HBM footprint and per-step traffic.  Updates are computed in f32
    regardless of storage dtype.
    """

    def cast(tree):
        if moment_dtype is None:
            return tree
        return jax.tree.map(lambda x: x.astype(moment_dtype), tree)

    def init_fn(params):
        mu = cast(jax.tree.map(jnp.zeros_like, params))
        nu = cast(jax.tree.map(jnp.zeros_like, params))
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu
        )

    def update_fn(updates, state, params=None):
        del params
        # arithmetic in f32: upcast stored moments, EMA, downcast for storage
        mu_f = jax.tree.map(
            lambda g, m: b1 * m.astype(jnp.float32) + (1.0 - b1) * g, updates, state.mu
        )
        nu_f = jax.tree.map(
            lambda g, v: b2 * v.astype(jnp.float32) + (1.0 - b2) * jnp.square(g),
            updates,
            state.nu,
        )
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        new_updates = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu_f, nu_f
        )
        return new_updates, optax.ScaleByAdamState(
            count=count, mu=cast(mu_f), nu=cast(nu_f)
        )

    return optax.GradientTransformation(init_fn, update_fn)
