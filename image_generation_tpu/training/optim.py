"""Optimizer transforms beyond stock optax.

``scale_by_adam_moments`` is optax.scale_by_adam with two opt-in storage
optimizations for the running moments.  Motivation (BENCHMARKS.md, runs/
scaled_attribution_dvae.json): at the scaled 5640-latent config the
decoder's 127M-param dense layer makes the Adam moment pass HBM-bound —
~3.5 GB/step of pure optimizer-state traffic (read p,g,mu,nu; write
p,mu,nu), a measured 4.6 ms floor.  Two independent levers shrink the
moment bytes while all arithmetic stays f32:

  * ``moment_dtype=bfloat16`` — mu (and any dense nu) are READ as f32
    (upcast), updated in f32, STORED in bf16.  Halves moment traffic.
  * ``factored_nu_min_size=N`` — the second moment of any 2-D parameter
    with ≥ N elements is stored FACTORED as its row/col means (the
    Adafactor rank-1 estimator, Shazeer & Stern 2018): two f32 vectors
    (rows,) + (cols,) replace the (rows, cols) matrix, so nu's HBM
    traffic for the 127M dense disappears entirely (~44 KB/step instead
    of ~1 GB f32).  The reconstruction nû_ij = r_i·c_j / mean(r) is
    materialized only inside the fused update expression (XLA never
    round-trips it through HBM).

The torch-Adam semantics the training step reproduces
(reference: torch.optim.Adam inside src/model_wrapper.py:252-262) are
unchanged in the default path — only the storage/estimation of the running
moments differs under the opt-ins.  bf16 has 8 mantissa bits: the update
direction mu/√nu sees a ~0.4% relative perturbation, far below the
gradient noise at any batch size used here.  The factored estimator is
EXACT whenever the g² EMA is rank-1 (tests/test_optim.py pins this) and
is the estimator billions-scale training runs on (Adafactor/T5);
convergence vs the f32 trajectory: scripts/compare_adam_moments.py.
f32 dense moments remain the default (``TrainingConfig.ADAM_MOMENT_DTYPE``,
``ADAM_FACTORED_NU``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["FactoredNu", "scale_by_adam_moments"]


class FactoredNu(NamedTuple):
    """Rank-1 factored second moment of one 2-D parameter: EMAs of the
    row-wise and column-wise means of g².  Reconstruction:
    nû = outer(row, col) / mean(row) (mean(row) == mean(col) == the EMA of
    the global mean of g², by linearity of the EMA)."""

    row: jax.Array  # (rows,) f32
    col: jax.Array  # (cols,) f32


def _is_nu_leaf(x):
    return isinstance(x, FactoredNu)


def scale_by_adam_moments(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    moment_dtype=None,
    factored_nu_min_size=None,
) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with configurable moment storage.

    ``moment_dtype=None`` stores dense moments in each parameter's dtype
    (identical to stock optax) — use jnp.bfloat16 to halve optimizer-state
    HBM footprint and per-step traffic.  ``factored_nu_min_size=N`` stores
    the second moment of 2-D parameters with ≥ N elements as a
    :class:`FactoredNu` row/col pair (always f32 — the vectors are tiny).
    Updates are computed in f32 regardless of storage.
    """

    def _factored(p) -> bool:
        return (
            factored_nu_min_size is not None
            and getattr(p, "ndim", 0) == 2
            and p.size >= factored_nu_min_size
        )

    def cast(tree):
        if moment_dtype is None:
            return tree
        return jax.tree.map(
            lambda x: x if _is_nu_leaf(x) else x.astype(moment_dtype),
            tree,
            is_leaf=_is_nu_leaf,
        )

    def init_fn(params):
        mu = cast(jax.tree.map(jnp.zeros_like, params))

        def init_nu(p):
            if _factored(p):
                return FactoredNu(
                    jnp.zeros(p.shape[0], jnp.float32),
                    jnp.zeros(p.shape[1], jnp.float32),
                )
            return jnp.zeros_like(p)

        nu = cast(jax.tree.map(init_nu, params))
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu
        )

    def update_fn(updates, state, params=None):
        del params
        # arithmetic in f32: upcast stored moments, EMA, downcast for storage
        mu_f = jax.tree.map(
            lambda g, m: b1 * m.astype(jnp.float32) + (1.0 - b1) * g, updates, state.mu
        )

        def nu_step(v, g):
            g2 = jnp.square(g.astype(jnp.float32))
            if _is_nu_leaf(v):
                return FactoredNu(
                    b2 * v.row + (1.0 - b2) * jnp.mean(g2, axis=1),
                    b2 * v.col + (1.0 - b2) * jnp.mean(g2, axis=0),
                )
            return b2 * v.astype(jnp.float32) + (1.0 - b2) * g2

        # nu tree leads the map: its FactoredNu nodes are the leaves
        nu_f = jax.tree.map(nu_step, state.nu, updates, is_leaf=_is_nu_leaf)
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def scaled_update(v, m):
            if _is_nu_leaf(v):
                # mean(row) is the EMA'd global mean of g²; guard the
                # all-zero first-step case (stock Adam there divides by
                # eps too — a zero mu keeps the update zero either way)
                mean = jnp.mean(v.row)
                v_hat = jnp.outer(v.row, v.col) / jnp.where(mean > 0, mean, 1.0)
            else:
                v_hat = v
            return (m / bc1) / (jnp.sqrt(v_hat / bc2) + eps)

        new_updates = jax.tree.map(scaled_update, nu_f, mu_f, is_leaf=_is_nu_leaf)
        return new_updates, optax.ScaleByAdamState(
            count=count, mu=cast(mu_f), nu=cast(nu_f)
        )

    return optax.GradientTransformation(init_fn, update_fn)
