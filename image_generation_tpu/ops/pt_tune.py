"""Feedback-optimized parallel-tempering ladders (offline tuner).

The training/serving PT ladder defaults to geometric β spacing
(``jnp.geomspace(PT_BETA_MIN, 1, T)``, training/step.py), which is optimal
only for roughly constant specific heat.  On rough energy landscapes the
swap acceptance then collapses at the β range where the model orders, and
replicas stop round-tripping exactly where mixing is needed most (this is
the regime the reference outsources to the physical annealer; the
PT-vs-Gibbs stake is measured in runs/pt_mixing_study.json).

This module implements the standard communication-barrier schedule tuning
(as in feedback-optimized PT / Syed et al., "non-reversible parallel
tempering", JRSS-B 2021, §5 — public method):

  1. run PT rounds at the current ladder and estimate the per-pair swap
     REJECTION rate r_t = 1 − E[min(1, e^{Δβ·ΔE})];
  2. the cumulative rejection Λ(β) (piecewise-linear in β through the
     current rungs) approximates the communication barrier;
  3. re-space the interior rungs so every adjacent pair carries an equal
     barrier share: Λ(β'_k) = k·Λ(1)/(T−1), keeping β endpoints fixed.

Iterating 2-4 times equalizes acceptance across the ladder, which
maximizes the round-trip rate at fixed T.  The tuned ladder is plugged in
via ``TrainingConfig.PT_BETAS`` (overrides the geomspace default).

This is an OFFLINE utility (host loop, one jit per iteration) — the hot
path still consumes a fixed ladder.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from image_generation_tpu.ops.gibbs import (
    GibbsPlan,
    gibbs_sweeps,
    ising_energies,
    random_spins,
)

__all__ = ["PTLadderDiagnostics", "swap_acceptance", "tune_pt_betas"]


class PTLadderDiagnostics(NamedTuple):
    betas: np.ndarray        # (T,) the ladder measured/produced
    accept: np.ndarray       # (T-1,) mean swap acceptance per adjacent pair
    barrier: float           # Λ(1) = Σ rejection — lower is better mixing


def swap_acceptance(
    key: jax.Array,
    hp: jax.Array,
    coupling_p,
    plan: GibbsPlan,
    betas: np.ndarray,
    n_chains: int = 256,
    n_rounds: int = 24,
    sweeps_per_round: int = 2,
    burn_rounds: int = 8,
    matmul_dtype=None,
) -> PTLadderDiagnostics:
    """Estimate per-pair swap acceptance E[min(1, e^{Δβ·ΔE})] at ``betas``.

    Runs a real PT ladder (sweeps at every rung; the acceptance estimator
    averages the analytic per-chain acceptance probability, which has far
    lower variance than counting realized swaps).
    """
    betas = np.asarray(betas, np.float64)
    t_dim = len(betas)
    b = jnp.asarray(betas, jnp.float32)
    beta_per_chain = jnp.repeat(b, n_chains)

    @jax.jit
    def rounds(key, flat):
        """burn + measure: returns final state and summed pair acceptance."""

        def one(carry, k):
            flat, acc, measuring = carry
            flat = gibbs_sweeps(
                k, hp, coupling_p, plan, flat, sweeps_per_round,
                beta_per_chain, matmul_dtype=matmul_dtype,
            )
            e = ising_energies(hp, coupling_p, flat, matmul_dtype).reshape(
                t_dim, n_chains
            )
            delta = (b[:-1] - b[1:])[:, None] * (e[:-1] - e[1:])
            acc = acc + measuring * jnp.mean(
                jnp.minimum(1.0, jnp.exp(delta)), axis=1
            )
            return (flat, acc, measuring), None

        acc0 = jnp.zeros((t_dim - 1,), jnp.float32)
        (flat, _, _), _ = jax.lax.scan(
            one, (flat, acc0, jnp.float32(0.0)),
            jax.random.split(jax.random.fold_in(key, 0), burn_rounds),
        )
        (flat, acc, _), _ = jax.lax.scan(
            one, (flat, acc0, jnp.float32(1.0)),
            jax.random.split(jax.random.fold_in(key, 1), n_rounds),
        )
        return flat, acc / n_rounds

    k_init, k_run = jax.random.split(key)
    flat0 = random_spins(k_init, plan, t_dim * n_chains)
    _, acc = rounds(k_run, flat0)
    acc = np.clip(np.asarray(acc, np.float64), 1e-4, 1.0)
    return PTLadderDiagnostics(
        betas=betas, accept=acc, barrier=float(np.sum(1.0 - acc))
    )


def _respace(betas: np.ndarray, accept: np.ndarray) -> np.ndarray:
    """Equal-barrier re-spacing: piecewise-linear Λ(β) through the rungs,
    interior rungs moved to the equal-Λ quantiles (endpoints fixed)."""
    t_dim = len(betas)
    rej = np.maximum(1.0 - accept, 1e-4)  # keep Λ strictly increasing
    lam = np.concatenate([[0.0], np.cumsum(rej)])
    targets = np.linspace(0.0, lam[-1], t_dim)
    # invert the piecewise-linear Λ: β'(target) by interpolation in Λ
    new = np.interp(targets, lam, betas)
    new[0], new[-1] = betas[0], betas[-1]
    return new


def tune_pt_betas(
    key: jax.Array,
    hp: jax.Array,
    coupling_p,
    plan: GibbsPlan,
    betas0,
    n_iters: int = 3,
    n_chains: int = 256,
    n_rounds: int = 24,
    sweeps_per_round: int = 2,
    matmul_dtype=None,
    verbose: bool = False,
) -> tuple[np.ndarray, PTLadderDiagnostics, PTLadderDiagnostics]:
    """Iteratively equalize the PT ladder's swap acceptance.

    Returns ``(betas_tuned, diag_before, diag_after)`` — plug the tuned
    ladder into ``TrainingConfig.PT_BETAS``.
    """
    betas = np.asarray(betas0, np.float64)
    diag0 = None
    diag = None
    for it in range(n_iters):
        key, k = jax.random.split(key)
        diag = swap_acceptance(
            k, hp, coupling_p, plan, betas, n_chains, n_rounds,
            sweeps_per_round, matmul_dtype=matmul_dtype,
        )
        if diag0 is None:
            diag0 = diag
        if verbose:
            print(
                f"iter {it}: acc min/mean/max = {diag.accept.min():.3f}/"
                f"{diag.accept.mean():.3f}/{diag.accept.max():.3f} "
                f"barrier={diag.barrier:.3f}"
            )
        betas = _respace(betas, diag.accept)
    key, k = jax.random.split(key)
    diag_final = swap_acceptance(
        k, hp, coupling_p, plan, betas, n_chains, n_rounds,
        sweeps_per_round, matmul_dtype=matmul_dtype,
    )
    if verbose:
        print(
            f"tuned: acc min/mean/max = {diag_final.accept.min():.3f}/"
            f"{diag_final.accept.mean():.3f}/{diag_final.accept.max():.3f} "
            f"barrier={diag_final.barrier:.3f}"
        )
    return betas, diag0, diag_final
