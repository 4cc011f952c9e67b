"""Colored block-Gibbs sampling for Ising models — pure-JAX reference path.

This is the TPU-native replacement for the reference's quantum-annealer
negative phase (reference call sites: src/model_wrapper.py:308-316,
src/utils/persistent_qpu_sampler.py:71-78).  Instead of one HTTPS round-trip
to a QPU per batch, sampling is an on-device XLA program:

  * the coupling graph is properly colored (utils/coloring.py); all spins of
    one color are conditionally independent given the rest, so a color-class
    update is one dense (chains × n)·(n × class_size) matmul (MXU) plus a
    vectorized Bernoulli draw (VPU);
  * a sweep scans the color classes; chains are batched along the leading
    axis (the reference's ``num_reads`` becomes the chain count);
  * parallel tempering runs a ladder of inverse temperatures with
    even/odd-pair replica exchange, so cold chains mix even for stiff models.

Everything here is shape-static and jit/vmap/shard_map friendly.  The Pallas
kernel in ``ops/gibbs_pallas.py`` implements the same math fused into VMEM;
this module is the semantic reference (validated against exact enumeration
in tests) and the CPU/interpret fallback.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.utils.coloring import color_classes

__all__ = [
    "GibbsPlan",
    "build_plan",
    "gibbs_sweeps",
    "ising_energies",
    "pt_round",
    "pt_sample",
]


@dataclass(frozen=True)
class GibbsPlan:
    """Static sampling plan for one coupling graph.

    Hashable by identity so jitted samplers can close over it.
    """

    n: int
    n_colors: int
    class_size: int
    idx: np.ndarray  # (n_colors, class_size) int32; padding slots hold n
    valid: np.ndarray  # (n_colors, class_size) bool

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def build_plan(graph: GRBMGraph, pad_to: int = 128) -> GibbsPlan:
    cc = color_classes(graph.to_networkx(), pad_to=pad_to)
    return GibbsPlan(
        n=cc.n,
        n_colors=cc.n_colors,
        class_size=cc.class_size,
        idx=cc.indices,
        valid=cc.valid,
    )


def ising_energies(h: jax.Array, coupling: jax.Array, spins: jax.Array) -> jax.Array:
    """E(s) = h·s + ½ sᵀ A s for dense symmetric zero-diagonal A.

    ``spins``: (..., n) → (...,).
    """
    return spins @ h + 0.5 * jnp.sum(spins * (spins @ coupling), axis=-1)


def gibbs_sweeps(
    key: jax.Array,
    h: jax.Array,
    coupling: jax.Array,
    plan: GibbsPlan,
    spins: jax.Array,
    n_sweeps: int,
    beta: jax.Array | float = 1.0,
) -> jax.Array:
    """Run ``n_sweeps`` systematic color-scan Gibbs sweeps.

    Args:
      key: PRNG key.
      h: (n,) fields of the model being sampled (already prefactor-scaled
        and range-clipped — see ``models.grbm.scaled_ising``).
      coupling: (n, n) dense symmetric coupling matrix (zero diagonal).
      plan: static coloring plan for the graph.
      spins: (chains, n) current state in {-1, +1}.
      n_sweeps: number of full sweeps (static).
      beta: inverse temperature, scalar or (chains,) for tempered chains.

    Returns:
      (chains, n) updated spins.  Conditional update rule: the local field is
      f_i = h_i + Σ_j A_ij s_j and p(s_i = +1 | rest) = σ(−2 β f_i), the
      Boltzmann conditional of E(s) = h·s + ½ sᵀAs.
    """
    beta = jnp.asarray(beta, dtype=spins.dtype)
    if beta.ndim == 0:
        beta_col = beta
    else:
        beta_col = beta[:, None]
    idx_all = jnp.asarray(plan.idx)

    def color_step(s, xs):
        idx, k = xs
        a_cols = jnp.take(coupling, idx, axis=1, mode="fill", fill_value=0.0)
        h_c = jnp.take(h, idx, mode="fill", fill_value=0.0)
        fields = s @ a_cols + h_c  # (chains, class_size)
        p_plus = jax.nn.sigmoid(-2.0 * beta_col * fields)
        u = jax.random.uniform(k, fields.shape, dtype=fields.dtype)
        new = jnp.where(u < p_plus, 1.0, -1.0).astype(s.dtype)
        s = s.at[:, idx].set(new, mode="drop")
        return s, None

    def sweep(s, k_sweep):
        ks = jax.random.split(k_sweep, plan.n_colors)
        s, _ = jax.lax.scan(color_step, s, (idx_all, ks))
        return s, None

    spins, _ = jax.lax.scan(sweep, spins, jax.random.split(key, n_sweeps))
    return spins


# ---------------------------------------------------------------------------
# Parallel tempering
# ---------------------------------------------------------------------------

def pt_round(
    key: jax.Array,
    h: jax.Array,
    coupling: jax.Array,
    plan: GibbsPlan,
    spins: jax.Array,
    betas: jax.Array,
    sweeps_per_round: int,
) -> jax.Array:
    """One PT round: Gibbs sweeps at every temperature + replica exchange.

    Args:
      spins: (T, C, n) — T temperatures × C chains each.
      betas: (T,) ascending inverse temperatures (betas[-1] is the target).

    Replica exchange: adjacent pairs (t, t+1) attempt a configuration swap
    accepted with probability min(1, exp((β_t − β_{t+1})(E_t − E_{t+1}))),
    even pairs then odd pairs, each chain column independently.
    """
    t_dim, c_dim, n = spins.shape
    k_sweep, k_even, k_odd = jax.random.split(key, 3)

    flat = spins.reshape(t_dim * c_dim, n)
    beta_per_chain = jnp.repeat(betas, c_dim)
    flat = gibbs_sweeps(k_sweep, h, coupling, plan, flat, sweeps_per_round, beta_per_chain)
    spins = flat.reshape(t_dim, c_dim, n)

    def swap_pass(s, k, parity):
        e = ising_energies(h, coupling, s)  # (T, C)
        delta = (betas[:-1] - betas[1:])[:, None] * (e[:-1] - e[1:])  # (T-1, C)
        u = jax.random.uniform(k, delta.shape)
        pair_mask = (jnp.arange(t_dim - 1) % 2 == parity)[:, None]
        accept = (jnp.log(u) < delta) & pair_mask  # (T-1, C)
        # swap_next[t]: row t swaps with t+1; swap_prev[t]: with t-1
        pad = jnp.zeros((1, c_dim), dtype=bool)
        swap_next = jnp.concatenate([accept, pad], axis=0)  # (T, C)
        swap_prev = jnp.concatenate([pad, accept], axis=0)  # (T, C)
        s_next = jnp.roll(s, -1, axis=0)
        s_prev = jnp.roll(s, 1, axis=0)
        return jnp.where(
            swap_next[..., None], s_next, jnp.where(swap_prev[..., None], s_prev, s)
        )

    spins = swap_pass(spins, k_even, 0)
    spins = swap_pass(spins, k_odd, 1)
    return spins


def pt_sample(
    key: jax.Array,
    h: jax.Array,
    coupling: jax.Array,
    plan: GibbsPlan,
    n_chains: int,
    betas: jax.Array,
    n_rounds: int,
    sweeps_per_round: int,
    init_spins: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Full parallel-tempering run from (optionally persistent) chain state.

    Returns (target_spins, all_spins): the (C, n) samples at the target
    temperature betas[-1], and the full (T, C, n) ladder state for
    persistence across calls (the fixed version of the reference's dead
    persistent-sample deque, src/utils/persistent_qpu_sampler.py:61-63).
    """
    t_dim = betas.shape[0]
    k_init, key = jax.random.split(key)
    if init_spins is None:
        init_spins = (
            2.0
            * jax.random.bernoulli(k_init, 0.5, (t_dim, n_chains, h.shape[0])).astype(
                jnp.float32
            )
            - 1.0
        )

    def round_fn(s, k):
        return pt_round(k, h, coupling, plan, s, betas, sweeps_per_round), None

    spins, _ = jax.lax.scan(round_fn, init_spins, jax.random.split(key, n_rounds))
    return spins[-1], spins
