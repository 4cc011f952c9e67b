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
    ising_energies,
    pt_round,
    random_spins,
)

__all__ = [
    "PTLadderDiagnostics",
    "make_acceptance_measurer",
    "recommend_num_betas",
    "respace_betas",
    "round_trip_count",
    "size_ladder",
    "swap_acceptance",
    "tune_pt_betas",
]


class PTLadderDiagnostics(NamedTuple):
    betas: np.ndarray        # (T,) the ladder measured/produced
    accept: np.ndarray       # (T-1,) mean swap acceptance per adjacent pair
    barrier: float           # Λ(1) = Σ rejection — lower is better mixing


def make_acceptance_measurer(
    hp: jax.Array,
    coupling_p,
    plan: GibbsPlan,
    t_dim: int,
    n_chains: int = 256,
    n_rounds: int = 24,
    sweeps_per_round: int = 2,
    burn_rounds: int = 8,
    matmul_dtype=None,
    sweeps_fn=None,
    energies_fn=None,
):
    """Build the jitted (key, flat_spins, betas) → (spins, accept) kernel.

    The measurement runs the REAL exchanging process — ``pt_round`` with
    carried energies and its free analytic acceptance output — not
    independent tempering chains: without the swaps, cold rungs burned in
    from random init sit in a metastable ensemble whose acceptance curve
    differs from PT equilibrium exactly on the glassy models the tuner
    targets.

    Betas are a TRACED argument, so successive tuner iterations (same T,
    different rung values) reuse ONE compilation — essential on the
    remote-TPU relay where each compile costs 60-150 s at scale.  Reused
    across ``swap_acceptance`` calls via the ``measurer=`` parameter
    (``tune_pt_betas`` does this automatically).

    ``sweeps_fn``/``energies_fn``: optional layout overrides with the
    ``pt_round`` contracts — beyond-HBM models pass the graph-sharded
    sweep and reduce_scatter energies (ops/gibbs_graph_sharded.py) so the
    tuner never materializes the coupling whole, exactly like training.
    """

    @jax.jit
    def rounds(key, flat, b):
        """burn + measure: returns final state and mean pair acceptance."""
        ladder0 = flat.reshape(t_dim, n_chains, flat.shape[-1])
        if energies_fn is not None:
            e0 = energies_fn(hp, coupling_p, ladder0)
        else:
            e0 = ising_energies(hp, coupling_p, ladder0, matmul_dtype)

        def one(carry, k):
            s, e, acc, measuring = carry
            s, e, pair_acc = pt_round(
                k, hp, coupling_p, plan, s, b, sweeps_per_round,
                matmul_dtype=matmul_dtype, energies=e, return_accept=True,
                sweeps_fn=sweeps_fn, energies_fn=energies_fn,
            )
            return (s, e, acc + measuring * pair_acc, measuring), None

        acc0 = jnp.zeros((t_dim - 1,), jnp.float32)
        (s, e, _, _), _ = jax.lax.scan(
            one, (ladder0, e0, acc0, jnp.float32(0.0)),
            jax.random.split(jax.random.fold_in(key, 0), burn_rounds),
        )
        (s, _, acc, _), _ = jax.lax.scan(
            one, (s, e, acc0, jnp.float32(1.0)),
            jax.random.split(jax.random.fold_in(key, 1), n_rounds),
        )
        return s.reshape(flat.shape), acc / n_rounds

    return rounds


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
    measurer=None,
    sweeps_fn=None,
    energies_fn=None,
) -> PTLadderDiagnostics:
    """Estimate per-pair swap acceptance E[min(1, e^{Δβ·ΔE})] at ``betas``.

    Runs a real PT ladder (sweeps at every rung; the acceptance estimator
    averages the analytic per-chain acceptance probability, which has far
    lower variance than counting realized swaps).  ``measurer``: a
    ``make_acceptance_measurer`` kernel to reuse across calls (must have
    been built with the same model and T/chain/round parameters).
    ``sweeps_fn``/``energies_fn`` forward to ``make_acceptance_measurer``
    (graph-sharded layouts).
    """
    betas = np.asarray(betas, np.float64)
    t_dim = len(betas)
    if measurer is None:
        measurer = make_acceptance_measurer(
            hp, coupling_p, plan, t_dim, n_chains, n_rounds,
            sweeps_per_round, burn_rounds, matmul_dtype,
            sweeps_fn=sweeps_fn, energies_fn=energies_fn,
        )
    k_init, k_run = jax.random.split(key)
    flat0 = random_spins(k_init, plan, t_dim * n_chains)
    _, acc = measurer(k_run, flat0, jnp.asarray(betas, jnp.float32))
    acc = np.clip(np.asarray(acc, np.float64), 1e-4, 1.0)
    return PTLadderDiagnostics(
        betas=betas, accept=acc, barrier=float(np.sum(1.0 - acc))
    )


def round_trip_count(
    key: jax.Array,
    hp: jax.Array,
    coupling_p,
    plan: GibbsPlan,
    betas,
    n_chains: int,
    n_rounds: int,
    sweeps_per_round: int = 2,
    matmul_dtype=None,
    sweeps_fn=None,
    energies_fn=None,
):
    """Replica-flow diagnostics: completed hot→cold→hot round trips (the
    gold standard — a ladder with a dead swap pair scores ~0 regardless of
    its per-pair acceptances elsewhere) plus mean LADDER COVERAGE, the
    average fraction of the ladder each replica visited
    (mean (max_row − min_row)/(T−1)).  Coverage resolves partial flow when
    the run is shorter than a diffusive round-trip time (≈ T²/accept
    rounds — thousands at T=32), where trip counts are all zero.

    Per-replica labels (direction, min/max row reached) ride ``pt_round``'s
    aux permutation; energies are carried (one initial ``ising_energies``,
    ΔE-tracked thereafter).  ``betas`` may be one (T,) ladder (→ one
    ``(round_trips, coverage)`` tuple) or a list of same-T ladders (→ list
    of tuples, sharing one compilation and one initial state).
    """
    # accepts one ladder or a list of same-length ladders — the compiled
    # runner (betas traced) is shared across them, so comparing arms of
    # equal T costs one compile on the relay
    many = isinstance(betas, (list, tuple)) and np.ndim(betas[0]) == 1
    ladders = [jnp.asarray(b, jnp.float32) for b in (betas if many else [betas])]
    t_dim = int(ladders[0].shape[0])
    assert all(int(b.shape[0]) == t_dim for b in ladders)

    @jax.jit
    def run(key, ladder0, bs):
        if energies_fn is not None:
            e0 = energies_fn(hp, coupling_p, ladder0)
        else:
            e0 = ising_energies(hp, coupling_p, ladder0, matmul_dtype)
        rows = jnp.arange(t_dim)[:, None] * jnp.ones((1, n_chains), jnp.int32)

        def body(carry, k):
            s, e, aux, trips = carry
            s, e, aux = pt_round(
                k, hp, coupling_p, plan, s, bs, sweeps_per_round,
                matmul_dtype=matmul_dtype, energies=e, aux=aux,
                sweeps_fn=sweeps_fn, energies_fn=energies_fn,
            )
            direc = aux["dir"]
            direc = jnp.where((rows == t_dim - 1) & (direc == 1), -1, direc)
            arrived = (rows == 0) & (direc == -1)
            trips = trips + arrived.sum()
            direc = jnp.where(rows == 0, 1, direc)
            aux = {
                "dir": direc,
                "rmin": jnp.minimum(aux["rmin"], rows),
                "rmax": jnp.maximum(aux["rmax"], rows),
            }
            return (s, e, aux, trips), None

        aux0 = {
            "dir": jnp.zeros((t_dim, n_chains), jnp.int32).at[0].set(1),
            "rmin": rows,
            "rmax": rows,
        }
        (_, _, aux, trips), _ = jax.lax.scan(
            body, (ladder0, e0, aux0, jnp.int32(0)),
            jax.random.split(key, n_rounds),
        )
        coverage = jnp.mean((aux["rmax"] - aux["rmin"]) / (t_dim - 1))
        return trips, coverage

    k_init, k_run = jax.random.split(key)
    ladder0 = random_spins(k_init, plan, t_dim * n_chains).reshape(
        t_dim, n_chains, plan.n_pad
    )
    out = [run(k_run, ladder0, b) for b in ladders]
    out = [(int(t), float(c)) for t, c in out]
    return out if many else out[0]


def recommend_num_betas(
    accept, target_accept: float = 0.5, t_min: int = 2, t_max: int = 64
) -> int:
    """Rung count for an equal-barrier ladder whose per-pair swap
    acceptance is ≥ ``target_accept``, from ANY measured per-pair
    acceptance curve.

    The communication barrier Λ = Σ(1−a_k) is (to first order) a property
    of the MODEL, not of the ladder it was measured on: re-spacing moves
    rejection between pairs but conserves the sum (Syed et al. 2021, §3).
    An equal-barrier ladder with T rungs carries Λ/(T−1) rejection per
    pair, so Λ/(T−1) ≤ 1−target ⇒ T = ⌈Λ/(1−target)⌉ + 1.

    This is the sizing rule behind ``TrainingConfig.PT_NUM_BETAS="auto"``
    (probe-measured via ``size_ladder``) and the free end-of-epoch ladder
    recommendation (``Trainer.train_epoch`` feeds it the step's
    ``StepMetrics.pt_accept`` — the metric that showed the scaled bench's
    T=32 ladder was 10× over-provisioned, runs/scaled_train_adapt_t8.json).
    """
    accept = np.clip(np.asarray(accept, np.float64), 0.0, 1.0)
    barrier = float(np.sum(1.0 - accept))
    t = int(np.ceil(barrier / max(1e-9, 1.0 - float(target_accept)))) + 1
    return int(np.clip(t, t_min, t_max))


def size_ladder(
    key: jax.Array,
    hp: jax.Array,
    coupling_p,
    plan: GibbsPlan,
    *,
    beta_min: float,
    t_probe: int = 16,
    target_accept: float = 0.5,
    t_min: int = 2,
    t_max: int = 64,
    n_chains: int = 128,
    n_rounds: int = 16,
    sweeps_per_round: int = 2,
    burn_rounds: int = 8,
    matmul_dtype=None,
    sweeps_fn=None,
    energies_fn=None,
) -> tuple[np.ndarray, PTLadderDiagnostics]:
    """Pick the PT rung count AND ladder for a model from a short
    acceptance probe (the ``PT_NUM_BETAS="auto"`` backend).

    Measures per-pair acceptance on a ``t_probe``-rung geometric probe over
    [beta_min, 1], sizes T with ``recommend_num_betas``, and places the T
    rungs at the probe's equal-barrier quantiles (the same piecewise-linear
    Λ inversion as ``respace_betas``, but onto a different rung count).  If
    the probe itself has a near-dead pair (min acceptance < 0.05) its Λ is
    only a lower bound, so the probe is densified once (2×, capped at
    ``t_max``) before sizing.

    Returns ``(betas, probe_diag)`` — betas is a strictly ascending (T,)
    ladder ending at exactly 1.0.
    """
    t_probe = int(np.clip(t_probe, 4, t_max))
    for _ in range(2):
        probe = np.geomspace(beta_min, 1.0, t_probe)
        key, k = jax.random.split(key)
        diag = swap_acceptance(
            k, hp, coupling_p, plan, probe, n_chains, n_rounds,
            sweeps_per_round, burn_rounds, matmul_dtype=matmul_dtype,
            sweeps_fn=sweeps_fn, energies_fn=energies_fn,
        )
        if float(diag.accept.min()) >= 0.05 or t_probe >= t_max:
            break
        t_probe = min(2 * t_probe, t_max)
    t_dim = recommend_num_betas(diag.accept, target_accept, t_min, t_max)
    rej = np.maximum(1.0 - diag.accept, 1e-4)
    lam = np.concatenate([[0.0], np.cumsum(rej)])
    betas = np.interp(np.linspace(0.0, lam[-1], t_dim), lam, probe)
    betas[0], betas[-1] = probe[0], 1.0
    return betas, diag


def respace_betas(betas, accept) -> np.ndarray:
    """Equal-barrier re-spacing: piecewise-linear Λ(β) through the rungs,
    interior rungs moved to the equal-Λ quantiles (endpoints fixed).

    One iteration of the feedback schedule, given per-pair acceptances from
    ANY source — the offline tuner's measurement (``swap_acceptance``) or
    the training step's free ``pt_accept`` metric (PT_ADAPT,
    training/trainer.py)."""
    betas = np.asarray(betas, np.float64)
    accept = np.clip(np.asarray(accept, np.float64), 1e-4, 1.0)
    t_dim = len(betas)
    rej = np.maximum(1.0 - accept, 1e-4)  # keep Λ strictly increasing
    lam = np.concatenate([[0.0], np.cumsum(rej)])
    targets = np.linspace(0.0, lam[-1], t_dim)
    # invert the piecewise-linear Λ: β'(target) by interpolation in Λ
    new = np.interp(targets, lam, betas)
    new[0], new[-1] = betas[0], betas[-1]
    return new


_respace = respace_betas  # internal alias (tuner loop)


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
    sweeps_fn=None,
    energies_fn=None,
) -> tuple[np.ndarray, PTLadderDiagnostics, PTLadderDiagnostics]:
    """Iteratively equalize the PT ladder's swap acceptance.

    Returns ``(betas_tuned, diag_before, diag_after)`` — plug the tuned
    ladder into ``TrainingConfig.PT_BETAS``.  ``sweeps_fn``/``energies_fn``
    route the measurement through an alternative sampler layout (the
    graph-sharded beyond-HBM path) — the one compiled measurer carries
    them through every iteration.
    """
    betas = np.asarray(betas0, np.float64)
    # one compiled measurement kernel for every iteration (betas traced)
    measurer = make_acceptance_measurer(
        hp, coupling_p, plan, len(betas), n_chains, n_rounds,
        sweeps_per_round, matmul_dtype=matmul_dtype,
        sweeps_fn=sweeps_fn, energies_fn=energies_fn,
    )
    diag0 = None
    diag = None
    for it in range(n_iters):
        key, k = jax.random.split(key)
        diag = swap_acceptance(
            k, hp, coupling_p, plan, betas, n_chains, n_rounds,
            sweeps_per_round, matmul_dtype=matmul_dtype, measurer=measurer,
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
        sweeps_per_round, matmul_dtype=matmul_dtype, measurer=measurer,
    )
    if verbose:
        print(
            f"tuned: acc min/mean/max = {diag_final.accept.min():.3f}/"
            f"{diag_final.accept.mean():.3f}/{diag_final.accept.max():.3f} "
            f"barrier={diag_final.barrier:.3f}"
        )
    return betas, diag0, diag_final
