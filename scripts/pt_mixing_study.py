"""Parallel tempering vs plain Gibbs on a frustrated spin glass.

Evidence for the production sampler choice (SURVEY.md §2b P2: the annealer's
negative phase is *replaced*, not emulated): on a frustrated random ±J
instance at cold temperature, single-temperature Gibbs gets trapped in
local minima, while the PT ladder's replica exchange keeps mixing — the
same reason the reference reaches for an annealer.  This study runs both
samplers with an EQUAL total chain budget (T×(C/T) PT chains vs C Gibbs
chains, same sweeps per round) and records the target-temperature energy
trajectory from random init.

Energies are the carried ladder energies (exact ΔE accumulation — the same
machinery the training step uses, ops/gibbs.py), so the curves cost no
extra energy matmuls.

Usage:  python scripts/pt_mixing_study.py [--n 256] [--rounds 200]
            [--beta-target 2.0] [--out runs/pt_mixing_study.json]

CPU-friendly (~1 min at the defaults); pass --platform axon for the chip.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import jax


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256, help="spin-glass size")
    ap.add_argument("--chains", type=int, default=256, help="total chains")
    ap.add_argument("--betas", type=int, default=8, help="PT ladder size")
    ap.add_argument("--rounds", type=int, default=200)
    ap.add_argument("--sweeps-per-round", type=int, default=4)
    ap.add_argument("--beta-target", type=float, default=2.0)
    ap.add_argument("--beta-min", type=float, default=0.2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tune-iters", type=int, default=3,
                    help="equal-barrier feedback iterations (ops/pt_tune.py)")
    ap.add_argument("--out", default="runs/pt_mixing_study.json")
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from image_generation_tpu.models.grbm import GRBMGraph
    from image_generation_tpu.ops.gibbs import (
        build_plan,
        gibbs_sweeps,
        ising_energies,
        permuted_model,
        pt_round,
        random_spins,
    )
    from image_generation_tpu.utils.subgraph import select_latent_graph
    from image_generation_tpu.utils.topology import zephyr_graph

    # frustrated instance: random ±J couplings, no fields, on a real QPU
    # subgraph (the same graph family the GRBM trains on)
    latent, _ = select_latent_graph(zephyr_graph(4), args.n, args.seed)
    graph = GRBMGraph.from_networkx(latent)
    rng = np.random.RandomState(args.seed)
    quad = jnp.asarray(rng.choice([-1.0, 1.0], graph.n_edges).astype(np.float32))
    h = jnp.zeros(graph.n, jnp.float32)
    plan = build_plan(graph)
    hp, coupling = permuted_model(plan, h, quad)

    t_dim = args.betas
    c_pt = args.chains // t_dim  # equal total chain budget: T × (C/T) vs C
    betas = jnp.geomspace(args.beta_min, args.beta_target, t_dim)
    rounds, spr = args.rounds, args.sweeps_per_round
    key = jax.random.PRNGKey(args.seed)
    k_g, k_p, k_run = jax.random.split(key, 3)

    @jax.jit
    def run_gibbs(key, s0):
        e0 = ising_energies(hp, coupling, s0)

        def body(carry, k):
            s, e = carry
            s, de = gibbs_sweeps(
                k, hp, coupling, plan, s, spr,
                beta=args.beta_target, track_delta_e=True,
            )
            e = e + de
            return (s, e), (e.mean(), e.min())

        (_, e_fin), (means, mins) = jax.lax.scan(
            body, (s0, e0), jax.random.split(key, rounds)
        )
        return means, mins, e_fin

    @jax.jit
    def run_pt(key, ladder0, bs):
        e0 = ising_energies(hp, coupling, ladder0)

        def body(carry, k):
            s, e = pt_round(
                k, hp, coupling, plan, carry[0], bs, spr,
                energies=carry[1], return_energies=True,
            )
            return (s, e), (e[-1].mean(), e[-1].min())

        (_, e_fin), (means, mins) = jax.lax.scan(
            body, (ladder0, e0), jax.random.split(key, rounds)
        )
        return means, mins, e_fin[-1]

    # third arm: the SAME ladder size/budget, rung placement tuned by the
    # equal-barrier feedback schedule (ops/pt_tune.py) instead of geomspace
    from image_generation_tpu.ops.pt_tune import round_trip_count, tune_pt_betas

    t0 = time.perf_counter()
    tuned, diag_geo, diag_tuned = tune_pt_betas(
        jax.random.fold_in(key, 3), hp, coupling, plan, np.asarray(betas),
        n_iters=args.tune_iters, n_chains=min(args.chains, 256),
    )
    tune_wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    s0 = random_spins(k_g, plan, args.chains)
    g_mean, g_min, g_e = run_gibbs(k_run, s0)
    l0 = random_spins(k_p, plan, t_dim * c_pt).reshape(t_dim, c_pt, plan.n_pad)
    p_mean, p_min, p_e = run_pt(k_run, l0, betas)
    t_mean, t_min, t_e = run_pt(k_run, l0, jnp.asarray(tuned, jnp.float32))
    (trips_geo, cover_geo), (trips_tuned, cover_tuned) = round_trip_count(
        k_run, hp, coupling, plan, [np.asarray(betas), tuned], c_pt, rounds, spr
    )
    g_mean, g_min, p_mean, p_min, t_mean, t_min = map(
        np.asarray, (g_mean, g_min, p_mean, p_min, t_mean, t_min)
    )
    wall = time.perf_counter() - t0

    summary = {
        "final_mean_e_gibbs": float(g_mean[-1]),
        "final_mean_e_pt": float(p_mean[-1]),
        "final_mean_e_pt_tuned": float(t_mean[-1]),
        "best_e_gibbs": float(g_min.min()),
        "best_e_pt": float(p_min.min()),
        "best_e_pt_tuned": float(t_min.min()),
        # mean over the equilibrated tail (last quarter of the run)
        "tail_mean_e_gibbs": float(g_mean[-rounds // 4:].mean()),
        "tail_mean_e_pt": float(p_mean[-rounds // 4:].mean()),
        "tail_mean_e_pt_tuned": float(t_mean[-rounds // 4:].mean()),
        # ladder-quality diagnostics (ops/pt_tune.py): per-pair swap
        # acceptance spread before/after equal-barrier re-spacing
        "accept_geomspace_min": float(diag_geo.accept.min()),
        "accept_geomspace_std": float(np.std(diag_geo.accept)),
        "accept_tuned_min": float(diag_tuned.accept.min()),
        "accept_tuned_std": float(np.std(diag_tuned.accept)),
        # completed hot→cold→hot replica round trips over the whole run,
        # and mean ladder coverage (fraction of rungs each replica visited)
        "round_trips_geomspace": trips_geo,
        "round_trips_tuned": trips_tuned,
        "ladder_coverage_geomspace": round(cover_geo, 4),
        "ladder_coverage_tuned": round(cover_tuned, 4),
    }
    summary["pt_mixes_better"] = (
        summary["tail_mean_e_pt"] < summary["tail_mean_e_gibbs"]
        and summary["best_e_pt"] <= summary["best_e_gibbs"]
    )
    out = {
        "config": {
            "n_spins": graph.n, "n_edges": graph.n_edges,
            "chains_gibbs": args.chains, "pt_ladder": [t_dim, c_pt],
            "rounds": rounds, "sweeps_per_round": spr,
            "beta_target": args.beta_target, "beta_min": args.beta_min,
            "instance": "random +-J, h=0", "seed": args.seed,
            "tune_iters": args.tune_iters,
        },
        "tuned_betas": [round(float(b), 5) for b in tuned],
        "per_round": {
            "gibbs_mean_e": [round(float(x), 3) for x in g_mean],
            "pt_target_mean_e": [round(float(x), 3) for x in p_mean],
            "pt_tuned_target_mean_e": [round(float(x), 3) for x in t_mean],
        },
        "summary": summary,
        "wall_s": round(wall, 1),
        "tune_wall_s": round(tune_wall, 1),
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(
        f"{graph.n} spins / {graph.n_edges} +-J couplers, beta={args.beta_target}: "
        f"tail mean E  gibbs {summary['tail_mean_e_gibbs']:.1f}  "
        f"pt {summary['tail_mean_e_pt']:.1f}  "
        f"pt-tuned {summary['tail_mean_e_pt_tuned']:.1f}   best E  gibbs "
        f"{summary['best_e_gibbs']:.1f}  pt {summary['best_e_pt']:.1f}  "
        f"pt-tuned {summary['best_e_pt_tuned']:.1f}   "
        f"pt_mixes_better={summary['pt_mixes_better']}  ({wall:.1f}s)"
    )
    print(
        f"ladder acceptance min/std: geomspace "
        f"{summary['accept_geomspace_min']:.3f}/{summary['accept_geomspace_std']:.3f}"
        f" -> tuned {summary['accept_tuned_min']:.3f}/"
        f"{summary['accept_tuned_std']:.3f}  (tune {tune_wall:.1f}s)"
    )
    print(
        f"replica round trips ({rounds} rounds x {c_pt} columns): "
        f"geomspace {trips_geo}  tuned {trips_tuned}   ladder coverage: "
        f"geomspace {cover_geo:.3f}  tuned {cover_tuned:.3f}"
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
