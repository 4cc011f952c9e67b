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
    def run_pt(key, ladder0):
        e0 = ising_energies(hp, coupling, ladder0)

        def body(carry, k):
            s, e = pt_round(
                k, hp, coupling, plan, carry[0], betas, spr,
                energies=carry[1], return_energies=True,
            )
            return (s, e), (e[-1].mean(), e[-1].min())

        (_, e_fin), (means, mins) = jax.lax.scan(
            body, (ladder0, e0), jax.random.split(key, rounds)
        )
        return means, mins, e_fin[-1]

    t0 = time.perf_counter()
    s0 = random_spins(k_g, plan, args.chains)
    g_mean, g_min, g_e = run_gibbs(k_run, s0)
    l0 = random_spins(k_p, plan, t_dim * c_pt).reshape(t_dim, c_pt, plan.n_pad)
    p_mean, p_min, p_e = run_pt(k_run, l0)
    g_mean, g_min, p_mean, p_min = map(np.asarray, (g_mean, g_min, p_mean, p_min))
    wall = time.perf_counter() - t0

    summary = {
        "final_mean_e_gibbs": float(g_mean[-1]),
        "final_mean_e_pt": float(p_mean[-1]),
        "best_e_gibbs": float(g_min.min()),
        "best_e_pt": float(p_min.min()),
        # mean over the equilibrated tail (last quarter of the run)
        "tail_mean_e_gibbs": float(g_mean[-rounds // 4:].mean()),
        "tail_mean_e_pt": float(p_mean[-rounds // 4:].mean()),
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
        },
        "per_round": {
            "gibbs_mean_e": [round(float(x), 3) for x in g_mean],
            "pt_target_mean_e": [round(float(x), 3) for x in p_mean],
        },
        "summary": summary,
        "wall_s": round(wall, 1),
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(
        f"{graph.n} spins / {graph.n_edges} +-J couplers, beta={args.beta_target}: "
        f"tail mean E  gibbs {summary['tail_mean_e_gibbs']:.1f}  "
        f"pt {summary['tail_mean_e_pt']:.1f}   best E  gibbs "
        f"{summary['best_e_gibbs']:.1f}  pt {summary['best_e_pt']:.1f}   "
        f"pt_mixes_better={summary['pt_mixes_better']}  ({wall:.1f}s)"
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
