"""Feedback-optimized PT ladders at the scaled (5640-spin Pegasus) config.

Question: at production scale, what does equal-barrier ladder tuning
(ops/pt_tune.py) buy over the geomspace default the scaled bench uses
(bench.py --scaled: PT_NUM_BETAS=32, beta 0.2→1), and can a TUNED ladder
with FEWER rungs match the geomspace-32 replica flow?  The sampler's
negative-phase cost is ∝ T (chains = NUM_READS × T sweep together), so a
T=16 ladder at equal flow halves the scaled step's sampler+PT component
(runs/scaled_profile.json pt_vs_gibbs_ms + sweep share).

Instance: frustrated random ±J glass on the ideal Pegasus P16 fabric —
the stress case (a trained GRBM's couplings are range-clipped to the same
magnitude, J_RANGE=[-2,1]; random early-training models mix easily, so the
glass bounds the hard end).

Measures, per arm (geomspace-32, tuned-32, geomspace-16, tuned-16):
per-pair acceptance min/std (ops/pt_tune.swap_acceptance) and replica
round trips (round_trip_count — arms of equal T share one compilation).

Usage:  python scripts/tune_pt_scaled.py [--platform cpu] [--smoke]
        (default platform: the axon TPU; --smoke shrinks everything for a
        CPU-sized correctness pass, ~2 min)
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
    ap.add_argument("--latents", type=int, default=5640)
    ap.add_argument("--chains", type=int, default=64, help="chains per rung")
    ap.add_argument("--rungs", type=int, default=32)
    ap.add_argument("--rungs-small", type=int, default=16)
    ap.add_argument("--beta-min", type=float, default=0.2)
    ap.add_argument("--tune-iters", type=int, default=2)
    ap.add_argument("--tune-rounds", type=int, default=24)
    ap.add_argument("--flow-rounds", type=int, default=256)
    ap.add_argument("--sweeps-per-round", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU-sized shapes (script correctness only)")
    ap.add_argument("--out", default="runs/pt_tuned_scaled.json")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.smoke:
        args.latents, args.chains = 256, 16
        args.rungs, args.rungs_small = 8, 4
        args.tune_rounds, args.flow_rounds = 8, 32

    import jax.numpy as jnp
    import numpy as np

    from image_generation_tpu.models.grbm import GRBMGraph
    from image_generation_tpu.ops.gibbs import build_plan, permuted_model
    from image_generation_tpu.ops.pt_tune import (
        round_trip_count,
        swap_acceptance,
        tune_pt_betas,
    )
    from image_generation_tpu.utils.subgraph import select_latent_graph
    from image_generation_tpu.utils.topology import pegasus_graph

    full = pegasus_graph(16)
    latent, _ = select_latent_graph(full, args.latents, args.seed)
    graph = GRBMGraph.from_networkx(latent)
    rng = np.random.RandomState(args.seed)
    h = jnp.zeros(graph.n, jnp.float32)
    j = jnp.asarray(rng.choice([-1.0, 1.0], graph.n_edges).astype(np.float32))
    plan = build_plan(graph)
    hp, cp = permuted_model(plan, h, j)
    # mirror build_sampler_model's resident dtype at this size
    mm = jnp.bfloat16 if plan.n_pad >= 2048 else None
    if mm is not None:
        cp = cp.astype(mm)
    print(
        f"instance: {graph.n} spins / {graph.n_edges} +-J couplers "
        f"(n_pad={plan.n_pad}, {'bf16' if mm else 'f32'} coupling)",
        flush=True,
    )

    key = jax.random.PRNGKey(args.seed)
    results = {}
    for t_dim in (args.rungs, args.rungs_small):
        geo = np.geomspace(args.beta_min, 1.0, t_dim)
        t0 = time.perf_counter()
        tuned, diag_geo, diag_tuned = tune_pt_betas(
            jax.random.fold_in(key, t_dim), hp, cp, plan, geo,
            n_iters=args.tune_iters, n_chains=args.chains,
            n_rounds=args.tune_rounds,
            sweeps_per_round=args.sweeps_per_round, matmul_dtype=mm,
            verbose=True,
        )
        tune_wall = time.perf_counter() - t0
        t0 = time.perf_counter()
        flow = round_trip_count(
            jax.random.fold_in(key, 100 + t_dim), hp, cp, plan,
            [geo, tuned], args.chains, args.flow_rounds,
            args.sweeps_per_round, matmul_dtype=mm,
        )
        flow_wall = time.perf_counter() - t0
        results[t_dim] = {
            "betas_tuned": [round(float(b), 5) for b in tuned],
            "accept_geo_min": float(diag_geo.accept.min()),
            "accept_geo_std": float(np.std(diag_geo.accept)),
            "accept_tuned_min": float(diag_tuned.accept.min()),
            "accept_tuned_std": float(np.std(diag_tuned.accept)),
            "round_trips_geo": flow[0][0],
            "round_trips_tuned": flow[1][0],
            "ladder_coverage_geo": round(flow[0][1], 4),
            "ladder_coverage_tuned": round(flow[1][1], 4),
            "tune_wall_s": round(tune_wall, 1),
            "flow_wall_s": round(flow_wall, 1),
        }
        print(
            f"T={t_dim}: acc min/std geo {results[t_dim]['accept_geo_min']:.3f}"
            f"/{results[t_dim]['accept_geo_std']:.3f} -> tuned "
            f"{results[t_dim]['accept_tuned_min']:.3f}/"
            f"{results[t_dim]['accept_tuned_std']:.3f}   round trips "
            f"geo {flow[0][0]}  tuned {flow[1][0]}   coverage "
            f"geo {flow[0][1]:.3f}  tuned {flow[1][1]:.3f}   "
            f"(tune {tune_wall:.0f}s, flow {flow_wall:.0f}s)",
            flush=True,
        )

    big, small = args.rungs, args.rungs_small
    # the fewer-rungs question: a T=small tuned ladder matching the
    # T=big geomspace flow would shrink the sampler's chain count (and its
    # cost) by small/big at equal mixing.  Compare round trips when any
    # occurred; otherwise fall back to ladder coverage — and say so.
    if results[big]["round_trips_geo"] > 0 or results[small]["round_trips_tuned"] > 0:
        small_matches = bool(
            results[small]["round_trips_tuned"]
            >= results[big]["round_trips_geo"]
        )
        flow_metric = "round_trips"
    else:
        small_matches = bool(
            results[small]["ladder_coverage_tuned"]
            >= results[big]["ladder_coverage_geo"]
        )
        flow_metric = "ladder_coverage (no full round trips observed)"
    summary = {
        "tuned_small_matches_geo_big": small_matches,
        "flow_metric": flow_metric,
        "sampler_cost_ratio": small / big,
    }
    out = {
        "config": vars(args),
        "instance": {"n_spins": graph.n, "n_edges": graph.n_edges,
                     "n_pad": plan.n_pad},
        "per_ladder_size": {str(k): v for k, v in results.items()},
        "summary": summary,
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(
        f"tuned_small_matches_geo_big={summary['tuned_small_matches_geo_big']}"
        f"  (metric: {summary['flow_metric']})"
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
