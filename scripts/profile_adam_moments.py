"""Measure the Adam moment-storage knobs at the scaled batch-1024 config.

VERDICT r3 item 1: ADAM_FACTORED_NU shipped with unit tests but no on-chip
ms/step number.  This harness times, in ONE process (same session, same
relay), single-knob ablations of the scaled training step:

  * control (f32 dense moments)
  * ADAM_FACTORED_NU=on          (rank-1 nu: ~1 GB/step nu traffic removed)
  * ADAM_MOMENT_DTYPE=bfloat16   (the r3-measured −2.95 ms, re-controlled)
  * both stacked
  * the best-known T=8 + int8 + bf16-mu stack, with and without factored nu

Usage:  python scripts/profile_adam_moments.py [--steps 8] [--reps 2] \
            [--batch 1024] [--out runs/adam_factored_profile.json]

Timing discipline (CLAUDE.md): chained scanned epochs, value-fetch sync,
warmup at the exact timed shape — all inherited from profile_scaled.
time_config.  Convergence evidence is separate:
runs/adam_factored_convergence.json (scripts/compare_adam_moments.py).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--out", default="runs/adam_factored_profile.json")
    ap.add_argument("--platform", default=None)
    ap.add_argument(
        "--tiny", action="store_true",
        help="Zephyr-4 graph + small batch (CPU smoke test of the harness)",
    )
    args = ap.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from profile_scaled import time_config

    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.models.grbm import GRBMGraph
    from image_generation_tpu.utils.subgraph import select_latent_graph
    from image_generation_tpu.utils.topology import pegasus_graph, zephyr_graph

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    if args.tiny:
        full, n, batch = zephyr_graph(4), 160, 32
    else:
        full = pegasus_graph(16)
        n, batch = full.number_of_nodes(), args.batch
    base = TrainingConfig(
        N_LATENTS=n,
        NUM_READS=64,
        BATCH_SIZE=batch,
        N_REPLICAS=2,
        SAMPLER="pt",
        PT_NUM_BETAS=32,
        PT_BETA_MIN=0.2,
        GIBBS_SWEEPS=4,
        GIBBS_BURN_IN=4,
    )
    latent, _ = select_latent_graph(full, base.N_LATENTS, base.RANDOM_SEED)
    graph = GRBMGraph.from_networkx(latent)
    log(f"graph: {graph.n} spins, {graph.n_edges} couplers, batch {batch}")

    best = base.replace(
        PT_NUM_BETAS=8, SAMPLER_MATMUL_DTYPE="int8",
        ADAM_MOMENT_DTYPE="bfloat16",
    )
    variants = [
        ("control f32 moments", base),
        ("factored nu", base.replace(ADAM_FACTORED_NU="on")),
        ("bf16 moments", base.replace(ADAM_MOMENT_DTYPE="bfloat16")),
        ("bf16 + factored nu", base.replace(
            ADAM_MOMENT_DTYPE="bfloat16", ADAM_FACTORED_NU="on")),
        ("best-known t8 int8 bf16", best),
        ("best-known + factored nu", best.replace(ADAM_FACTORED_NU="on")),
    ]
    results = [
        time_config(cfg, graph, args.steps, args.reps, label)
        for label, cfg in variants
    ]

    by = {r["label"]: r["ms_per_step"] for r in results}
    derived = {
        "factored_nu_ms": round(by["control f32 moments"] - by["factored nu"], 3),
        "bf16_ms": round(by["control f32 moments"] - by["bf16 moments"], 3),
        "bf16_plus_factored_ms": round(
            by["control f32 moments"] - by["bf16 + factored nu"], 3
        ),
        "factored_on_best_known_ms": round(
            by["best-known t8 int8 bf16"] - by["best-known + factored nu"], 3
        ),
    }
    report = {
        "device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}",
        "graph": {"n": graph.n, "edges": graph.n_edges},
        "batch": batch,
        "variants": results,
        "derived_savings_ms": derived,
    }
    out = json.dumps(report, indent=1)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(out)
    print(out)


if __name__ == "__main__":
    main()
