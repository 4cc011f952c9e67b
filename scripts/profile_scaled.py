"""Attribute the scaled-config (Pegasus-5640 + 32-temp PT) step cost.

Runs timed ablations of the scaled training step on the current device and
prints a measured breakdown (r1 VERDICT weak item 1: the 33 ms/step number
was estimated, not profiled).  Each variant changes ONE knob; the marginal
cost of a component is the time delta against the baseline.

Usage:  python scripts/profile_scaled.py [--steps 8] [--reps 2] \
            [--out runs/scaled_profile.json]

Timing discipline (CLAUDE.md): chained scanned epochs, value-fetch sync,
warmup at the exact timed shape.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_config(cfg, graph, steps: int, reps: int, label: str) -> dict:
    from image_generation_tpu.training.step import make_train_fns
    from image_generation_tpu.utils.data import permuted_epoch

    fns = make_train_fns(cfg, graph, total_steps=steps * (reps + 2))
    key = jax.random.PRNGKey(0)
    dataset = jnp.round(
        jax.random.uniform(
            key, (steps * cfg.BATCH_SIZE, cfg.IMAGE_SIZE, cfg.IMAGE_SIZE, 1)
        )
    ).astype(jnp.float32)

    t0 = time.perf_counter()
    state = fns.init(key, dataset[:1])
    jax.block_until_ready(state.chains)
    t_init = time.perf_counter() - t0

    batches = permuted_epoch(dataset, cfg.BATCH_SIZE, key)
    t0 = time.perf_counter()
    state, _ = fns.epoch(state, batches, jnp.asarray(0))
    jax.block_until_ready(jax.tree.leaves(state))
    t_compile = time.perf_counter() - t0

    # untimed chained call with value-fetch sync
    state, m0 = fns.epoch(state, batches, jnp.asarray(1))
    _ = float(m0.mse[-1])

    t0 = time.perf_counter()
    for r in range(reps):
        batches = permuted_epoch(dataset, cfg.BATCH_SIZE, jax.random.PRNGKey(10 + r))
        state, metrics = fns.epoch(state, batches, jnp.asarray(2 + r))
    _ = float(metrics.mse[-1])
    dt = time.perf_counter() - t0
    ms_per_step = dt / (reps * steps) * 1e3
    log(
        f"{label:28s} {ms_per_step:7.2f} ms/step "
        f"(init {t_init:.1f}s, compile {t_compile:.1f}s)"
    )
    return {"label": label, "ms_per_step": round(ms_per_step, 3)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default="runs/scaled_profile.json")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.models.grbm import GRBMGraph
    from image_generation_tpu.utils.subgraph import select_latent_graph
    from image_generation_tpu.utils.topology import pegasus_graph

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    full = pegasus_graph(16)
    base = TrainingConfig(
        N_LATENTS=full.number_of_nodes(),
        NUM_READS=64,
        BATCH_SIZE=256,
        N_REPLICAS=2,
        SAMPLER="pt",
        PT_NUM_BETAS=32,
        PT_BETA_MIN=0.2,
        GIBBS_SWEEPS=4,
        GIBBS_BURN_IN=4,
    )
    latent, _ = select_latent_graph(full, base.N_LATENTS, base.RANDOM_SEED)
    graph = GRBMGraph.from_networkx(latent)
    log(f"graph: {graph.n} spins, {graph.n_edges} couplers")

    variants = [
        ("baseline pt32x64 sw4 b256 r2", base),
        ("sweeps 8 (sampler marginal)", base.replace(GIBBS_SWEEPS=8)),
        ("pt betas 16 (ladder cost)", base.replace(PT_NUM_BETAS=16)),
        ("replicas 1 (decoder cost)", base.replace(N_REPLICAS=1)),
        ("batch 128 (batch scaling)", base.replace(BATCH_SIZE=128)),
        ("gibbs-256 (no PT machinery)", base.replace(SAMPLER="gibbs", NUM_READS=256)),
    ]
    results = [
        time_config(cfg, graph, args.steps, args.reps, label)
        for label, cfg in variants
    ]

    by = {r["label"]: r["ms_per_step"] for r in results}
    b = by["baseline pt32x64 sw4 b256 r2"]
    derived = {
        "sampler_4_sweeps_ms": round(by["sweeps 8 (sampler marginal)"] - b, 3),
        "pt_ladder_upper_16_ms": round(b - by["pt betas 16 (ladder cost)"], 3),
        "decoder_replica_ms": round(b - by["replicas 1 (decoder cost)"], 3),
        "batch_half_ms": round(b - by["batch 128 (batch scaling)"], 3),
        "pt_vs_gibbs_ms": round(b - by["gibbs-256 (no PT machinery)"], 3),
    }
    report = {
        "device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}",
        "graph": {"n": graph.n, "edges": graph.n_edges},
        "baseline_ms_per_step": b,
        "variants": results,
        "derived_marginals_ms": derived,
    }
    out = json.dumps(report, indent=1)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(out)
    print(out)


if __name__ == "__main__":
    main()
