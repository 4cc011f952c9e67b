"""Measured evidence for the resident-dtype VMEM gate (ops/gibbs_pallas.py
``supported_by_pallas(coupling_itemsize=...)``): a ~2048-spin model stores
its coupling in bf16 (config.resolved_sampler_matmul_dtype: n_pad >= 2048),
which fits the VMEM-resident kernel (2048^2 * 2B = 8.4 MB) — but an
f32-sized budget estimate bounced exactly these problems to the slower
HBM-streaming kernel.  This times the three sweep implementations the step
can select at that shape, following the relay rules (chained scan, warmed
at the timed shape, value fetch to sync — CLAUDE.md).

Writes runs/vmem_midsize_bench.json.
Usage: python scripts/bench_vmem_midsize.py [--chains 256 --sweeps 4 --reps 32]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import numpy as np

import jax
import jax.numpy as jnp

from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.ops.gibbs import (
    build_plan,
    gibbs_sweeps,
    permuted_model,
    random_spins,
)
from image_generation_tpu.ops.gibbs_pallas import (
    gibbs_sweeps_pallas,
    supported_by_pallas,
)
from image_generation_tpu.ops.gibbs_pallas_hbm import gibbs_sweeps_pallas_hbm
from image_generation_tpu.utils.subgraph import select_latent_graph
from image_generation_tpu.utils.topology import pegasus_graph


def timed(name, sweep_fn, key, s0, reps):
    @jax.jit
    def run(key, s):
        def body(s, k):
            return sweep_fn(k, s), None

        s, _ = jax.lax.scan(body, s, jax.random.split(key, reps))
        return s

    k1, k2 = jax.random.split(key)
    float(run(k1, s0).sum())  # compile + warm at the timed shape
    t0 = time.perf_counter()
    out = run(k2, s0)
    float(out.sum())  # fetch a value: block_until_ready does not sync here
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:24s} {dt*1e3:7.2f} ms / refresh")
    return dt * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=128)
    ap.add_argument("--sweeps", type=int, default=4)
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument(
        "--graph", choices=["pegasus", "grid"], default="pegasus",
        help="'grid' = 45x45 lattice (n_pad 2048, chunk occupancy 0.31): "
        "the low-occupancy regime where SWEEP_BLOCK_SPARSE='auto' engages "
        "at a VMEM-sized shape — adds the packed-sweep variants and "
        "settles the dense-VMEM vs packed-streaming selection policy "
        "(training/step.py); QPU graphs are >0.75 occupancy at this size, "
        "so auto never sees the conflict there",
    )
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{getattr(dev, 'device_kind', '?')}")
    if args.graph == "grid":
        import networkx as nx

        latent = nx.grid_2d_graph(45, 45)
        latent = nx.relabel_nodes(
            latent, {v: i for i, v in enumerate(sorted(latent.nodes()))}
        )
    else:
        # 1600 of P10 Pegasus's 2160 sites plan to n_pad=2048
        # (per-color-block padding) — the smallest shape where the bf16
        # storage policy (config.resolved_sampler_matmul_dtype:
        # n_pad >= 2048) engages, and one where the bf16-itemsize gate
        # passes at 128 chains while the old f32-sized estimate (16.8 MB
        # coupling) bounced it to the HBM kernel
        full = pegasus_graph(10)
        latent, _ = select_latent_graph(full, 1600, 0)
    graph = GRBMGraph.from_networkx(latent)
    plan = build_plan(graph)
    print(f"n={graph.n} n_pad={plan.n_pad}")
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.uniform(-0.3, 0.3, graph.n).astype(np.float32))
    j = jnp.asarray(rng.uniform(-0.5, 0.5, graph.n_edges).astype(np.float32))
    hp, cp = permuted_model(plan, h, j)
    cp_bf16 = cp.astype(jnp.bfloat16)
    s0 = random_spins(jax.random.PRNGKey(1), plan, args.chains)
    key = jax.random.PRNGKey(2)
    n_sw = args.sweeps

    gate = {
        "f32_itemsize": supported_by_pallas(
            plan, args.chains, coupling_itemsize=4
        ),
        "bf16_itemsize": supported_by_pallas(
            plan, args.chains, coupling_itemsize=2
        ),
    }
    print(f"gate: {gate}")  # the selection this measurement justifies

    variants = {
        # what the step NOW selects at this shape (bf16 resident coupling)
        "pallas_vmem_bf16": lambda k, s: gibbs_sweeps_pallas(
            k, hp, cp_bf16, plan, s, n_sw, matmul_dtype=jnp.bfloat16
        ),
        # what the f32-sized gate used to bounce it to
        "pallas_hbm_bf16": lambda k, s: gibbs_sweeps_pallas_hbm(
            k, hp, cp_bf16, plan, s, n_sw, block_dtype=jnp.bfloat16
        ),
        "xla_bf16": lambda k, s: gibbs_sweeps(
            k, hp, cp_bf16, plan, s, n_sw, matmul_dtype=jnp.bfloat16
        ),
    }
    occ = None
    if args.graph == "grid":
        from image_generation_tpu.ops.block_sparse import (
            chunk_occupancy,
            gibbs_sweeps_block_sparse,
            pack_coupling,
        )

        occ = {c: round(chunk_occupancy(plan, c), 3) for c in (128, 256)}
        print(f"chunk occupancy: {occ}")
        bs128 = pack_coupling(plan, cp_bf16, chunk=128)
        bs256 = pack_coupling(plan, cp_bf16, chunk=256)
        variants["xla_bs128_bf16"] = (
            lambda k, s: gibbs_sweeps_block_sparse(
                k, hp, bs128, plan, s, n_sw, matmul_dtype=jnp.bfloat16
            )
        )
        variants["pallas_hbm_bs128_bf16"] = (
            lambda k, s: gibbs_sweeps_pallas_hbm(k, hp, bs128, plan, s, n_sw)
        )
        variants["pallas_hbm_bs256_bf16"] = (
            lambda k, s: gibbs_sweeps_pallas_hbm(k, hp, bs256, plan, s, n_sw)
        )
    out = {
        "device": str(getattr(dev, "device_kind", dev.platform)),
        "graph": args.graph,
        "n": graph.n, "n_pad": plan.n_pad, "chains": args.chains,
        "sweeps_per_refresh": args.sweeps, "reps": args.reps,
        "gate": gate, "occupancy": occ, "ms": {},
    }
    for name, fn in variants.items():
        key, k = jax.random.split(key)
        out["ms"][name] = round(timed(name, fn, k, s0, args.reps), 3)

    Path("runs").mkdir(exist_ok=True)
    name = (
        "vmem_midsize_bench.json" if args.graph == "pegasus"
        else f"vmem_midsize_bench_{args.graph}.json"
    )
    Path("runs", name).write_text(json.dumps(out, indent=1))
    print(json.dumps(out["ms"]))


if __name__ == "__main__":
    main()
