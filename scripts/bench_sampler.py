"""Standing harness for the BENCHMARKS.md "Samplers" table.

Times the negative-phase refresh (2048 chains × 4 sweeps on the 5640-spin
ideal Pegasus latent) for each sweep implementation / dtype, following the
relay measurement rules (CLAUDE.md): the sweeps run inside one jitted
chained scan (each refresh feeds the next), warmed at the timed shape, and
a value is fetched to force completion.

Writes runs/sampler_bench.json.
Usage: python scripts/bench_sampler.py [--chains 2048 --sweeps 4 --reps 32]
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
from image_generation_tpu.ops.gibbs_pallas_hbm import gibbs_sweeps_pallas_hbm
from image_generation_tpu.ops.quant import quantize_coupling
from image_generation_tpu.utils.subgraph import select_latent_graph
from image_generation_tpu.utils.topology import pegasus_graph


def timed(fn_name, sweep_fn, key, s0, reps):
    """Chained scan: refresh_i feeds refresh_{i+1}; nothing cacheable."""

    @jax.jit
    def run(key, s):
        def body(s, k):
            s = sweep_fn(k, s)
            return s, None

        s, _ = jax.lax.scan(body, s, jax.random.split(key, reps))
        return s

    k1, k2 = jax.random.split(key)
    float(run(k1, s0).sum())  # compile + warm at the timed shape
    t0 = time.perf_counter()
    out = run(k2, s0)
    float(out.sum())  # fetch a value: block_until_ready does not sync here
    dt = (time.perf_counter() - t0) / reps
    print(f"{fn_name:28s} {dt*1e3:7.2f} ms / refresh")
    return dt * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=2048)
    ap.add_argument("--sweeps", type=int, default=4)
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument(
        "--bs-chunks", type=int, nargs="*", default=[128, 256],
        help="block-sparse chunk heights to bench (ops/block_sparse.py)",
    )
    ap.add_argument(
        "--only", default=None,
        help="substring filter on variant names; results MERGE into the "
        "existing runs/sampler_bench.json ms table (same-session controls: "
        "include the control variant in the filter)",
    )
    ap.add_argument(
        "--ablate-spans", action="store_true",
        help="single-knob ablation of the class-span sweep order "
        "(ops/gibbs.class_spans): adds *_nospan controls (a plan copy with "
        "block_class=None — the exact pre-span per-block order) and the "
        "graph-sharded sweep on a 1-device mesh (the program structure the "
        "beyond-HBM mode runs per shard, psums degenerate)",
    )
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{getattr(dev, 'device_kind', '?')}")
    full = pegasus_graph(16)
    latent, _ = select_latent_graph(full, full.number_of_nodes(), 0)
    graph = GRBMGraph.from_networkx(latent)
    plan = build_plan(graph)
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.uniform(-0.3, 0.3, graph.n).astype(np.float32))
    j = jnp.asarray(rng.uniform(-0.5, 0.5, graph.n_edges).astype(np.float32))
    hp, cp = permuted_model(plan, h, j)
    qc = quantize_coupling(cp)
    cp_bf16 = cp.astype(jnp.bfloat16)
    s0 = random_spins(jax.random.PRNGKey(1), plan, args.chains)
    key = jax.random.PRNGKey(2)
    n_sw = args.sweeps

    # block-sparse packed forms (ops/block_sparse.py): occupied-chunk panels
    from image_generation_tpu.ops.block_sparse import chunk_occupancy, pack_coupling

    bs_bf16 = {c: pack_coupling(plan, cp_bf16, chunk=c) for c in args.bs_chunks}
    bs_int8 = {c: pack_coupling(plan, qc, chunk=c) for c in args.bs_chunks}
    for c in args.bs_chunks:
        print(f"chunk {c}: occupancy {chunk_occupancy(plan, c):.3f}")

    variants = {
        "pallas_hbm_bf16": lambda k, s: gibbs_sweeps_pallas_hbm(
            k, hp, cp_bf16, plan, s, n_sw, block_dtype=jnp.bfloat16
        ),
        "pallas_hbm_int8": lambda k, s: gibbs_sweeps_pallas_hbm(
            k, hp, qc, plan, s, n_sw
        ),
        "xla_bf16": lambda k, s: gibbs_sweeps(
            k, hp, cp_bf16, plan, s, n_sw, matmul_dtype=jnp.bfloat16
        ),
        "xla_int8": lambda k, s: gibbs_sweeps(k, hp, qc, plan, s, n_sw),
    }
    for c in args.bs_chunks:
        variants[f"pallas_hbm_bs{c}_bf16"] = (
            lambda k, s, b=bs_bf16[c]: gibbs_sweeps_pallas_hbm(
                k, hp, b, plan, s, n_sw
            )
        )
        variants[f"pallas_hbm_bs{c}_int8"] = (
            lambda k, s, b=bs_int8[c]: gibbs_sweeps_pallas_hbm(
                k, hp, b, plan, s, n_sw
            )
        )
        variants[f"xla_bs{c}_bf16"] = (
            lambda k, s, b=bs_bf16[c]: gibbs_sweeps(k, hp, b, plan, s, n_sw)
        )
    if args.ablate_spans:
        import dataclasses

        from jax.sharding import Mesh
        from image_generation_tpu.ops.gibbs_graph_sharded import (
            gibbs_sweeps_graph_sharded,
        )

        # block_class=None → class_spans degrades to one span per block:
        # bit-for-bit the pre-span iteration order and RNG stream
        plan_ns = dataclasses.replace(plan, block_class=None)
        mesh1 = Mesh(
            np.asarray(jax.devices()[:1]).reshape(1, 1), ("data", "chain")
        )
        variants.update({
            "xla_bf16_nospan": lambda k, s: gibbs_sweeps(
                k, hp, cp_bf16, plan_ns, s, n_sw, matmul_dtype=jnp.bfloat16
            ),
            "xla_int8_nospan": lambda k, s: gibbs_sweeps(
                k, hp, qc, plan_ns, s, n_sw
            ),
            "gs_bf16": lambda k, s: gibbs_sweeps_graph_sharded(
                k, hp, cp_bf16, plan, s, n_sw, mesh1,
                matmul_dtype=jnp.bfloat16,
            ),
            "gs_bf16_nospan": lambda k, s: gibbs_sweeps_graph_sharded(
                k, hp, cp_bf16, plan_ns, s, n_sw, mesh1,
                matmul_dtype=jnp.bfloat16,
            ),
            "gs_int8": lambda k, s: gibbs_sweeps_graph_sharded(
                k, hp, qc, plan, s, n_sw, mesh1
            ),
            "gs_int8_nospan": lambda k, s: gibbs_sweeps_graph_sharded(
                k, hp, qc, plan_ns, s, n_sw, mesh1
            ),
            # the composed Pallas span-update kernel (hardware PRNG —
            # ops/gibbs_graph_sharded_pallas.py): the r3-VERDICT item-2
            # measurement, single-shard harness (psums degenerate; the
            # matmul/psum structure is byte-identical to gs_*)
            "gs_bf16_plrng": lambda k, s: gibbs_sweeps_graph_sharded(
                k, hp, cp_bf16, plan, s, n_sw, mesh1,
                matmul_dtype=jnp.bfloat16, pallas_update=True,
            ),
            "gs_int8_plrng": lambda k, s: gibbs_sweeps_graph_sharded(
                k, hp, qc, plan, s, n_sw, mesh1, pallas_update=True
            ),
        })
    out = {
        "device": str(getattr(dev, "device_kind", dev.platform)),
        "n": graph.n, "n_pad": plan.n_pad, "chains": args.chains,
        "sweeps_per_refresh": args.sweeps, "reps": args.reps, "ms": {},
    }
    out_path = Path("runs/sampler_bench.json")
    if args.only is not None:
        variants = {n: f for n, f in variants.items() if args.only in n}
        if out_path.exists():  # partial run: keep the other variants' rows
            out["ms"].update(json.loads(out_path.read_text()).get("ms", {}))
    for name, fn in variants.items():
        key, k = jax.random.split(key)
        out["ms"][name] = round(timed(name, fn, k, s0, args.reps), 3)

    flops = 2.0 * args.chains * plan.n_pad * plan.n_pad * args.sweeps
    if "pallas_hbm_int8" in out["ms"]:
        out["tops_int8"] = round(
            flops / (out["ms"]["pallas_hbm_int8"] / 1e3) / 1e12, 1
        )
    if "pallas_hbm_bf16" in out["ms"]:
        out["tflops_bf16"] = round(
            flops / (out["ms"]["pallas_hbm_bf16"] / 1e3) / 1e12, 1
        )
    Path("runs").mkdir(exist_ok=True)
    out_path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
