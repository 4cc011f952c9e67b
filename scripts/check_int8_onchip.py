"""On-chip validation of the int8 sampler path (Mosaic-compiled kernels).

Interpret-mode tests (tests/test_gibbs_int8.py) pin the int8 kernels'
semantics bitwise against the XLA int8 path, but Mosaic compilation is a
different code path (int8 MXU dots, int8 VMEM buffers, cast chains) — this
script runs the COMPILED kernels on the real chip with the hardware PRNG
and checks their empirical moments against exact enumeration of the
quantized model, exactly like the bf16 kernels were validated.

Writes runs/int8_onchip_check.json.  Usage: python scripts/check_int8_onchip.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import numpy as np

import jax
import jax.numpy as jnp

from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.ops.exact import exact_moments
from image_generation_tpu.ops.gibbs import (
    build_plan,
    gibbs_sweeps,
    permuted_model,
    random_spins,
    to_original,
)
from image_generation_tpu.ops.gibbs_pallas import gibbs_sweeps_pallas
from image_generation_tpu.ops.gibbs_pallas_hbm import gibbs_sweeps_pallas_hbm
from image_generation_tpu.ops.quant import quantize_coupling
from image_generation_tpu.utils.subgraph import select_latent_graph
from image_generation_tpu.utils.topology import chimera_graph


def moments(spins, graph):
    s = np.asarray(spins, np.float64)
    return s.mean(axis=0), (s[:, graph.edge_i] * s[:, graph.edge_j]).mean(axis=0)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{getattr(dev, 'device_kind', '?')}")
    g, _ = select_latent_graph(chimera_graph(2, 2, 3), 12, 11)
    graph = GRBMGraph.from_networkx(g)
    rng = np.random.RandomState(3)
    h = jnp.asarray(rng.uniform(-0.3, 0.3, graph.n).astype(np.float32))
    j = jnp.asarray(rng.uniform(-0.5, 0.5, graph.n_edges).astype(np.float32))
    plan = build_plan(graph)  # pad_to=128: the kernels' lane layout
    hp, cp = permuted_model(plan, h, j)
    qc = quantize_coupling(cp)
    jq = np.asarray(qc.scale) * np.clip(
        np.round(np.asarray(j) / np.asarray(qc.scale)), -127, 127
    )
    e1, e2 = exact_moments(np.asarray(h), graph.edge_i, graph.edge_j, jq)

    out = {"device": str(getattr(dev, "device_kind", dev.platform)),
           "n": graph.n, "edges": graph.n_edges,
           "scale": float(qc.scale), "checks": {}}
    chains, sweeps = 2048, 60
    k = jax.random.PRNGKey(0)
    variants = {
        "xla_int8": lambda key, s: gibbs_sweeps(key, hp, qc, plan, s, sweeps),
        "pallas_vmem_int8": lambda key, s: gibbs_sweeps_pallas(
            key, hp, qc, plan, s, sweeps
        ),
        "pallas_hbm_int8": lambda key, s: gibbs_sweeps_pallas_hbm(
            key, hp, qc, plan, s, sweeps
        ),
    }
    ok_all = True
    for name, fn in variants.items():
        k, k_init, k_run = jax.random.split(k, 3)
        s0 = random_spins(k_init, plan, chains)
        t0 = time.perf_counter()
        s = jax.jit(fn)(k_run, s0)
        s = to_original(plan, s)
        m1, m2 = moments(s, graph)
        dt = time.perf_counter() - t0
        err1 = float(np.max(np.abs(m1 - e1)))
        err2 = float(np.max(np.abs(m2 - e2)))
        ok = err1 < 0.1 and err2 < 0.1
        ok_all &= ok
        out["checks"][name] = {
            "max_err_m1": round(err1, 4), "max_err_m2": round(err2, 4),
            "ok": ok, "compile_plus_run_s": round(dt, 2),
        }
        print(f"{name:18s} max|Δm1|={err1:.4f} max|Δm2|={err2:.4f} "
              f"{'OK' if ok else 'FAIL'}")

    out["ok"] = ok_all
    Path("runs").mkdir(exist_ok=True)
    Path("runs/int8_onchip_check.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    raise SystemExit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
