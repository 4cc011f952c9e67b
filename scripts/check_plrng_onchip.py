"""On-chip statistical validation of the graph-sharded Pallas update kernel.

tests/test_graph_sharded_pallas.py pins the FED-uniform kernel variant
bit-exact against the XLA graph-sharded sweep on the CPU mesh, but the
production path under GRAPH_SHARDED + USE_PALLAS draws from the TPU's
HARDWARE PRNG (`pltpu.prng_random_bits`) through Mosaic compilation — a
stream (and code path) no CPU test can execute.  This script runs the
compiled kernel on the real chip and checks empirical moments against
exact Boltzmann enumeration, exactly like the bf16/int8 kernels were
validated (scripts/check_int8_onchip.py, BENCHMARKS.md "Statistical
validation").  The mesh is a 1-device (1,1) mesh: the shard_map psums
degenerate but the kernel, its seeding and the sweep structure are
byte-identical to one shard of a multi-chip run.

Writes runs/plrng_onchip_check.json.  Usage: python scripts/check_plrng_onchip.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.ops.exact import exact_moments
from image_generation_tpu.ops.gibbs import (
    build_plan,
    permuted_model,
    random_spins,
    to_original,
)
from image_generation_tpu.ops.gibbs_graph_sharded import gibbs_sweeps_graph_sharded
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
    plan = build_plan(graph)
    hp, cp = permuted_model(plan, h, j)
    qc = quantize_coupling(cp)
    jq = np.asarray(qc.scale) * np.clip(
        np.round(np.asarray(j) / np.asarray(qc.scale)), -127, 127
    )
    e1, e2 = exact_moments(np.asarray(h), graph.edge_i, graph.edge_j, np.asarray(j))
    e1q, e2q = exact_moments(np.asarray(h), graph.edge_i, graph.edge_j, jq)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("data", "chain"))

    out = {"device": str(getattr(dev, "device_kind", dev.platform)),
           "n": graph.n, "edges": graph.n_edges, "checks": {}}
    chains, sweeps = 2048, 60
    k = jax.random.PRNGKey(0)
    # (name, coupling, exact moments): the hw-PRNG update over the XLA
    # matmul/psum structure, dense f32 and int8 QuantCoupling (the exact
    # moments of the QUANTIZED model for the latter), plus the XLA-update
    # control sampled the same way
    variants = {
        "gs_xla_control": (cp, (e1, e2), {}),
        "gs_plrng_f32": (cp, (e1, e2), dict(pallas_update=True)),
        "gs_plrng_int8": (qc, (e1q, e2q), dict(pallas_update=True)),
    }
    ok_all = True
    for name, (coup, (m1e, m2e), kw) in variants.items():
        k, k_init, k_run = jax.random.split(k, 3)
        s0 = random_spins(k_init, plan, chains)
        t0 = time.perf_counter()
        s = gibbs_sweeps_graph_sharded(
            k_run, hp, coup, plan, s0, sweeps, mesh, **kw
        )
        s = to_original(plan, s)
        m1, m2 = moments(s, graph)
        dt = time.perf_counter() - t0
        err1 = float(np.max(np.abs(m1 - m1e)))
        err2 = float(np.max(np.abs(m2 - m2e)))
        ok = err1 < 0.1 and err2 < 0.1
        ok_all &= ok
        out["checks"][name] = {
            "max_err_m1": round(err1, 4), "max_err_m2": round(err2, 4),
            "ok": ok, "compile_plus_run_s": round(dt, 2),
        }
        print(f"{name:16s} max|Δm1|={err1:.4f} max|Δm2|={err2:.4f} "
              f"{'OK' if ok else 'FAIL'}")

    out["ok"] = ok_all
    Path("runs").mkdir(exist_ok=True)
    Path("runs/plrng_onchip_check.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    raise SystemExit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
