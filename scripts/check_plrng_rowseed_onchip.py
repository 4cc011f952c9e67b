"""On-chip validation + cost measurement of the row-seeded plrng kernel.

``PLRNG_ROW_SEED="on"`` (ops/gibbs_graph_sharded_pallas.py) reseeds the
graph-sharded hardware-PRNG span update per 8-row group from GLOBAL row
ids, making the sampled chain bit-identical across mesh factorizations —
the default kernel's documented gap (its tile seeding varies with the
per-shard chain count).  Two checks on the real TPU (the CPU interpreter
stubs prng_random_bits, so only chip runs exercise the real stream):

1. **Factorization invariance** (the PASS gate): run the row-seeded update
   on a (C, W) fields block whole, then split into 2/4/8 row shards with
   offset global row_ids — exactly what shard_map hands each chain shard —
   and assert the concatenated outputs are bit-identical.  Control: the
   default tile-seeded kernel run the same way DOES diverge (documents the
   gap is real, not hypothetical).
2. **Reseed cost**: time the full graph-sharded sweep (1-device mesh,
   scaled-shape chains × spins) under pallas_update=True vs "row_seed" vs
   False (XLA threefry).  VERDICT r4 item 6's bar: adopt only if the
   reseed cost doesn't eat the plrng win (−4%/−15% bf16/int8).

Relay rules honored (CLAUDE.md): warm-up at the timed shape, chained
state between timed calls, medians over repeats.

Usage: python scripts/check_plrng_rowseed_onchip.py [--out runs/plrng_rowseed_check.json]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    return np.asarray(jax.device_get(x))


def invariance(update, c, w, key, expect_equal):
    """Whole-vs-split update equality across simulated chain factorizations."""
    fields = jax.random.normal(jax.random.fold_in(key, 1), (c, w), jnp.float32)
    beta = jnp.float32(1.0)

    def run(n_shards):
        rows = c // n_shards
        outs = [
            update(key, fields[i * rows:(i + 1) * rows], beta,
                   i * rows + jnp.arange(rows))
            for i in range(n_shards)
        ]
        return np.concatenate([_fetch(o) for o in outs])

    whole = run(1)
    results = {}
    for n_shards in (2, 4, 8):
        equal = bool((run(n_shards) == whole).all())
        results[f"split_{n_shards}"] = equal
        if equal != expect_equal:
            return results, False
    return results, True


def sweep_ms(plan, hp, cp, mesh, pallas_update, n_chains=2048, n_sweeps=8,
             repeats=5):
    """Median wall ms of the full graph-sharded sweep at a scaled-ish shape,
    chaining spin state between timed calls (relay cache rule)."""
    from image_generation_tpu.ops.gibbs import random_spins
    from image_generation_tpu.ops.gibbs_graph_sharded import (
        gibbs_sweeps_graph_sharded,
    )

    @jax.jit
    def step(key, s):
        return gibbs_sweeps_graph_sharded(
            key, hp, cp, plan, s, n_sweeps, mesh,
            matmul_dtype=jnp.bfloat16, pallas_update=pallas_update,
        )

    s = random_spins(jax.random.PRNGKey(0), plan, n_chains)
    s = step(jax.random.PRNGKey(1), s)
    float(jnp.sum(s))  # force (block_until_ready lies through the relay)
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        s = step(jax.random.PRNGKey(2 + i), s)
        float(jnp.sum(s))
        times.append((time.perf_counter() - t0) * 1e3)
    return round(statistics.median(times), 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/plrng_rowseed_check.json")
    args = ap.parse_args()

    from image_generation_tpu.models.grbm import GRBMGraph
    from image_generation_tpu.ops.gibbs import build_plan, permuted_model
    from image_generation_tpu.ops.gibbs_graph_sharded_pallas import (
        make_pallas_update,
    )
    from image_generation_tpu.parallel.mesh import create_mesh
    from image_generation_tpu.utils.subgraph import select_latent_graph
    from image_generation_tpu.utils.topology import pegasus_graph

    dev = jax.devices()[0]
    assert dev.platform == "tpu", "on-chip check needs the TPU backend"
    report = {"device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}"}

    key = jax.random.PRNGKey(7)
    # 1. invariance gate (+ divergence control) on a raw update block
    res_rs, ok_rs = invariance(
        make_pallas_update(row_seed=True), 256, 512, key, expect_equal=True
    )
    res_def, ok_def = invariance(
        make_pallas_update(), 256, 512, key, expect_equal=False
    )
    report["rowseed_invariant_across_splits"] = res_rs
    report["default_diverges_across_splits"] = {
        k: not v for k, v in res_def.items()
    }
    gate = ok_rs and ok_def

    # 2. reseed cost at a scaled-ish shape (5640-spin Pegasus latent,
    #    2048 chains, 8 sweeps; 1-device mesh — the kernel cost is
    #    per-shard, so one chip measures it faithfully)
    g, _ = select_latent_graph(pegasus_graph(16), 5640, 3)
    graph = GRBMGraph.from_networkx(g)
    rng = np.random.RandomState(5)
    h = jnp.asarray(rng.uniform(-0.3, 0.3, graph.n), jnp.float32)
    j = jnp.asarray(rng.uniform(-0.5, 0.5, graph.n_edges), jnp.float32)
    plan = build_plan(graph)
    hp, cp = permuted_model(plan, h, j)
    mesh = create_mesh(1, shape=(1, 1))
    report["sweep_ms_scaled_shape"] = {
        "xla_threefry": sweep_ms(plan, hp, cp, mesh, False),
        "plrng_default": sweep_ms(plan, hp, cp, mesh, True),
        "plrng_row_seed": sweep_ms(plan, hp, cp, mesh, "row_seed"),
    }

    report["pass"] = gate
    out = json.dumps(report, indent=1)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(out)
    print(out)
    assert gate, "row-seed invariance gate FAILED"


if __name__ == "__main__":
    main()
