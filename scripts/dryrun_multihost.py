"""Multi-HOST readiness dryrun: one sharded training step across two
jax processes (VERDICT r2 item 7).

The mesh machinery (parallel/mesh.py) builds its mesh from ``jax.devices()``
— in a multi-controller deployment that is the GLOBAL device list, so the
same code paths drive a TPU pod slice spanning hosts.  No multi-host
hardware exists in this environment, so this script proves pod-shape
readiness the same way the tests prove multi-chip readiness: it spawns TWO
OS processes, each holding 4 virtual CPU devices
(``xla_force_host_platform_device_count=4``), connects them with
``jax.distributed.initialize`` over localhost (cross-process collectives via
XLA CPU's gloo backend), builds the 8-device global (data × chain) mesh, and
runs init → shard_train_state → one fused training step with every
cross-process collective the real step uses (batch-mean psum, gradient
all-reduce, chain sharding) — then the same step with the graph-sharded +
block-sparse-packed sampler, whose coupling rows span both processes (the
beyond-HBM pod shape; per-color field psums cross processes).

Run:  python scripts/dryrun_multihost.py            (parent: spawns workers)
      python scripts/dryrun_multihost.py --worker I (one process; internal)

Writes runs/multihost_dryrun.json from process 0 on success.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
N_PROCESSES = 2
LOCAL_DEVICES = 4


def worker(process_id: int, coordinator: str) -> None:
    # device/platform decisions must precede any backend initialization
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=N_PROCESSES,
        process_id=process_id,
    )
    import jax.numpy as jnp
    import numpy as np

    assert jax.process_count() == N_PROCESSES
    n_global = N_PROCESSES * LOCAL_DEVICES
    assert len(jax.devices()) == n_global, (
        f"global device list must span hosts: {len(jax.devices())}"
    )
    assert len(jax.local_devices()) == LOCAL_DEVICES

    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.models.grbm import GRBMGraph
    from image_generation_tpu.parallel.mesh import create_mesh, shard_train_state
    from image_generation_tpu.training.step import make_train_fns
    from image_generation_tpu.utils.subgraph import select_latent_graph
    from image_generation_tpu.utils.topology import zephyr_graph

    cfg = TrainingConfig(
        N_LATENTS=32,
        NUM_READS=2 * n_global,
        BATCH_SIZE=2 * n_global,
        N_REPLICAS=2,
        GIBBS_SWEEPS=2,
        GIBBS_BURN_IN=2,
        COMPUTE_DTYPE="float32",
        SAMPLER_MATMUL_DTYPE="float32",
    )
    g, _ = select_latent_graph(zephyr_graph(3), cfg.N_LATENTS, 7)
    graph = GRBMGraph.from_networkx(g)
    mesh = create_mesh(n_global)  # (data=4, chain=2) over BOTH processes
    assert mesh.devices.size == n_global

    fns = make_train_fns(cfg, graph, total_steps=4, mesh=mesh)
    # every process runs the SAME program on the SAME host constants — the
    # multi-controller contract; jit outputs are global (replicated) arrays
    images = jnp.round(
        jax.random.uniform(jax.random.PRNGKey(0), (cfg.BATCH_SIZE, 32, 32, 1))
    )
    state = jax.jit(fns.init)(jax.random.PRNGKey(1), images[:1])
    state = shard_train_state(state, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch = jax.device_put(images, NamedSharding(mesh, P("data")))
    new_state, metrics = fns.step(state, batch, jnp.asarray(0))
    mse = float(metrics.mse)  # fetch = hard sync incl. cross-process psums
    assert np.isfinite(mse), f"multi-host step produced mse={mse}"
    chains_spec = new_state.chains.sharding.spec

    # beyond-HBM pod shape: graph-sharded + block-sparse-packed coupling
    # rows span BOTH processes — no single host (let alone chip) ever holds
    # the whole matrix, and the per-color field psum crosses processes
    gs_cfg = cfg.replace(
        GRAPH_SHARDED="on", SWEEP_BLOCK_SPARSE="on", SWEEP_BS_CHUNK=64
    )
    fns_gs = make_train_fns(gs_cfg, graph, total_steps=4, mesh=mesh)
    assert fns_gs.sampler_impl == "xla_graph_sharded+bs"
    state_gs = shard_train_state(
        fns_gs.init(jax.random.PRNGKey(1), images[:1]), mesh,
        graph_sharded=True,
    )
    _, m_gs = fns_gs.step(state_gs, batch, jnp.asarray(0))
    mse_gs = float(m_gs.mse)
    assert np.isfinite(mse_gs), f"graph-sharded multihost mse={mse_gs}"
    # recon loss is sampler-independent → must match the DP step's
    np.testing.assert_allclose(mse_gs, mse, rtol=1e-4)

    print(
        f"[proc {process_id}] multihost step ok: mse={mse:.4f} "
        f"devices={n_global} local={LOCAL_DEVICES} chains_spec={chains_spec} "
        f"graph_sharded_bs_mse={mse_gs:.4f}",
        flush=True,
    )
    if process_id == 0:
        out = {
            "processes": N_PROCESSES,
            "local_devices": LOCAL_DEVICES,
            "global_devices": n_global,
            "mesh": {k: int(v) for k, v in mesh.shape.items()},
            "step_mse": mse,
            "chains_sharding": str(chains_spec),
            "graph_sharded_block_sparse_mse": mse_gs,
            "graph_sharded_sampler_impl": fns_gs.sampler_impl,
            "jax": jax.__version__,
        }
        (REPO / "runs").mkdir(exist_ok=True)
        (REPO / "runs" / "multihost_dryrun.json").write_text(
            json.dumps(out, indent=1)
        )
    jax.distributed.shutdown()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--timeout", type=int, default=420)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.coordinator)
        return 0

    # parent: pick a free port, spawn both workers, stream their output
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", str(i),
             "--coordinator", coordinator],
            env=env, cwd=str(REPO),
        )
        for i in range(N_PROCESSES)
    ]
    rc = 0
    for p in procs:
        try:
            rc |= p.wait(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            rc |= 1
    if rc == 0:
        print("multihost dryrun ok:",
              (REPO / "runs" / "multihost_dryrun.json").read_text())
    return rc


if __name__ == "__main__":
    sys.exit(main())
