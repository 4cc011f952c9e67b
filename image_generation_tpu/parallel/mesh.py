"""Device mesh construction and sharding rules for multi-chip training.

The reference has no distributed training at all (SURVEY.md §2c: single
``torch.device``); this framework scales with GSPMD over a
``jax.sharding.Mesh``.  The natural parallel axes of this model family are:

  * ``data``  — global batch (data parallelism; gradients all-reduced by XLA
    over ICI);
  * ``chain`` — Gibbs chains / annealer reads (the reference's ``num_reads``
    axis; embarrassingly parallel, zero-communication row sharding of the
    (chains × n) spin state, with an all-gather only where the MMD loss
    consumes the samples).

Parameters and optimizer state are replicated (the DVAE is ~1.3M params —
tensor/pipeline sharding would be pure overhead; GSPMD gives it for free
later if models grow).  All communication is XLA collectives over ICI —
no host round-trips anywhere in the step.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "create_mesh",
    "auto_mesh",
    "shard_train_state",
    "shard_batch",
    "shard_epoch_batches",
    "replicate",
]


def create_mesh(
    n_devices: Optional[int] = None,
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Sequence[str] = ("data", "chain"),
) -> Mesh:
    """Create a 2-D (data × chain) device mesh.

    ``shape`` defaults to (n/2, 2) for even n ≥ 2 (both axes exercised) and
    (n, 1) otherwise — an odd device count must not crash ``auto_mesh`` (the
    default Trainer path).  On a v5e-8 slice this is (4, 2); both axes ride
    ICI.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if shape is None:
        shape = (n_devices // 2, 2) if n_devices % 2 == 0 and n_devices >= 2 else (n_devices, 1)
    if shape[0] * shape[1] != n_devices:
        raise ValueError(f"mesh shape {shape} != {n_devices} devices")
    arr = np.asarray(devices[:n_devices]).reshape(shape)
    return Mesh(arr, axis_names)


def auto_mesh() -> Optional[Mesh]:
    """The default product mesh: all local devices, or None on one device.

    Trainer/CLI call this so that on a multi-chip host (e.g. a v5e-8 slice)
    training is sharded BY DEFAULT — the capability the reference lacks
    entirely (single ``torch.device``, src/model_wrapper.py:179)."""
    return create_mesh() if len(jax.devices()) > 1 else None


def replicate(tree, mesh: Mesh):
    """Replicate every leaf of a pytree across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def shard_batch(images: jax.Array, mesh: Mesh) -> jax.Array:
    """Shard a (B, H, W, C) batch along the ``data`` axis."""
    return jax.device_put(images, NamedSharding(mesh, P("data")))


def shard_epoch_batches(batches: jax.Array, mesh: Mesh) -> jax.Array:
    """Shard an epoch's (n_batches, B, H, W, C) stack along ``data`` (the
    per-step batch axis); the scan axis stays unsharded."""
    return jax.device_put(batches, NamedSharding(mesh, P(None, "data")))


def _shard_large_dense(tree, mesh: Mesh, min_elems: int):
    """Tensor-parallel placement for outsized dense layers: any 2-D leaf
    with ≥ ``min_elems`` elements is column-sharded over the whole mesh
    (output-dim sharding — GSPMD turns the following matmul into a local
    (B, in) @ (in, out/P) block and reshards activations only where a later
    op requires it).  At the flagship 256 latents nothing qualifies (the
    DVAE is ~1.3M params, replication is optimal); at the scaled 5640-latent
    config the decoder's ``increase_latent_dim`` kernel is 127M params
    (reference analog: the (1024, 256) dvae.pth `_decoder.increase_latent_dim`
    — SURVEY.md §2c TP row) and replicating it per chip wastes HBM and
    all-reduce bandwidth.  Adam's mu/nu mirror the param tree, so they pass
    through the same rule."""
    total = mesh.devices.size
    spec = NamedSharding(mesh, P(None, ("data", "chain")))

    def place(x):
        if (
            hasattr(x, "ndim") and x.ndim == 2 and x.size >= min_elems
            and x.shape[1] % total == 0
        ):
            return jax.device_put(x, spec)
        return x

    return jax.tree.map(place, tree)


def shard_train_state(
    state, mesh: Mesh, dense_min_elems: int = 1 << 23,
    graph_sharded: bool = False, copy: bool = False,
):
    """Place a TrainState on the mesh: chains row-sharded over ``chain``
    (and ``data``, jointly, when chains are plentiful), outsized dense
    params/opt-moments column-sharded (``_shard_large_dense``), everything
    else replicated.  Committed shardings propagate through the jitted
    step, so no re-wrapping of the step function is needed (GSPMD).

    In PT mode chains are (T, C, n_pad): the temperature ladder is the
    sharded axis, so the replica-exchange ``jnp.roll`` becomes a cross-device
    ppermute over ICI.  When the leading chain axis does not tile the full
    mesh (e.g. a short PT ladder), fall back to the largest mesh-axis subset
    that divides it, or replicate.

    ``graph_sharded`` (TrainStepFns.graph_sharded — the beyond-HBM regime,
    ops/gibbs_graph_sharded.py): chain rows shard over ``data`` only, spin
    COLUMNS over ``chain``, and the dense sampler coupling is row-sharded
    over ``chain`` — the layouts the graph-partitioned sweep consumes
    without resharding.

    NOTE: ``device_put`` with an unchanged (replicated) sharding ALIASES the
    input buffers rather than copying — deliberate, so entering mesh mode
    never copies the multi-GB scaled state.  Consequence: after passing the
    sharded state to the donating ``epoch()``, the original unsharded state
    is dead too (later use raises jax's "Array has been deleted").  Pass
    ``copy=True`` if the input state must survive a later ``epoch()`` call:
    every leaf is device-copied first (``jnp.array`` preserves each leaf's
    existing sharding — an already-row-sharded coupling is copied in place,
    never gathered), so the returned state shares no buffers with the
    input."""
    if copy:
        state = jax.tree.map(jnp.array, state)
    rows = int(state.chains.shape[0])
    if graph_sharded:
        # place the partitioned leaves FIRST, and replicate only the rest:
        # running them through ``replicate`` would device_put the coupling
        # to P() — an all-gather materializing the full n_pad² matrix on
        # every chip — before re-sharding, defeating the beyond-HBM purpose
        # of this mode (jax.tree treats None as an empty subtree, so the
        # placeholders are skipped by the replicate map).
        rows_ax = "data" if rows % mesh.shape["data"] == 0 else None
        if state.chains.ndim == 3:
            # PT: (T, C, n_pad) — ladder over data (exchange = ppermute),
            # graph columns over chain: the 2-D (ladder × graph) layout
            spec = P(rows_ax, None, "chain")
        else:
            spec = P(rows_ax, "chain")
        chains = jax.device_put(state.chains, NamedSharding(mesh, spec))
        cp = state.sampler_coupling
        row_sharded = NamedSharding(mesh, P("chain", None))
        from image_generation_tpu.ops.block_sparse_sharded import (
            ShardedBlockSparseCoupling,
        )

        if isinstance(cp, ShardedBlockSparseCoupling):
            if cp.n_shards != mesh.shape["chain"]:
                # the packed layout bakes in its shard count — a different
                # mesh needs a cache rebuild (fns.rebuild_sampler), which
                # restore paths already do; placing the rows here would
                # silently mis-slice panels
                raise ValueError(
                    f"packed sampler coupling was built for {cp.n_shards} "
                    f"graph shards, mesh 'chain' axis has "
                    f"{mesh.shape['chain']}: rebuild the sampler cache"
                )
            coupling = cp.replace(
                panels=jax.device_put(cp.panels, row_sharded),
                offs=jax.device_put(cp.offs, row_sharded),
                scale=(
                    None
                    if cp.scale is None
                    else jax.device_put(cp.scale, NamedSharding(mesh, P()))
                ),
            )
        elif hasattr(cp, "q"):  # QuantCoupling: int8 rows shard, scale replicates
            coupling = cp._replace(
                q=jax.device_put(cp.q, row_sharded),
                scale=jax.device_put(cp.scale, NamedSharding(mesh, P())),
            )
        elif hasattr(cp, "panels"):
            # a SINGLE-device BlockSparseCoupling's panel layout is global,
            # not per-shard — it cannot be row-placed onto a graph mesh
            raise ValueError(
                "single-device packed coupling in graph-sharded state: "
                "rebuild the sampler cache (fns.rebuild_sampler)"
            )
        else:
            coupling = jax.device_put(cp, row_sharded)
        state = replicate(
            state.replace(chains=None, sampler_coupling=None), mesh
        ).replace(chains=chains, sampler_coupling=coupling)
    else:
        state = replicate(state, mesh)
        for axes in (("data", "chain"), ("data",), ("chain",)):
            size = 1
            for a in axes:
                size *= mesh.shape[a]
            if rows % size == 0:
                spec = P(axes if len(axes) > 1 else axes[0])
                state = state.replace(
                    chains=jax.device_put(state.chains, NamedSharding(mesh, spec))
                )
                break
    state = state.replace(
        dvae_params=_shard_large_dense(state.dvae_params, mesh, dense_min_elems),
        dvae_opt=_shard_large_dense(state.dvae_opt, mesh, dense_min_elems),
    )
    return state
