"""The fused DVAE+GRBM training step — one XLA program per batch.

Reproduces the semantics of the reference's ``ModelWrapper.step``
(src/model_wrapper.py:279-353) with the annealer round-trips replaced by
on-device persistent Gibbs chains:

  1. DVAE forward with R replicas (BatchNorm batch stats, Dropout2d,
     stochastic straight-through spins);
  2. MSE between the reconstruction and the R-times-repeated batch;
  3. negative phase #1: refresh the persistent chains under the current
     prefactor-scaled/clipped GRBM (the per-batch ``grbm.sample`` call,
     src/model_wrapper.py:308-316);
  4. MMD between the (B·R, n) encoded spins and the chain samples; backward
     through MSE+MMD and a torch-Adam(+L2) update of the DVAE;
  5. on scheduled steps (epoch < 6 and step % 10 == 0 — the reference's
     ``train_grbm`` schedule, src/model_wrapper.py:59-67): negative phase #2
     (the reference's second QPU call inside ``nll_loss``) and a closed-form
     moment-matching NLL update of the GRBM under ``lax.cond`` (so unscheduled
     steps skip the cost *and* keep Adam's step count/bias correction frozen,
     exactly like the reference only calling ``optimizer.step()`` then);
  6. LR schedules: geomspace with the reference's one-step lag, applied by
     explicit scaling (both LR tables advance every step even when the GRBM
     does not update — matching src/model_wrapper.py:346-351).

Persistent chains fix the reference's dead sample cache
(``PersistentQPUSampleHelper`` resets itself every call,
src/utils/persistent_qpu_sampler.py:61-63) with actual persistence: PCD
chains never reset during a run, so negative-phase quality *improves* over
naive restarts while costing a fraction of the sweeps.

``train_epoch`` scans the step over a whole epoch of batches so the host
never intervenes — the TPU runs 468 fused steps back to back.
"""

from __future__ import annotations

from functools import partial
from math import prod as np_prod
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from image_generation_tpu.config import TrainingConfig
from image_generation_tpu.models.dvae import DVAE
from image_generation_tpu.models.grbm import (
    GRBMGraph,
    GRBMParams,
    nll_grads,
    nll_value,
    scaled_ising,
)
from image_generation_tpu.ops.gibbs import (
    GibbsPlan,
    build_plan,
    gibbs_sweeps,
    ising_energies,
    permuted_model,
    pt_round,
    random_spins,
    to_original,
)
from image_generation_tpu.ops.gibbs_pallas import gibbs_sweeps_pallas, supported_by_pallas
from image_generation_tpu.ops.mmd import GaussianKernel, mmd_loss
from image_generation_tpu.training.schedules import geomspace_lr

__all__ = ["TrainState", "TrainStepFns", "make_train_fns"]

# ADAM_FACTORED_NU="on" factors the second moment of 2-D DVAE params with
# at least this many elements (training/optim.py FactoredNu).  4M elements
# catches only the scaled config's 127M dense layer — at the flagship 256
# latents every layer keeps exact dense Adam.  Module-level so tests can
# lower it.
_FACTORED_NU_MIN = 1 << 22


@struct.dataclass
class TrainState:
    dvae_params: dict
    batch_stats: dict
    grbm_params: GRBMParams
    dvae_opt: optax.OptState
    grbm_opt: optax.OptState
    chains: jax.Array  # (NUM_READS, n_pad) persistent Gibbs chains (±1)
    chain_energies: jax.Array  # PT mode: (T, C) carried ladder energies of
    # ``chains`` under the cached sampler model — sweeps track ΔE and swap
    # passes permute them, so replica exchange never recomputes a full
    # (T·C, n_pad)×(n_pad, n_pad) energy matmul; refreshed whenever the
    # model changes (scheduled GRBM steps, rebuild_sampler).  Non-PT mode:
    # a (0,) placeholder.
    sampler_h: jax.Array  # (n_pad,) cached permuted fields of the scaled model
    sampler_coupling: jax.Array  # (n_pad, n_pad) cached permuted couplings —
    # rebuilt only when grbm_params change (the scheduled GRBM steps), so the
    # common step pays zero model-build cost.  Stored in the matmul dtype
    # (bf16 at n_pad ≥ 2048); under SAMPLER_MATMUL_DTYPE="int8" this leaf is
    # a QuantCoupling pytree (int8 matrix + f32 scale, ops/quant.py)
    opt_step: jax.Array  # int32 global step counter
    rng: jax.Array  # PRNG key threaded through steps
    pt_betas: jax.Array  # PT mode: the (T,) live temperature ladder — a
    # TRACED leaf so PT_ADAPT's between-epoch equal-barrier re-spacing
    # (trainer.py, ops/pt_tune._respace) changes rung values without any
    # recompilation; non-derivable once adapted, so native checkpoints
    # carry it.  Carried energies stay valid across re-spacing (an Ising
    # energy does not depend on β).  Non-PT mode: a (0,) placeholder.


@struct.dataclass
class StepMetrics:
    mse: jax.Array
    mmd: jax.Array
    dvae_loss: jax.Array
    nll: jax.Array
    grbm_trained: jax.Array
    pt_accept: jax.Array  # PT mode: (T-1,) per-pair mean analytic swap
    # acceptance of this step's replica exchange (pt_round return_accept) —
    # free ladder-health observability, and the measurement PT_ADAPT's
    # re-spacing consumes.  Non-PT mode: a (0,) placeholder.


class TrainStepFns:
    """Bundle of jitted training functions bound to one (config, graph)."""

    def __init__(
        self,
        config,
        graph,
        dvae,
        init_fn,
        step_fn,
        epoch_fn,
        sample_fn,
        step_body,
        rebuild_sampler,
        rebuild_cache=None,
        dvae_lr=None,
        grbm_lr=None,
        sampler_impl=None,
        graph_sharded=False,
    ):
        self.config = config
        self.graph = graph
        self.dvae = dvae
        self.init = init_fn
        self.step = step_fn
        self.epoch = epoch_fn
        self.sample = sample_fn
        self.step_body = step_body  # unjitted: for sharded/pjit wrapping
        self.rebuild_sampler = rebuild_sampler  # refresh cache after swapping params
        self.rebuild_cache = rebuild_cache  # cache only, no chain re-burn
        # (checkpoint restore: io/native_ckpt.py strips the derived cache)
        self.dvae_lr = dvae_lr  # step → LR (observability: the reference
        self.grbm_lr = grbm_lr  # prints/dumps both per epoch)
        # which negative-phase sampler this bundle compiled in: one of
        # "pallas_vmem[_sharded]", "pallas_hbm[_sharded]", "xla" —
        # observability for benchmarks and a test point for the mesh
        # fallback rule (non-tiling chains must drop to the XLA sampler)
        self.sampler_impl = sampler_impl
        # the coupling matrix / spin columns are partitioned over the mesh —
        # shard_train_state must use the matching chain/coupling layout
        self.graph_sharded = graph_sharded


def make_train_fns(
    cfg: TrainingConfig,
    graph: GRBMGraph,
    total_steps: int,
    plan: Optional[GibbsPlan] = None,
    mesh=None,
) -> TrainStepFns:
    """Build init/step/epoch functions for a config + coupling graph.

    ``total_steps`` = n_epochs · n_batches, fixing the LR schedules
    (reference: src/model_wrapper.py:263-268).

    ``mesh``: optional ``jax.sharding.Mesh`` — the multi-chip training path.
    The fused step itself is partitioned by GSPMD from the input shardings
    (parallel/mesh.py); the only explicit change is the negative phase:
    the Pallas kernel cannot be auto-partitioned, so it is wrapped in
    ``shard_map`` (ops/gibbs_pallas.gibbs_sweeps_pallas_sharded — chains are
    independent, zero inter-chip communication).
    """
    if plan is None:
        plan = build_plan(graph)
    dvae = DVAE(
        n_latents=cfg.N_LATENTS,
        latent_to_discrete=cfg.LATENT_TO_DISCRETE,
        gumbel_tau=cfg.GUMBEL_TAU,
        dtype=jnp.dtype(cfg.COMPUTE_DTYPE),
    )
    kernel = GaussianKernel(n_kernels=cfg.N_KERNELS)
    dvae_lr = geomspace_lr(cfg.AUTOENCODER_INITIAL_LR, cfg.AUTOENCODER_FINAL_LR, total_steps)
    grbm_lr = geomspace_lr(cfg.BM_INITIAL_LR, cfg.BM_FINAL_LR, total_steps)

    # torch.optim.Adam(lr, weight_decay) ≡ L2-into-grad then Adam moments;
    # LR applied explicitly per step so the schedule indexing is exact.
    _factored_min = _FACTORED_NU_MIN if cfg.ADAM_FACTORED_NU == "on" else None
    if cfg.ADAM_MOMENT_DTYPE == "float32" and _factored_min is None:
        _adam = optax.scale_by_adam()  # stock path: bit-identical to r1/r2
    else:
        # bf16-stored moments and/or factored nu (f32 arithmetic) — shrink
        # the optimizer-state HBM traffic that floors the scaled config's
        # update pass (training/optim.py)
        from image_generation_tpu.training.optim import scale_by_adam_moments

        _adam = scale_by_adam_moments(
            moment_dtype=(
                None
                if cfg.ADAM_MOMENT_DTYPE == "float32"
                else jnp.dtype(cfg.ADAM_MOMENT_DTYPE)
            ),
            factored_nu_min_size=_factored_min,
        )
    dvae_tx = optax.chain(
        optax.add_decayed_weights(cfg.AUTOENCODER_WEIGHT_DECAY), _adam
    )
    grbm_tx = optax.chain(
        optax.add_decayed_weights(cfg.BM_WEIGHT_DECAY), optax.scale_by_adam()
    )

    use_pallas = cfg.USE_PALLAS == "on" or (
        cfg.USE_PALLAS == "auto" and jax.default_backend() == "tpu"
    )
    pt_mode = cfg.SAMPLER == "pt"
    if pt_mode and isinstance(cfg.PT_NUM_BETAS, str):
        # fail fast with the real cause: 'auto' × NUM_READS below would be
        # string repetition and die far downstream with a shape error.
        # Outside PT mode the knob is inert — a gibbs-mode config carrying
        # PT_NUM_BETAS='auto' (e.g. --sampler gibbs with a PT-tuned YAML)
        # must not crash
        raise ValueError(
            "PT_NUM_BETAS='auto' must be resolved to a concrete ladder "
            "before step functions are built — the Trainer does this at "
            "train_init/load (Trainer._resolve_auto_ladder); direct "
            "make_train_fns callers must pass an explicit size/PT_BETAS"
        )
    int8_sampler = cfg.SAMPLER_MATMUL_DTYPE == "int8"
    # bf16 pays only when coupling-matrix traffic dominates the cast cost;
    # int8 quantization is carried by the QuantCoupling the cached sampler
    # model stores (ops/quant.py — every sweep/energy impl branches on it),
    # so no cast dtype is threaded (policy lives on TrainingConfig so the
    # tune-pt CLI resolves the identical model)
    mm_dtype = cfg.resolved_sampler_matmul_dtype(plan.n_pad)
    # VMEM-resident kernel when the coupling matrix fits on-chip IN ITS
    # RESIDENT DTYPE (bf16/int8 halve/quarter the footprint); the
    # HBM-streaming kernel otherwise (1.6× over the XLA path at 5640 spins).
    # PT mode flattens the ladder, so the effective chain count is T·C.
    _eff_chains = cfg.PT_NUM_BETAS * cfg.NUM_READS if pt_mode else cfg.NUM_READS
    # the ONE spelling of the resident-coupling itemsize: the cached
    # sampler_coupling is stored int8 (QuantCoupling) / the matmul dtype /
    # f32 — BOTH the VMEM gate here and the beyond-HBM auto gate below
    # size against it
    _coupling_itemsize = 1 if int8_sampler else (
        jnp.dtype(mm_dtype).itemsize if mm_dtype is not None else 4
    )
    pallas_vmem = supported_by_pallas(
        plan, _eff_chains, coupling_itemsize=_coupling_itemsize
    )
    # geometric spacing by default; PT_BETAS plugs in a tuned ladder (e.g.
    # the equal-barrier schedule from ops/pt_tune.tune_pt_betas).  This is
    # the INITIAL ladder: the live one is a TrainState leaf (pt_betas), a
    # traced argument of every pt_round — so PT_ADAPT's between-epoch
    # re-spacing (training/trainer.py) updates rung values with ZERO
    # recompilation, and checkpoints carry the adapted ladder.
    betas0 = (
        jnp.asarray(cfg.initial_pt_betas(), jnp.float32) if pt_mode else None
    )  # only PT paths read it; initial_pt_betas raises on unresolved 'auto'
    # multi-chip: shard_map the Pallas kernel over the chain rows when they
    # tile the mesh exactly; otherwise the XLA sampler (which GSPMD
    # partitions on its own from the chains' sharding) keeps correctness.
    sharded_ctx = mesh is not None and mesh.devices.size > 1
    pallas_sharded = sharded_ctx and _eff_chains % mesh.devices.size == 0
    # On a mesh the Pallas kernel is legal ONLY through the shard_map wrapper
    # (GSPMD cannot partition a Mosaic custom call; an unsharded pallas_call
    # on sharded chains would force replication or fail to compile) — when
    # the chains don't tile the mesh, drop to the XLA sampler, which GSPMD
    # partitions from the chains' sharding on its own.
    pallas_ok = use_pallas and (not sharded_ctx or pallas_sharded)
    # graph partitioning (ops/gibbs_graph_sharded.py): coupling rows + spin
    # columns sharded over the mesh's "chain" axis — the beyond-single-chip
    # -HBM regime. Composes with PT: the temperature ladder shards over
    # "data" (replica exchange = ppermute) while the graph dimension shards
    # over "chain" — a 2-D (ladder × graph) sampler layout.
    graph_tiles = (
        sharded_ctx
        and "chain" in mesh.axis_names
        and mesh.shape["chain"] > 1  # a size-1 axis would fully replicate
        and plan.n_pad % mesh.shape["chain"] == 0
    )
    if cfg.GRAPH_SHARDED == "on" and not graph_tiles:
        # an explicitly requested partitioning that can't be honored would
        # silently replicate a coupling matrix the user said doesn't fit —
        # fail loudly instead (including with no mesh at all: one device
        # cannot partition anything)
        where = (
            f"the mesh 'chain' axis ({mesh.shape.get('chain')}) cannot "
            f"partition n_pad={plan.n_pad}: it must have size > 1 and "
            f"divide n_pad"
            if sharded_ctx
            else "there is no multi-device mesh to partition over"
        )
        raise ValueError(
            f"GRAPH_SHARDED='on' but {where}. Provide a mesh whose 'chain' "
            f"axis fits (e.g. --mesh 1x8 / create_mesh(n, shape=(rows, "
            f"graph))) or use GRAPH_SHARDED='off'."
        )
    # the auto gate is sized on the coupling's RESIDENT footprint
    # (_coupling_itemsize above), not construction-time f32
    graph_sharded = graph_tiles and (
        cfg.GRAPH_SHARDED == "on"
        or (
            cfg.GRAPH_SHARDED == "auto"
            and plan.n_pad * plan.n_pad * _coupling_itemsize > (2 << 30)
        )
    )
    # block-sparse sweeps (ops/block_sparse.py): the cached coupling is
    # packed into its occupied chunk panels and the XLA / HBM-Pallas sweeps
    # read only those — FLOPs and coupling traffic drop by the measured
    # chunk occupancy (~3-4× on hardware graphs, whose BFS-ordered plans
    # concentrate each color's couplings into few chunks).  Not for the
    # VMEM-resident kernel (dense-in-VMEM is already optimal).  COMPOSES
    # with the graph-sharded layout (ops/block_sparse_sharded.py): each
    # shard packs its own row block on a shard-local chunk grid, cutting
    # per-chip coupling memory and sweep FLOPs by the PADDED occupancy
    # (panel counts pad to the max across shards — shard_map is one
    # program), which therefore also gates 'auto' in that mode.
    block_sparse = cfg.resolved_block_sparse(plan)
    if block_sparse and graph_sharded:
        from image_generation_tpu.ops.block_sparse_sharded import (
            sharded_chunk_meta,
            supports_sharded_block_sparse,
        )

        n_gs = mesh.shape["chain"]
        if not supports_sharded_block_sparse(plan, n_gs, cfg.SWEEP_BS_CHUNK):
            if cfg.SWEEP_BLOCK_SPARSE == "on":
                # an explicit request that can't be honored must not
                # silently sweep dense (mirrors the GRAPH_SHARDED="on"
                # fail-loud contract)
                raise ValueError(
                    f"SWEEP_BLOCK_SPARSE='on' under GRAPH_SHARDED, but "
                    f"chunk={cfg.SWEEP_BS_CHUNK} does not fit the {n_gs}"
                    f"-way row shard of n_pad={plan.n_pad} "
                    f"(= {plan.n_pad // n_gs} rows/shard). Lower "
                    f"SWEEP_BS_CHUNK or the graph-axis size, or use "
                    f"SWEEP_BLOCK_SPARSE='auto'."
                )
            block_sparse = False
        elif cfg.SWEEP_BLOCK_SPARSE == "auto":
            block_sparse = (
                sharded_chunk_meta(plan, n_gs, cfg.SWEEP_BS_CHUNK).occupancy
                <= 0.75
            )
    if block_sparse and not graph_sharded and pallas_ok and pallas_vmem:
        # the packed form replaces the dense cache, which the VMEM kernel
        # needs — block-sparse wins the conflict and the sweep streams the
        # panels from HBM.  Measured at the overlap the resident-dtype
        # VMEM gate opened (n_pad 2048 bf16, occupancy 0.31 grid, the only
        # regime where 'auto' engages at a VMEM-sized shape): packed
        # streaming 0.75 ms vs dense-VMEM 0.91 ms per refresh
        # (runs/vmem_midsize_bench_grid.json) — consistent with the ≤0.75
        # occupancy auto gate (QPU graphs are denser than that here and
        # keep the dense VMEM kernel).
        pallas_vmem = False
    gs_pallas_update = False
    if graph_sharded:
        # composes with int8: the quantized coupling's int8 rows shard the
        # same way (QuantCoupling q over 'chain', scale replicated) and the
        # partial-fields psum rides int32 — exact for ±1 × int8 — with one
        # scale-out after the collective (ops/gibbs_graph_sharded.py);
        # beyond-HBM couplings shrink another 2× vs bf16.
        # The streaming kernels themselves cannot cross the per-span psum
        # boundary (a collective can't run inside Mosaic), but their
        # hardware-PRNG Bernoulli update can: use_pallas swaps the XLA
        # threefry update for the Pallas span-update kernel
        # (ops/gibbs_graph_sharded_pallas.py) — matmuls/psums stay XLA.
        pallas_ok = False  # the full kernels hold whole coupling rows
        gs_pallas_update = use_pallas and (
            "row_seed" if cfg.PLRNG_ROW_SEED == "on" else True
        )
        sampler_impl = "xla_graph_sharded" + (
            "+plrng_rs" if gs_pallas_update == "row_seed"
            else "+plrng" if gs_pallas_update else ""
        )
    elif pallas_ok:
        sampler_impl = "pallas_vmem" if pallas_vmem else "pallas_hbm"
        if pallas_sharded:
            sampler_impl += "_sharded"
    else:
        sampler_impl = "xla"
    if int8_sampler:
        sampler_impl += "+int8"  # observability: bench/tests assert the path
    if block_sparse:
        sampler_impl += "+bs"

    # PT swap energies in graph-sharded mode go through the reduce_scatter
    # layout — the plain ising_energies under GSPMD is free to all-gather
    # the row-sharded coupling, violating the no-whole-matrix invariant.
    # Shared by BOTH pt_round call sites (run_sweeps and sample_fn).
    pt_energies_fn = None
    if graph_sharded:
        from image_generation_tpu.ops.gibbs_graph_sharded import (
            ising_energies_graph_sharded,
        )

        def pt_energies_fn(h_, c_, s_):
            return ising_energies_graph_sharded(
                h_, c_, s_, mesh, matmul_dtype=mm_dtype
            )

    def sweeps_fn(key, hp, coupling_p, plan_, chains, n_sweeps, beta=1.0,
                  track_delta_e=False):
        if graph_sharded:
            from image_generation_tpu.ops.gibbs_graph_sharded import (
                gibbs_sweeps_graph_sharded,
            )

            return gibbs_sweeps_graph_sharded(
                key, hp, coupling_p, plan_, chains, n_sweeps, mesh, beta,
                matmul_dtype=mm_dtype, track_delta_e=track_delta_e,
                pallas_update=gs_pallas_update,
            )
        if (
            pallas_ok
            and pallas_sharded
            and chains.shape[0] % mesh.devices.size
        ):
            # the shard_map wrapper was selected from the TRAINING chain
            # count (_eff_chains), but generation/eval may call with ANY
            # num_reads — a row count that doesn't tile the mesh can't go
            # through shard_map, so this call drops to the XLA sweep
            # (GSPMD partitions it from the chains' sharding), the same
            # rule the build-time decision applies
            return gibbs_sweeps(
                key, hp, coupling_p, plan_, chains, n_sweeps, beta,
                matmul_dtype=mm_dtype, track_delta_e=track_delta_e,
            )
        if pallas_ok and pallas_vmem and supported_by_pallas(
            plan_, chains.shape[0], coupling_itemsize=_coupling_itemsize
        ):
            # per-SHAPE re-check, like the mesh-tiling rule above: the
            # build-time pallas_vmem came from the TRAINING chain count,
            # but a generation/serving call with more chains (coalesced
            # requests fold into this dimension) can pick a bigger chain
            # block and bust the VMEM budget the gate enforces — such
            # calls stream from HBM instead
            if pallas_sharded:
                from image_generation_tpu.ops.gibbs_pallas import (
                    gibbs_sweeps_pallas_sharded,
                )

                return gibbs_sweeps_pallas_sharded(
                    key, hp, coupling_p, plan_, chains, n_sweeps, mesh, beta,
                    matmul_dtype=mm_dtype, track_delta_e=track_delta_e,
                )
            return gibbs_sweeps_pallas(
                key, hp, coupling_p, plan_, chains, n_sweeps, beta,
                matmul_dtype=mm_dtype, track_delta_e=track_delta_e,
            )
        # Large graph: the HBM-streaming kernel holds a chain block's spins
        # resident in VMEM (512-row blocks via manual DMA) and re-streams
        # the coupling per block — per-sweep HBM traffic is
        # (chains/512)·n_pad²·2B vs the XLA path's per-color spin re-reads,
        # a win at every chain count (the r1 256-chain crossover was an
        # artifact of 128-row blocks).  On a mesh it runs per shard under
        # the same zero-comm shard_map wrapper as the VMEM kernel.
        if pallas_ok:
            from image_generation_tpu.ops.gibbs_pallas_hbm import gibbs_sweeps_pallas_hbm

            if pallas_sharded:
                from image_generation_tpu.ops.gibbs_pallas import (
                    gibbs_sweeps_pallas_sharded,
                )

                return gibbs_sweeps_pallas_sharded(
                    key, hp, coupling_p, plan_, chains, n_sweeps, mesh, beta,
                    kernel_fn=gibbs_sweeps_pallas_hbm,
                    block_dtype=mm_dtype or jnp.float32,
                    track_delta_e=track_delta_e,
                )
            return gibbs_sweeps_pallas_hbm(
                key, hp, coupling_p, plan_, chains, n_sweeps, beta,
                block_dtype=mm_dtype or jnp.float32,
                track_delta_e=track_delta_e,
            )
        return gibbs_sweeps(
            key, hp, coupling_p, plan_, chains, n_sweeps, beta,
            matmul_dtype=mm_dtype, track_delta_e=track_delta_e,
        )

    _no_energies = lambda: jnp.zeros((0,), jnp.float32)  # non-PT placeholder

    def compute_energies(hp, coupling_p, chains):
        """(T, C) ladder energies under the current sampler model — only
        needed when the carried energies are invalid (fresh chains, model
        just changed).  Graph-sharded mode rides the reduce_scatter layout."""
        if not pt_mode:
            return _no_energies()
        if pt_energies_fn is not None:
            return pt_energies_fn(hp, coupling_p, chains)
        return ising_energies(hp, coupling_p, chains, mm_dtype)

    _no_accept = lambda: jnp.zeros((0,), jnp.float32)  # non-PT placeholder

    def run_sweeps(key, hp, coupling_p, chains, n_sweeps, energies=None,
                   betas=None):
        """One negative-phase refresh of the persistent chain state.

        Plain mode: ``n_sweeps`` Gibbs sweeps of (NUM_READS, n_pad) chains.
        PT mode (SAMPLER="pt"): chains are a (PT_NUM_BETAS, NUM_READS, n_pad)
        temperature ladder; each refresh is one PT round (n_sweeps Gibbs
        sweeps at every temperature + even/odd replica exchange) at
        ``betas`` (the live ``state.pt_betas`` in the step; the config
        ladder ``betas0`` by default for init/generation).

        Returns (chains, energies, accept).  In PT mode ``energies``
        carried from the previous refresh (same model, same chains) removes
        BOTH historical per-round full-ladder energy matmuls: sweeps track
        ΔE in-kernel and the swap passes permute energies with the
        configurations; pass ``energies=None`` when the carry is invalid
        (fresh chains / model changed) — then one energy computation runs
        after the sweeps.  ``accept`` is the (T-1,) per-pair swap
        acceptance of the round (PT_ADAPT / observability input).
        """
        if pt_mode:
            return pt_round(
                key, hp, coupling_p, plan, chains,
                betas0 if betas is None else betas, n_sweeps,
                sweeps_fn=sweeps_fn, matmul_dtype=mm_dtype,
                energies_fn=pt_energies_fn,
                energies=energies, return_accept=True,
            )
        return (
            sweeps_fn(key, hp, coupling_p, plan, chains, n_sweeps),
            _no_energies(),
            _no_accept(),
        )

    def chain_samples(chains):
        """(NUM_READS, n) target-distribution samples in original coords."""
        if pt_mode and mesh is not None and mesh.devices.size > 1:
            # The β=1 target row is chains[-1], but on a mesh the ladder's
            # temperature axis is the sharded one (parallel/mesh.py
            # shard_train_state) and GSPMD answers a sharded-axis slice with
            # an "involuntary full rematerialization" (replicate-then-slice).
            # A one-hot contraction over T partitions cleanly instead: each
            # shard contributes its masked partial sum and one (C, n_pad)
            # psum delivers the replicated target row.
            mask = jnp.zeros((chains.shape[0],), chains.dtype).at[-1].set(1)
            target = jnp.einsum("t,tcn->cn", mask, chains)
        else:
            target = chains[-1] if pt_mode else chains
        return to_original(plan, target)

    def build_sampler_model(grbm_params: GRBMParams):
        """(hp, coupling_p) of the prefactor-scaled, range-clipped model in
        padded/color-permuted coordinates."""
        h, j = scaled_ising(grbm_params, cfg.PREFACTOR, cfg.H_RANGE, cfg.J_RANGE)
        hp, coupling_p = permuted_model(plan, h, j)
        if int8_sampler:
            # int8 MXU path: the cached coupling becomes a QuantCoupling
            # (int8 matrix + f32 scale, ops/quant.py) — 4× smaller than f32
            # and 2× the bf16 MXU rate; h stays f32 (added to fields
            # unquantized)
            from image_generation_tpu.ops.quant import quantize_coupling

            coupling_p = quantize_coupling(coupling_p)
        elif mm_dtype is not None:
            # store the cached coupling in the matmul dtype: every consumer
            # (XLA sweep, both Pallas kernels, graph-sharded sweep, PT swap
            # energies) casts to mm_dtype anyway, so this halves the state's
            # biggest buffer AND removes a full-size cast copy per
            # negative-phase refresh (bf16 sampling is statistically
            # validated in tests/test_gibbs.py)
            coupling_p = coupling_p.astype(mm_dtype)
        if block_sparse and not graph_sharded:
            # pack the occupied chunk panels (ops/block_sparse.py) — this
            # REPLACES the dense cache: sweeps (XLA + HBM Pallas) and ladder
            # energies all read the packed form, and the resident coupling
            # shrinks by the occupancy factor on top of the dtype savings
            from image_generation_tpu.ops.block_sparse import pack_coupling

            coupling_p = pack_coupling(plan, coupling_p, cfg.SWEEP_BS_CHUNK)
        if graph_sharded:
            # constrain so GSPMD CONSTRUCTS the dense matrix row-sharded —
            # a replicated intermediate would defeat the memory point
            # (for a QuantCoupling: its int8 rows; the f32 scale replicates)
            from jax.sharding import NamedSharding, PartitionSpec as P

            row_sharded = NamedSharding(mesh, P("chain", None))
            if int8_sampler:
                coupling_p = coupling_p._replace(
                    q=jax.lax.with_sharding_constraint(coupling_p.q, row_sharded)
                )
            else:
                coupling_p = jax.lax.with_sharding_constraint(
                    coupling_p, row_sharded
                )
            if block_sparse:
                # then pack each shard's OWN rows (the dense row shards are
                # only a packing-time transient): per-chip coupling memory
                # and per-color sweep FLOPs drop by the padded occupancy on
                # top of the mesh factor (ops/block_sparse_sharded.py)
                from image_generation_tpu.ops.block_sparse_sharded import (
                    pack_coupling_graph_sharded,
                )

                coupling_p = pack_coupling_graph_sharded(
                    plan, coupling_p, mesh, "chain", cfg.SWEEP_BS_CHUNK
                )
        return hp, coupling_p

    def refresh_chains(key, grbm_params: GRBMParams, chains: jax.Array, n_sweeps: int):
        """Fresh-model path (init/generation): builds the model then sweeps.
        Returns chains only (carried energies don't outlive this call)."""
        hp, coupling_p = build_sampler_model(grbm_params)
        return run_sweeps(key, hp, coupling_p, chains, n_sweeps)[0]

    def init_fn(key: jax.Array, sample_image: jax.Array) -> TrainState:
        """sample_image: (1, S, S, 1) used only for shape-correct init."""
        k_dvae, k_grbm, k_chains, k_burn, k_rng = jax.random.split(key, 5)
        variables = dvae.init(
            {"params": k_dvae, "spins": k_chains, "dropout": k_burn},
            sample_image,
            n_replicas=cfg.N_REPLICAS if cfg.LATENT_TO_DISCRETE is None else 1,
            train=False,
        )
        grbm_params = graph.init_params(k_grbm)
        hp, coupling_p = build_sampler_model(grbm_params)
        if cfg.SAMPLER == "pt":
            chains = random_spins(
                k_chains, plan, cfg.PT_NUM_BETAS * cfg.NUM_READS
            ).reshape(cfg.PT_NUM_BETAS, cfg.NUM_READS, plan.n_pad)
        else:
            chains = random_spins(k_chains, plan, cfg.NUM_READS)
        chains, chain_e, _ = run_sweeps(
            k_burn, hp, coupling_p, chains, cfg.GIBBS_BURN_IN
        )
        return TrainState(
            dvae_params=variables["params"],
            batch_stats=variables["batch_stats"],
            grbm_params=grbm_params,
            dvae_opt=dvae_tx.init(variables["params"]),
            grbm_opt=grbm_tx.init(grbm_params),
            chains=chains,
            chain_energies=chain_e,
            sampler_h=hp,
            sampler_coupling=coupling_p,
            opt_step=jnp.asarray(0, jnp.int32),
            rng=k_rng,
            # a COPY of betas0: epoch() donates the state, and donating the
            # closure constant itself would delete the buffer sample_fn /
            # run_sweeps defaults still reference
            pt_betas=jnp.array(betas0) if pt_mode else jnp.zeros((0,), jnp.float32),
        )

    def step_body(state: TrainState, images: jax.Array, epoch: jax.Array):
        rng, k_spins, k_drop, k_neg1, k_neg2, k_fresh = jax.random.split(state.rng, 6)

        # ---- negative phase #1 (the per-batch sampler call) ----
        # uses the cached sampler model: grbm params are unchanged since the
        # last scheduled GRBM update, so (sampler_h, sampler_coupling) are
        # exactly scaled_ising(current params).
        # PERSISTENT_CHAINS=False gives CD-style fresh restarts per step
        # (the reference restarts the annealer every call); True (default)
        # is PCD — the working version of its intended sample reuse.
        chains_in = state.chains
        energies_in = state.chain_energies if (pt_mode and cfg.PERSISTENT_CHAINS) else None
        if not cfg.PERSISTENT_CHAINS:
            flat = random_spins(k_fresh, plan, int(np_prod(chains_in.shape[:-1])))
            chains_in = flat.reshape(chains_in.shape)
        chains, chain_e, pt_accept = run_sweeps(
            k_neg1, state.sampler_h, state.sampler_coupling, chains_in,
            cfg.GIBBS_SWEEPS, energies=energies_in, betas=state.pt_betas,
        )
        samples = jax.lax.stop_gradient(chain_samples(chains))

        # ---- DVAE forward + MSE + MMD, backward ----
        def loss_fn(dvae_params):
            (logits, spins, recon), mutated = dvae.apply(
                {"params": dvae_params, "batch_stats": state.batch_stats},
                images,
                n_replicas=cfg.N_REPLICAS,
                train=True,
                rngs={"spins": k_spins, "dropout": k_drop},
                mutable=["batch_stats"],
            )
            target = jnp.broadcast_to(images[:, None], recon.shape)
            mse = jnp.mean(jnp.square(recon - target))
            flat_spins = spins.reshape(-1, spins.shape[-1])
            mmd = mmd_loss(flat_spins, samples, kernel)
            loss = mse + mmd
            return loss, (mse, mmd, flat_spins, mutated["batch_stats"])

        (dvae_loss, (mse, mmd, flat_spins, batch_stats)), dvae_grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.dvae_params)

        lr_d = dvae_lr(state.opt_step)
        dvae_updates, dvae_opt = dvae_tx.update(dvae_grads, state.dvae_opt, state.dvae_params)
        dvae_params = jax.tree.map(lambda p, u: p - lr_d * u, state.dvae_params, dvae_updates)

        # ---- scheduled GRBM update (reference train_grbm schedule) ----
        train_grbm = jnp.logical_and(epoch < 6, state.opt_step % 10 == 0)
        data_spins = jax.lax.stop_gradient(flat_spins)

        def grbm_branch(op):
            grbm_params, grbm_opt, chains_in, chain_e_in, hp, coupling_p = op
            # negative phase #2 — the reference's second QPU call per
            # scheduled step (inside nll_loss, src/losses.py:50-57); the
            # carried energies from phase #1 are valid (same model/chains)
            chains2, chain_e2, _ = run_sweeps(
                k_neg2, hp, coupling_p, chains_in, cfg.GIBBS_SWEEPS,
                energies=chain_e_in if pt_mode else None,
                betas=state.pt_betas,
            )
            model_spins = chain_samples(chains2)
            grads = nll_grads(graph, data_spins, model_spins)
            updates, opt2 = grbm_tx.update(grads, grbm_opt, grbm_params)
            lr_g = grbm_lr(state.opt_step)
            new_params = jax.tree.map(lambda p, u: p - lr_g * u, grbm_params, updates)
            nll = nll_value(grbm_params, graph, data_spins, model_spins)
            hp2, coupling_p2 = build_sampler_model(new_params)  # refresh cache
            # energies are model-dependent: re-anchor under the NEW model
            # (one ladder energy computation per scheduled GRBM step — this
            # also bounds the ΔE-carry float drift to ≤10 steps while the
            # GRBM trains, and the model is frozen afterwards)
            chain_e2 = compute_energies(hp2, coupling_p2, chains2)
            return new_params, opt2, chains2, chain_e2, hp2, coupling_p2, nll

        def no_grbm(op):
            grbm_params, grbm_opt, chains_in, chain_e_in, hp, coupling_p = op
            return (
                grbm_params, grbm_opt, chains_in, chain_e_in, hp, coupling_p,
                jnp.asarray(0.0, jnp.float32),
            )

        (
            grbm_params, grbm_opt, chains, chain_e, sampler_h, sampler_coupling, nll,
        ) = jax.lax.cond(
            train_grbm,
            grbm_branch,
            no_grbm,
            (
                state.grbm_params, state.grbm_opt, chains, chain_e,
                state.sampler_h, state.sampler_coupling,
            ),
        )

        new_state = TrainState(
            dvae_params=dvae_params,
            batch_stats=batch_stats,
            grbm_params=grbm_params,
            dvae_opt=dvae_opt,
            grbm_opt=grbm_opt,
            chains=chains,
            chain_energies=chain_e,
            sampler_h=sampler_h,
            sampler_coupling=sampler_coupling,
            opt_step=state.opt_step + 1,
            rng=rng,
            pt_betas=state.pt_betas,
        )
        metrics = StepMetrics(
            mse=mse, mmd=mmd, dvae_loss=dvae_loss, nll=nll,
            grbm_trained=train_grbm.astype(jnp.float32),
            pt_accept=pt_accept,
        )
        return new_state, metrics

    @jax.jit
    def step_fn(state: TrainState, images: jax.Array, epoch: jax.Array):
        return step_body(state, images, epoch)

    @partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(state: TrainState, batches: jax.Array, epoch: jax.Array):
        """Scan the step over (n_batches, B, S, S, 1) — one XLA dispatch.

        The carried state is donated: at the scaled config it is ~1.6 GB
        (127M-param dense + two Adam moments in f32), and donation lets XLA
        update it in place instead of holding input + output copies —
        halving the state's peak-HBM footprint.  Callers must rebind
        (``state = fns.epoch(state, ...)``), which every product path does.
        """

        def body(s, imgs):
            return step_body(s, imgs, epoch)

        return jax.lax.scan(body, state, batches)

    @partial(jax.jit, static_argnums=(2, 3))
    def sample_fn(key: jax.Array, grbm_params: GRBMParams, num_reads: int,
                  n_sweeps: int, betas: Optional[jax.Array] = None):
        """Standalone sampler call for generation (grbm.sample equivalent).

        Returns (num_reads, n) spins in original coordinates.  In PT mode a
        fresh temperature ladder is burned in and the target row returned;
        ``betas`` overrides the config ladder (pass ``state.pt_betas`` to
        sample with a PT_ADAPT-adapted ladder).
        """
        k1, k2 = jax.random.split(key)
        if pt_mode:
            b = betas0 if betas is None else betas
            ladder = random_spins(k1, plan, cfg.PT_NUM_BETAS * num_reads).reshape(
                cfg.PT_NUM_BETAS, num_reads, plan.n_pad
            )
            hp, coupling_p = build_sampler_model(grbm_params)
            n_rounds = max(1, n_sweeps // max(cfg.GIBBS_SWEEPS, 1))
            # ladder energies computed once, then carried through every round
            e0 = compute_energies(hp, coupling_p, ladder)

            def round_fn(carry, k):
                s, e = carry
                return pt_round(
                    k, hp, coupling_p, plan, s, b, cfg.GIBBS_SWEEPS,
                    sweeps_fn=sweeps_fn, matmul_dtype=mm_dtype,
                    energies_fn=pt_energies_fn,
                    energies=e, return_energies=True,
                ), None

            (ladder, _), _ = jax.lax.scan(
                round_fn, (ladder, e0), jax.random.split(k2, n_rounds)
            )
            return to_original(plan, ladder[-1])
        chains = random_spins(k1, plan, num_reads)
        return to_original(plan, refresh_chains(k2, grbm_params, chains, n_sweeps))

    @jax.jit
    def rebuild_cache(state: TrainState) -> TrainState:
        """Recompute ONLY the derived sampler cache (sampler_h,
        sampler_coupling) from the state's grbm_params — deterministic, so a
        checkpoint that stripped the cache (io/native_ckpt.py saves
        non-derivable state only) restores bit-exactly.  Unlike
        ``rebuild_sampler`` this does NOT re-burn the chains: the restored
        chains were equilibrated against these very parameters.  In
        graph-sharded mode the jit honors build_sampler_model's sharding
        constraint, so the coupling is reconstructed row-sharded and never
        materialized whole."""
        hp, coupling_p = build_sampler_model(state.grbm_params)
        return state.replace(sampler_h=hp, sampler_coupling=coupling_p)

    @jax.jit
    def rebuild_sampler(state: TrainState) -> TrainState:
        """Recompute the cached (sampler_h, sampler_coupling) from the
        state's grbm_params — required after externally swapping params
        (checkpoint load, tune mode) — and re-burn the persistent chains
        under the new model (they were equilibrated against the old one)."""
        hp, coupling_p = build_sampler_model(state.grbm_params)
        rng, k_burn = jax.random.split(state.rng)
        chains, chain_e, _ = run_sweeps(
            k_burn, hp, coupling_p, state.chains, cfg.GIBBS_BURN_IN,
            betas=state.pt_betas,
        )
        return state.replace(
            sampler_h=hp, sampler_coupling=coupling_p, chains=chains,
            chain_energies=chain_e, rng=rng,
        )

    if graph_sharded:
        # eager init would materialize the full dense coupling (plus the
        # scatter-add temporaries) on one device before the sharding
        # constraint applies — at beyond-HBM scale that is exactly the
        # allocation this mode exists to avoid. Under jit, GSPMD honors the
        # with_sharding_constraint during construction.
        init_fn = jax.jit(init_fn)

    return TrainStepFns(
        cfg, graph, dvae, init_fn, step_fn, epoch_fn, sample_fn, step_body,
        rebuild_sampler, rebuild_cache=rebuild_cache,
        dvae_lr=dvae_lr, grbm_lr=grbm_lr,
        sampler_impl=sampler_impl, graph_sharded=graph_sharded,
    )
