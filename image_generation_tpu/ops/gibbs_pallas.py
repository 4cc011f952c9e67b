"""Pallas TPU kernel: fused multi-sweep colored block-Gibbs.

The pure-JAX sampler (ops/gibbs.py) lowers each color update to separate XLA
ops with HBM round-trips between them.  This kernel fuses an entire
``n_sweeps``-sweep run into ONE Pallas program that keeps everything
resident in VMEM:

  * spins (chains × n_pad), the permuted coupling matrix (n_pad × n_pad),
    fields and per-chain β all live in VMEM for the whole kernel;
  * per color block: fields = spins @ A[:, c0:c1] on the MXU (static slice),
    Bernoulli draws from the on-core PRNG (pltpu.prng_random_bits), and a
    static sub-slice store — no gathers, no scatters, no HBM traffic inside
    the sweep loop;
  * spins ride separate in/out VMEM buffers (~2 · block · n_pad · 4B); the
    multi-sweep fusion still means ONE HBM round-trip per refresh, not one
    per color step.

VMEM budget: coupling (n_pad² · itemsize — 4B f32, 2B bf16, 1B int8) +
spins (2 · block · n_pad · 4B in/out; int8 under quantization) + a fields
block.  With the ~16 MB/core VMEM this covers n_pad ≤ ~1536 at 256 chains
in f32 (≥ 2048 in bf16/int8, which ``supported_by_pallas`` accounts via
``coupling_itemsize``) — the reference's full operating range (256-512
latents).  Larger graphs use the chain-blocked grid (each program instance
takes a slice of chains; coupling is re-streamed per instance) or fall
back to the XLA path.

Correctness is validated against exact enumeration (interpret mode on CPU,
tests/test_gibbs_pallas.py) and against the XLA sampler on TPU.

Uniform variates from raw bits: u = (bits >> 8) · 2⁻²⁴ ∈ [0, 1) with 24-bit
resolution — the standard float32 trick.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from image_generation_tpu.ops.gibbs import GibbsPlan

__all__ = ["gibbs_sweeps_pallas", "supported_by_pallas"]

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under ~16 MB/core


def _pick_block(n_chains: int, chain_block: int) -> int:
    """Largest divisor of n_chains that is ≤ chain_block (grid blocks must
    tile the chain count exactly)."""
    b = min(n_chains, chain_block)
    while n_chains % b != 0:
        b -= 1
    return b


def supported_by_pallas(
    plan: GibbsPlan,
    n_chains: int,
    chain_block: int = 256,
    coupling_itemsize: int = 4,
) -> bool:
    """Whether the single-program VMEM layout fits this problem.

    ``n_chains`` must be the EFFECTIVE per-call chain count (PT mode flattens
    the ladder to PT_NUM_BETAS·NUM_READS rows) and the block estimate mirrors
    the kernel's actual divisor-based block choice.  ``coupling_itemsize``
    must match the resident coupling dtype (the kernel stores it in the
    matmul dtype: 4 f32, 2 bf16, 1 int8) — budgeting bf16/int8 problems at
    4B would bounce VMEM-sized problems to the slower HBM-streaming kernel.
    Spins are budgeted at f32 (their int8-under-quantization case only
    over-counts — safe direction).
    """
    if plan.n_pad % 128 != 0:
        return False
    block = _pick_block(n_chains, chain_block)
    coupling_bytes = plan.n_pad * plan.n_pad * coupling_itemsize
    spins_bytes = 2 * block * plan.n_pad * 4  # in + out buffers
    fields_bytes = block * max(c1 - c0 for c0, _, c1 in plan.blocks) * 4
    return coupling_bytes + spins_bytes + 3 * fields_bytes < _VMEM_BUDGET


def _color_update(plan, spins_ref, coupling_ref, h_ref, beta_ref, uniform_for,
                  de_ref=None):
    """One full sweep over the color blocks; ``uniform_for(c0, c1)`` supplies
    the (chains, width) uniforms for a block.

    The coupling buffer may be bf16 (±1 spins are exact in bf16; couplings
    lose nothing statistically): spins are cast to its dtype per block and
    the MXU accumulates in f32.  An int8 coupling buffer selects the int8
    MXU path (2× the bf16 rate): spins are stored int8 too, the dot
    accumulates exactly in int32, and the CALLER works in quantized units —
    h_ref carries h/scale and beta_ref carries β·scale, so this body needs
    no scale at all (ops/quant.py; wrapper rescales the returned ΔE).

    ``de_ref``: optional (chains, 1) f32 accumulator for the exact energy
    change — ΔE of a block update is fields·(s_new − s_old) because a color
    class has no intra-class couplings, so energy tracking is one VPU pass
    per color (pt_round carries PT ladder energies with this instead of
    recomputing full-ladder energy matmuls).
    """
    quant = coupling_ref.dtype == jnp.int8
    for c0, _valid, c1 in plan.blocks:
        lhs = spins_ref[:]
        if lhs.dtype != coupling_ref.dtype:
            lhs = lhs.astype(coupling_ref.dtype)
        fields = jnp.dot(
            lhs,
            coupling_ref[:, c0:c1],
            preferred_element_type=jnp.int32 if quant else jnp.float32,
        )
        if quant:
            fields = fields.astype(jnp.float32)
        fields = fields + h_ref[0, c0:c1]
        p_plus = jax.nn.sigmoid(-2.0 * beta_ref[:] * fields)
        u = uniform_for(c0, c1)
        new = jnp.where(u < p_plus, 1.0, -1.0)
        if de_ref is not None:
            old = spins_ref[:, c0:c1]
            # int8 → f32 via int32 (Mosaic-safe cast chain)
            old = (
                old.astype(jnp.int32).astype(jnp.float32)
                if old.dtype != jnp.float32 else old
            )
            de_ref[:] = de_ref[:] + jnp.sum(
                fields * (new - old), axis=-1, keepdims=True
            )
        if spins_ref.dtype == jnp.float32:
            spins_ref[:, c0:c1] = new
        else:
            # int8 store: select int32 constants (the mask keeps its f32/i32
            # tiling — Mosaic cannot relayout an i1 mask to int8 tiling),
            # then pack int32→int8
            new_i32 = jnp.where(u < p_plus, jnp.int32(1), jnp.int32(-1))
            spins_ref[:, c0:c1] = new_i32.astype(spins_ref.dtype)


def _kernel(plan: GibbsPlan, n_sweeps: int, track_de: bool, seed_ref, h_ref,
            beta_ref, coupling_ref, spins_in_ref, spins_out_ref, *maybe_de):
    # decorrelate grid instances: each chain block gets its own stream
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    spins_out_ref[:] = spins_in_ref[:]
    chains = spins_out_ref.shape[0]
    de_ref = maybe_de[0] if track_de else None
    if de_ref is not None:
        de_ref[:] = jnp.zeros_like(de_ref)

    def uniform_for(c0, c1):
        bits = pltpu.bitcast(pltpu.prng_random_bits((chains, c1 - c0)), jnp.uint32)
        # logical shift keeps 24 bits → reinterpret as (positive) int32,
        # which Mosaic can cast to f32 (uint32→f32 is unsupported)
        top24 = pltpu.bitcast(bits >> 8, jnp.int32)
        return top24.astype(jnp.float32) * (1.0 / (1 << 24))

    def sweep(_, carry):
        _color_update(plan, spins_out_ref, coupling_ref, h_ref, beta_ref,
                      uniform_for, de_ref)
        return carry

    jax.lax.fori_loop(0, n_sweeps, sweep, 0)


def _kernel_fed(plan: GibbsPlan, n_sweeps: int, track_de: bool, h_ref, beta_ref,
                coupling_ref, uniforms_ref, spins_in_ref, spins_out_ref,
                *maybe_de):
    """Test variant: uniforms supplied as an input (n_sweeps, chains, n_pad).

    Exists because the TPU *interpreter* stubs ``prng_random_bits`` to zeros
    (verified on jax 0.9), so interpret-mode statistical tests must inject
    host-generated uniforms.  The compiled on-chip path uses ``_kernel``.
    """
    spins_out_ref[:] = spins_in_ref[:]
    de_ref = maybe_de[0] if track_de else None
    if de_ref is not None:
        de_ref[:] = jnp.zeros_like(de_ref)

    def sweep(i, carry):
        def uniform_for(c0, c1):
            return uniforms_ref[i, :, c0:c1]

        _color_update(plan, spins_out_ref, coupling_ref, h_ref, beta_ref,
                      uniform_for, de_ref)
        return carry

    jax.lax.fori_loop(0, n_sweeps, sweep, 0)


def gibbs_sweeps_pallas(
    key: jax.Array,
    hp: jax.Array,
    coupling_p: jax.Array,
    plan: GibbsPlan,
    spins_p: jax.Array,
    n_sweeps: int,
    beta: jax.Array | float = 1.0,
    chain_block: int = 256,
    interpret: bool = False,
    uniforms: Optional[jax.Array] = None,
    matmul_dtype=None,
    track_delta_e: bool = False,
):
    """Drop-in replacement for ``ops.gibbs.gibbs_sweeps`` (same contract).

    Chains are split into ``chain_block``-row grid instances (independent
    chains → embarrassingly parallel over the grid); each instance runs the
    full sweep loop in VMEM.

    ``uniforms``: optional (n_sweeps, chains, n_pad) pre-generated uniforms
    — the test/interpret path (the TPU interpreter stubs the on-core PRNG).
    When None, the on-core hardware PRNG is used.

    ``matmul_dtype``: dtype of the coupling buffer/matmuls (e.g. bf16 —
    halves VMEM and HBM traffic; f32 accumulation either way).

    ``track_delta_e``: also return the (chains,) exact energy change of the
    run (in-kernel fields·Δs accumulation — no extra matmul; see
    ops.gibbs.gibbs_sweeps).

    A ``QuantCoupling`` (ops/quant.py) runs the int8 MXU path: spins and
    coupling live in int8 VMEM buffers and the kernel works in quantized
    units (h/scale, β·scale) so its body never sees the scale; the returned
    ΔE is rescaled here and spins come back f32 (``matmul_dtype`` ignored).
    """
    from image_generation_tpu.ops.quant import QuantCoupling

    n_chains, n_pad = spins_p.shape
    assert n_pad == plan.n_pad
    block = _pick_block(n_chains, chain_block)
    grid = n_chains // block

    quant = isinstance(coupling_p, QuantCoupling)
    if quant:
        q_scale = coupling_p.scale
        coupling_in, hp_eff = coupling_p.q, hp / q_scale
        beta_eff = jnp.asarray(beta, jnp.float32) * q_scale
        spins_dtype = jnp.int8
    else:
        coupling_in = coupling_p.astype(matmul_dtype or jnp.float32)
        hp_eff, beta_eff, spins_dtype = hp, beta, jnp.float32
    beta_arr = jnp.broadcast_to(
        jnp.asarray(beta_eff, jnp.float32).reshape(-1, 1), (n_chains, 1)
    ).astype(jnp.float32)
    h2d = hp_eff.reshape(1, -1).astype(jnp.float32)

    flops_per_sweep = 2 * block * n_pad * n_pad
    if interpret is True and uniforms is None:
        # plain HLO interpretation has no rule for the TPU PRNG primitives;
        # the TPU interpreter (TPU semantics, race detection) does.  The
        # fed-uniforms kernel has no TPU-only primitives and keeps the plain
        # interpreter (which also composes with shard_map, where the TPU
        # interpreter deadlocks).
        interpret = pltpu.InterpretParams()
    spins_out_spec = pl.BlockSpec(
        (block, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    spins_out_shape = jax.ShapeDtypeStruct((n_chains, n_pad), spins_dtype)
    if track_delta_e:
        out_specs = (
            spins_out_spec,
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )
        out_shape = (
            spins_out_shape,
            jax.ShapeDtypeStruct((n_chains, 1), jnp.float32),
        )
    else:
        out_specs, out_shape = spins_out_spec, spins_out_shape
    common = dict(
        grid=(grid,),
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=grid * n_sweeps * flops_per_sweep,
            bytes_accessed=grid * (
                n_pad * n_pad * coupling_in.dtype.itemsize
                + 2 * block * n_pad * jnp.dtype(spins_dtype).itemsize
            ),
            transcendentals=grid * n_sweeps * block * n_pad,
        ),
        interpret=interpret,
    )
    h_spec = pl.BlockSpec((1, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    beta_spec = pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    coupling_spec = pl.BlockSpec((n_pad, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spins_spec = pl.BlockSpec((block, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def _unpack(out):
        if track_delta_e:
            spins, de = out[0], out[1][:, 0]
            if quant:
                # kernel ΔE is in quantized units (module docstring)
                return spins.astype(jnp.float32), de * q_scale
            return spins, de
        return out.astype(jnp.float32) if quant else out

    if uniforms is not None:
        assert uniforms.shape == (n_sweeps, n_chains, n_pad)
        kernel = functools.partial(_kernel_fed, plan, n_sweeps, track_delta_e)
        return _unpack(pl.pallas_call(
            kernel,
            in_specs=[
                h_spec,
                beta_spec,
                coupling_spec,
                pl.BlockSpec(
                    (n_sweeps, block, n_pad), lambda i: (0, i, 0), memory_space=pltpu.VMEM
                ),
                spins_spec,
            ],
            **common,
        )(h2d, beta_arr, coupling_in,
          uniforms.astype(jnp.float32), spins_p.astype(spins_dtype)))

    seed = jax.random.randint(key, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    kernel = functools.partial(_kernel, plan, n_sweeps, track_delta_e)
    return _unpack(pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            h_spec,
            beta_spec,
            coupling_spec,
            spins_spec,
        ],
        **common,
    )(seed, h2d, beta_arr, coupling_in, spins_p.astype(spins_dtype)))


def gibbs_sweeps_pallas_sharded(
    key: jax.Array,
    hp: jax.Array,
    coupling_p: jax.Array,
    plan: GibbsPlan,
    spins_p: jax.Array,
    n_sweeps: int,
    mesh,
    beta: jax.Array | float = 1.0,
    chain_axes=("data", "chain"),
    kernel_fn=None,
    **kwargs,
) -> jax.Array:
    """Multi-chip wrapper: chains row-sharded over ``chain_axes``, the model
    (hp, coupling) replicated, each shard running the fused kernel locally.

    Chains are independent, so the sharded sweep needs ZERO inter-chip
    communication — this is the chain-parallel axis of SURVEY.md §2c.  Each
    shard folds its mesh position into the key so streams decorrelate.

    ``kernel_fn``: the per-shard kernel (default ``gibbs_sweeps_pallas``;
    pass ``gibbs_sweeps_pallas_hbm`` for graphs beyond VMEM — same call
    contract).
    """
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    axes = tuple(a for a in chain_axes if a in mesh.axis_names)
    beta_arr = jnp.broadcast_to(
        jnp.asarray(beta, jnp.float32).reshape(-1), (spins_p.shape[0],)
    )
    uniforms = kwargs.pop("uniforms", None)
    track_delta_e = kwargs.pop("track_delta_e", False)
    if kernel_fn is None:
        kernel_fn = gibbs_sweeps_pallas
    # (spins, delta_e) when tracking energies — both row-sharded like chains
    out_specs = (P(axes), P(axes)) if track_delta_e else P(axes)

    def local(key, hp, coupling_p, spins_local, beta_local, uniforms_local):
        idx = jnp.zeros((), jnp.int32)
        for a in axes:
            idx = idx * jax.lax.axis_size(a) + jax.lax.axis_index(a)
        k = jax.random.fold_in(key, idx)
        return kernel_fn(
            k, hp, coupling_p, plan, spins_local, n_sweeps, beta_local,
            uniforms=uniforms_local, track_delta_e=track_delta_e, **kwargs
        )

    if uniforms is None:
        # hardware-PRNG path: dummy sharded placeholder (ignored)
        def local_hw(key, hp, coupling_p, spins_local, beta_local):
            return local(key, hp, coupling_p, spins_local, beta_local, None)

        return shard_map(
            local_hw,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(axes), P(axes)),
            out_specs=out_specs,
            check_vma=False,
        )(key, hp, coupling_p, spins_p, beta_arr)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axes), P(axes), P(None, axes)),
        out_specs=out_specs,
        check_vma=False,
    )(key, hp, coupling_p, spins_p, beta_arr, uniforms)
