"""Pallas TPU kernel: HBM-streamed colored block-Gibbs for large graphs.

The VMEM-resident kernel (ops/gibbs_pallas.py) needs the whole permuted
coupling matrix on-chip — fine up to ~1.5-3k spins.  Full-fabric GRBMs
(Pegasus P16: 5640 spins → a 139 MB f32 / 70 MB bf16 matrix) do not fit, so
this kernel keeps the coupling in HBM and streams one color-block of columns
at a time into a double-buffered VMEM scratch:

  * grid over chain blocks (independent chains — embarrassingly parallel);
  * the chain block's spins are DMA'd HBM→VMEM ONCE, held in a single
    ``block_dtype`` buffer (±1 is exact in bf16) for the whole multi-sweep
    run, and DMA'd back at the end — spins enter VMEM through a manual copy
    instead of the BlockSpec pipeline so only ONE buffer is resident
    (in/out pipeline buffers would double it), which lets the chain block
    grow to 512 rows inside the VMEM budget;
  * per color c: the (n_pad × width_c) column block A[:, c0:c1] is DMA'd
    HBM→VMEM while the previous color computes (two scratch slots, two DMA
    semaphores);
  * fields/update math identical to the VMEM kernel (MXU matmul + on-core
    PRNG Bernoulli), f32 accumulation.

Why the big chain block matters: each grid instance re-streams the full
coupling matrix every sweep, so HBM traffic per sweep is
(n_chains / block) × n_pad² × itemsize.  At the scaled config (2048
effective PT chains, 5696-pad Pegasus) block 512 cuts the streaming 4×
versus block 128 — past the point where the XLA sampler's per-color spin
re-reads win (the r1 crossover at 256 chains no longer applies).

Slot scheduling: the body unrolls TWO sweeps (2·C color steps, an even
count), so the alternating slot pattern lines up across `fori_loop`
iterations for any number of colors; odd sweep counts are rounded up (an
extra sweep only brings the chain closer to stationarity).

Statistical correctness is tested in interpret mode with fed uniforms
(tests/test_gibbs_pallas_hbm.py) and on the real chip against the XLA
sampler's moments.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from image_generation_tpu.ops.gibbs import GibbsPlan

__all__ = ["gibbs_sweeps_pallas_hbm", "hbm_chain_block"]

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under ~16 MB/core


def _uniform_hw(chains, width):
    bits = pltpu.bitcast(pltpu.prng_random_bits((chains, width)), jnp.uint32)
    top24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return top24.astype(jnp.float32) * (1.0 / (1 << 24))


def hbm_chain_block(
    plan: GibbsPlan, n_chains: int, block_dtype=jnp.bfloat16, cap: int = 512,
    scratch_rows: int | None = None,
) -> int:
    """Largest divisor of ``n_chains`` ≤ cap whose VMEM footprint
    (spin buffer + double-buffered coupling scratch + fields) fits the
    budget.

    ``scratch_rows``: rows per coupling-scratch slot — ``n_pad`` for the
    dense stream (default), the largest packed panel for the block-sparse
    stream (ops/block_sparse.py)."""
    itemsize = jnp.dtype(block_dtype).itemsize
    max_w = max(c1 - c0 for c0, _, c1 in plan.blocks)
    scratch = 2 * (scratch_rows or plan.n_pad) * max_w * itemsize
    b = min(n_chains, cap)
    while b > 1:
        if n_chains % b == 0:
            spins = b * plan.n_pad * itemsize
            fields = b * max_w * 4
            if scratch + spins + 2 * fields < _VMEM_BUDGET:
                return b
        b -= 1
    return 1


def _kernel(plan: GibbsPlan, n_half: int, block: int, use_hw_rng: bool,
            track_de: bool, *refs):
    de_ref = None
    if use_hw_rng:
        if track_de:
            (seed_ref, h_ref, beta_ref, coupling_hbm, spins_hbm, out_hbm,
             de_ref, spins_vmem, scratch, sems, spin_sem) = refs
        else:
            (seed_ref, h_ref, beta_ref, coupling_hbm, spins_hbm, out_hbm,
             spins_vmem, scratch, sems, spin_sem) = refs
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        uniforms_ref = None
    else:
        if track_de:
            (h_ref, beta_ref, coupling_hbm, uniforms_ref, spins_hbm, out_hbm,
             de_ref, spins_vmem, scratch, sems, spin_sem) = refs
        else:
            (h_ref, beta_ref, coupling_hbm, uniforms_ref, spins_hbm, out_hbm,
             spins_vmem, scratch, sems, spin_sem) = refs
    if de_ref is not None:
        de_ref[:] = jnp.zeros_like(de_ref)
    i = pl.program_id(0)
    rows = pl.ds(i * block, block)
    blocks = plan.blocks
    n_colors = len(blocks)
    seq = [(step, c) for step in range(2) for c in range(n_colors)]

    def dma(slot, color):
        c0, _, c1 = blocks[color]
        return pltpu.make_async_copy(
            coupling_hbm.at[:, pl.ds(c0, c1 - c0)],
            scratch.at[slot, :, pl.ds(0, c1 - c0)],
            sems.at[slot],
        )

    # overlap the spin-block load with the first coupling block's DMA
    load = pltpu.make_async_copy(spins_hbm.at[rows, :], spins_vmem.at[:], spin_sem)
    load.start()
    dma(0, 0).start()
    load.wait()

    quant = spins_vmem.dtype == jnp.int8  # int8 MXU path (ops/quant.py):
    # the caller works in quantized units (h/scale, β·scale), so the body
    # is scale-free; the wrapper rescales the returned ΔE

    def half(i_half, carry):
        for k, (step, c) in enumerate(seq):
            slot = k % 2
            c0, _valid, c1 = blocks[c]
            width = c1 - c0
            # prefetch the next color block into the other slot (wraps to
            # color 0 at the end — consumed by the next iteration's k=0)
            nk = (k + 1) % len(seq)
            dma((k + 1) % 2, seq[nk][1]).start()
            dma(slot, c).wait()
            fields = jnp.dot(
                spins_vmem[:], scratch[slot, :, :width],
                preferred_element_type=jnp.int32 if quant else jnp.float32,
            )
            if quant:
                fields = fields.astype(jnp.float32)
            fields = fields + h_ref[0, c0:c1]
            p_plus = jax.nn.sigmoid(-2.0 * beta_ref[:] * fields)
            if uniforms_ref is None:
                u = _uniform_hw(block, width)
            else:
                u = uniforms_ref[2 * i_half + step, :, c0:c1]
            new = jnp.where(u < p_plus, 1.0, -1.0)
            if de_ref is not None:
                # exact ΔE of a color-block update: fields·(s_new − s_old)
                # (no intra-color couplings) — PT ladder energies ride this
                old = spins_vmem[:, c0:c1]
                old = (
                    old.astype(jnp.int32).astype(jnp.float32)  # Mosaic-safe
                    if quant else old.astype(jnp.float32)
                )
                de_ref[:] = de_ref[:] + jnp.sum(
                    fields * (new - old), axis=-1, keepdims=True
                )
            if quant:
                # int8 store: select int32 constants (the mask keeps its
                # f32/i32 tiling — Mosaic cannot relayout an i1 mask to int8
                # tiling), then pack int32→int8
                new_i32 = jnp.where(u < p_plus, jnp.int32(1), jnp.int32(-1))
                spins_vmem[:, c0:c1] = new_i32.astype(spins_vmem.dtype)
            else:
                spins_vmem[:, c0:c1] = new.astype(spins_vmem.dtype)
        return carry

    jax.lax.fori_loop(0, n_half, half, 0)
    # drain the dangling wrap-around prefetch (slot 0: len(seq) is even)
    dma(0, 0).wait()
    store = pltpu.make_async_copy(spins_vmem.at[:], out_hbm.at[rows, :], spin_sem)
    store.start()
    store.wait()


def _kernel_bs(plan: GibbsPlan, chunk: int, rows, offs, starts, n_half: int,
               block: int, use_hw_rng: bool, track_de: bool, *refs):
    """Block-sparse variant of ``_kernel``: the HBM input is the PACKED
    occupied-chunk panels (ops/block_sparse.py pack_coupling) and per color
    only those rows are DMA'd — coupling traffic and sweep FLOPs drop by the
    chunk occupancy (~3-4× on hardware graphs).  Everything else (slot
    scheduling, RNG, ΔE, int8 quantized units) matches ``_kernel``; all
    chunk indices/offsets are compile-time constants from the plan."""
    de_ref = None
    if use_hw_rng:
        if track_de:
            (seed_ref, h_ref, beta_ref, panels_hbm, spins_hbm, out_hbm,
             de_ref, spins_vmem, scratch, sems, spin_sem) = refs
        else:
            (seed_ref, h_ref, beta_ref, panels_hbm, spins_hbm, out_hbm,
             spins_vmem, scratch, sems, spin_sem) = refs
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        uniforms_ref = None
    else:
        if track_de:
            (h_ref, beta_ref, panels_hbm, uniforms_ref, spins_hbm, out_hbm,
             de_ref, spins_vmem, scratch, sems, spin_sem) = refs
        else:
            (h_ref, beta_ref, panels_hbm, uniforms_ref, spins_hbm, out_hbm,
             spins_vmem, scratch, sems, spin_sem) = refs
    if de_ref is not None:
        de_ref[:] = jnp.zeros_like(de_ref)
    i = pl.program_id(0)
    row_sel = pl.ds(i * block, block)
    blocks = plan.blocks
    n_colors = len(blocks)
    seq = [(step, c) for step in range(2) for c in range(n_colors)]

    def dma(slot, color):
        nc = len(rows[color])
        return pltpu.make_async_copy(
            panels_hbm.at[pl.ds(offs[color] * chunk, nc * chunk), :],
            scratch.at[slot, pl.ds(0, nc * chunk), :],
            sems.at[slot],
        )

    load = pltpu.make_async_copy(spins_hbm.at[row_sel, :], spins_vmem.at[:], spin_sem)
    load.start()
    if rows[seq[0][1]]:
        dma(0, seq[0][1]).start()
    load.wait()

    quant = spins_vmem.dtype == jnp.int8  # quantized units (see _kernel)

    def half(i_half, carry):
        for k, (step, c) in enumerate(seq):
            slot = k % 2
            c0, _valid, c1 = blocks[c]
            width = c1 - c0
            rlist = rows[c]
            nk = (k + 1) % len(seq)
            if rows[seq[nk][1]]:
                dma((k + 1) % 2, seq[nk][1]).start()
            if rlist:
                dma(slot, c).wait()
                acc = None
                for j, r in enumerate(rlist):
                    part = jnp.dot(
                        spins_vmem[:, starts[r] : starts[r] + chunk],
                        scratch[slot, j * chunk : (j + 1) * chunk, :width],
                        preferred_element_type=jnp.int32 if quant else jnp.float32,
                    )
                    acc = part if acc is None else acc + part
                fields = acc.astype(jnp.float32) if quant else acc
                fields = fields + h_ref[0, c0:c1]
            else:
                fields = jnp.broadcast_to(h_ref[0, c0:c1], (block, width))
            p_plus = jax.nn.sigmoid(-2.0 * beta_ref[:] * fields)
            if uniforms_ref is None:
                u = _uniform_hw(block, width)
            else:
                u = uniforms_ref[2 * i_half + step, :, c0:c1]
            new = jnp.where(u < p_plus, 1.0, -1.0)
            if de_ref is not None:
                old = spins_vmem[:, c0:c1]
                old = (
                    old.astype(jnp.int32).astype(jnp.float32)  # Mosaic-safe
                    if quant else old.astype(jnp.float32)
                )
                de_ref[:] = de_ref[:] + jnp.sum(
                    fields * (new - old), axis=-1, keepdims=True
                )
            if quant:
                new_i32 = jnp.where(u < p_plus, jnp.int32(1), jnp.int32(-1))
                spins_vmem[:, c0:c1] = new_i32.astype(spins_vmem.dtype)
            else:
                spins_vmem[:, c0:c1] = new.astype(spins_vmem.dtype)
        return carry

    jax.lax.fori_loop(0, n_half, half, 0)
    # drain the dangling wrap-around prefetch (slot 0: len(seq) is even)
    if rows[seq[0][1]]:
        dma(0, seq[0][1]).wait()
    store = pltpu.make_async_copy(spins_vmem.at[:], out_hbm.at[row_sel, :], spin_sem)
    store.start()
    store.wait()


def gibbs_sweeps_pallas_hbm(
    key: jax.Array,
    hp: jax.Array,
    coupling_p: jax.Array,
    plan: GibbsPlan,
    spins_p: jax.Array,
    n_sweeps: int,
    beta: jax.Array | float = 1.0,
    chain_block: int = 512,
    block_dtype=jnp.bfloat16,
    interpret: bool = False,
    uniforms: Optional[jax.Array] = None,
    track_delta_e: bool = False,
):
    """Drop-in sampler for graphs whose coupling matrix exceeds VMEM.

    Same contract as ``gibbs_sweeps``/``gibbs_sweeps_pallas`` (f32 in/out;
    spins are held and streamed in ``block_dtype`` internally — exact for
    ±1).  ``n_sweeps`` is rounded UP to an even count (module docstring).

    ``track_delta_e``: also return the (chains,) exact energy change of the
    run, covering the ACTUAL (rounded-up) sweeps performed — consistent
    with the returned spins.

    A ``QuantCoupling`` (ops/quant.py) streams the coupling AND holds the
    spin block in int8 — halving the kernel's HBM traffic on top of the 2×
    int8 MXU rate.  The kernel works in quantized units (h/scale, β·scale);
    spins come back f32 and ΔE is rescaled here (``block_dtype`` ignored).

    A ``BlockSparseCoupling`` (ops/block_sparse.py) streams only the packed
    OCCUPIED coupling chunks per color — traffic and sweep FLOPs drop by the
    chunk occupancy (~3-4× on hardware graphs); spins live in the panels'
    dtype (``block_dtype`` ignored) and the int8-quantized form composes.
    """
    from image_generation_tpu.ops.block_sparse import (
        BlockSparseCoupling,
        chunk_starts,
        color_chunk_rows,
        panel_offsets,
    )
    from image_generation_tpu.ops.quant import QuantCoupling

    n_chains, n_pad = spins_p.shape
    assert n_pad == plan.n_pad
    bs = coupling_p if isinstance(coupling_p, BlockSparseCoupling) else None
    if bs is not None:
        assert bs.plan is plan, "plan/coupling mismatch"
    quant = isinstance(coupling_p, QuantCoupling) or (
        bs is not None and bs.quantized
    )
    if quant:
        q_scale = coupling_p.scale
        hp_eff, beta_eff, block_dtype = hp / q_scale, jnp.asarray(
            beta, jnp.float32) * q_scale, jnp.int8
    else:
        hp_eff, beta_eff = hp, beta
        if bs is not None:
            block_dtype = bs.panels.dtype  # spins pair the panels' dtype
    scratch_rows = None
    if bs is not None:
        _rows = color_chunk_rows(plan, bs.chunk)
        _offs, _total = panel_offsets(plan, bs.chunk)
        _starts = chunk_starts(plan.n_pad, bs.chunk)
        max_nc = max((len(r) for r in _rows), default=0)
        scratch_rows = max(max_nc, 1) * bs.chunk
    block = hbm_chain_block(
        plan, n_chains, block_dtype, cap=chain_block, scratch_rows=scratch_rows
    )
    grid = n_chains // block
    n_half = -(-n_sweeps // 2)  # two sweeps per loop iteration
    max_w = max(c1 - c0 for c0, _, c1 in plan.blocks)

    beta_arr = jnp.broadcast_to(
        jnp.asarray(beta_eff, jnp.float32).reshape(-1, 1), (n_chains, 1)
    ).astype(jnp.float32)
    h2d = hp_eff.reshape(1, -1).astype(jnp.float32)
    use_hw_rng = uniforms is None
    sdt = jnp.dtype(block_dtype)

    if bs is not None:
        kernel = functools.partial(
            _kernel_bs, plan, bs.chunk, _rows, _offs, _starts, n_half, block,
            use_hw_rng, track_delta_e,
        )
    else:
        kernel = functools.partial(
            _kernel, plan, n_half, block, use_hw_rng, track_delta_e
        )
    spins_out_spec = pl.BlockSpec(memory_space=pl.ANY)  # written by manual DMA
    spins_out_shape = jax.ShapeDtypeStruct((n_chains, n_pad), sdt)
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
        scratch_shapes=[
            pltpu.VMEM((block, n_pad), sdt),  # resident spin block
            # coupling double-buffer: dense column panels, or the packed
            # occupied chunks (block-sparse — rows shrink by the occupancy)
            pltpu.VMEM((2, scratch_rows or n_pad, max_w), sdt),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )
    h_spec = pl.BlockSpec((1, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    beta_spec = pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    coupling_spec = pl.BlockSpec(memory_space=pl.ANY)  # stays in HBM
    spins_spec = pl.BlockSpec(memory_space=pl.ANY)  # loaded by manual DMA
    if bs is not None:
        coupling_cast = bs.panels  # already stored in the resident dtype
    elif quant:
        coupling_cast = coupling_p.q
    else:
        coupling_cast = coupling_p.astype(sdt)
    spins_cast = spins_p.astype(sdt)

    def _unpack(out):
        if track_delta_e:
            de = out[1][:, 0]
            if quant:  # kernel ΔE is in quantized units (docstring above)
                de = de * q_scale
            return out[0].astype(jnp.float32), de
        return out.astype(jnp.float32)

    if uniforms is not None:
        assert uniforms.shape[1:] == (n_chains, n_pad)
        assert uniforms.shape[0] >= 2 * n_half
        out = pl.pallas_call(
            kernel,
            in_specs=[
                h_spec,
                beta_spec,
                coupling_spec,
                pl.BlockSpec(
                    (2 * n_half, block, n_pad), lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                spins_spec,
            ],
            **common,
        )(h2d, beta_arr, coupling_cast, uniforms.astype(jnp.float32), spins_cast)
        return _unpack(out)

    seed = jax.random.randint(key, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            h_spec,
            beta_spec,
            coupling_spec,
            spins_spec,
        ],
        **common,
    )(seed, h2d, beta_arr, coupling_cast, spins_cast)
    return _unpack(out)
