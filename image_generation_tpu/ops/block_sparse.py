"""Block-sparse packing of the permuted coupling matrix.

The colored-sweep layout (ops/gibbs.py) computes per-color fields as one
dense (chains, n_pad) @ (n_pad, width) matmul.  Hardware graphs are sparse
(Pegasus/Zephyr degree ≤ 20 — reference topology, SURVEY.md §2b P7), so at
the 5640-spin scaled config that matmul does ~400× the graph's FLOPs.  Dense
is still right for SMALL graphs (the MXU eats the whole matrix from VMEM),
but once the coupling streams from HBM every sweep, zero tiles are pure
wasted bandwidth.

This module exploits the structure the plan itself creates: ``build_plan``
orders color-class members by BFS rank, so each color block's neighbors
concentrate in FEW aligned row chunks — measured on the ideal Pegasus P16
latent, only 26% of 128-row chunks (32% of 256-row chunks) of the permuted
matrix are nonzero.  The occupied chunks of each color's column panel are
packed into one contiguous array:

    panels[offset_c·chunk : (offset_c+n_c)·chunk, :width_c]
        = A[occupied rows of color c, c0:c1]        (zero rows dropped)

All indices are static (the plan is a compile-time constant), so sweeps stay
gather/scatter-free: the XLA path slices+concats spin chunks and runs ONE
matmul per color; the Pallas HBM kernel DMAs only the occupied panel rows
(ops/gibbs_pallas_hbm.py).  FLOPs and coupling HBM traffic both drop by the
occupancy factor (~3-4× at the scaled config).

Composes with int8 quantization (ops/quant.py): the panels hold the
QuantCoupling's int8 rows and carry its scale; accumulation stays int32
(exact), so block-sparse int8 sweeps sample the SAME quantized model as the
dense int8 path, bit-for-bit.

Composes with graph-sharded mode via the per-shard packed layout in
ops/block_sparse_sharded.py (each row shard packs its own occupied chunks
on a shard-local grid — this module's global packing assumes the whole
matrix on one device).
"""

from __future__ import annotations

import weakref
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from image_generation_tpu.ops.quant import QuantCoupling

__all__ = [
    "BlockSparseCoupling",
    "chunk_starts",
    "color_chunk_rows",
    "chunk_occupancy",
    "panel_offsets",
    "pack_coupling",
    "ising_energies_block_sparse",
    "gibbs_sweeps_block_sparse",
]


@struct.dataclass
class BlockSparseCoupling:
    """Packed occupied coupling chunks + static plan metadata.

    A pytree (panels/scale are leaves; plan/chunk are static aux data), so it
    rides the ``TrainState.sampler_coupling`` slot exactly like QuantCoupling
    — replication, donation, and checkpoint stripping are leaf-wise, and
    ``io/native_ckpt.py`` never serializes it (rebuilt from grbm_params).
    """

    panels: jax.Array  # (total_chunks·chunk, max_width) packed rows
    scale: Optional[jax.Array]  # () f32 when int8-quantized, else None
    plan: object = struct.field(pytree_node=False)  # GibbsPlan (hash by id)
    chunk: int = struct.field(pytree_node=False, default=256)

    @property
    def quantized(self) -> bool:
        return self.scale is not None


def chunk_starts(n_pad: int, chunk: int) -> Tuple[int, ...]:
    """Aligned chunk start offsets covering [0, n_pad).

    All chunks are ``chunk`` rows tall; when ``chunk`` does not divide
    ``n_pad`` the FINAL chunk is clamped to start at ``n_pad - chunk`` (it
    overlaps the previous one; ``pack_coupling`` zeroes the overlapped rows
    in the final panel so nothing double-counts).  n_pad is always a
    multiple of 128 (build_plan pad_to), so chunk=128 never clamps.
    """
    if n_pad <= chunk:
        return (0,)
    n_full = n_pad // chunk
    starts = [k * chunk for k in range(n_full)]
    if n_full * chunk < n_pad:
        starts.append(n_pad - chunk)
    return tuple(starts)


# weak-keyed like gibbs._class_spans_cache: an lru_cache would pin every
# plan (and its numpy edge lists) for process lifetime — unbounded growth in
# a warm server that swaps models (each Trainer.load builds a NEW plan)
_chunk_rows_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def color_chunk_rows(plan, chunk: int) -> Tuple[Tuple[int, ...], ...]:
    """For each color block c: the sorted chunk indices whose rows couple
    into c's columns (i.e. the nonzero row-chunks of A[:, c0:c1]).

    Static data derived from the plan's permuted edge list — weak-cached
    per plan (keyed by chunk within it); plans hash by identity.
    """
    per_plan = _chunk_rows_cache.setdefault(plan, {})
    hit = per_plan.get(chunk)
    if hit is not None:
        return hit
    starts = chunk_starts(plan.n_pad, chunk)
    n_chunks = len(starts)
    last_owned = starts[-1] if n_chunks == 1 else starts[-2] + chunk
    # row → owning chunk: plain r // chunk, except rows past the last full
    # chunk belong to the clamped final chunk
    def owner(rows):
        o = rows // chunk
        return np.where(rows >= last_owned, n_chunks - 1, o)

    block_of = np.zeros(plan.n_pad, np.int32)
    for bi, (s, _v, e) in enumerate(plan.blocks):
        block_of[s:e] = bi
    occ = np.zeros((len(plan.blocks), n_chunks), bool)
    pi = np.asarray(plan.perm_edge_i)
    pj = np.asarray(plan.perm_edge_j)
    occ[block_of[pj], owner(pi)] = True
    occ[block_of[pi], owner(pj)] = True
    result = tuple(
        tuple(np.nonzero(occ[c])[0].tolist()) for c in range(len(plan.blocks))
    )
    per_plan[chunk] = result
    return result


def chunk_occupancy(plan, chunk: int = 256) -> float:
    """Fraction of (color, chunk) coupling tiles that are nonzero — the
    block-sparse sweep's FLOP/traffic ratio versus dense (lower = better)."""
    rows = color_chunk_rows(plan, chunk)
    denom = len(plan.blocks) * len(chunk_starts(plan.n_pad, chunk))
    return sum(map(len, rows)) / max(denom, 1)


def panel_offsets(plan, chunk: int) -> Tuple[Tuple[int, ...], int]:
    """(per-color first-chunk offset into the packed panels, total chunks)."""
    rows = color_chunk_rows(plan, chunk)
    offs = []
    pos = 0
    for r in rows:
        offs.append(pos)
        pos += len(r)
    return tuple(offs), pos


def _max_width(plan) -> int:
    return max(e - s for s, _v, e in plan.blocks)


def pack_coupling(plan, coupling_p, chunk: int = 256) -> BlockSparseCoupling:
    """Pack a dense permuted coupling (or a QuantCoupling) into occupied
    chunk panels.  Traced (runs under jit at sampler-cache rebuild); all
    slice indices are compile-time constants.
    """
    quant = isinstance(coupling_p, QuantCoupling)
    mat = coupling_p.q if quant else coupling_p
    starts = chunk_starts(plan.n_pad, chunk)
    rows = color_chunk_rows(plan, chunk)
    max_w = _max_width(plan)
    # rows the clamped final chunk does NOT own (covered by the previous one)
    overlap = 0
    if len(starts) > 1:
        overlap = (starts[-2] + chunk) - starts[-1]

    parts = []
    for (c0, _v, c1), rlist in zip(plan.blocks, rows):
        w = c1 - c0
        for r in rlist:
            p = jax.lax.slice(mat, (starts[r], c0), (starts[r] + chunk, c1))
            if r == len(starts) - 1 and overlap > 0:
                # zero the overlapped leading rows so nothing double-counts
                mask = (jnp.arange(chunk) >= overlap)[:, None]
                p = jnp.where(mask, p, jnp.zeros((), p.dtype))
            if w < max_w:
                p = jnp.pad(p, ((0, 0), (0, max_w - w)))
            parts.append(p)
    if parts:
        panels = jnp.concatenate(parts, axis=0)
    else:
        panels = jnp.zeros((0, max_w), mat.dtype)
    return BlockSparseCoupling(
        panels=panels,
        scale=coupling_p.scale if quant else None,
        plan=plan,
        chunk=chunk,
    )


def _gather_chunks(spins, starts, rlist, chunk):
    """(chains, len(rlist)·chunk) static slice+concat of spin chunks."""
    if len(rlist) == 1:
        r = rlist[0]
        return jax.lax.slice_in_dim(spins, starts[r], starts[r] + chunk, axis=1)
    return jnp.concatenate(
        [
            jax.lax.slice_in_dim(spins, starts[r], starts[r] + chunk, axis=1)
            for r in rlist
        ],
        axis=1,
    )


def _color_fields(bsc: BlockSparseCoupling, spins, c: int, offs):
    """fields[:, c0:c1] = spins @ A[:, c0:c1] via the packed panels.

    int8 panels accumulate exactly in int32 and scale out once in f32 —
    identical math to the dense QuantCoupling path (ops/quant.py).
    Returns None for an unoccupied color (field contribution is zero).
    """
    plan, chunk = bsc.plan, bsc.chunk
    starts = chunk_starts(plan.n_pad, chunk)
    rows = color_chunk_rows(plan, chunk)[c]
    c0, _v, c1 = plan.blocks[c]
    w = c1 - c0
    if not rows:
        return None
    pan = jax.lax.slice(
        bsc.panels,
        (offs[c] * chunk, 0),
        ((offs[c] + len(rows)) * chunk, w),
    )
    lhs = _gather_chunks(spins, starts, rows, chunk)
    if bsc.quantized:
        f = jax.lax.dot_general(
            lhs.astype(jnp.int8),
            pan,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return f.astype(jnp.float32) * bsc.scale
    return jax.lax.dot_general(
        lhs.astype(pan.dtype),
        pan,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def ising_energies_block_sparse(
    hp: jax.Array, bsc: BlockSparseCoupling, spins_p: jax.Array
) -> jax.Array:
    """E(s) = h·s + ½ sᵀ A s from packed panels (same contract as
    ops.gibbs.ising_energies; padding contributes 0)."""
    plan = bsc.plan
    offs, _ = panel_offsets(plan, bsc.chunk)
    lead = spins_p.shape[:-1]
    flat = spins_p.reshape(-1, plan.n_pad)
    acc = jnp.zeros((flat.shape[0],), jnp.float32)
    for c, (c0, _v, c1) in enumerate(plan.blocks):
        f = _color_fields(bsc, flat, c, offs)
        if f is None:
            continue
        s_c = jax.lax.slice_in_dim(flat, c0, c1, axis=1)
        acc = acc + jnp.sum(s_c.astype(jnp.float32) * f, axis=-1)
    e = flat.astype(jnp.float32) @ hp + 0.5 * acc
    return e.reshape(lead)


def gibbs_sweeps_block_sparse(
    key: jax.Array,
    hp: jax.Array,
    bsc: BlockSparseCoupling,
    plan,
    spins_p: jax.Array,
    n_sweeps: int,
    beta: jax.Array | float = 1.0,
    matmul_dtype=None,
    track_delta_e: bool = False,
):
    """XLA block-sparse colored sweeps — same contract as
    ops.gibbs.gibbs_sweeps, reading only occupied coupling chunks.

    ``matmul_dtype`` is consistency-CHECKED, not applied: the panels were
    stored in their resident dtype at pack time (build_sampler_model casts
    to the resolved matmul dtype BEFORE pack_coupling) and the spin side is
    carried in that same dtype below, so a per-call cast here would only
    add traffic — but a caller packing f32 panels and asking for bf16 math
    must fail loudly rather than silently get f32.  int8 panels run the
    exact int32-accumulation path regardless (``matmul_dtype`` ignored,
    like the dense QuantCoupling path).
    """
    from image_generation_tpu.ops.gibbs import class_spans

    assert plan is bsc.plan, "plan/coupling mismatch"
    if (
        matmul_dtype is not None
        and not bsc.quantized
        and bsc.panels.dtype != jnp.dtype(matmul_dtype)
    ):
        raise ValueError(
            f"block-sparse panels are resident {bsc.panels.dtype} but "
            f"matmul_dtype={jnp.dtype(matmul_dtype)} was requested — pack "
            "the coupling in the target dtype (build_sampler_model does)"
        )
    beta = jnp.asarray(beta, dtype=jnp.float32)
    beta_col = beta if beta.ndim == 0 else beta[:, None]
    chains = spins_p.shape[0]
    offs, _ = panel_offsets(plan, bsc.chunk)
    spans = class_spans(plan)
    # spins are CARRIED in the panels' resident dtype (int8 when quantized):
    # ±1 is exact, the per-span state re-read halves/quarters, and the
    # per-block matmul casts become no-ops (see ops/gibbs.gibbs_sweeps).
    in_dtype = spins_p.dtype
    carry_dtype = jnp.int8 if bsc.quantized else bsc.panels.dtype

    def sweep(carry, k_sweep):
        s, de = carry
        for ci, (start, stop, b0, b1) in enumerate(spans):
            width = stop - start
            k = jax.random.fold_in(k_sweep, ci)
            # per-block packed fields, concatenated over the span (blocks
            # tile it contiguously); no updates intervene — one class, one
            # independent set
            parts = []
            for c in range(b0, b1):
                c0, _v, c1 = plan.blocks[c]
                f = _color_fields(bsc, s, c, offs)
                base = jax.lax.slice_in_dim(hp, c0, c1)
                parts.append(
                    base + f if f is not None
                    else jnp.broadcast_to(base, (chains, c1 - c0))
                )
            fields = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
            p_plus = jax.nn.sigmoid(-2.0 * beta_col * fields)
            u = jax.random.uniform(k, (chains, width), dtype=jnp.float32)
            new = jnp.where(u < p_plus, 1.0, -1.0).astype(s.dtype)
            if track_delta_e:
                old = jax.lax.slice_in_dim(s, start, stop, axis=1)
                de = de + jnp.sum(
                    fields * (new - old).astype(jnp.float32), axis=-1
                )
            s = jax.lax.dynamic_update_slice_in_dim(s, new, start, axis=1)
        return (s, de), None

    de0 = jnp.zeros((chains,), jnp.float32)
    (spins_p, de), _ = jax.lax.scan(
        sweep, (spins_p.astype(carry_dtype), de0), jax.random.split(key, n_sweeps)
    )
    spins_p = spins_p.astype(in_dtype)
    return (spins_p, de) if track_delta_e else spins_p
