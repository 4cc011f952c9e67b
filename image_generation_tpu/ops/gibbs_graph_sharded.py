"""Graph-partitioned colored block-Gibbs: the coupling matrix sharded over
the mesh.

The third scale axis from SURVEY.md §5 ("shard Gibbs chains across chips,
partition the coupling graph by color classes, exchange parallel-tempering
replicas via collective permutes"): chains and the PT ladder shard with zero
communication (ops/gibbs_pallas.py, parallel/mesh.py); this module shards the
GRAPH dimension, for GRBMs whose dense permuted coupling matrix
(n_pad × n_pad f32 — 145 MB at the 5640-spin Advantage fabric, 8.6 GB at
65k spins) outgrows a single chip's HBM.  The reference has no analog at any
scale: its graph lives on the annealer (src/utils/common.py:123-128) and its
host model is a COO edge list (losses.py:61).

Layout (inside ``shard_map`` over a (chain_axis × graph_axis) mesh):

  * spins    (C, n_pad)      → rows over ``chain_axis``, cols over ``graph_axis``
  * coupling (n_pad, n_pad)  → rows over ``graph_axis`` (each device holds the
                               full column span of its row block: A[rows_d, :])
  * fields   h (n_pad,)      → replicated (tiny)

A class-span update (gibbs.class_spans — one whole color class per step,
possibly several width-capped blocks wide) with the contraction dim split
over P_g devices:

    partial_d = S[:, rows_d] @ A[rows_d, c0:c1]      # (C_loc, width) each
    fields    = psum(partial_d, graph_axis) + h[c0:c1]
    new       = bernoulli(σ(−2β·fields))             # IDENTICAL on every
                                                     # graph-axis device
    S[:, cols_d ∩ [c0,c1)] = new[...]                # local masked write

The uniform draw is keyed per (sweep, span, GLOBAL chain id) — never the
graph-shard index — so all graph-axis devices compute the same span update
from the same psum'd fields and each writes its own slice (a margin-padded
dynamic_update_slice + static window read: no gathers/scatters in the sweep
loop) — the sweep is a valid systematic-scan Gibbs sweep with per-sweep ICI
traffic of one (C_loc, n_pad) f32 psum split into n_classes collectives
(7 per sweep at the scaled Pegasus config, NOT one per 128-wide block —
collective count is the multi-chip latency term).  Spins are carried in
the matmul dtype across the whole scan (±1 is exact in bf16/int8), so the
per-span full-state re-read — the dominant HBM term — is 2-4× lighter than
an f32 carry.  FLOPs split evenly across ``graph_axis`` for every span
because the contraction (not the output) dimension is sharded.

Energies ride a reduce_scatter: partial = S_loc @ A_loc is device d's
contribution to EVERY column block of S@A; reduce-scattering it over
``graph_axis`` leaves each device the exact (C_loc, L) slice of S@A it needs
for the local Σ s·(As) term, and one final psum yields full energies.

Composes with parallel tempering (training/step.py): the (T, C, n_pad)
ladder shards T over ``data`` (replica exchange = cross-device ppermute)
while the flattened (T·C, n_pad) rows pass through this sweep with the
graph over ``chain`` — a 2-D (ladder × graph) sampler layout.

Composes with the int8-quantized sampler (ops/quant.py): a ``QuantCoupling``
shards its int8 rows the same way (scale replicated); partial fields
accumulate AND psum in int32 — exact for ±1 × int8 — with one f32
scale-out after the collective, so the composition samples the quantized
model bit-identically regardless of the graph-axis split, and beyond-HBM
coupling shards shrink another 2× vs bf16.

Why XLA matmuls here rather than the Pallas kernels (ops/gibbs_pallas*.py):
the kernels' advantage is keeping SPINS resident in VMEM across the whole
multi-sweep loop, which the per-color psum boundary would break anyway (a
collective cannot run inside a Mosaic kernel, so spins would round-trip
through HBM at every color regardless); the per-color (C_loc, L)·(L, width)
matmul itself is MXU-bound and XLA already emits it fused with the cast /
sigmoid / compare chain.  Chain-sharded (non-graph-sharded) meshes keep the
Pallas kernels via their own shard_map wrapper.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from image_generation_tpu.ops.gibbs import GibbsPlan, class_spans
from image_generation_tpu.ops.quant import QuantCoupling

__all__ = [
    "gibbs_sweeps_graph_sharded",
    "ising_energies_graph_sharded",
    "supports_graph_sharding",
]


def supports_graph_sharding(plan: GibbsPlan, mesh: Mesh, graph_axis: str) -> bool:
    """The padded graph dimension must tile the graph mesh axis.  n_pad is a
    multiple of 128 (build_plan), so any power-of-two axis size up to 128
    divides it; callers fall back to the replicated-graph samplers when this
    is False."""
    return (
        graph_axis in mesh.axis_names
        and plan.n_pad % mesh.shape[graph_axis] == 0
    )


def _check_packed_layout(coupling_p, plan, mesh, graph_axis):
    """A packed block-sparse coupling bakes in its shard count (and plan):
    reject a layout built for a different mesh factorization up front —
    shard_map would otherwise mis-slice the panel rows silently."""
    from image_generation_tpu.ops.block_sparse_sharded import (
        ShardedBlockSparseCoupling,
    )

    if not isinstance(coupling_p, ShardedBlockSparseCoupling):
        return
    if coupling_p.n_shards != mesh.shape[graph_axis]:
        raise ValueError(
            f"packed coupling was built for {coupling_p.n_shards} graph "
            f"shards but mesh axis {graph_axis!r} has "
            f"{mesh.shape[graph_axis]} — rebuild the sampler cache "
            f"(fns.rebuild_sampler) for this mesh"
        )
    if plan is not None and coupling_p.plan is not plan:
        raise ValueError("plan/packed-coupling mismatch")


def _coupling_spec(coupling_p, graph_axis):
    """shard_map in_spec for the coupling argument: row-sharded matrix, the
    (q=row-sharded, scale=replicated) pytree of a QuantCoupling, or the
    (panels/offs row-sharded, scale replicated) pytree of the packed
    block-sparse form (ops/block_sparse_sharded.py)."""
    from image_generation_tpu.ops.block_sparse_sharded import (
        ShardedBlockSparseCoupling,
    )

    if isinstance(coupling_p, ShardedBlockSparseCoupling):
        return ShardedBlockSparseCoupling(
            panels=P(graph_axis, None),
            offs=P(graph_axis, None),
            scale=P() if coupling_p.quantized else None,
            plan=coupling_p.plan,
            chunk=coupling_p.chunk,
            kmax=coupling_p.kmax,
            n_shards=coupling_p.n_shards,
        )
    if isinstance(coupling_p, QuantCoupling):
        return QuantCoupling(q=P(graph_axis, None), scale=P())
    return P(graph_axis, None)


def _coupling_parts(a_loc, matmul_dtype):
    """Normalize a per-shard coupling (dense array / QuantCoupling /
    ShardedBlockSparseCoupling) into the pieces the per-color partial-fields
    computation needs: (packed, quant, a_mm_or_bsc_parts, q_scale).  Shared
    by the XLA sweep body here and the Pallas-update body
    (ops/gibbs_graph_sharded_pallas.py)."""
    from image_generation_tpu.ops.block_sparse_sharded import (
        ShardedBlockSparseCoupling,
    )

    packed = isinstance(a_loc, ShardedBlockSparseCoupling)
    quant = isinstance(a_loc, QuantCoupling) or (packed and a_loc.quantized)
    if packed:
        parts = (
            a_loc.panels, a_loc.offs, a_loc.slot_base, a_loc.kmax, a_loc.chunk,
        )
        return packed, quant, parts, a_loc.scale
    if quant:
        return packed, quant, a_loc.q, a_loc.scale
    a_mm = a_loc.astype(matmul_dtype) if matmul_dtype else a_loc
    return packed, quant, a_mm, None


def _partial_fields(
    parts, s_own, c, start, stop, *, packed, quant, matmul_dtype
):
    """This shard's contribution to color ``c``'s fields from its own
    columns ``s_own`` (rows, l_loc): the (rows, width) partial the caller
    psums over the graph axis (int32 when quantized — exact for ±1 × int8 —
    with the scale-out after the collective).  Returns None when NO shard
    couples into this color (static; every shard agrees)."""
    from image_generation_tpu.ops.block_sparse_sharded import (
        color_partial_fields,
    )

    if packed:
        return color_partial_fields(
            parts, s_own, c, start, stop, quantized=quant,
            matmul_dtype=matmul_dtype,
        )
    if quant:
        s_mm = s_own.astype(jnp.int8)
    else:
        s_mm = s_own.astype(matmul_dtype) if matmul_dtype else s_own
    return jax.lax.dot_general(
        s_mm,
        jax.lax.slice_in_dim(parts, start, stop, axis=1),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32 if quant else jnp.float32,
    )


def _span_partial_fields(
    a_parts, s, span, blocks, *, packed, quant, matmul_dtype
):
    """This shard's partial fields for a whole class span (gibbs.class_spans):
    dense/int8 couplings contract the span's column range in ONE dot;
    packed couplings concatenate the member blocks' chunk matmuls (no
    updates intervene — the span is one independent set).  None when no
    shard couples into any member block."""
    start, stop, b0, b1 = span
    if not packed:
        return _partial_fields(
            a_parts, s, b0, start, stop, packed=False, quant=quant,
            matmul_dtype=matmul_dtype,
        )
    parts = []
    any_occupied = False
    for c in range(b0, b1):
        c0, _v, c1 = blocks[c]
        f = _partial_fields(
            a_parts, s, c, c0, c1, packed=True, quant=quant,
            matmul_dtype=matmul_dtype,
        )
        if f is None:
            f = jnp.zeros(
                (s.shape[0], c1 - c0), jnp.int32 if quant else jnp.float32
            )
        else:
            any_occupied = True
        parts.append(f)
    if not any_occupied:
        return None
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def _xla_update(k, fields, beta_col, row_ids, u_span=None):
    """The default Bernoulli block update: per-(global chain, span) threefry
    uniforms — identical on every graph-axis device and invariant to the
    mesh factorization.  ``update_fn`` replacements (the Pallas hardware-PRNG
    kernel, ops/gibbs_graph_sharded_pallas.py) MUST keep the graph-axis
    agreement (each graph shard writes its own column slice of the same
    update — disagreement corrupts the chain) and chain-shard independence;
    factorization invariance is a bonus of THIS stream, not a requirement
    (the kernel's tile seeding varies with the per-shard chain count, a
    different but equally valid stream per mesh shape)."""
    p_plus = jax.nn.sigmoid(-2.0 * beta_col * fields)
    if u_span is None:
        row_keys = jax.vmap(lambda r: jax.random.fold_in(k, r))(row_ids)
        u_span = jax.vmap(
            lambda kk: jax.random.uniform(
                kk, (fields.shape[-1],), dtype=fields.dtype
            )
        )(row_keys)
    return jnp.where(u_span < p_plus, 1.0, -1.0)


def _sweep_body(
    key, hp, a_loc, s_loc, beta, uniforms_loc, blocks, spans, row_axis,
    graph_axis, n_sweeps, matmul_dtype, track_delta_e=False, update_fn=None,
):
    """Per-shard sweep loop. s_loc: (C_loc, L); a_loc: (L, n_pad).
    ``row_axis`` is None when chain rows are replicated (non-tiling count).

    ``track_delta_e``: also return the (C_loc,) energy change of the run.
    The block update's exact ΔE is fields·(s_new − s_old) (no intra-color
    couplings); each shard owns a column slice of every block, so it
    accumulates its partial Σ_{owned∩block} fields·Δs locally through the
    whole scan and ONE final psum over ``graph_axis`` delivers the total —
    PT rounds carry ladder energies instead of recomputing them through the
    reduce_scatter path (pt_round).

    ``update_fn``: the Bernoulli block update (default ``_xla_update``; the
    Pallas hardware-PRNG kernel plugs in here).  ``uniforms_loc``: explicit
    (n_sweeps, C_loc, n_pad) uniforms for the update (tests), else None."""
    c_loc, l_loc = s_loc.shape
    g_idx = jax.lax.axis_index(graph_axis)
    # this shard's global column ids — the write mask for every color block
    g_cols = g_idx * l_loc + jnp.arange(l_loc)
    # uniforms are keyed per (sweep, color, GLOBAL chain id): identical on
    # every graph-axis device (they must all compute the same block update)
    # and invariant to the mesh factorization (tested bit-exact across
    # graph-axis sizes)
    row0 = jax.lax.axis_index(row_axis) * c_loc if row_axis else 0
    row_ids = row0 + jnp.arange(c_loc)

    beta = jnp.asarray(beta, dtype=jnp.float32)
    beta_col = beta if beta.ndim == 0 else beta[:, None]
    # int8-quantized coupling shard (ops/quant.py): partial fields
    # accumulate in int32 — EXACT for ±1 × int8 — so the psum over the
    # graph axis is exact too and the scale-out happens once, after the
    # collective; the result samples the quantized model identically to
    # the single-device int8 path (``matmul_dtype`` is ignored).
    # block-sparse packed rows (ops/block_sparse_sharded.py): this shard's
    # occupied chunk panels + their local offsets; the per-color matmul
    # reads only those (panels are already in resident dtype).
    packed, quant, a_parts, q_scale = _coupling_parts(a_loc, matmul_dtype)
    # spins are CARRIED in the matmul dtype (int8 in quant mode): ±1 stays
    # exact, every per-span state re-read and margin-buffer write shrinks
    # 2-4×, and the matmul casts become no-ops.  The span loop (one psum
    # per CLASS, not per 128-wide block — gibbs.class_spans) is what cuts
    # the collective count: 47 → 7 per sweep at the scaled Pegasus config.
    in_dtype = s_loc.dtype
    carry_dtype = jnp.int8 if quant else (
        jnp.dtype(matmul_dtype) if matmul_dtype else in_dtype
    )
    update = update_fn or _xla_update

    def sweep(carry, xs):
        k_sweep, u_sweep = xs if uniforms_loc is not None else (xs, None)
        s, de = carry
        for ci, span in enumerate(spans):
            start, stop, _b0, _b1 = span
            width = stop - start
            k = jax.random.fold_in(k_sweep, ci)
            partial_f = _span_partial_fields(
                a_parts, s, span, blocks, packed=packed, quant=quant,
                matmul_dtype=matmul_dtype,
            )
            if partial_f is None:
                # no shard has couplings into this color (static property of
                # the plan — every shard agrees): fields are just h
                fields = jnp.broadcast_to(
                    jax.lax.slice_in_dim(hp, start, stop), (c_loc, width)
                )
            else:
                fields = jax.lax.psum(partial_f, graph_axis)
                if quant:
                    fields = fields.astype(jnp.float32) * q_scale
                fields = fields + jax.lax.slice_in_dim(hp, start, stop)
            u_span = (
                None if u_sweep is None
                else jax.lax.slice_in_dim(u_sweep, start, stop, axis=1)
            )
            new = update(k, fields, beta_col, row_ids, u_span).astype(s.dtype)
            # write the slice of [start, stop) this shard owns — slice-only
            # (no gathers in the sweep loop, per the GibbsPlan invariant):
            # place the block update into a margin-padded buffer at its
            # offset relative to this shard's column window, then read the
            # window back and keep it where the column is really in-block.
            # rel ∈ (−width, l_loc) whenever the block overlaps the window,
            # so the clip never distorts an overlapping write; disjoint
            # blocks are fully masked out by ``in_block``.
            in_block = (g_cols >= start) & (g_cols < stop)
            rel = start - g_idx * l_loc
            off = (jnp.int32(0), jnp.clip(rel + width, 0, l_loc + width))
            buf = jnp.zeros((c_loc, l_loc + 2 * width), s.dtype)
            buf = jax.lax.dynamic_update_slice(buf, new, off)
            cand = jax.lax.slice(buf, (0, width), (c_loc, width + l_loc))
            if track_delta_e:
                # window-align the block's fields the same way, then this
                # shard's ΔE partial over the columns it owns in the block
                buf_f = jnp.zeros((c_loc, l_loc + 2 * width), jnp.float32)
                buf_f = jax.lax.dynamic_update_slice(buf_f, fields, off)
                f_win = jax.lax.slice(buf_f, (0, width), (c_loc, width + l_loc))
                de = de + jnp.sum(
                    jnp.where(
                        in_block[None, :],
                        f_win * (cand - s).astype(jnp.float32),
                        0.0,
                    ),
                    axis=-1,
                )
            s = jnp.where(in_block[None, :], cand, s)
        return (s, de), None

    de0 = jnp.zeros((c_loc,), jnp.float32)
    xs = jax.random.split(key, n_sweeps)
    if uniforms_loc is not None:
        xs = (xs, uniforms_loc)
    (s_loc, de), _ = jax.lax.scan(
        sweep, (s_loc.astype(carry_dtype), de0), xs
    )
    s_loc = s_loc.astype(in_dtype)
    if track_delta_e:
        return s_loc, jax.lax.psum(de, graph_axis)
    return s_loc


def gibbs_sweeps_graph_sharded(
    key: jax.Array,
    hp: jax.Array,
    coupling_p: jax.Array,
    plan: GibbsPlan,
    spins_p: jax.Array,
    n_sweeps: int,
    mesh: Mesh,
    beta: jax.Array | float = 1.0,
    chain_axis: str = "data",
    graph_axis: str = "chain",
    matmul_dtype=None,
    track_delta_e: bool = False,
    pallas_update: bool | str = False,
    pallas_interpret: bool = False,
    uniforms: jax.Array | None = None,
):
    """``gibbs_sweeps`` with the graph dimension partitioned over the mesh.

    Args match ops/gibbs.gibbs_sweeps plus the mesh and its two axis roles:
    chains (rows) shard over ``chain_axis``, the padded spin/coupling
    dimension over ``graph_axis``.  ``beta`` may be scalar or per-chain
    (C,).  Returns (C, n_pad) spins with P(chain_axis, graph_axis) layout.

    RNG note: uniforms are keyed per (sweep, class span, global chain id),
    so results are invariant to the mesh factorization — bit-exact across
    graph-axis sizes when couplings are order-exact in f32 (tested) — but
    the stream differs from the replicated-graph ``gibbs_sweeps``; both are
    valid Gibbs chains of the same model (statistically validated against
    exact Boltzmann enumeration).

    ``pallas_update``: run the Bernoulli block update as the Pallas
    hardware-PRNG kernel (ops/gibbs_graph_sharded_pallas.py) instead of the
    XLA threefry draw — same matmul/psum structure, a different (hardware)
    uniform stream; the string ``"row_seed"`` selects the per-global-row-
    group reseeded variant whose stream is invariant to the mesh
    factorization (config PLRNG_ROW_SEED).  ``uniforms``: explicit (n_sweeps, C, n_pad) uniforms
    for the update (replicated over the graph axis) — with
    ``xla_stream_uniforms`` this makes the kernel path bit-exact against
    the XLA path (tests); ``pallas_interpret`` runs the kernel in the plain
    interpreter (CPU meshes).
    """
    if not supports_graph_sharding(plan, mesh, graph_axis):
        raise ValueError(
            f"n_pad={plan.n_pad} does not tile mesh axis "
            f"{graph_axis!r}={mesh.shape.get(graph_axis)}"
        )
    _check_packed_layout(coupling_p, plan, mesh, graph_axis)
    # chain rows that don't tile ``chain_axis`` are replicated across it —
    # graph partitioning (the point of this sampler) is preserved at the
    # cost of redundant row compute; the per-global-chain RNG keying makes
    # the result identical either way.
    row_axis = chain_axis if spins_p.shape[0] % mesh.shape[chain_axis] == 0 else None
    beta_arr = jnp.asarray(beta)
    beta_spec = P() if beta_arr.ndim == 0 else P(row_axis)
    coupling_spec = _coupling_spec(coupling_p, graph_axis)
    out_specs = P(row_axis, graph_axis)
    if track_delta_e:
        # delta energies are psum'd over the graph axis inside the body →
        # replicated across it; rows follow the chains' row sharding
        out_specs = (out_specs, P(row_axis))
    update_fn = None
    if pallas_update:
        from image_generation_tpu.ops.gibbs_graph_sharded_pallas import (
            make_pallas_update,
        )

        update_fn = make_pallas_update(
            interpret=pallas_interpret,
            row_seed=(pallas_update == "row_seed"),
        )
    body = partial(
        _sweep_body,
        blocks=plan.blocks,
        spans=class_spans(plan),
        row_axis=row_axis,
        graph_axis=graph_axis,
        n_sweeps=n_sweeps,
        matmul_dtype=matmul_dtype,
        track_delta_e=track_delta_e,
        update_fn=update_fn,
    )
    in_specs = [
        P(),                       # key (replicated; folded per shard)
        P(),                       # hp (replicated — n_pad f32 is tiny)
        coupling_spec,             # coupling rows (q rows + scale if int8)
        P(row_axis, graph_axis),   # spins
        beta_spec,
    ]
    args = [key, hp, coupling_p, spins_p, beta_arr]
    if uniforms is None:
        body_fn = lambda key_, hp_, a_, s_, b_: body(key_, hp_, a_, s_, b_, None)
    else:
        # explicit update uniforms: every graph-axis shard must see the FULL
        # span width (they all compute the whole block update), so the last
        # dim stays replicated over the graph axis
        body_fn = body
        in_specs.append(P(None, row_axis, None))
        args.append(uniforms)
    fn = shard_map(
        body_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=out_specs,
        check_vma=False,
    )
    return fn(*args)


def _energy_body(hp, a_loc, s_loc, graph_axis, matmul_dtype):
    from image_generation_tpu.ops.block_sparse_sharded import (
        ShardedBlockSparseCoupling,
        color_partial_fields,
    )

    l_loc = s_loc.shape[-1]
    g_idx = jax.lax.axis_index(graph_axis)
    hp_loc = jax.lax.dynamic_slice_in_dim(hp, g_idx * l_loc, l_loc)
    if isinstance(a_loc, ShardedBlockSparseCoupling):
        # packed rows: build this shard's S@A contribution color block by
        # color block (blocks tile [0, n_pad) contiguously), then the same
        # reduce_scatter as the dense path.  int8 panels accumulate AND
        # reduce in int32 (exact), one scale-out after the collective.
        quant = a_loc.quantized
        lead = s_loc.shape[:-1]
        flat = s_loc.reshape(-1, l_loc)
        bsc_parts = (
            a_loc.panels, a_loc.offs, a_loc.slot_base, a_loc.kmax, a_loc.chunk,
        )
        parts = []
        for c, (c0, _v, c1) in enumerate(a_loc.plan.blocks):
            out = color_partial_fields(
                bsc_parts, flat, c, c0, c1, quantized=quant,
                matmul_dtype=None if quant else matmul_dtype,
            )
            if out is None:
                out = jnp.zeros(
                    (flat.shape[0], c1 - c0),
                    jnp.int32 if quant else jnp.float32,
                )
            parts.append(out)
        partial_sa = jnp.concatenate(parts, axis=-1)  # (N, n_pad)
        sa_loc = jax.lax.psum_scatter(
            partial_sa, graph_axis, scatter_dimension=1, tiled=True
        )
        if quant:
            sa_loc = sa_loc.astype(jnp.float32) * a_loc.scale
        e_part = flat @ hp_loc + 0.5 * jnp.sum(
            flat.astype(jnp.float32) * sa_loc, axis=-1
        )
        return jax.lax.psum(e_part, graph_axis).reshape(lead)
    if isinstance(a_loc, QuantCoupling):
        # quantized-model energies, exactly: int32 partials are exact for
        # ±1 × int8, the reduce_scatter stays in int32, scale-out after
        partial_sa = jax.lax.dot_general(
            s_loc.astype(jnp.int8),
            a_loc.q,
            dimension_numbers=(((s_loc.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        sa_loc = jax.lax.psum_scatter(
            partial_sa, graph_axis, scatter_dimension=s_loc.ndim - 1, tiled=True
        ).astype(jnp.float32) * a_loc.scale
        e_part = s_loc @ hp_loc + 0.5 * jnp.sum(s_loc * sa_loc, axis=-1)
        return jax.lax.psum(e_part, graph_axis)
    if matmul_dtype is not None:
        partial_sa = jax.lax.dot_general(
            s_loc.astype(matmul_dtype),
            a_loc.astype(matmul_dtype),
            dimension_numbers=(((s_loc.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        partial_sa = s_loc @ a_loc  # (..., n_pad): d's term of S@A
    # reduce_scatter over the graph axis: keep exactly this shard's columns
    sa_loc = jax.lax.psum_scatter(
        partial_sa, graph_axis, scatter_dimension=s_loc.ndim - 1, tiled=True
    )
    e_part = s_loc @ hp_loc + 0.5 * jnp.sum(s_loc * sa_loc, axis=-1)
    return jax.lax.psum(e_part, graph_axis)


def ising_energies_graph_sharded(
    hp: jax.Array,
    coupling_p: jax.Array,
    spins_p: jax.Array,
    mesh: Mesh,
    chain_axis: str = "data",
    graph_axis: str = "chain",
    matmul_dtype=None,
) -> jax.Array:
    """E(s) = h·s + ½ sᵀAs with the same sharded layout as the sweeps:
    spins (..., n_pad) with the leading dim over ``chain_axis`` (when it
    tiles) and the last over ``graph_axis``, coupling P(graph_axis, None).
    Accepts any number of leading dims — (C, n_pad) chains or the PT
    (T, C, n_pad) ladder — and returns their energies replicated over the
    graph axis.  One reduce_scatter + one psum per call; the coupling is
    never gathered."""
    if spins_p.shape[-1] % mesh.shape[graph_axis] != 0:
        raise ValueError(
            f"n_pad={spins_p.shape[-1]} does not tile mesh axis "
            f"{graph_axis!r}={mesh.shape[graph_axis]}"
        )
    _check_packed_layout(coupling_p, None, mesh, graph_axis)
    row_axis = chain_axis if spins_p.shape[0] % mesh.shape[chain_axis] == 0 else None
    lead = (None,) * (spins_p.ndim - 2)
    fn = shard_map(
        partial(
            _energy_body,
            graph_axis=graph_axis,
            matmul_dtype=matmul_dtype,
        ),
        mesh=mesh,
        in_specs=(
            P(),
            _coupling_spec(coupling_p, graph_axis),
            P(row_axis, *lead, graph_axis),
        ),
        out_specs=P(row_axis, *lead),
        check_vma=False,
    )
    return fn(hp, coupling_p, spins_p)
