"""Block-sparse packing of the GRAPH-SHARDED coupling: the two beyond-HBM
levers composed.

``GRAPH_SHARDED`` (ops/gibbs_graph_sharded.py) row-shards the dense permuted
coupling over the mesh so GRBMs past one chip's HBM fit at all; block-sparse
packing (ops/block_sparse.py) drops the zero chunks a sparse hardware graph
leaves in the dense matrix (degree ≤ 20 — reference topology, SURVEY.md §2b
P7).  This module composes them: each graph shard packs the occupied chunks
of ITS OWN row block on a shard-local chunk grid, so per-chip coupling
memory and per-color sweep FLOPs both drop by the packed-occupancy factor on
top of the mesh factor (and another 4× with the int8 QuantCoupling, whose
panels pack the same way).

The one wrinkle vs the single-device packing: ``shard_map`` traces ONE
program for every shard, so panel counts must be identical across shards —
each color's panel count pads to the max across shards (zero panels
contribute nothing).  Chunk *offsets* differ per shard, so they ride a
sharded ``(n_shards, total_slots)`` int32 leaf and the sweep's spin-chunk
reads become ``dynamic_slice`` at traced offsets (still slices — the
no-gather GibbsPlan invariant holds).  Measured on the ideal Pegasus P16
latent (6016 padded spins): pad-to-max keeps a 2.7× FLOP/memory win at 4
shards and 1.9× at 8 (chunk=128) over dense row shards — the ideal
(unpadded) ratio is ~4×; the gap is per-shard occupancy imbalance, reported
by ``sharded_chunk_meta().occupancy``.

Bit-exactness contract: identical to the dense graph-sharded sweep for
integer-valued couplings (the per-color field matmul sums the same terms in
a different order), and EXACTLY identical under int8 quantization (int32
accumulation is order-free) — pinned in tests/test_block_sparse_sharded.py.
"""

from __future__ import annotations

import functools
import weakref
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from image_generation_tpu.ops.block_sparse import _max_width
from image_generation_tpu.ops.quant import QuantCoupling

__all__ = [
    "ShardedBlockSparseCoupling",
    "sharded_chunk_meta",
    "pack_coupling_graph_sharded",
    "supports_sharded_block_sparse",
]


@struct.dataclass
class ShardedBlockSparseCoupling:
    """Per-shard packed occupied coupling chunks + static layout metadata.

    A pytree like QuantCoupling/BlockSparseCoupling — it rides the
    ``TrainState.sampler_coupling`` slot (never serialized by
    io/native_ckpt.py; rebuilt from grbm_params).  ``panels`` stacks every
    shard's packed panels, row-sharded over the mesh graph axis; ``offs``
    holds each shard's LOCAL row offset per panel slot (sharded the same
    way).  ``kmax`` is the per-color padded panel count (max over shards) —
    static, so the sweep's per-color slot loop unrolls at trace time.
    """

    panels: jax.Array  # (n_shards · total_slots · chunk, max_width)
    offs: jax.Array  # (n_shards, total_slots) int32 — local chunk offsets
    scale: Optional[jax.Array]  # () f32 when int8-quantized, else None
    plan: object = struct.field(pytree_node=False)
    chunk: int = struct.field(pytree_node=False, default=128)
    kmax: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    n_shards: int = struct.field(pytree_node=False, default=1)

    @property
    def quantized(self) -> bool:
        return self.scale is not None

    @property
    def slot_base(self) -> Tuple[int, ...]:
        base, pos = [], 0
        for k in self.kmax:
            base.append(pos)
            pos += k
        return tuple(base)


class ShardedChunkMeta(NamedTuple):
    kmax: Tuple[int, ...]  # per-color padded panel count (max over shards)
    offs: np.ndarray  # (n_shards, total_slots) int32 local chunk offsets
    zero_head: np.ndarray  # (n_shards, total_slots) int32 rows to zero
    occupancy: float  # padded chunks / dense chunks (per shard)


def _local_starts(l_loc: int, chunk: int) -> Tuple[int, ...]:
    """Shard-local chunk grid over [0, l_loc): block_sparse.chunk_starts on
    the shard's own row range (the final chunk clamps to l_loc − chunk when
    chunk does not divide l_loc; its overlapped leading rows are zeroed at
    pack time)."""
    from image_generation_tpu.ops.block_sparse import chunk_starts

    return chunk_starts(l_loc, chunk)


# weak-keyed like gibbs._class_spans_cache / block_sparse._chunk_rows_cache:
# an lru_cache would pin every plan for process lifetime (warm servers swap
# models; each Trainer.load builds a NEW plan)
_sharded_meta_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def sharded_chunk_meta(plan, n_shards: int, chunk: int) -> ShardedChunkMeta:
    """Static packing layout for ``plan`` row-sharded ``n_shards`` ways.

    Pure plan-derived numpy (weak-cached per plan, keyed by
    (n_shards, chunk) within it — plans hash by identity).  Requires
    chunk ≤ n_pad/n_shards and n_shards | n_pad (callers gate on
    ``supports_sharded_block_sparse``).
    """
    per_plan = _sharded_meta_cache.setdefault(plan, {})
    hit = per_plan.get((n_shards, chunk))
    if hit is not None:
        return hit
    l_loc = plan.n_pad // n_shards
    starts = _local_starts(l_loc, chunk)
    n_local = len(starts)
    last_owned = starts[-1] if n_local == 1 else starts[-2] + chunk
    overlap = 0
    if n_local > 1:
        overlap = (starts[-2] + chunk) - starts[-1]

    block_of = np.zeros(plan.n_pad, np.int32)
    for bi, (s, _v, e) in enumerate(plan.blocks):
        block_of[s:e] = bi
    n_colors = len(plan.blocks)

    pi = np.asarray(plan.perm_edge_i)
    pj = np.asarray(plan.perm_edge_j)
    occ = np.zeros((n_colors, n_shards, n_local), bool)
    for rows, cols in ((pi, pj), (pj, pi)):
        sh = rows // l_loc
        loc = rows % l_loc
        own = np.minimum(loc // chunk, n_local - 1)
        own = np.where(loc >= last_owned, n_local - 1, own)
        occ[block_of[cols], sh, own] = True

    per_cs = occ.sum(axis=2)  # (colors, shards) occupied chunk counts
    kmax = tuple(int(k) for k in per_cs.max(axis=1))
    total = sum(kmax)
    offs = np.zeros((n_shards, total), np.int32)
    zero_head = np.full((n_shards, total), chunk, np.int32)  # unused → all-zero
    base = 0
    for c in range(n_colors):
        for d in range(n_shards):
            for k, r in enumerate(np.nonzero(occ[c, d])[0]):
                offs[d, base + k] = starts[r]
                zero_head[d, base + k] = (
                    overlap if (r == n_local - 1 and overlap) else 0
                )
        base += kmax[c]
    occupancy = total / max(n_colors * n_local, 1)
    meta = ShardedChunkMeta(kmax, offs, zero_head, occupancy)
    per_plan[(n_shards, chunk)] = meta
    return meta


def supports_sharded_block_sparse(plan, n_shards: int, chunk: int) -> bool:
    """The shard-local grid needs whole chunks inside each row shard."""
    return plan.n_pad % n_shards == 0 and plan.n_pad // n_shards >= chunk


def _pack_body(a_loc, offs_loc, zhead_loc, *, blocks, kmax, chunk, max_w):
    """Per-shard packing: a_loc (l_loc, n_pad) dense rows → packed panels.
    offs/zhead arrive (1, total_slots) — this shard's slot table."""
    parts = []
    slot = 0
    row_ids = jnp.arange(chunk)[:, None]
    for (c0, _v, c1), k_c in zip(blocks, kmax):
        w = c1 - c0
        for _ in range(k_c):
            p = jax.lax.dynamic_slice(
                a_loc, (offs_loc[0, slot], jnp.int32(c0)), (chunk, w)
            )
            # zero clamped-chunk overlap rows / whole unused slots
            p = jnp.where(
                row_ids >= zhead_loc[0, slot], p, jnp.zeros((), p.dtype)
            )
            if w < max_w:
                p = jnp.pad(p, ((0, 0), (0, max_w - w)))
            parts.append(p)
            slot += 1
    if parts:
        return jnp.concatenate(parts, axis=0)
    return jnp.zeros((0, max_w), a_loc.dtype)


def pack_coupling_graph_sharded(
    plan,
    coupling_p,
    mesh: Mesh,
    graph_axis: str = "chain",
    chunk: int = 128,
) -> ShardedBlockSparseCoupling:
    """Pack a row-sharded dense permuted coupling (or QuantCoupling) into
    per-shard occupied chunk panels.  Traced (runs under jit at sampler-cache
    rebuild); the dense rows exist only transiently during packing and the
    full matrix is never materialized on any device (the pack runs inside
    ``shard_map`` on each shard's own rows)."""
    n_shards = mesh.shape[graph_axis]
    if not supports_sharded_block_sparse(plan, n_shards, chunk):
        raise ValueError(
            f"chunk={chunk} does not fit the {n_shards}-way row shard of "
            f"n_pad={plan.n_pad}"
        )
    quant = isinstance(coupling_p, QuantCoupling)
    mat = coupling_p.q if quant else coupling_p
    meta = sharded_chunk_meta(plan, n_shards, chunk)
    row_sharded = NamedSharding(mesh, P(graph_axis, None))
    offs = jax.lax.with_sharding_constraint(
        jnp.asarray(meta.offs), row_sharded
    )
    zhead = jax.lax.with_sharding_constraint(
        jnp.asarray(meta.zero_head), row_sharded
    )
    fn = shard_map(
        functools.partial(
            _pack_body,
            blocks=plan.blocks,
            kmax=meta.kmax,
            chunk=chunk,
            max_w=_max_width(plan),
        ),
        mesh=mesh,
        in_specs=(P(graph_axis, None),) * 3,
        out_specs=P(graph_axis, None),
        check_vma=False,
    )
    panels = fn(mat, offs, zhead)
    return ShardedBlockSparseCoupling(
        panels=panels,
        offs=offs,
        scale=coupling_p.scale if quant else None,
        plan=plan,
        chunk=chunk,
        kmax=meta.kmax,
        n_shards=n_shards,
    )


def color_partial_fields(
    bsc_parts, s, c: int, c0: int, c1: int, *, quantized: bool,
    matmul_dtype=None,
):
    """This shard's partial fields for color block ``c``:
    Σ_{owned occupied chunks} s[:, chunk rows] @ panel — one concat + one
    matmul.  ``bsc_parts`` = (panels_loc, offs_loc, slot_base, kmax, chunk);
    ``s`` may have any number of leading dims flattened to rows by the
    caller.  Returns None when NO shard has couplings into ``c`` (the
    caller skips the psum — every shard agrees, the count is static).
    int8 panels take int8 spins and accumulate in int32 (exact; caller
    scales out after the collective); otherwise spins cast to the panels'
    resident dtype (or ``matmul_dtype`` when given, mirroring the dense
    path's cast semantics)."""
    panels_loc, offs_loc, slot_base, kmax, chunk = bsc_parts
    k_c = kmax[c]
    if k_c == 0:
        return None
    base = slot_base[c]
    w = c1 - c0
    rows = s.shape[0]
    lhs_parts = [
        jax.lax.dynamic_slice(
            s, (jnp.int32(0), offs_loc[0, base + k]), (rows, chunk)
        )
        for k in range(k_c)
    ]
    lhs = lhs_parts[0] if k_c == 1 else jnp.concatenate(lhs_parts, axis=1)
    pan = jax.lax.slice(
        panels_loc, (base * chunk, 0), ((base + k_c) * chunk, w)
    )
    if quantized:
        lhs = lhs.astype(jnp.int8)
    elif matmul_dtype is not None:
        lhs = lhs.astype(matmul_dtype)
        pan = pan.astype(matmul_dtype)
    else:
        lhs = lhs.astype(pan.dtype)
    return jax.lax.dot_general(
        lhs,
        pan,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32 if quantized else jnp.float32,
    )
