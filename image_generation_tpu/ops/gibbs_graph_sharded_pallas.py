"""Pallas Bernoulli-update kernel for the graph-sharded Gibbs sweep.

Closes the "Pallas kernels never reach the graph-sharded regime" gap: the
beyond-HBM sweep (ops/gibbs_graph_sharded.py) must psum partial fields over
the mesh's graph axis after EVERY class span, so the streaming kernels'
defining win — spins resident in VMEM across the whole multi-sweep run
(ops/gibbs_pallas_hbm.py) — is structurally unavailable there (a collective
cannot run inside a Mosaic kernel, and splitting the kernel at each psum
boundary forfeits residency anyway).  What IS portable into that regime is
the other measured kernel win: the Bernoulli update.  The XLA body draws its
uniforms with a per-(global chain, span) threefry stream — ~C·n_pad counter
hashes per sweep on the VPU — while the kernels use the TPU's hardware PRNG
(pltpu.prng_random_bits) at near-store rate.  This module packages that
update — sigmoid, draw, compare — as a tiny per-span Pallas kernel the
graph-sharded sweep body calls between its XLA matmul/psum steps:

    partial = s_own @ A_own[:, span]          # XLA dot (MXU)
    fields  = psum(partial) + h[span]         # XLA collective
    new     = pallas_update(fields, beta)     # THIS KERNEL (VPU + hw PRNG)
    s[span ∩ owned] = new[...]                # XLA masked slice write

The kernel is seeded per (sweep, span) from the sweep key plus the GLOBAL
chain-tile index (grid over row tiles), so every graph-axis shard draws the
SAME update for the span (they must: each writes its own column slice of
it) while chain-axis shards draw independent streams.  Unlike the XLA
body's per-global-row threefry, the tile size (and so the stream) depends
on the per-shard chain count: re-running on a different mesh factorization
samples a DIFFERENT — equally valid — chain of the same model; the
mandatory invariant (graph-axis agreement) holds on every mesh because
graph-axis peers share identical (row_ids, c_loc, key).  When cross-layout
reproducibility matters, the opt-in ``PLRNG_ROW_SEED="on"`` selects the
row-seeded kernel variant (`_update_hw_rowseed_kernel`): reseeded per 8-row
group from GLOBAL row ids, its stream is identical on every mesh
factorization, at the measured cost of the per-group reseed loop
(scripts/check_plrng_rowseed_onchip.py).  Both
are valid Gibbs chains of the same model; on-chip statistical validation
mirrors the HBM kernel's (scripts/bench_sampler.py --ablate-spans adds the
measured comparison; tests pin the fed-uniform variant bit-exact against
the XLA body's stream on the 8-device CPU mesh).

Fields arrive f32 in REAL units regardless of the coupling form — dense
bf16, int8 ``QuantCoupling`` (scale-out happens after the psum), or packed
``ShardedBlockSparseCoupling`` — so one kernel serves every composition.

Reference parity note: the reference has no analog (its sampling is the
annealer's, src/utils/common.py:123-128); this is TPU-native machinery.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from image_generation_tpu.ops.gibbs import GibbsPlan, class_spans
from image_generation_tpu.ops.gibbs_pallas_hbm import _uniform_hw

__all__ = ["make_pallas_update", "xla_stream_uniforms"]

# rows drawn per hardware-PRNG reseed in the row-seeded kernel: 8 f32
# sublanes = one full VPU tile per draw, and every practical chain count
# (NUM_READS × PT_NUM_BETAS — always a multiple of 8) keeps shard
# boundaries 8-aligned, so the per-group global row id (and with it the
# whole stream) is invariant to how the mesh factors the chains
_ROW_SEED_GROUP = 8


def _group_seeds(k, row_ids, group: int):
    """Per-row-group int32 hardware-PRNG seeds: one scalar threefry from the
    (sweep, span) key plus the GLOBAL row id of each ``group``-row block.
    Depends only on (k, global row ids) — identical on graph-axis peers
    (same row_ids, same k: the mandatory agreement invariant) and, unlike
    the tile-indexed seeding of `_update_hw_kernel`, independent of the
    per-shard chain count, so the stream survives mesh refactoring.
    int32 overflow wraps identically everywhere — harmless for a seed."""
    base = jax.random.randint(
        k, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
    )
    return base + row_ids[::group].astype(jnp.int32)


def _pick_tile(c_loc: int, width: int, cap: int = 256) -> int:
    """Largest divisor of the per-shard chain count ≤ cap AND ≤ the VMEM
    row budget for this span width: the kernel holds ~3 (tile, width) f32
    VMEM buffers (fields, uniforms, out), so the tile shrinks as the span
    widens — color classes are whole spans (class_spans), and a greedy
    coloring can put O(n/2) columns in one class, far past any fixed-tile
    budget at beyond-HBM sizes.  ≥1 always: at tile=1 even a 10^6-wide
    span is ~12 MB, and real padded graphs stay well under that."""
    budget_rows = max(1, (2 << 20) // (width * 4))  # ~2 MB per buffer
    t = max(1, min(c_loc, cap, budget_rows))
    while c_loc % t:
        t -= 1
    return t


def _pick_tile_grouped(c_loc: int, width: int) -> int:
    """`_pick_tile` for the row-seeded kernel: the tile must additionally be
    a whole number of `_ROW_SEED_GROUP`-row seed groups (the scratch-draw
    loop reseeds per group; group starts are 8-aligned so the f32 (8, 128)
    sublane tiling never sees an unaligned store).  Requires
    ``c_loc % _ROW_SEED_GROUP == 0`` (the caller validates).

    Unlike `_pick_tile`, this tile can never shrink below one seed group —
    a span too wide for an 8-row tile inside the VMEM budget (width >
    ~65k columns) must fail LOUDLY rather than silently over-subscribe
    VMEM with a Mosaic compile error downstream; the default (tile-seeded)
    kernel handles such spans at tile=1, so the fix is advertised."""
    t = _pick_tile(c_loc, width)
    if t < _ROW_SEED_GROUP:
        raise ValueError(
            f"PLRNG_ROW_SEED cannot tile a {width}-column color-class span: "
            f"its minimum {_ROW_SEED_GROUP}-row seed-group tile exceeds the "
            "kernel's VMEM row budget — turn PLRNG_ROW_SEED off (the "
            "default hardware-PRNG kernel handles spans this wide at "
            "tile=1) or use the XLA-stream sweep"
        )
    tile = t - t % _ROW_SEED_GROUP
    while c_loc % tile:  # terminates: c_loc % _ROW_SEED_GROUP == 0
        tile -= _ROW_SEED_GROUP
    return tile


def _update_hw_kernel(seed_ref, beta_ref, fields_ref, out_ref):
    # seed already folds in (sweep, span) via the traced key and the shard's
    # global row-tile base; program_id distinguishes tiles within the shard
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    p_plus = jax.nn.sigmoid(-2.0 * beta_ref[:] * fields_ref[:])
    u = _uniform_hw(*out_ref.shape)
    out_ref[:] = jnp.where(u < p_plus, 1.0, -1.0)


def _update_hw_rowseed_kernel(seed_ref, beta_ref, fields_ref, out_ref, u_ref,
                              *, group):
    # mesh-factorization-invariant variant: reseed per ``group``-row block
    # from its GLOBAL row id (seed_ref carries ALL the shard's per-group
    # seeds, unblocked — Mosaic only allows rank-1 SMEM blocks that are
    # whole arrays or 128-multiples, so tiles index it via program_id),
    # draw each group's uniforms into VMEM scratch, then run the vectorized
    # update over the whole tile.  The reseed loop is the cost of the
    # invariance — measured against `_update_hw_kernel` by
    # scripts/check_plrng_rowseed_onchip.py.
    tile, width = out_ref.shape
    per_tile = tile // group
    base = pl.program_id(0) * per_tile

    def draw(g, _):
        pltpu.prng_seed(seed_ref[base + g])
        u_ref[pl.ds(g * group, group), :] = _uniform_hw(group, width)
        return 0

    jax.lax.fori_loop(0, per_tile, draw, 0)
    p_plus = jax.nn.sigmoid(-2.0 * beta_ref[:] * fields_ref[:])
    out_ref[:] = jnp.where(u_ref[:] < p_plus, 1.0, -1.0)


def _update_fed_kernel(beta_ref, fields_ref, u_ref, out_ref):
    p_plus = jax.nn.sigmoid(-2.0 * beta_ref[:] * fields_ref[:])
    out_ref[:] = jnp.where(u_ref[:] < p_plus, 1.0, -1.0)


def make_pallas_update(interpret: bool = False, row_seed: bool = False):
    """Build the sweep body's ``update_fn``: (k, fields, beta_col, row_ids,
    u_span) → f32 ±1 block update of shape ``fields.shape``.

    ``u_span`` None selects the hardware-PRNG kernel (production, TPU only);
    an array feeds explicit uniforms (tests — the plain interpreter runs it
    under shard_map, per the repo's Pallas environment notes).

    ``row_seed`` (config ``PLRNG_ROW_SEED="on"``, opt-in): seed the hardware
    PRNG per 8-row group from each group's GLOBAL row id instead of once per
    row tile — the stream then no longer depends on the per-shard chain
    count, so re-running the same model on a differently-factored mesh
    replays the IDENTICAL chain (the default kernel's documented gap; pinned
    whole-vs-split on chip by scripts/check_plrng_rowseed_onchip.py).  Costs
    one reseed + (8, width) draw per group; requires the per-shard chain
    count to be a multiple of 8 (every NUM_READS × PT_NUM_BETAS shape is).
    Only the hardware-PRNG path differs — fed-uniform calls (tests) are
    byte-identical to the default kernel's."""

    def update(k, fields, beta_col, row_ids, u_span=None):
        c_loc, width = fields.shape
        if row_seed and u_span is None:
            if c_loc % _ROW_SEED_GROUP:
                raise ValueError(
                    "PLRNG_ROW_SEED needs the per-shard chain count to be "
                    f"a multiple of {_ROW_SEED_GROUP}, got {c_loc} — use a "
                    "NUM_READS (× PT ladder) that keeps each mesh shard's "
                    "rows 8-aligned, or turn PLRNG_ROW_SEED off"
                )
            tile = _pick_tile_grouped(c_loc, width)
        else:
            tile = _pick_tile(c_loc, width)
        beta_arr = jnp.broadcast_to(
            jnp.asarray(beta_col, jnp.float32).reshape(-1, 1), (c_loc, 1)
        )
        beta_spec = pl.BlockSpec(
            (tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        span_spec = pl.BlockSpec(
            (tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        common = dict(
            grid=(c_loc // tile,),
            out_specs=span_spec,
            out_shape=jax.ShapeDtypeStruct((c_loc, width), jnp.float32),
            interpret=interpret,
        )
        if u_span is not None:
            return pl.pallas_call(
                _update_fed_kernel,
                in_specs=[beta_spec, span_spec, span_spec],
                **common,
            )(beta_arr, fields, u_span.astype(jnp.float32))
        if row_seed:
            seeds = _group_seeds(k, row_ids, _ROW_SEED_GROUP)
            return pl.pallas_call(
                functools.partial(
                    _update_hw_rowseed_kernel, group=_ROW_SEED_GROUP
                ),
                in_specs=[
                    # whole seed array to every tile (program_id indexes it):
                    # Mosaic rejects rank-1 SMEM blocks that aren't whole
                    # arrays or 128-multiples
                    pl.BlockSpec(
                        (c_loc // _ROW_SEED_GROUP,), lambda i: (0,),
                        memory_space=pltpu.SMEM,
                    ),
                    beta_spec,
                    span_spec,
                ],
                scratch_shapes=[pltpu.VMEM((tile, width), jnp.float32)],
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
                **common,
            )(seeds, beta_arr, fields)
        # one scalar threefry per span (chain-count independent); the global
        # row-tile base keeps chain-axis shards on distinct streams while
        # graph-axis shards (same row_ids, same k) agree bit-for-bit
        seed = jax.random.randint(
            k, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        ) + row_ids[0] // tile
        return pl.pallas_call(
            _update_hw_kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                beta_spec,
                span_spec,
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            **common,
        )(seed, beta_arr, fields)

    return update


def xla_stream_uniforms(
    key: jax.Array, plan: GibbsPlan, n_chains: int, n_sweeps: int
) -> jax.Array:
    """The exact (n_sweeps, n_chains, n_pad) uniform stream the XLA
    graph-sharded body draws internally — per-(sweep, span, GLOBAL chain)
    threefry keying (ops/gibbs_graph_sharded._sweep_body).  Feeding these to
    the fed-uniform kernel makes the Pallas-update sweep bit-exact against
    the XLA sweep, which is how tests pin the composition."""
    row_ids = jnp.arange(n_chains)
    out = jnp.zeros((n_sweeps, n_chains, plan.n_pad), jnp.float32)
    for s, k_sweep in enumerate(jax.random.split(key, n_sweeps)):
        for ci, (start, stop, _b0, _b1) in enumerate(class_spans(plan)):
            k = jax.random.fold_in(k_sweep, ci)
            row_keys = jax.vmap(lambda r, kk=k: jax.random.fold_in(kk, r))(
                row_ids
            )
            u = jax.vmap(
                functools.partial(
                    jax.random.uniform, shape=(stop - start,),
                    dtype=jnp.float32,
                )
            )(row_keys)
            out = out.at[s, :, start:stop].set(u)
    return out
