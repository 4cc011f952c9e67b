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
graph-axis peers share identical (row_ids, c_loc, key).  Both
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


def _update_hw_kernel(seed_ref, beta_ref, fields_ref, out_ref):
    # seed already folds in (sweep, span) via the traced key and the shard's
    # global row-tile base; program_id distinguishes tiles within the shard
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    p_plus = jax.nn.sigmoid(-2.0 * beta_ref[:] * fields_ref[:])
    u = _uniform_hw(*out_ref.shape)
    out_ref[:] = jnp.where(u < p_plus, 1.0, -1.0)


def _update_fed_kernel(beta_ref, fields_ref, u_ref, out_ref):
    p_plus = jax.nn.sigmoid(-2.0 * beta_ref[:] * fields_ref[:])
    out_ref[:] = jnp.where(u_ref[:] < p_plus, 1.0, -1.0)


def make_pallas_update(interpret: bool = False):
    """Build the sweep body's ``update_fn``: (k, fields, beta_col, row_ids,
    u_span) → f32 ±1 block update of shape ``fields.shape``.

    ``u_span`` None selects the hardware-PRNG kernel (production, TPU only);
    an array feeds explicit uniforms (tests — the plain interpreter runs it
    under shard_map, per the repo's Pallas environment notes)."""

    def update(k, fields, beta_col, row_ids, u_span=None):
        c_loc, width = fields.shape
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
