"""Int8 quantization of the cached sampler coupling.

The v5e MXU runs int8 matmuls at 2x its bf16 rate (394 TOPS vs
197 TFLOP/s), and measured on this chip an int8 sweep-shaped dot sustains
~117 TOPS (scripts/probe_int8.py).  Spins are exactly representable in
int8 (±1), so the only approximation is rounding each coupling to one of
255 levels of a symmetric per-model scale:

    scale = max|A| / 127          A_q = round(A / scale)  ∈ [-127, 127]

The sampled distribution is then the Boltzmann distribution of the
*quantized* model A' = scale * A_q — a well-defined symmetric Ising model
whose couplings differ from A by at most scale/2 = max|A|/254 (<0.4% of
the coupling range).  For calibration: the physical annealer this
framework replaces runs its negative phase with ~1-2%-of-range analog
control error on h/J (D-Wave "ICE"; the reference clips J into the
hardware range for exactly this device, src/utils/common.py:103-140), so
int8 sampling is strictly *tighter* than the reference's hardware path.
Statistical correctness against exact enumeration of the quantized model
is pinned in tests/test_gibbs_int8.py.

Energy/field bookkeeping stays exact: the int8 matmul accumulates in
int32 (exact — |rows| * 127 << 2^31 at any graph size here), and fields /
energies are formed as ``int32.astype(f32) * scale`` with f32 h added
unquantized.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["QuantCoupling", "quantize_coupling", "dequantize_coupling"]


class QuantCoupling(NamedTuple):
    """Int8-quantized symmetric coupling matrix with its f32 scale.

    A pytree, so it rides the existing ``TrainState.sampler_coupling`` slot
    (replication, donation, and checkpoint stripping are all leaf-wise;
    native checkpoints never serialize it — io/native_ckpt.py rebuilds the
    cache from ``grbm_params`` on restore).
    """

    q: jax.Array      # (n_pad, n_pad) int8, symmetric
    scale: jax.Array  # () f32 — dequantized coupling is q * scale


def quantize_coupling(a: jax.Array) -> QuantCoupling:
    """Symmetric int8 quantization of a (n_pad, n_pad) coupling matrix.

    Element-wise rounding of a symmetric matrix is symmetric, so the
    quantized model is still a valid Ising energy.  A zero matrix (fresh
    GRBM init) quantizes with scale 1 to avoid a 0/0.
    """
    a = a.astype(jnp.float32)
    amax = jnp.max(jnp.abs(a))
    scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(a / scale), -127, 127).astype(jnp.int8)
    return QuantCoupling(q=q, scale=scale)


def dequantize_coupling(qc: QuantCoupling) -> jax.Array:
    """The f32 coupling matrix the int8 sampler actually samples."""
    return qc.q.astype(jnp.float32) * qc.scale
