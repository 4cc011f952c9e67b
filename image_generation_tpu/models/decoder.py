"""Convolutional decoder: latent spins → images.

Layer-for-layer TPU-native port of the reference decoder architecture
(reference: src/decoder.py:18-62): Linear(n → 4n), unflatten to a channel-
major (n, 2, 2) map, merge the batch and replica dims, then four blocks of
ConvT3×3(stride 1, SAME) → BatchNorm → Dropout2d(0.2) → Upsample×2(nearest)
→ LeakyReLU with channels n→128→64→32→1 and spatial 2→4→8→16→32, plus a
final ConvT3×3(1→1); output reshaped back to (B, R, 32, 32, 1).

A stride-1 / SAME transposed convolution is mathematically a regular
convolution with the spatially-flipped, channel-swapped kernel, so the
layers here are ordinary ``nn.Conv`` (better for XLA fusion); the checkpoint
converter (io/torch_pth.py) performs the flip/swap so the reference's
``_decoder.convtrans.*`` tensors load exactly.

Dropout2d (whole-channel dropout) is ``nn.Dropout`` broadcast over the
spatial dims.  Layout is NHWC (see encoder.py notes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["Decoder", "upsample_nearest_2x"]


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor ×2 upsample on NHWC, as reshape/broadcast (no gather)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class Decoder(nn.Module):
    """Maps (B, R, n_latents) spins to (B, R, H, W, 1) images.

    ``dtype`` is the compute precision of the conv/dense layers (bfloat16 on
    TPU); parameters and BatchNorm statistics stay float32, and the output
    is float32.
    """

    n_latents: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = False) -> jax.Array:
        if z.ndim != 3:
            raise ValueError(f"decoder expects (B, R, n_latents); got {z.shape}")
        b, r, n = z.shape
        x = nn.Dense(4 * n, dtype=self.dtype, name="increase_latent_dim")(z)
        # channel-major unflatten (reference: Unflatten(-1, (n, 2, 2))) then
        # merge batch+replica dims and convert to NHWC.
        x = x.reshape(b * r, n, 2, 2)
        x = jnp.transpose(x, (0, 2, 3, 1))  # (B·R, 2, 2, n)

        features = (128, 64, 32, 1)
        for i, f in enumerate(features):
            x = nn.Conv(
                f, (3, 3), strides=1, padding="SAME", dtype=self.dtype, name=f"convt_{i}"
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,  # normalize in f32 regardless of compute dtype
                name=f"bn_{i}",
            )(x)
            x = x.astype(self.dtype)
            x = nn.Dropout(
                rate=0.2, broadcast_dims=(1, 2), deterministic=not train,
                name=f"dropout_{i}",
            )(x)
            x = upsample_nearest_2x(x)
            x = nn.leaky_relu(x)

        x = nn.Conv(1, (3, 3), strides=1, padding="SAME", dtype=self.dtype, name="convt_4")(x)
        h, w = x.shape[1], x.shape[2]
        return x.reshape(b, r, h, w, 1).astype(jnp.float32)
