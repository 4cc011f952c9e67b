"""Convolutional encoder: images → latent spin logits.

Layer-for-layer TPU-native port of the reference encoder architecture
(reference: src/encoder.py:18-49): four blocks of
Conv3×3(stride 1, SAME) → BatchNorm → MaxPool2 → LeakyReLU with the final
LeakyReLU dropped, channels 1→32→64→128→n_latents, spatial 32→16→8→4→2;
then flatten the 2×2 spatial map per channel, a Linear(4→1) projection and a
final flatten to (B, n_latents) logits.

Differences by design (not omissions):
  * data layout is NHWC (TPU-native; the reference is NCHW) — the checkpoint
    converter (io/torch_pth.py) handles the transposition;
  * BatchNorm running variance is updated with the biased estimator (Flax
    convention) where torch uses the unbiased one — normalization semantics
    in both train and eval are identical; only the running-stat EMA differs
    at O(1/batch) relative size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["Encoder"]


class Encoder(nn.Module):
    """Maps (B, H, W, 1) binarized images to (B, n_latents) spin logits.

    ``dtype`` is the compute precision of the conv/dense layers (bfloat16 on
    TPU for MXU throughput); parameters and BatchNorm statistics stay
    float32, and the returned logits are float32.
    """

    n_latents: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        features = (32, 64, 128, self.n_latents)
        for i, f in enumerate(features):
            x = nn.Conv(
                f, (3, 3), strides=1, padding="SAME", dtype=self.dtype, name=f"conv_{i}"
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,  # normalize in f32 regardless of compute dtype
                name=f"bn_{i}",
            )(x)
            x = x.astype(self.dtype)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if i < len(features) - 1:  # reference drops the last LeakyReLU
                x = nn.leaky_relu(x)  # negative_slope 0.01, torch default

        # (B, 2, 2, C) → channel-major (B, C, 4) to match the reference's
        # Flatten(-2,-1) on NCHW, then project 4 → 1 and flatten.
        b = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, self.n_latents, 4)
        x = nn.Dense(1, dtype=self.dtype, name="projection")(x)
        return x.reshape(b, self.n_latents).astype(jnp.float32)
