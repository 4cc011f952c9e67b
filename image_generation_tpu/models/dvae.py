"""Discrete Variational Autoencoder with a ±1 spin latent bottleneck.

TPU-native replacement for ``dwave.plugins.torch.models.
DiscreteVariationalAutoencoder`` as consumed by the reference (call:
``dvae(images, n_replicas) → (latents, spins, recon)``,
src/model_wrapper.py:184-190, 297, 465; submodule access ``.encoder`` /
``.decoder`` / ``.latent_to_discrete``, src/utils/callback_helpers.py:119-140).

Latent-to-discrete modes (reference: src/utils/common.py:143-175 and
README.md:152-166):

  * ``None`` (default) — stochastic straight-through: each replica draws
    spin s = +1 with probability σ(2ℓ) (the Boltzmann marginal of a single
    spin with bias ℓ at β=1) and the backward pass routes gradients to the
    logits as identity ("z is sent to the decoder and ℓ is sent backwards",
    reference README);
  * ``"heaviside"`` — deterministic sign(ℓ) with the same straight-through
    identity gradient; only legal with n_replicas=1
    (reference: src/model_wrapper.py:181-182).

RNG streams: ``spins`` (latent sampling) and ``dropout`` (decoder).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from image_generation_tpu.models.decoder import Decoder
from image_generation_tpu.models.encoder import Encoder

__all__ = ["DVAE", "spins_straight_through", "heaviside_spins"]


def spins_straight_through(
    logits: jax.Array, n_replicas: int, key: jax.Array
) -> jax.Array:
    """Stochastic ±1 spins with straight-through identity gradients.

    logits: (B, n) → spins (B, n_replicas, n) ∈ {−1, +1}.
    """
    p_plus = jax.nn.sigmoid(2.0 * logits)[:, None, :]
    u = jax.random.uniform(
        key, (logits.shape[0], n_replicas, logits.shape[1]), dtype=logits.dtype
    )
    hard = jnp.where(u < p_plus, 1.0, -1.0).astype(logits.dtype)
    soft = logits[:, None, :]
    return soft + jax.lax.stop_gradient(hard - soft)


def gumbel_spins(
    logits: jax.Array, n_replicas: int, key: jax.Array, tau: float = 1.0
) -> jax.Array:
    """Relaxed ±1 spins via the logistic/Gumbel reparameterization.

    The reference README describes this as the alternative to straight-
    through ("adding Gumbel noise to the logits … reparameterises the
    randomness source", README.md:159-166): with logistic noise
    L = log U − log(1−U),   s = tanh((2ℓ + L) / τ) ∈ (−1, 1),
    which converges to exact ±1 samples with p(+1) = σ(2ℓ) as τ → 0 and is
    fully reparameterized (no stop-gradient needed).
    """
    u = jax.random.uniform(
        key,
        (logits.shape[0], n_replicas, logits.shape[1]),
        dtype=logits.dtype,
        minval=1e-6,
        maxval=1.0 - 1e-6,
    )
    noise = jnp.log(u) - jnp.log1p(-u)
    return jnp.tanh((2.0 * logits[:, None, :] + noise) / tau)


def heaviside_spins(logits: jax.Array, n_replicas: int, key=None) -> jax.Array:
    """Deterministic sign(ℓ) spins (0 maps to −1) with ST gradients.

    Reference semantics: ``heaviside(ℓ, 0)·2 − 1`` then
    ``hard − ℓ.detach() + ℓ`` unsqueezed to a single replica
    (src/utils/common.py:160-173).
    """
    if n_replicas != 1:
        raise ValueError("heaviside latent-to-discrete requires n_replicas=1")
    hard = jnp.where(logits > 0, 1.0, -1.0).astype(logits.dtype)
    out = logits + jax.lax.stop_gradient(hard - logits)
    return out[:, None, :]


class DVAE(nn.Module):
    """Encoder → spin bottleneck → decoder.

    Call with images (B, H, W, 1); returns (logits, spins, reconstruction)
    with spins (B, R, n_latents) and reconstruction (B, R, H, W, 1).
    """

    n_latents: int
    latent_to_discrete: Optional[str] = None  # None | "heaviside" | "gumbel"
    gumbel_tau: float = 1.0
    dtype: object = jnp.float32  # conv/dense compute precision (bf16 on TPU)

    def setup(self):
        if self.latent_to_discrete not in (None, "heaviside", "gumbel"):
            raise ValueError("Invalid Mode: Mode is not heaviside.")
        self.encoder = Encoder(n_latents=self.n_latents, dtype=self.dtype)
        self.decoder = Decoder(n_latents=self.n_latents, dtype=self.dtype)

    def __call__(self, images: jax.Array, n_replicas: int = 1, train: bool = False):
        logits = self.encoder(images, train=train)
        if self.latent_to_discrete == "heaviside":
            spins = heaviside_spins(logits, n_replicas)
        elif self.latent_to_discrete == "gumbel":
            spins = gumbel_spins(logits, n_replicas, self.make_rng("spins"), self.gumbel_tau)
        else:
            spins = spins_straight_through(logits, n_replicas, self.make_rng("spins"))
        recon = self.decoder(spins, train=train)
        return logits, spins, recon

    def encode(self, images: jax.Array, train: bool = False) -> jax.Array:
        return self.encoder(images, train=train)

    def decode(self, spins: jax.Array, train: bool = False) -> jax.Array:
        return self.decoder(spins, train=train)
