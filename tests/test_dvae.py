"""DVAE architecture + checkpoint-conversion parity tests.

The oracle is torch.nn.functional (torch CPU is available in the image):
the same math the reference's Encoder/Decoder modules perform
(src/encoder.py:18-49, src/decoder.py:18-62), applied with the *shipped
checkpoint weights* (models/Advantage2_system1_10_epochs/dvae.pth).  The
flax models must reproduce the torch forward to float tolerance in eval
mode — this pins both the layer-for-layer architecture and the
OIHW→HWIO / ConvT→Conv weight conversions.
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_generation_tpu.models.decoder import Decoder, upsample_nearest_2x
from image_generation_tpu.models.dvae import DVAE, heaviside_spins, spins_straight_through
from image_generation_tpu.models.encoder import Encoder
from image_generation_tpu.io.torch_pth import (
    dvae_params_from_state_dict,
    dvae_state_dict_from_params,
    grbm_from_state_dict,
    load_state_dict,
)

REF_MODELS = pathlib.Path("/root/reference/models")
CKPT = REF_MODELS / "Advantage2_system1_10_epochs"

pytestmark = pytest.mark.skipif(not CKPT.exists(), reason="reference checkpoints absent")


@pytest.fixture(scope="module")
def sd():
    return load_state_dict(CKPT / "dvae.pth")


@pytest.fixture(scope="module")
def flax_vars(sd):
    params, batch_stats = dvae_params_from_state_dict(sd)
    return {"params": params, "batch_stats": batch_stats}


def _torch_encoder(sd, x_nchw):
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(x_nchw)
    w = lambda k: torch.from_numpy(sd[k])  # noqa: E731
    for step, (cid, bid) in enumerate(zip((0, 4, 8, 12), (1, 5, 9, 13))):
        t = F.conv2d(t, w(f"_encoder.conv.{cid}.weight"), w(f"_encoder.conv.{cid}.bias"), padding=1)
        t = F.batch_norm(
            t,
            w(f"_encoder.conv.{bid}.running_mean"),
            w(f"_encoder.conv.{bid}.running_var"),
            w(f"_encoder.conv.{bid}.weight"),
            w(f"_encoder.conv.{bid}.bias"),
            training=False,
            eps=1e-5,
        )
        t = F.max_pool2d(t, 2, 2)
        if step < 3:
            t = F.leaky_relu(t, 0.01)
    t = t.flatten(-2, -1)  # (B, C, 4)
    t = F.linear(t, w("_encoder.projection.weight"), w("_encoder.projection.bias"))
    return t.flatten(1).numpy()


def _torch_decoder(sd, z_brn):
    import torch
    import torch.nn.functional as F

    w = lambda k: torch.from_numpy(sd[k])  # noqa: E731
    z = torch.from_numpy(z_brn)
    b, r, n = z.shape
    t = F.linear(z, w("_decoder.increase_latent_dim.weight"), w("_decoder.increase_latent_dim.bias"))
    t = t.unflatten(-1, (n, 2, 2)).flatten(0, 1)
    for cid, bid in zip((0, 5, 10, 15), (1, 6, 11, 16)):
        t = F.conv_transpose2d(
            t, w(f"_decoder.convtrans.{cid}.weight"), w(f"_decoder.convtrans.{cid}.bias"), padding=1
        )
        t = F.batch_norm(
            t,
            w(f"_decoder.convtrans.{bid}.running_mean"),
            w(f"_decoder.convtrans.{bid}.running_var"),
            w(f"_decoder.convtrans.{bid}.weight"),
            w(f"_decoder.convtrans.{bid}.bias"),
            training=False,
            eps=1e-5,
        )
        # Dropout2d is identity in eval
        t = F.interpolate(t, scale_factor=2, mode="nearest")
        t = F.leaky_relu(t, 0.01)
    t = F.conv_transpose2d(
        t, w("_decoder.convtrans.20.weight"), w("_decoder.convtrans.20.bias"), padding=1
    )
    return t.reshape(b, r, *t.shape[1:]).numpy()  # (B, R, 1, 32, 32)


def test_encoder_matches_torch_on_shipped_checkpoint(sd, flax_vars):
    rng = np.random.RandomState(0)
    x = np.round(rng.rand(4, 1, 32, 32)).astype(np.float32)  # binarized like MNIST
    ref = _torch_encoder(sd, x)

    enc = Encoder(n_latents=256)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    out = enc.apply(
        {"params": flax_vars["params"]["encoder"], "batch_stats": flax_vars["batch_stats"]["encoder"]},
        x_nhwc,
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_decoder_matches_torch_on_shipped_checkpoint(sd, flax_vars):
    rng = np.random.RandomState(1)
    z = rng.choice([-1.0, 1.0], size=(2, 3, 256)).astype(np.float32)
    ref = _torch_decoder(sd, z)  # (B, R, 1, 32, 32)

    dec = Decoder(n_latents=256)
    out = dec.apply(
        {"params": flax_vars["params"]["decoder"], "batch_stats": flax_vars["batch_stats"]["decoder"]},
        jnp.asarray(z),
        train=False,
    )  # (B, R, 32, 32, 1)
    out_nchw = np.transpose(np.asarray(out), (0, 1, 4, 2, 3))
    np.testing.assert_allclose(out_nchw, ref, rtol=1e-3, atol=1e-4)


def test_full_dvae_forward_shapes(flax_vars):
    dvae = DVAE(n_latents=256)
    x = jnp.zeros((2, 32, 32, 1))
    logits, spins, recon = dvae.apply(
        flax_vars, x, n_replicas=8, train=False, rngs={"spins": jax.random.PRNGKey(0)}
    )
    assert logits.shape == (2, 256)
    assert spins.shape == (2, 8, 256)
    assert recon.shape == (2, 8, 32, 32, 1)
    # ST formula ℓ + sg(hard − ℓ) reproduces ±1 to 1 ulp (same as the
    # reference's ``hard − ℓ.detach() + ℓ``)
    np.testing.assert_allclose(np.abs(np.asarray(spins)), 1.0, rtol=1e-6)


def test_state_dict_roundtrip(sd):
    params, stats = dvae_params_from_state_dict(sd)
    back = dvae_state_dict_from_params(params, stats)
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(back[k], v, err_msg=k)
    assert set(back) == set(sd)


def test_straight_through_gradient_is_identity():
    def f(logits):
        s = spins_straight_through(logits, 4, jax.random.PRNGKey(0))
        return jnp.sum(s * jnp.arange(1.0, 5.0)[None, :, None])

    logits = jnp.asarray(np.random.RandomState(0).randn(3, 16).astype(np.float32))
    g = jax.grad(f)(logits)
    # d(sum over replicas r of w_r * s_{b,r,i}) / d logits_{b,i} = sum_r w_r
    np.testing.assert_allclose(np.asarray(g), np.full((3, 16), 10.0), rtol=1e-6)


def test_spin_sampling_probability():
    logits = jnp.full((1, 512), 0.5)
    spins = spins_straight_through(logits, 64, jax.random.PRNGKey(1))
    p_emp = float(jnp.mean(spins == 1.0))
    p_true = float(jax.nn.sigmoid(2 * 0.5))
    assert abs(p_emp - p_true) < 0.02


def test_heaviside_mode():
    logits = jnp.asarray([[-1.0, 0.0, 2.0]])
    s = heaviside_spins(logits, 1)
    np.testing.assert_array_equal(np.asarray(s), [[[-1.0, -1.0, 1.0]]])
    with pytest.raises(ValueError):
        heaviside_spins(logits, 2)


def test_upsample_nearest_matches_torch():
    import torch
    import torch.nn.functional as F

    x = np.random.RandomState(3).randn(2, 5, 5, 3).astype(np.float32)
    ours = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
    ref = (
        F.interpolate(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), scale_factor=2, mode="nearest")
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("name", [p.name for p in sorted(REF_MODELS.glob("*"))] if REF_MODELS.exists() else [])
def test_all_shipped_checkpoints_load(name):
    d = REF_MODELS / name
    params, stats = dvae_params_from_state_dict(load_state_dict(d / "dvae.pth"))
    assert params["encoder"]["conv_3"]["kernel"].shape == (3, 3, 128, 256)
    gp, gg = grbm_from_state_dict(load_state_dict(d / "grbm.pth"))
    assert gp.n == 256
    assert gg.n_edges == gp.n_edges == gg.edge_i.shape[0]
    # forward one image through the loaded model end to end
    dvae = DVAE(n_latents=256)
    x = jnp.zeros((1, 32, 32, 1))
    _, spins, recon = dvae.apply(
        {"params": params, "batch_stats": stats},
        x,
        n_replicas=1,
        train=False,
        rngs={"spins": jax.random.PRNGKey(0)},
    )
    assert recon.shape == (1, 1, 32, 32, 1)
    assert np.isfinite(np.asarray(recon)).all()
