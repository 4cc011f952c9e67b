"""MMD + Gaussian mixture kernel tests (naive-numpy oracle + properties)."""

import jax
import jax.numpy as jnp
import numpy as np

from image_generation_tpu.ops.mmd import GaussianKernel, mmd_loss, pairwise_sq_dists


def _naive_mmd(x, y, n_kernels=7, mul=2.0):
    z = np.concatenate([x, y], axis=0).astype(np.float64)
    n = z.shape[0]
    d2 = ((z[:, None, :] - z[None, :, :]) ** 2).sum(-1)
    base = d2.sum() / (n * n - n)
    exps = np.arange(n_kernels) - (n_kernels - 1) / 2.0
    k = sum(np.exp(-d2 / (base * mul**w)) for w in exps)
    nx = x.shape[0]
    return k[:nx, :nx].mean() + k[nx:, nx:].mean() - 2 * k[:nx, nx:].mean()


def test_pairwise_sq_dists_matches_naive():
    rng = np.random.RandomState(0)
    x = rng.randn(7, 5).astype(np.float32)
    y = rng.randn(9, 5).astype(np.float32)
    d2 = np.asarray(pairwise_sq_dists(jnp.asarray(x), jnp.asarray(y)))
    naive = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d2, naive, rtol=1e-4, atol=1e-5)


def test_mmd_matches_naive():
    rng = np.random.RandomState(1)
    x = rng.choice([-1.0, 1.0], size=(40, 16)).astype(np.float32)
    y = rng.choice([-1.0, 1.0], size=(24, 16)).astype(np.float32)
    ours = float(mmd_loss(jnp.asarray(x), jnp.asarray(y)))
    ref = _naive_mmd(x, y)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_mmd_zero_for_identical_samples():
    rng = np.random.RandomState(2)
    x = rng.randn(32, 8).astype(np.float32)
    assert abs(float(mmd_loss(jnp.asarray(x), jnp.asarray(x)))) < 1e-4


def test_mmd_separates_distributions():
    rng = np.random.RandomState(3)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.choice([-1.0, 1.0], size=(128, 32), p=[0.5, 0.5]).astype(np.float32))
    y_same = jnp.asarray(rng.choice([-1.0, 1.0], size=(128, 32), p=[0.5, 0.5]).astype(np.float32))
    y_diff = jnp.asarray(rng.choice([-1.0, 1.0], size=(128, 32), p=[0.9, 0.1]).astype(np.float32))
    m_same = float(mmd_loss(x, y_same))
    m_diff = float(mmd_loss(x, y_diff))
    assert m_diff > 5 * max(m_same, 1e-6)


def test_mmd_differentiable_wrt_x_only_path():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(16, 8).astype(np.float32))
    y = jnp.asarray(rng.randn(16, 8).astype(np.float32))
    g = jax.grad(lambda x_: mmd_loss(x_, y))(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.linalg.norm(g)) > 0


def test_fixed_bandwidth_kernel():
    k = GaussianKernel(n_kernels=1, bandwidth=2.0)
    d2 = jnp.asarray([[0.0, 2.0]])
    out = np.asarray(k(d2))
    np.testing.assert_allclose(out, [[1.0, np.exp(-1.0)]], rtol=1e-6)
