"""Optimizer storage options (training/optim.py).

The bf16-moment path is covered by tests/test_training.py's trajectory
comparison; here the rank-1 FACTORED second moment (ADAM_FACTORED_NU) is
pinned:

  * exactness — when the g² EMA is rank-1 (constant outer-product
    gradients), the Adafactor estimator reconstructs nu EXACTLY, so the
    factored updates must equal stock optax.scale_by_adam to float
    tolerance;
  * gating — only 2-D leaves at/above the size threshold factor, and the
    state stays a valid pytree (jit/donate/checkpoint compatible);
  * optimization — factored Adam still minimizes a least-squares problem;
  * integration — the fused train step runs with ADAM_FACTORED_NU="on"
    (threshold lowered so the flagship-sized dense qualifies), losses are
    finite, and a native checkpoint round-trips the factored state.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from image_generation_tpu.training.optim import FactoredNu, scale_by_adam_moments


def _tree_allclose(a, b, rtol=1e-5, atol=1e-6):
    flat_a = jax.tree.leaves(a)
    flat_b = jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


def test_factored_exact_on_rank1_gradients():
    # g_t = outer(a, b) for all t → V (the exact g² EMA) is rank-1 at every
    # step, where the row/col-mean reconstruction r_i c_j / mean(r) is exact
    params = {"w": jnp.zeros((8, 6), jnp.float32)}
    a = jnp.linspace(0.5, 2.0, 8)
    b = jnp.linspace(-1.5, 1.0, 6)
    g = {"w": jnp.outer(a, b)}

    ref = optax.scale_by_adam()
    fac = scale_by_adam_moments(factored_nu_min_size=8)  # (8,6)=48 ≥ 8

    s_ref = ref.init(params)
    s_fac = fac.init(params)
    assert isinstance(s_fac.nu["w"], FactoredNu)
    for _ in range(5):
        u_ref, s_ref = ref.update(g, s_ref)
        u_fac, s_fac = fac.update(g, s_fac)
        _tree_allclose(u_ref, u_fac)


def test_factored_gating_by_shape_and_size():
    params = {
        "big": jnp.ones((64, 32)),    # 2048 ≥ 1024 → factored
        "small": jnp.ones((16, 8)),   # 128 < 1024 → dense
        "vec": jnp.ones((4096,)),     # 1-D → dense regardless of size
        "conv": jnp.ones((3, 3, 8, 64)),  # 4-D → dense
    }
    tx = scale_by_adam_moments(factored_nu_min_size=1024)
    state = tx.init(params)
    assert isinstance(state.nu["big"], FactoredNu)
    assert state.nu["big"].row.shape == (64,)
    assert state.nu["big"].col.shape == (32,)
    for k in ("small", "vec", "conv"):
        assert isinstance(state.nu[k], jax.Array)
        assert state.nu[k].shape == params[k].shape
    # dense-nu leaves must still match stock adam exactly for general grads
    key = jax.random.PRNGKey(0)
    g = {
        k: jax.random.normal(jax.random.fold_in(key, i), v.shape)
        for i, (k, v) in enumerate(params.items())
    }
    ref = optax.scale_by_adam()
    s_ref = ref.init(params)
    u_ref, _ = ref.update(g, s_ref)
    u_fac, _ = tx.update(g, state)
    for k in ("small", "vec", "conv"):
        np.testing.assert_allclose(
            np.asarray(u_ref[k]), np.asarray(u_fac[k]), rtol=1e-6
        )


def test_factored_adam_minimizes_least_squares():
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (128, 32))
    w_true = jax.random.normal(k2, (32, 48))
    y = x @ w_true
    params = {"w": jax.random.normal(k3, (32, 48)) * 0.1}

    tx = optax.chain(
        scale_by_adam_moments(factored_nu_min_size=256), optax.scale(-0.05)
    )
    state = tx.init(params)

    def loss_fn(p):
        return jnp.mean((x @ p["w"] - y) ** 2)

    @jax.jit
    def train_step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        u, s = tx.update(g, s)
        return optax.apply_updates(p, u), s, loss

    loss0 = float(loss_fn(params))
    for _ in range(200):
        params, state, loss = train_step(params, state)
    assert float(loss) < loss0 / 20.0


def test_factored_composes_with_bf16_mu():
    params = {"w": jnp.ones((32, 16))}
    tx = scale_by_adam_moments(
        moment_dtype=jnp.bfloat16, factored_nu_min_size=256
    )
    state = tx.init(params)
    assert state.mu["w"].dtype == jnp.bfloat16
    assert isinstance(state.nu["w"], FactoredNu)
    assert state.nu["w"].row.dtype == jnp.float32  # vectors stay f32
    g = {"w": jnp.full((32, 16), 0.1)}
    u, state = tx.update(g, state)
    assert jnp.all(jnp.isfinite(u["w"]))
    assert state.mu["w"].dtype == jnp.bfloat16


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    yield mp
    mp.undo()


@pytest.fixture(scope="module")
def tiny_factored_bundle(monkeypatch_module):
    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.models.grbm import GRBMGraph
    from image_generation_tpu.training import step as step_mod
    from image_generation_tpu.utils.subgraph import select_latent_graph
    from image_generation_tpu.utils.topology import zephyr_graph

    # lower the threshold so the tiny config's decoder dense qualifies
    monkeypatch_module.setattr(step_mod, "_FACTORED_NU_MIN", 1 << 10)
    cfg = TrainingConfig(
        N_LATENTS=32, NUM_READS=16, BATCH_SIZE=8, N_REPLICAS=2,
        GIBBS_SWEEPS=2, GIBBS_BURN_IN=2, ADAM_FACTORED_NU="on",
    )
    latent, _ = select_latent_graph(zephyr_graph(2), cfg.N_LATENTS, cfg.RANDOM_SEED)
    fns = step_mod.make_train_fns(
        cfg, GRBMGraph.from_networkx(latent), total_steps=8
    )
    return cfg, fns


def test_train_step_with_factored_nu(tiny_factored_bundle, tmp_path):
    cfg, fns = tiny_factored_bundle
    batch0 = jnp.zeros((1, 32, 32, 1))
    state = fns.init(jax.random.PRNGKey(0), batch0)
    # the decoder's latent-expansion dense (32→128 = 4096 ≥ 1024) factors
    factored = [
        leaf for leaf in jax.tree.leaves(
            state.dvae_opt, is_leaf=lambda x: isinstance(x, FactoredNu)
        ) if isinstance(leaf, FactoredNu)
    ]
    assert factored, "expected at least one FactoredNu leaf in the opt state"

    batch = jax.random.uniform(jax.random.PRNGKey(1), (cfg.BATCH_SIZE, 32, 32, 1))
    batch = jnp.round(batch)
    state2, metrics = fns.step(state, batch, jnp.int32(0))
    assert np.isfinite(float(metrics.mse))
    assert np.isfinite(float(metrics.dvae_loss))
    assert int(state2.opt_step) == 1

    # native checkpoint round-trips the factored opt state bit-exactly
    from image_generation_tpu.io.native_ckpt import (
        restore_train_state,
        save_train_state,
    )

    save_train_state(tmp_path, state2)
    template = fns.init(jax.random.PRNGKey(2), batch0)
    restored = restore_train_state(
        tmp_path, template, rebuild_cache=fns.rebuild_cache
    )
    _tree_allclose(restored.dvae_opt, state2.dvae_opt, rtol=0, atol=0)
    # and the restored state steps on
    state3, m3 = fns.step(restored, batch, jnp.int32(0))
    assert np.isfinite(float(m3.mse))
