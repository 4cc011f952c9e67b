"""End-to-end training tests on a tiny CPU config.

Driver config #1 equivalent (BASELINE.json): DVAE + GRBM, classical Gibbs
sampler standing in for the QPU, short run on CPU — losses must be finite
and decreasing, schedules exact, GRBM schedule honored.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_generation_tpu.config import TrainingConfig
from image_generation_tpu.training.schedules import geomspace_lr
from image_generation_tpu.training.trainer import Trainer, TrainingError


def tiny_config(**kw):
    base = dict(
        N_LATENTS=32,
        NUM_READS=64,
        BATCH_SIZE=16,
        DATASET_SIZE=96,
        N_REPLICAS=2,
        GIBBS_SWEEPS=4,
        GIBBS_BURN_IN=8,
        QPU="Advantage2_prototype",
    )
    base.update(kw)
    return TrainingConfig(**base)


@pytest.fixture(scope="module")
def trained():
    t = Trainer(qpu="Advantage2_prototype", config=tiny_config())
    t.train_init(n_epochs=2)
    t.train(2)
    return t


def test_geomspace_matches_reference_tables():
    total = 100
    sched = np.geomspace(1e-4, 1e-5, total + 1)
    lr = geomspace_lr(1e-4, 1e-5, total)
    # step 0 runs at the initial LR; step k at table[k-1]
    assert float(lr(0)) == pytest.approx(sched[0], rel=1e-6)
    for k in (1, 2, 50, 100):
        assert float(lr(k)) == pytest.approx(sched[k - 1], rel=1e-6)


def test_step_before_init_raises():
    t = Trainer(config=tiny_config())
    with pytest.raises(TrainingError):
        t.step(jnp.zeros((16, 32, 32, 1)), 0)


def test_losses_recorded_and_finite(trained):
    n_batches = 96 // 16
    assert len(trained.losses["mse_losses"]) == 2 * n_batches
    assert len(trained.losses["dvae_losses"]) == 2 * n_batches
    assert np.isfinite(trained.losses["mse_losses"]).all()
    assert np.isfinite(trained.losses["dvae_losses"]).all()
    # dvae_loss = mse + mmd ≥ mse (mmd of the biased V-statistic is ≥ 0)
    assert all(
        d >= m - 1e-5
        for m, d in zip(trained.losses["mse_losses"], trained.losses["dvae_losses"])
    )


def test_mse_decreases(trained):
    mses = trained.losses["mse_losses"]
    assert np.mean(mses[-3:]) < np.mean(mses[:3])


def test_single_step_api(trained):
    t = Trainer(config=tiny_config())
    t.train_init(n_epochs=1)
    batch = t.images[:16]
    mse = t.step(batch, epoch=0)
    assert np.isfinite(mse)
    assert len(t.losses["mse_losses"]) == 1
    # tuple batches (images, labels) accepted like the reference
    mse2 = t.step((batch, None), epoch=0)
    assert np.isfinite(mse2)


def test_grbm_updates_only_on_schedule():
    t = Trainer(config=tiny_config())
    t.train_init(n_epochs=1)
    lin0 = np.asarray(t.state.grbm_params.linear).copy()
    batch = t.images[:16]
    t.step(batch, epoch=0)  # opt_step 0 → 0 % 10 == 0 → trains
    lin1 = np.asarray(t.state.grbm_params.linear).copy()
    assert not np.allclose(lin0, lin1)
    t.step(batch, epoch=0)  # opt_step 1 → skipped
    lin2 = np.asarray(t.state.grbm_params.linear).copy()
    np.testing.assert_array_equal(lin1, lin2)
    # epoch ≥ 6 → never trains
    t.state = t.state.replace(opt_step=jnp.asarray(20, jnp.int32))
    t.step(batch, epoch=7)
    lin3 = np.asarray(t.state.grbm_params.linear).copy()
    np.testing.assert_array_equal(lin2, lin3)


def test_sampler_cache_tracks_grbm_params():
    """The cached (sampler_h, sampler_coupling) must always equal
    scaled_ising(current grbm params) — including after scheduled GRBM
    updates, checkpoint loads, and tune re-inits."""
    from image_generation_tpu.models.grbm import scaled_ising
    from image_generation_tpu.ops.gibbs import permuted_model

    t = Trainer(config=tiny_config())
    t.train_init(n_epochs=1)

    def check(state):
        h, j = scaled_ising(
            state.grbm_params, t.config.PREFACTOR, t.config.H_RANGE, t.config.J_RANGE
        )
        hp, cp = permuted_model(t.plan, h, j)
        np.testing.assert_allclose(np.asarray(state.sampler_h), np.asarray(hp), atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(state.sampler_coupling), np.asarray(cp), atol=1e-7
        )

    check(t.state)
    t.step(t.images[:16], epoch=0)  # scheduled GRBM step (opt_step 0)
    check(t.state)
    t.step(t.images[:16], epoch=0)  # unscheduled
    check(t.state)


def test_persistent_chains_carry_state():
    t = Trainer(config=tiny_config())
    t.train_init(n_epochs=1)
    c0 = np.asarray(t.state.chains).copy()
    t.step(t.images[:16], epoch=0)
    c1 = np.asarray(t.state.chains)
    assert c0.shape == c1.shape == (64, t.plan.n_pad)
    assert t.plan.n_pad % 128 == 0
    assert not np.array_equal(c0, c1)  # chains advanced
    assert set(np.unique(c1)) <= {-1.0, 1.0}


@pytest.mark.slow
def test_max_slider_latents_512():
    """The reference UI slider tops out at 512 latents (demo_configs.py):
    the architecture must scale there (encoder output channels, decoder
    unflatten, GRBM subgraph)."""
    t = Trainer(config=tiny_config(N_LATENTS=512, NUM_READS=32, QPU="Advantage2_prototype"))
    t.train_init(n_epochs=1)
    assert t.graph.n == 512
    mse = t.step(t.images[:16], epoch=0)
    assert np.isfinite(mse)
    gen = t.generate_output(num_reads=8)
    assert gen["images"].shape == (8, 32, 32, 1)


def test_cd_mode_restarts_chains():
    """PERSISTENT_CHAINS=False: fresh CD restarts, not carried PCD state."""
    t = Trainer(config=tiny_config(PERSISTENT_CHAINS=False, GIBBS_SWEEPS=1))
    t.train_init(n_epochs=1)
    mse = t.step(t.images[:16], epoch=0)
    assert np.isfinite(mse)
    # with 1 sweep from a fresh random start, chains should be near 50/50
    # (a persistent chain equilibrated by burn-in would be biased)
    c = np.asarray(t.state.chains)
    assert abs(c.mean()) < 0.2


def test_checkpoint_roundtrip(tmp_path, trained):
    out = trained.save(tmp_path / "m1", n_epochs=2)
    assert (out / "dvae.pth").exists()
    assert (out / "grbm.pth").exists()

    t2 = Trainer(config=tiny_config())
    t2.load(out)
    np.testing.assert_array_equal(
        np.asarray(t2.state.grbm_params.linear), np.asarray(trained.state.grbm_params.linear)
    )
    a = trained.state.dvae_params["encoder"]["conv_0"]["kernel"]
    b = t2.state.dvae_params["encoder"]["conv_0"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert t2.graph.n_edges == trained.graph.n_edges
    # parameters.json parity keys (incl. the reference's misspelling)
    import json

    params = json.loads((out / "parameters.json").read_text())
    assert params["n_latents"] == 32
    assert "dateset_size" in params
    assert params["num_read"] == 64


def test_generation_surfaces(trained):
    gen = trained.generate_output(do_sharpen=True, num_reads=32)
    assert gen["images"].shape == (32, 32, 32, 1)
    assert gen["latents"].shape == (32, 32)
    assert gen["grid"].ndim == 3
    assert gen["images"].min() >= 0.0 and gen["images"].max() <= 1.0

    rec = trained.generate_reconstructed_samples()
    assert rec["images"].shape[0] == 2 * 16  # originals interleaved with recons
    # white separator column present on reconstructions (odd indices)
    assert np.allclose(rec["images"][1::2, :, -1, :], 1.0)

    plot = trained.generate_loss_plot()
    assert len(plot["mse_losses"]) == len(trained.losses["mse_losses"])
    old = {"mse_losses": [9.9], "dvae_losses": [9.9]}
    plot2 = trained.generate_loss_plot(old_loss_data=old)
    assert plot2["mse_losses"][0] == 9.9


def test_tune_mode_keeps_weights(tmp_path, trained):
    out = trained.save(tmp_path / "m2", n_epochs=2)
    t2 = Trainer(config=tiny_config())
    t2.load(out)
    w_loaded = np.asarray(t2.state.dvae_params["encoder"]["conv_0"]["kernel"]).copy()
    t2.train_init(n_epochs=1)  # tune: keeps weights, fresh optimizers
    w_after_init = np.asarray(t2.state.dvae_params["encoder"]["conv_0"]["kernel"])
    np.testing.assert_array_equal(w_loaded, w_after_init)
    t2.train(1)
    w_tuned = np.asarray(t2.state.dvae_params["encoder"]["conv_0"]["kernel"])
    assert not np.array_equal(w_loaded, w_tuned)


def test_epoch_donates_carried_state():
    """epoch() donates its state (step.py): the input buffers are dead after
    the call — pinning the contract that callers must rebind, and that the
    scaled config's ~1.6 GB state is not double-buffered across the call."""
    from image_generation_tpu.models.grbm import GRBMGraph
    from image_generation_tpu.training.step import make_train_fns
    from image_generation_tpu.utils.subgraph import select_latent_graph
    from image_generation_tpu.utils.topology import zephyr_graph

    cfg = tiny_config()
    latent, _ = select_latent_graph(zephyr_graph(2), cfg.N_LATENTS, cfg.RANDOM_SEED)
    fns = make_train_fns(cfg, GRBMGraph.from_networkx(latent), total_steps=2)
    images = jnp.zeros((2, cfg.BATCH_SIZE, 32, 32, 1))
    state = fns.init(jax.random.PRNGKey(0), images[0, :1])
    new_state, _ = fns.epoch(state, images, jnp.asarray(0))
    assert jax.tree.leaves(state.dvae_params)[0].is_deleted()
    # step() does NOT donate (debug/API surface): inputs stay alive
    s2, _ = fns.step(new_state, images[0], jnp.asarray(0))
    assert not jax.tree.leaves(new_state.dvae_params)[0].is_deleted()
