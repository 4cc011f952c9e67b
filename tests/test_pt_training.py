"""Parallel-tempering training mode (SAMPLER="pt") — the scaled-GRBM path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_generation_tpu.config import TrainingConfig
from image_generation_tpu.training.trainer import Trainer


def pt_config(**kw):
    base = dict(
        N_LATENTS=32,
        NUM_READS=32,
        BATCH_SIZE=16,
        DATASET_SIZE=64,
        N_REPLICAS=2,
        GIBBS_SWEEPS=2,
        GIBBS_BURN_IN=4,
        SAMPLER="pt",
        PT_NUM_BETAS=4,
        PT_BETA_MIN=0.3,
        QPU="Advantage2_prototype",
    )
    base.update(kw)
    return TrainingConfig(**base)


def test_pt_training_runs_and_learns():
    t = Trainer(config=pt_config())
    t.train_init(n_epochs=1)
    # ladder-shaped persistent state
    assert t.state.chains.shape == (4, 32, t.plan.n_pad)
    t.train_init(n_epochs=2)
    t.train(2)
    assert np.isfinite(t.losses["mse_losses"]).all()
    mses = t.losses["mse_losses"]
    assert np.mean(mses[len(mses) // 2 :]) < np.mean(mses[: len(mses) // 2])
    # ladder survives the epoch and stays ±1
    c = np.asarray(t.state.chains)
    assert c.shape == (4, 32, t.plan.n_pad)
    assert set(np.unique(c)) <= {-1.0, 1.0}


def test_pt_generation_and_checkpoint(tmp_path):
    t = Trainer(config=pt_config())
    t.train_init(n_epochs=1)
    t.train_epoch(0)
    gen = t.generate_output(num_reads=16)
    assert gen["images"].shape == (16, 32, 32, 1)
    out = t.save(tmp_path / "pt_model", n_epochs=1)
    t2 = Trainer(config=pt_config())
    t2.load(out)
    np.testing.assert_array_equal(
        np.asarray(t2.state.grbm_params.linear), np.asarray(t.state.grbm_params.linear)
    )


def test_full_fabric_latent_selection():
    """n_latents == full graph size: the scaled-GRBM configuration."""
    from image_generation_tpu.utils.subgraph import select_latent_graph
    from image_generation_tpu.utils.topology import zephyr_graph

    g = zephyr_graph(2)
    latent, mapping = select_latent_graph(g, g.number_of_nodes(), 0)
    assert latent.number_of_nodes() == g.number_of_nodes()
    assert latent.number_of_edges() == g.number_of_edges()


def test_pt_round_accept_metric():
    """return_accept: the analytic per-pair acceptance — identical betas
    accept everything (exp(0)=1), and each pair is reported exactly once
    across the even/odd passes."""
    from image_generation_tpu.models.grbm import GRBMGraph
    from image_generation_tpu.ops.gibbs import (
        build_plan, ising_energies, permuted_model, pt_round, random_spins,
    )
    from image_generation_tpu.utils.subgraph import select_latent_graph
    from image_generation_tpu.utils.topology import chimera_graph

    g, _ = select_latent_graph(chimera_graph(2, 2, 3), 12, 11)
    graph = GRBMGraph.from_networkx(g)
    rng = np.random.RandomState(1)
    h = jnp.asarray(rng.uniform(-0.3, 0.3, graph.n).astype(np.float32))
    j = jnp.asarray(rng.uniform(-0.5, 0.5, graph.n_edges).astype(np.float32))
    plan = build_plan(graph, pad_to=8)
    hp, cp = permuted_model(plan, h, j)
    ladder = random_spins(jax.random.PRNGKey(0), plan, 5 * 16).reshape(
        5, 16, plan.n_pad
    )
    e0 = ising_energies(hp, cp, ladder)
    _, _, acc = pt_round(
        jax.random.PRNGKey(1), hp, cp, plan, ladder,
        jnp.ones(5), 2, energies=e0, return_accept=True,
    )
    np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-6)
    # a real ascending ladder: acceptances are probabilities, one per pair
    _, _, acc2 = pt_round(
        jax.random.PRNGKey(2), hp, cp, plan, ladder,
        jnp.geomspace(0.2, 1.0, 5), 2, energies=e0, return_accept=True,
    )
    a2 = np.asarray(acc2)
    assert a2.shape == (4,) and np.all((a2 > 0) & (a2 <= 1.0 + 1e-6))


def test_pt_adapt_moves_the_ladder_and_resumes(tmp_path):
    """PT_ADAPT="epoch": the live ladder re-spaces after every epoch with
    endpoints pinned and order preserved, metrics expose acceptance, the
    sampler backend syncs to the live ladder, and native checkpoints carry
    the ADAPTED rungs (no longer derivable from the config)."""
    t = Trainer(config=pt_config(PT_ADAPT="epoch", PT_NUM_BETAS=6))
    t.train_init(n_epochs=2)
    b0 = np.asarray(t.state.pt_betas)
    np.testing.assert_allclose(b0, np.geomspace(0.3, 1.0, 6), rtol=1e-6)
    stats = t.train_epoch(0)
    assert 0.0 < stats["pt_accept_min"] <= 1.0
    assert len(stats["pt_betas"]) == 6
    b1 = np.asarray(t.state.pt_betas)
    assert not np.allclose(b0, b1)
    assert b1[0] == b0[0] and b1[-1] == b0[-1] and np.all(np.diff(b1) > 0)
    # generation backend samples with the live ladder
    t.sample_sampleset(8)
    np.testing.assert_allclose(
        np.asarray(t._backend.backend.betas), b1, rtol=1e-6
    )
    # native checkpoint carries the adapted ladder bit-exactly
    t.save_native(tmp_path / "ck")
    t2 = Trainer(config=pt_config(PT_ADAPT="epoch", PT_NUM_BETAS=6))
    t2.resume_native(tmp_path / "ck", n_epochs=2)
    np.testing.assert_array_equal(np.asarray(t2.state.pt_betas), b1)
    # adaptation continues after resume
    t2.train_epoch(1)
    assert np.all(np.diff(np.asarray(t2.state.pt_betas)) > 0)


def test_sample_spins_uses_live_ladder():
    """Trainer.sample_spins (the raw face of grbm.sample) must pass the
    LIVE ``state.pt_betas`` — not the config's geomspace — once PT_ADAPT
    has re-spaced the ladder."""
    t = Trainer(config=pt_config(PT_ADAPT="epoch", PT_NUM_BETAS=6))
    t.train_init(n_epochs=1)
    t.train_epoch(0)
    live = np.asarray(t.state.pt_betas)
    assert not np.allclose(live, np.geomspace(0.3, 1.0, 6))

    seen = {}
    real = t.fns.sample

    def spy(key, params, num_reads, n_sweeps, betas=None):
        seen["betas"] = betas
        return real(key, params, num_reads, n_sweeps, betas=betas)

    t.fns.sample = spy
    spins = t.sample_spins(8)
    assert spins.shape == (8, t.config.N_LATENTS)
    np.testing.assert_array_equal(np.asarray(seen["betas"]), live)


def test_non_pt_metrics_have_empty_accept():
    """Gibbs mode: pt_accept/pt_betas are zero-width placeholders and the
    epoch stats carry no ladder keys."""
    t = Trainer(config=pt_config(SAMPLER="gibbs", PT_ADAPT="off"))
    t.train_init(n_epochs=1)
    assert t.state.pt_betas.size == 0
    stats = t.train_epoch(0)
    assert "pt_accept_min" not in stats and "pt_betas" not in stats


def test_sample_after_donated_epochs():
    """Donation hazard regression: epoch() donates the state; the initial
    state's pt_betas must be a COPY of the module's default ladder, or the
    donation deletes the buffer sample_fn's default still references
    (observed as 'Array has been deleted' on the first post-training
    generation)."""
    from image_generation_tpu.models.grbm import GRBMGraph
    from image_generation_tpu.training.step import make_train_fns
    from image_generation_tpu.utils.data import permuted_epoch
    from image_generation_tpu.utils.subgraph import select_latent_graph
    from image_generation_tpu.utils.topology import zephyr_graph

    cfg = pt_config(USE_PALLAS="off")
    g, _ = select_latent_graph(zephyr_graph(3), cfg.N_LATENTS, 7)
    fns = make_train_fns(cfg, GRBMGraph.from_networkx(g), total_steps=8)
    key = jax.random.PRNGKey(0)
    dataset = jnp.round(jax.random.uniform(key, (32, 32, 32, 1))).astype(jnp.float32)
    state = fns.init(key, dataset[:1])
    state, _ = fns.epoch(state, permuted_epoch(dataset, 16, key), jnp.asarray(0))
    # default-ladder generation AFTER a donating epoch call must not crash
    assert fns.sample(key, state.grbm_params, 8, 4).shape == (8, cfg.N_LATENTS)
