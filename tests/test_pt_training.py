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
