"""Native exact-resume checkpoints + latent-mode variants (gumbel/heaviside)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_generation_tpu.config import TrainingConfig
from image_generation_tpu.models.dvae import gumbel_spins
from image_generation_tpu.training.trainer import Trainer


def cfg(**kw):
    base = dict(
        N_LATENTS=32,
        NUM_READS=32,
        BATCH_SIZE=16,
        DATASET_SIZE=64,
        N_REPLICAS=2,
        GIBBS_SWEEPS=2,
        GIBBS_BURN_IN=4,
        QPU="Advantage2_prototype",
    )
    base.update(kw)
    return TrainingConfig(**base)


def test_native_resume_is_exact(tmp_path):
    # run 2 epochs with a per-epoch native checkpoint
    t1 = Trainer(config=cfg())
    t1.train_init(n_epochs=2)
    t1.train(2, checkpoint_dir=tmp_path / "ckpt")

    # restore the mid-run (epoch-1) checkpoint: step counter must come back
    t2 = Trainer(config=cfg())
    t2.train_init(n_epochs=2)
    from image_generation_tpu.io.native_ckpt import restore_train_state

    t2.state = restore_train_state(tmp_path / "ckpt", t2.state, step=4)  # after epoch 1
    assert int(t2.state.opt_step) == 4

    # full-state restore fidelity via a save/restore round-trip of the
    # finished run (params, chains, RNG, Adam moments, loss history)
    t1.save_native(tmp_path / "ckpt2")
    t3 = Trainer(config=cfg())
    t3.train_init(n_epochs=2)
    step = t3.resume_native(tmp_path / "ckpt2", n_epochs=2)
    assert step == int(t1.state.opt_step)
    np.testing.assert_array_equal(
        np.asarray(t3.state.grbm_params.linear), np.asarray(t1.state.grbm_params.linear)
    )
    np.testing.assert_array_equal(np.asarray(t3.state.chains), np.asarray(t1.state.chains))
    np.testing.assert_array_equal(np.asarray(t3.state.rng), np.asarray(t1.state.rng))
    a = np.asarray(t1.state.dvae_opt[1].mu["encoder"]["conv_0"]["kernel"])
    b = np.asarray(t3.state.dvae_opt[1].mu["encoder"]["conv_0"]["kernel"])
    np.testing.assert_array_equal(a, b)  # Adam moments restored
    assert t3.losses["mse_losses"] == t1.losses["mse_losses"]


def test_native_ckpt_excludes_derived_sampler_cache(tmp_path):
    """Checkpoint bytes must be ∝ params+opt+chains: the derived
    (sampler_h, sampler_coupling) cache — the state's biggest buffer — is
    stripped at save and rebuilt bit-exactly on restore (VERDICT r2 item 2;
    reference contrast: weights-only save, src/model_wrapper.py:148-162)."""
    from image_generation_tpu.io.native_ckpt import (
        restore_train_state,
        save_train_state,
    )

    t = Trainer(config=cfg(SAMPLER="pt", PT_NUM_BETAS=4))
    t.train_init(n_epochs=1)
    t.train_epoch(0)
    state = t.state

    p_slim = save_train_state(tmp_path / "slim", state)
    # structural check (on-disk byte counts are compression-dependent): the
    # serialized tree must carry NO array for the derived cache while every
    # non-derivable leaf is present
    import orbax.checkpoint as ocp

    raw = ocp.PyTreeCheckpointer().restore(p_slim)
    assert raw["sampler_coupling"] is None and raw["sampler_h"] is None
    for key in ("chains", "chain_energies", "dvae_params", "dvae_opt",
                "grbm_params", "grbm_opt", "rng", "opt_step"):
        assert raw[key] is not None, f"non-derivable leaf {key} missing"

    # restore rebuilds the cache bit-exactly and the resumed step matches
    t2 = Trainer(config=cfg(SAMPLER="pt", PT_NUM_BETAS=4))
    t2.train_init(n_epochs=1)
    r = restore_train_state(
        tmp_path / "slim", t2.state, rebuild_cache=t2.fns.rebuild_cache
    )
    np.testing.assert_array_equal(
        np.asarray(r.sampler_h), np.asarray(state.sampler_h)
    )
    np.testing.assert_array_equal(
        np.asarray(r.sampler_coupling).astype(np.float32),
        np.asarray(state.sampler_coupling).astype(np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(r.chain_energies), np.asarray(state.chain_energies)
    )


def test_native_resume_shardings_on_mesh(tmp_path):
    """Resume on the 8-device mesh: the restored state must carry the same
    shardings as a fresh run (chains over the mesh, params replicated) and
    produce an identical next epoch (VERDICT r2 item 2a)."""
    from jax.sharding import PartitionSpec as P

    t1 = Trainer(config=cfg())  # mesh="auto" → the 8-device CPU mesh
    assert t1.mesh is not None
    t1.train_init(n_epochs=2)
    t1.train(2, checkpoint_dir=tmp_path / "ck")

    t2 = Trainer(config=cfg())
    t2.train_init(n_epochs=2)
    t2.resume_native(tmp_path / "ck", n_epochs=2)
    assert t2.state.chains.sharding.spec == P(("data", "chain"))
    assert t2.state.sampler_coupling.sharding.spec == P()  # replicated
    assert t2.state.opt_step == t1.state.opt_step
    np.testing.assert_array_equal(
        np.asarray(t2.state.chains), np.asarray(t1.state.chains)
    )
    np.testing.assert_array_equal(
        np.asarray(t2.state.sampler_coupling), np.asarray(t1.state.sampler_coupling)
    )


def test_graph_sharded_native_resume(tmp_path):
    """Graph-sharded save/resume: the restored coupling must come back
    P('chain', None)-row-sharded — rebuilt under the jitted sharding
    constraint, never materialized whole (VERDICT r2 item 2b)."""
    from jax.sharding import PartitionSpec as P

    from image_generation_tpu.parallel.mesh import create_mesh

    gs_cfg = cfg(GRAPH_SHARDED="on", SAMPLER="pt", PT_NUM_BETAS=4)
    t1 = Trainer(config=gs_cfg, mesh=create_mesh(8))
    t1.train_init(n_epochs=1)
    assert t1.fns.graph_sharded
    t1.train_epoch(0)
    t1.save_native(tmp_path / "gs")

    t2 = Trainer(config=gs_cfg, mesh=create_mesh(8))
    t2.train_init(n_epochs=1)
    t2.resume_native(tmp_path / "gs", n_epochs=1)
    assert t2.state.sampler_coupling.sharding.spec in (P("chain"), P("chain", None))
    assert t2.state.chains.sharding.spec == P("data", None, "chain")
    np.testing.assert_array_equal(
        np.asarray(t2.state.chains), np.asarray(t1.state.chains)
    )
    np.testing.assert_array_equal(
        np.asarray(t2.state.sampler_coupling).astype(np.float32),
        np.asarray(t1.state.sampler_coupling).astype(np.float32),
    )
    # and the resumed trainer can keep training
    stats = t2.train_epoch(0)
    assert np.isfinite(stats["mse"])


def test_restore_schema_mismatch_is_a_clear_error(tmp_path):
    """A checkpoint whose TrainState schema doesn't match the restoring
    config (different SAMPLER mode here; older builds in general) must
    surface one clear ValueError — not a misleading partial restore."""
    from image_generation_tpu.io.native_ckpt import (
        restore_train_state,
        save_train_state,
    )

    t_pt = Trainer(config=cfg(SAMPLER="pt", PT_NUM_BETAS=4))
    t_pt.train_init(n_epochs=1)
    save_train_state(tmp_path / "pt_ck", t_pt.state)

    t_gibbs = Trainer(config=cfg())  # non-PT: (0,) chain_energies placeholder
    t_gibbs.train_init(n_epochs=1)
    with pytest.raises(ValueError, match="TrainState schema"):
        restore_train_state(tmp_path / "pt_ck", t_gibbs.state)


def test_cross_topology_restore(tmp_path):
    """A checkpoint saved under one device topology restores under another:
    every leaf lands with the TEMPLATE's (current-process) sharding — the
    file's recorded device list is never consulted (production shape:
    save on a training pod, restore on one serving chip)."""
    from jax.sharding import PartitionSpec as P

    # save from a mesh run
    t1 = Trainer(config=cfg())  # mesh="auto" → the 8-device CPU mesh
    assert t1.mesh is not None
    t1.train_init(n_epochs=1)
    t1.train_epoch(0)
    t1.save_native(tmp_path / "mesh_ck")

    # restore into a single-device trainer: no mesh, no sharded leaves
    t2 = Trainer(config=cfg(), mesh=None)
    assert t2.mesh is None
    t2.train_init(n_epochs=1)
    t2.resume_native(tmp_path / "mesh_ck", n_epochs=1)
    assert len(t2.state.chains.sharding.device_set) == 1
    np.testing.assert_array_equal(
        np.asarray(t2.state.chains), np.asarray(t1.state.chains)
    )
    stats = t2.train_epoch(0)  # and it can keep training single-device
    assert np.isfinite(stats["mse"])

    # the reverse: single-device save → mesh restore (leaves re-sharded)
    t2b = Trainer(config=cfg(), mesh=None)
    t2b.train_init(n_epochs=1)
    t2b.train_epoch(0)
    t2b.save_native(tmp_path / "single_ck")
    t3 = Trainer(config=cfg())
    t3.train_init(n_epochs=1)
    t3.resume_native(tmp_path / "single_ck", n_epochs=1)
    assert t3.state.chains.sharding.spec == P(("data", "chain"))
    np.testing.assert_array_equal(
        np.asarray(t3.state.chains), np.asarray(t2b.state.chains)
    )


def test_gumbel_mode_trains():
    t = Trainer(config=cfg(LATENT_TO_DISCRETE="gumbel", GUMBEL_TAU=0.7))
    t.train_init(n_epochs=1)
    t.train_epoch(0)
    assert np.isfinite(t.losses["mse_losses"]).all()


def test_gumbel_spins_properties():
    logits = jnp.asarray(np.random.RandomState(0).randn(8, 16).astype(np.float32))
    s = gumbel_spins(logits, 64, jax.random.PRNGKey(0), tau=1.0)
    assert s.shape == (8, 64, 16)
    # relaxed: values inside [−1, 1] and not saturated to exactly ±1 everywhere
    assert float(jnp.max(jnp.abs(s))) <= 1.0
    assert float(jnp.mean(jnp.abs(s) < 0.99)) > 0.2
    # low temperature → near-hard samples with p(+1) ≈ σ(2ℓ)
    s_cold = gumbel_spins(jnp.full((1, 256), 0.5), 64, jax.random.PRNGKey(1), tau=0.05)
    p_emp = float(jnp.mean(s_cold > 0))
    assert abs(p_emp - float(jax.nn.sigmoid(1.0))) < 0.03
    # fully reparameterized: nonzero gradient, no stop-gradient plateau
    g = jax.grad(lambda l: jnp.sum(gumbel_spins(l, 4, jax.random.PRNGKey(2))))(logits)
    assert float(jnp.linalg.norm(g)) > 0


def test_heaviside_mode_end_to_end():
    t = Trainer(config=cfg(LATENT_TO_DISCRETE="heaviside", N_REPLICAS=1))
    t.train_init(n_epochs=1)
    t.train_epoch(0)
    assert np.isfinite(t.losses["mse_losses"]).all()


def test_heaviside_requires_single_replica():
    t = Trainer(config=cfg(LATENT_TO_DISCRETE="heaviside", N_REPLICAS=2))
    with pytest.raises(ValueError):
        t.train_init(n_epochs=1)


def test_resume_continues_at_the_right_epoch(tmp_path):
    """train() after resume_native must continue at the epoch the run died
    in — NOT restart at 0, which would re-fire the epoch-indexed reference
    schedule (train_grbm = epoch < 6) on a model whose GRBM had moved past
    it (training/trainer.py train start_epoch derivation)."""
    t = Trainer(config=cfg())
    t.train_init(3)
    t.train_epoch(0)
    t.save_native(tmp_path / "ck")

    t2 = Trainer(config=cfg())
    step = t2.resume_native(tmp_path / "ck", n_epochs=3)
    assert step == t2.n_batches  # one epoch's optimizer steps restored
    ran = []
    t2.train(3, epoch_cb=lambda e, stats: ran.append(e))
    assert ran == [1, 2]  # epoch 0 is NOT re-run
    # the resume hint is consumed ONCE: a second train() on the now-finished
    # trainer is a fresh request and must re-run from 0, not silently start
    # at the restored epoch again (2-of-3-epoch partial run)
    ran_again = []
    t2.train(3, epoch_cb=lambda e, stats: ran_again.append(e))
    assert ran_again == [0, 1, 2]
    # explicit override still honored
    ran2 = []
    t3 = Trainer(config=cfg())
    t3.resume_native(tmp_path / "ck", n_epochs=3)
    t3.train(3, epoch_cb=lambda e, stats: ran2.append(e), start_epoch=2)
    assert ran2 == [2]


def test_second_train_call_reruns():
    """train() twice on the SAME (non-resumed) trainer must re-run the
    epochs — the resume derivation is recorded at resume_native time, never
    taken from the live opt_step (which would silently no-op the second
    call, a workflow regression)."""
    t = Trainer(config=cfg())
    ran = []
    t.train(1, epoch_cb=lambda e, stats: ran.append(e))
    t.train(1, epoch_cb=lambda e, stats: ran.append(e))
    assert ran == [0, 0]


def test_resume_native_rebuilds_for_new_epoch_budget(tmp_path):
    """resume_native on a trainer already initialized for a DIFFERENT
    n_epochs must rebuild the step functions: the LR schedules bake in
    total_steps, so reusing them would silently train at the clipped final
    LR (training/trainer.py resume_native guard)."""
    t = Trainer(config=cfg())
    t.train_init(1)
    t.train_epoch(0)
    t.save_native(tmp_path / "ck2")

    t2 = Trainer(config=cfg())
    t2.train_init(1)  # pre-initialized for the WRONG budget
    t2.resume_native(tmp_path / "ck2", n_epochs=4)
    assert t2._n_epochs == 4
    # the rebuilt schedule differs from the 1-epoch one past its horizon
    lr_mid = float(t2.fns.dvae_lr(2 * t2.n_batches))
    lr_end = float(t2.fns.dvae_lr(4 * t2.n_batches - 1))
    assert lr_mid > lr_end
