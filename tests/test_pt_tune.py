"""Feedback-optimized PT ladders (ops/pt_tune.py) + PT_BETAS config hook."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_generation_tpu.config import TrainingConfig
from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.ops.gibbs import build_plan, permuted_model
from image_generation_tpu.ops.pt_tune import swap_acceptance, tune_pt_betas
from image_generation_tpu.utils.subgraph import select_latent_graph
from image_generation_tpu.utils.topology import chimera_graph


@pytest.fixture(scope="module")
def glass():
    """Frustrated ±J spin glass — rough landscape so the geomspace ladder's
    acceptance is visibly non-uniform."""
    g, _ = select_latent_graph(chimera_graph(2, 2, 4), 24, 23)
    graph = GRBMGraph.from_networkx(g)
    rng = np.random.RandomState(7)
    h = jnp.zeros(graph.n, jnp.float32)
    j = jnp.asarray(rng.choice([-1.2, 1.2], graph.n_edges).astype(np.float32))
    plan = build_plan(graph, pad_to=8)
    hp, cp = permuted_model(plan, h, j)
    return plan, hp, cp


def test_tuner_equalizes_acceptance(glass):
    plan, hp, cp = glass
    betas0 = np.geomspace(0.1, 1.0, 8)
    tuned, diag0, diag1 = tune_pt_betas(
        jax.random.PRNGKey(0), hp, cp, plan, betas0,
        n_iters=3, n_chains=256, n_rounds=24,
    )
    # endpoints pinned, strictly ascending
    assert tuned[0] == betas0[0] and tuned[-1] == betas0[-1]
    assert np.all(np.diff(tuned) > 0)
    # acceptance spread shrinks and the worst pair improves
    assert np.std(diag1.accept) < np.std(diag0.accept)
    assert diag1.accept.min() > diag0.accept.min()


def test_acceptance_estimator_sane(glass):
    plan, hp, cp = glass
    diag = swap_acceptance(
        jax.random.PRNGKey(1), hp, cp, plan, np.geomspace(0.2, 1.0, 6),
        n_chains=128, n_rounds=12,
    )
    assert diag.accept.shape == (5,)
    assert np.all((diag.accept > 0) & (diag.accept <= 1.0))
    # a degenerate two-rung ladder at identical betas accepts everything
    same = swap_acceptance(
        jax.random.PRNGKey(2), hp, cp, plan, np.array([1.0, 1.0]),
        n_chains=64, n_rounds=4,
    )
    np.testing.assert_allclose(same.accept, 1.0, atol=1e-6)


def test_acceptance_measurer_block_sparse_matches_dense(glass):
    """``tune-pt`` packs the coupling whenever the training step will
    (single-source policy, TrainingConfig.resolved_block_sparse) — the
    measurement on the packed model must match the dense one (packing is a
    pure re-layout; the only difference is f32 summation order across the
    per-chunk matmuls, invisible at acceptance level — exact-equality
    coverage with integer couplings lives in tests/test_block_sparse.py)."""
    from image_generation_tpu.ops.block_sparse import pack_coupling

    plan, hp, cp = glass
    betas = np.geomspace(0.15, 1.0, 5)
    dense = swap_acceptance(
        jax.random.PRNGKey(5), hp, cp, plan, betas, n_chains=64, n_rounds=8
    )
    packed = swap_acceptance(
        jax.random.PRNGKey(5), hp, pack_coupling(plan, cp, chunk=8), plan,
        betas, n_chains=64, n_rounds=8,
    )
    np.testing.assert_allclose(dense.accept, packed.accept, rtol=1e-6)


def test_acceptance_measurer_graph_sharded(glass):
    """Beyond-HBM tuning: the measurer routed through the graph-sharded
    sweep + reduce_scatter energies (the ``tune-pt`` path for
    GRAPH_SHARDED models) measures the same ladder physics as the dense
    layout — statistically (the sharded sweep is a different but equally
    valid Gibbs chain: distinct RNG stream) and exactly on a degenerate
    equal-β ladder."""
    from image_generation_tpu.ops.gibbs_graph_sharded import (
        gibbs_sweeps_graph_sharded,
        ising_energies_graph_sharded,
    )
    from image_generation_tpu.parallel.mesh import create_mesh

    plan, hp, cp = glass
    mesh = create_mesh(8)  # (data=4, chain=2)

    def sweeps_fn(k, h_, c_, p_, s_, n_, beta=1.0, track_delta_e=False):
        return gibbs_sweeps_graph_sharded(
            k, h_, c_, p_, s_, n_, mesh, beta, track_delta_e=track_delta_e
        )

    def energies_fn(h_, c_, s_):
        return ising_energies_graph_sharded(h_, c_, s_, mesh)

    betas = np.geomspace(0.15, 1.0, 5)
    dense = swap_acceptance(
        jax.random.PRNGKey(7), hp, cp, plan, betas, n_chains=256, n_rounds=12
    )
    sharded = swap_acceptance(
        jax.random.PRNGKey(7), hp, cp, plan, betas, n_chains=256, n_rounds=12,
        sweeps_fn=sweeps_fn, energies_fn=energies_fn,
    )
    np.testing.assert_allclose(sharded.accept, dense.accept, atol=0.06)
    same = swap_acceptance(
        jax.random.PRNGKey(8), hp, cp, plan, np.array([1.0, 1.0]),
        n_chains=64, n_rounds=4, sweeps_fn=sweeps_fn, energies_fn=energies_fn,
    )
    np.testing.assert_allclose(same.accept, 1.0, atol=1e-6)
    # flow diagnostics ride the same overrides: free shuttling across the
    # degenerate ladder through the sharded layout
    from image_generation_tpu.ops.pt_tune import round_trip_count

    trips, cover = round_trip_count(
        jax.random.PRNGKey(9), hp, cp, plan, np.array([1.0, 1.0]),
        n_chains=16, n_rounds=30, sweeps_fn=sweeps_fn,
        energies_fn=energies_fn,
    )
    assert cover == 1.0 and trips > 50


def test_resolved_block_sparse_single_source(glass):
    """The config-level policy the CLI consults must agree with what
    make_train_fns resolves (before its impl-specific vetoes)."""
    plan, _hp, _cp = glass
    assert TrainingConfig(SWEEP_BLOCK_SPARSE="on").resolved_block_sparse(plan)
    assert not TrainingConfig(
        SWEEP_BLOCK_SPARSE="off"
    ).resolved_block_sparse(plan)
    # auto: this toy plan is far below the n_pad >= 2048 gate
    assert not TrainingConfig(
        SWEEP_BLOCK_SPARSE="auto"
    ).resolved_block_sparse(plan)


def test_config_pt_betas_override():
    cfg = TrainingConfig(SAMPLER="pt", PT_BETAS=[0.3, 0.6, 1.0])
    assert cfg.PT_NUM_BETAS == 3 and cfg.PT_BETAS == (0.3, 0.6, 1.0)
    # yaml round-trip keeps the ladder
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".yaml", delete=False) as f:
        cfg.to_yaml(f.name)
        cfg2 = TrainingConfig.from_yaml(f.name)
    assert cfg2.PT_BETAS == cfg.PT_BETAS and cfg2.PT_NUM_BETAS == 3

    with pytest.raises(ValueError, match="PT_BETAS"):
        TrainingConfig(PT_BETAS=[0.6, 0.3, 1.0])  # not ascending
    with pytest.raises(ValueError, match="PT_BETAS"):
        TrainingConfig(PT_BETAS=[0.3, 0.9])  # doesn't end at 1.0


def test_pt_betas_reach_the_sampler():
    """A tuned ladder must actually shape the training ladder: chains get
    PT_NUM_BETAS=len(PT_BETAS) rows and training runs end-to-end."""
    from image_generation_tpu.training.trainer import Trainer

    cfg = TrainingConfig(
        N_LATENTS=32, NUM_READS=16, BATCH_SIZE=16, DATASET_SIZE=32,
        N_REPLICAS=2, GIBBS_SWEEPS=2, GIBBS_BURN_IN=4,
        QPU="Advantage2_prototype", SAMPLER="pt",
        PT_BETAS=[0.25, 0.45, 0.7, 1.0], USE_PALLAS="off",
    )
    t = Trainer(config=cfg)
    t.train_init(n_epochs=1)
    assert t.state.chains.shape[0] == 4
    t.train(1)
    assert np.isfinite(t.losses["dvae_losses"]).all()


def test_recommend_num_betas_sizing_rule():
    """Equal-barrier rung sizing: T = ceil(Λ/(1−target)) + 1, clipped."""
    from image_generation_tpu.ops.pt_tune import recommend_num_betas

    # a fully-accepting ladder has zero barrier → the minimum rung count
    assert recommend_num_betas(np.ones(31)) == 2
    # Λ = 31·0.5 = 15.5 at target 0.5 → ceil(31)+1 = 32 (a ladder sitting
    # exactly at its target acceptance keeps its size — self-consistency)
    assert recommend_num_betas(np.full(31, 0.5)) == 32
    # Λ = 7·0.9 = 6.3 at default target → ceil(12.6)+1 = 14
    assert recommend_num_betas(np.full(7, 0.1)) == 14
    # caps honored
    assert recommend_num_betas(np.zeros(200), t_max=64) == 64
    assert recommend_num_betas(np.ones(3), t_min=4) == 4


def test_size_ladder_mild_vs_glass(glass):
    """The auto-sizer picks few rungs for a mild model and more for a
    frustrated glass (the VERDICT item-6 contract); ladders are strictly
    ascending and end at exactly 1.0."""
    from image_generation_tpu.ops.pt_tune import size_ladder

    plan, hp, cp = glass
    kw = dict(
        beta_min=0.25, t_probe=8, n_chains=64, n_rounds=12, burn_rounds=4
    )
    betas_g, diag_g = size_ladder(jax.random.PRNGKey(11), hp, cp, plan, **kw)
    # mild model: the same graph with 20×-weaker couplings
    betas_m, diag_m = size_ladder(
        jax.random.PRNGKey(11), hp, cp * 0.05, plan, **kw
    )
    assert len(betas_m) <= 8, f"mild model over-provisioned: {len(betas_m)}"
    assert len(betas_g) > len(betas_m)
    assert diag_g.barrier > diag_m.barrier
    for b in (betas_g, betas_m):
        assert np.all(np.diff(b) > 0)
        assert b[-1] == 1.0 and b[0] == 0.25


def test_config_pt_num_betas_auto():
    """PT_NUM_BETAS accepts 'auto' (resolved by the Trainer), rejects other
    strings / sub-2 counts, defers to an explicit PT_BETAS ladder, and
    refuses to build a ladder before resolution."""
    cfg = TrainingConfig(SAMPLER="pt", PT_NUM_BETAS="auto")
    assert cfg.PT_NUM_BETAS == "auto"
    with pytest.raises(RuntimeError, match="auto"):
        cfg.initial_pt_betas()
    # explicit ladder wins: auto is resolved away by __post_init__
    cfg2 = TrainingConfig(
        SAMPLER="pt", PT_NUM_BETAS="auto", PT_BETAS=[0.3, 0.6, 1.0]
    )
    assert cfg2.PT_NUM_BETAS == 3
    with pytest.raises(ValueError, match="PT_NUM_BETAS"):
        TrainingConfig(PT_NUM_BETAS="automatic")
    with pytest.raises(ValueError, match="PT_NUM_BETAS"):
        TrainingConfig(PT_NUM_BETAS=1)


def test_make_train_fns_rejects_unresolved_auto():
    """Step-function builders must fail FAST on an unresolved 'auto'
    (PT_NUM_BETAS * NUM_READS would be string repetition and die far
    downstream with an opaque shape error)."""
    from image_generation_tpu.training.step import make_train_fns

    g, _ = select_latent_graph(chimera_graph(1, 1, 4), 8, 3)
    graph = GRBMGraph.from_networkx(g)
    cfg = TrainingConfig(
        N_LATENTS=graph.n, NUM_READS=8, BATCH_SIZE=8, DATASET_SIZE=16,
        SAMPLER="pt", PT_NUM_BETAS="auto",
    )
    with pytest.raises(ValueError, match="resolved"):
        make_train_fns(cfg, graph, 4, build_plan(graph))


def test_trainer_resolves_auto_ladder():
    """Trainer(SAMPLER='pt', PT_NUM_BETAS='auto'): train_init probes the
    initial model, freezes a concrete ladder into the config, builds chains
    of that size, and each epoch reports the free rung-count
    recommendation; graph-sharded 'on' refuses (probe would materialize a
    beyond-HBM coupling)."""
    from image_generation_tpu.training.trainer import Trainer

    cfg = TrainingConfig(
        N_LATENTS=32, NUM_READS=16, BATCH_SIZE=16, DATASET_SIZE=32,
        N_REPLICAS=2, GIBBS_SWEEPS=2, GIBBS_BURN_IN=4,
        QPU="Advantage2_prototype", SAMPLER="pt", PT_NUM_BETAS="auto",
        USE_PALLAS="off",
    )
    t = Trainer(config=cfg, mesh=None)
    t.train_init(n_epochs=1)
    resolved = t.config.PT_NUM_BETAS
    assert isinstance(resolved, int) and resolved >= 2
    assert t.config.PT_BETAS is not None and len(t.config.PT_BETAS) == resolved
    assert t.state.chains.shape[0] == resolved
    assert t.pt_auto_info["num_betas"] == resolved
    # the near-zero init model needs almost no ladder
    assert resolved <= 8
    stats = t.train_epoch(0)
    assert stats["pt_recommended_num_betas"] >= 2

    t_gs = Trainer(
        config=cfg.replace(GRAPH_SHARDED="on"), mesh=None
    )
    with pytest.raises(ValueError, match="beyond-HBM"):
        t_gs.train_init(n_epochs=1)


def test_round_trip_count_and_coverage(glass):
    """Flow diagnostics: trips/coverage well-formed, the shared-compile
    multi-ladder form matches the scalar form's shapes, and a two-rung
    ladder at identical betas (every swap accepted) completes many trips
    with full coverage."""
    from image_generation_tpu.ops.pt_tune import round_trip_count

    plan, hp, cp = glass
    geo = np.geomspace(0.1, 1.0, 6)
    out = round_trip_count(
        jax.random.PRNGKey(3), hp, cp, plan, [geo, geo], n_chains=32,
        n_rounds=40,
    )
    assert len(out) == 2
    (trips, cover), (trips2, cover2) = out
    # identical ladders + shared initial state → identical diagnostics
    assert (trips, cover) == (trips2, cover2)
    assert trips >= 0 and 0.0 < cover <= 1.0

    trips_free, cover_free = round_trip_count(
        jax.random.PRNGKey(4), hp, cp, plan, np.array([1.0, 1.0]),
        n_chains=16, n_rounds=30,
    )
    # all swaps accepted: replicas shuttle freely across the 2-rung ladder
    assert cover_free == 1.0
    assert trips_free > 50  # ~a trip every other round per column
