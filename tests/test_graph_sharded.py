"""Graph-partitioned Gibbs: the coupling matrix sharded over the mesh.

Validates the third SURVEY.md §5 scale axis (graph partitioning — chains and
the PT ladder shard elsewhere): statistical correctness against exact
Boltzmann enumeration through the sharded path, bit-exact invariance to the
graph-axis size (with order-exact couplings), and the reduce_scatter energy
path against the replicated implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.ops.exact import exact_moments
from image_generation_tpu.ops.gibbs import (
    build_plan,
    ising_energies,
    permuted_model,
    random_spins,
    to_original,
)
from image_generation_tpu.ops.gibbs_graph_sharded import (
    gibbs_sweeps_graph_sharded,
    ising_energies_graph_sharded,
    supports_graph_sharding,
)
from image_generation_tpu.parallel.mesh import create_mesh
from image_generation_tpu.utils.subgraph import select_latent_graph
from image_generation_tpu.utils.topology import chimera_graph, zephyr_graph


@pytest.fixture(scope="module")
def tiny():
    g, _ = select_latent_graph(chimera_graph(2, 2, 3), 12, 11)
    graph = GRBMGraph.from_networkx(g)
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.uniform(-0.3, 0.3, graph.n).astype(np.float32))
    j = jnp.asarray(rng.uniform(-0.5, 0.5, graph.n_edges).astype(np.float32))
    return graph, h, j


@pytest.fixture(scope="module")
def medium():
    """64-spin Zephyr subgraph with couplings quantized to 1/256: every
    partial sum is exactly representable in f32, so accumulation order
    (and hence the graph-axis psum grouping) cannot change any field."""
    g, _ = select_latent_graph(zephyr_graph(2), 64, 3)
    graph = GRBMGraph.from_networkx(g)
    rng = np.random.RandomState(7)
    h = jnp.asarray(np.round(rng.uniform(-0.3, 0.3, graph.n) * 256) / 256).astype(
        jnp.float32
    )
    j = jnp.asarray(
        np.round(rng.uniform(-0.5, 0.5, graph.n_edges) * 256) / 256
    ).astype(jnp.float32)
    return graph, h, j


def test_graph_sharded_matches_exact_moments(tiny):
    """Stationary distribution through the graph-sharded path (graph split 2
    ways, chains split 4 ways) must be the model's Boltzmann distribution."""
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=8)
    mesh = create_mesh(8)  # (data=4, chain=2): graph axis size 2
    assert supports_graph_sharding(plan, mesh, "chain")
    hp, cp = permuted_model(plan, h, j)
    k_init, k_run = jax.random.split(jax.random.PRNGKey(0))
    s0 = random_spins(k_init, plan, 2048)
    s = jax.jit(
        lambda k, s: gibbs_sweeps_graph_sharded(k, hp, cp, plan, s, 60, mesh)
    )(k_run, s0)
    assert s.sharding.spec == jax.sharding.PartitionSpec("data", "chain")
    sm = np.asarray(to_original(plan, s))
    m1 = sm.mean(axis=0)
    m2 = (sm[:, graph.edge_i] * sm[:, graph.edge_j]).mean(axis=0)
    e1, e2 = exact_moments(np.asarray(h), graph.edge_i, graph.edge_j, np.asarray(j))
    np.testing.assert_allclose(m1, e1, atol=0.09)
    np.testing.assert_allclose(m2, e2, atol=0.09)


def test_graph_axis_size_invariance(medium):
    """Same key, same model → BIT-EXACT identical chains whether the graph
    dimension is split 1, 2, or 4 ways (couplings are order-exact in f32 and
    the uniform stream is keyed per global chain id)."""
    graph, h, j = medium
    plan = build_plan(graph)
    hp, cp = permuted_model(plan, h, j)
    key = jax.random.PRNGKey(5)
    s0 = np.asarray(random_spins(jax.random.PRNGKey(6), plan, 64))

    outs = []
    for shape in [(8, 1), (4, 2), (2, 4)]:
        mesh = create_mesh(8, shape=shape)
        out = gibbs_sweeps_graph_sharded(
            key, hp, cp, plan, jnp.asarray(s0), 8, mesh
        )
        outs.append(np.asarray(out))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_nontiling_chain_rows_replicate_and_match(medium):
    """A chain count that doesn't tile the chain axis (30 rows on a 4-wide
    'data' axis) must still graph-shard — rows fall back to replicated —
    and produce bit-identical results (per-global-chain RNG keying)."""
    graph, h, j = medium
    plan = build_plan(graph)
    hp, cp = permuted_model(plan, h, j)
    key = jax.random.PRNGKey(9)
    s0 = np.asarray(random_spins(jax.random.PRNGKey(10), plan, 30))
    out_a = gibbs_sweeps_graph_sharded(
        key, hp, cp, plan, jnp.asarray(s0), 6, create_mesh(8, shape=(4, 2))
    )
    out_b = gibbs_sweeps_graph_sharded(
        key, hp, cp, plan, jnp.asarray(s0), 6, create_mesh(8, shape=(1, 8))
    )
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    # energies too
    e_a = ising_energies_graph_sharded(hp, cp, out_a, create_mesh(8, shape=(4, 2)))
    e_ref = ising_energies(hp, cp, jnp.asarray(np.asarray(out_a)))
    np.testing.assert_allclose(np.asarray(e_a), np.asarray(e_ref), rtol=1e-6)


def test_explicit_on_with_nontiling_graph_raises():
    """GRAPH_SHARDED="on" with an n_pad that can't tile the mesh must fail
    loudly — silently replicating a coupling the user said doesn't fit
    would OOM with no hint at real scale."""
    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.training.step import make_train_fns

    cfg = TrainingConfig(
        N_LATENTS=33, NUM_READS=16, BATCH_SIZE=16, N_REPLICAS=2,
        GIBBS_SWEEPS=2, GIBBS_BURN_IN=2, GRAPH_SHARDED="on",
    )
    g, _ = select_latent_graph(zephyr_graph(3), cfg.N_LATENTS, 7)
    graph = GRBMGraph.from_networkx(g)
    plan = build_plan(graph, pad_to=1)  # n_pad == 33, odd
    assert plan.n_pad % 2 != 0
    with pytest.raises(ValueError, match="GRAPH_SHARDED"):
        make_train_fns(cfg, graph, total_steps=10, plan=plan, mesh=create_mesh(8))


def test_graph_sharded_energies_match_replicated(medium):
    graph, h, j = medium
    plan = build_plan(graph)
    hp, cp = permuted_model(plan, h, j)
    mesh = create_mesh(8, shape=(2, 4))
    s = np.random.RandomState(2).choice([-1.0, 1.0], size=(16, plan.n_pad))
    s = jnp.asarray(s, jnp.float32)
    e_ref = np.asarray(ising_energies(hp, cp, s))
    e_sh = np.asarray(ising_energies_graph_sharded(hp, cp, s, mesh))
    np.testing.assert_allclose(e_sh, e_ref, rtol=1e-6)


def test_graph_sharded_energies_3d_ladder(medium):
    """The PT (T, C, n_pad) ladder goes through the reduce_scatter energy
    path (swap energies must not gather the sharded coupling)."""
    graph, h, j = medium
    plan = build_plan(graph)
    hp, cp = permuted_model(plan, h, j)
    mesh = create_mesh(8, shape=(2, 4))
    s = np.random.RandomState(4).choice([-1.0, 1.0], size=(4, 6, plan.n_pad))
    s = jnp.asarray(s, jnp.float32)
    e_sh = np.asarray(ising_energies_graph_sharded(hp, cp, s, mesh))
    e_ref = np.asarray(ising_energies(hp, cp, s))
    assert e_sh.shape == (4, 6)
    np.testing.assert_allclose(e_sh, e_ref, rtol=1e-6)


def test_pt_graph_sharded_matches_exact_moments(tiny):
    """Full PT rounds (sweeps + swap energies) through the graph-partitioned
    layout on a frustrated model: the target-temperature marginals must
    match exact Boltzmann enumeration — the same bar as the replicated PT
    sampler (tests/test_gibbs.py)."""
    from image_generation_tpu.ops.exact import exact_moments as _exact
    from image_generation_tpu.ops.gibbs import pt_round

    graph, h, _ = tiny
    rng = np.random.RandomState(7)
    j = jnp.asarray(rng.choice([-1.2, 1.2], graph.n_edges).astype(np.float32))
    plan = build_plan(graph, pad_to=8)
    hp, cp = permuted_model(plan, h, j)
    mesh = create_mesh(8)
    betas = jnp.geomspace(0.1, 1.0, 8)

    def sweeps_fn(k, h_, c_, p_, s_, n_, beta=1.0):
        return gibbs_sweeps_graph_sharded(k, h_, c_, p_, s_, n_, mesh, beta)

    def energies_fn(h_, c_, s_):
        return ising_energies_graph_sharded(h_, c_, s_, mesh)

    n_chains = 512
    ladder = random_spins(jax.random.PRNGKey(0), plan, 8 * n_chains).reshape(
        8, n_chains, plan.n_pad
    )

    @jax.jit
    def run(key, s):
        def round_fn(s_, k):
            return pt_round(
                k, hp, cp, plan, s_, betas, 4,
                sweeps_fn=sweeps_fn, energies_fn=energies_fn,
            ), None

        s_, _ = jax.lax.scan(round_fn, s, jax.random.split(key, 40))
        return s_

    ladder = run(jax.random.PRNGKey(1), ladder)
    sm = np.asarray(to_original(plan, ladder[-1]))
    m1 = sm.mean(axis=0)
    m2 = (sm[:, graph.edge_i] * sm[:, graph.edge_j]).mean(axis=0)
    e1, e2 = _exact(np.asarray(h), graph.edge_i, graph.edge_j, np.asarray(j))
    np.testing.assert_allclose(m1, e1, atol=0.15)
    np.testing.assert_allclose(m2, e2, atol=0.15)


def test_graph_sharded_beta_per_chain(tiny):
    """Per-chain β (the PT ladder flattening) threads through the sharded
    path: β=4 chains should be visibly colder than β=0.25 chains."""
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=8)
    hp, cp = permuted_model(plan, h, j)
    mesh = create_mesh(8)
    n_chains = 512
    beta = jnp.concatenate(
        [jnp.full(n_chains // 2, 0.25), jnp.full(n_chains // 2, 4.0)]
    )
    s0 = random_spins(jax.random.PRNGKey(1), plan, n_chains)
    s = gibbs_sweeps_graph_sharded(
        jax.random.PRNGKey(2), hp, cp, plan, s0, 40, mesh, beta=beta
    )
    e = np.asarray(ising_energies(hp, cp, s))
    assert e[n_chains // 2 :].mean() < e[: n_chains // 2].mean() - 1.0


def test_train_step_graph_sharded():
    """GRAPH_SHARDED="on" routes the fused training step's negative phase
    through the graph-partitioned sweep: the coupling is row-sharded, chains
    are (rows × spin-columns) sharded, and the reconstruction loss (which is
    sampler-independent) matches the single-device step exactly."""
    from jax.sharding import PartitionSpec as P

    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.parallel.mesh import shard_batch, shard_train_state
    from image_generation_tpu.training.step import make_train_fns

    cfg = TrainingConfig(
        N_LATENTS=32, NUM_READS=64, BATCH_SIZE=32, N_REPLICAS=2,
        GIBBS_SWEEPS=2, GIBBS_BURN_IN=4,
        COMPUTE_DTYPE="float32", SAMPLER_MATMUL_DTYPE="float32",
        GRAPH_SHARDED="on",
    )
    g, _ = select_latent_graph(zephyr_graph(3), cfg.N_LATENTS, 7)
    graph = GRBMGraph.from_networkx(g)
    mesh = create_mesh(8)
    fns = make_train_fns(cfg, graph, total_steps=10, mesh=mesh)
    assert fns.graph_sharded and fns.sampler_impl == "xla_graph_sharded"

    images = jnp.round(
        jax.random.uniform(jax.random.PRNGKey(0), (cfg.BATCH_SIZE, 32, 32, 1))
    )
    state = fns.init(jax.random.PRNGKey(1), images[:1])
    # init is jitted in this mode: the dense coupling is CONSTRUCTED
    # row-sharded (never materialized whole on one device); jit may
    # normalize away the trailing None in the spec
    assert state.sampler_coupling.sharding.spec in (P("chain"), P("chain", None))
    st = shard_train_state(state, mesh, graph_sharded=True)
    assert st.chains.sharding.spec == P("data", "chain")
    assert st.sampler_coupling.sharding.spec == P("chain", None)
    s2, m2 = fns.step(st, shard_batch(images, mesh), jnp.asarray(0))
    assert np.isfinite(float(m2.dvae_loss))
    # chains keep the graph-sharded layout across the step
    assert s2.chains.sharding.spec == P("data", "chain")

    # reconstruction loss is independent of the negative-phase sampler →
    # must equal the single-device step up to the sharded batch mean's
    # psum reduction order (same tolerance as tests/test_sharding.py)
    cfg1 = cfg.replace(GRAPH_SHARDED="off")
    fns1 = make_train_fns(cfg1, graph, total_steps=10)
    state1 = fns1.init(jax.random.PRNGKey(1), images[:1])
    _, m1 = fns1.step(state1, images, jnp.asarray(0))
    np.testing.assert_allclose(float(m2.mse), float(m1.mse), rtol=1e-4)


def test_pt_composes_with_graph_sharding():
    """PT × graph partitioning — the 2-D (ladder × graph) sampler layout:
    temperature ladder over 'data' (replica exchange = ppermute), spin
    columns + coupling rows over 'chain'. The step runs end to end and its
    reconstruction loss (sampler-independent) matches single-device."""
    from jax.sharding import PartitionSpec as P

    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.parallel.mesh import shard_batch, shard_train_state
    from image_generation_tpu.training.step import make_train_fns

    cfg = TrainingConfig(
        N_LATENTS=32, NUM_READS=16, BATCH_SIZE=16, N_REPLICAS=2,
        GIBBS_SWEEPS=2, GIBBS_BURN_IN=2, SAMPLER="pt", PT_NUM_BETAS=8,
        GRAPH_SHARDED="on",
        COMPUTE_DTYPE="float32", SAMPLER_MATMUL_DTYPE="float32",
    )
    g, _ = select_latent_graph(zephyr_graph(3), cfg.N_LATENTS, 7)
    graph = GRBMGraph.from_networkx(g)
    mesh = create_mesh(8)
    fns = make_train_fns(cfg, graph, total_steps=10, mesh=mesh)
    assert fns.graph_sharded and fns.sampler_impl == "xla_graph_sharded"

    images = jnp.round(
        jax.random.uniform(jax.random.PRNGKey(0), (cfg.BATCH_SIZE, 32, 32, 1))
    )
    state = fns.init(jax.random.PRNGKey(1), images[:1])
    assert state.chains.shape == (8, 16, state.chains.shape[-1])
    st = shard_train_state(state, mesh, graph_sharded=True)
    assert st.chains.sharding.spec == P("data", None, "chain")
    s2, m2 = fns.step(st, shard_batch(images, mesh), jnp.asarray(0))
    assert np.isfinite(float(m2.dvae_loss)) and np.isfinite(float(m2.nll))

    fns1 = make_train_fns(cfg.replace(GRAPH_SHARDED="off"), graph, total_steps=10)
    _, m1 = fns1.step(fns1.init(jax.random.PRNGKey(1), images[:1]), images, jnp.asarray(0))
    np.testing.assert_allclose(float(m2.mse), float(m1.mse), rtol=1e-4)


def test_trainer_graph_sharded_epoch(tmp_path):
    """The user-facing path: Trainer with GRAPH_SHARDED="on" on a mesh runs
    the scanned epoch with the graph-partitioned sampler and checkpoints."""
    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.training.trainer import Trainer

    cfg = TrainingConfig(
        N_LATENTS=32, NUM_READS=16, BATCH_SIZE=16, DATASET_SIZE=32,
        N_REPLICAS=2, GIBBS_SWEEPS=2, GIBBS_BURN_IN=2,
        QPU="Advantage2_prototype", GRAPH_SHARDED="on",
    )
    t = Trainer(qpu=cfg.QPU, config=cfg, mesh=create_mesh(8, shape=(2, 4)))
    t.train_init(1)
    assert t.fns.graph_sharded and t.fns.sampler_impl == "xla_graph_sharded"
    stats = t.train_epoch(0)
    assert np.isfinite(stats["mse"])
    t.save(tmp_path / "gs_model", n_epochs=1)
    assert (tmp_path / "gs_model" / "grbm.pth").exists()
    # generation routes through the partitioned sampler (the backends'
    # dense replicated coupling is never built) with edge-wise energies
    ss = t.sample_sampleset(num_reads=8)
    assert ss.info["sampler"] == "graph_sharded"
    assert ss.spins.shape == (8, t.graph.n) and np.isfinite(ss.energies).all()
    gen = t.generate_output(num_reads=8)
    assert gen["images"].shape[0] == 8


def test_graph_sharding_requires_tiling():
    g, _ = select_latent_graph(chimera_graph(2, 2, 3), 12, 11)
    graph = GRBMGraph.from_networkx(g)
    plan = build_plan(graph, pad_to=1)  # n_pad == 12, not a multiple of 8
    assert plan.n_pad % 8 != 0
    mesh = create_mesh(8, shape=(1, 8))
    assert not supports_graph_sharding(plan, mesh, "chain")
    hp, cp = permuted_model(plan, jnp.zeros(graph.n), jnp.zeros(graph.n_edges))
    with pytest.raises(ValueError, match="tile"):
        gibbs_sweeps_graph_sharded(
            jax.random.PRNGKey(0), hp, cp, plan,
            random_spins(jax.random.PRNGKey(1), plan, 8), 1, mesh,
        )
