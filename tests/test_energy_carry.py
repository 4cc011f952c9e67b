"""PT carried ladder energies: sweeps track ΔE, swaps permute energies.

Replica exchange historically recomputed the full (T·C, n_pad)×(n_pad, n_pad)
ladder energies twice per PT round; now the sweeps return their exact energy
change (ΔE of a color-block update is fields·Δs — no intra-color couplings)
and the swap passes permute the carried energies with the configurations.
These tests pin (a) ΔE exactness for every sampler implementation,
(b) bitwise equivalence of carried vs recomputed pt_round in f32, and
(c) consistency of the training step's carried TrainState.chain_energies.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.ops.gibbs import (
    build_plan,
    gibbs_sweeps,
    ising_energies,
    permuted_model,
    pt_round,
    random_spins,
)
from image_generation_tpu.utils.subgraph import select_latent_graph
from image_generation_tpu.utils.topology import chimera_graph


@pytest.fixture(scope="module")
def model():
    g, _ = select_latent_graph(chimera_graph(2, 2, 3), 12, 11)
    graph = GRBMGraph.from_networkx(g)
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.uniform(-0.3, 0.3, graph.n).astype(np.float32))
    j = jnp.asarray(rng.uniform(-0.5, 0.5, graph.n_edges).astype(np.float32))
    plan = build_plan(graph)  # 128-padded: Pallas-compatible
    hp, cp = permuted_model(plan, h, j)
    return plan, hp, cp


def test_xla_sweep_delta_e_exact(model):
    plan, hp, cp = model
    s0 = random_spins(jax.random.PRNGKey(1), plan, 32)
    e0 = ising_energies(hp, cp, s0)
    s1, de = gibbs_sweeps(
        jax.random.PRNGKey(2), hp, cp, plan, s0, 7, track_delta_e=True
    )
    e1 = ising_energies(hp, cp, s1)
    np.testing.assert_allclose(np.asarray(e0 + de), np.asarray(e1), rtol=1e-5, atol=1e-5)
    # tracking must not change the sampled spins
    s1b = gibbs_sweeps(jax.random.PRNGKey(2), hp, cp, plan, s0, 7)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s1b))


def test_xla_sweep_delta_e_per_chain_beta(model):
    plan, hp, cp = model
    s0 = random_spins(jax.random.PRNGKey(3), plan, 16)
    beta = jnp.geomspace(0.25, 2.0, 16)
    e0 = ising_energies(hp, cp, s0)
    s1, de = gibbs_sweeps(
        jax.random.PRNGKey(4), hp, cp, plan, s0, 5, beta=beta, track_delta_e=True
    )
    np.testing.assert_allclose(
        np.asarray(e0 + de), np.asarray(ising_energies(hp, cp, s1)),
        rtol=1e-5, atol=1e-5,
    )


def test_pallas_vmem_delta_e_exact(model):
    from image_generation_tpu.ops.gibbs_pallas import gibbs_sweeps_pallas

    plan, hp, cp = model
    s0 = random_spins(jax.random.PRNGKey(5), plan, 16)
    u = jax.random.uniform(jax.random.PRNGKey(6), (4, 16, plan.n_pad))
    e0 = ising_energies(hp, cp, s0)
    s1, de = gibbs_sweeps_pallas(
        jax.random.PRNGKey(7), hp, cp, plan, s0, 4,
        interpret=True, uniforms=u, chain_block=8, track_delta_e=True,
    )
    np.testing.assert_allclose(
        np.asarray(e0 + de), np.asarray(ising_energies(hp, cp, s1)),
        rtol=1e-4, atol=1e-4,
    )
    s1b = gibbs_sweeps_pallas(
        jax.random.PRNGKey(7), hp, cp, plan, s0, 4,
        interpret=True, uniforms=u, chain_block=8,
    )
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s1b))


def test_pallas_hbm_delta_e_exact(model):
    from image_generation_tpu.ops.gibbs_pallas_hbm import gibbs_sweeps_pallas_hbm

    plan, hp, cp = model
    s0 = random_spins(jax.random.PRNGKey(8), plan, 16)
    u = jax.random.uniform(jax.random.PRNGKey(9), (4, 16, plan.n_pad))
    e0 = ising_energies(hp, cp, s0)
    s1, de = gibbs_sweeps_pallas_hbm(
        jax.random.PRNGKey(10), hp, cp, plan, s0, 4,
        interpret=True, uniforms=u, chain_block=8,
        block_dtype=jnp.float32, track_delta_e=True,
    )
    np.testing.assert_allclose(
        np.asarray(e0 + de), np.asarray(ising_energies(hp, cp, s1)),
        rtol=1e-4, atol=1e-4,
    )
    s1b = gibbs_sweeps_pallas_hbm(
        jax.random.PRNGKey(10), hp, cp, plan, s0, 4,
        interpret=True, uniforms=u, chain_block=8, block_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s1b))


def test_graph_sharded_delta_e_exact(model):
    from image_generation_tpu.ops.gibbs_graph_sharded import (
        gibbs_sweeps_graph_sharded,
    )
    from image_generation_tpu.parallel.mesh import create_mesh

    plan, hp, cp = model
    mesh = create_mesh(8, shape=(4, 2))
    s0 = random_spins(jax.random.PRNGKey(11), plan, 32)
    e0 = ising_energies(hp, cp, s0)
    s1, de = gibbs_sweeps_graph_sharded(
        jax.random.PRNGKey(12), hp, cp, plan, s0, 5, mesh, track_delta_e=True
    )
    np.testing.assert_allclose(
        np.asarray(e0 + de),
        np.asarray(ising_energies(hp, cp, jnp.asarray(np.asarray(s1)))),
        rtol=1e-5, atol=1e-5,
    )
    s1b = gibbs_sweeps_graph_sharded(
        jax.random.PRNGKey(12), hp, cp, plan, s0, 5, mesh
    )
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s1b))


def test_pt_round_carried_equals_recomputed(model):
    """In f32 the carried-energy pt_round must make bitwise-identical swap
    decisions to the recompute-every-pass version: permuting energies IS
    recomputing them (a configuration's energy doesn't depend on its row),
    and e0 + exact ΔE == fresh energies up to f32 accumulation order, which
    for one round stays below any realistic acceptance margin."""
    plan, hp, cp = model
    betas = jnp.geomspace(0.3, 1.0, 4)
    ladder = random_spins(jax.random.PRNGKey(13), plan, 4 * 8).reshape(
        4, 8, plan.n_pad
    )
    e0 = ising_energies(hp, cp, ladder)
    out_a = pt_round(jax.random.PRNGKey(14), hp, cp, plan, ladder, betas, 3)
    out_b, e_b = pt_round(
        jax.random.PRNGKey(14), hp, cp, plan, ladder, betas, 3,
        energies=e0, return_energies=True,
    )
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    np.testing.assert_allclose(
        np.asarray(e_b), np.asarray(ising_energies(hp, cp, out_b)),
        rtol=1e-5, atol=1e-5,
    )


def test_pt_carry_stays_consistent_over_rounds(model):
    """Scan many carried rounds and verify the carried energies still match
    a fresh recompute — the float-drift bound the design relies on."""
    plan, hp, cp = model
    betas = jnp.geomspace(0.3, 1.0, 4)
    ladder = random_spins(jax.random.PRNGKey(15), plan, 4 * 16).reshape(
        4, 16, plan.n_pad
    )
    e = ising_energies(hp, cp, ladder)

    @jax.jit
    def run(ladder, e, key):
        def round_fn(carry, k):
            s, e_ = carry
            return pt_round(
                k, hp, cp, plan, s, betas, 2, energies=e_, return_energies=True
            ), None

        return jax.lax.scan(round_fn, (ladder, e), jax.random.split(key, 50))[0]

    ladder, e = run(ladder, e, jax.random.PRNGKey(16))
    np.testing.assert_allclose(
        np.asarray(e), np.asarray(ising_energies(hp, cp, ladder)),
        rtol=1e-4, atol=1e-4,
    )


def test_train_state_carried_energies_consistent():
    """The PT training step carries TrainState.chain_energies; after a step
    and a scanned epoch they must equal a fresh energy computation of the
    chains under the cached sampler model."""
    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.training.step import make_train_fns
    from image_generation_tpu.utils.topology import zephyr_graph

    cfg = TrainingConfig(
        N_LATENTS=32, NUM_READS=16, BATCH_SIZE=16, N_REPLICAS=2,
        GIBBS_SWEEPS=2, GIBBS_BURN_IN=2, SAMPLER="pt", PT_NUM_BETAS=4,
    )
    g, _ = select_latent_graph(zephyr_graph(3), cfg.N_LATENTS, 7)
    graph = GRBMGraph.from_networkx(g)
    fns = make_train_fns(cfg, graph, total_steps=10)
    images = jnp.round(jax.random.uniform(jax.random.PRNGKey(0), (16, 32, 32, 1)))
    state = fns.init(jax.random.PRNGKey(1), images[:1])
    assert state.chain_energies.shape == (4, 16)

    def fresh(st):
        return ising_energies(
            st.sampler_h, st.sampler_coupling.astype(jnp.float32), st.chains
        )

    np.testing.assert_allclose(
        np.asarray(state.chain_energies), np.asarray(fresh(state)),
        rtol=1e-4, atol=1e-3,
    )
    s1, _ = fns.step(state, images, jnp.asarray(0))
    np.testing.assert_allclose(
        np.asarray(s1.chain_energies), np.asarray(fresh(s1)), rtol=1e-4, atol=1e-3
    )
    # scanned epoch (donates its input: rebuild a fresh state first)
    state2 = fns.init(jax.random.PRNGKey(1), images[:1])
    batches = jnp.stack([images, 1.0 - images])
    s2, _ = fns.epoch(state2, batches, jnp.asarray(0))
    np.testing.assert_allclose(
        np.asarray(s2.chain_energies), np.asarray(fresh(s2)), rtol=1e-4, atol=1e-3
    )
    # non-PT mode keeps the (0,) placeholder
    fns_g = make_train_fns(cfg.replace(SAMPLER="gibbs"), graph, total_steps=10)
    st_g = fns_g.init(jax.random.PRNGKey(1), images[:1])
    assert st_g.chain_energies.shape == (0,)


def test_bf16_adam_moments_train():
    """ADAM_MOMENT_DTYPE="bfloat16" trains to a loss close to the f32 run
    (storage-precision-only change; arithmetic stays f32)."""
    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.training.step import make_train_fns
    from image_generation_tpu.utils.topology import zephyr_graph

    base = dict(
        N_LATENTS=32, NUM_READS=16, BATCH_SIZE=16, N_REPLICAS=2,
        GIBBS_SWEEPS=2, GIBBS_BURN_IN=2,
    )
    g, _ = select_latent_graph(zephyr_graph(3), 32, 7)
    graph = GRBMGraph.from_networkx(g)
    images = jnp.round(jax.random.uniform(jax.random.PRNGKey(0), (16, 32, 32, 1)))
    batches = jnp.stack([images, 1.0 - images, images, 1.0 - images])

    finals = {}
    for dt in ("float32", "bfloat16"):
        cfg = TrainingConfig(**base, ADAM_MOMENT_DTYPE=dt)
        fns = make_train_fns(cfg, graph, total_steps=8)
        state = fns.init(jax.random.PRNGKey(1), images[:1])
        if dt == "bfloat16":
            mu = fns.init(jax.random.PRNGKey(1), images[:1]).dvae_opt[1].mu
            assert jax.tree.leaves(mu)[0].dtype == jnp.bfloat16
        for ep in range(2):
            state, metrics = fns.epoch(state, batches, jnp.asarray(ep))
        finals[dt] = float(np.asarray(metrics.mse)[-1])
    assert np.isfinite(finals["bfloat16"])
    # same ballpark: storage precision must not derail optimization
    assert abs(finals["bfloat16"] - finals["float32"]) < 0.25 * abs(
        finals["float32"]
    ) + 0.02
