"""Statistical validation of the Gibbs / parallel-tempering samplers.

The annealer is *replaced*, not emulated (SURVEY.md §7): correctness means
the sampler's stationary distribution is the Boltzmann distribution of the
submitted Ising model.  On ≤16-spin graphs we check empirical moments
against exact enumeration.  Samplers operate in the color-permuted padded
coordinate system; ``to_original`` maps samples back.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.ops.exact import exact_moments, exact_sample
from image_generation_tpu.ops.gibbs import (
    build_plan,
    gibbs_sweeps,
    ising_energies,
    permuted_model,
    pt_sample,
    random_spins,
    to_original,
)
from image_generation_tpu.utils.subgraph import select_latent_graph
from image_generation_tpu.utils.topology import chimera_graph


@pytest.fixture(scope="module")
def tiny():
    # one Chimera cell + neighbors: 12 spins, realistic degrees
    g, _ = select_latent_graph(chimera_graph(2, 2, 3), 12, 11)
    graph = GRBMGraph.from_networkx(g)
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.uniform(-0.3, 0.3, graph.n).astype(np.float32))
    j = jnp.asarray(rng.uniform(-0.5, 0.5, graph.n_edges).astype(np.float32))
    return graph, h, j


def _empirical_moments(spins, graph):
    s = np.asarray(spins, np.float64)
    m1 = s.mean(axis=0)
    m2 = (s[:, graph.edge_i] * s[:, graph.edge_j]).mean(axis=0)
    return m1, m2


def test_plan_permutation_is_bijective(tiny):
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=8)
    assert plan.n == graph.n
    assert plan.n_pad % 8 == 0
    assert sorted(plan.orig_to_perm.tolist()) == sorted(set(plan.orig_to_perm.tolist()))
    # blocks tile [0, n_pad) and contain every spin exactly once
    covered = sum(vs - s for s, vs, _ in plan.blocks)
    assert covered == graph.n
    # permuted edges never touch padding and respect the coloring
    for s, vs, e in plan.blocks:
        in_block_i = (plan.perm_edge_i >= s) & (plan.perm_edge_i < vs)
        in_block_j = (plan.perm_edge_j >= s) & (plan.perm_edge_j < vs)
        assert not (in_block_i & in_block_j).any(), "edge inside one color block"


def test_to_original_roundtrip(tiny):
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=8)
    hp, cp = permuted_model(plan, h, j)
    # permuted model preserves energies: compare on random assignments
    rng = np.random.RandomState(1)
    s = rng.choice([-1.0, 1.0], size=(32, graph.n)).astype(np.float32)
    s_p = np.ones((32, plan.n_pad), np.float32)
    s_p[:, plan.orig_to_perm] = s
    from image_generation_tpu.models.grbm import GRBMParams, energy

    e_orig = energy(GRBMParams(linear=h, quadratic=j), graph, jnp.asarray(s))
    e_perm = ising_energies(hp, cp, jnp.asarray(s_p))
    np.testing.assert_allclose(np.asarray(e_perm), np.asarray(e_orig), rtol=1e-4)
    # gather back
    back = to_original(plan, jnp.asarray(s_p))
    np.testing.assert_array_equal(np.asarray(back), s)


def test_gibbs_matches_exact_moments(tiny):
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=8)
    hp, cp = permuted_model(plan, h, j)
    key = jax.random.PRNGKey(0)
    k_init, k_run = jax.random.split(key)
    s0 = random_spins(k_init, plan, 2048)
    s = jax.jit(lambda k, s: gibbs_sweeps(k, hp, cp, plan, s, n_sweeps=60))(k_run, s0)
    m1, m2 = _empirical_moments(to_original(plan, s), graph)
    e1, e2 = exact_moments(np.asarray(h), graph.edge_i, graph.edge_j, np.asarray(j))
    np.testing.assert_allclose(m1, e1, atol=0.09)
    np.testing.assert_allclose(m2, e2, atol=0.09)


def test_gibbs_bf16_matmul_statistically_correct(tiny):
    """bf16 field matmuls (f32 accumulation) must not shift the stationary
    distribution — the default TPU configuration."""
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=8)
    hp, cp = permuted_model(plan, h, j)
    k_init, k_run = jax.random.split(jax.random.PRNGKey(21))
    s0 = random_spins(k_init, plan, 2048)
    s = gibbs_sweeps(
        k_run, hp, cp, plan, s0, n_sweeps=60, matmul_dtype=jnp.bfloat16
    )
    m1, m2 = _empirical_moments(to_original(plan, s), graph)
    e1, e2 = exact_moments(np.asarray(h), graph.edge_i, graph.edge_j, np.asarray(j))
    np.testing.assert_allclose(m1, e1, atol=0.1)
    np.testing.assert_allclose(m2, e2, atol=0.1)


def test_gibbs_beta_scaling(tiny):
    """Sampling at β=2 must match exact moments of the doubled model."""
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=8)
    hp, cp = permuted_model(plan, h, j)
    k_init, k_run = jax.random.split(jax.random.PRNGKey(3))
    s0 = random_spins(k_init, plan, 2048)
    s = gibbs_sweeps(k_run, hp, cp, plan, s0, n_sweeps=80, beta=2.0)
    m1, _ = _empirical_moments(to_original(plan, s), graph)
    e1, _ = exact_moments(np.asarray(h), graph.edge_i, graph.edge_j, np.asarray(j), beta=2.0)
    np.testing.assert_allclose(m1, e1, atol=0.1)


def test_pt_matches_exact_on_frustrated_model(tiny):
    """Strong couplings where plain Gibbs mixes slowly: PT must still match."""
    graph, h, _ = tiny
    rng = np.random.RandomState(7)
    j = jnp.asarray(rng.choice([-1.2, 1.2], graph.n_edges).astype(np.float32))
    plan = build_plan(graph, pad_to=8)
    hp, cp = permuted_model(plan, h, j)
    betas = jnp.geomspace(0.1, 1.0, 8)
    target, ladder = jax.jit(
        lambda k: pt_sample(
            k, hp, cp, plan, n_chains=512, betas=betas, n_rounds=40, sweeps_per_round=4
        )
    )(jax.random.PRNGKey(1))
    assert ladder.shape == (8, 512, plan.n_pad)
    m1, m2 = _empirical_moments(to_original(plan, target), graph)
    e1, e2 = exact_moments(np.asarray(h), graph.edge_i, graph.edge_j, np.asarray(j))
    np.testing.assert_allclose(m1, e1, atol=0.15)
    np.testing.assert_allclose(m2, e2, atol=0.15)


def test_energy_agreement_with_exact_sampler(tiny):
    """Mean energy of Gibbs samples ≈ mean energy of exact samples."""
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=8)
    hp, cp = permuted_model(plan, h, j)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    s0 = random_spins(k1, plan, 2048)
    gibbs = gibbs_sweeps(k2, hp, cp, plan, s0, n_sweeps=60)
    exact = exact_sample(k3, np.asarray(h), graph.edge_i, graph.edge_j, np.asarray(j), 2048)
    from image_generation_tpu.models.grbm import GRBMParams, energy

    params = GRBMParams(linear=h, quadratic=j)
    e_g = float(jnp.mean(energy(params, graph, to_original(plan, gibbs))))
    e_e = float(jnp.mean(energy(params, graph, jnp.asarray(exact))))
    assert abs(e_g - e_e) < 0.25


def test_spins_stay_pm1(tiny):
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=8)
    hp, cp = permuted_model(plan, h, j)
    s0 = jnp.ones((8, plan.n_pad))
    s = gibbs_sweeps(jax.random.PRNGKey(9), hp, cp, plan, s0, n_sweeps=3)
    assert set(np.unique(np.asarray(s))) <= {-1.0, 1.0}


def test_pt_round_aux_rides_the_swap_permutation(tiny):
    """aux payloads (replica-identity labels, flow diagnostics) must permute
    bitwise with the configurations.  With identity sweeps the round is
    swaps-only, so an aux copy of the input ladder must exactly equal the
    output ladder — and carried energies must match a recompute."""
    from image_generation_tpu.ops.gibbs import pt_round

    graph, h, _ = tiny
    rng = np.random.RandomState(3)
    j = jnp.asarray(rng.choice([-1.0, 1.0], graph.n_edges).astype(np.float32))
    plan = build_plan(graph, pad_to=8)
    hp, cp = permuted_model(plan, h, j)
    t_dim, c_dim = 6, 32
    ladder0 = random_spins(
        jax.random.PRNGKey(4), plan, t_dim * c_dim
    ).reshape(t_dim, c_dim, plan.n_pad)
    betas = jnp.geomspace(0.2, 1.0, t_dim)
    e0 = ising_energies(hp, cp, ladder0)

    def sweeps_id(k, h_, c_, p_, s_, n_, beta=1.0, track_delta_e=False):
        return (s_, jnp.zeros(s_.shape[0])) if track_delta_e else s_

    # aux carries (a spin copy, per-replica int labels): both must travel
    labels0 = jnp.arange(t_dim)[:, None] * jnp.ones((1, c_dim), jnp.int32)
    s1, e1, aux1 = pt_round(
        jax.random.PRNGKey(8), hp, cp, plan, ladder0, betas, 2,
        sweeps_fn=sweeps_id, energies=e0,
        aux={"spins": ladder0, "label": labels0},
    )
    np.testing.assert_array_equal(np.asarray(aux1["spins"]), np.asarray(s1))
    np.testing.assert_allclose(
        np.asarray(e1), np.asarray(ising_energies(hp, cp, s1)), rtol=1e-5
    )
    # labels are a permutation within every chain column
    lab = np.asarray(aux1["label"])
    assert all(
        sorted(lab[:, c].tolist()) == list(range(t_dim)) for c in range(c_dim)
    )
    # some swap actually happened (otherwise the test is vacuous)
    assert (lab != np.asarray(labels0)).any()
