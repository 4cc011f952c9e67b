"""Statistical validation of the Gibbs / parallel-tempering samplers.

The annealer is *replaced*, not emulated (SURVEY.md §7): correctness means
the sampler's stationary distribution is the Boltzmann distribution of the
submitted Ising model.  On ≤16-spin graphs we check empirical moments
against exact enumeration.
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
    pt_sample,
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


def test_gibbs_matches_exact_moments(tiny):
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=8)
    coupling = graph.coupling_matrix(j)
    key = jax.random.PRNGKey(0)
    k_init, k_run = jax.random.split(key)
    chains = 2048
    s0 = 2.0 * jax.random.bernoulli(k_init, 0.5, (chains, graph.n)).astype(jnp.float32) - 1.0
    s = jax.jit(
        lambda k, s: gibbs_sweeps(k, h, coupling, plan, s, n_sweeps=60, beta=1.0)
    )(k_run, s0)
    m1, m2 = _empirical_moments(s, graph)
    e1, e2 = exact_moments(np.asarray(h), graph.edge_i, graph.edge_j, np.asarray(j))
    # 2048 independent-ish chains → stderr ≈ 1/sqrt(2048) ≈ 0.022
    np.testing.assert_allclose(m1, e1, atol=0.09)
    np.testing.assert_allclose(m2, e2, atol=0.09)


def test_gibbs_beta_scaling(tiny):
    """Sampling at β=2 must match exact moments of the doubled model."""
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=8)
    coupling = graph.coupling_matrix(j)
    key = jax.random.PRNGKey(3)
    k_init, k_run = jax.random.split(key)
    chains = 2048
    s0 = 2.0 * jax.random.bernoulli(k_init, 0.5, (chains, graph.n)).astype(jnp.float32) - 1.0
    s = gibbs_sweeps(k_run, h, coupling, plan, s0, n_sweeps=80, beta=2.0)
    m1, _ = _empirical_moments(s, graph)
    e1, _ = exact_moments(np.asarray(h), graph.edge_i, graph.edge_j, np.asarray(j), beta=2.0)
    np.testing.assert_allclose(m1, e1, atol=0.1)


def test_pt_matches_exact_on_frustrated_model(tiny):
    """Strong couplings where plain Gibbs mixes slowly: PT must still match."""
    graph, h, _ = tiny
    rng = np.random.RandomState(7)
    j = jnp.asarray(rng.choice([-1.2, 1.2], graph.n_edges).astype(np.float32))
    plan = build_plan(graph, pad_to=8)
    coupling = graph.coupling_matrix(j)
    betas = jnp.geomspace(0.1, 1.0, 8)
    target, ladder = jax.jit(
        lambda k: pt_sample(
            k, h, coupling, plan, n_chains=512, betas=betas, n_rounds=40, sweeps_per_round=4
        )
    )(jax.random.PRNGKey(1))
    assert ladder.shape == (8, 512, graph.n)
    m1, m2 = _empirical_moments(target, graph)
    e1, e2 = exact_moments(np.asarray(h), graph.edge_i, graph.edge_j, np.asarray(j))
    np.testing.assert_allclose(m1, e1, atol=0.15)
    np.testing.assert_allclose(m2, e2, atol=0.15)


def test_energy_agreement_with_exact_sampler(tiny):
    """Mean energy of Gibbs samples ≈ mean energy of exact samples."""
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=8)
    coupling = graph.coupling_matrix(j)
    key = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(key, 3)
    s0 = 2.0 * jax.random.bernoulli(k1, 0.5, (2048, graph.n)).astype(jnp.float32) - 1.0
    gibbs = gibbs_sweeps(k2, h, coupling, plan, s0, n_sweeps=60)
    exact = exact_sample(k3, np.asarray(h), graph.edge_i, graph.edge_j, np.asarray(j), 2048)
    e_g = float(jnp.mean(ising_energies(h, coupling, gibbs)))
    e_e = float(jnp.mean(ising_energies(h, coupling, jnp.asarray(exact))))
    assert abs(e_g - e_e) < 0.25


def test_spins_stay_pm1(tiny):
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=8)
    coupling = graph.coupling_matrix(j)
    s0 = jnp.ones((8, graph.n))
    s = gibbs_sweeps(jax.random.PRNGKey(9), h, coupling, plan, s0, n_sweeps=3)
    assert set(np.unique(np.asarray(s))) <= {-1.0, 1.0}
