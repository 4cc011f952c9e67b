"""Tests for the GRBM pytree: energy, scaling, closed-form NLL gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_generation_tpu.models.grbm import (
    GRBMGraph,
    GRBMParams,
    energy,
    nll_grads,
    nll_value,
    scaled_ising,
    suff_stats,
)
from image_generation_tpu.utils.subgraph import select_latent_graph
from image_generation_tpu.utils.topology import zephyr_graph


@pytest.fixture(scope="module")
def small_model():
    g, _ = select_latent_graph(zephyr_graph(3), 24, 5)
    graph = GRBMGraph.from_networkx(g)
    params = graph.init_params(jax.random.PRNGKey(0), scale=0.5)
    return graph, params


def test_energy_matches_naive(small_model):
    graph, params = small_model
    key = jax.random.PRNGKey(1)
    spins = 2.0 * jax.random.bernoulli(key, 0.5, (16, graph.n)).astype(jnp.float32) - 1.0
    e = energy(params, graph, spins)
    h = np.asarray(params.linear)
    j = np.asarray(params.quadratic)
    s = np.asarray(spins)
    naive = s @ h + (s[:, graph.edge_i] * s[:, graph.edge_j]) @ j
    np.testing.assert_allclose(np.asarray(e), naive, rtol=1e-5)


def test_energy_batched_shapes(small_model):
    graph, params = small_model
    spins = jnp.ones((4, 8, graph.n))
    assert energy(params, graph, spins).shape == (4, 8)


def test_scaled_ising_clips(small_model):
    graph, params = small_model
    big = GRBMParams(linear=100.0 * params.linear, quadratic=100.0 * params.quadratic)
    h, j = scaled_ising(big, 0.05, (-4.0, 4.0), (-1.0, 1.0))
    assert float(jnp.max(jnp.abs(h))) <= 4.0
    assert float(jnp.max(jnp.abs(j))) <= 1.0
    # unclipped region scales linearly
    h2, j2 = scaled_ising(params, 0.05, (-4.0, 4.0), (-1.0, 1.0))
    np.testing.assert_allclose(np.asarray(h2), 0.05 * np.asarray(params.linear), rtol=1e-6)


def test_nll_grads_match_autodiff(small_model):
    graph, params = small_model
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    data = 2.0 * jax.random.bernoulli(k1, 0.4, (32, graph.n)).astype(jnp.float32) - 1.0
    model = 2.0 * jax.random.bernoulli(k2, 0.6, (64, graph.n)).astype(jnp.float32) - 1.0
    auto = jax.grad(lambda p: nll_value(p, graph, data, model))(params)
    closed = nll_grads(graph, data, model)
    np.testing.assert_allclose(np.asarray(auto.linear), np.asarray(closed.linear), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(auto.quadratic), np.asarray(closed.quadratic), atol=1e-6
    )


def test_suff_stats_shapes(small_model):
    graph, params = small_model
    spins = jnp.ones((10, graph.n))
    m1, m2 = suff_stats(graph, spins)
    assert m1.shape == (graph.n,)
    assert m2.shape == (graph.n_edges,)
    np.testing.assert_allclose(np.asarray(m1), 1.0)
    np.testing.assert_allclose(np.asarray(m2), 1.0)


def test_coupling_matrix_symmetric(small_model):
    graph, params = small_model
    a = graph.coupling_matrix(params.quadratic)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a).T)
    assert np.allclose(np.diag(np.asarray(a)), 0.0)
    # quadratic energy via dense matrix matches edge-list energy
    spins = 2.0 * jax.random.bernoulli(jax.random.PRNGKey(3), 0.5, (8, graph.n)).astype(
        jnp.float32
    ) - 1.0
    via_dense = 0.5 * jnp.sum(spins * (spins @ a), axis=-1) + spins @ params.linear
    np.testing.assert_allclose(
        np.asarray(via_dense), np.asarray(energy(params, graph, spins)), rtol=1e-4
    )
