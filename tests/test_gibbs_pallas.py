"""Pallas Gibbs kernel: statistical correctness in interpret mode on CPU.

The kernel is validated the same way as the XLA sampler: empirical moments
of its samples must match exact Boltzmann enumeration on small graphs.  On
real TPU the driver's bench exercises the compiled path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.ops.exact import exact_moments
from image_generation_tpu.ops.gibbs import (
    build_plan,
    permuted_model,
    random_spins,
    to_original,
)
from image_generation_tpu.ops.gibbs_pallas import gibbs_sweeps_pallas, supported_by_pallas
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


def test_supported_predicate():
    g, _ = select_latent_graph(zephyr_graph(3), 64, 3)
    graph = GRBMGraph.from_networkx(g)
    plan = build_plan(graph)  # pad_to=128 → n_pad multiple of 128
    assert supported_by_pallas(plan, 256)


def _uniforms(key, n_sweeps, chains, n_pad):
    return jax.random.uniform(key, (n_sweeps, chains, n_pad))


def test_pallas_kernel_matches_exact_moments(tiny):
    """Fed-uniforms path: the TPU interpreter stubs the on-core PRNG, so the
    statistical test injects host uniforms; the math (fields, conditional
    probabilities, block updates) is the compiled kernel's."""
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=128)
    hp, cp = permuted_model(plan, h, j)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    s0 = random_spins(k1, plan, 512)
    u = _uniforms(k2, 60, 512, plan.n_pad)
    out = gibbs_sweeps_pallas(k2, hp, cp, plan, s0, n_sweeps=60, interpret=True, uniforms=u)
    assert out.shape == s0.shape
    s = np.asarray(to_original(plan, out), np.float64)
    assert set(np.unique(s)) <= {-1.0, 1.0}
    m1 = s.mean(axis=0)
    m2 = (s[:, graph.edge_i] * s[:, graph.edge_j]).mean(axis=0)
    e1, e2 = exact_moments(np.asarray(h), graph.edge_i, graph.edge_j, np.asarray(j))
    np.testing.assert_allclose(m1, e1, atol=0.15)
    np.testing.assert_allclose(m2, e2, atol=0.15)


def test_pallas_beta_and_grid_blocks(tiny):
    """β≠1 path + multiple chain-block grid instances."""
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=128)
    hp, cp = permuted_model(plan, h, j)
    key = jax.random.PRNGKey(3)
    s0 = random_spins(key, plan, 256)
    u = _uniforms(jax.random.fold_in(key, 1), 40, 256, plan.n_pad)
    out = gibbs_sweeps_pallas(
        key, hp, cp, plan, s0, n_sweeps=40, beta=2.0, chain_block=64,
        interpret=True, uniforms=u,
    )
    s = np.asarray(to_original(plan, out), np.float64)
    e1, _ = exact_moments(np.asarray(h), graph.edge_i, graph.edge_j, np.asarray(j), beta=2.0)
    np.testing.assert_allclose(s.mean(axis=0), e1, atol=0.2)
    # independent uniforms per block: blocks must differ
    assert not np.array_equal(np.asarray(out)[:64], np.asarray(out)[64:128])


def test_pallas_kernel_race_free(tiny):
    """TPU-interpreter race detection across grid instances (the framework's
    sanitizer story — the reference has none, SURVEY.md §5)."""
    from jax.experimental.pallas import tpu as pltpu

    graph, h, j = tiny
    plan = build_plan(graph, pad_to=128)
    hp, cp = permuted_model(plan, h, j)
    key = jax.random.PRNGKey(11)
    s0 = random_spins(key, plan, 128)
    u = _uniforms(key, 4, 128, plan.n_pad)
    out = gibbs_sweeps_pallas(
        key, hp, cp, plan, s0, n_sweeps=4, chain_block=64, uniforms=u,
        interpret=pltpu.InterpretParams(detect_races=True),
    )
    assert out.shape == s0.shape  # no race detected (would raise)


def test_pallas_matches_xla_sampler_distribution(tiny):
    """Same model, same uniforms-style sampling: pallas and XLA samplers must
    agree in distribution (means within joint sampling noise)."""
    from image_generation_tpu.ops.gibbs import gibbs_sweeps

    graph, h, j = tiny
    plan = build_plan(graph, pad_to=128)
    hp, cp = permuted_model(plan, h, j)
    key = jax.random.PRNGKey(7)
    s0 = random_spins(key, plan, 1024)
    u = _uniforms(jax.random.fold_in(key, 2), 50, 1024, plan.n_pad)
    out_p = gibbs_sweeps_pallas(key, hp, cp, plan, s0, 50, interpret=True, uniforms=u)
    out_x = gibbs_sweeps(jax.random.fold_in(key, 3), hp, cp, plan, s0, 50)
    mp = np.asarray(to_original(plan, out_p)).mean(axis=0)
    mx = np.asarray(to_original(plan, out_x)).mean(axis=0)
    np.testing.assert_allclose(mp, mx, atol=0.12)


def test_pallas_kernel_bf16_matches_exact_moments(tiny):
    """bf16-resident coupling through the VMEM kernel (the default-selected
    path at n_pad >= 2048 now that supported_by_pallas budgets the resident
    itemsize) must not shift the stationary distribution — the XLA sweep's
    bf16 contract (tests/test_gibbs.py) extended to the kernel."""
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=128)
    hp, cp = permuted_model(plan, h, j)
    key = jax.random.PRNGKey(21)
    k1, k2 = jax.random.split(key)
    s0 = random_spins(k1, plan, 512)
    u = _uniforms(k2, 60, 512, plan.n_pad)
    out = gibbs_sweeps_pallas(
        k2, hp, cp, plan, s0, n_sweeps=60, matmul_dtype=jnp.bfloat16,
        interpret=True, uniforms=u,
    )
    s = np.asarray(to_original(plan, out), np.float64)
    assert set(np.unique(s)) <= {-1.0, 1.0}
    m1 = s.mean(axis=0)
    m2 = (s[:, graph.edge_i] * s[:, graph.edge_j]).mean(axis=0)
    e1, e2 = exact_moments(np.asarray(h), graph.edge_i, graph.edge_j, np.asarray(j))
    np.testing.assert_allclose(m1, e1, atol=0.15)
    np.testing.assert_allclose(m2, e2, atol=0.15)


def test_supported_predicate_accounts_resident_dtype():
    """supported_by_pallas budgets the coupling at its RESIDENT itemsize:
    a bf16/int8 problem that fits VMEM must not be bounced to the slower
    HBM-streaming kernel by an f32-sized estimate (training/step.py passes
    the resolved matmul dtype's itemsize)."""
    from types import SimpleNamespace

    plan = SimpleNamespace(n_pad=2048, blocks=((0, 0, 128),))
    # f32: 2048²·4 = 16.8 MB coupling alone busts the 12 MB budget
    assert not supported_by_pallas(plan, 128, coupling_itemsize=4)
    # bf16: 8.4 MB coupling + 2·128·2048·4 spins + fields ≈ 10.9 MB — fits
    assert supported_by_pallas(plan, 128, coupling_itemsize=2)
    assert supported_by_pallas(plan, 128, coupling_itemsize=1)
