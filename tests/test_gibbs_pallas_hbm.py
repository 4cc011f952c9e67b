"""HBM-streamed Pallas Gibbs kernel: statistical correctness (interpret)."""

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
from image_generation_tpu.ops.gibbs_pallas_hbm import gibbs_sweeps_pallas_hbm
from image_generation_tpu.utils.subgraph import select_latent_graph
from image_generation_tpu.utils.topology import chimera_graph


@pytest.fixture(scope="module")
def tiny():
    g, _ = select_latent_graph(chimera_graph(2, 2, 3), 12, 11)
    graph = GRBMGraph.from_networkx(g)
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.uniform(-0.3, 0.3, graph.n).astype(np.float32))
    j = jnp.asarray(rng.uniform(-0.5, 0.5, graph.n_edges).astype(np.float32))
    return graph, h, j


def test_hbm_kernel_matches_exact_moments(tiny):
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=128)
    hp, cp = permuted_model(plan, h, j)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    n_sweeps = 40  # even (the kernel processes sweeps in pairs)
    s0 = random_spins(k1, plan, 512)
    u = jax.random.uniform(k2, (n_sweeps, 512, plan.n_pad))
    out = gibbs_sweeps_pallas_hbm(
        k2, hp, cp, plan, s0, n_sweeps, interpret=True, uniforms=u,
        block_dtype=jnp.float32, chain_block=256,
    )
    s = np.asarray(to_original(plan, out), np.float64)
    assert set(np.unique(s)) <= {-1.0, 1.0}
    m1 = s.mean(axis=0)
    m2 = (s[:, graph.edge_i] * s[:, graph.edge_j]).mean(axis=0)
    e1, e2 = exact_moments(np.asarray(h), graph.edge_i, graph.edge_j, np.asarray(j))
    np.testing.assert_allclose(m1, e1, atol=0.15)
    np.testing.assert_allclose(m2, e2, atol=0.15)


def test_hbm_kernel_bf16_blocks(tiny):
    """bf16 streamed blocks: distribution unchanged."""
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=128)
    hp, cp = permuted_model(plan, h, j)
    key = jax.random.PRNGKey(5)
    s0 = random_spins(key, plan, 512)
    u = jax.random.uniform(jax.random.fold_in(key, 1), (40, 512, plan.n_pad))
    out = gibbs_sweeps_pallas_hbm(
        key, hp, cp, plan, s0, 40, interpret=True, uniforms=u,
        block_dtype=jnp.bfloat16,
    )
    m1 = np.asarray(to_original(plan, out)).mean(axis=0)
    e1, _ = exact_moments(np.asarray(h), graph.edge_i, graph.edge_j, np.asarray(j))
    np.testing.assert_allclose(m1, e1, atol=0.15)


def test_odd_sweeps_rounded_up(tiny):
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=128)
    hp, cp = permuted_model(plan, h, j)
    key = jax.random.PRNGKey(7)
    s0 = random_spins(key, plan, 64)
    u = jax.random.uniform(key, (4, 64, plan.n_pad))  # 3 → rounds to 4
    out = gibbs_sweeps_pallas_hbm(
        key, hp, cp, plan, s0, 3, interpret=True, uniforms=u,
        block_dtype=jnp.float32,
    )
    assert out.shape == s0.shape
