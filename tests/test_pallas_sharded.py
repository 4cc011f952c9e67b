"""shard_map-wrapped Pallas Gibbs on the 8-device virtual mesh.

Uses the fed-uniforms interpret path (the TPU interpreter stubs the on-core
PRNG); validates shapes, ±1 support, per-shard stream decorrelation, and
statistical agreement with exact enumeration.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.ops.exact import exact_moments
from image_generation_tpu.ops.gibbs import (
    build_plan,
    permuted_model,
    random_spins,
    to_original,
)
from image_generation_tpu.ops.gibbs_pallas import gibbs_sweeps_pallas_sharded
from image_generation_tpu.parallel.mesh import create_mesh
from image_generation_tpu.utils.subgraph import select_latent_graph
from image_generation_tpu.utils.topology import chimera_graph


def test_sharded_pallas_kernel_moments():
    g, _ = select_latent_graph(chimera_graph(2, 2, 3), 12, 11)
    graph = GRBMGraph.from_networkx(g)
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.uniform(-0.3, 0.3, graph.n).astype(np.float32))
    j = jnp.asarray(rng.uniform(-0.5, 0.5, graph.n_edges).astype(np.float32))
    plan = build_plan(graph, pad_to=128)
    hp, cp = permuted_model(plan, h, j)
    mesh = create_mesh(8)

    key = jax.random.PRNGKey(0)
    n_chains = 256  # 32 per device (interpret mode is slow)
    n_sweeps = 20
    s0 = random_spins(key, plan, n_chains)
    u = jax.random.uniform(jax.random.fold_in(key, 1), (n_sweeps, n_chains, plan.n_pad))

    out = gibbs_sweeps_pallas_sharded(
        key, hp, cp, plan, s0, n_sweeps, mesh,
        interpret=True,  # fed-uniforms path: plain interpreter (TPU interpreter deadlocks under shard_map)
        uniforms=u,  # global; sharded over chains by the wrapper
        chain_block=32,
    )
    out = np.asarray(to_original(plan, out))
    assert out.shape == (n_chains, graph.n)
    assert set(np.unique(out)) <= {-1.0, 1.0}
    # shards see distinct uniforms: first two shard blocks differ
    assert not np.array_equal(out[:32], out[32:64])
    m1 = out.mean(axis=0)
    e1, _ = exact_moments(np.asarray(h), graph.edge_i, graph.edge_j, np.asarray(j))
    np.testing.assert_allclose(m1, e1, atol=0.2)


def test_sharded_hbm_kernel_matches_single_device():
    """The HBM-streaming kernel under shard_map (kernel_fn override):
    bit-identical to the single-device HBM kernel on the same uniforms."""
    from image_generation_tpu.ops.gibbs_pallas_hbm import gibbs_sweeps_pallas_hbm

    g, _ = select_latent_graph(chimera_graph(2, 2, 3), 12, 11)
    graph = GRBMGraph.from_networkx(g)
    rng = np.random.RandomState(1)
    h = jnp.asarray(rng.uniform(-0.3, 0.3, graph.n).astype(np.float32))
    j = jnp.asarray(rng.uniform(-0.5, 0.5, graph.n_edges).astype(np.float32))
    plan = build_plan(graph, pad_to=128)
    hp, cp = permuted_model(plan, h, j)
    mesh = create_mesh(8)
    key = jax.random.PRNGKey(3)
    n_chains, n_sweeps = 64, 4
    s0 = random_spins(key, plan, n_chains)
    u = jax.random.uniform(jax.random.fold_in(key, 1), (n_sweeps, n_chains, plan.n_pad))

    sharded = gibbs_sweeps_pallas_sharded(
        key, hp, cp, plan, s0, n_sweeps, mesh,
        kernel_fn=gibbs_sweeps_pallas_hbm,
        interpret=True, uniforms=u, block_dtype=jnp.float32, chain_block=8,
    )
    single = gibbs_sweeps_pallas_hbm(
        key, hp, cp, plan, s0, n_sweeps, interpret=True, uniforms=u,
        block_dtype=jnp.float32, chain_block=8,
    )
    np.testing.assert_array_equal(
        np.asarray(to_original(plan, sharded)), np.asarray(to_original(plan, single))
    )
