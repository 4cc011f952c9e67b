"""Int8-quantized sampler path (ops/quant.py).

The int8 sampler draws from the Boltzmann distribution of the QUANTIZED
model A' = scale * round(A / scale) — so correctness is pinned against
exact enumeration OF THAT model, not the f32 one: quantization commutes
with the permuted-model scatter (each matrix cell holds exactly one edge
value), so enumerating with per-edge j' = scale * round(j / scale)
enumerates exactly what the int8 kernels sample.

Covers the XLA sweep, PT, both Pallas kernels (interpret mode with fed
uniforms — bitwise against each other's semantics where deterministic),
the energy-carry consistency PT relies on, and the e2e training wiring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.ops.exact import exact_moments
from image_generation_tpu.ops.gibbs import (
    build_plan,
    gibbs_sweeps,
    ising_energies,
    permuted_model,
    pt_sample,
    random_spins,
    to_original,
)
from image_generation_tpu.ops.quant import (
    QuantCoupling,
    dequantize_coupling,
    quantize_coupling,
)
from image_generation_tpu.utils.subgraph import select_latent_graph
from image_generation_tpu.utils.topology import chimera_graph


@pytest.fixture(scope="module")
def tiny():
    g, _ = select_latent_graph(chimera_graph(2, 2, 3), 12, 11)
    graph = GRBMGraph.from_networkx(g)
    rng = np.random.RandomState(3)
    h = jnp.asarray(rng.uniform(-0.3, 0.3, graph.n).astype(np.float32))
    j = jnp.asarray(rng.uniform(-0.5, 0.5, graph.n_edges).astype(np.float32))
    return graph, h, j


def _quantized_edge_j(j, scale):
    """Per-edge couplings of the quantized model (matches quantize_coupling
    cell-wise because each cell holds exactly one edge value)."""
    return np.asarray(scale) * np.clip(
        np.round(np.asarray(j) / np.asarray(scale)), -127, 127
    )


def _empirical_moments(spins, graph):
    s = np.asarray(spins, np.float64)
    return s.mean(axis=0), (s[:, graph.edge_i] * s[:, graph.edge_j]).mean(axis=0)


def test_quantize_roundtrip_bound(tiny):
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=8)
    _, cp = permuted_model(plan, h, j)
    qc = quantize_coupling(cp)
    assert qc.q.dtype == jnp.int8
    a_deq = np.asarray(dequantize_coupling(qc))
    # symmetric, padding stays zero, error within half a level
    np.testing.assert_array_equal(a_deq, a_deq.T)
    half_level = float(qc.scale) / 2 + 1e-7
    assert np.max(np.abs(a_deq - np.asarray(cp))) <= half_level
    # zero matrix quantizes without a 0/0
    qz = quantize_coupling(jnp.zeros((8, 8)))
    assert float(qz.scale) == 1.0 and int(np.abs(np.asarray(qz.q)).max()) == 0


def test_int8_gibbs_matches_exact_moments_of_quantized_model(tiny):
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=8)
    hp, cp = permuted_model(plan, h, j)
    qc = quantize_coupling(cp)
    k_init, k_run = jax.random.split(jax.random.PRNGKey(5))
    s0 = random_spins(k_init, plan, 2048)
    s = jax.jit(
        lambda k, s: gibbs_sweeps(k, hp, qc, plan, s, n_sweeps=60)
    )(k_run, s0)
    m1, m2 = _empirical_moments(to_original(plan, s), graph)
    jq = _quantized_edge_j(j, qc.scale)
    e1, e2 = exact_moments(np.asarray(h), graph.edge_i, graph.edge_j, jq)
    np.testing.assert_allclose(m1, e1, atol=0.09)
    np.testing.assert_allclose(m2, e2, atol=0.09)


def test_int8_energies_match_dequantized_model(tiny):
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=8)
    hp, cp = permuted_model(plan, h, j)
    qc = quantize_coupling(cp)
    s = random_spins(jax.random.PRNGKey(0), plan, 64)
    e_int8 = ising_energies(hp, qc, s)
    e_ref = ising_energies(hp, dequantize_coupling(qc), s)
    np.testing.assert_allclose(np.asarray(e_int8), np.asarray(e_ref), rtol=1e-5)


def test_int8_pt_matches_exact_on_frustrated_model(tiny):
    graph, h, _ = tiny
    rng = np.random.RandomState(11)
    j = jnp.asarray(
        rng.choice([-0.6, 0.6], graph.n_edges).astype(np.float32)
    )
    plan = build_plan(graph, pad_to=8)
    hp, cp = permuted_model(plan, h, j)
    qc = quantize_coupling(cp)
    betas = jnp.geomspace(0.25, 1.0, 6)
    target, _ = jax.jit(
        lambda k: pt_sample(
            k, hp, qc, plan, n_chains=512, betas=betas, n_rounds=40,
            sweeps_per_round=2,
        )
    )(jax.random.PRNGKey(7))
    m1, m2 = _empirical_moments(to_original(plan, target), graph)
    jq = _quantized_edge_j(j, qc.scale)
    e1, e2 = exact_moments(np.asarray(h), graph.edge_i, graph.edge_j, jq)
    np.testing.assert_allclose(m1, e1, atol=0.12)
    np.testing.assert_allclose(m2, e2, atol=0.12)


def test_int8_energy_carry_consistent(tiny):
    """track_delta_e through the int8 path: E0 + ΣΔE == direct recompute —
    the invariant PT's carried ladder energies rely on."""
    graph, h, j = tiny
    plan = build_plan(graph, pad_to=8)
    hp, cp = permuted_model(plan, h, j)
    qc = quantize_coupling(cp)
    k_init, k_run = jax.random.split(jax.random.PRNGKey(9))
    s0 = random_spins(k_init, plan, 32)
    e0 = ising_energies(hp, qc, s0)
    s1, de = gibbs_sweeps(
        k_run, hp, qc, plan, s0, n_sweeps=5, track_delta_e=True
    )
    e1 = ising_energies(hp, qc, s1)
    np.testing.assert_allclose(
        np.asarray(e0 + de), np.asarray(e1), atol=1e-3
    )


def test_int8_pallas_vmem_interpret_matches_xla(tiny):
    """Fed-uniforms interpret run of the VMEM kernel vs the XLA int8 path:
    identical uniforms → identical spin trajectories (both compute the
    exact int32 field sums of the same quantized model)."""
    from image_generation_tpu.ops.gibbs_pallas import gibbs_sweeps_pallas

    graph, h, j = tiny
    plan = build_plan(graph, pad_to=128)  # kernel wants lane-width blocks
    hp, cp = permuted_model(plan, h, j)
    qc = quantize_coupling(cp)
    n_chains, n_sweeps = 16, 3
    s0 = random_spins(jax.random.PRNGKey(1), plan, n_chains)
    uniforms = jax.random.uniform(
        jax.random.PRNGKey(2), (n_sweeps, n_chains, plan.n_pad)
    )

    out_pallas, de_pallas = gibbs_sweeps_pallas(
        jax.random.PRNGKey(0), hp, qc, plan, s0, n_sweeps,
        interpret=True, uniforms=uniforms, track_delta_e=True,
    )

    # XLA reference consuming the same uniforms color-block-wise
    def xla_ref(s):
        de = jnp.zeros((n_chains,), jnp.float32)
        for i in range(n_sweeps):
            for c0, _v, c1 in plan.blocks:
                f_int = jax.lax.dot_general(
                    s.astype(jnp.int8), qc.q[:, c0:c1],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                # quantized units like the kernel: h/scale, β·scale
                fields = f_int.astype(jnp.float32) + hp[c0:c1] / qc.scale
                p = jax.nn.sigmoid(-2.0 * qc.scale * fields)
                new = jnp.where(uniforms[i, :, c0:c1] < p, 1.0, -1.0)
                de = de + jnp.sum(fields * (new - s[:, c0:c1]), axis=-1)
                s = s.at[:, c0:c1].set(new)
        return s, de * qc.scale

    s_ref, de_ref = xla_ref(s0)
    np.testing.assert_array_equal(np.asarray(out_pallas), np.asarray(s_ref))
    np.testing.assert_allclose(
        np.asarray(de_pallas), np.asarray(de_ref), rtol=1e-4, atol=1e-3
    )


def test_int8_pallas_hbm_interpret_matches_xla(tiny):
    from image_generation_tpu.ops.gibbs_pallas_hbm import gibbs_sweeps_pallas_hbm

    graph, h, j = tiny
    plan = build_plan(graph, pad_to=128)
    hp, cp = permuted_model(plan, h, j)
    qc = quantize_coupling(cp)
    n_chains, n_sweeps = 16, 2  # kernel rounds sweeps UP to even
    s0 = random_spins(jax.random.PRNGKey(4), plan, n_chains)
    uniforms = jax.random.uniform(
        jax.random.PRNGKey(6), (n_sweeps, n_chains, plan.n_pad)
    )
    out_hbm, de_hbm = gibbs_sweeps_pallas_hbm(
        jax.random.PRNGKey(0), hp, qc, plan, s0, n_sweeps,
        interpret=True, uniforms=uniforms, track_delta_e=True,
    )
    from image_generation_tpu.ops.gibbs_pallas import gibbs_sweeps_pallas

    out_vmem, de_vmem = gibbs_sweeps_pallas(
        jax.random.PRNGKey(0), hp, qc, plan, s0, n_sweeps,
        interpret=True, uniforms=uniforms, track_delta_e=True,
    )
    np.testing.assert_array_equal(np.asarray(out_hbm), np.asarray(out_vmem))
    np.testing.assert_allclose(
        np.asarray(de_hbm), np.asarray(de_vmem), rtol=1e-4, atol=1e-3
    )


def test_int8_sharded_pallas_matches_single_device(tiny):
    """QuantCoupling through the shard_map wrapper (the P() in_spec prefix
    must broadcast over the (q, scale) pytree): sharded int8 HBM kernel is
    bit-identical to the single-device int8 kernel on the same uniforms."""
    from image_generation_tpu.ops.gibbs_pallas import gibbs_sweeps_pallas_sharded
    from image_generation_tpu.ops.gibbs_pallas_hbm import gibbs_sweeps_pallas_hbm
    from image_generation_tpu.parallel.mesh import create_mesh

    graph, h, j = tiny
    plan = build_plan(graph, pad_to=128)
    hp, cp = permuted_model(plan, h, j)
    qc = quantize_coupling(cp)
    mesh = create_mesh(8)
    key = jax.random.PRNGKey(13)
    n_chains, n_sweeps = 64, 4
    s0 = random_spins(key, plan, n_chains)
    u = jax.random.uniform(
        jax.random.fold_in(key, 1), (n_sweeps, n_chains, plan.n_pad)
    )
    sharded = gibbs_sweeps_pallas_sharded(
        key, hp, qc, plan, s0, n_sweeps, mesh,
        kernel_fn=gibbs_sweeps_pallas_hbm,
        interpret=True, uniforms=u, chain_block=8,
    )
    single = gibbs_sweeps_pallas_hbm(
        key, hp, qc, plan, s0, n_sweeps, interpret=True, uniforms=u,
        chain_block=8,
    )
    np.testing.assert_array_equal(
        np.asarray(to_original(plan, sharded)),
        np.asarray(to_original(plan, single)),
    )


def test_int8_training_e2e_and_wiring():
    """SAMPLER_MATMUL_DTYPE='int8' trains end-to-end: the cached coupling is
    a QuantCoupling, the sampler_impl advertises the path, losses are
    finite, and a native save/restore round-trips (the derived quantized
    cache is stripped and rebuilt)."""
    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.training.trainer import Trainer

    cfg = TrainingConfig(
        N_LATENTS=32, BATCH_SIZE=16, N_REPLICAS=2, NUM_READS=32,
        DATASET_SIZE=64, GIBBS_SWEEPS=2, GIBBS_BURN_IN=4,
        SAMPLER="pt", PT_NUM_BETAS=4, SAMPLER_MATMUL_DTYPE="int8",
        USE_PALLAS="off", QPU="Advantage2_prototype",
    )
    t = Trainer(config=cfg)
    t.train_init(n_epochs=1)
    assert "+int8" in t.fns.sampler_impl
    assert isinstance(t.state.sampler_coupling, QuantCoupling)
    t.train(1)
    assert np.isfinite(t.losses["dvae_losses"]).all()

    import tempfile

    from image_generation_tpu.io.native_ckpt import (
        restore_train_state,
        save_train_state,
    )

    with tempfile.TemporaryDirectory() as d:
        save_train_state(d, t.state)
        restored = restore_train_state(
            d, t.state, rebuild_cache=t.fns.rebuild_cache
        )
    assert isinstance(restored.sampler_coupling, QuantCoupling)
    np.testing.assert_array_equal(
        np.asarray(restored.sampler_coupling.q),
        np.asarray(t.state.sampler_coupling.q),
    )
    np.testing.assert_array_equal(
        np.asarray(restored.chains), np.asarray(t.state.chains)
    )


def test_int8_graph_sharded_sweep_and_energies(tiny):
    """int8 × graph partitioning: the QuantCoupling's int8 rows shard over
    the graph axis, partial fields psum in int32 (exact for ±1 × int8), and
    the chains sample the QUANTIZED model's Boltzmann distribution.  Also:
    the sharded int8 sweep is bit-exact across graph-axis splits (int32
    partial sums have no reduction-order sensitivity at all), and the
    reduce_scatter energies match the single-device quantized energies."""
    from image_generation_tpu.ops.gibbs_graph_sharded import (
        gibbs_sweeps_graph_sharded,
        ising_energies_graph_sharded,
    )
    from image_generation_tpu.parallel.mesh import create_mesh

    graph, h, j = tiny
    plan = build_plan(graph, pad_to=8)
    hp, cp = permuted_model(plan, h, j)
    qc = quantize_coupling(cp)

    # bit-exact across graph-axis sizes (stronger than the f32 medium-graph
    # invariance test: int32 accumulation is order-exact unconditionally)
    key = jax.random.PRNGKey(2)
    s0 = np.asarray(random_spins(jax.random.PRNGKey(3), plan, 64))
    outs = [
        np.asarray(
            gibbs_sweeps_graph_sharded(
                key, hp, qc, plan, jnp.asarray(s0), 8, create_mesh(8, shape=shape)
            )
        )
        for shape in [(8, 1), (4, 2), (2, 4)]
    ]
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])

    # stationary distribution = exact Boltzmann of the quantized model
    mesh = create_mesh(8)  # (data=4, chain=2)
    s0 = random_spins(jax.random.PRNGKey(4), plan, 2048)
    s = jax.jit(
        lambda k, s: gibbs_sweeps_graph_sharded(k, hp, qc, plan, s, 60, mesh)
    )(jax.random.PRNGKey(5), s0)
    m1, m2 = _empirical_moments(to_original(plan, s), graph)
    jq = _quantized_edge_j(j, qc.scale)
    e1, e2 = exact_moments(np.asarray(h), graph.edge_i, graph.edge_j, jq)
    np.testing.assert_allclose(m1, e1, atol=0.09)
    np.testing.assert_allclose(m2, e2, atol=0.09)

    # energies through the int32 reduce_scatter = single-device quantized;
    # the coupling term is exact (int32), only the f32 h·s partials sum in
    # shard order → f32-rounding tolerance
    e_sharded = ising_energies_graph_sharded(hp, qc, s, mesh)
    e_single = ising_energies(hp, qc, jnp.asarray(np.asarray(s)))
    np.testing.assert_allclose(
        np.asarray(e_sharded), np.asarray(e_single), atol=1e-5
    )


def test_int8_graph_sharded_train_step():
    """GRAPH_SHARDED='on' + SAMPLER_MATMUL_DTYPE='int8' trains end to end:
    the cached coupling is a QuantCoupling whose int8 rows are sharded over
    'chain' (never materialized whole), scale replicated, and the sampler
    path advertises the composition."""
    from jax.sharding import PartitionSpec as P

    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.parallel.mesh import (
        create_mesh,
        shard_batch,
        shard_train_state,
    )
    from image_generation_tpu.training.step import make_train_fns
    from image_generation_tpu.utils.topology import zephyr_graph

    cfg = TrainingConfig(
        N_LATENTS=32, NUM_READS=64, BATCH_SIZE=32, N_REPLICAS=2,
        GIBBS_SWEEPS=2, GIBBS_BURN_IN=4, COMPUTE_DTYPE="float32",
        SAMPLER_MATMUL_DTYPE="int8", GRAPH_SHARDED="on",
    )
    g, _ = select_latent_graph(zephyr_graph(3), cfg.N_LATENTS, 7)
    graph = GRBMGraph.from_networkx(g)
    mesh = create_mesh(8)
    fns = make_train_fns(cfg, graph, total_steps=10, mesh=mesh)
    assert fns.graph_sharded
    assert fns.sampler_impl == "xla_graph_sharded+int8"

    images = jnp.round(
        jax.random.uniform(jax.random.PRNGKey(0), (cfg.BATCH_SIZE, 32, 32, 1))
    )
    state = fns.init(jax.random.PRNGKey(1), images[:1])
    assert isinstance(state.sampler_coupling, QuantCoupling)
    assert state.sampler_coupling.q.dtype == jnp.int8
    assert state.sampler_coupling.q.sharding.spec in (
        P("chain"), P("chain", None),
    )
    st = shard_train_state(state, mesh, graph_sharded=True)
    assert st.sampler_coupling.q.sharding.spec == P("chain", None)
    s2, m2 = fns.step(st, shard_batch(images, mesh), jnp.asarray(0))
    assert np.isfinite(float(m2.dvae_loss))
    assert isinstance(s2.sampler_coupling, QuantCoupling)
    assert s2.chains.sharding.spec == P("data", "chain")


def test_config_rejects_unknown_sampler_dtype():
    from image_generation_tpu.config import TrainingConfig

    with pytest.raises(ValueError, match="SAMPLER_MATMUL_DTYPE"):
        TrainingConfig(SAMPLER_MATMUL_DTYPE="int4")
