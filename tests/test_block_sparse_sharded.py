"""Block-sparse × graph-sharded composition (ops/block_sparse_sharded.py).

The packed per-shard layout must be a pure re-layout of the dense row
shards: sweeps, energies, and ΔE tracking bit-match the dense graph-sharded
path (couplings quantized to 1/256 so accumulation order is exact in f32;
int8 panels are exact by int32 accumulation), and the train step composes
it with PT and int8 under GRAPH_SHARDED.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.ops.block_sparse_sharded import (
    ShardedBlockSparseCoupling,
    pack_coupling_graph_sharded,
    sharded_chunk_meta,
    supports_sharded_block_sparse,
)
from image_generation_tpu.ops.gibbs import (
    build_plan,
    ising_energies,
    permuted_model,
    random_spins,
)
from image_generation_tpu.ops.gibbs_graph_sharded import (
    gibbs_sweeps_graph_sharded,
    ising_energies_graph_sharded,
)
from image_generation_tpu.ops.quant import quantize_coupling
from image_generation_tpu.parallel.mesh import create_mesh
from image_generation_tpu.utils.subgraph import select_latent_graph
from image_generation_tpu.utils.topology import zephyr_graph


@pytest.fixture(scope="module")
def medium():
    """64-spin Zephyr subgraph (n_pad=512), couplings on a 1/256 grid so
    every partial sum is exact in f32 — accumulation order (dense vs packed
    chunks, psum grouping) cannot change any field."""
    g, _ = select_latent_graph(zephyr_graph(2), 64, 3)
    graph = GRBMGraph.from_networkx(g)
    rng = np.random.RandomState(7)
    h = jnp.asarray(
        np.round(rng.uniform(-0.3, 0.3, graph.n) * 256) / 256
    ).astype(jnp.float32)
    j = jnp.asarray(
        np.round(rng.uniform(-0.5, 0.5, graph.n_edges) * 256) / 256
    ).astype(jnp.float32)
    plan = build_plan(graph)
    hp, cp = permuted_model(plan, h, j)
    return plan, hp, cp


def _unpack_to_dense(bsc: ShardedBlockSparseCoupling, n_pad: int):
    """Host-side scatter of every shard's panels back to (n_pad, n_pad)."""
    plan, chunk, P_ = bsc.plan, bsc.chunk, bsc.n_shards
    l_loc = n_pad // P_
    panels = np.asarray(bsc.panels, np.float32)
    offs = np.asarray(bsc.offs)
    per_shard = panels.shape[0] // P_
    out = np.zeros((n_pad, n_pad), np.float32)
    base = 0
    for c, ((c0, _v, c1), k_c) in enumerate(zip(plan.blocks, bsc.kmax)):
        w = c1 - c0
        for d in range(P_):
            for k in range(k_c):
                slot = base + k
                pan = panels[
                    d * per_shard + slot * chunk : d * per_shard
                    + (slot + 1) * chunk
                ]
                # unused slots are all-zero; += is safe either way
                r0 = d * l_loc + offs[d, slot]
                out[r0 : r0 + chunk, c0:c1] += pan[:, :w]
        base += k_c
    return out


@pytest.mark.parametrize("shape,chunk", [((4, 2), 64), ((2, 4), 24), ((1, 8), 16)])
def test_pack_roundtrip(medium, shape, chunk):
    """Scattering the per-shard panels back reproduces the dense matrix —
    incl. a chunk that does not divide the shard rows (clamped final chunk,
    overlap rows zeroed)."""
    plan, _hp, cp = medium
    mesh = create_mesh(8, shape=shape)
    bsc = pack_coupling_graph_sharded(plan, cp, mesh, chunk=chunk)
    dense = _unpack_to_dense(bsc, plan.n_pad)
    np.testing.assert_array_equal(dense, np.asarray(cp, np.float32))


@pytest.mark.parametrize("shape,chunk", [((4, 2), 64), ((2, 4), 24)])
def test_sweeps_bit_exact_vs_dense(medium, shape, chunk):
    """Same key, same model: the packed sweep's chains are BIT-IDENTICAL to
    the dense graph-sharded sweep's (grid couplings are order-exact and the
    uniform stream is keyed per global chain id, not per layout)."""
    plan, hp, cp = medium
    mesh = create_mesh(8, shape=shape)
    key = jax.random.PRNGKey(5)
    s0 = np.asarray(random_spins(jax.random.PRNGKey(6), plan, 64))
    out_dense = gibbs_sweeps_graph_sharded(
        key, hp, cp, plan, jnp.asarray(s0), 6, mesh
    )
    bsc = pack_coupling_graph_sharded(plan, cp, mesh, chunk=chunk)
    out_bs = gibbs_sweeps_graph_sharded(
        key, hp, bsc, plan, jnp.asarray(s0), 6, mesh
    )
    np.testing.assert_array_equal(np.asarray(out_dense), np.asarray(out_bs))


def test_energies_match(medium):
    plan, hp, cp = medium
    mesh = create_mesh(8, shape=(2, 4))
    bsc = pack_coupling_graph_sharded(plan, cp, mesh, chunk=32)
    s = np.random.RandomState(2).choice([-1.0, 1.0], size=(16, plan.n_pad))
    s = jnp.asarray(s, jnp.float32)
    e_ref = np.asarray(ising_energies(hp, cp, s))
    e_bs = np.asarray(ising_energies_graph_sharded(hp, bsc, s, mesh))
    np.testing.assert_allclose(e_bs, e_ref, rtol=1e-6)
    # the PT (T, C, n_pad) ladder shape too
    s3 = jnp.asarray(
        np.random.RandomState(3).choice([-1.0, 1.0], size=(4, 6, plan.n_pad)),
        jnp.float32,
    )
    e3 = np.asarray(ising_energies_graph_sharded(hp, bsc, s3, mesh))
    np.testing.assert_allclose(
        e3, np.asarray(ising_energies(hp, cp, s3)), rtol=1e-6
    )


def test_int8_composition_bit_exact(medium):
    """QuantCoupling panels: the packed int8 sweep samples the SAME
    quantized model as the dense graph-sharded int8 path, bit-for-bit
    (int32 accumulation is order-free), and quantized energies match."""
    plan, hp, cp = medium
    qc = quantize_coupling(cp)
    mesh = create_mesh(8, shape=(2, 4))
    key = jax.random.PRNGKey(11)
    s0 = np.asarray(random_spins(jax.random.PRNGKey(12), plan, 32))
    out_dense = gibbs_sweeps_graph_sharded(
        key, hp, qc, plan, jnp.asarray(s0), 4, mesh
    )
    bsc = pack_coupling_graph_sharded(plan, qc, mesh, chunk=32)
    assert bsc.quantized and bsc.panels.dtype == jnp.int8
    out_bs = gibbs_sweeps_graph_sharded(
        key, hp, bsc, plan, jnp.asarray(s0), 4, mesh
    )
    np.testing.assert_array_equal(np.asarray(out_dense), np.asarray(out_bs))
    e_dense = np.asarray(
        ising_energies_graph_sharded(hp, qc, out_dense, mesh)
    )
    e_bs = np.asarray(ising_energies_graph_sharded(hp, bsc, out_bs, mesh))
    np.testing.assert_array_equal(e_dense, e_bs)


def test_track_delta_e_consistency(medium):
    """Carried-energy contract (the PT hot path's invariant): E(s0) + ΔE
    from the packed sweep equals E(final) recomputed from scratch."""
    plan, hp, cp = medium
    mesh = create_mesh(8, shape=(2, 4))
    bsc = pack_coupling_graph_sharded(plan, cp, mesh, chunk=64)
    s0 = random_spins(jax.random.PRNGKey(3), plan, 16)
    e0 = ising_energies_graph_sharded(hp, bsc, s0, mesh)
    s1, de = gibbs_sweeps_graph_sharded(
        jax.random.PRNGKey(4), hp, bsc, plan, s0, 5, mesh, track_delta_e=True
    )
    e1 = ising_energies_graph_sharded(hp, bsc, s1, mesh)
    np.testing.assert_allclose(
        np.asarray(e0) + np.asarray(de), np.asarray(e1), rtol=1e-5, atol=1e-3
    )


def test_shard_count_mismatch_raises(medium):
    plan, hp, cp = medium
    bsc = pack_coupling_graph_sharded(
        plan, cp, create_mesh(8, shape=(2, 4)), chunk=64
    )
    mesh8 = create_mesh(8, shape=(1, 8))
    with pytest.raises(ValueError, match="graph shards"):
        gibbs_sweeps_graph_sharded(
            jax.random.PRNGKey(0), hp, bsc, plan,
            random_spins(jax.random.PRNGKey(1), plan, 8), 1, mesh8,
        )
    with pytest.raises(TypeError, match="graph-sharded packed"):
        ising_energies(hp, bsc, random_spins(jax.random.PRNGKey(1), plan, 8))


def test_supports_gate():
    """chunk must fit inside one row shard."""
    g, _ = select_latent_graph(zephyr_graph(2), 64, 3)
    plan = build_plan(GRBMGraph.from_networkx(g))  # n_pad = 512
    assert supports_sharded_block_sparse(plan, 4, 128)
    assert supports_sharded_block_sparse(plan, 8, 64)
    assert not supports_sharded_block_sparse(plan, 8, 128)  # chunk > 512/8
    assert not supports_sharded_block_sparse(plan, 3, 16)  # 3 ∤ 512
    meta = sharded_chunk_meta(plan, 4, 32)
    assert 0.0 < meta.occupancy <= 1.0
    assert meta.offs.shape == meta.zero_head.shape == (4, sum(meta.kmax))


def test_train_step_composes(monkeypatch):
    """GRAPH_SHARDED='on' + SWEEP_BLOCK_SPARSE='on': the fused step's
    negative phase sweeps the packed per-shard panels (sampler_impl says
    so), the cached coupling is the packed pytree with row-sharded panels,
    and the reconstruction loss (sampler-independent) matches the dense
    graph-sharded step."""
    from jax.sharding import PartitionSpec as P

    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.parallel.mesh import shard_batch, shard_train_state
    from image_generation_tpu.training.step import make_train_fns

    cfg = TrainingConfig(
        N_LATENTS=32, NUM_READS=64, BATCH_SIZE=32, N_REPLICAS=2,
        GIBBS_SWEEPS=2, GIBBS_BURN_IN=4,
        COMPUTE_DTYPE="float32", SAMPLER_MATMUL_DTYPE="float32",
        GRAPH_SHARDED="on", SWEEP_BLOCK_SPARSE="on", SWEEP_BS_CHUNK=64,
    )
    g, _ = select_latent_graph(zephyr_graph(3), cfg.N_LATENTS, 7)
    graph = GRBMGraph.from_networkx(g)
    mesh = create_mesh(8)
    fns = make_train_fns(cfg, graph, total_steps=10, mesh=mesh)
    assert fns.graph_sharded and fns.sampler_impl == "xla_graph_sharded+bs"

    images = jnp.round(
        jax.random.uniform(jax.random.PRNGKey(0), (cfg.BATCH_SIZE, 32, 32, 1))
    )
    state = fns.init(jax.random.PRNGKey(1), images[:1])
    assert isinstance(state.sampler_coupling, ShardedBlockSparseCoupling)
    assert state.sampler_coupling.panels.sharding.spec in (
        P("chain"), P("chain", None),
    )
    st = shard_train_state(state, mesh, graph_sharded=True)
    assert st.sampler_coupling.panels.sharding.spec == P("chain", None)
    s2, m2 = fns.step(st, shard_batch(images, mesh), jnp.asarray(0))
    assert np.isfinite(float(m2.dvae_loss))

    # dense graph-sharded reference: same seeds → same reconstruction loss
    fns_d = make_train_fns(
        cfg.replace(SWEEP_BLOCK_SPARSE="off"), graph, total_steps=10, mesh=mesh
    )
    assert fns_d.sampler_impl == "xla_graph_sharded"
    st_d = shard_train_state(
        fns_d.init(jax.random.PRNGKey(1), images[:1]), mesh, graph_sharded=True
    )
    _, m_d = fns_d.step(st_d, shard_batch(images, mesh), jnp.asarray(0))
    np.testing.assert_allclose(float(m2.mse), float(m_d.mse), rtol=1e-4)


def test_explicit_on_nonfitting_chunk_raises():
    """SWEEP_BLOCK_SPARSE='on' that can't be honored (chunk > rows/shard)
    must fail loudly, mirroring the GRAPH_SHARDED='on' contract — silently
    sweeping dense would defeat the memory budget the user asked for."""
    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.training.step import make_train_fns

    cfg = TrainingConfig(
        N_LATENTS=32, NUM_READS=16, BATCH_SIZE=16, N_REPLICAS=2,
        GIBBS_SWEEPS=2, GIBBS_BURN_IN=2, GRAPH_SHARDED="on",
        SWEEP_BLOCK_SPARSE="on", SWEEP_BS_CHUNK=128,  # > 512/8 rows/shard
    )
    g, _ = select_latent_graph(zephyr_graph(3), cfg.N_LATENTS, 7)
    graph = GRBMGraph.from_networkx(g)
    with pytest.raises(ValueError, match="SWEEP_BLOCK_SPARSE"):
        make_train_fns(
            cfg, graph, total_steps=10, mesh=create_mesh(8, shape=(1, 8))
        )
    # auto quietly falls back to the dense graph-sharded sweep
    fns = make_train_fns(
        cfg.replace(SWEEP_BLOCK_SPARSE="auto"), graph, total_steps=10,
        mesh=create_mesh(8, shape=(1, 8)),
    )
    assert fns.sampler_impl == "xla_graph_sharded"


def test_native_resume_packed(tmp_path):
    """Native save/resume with the packed composition: checkpoints never
    hold the derived panels (io/native_ckpt.py strips sampler state);
    restore rebuilds the ShardedBlockSparseCoupling row-sharded and training
    continues bit-exactly."""
    from jax.sharding import PartitionSpec as P

    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.parallel.mesh import create_mesh
    from image_generation_tpu.training.trainer import Trainer

    cfg = TrainingConfig(
        N_LATENTS=32, NUM_READS=16, BATCH_SIZE=16, DATASET_SIZE=32,
        N_REPLICAS=2, GIBBS_SWEEPS=2, GIBBS_BURN_IN=2,
        QPU="Advantage2_prototype", GRAPH_SHARDED="on",
        SWEEP_BLOCK_SPARSE="on", SWEEP_BS_CHUNK=64,
        SAMPLER="pt", PT_NUM_BETAS=4,
    )
    t1 = Trainer(config=cfg, mesh=create_mesh(8))
    t1.train_init(n_epochs=1)
    assert t1.fns.sampler_impl == "xla_graph_sharded+bs"
    t1.train_epoch(0)
    t1.save_native(tmp_path / "bs_gs")

    t2 = Trainer(config=cfg, mesh=create_mesh(8))
    t2.train_init(n_epochs=1)
    t2.resume_native(tmp_path / "bs_gs", n_epochs=1)
    cp = t2.state.sampler_coupling
    assert isinstance(cp, ShardedBlockSparseCoupling)
    assert cp.panels.sharding.spec in (P("chain"), P("chain", None))
    np.testing.assert_array_equal(
        np.asarray(t2.state.chains), np.asarray(t1.state.chains)
    )
    np.testing.assert_array_equal(
        np.asarray(cp.panels, np.float32),
        np.asarray(t1.state.sampler_coupling.panels, np.float32),
    )
    stats = t2.train_epoch(0)
    assert np.isfinite(stats["mse"])


def test_train_step_pt_int8_composes():
    """The full stack: PT ladder over 'data' × packed block-sparse int8
    graph shards over 'chain' — runs end to end with finite losses and the
    carried ladder energies stay consistent across steps."""
    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.parallel.mesh import shard_batch, shard_train_state
    from image_generation_tpu.training.step import make_train_fns

    cfg = TrainingConfig(
        N_LATENTS=32, NUM_READS=16, BATCH_SIZE=16, N_REPLICAS=2,
        GIBBS_SWEEPS=2, GIBBS_BURN_IN=2, SAMPLER="pt", PT_NUM_BETAS=8,
        GRAPH_SHARDED="on", SWEEP_BLOCK_SPARSE="on", SWEEP_BS_CHUNK=64,
        SAMPLER_MATMUL_DTYPE="int8", COMPUTE_DTYPE="float32",
    )
    g, _ = select_latent_graph(zephyr_graph(3), cfg.N_LATENTS, 7)
    graph = GRBMGraph.from_networkx(g)
    mesh = create_mesh(8)
    fns = make_train_fns(cfg, graph, total_steps=10, mesh=mesh)
    assert fns.sampler_impl == "xla_graph_sharded+int8+bs"

    images = jnp.round(
        jax.random.uniform(jax.random.PRNGKey(0), (cfg.BATCH_SIZE, 32, 32, 1))
    )
    state = fns.init(jax.random.PRNGKey(1), images[:1])
    assert state.sampler_coupling.quantized
    st = shard_train_state(state, mesh, graph_sharded=True)
    st, m = fns.step(st, shard_batch(images, mesh), jnp.asarray(0))
    assert np.isfinite(float(m.dvae_loss)) and np.isfinite(float(m.nll))
    # carried energies == recomputed energies of the carried chains
    from image_generation_tpu.ops.gibbs_graph_sharded import (
        ising_energies_graph_sharded,
    )

    e_re = ising_energies_graph_sharded(
        st.sampler_h, st.sampler_coupling, st.chains, mesh
    )
    np.testing.assert_allclose(
        np.asarray(st.chain_energies), np.asarray(e_re), rtol=1e-5, atol=1e-3
    )
