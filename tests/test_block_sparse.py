"""Block-sparse sweeps (ops/block_sparse.py): packing, exactness, sampling.

The packed occupied-chunk representation must be a pure re-layout: sweeps
and energies over a BlockSparseCoupling have to match the dense paths —
bit-for-bit with integer-valued couplings (integer fields are exact in f32
regardless of summation order), to float tolerance otherwise — and the
training step must carry it transparently through PT ladder energies,
persistent chains, and checkpoint-cache rebuilds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import networkx as nx
import pytest

from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.ops.block_sparse import (
    BlockSparseCoupling,
    chunk_occupancy,
    chunk_starts,
    color_chunk_rows,
    gibbs_sweeps_block_sparse,
    ising_energies_block_sparse,
    pack_coupling,
    panel_offsets,
)
from image_generation_tpu.ops.exact import exact_moments
from image_generation_tpu.ops.gibbs import (
    build_plan,
    gibbs_sweeps,
    ising_energies,
    permuted_model,
    pt_round,
    random_spins,
    to_original,
)
from image_generation_tpu.ops.quant import quantize_coupling


@pytest.fixture(scope="module")
def medium():
    """60-node regular graph, pad_to=8 — small enough for fast CPU sweeps,
    chunked finely enough to exercise multi-chunk colors."""
    G = nx.random_regular_graph(6, 60, seed=3)
    G = nx.relabel_nodes(G, {v: i for i, v in enumerate(sorted(G.nodes()))})
    graph = GRBMGraph.from_networkx(G)
    plan = build_plan(graph, pad_to=8)
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.randn(graph.n).astype(np.float32))
    q = jnp.asarray(rng.randn(graph.n_edges).astype(np.float32))
    hp, cp = permuted_model(plan, h, q)
    return graph, plan, hp, cp


def _dense_from_panels(plan, bsc):
    """Reconstruct the dense matrix a BlockSparseCoupling encodes."""
    starts = chunk_starts(plan.n_pad, bsc.chunk)
    rows = color_chunk_rows(plan, bsc.chunk)
    offs, _ = panel_offsets(plan, bsc.chunk)
    out = np.zeros((plan.n_pad, plan.n_pad), np.float32)
    panels = np.asarray(bsc.panels, np.float32)
    for c, (c0, _v, c1) in enumerate(plan.blocks):
        for k, r in enumerate(rows[c]):
            pan = panels[(offs[c] + k) * bsc.chunk : (offs[c] + k + 1) * bsc.chunk]
            out[starts[r] : starts[r] + bsc.chunk, c0:c1] += pan[:, : c1 - c0]
    if bsc.quantized:
        out *= float(bsc.scale)
    return out


@pytest.mark.parametrize("chunk", [8, 24])  # 24 ∤ n_pad → clamped final chunk
def test_pack_roundtrip_dense(medium, chunk):
    _, plan, hp, cp = medium
    bsc = pack_coupling(plan, cp, chunk=chunk)
    np.testing.assert_array_equal(_dense_from_panels(plan, bsc), np.asarray(cp))


def test_pack_roundtrip_int8(medium):
    _, plan, hp, cp = medium
    qc = quantize_coupling(cp)
    bsc = pack_coupling(plan, qc, chunk=8)
    assert bsc.quantized and bsc.panels.dtype == jnp.int8
    np.testing.assert_allclose(
        _dense_from_panels(plan, bsc),
        np.asarray(qc.q, np.float32) * float(qc.scale),
        rtol=1e-6,
    )


def test_chunk_rows_cover_every_edge(medium):
    _, plan, *_ = medium
    for chunk in (8, 16, 24):
        starts = np.asarray(chunk_starts(plan.n_pad, chunk))
        rows = color_chunk_rows(plan, chunk)
        block_of = np.zeros(plan.n_pad, np.int32)
        for bi, (s, _v, e) in enumerate(plan.blocks):
            block_of[s:e] = bi
        for pi, pj in zip(plan.perm_edge_i, plan.perm_edge_j):
            for row, col in ((pi, pj), (pj, pi)):
                cb = block_of[col]
                covered = [
                    r for r in rows[cb]
                    if starts[r] <= row < starts[r] + chunk
                ]
                assert covered, f"row {row} of color {cb} uncovered"
        assert 0 < chunk_occupancy(plan, chunk) <= 1.0


@pytest.mark.parametrize("chunk", [8, 24])
def test_energies_match_dense(medium, chunk):
    _, plan, hp, cp = medium
    s = random_spins(jax.random.PRNGKey(1), plan, 16)
    bsc = pack_coupling(plan, cp, chunk=chunk)
    np.testing.assert_allclose(
        np.asarray(ising_energies_block_sparse(hp, bsc, s)),
        np.asarray(ising_energies(hp, cp, s)),
        rtol=1e-5,
    )
    # the generic entry point must dispatch on the packed type
    np.testing.assert_allclose(
        np.asarray(ising_energies(hp, bsc, s)),
        np.asarray(ising_energies(hp, cp, s)),
        rtol=1e-5,
    )


@pytest.mark.parametrize("chunk", [8, 24])
def test_xla_sweep_bit_exact_integer_couplings(medium, chunk):
    """±1 couplings → integer fields, exact in f32 in any summation order:
    the packed sweep must reproduce the dense sweep bit-for-bit."""
    graph, plan, _, _ = medium
    rng = np.random.RandomState(2)
    h = jnp.asarray(np.round(rng.randn(graph.n)).astype(np.float32))
    q = jnp.asarray(rng.choice([-1.0, 1.0], graph.n_edges).astype(np.float32))
    hp, cp = permuted_model(plan, h, q)
    bsc = pack_coupling(plan, cp, chunk=chunk)
    s0 = random_spins(jax.random.PRNGKey(2), plan, 8)
    k = jax.random.PRNGKey(7)
    a, dea = gibbs_sweeps(k, hp, cp, plan, s0, 3, track_delta_e=True)
    b, deb = gibbs_sweeps_block_sparse(
        k, hp, bsc, plan, s0, 3, track_delta_e=True
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(dea), np.asarray(deb))
    # generic entry point dispatches on the packed type
    c = gibbs_sweeps(k, hp, bsc, plan, s0, 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    # int8 packed vs int8 dense (integer quantized units — exact)
    qc = quantize_coupling(cp)
    bq, debq = gibbs_sweeps(k, hp, qc, plan, s0, 3, track_delta_e=True)
    bb, debb = gibbs_sweeps_block_sparse(
        k, hp, pack_coupling(plan, qc, chunk=chunk), plan, s0, 3,
        track_delta_e=True,
    )
    np.testing.assert_array_equal(np.asarray(bq), np.asarray(bb))
    np.testing.assert_allclose(np.asarray(debq), np.asarray(debb), rtol=1e-6)


def test_delta_e_exact(medium):
    _, plan, hp, cp = medium
    bsc = pack_coupling(plan, cp, chunk=8)
    s0 = random_spins(jax.random.PRNGKey(3), plan, 16)
    e0 = ising_energies_block_sparse(hp, bsc, s0)
    s1, de = gibbs_sweeps_block_sparse(
        jax.random.PRNGKey(4), hp, bsc, plan, s0, 5, track_delta_e=True
    )
    e1 = ising_energies_block_sparse(hp, bsc, s1)
    np.testing.assert_allclose(
        np.asarray(e0 + de), np.asarray(e1), rtol=1e-4, atol=1e-4
    )


def test_matches_exact_moments():
    """The packed sweep must sample the same Boltzmann distribution —
    moments vs exact enumeration on a small graph."""
    G = nx.random_regular_graph(4, 14, seed=1)
    G = nx.relabel_nodes(G, {v: i for i, v in enumerate(sorted(G.nodes()))})
    graph = GRBMGraph.from_networkx(G)
    plan = build_plan(graph, pad_to=8)
    rng = np.random.RandomState(5)
    h = rng.uniform(-0.4, 0.4, graph.n).astype(np.float32)
    q = rng.uniform(-0.6, 0.6, graph.n_edges).astype(np.float32)
    hp, cp = permuted_model(plan, jnp.asarray(h), jnp.asarray(q))
    bsc = pack_coupling(plan, cp, chunk=8)
    s = random_spins(jax.random.PRNGKey(6), plan, 2048)
    s = gibbs_sweeps_block_sparse(jax.random.PRNGKey(7), hp, bsc, plan, s, 300)
    spins = np.asarray(to_original(plan, s))
    m1 = spins.mean(axis=0)
    m2 = (spins[:, graph.edge_i] * spins[:, graph.edge_j]).mean(axis=0)
    e1, e2 = exact_moments(h, graph.edge_i, graph.edge_j, q)
    assert np.abs(m1 - e1).max() < 0.08
    assert np.abs(m2 - e2).max() < 0.08


@pytest.mark.parametrize("quant", [False, True])
def test_pallas_hbm_kernel_matches_dense(quant):
    """Fed-uniforms interpret mode: the block-sparse HBM kernel must equal
    the dense HBM kernel bit-for-bit on integer couplings (f32 and int8)."""
    from image_generation_tpu.ops.gibbs_pallas_hbm import gibbs_sweeps_pallas_hbm

    G = nx.random_regular_graph(6, 200, seed=3)
    G = nx.relabel_nodes(G, {v: i for i, v in enumerate(sorted(G.nodes()))})
    graph = GRBMGraph.from_networkx(G)
    plan = build_plan(graph)  # pad_to=128: kernel-shaped
    rng = np.random.RandomState(0)
    h = jnp.asarray(np.round(rng.randn(graph.n)).astype(np.float32))
    q = jnp.asarray(rng.choice([-1.0, 1.0], graph.n_edges).astype(np.float32))
    hp, cp = permuted_model(plan, h, q)
    dense = quantize_coupling(cp) if quant else cp
    n_chains, n_sweeps = 8, 4
    s0 = random_spins(jax.random.PRNGKey(2), plan, n_chains)
    u = jax.random.uniform(
        jax.random.PRNGKey(5), (n_sweeps, n_chains, plan.n_pad)
    )
    key = jax.random.PRNGKey(7)
    a, dea = gibbs_sweeps_pallas_hbm(
        key, hp, dense, plan, s0, n_sweeps, block_dtype=jnp.float32,
        interpret=True, uniforms=u, track_delta_e=True,
    )
    for chunk in (128, 256):  # 256 ∤ n_pad → clamped final chunk in-kernel
        bsc = pack_coupling(plan, dense, chunk=chunk)
        b, deb = gibbs_sweeps_pallas_hbm(
            key, hp, bsc, plan, s0, n_sweeps,
            interpret=True, uniforms=u, track_delta_e=True,
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(dea), np.asarray(deb), rtol=1e-6)


def test_pt_round_carries_packed_energies(medium):
    """pt_round with a packed coupling: carried energies must stay
    consistent with recomputation under the packed model."""
    _, plan, hp, cp = medium
    bsc = pack_coupling(plan, cp, chunk=8)
    T, C = 4, 8
    betas = jnp.geomspace(0.5, 1.0, T)
    s0 = random_spins(jax.random.PRNGKey(8), plan, T * C).reshape(T, C, plan.n_pad)
    e0 = ising_energies(hp, bsc, s0)
    s1, e1 = pt_round(
        jax.random.PRNGKey(9), hp, bsc, plan, s0, betas, 3,
        energies=e0, return_energies=True,
    )
    np.testing.assert_allclose(
        np.asarray(e1), np.asarray(ising_energies(hp, bsc, s1)),
        rtol=1e-4, atol=1e-4,
    )


def test_step_level_block_sparse():
    """make_train_fns(SWEEP_BLOCK_SPARSE='on'): the packed cache rides
    TrainState, steps run, and the carried PT ladder energies stay
    consistent with the packed model."""
    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.training.step import make_train_fns
    from image_generation_tpu.utils.subgraph import select_latent_graph
    from image_generation_tpu.utils.topology import chimera_graph

    g, _ = select_latent_graph(chimera_graph(2, 2, 3), 16, 11)
    graph = GRBMGraph.from_networkx(g)
    cfg = TrainingConfig(
        N_LATENTS=graph.n, NUM_READS=8, BATCH_SIZE=4, N_REPLICAS=2,
        GIBBS_SWEEPS=2, GIBBS_BURN_IN=4, SAMPLER="pt", PT_NUM_BETAS=3,
        SWEEP_BLOCK_SPARSE="on", SWEEP_BS_CHUNK=128, USE_PALLAS="off",
    )
    fns = make_train_fns(cfg, graph, total_steps=4)
    assert fns.sampler_impl.endswith("+bs"), fns.sampler_impl
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 32, 32, 1), jnp.float32)
    state = fns.init(key, img)
    assert isinstance(state.sampler_coupling, BlockSparseCoupling)
    batch = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 1))
    for _ in range(2):
        state, metrics = fns.step(state, batch, jnp.asarray(0))
    assert np.isfinite(float(metrics.mse))
    # carried ladder energies == recomputation under the packed cache
    np.testing.assert_allclose(
        np.asarray(state.chain_energies),
        np.asarray(
            ising_energies(state.sampler_h, state.sampler_coupling, state.chains)
        ),
        rtol=1e-4, atol=1e-4,
    )
    # cache rebuild (the checkpoint-restore path) reproduces the packed form
    rebuilt = fns.rebuild_cache(state.replace(sampler_coupling=None, sampler_h=None))
    np.testing.assert_array_equal(
        np.asarray(rebuilt.sampler_coupling.panels),
        np.asarray(state.sampler_coupling.panels),
    )


def test_auto_gate_small_graph_stays_dense():
    """auto: small graphs (n_pad < 2048) keep the dense path."""
    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.training.step import make_train_fns
    from image_generation_tpu.utils.subgraph import select_latent_graph
    from image_generation_tpu.utils.topology import chimera_graph

    g, _ = select_latent_graph(chimera_graph(2, 2, 3), 16, 11)
    graph = GRBMGraph.from_networkx(g)
    cfg = TrainingConfig(
        N_LATENTS=graph.n, NUM_READS=8, BATCH_SIZE=4, N_REPLICAS=2,
        GIBBS_SWEEPS=2, GIBBS_BURN_IN=4, USE_PALLAS="off",
    )
    fns = make_train_fns(cfg, graph, total_steps=4)
    assert "+bs" not in fns.sampler_impl


def test_auto_block_sparse_wins_over_vmem_kernel():
    """At the overlap the resident-dtype VMEM gate opened (low-occupancy
    n_pad=2048 graphs, where bf16 storage fits VMEM *and* 'auto'
    block-sparse engages), the packed streaming path must win — measured
    0.75 vs 0.91 ms/refresh dense-VMEM on chip
    (runs/vmem_midsize_bench_grid.json; training/step.py selection)."""
    import networkx as nx

    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.ops.block_sparse import chunk_occupancy
    from image_generation_tpu.ops.gibbs import build_plan as _bp
    from image_generation_tpu.ops.gibbs_pallas import supported_by_pallas
    from image_generation_tpu.training.step import make_train_fns

    g = nx.grid_2d_graph(45, 45)
    g = nx.relabel_nodes(g, {v: i for i, v in enumerate(sorted(g.nodes()))})
    graph = GRBMGraph.from_networkx(g)
    plan = _bp(graph)
    assert plan.n_pad == 2048  # bf16 storage policy engages here
    assert chunk_occupancy(plan, 128) <= 0.75  # 'auto' engages too
    assert supported_by_pallas(plan, 128, coupling_itemsize=2)  # conflict
    cfg = TrainingConfig(
        N_LATENTS=graph.n, NUM_READS=128, BATCH_SIZE=4, N_REPLICAS=2,
        GIBBS_SWEEPS=2, GIBBS_BURN_IN=4, USE_PALLAS="on",
        SWEEP_BLOCK_SPARSE="auto", SWEEP_BS_CHUNK=128,
    )
    fns = make_train_fns(cfg, graph, total_steps=4, plan=plan)
    assert fns.sampler_impl == "pallas_hbm+bs", fns.sampler_impl


def test_config_validation():
    from image_generation_tpu.config import TrainingConfig

    # YAML 1.1 'on'/'off' arrive as bools — normalized like GRAPH_SHARDED
    assert TrainingConfig(SWEEP_BLOCK_SPARSE=True).SWEEP_BLOCK_SPARSE == "on"
    assert TrainingConfig(SWEEP_BLOCK_SPARSE=False).SWEEP_BLOCK_SPARSE == "off"
    with pytest.raises(ValueError, match="SWEEP_BLOCK_SPARSE"):
        TrainingConfig(SWEEP_BLOCK_SPARSE="yes")


def test_sharded_hbm_kernel_block_sparse_matches_single_device():
    """BlockSparseCoupling through the shard_map wrapper (the multi-chip
    training path): bit-identical to the single-device packed kernel on the
    same uniforms — the packed pytree must ride shard_map's replicated
    specs like the dense coupling does."""
    from image_generation_tpu.ops.gibbs_pallas import gibbs_sweeps_pallas_sharded
    from image_generation_tpu.ops.gibbs_pallas_hbm import gibbs_sweeps_pallas_hbm
    from image_generation_tpu.parallel.mesh import create_mesh
    from image_generation_tpu.utils.subgraph import select_latent_graph
    from image_generation_tpu.utils.topology import chimera_graph

    g, _ = select_latent_graph(chimera_graph(2, 2, 3), 12, 11)
    graph = GRBMGraph.from_networkx(g)
    rng = np.random.RandomState(1)
    h = jnp.asarray(rng.uniform(-0.3, 0.3, graph.n).astype(np.float32))
    q = jnp.asarray(rng.uniform(-0.5, 0.5, graph.n_edges).astype(np.float32))
    plan = build_plan(graph, pad_to=128)
    hp, cp = permuted_model(plan, h, q)
    bsc = pack_coupling(plan, cp, chunk=128)
    mesh = create_mesh(8)
    key = jax.random.PRNGKey(3)
    n_chains, n_sweeps = 64, 4
    s0 = random_spins(key, plan, n_chains)
    u = jax.random.uniform(
        jax.random.fold_in(key, 1), (n_sweeps, n_chains, plan.n_pad)
    )
    sharded = gibbs_sweeps_pallas_sharded(
        key, hp, bsc, plan, s0, n_sweeps, mesh,
        kernel_fn=gibbs_sweeps_pallas_hbm,
        interpret=True, uniforms=u, chain_block=8,
    )
    # reference: each shard's rows through the single-device packed kernel
    # with the SAME folded key/uniform slice the wrapper hands that shard
    per = n_chains // 8
    parts = []
    for shard in range(8):
        rows = slice(shard * per, (shard + 1) * per)
        k = jax.random.fold_in(key, shard)
        parts.append(
            gibbs_sweeps_pallas_hbm(
                k, hp, bsc, plan, s0[rows], n_sweeps,
                interpret=True, uniforms=u[:, rows], chain_block=8,
            )
        )
    np.testing.assert_array_equal(
        np.asarray(sharded), np.concatenate([np.asarray(p) for p in parts])
    )


def test_sweep_rejects_mismatched_matmul_dtype(medium):
    """The packed panels carry the matmul dtype from pack time; a caller
    asking for DIFFERENT math must fail loudly instead of silently getting
    the panels' dtype (ops/block_sparse.gibbs_sweeps_block_sparse)."""
    _, plan, hp, cp = medium
    bsc = pack_coupling(plan, cp.astype(jnp.float32), chunk=8)
    s0 = random_spins(jax.random.PRNGKey(0), plan, 4)
    with pytest.raises(ValueError, match="resident"):
        gibbs_sweeps_block_sparse(
            jax.random.PRNGKey(1), hp, bsc, plan, s0, 1,
            matmul_dtype=jnp.bfloat16,
        )
    # matching / None dtypes pass
    out = gibbs_sweeps_block_sparse(
        jax.random.PRNGKey(1), hp, bsc, plan, s0, 1,
        matmul_dtype=jnp.float32,
    )
    assert out.shape == s0.shape


def test_plan_caches_do_not_pin_plans(medium):
    """The packing-layout caches are weak-keyed: dropping a plan must free
    its cache entries (warm servers swap models; an lru_cache here would
    grow without bound — same contract as gibbs._class_spans_cache)."""
    import gc

    import networkx as nx

    from image_generation_tpu.ops.block_sparse import _chunk_rows_cache
    from image_generation_tpu.ops.block_sparse_sharded import (
        _sharded_meta_cache,
        sharded_chunk_meta,
    )

    import weakref

    G = nx.random_regular_graph(4, 32, seed=9)
    G = nx.relabel_nodes(G, {v: i for i, v in enumerate(sorted(G.nodes()))})
    graph = GRBMGraph.from_networkx(G)
    plan = build_plan(graph, pad_to=8)
    color_chunk_rows(plan, 8)
    sharded_chunk_meta(plan, 2, 8)
    assert plan in _chunk_rows_cache and plan in _sharded_meta_cache
    probe = weakref.ref(plan)
    del plan
    gc.collect()
    assert probe() is None, "a packing cache still pins the dropped plan"
    # a NEW equal plan recomputes (and re-caches) without error
    plan2 = build_plan(graph, pad_to=8)
    assert color_chunk_rows(plan2, 8) == color_chunk_rows(plan2, 8)
