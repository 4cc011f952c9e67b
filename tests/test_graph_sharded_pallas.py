"""Pallas Bernoulli-update kernel composed with the graph-sharded sweep.

VERDICT r3 item 2: the beyond-HBM regime must not forfeit the Pallas kernel
wins.  ops/gibbs_graph_sharded_pallas.py plugs the kernels' hardware-PRNG
Bernoulli update into the graph-sharded sweep body between its XLA
matmul/psum steps.  These tests pin the FED-uniform kernel variant (the
plain interpreter runs it under shard_map; the hardware-PRNG variant is
TPU-only and validated on chip by scripts/bench_sampler.py --ablate-spans)
bit-exact against the XLA body's own threefry stream — dense, int8, and
packed block-sparse — on the 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.ops.gibbs import build_plan, permuted_model, random_spins
from image_generation_tpu.ops.gibbs_graph_sharded import (
    gibbs_sweeps_graph_sharded,
)
from image_generation_tpu.ops.gibbs_graph_sharded_pallas import (
    xla_stream_uniforms,
)
from image_generation_tpu.parallel.mesh import create_mesh
from image_generation_tpu.utils.subgraph import select_latent_graph
from image_generation_tpu.utils.topology import zephyr_graph


@pytest.fixture(scope="module")
def medium():
    """64-spin Zephyr subgraph, couplings quantized to 1/256 (order-exact in
    f32 — accumulation grouping cannot change any field), as in
    tests/test_graph_sharded.py."""
    g, _ = select_latent_graph(zephyr_graph(2), 64, 3)
    graph = GRBMGraph.from_networkx(g)
    rng = np.random.RandomState(7)
    h = jnp.asarray(np.round(rng.uniform(-0.3, 0.3, graph.n) * 256) / 256).astype(
        jnp.float32
    )
    j = jnp.asarray(
        np.round(rng.uniform(-0.5, 0.5, graph.n_edges) * 256) / 256
    ).astype(jnp.float32)
    return graph, h, j


def _run_both(plan, hp, cp, mesh, n_chains=32, n_sweeps=4, seed=3, **kw):
    key = jax.random.PRNGKey(seed)
    s0 = jnp.asarray(
        np.asarray(random_spins(jax.random.PRNGKey(seed + 1), plan, n_chains))
    )
    ref = gibbs_sweeps_graph_sharded(key, hp, cp, plan, s0, n_sweeps, mesh, **kw)
    u = xla_stream_uniforms(key, plan, n_chains, n_sweeps)
    out = gibbs_sweeps_graph_sharded(
        key, hp, cp, plan, s0, n_sweeps, mesh,
        pallas_update=True, pallas_interpret=True, uniforms=u, **kw,
    )
    return ref, out


def test_pallas_update_bitexact_vs_xla_dense(medium):
    """Fed the XLA body's exact uniform stream, the Pallas-update sweep is
    BIT-EXACT against the XLA sweep — across graph-axis splits."""
    graph, h, j = medium
    plan = build_plan(graph)
    hp, cp = permuted_model(plan, h, j)
    for shape in [(4, 2), (2, 4)]:
        ref, out = _run_both(plan, hp, cp, create_mesh(8, shape=shape))
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_pallas_update_bitexact_int8(medium):
    """The kernel sees f32 real-unit fields whatever the coupling form: the
    int8 QuantCoupling composition stays bit-exact (int32 psum, one
    scale-out before the update)."""
    from image_generation_tpu.ops.quant import quantize_coupling

    graph, h, j = medium
    plan = build_plan(graph)
    hp, cp = permuted_model(plan, h, j)
    qc = quantize_coupling(cp)
    ref, out = _run_both(plan, hp, qc, create_mesh(8, shape=(2, 4)))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_pallas_update_bitexact_block_sparse(medium):
    """Packed per-shard block-sparse panels feed the same update kernel —
    bit-exact vs the XLA packed sweep, with ΔE tracking riding along."""
    from image_generation_tpu.ops.block_sparse_sharded import (
        pack_coupling_graph_sharded,
        supports_sharded_block_sparse,
    )

    graph, h, j = medium
    plan = build_plan(graph)
    hp, cp = permuted_model(plan, h, j)
    mesh = create_mesh(8, shape=(2, 4))
    assert supports_sharded_block_sparse(plan, 4, 16)
    bsc = pack_coupling_graph_sharded(plan, cp, mesh, chunk=16)
    (ref, de_ref), (out, de_out) = _run_both(
        plan, hp, bsc, mesh, track_delta_e=True
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    np.testing.assert_allclose(
        np.asarray(de_ref), np.asarray(de_out), rtol=1e-6, atol=1e-6
    )


def test_pick_tile_respects_vmem_budget():
    """The update kernel's row tile must shrink as the span widens: a
    greedy coloring can put O(n/2) columns in ONE class span at beyond-HBM
    sizes, and a fixed 256-row tile would blow VMEM (3 × tile × width f32
    buffers).  Always ≥ 1, always a divisor of the chain count, ≤ 256."""
    from image_generation_tpu.ops.gibbs_graph_sharded_pallas import _pick_tile

    assert _pick_tile(512, width=128) == 256          # narrow span: cap wins
    assert _pick_tile(96, width=128) == 96            # tile ≤ c_loc
    # 3 buffers × tile × width × 4 B must stay ~≤ 6 MB
    for c_loc in (256, 384, 2048):
        for width in (128, 2000, 16384, 120000):
            t = _pick_tile(c_loc, width)
            assert t >= 1 and c_loc % t == 0
            assert 3 * t * width * 4 <= 6 << 20, (c_loc, width, t)
    # the motivating case: a 16k-wide class span → tile ≤ 32 rows
    assert _pick_tile(2048, width=16384) <= 32


def test_group_seeds_factorization_invariant():
    """PLRNG_ROW_SEED's defining property: the per-8-row-group hardware-PRNG
    seeds depend only on (span key, GLOBAL row ids) — computing them for a
    whole chain range equals concatenating any shard split of it, so the
    drawn stream survives mesh refactoring (the default tile seeding's
    documented gap).  Graph-axis peers (same rows, same key) trivially
    agree."""
    from image_generation_tpu.ops.gibbs_graph_sharded_pallas import (
        _ROW_SEED_GROUP,
        _group_seeds,
    )

    k = jax.random.PRNGKey(11)
    whole = _group_seeds(k, jnp.arange(64), _ROW_SEED_GROUP)
    for n_shards in (2, 4, 8):
        rows = 64 // n_shards
        parts = jnp.concatenate([
            _group_seeds(k, i * rows + jnp.arange(rows), _ROW_SEED_GROUP)
            for i in range(n_shards)
        ])
        np.testing.assert_array_equal(np.asarray(whole), np.asarray(parts))


def test_pick_tile_grouped():
    """Row-seeded tiles stay whole numbers of 8-row seed groups, divide the
    chain count, and respect the same VMEM budget as `_pick_tile`."""
    from image_generation_tpu.ops.gibbs_graph_sharded_pallas import (
        _pick_tile_grouped,
    )

    # 65536 is the widest span whose 8-row minimum tile fits the VMEM
    # budget; wider spans raise (test_pick_tile_grouped_rejects_vmem_blowout)
    for c_loc in (8, 24, 256, 2048):
        for width in (128, 2000, 16384, 65536):
            t = _pick_tile_grouped(c_loc, width)
            assert t % 8 == 0 and c_loc % t == 0
            # one extra uniforms scratch buffer vs _pick_tile's 3
            assert t == 8 or 4 * t * width * 4 <= 8 << 20, (c_loc, width, t)


def test_rowseed_fed_path_bitexact(medium):
    """pallas_update="row_seed" with fed uniforms is byte-identical to the
    default kernel's fed path (row seeding only changes the hardware-PRNG
    draw) — so the row-seeded sweep stays pinned bit-exact against the XLA
    body's stream through the same plumbing."""
    graph, h, j = medium
    plan = build_plan(graph)
    hp, cp = permuted_model(plan, h, j)
    mesh = create_mesh(8, shape=(2, 4))
    ref, _ = _run_both(plan, hp, cp, mesh)
    key = jax.random.PRNGKey(3)
    s0 = jnp.asarray(
        np.asarray(random_spins(jax.random.PRNGKey(4), plan, 32))
    )
    u = xla_stream_uniforms(key, plan, 32, 4)
    out = gibbs_sweeps_graph_sharded(
        key, hp, cp, plan, s0, 4, mesh,
        pallas_update="row_seed", pallas_interpret=True, uniforms=u,
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_rowseed_rejects_unaligned_chains():
    """The hardware-PRNG row-seeded path needs 8-aligned per-shard chain
    counts (group starts must hit f32 sublane tiling); fail loudly, not
    with a Mosaic lowering error."""
    from image_generation_tpu.ops.gibbs_graph_sharded_pallas import (
        make_pallas_update,
    )

    update = make_pallas_update(row_seed=True)
    fields = jnp.zeros((12, 16), jnp.float32)
    with pytest.raises(ValueError, match="multiple of 8"):
        update(jax.random.PRNGKey(0), fields, jnp.float32(1.0), jnp.arange(12))


def test_step_selects_pallas_update_on_request(medium):
    """make_train_fns: GRAPH_SHARDED + USE_PALLAS='on' now advertises the
    composed path instead of silently dropping to the XLA update
    (training/step.py no longer forfeits the kernel in this regime)."""
    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.ops.gibbs import build_plan as _bp
    from image_generation_tpu.training.step import make_train_fns

    graph, _h, _j = medium
    plan = _bp(graph)
    mesh = create_mesh(8, shape=(2, 4))
    cfg = TrainingConfig(
        N_LATENTS=graph.n, NUM_READS=16, BATCH_SIZE=16, DATASET_SIZE=32,
        GRAPH_SHARDED="on", USE_PALLAS="on",
    )
    fns = make_train_fns(cfg, graph, 4, plan, mesh=mesh)
    assert fns.sampler_impl == "xla_graph_sharded+plrng"
    cfg_off = cfg.replace(USE_PALLAS="off")
    fns_off = make_train_fns(cfg_off, graph, 4, plan, mesh=mesh)
    assert fns_off.sampler_impl == "xla_graph_sharded"
    cfg_rs = cfg.replace(PLRNG_ROW_SEED="on")
    fns_rs = make_train_fns(cfg_rs, graph, 4, plan, mesh=mesh)
    assert fns_rs.sampler_impl == "xla_graph_sharded+plrng_rs"
    # row seeding rides the plrng kernel: without it, no effect
    fns_rs_off = make_train_fns(
        cfg_rs.replace(USE_PALLAS="off"), graph, 4, plan, mesh=mesh
    )
    assert fns_rs_off.sampler_impl == "xla_graph_sharded"


def test_pick_tile_grouped_rejects_vmem_blowout():
    """The row-seeded kernel's tile can never shrink below one 8-row seed
    group: a color-class span too wide for that inside the VMEM budget must
    fail loudly at trace time (the default kernel handles it at tile=1)."""
    from image_generation_tpu.ops.gibbs_graph_sharded_pallas import (
        _ROW_SEED_GROUP,
        _pick_tile_grouped,
    )

    t = _pick_tile_grouped(64, 512)
    assert t % _ROW_SEED_GROUP == 0 and 64 % t == 0
    with pytest.raises(ValueError, match="PLRNG_ROW_SEED"):
        _pick_tile_grouped(8, 100_000)
