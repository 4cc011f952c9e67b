"""Sampler backend tests: protocol, factory, persistent cache semantics."""

import jax
import numpy as np
import pytest

from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.ops.exact import exact_moments
from image_generation_tpu.samplers import (
    ExactSampler,
    GibbsSampler,
    PersistentSampleCache,
    PTSampler,
    get_sampler,
    get_sampler_and_graph,
    push_to_deque,
)
from image_generation_tpu.utils.sampleset import SampleSet
from image_generation_tpu.utils.subgraph import select_latent_graph
from image_generation_tpu.utils.topology import chimera_graph


@pytest.fixture(scope="module")
def tiny():
    g, _ = select_latent_graph(chimera_graph(2, 2, 3), 12, 11)
    graph = GRBMGraph.from_networkx(g)
    rng = np.random.RandomState(0)
    h = rng.uniform(-0.3, 0.3, graph.n).astype(np.float32)
    j = rng.uniform(-0.5, 0.5, graph.n_edges).astype(np.float32)
    return graph, h, j


@pytest.mark.parametrize("name", ["gibbs", "pt", "exact"])
def test_backends_sample_contract(tiny, name):
    graph, h, j = tiny
    backend = get_sampler(name)
    ss = backend.sample(h, j, graph, num_reads=64, key=jax.random.PRNGKey(0))
    assert isinstance(ss, SampleSet)
    assert ss.spins.shape == (64, graph.n)
    assert set(np.unique(ss.spins)) <= {-1.0, 1.0}
    assert ss.energies.shape == (64,)
    assert np.isfinite(ss.energies).all()
    # energies consistent with the spins
    e = ss.spins @ h + (ss.spins[:, graph.edge_i] * ss.spins[:, graph.edge_j]) @ j
    np.testing.assert_allclose(ss.energies, e, rtol=1e-3, atol=1e-3)


def test_gibbs_backend_statistically_correct(tiny):
    graph, h, j = tiny
    ss = GibbsSampler(n_sweeps=60).sample(h, j, graph, 2048, jax.random.PRNGKey(1))
    m1 = ss.spins.mean(axis=0)
    e1, _ = exact_moments(h, graph.edge_i, graph.edge_j, j)
    np.testing.assert_allclose(m1, e1, atol=0.1)


def test_unknown_backend_rejected():
    with pytest.raises(ValueError):
        get_sampler("annealer")


def test_factory_contract():
    sampler, kwargs, graph, h_range, j_range = get_sampler_and_graph(
        num_reads=32, n_latents=24, random_seed=7, qpu="Advantage2_prototype"
    )
    assert kwargs["num_reads"] == 32
    assert graph.n == 24
    assert h_range == (-4.0, 4.0) and j_range == (-1.0, 1.0)
    ss = sampler.sample(
        np.zeros(24, np.float32), np.zeros(graph.n_edges, np.float32),
        graph, 32, jax.random.PRNGKey(0),
    )
    assert ss.spins.shape == (32, 24)


def test_push_to_deque():
    d = np.zeros((3, 2))
    d2 = push_to_deque(d, np.ones((2, 2)), deque_size=4)
    assert d2.shape == (4, 2)
    assert d2[-1].sum() == 2  # newest rows at the end
    assert d2[0].sum() == 0


def test_persistent_cache_fixes_reference_bug(tiny):
    """Unlike the reference (cache reset every call → always resamples),
    the cache must actually serve from the deque once full."""
    graph, h, j = tiny

    class CountingBackend(ExactSampler):
        calls = 0

        def sample(self, *a, **kw):
            CountingBackend.calls += 1
            return super().sample(*a, **kw)

    cache = PersistentSampleCache(
        CountingBackend(), max_deque_size=128, iterations_before_resampling=3
    )
    key = jax.random.PRNGKey(0)
    for i in range(2):  # filling: 64 + 64 = 128 → full
        cache.sample(h, j, graph, 64, jax.random.fold_in(key, i))
    assert CountingBackend.calls == 2
    assert cache.current_deque_size == 128
    served = [
        cache.sample(h, j, graph, 64, jax.random.fold_in(key, 10 + i)) for i in range(3)
    ]
    assert CountingBackend.calls == 2  # served from cache, no resample
    assert all(s.spins.shape == (64, graph.n) for s in served)
    cache.sample(h, j, graph, 64, jax.random.fold_in(key, 99))
    assert CountingBackend.calls == 3  # resampled after the interval


def test_generate_cache_invalidated_on_param_change():
    """Trainer.sample_sampleset drops the sample cache when grbm_params
    change (training stepped): a filled deque must not keep serving draws
    from an older model — the reference's generation path always samples the
    current model (src/model_wrapper.py:369-376)."""
    import jax.numpy as jnp

    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.training.trainer import Trainer

    cfg = TrainingConfig(
        N_LATENTS=32, NUM_READS=64, BATCH_SIZE=16, DATASET_SIZE=96,
        N_REPLICAS=2, GIBBS_SWEEPS=2, GIBBS_BURN_IN=2,
        QPU="Advantage2_prototype",
        MAX_DEQUE_SIZE=64, ITERATIONS_BEFORE_RESAMPLING=100,
    )
    t = Trainer(qpu=cfg.QPU, config=cfg)
    t.train_init(n_epochs=1)
    ss1 = t.sample_sampleset()  # fills the deque (64 == max)
    ss2 = t.sample_sampleset()  # same params → served from the cache
    assert ss2.info.get("sampler") == "cache"
    # opt_step 0 is a scheduled GRBM step (epoch<6, step%10==0) → params move
    t.step(t.images[: cfg.BATCH_SIZE], epoch=0)
    ss3 = t.sample_sampleset()  # params changed → cache reset, fresh draw
    assert ss3.info.get("sampler") != "cache"
    ss4 = t.sample_sampleset()  # unchanged again → cache serves
    assert ss4.info.get("sampler") == "cache"
