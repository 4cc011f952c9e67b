"""Checkpoint evaluation surface (app/evaluate.py) — in particular the
image-space generation-quality metric (the BASELINE.md "Generated-sample
MMD parity" row: MMD² between DECODED generated images and held-out data,
the reference's actual product output, src/model_wrapper.py:355-399)."""

import json

import numpy as np
import pytest

from image_generation_tpu.config import TrainingConfig
from image_generation_tpu.training.trainer import Trainer


def tiny_config(**kw):
    base = dict(
        N_LATENTS=32,
        NUM_READS=16,
        BATCH_SIZE=16,
        DATASET_SIZE=64,
        N_REPLICAS=2,
        GIBBS_SWEEPS=2,
        GIBBS_BURN_IN=4,
        QPU="Advantage2_prototype",
    )
    base.update(kw)
    return TrainingConfig(**base)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    t = Trainer(config=tiny_config())
    t.train_init(n_epochs=1)
    t.train_epoch(0)
    out = t.save(tmp_path_factory.mktemp("eval_ckpt") / "m", n_epochs=1)
    return t, out


def test_image_space_metrics_shape_and_floor(trained):
    from image_generation_tpu.app.evaluate import image_space_metrics

    t, _ = trained
    m = image_space_metrics(t, num_reads=16, n_rounds=2, seed=3)
    for k in (
        "image_mmd", "image_mmd_std", "image_mmd_floor",
        "image_mmd_floor_std", "image_mmd_noise",
    ):
        assert np.isfinite(m[k]), (k, m)
    assert m["image_rounds"] == 2
    # biased V-statistic MMD² is nonnegative
    assert m["image_mmd"] >= 0.0
    assert m["image_mmd_floor"] >= 0.0
    # the same-distribution floor must sit below the uniform-noise
    # reference point by a wide margin (disjoint data halves vs noise)
    assert m["image_mmd_floor"] < m["image_mmd_noise"]


def test_image_space_metrics_needs_enough_data(trained):
    from image_generation_tpu.app.evaluate import image_space_metrics

    t, _ = trained
    with pytest.raises(ValueError, match="data images"):
        image_space_metrics(t, num_reads=64, n_rounds=1)


def test_evaluate_checkpoint_reports_image_mmd(trained):
    from image_generation_tpu.app.evaluate import evaluate_checkpoint

    _, ckpt = trained
    r = evaluate_checkpoint(
        ckpt, dataset_size=64, num_reads=16, batch_size=16, image_rounds=2,
    )
    assert r["sampler_matmul_dtype"] == "auto"
    assert np.isfinite(r["recon_mse"])
    assert np.isfinite(r["image_mmd"])
    assert np.isfinite(r["image_mmd_floor"])
    json.dumps(r)  # JSON-serializable record


def test_evaluate_checkpoint_config_overrides_int8(trained):
    """config_overrides plumbs the serving A/B knob: the same checkpoint
    evaluated under the int8-quantized sampler (ops/quant.py)."""
    from image_generation_tpu.app.evaluate import evaluate_checkpoint

    _, ckpt = trained
    r = evaluate_checkpoint(
        ckpt, dataset_size=64, num_reads=16, batch_size=16, image_rounds=1,
        config_overrides={"SAMPLER_MATMUL_DTYPE": "int8"},
    )
    assert r["sampler_matmul_dtype"] == "int8"
    assert np.isfinite(r["image_mmd"])


def test_evaluate_checkpoint_image_rounds_zero_skips(trained):
    from image_generation_tpu.app.evaluate import evaluate_checkpoint

    _, ckpt = trained
    r = evaluate_checkpoint(
        ckpt, dataset_size=64, num_reads=16, batch_size=16, image_rounds=0,
    )
    assert "image_mmd" not in r


class _TiledProxy:
    """A trainer view whose data pool is tiled (every image duplicated),
    mimicking the offline load_mnist tile-up (utils/data.py) — only the
    attributes image_space_metrics reads."""

    def __init__(self, t, reps=2):
        from image_generation_tpu.utils.data import DataSource

        self._t = t
        self.fns = t.fns
        self.state = t.state
        self.images = np.concatenate([np.asarray(t.images)] * reps, axis=0)
        self.data_source = DataSource(
            t.data_source.images, t.data_source.labels,
            t.data_source.origin + f"-tiled{reps}",
        )

    def sample_spins(self, n):
        return self._t.sample_spins(n)


def test_image_space_metrics_dedupes_tiled_pool(trained):
    """A tiled offline pool duplicates images; copies landing in BOTH
    'disjoint' floor halves would bias image_mmd_floor low — the metric
    draws from unique rows only, so a tiled pool that LOOKS big enough but
    lacks distinct images must raise, and a fitting one must evaluate."""
    from image_generation_tpu.app.evaluate import image_space_metrics

    t, _ = trained
    proxy = _TiledProxy(t)  # 64 unique images presented as 128
    # 2*48 = 96 <= 128 raw rows, but only ~64 distinct -> loud failure
    with pytest.raises(ValueError, match="distinct data"):
        image_space_metrics(proxy, num_reads=48, n_rounds=1)
    # within the unique pool the metric evaluates normally
    m = image_space_metrics(proxy, num_reads=16, n_rounds=1, seed=5)
    assert np.isfinite(m["image_mmd_floor"])
