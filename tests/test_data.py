"""Data pipeline tests (offline sources, resize/binarize, batching)."""

import jax
import jax.numpy as jnp
import numpy as np

from image_generation_tpu.utils.data import (
    epoch_batches,
    get_dataset,
    load_mnist,
    permuted_epoch,
    prepare_images,
)
from image_generation_tpu.utils.grid import interleave, make_grid, sharpen


def test_load_source_available_offline():
    src = load_mnist(dataset_size=64)
    assert src.images.shape == (64, 28, 28)
    assert src.images.min() >= 0.0 and src.images.max() <= 1.0
    assert src.origin  # provenance recorded


def test_prepare_binarizes_and_resizes():
    imgs, src = get_dataset(image_size=32, dataset_size=50)
    assert imgs.shape == (50, 32, 32, 1)
    vals = set(np.unique(np.asarray(imgs)))
    assert vals <= {0.0, 1.0}


def test_dataset_tiling_for_small_sources():
    src = load_mnist(dataset_size=5000)  # bigger than sklearn digits (1797)
    assert len(src.images) == 5000


def test_epoch_batches_shapes_and_shuffle():
    imgs, _ = get_dataset(image_size=16, dataset_size=70)
    b1 = list(epoch_batches(imgs, 16, jax.random.PRNGKey(0)))
    assert len(b1) == 4  # drop_last
    assert all(b.shape == (16, 16, 16, 1) for b in b1)
    b2 = list(epoch_batches(imgs, 16, jax.random.PRNGKey(1)))
    assert not np.array_equal(np.asarray(b1[0]), np.asarray(b2[0]))


def test_permuted_epoch_covers_dataset():
    imgs, _ = get_dataset(image_size=16, dataset_size=64)
    stacked = permuted_epoch(imgs, 16, jax.random.PRNGKey(2))
    assert stacked.shape == (4, 16, 16, 16, 1)
    # a permutation: same multiset of image sums
    a = np.sort(np.asarray(imgs).sum(axis=(1, 2, 3)))
    b = np.sort(np.asarray(stacked).reshape(64, -1).sum(axis=1))
    np.testing.assert_allclose(a, b)


def test_make_grid_geometry():
    imgs = np.zeros((10, 8, 8, 1), np.float32)
    g = make_grid(imgs, nrow=4, padding=2)
    # 3 rows of tiles: 3*(8+2)+2 = 32 high; 4 cols: 4*(8+2)+2 = 42 wide
    assert g.shape == (32, 42, 1)


def test_sharpen_thresholds():
    x = np.asarray([[0.1, 0.45, 0.9]])
    out = sharpen(x, lower=0.4, upper=0.6)
    np.testing.assert_allclose(out, [[0.0, 0.45, 1.0]])


def test_interleave():
    a = np.zeros((3, 2, 2))
    b = np.ones((3, 2, 2))
    out = interleave(a, b)
    assert out.shape == (6, 2, 2)
    assert out[0].sum() == 0 and out[1].sum() == 4


def test_mnist_pool_size_idx_header_probe(tmp_path, monkeypatch):
    """mnist_pool_size must read ONLY the IDX header when raw MNIST is on
    disk (app/evaluate.py's startup length probe — the 60k float32 pool
    must not be materialized for a len()), and match load_mnist's view of
    the same files."""
    import gzip
    import struct

    from image_generation_tpu.utils.data import mnist_pool_size

    n = 7
    imgs = np.arange(n * 28 * 28, dtype=np.uint8).reshape(n, 28, 28)
    header = struct.pack(">I", 0x00000803) + struct.pack(">III", n, 28, 28)
    with gzip.open(tmp_path / "train-images-idx3-ubyte.gz", "wb") as f:
        f.write(header + imgs.tobytes())
    monkeypatch.setenv("MNIST_DATA_DIR", str(tmp_path))
    assert mnist_pool_size() == n
    assert load_mnist(None).images.shape == (n, 28, 28)


def test_mnist_pool_size_fallback_matches_loader(monkeypatch):
    """Without IDX files the probe falls back to the small offline source —
    its answer must equal what load_mnist(None) actually yields."""
    from image_generation_tpu.utils.data import mnist_pool_size

    monkeypatch.delenv("MNIST_DATA_DIR", raising=False)
    assert mnist_pool_size() == len(load_mnist(None).images)
