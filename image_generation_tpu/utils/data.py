"""MNIST data pipeline: device-resident, permutation-batched, TPU-first.

Replaces the reference's torchvision pipeline (reference:
src/model_wrapper.py:70-103 — MNIST, Resize 28→32 bilinear, ToTensor,
``torch.round`` binarization; DataLoader batch 128, shuffle, drop_last).

TPU-native design: the whole (binarized, resized) dataset lives in HBM once;
each epoch draws a ``jax.random.permutation`` and batches are static slices
of the permuted array — no host↔device transfer in the training loop.

Data sources, in order (this container has zero egress, so downloads are
gated rather than assumed):
  1. raw MNIST IDX files (optionally .gz) under ``$MNIST_DATA_DIR`` or
     ``<root>/MNIST/raw`` — the exact files torchvision uses;
  2. an ``mnist.npz`` (keras layout: x_train/y_train) in the same places;
  3. sklearn's bundled ``load_digits`` (1797 real 8×8 handwritten digits),
     upsampled — a faithful offline stand-in with the same value range;
  4. procedural synthetic digits (never fails; keeps benches/tests running).

The loader records which source was used in ``DataSource.origin``.
"""

from __future__ import annotations

import gzip
import os
import struct
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DataSource", "load_mnist", "prepare_images", "epoch_batches", "get_dataset"]


@dataclass
class DataSource:
    images: np.ndarray  # (N, 28, 28) float32 in [0, 1]
    labels: np.ndarray  # (N,) int32
    origin: str


def _read_idx(path: Path) -> np.ndarray:
    opener = gzip.open if path.suffix == ".gz" else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(dims)


def mnist_pool_size() -> int:
    """Length-only probe of the offline pool ``load_mnist(None)`` would
    yield: reads just the IDX header when raw MNIST is on disk (the only
    expensive source — 60k float32 images, ~180 MB materialized), and
    falls back to loading the small offline sources otherwise.  Startup
    paths that only need the size (app/evaluate.py's default
    ``--dataset-size``) use this instead of materializing the pool."""
    idx = _find("train-images-idx3-ubyte", "train-images-idx3-ubyte.gz")
    if idx is not None:
        opener = gzip.open if idx.suffix == ".gz" else open
        with opener(idx, "rb") as f:
            f.read(4)  # magic
            return struct.unpack(">I", f.read(4))[0]  # first dim = N
    return len(load_mnist(None).images)


def _find(*names: str) -> Optional[Path]:
    roots = []
    if os.environ.get("MNIST_DATA_DIR"):
        roots.append(Path(os.environ["MNIST_DATA_DIR"]))
    roots += [Path("data/MNIST/raw"), Path("data"), Path.home() / ".keras/datasets"]
    for root in roots:
        for name in names:
            p = root / name
            if p.exists():
                return p
    return None


def _synthetic_digits(n: int, seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Procedural digit-like images: anti-aliased strokes on a 28×28 grid."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:28, 0:28].astype(np.float32)
    images = np.zeros((n, 28, 28), np.float32)
    labels = rng.randint(0, 10, n).astype(np.int32)
    for i in range(n):
        k = 2 + labels[i] % 3
        img = np.zeros((28, 28), np.float32)
        for _ in range(k):
            x0, y0 = rng.uniform(6, 22, 2)
            ang = rng.uniform(0, np.pi)
            length = rng.uniform(6, 14)
            x1, y1 = x0 + length * np.cos(ang), y0 + length * np.sin(ang)
            t = np.linspace(0, 1, 24)[:, None, None]
            px, py = x0 + t * (x1 - x0), y0 + t * (y1 - y0)
            img += np.exp(-(((xx - px) ** 2 + (yy - py) ** 2) / 2.0)).sum(0)
        images[i] = np.clip(img, 0, 1)
    return images, labels


def load_mnist(dataset_size: Optional[int] = None) -> DataSource:
    """Load MNIST train images from the best available offline source."""
    idx = _find("train-images-idx3-ubyte", "train-images-idx3-ubyte.gz")
    if idx is not None:
        lab = _find("train-labels-idx1-ubyte", "train-labels-idx1-ubyte.gz")
        images = _read_idx(idx).astype(np.float32) / 255.0
        labels = (
            _read_idx(lab).astype(np.int32) if lab is not None else np.zeros(len(images), np.int32)
        )
        src = DataSource(images, labels, origin="mnist-idx")
    else:
        npz = _find("mnist.npz")
        if npz is not None:
            with np.load(npz) as z:
                src = DataSource(
                    z["x_train"].astype(np.float32) / 255.0,
                    z["y_train"].astype(np.int32),
                    origin="mnist-npz",
                )
        else:
            try:
                from sklearn.datasets import load_digits

                d = load_digits()
                imgs8 = d.images.astype(np.float32) / 16.0  # (1797, 8, 8)
                up = jax.image.resize(
                    jnp.asarray(imgs8), (imgs8.shape[0], 28, 28), method="bilinear"
                )
                src = DataSource(
                    np.asarray(np.clip(up, 0, 1)),
                    d.target.astype(np.int32),
                    origin="sklearn-digits-upsampled",
                )
            except Exception:
                images, labels = _synthetic_digits(4096)
                src = DataSource(images, labels, origin="synthetic")

    if dataset_size is not None and dataset_size > 0:
        if dataset_size <= len(src.images):
            src = DataSource(src.images[:dataset_size], src.labels[:dataset_size], src.origin)
        else:  # tile up (small offline sources standing in for 60k MNIST)
            reps = -(-dataset_size // len(src.images))
            src = DataSource(
                np.tile(src.images, (reps, 1, 1))[:dataset_size],
                np.tile(src.labels, reps)[:dataset_size],
                src.origin + f"-tiled{reps}",
            )
    return src


def prepare_images(
    source: DataSource, image_size: int = 32, binarize: bool = True
) -> jax.Array:
    """Resize 28→image_size (bilinear) and binarize by rounding.

    Matches the reference transform (Resize + ToTensor + ``torch.round``,
    src/model_wrapper.py:71-78).  Returns a device array (N, S, S, 1).
    """
    x = jnp.asarray(source.images)[..., None]  # (N, 28, 28, 1)
    n = x.shape[0]
    if x.shape[1] != image_size:
        x = jax.image.resize(x, (n, image_size, image_size, 1), method="bilinear")
    if binarize:
        x = jnp.round(jnp.clip(x, 0.0, 1.0))
    return x.astype(jnp.float32)


def get_dataset(
    image_size: int = 32, dataset_size: Optional[int] = None, binarize: bool = True
) -> Tuple[jax.Array, DataSource]:
    """One-call dataset: device images (N, S, S, 1) + source metadata."""
    src = load_mnist(dataset_size)
    return prepare_images(src, image_size, binarize), src


def epoch_batches(
    images: jax.Array, batch_size: int, key: jax.Array, drop_last: bool = True
) -> Iterator[jax.Array]:
    """Shuffled batches of a device-resident dataset (one epoch).

    One on-device gather for the permutation, then static slices — the
    DataLoader(shuffle=True, drop_last=True) equivalent
    (src/model_wrapper.py:103).
    """
    n = images.shape[0]
    perm = jax.random.permutation(key, n)
    shuffled = images[perm]
    n_batches = n // batch_size if drop_last else -(-n // batch_size)
    for i in range(n_batches):
        yield jax.lax.dynamic_slice_in_dim(shuffled, i * batch_size, batch_size, axis=0)


def permuted_epoch(images: jax.Array, batch_size: int, key: jax.Array) -> jax.Array:
    """(n_batches, B, S, S, 1) stacked epoch for `lax.scan` training loops."""
    n = images.shape[0]
    n_batches = n // batch_size
    perm = jax.random.permutation(key, n)[: n_batches * batch_size]
    return images[perm].reshape(n_batches, batch_size, *images.shape[1:])
