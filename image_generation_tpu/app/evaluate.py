"""Checkpoint evaluation: recon-MSE, latent-MMD and IMAGE-space MMD.

Driver config #4 (BASELINE.json): load each saved checkpoint (including the
six reference-shipped ``models/Advantage*`` directories), reconstruct data
through the DVAE, sample the GRBM, and report

  * ``recon_mse``       — mean squared reconstruction error over the eval
                          set (eval mode: BatchNorm running stats, no
                          dropout — slightly below the reference's training-
                          mode loss history for the same weights);
  * ``latent_mmd``      — the training MMD between encoded data spins and
                          sampler spins (the distribution-alignment metric,
                          reference src/model_wrapper.py:318-320);
  * ``sample_energy``   — mean scaled-model energy of the generated spins;
  * ``image_mmd``       — MMD² between DECODED generated images and
                          held-out data images: a number on the quality of
                          the model's actual product output (the generated
                          image grid, reference src/model_wrapper.py:355-399
                          — which the reference never metricizes).  Reported
                          with its same-distribution floor
                          (``image_mmd_floor``: two disjoint data batches —
                          the estimator's noise level at this sample size)
                          and a scale reference (``image_mmd_noise``:
                          uniform noise vs data — NOT a ceiling: a tightly
                          clustered wrong generator scores above it, because
                          the V-statistic grows with the generator's
                          self-similarity).  Quality ≈ how close image_mmd
                          sits to the floor; cross-model comparisons are
                          valid on the SAME data pool.

Baselines to compare against (reference 40-epoch checkpoints): last-epoch
mean train MSE ≈ 0.0645 (BASELINE.md).  The image-MMD column fills
BASELINE.md's "Generated-sample MMD parity" row: the reference checkpoints'
values ARE the parity bar for ours (measured against the same data pool —
with the offline sklearn-digits fallback this is a proxy bar; it flips to
the real MNIST bar automatically when IDX files exist, utils/data.py).

Usage:
  python -m image_generation_tpu.app.evaluate --models /root/reference/models
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def image_space_metrics(
    trainer, num_reads: int = 256, n_rounds: int = 4, seed: int = 1
) -> dict:
    """Image-space generation quality for a loaded/trained ``Trainer``.

    ``n_rounds`` independent rounds of: sample ``num_reads`` GRBM spins
    (fresh chains, fresh key — the serving math: the same sample→decode
    pair ``app/warm.py`` fuses, NOT the persistent deque, whose reservoir
    semantics would correlate rounds), decode them (eval mode), and measure
    the biased MMD² (``ops/mmd.py``, the reference's GaussianKernel(7)
    mixture with its data-adaptive bandwidth) against a held-out data batch
    of the same size.  Each round also measures

      * the same-distribution FLOOR: MMD²(data half A, data half B) over
        disjoint batches — nonzero only by estimator noise at this N;
      * a NOISE reference point: MMD²(uniform noise images, data).  Not an
        upper bound — the biased V-statistic rewards spread, so a
        collapsed-but-wrong generator can score ABOVE uniform noise
        (measured: the MNIST-trained reference checkpoints score ~3.2 vs
        the sklearn proxy pool while noise scores ~1.4).

    Returns means/stds over rounds.  Needs ≥ 2·num_reads data images."""
    import numpy as np

    from image_generation_tpu.ops.mmd import GaussianKernel, mmd_loss

    kern = GaussianKernel(7)
    dvae = trainer.fns.dvae
    variables = {
        "params": trainer.state.dvae_params,
        "batch_stats": trainer.state.batch_stats,
    }
    data = np.asarray(trainer.images, dtype=np.float32)
    flat = data.reshape(data.shape[0], -1)
    if "-tiled" in trainer.data_source.origin:
        # a tiled offline pool (utils/data.py load_mnist) duplicates every
        # image ~reps×; copies of one image landing in BOTH "disjoint"
        # floor halves would bias image_mmd_floor low — draw from the
        # unique rows only (restores the untiled pool)
        flat = np.unique(flat, axis=0)
    if flat.shape[0] < 2 * num_reads:
        raise ValueError(
            f"image_space_metrics needs >= {2 * num_reads} distinct data "
            f"images for disjoint floor batches, have {flat.shape[0]}"
        )
    rng = np.random.default_rng(seed)
    gen_v, floor_v, noise_v = [], [], []
    for _ in range(n_rounds):
        idx = rng.permutation(flat.shape[0])
        a = jnp.asarray(flat[idx[:num_reads]])
        b = jnp.asarray(flat[idx[num_reads : 2 * num_reads]])
        spins = trainer.sample_spins(num_reads)
        imgs = dvae.apply(
            variables, spins[:, None, :], train=False, method=dvae.decode
        )[:, 0]
        g = jnp.clip(imgs, 0.0, 1.0).reshape(num_reads, -1)
        gen_v.append(float(mmd_loss(g, a, kern)))
        floor_v.append(float(mmd_loss(b, a, kern)))
        noise = jnp.asarray(
            rng.random((num_reads, flat.shape[1]), dtype=np.float32)
        )
        noise_v.append(float(mmd_loss(noise, a, kern)))
    return {
        "image_mmd": round(float(np.mean(gen_v)), 5),
        "image_mmd_std": round(float(np.std(gen_v)), 5),
        "image_mmd_floor": round(float(np.mean(floor_v)), 5),
        "image_mmd_floor_std": round(float(np.std(floor_v)), 5),
        "image_mmd_noise": round(float(np.mean(noise_v)), 5),
        "image_rounds": n_rounds,
    }


def evaluate_checkpoint(
    model_dir,
    dataset_size: int = 2048,
    num_reads: int = 256,
    batch_size: int = 256,
    seed: int = 0,
    image_rounds: int = 4,
    config_overrides: Optional[dict] = None,
) -> dict:
    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.ops.mmd import GaussianKernel, mmd_loss
    from image_generation_tpu.training.trainer import Trainer

    batch_size = min(batch_size, dataset_size)  # small eval sets must not
    # leave the recon loop empty (main() fixes batch_size at 256)
    kw = {"DATASET_SIZE": dataset_size, "BATCH_SIZE": batch_size}
    kw.update(config_overrides or {})  # an explicit override wins
    cfg = TrainingConfig(**kw)
    trainer = Trainer(config=cfg)
    trainer.load(model_dir)
    key = jax.random.PRNGKey(seed)
    dvae = trainer.fns.dvae
    variables = {
        "params": trainer.state.dvae_params,
        "batch_stats": trainer.state.batch_stats,
    }

    # ---- reconstruction MSE over the eval set ----
    # two numbers, because they answer different questions:
    #   recon_mse            — eval mode (BN running stats, no dropout): the
    #                          deployment-quality metric;
    #   recon_mse_train_mode — train mode (BN batch stats, Dropout2d active,
    #                          R replicas): computed EXACTLY like the entries
    #                          of the reference's losses.json history
    #                          (src/model_wrapper.py:297-305), so it is the
    #                          number to compare against BASELINE.md's
    #                          last-epoch mean ≈ 0.0645.
    mses, mses_train = [], []
    all_spins = []
    n = int(trainer.images.shape[0])
    n_replicas = trainer.config.N_REPLICAS
    for i in range(0, n - batch_size + 1, batch_size):
        batch = jax.lax.dynamic_slice_in_dim(trainer.images, i, batch_size, axis=0)
        key, k, k2, kd = jax.random.split(key, 4)
        _, spins, recon = dvae.apply(
            variables, batch, n_replicas=1, train=False, rngs={"spins": k}
        )
        mses.append(float(jnp.mean(jnp.square(recon[:, 0] - batch))))
        all_spins.append(np.asarray(spins[:, 0]))
        (_, _, recon_t), _ = dvae.apply(
            variables, batch, n_replicas=n_replicas, train=True,
            rngs={"spins": k2, "dropout": kd}, mutable=["batch_stats"],
        )
        target = jnp.broadcast_to(batch[:, None], recon_t.shape)
        mses_train.append(float(jnp.mean(jnp.square(recon_t - target))))
    recon_mse = float(np.mean(mses))
    recon_mse_train_mode = float(np.mean(mses_train))
    data_spins = jnp.asarray(np.concatenate(all_spins, axis=0))

    # ---- generation + latent MMD (through the sampler-backend protocol:
    # the SampleSet carries the scaled-model energies) ----
    key, k = jax.random.split(key)
    sample_set = trainer.sample_sampleset(num_reads=num_reads)
    samples = jnp.asarray(sample_set.spins)
    mmd = float(mmd_loss(data_spins[: 4 * num_reads], samples, GaussianKernel(7)))
    e = sample_set.energies
    out = {
        "model": str(Path(model_dir).name),
        "n_latents": trainer.n_latents,
        "n_edges": trainer.graph.n_edges,
        "recon_mse": round(recon_mse, 5),
        "recon_mse_train_mode": round(recon_mse_train_mode, 5),
        "latent_mmd": round(mmd, 5),
        "sample_energy_mean": round(float(np.mean(e)), 4),
        "data_source": trainer.data_source.origin,
        "sampler_matmul_dtype": trainer.config.SAMPLER_MATMUL_DTYPE,
    }
    if image_rounds > 0:
        out.update(
            image_space_metrics(trainer, num_reads, image_rounds, seed + 1)
        )
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--models", action="append", default=None,
        help="checkpoint root(s) — repeatable; every subdirectory holding a "
        "dvae.pth is evaluated (default: /root/reference/models)",
    )
    ap.add_argument(
        "--dataset-size", type=int, default=None,
        help="eval-set size (default: min(2048, untiled data pool) — a "
        "tiled pool would also be deduped for the image-MMD floor halves, "
        "shrinking them back anyway)",
    )
    ap.add_argument("--num-reads", type=int, default=256)
    ap.add_argument(
        "--image-rounds", type=int, default=4,
        help="sampling rounds for the image-space MMD (0 disables)",
    )
    ap.add_argument(
        "--sampler-matmul-dtype", default=None,
        choices=("auto", "float32", "bfloat16", "int8"),
        help="SAMPLER_MATMUL_DTYPE override for every evaluation — the "
        "serving-quality A/B knob (int8 = the quantized sampler)",
    )
    ap.add_argument("--out", default=None, help="write JSON results here")
    ap.add_argument(
        "--platform", default=None,
        help="force a JAX platform (e.g. cpu); JAX_PLATFORMS alone is "
        "overridden by this image's sitecustomize",
    )
    args = ap.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.dataset_size is None:
        # length-only probe: with real MNIST on disk this reads 8 bytes of
        # IDX header instead of materializing the 60k pool just for len()
        from image_generation_tpu.utils.data import mnist_pool_size

        args.dataset_size = min(2048, mnist_pool_size())
    overrides = (
        {"SAMPLER_MATMUL_DTYPE": args.sampler_matmul_dtype}
        if args.sampler_matmul_dtype
        else None
    )

    results = []
    for root in args.models or ["/root/reference/models"]:
        root = Path(root)
        dirs = sorted(d for d in root.iterdir() if (d / "dvae.pth").exists())
        for d in dirs:
            r = evaluate_checkpoint(
                d, args.dataset_size, args.num_reads,
                image_rounds=args.image_rounds,
                config_overrides=overrides,
            )
            results.append(r)
            print(json.dumps(r), flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
