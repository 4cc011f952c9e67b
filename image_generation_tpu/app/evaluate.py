"""Checkpoint evaluation: recon-MSE and latent-MMD for saved models.

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
  * ``sample_energy``   — mean scaled-model energy of the generated spins.

Baselines to compare against (reference 40-epoch checkpoints): last-epoch
mean train MSE ≈ 0.0645 (BASELINE.md).

Usage:
  python -m image_generation_tpu.app.evaluate --models /root/reference/models
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def evaluate_checkpoint(
    model_dir,
    dataset_size: int = 2048,
    num_reads: int = 256,
    batch_size: int = 256,
    seed: int = 0,
) -> dict:
    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.ops.mmd import GaussianKernel, mmd_loss
    from image_generation_tpu.training.trainer import Trainer

    cfg = TrainingConfig(DATASET_SIZE=dataset_size, BATCH_SIZE=batch_size)
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
    return {
        "model": str(Path(model_dir).name),
        "n_latents": trainer.n_latents,
        "n_edges": trainer.graph.n_edges,
        "recon_mse": round(recon_mse, 5),
        "recon_mse_train_mode": round(recon_mse_train_mode, 5),
        "latent_mmd": round(mmd, 5),
        "sample_energy_mean": round(float(np.mean(e)), 4),
        "data_source": trainer.data_source.origin,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="/root/reference/models")
    ap.add_argument("--dataset-size", type=int, default=2048)
    ap.add_argument("--num-reads", type=int, default=256)
    ap.add_argument("--out", default=None, help="write JSON results here")
    ap.add_argument(
        "--platform", default=None,
        help="force a JAX platform (e.g. cpu); JAX_PLATFORMS alone is "
        "overridden by this image's sitecustomize",
    )
    args = ap.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    results = []
    root = Path(args.models)
    dirs = sorted(d for d in root.iterdir() if (d / "dvae.pth").exists())
    for d in dirs:
        r = evaluate_checkpoint(d, args.dataset_size, args.num_reads)
        results.append(r)
        print(json.dumps(r), flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
