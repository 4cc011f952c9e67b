"""Loss-curve comparison: a trained run vs the reference checkpoints.

Driver configs #2/#3 (BASELINE.json) call for reproducing the reference's
10/40-epoch loss curves.  Absolute values depend on the dataset (this
environment has no MNIST on disk; the loader substitutes upsampled real
digits), so this script compares the curves structurally: per-epoch mean
MSE trajectories, total-loss trajectories, decay ratios, and the Pearson
correlation of the epoch-mean curves after normalization.

Usage:
  python scripts/compare_losses.py runs/models/tpu_digits_40_epochs \
      /root/reference/models/Advantage2_system1_40_epochs \
      --out runs/loss_curve_comparison.json
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def steps_per_epoch_of(model_dir: Path, n_losses: int) -> int:
    """Derive batches/epoch from the run's parameters.json rather than
    assuming the full-MNIST 468 (dateset_size[sic]/batch_size, drop_last);
    falls back to len(losses)/n_epochs when the metadata is incomplete."""
    try:
        meta = json.loads((model_dir / "parameters.json").read_text())
    except (OSError, json.JSONDecodeError):
        meta = {}
    size = meta.get("dateset_size") or meta.get("dataset_size")
    batch = meta.get("batch_size")
    if size and batch:
        return max(int(size) // int(batch), 1)
    n_epochs = meta.get("n_epochs")
    if n_epochs:
        return max(n_losses // int(n_epochs), 1)
    return 468


def epoch_means(values, steps_per_epoch):
    v = np.asarray(values, np.float64)
    n = (len(v) // steps_per_epoch) * steps_per_epoch
    return v[:n].reshape(-1, steps_per_epoch).mean(axis=1)


def curve_stats(losses, steps_per_epoch):
    mse = epoch_means(losses["mse_losses"], steps_per_epoch)
    total = epoch_means(losses["dvae_losses"], steps_per_epoch)
    return {
        "n_epochs": len(mse),
        "mse_first_epoch": round(float(mse[0]), 4),
        "mse_last_epoch": round(float(mse[-1]), 4),
        "mse_decay_ratio": round(float(mse[-1] / mse[0]), 4),
        "total_last_epoch": round(float(total[-1]), 4),
        "mse_epoch_means": [round(float(x), 4) for x in mse],
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument("reference")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    ours_losses = json.loads((Path(args.ours) / "losses.json").read_text())
    ref_losses = json.loads((Path(args.reference) / "losses.json").read_text())
    ours = curve_stats(
        ours_losses, steps_per_epoch_of(Path(args.ours), len(ours_losses["mse_losses"]))
    )
    ref = curve_stats(
        ref_losses, steps_per_epoch_of(Path(args.reference), len(ref_losses["mse_losses"]))
    )

    n = min(ours["n_epochs"], ref["n_epochs"])
    a = np.asarray(ours["mse_epoch_means"][:n])
    b = np.asarray(ref["mse_epoch_means"][:n])

    def norm(x):
        return (x - x.min()) / (x.max() - x.min() + 1e-12)

    corr = float(np.corrcoef(norm(a), norm(b))[0, 1])
    report = {
        "ours": {k: v for k, v in ours.items() if k != "mse_epoch_means"},
        "reference": {k: v for k, v in ref.items() if k != "mse_epoch_means"},
        "normalized_epoch_curve_correlation": round(corr, 4),
        "note": (
            "absolute MSE differs with the dataset (reference trained on real "
            "MNIST; this environment substitutes upsampled sklearn digits); "
            "the correlation compares the shape of the learning curves"
        ),
        "ours_mse_epoch_means": ours["mse_epoch_means"],
        "reference_mse_epoch_means": ref["mse_epoch_means"],
    }
    out = json.dumps(report, indent=1)
    if args.out:
        Path(args.out).write_text(out)
    print(out[:600])
    return report


if __name__ == "__main__":
    main()
