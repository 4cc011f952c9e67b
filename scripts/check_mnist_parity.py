"""Absolute loss-parity verdict against the reference's MNIST training runs.

The reference's 40-epoch checkpoints end at a last-epoch mean recon MSE of
≈ 0.0645 on real MNIST (BASELINE.md, models/*_40_epochs/losses.json).  This
one-shot turns MNIST presence into a pass/fail parity verdict:

  * real MNIST available (IDX files under ``data/MNIST/raw`` or
    ``$MNIST_DATA_DIR``) → train the flagship config for 40 epochs and
    assert |last-epoch mean MSE − 0.0645| ≤ 0.005;
  * MNIST absent (this container has zero egress) → report SKIPPED with the
    proxy evidence instead: the train-mode recon MSE of the reference
    checkpoints evaluated through this framework on the substitute dataset
    (app/evaluate.py ``recon_mse_train_mode``) and the curve-shape
    correlation (scripts/compare_losses.py).

Exit code: 0 = parity PASS or SKIPPED-with-proxy, 1 = parity FAIL.

Usage:  python scripts/check_mnist_parity.py [--epochs 40] [--tolerance 0.005]
            [--out runs/mnist_parity.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

REFERENCE_LAST_EPOCH_MEAN_MSE = 0.0645  # BASELINE.md, mean of the three QPUs


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--tolerance", type=float, default=0.005)
    ap.add_argument("--qpu", default="Advantage2_system1")
    ap.add_argument("--out", default="runs/mnist_parity.json")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from image_generation_tpu.utils.data import load_mnist

    src = load_mnist(None)
    report = {
        "reference_last_epoch_mean_mse": REFERENCE_LAST_EPOCH_MEAN_MSE,
        "tolerance": args.tolerance,
        "data_origin": src.origin,
    }

    if not src.origin.startswith("mnist"):
        report["verdict"] = "SKIPPED"
        report["reason"] = (
            "real MNIST not on disk (zero-egress container); drop the IDX "
            "files into data/MNIST/raw or set $MNIST_DATA_DIR to enable the "
            "absolute-parity check"
        )
        report["proxy_evidence"] = {
            "reference_checkpoint_eval": "runs/reference_checkpoint_eval.json "
            "(recon_mse_train_mode compares like-for-like with losses.json)",
            "curve_shape": "runs/loss_curve_comparison.json "
            "(normalized epoch-curve correlation vs the reference history)",
        }
        out = json.dumps(report, indent=1)
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(out)
        print(out)
        return 0

    # ---- real MNIST: run the flagship 40-epoch config and check the box ----
    from image_generation_tpu.training.trainer import Trainer

    trainer = Trainer(qpu=args.qpu)
    t0 = time.perf_counter()
    trainer.train(args.epochs)
    wall = time.perf_counter() - t0
    per_epoch = trainer.n_batches
    last = trainer.losses["mse_losses"][-per_epoch:]
    last_epoch_mean = sum(last) / len(last)
    delta = abs(last_epoch_mean - REFERENCE_LAST_EPOCH_MEAN_MSE)
    ok = delta <= args.tolerance
    report.update(
        {
            "verdict": "PASS" if ok else "FAIL",
            "epochs": args.epochs,
            "last_epoch_mean_mse": round(last_epoch_mean, 5),
            "delta": round(delta, 5),
            "final_batch_mse": round(trainer.losses["mse_losses"][-1], 5),
            "wall_clock_s": round(wall, 1),
        }
    )
    out = json.dumps(report, indent=1)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(out)
    print(out)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
