"""End-to-end convergence evidence for the scaled configuration.

Trains the full-Advantage Pegasus latent (5640 spins / 40,484 couplers) with
the 32-temperature parallel-tempering sampler for a few epochs on the real
(fallback) dataset and records the per-epoch losses — evidence that the
scale axis (SURVEY.md §5 "long-context analog") doesn't just benchmark, it
*trains*: MSE must drop monotonically-ish from epoch 1 to the last.

Usage:  python scripts/train_scaled_demo.py [--epochs 6] [--platform cpu]
            [--out runs/scaled_train_demo.json]

On the real chip this costs one epoch-program compile (~minutes) plus a few
seconds of device time; CPU is only for smoke-testing the script itself
(use --epochs 1 --tiny there).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import jax


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--out", default="runs/scaled_train_demo.json")
    ap.add_argument("--platform", default=None)
    ap.add_argument(
        "--tiny", action="store_true",
        help="Zephyr-4 graph instead of Pegasus-16 (CPU smoke test)",
    )
    ap.add_argument(
        "--adam-moment-dtype",
        choices=("float32", "bfloat16"),
        default="float32",
        help="ADAM_MOMENT_DTYPE for the DVAE optimizer — run once with each "
        "and compare the loss curves (VERDICT r2 item 3 convergence check)",
    )
    ap.add_argument(
        "--adam-factored-nu",
        choices=("on", "off"),
        default="off",
        help="ADAM_FACTORED_NU: rank-1 factored second moment for the 127M "
        "dense (convergence check vs the dense-nu trajectory)",
    )
    ap.add_argument(
        "--pt-adapt", choices=("off", "epoch"), default="off",
        help="adaptive tempering: re-space the live ladder every epoch from "
        "the step's swap-acceptance metric; the per-epoch stats then record "
        "pt_accept_min/mean and the moving rungs",
    )
    ap.add_argument(
        "--save", default=None, metavar="DIR",
        help="save the trained checkpoint here (reference .pth format via "
        "Trainer.save) — e.g. runs/models/scaled_pegasus16_Nep, the input "
        "to the scaled warm-serving load test (scripts/load_test_warm.py)",
    )
    ap.add_argument(
        "--pt-num-betas", type=int, default=32,
        help="PT ladder size (ladder right-sizing: the per-epoch "
        "pt_accept_min shows whether fewer rungs still exchange freely)",
    )
    args = ap.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.training.trainer import Trainer

    qpu = "Advantage_system6"  # Pegasus-16 fabric: 5640-spin ideal latent
    cfg = TrainingConfig(
        QPU=qpu,
        DATASET_SIZE=1792,  # the offline fallback dataset (~1.8k digits)
        BATCH_SIZE=128,
        N_REPLICAS=2,
        NUM_READS=64,
        SAMPLER="pt",
        PT_NUM_BETAS=args.pt_num_betas,
        PT_BETA_MIN=0.2,
        GIBBS_SWEEPS=4,
        GIBBS_BURN_IN=4,
        ADAM_MOMENT_DTYPE=args.adam_moment_dtype,
        ADAM_FACTORED_NU=args.adam_factored_nu,
        PT_ADAPT=args.pt_adapt,
    )
    if args.tiny:
        cfg = cfg.replace(QPU="Advantage2_prototype", N_LATENTS=64, PT_NUM_BETAS=4)
    else:
        from image_generation_tpu.utils.topology import pegasus_graph

        cfg = cfg.replace(N_LATENTS=pegasus_graph(16).number_of_nodes())

    trainer = Trainer(qpu=cfg.QPU, config=cfg)
    epochs = []
    t_start = time.perf_counter()

    def epoch_cb(epoch, stats):
        print(
            f"epoch {epoch + 1}/{args.epochs}: mse={stats['mse']:.4f} "
            f"total={stats['dvae_loss']:.4f} ({stats['epoch_time_s']:.1f}s)",
            file=sys.stderr, flush=True,
        )
        epochs.append({"epoch": epoch, **stats})

    trainer.train(args.epochs, epoch_cb=epoch_cb)
    wall = time.perf_counter() - t_start

    saved = None
    if args.save:
        saved = str(trainer.save(args.save, n_epochs=args.epochs))
        print(f"checkpoint saved: {saved}", file=sys.stderr)

    first, last = epochs[0]["mse"], epochs[-1]["mse"]
    report = {
        "device": f"{jax.devices()[0].platform}:"
        f"{getattr(jax.devices()[0], 'device_kind', '?')}",
        "config": {
            "qpu": cfg.QPU, "n_latents": trainer.n_latents,
            "edges": trainer.graph.n_edges, "batch": cfg.BATCH_SIZE,
            "replicas": cfg.N_REPLICAS, "sampler": cfg.SAMPLER,
            "pt_betas": cfg.PT_NUM_BETAS, "reads": cfg.NUM_READS,
            "adam_moment_dtype": cfg.ADAM_MOMENT_DTYPE,
            "adam_factored_nu": cfg.ADAM_FACTORED_NU,
            "pt_adapt": cfg.PT_ADAPT,
            "dataset": trainer.data_source.origin,
        },
        "epochs": epochs,
        "first_epoch_mse": first,
        "last_epoch_mse": last,
        "mse_improved": last < first,
        "wall_s": round(wall, 1),
        "saved": saved,
        # reproduction recipe — checkpoint weights are gitignored (537 MB)
        "command": "python scripts/train_scaled_demo.py " + " ".join(
            argv if argv is not None else sys.argv[1:]
        ),
    }
    out = json.dumps(report, indent=1)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(out)
    print(out)
    if not report["mse_improved"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
