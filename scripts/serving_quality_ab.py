"""A/B the serving sampler precision on generated-IMAGE quality.

VERDICT r4 item 1: int8 sampling is a standing measured 1.5-2.6x serving
win (runs/sampler_bench.json, BENCHMARKS.md) that no default used because
nothing measured the quality of the generated images themselves.  This
script puts the number on it: for each checkpoint, evaluate the image-space
MMD^2 (app/evaluate.image_space_metrics — decoded generated batch vs
held-out data, the reference's actual product output,
src/model_wrapper.py:355-399) under the default sampler AND under
SAMPLER_MATMUL_DTYPE="int8" (the quantized sampler, ops/quant.py), with
everything else identical (same data pool, same seeds, same read counts).

Decision rule (printed + recorded): int8 is quality-neutral for serving if,
for every checkpoint, |image_mmd(int8) - image_mmd(base)| is within
2 * max(image_mmd_std) — i.e. the A/B delta is inside the estimator's own
round-to-round noise.  The same-distribution floor is reported for scale.

Usage:
  python scripts/serving_quality_ab.py [--models DIR ...] [--platform cpu]
      [--out runs/serving_quality_ab.json]
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
    ap.add_argument(
        "--models", action="append", default=None,
        help="checkpoint root(s); default: reference six + runs/models",
    )
    ap.add_argument("--dataset-size", type=int, default=1792)
    # 1792 = the full offline fallback pool WITHOUT tiling (tiled
    # duplicates would leak across the disjoint floor halves)
    ap.add_argument("--num-reads", type=int, default=256)
    ap.add_argument("--image-rounds", type=int, default=4)
    ap.add_argument("--out", default="runs/serving_quality_ab.json")
    ap.add_argument(
        "--quality-out", default="runs/generation_quality.json",
        help="ALSO write the base arm's full evaluation rows here — the "
        "BASELINE.md 'Generated-sample MMD parity' record (reference "
        "checkpoints' values are the parity bar for ours, same data pool)",
    )
    ap.add_argument("--platform", default=None)
    ap.add_argument(
        "--override", action="append", default=[], metavar="KEY=VAL",
        help="TrainingConfig override applied to BOTH arms (repeatable; "
        "values YAML-parsed) — the scaled A/B passes the serving regime "
        "(SAMPLER=pt PT_NUM_BETAS=32 …) so neutrality is measured where "
        "the int8 default actually engages (n_latents ≥ 2048)",
    )
    args = ap.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from image_generation_tpu.config import TrainingConfig

    common_overrides = TrainingConfig.parse_overrides(args.override)

    from image_generation_tpu.app.evaluate import evaluate_checkpoint

    roots = args.models or ["/root/reference/models", "runs/models"]
    dirs = []
    for root in roots:
        root = Path(root)
        dirs += sorted(d for d in root.iterdir() if (d / "dvae.pth").exists())

    rows, base_rows = [], []
    for d in dirs:
        row = {"model": d.name}
        for arm, overrides in (
            ("base", None),
            ("int8", {"SAMPLER_MATMUL_DTYPE": "int8"}),
        ):
            t0 = time.perf_counter()
            r = evaluate_checkpoint(
                d, args.dataset_size, args.num_reads,
                image_rounds=args.image_rounds,
                config_overrides={**common_overrides, **(overrides or {})},
            )
            if arm == "base":
                base_rows.append(r)
            row[arm] = {
                "sampler_matmul_dtype": r["sampler_matmul_dtype"],
                "image_mmd": r["image_mmd"],
                "image_mmd_std": r["image_mmd_std"],
                "image_mmd_floor": r["image_mmd_floor"],
                "latent_mmd": r["latent_mmd"],
                "sample_energy_mean": r["sample_energy_mean"],
                "seconds": round(time.perf_counter() - t0, 1),
            }
        delta = row["int8"]["image_mmd"] - row["base"]["image_mmd"]
        noise = 2.0 * max(row["base"]["image_mmd_std"],
                          row["int8"]["image_mmd_std"])
        row["image_mmd_delta"] = round(delta, 5)
        row["noise_band_2std"] = round(noise, 5)
        row["within_noise"] = bool(abs(delta) <= noise)
        rows.append(row)
        print(json.dumps(row), flush=True)

    verdict = all(r["within_noise"] for r in rows)
    report = {
        "what": "generated-image quality A/B: default vs int8-quantized "
                "serving sampler (image-space MMD^2, app/evaluate.py); "
                "within_noise = |delta| <= 2*std of the metric's own "
                "round-to-round variation",
        "num_reads": args.num_reads,
        "image_rounds": args.image_rounds,
        "dataset_size": args.dataset_size,
        "overrides": common_overrides,
        "models": rows,
        "int8_quality_neutral": verdict,
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(report, indent=1))
    if args.quality_out:
        Path(args.quality_out).write_text(json.dumps(base_rows, indent=1))
    print(f"int8_quality_neutral: {verdict} -> {args.out}", file=sys.stderr)
    return report


if __name__ == "__main__":
    main()
