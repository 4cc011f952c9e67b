"""Compare scaled-config convergence: f32 vs bf16 Adam-moment storage.

VERDICT r2 item 3: the bf16 option (ADAM_MOMENT_DTYPE) halves the measured
3.5 GB/step optimizer HBM traffic of the 127M-param dense layer; this tool
checks it does not change the training trajectory materially.  Feed it two
``scripts/train_scaled_demo.py`` outputs produced by the SAME code at the
two dtypes and it writes a side-by-side artifact with a verdict.

Usage:  python scripts/compare_adam_moments.py \
            runs/scaled_train_demo_f32.json runs/scaled_train_demo_bf16.json \
            [--out runs/adam_bf16_convergence.json] [--tol 0.05]

Verdict: PASS when every epoch's MSE differs by < tol relative (and both
runs improve first→last); the default stays f32 unless this passes.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("f32_json")
    ap.add_argument("bf16_json")
    ap.add_argument("--out", default="runs/adam_bf16_convergence.json")
    ap.add_argument("--tol", type=float, default=0.05,
                    help="max per-epoch relative MSE divergence for PASS")
    args = ap.parse_args(argv)

    a = json.loads(Path(args.f32_json).read_text())
    b = json.loads(Path(args.bf16_json).read_text())
    for run, want in ((a, "float32"), (b, "bfloat16")):
        got = run["config"].get("adam_moment_dtype")
        if got != want:
            sys.exit(f"expected a {want} run, got adam_moment_dtype={got!r}")

    rows = []
    worst = 0.0
    for ea, eb in zip(a["epochs"], b["epochs"]):
        rel = abs(eb["mse"] - ea["mse"]) / max(ea["mse"], 1e-9)
        worst = max(worst, rel)
        rows.append({
            "epoch": ea["epoch"],
            "mse_f32": ea["mse"],
            "mse_bf16": eb["mse"],
            "rel_diff": round(rel, 5),
        })

    ok = (
        worst < args.tol
        and a["mse_improved"]
        and b["mse_improved"]
        and len(a["epochs"]) == len(b["epochs"])
    )
    report = {
        "config": a["config"],
        "epochs_compared": len(rows),
        "per_epoch": rows,
        "max_rel_mse_diff": round(worst, 5),
        "tol": args.tol,
        "both_improved": bool(a["mse_improved"] and b["mse_improved"]),
        "verdict": "PASS" if ok else "FAIL",
        "note": "bf16 Adam moments stay opt-in (ADAM_MOMENT_DTYPE) either "
        "way; PASS means the trajectory is interchangeable at this tol.",
    }
    out = json.dumps(report, indent=1)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(out)
    print(out)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
