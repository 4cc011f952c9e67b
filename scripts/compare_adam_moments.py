"""Compare scaled-config convergence: baseline vs an Adam-moment storage knob.

VERDICT r2 item 3 / r3 item 1: the moment-storage opt-ins
(ADAM_MOMENT_DTYPE=bfloat16 halves the measured 3.5 GB/step optimizer HBM
traffic of the 127M-param dense layer; ADAM_FACTORED_NU replaces its dense
second moment with the Adafactor rank-1 row/col estimator) must not change
the training trajectory materially.  Feed it two
``scripts/train_scaled_demo.py`` outputs produced by the SAME code — the
baseline and the variant — and it writes a side-by-side artifact with a
verdict.

Usage:  python scripts/compare_adam_moments.py \
            runs/scaled_train_demo_f32.json runs/scaled_train_demo_bf16.json \
            [--knob adam_moment_dtype:float32,bfloat16] \
            [--out runs/adam_bf16_convergence.json] [--tol 0.05]

``--knob key:baseline_value,variant_value`` names the config entry the two
runs must differ in (default: the bf16 moment dtype); for the factored
second moment use ``--knob adam_factored_nu:off,on``.

Verdict: PASS when every epoch's MSE differs by < tol relative (and both
runs improve first→last); the default stays off/f32 unless this passes.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline_json")
    ap.add_argument("variant_json")
    ap.add_argument("--knob", default="adam_moment_dtype:float32,bfloat16",
                    help="config key + expected baseline,variant values")
    ap.add_argument("--out", default="runs/adam_bf16_convergence.json")
    ap.add_argument("--tol", type=float, default=0.05,
                    help="max per-epoch relative MSE divergence for PASS")
    args = ap.parse_args(argv)

    key, _, vals = args.knob.partition(":")
    base_val, _, var_val = vals.partition(",")
    a = json.loads(Path(args.baseline_json).read_text())
    b = json.loads(Path(args.variant_json).read_text())
    for run, want in ((a, base_val), (b, var_val)):
        # a baseline produced before the knob existed omits the key — that
        # IS the baseline value (the demo records every knob it knows)
        got = run["config"].get(key, base_val)
        if got != want:
            sys.exit(f"expected a {key}={want} run, got {key}={got!r}")

    rows = []
    worst = 0.0
    for ea, eb in zip(a["epochs"], b["epochs"]):
        rel = abs(eb["mse"] - ea["mse"]) / max(ea["mse"], 1e-9)
        worst = max(worst, rel)
        rows.append({
            "epoch": ea["epoch"],
            f"mse_{key}_{base_val}": ea["mse"],
            f"mse_{key}_{var_val}": eb["mse"],
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
        "knob": {"key": key, "baseline": base_val, "variant": var_val},
        "epochs_compared": len(rows),
        "per_epoch": rows,
        "max_rel_mse_diff": round(worst, 5),
        "tol": args.tol,
        "both_improved": bool(a["mse_improved"] and b["mse_improved"]),
        "verdict": "PASS" if ok else "FAIL",
        "note": f"{key}={var_val} stays opt-in either way; PASS means the "
        "trajectory is interchangeable with the baseline at this tol.",
    }
    out = json.dumps(report, indent=1)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(out)
    print(out)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
