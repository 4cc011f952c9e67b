"""Generate the default model-diagram output placeholder.

The reference ships ``assets/model_diagram/step_5_output_default.png`` and
shows it in the diagram's output slot until a model's real reconstruction
replaces it (reference demo_interface.py:608, STEP_5_FILE_DEFAULT in
src/utils/callback_helpers.py:49).  Ours is a synthetic soft "untrained
decoder" blob — a centered gaussian bump with a faint checker ripple, the
archetypal look of a randomly-initialized decoder output.

Usage:  python scripts/make_default_output.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

from image_generation_tpu.app.diagram import save_png

SIZE = 32


def default_output_image() -> np.ndarray:
    y, x = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
    cy = cx = (SIZE - 1) / 2
    r2 = ((y - cy) ** 2 + (x - cx) ** 2) / (SIZE / 3.2) ** 2
    bump = np.exp(-r2)
    ripple = 0.06 * np.cos(y * np.pi / 2) * np.cos(x * np.pi / 2)
    return np.clip(0.15 + 0.55 * bump + ripple, 0.0, 1.0)


def main() -> None:
    out = (
        Path(__file__).resolve().parents[1]
        / "image_generation_tpu" / "app" / "static"
        / "step_5_output_default.png"
    )
    out.parent.mkdir(parents=True, exist_ok=True)
    save_png(default_output_image(), out)
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
