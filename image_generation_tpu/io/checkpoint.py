"""Named-model checkpoint directories in the reference's on-disk format.

A saved model is a directory ``models/<name>/`` holding:

  * ``dvae.pth``        — torch state dict, ``_encoder.*``/``_decoder.*``
  * ``grbm.pth``        — torch state dict, GRBM tensor layout
  * ``parameters.json`` — run metadata (note the reference's misspelled
                          ``dateset_size`` key is preserved for parity —
                          src/utils/callback_helpers.py:101)
  * ``losses.json``     — full per-batch ``{mse_losses, dvae_losses}``

(reference: ModelWrapper.save/load src/model_wrapper.py:148-175 and
``create_model_files`` src/utils/callback_helpers.py:70-108).  All six
shipped ``models/Advantage*`` checkpoints round-trip through these
functions (tested in tests/test_training.py::test_checkpoint_roundtrip;
tensor-level .pth round-trips in tests/test_dvae.py).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Tuple

from image_generation_tpu.io.torch_pth import (
    dvae_params_from_state_dict,
    dvae_state_dict_from_params,
    grbm_from_state_dict,
    grbm_state_dict,
    load_state_dict,
    save_state_dict,
)
from image_generation_tpu.models.grbm import GRBMGraph, GRBMParams

__all__ = ["save_model_dir", "load_model_dir", "read_parameters", "read_losses"]


def save_model_dir(
    path,
    dvae_params: dict,
    batch_stats: dict,
    grbm_params: GRBMParams,
    graph: GRBMGraph,
    parameters: dict,
    losses: dict,
) -> Path:
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    save_state_dict(path / "dvae.pth", dvae_state_dict_from_params(dvae_params, batch_stats))
    save_state_dict(path / "grbm.pth", grbm_state_dict(grbm_params, graph))
    (path / "parameters.json").write_text(json.dumps(parameters))
    (path / "losses.json").write_text(json.dumps(losses))
    return path


def make_parameters_json(
    n_latents: int,
    n_epochs: int,
    prefactor: float,
    qpu: str,
    num_reads: int,
    loss_function: str,
    image_size: int,
    batch_size: int,
    dataset_size: Optional[int],
    random_seed: int,
) -> dict:
    """The reference's parameters.json schema, misspelling included."""
    return {
        "n_latents": n_latents,
        "n_epochs": n_epochs,
        "prefactor": prefactor,
        "qpu": qpu,
        "num_read": num_reads,
        "loss_function": loss_function,
        "image_size": image_size,
        "batch_size": batch_size,
        "dateset_size": dataset_size,  # sic — reference key, kept for parity
        "random_seed": random_seed,
    }


def load_model_dir(path) -> Tuple[dict, dict, GRBMParams, GRBMGraph, dict, dict]:
    """Load (dvae_params, batch_stats, grbm_params, graph, parameters, losses)."""
    path = Path(path)
    dvae_params, batch_stats = dvae_params_from_state_dict(load_state_dict(path / "dvae.pth"))
    grbm_params, graph = grbm_from_state_dict(load_state_dict(path / "grbm.pth"))
    parameters = read_parameters(path)
    losses = read_losses(path)
    return dvae_params, batch_stats, grbm_params, graph, parameters, losses


def read_parameters(path) -> dict:
    p = Path(path) / "parameters.json"
    return json.loads(p.read_text()) if p.exists() else {}


def read_losses(path) -> dict:
    p = Path(path) / "losses.json"
    if p.exists():
        return json.loads(p.read_text())
    return {"mse_losses": [], "dvae_losses": []}
