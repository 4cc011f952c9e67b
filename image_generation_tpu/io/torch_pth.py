"""Torch ``.pth`` checkpoint interop: the reference's on-disk tensor format.

The reference persists models as two torch state dicts per named directory
(``dvae.pth`` with 62 tensors under ``_encoder.*``/``_decoder.*`` prefixes and
``grbm.pth`` with the GRBM layout — reference: src/model_wrapper.py:148-162;
verified against the six shipped models/Advantage* checkpoints).  This module
converts both directions so (a) all shipped checkpoints load into the JAX
models unchanged and (b) checkpoints written here load back into the
reference app.

Key maps (torch → flax):

  _encoder.conv.{4i}.*          → encoder/conv_{i}   (OIHW → HWIO)
  _encoder.conv.{4i+1}.*        → encoder/bn_{i}     (+ running stats)
  _encoder.projection.*         → encoder/projection (Linear Wᵀ)
  _decoder.increase_latent_dim.*→ decoder/increase_latent_dim (Wᵀ)
  _decoder.convtrans.{5i}.*     → decoder/convt_{i}  (ConvT (I,O,kh,kw) →
                                   spatially flipped HWIO conv kernel — a
                                   stride-1/SAME transposed conv equals a
                                   regular conv with the flipped kernel)
  _decoder.convtrans.{5i+1}.*   → decoder/bn_{i}
  _decoder.convtrans.20.*       → decoder/convt_4

``num_batches_tracked`` is read-ignored and written as 0 (torch only uses it
for momentum=None BN, which the reference never configures).

torch itself is imported lazily — only checkpoint IO needs it; the rest of
the framework runs without torch installed.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from image_generation_tpu.models.grbm import GRBMGraph, GRBMParams

__all__ = [
    "load_state_dict",
    "save_state_dict",
    "dvae_params_from_state_dict",
    "dvae_state_dict_from_params",
    "grbm_from_state_dict",
    "grbm_state_dict",
]

_ENC_CONV_IDS = (0, 4, 8, 12)  # torch Sequential indices of the Conv2d layers
_ENC_BN_IDS = (1, 5, 9, 13)
_DEC_CONV_IDS = (0, 5, 10, 15, 20)  # 5 ConvT layers (last has no BN block)
_DEC_BN_IDS = (1, 6, 11, 16)


def load_state_dict(path) -> Dict[str, np.ndarray]:
    """Read a torch ``.pth`` state dict into numpy arrays."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def save_state_dict(path, arrays: Dict[str, np.ndarray]) -> None:
    """Write numpy arrays as a torch ``.pth`` state dict."""
    import torch

    sd = {k: torch.from_numpy(np.array(v)) for k, v in arrays.items()}
    torch.save(sd, path)


# ---------------------------------------------------------------------------
# DVAE
# ---------------------------------------------------------------------------

def _conv_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _hwio_to_conv(k: np.ndarray) -> np.ndarray:
    return np.transpose(k, (3, 2, 0, 1))


def _convt_to_hwio(w: np.ndarray) -> np.ndarray:
    # torch ConvT weight (I, O, kh, kw) → flipped HWIO conv kernel
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def _hwio_to_convt(k: np.ndarray) -> np.ndarray:
    return np.transpose(k, (2, 3, 0, 1))[:, :, ::-1, ::-1]


def dvae_params_from_state_dict(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """torch ``dvae.pth`` state dict → (flax params, flax batch_stats)."""
    f32 = lambda a: np.asarray(a, np.float32)  # noqa: E731
    enc_p, enc_s = {}, {}
    for i, cid in enumerate(_ENC_CONV_IDS):
        enc_p[f"conv_{i}"] = {
            "kernel": _conv_to_hwio(f32(sd[f"_encoder.conv.{cid}.weight"])),
            "bias": f32(sd[f"_encoder.conv.{cid}.bias"]),
        }
    for i, bid in enumerate(_ENC_BN_IDS):
        enc_p[f"bn_{i}"] = {
            "scale": f32(sd[f"_encoder.conv.{bid}.weight"]),
            "bias": f32(sd[f"_encoder.conv.{bid}.bias"]),
        }
        enc_s[f"bn_{i}"] = {
            "mean": f32(sd[f"_encoder.conv.{bid}.running_mean"]),
            "var": f32(sd[f"_encoder.conv.{bid}.running_var"]),
        }
    enc_p["projection"] = {
        "kernel": f32(sd["_encoder.projection.weight"]).T,
        "bias": f32(sd["_encoder.projection.bias"]),
    }

    dec_p, dec_s = {}, {}
    dec_p["increase_latent_dim"] = {
        "kernel": f32(sd["_decoder.increase_latent_dim.weight"]).T,
        "bias": f32(sd["_decoder.increase_latent_dim.bias"]),
    }
    for i, cid in enumerate(_DEC_CONV_IDS):
        dec_p[f"convt_{i}"] = {
            "kernel": _convt_to_hwio(f32(sd[f"_decoder.convtrans.{cid}.weight"])),
            "bias": f32(sd[f"_decoder.convtrans.{cid}.bias"]),
        }
    for i, bid in enumerate(_DEC_BN_IDS):
        dec_p[f"bn_{i}"] = {
            "scale": f32(sd[f"_decoder.convtrans.{bid}.weight"]),
            "bias": f32(sd[f"_decoder.convtrans.{bid}.bias"]),
        }
        dec_s[f"bn_{i}"] = {
            "mean": f32(sd[f"_decoder.convtrans.{bid}.running_mean"]),
            "var": f32(sd[f"_decoder.convtrans.{bid}.running_var"]),
        }

    params = {"encoder": enc_p, "decoder": dec_p}
    batch_stats = {"encoder": enc_s, "decoder": dec_s}
    return params, batch_stats


def dvae_state_dict_from_params(params: dict, batch_stats: dict) -> Dict[str, np.ndarray]:
    """(flax params, batch_stats) → torch ``dvae.pth`` state dict arrays."""
    a = lambda t: np.asarray(t, np.float32)  # noqa: E731
    sd: Dict[str, np.ndarray] = {}
    enc_p, enc_s = params["encoder"], batch_stats["encoder"]
    for i, cid in enumerate(_ENC_CONV_IDS):
        sd[f"_encoder.conv.{cid}.weight"] = _hwio_to_conv(a(enc_p[f"conv_{i}"]["kernel"]))
        sd[f"_encoder.conv.{cid}.bias"] = a(enc_p[f"conv_{i}"]["bias"])
    for i, bid in enumerate(_ENC_BN_IDS):
        sd[f"_encoder.conv.{bid}.weight"] = a(enc_p[f"bn_{i}"]["scale"])
        sd[f"_encoder.conv.{bid}.bias"] = a(enc_p[f"bn_{i}"]["bias"])
        sd[f"_encoder.conv.{bid}.running_mean"] = a(enc_s[f"bn_{i}"]["mean"])
        sd[f"_encoder.conv.{bid}.running_var"] = a(enc_s[f"bn_{i}"]["var"])
        sd[f"_encoder.conv.{bid}.num_batches_tracked"] = np.asarray(0, np.int64)
    sd["_encoder.projection.weight"] = a(enc_p["projection"]["kernel"]).T
    sd["_encoder.projection.bias"] = a(enc_p["projection"]["bias"])

    dec_p, dec_s = params["decoder"], batch_stats["decoder"]
    sd["_decoder.increase_latent_dim.weight"] = a(dec_p["increase_latent_dim"]["kernel"]).T
    sd["_decoder.increase_latent_dim.bias"] = a(dec_p["increase_latent_dim"]["bias"])
    for i, cid in enumerate(_DEC_CONV_IDS):
        sd[f"_decoder.convtrans.{cid}.weight"] = _hwio_to_convt(a(dec_p[f"convt_{i}"]["kernel"]))
        sd[f"_decoder.convtrans.{cid}.bias"] = a(dec_p[f"convt_{i}"]["bias"])
    for i, bid in enumerate(_DEC_BN_IDS):
        sd[f"_decoder.convtrans.{bid}.weight"] = a(dec_p[f"bn_{i}"]["scale"])
        sd[f"_decoder.convtrans.{bid}.bias"] = a(dec_p[f"bn_{i}"]["bias"])
        sd[f"_decoder.convtrans.{bid}.running_mean"] = a(dec_s[f"bn_{i}"]["mean"])
        sd[f"_decoder.convtrans.{bid}.running_var"] = a(dec_s[f"bn_{i}"]["var"])
        sd[f"_decoder.convtrans.{bid}.num_batches_tracked"] = np.asarray(0, np.int64)
    return sd


# ---------------------------------------------------------------------------
# GRBM
# ---------------------------------------------------------------------------

def grbm_from_state_dict(sd: Dict[str, np.ndarray]) -> Tuple[GRBMParams, GRBMGraph]:
    """torch ``grbm.pth`` state dict → (GRBMParams, GRBMGraph).

    Layout verified against the shipped checkpoints (SURVEY.md §2b P2):
    ``_linear`` (n,), ``_quadratic`` (E,), ``_edge_idx_i/_edge_idx_j`` (E,),
    ``_visible_idx`` (n,), empty hidden/adjacency tensors.
    """
    import jax.numpy as jnp

    linear = np.asarray(sd["_linear"], np.float32)
    quadratic = np.asarray(sd["_quadratic"], np.float32)
    graph = GRBMGraph(
        n=linear.shape[0],
        edge_i=np.asarray(sd["_edge_idx_i"], np.int32),
        edge_j=np.asarray(sd["_edge_idx_j"], np.int32),
    )
    params = GRBMParams(linear=jnp.asarray(linear), quadratic=jnp.asarray(quadratic))
    return params, graph


def grbm_state_dict(params: GRBMParams, graph: GRBMGraph) -> Dict[str, np.ndarray]:
    """(GRBMParams, GRBMGraph) → torch ``grbm.pth`` state dict arrays."""
    empty = np.zeros((0,), np.int64)
    return {
        "_linear": np.asarray(params.linear, np.float32),
        "_quadratic": np.asarray(params.quadratic, np.float32),
        "_edge_idx_i": np.asarray(graph.edge_i, np.int64),
        "_edge_idx_j": np.asarray(graph.edge_j, np.int64),
        "_visible_idx": np.asarray(graph.visible_idx, np.int64),
        "_hidden_idx": empty,
        "_flat_adj": empty,
        "_flat_j_idx": empty,
        "_bin_idx": empty,
    }
