"""Probe: is int8 MXU worth wiring into the Gibbs sweep path on this chip?

The v5e datasheet doubles peak throughput from bf16 (197 TFLOP/s) to int8
(394 TOPS).  Spins are exactly representable in int8 (±1) and the learned
couplings tolerate 8-bit quantization by construction — the reference demo
runs its negative phase on a physical annealer whose analog h/J control
errors are far coarser than 1/127 (D-Wave ICE documentation; the reference
clips J into the hardware j_range, src/utils/common.py:103-140).

Two questions, answered by measurement (relay rules per CLAUDE.md: chained
scan, state carried between iterations, value fetched):

1. XLA path: does a sweep-shaped dot (chains x n_pad) @ (n_pad x width)
   with int8 operands and int32 accumulation beat the bf16 dot?
2. Mosaic path: does an int8 jnp.dot even compile inside a Pallas TPU
   kernel on this jax version (the HBM-streaming sampler would also halve
   its DMA traffic)?

Usage: python scripts/probe_int8.py [--chains 2048 --n-pad 5696 --width 512]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed_sweep_scan(dtype_name: str, chains: int, n_pad: int, width: int,
                     iters: int):
    """Scan of sweep-shaped dots; each iteration's block update feeds the
    next matmul so nothing can be cached, sunk, or DCE'd."""
    key = jax.random.PRNGKey(0)
    a_f32 = jax.random.normal(key, (n_pad, n_pad), jnp.float32) * 0.05
    s0 = jnp.where(
        jax.random.bernoulli(key, 0.5, (chains, n_pad)), 1.0, -1.0
    ).astype(jnp.float32)

    if dtype_name == "int8":
        scale = jnp.max(jnp.abs(a_f32)) / 127.0
        a = jnp.round(a_f32 / scale).astype(jnp.int8)

        def body(s, _):
            si = s.astype(jnp.int8)
            f = jax.lax.dot_general(
                si, jax.lax.slice_in_dim(a, 0, width, axis=1),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * scale
            new = jnp.where(f > 0, 1.0, -1.0)
            return jax.lax.dynamic_update_slice_in_dim(s, new, 0, axis=1), None
    else:
        mm = jnp.dtype(dtype_name)
        a = a_f32.astype(mm)

        def body(s, _):
            f = jax.lax.dot_general(
                s.astype(mm), jax.lax.slice_in_dim(a, 0, width, axis=1),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            new = jnp.where(f > 0, 1.0, -1.0)
            return jax.lax.dynamic_update_slice_in_dim(s, new, 0, axis=1), None

    @jax.jit
    def run(s):
        s, _ = jax.lax.scan(body, s, None, length=iters)
        return s.sum()

    # warm (compile) then chain two timed calls on distinct inputs
    float(run(s0))
    t0 = time.perf_counter()
    v = run(s0 * -1.0)
    float(v)
    dt = time.perf_counter() - t0
    flops = 2.0 * chains * n_pad * width * iters
    return dt, flops / dt / 1e12


def probe_mosaic_int8():
    """Does Mosaic compile an int8 dot inside a Pallas TPU kernel here?"""
    from jax.experimental import pallas as pl

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(
            a_ref[:], b_ref[:], preferred_element_type=jnp.int32
        )

    a = jnp.ones((256, 512), jnp.int8)
    b = jnp.ones((512, 512), jnp.int8)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((256, 512), jnp.int32),
        )(a, b)
        ok = int(out[0, 0]) == 512
        return {"compiles": True, "correct": ok}
    except Exception as e:  # noqa: BLE001 - report whatever Mosaic raises
        return {"compiles": False, "error": f"{type(e).__name__}: {e}"[:300]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=2048)
    ap.add_argument("--n-pad", type=int, default=5696)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--iters", type=int, default=400)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind}")
    out = {"device": str(dev.device_kind),
           "shape": [args.chains, args.n_pad, args.width],
           "iters": args.iters}
    for dt in ("bfloat16", "int8"):
        sec, tflops = timed_sweep_scan(
            dt, args.chains, args.n_pad, args.width, args.iters
        )
        out[dt] = {"sec": round(sec, 4), "tflops": round(tflops, 2)}
        print(f"{dt:9s}: {sec*1e3:8.1f} ms  {tflops:7.2f} T(FL)OP/s")
    out["speedup_int8_vs_bf16"] = round(
        out["bfloat16"]["sec"] / out["int8"]["sec"], 3
    )
    out["mosaic_int8"] = probe_mosaic_int8()
    print("mosaic int8:", out["mosaic_int8"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
