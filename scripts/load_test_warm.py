"""Load-test the coalescing warm-serving surface (app/warm.py).

VERDICT r3 weak item 6: warm serving was strictly serial — one resident
trainer, one request at a time — while the fused-scan bench proved the
device amortizes requests ~6× (45 ms single warm request vs 7.18 ms/request
fused, BENCHMARKS.md).  ``WarmGenerator.serve()`` now coalesces: concurrent
requests share ONE fused sample→decode dispatch (`_Coalescer`).

Two measurements, threaded clients both:

1. **serve() surface** (the PASS gate): per-request latency of the
   coalescing machinery itself — device dispatch + result fetch + grid
   assembly.  PASS = concurrent mean ≪ N × serial mean (the burst did not
   serialize) AND fused dispatches < requests served.
2. **HTTP end-to-end** (context): the same bursts through a live server's
   POST /api/generate_now.  On this ONE-CORE box the per-request figure
   JSON encode + the client's own reads serialize on the CPU regardless of
   device batching, so this number is environment-bound; recorded, not
   gated.  (The r4 uint8-z figure quantization cut that encode ~3×.)

Usage:  python scripts/load_test_warm.py [--model runs/models/tpu_digits_40_epochs]
            [--bursts 8] [--concurrency 8] [--out runs/warm_serving_load.json]

Reference contrast: the reference serves each generation as its own
background OS process (demo_callbacks.py:713-795) — N concurrent users cost
N full processes, each re-loading torch and the model.
"""

from __future__ import annotations

import argparse
import json
import shutil
import statistics
import sys
import tempfile
import threading
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def _post_raw(port, path, body):
    """POST and drain the raw response — no client-side JSON parse (that
    would bill ~40 ms/MB of this box's single core to the server)."""
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=1800) as r:
        return r.read()


def _threaded(fn, k):
    """Run fn(i) from k threads; return per-call wall latencies (ms)."""
    lats = [None] * k
    errs = [None] * k

    def call(i):
        t0 = time.perf_counter()
        try:
            fn(i)
        except BaseException as e:  # noqa: BLE001 — harness
            errs[i] = e
        lats[i] = (time.perf_counter() - t0) * 1e3

    ts = [threading.Thread(target=call, args=(i,)) for i in range(k)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=1800)
    for e in errs:
        if e is not None:
            raise e
    return lats


def _bench(label, fire, warm, serial_n, bursts, concurrency, stats):
    """serial singletons then concurrent bursts of ``fire``; returns dict."""
    _threaded(fire, concurrency)  # compile/warm the burst bucket, untimed
    warm()
    serial = [(_threaded(fire, 1))[0] for _ in range(serial_n)]
    d0, s0 = stats()["dispatches"], stats()["served"]
    t0 = time.perf_counter()
    conc = []
    for _ in range(bursts):
        conc.extend(_threaded(fire, concurrency))
    wall = time.perf_counter() - t0
    d1, s1 = stats()["dispatches"], stats()["served"]
    sm, cm = statistics.mean(serial), statistics.mean(conc)
    out = {
        "serial_ms_mean": round(sm, 2),
        "serial_ms_p50": round(statistics.median(serial), 2),
        "concurrent_ms_mean": round(cm, 2),
        "concurrent_ms_p50": round(statistics.median(conc), 2),
        "concurrent_ms_max": round(max(conc), 2),
        "throughput_req_per_s": round(len(conc) / wall, 2),
        "fused_dispatches": d1 - d0,
        "requests_served": s1 - s0,
        "serialized_would_be_ms": round(concurrency * sm, 2),
        "speedup_vs_serialized": round(concurrency * sm / cm, 2),
    }
    print(f"{label}: serial {sm:.0f} ms → concurrent×{concurrency} "
          f"{cm:.0f} ms/req ({out['speedup_vs_serialized']}× vs serialized, "
          f"{out['fused_dispatches']} dispatches / "
          f"{out['requests_served']} reqs)", file=sys.stderr)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="runs/models/tpu_digits_40_epochs")
    ap.add_argument("--bursts", type=int, default=4)
    ap.add_argument("--concurrency", type=int, default=16)
    ap.add_argument("--serial", type=int, default=6,
                    help="serial warm requests for the baseline latency")
    ap.add_argument("--out", default="runs/warm_serving_load.json")
    ap.add_argument(
        "--override", action="append", default=[], metavar="KEY=VAL",
        help="TrainingConfig override for the warm serving trainer "
        "(repeatable; values YAML-parsed) — e.g. the scaled serving regime: "
        "--override SAMPLER=pt --override PT_NUM_BETAS=32 "
        "--override NUM_READS=64 --override GIBBS_SWEEPS=4 "
        "--override GIBBS_BURN_IN=4 (SAMPLER_MATMUL_DTYPE stays 'auto' so "
        "the at-scale int8 serving default, config.for_serving, is what "
        "gets measured)",
    )
    args = ap.parse_args(argv)
    from image_generation_tpu.config import TrainingConfig

    warm_overrides = TrainingConfig.parse_overrides(args.override)

    from image_generation_tpu.app.server import make_server

    model_src = Path(args.model).resolve()
    assert (model_src / "dvae.pth").exists(), f"no checkpoint at {model_src}"
    workdir = Path(tempfile.mkdtemp(prefix="warm_load_"))
    dst = workdir / "models" / model_src.name
    dst.parent.mkdir(parents=True)
    shutil.copytree(model_src, dst)

    srv = make_server(
        workdir, port=0, warm_generate=True,
        warm_overrides=warm_overrides or None,
    )
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    name = model_src.name
    import jax

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    try:
        t0 = time.perf_counter()
        body = _post_raw(port, "/api/generate_now", {"model": name})
        assert b'"figure"' in body[:200], body[:200]
        print(f"cold first request: {(time.perf_counter() - t0):.0f} s "
              "(model load + compile)", file=sys.stderr)

        n = args.concurrency
        # compile EVERY power-of-two bucket a timed burst can hit (a leader
        # can catch any prefix of a burst — an intermediate bucket compiling
        # inside the timed region would bill a 60-150 s relay compile as
        # serving latency)
        for b in srv.warm.warm_buckets(dst, n):
            print(f"warmed bucket {b}", file=sys.stderr)
        report = {
            "what": "threaded-client load test of the coalescing warm "
                    "serving (app/warm.py): serve() surface gates PASS; "
                    "HTTP POST /api/generate_now end-to-end recorded for "
                    "context (single-core figure-encode bound)",
            "device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}",
            "model": name,
            "concurrency": n,
            "bursts": args.bursts,
            "serial_requests": args.serial,
            "warm_overrides": warm_overrides,
        }
        tcfg = srv.warm._trainer.config
        report["serving_config"] = {
            "n_latents": srv.warm._trainer.n_latents,
            "sampler": tcfg.SAMPLER,
            "num_reads": tcfg.NUM_READS,
            "pt_num_betas": tcfg.PT_NUM_BETAS
            if tcfg.SAMPLER == "pt" else None,
            # "int8" here on an at-scale model = the config.for_serving
            # default actually engaging at the product surface
            "sampler_matmul_dtype": tcfg.SAMPLER_MATMUL_DTYPE,
        }

        def fire_serve(_i):
            out = srv.warm.serve(dst)
            assert out["images"].shape[0] > 0

        report["serve"] = _bench(
            "serve()", fire_serve, lambda: None, args.serial, args.bursts,
            n, lambda: srv.warm.stats,
        )

        def fire_http(_i):
            body = _post_raw(port, "/api/generate_now", {"model": name})
            assert b'"figure"' in body[:200]

        report["http"] = _bench(
            "HTTP", fire_http, lambda: None, args.serial, args.bursts,
            n, lambda: srv.warm.stats,
        )

        s = report["serve"]
        report["pass"] = bool(
            s["concurrent_ms_mean"] < 0.5 * s["serialized_would_be_ms"]
            and s["fused_dispatches"] < s["requests_served"]
        )
        out = json.dumps(report, indent=1)
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(out)
        print(out)
        assert report["pass"], "load test FAILED: serve() burst serialized"
    finally:
        srv.shutdown()
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
