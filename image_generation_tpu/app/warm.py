"""In-process warm generation serving.

The reference runs every generation request as a background OS process
(demo_callbacks.py:713-795, ``background=True``): process start + model
load + sampler-session setup are paid per request — acceptable there
because the QPU anneal round-trip dominates anyway.  On this framework the
request itself is ~ms (bench.py --generate) but a cold process pays XLA
compilation first (~minutes through the TPU relay), so the per-request
process model is the wrong serving shape.

``WarmGenerator`` keeps ONE loaded :class:`Trainer` — and therefore its
compiled sample→decode executables — alive inside the server process;
every request after the first runs at device speed.  The cache key is
``(model dir, dvae.pth mtime)``: a re-trained or tuned model under the
same name is picked up automatically, and switching models swaps the
trainer (one at a time — this is a single-chip serving surface gated by
the server's one-job-at-a-time JobManager).

It writes exactly the artifacts the CLI ``generate`` job writes
(app/cli.py cmd_generate), so the page's polling/redraw flow is unchanged
whichever path served the request.

``serve()`` is the CONCURRENT serving surface on top of the same resident
trainer: requests that arrive while a device dispatch is in flight are
queued and served together through ONE fused sample→decode dispatch (the
bucket's requests fold into the chain dimension of a single sample call —
iid chains — and one batched decode; output ships uint8).  A leader/follower coalescer
(``_Coalescer``) keeps it lock-simple: the first thread to find no dispatch
in flight becomes the leader and drains the queue in model-grouped,
power-of-two-padded batches (bounding compile count); once the leader's own
request is served it hands leadership to a waiting follower (bounded leader
latency under a sustained arrival stream).  Per-request host
post-processing (uint8→f32, sharpen, grid assembly) runs in EACH caller's
own thread after its slice lands — the leader does only the shared device
dispatch, so follower work parallelizes on multi-core hosts.  Single
callers keep single-request latency — a batch of one runs the k=1
executable.
"""

from __future__ import annotations

import threading
import time
from pathlib import Path
from typing import Optional


class _Request:
    """One ``serve()`` call waiting for its slice of a fused dispatch."""

    __slots__ = ("group", "done", "result", "error")

    def __init__(self, group: str):
        # no per-request options travel through the coalescer: the dispatch
        # returns raw uint8 slices and sharpen/grid run in serve() itself
        self.group = group
        self.done = False
        self.result = None
        self.error = None


class _Coalescer:
    """Leader/follower request batcher.

    ``submit()`` enqueues the request; the first thread to find no leader
    in place becomes the leader and repeatedly: takes every pending request
    for the head request's group (up to ``max_batch``), runs them through
    ``run_group`` in one device dispatch, and wakes them — until its OWN
    request is served, at which point it steps down and (if a queue
    remains) wakes a waiting follower to take over leadership.  The
    handoff bounds every request's latency to ~the dispatches until its
    own group runs — under an open-loop sustained arrival stream the old
    drain-until-empty leader's latency was unbounded even though its
    result was ready.  Requests that arrive during a dispatch land in the
    next one, so per-request latency under concurrency is ≤ ~2 dispatches
    instead of N serial dispatches.  All queue state lives under one
    condition variable: no lost wakeups.

    ``window_s``: a short batching window the leader sleeps before EACH
    drain, letting a concurrent burst land in one dispatch instead of a
    leader singleton + the rest (the measured split pattern,
    runs/warm_serving_load.json).  Costs a lone caller ``window_s`` on top
    of a ~40 ms dispatch — the classic inference-server batching
    trade-off, kept small by default."""

    def __init__(self, run_group, max_batch: int, window_s: float = 0.005):
        self._cv = threading.Condition()
        self._pending: list[_Request] = []
        self._busy = False
        self._run_group = run_group
        self.max_batch = max_batch
        self.window_s = window_s
        self.dispatches = 0  # fused device dispatches (observability/tests)
        self.served = 0      # requests completed

    def submit(self, req: _Request):
        lead = False
        with self._cv:
            self._pending.append(req)
            # follower: wait until served, or until leadership frees up
            while not req.done and self._busy:
                self._cv.wait()
            if not req.done:
                self._busy = lead = True
        if lead:
            self._lead(req)
        if req.error is not None:
            raise req.error
        return req.result

    def _lead(self, own: _Request):
        """Dispatch groups until ``own`` is served, then hand off."""
        group: list[_Request] = []
        try:
            while True:
                with self._cv:
                    if own.done:
                        # own request served: step down; wake a waiting
                        # follower to lead whatever queue remains
                        self._busy = False
                        if self._pending:
                            self._cv.notify_all()
                        return
                if self.window_s > 0:
                    time.sleep(self.window_s)
                with self._cv:
                    # own ∉ done ⇒ own ∈ pending (we are the only dispatcher)
                    g = self._pending[0].group
                    group = [r for r in self._pending if r.group == g]
                    group = group[: self.max_batch]
                    for r in group:
                        self._pending.remove(r)
                try:
                    self._run_group(group)
                except Exception as e:  # surfaced per-request;
                    # KeyboardInterrupt/SystemExit fall through to the
                    # stranded-follower handler below and propagate
                    for r in group:
                        r.error = e
                with self._cv:
                    self.dispatches += 1
                    self.served += len(group)
                    for r in group:
                        r.done = True
                    self._cv.notify_all()
        except BaseException:
            # never strand followers: step down and wake the queue — the
            # in-flight group too (its members already left pending)
            with self._cv:
                self._busy = False
                stranded, self._pending = self._pending, []
                for r in stranded + [r for r in group if not r.done]:
                    r.error = r.error or RuntimeError("serving leader died")
                    r.done = True
                self._cv.notify_all()
            raise


class WarmGenerator:
    def __init__(self, workdir, config_overrides: Optional[dict] = None,
                 mesh="auto", params=None, serve_max_batch: int = 16,
                 serve_window_ms: float = 5.0):
        """``config_overrides``: TrainingConfig field overrides for the
        serving trainer (tests pass tiny DATASET_SIZE/BATCH_SIZE; the
        model's own parameters.json still decides N_LATENTS/QPU at load).
        ``mesh``: Trainer mesh control — "auto" matches the CLI default.
        ``params``: optional training-parameters YAML path (the CLI's
        ``--params``), applied under the overrides like _build_trainer.
        ``serve_max_batch`` / ``serve_window_ms``: coalescer knobs (CLI
        ``--serve-max-batch`` / ``--serve-window-ms``) — the max requests
        folded into one fused dispatch, and the batching window the leader
        waits before each drain."""
        self.workdir = Path(workdir)
        self.config_overrides = dict(config_overrides or {})
        self.mesh = mesh
        self.params = params
        self.lock = threading.Lock()
        self._trainer = None
        self._key = None  # (resolved model dir, dvae.pth mtime_ns)
        self._coalescer = _Coalescer(
            self._run_group, max_batch=serve_max_batch,
            window_s=serve_window_ms / 1e3,
        )
        self._serve_cache = {}  # (trainer key, bucket) → compiled serve fn

    def _trainer_for(self, model_path: Path):
        from image_generation_tpu.config import TrainingConfig
        from image_generation_tpu.training.trainer import Trainer

        mp = Path(model_path)
        key = (str(mp.resolve()), (mp / "dvae.pth").stat().st_mtime_ns)
        if self._key != key:
            cfg = (
                TrainingConfig.from_yaml(self.params, **self.config_overrides)
                if self.params
                else TrainingConfig(**self.config_overrides)
            )
            # serving surface: at-scale models default to the int8
            # quantized sampler (config.for_serving_dir — quality-neutral
            # by the image-MMD A/B, +71% request rate); same resolution as
            # the CLI generate path by construction
            cfg = cfg.for_serving_dir(mp)
            trainer = Trainer(qpu=cfg.QPU, config=cfg, mesh=self.mesh)
            trainer.load(mp)
            self._trainer, self._key = trainer, key
        return self._trainer

    def generate(self, model_path, sharpen: bool = False) -> None:
        """One generation request: sample the GRBM, decode, write the same
        ``generated_json``/diagram artifacts as the CLI job (cmd_generate —
        assets before the epoch-figure trigger, app/cli.py)."""
        from image_generation_tpu.app.cli import _write_details, _write_diagram_assets
        from image_generation_tpu.app.files import RunFiles

        with self.lock:
            t = self._trainer_for(model_path)
            gen = t.generate_output(do_sharpen=sharpen)
            files = RunFiles(self.workdir)
            files.clean()
            _write_details(t, files)
            rec = t.generate_reconstructed_samples(do_sharpen=sharpen)
            _write_diagram_assets(t, files, gen)
            files.write_epoch(
                0, gen["grid"], rec["grid"],
                t.losses["mse_losses"], t.losses["dvae_losses"],
            )

    # ------------------------------------------------------------------
    # concurrent synchronous serving (request coalescing)
    # ------------------------------------------------------------------
    @property
    def stats(self) -> dict:
        """Coalescing counters: fused device dispatches vs requests served
        (dispatches < served ⇔ batching happened)."""
        c = self._coalescer
        return {"dispatches": c.dispatches, "served": c.served}

    def serve(self, model_path, sharpen: bool = False) -> dict:
        """One synchronous generation request, coalescing-aware: returns
        {'grid', 'images', 'batched'} where ``batched`` is how many
        concurrent requests shared this request's fused dispatch.  Unlike
        ``generate`` this writes NO workdir artifacts — it is the
        concurrent serving surface (server: POST /api/generate_now), so
        each caller gets its own freshly-keyed sample→decode result.

        The coalescer returns the raw uint8 device slice; the f32
        conversion, optional sharpen, and grid assembly run HERE — in the
        requesting thread — so per-request host post-processing
        parallelizes across caller threads instead of serializing on the
        leader (moot on a 1-core box, real on any multi-core server)."""
        import numpy as np

        from image_generation_tpu.utils.grid import make_grid, sharpen as _sharpen

        req = _Request(str(Path(model_path).resolve()))
        imgs8, batched = self._coalescer.submit(req)
        out = imgs8.astype(np.float32) / 255.0
        if sharpen:
            out = _sharpen(out)
        return {"grid": make_grid(out, nrow=16), "images": out,
                "batched": batched}

    def warm_buckets(self, model_path, max_concurrency: int) -> list:
        """Pre-compile (and warm-execute) the fused serving executable for
        every power-of-two bucket a burst of up to ``max_concurrency``
        concurrent requests can land in (``_run_group`` pads group size to
        the next power of two, so those are the only shapes that exist).

        Deployment surface: call before opening traffic so no bucket
        compiles (60-150 s through the remote relay) inside a served burst
        — the load test (scripts/load_test_warm.py) warms through this
        before its timed section.  Returns the group sizes warmed."""
        cap = 1
        while cap < max(1, max_concurrency):
            cap *= 2
        sizes, b = [], 1
        while b <= cap:
            self._run_group(
                [_Request(str(Path(model_path).resolve())) for _ in range(b)]
            )
            sizes.append(b)
            b *= 2
        return sizes

    def _run_group(self, group) -> None:
        """Serve ``group`` (same model) through ONE fused device dispatch.

        TPU-native batching: the bucket's requests fold into the CHAIN
        dimension of a single sample call (Gibbs/PT chains are iid — request
        i owns reads-chunk i) and one batched decode, so device time is one
        bigger matmul set, NOT a sequential per-request scan; the result
        ships uint8 (the figure/PNG precision anyway), 4× less relay
        traffic than f32 — the two costs the first load test measured as
        linear-in-N (runs/warm_serving_load.json).  Bucket counts pad to a
        power of two so compilations stay bounded (1/2/4/8).

        Each request's ``result`` is its RAW (reads, S, S, 1) uint8 slice
        plus the batch count — the per-request f32/sharpen/grid host work
        happens in the requester's own thread (``serve``), not here on the
        leader."""
        import numpy as np

        with self.lock:  # serialize with the artifact-writing job path
            t = self._trainer_for(group[0].group)
            k = len(group)
            bucket = 1
            while bucket < k:
                bucket *= 2
            fn = self._serve_fn(t, bucket)
            st = t.state
            imgs8 = np.asarray(fn(
                t._next_key(), st.dvae_params, st.batch_stats,
                st.grbm_params, st.pt_betas,
            ))  # (bucket, reads, S, S, 1) uint8
        for i, r in enumerate(group):
            r.result = (imgs8[i], k)

    def _serve_fn(self, trainer, bucket: int):
        """Compiled fused serving executable for ``bucket`` requests on the
        current trainer (cache keyed by the trainer's model key — a model
        swap recompiles; repeat buckets reuse).

        One sample call draws bucket·NUM_READS iid chains (in PT mode the
        ladder scales the same way inside ``fns.sample``), one decode runs
        them all through the MXU together, and the output is quantized to
        uint8 on device (exactly the 8-bit scale ``figures.imshow_figure``
        and the PNG renderer quantize to on the host)."""
        ck = (self._key, bucket)
        fn = self._serve_cache.get(ck)
        if fn is not None:
            return fn
        jax, jnp = _jax(), _jnp()
        cfg = trainer.config
        fns = trainer.fns
        dvae = fns.dvae
        reads = cfg.NUM_READS
        sweeps = cfg.GIBBS_BURN_IN + cfg.GIBBS_SWEEPS
        pt_mode = cfg.SAMPLER == "pt"

        @jax.jit
        def serve(key, params, batch_stats, grbm_params, pt_betas):
            spins = fns.sample(
                key, grbm_params, bucket * reads, sweeps,
                betas=pt_betas if pt_mode else None,
            )  # (bucket·reads, n) — request i owns rows [i·reads, (i+1)·reads)
            out = dvae.apply(
                {"params": params, "batch_stats": batch_stats},
                spins[:, None, :], train=False, method=dvae.decode,
            )[:, 0]
            img = jnp.clip(out, 0.0, 1.0)
            img8 = jnp.round(img * 255.0).astype(jnp.uint8)
            return img8.reshape(bucket, reads, *img8.shape[1:])

        if len(self._serve_cache) > 16:  # bound across model swaps:
            # evict only STALE-trainer entries — wiping the live model's
            # bucket executables would re-pay 60-150 s relay compiles
            # mid-serving while the coalescer leader holds the lock
            self._serve_cache = {
                k: v for k, v in self._serve_cache.items() if k[0] == self._key
            }
        self._serve_cache[ck] = serve
        return serve


def _jax():
    import jax

    return jax


def _jnp():
    import jax.numpy as jnp

    return jnp
