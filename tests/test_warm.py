"""Warm-serving request coalescing (app/warm.py).

The reference serves each generation as its own background OS process
(demo_callbacks.py:713-795) — concurrency means N full processes.  The warm
path's measured gap (BENCHMARKS.md): 45 ms per serial warm request vs
7.18 ms/request when requests share one fused dispatch.  ``_Coalescer``
closes it: concurrent ``serve()`` calls are grouped into one device
dispatch.  These tests pin the batcher's contract (threading only — the
device side is covered by the server integration test and on-chip runs).
"""

import threading
import time

import pytest

from image_generation_tpu.app.warm import _Coalescer, _Request


def _fire(coalescer, reqs):
    """Submit each request from its own thread; return results by index."""
    results = [None] * len(reqs)
    errors = [None] * len(reqs)

    def call(i):
        try:
            results[i] = coalescer.submit(reqs[i])
        except BaseException as e:  # noqa: BLE001 — test harness
            errors[i] = e

    threads = [threading.Thread(target=call, args=(i,)) for i in range(len(reqs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
        assert not t.is_alive(), "coalescer stranded a submitter"
    return results, errors


def test_concurrent_requests_share_dispatches():
    """N concurrent same-model requests must run in FEWER than N dispatches
    (the first becomes leader; the rest arrive during its dispatch and are
    served together in the next one)."""
    groups_seen = []
    gate = threading.Event()

    def run_group(group):
        groups_seen.append(len(group))
        gate.wait(5)  # hold the first dispatch until all requests queued
        time.sleep(0.02)
        for r in group:
            r.result = {"served_with": len(group)}

    c = _Coalescer(run_group, max_batch=8)
    reqs = [_Request("model_a") for _ in range(6)]
    t0 = threading.Thread(
        target=lambda: (time.sleep(0.3), gate.set())
    )
    t0.start()
    results, errors = _fire(c, reqs)
    t0.join()
    assert all(e is None for e in errors)
    assert all(r is not None for r in results)
    assert c.served == 6
    # first dispatch takes whoever was queued when the leader grabbed the
    # queue; everyone else shares the follow-up dispatch(es)
    assert c.dispatches < 6
    assert sum(groups_seen) == 6
    # at least one dispatch actually batched multiple requests
    assert max(groups_seen) > 1


def test_groups_are_not_mixed_and_capped():
    """Different models never share a dispatch; a dispatch never exceeds
    max_batch."""
    seen = []

    def run_group(group):
        seen.append({r.group for r in group})
        assert len(group) <= 3
        for r in group:
            r.result = r.group

    c = _Coalescer(run_group, max_batch=3)
    reqs = [_Request("m1" if i % 2 else "m2") for i in range(8)]
    results, errors = _fire(c, reqs)
    assert all(e is None for e in errors)
    for group_keys in seen:
        assert len(group_keys) == 1  # one model per dispatch
    for req, res in zip(reqs, results):
        assert res == req.group  # everyone got their own group's result


def test_single_request_is_a_batch_of_one():
    """A lone caller must not wait for peers (serial path preserved)."""
    def run_group(group):
        for r in group:
            r.result = len(group)

    c = _Coalescer(run_group, max_batch=8)
    out = c.submit(_Request("m"))
    assert out == 1
    assert c.dispatches == 1 and c.served == 1


def test_group_failure_surfaces_to_each_request_and_recovers():
    """A failing dispatch raises in EVERY submitter of that group, and the
    coalescer keeps serving afterwards."""
    calls = {"n": 0}

    def run_group(group):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ValueError("device fell over")
        for r in group:
            r.result = "ok"

    c = _Coalescer(run_group, max_batch=8)
    with pytest.raises(ValueError, match="device fell over"):
        c.submit(_Request("m"))
    assert c.submit(_Request("m")) == "ok"


def test_late_arrivals_get_served_by_standing_leader():
    """Requests that land while the leader is mid-dispatch are still served
    (by the same leader or a handoff successor — no lost wakeups)."""
    started = threading.Event()
    release = threading.Event()

    def run_group(group):
        started.set()
        release.wait(5)
        for r in group:
            r.result = "ok"

    c = _Coalescer(run_group, max_batch=8)
    first = threading.Thread(
        target=lambda: c.submit(_Request("m")), daemon=True
    )
    first.start()
    assert started.wait(5)
    # leader is inside run_group now; this submission must still be served
    late_result = {}

    def late():
        late_result["v"] = c.submit(_Request("m"))

    lt = threading.Thread(target=late, daemon=True)
    lt.start()
    time.sleep(0.05)
    release.set()
    first.join(timeout=10)
    lt.join(timeout=10)
    assert late_result.get("v") == "ok"
    assert c.served == 2


def test_leader_hands_off_after_own_request_served():
    """Once the leader's own request is served it returns immediately and a
    waiting follower takes over leadership — under a sustained open-loop
    arrival stream the leader's latency must not grow with the queue."""
    gates = [threading.Event() for _ in range(4)]
    started = [threading.Event() for _ in range(4)]
    count = {"n": 0}
    dispatchers = []

    def run_group(group):
        i = count["n"]
        count["n"] += 1
        dispatchers.append(threading.current_thread())
        started[i].set()
        gates[i].wait(5)
        for r in group:
            r.result = "ok"

    c = _Coalescer(run_group, max_batch=1, window_s=0)
    results = {}
    ta = threading.Thread(
        target=lambda: results.__setitem__("a", c.submit(_Request("m"))),
        daemon=True,
    )
    ta.start()
    assert started[0].wait(5)  # leader A is mid-dispatch with its own request
    tb = threading.Thread(
        target=lambda: results.__setitem__("b", c.submit(_Request("m"))),
        daemon=True,
    )
    tb.start()
    for _ in range(500):  # wait until B is queued behind A's dispatch
        with c._cv:
            if c._pending:
                break
        time.sleep(0.005)
    else:
        raise AssertionError("follower never queued")
    gates[0].set()  # A's own dispatch completes; B is still pending
    ta.join(timeout=5)
    assert not ta.is_alive(), "leader did not return once its request was done"
    assert results["a"] == "ok"
    assert tb.is_alive()  # follower's dispatch is gated — not served yet
    assert started[1].wait(5)
    assert dispatchers[1] is tb, "waiting follower did not take over leadership"
    gates[1].set()
    tb.join(timeout=5)
    assert results["b"] == "ok"
    assert c.served == 2


def test_serving_default_flips_to_int8_at_scale(tmp_path, monkeypatch):
    """The serving surface defaults at-scale models to the int8 quantized
    sampler (config.for_serving, gated by SERVING_INT8_MIN_LATENTS) and
    actually serves from it; small models keep 'auto'.  The threshold is
    monkeypatched down so a tiny checkpoint exercises the at-scale path
    end-to-end (the real gate value is pinned in tests/test_config.py)."""
    from image_generation_tpu.app.warm import WarmGenerator
    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.ops.quant import QuantCoupling
    from image_generation_tpu.training.trainer import Trainer
    import image_generation_tpu.config as config_mod

    cfg = TrainingConfig(
        N_LATENTS=32, NUM_READS=16, BATCH_SIZE=16, DATASET_SIZE=64,
        N_REPLICAS=2, GIBBS_SWEEPS=2, GIBBS_BURN_IN=4,
        QPU="Advantage2_prototype",
    )
    t = Trainer(config=cfg)
    t.train_init(n_epochs=1)
    t.train_epoch(0)
    ckpt = t.save(tmp_path / "models" / "m", n_epochs=1)

    small_overrides = dict(
        DATASET_SIZE=64, BATCH_SIZE=16, NUM_READS=16,
        GIBBS_SWEEPS=2, GIBBS_BURN_IN=4, N_REPLICAS=2,
    )
    wg = WarmGenerator(tmp_path, config_overrides=small_overrides, mesh=None)
    tr = wg._trainer_for(ckpt)
    assert tr.config.SAMPLER_MATMUL_DTYPE == "auto"  # below the gate

    monkeypatch.setattr(config_mod, "SERVING_INT8_MIN_LATENTS", 1)
    wg2 = WarmGenerator(tmp_path, config_overrides=small_overrides, mesh=None)
    tr2 = wg2._trainer_for(ckpt)
    assert tr2.config.SAMPLER_MATMUL_DTYPE == "int8"
    # the cached sampler leaf really is the quantized model ...
    assert isinstance(tr2.state.sampler_coupling, QuantCoupling)
    # ... and the coalescing serve path runs on it
    out = wg2.serve(ckpt)
    assert out["images"].shape[0] == 16
    assert out["batched"] >= 1


def test_cli_generate_applies_serving_default(tmp_path, monkeypatch):
    """cmd_generate routes through the same serving-config resolution: the
    builder peeks the checkpoint's parameters.json (no model load needed)."""
    import json as _json

    from image_generation_tpu.app.cli import _build_trainer
    import image_generation_tpu.config as config_mod

    mdir = tmp_path / "models" / "big"
    mdir.mkdir(parents=True)
    (mdir / "parameters.json").write_text(_json.dumps({"n_latents": 4096}))

    class Args:
        params = None
        latents = None
        dataset_size = 64
        batch_size = 16
        mesh = "off"

    monkeypatch.setattr(config_mod, "SERVING_INT8_MIN_LATENTS", 8192)
    tr = _build_trainer(Args(), for_load=True, serving_model_dir=mdir)
    assert tr.config.SAMPLER_MATMUL_DTYPE == "auto"
    monkeypatch.setattr(config_mod, "SERVING_INT8_MIN_LATENTS", 2048)
    tr2 = _build_trainer(Args(), for_load=True, serving_model_dir=mdir)
    assert tr2.config.SAMPLER_MATMUL_DTYPE == "int8"


def test_warm_buckets_compiles_every_power_of_two(tmp_path, monkeypatch):
    """warm_buckets must drive _run_group once per power-of-two group size
    up to (the padded bucket of) max_concurrency — the pre-traffic compile
    warm-up the load test relies on; an intermediate bucket compiling
    inside a timed burst would bill a 60-150 s relay compile as serving
    latency (scripts/load_test_warm.py)."""
    from image_generation_tpu.app.warm import WarmGenerator

    w = WarmGenerator(tmp_path)
    sizes, models = [], set()

    def fake_run_group(group):
        sizes.append(len(group))
        models.update(r.group for r in group)
        for r in group:
            r.result = (None, len(group))

    monkeypatch.setattr(w, "_run_group", fake_run_group)
    assert w.warm_buckets("model_a", 6) == [1, 2, 4, 8]
    assert sizes == [1, 2, 4, 8]  # 6 pads to bucket 8; every prefix warmed
    assert len(models) == 1  # one model per warm-up
    # a lone-caller deployment still warms the singleton bucket
    sizes.clear()
    assert w.warm_buckets("model_a", 0) == [1]
    assert sizes == [1]
