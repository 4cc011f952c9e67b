"""Web app tests: page render, API surface, background job lifecycle."""

import json
import threading
import time
import urllib.request

import pytest


def _get(port, path):
    try:
        with urllib.request.urlopen(f"http://localhost:{port}{path}", timeout=10) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://localhost:{port}{path}", data=json.dumps(obj).encode(), method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


@pytest.fixture()
def server(tmp_path):
    from image_generation_tpu.app.server import make_server

    # tiny-job extra args so background jobs finish fast on CPU
    extra = [
        "--platform", "cpu", "--dataset-size", "64", "--batch-size", "16",
        "--sweeps", "2",
    ]
    srv = make_server(tmp_path, port=0, extra_cli=extra)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, srv.server_address[1], tmp_path
    srv.shutdown()


def test_page_and_state(server):
    srv, port, _ = server
    status, body = _get(port, "/")
    assert status == 200
    html = body.decode()
    assert "ML Image Generation" in html
    assert "#074C91" in html  # theme CSS generated
    assert "Advantage2_system1" in html  # QPU dropdown

    status, body = _get(port, "/api/state")
    st = json.loads(body)
    assert st["job"]["state"] == "idle"
    assert st["latest_epoch"] is None


def test_plain_view_idle(server):
    """The zero-JS /plain view renders for a fresh workdir (idle job, no
    artifacts) with a meta refresh and no script tags at all."""
    srv, port, _ = server
    status, body = _get(port, "/plain")
    assert status == 200
    html = body.decode()
    assert "<script" not in html
    assert 'http-equiv="refresh"' in html
    assert "job: idle" in html
    # main page advertises it for script-less browsers
    _, main = _get(port, "/")
    assert "<noscript>" in main.decode() and "/plain" in main.decode()


def test_models_and_figure_endpoints(server):
    srv, port, tmp = server
    status, body = _get(port, "/api/models")
    assert json.loads(body) == []
    # unknown figure → 404 with empty json (the "epoch not done" contract)
    status, _ = _get(port, "/api/figure/generated/0")
    assert status == 404
    # write one through the protocol and read it back over HTTP
    from image_generation_tpu.app.files import RunFiles
    import numpy as np

    RunFiles(tmp).write_epoch(0, np.zeros((4, 4, 1)), np.zeros((4, 4, 1)), [1.0], [2.0])
    status, body = _get(port, "/api/figure/loss_mse/0")
    assert status == 200
    assert json.loads(body)["data"][0]["y"] == [1.0]


def test_model_data_html_endpoint(server):
    """The selected-model data card (reference generate_model_data,
    demo_interface.py:179-202): server-rendered from parameters.json with
    the QPU/Epochs/Latents/Batch fields + dataset origin."""
    srv, port, tmp = server
    # unknown → 404
    status, body = _get(port, "/api/model_data_html/nope")
    assert status == 404
    # invalid name → 404 (never joined into a path)
    status, _ = _get(port, "/api/model_data_html/..")
    assert status == 404
    # plant a model directory with reference-schema parameters.json
    mdir = tmp / "models" / "card_model"
    mdir.mkdir(parents=True)
    (mdir / "parameters.json").write_text(json.dumps({
        "n_latents": 64, "n_epochs": 7, "qpu": "Advantage2_system1",
        "batch_size": 128, "data_source": "sklearn-digits-upsampled",
    }))
    status, body = _get(port, "/api/model_data_html/card_model")
    assert status == 200
    html = json.loads(body)["html"]
    for frag in ("QPU", "Advantage2_system1", "Epochs", "7", "Latents", "64",
                 "Batch Size", "128", "sklearn-digits-upsampled"):
        assert frag in html, f"model-data card missing {frag!r}: {html}"
    assert 'class="model-details"' in html


@pytest.mark.slow
def test_warm_generate(tmp_path):
    """In-process warm generation serving (app/warm.py): /api/generate runs
    on a daemon thread against a resident Trainer — same artifacts and
    status protocol as the subprocess path, single-job gate still applies,
    and a failing request surfaces state=failed with the error."""
    from image_generation_tpu.app.cli import main as cli_main
    from image_generation_tpu.app.server import make_server

    cli_main([
        "--workdir", str(tmp_path), "train", "--name", "warm_model",
        "--qpu", "Advantage2_prototype", "--latents", "32",
        "--dataset-size", "64", "--batch-size", "16", "--sweeps", "2",
        "--epochs", "1",
    ])
    srv = make_server(
        tmp_path, port=0, warm_generate=True,
        warm_overrides=dict(
            DATASET_SIZE=64, BATCH_SIZE=16, GIBBS_SWEEPS=2, NUM_READS=16
        ),
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]

        def wait_done(deadline_s=180):
            deadline = time.time() + deadline_s
            while time.time() < deadline:
                _, body = _get(port, "/api/state")
                job = json.loads(body)["job"]
                if job["state"] in ("done", "failed"):
                    return job
                # thread jobs are uninterruptible: cancel must report False
                status, resp = _post(port, "/api/cancel", {})
                assert resp == {"cancelled": False}
                time.sleep(1)
            raise AssertionError("warm job did not finish")

        status, resp = _post(port, "/api/generate", {"model": "warm_model"})
        assert status == 200 and resp["started"]
        job = wait_done()
        assert job == {"state": "done", "kind": "generate"}
        assert (tmp_path / "generated_json" / "generated_epoch_0.json").exists()
        assert (tmp_path / "assets" / "model_diagram" / "latent_qpu.json").exists()

        # second request: served by the SAME resident trainer (the warm
        # point), still one-job-gated, still completes
        status, resp = _post(port, "/api/generate", {"model": "warm_model"})
        assert status == 200 and resp["started"]
        assert wait_done()["state"] == "done"

        # a corrupt model fails the thread job and surfaces the error
        bad = tmp_path / "models" / "bad"
        bad.mkdir()
        (bad / "dvae.pth").write_bytes(b"not a checkpoint")
        status, resp = _post(port, "/api/generate", {"model": "bad"})
        assert status == 200 and resp["started"]
        job = wait_done()
        assert job["state"] == "failed" and job["error"]

        # and the manager is reusable after a failure
        status, resp = _post(port, "/api/generate", {"model": "warm_model"})
        assert status == 200 and resp["started"]
        assert wait_done()["state"] == "done"
    finally:
        srv.shutdown()


def test_generate_now_requires_warm(server):
    """The synchronous coalescing endpoint is a warm-serving surface: with
    no resident trainer it must refuse rather than fork a subprocess."""
    srv, port, _ = server
    status, resp = _post(port, "/api/generate_now", {"model": "whatever"})
    assert status == 400
    assert "warm serving disabled" in resp["error"]


@pytest.mark.slow
def test_generate_now_coalesces_concurrent_requests(tmp_path):
    """POST /api/generate_now: synchronous figure response; N concurrent
    requests are served through FEWER than N fused device dispatches
    (app/warm.py _Coalescer), each caller still getting its own
    freshly-keyed grid; it runs beside the job gate (no job slot used)."""
    from image_generation_tpu.app.cli import main as cli_main
    from image_generation_tpu.app.server import make_server

    cli_main([
        "--workdir", str(tmp_path), "train", "--name", "now_model",
        "--qpu", "Advantage2_prototype", "--latents", "32",
        "--dataset-size", "64", "--batch-size", "16", "--sweeps", "2",
        "--epochs", "1",
    ])
    srv = make_server(
        tmp_path, port=0, warm_generate=True,
        warm_overrides=dict(
            DATASET_SIZE=64, BATCH_SIZE=16, GIBBS_SWEEPS=2, NUM_READS=16
        ),
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        # unknown model guard still applies on this endpoint
        status, _ = _post(port, "/api/generate_now", {"model": "nope"})
        assert status == 404

        # the training job wrote its own artifacts — snapshot them so we can
        # assert the serve path adds none (it is read-only on the workdir)
        gen_dir = tmp_path / "generated_json"
        before = set(gen_dir.rglob("*")) if gen_dir.exists() else set()

        # single caller: batch of one, synchronous figure back
        status, resp = _post(port, "/api/generate_now", {"model": "now_model"})
        assert status == 200
        assert resp["batched"] == 1
        fig = resp["figure"]
        assert fig["data"][0]["type"] == "heatmap"
        assert fig["data"][0]["zmax"] == 255
        assert srv.warm.stats == {"dispatches": 1, "served": 1}

        # no artifacts added and no job slot consumed (the job-based flow
        # owns the workdir files; this surface is read-only on the workdir)
        after = set(gen_dir.rglob("*")) if gen_dir.exists() else set()
        assert after == before
        _, body = _get(port, "/api/state")
        assert json.loads(body)["job"]["state"] == "idle"

        # concurrent callers coalesce into shared dispatches.  On a loaded
        # 1-core box the n client threads can serialize completely (each
        # request finishing before the next even starts), so gate the
        # FIRST fused dispatch until the other requests are queued — the
        # in-flight-overlap scenario the coalescer exists for, made
        # deterministic.
        n = 5
        results = [None] * n
        coal = srv.warm._coalescer
        orig_run, gate = coal._run_group, threading.Event()

        def gated_run(group):
            gate.wait(120)
            orig_run(group)

        coal._run_group = gated_run

        def call(i):
            results[i] = _post(
                port, "/api/generate_now", {"model": "now_model"}
            )

        threads = [threading.Thread(target=call, args=(i,)) for i in range(n)]
        for th in threads:
            th.start()
        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                with coal._cv:
                    if coal._pending:  # followers queued behind the leader
                        break
                time.sleep(0.01)
            else:
                pytest.fail("no request ever queued behind the leader")
        finally:
            gate.set()
        for th in threads:
            th.join(timeout=600)
            assert not th.is_alive()
        coal._run_group = orig_run
        assert all(r[0] == 200 for r in results)
        stats = srv.warm.stats
        assert stats["served"] == 1 + n
        assert stats["dispatches"] < 1 + n, (
            f"no coalescing happened: {stats}"
        )
        assert max(r[1]["batched"] for r in results) > 1
    finally:
        srv.shutdown()


def test_warm_serving_honors_extra_cli(tmp_path):
    """make_server(warm_generate=True) must feed the per-job extra_cli flags
    into the warm trainer's config — /api/generate has to sample the same
    model whether it is served warm or as a CLI subprocess."""
    from image_generation_tpu.app.server import make_server

    srv = make_server(
        tmp_path, port=0,
        extra_cli=["--sampler-matmul-dtype", "int8", "--dataset-size", "32"],
        warm_generate=True,
        warm_overrides={"DATASET_SIZE": 64},  # explicit overrides win
    )
    try:
        assert srv.warm.config_overrides["SAMPLER_MATMUL_DTYPE"] == "int8"
        assert srv.warm.config_overrides["DATASET_SIZE"] == 64
    finally:
        srv.server_close()


def test_generate_unknown_model_404(server):
    srv, port, _ = server
    status, resp = _post(port, "/api/generate", {"model": "nope"})
    assert status == 404


def test_cancel_idle(server):
    srv, port, _ = server
    status, resp = _post(port, "/api/cancel", {})
    assert resp == {"cancelled": False}


def test_asset_traversal_blocked(server):
    srv, port, _ = server
    status, _ = _get(port, "/assets/../../../etc/passwd")
    assert status == 404


def test_name_validation():
    """The reference's file_name_validation pattern ^[\\w-]+$
    (demo_callbacks.py:441-457)."""
    from image_generation_tpu.app.server import valid_name

    assert valid_name("my_model-2")
    assert not valid_name("")
    assert not valid_name("a/b")
    assert not valid_name("../escape")
    assert not valid_name("/abs/path")
    assert not valid_name("name with space")
    assert not valid_name(None)
    assert not valid_name(42)


def test_post_traversal_blocked(server):
    """POST bodies with traversal/absolute model names are rejected with 400
    before any path join (ADVICE r1: Path join discards the base for
    absolute paths)."""
    srv, port, tmp = server
    for bad in ("../outside", "/etc", "a/b", "..", ""):
        for ep in ("/api/generate", "/api/tune", "/api/refresh_model"):
            status, resp = _post(port, ep, {"model": bad})
            assert status == 400, (ep, bad, status)
    status, _ = _post(port, "/api/train", {"name": "../evil"})
    assert status == 400
    # the same names are rejected on the GET topology endpoints too
    status, _ = _get(port, "/api/topology/../x/encoded")
    assert status == 404


def test_figure_bad_epoch_404(server):
    """Non-numeric epoch must 404, not crash the handler thread (ADVICE r1)."""
    srv, port, _ = server
    status, _ = _get(port, "/api/figure/generated/notanumber")
    assert status == 404
    status, _ = _get(port, "/api/render/generated/notanumber.png")
    assert status == 404


def test_render_endpoints(server):
    """Server-side rendering endpoints: PNG + SVG bodies from the figure
    files (the page's <img> sources)."""
    srv, port, tmp = server
    import numpy as np

    from image_generation_tpu.app.files import RunFiles

    status, _ = _get(port, "/api/render/generated/0.png")
    assert status == 404  # nothing written yet
    rf = RunFiles(tmp)
    rf.write_epoch(0, np.zeros((4, 4, 1)), np.ones((4, 4, 1)), [1.0, 0.5], [2.0, 1.5])
    status, body = _get(port, "/api/render/generated/0.png")
    assert status == 200 and body[:4] == b"\x89PNG"
    status, body = _get(port, "/api/render/loss_mse/0.svg")
    assert status == 200 and body.startswith(b"<svg")
    status, body = _get(port, "/api/render/loss_total/0.svg")
    assert status == 200 and b"polyline" in body

    # latent strip: 404 before the diagram exists, SVG after
    status, _ = _get(port, "/api/render/latent_strip.svg")
    assert status == 404
    rf.write_latent_encoded([1.0, -1.0, 1.0, 1.0, -1.0, 1.0])
    status, body = _get(port, "/api/render/latent_strip.svg")
    assert status == 200 and body.count(b"<rect") == 6


def test_problem_details_html_endpoint(server):
    srv, port, tmp = server
    status, body = _get(port, "/api/problem_details_html")
    assert json.loads(body) == {"html": ""}
    from image_generation_tpu.app.files import RunFiles

    RunFiles(tmp).write_problem_details(
        "Advantage2_system1", 32, 100, 64, "gibbs", extra={"Epoch": "1/2"}
    )
    status, body = _get(port, "/api/problem_details_html")
    html = json.loads(body)["html"]
    assert html.startswith('<table class="problem-details-table">')
    assert "<th>Epoch</th>" in html and "<td>1/2</td>" in html


def test_page_has_validation_and_captions(server):
    srv, port, _ = server
    _, body = _get(port, "/")
    html = body.decode()
    assert "validateName" in html and "name-help" in html
    assert "Epochs Completed" in html and "Batch:" in html
    assert "latent-strip" in html and "refresh_model" in html
    for ph in ("{title}", "{css}", "{qpu_options}", "{theme}", "{theme2}"):
        assert ph not in html  # no unformatted placeholders


def test_favicon_and_collapse_sections(server):
    """Reference cosmetic parity: favicon.ico asset + collapsible settings /
    problem-details sections (reference assets/favicon.ico, _collapse.css)."""
    import struct

    srv, port, _ = server
    status, body = _get(port, "/favicon.ico")
    assert status == 200
    rsv, typ, n = struct.unpack("<HHH", body[:6])
    assert (rsv, typ, n) == (0, 1, 1)  # valid single-image ICO
    w, h, _pal, _rsv, _planes, bpp, size, off = struct.unpack(
        "<BBBBHHII", body[6:22]
    )
    assert (w, h, bpp) == (16, 16, 32) and off + size == len(body)

    for path in ("/", "/plain"):
        _, page = _get(port, path)
        assert b'rel="icon" href="/favicon.ico"' in page
    _, page = _get(port, "/")
    html = page.decode()
    assert 'id="settings-collapse" open' in html
    assert 'id="problem-details-collapse" open' in html
    # the collapsibles are plain <details> — they must wrap, not replace,
    # the JS-addressed nodes
    assert html.count("<details") == html.count("</details>") == 2


def test_default_output_placeholder(server):
    """The diagram's output slot starts at the packaged placeholder until a
    model renders (reference demo_interface.py:608, STEP_5_FILE_DEFAULT)."""
    srv, port, tmp = server
    status, body = _get(port, "/assets/model_diagram/step_5_output_default.png")
    assert status == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
    _, page = _get(port, "/")
    assert b'src="/assets/model_diagram/step_5_output_default.png"' in page
    # a workdir copy (e.g. written by a refresh job) takes precedence
    d = tmp / "assets" / "model_diagram"
    d.mkdir(parents=True, exist_ok=True)
    (d / "step_5_output_default.png").write_bytes(b"\x89PNG\r\n\x1a\nxx")
    status, body = _get(port, "/assets/model_diagram/step_5_output_default.png")
    assert status == 200 and body.endswith(b"xx")


@pytest.mark.slow
def test_background_train_job(server):
    """Full job lifecycle through the web surface (tiny run)."""
    srv, port, tmp = server
    # shrink the job via the server's extra CLI args
    srv.jobs  # exists
    from image_generation_tpu.app import server as srvmod

    status, resp = _post(port, "/api/train", {
        "name": "webrun", "qpu": "Advantage2_prototype", "latents": 32, "epochs": 1,
    })
    assert resp["started"]
    # double-start rejected while running
    status2, resp2 = _post(port, "/api/train", {"name": "x"})
    assert status2 == 409

    deadline = time.time() + 300
    state = None
    while time.time() < deadline:
        _, body = _get(port, "/api/state")
        state = json.loads(body)
        if state["job"]["state"] in ("done", "failed"):
            break
        time.sleep(2)
    assert state["job"]["state"] == "done", state
    # artifacts visible through the API
    _, body = _get(port, "/api/models")
    names = [m["name"] for m in json.loads(body)]
    assert "webrun" in names
    assert state["latest_epoch"] == 0
    status, _ = _get(port, "/assets/model_diagram/step_1_input.png")
    assert status == 200
    # batch-granular progress was written during the run (progress-chunks)
    _, body = _get(port, "/api/state")
    prog = json.loads(body)["progress"]
    assert prog["total"] == 1 and "n_batches" in prog
    # problem details carry the reference's per-epoch headers
    _, body = _get(port, "/api/problem_details")
    details = json.loads(body)
    assert details["Epoch"] == "1/1" and "Learning rate DVAE" in details

    # --- zero-JS fallback view: the complete train→rendered-figures loop
    # is drivable with no script execution (/plain is pure server-side
    # HTML behind a meta refresh) ---
    import re as _re

    status, body = _get(port, "/plain")
    assert status == 200
    plain = body.decode()
    assert "job: done" in plain and "Epoch 0" in plain
    assert "Epochs Completed: 1/1" in plain
    assert 'class="problem-details-table"' in plain  # details table inline
    assert 'class="model-details"' in plain  # model data card inline
    srcs = _re.findall(r'src="([^"]+)"', plain)
    assert len(srcs) == 4  # generated, reconstructed, 2 loss curves
    for src in srcs:
        s, b = _get(port, src)
        assert s == 200 and len(b) > 100, f"{src} did not render"

    # --- model-switch refresh job (check_qpu_and_update_model parity) ---
    step2 = tmp / "assets" / "model_diagram" / "step_2_encode.png"
    before = step2.stat().st_mtime
    status, resp = _post(port, "/api/refresh_model", {"model": "webrun"})
    assert resp["started"]
    deadline = time.time() + 180
    while time.time() < deadline:
        _, body = _get(port, "/api/state")
        state = json.loads(body)
        if state["job"]["state"] in ("done", "failed"):
            break
        time.sleep(2)
    assert state["job"]["state"] == "done", state
    assert state["job"]["kind"] == "refresh"
    assert step2.stat().st_mtime > before  # diagram regenerated without a train job
    # rendered topology + latent strip now serve for the refreshed model
    status, body = _get(port, "/api/render/topology/webrun/encoded.svg")
    assert status == 200 and body.count(b"<circle") >= 32
    status, body = _get(port, "/api/render/latent_strip.svg")
    assert status == 200 and body.count(b"<rect") == 6
