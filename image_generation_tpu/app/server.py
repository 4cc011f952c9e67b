"""Web application: the reference's Dash demo, rebuilt on the stdlib.

The reference serves an interactive Dash app (app.py + demo_interface.py +
demo_callbacks.py) whose training/generation run as background OS processes
communicating through files.  This framework keeps that architecture — a
browser UI, background jobs, file IPC — with zero web-framework
dependencies (dash/plotly are not assumed):

  * ``ThreadingHTTPServer`` serves one self-contained HTML page (inline CSS
    generated from the theme color, exactly like the reference's
    ``__generated_theme.css``, app.py:76-83; inline JS renders the
    plotly-schema heatmap/scatter JSONs onto <canvas>/<svg>);
  * train/generate/tune run as **separate OS processes** (subprocess → the
    CLI), mirroring the reference's ``background=True`` callbacks
    (demo_callbacks.py:576, 690); cancel terminates the job
    (demo_callbacks.py:593, 710);
  * the page polls ``/api/...`` every 500 ms, reading the same
    ``generated_json/`` files the reference UI polls
    (demo_callbacks.py:494-566).

Run:  python -m image_generation_tpu.app.server --port 8050
"""

from __future__ import annotations

import json
import subprocess
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import urlparse

from image_generation_tpu.app import ui_config
from image_generation_tpu.app.files import RunFiles
from image_generation_tpu.utils.topology import QPU_TOPOLOGIES

__all__ = ["make_server", "main"]


class JobManager:
    """One background job at a time (the reference's single background
    callback + cancel semantics)."""

    def __init__(self, workdir: Path):
        self.workdir = Path(workdir)
        self.proc: subprocess.Popen | None = None
        self.kind = None
        self.lock = threading.Lock()

    def running(self) -> bool:
        return self.proc is not None and self.proc.poll() is None

    def start(self, kind: str, cli_args: list) -> bool:
        with self.lock:
            if self.running():
                return False
            cmd = [sys.executable, "-m", "image_generation_tpu.app.cli",
                   "--workdir", str(self.workdir)] + cli_args
            # the job runs with the workdir as cwd; make the package
            # importable from there regardless of installation
            import os

            pkg_root = str(Path(__file__).resolve().parents[2])
            env = dict(os.environ)
            env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
            self.proc = subprocess.Popen(cmd, cwd=str(self.workdir), env=env)
            self.kind = kind
            return True

    def cancel(self) -> bool:
        with self.lock:
            if not self.running():
                return False
            self.proc.terminate()
            return True

    def status(self) -> dict:
        if self.proc is None:
            return {"state": "idle"}
        rc = self.proc.poll()
        if rc is None:
            return {"state": "running", "kind": self.kind}
        return {"state": "done" if rc == 0 else "failed", "kind": self.kind, "rc": rc}


def _theme_css() -> str:
    """The reference generates assets/__generated_theme.css from THEME_COLOR
    (app.py:76-83); same idea, inlined."""
    return f"""
:root {{ --theme: {ui_config.THEME_COLOR}; --theme2: {ui_config.THEME_COLOR_SECONDARY}; }}
body {{ font-family: system-ui, sans-serif; margin: 0; background: #f5f7fa; }}
header {{ background: var(--theme); color: #fff; padding: 14px 24px; }}
header h1 {{ margin: 0; font-size: 20px; }}
.wrap {{ display: flex; gap: 16px; padding: 16px; }}
.panel {{ background: #fff; border-radius: 8px; padding: 16px; box-shadow: 0 1px 3px rgba(0,0,0,.12); }}
.settings {{ width: 320px; flex-shrink: 0; }}
.results {{ flex: 1; min-width: 0; }}
label {{ display: block; margin: 10px 0 2px; font-size: 13px; color: #333; }}
input, select {{ width: 100%; box-sizing: border-box; padding: 6px; }}
button {{ background: var(--theme); color: #fff; border: 0; border-radius: 4px;
         padding: 10px 18px; margin-top: 14px; cursor: pointer; }}
button.secondary {{ background: var(--theme2); }}
button:disabled {{ background: #aaa; }}
.tabs {{ display: flex; gap: 4px; margin-bottom: 10px; }}
.tabs div {{ padding: 8px 14px; cursor: pointer; border-bottom: 3px solid transparent; }}
.tabs div.active {{ border-color: var(--theme2); font-weight: 600; }}
progress {{ width: 100%; height: 14px; }}
canvas {{ image-rendering: pixelated; width: 100%; background: #fff; border: 1px solid #eee; }}
svg {{ width: 100%; height: 260px; background: #fff; border: 1px solid #eee; }}
.status {{ font-size: 12px; color: #666; margin-top: 8px; }}
img.diagram {{ width: 120px; image-rendering: pixelated; border: 1px solid #ddd; margin: 2px; }}
"""


_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>{title}</title><style>{css}</style></head>
<body>
<header><h1>{header}</h1><div style="font-size:12px">{description}</div></header>
<div class="wrap">
  <div class="panel settings">
    <div class="tabs" id="settings-tabs">
      <div class="active" data-tab="train">Train</div>
      <div data-tab="generate">Generate</div>
    </div>
    <div id="tab-train">
      <label title="Directory name the trained model is saved under (models/&lt;name&gt;)">Model name</label><input id="name" value="tpu_model">
      <label title="Coupling-graph family for the GRBM latent prior; the reference samples this hardware, here an on-device Gibbs sampler runs the same graph">QPU topology</label><select id="qpu">{qpu_options}</select>
      <label title="Number of ±1 spin latent variables = nodes of the GRBM subgraph">Latents: <span id="latents-val">{lat_val}</span></label>
      <input type="range" id="latents" min="{lat_min}" max="{lat_max}" step="{lat_step}" value="{lat_val}"
             oninput="document.getElementById('latents-val').innerText=this.value">
      <label title="Passes over the training set (468 batches of 128 each at full size)">Epochs: <span id="epochs-val">{ep_val}</span></label>
      <input type="range" id="epochs" min="{ep_min}" max="{ep_max}" value="{ep_val}"
             oninput="document.getElementById('epochs-val').innerText=this.value">
      <button id="train-btn" onclick="startTrain()">Train</button>
    </div>
    <div id="tab-generate" style="display:none">
      <label>Model</label><select id="model"></select>
      <label title="Binarize bright/dark pixels above 0.6 / below 0.4, keep mid-range">
        <input type="checkbox" id="sharpen" style="width:auto"> Sharpen output</label>
      <label>Tune epochs</label><input type="number" id="tune-epochs" value="5" min="1">
      <button id="gen-btn" onclick="startGenerate()">Generate</button>
      <button class="secondary" onclick="startTune()">Tune Parameters</button>
    </div>
    <button class="secondary" id="cancel-btn" onclick="cancelJob()" disabled>Cancel</button>
    <progress id="prog" value="0" max="1"></progress>
    <div class="status" id="status">idle</div>
  </div>
  <div class="panel results">
    <div class="tabs" id="result-tabs">
      <div class="active" data-tab="generated">Generated Images</div>
      <div data-tab="reconstructed">Reconstructions</div>
      <div data-tab="loss">Loss Graphs</div>
      <div data-tab="diagram">Model Diagram</div>
    </div>
    <div id="res-generated"><canvas id="cv-generated" width="10" height="10"></canvas></div>
    <div id="res-reconstructed" style="display:none"><canvas id="cv-reconstructed" width="10" height="10"></canvas></div>
    <div id="res-loss" style="display:none">
      <svg id="svg-mse"></svg><svg id="svg-total"></svg>
    </div>
    <div class="status" id="problem-details"></div>
    <div id="res-diagram" style="display:none">
      <div>
        <img class="diagram" id="d1" alt="input"> →
        <img class="diagram" id="d2" alt="encode"> →
        <img class="diagram" id="d4" alt="decode"> →
        <img class="diagram" id="d5" alt="output">
      </div>
      <div style="display:flex;gap:8px;margin-top:8px">
        <div style="flex:1"><div style="font-size:12px">Encoded latent on QPU graph</div>
          <svg id="topo-encoded" style="height:340px"></svg></div>
        <div style="flex:1"><div style="font-size:12px">Sampled latent on QPU graph</div>
          <svg id="topo-qpu" style="height:340px"></svg></div>
      </div>
    </div>
  </div>
</div>
<script>
let lastEpoch = -1;
function $(id) {{ return document.getElementById(id); }}
function tabs(groupId, prefix) {{
  const g = $(groupId);
  g.querySelectorAll('div').forEach(t => t.onclick = () => {{
    g.querySelectorAll('div').forEach(x => x.classList.remove('active'));
    t.classList.add('active');
    g === $('settings-tabs')
      ? ['train','generate'].forEach(n => $('tab-'+n).style.display = (n===t.dataset.tab)?'':'none')
      : ['generated','reconstructed','loss','diagram'].forEach(n => $('res-'+n).style.display = (n===t.dataset.tab)?'':'none');
  }});
}}
tabs('settings-tabs'); tabs('result-tabs');
function drawHeatmap(canvasId, fig) {{
  const tr = fig.data[0]; const z = tr.z; const h = z.length, w = z[0].length;
  const cv = $(canvasId); cv.width = w; cv.height = h;
  const ctx = cv.getContext('2d'); const img = ctx.createImageData(w, h);
  for (let y = 0; y < h; y++) for (let x = 0; x < w; x++) {{
    const v = Math.max(0, Math.min(1, z[h-1-y][x]));   // heatmap y-up
    const c = Math.round(255 * (tr.reversescale ? v : 1 - v));
    const k = 4 * (y * w + x);
    img.data[k] = img.data[k+1] = img.data[k+2] = c; img.data[k+3] = 255;
  }}
  ctx.putImageData(img, 0, 0);
}}
function drawTopology(svgId, fig) {{
  const svg = $(svgId); const W = svg.clientWidth || 500, H = svg.clientHeight || 340;
  const edges = fig.data[0], nodes = fig.data[1];
  const sx = x => 8 + x * (W - 16), sy = y => H - 8 - y * (H - 16);
  let out = '';
  for (let i = 0; i < edges.x.length; i += 3) {{
    out += `<line x1="${{sx(edges.x[i])}}" y1="${{sy(edges.y[i])}}" ` +
           `x2="${{sx(edges.x[i+1])}}" y2="${{sy(edges.y[i+1])}}" stroke="#ccc" stroke-width="0.5"/>`;
  }}
  const colors = nodes.marker.color;
  for (let i = 0; i < nodes.x.length; i++) {{
    out += `<circle cx="${{sx(nodes.x[i])}}" cy="${{sy(nodes.y[i])}}" r="3" ` +
           `fill="${{Array.isArray(colors) ? colors[i] : colors}}"/>`;
  }}
  svg.innerHTML = out;
}}
function drawLine(svgId, fig, color) {{
  const ys = fig.data[0].y; if (!ys.length) return;
  const svg = $(svgId); const W = svg.clientWidth || 600, H = svg.clientHeight || 260;
  const ymax = Math.max(...ys), ymin = Math.min(...ys);
  const pts = ys.map((v, i) =>
    `${{(i/(ys.length-1||1))*(W-20)+10}},${{H-10-((v-ymin)/((ymax-ymin)||1))*(H-20)}}`).join(' ');
  svg.innerHTML = `<polyline fill="none" stroke="${{color}}" stroke-width="1.5" points="${{pts}}"/>` +
    `<text x="12" y="16" font-size="11">max ${{ymax.toFixed(4)}} min ${{ymin.toFixed(4)}}</text>`;
}}
async function fetchJSON(url, opts) {{
  const r = await fetch(url, opts); if (!r.ok) return null;
  return await r.json();
}}
async function refreshModels() {{
  const models = await fetchJSON('/api/models');
  const sel = $('model'); const cur = sel.value; sel.innerHTML = '';
  (models || []).forEach(m => {{
    const o = document.createElement('option'); o.value = o.text = m.name; sel.add(o);
  }});
  if (cur) sel.value = cur;
}}
async function poll() {{
  const st = await fetchJSON('/api/state');
  if (!st) return;
  $('status').innerText = st.job.state + (st.job.kind ? ' ('+st.job.kind+')' : '');
  $('train-btn').disabled = $('gen-btn').disabled = st.job.state === 'running';
  $('cancel-btn').disabled = st.job.state !== 'running';
  if (st.progress) {{ $('prog').value = st.progress.step; $('prog').max = st.progress.total; }}
  const pd = await fetchJSON('/api/problem_details');
  if (pd && pd.qpu) $('problem-details').innerText =
    `QPU: ${{pd.qpu}} · latents: ${{pd.n_latents}} · couplers: ${{pd.n_edges}} · ` +
    `reads: ${{pd.num_reads}} · sampler: ${{pd.sampler}}`;
  const epoch = st.latest_epoch;
  if (epoch !== null && epoch !== undefined && epoch !== lastEpoch) {{
    lastEpoch = epoch;
    for (const kind of ['generated', 'reconstructed']) {{
      const fig = await fetchJSON(`/api/figure/${{kind}}/${{epoch}}`);
      if (fig) drawHeatmap('cv-' + kind, fig);
    }}
    const mse = await fetchJSON(`/api/figure/loss_mse/${{epoch}}`);
    if (mse) drawLine('svg-mse', mse, '{theme2}');
    const tot = await fetchJSON(`/api/figure/loss_total/${{epoch}}`);
    if (tot) drawLine('svg-total', tot, '{theme}');
    ['1','2','4','5'].forEach(k => {{
      const img = $('d' + k);
      if (img) img.src = `/assets/model_diagram/step_${{k}}_` +
        ({{'1':'input','2':'encode','4':'decode','5':'output'}})[k] + `.png?e=${{epoch}}`;
    }});
    refreshModels();
    const model = $('model').value || $('name').value;
    for (const kind of ['encoded', 'qpu']) {{
      const fig = await fetchJSON(`/api/topology/${{model}}/${{kind}}`);
      if (fig && fig.data) drawTopology('topo-' + kind, fig);
    }}
  }}
}}
function cfg() {{
  return {{ name: $('name').value, qpu: $('qpu').value,
           latents: +$('latents').value, epochs: +$('epochs').value }};
}}
async function startTrain() {{
  lastEpoch = -1;
  await fetchJSON('/api/train', {{method: 'POST', body: JSON.stringify(cfg())}});
}}
async function startGenerate() {{
  lastEpoch = -1;
  await fetchJSON('/api/generate', {{method: 'POST', body: JSON.stringify(
    {{model: $('model').value, sharpen: $('sharpen').checked}})}});
}}
async function startTune() {{
  lastEpoch = -1;
  await fetchJSON('/api/tune', {{method: 'POST', body: JSON.stringify(
    {{model: $('model').value, epochs: +$('tune-epochs').value}})}});
}}
async function cancelJob() {{ await fetchJSON('/api/cancel', {{method: 'POST'}}); }}
refreshModels();
setInterval(poll, 500);   // the reference's 500 ms epoch-checker interval
</script>
</body></html>
"""


def _render_page() -> str:
    qpu_options = "".join(
        f'<option value="{q}"{" selected" if q == ui_config.DEFAULT_QPU else ""}>{q}</option>'
        for q in QPU_TOPOLOGIES
    )
    s_lat, s_ep = ui_config.SLIDER_LATENTS, ui_config.SLIDER_EPOCHS
    return _PAGE.format(
        title=ui_config.APP_TITLE,
        header=ui_config.MAIN_HEADER,
        description=ui_config.DESCRIPTION,
        css=_theme_css(),
        qpu_options=qpu_options,
        lat_min=s_lat["min"], lat_max=s_lat["max"], lat_step=s_lat["step"],
        lat_val=s_lat["value"],
        ep_min=s_ep["min"], ep_max=s_ep["max"], ep_val=s_ep["value"],
        theme=ui_config.THEME_COLOR, theme2=ui_config.THEME_COLOR_SECONDARY,
    )


def make_server(workdir=".", port: int = 8050, extra_cli: list | None = None):
    workdir = Path(workdir).resolve()
    jobs = JobManager(workdir)
    files = RunFiles(workdir)
    page = _render_page().encode()
    extra = list(extra_cli or [])

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _bytes(self, body: bytes, ctype: str):
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        # ---------------- GET ----------------
        def do_GET(self):
            url = urlparse(self.path)
            parts = [p for p in url.path.split("/") if p]
            if url.path == "/":
                return self._bytes(page, "text/html; charset=utf-8")
            if url.path == "/api/state":
                progress = files.read_progress()
                latest = None
                for p in sorted(files.dir.glob("generated_epoch_*.json")):
                    try:
                        latest = max(latest or -1, int(p.stem.rsplit("_", 1)[1]))
                    except ValueError:
                        pass
                return self._json(
                    {"job": jobs.status(), "progress": progress, "latest_epoch": latest}
                )
            if url.path == "/api/models":
                out = []
                root = workdir / "models"
                if root.exists():
                    for d in sorted(root.iterdir()):
                        pj = d / "parameters.json"
                        if pj.exists():
                            meta = json.loads(pj.read_text())
                            out.append({"name": d.name, **meta})
                return self._json(out)
            if len(parts) == 4 and parts[:2] == ["api", "figure"]:
                fig = files.read_epoch_figure(parts[2], int(parts[3]))
                return self._json(fig if fig is not None else {}, 200 if fig else 404)
            if url.path == "/api/problem_details":
                p = files.dir / "problem_details.json"
                return self._json(json.loads(p.read_text()) if p.exists() else {})
            if len(parts) == 4 and parts[:2] == ["api", "topology"]:
                # /api/topology/<model>/<encoded|qpu>
                model = workdir / "models" / parts[2]
                if not (model / "grbm.pth").exists():
                    return self._json({"error": "unknown model"}, 404)
                values = None
                vf = workdir / "assets" / "model_diagram" / f"latent_{parts[3]}.json"
                if vf.exists():
                    try:
                        values = json.loads(vf.read_text())
                    except json.JSONDecodeError:
                        values = None
                from image_generation_tpu.app.figures import model_topology_figure

                return self._json(model_topology_figure(model, values))
            if parts and parts[0] == "assets":
                f = workdir.joinpath(*parts)
                if f.is_file() and f.resolve().is_relative_to(workdir):
                    ctype = "image/png" if f.suffix == ".png" else "application/json"
                    return self._bytes(f.read_bytes(), ctype)
            self._json({"error": "not found"}, 404)

        # ---------------- POST ----------------
        def do_POST(self):
            length = int(self.headers.get("Content-Length") or 0)
            try:
                body = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                return self._json({"error": "bad json"}, 400)
            if self.path == "/api/train":
                ok = jobs.start("train", [
                    "train", "--name", str(body.get("name", "tpu_model")),
                    "--qpu", str(body.get("qpu", ui_config.DEFAULT_QPU)),
                    "--latents", str(int(body.get("latents", 256))),
                    "--epochs", str(int(body.get("epochs", 10))),
                ] + extra)
                return self._json({"started": ok}, 200 if ok else 409)
            if self.path == "/api/generate":
                model = workdir / "models" / str(body.get("model", ""))
                if not (model / "dvae.pth").exists():
                    return self._json({"error": "unknown model"}, 404)
                args = ["generate", "--model", str(model)]
                if body.get("sharpen"):
                    args.append("--sharpen")
                ok = jobs.start("generate", args + extra)
                return self._json({"started": ok}, 200 if ok else 409)
            if self.path == "/api/tune":
                model = workdir / "models" / str(body.get("model", ""))
                if not (model / "dvae.pth").exists():
                    return self._json({"error": "unknown model"}, 404)
                ok = jobs.start("tune", [
                    "tune", "--model", str(model),
                    "--epochs", str(int(body.get("epochs", 5))),
                ] + extra)
                return self._json({"started": ok}, 200 if ok else 409)
            if self.path == "/api/cancel":
                return self._json({"cancelled": jobs.cancel()})
            self._json({"error": "not found"}, 404)

    server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    server.jobs = jobs  # for tests/embedding
    return server


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8050)
    ap.add_argument("--workdir", default=".")
    ap.add_argument("--debug", action="store_true")  # reference --debug flag
    args = ap.parse_args(argv)
    server = make_server(args.workdir, args.port)
    print(f"serving on http://localhost:{args.port} (workdir={args.workdir})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
