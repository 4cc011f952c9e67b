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
"""

from __future__ import annotations

import threading
from pathlib import Path
from typing import Optional


class WarmGenerator:
    def __init__(self, workdir, config_overrides: Optional[dict] = None,
                 mesh="auto", params=None):
        """``config_overrides``: TrainingConfig field overrides for the
        serving trainer (tests pass tiny DATASET_SIZE/BATCH_SIZE; the
        model's own parameters.json still decides N_LATENTS/QPU at load).
        ``mesh``: Trainer mesh control — "auto" matches the CLI default.
        ``params``: optional training-parameters YAML path (the CLI's
        ``--params``), applied under the overrides like _build_trainer."""
        self.workdir = Path(workdir)
        self.config_overrides = dict(config_overrides or {})
        self.mesh = mesh
        self.params = params
        self.lock = threading.Lock()
        self._trainer = None
        self._key = None  # (resolved model dir, dvae.pth mtime_ns)

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
