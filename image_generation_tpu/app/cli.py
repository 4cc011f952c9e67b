"""Command-line application surface: train / generate / tune.

The reference's application entry points are Dash background callbacks
(``train`` demo_callbacks.py:600-663, ``generate`` 713-795 including the
"Tune Parameters" flow).  This CLI exposes the same operations headlessly,
writing the same artifacts (model dirs under ``models/``, per-epoch figure
JSONs under ``generated_json/``), so the UI layer stays a thin shell.

Usage:
  python -m image_generation_tpu.app.cli train --name my_model --epochs 10
  python -m image_generation_tpu.app.cli generate --model models/my_model
  python -m image_generation_tpu.app.cli tune --model models/my_model --epochs 5
  python -m image_generation_tpu.app.cli refresh --model models/my_model
  python -m image_generation_tpu.app.cli tune-pt --model models/my_model
  python -m image_generation_tpu.app.cli models      # list saved models

``tune-pt`` feedback-optimizes the parallel-tempering ladder for a model's
GRBM (ops/pt_tune.py) and writes ``<model>/pt_betas.json``; every command
accepts ``--pt-betas <json|comma list>`` (implies ``--sampler pt``) to
sample with the tuned ladder.

Multi-chip: ``--mesh auto`` (default) shards training over all local devices
(``--mesh off`` forces one device; ``--mesh N`` uses N; ``--mesh RxG``,
e.g. ``1x8``, fixes the data × chain layout — graph-sharded beyond-HBM runs
size the chain axis to fit the coupling).  ``refresh``
regenerates the model-diagram assets for a checkpoint without training (the
reference's on-model-switch behavior, demo_callbacks.py:207-294).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path


def _config_overrides(args):
    """Map parsed CLI args to TrainingConfig field overrides (shared by
    ``_build_trainer`` and the server's warm in-process serving path, which
    must honor the same ``extra_cli`` flags the subprocess jobs receive)."""
    overrides = {}
    if args.latents is not None:
        overrides["N_LATENTS"] = args.latents
    if args.dataset_size is not None:
        overrides["DATASET_SIZE"] = args.dataset_size
    if args.batch_size is not None:
        overrides["BATCH_SIZE"] = args.batch_size
    if getattr(args, "sweeps", None) is not None:
        overrides["GIBBS_SWEEPS"] = args.sweeps
    if getattr(args, "graph_sharded", None) is not None:
        overrides["GRAPH_SHARDED"] = args.graph_sharded
    if getattr(args, "adam_moment_dtype", None) is not None:
        overrides["ADAM_MOMENT_DTYPE"] = args.adam_moment_dtype
    if getattr(args, "adam_factored_nu", None) is not None:
        overrides["ADAM_FACTORED_NU"] = args.adam_factored_nu
    if getattr(args, "sampler_matmul_dtype", None) is not None:
        overrides["SAMPLER_MATMUL_DTYPE"] = args.sampler_matmul_dtype
    if getattr(args, "sweep_block_sparse", None) is not None:
        overrides["SWEEP_BLOCK_SPARSE"] = args.sweep_block_sparse
    if getattr(args, "plrng_row_seed", None) is not None:
        overrides["PLRNG_ROW_SEED"] = args.plrng_row_seed
    if getattr(args, "sweep_bs_chunk", None) is not None:
        overrides["SWEEP_BS_CHUNK"] = args.sweep_bs_chunk
    if getattr(args, "sampler", None) is not None:
        overrides["SAMPLER"] = args.sampler
    if getattr(args, "pt_num_betas", None) is not None:
        v = args.pt_num_betas
        overrides["PT_NUM_BETAS"] = v if v == "auto" else int(v)
        overrides.setdefault("SAMPLER", "pt")  # a rung count implies PT
    if getattr(args, "pt_betas", None):
        overrides["PT_BETAS"] = _parse_pt_betas(args.pt_betas)
        overrides.setdefault("SAMPLER", "pt")  # a ladder implies PT
    if getattr(args, "pt_adapt", None) is not None:
        overrides["PT_ADAPT"] = args.pt_adapt
        if args.pt_adapt == "epoch":  # only ENABLING adaptation implies PT
            overrides.setdefault("SAMPLER", "pt")
    return overrides


def _build_trainer(args, for_load: bool = False, serving_model_dir=None):
    from image_generation_tpu.config import TrainingConfig
    from image_generation_tpu.training.trainer import Trainer

    overrides = _config_overrides(args)
    cfg = (
        TrainingConfig.from_yaml(args.params, **overrides)
        if args.params
        else TrainingConfig(**overrides)
    )
    if not for_load:
        cfg = cfg.replace(QPU=args.qpu)
    if serving_model_dir is not None:
        # generation/serving surface (cmd_generate): at-scale checkpoints
        # default to the int8 quantized sampler (config.for_serving_dir —
        # quality-neutral per runs/serving_quality_ab.json, +71% request
        # rate); training/tune/refresh surfaces keep training semantics
        cfg = cfg.for_serving_dir(serving_model_dir)
    return Trainer(
        qpu=cfg.QPU, config=cfg, mesh=parse_mesh(getattr(args, "mesh", "auto"))
    )


def _parse_pt_betas(spec):
    """``--pt-betas`` value → ladder list: either a comma-separated ladder
    ('0.25,0.5,1.0') or a path to a ``pt_betas.json`` written by the
    ``tune-pt`` command."""
    p = Path(spec)
    if p.suffix == ".json" and p.exists():
        try:
            return [float(x) for x in json.loads(p.read_text())["betas"]]
        except (OSError, json.JSONDecodeError, KeyError, TypeError, ValueError):
            raise SystemExit(
                f"--pt-betas file {spec!r} is not a tune-pt output "
                f'(expected JSON with a numeric "betas" list)'
            )
    try:
        return [float(x) for x in str(spec).split(",")]
    except ValueError:
        raise SystemExit(
            f"--pt-betas must be a comma-separated ascending ladder ending "
            f"at 1.0, or a pt_betas.json path; got {spec!r}"
        )


def parse_mesh(spec):
    """``--mesh`` value → Mesh | None | "auto" (Trainer's auto_mesh sentinel).

    'off' → None (single device); a count ('8') → default-shaped mesh;
    ROWSxGRAPH ('1x8') → explicit (data × chain) layout — beyond-HBM
    graph-sharded runs size the chain axis to fit the coupling
    (GRAPH_SHARDED, ops/gibbs_graph_sharded.py)."""
    if spec == "off":
        return None
    if spec in (None, "auto"):
        return spec
    from image_generation_tpu.parallel.mesh import create_mesh

    try:
        s = str(spec).lower()
        if "x" in s:
            rows, cols = (int(p) for p in s.split("x"))
            if rows < 1 or cols < 1:
                raise ValueError("axis sizes must be >= 1")
            return create_mesh(rows * cols, shape=(rows, cols))
        n = int(s)
        if n < 1:
            raise ValueError("device count must be >= 1")
        return create_mesh(n)
    except ValueError as e:
        raise SystemExit(
            f"--mesh must be 'auto', 'off', a device count, or RxG "
            f"(e.g. 1x8); got {spec!r} ({e})"
        )


def _write_details(trainer, files, epoch=None, n_epochs=None, mse=None,
                   stats=None):
    """problem_details.json with the reference's display headers
    (src/utils/callback_helpers.py:193-204): QPU / Epoch / Batch Size /
    Latents / both learning rates / the current MSE, plus this framework's
    sampler columns (incl. live PT ladder health when SAMPLER="pt")."""
    extra = {"Batch Size": trainer.config.BATCH_SIZE}
    if epoch is not None and n_epochs is not None:
        extra["Epoch"] = f"{epoch + 1}/{n_epochs}"
    if trainer.state is not None and trainer.fns is not None:
        lr_d, lr_g = trainer.current_lrs()
        extra["Learning rate DVAE"] = f"{lr_d:.3E}"
        extra["Learning rate GRBM"] = f"{lr_g:.3E}"
    if mse is not None:
        extra["Mean Squared Error Loss"] = f"{mse:.4f}"
    if stats and "pt_accept_min" in stats:
        # ladder health from the step's free swap-acceptance metric
        # (StepMetrics.pt_accept); the re-spaced ladder when PT_ADAPT moved it
        extra["PT swap acceptance (min/mean)"] = (
            f"{stats['pt_accept_min']:.3f} / {stats['pt_accept_mean']:.3f}"
        )
        if "pt_betas" in stats:
            b = stats["pt_betas"]
            extra["PT ladder (adapted)"] = (
                f"[{b[0]:.3g} … {b[-1]:.3g}] × {len(b)}"
            )
        if "pt_recommended_num_betas" in stats:
            # equal-barrier sizing from the same free metric — flags an
            # over/under-provisioned ladder (PT_NUM_BETAS="auto" applies
            # it at build time; ops/pt_tune.recommend_num_betas)
            extra["PT rungs (used/recommended)"] = (
                f"{trainer.config.PT_NUM_BETAS} / "
                f"{stats['pt_recommended_num_betas']}"
            )
    files.write_problem_details(
        qpu=trainer.qpu,
        n_latents=trainer.n_latents,
        n_edges=trainer.graph.n_edges if trainer.graph else 0,
        num_reads=trainer.config.NUM_READS,
        sampler=trainer.config.SAMPLER,
        extra=extra,
    )


def _attach_files(trainer, args):
    from image_generation_tpu.app.files import RunFiles

    files = RunFiles(args.workdir)
    files.clean()
    _write_details(trainer, files)
    return files


def _write_diagram_assets(trainer, files, gen):
    """Latent vector + model-diagram assets.  Callers must write these
    BEFORE the poll triggers (epoch figure JSONs / progress): the web page
    redraws the diagram/latent/topology images exactly once per progress
    move, so a premature trigger latches stale images until the next epoch
    — permanently on the final one."""
    files.write_latent_qpu(gen["latents"][0])
    from image_generation_tpu.app import ui_config
    from image_generation_tpu.app.diagram import generate_model_diagram

    if ui_config.GENERATE_NEW_MODEL_DIAGRAM:
        example = trainer.images[ui_config.EXAMPLE_IMAGE_INDEX]
        generate_model_diagram(trainer, example, files.root / "assets" / "model_diagram")


def _epoch_artifacts(trainer, files, epoch, stats, n_epochs):
    gen = trainer.generate_output()
    rec = trainer.generate_reconstructed_samples()
    _write_diagram_assets(trainer, files, gen)  # assets first, triggers last
    files.write_epoch(
        epoch,
        gen["grid"],
        rec["grid"],
        trainer.losses["mse_losses"],
        trainer.losses["dvae_losses"],
    )
    files.write_progress(epoch + 1, n_epochs, trainer.n_batches, trainer.n_batches)
    print(
        f"epoch {epoch + 1}/{n_epochs}: mse={stats['mse']:.4f} "
        f"total={stats['dvae_loss']:.4f} ({stats['epoch_time_s']:.1f}s)",
        flush=True,
    )


def cmd_train(args):
    from image_generation_tpu.training.observability import MetricsLog

    trainer = _build_trainer(args)
    trainer.train_init(args.epochs)
    files = _attach_files(trainer, args)
    metrics = MetricsLog(Path(args.workdir) / "generated_json" / "metrics.jsonl")
    print(
        f"training: qpu={trainer.qpu} latents={trainer.n_latents} "
        f"edges={trainer.graph.n_edges} data={trainer.data_source.origin} "
        f"batches/epoch={trainer.n_batches} "
        f"sampler={trainer.fns.sampler_impl}"
        + (f" mesh={tuple(trainer.mesh.devices.shape)}" if trainer.mesh else ""),
        flush=True,
    )
    every = max(args.artifact_every, 1)

    def _cb(e, s):
        _write_details(trainer, files, epoch=e, n_epochs=args.epochs,
                       mse=s["mse"], stats=s)
        if (e + 1) % every == 0 or e + 1 == args.epochs:
            _epoch_artifacts(trainer, files, e, s, args.epochs)
        else:
            files.write_progress(e + 1, args.epochs, trainer.n_batches, trainer.n_batches)
            print(
                f"epoch {e + 1}/{args.epochs}: mse={s['mse']:.4f} "
                f"total={s['dvae_loss']:.4f} ({s['epoch_time_s']:.1f}s)",
                flush=True,
            )

    trainer.train(
        args.epochs,
        epoch_cb=_cb,
        metrics_log=metrics,
        profile_dir=args.profile,
        batch_cb=lambda e, done, nb: files.write_progress(e, args.epochs, done, nb),
        epoch_chunks=args.progress_chunks,
    )
    out = Path(args.workdir) / "models" / args.name
    trainer.save(out, n_epochs=args.epochs)
    print(f"saved: {out}")


def _model_path(args) -> Path:
    """Resolve ``--model``: a path as given, or a bare model NAME looked up
    under ``workdir/models/`` — so ``--workdir W generate --model m`` finds
    what ``--workdir W train --name m`` saved (and matches the server's
    POST body, which sends bare names)."""
    p = Path(args.model)
    if not p.exists():
        candidate = Path(args.workdir) / "models" / args.model
        if candidate.exists():
            return candidate
    return p


def cmd_generate(args):
    model_dir = _model_path(args)
    trainer = _build_trainer(args, for_load=True, serving_model_dir=model_dir)
    trainer.load(model_dir)
    gen = trainer.generate_output(do_sharpen=args.sharpen, num_reads=args.num_reads)
    files = _attach_files(trainer, args)
    rec = trainer.generate_reconstructed_samples(do_sharpen=args.sharpen)
    # the diagram refresh is the reference's on-model-switch behavior
    # (demo_callbacks.py:186-294); assets before the epoch-figure trigger
    _write_diagram_assets(trainer, files, gen)
    files.write_epoch(0, gen["grid"], rec["grid"],
                      trainer.losses["mse_losses"], trainer.losses["dvae_losses"])
    print(f"generated {gen['images'].shape[0]} images → "
          f"{files.dir / 'generated_epoch_0.json'}")


def cmd_refresh(args):
    """Regenerate the model-diagram assets for a saved checkpoint without a
    training/generation job — the reference does this whenever the model
    dropdown or settings change (check_qpu_and_update_model,
    demo_callbacks.py:207-294, calling generate_model_diagram at :264)."""
    from image_generation_tpu.app import ui_config
    from image_generation_tpu.app.diagram import generate_model_diagram
    from image_generation_tpu.app.files import RunFiles

    trainer = _build_trainer(args, for_load=True)
    trainer.load(_model_path(args))
    files = RunFiles(args.workdir)  # no clean(): keep prior epoch figures
    example = trainer.images[ui_config.EXAMPLE_IMAGE_INDEX]
    out = generate_model_diagram(
        trainer, example, Path(args.workdir) / "assets" / "model_diagram"
    )
    _write_details(trainer, files)
    print(f"refreshed model diagram for {args.model}: {sorted(out)}")


def cmd_tune(args):
    trainer = _build_trainer(args, for_load=True)
    model_dir = _model_path(args)
    trainer.load(model_dir)
    # deep copy: train_init() clears these very list objects in place
    old_losses = {k: list(v) for k, v in trainer.losses.items()}
    old_params = json.loads((model_dir / "parameters.json").read_text())
    trainer.train_init(args.epochs)
    files = _attach_files(trainer, args)
    trainer.train(
        args.epochs,
        epoch_cb=lambda e, s: _epoch_artifacts(trainer, files, e, s, args.epochs),
        batch_cb=lambda e, done, nb: files.write_progress(e, args.epochs, done, nb),
        epoch_chunks=args.progress_chunks,
    )
    name = f"{Path(args.model).name}_tuned_{args.epochs}_epochs"
    out = Path(args.workdir) / "models" / name
    trainer.save(out, n_epochs=old_params.get("n_epochs", 0) + args.epochs,
                 old_losses=old_losses)
    print(f"saved: {out}")


def cmd_tune_pt(args):
    """Feedback-optimize the PT ladder for a saved model's GRBM
    (ops/pt_tune.py: equal-barrier re-spacing of the swap-rejection curve).
    Writes ``<model>/pt_betas.json``; pass it back via ``--pt-betas`` on
    train/tune/generate to sample with the tuned ladder."""
    import jax

    from image_generation_tpu.models.grbm import scaled_ising
    from image_generation_tpu.ops.gibbs import permuted_model
    from image_generation_tpu.ops.pt_tune import tune_pt_betas

    trainer = _build_trainer(args, for_load=True)
    if trainer.config.PT_NUM_BETAS == "auto":
        # tune-pt IS the offline sizing path — never load with an
        # unresolved 'auto' (beyond-HBM models refuse the init-time probe,
        # and that error points here): start from the same 16-rung
        # geometric probe ladder size_ladder uses; the equal-barrier
        # re-spacing below and the recommended_num_betas it records do the
        # sizing
        trainer.config = trainer.config.replace(PT_NUM_BETAS=16)
    model_dir = _model_path(args)
    trainer.load(model_dir)
    cfg = trainer.config
    mm = cfg.resolved_sampler_matmul_dtype(trainer.plan.n_pad)
    layout_kw = {}
    if trainer.fns is not None and trainer.fns.graph_sharded:
        # beyond-HBM model: measure through the graph-sharded layout on the
        # trainer's mesh, using the CACHED sampler model (row-sharded —
        # packed/quantized per config — never materialized whole), i.e.
        # exactly the ensemble training sweeps
        from image_generation_tpu.ops.gibbs_graph_sharded import (
            gibbs_sweeps_graph_sharded,
            ising_energies_graph_sharded,
        )

        mesh = trainer.mesh
        hp = trainer.state.sampler_h
        cp = trainer.state.sampler_coupling

        def _sweeps_fn(k, h_, c_, p_, s_, n_, beta=1.0, track_delta_e=False):
            return gibbs_sweeps_graph_sharded(
                k, h_, c_, p_, s_, n_, mesh, beta, matmul_dtype=mm,
                track_delta_e=track_delta_e,
            )

        def _energies_fn(h_, c_, s_):
            return ising_energies_graph_sharded(h_, c_, s_, mesh, matmul_dtype=mm)

        layout_kw = dict(sweeps_fn=_sweeps_fn, energies_fn=_energies_fn)
    else:
        h, q = scaled_ising(
            trainer.state.grbm_params, cfg.PREFACTOR, cfg.H_RANGE, cfg.J_RANGE
        )
        hp, cp = permuted_model(trainer.plan, h, q)
        # tune the SAME model training samples (build_sampler_model's
        # policy, via the shared TrainingConfig helpers): int8 → the
        # QuantCoupling the quantized sampler draws from; bf16-at-scale
        # otherwise — which also keeps the measurer's closed-over coupling
        # under the relay's ~100 MB remote-compile constant limit
        if cfg.SAMPLER_MATMUL_DTYPE == "int8":
            from image_generation_tpu.ops.quant import quantize_coupling

            cp = quantize_coupling(cp)
        elif mm is not None:
            cp = cp.astype(mm)
        if cfg.resolved_block_sparse(trainer.plan):
            # measure the packed model training samples (same single-source
            # policy as make_train_fns); the packed panels are also ~4×
            # smaller than dense — further relief for the relay's ~100 MB
            # remote-compile constant limit the measurer's closure is
            # subject to
            from image_generation_tpu.ops.block_sparse import pack_coupling

            cp = pack_coupling(trainer.plan, cp, cfg.SWEEP_BS_CHUNK)
    betas0 = cfg.initial_pt_betas()
    tuned, diag0, diag1 = tune_pt_betas(
        jax.random.PRNGKey(args.seed), hp, cp, trainer.plan, betas0,
        n_iters=args.iters, n_chains=args.chains, matmul_dtype=mm,
        verbose=True, **layout_kw,
    )
    tuned[-1] = 1.0  # PT_BETAS contract: ladder ends exactly at the target
    out_path = model_dir / "pt_betas.json"
    from image_generation_tpu.ops.pt_tune import recommend_num_betas

    out_path.write_text(json.dumps({
        "betas": [float(b) for b in tuned],
        "accept_before": [round(float(a), 4) for a in diag0.accept],
        "accept_after": [round(float(a), 4) for a in diag1.accept],
        "barrier_before": round(diag0.barrier, 4),
        "barrier_after": round(diag1.barrier, 4),
        # equal-barrier rung-count sizing from the tuned (equalized) curve
        # (ops/pt_tune.recommend_num_betas — PT_NUM_BETAS="auto" backend)
        "recommended_num_betas": recommend_num_betas(diag1.accept),
    }, indent=1))
    ladder = ",".join(f"{b:.5g}" for b in tuned)
    print(f"saved: {out_path}")
    print(f"use with: --pt-betas {out_path}  (or --pt-betas {ladder})")


def cmd_models(args):
    from image_generation_tpu.app.files import list_models

    metas = list_models(args.workdir)
    if not metas:
        print("(no saved models)")
        return
    for meta in metas:
        print(f"{meta['name']}: qpu={meta.get('qpu')} "
              f"latents={meta.get('n_latents')} epochs={meta.get('n_epochs')}")


def build_parser():
    ap = argparse.ArgumentParser(prog="image_generation_tpu")
    ap.add_argument("--workdir", default=".", help="artifact root (models/, generated_json/)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--qpu", default="Advantage2_system1")
    common.add_argument("--latents", type=int, default=None)
    common.add_argument("--dataset-size", type=int, default=None)
    common.add_argument("--batch-size", type=int, default=None)
    common.add_argument("--sweeps", type=int, default=None, help="Gibbs sweeps per refresh")
    common.add_argument("--params", default=None, help="training parameters YAML")
    common.add_argument("--profile", default=None, help="jax.profiler trace directory")
    common.add_argument(
        "--platform",
        default=None,
        help="force a JAX platform (e.g. cpu); env JAX_PLATFORMS alone does "
        "not work where a sitecustomize overrides it via jax.config",
    )
    common.add_argument(
        "--mesh", default="auto",
        help="multi-chip mesh: 'auto' (all local devices, the default), "
        "'off' (single device), a device count (e.g. 8), or an explicit "
        "data-by-chain layout like '1x8' (graph-sharded runs size the "
        "chain axis to fit the coupling)",
    )
    common.add_argument(
        "--graph-sharded", default=None, choices=["auto", "on", "off"],
        help="partition the GRBM coupling matrix over the mesh 'chain' axis "
        "(beyond-single-chip-HBM graphs; pairs with --mesh RxG layouts)",
    )
    common.add_argument(
        "--adam-moment-dtype", default=None, choices=["float32", "bfloat16"],
        help="storage dtype of the DVAE Adam moments (bfloat16 halves "
        "optimizer-state HBM traffic — the scaled config's measured update "
        "floor; arithmetic stays f32; default float32)",
    )
    common.add_argument(
        "--adam-factored-nu", default=None, choices=["on", "off"],
        help="store the second moment of outsized 2-D DVAE params (the "
        "scaled config's 127M dense) factored as row/col g² means "
        "(Adafactor rank-1 estimator) — removes that layer's nu HBM "
        "traffic/footprint entirely; composes with --adam-moment-dtype",
    )
    common.add_argument(
        "--sampler-matmul-dtype", default=None,
        choices=["auto", "float32", "bfloat16", "int8"],
        help="Gibbs sweep matmul dtype (default auto = bf16 on large "
        "graphs); int8 samples the int8-quantized model on the 2x-rate "
        "int8 MXU and halves the streaming kernel's coupling traffic "
        "(ops/quant.py — quantization is tighter than the physical "
        "annealer's analog control error)",
    )
    common.add_argument(
        "--sweep-block-sparse", default=None, choices=["auto", "on", "off"],
        help="pack the sampler coupling into its occupied chunk panels and "
        "sweep only those (default auto = on for large sparse graphs; "
        "~3-4x fewer sweep FLOPs/bytes on hardware topologies — "
        "ops/block_sparse.py; composes with --graph-sharded: each row "
        "shard packs its own chunks, ops/block_sparse_sharded.py)",
    )
    common.add_argument(
        "--plrng-row-seed", default=None, choices=["on", "off"],
        help="seed the graph-sharded hardware-PRNG update kernel per 8-row "
        "global-row group (default off) — makes the sampled chain "
        "bit-identical across mesh factorizations at the cost of the "
        "per-group reseed loop (ops/gibbs_graph_sharded_pallas.py)",
    )
    common.add_argument(
        "--sweep-bs-chunk", default=None, type=int,
        help="block-sparse chunk height in rows (default 256; 128 packs "
        "tighter; must fit one graph-axis row shard when composed with "
        "--graph-sharded)",
    )
    common.add_argument(
        "--sampler", default=None, choices=["gibbs", "pt", "exact"],
        help="negative-phase sampler (default from YAML/config: gibbs; "
        "'pt' runs a parallel-tempering ladder — see tune-pt)",
    )
    common.add_argument(
        "--pt-num-betas", default=None,
        help="PT ladder size: an int, or 'auto' to size it at build time "
        "from a short swap-acceptance probe of the current model "
        "(ops/pt_tune.size_ladder; implies --sampler pt; an explicit "
        "--pt-betas ladder wins)",
    )
    common.add_argument(
        "--pt-betas", default=None,
        help="explicit PT ladder: comma-separated ascending betas ending "
        "at 1.0, or a pt_betas.json written by tune-pt (implies "
        "--sampler pt)",
    )
    common.add_argument(
        "--pt-adapt", default=None, choices=["off", "epoch"],
        help="adaptive tempering: re-space the live PT ladder after every "
        "epoch from the step's free swap-acceptance metric (implies "
        "--sampler pt; zero recompilation, zero extra sampling)",
    )
    common.add_argument(
        "--serve-max-batch", type=int, default=16,
        help="warm serving: max concurrent requests folded into one fused "
        "sample→decode dispatch (app/warm.py coalescer; powers of two "
        "bound the compile count)",
    )
    common.add_argument(
        "--serve-window-ms", type=float, default=5.0,
        help="warm serving: batching window the coalescer leader waits "
        "before each drain so a concurrent burst lands in one dispatch "
        "(costs a lone caller this much extra latency; 0 disables)",
    )
    common.add_argument(
        "--progress-chunks", type=int, default=4,
        help="scan chunks per epoch for batch-granular progress (1 = one "
        "dispatch per epoch, max throughput; N adds N-1 extra dispatches)",
    )

    p = sub.add_parser("train", parents=[common])
    p.add_argument("--name", required=True)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument(
        "--artifact-every", type=int, default=1,
        help="write figures/diagram every N epochs (artifacts dominate epoch "
        "wall time on fast chips; the last epoch always writes)",
    )
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("generate", parents=[common])
    p.add_argument("--model", required=True)
    p.add_argument("--sharpen", action="store_true")
    p.add_argument("--num-reads", type=int, default=None)
    p.set_defaults(fn=cmd_generate)

    p = sub.add_parser("tune", parents=[common])
    p.add_argument("--model", required=True)
    p.add_argument("--epochs", type=int, default=5)
    p.set_defaults(fn=cmd_tune)

    p = sub.add_parser("refresh", parents=[common])
    p.add_argument("--model", required=True)
    p.set_defaults(fn=cmd_refresh)

    p = sub.add_parser("tune-pt", parents=[common])
    p.add_argument("--model", required=True)
    p.add_argument("--iters", type=int, default=3,
                   help="equal-barrier feedback iterations")
    p.add_argument("--chains", type=int, default=256,
                   help="measurement chains per ladder rung")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_tune_pt)

    p = sub.add_parser("models")
    p.set_defaults(fn=cmd_models)
    return ap


def validate_extra_cli(extra_cli):
    """Fail fast on a mistyped pass-through flag: ``app.py`` forwards its
    unknown flags verbatim to every job subprocess and to the warm serving
    trainer (parse_serving_args), so without this check a startup typo
    (``--warm-genrate``) only surfaces as a late, confusing job failure.
    Every ``--flag`` must be an option of SOME CLI subcommand."""
    ap = build_parser()
    known = set()
    for act in ap._actions:
        known.update(act.option_strings)
        if isinstance(act, argparse._SubParsersAction):
            for sub in act.choices.values():
                for a in sub._actions:
                    known.update(a.option_strings)
    bad = sorted({
        t.split("=", 1)[0]
        for t in extra_cli
        if t.startswith("--") and t.split("=", 1)[0] not in known
    })
    if bad:
        raise SystemExit(
            f"unknown flag(s) {' '.join(bad)}: not an app.py flag and not "
            "recognized by any image_generation_tpu CLI command (the "
            "pass-through surface)"
        )


def parse_serving_args(extra_cli):
    """Parse the server's per-job ``extra_cli`` flag list as a ``generate``
    invocation (unknown train-only flags tolerated) so the warm in-process
    serving path (app/warm.py) builds its trainer from the SAME config the
    subprocess jobs get — e.g. ``--sampler-matmul-dtype int8`` must apply
    to /api/generate whether it is served warm or as a CLI process."""
    args, _unknown = build_parser().parse_known_args(
        ["generate", "--model", "_"] + list(extra_cli)
    )
    return args


def main(argv=None):
    ap = build_parser()
    args = ap.parse_args(argv)
    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)
    t0 = time.perf_counter()
    args.fn(args)
    print(f"done in {time.perf_counter() - t0:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
