"""Trainer: the reference ``ModelWrapper`` equivalent, TPU-first inside.

Same surface as the reference container (src/model_wrapper.py:110-491):
construction from (qpu, n_latents) + parameter file, ``setup`` /
``train_init(n_epochs)`` / ``step(batch, epoch)`` / ``save`` / ``load`` /
``generate_output`` / ``generate_reconstructed_samples`` /
``generate_loss_plot`` and a per-batch ``losses`` dict — but the inside is a
fused jitted step (training/step.py) and a device-resident data pipeline, and
``train_epoch`` runs a whole epoch as one ``lax.scan`` dispatch.

The "Tune Parameters" flow (load a checkpoint, train more epochs, save under
a new name — reference demo_callbacks.py:760-778) is ``load`` + ``train_init``
+ training: like the reference, tuning keeps loaded weights and rebuilds
fresh optimizer state and schedules.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from image_generation_tpu.config import TrainingConfig
from image_generation_tpu.io.checkpoint import (
    load_model_dir,
    make_parameters_json,
    save_model_dir,
)
from image_generation_tpu.models.grbm import GRBMGraph
from image_generation_tpu.ops.gibbs import build_plan
from image_generation_tpu.training.step import TrainState, make_train_fns
from image_generation_tpu.utils.data import get_dataset, permuted_epoch
from image_generation_tpu.utils.grid import interleave, make_grid, sharpen

__all__ = ["Trainer", "TrainingError"]


class TrainingError(Exception):
    """Raised when stepping before initialization (reference parity,
    src/model_wrapper.py:106-107, 289-290)."""


class Trainer:
    def __init__(
        self,
        qpu: str = "Advantage2_system1",
        n_latents: Optional[int] = None,
        training_parameter_file: Optional[str] = None,
        config: Optional[TrainingConfig] = None,
        mesh="auto",
    ):
        """``mesh``: multi-chip training control — "auto" (default) creates
        a mesh over all local devices when more than one is visible (so a
        v5e-8 slice trains sharded out of the box — the capability the
        reference lacks, src/model_wrapper.py:179), None forces
        single-device, or pass an explicit ``jax.sharding.Mesh``."""
        if config is None:
            config = (
                TrainingConfig.from_yaml(training_parameter_file)
                if training_parameter_file
                else TrainingConfig()
            )
        if n_latents is not None:
            config = config.replace(N_LATENTS=n_latents)
        config = config.replace(QPU=qpu)
        self.config = config
        self.qpu = qpu
        self.n_latents = config.N_LATENTS
        if mesh == "auto":
            from image_generation_tpu.parallel.mesh import auto_mesh

            mesh = auto_mesh()
        elif mesh is not None and not {"data", "chain"} <= set(mesh.axis_names):
            # the sharding rules (parallel/mesh.py) address axes by name
            raise ValueError(
                f"Trainer meshes need axes named 'data' and 'chain'; got "
                f"{mesh.axis_names}. Build one with parallel.mesh.create_mesh."
            )
        self.mesh = mesh

        self.graph: Optional[GRBMGraph] = None
        self.plan = None
        self.fns = None
        self.state: Optional[TrainState] = None
        self.images = None
        self.data_source = None
        self.losses = {"mse_losses": [], "dvae_losses": []}
        self.physical_nodes = None  # physical qubit id per logical spin
        self._n_epochs = 0
        self._init_done = False
        self._key = jax.random.PRNGKey(config.RANDOM_SEED)

    # ------------------------------------------------------------------
    # setup / data
    # ------------------------------------------------------------------
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def setup(self) -> None:
        """Select the latent coupling graph for the configured QPU
        (offline equivalent of src/model_wrapper.py:177-217)."""
        cfg = self.config
        if cfg.LATENT_TO_DISCRETE == "heaviside" and cfg.N_REPLICAS != 1:
            raise ValueError("heaviside latent-to-discrete can only be used with n_replicas=1")
        from image_generation_tpu.utils.graph_cache import cached_latent_graph

        # cache-first: full-fabric build + greedy selection is deterministic
        # in (qpu, n_latents, seed) and costs ~a minute for Z15/P16
        self.graph, self.physical_nodes = cached_latent_graph(
            self.qpu, self.n_latents, cfg.RANDOM_SEED
        )
        self.plan = build_plan(self.graph)

    def _load_dataset(self) -> None:
        cfg = self.config
        self.images, self.data_source = get_dataset(cfg.IMAGE_SIZE, cfg.DATASET_SIZE)

    @property
    def n_batches(self) -> int:
        return int(self.images.shape[0]) // self.config.BATCH_SIZE

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------
    def train_init(self, n_epochs: int) -> None:
        """Build schedules/optimizers/chains for an n_epochs run
        (reference: src/model_wrapper.py:229-277)."""
        self.losses["mse_losses"].clear()
        self.losses["dvae_losses"].clear()
        self._key = jax.random.PRNGKey(self.config.RANDOM_SEED)

        keep = self.state is not None  # tune mode: keep loaded weights
        old_state = self.state
        if self.graph is None:
            self.setup()
        if self.images is None:
            self._load_dataset()

        self._n_epochs = n_epochs
        self._resume_start_epoch = 0  # set by resume_native after restore
        self._resolve_auto_ladder(old_state.grbm_params if keep else None)
        total_steps = n_epochs * self.n_batches
        self.fns = make_train_fns(
            self.config, self.graph, total_steps, self.plan, mesh=self.mesh
        )
        state = self.fns.init(self._next_key(), self.images[:1])
        if keep:
            state = state.replace(
                dvae_params=old_state.dvae_params,
                batch_stats=old_state.batch_stats,
                grbm_params=old_state.grbm_params,
            )
            state = self.fns.rebuild_sampler(state)
        self.state = self._shard(state)
        self._init_done = True

    def _resolve_auto_ladder(self, grbm_params=None) -> None:
        """PT_NUM_BETAS="auto": size the ladder from a short swap-acceptance
        probe of the CURRENT model (ops/pt_tune.size_ladder) and freeze the
        result into the config (PT_BETAS + PT_NUM_BETAS) before the step
        functions are built — ladder size is a static chain-shape everywhere
        (training/step.py), so it must be a concrete int by compile time.

        ``grbm_params``: the model to probe — the loaded checkpoint's
        (serving/tune: the case that matters; the scaled default T=32 was
        measured 10× over-provisioned for the trained model,
        runs/scaled_train_adapt_t8.json) or, for a fresh run, the same
        small-random init training starts from (the barrier then grows with
        the couplings — PT_ADAPT="epoch" moves rungs live, and train_epoch
        reports a free rung-count recommendation each epoch).  No-op unless
        SAMPLER="pt" and PT_NUM_BETAS="auto".
        """
        cfg = self.config
        if cfg.SAMPLER != "pt" or cfg.PT_NUM_BETAS != "auto":
            return
        if cfg.GRAPH_SHARDED == "on" or self.plan.n_pad ** 2 * 4 > 2 << 30:
            # the probe builds a dense replicated coupling — exactly what
            # the beyond-HBM mode exists to avoid; size those offline
            raise ValueError(
                "PT_NUM_BETAS='auto' cannot probe a beyond-HBM "
                "(graph-sharded) model at init — run the tune-pt CLI "
                "(which routes through the graph-sharded measurer) and "
                "pass its ladder via PT_BETAS/--pt-betas"
            )
        from image_generation_tpu.models.grbm import scaled_ising
        from image_generation_tpu.ops.gibbs import permuted_model
        from image_generation_tpu.ops.pt_tune import size_ladder

        if grbm_params is None:
            # the fused step's init draws the same small-random init
            # (graph.init_params) — the probe sees the model training
            # starts from
            grbm_params = self.graph.init_params(
                jax.random.PRNGKey(cfg.RANDOM_SEED)
            )
        h, q = scaled_ising(grbm_params, cfg.PREFACTOR, cfg.H_RANGE, cfg.J_RANGE)
        hp, cp = permuted_model(self.plan, h, q)
        mm = cfg.resolved_sampler_matmul_dtype(self.plan.n_pad)
        # probe the SAME model training will sample (the single-source
        # dtype/packing policy build_sampler_model applies)
        if cfg.SAMPLER_MATMUL_DTYPE == "int8":
            from image_generation_tpu.ops.quant import quantize_coupling

            cp = quantize_coupling(cp)
        elif mm is not None:
            cp = cp.astype(mm)
        betas, diag = size_ladder(
            jax.random.fold_in(jax.random.PRNGKey(cfg.RANDOM_SEED), 73),
            hp, cp, self.plan, beta_min=cfg.PT_BETA_MIN, matmul_dtype=mm,
        )
        self.pt_auto_info = {
            "num_betas": int(len(betas)),
            "probe_barrier": round(float(diag.barrier), 4),
            "probe_rungs": int(len(diag.betas)),
        }
        self.config = cfg.replace(
            PT_BETAS=tuple(float(b) for b in betas)
        )  # __post_init__ sets PT_NUM_BETAS = len(PT_BETAS)

    def _shard(self, state):
        """Commit the mesh shardings on a fresh/loaded train state
        (parallel/mesh.py: chains over data×chain, rest replicated —
        GSPMD propagates them through the jitted step)."""
        if self.mesh is None:
            return state
        from image_generation_tpu.parallel.mesh import shard_train_state

        return shard_train_state(
            state, self.mesh, graph_sharded=self.fns.graph_sharded
        )

    def step(self, batch, epoch: int) -> float:
        """Train on one batch; returns the MSE loss
        (reference: src/model_wrapper.py:279-353)."""
        if not self._init_done:
            raise TrainingError("Initialization required before training.")
        images = batch[0] if isinstance(batch, (tuple, list)) else batch
        self.state, metrics = self.fns.step(self.state, images, jnp.asarray(epoch))
        mse = float(metrics.mse)
        self.losses["mse_losses"].append(mse)
        self.losses["dvae_losses"].append(float(metrics.dvae_loss))
        return mse

    def train_epoch(self, epoch: int, batch_cb=None, n_chunks: int = 1) -> dict:
        """One full epoch as scanned XLA dispatches.

        ``n_chunks`` > 1 splits the epoch scan into equal chunks (the largest
        divisor of n_batches ≤ n_chunks, so every chunk reuses one compiled
        executable) and calls ``batch_cb(batches_done, n_batches)`` between
        them — batch-granular progress (the reference reports per-batch,
        demo_callbacks.py:358-385) at a bounded dispatch-overhead cost."""
        if not self._init_done:
            raise TrainingError("Initialization required before training.")
        batches = permuted_epoch(self.images, self.config.BATCH_SIZE, self._next_key())
        if self.mesh is not None and self.config.BATCH_SIZE % self.mesh.shape["data"] == 0:
            from image_generation_tpu.parallel.mesh import shard_epoch_batches

            batches = shard_epoch_batches(batches, self.mesh)
        nb = int(batches.shape[0])
        k = max(1, min(int(n_chunks), nb))
        while nb % k:
            k -= 1
        chunk = nb // k
        mse_parts, total_parts, acc_parts = [], [], []
        for i in range(k):
            seg = batches[i * chunk : (i + 1) * chunk]
            self.state, metrics = self.fns.epoch(self.state, seg, jnp.asarray(epoch))
            mse_parts.append(np.asarray(metrics.mse))
            total_parts.append(np.asarray(metrics.dvae_loss))
            acc_parts.append(np.asarray(metrics.pt_accept))
            if batch_cb is not None and k > 1:
                batch_cb((i + 1) * chunk, nb)
        mses = np.concatenate(mse_parts)
        totals = np.concatenate(total_parts)
        self.losses["mse_losses"].extend(mses.tolist())
        self.losses["dvae_losses"].extend(totals.tolist())
        stats = {"mse": float(mses.mean()), "dvae_loss": float(totals.mean())}
        acc = np.concatenate(acc_parts)  # (n_batches, T-1); width 0 non-PT
        if acc.size:
            # free ladder-health observability from the step's analytic
            # swap-acceptance metric, averaged over the epoch's rounds
            acc = acc.mean(axis=0)
            stats["pt_accept_min"] = float(acc.min())
            stats["pt_accept_mean"] = float(acc.mean())
            # free rung-count recommendation from the same metric (the
            # equal-barrier sizing rule, ops/pt_tune.recommend_num_betas):
            # surfaces over/under-provisioned ladders in problem details
            # without any extra sampling
            from image_generation_tpu.ops.pt_tune import recommend_num_betas

            stats["pt_recommended_num_betas"] = recommend_num_betas(acc)
            if self.config.PT_ADAPT == "epoch":
                stats["pt_betas"] = self._adapt_pt_betas(acc)
        return stats

    def _adapt_pt_betas(self, accept) -> list:
        """Adaptive tempering (PT_ADAPT="epoch"): one equal-barrier feedback
        iteration (ops/pt_tune.respace_betas) on the live ladder, fed by the
        epoch's mean per-pair swap acceptance.  The ladder is a traced
        TrainState leaf, so this is a host-side (T,) array swap — no
        recompilation; carried chain energies stay valid (an Ising energy
        does not depend on β); the chains equilibrate to the moved rungs
        over the next epoch's rounds (standard feedback-optimized PT)."""
        from image_generation_tpu.ops.pt_tune import respace_betas

        cur = np.asarray(jax.device_get(self.state.pt_betas), np.float64)
        new = respace_betas(cur, accept)
        arr = jnp.asarray(new, jnp.float32)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            arr = jax.device_put(arr, NamedSharding(self.mesh, P()))
        self.state = self.state.replace(pt_betas=arr)
        return [round(float(b), 5) for b in new]

    def current_lrs(self) -> tuple:
        """(DVAE LR, GRBM LR) at the current opt_step — what the reference
        prints and dumps into problem_details each epoch
        (src/utils/callback_helpers.py:186-204)."""
        s = int(self.state.opt_step)
        return float(self.fns.dvae_lr(s)), float(self.fns.grbm_lr(s))

    def train(
        self,
        n_epochs: int,
        progress_cb: Optional[Callable[[int, int], None]] = None,
        epoch_cb: Optional[Callable[[int, dict], None]] = None,
        metrics_log=None,
        profile_dir: Optional[str] = None,
        checkpoint_dir: Optional[str] = None,
        batch_cb: Optional[Callable[[int, int, int], None]] = None,
        epoch_chunks: int = 1,
        start_epoch: Optional[int] = None,
    ) -> dict:
        """Full training run (the reference's ``execute_training`` epoch loop,
        src/utils/callback_helpers.py:144-221, minus the UI file writes which
        live in app/).

        ``metrics_log``: optional observability.MetricsLog for per-epoch JSONL;
        ``profile_dir``: optional jax.profiler trace output directory.
        ``start_epoch``: first epoch index to run — defaults to the epoch a
        ``resume_native``-d run died in (restored opt_step // n_batches,
        recorded AT restore), so a resumed run continues there rather than
        restarting the epoch-indexed schedules (the reference's
        ``train_grbm = epoch < 6`` gate must not re-fire on a model whose
        GRBM froze before the interruption).  Non-resumed trainers always
        start at 0 — calling train() again on a finished trainer re-runs
        it (the derivation is deliberately NOT taken from the live
        opt_step, which would make that second call a silent no-op).
        """
        from image_generation_tpu.training.observability import profile

        if not self._init_done or self._n_epochs != n_epochs:
            self.train_init(n_epochs)
        if start_epoch is None:
            # consumed ONCE: the first train() after resume_native continues
            # where the run died; any later train() on the (now finished)
            # trainer is a fresh request and must re-run from 0
            start_epoch = getattr(self, "_resume_start_epoch", 0)
            self._resume_start_epoch = 0
        with profile(profile_dir):
            for epoch in range(start_epoch, n_epochs):
                t0 = time.perf_counter()
                cb = (
                    (lambda done, nb, e=epoch: batch_cb(e, done, nb))
                    if batch_cb is not None
                    else None
                )
                stats = self.train_epoch(epoch, batch_cb=cb, n_chunks=epoch_chunks)
                # time only the training dispatch: the callbacks below write
                # figures/diagrams/checkpoints, which can dominate an epoch
                # on fast chips and must not deflate images_per_s
                stats["epoch_time_s"] = time.perf_counter() - t0
                stats["images_per_s"] = (
                    self.n_batches * self.config.BATCH_SIZE / stats["epoch_time_s"]
                )
                if metrics_log is not None:
                    metrics_log.log("epoch", epoch=epoch, **stats)
                if checkpoint_dir is not None:
                    self.save_native(checkpoint_dir)
                if progress_cb:
                    progress_cb(epoch + 1, n_epochs)
                if epoch_cb:
                    epoch_cb(epoch, stats)
        return {
            "final_mse": self.losses["mse_losses"][-1],
            "final_dvae_loss": self.losses["dvae_losses"][-1],
        }

    # ------------------------------------------------------------------
    # persistence (reference checkpoint format)
    # ------------------------------------------------------------------
    def save(self, file_path, n_epochs: Optional[int] = None, old_losses: Optional[dict] = None):
        cfg = self.config
        losses = self.losses
        if old_losses:  # tune mode concatenates histories (demo_callbacks.py:769-771)
            losses = {
                "mse_losses": old_losses["mse_losses"] + losses["mse_losses"],
                "dvae_losses": old_losses["dvae_losses"] + losses["dvae_losses"],
            }
        parameters = make_parameters_json(
            n_latents=self.n_latents,
            n_epochs=n_epochs if n_epochs is not None else self._n_epochs,
            prefactor=cfg.PREFACTOR,
            qpu=self.qpu,
            num_reads=cfg.NUM_READS,
            loss_function=cfg.LOSS_FUNCTION,
            image_size=cfg.IMAGE_SIZE,
            batch_size=cfg.BATCH_SIZE,
            dataset_size=cfg.DATASET_SIZE,
            random_seed=cfg.RANDOM_SEED,
        )
        if self.physical_nodes is not None:
            # extra key (ignored by the reference app): lets the UI draw the
            # latent graph at its physical QPU coordinates after a load
            parameters["physical_nodes"] = [int(p) for p in self.physical_nodes]
        if self.data_source is not None:
            # extra key (ignored by the reference app): which dataset
            # actually trained this model (utils/data.DataSource.origin) —
            # shown in the UI's model-data card
            parameters["data_source"] = self.data_source.origin
        return save_model_dir(
            file_path,
            self.state.dvae_params,
            self.state.batch_stats,
            self.state.grbm_params,
            self.graph,
            parameters,
            losses,
        )

    def load(self, file_path) -> None:
        """Load a reference-format model directory (incl. the six shipped
        checkpoints).  The coupling graph comes from the checkpoint itself."""
        dvae_params, batch_stats, grbm_params, graph, parameters, losses = load_model_dir(
            file_path
        )
        if parameters:
            self.n_latents = parameters.get("n_latents", self.n_latents)
            self.config = self.config.replace(N_LATENTS=self.n_latents)
            if parameters.get("qpu"):
                self.qpu = parameters["qpu"]
            self.physical_nodes = parameters.get("physical_nodes")
        self.graph = graph
        self.plan = build_plan(graph)
        self.losses = losses
        if self.images is None:
            self._load_dataset()
        self._resolve_auto_ladder(grbm_params)
        total_steps = max(parameters.get("n_epochs", 1), 1) * max(self.n_batches, 1)
        self.fns = make_train_fns(
            self.config, self.graph, total_steps, self.plan, mesh=self.mesh
        )
        state = self.fns.init(self._next_key(), self.images[:1])
        state = state.replace(
            dvae_params=dvae_params, batch_stats=batch_stats, grbm_params=grbm_params
        )
        self.state = self._shard(self.fns.rebuild_sampler(state))
        self._init_done = True

    def save_native(self, directory) -> None:
        """Orbax checkpoint of the FULL train state (optimizers, chains,
        RNG, step counter) — exact resume, which the reference's
        weights-only format cannot do (SURVEY.md §5).  Loss history is
        saved alongside."""
        import json as _json

        from image_generation_tpu.io.native_ckpt import save_train_state

        path = save_train_state(directory, self.state)
        (path.parent / f"losses_{path.name}.json").write_text(_json.dumps(self.losses))

    def resume_native(self, directory, n_epochs: int) -> int:
        """Resume an interrupted run: rebuild functions for ``n_epochs`` and
        restore the latest full state + loss history.  Returns the restored
        opt_step."""
        import json as _json
        from pathlib import Path as _Path

        from image_generation_tpu.io.native_ckpt import latest_step, restore_train_state

        if not self._init_done or self._n_epochs != n_epochs:
            # an already-initialized trainer may be built for a DIFFERENT
            # total-epochs budget: the LR schedules bake in total_steps, so
            # reusing them would silently train the restored run at the
            # wrong (clipped) learning rate — rebuild, then restore over it
            self.train_init(n_epochs)
        # the checkpoint stores non-derivable state only; rebuild_cache
        # recomputes (sampler_h, sampler_coupling) from the restored
        # grbm_params bit-exactly (and row-sharded in graph-sharded mode)
        self.state = self._shard(
            restore_train_state(
                directory, self.state, rebuild_cache=self.fns.rebuild_cache
            )
        )
        step = latest_step(directory)
        losses_file = _Path(directory) / f"losses_step_{step:08d}.json"
        if losses_file.exists():
            self.losses = _json.loads(losses_file.read_text())
        # continue where the run died: the next train() starts at this
        # epoch (NOT a generic opt_step derivation — a finished trainer's
        # second train() call must re-run, not silently no-op)
        self._resume_start_epoch = int(self.state.opt_step) // max(
            self.n_batches, 1
        )
        return int(self.state.opt_step)

    # ------------------------------------------------------------------
    # generation / evaluation (reference: model_wrapper.py:355-491)
    # ------------------------------------------------------------------
    def sample_spins(self, num_reads: Optional[int] = None, n_sweeps: Optional[int] = None):
        """Raw spin sampling from the current GRBM (the ``as_tensor=True``
        face of grbm.sample, src/model_wrapper.py:369-376): returns a
        (num_reads, n) ±1 array in original coordinates.  Always samples
        with the LIVE PT ladder (``state.pt_betas`` — PT_ADAPT may have
        moved it off the config's geomspace).  ``sample_sampleset`` wraps
        this with energies/SampleSet for the backend-protocol surface."""
        cfg = self.config
        return self.fns.sample(
            self._next_key(),
            self.state.grbm_params,
            num_reads or cfg.NUM_READS,
            n_sweeps or (cfg.GIBBS_BURN_IN + cfg.GIBBS_SWEEPS),
            betas=self.state.pt_betas if cfg.SAMPLER == "pt" else None,
        )

    def sampler_backend(self):
        """The configured sampler backend (samplers/ — the P5 surface:
        gibbs/pt/exact behind one protocol) wrapped in the persistent sample
        cache (the C9 deque semantics the reference intended,
        src/utils/persistent_qpu_sampler.py).  Built once per Trainer from
        the same config keys the reference's YAML carries
        (MAX_DEQUE_SIZE, ITERATIONS_BEFORE_RESAMPLING)."""
        if getattr(self, "_backend", None) is None:
            from image_generation_tpu.samplers.base import get_sampler
            from image_generation_tpu.samplers.persistent import PersistentSampleCache

            cfg = self.config
            if cfg.SAMPLER == "pt":
                backend = get_sampler(
                    "pt", sweeps_per_round=max(cfg.GIBBS_SWEEPS, 1),
                    persistent=cfg.PERSISTENT_CHAINS,
                    betas=cfg.initial_pt_betas(),  # tuned-or-geomspace, one source
                )
            elif cfg.SAMPLER == "exact":
                backend = get_sampler("exact")
            else:
                backend = get_sampler(
                    "gibbs", n_sweeps=cfg.GIBBS_BURN_IN + cfg.GIBBS_SWEEPS,
                    persistent=cfg.PERSISTENT_CHAINS,
                )
            self._backend = PersistentSampleCache(
                backend, cfg.MAX_DEQUE_SIZE, cfg.ITERATIONS_BEFORE_RESAMPLING
            )
        return self._backend

    def sample_sampleset(self, num_reads: Optional[int] = None):
        """One-shot sampling through the backend protocol: returns a
        SampleSet (spins + energies) — the ``grbm.sample(..., as_tensor=
        False)`` → dimod.SampleSet equivalent (src/model_wrapper.py:369-376).
        Training keeps the fused in-step sampler; this is the product
        surface for generation/evaluation.

        The sample cache is invalidated whenever the GRBM parameters have
        changed since it was filled (training stepped, checkpoint loaded,
        tune ran) — the reference's generation path always samples the
        *current* model, so serving deque entries drawn under older
        parameters would be a behavior regression, not a parity feature."""
        from image_generation_tpu.models.grbm import scaled_ising

        leaf = jax.tree.leaves(self.state.grbm_params)[0]
        if getattr(self, "_backend_param_ref", None) is not leaf:
            self.sampler_backend().reset()
            self._backend_param_ref = leaf

        cfg = self.config
        h, q = scaled_ising(
            self.state.grbm_params, cfg.PREFACTOR, cfg.H_RANGE, cfg.J_RANGE
        )
        if self.fns is not None and self.fns.graph_sharded:
            # the sampler backends build a dense REPLICATED coupling (fine
            # at normal scale); in graph-sharded mode that would
            # materialize the whole beyond-HBM matrix on one device, so
            # generation routes through the partitioned in-step sampler
            # and computes energies edge-wise (O(E), no dense matrix)
            import numpy as np

            from image_generation_tpu.models.grbm import GRBMParams, energy
            from image_generation_tpu.utils.sampleset import SampleSet

            n = num_reads or cfg.NUM_READS
            # sample_spins carries the LIVE ladder (PT_ADAPT may have moved it)
            spins = self.sample_spins(n)
            e = energy(GRBMParams(linear=h, quadratic=q), self.graph, spins)
            return SampleSet(
                spins=np.asarray(spins), energies=np.asarray(e),
                info={"sampler": "graph_sharded"},
            )
        backend = self.sampler_backend()
        if cfg.SAMPLER == "pt" and getattr(self.state, "pt_betas", None) is not None \
                and self.state.pt_betas.size:
            # keep the backend on the LIVE ladder (PT_ADAPT may have moved
            # the rungs since the backend was built from the config)
            backend.backend.betas = jnp.asarray(self.state.pt_betas)
        return backend.sample(
            h, q, self.graph, num_reads or cfg.NUM_READS, self._next_key()
        )

    def generate_output(
        self, do_sharpen: bool = False, num_reads: Optional[int] = None
    ) -> dict:
        """Sample the GRBM and decode: returns {'grid', 'images', 'latents',
        'sample_set'} (the reference's generate_output,
        src/model_wrapper.py:355-399, figure serialization in app/figures.py).
        Sampling goes through the backend protocol (sample_sampleset)."""
        sample_set = self.sample_sampleset(num_reads)
        samples = jnp.asarray(sample_set.spins)
        dvae = self.fns.dvae
        imgs = dvae.apply(
            {"params": self.state.dvae_params, "batch_stats": self.state.batch_stats},
            samples[:, None, :],
            train=False,
            method=dvae.decode,
        )  # (N, 1, S, S, 1)
        imgs = np.asarray(jnp.clip(imgs[:, 0], 0.0, 1.0))
        if do_sharpen:
            imgs = sharpen(imgs)
        return {
            "grid": make_grid(imgs, nrow=16),
            "images": imgs,
            "latents": np.asarray(samples),
            "sample_set": sample_set,
        }

    def generate_reconstructed_samples(self, do_sharpen: bool = False) -> dict:
        """Original/reconstruction interleaved grid (reference:
        generate_reconstucted_samples [sic], src/model_wrapper.py:447-491,
        including the white separator column on reconstructions)."""
        cfg = self.config
        batch = self.images[: cfg.BATCH_SIZE]
        dvae = self.fns.dvae
        _, _, recon = dvae.apply(
            {"params": self.state.dvae_params, "batch_stats": self.state.batch_stats},
            batch,
            n_replicas=1,
            train=False,
            rngs={"spins": self._next_key()},
        )
        recon = np.array(jnp.clip(recon[:, 0], 0.0, 1.0))  # writable copy
        recon[:, :, -1, :] = 1.0  # white separator column (model_wrapper.py:466)
        pairs = interleave(np.asarray(batch), recon)
        if do_sharpen:
            pairs = sharpen(pairs)
        return {"grid": make_grid(pairs, nrow=16, padding=0), "images": pairs}

    # reference method name kept as an alias (misspelling and all)
    generate_reconstucted_samples = generate_reconstructed_samples

    def generate_loss_plot(self, old_loss_data: Optional[dict] = None) -> dict:
        """Loss histories for plotting (figure JSON in app/figures.py)."""
        mse = self.losses["mse_losses"]
        total = self.losses["dvae_losses"]
        if old_loss_data:
            mse = old_loss_data["mse_losses"] + mse
            total = old_loss_data["dvae_losses"] + total
        return {"mse_losses": mse, "dvae_losses": total}
