"""Training configuration: the reference's YAML schema as one dataclass.

Mirrors ``src/training_parameters.yaml`` (reference values as defaults) plus
the sampler settings that replace the annealer.  YAML round-trip keeps the
reference's UPPERCASE key names so existing parameter files load unchanged
(reference loads them via ``ModelWrapper.__getattr__``,
src/model_wrapper.py:137-146).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import yaml

__all__ = ["TrainingConfig", "SERVING_INT8_MIN_LATENTS"]

# Scale gate for the serving-surface int8 default (TrainingConfig.
# for_serving): models at/above this latent count serve from the quantized
# sampler when SAMPLER_MATMUL_DTYPE is left at "auto".  Same 2048 threshold
# as every other at-scale auto gate (bf16 matmuls, block-sparse packing).
SERVING_INT8_MIN_LATENTS = 2048


@dataclass
class TrainingConfig:
    # --- reference training_parameters.yaml keys (same defaults) ---
    ANNEALING_TIME: float = 1.0  # kept for config parity; unused by Gibbs
    NUM_READS: int = 256
    IMAGE_SIZE: int = 32
    DATASET_SIZE: Optional[int] = None
    BATCH_SIZE: int = 128
    RANDOM_SEED: int = 775321899904
    LOSS_FUNCTION: str = "mmd"
    N_REPLICAS: int = 8
    LATENT_TO_DISCRETE: Optional[str] = None  # None (stochastic ST) | "heaviside" | "gumbel"
    GUMBEL_TAU: float = 1.0  # relaxation temperature for the gumbel mode
    PREFACTOR: float = 0.05
    MAX_DEQUE_SIZE: int = 4096
    ITERATIONS_BEFORE_RESAMPLING: int = 100
    AUTOENCODER_INITIAL_LR: float = 1e-4
    AUTOENCODER_FINAL_LR: float = 1e-5
    AUTOENCODER_WEIGHT_DECAY: float = 0.01
    BM_INITIAL_LR: float = 1e-3
    BM_FINAL_LR: float = 1e-4
    BM_WEIGHT_DECAY: float = 0.01

    # --- sampler settings (annealer replacement; new in this framework) ---
    SAMPLER: str = "gibbs"  # "gibbs" | "pt" | "exact" (tests, n<=20)
    GIBBS_SWEEPS: int = 16  # sweeps per negative-phase refresh
    GIBBS_BURN_IN: int = 64  # extra sweeps when (re)initializing chains
    PERSISTENT_CHAINS: bool = True  # PCD: carry chain state across steps
    PT_NUM_BETAS: int = 8  # parallel-tempering ladder size (SAMPLER="pt");
    # or "auto": the Trainer sizes the ladder at sampler build
    # (train_init / checkpoint load) from a short swap-acceptance probe of
    # the CURRENT model (ops/pt_tune.size_ladder — the free pt_accept
    # metric showed the scaled default was 10× over-provisioned).  An
    # explicit PT_BETAS ladder always wins over "auto".
    PT_BETA_MIN: float = 0.25
    PT_BETAS: Optional[tuple] = None  # explicit PT ladder (ascending, last
    # rung 1.0) — e.g. a feedback-optimized schedule from
    # ops/pt_tune.tune_pt_betas (equal-barrier spacing beats the geomspace
    # default on rough landscapes); overrides PT_NUM_BETAS/PT_BETA_MIN
    PT_ADAPT: str = "off"  # "off" | "epoch" — adaptive tempering: after
    # each epoch, re-space the live ladder (TrainState.pt_betas) with one
    # equal-barrier feedback iteration (ops/pt_tune.respace_betas) fed by
    # the epoch's mean per-pair swap acceptance, which the training step
    # measures for free (StepMetrics.pt_accept).  Zero recompilation (the
    # ladder is a traced state leaf) and zero extra sampling.
    N_KERNELS: int = 7  # GaussianKernel mixture size (reference hard-codes 7)
    COMPUTE_DTYPE: str = "bfloat16"  # conv/dense compute precision on TPU;
    # parameters, BatchNorm stats, losses and the sampler stay float32
    SAMPLER_MATMUL_DTYPE: str = "auto"  # Gibbs field-matmul precision:
    # "auto" = bf16 only for large graphs (n_pad ≥ 2048, where halved
    # HBM/VMEM traffic beats the per-color cast cost), f32 otherwise;
    # ±1 spins are exact in bf16 and accumulation is always f32.
    # "float32" forces bit-level determinism (sharding-equivalence tests).
    # "int8" samples the int8-QUANTIZED model (ops/quant.py: couplings
    # rounded to 255 levels of max|J|/127 — tighter than the reference
    # annealer's analog control error) on the 2×-rate int8 MXU, also
    # halving the HBM-streaming kernel's coupling traffic vs bf16.
    # Opt-in; composes with GRAPH_SHARDED (int8 coupling rows shard,
    # partial fields psum in int32 — exact for ±1 × int8).
    ADAM_MOMENT_DTYPE: str = "float32"  # storage dtype of the DVAE Adam
    # moments (mu AND nu): "float32" (default — exact reference semantics)
    # or "bfloat16" — halves optimizer-state HBM footprint/traffic, the
    # measured bottleneck of the scaled 127M-dense config's update pass
    # (runs/scaled_attribution_dvae.json); arithmetic stays f32 either way
    # (training/optim.py).  The GRBM's Adam always stays f32 (tiny).
    ADAM_FACTORED_NU: str = "off"  # "on" | "off" — store the second moment
    # of outsized 2-D DVAE params (≥ 4M elements — in practice the scaled
    # config's 127M-param dense layer) FACTORED as its row/col g² means
    # (the Adafactor rank-1 estimator, training/optim.py FactoredNu): nu's
    # HBM traffic and footprint for that layer drop from ~1 GB/step (f32)
    # to ~44 KB.  Composes with ADAM_MOMENT_DTYPE (which then applies to
    # mu and any remaining dense nu).  Opt-in; the default keeps exact
    # torch-Adam semantics.
    USE_PALLAS: str = "auto"  # "auto" | "on" | "off" — fused Pallas Gibbs
    # kernel for the training-step negative phase. auto = on for TPU
    # backends when the problem fits VMEM. On a multi-chip mesh the kernel
    # runs under shard_map (zero-comm chain sharding) whenever the chain
    # count tiles the mesh; otherwise the XLA sampler partitions via GSPMD.
    PLRNG_ROW_SEED: str = "off"  # "on" | "off" — under USE_PALLAS ×
    # GRAPH_SHARDED, reseed the hardware-PRNG span-update kernel per 8-row
    # group from GLOBAL row ids (ops/gibbs_graph_sharded_pallas.py) so the
    # sampled chain is bit-identical across mesh factorizations (the default
    # tile seeding varies with the per-shard chain count — a different but
    # equally valid stream per mesh shape).  Opt-in: costs the per-group
    # reseed loop; only worth it when cross-layout reproducibility matters.
    SWEEP_BLOCK_SPARSE: str = "auto"  # "auto" | "on" | "off" — pack the
    # cached sampler coupling into its occupied chunk panels and sweep only
    # those (ops/block_sparse.py).  Hardware graphs are sparse (degree ≤ 20)
    # and the plan's BFS member ordering concentrates each color's couplings
    # into few chunks, so sweep FLOPs and coupling HBM traffic drop by the
    # measured occupancy (~3-4× at the scaled Pegasus config).  auto = on
    # for large graphs (n_pad ≥ 2048) on the XLA / HBM-streaming Pallas
    # sweep paths when the occupancy is ≤ 0.75; never used by the
    # VMEM-resident kernel (dense-in-VMEM is already optimal).  Composes
    # with SAMPLER_MATMUL_DTYPE="int8" AND with GRAPH_SHARDED (each row
    # shard packs its own occupied chunks — ops/block_sparse_sharded.py;
    # auto there gates on the PADDED per-shard occupancy instead).
    SWEEP_BS_CHUNK: int = 256  # block-sparse chunk height (rows); 128 packs
    # tighter (less traffic), 256 halves the kernel's unrolled dot count —
    # the measured sweet spot on the scaled config
    GRAPH_SHARDED: str = "auto"  # "auto" | "on" | "off" — partition the
    # GRAPH dimension over the mesh's "chain" axis: the dense permuted
    # coupling matrix is row-sharded and the chains' spin columns
    # col-sharded; per-color fields are psum'd over ICI
    # (ops/gibbs_graph_sharded.py). For GRBMs whose coupling matrix
    # outgrows one chip's HBM. auto = on only when the f32 coupling exceeds
    # 2 GiB (n_pad ≳ 23k spins). Composes with SAMPLER="pt": the
    # temperature ladder shards over "data" (replica exchange = ppermute)
    # while the graph shards over "chain".

    # --- model/problem shape (reference passes these via ModelWrapper args) ---
    QPU: str = "Advantage2_system1"
    N_LATENTS: int = 256

    # hardware parameter ranges used when clipping the sampled model.
    # The reference reads these from live solver properties
    # (src/utils/common.py:129); these are the production Advantage ranges.
    H_RANGE: tuple = (-4.0, 4.0)
    J_RANGE: tuple = (-1.0, 1.0)

    def __post_init__(self):
        # YAML 1.1 parses bare on/off/yes/no as booleans, so a file saying
        # ``GRAPH_SHARDED: on`` reaches us as True — which would compare
        # unequal to both "on" and "auto" in make_train_fns and silently
        # behave as "off", replicating a beyond-HBM coupling.  Normalize
        # bools to the string form and fail loudly on anything else.
        for field in ("GRAPH_SHARDED", "USE_PALLAS", "SWEEP_BLOCK_SPARSE"):
            v = getattr(self, field)
            if isinstance(v, bool):
                v = "on" if v else "off"
                object.__setattr__(self, field, v)
            if v not in ("auto", "on", "off"):
                raise ValueError(
                    f"{field} must be one of 'auto'/'on'/'off', got {v!r}"
                )
        for field in ("ADAM_FACTORED_NU", "PLRNG_ROW_SEED"):
            v = getattr(self, field)
            if isinstance(v, bool):  # YAML 1.1 'on'/'off' parse as booleans
                v = "on" if v else "off"
                object.__setattr__(self, field, v)
            if v not in ("on", "off"):
                raise ValueError(
                    f"{field} must be 'on' or 'off', got {v!r}"
                )
        if self.ADAM_MOMENT_DTYPE not in ("float32", "bfloat16"):
            raise ValueError(
                "ADAM_MOMENT_DTYPE must be 'float32' or 'bfloat16', got "
                f"{self.ADAM_MOMENT_DTYPE!r}"
            )
        if self.SAMPLER_MATMUL_DTYPE not in (
            "auto", "float32", "bfloat16", "int8"
        ):
            raise ValueError(
                "SAMPLER_MATMUL_DTYPE must be 'auto'/'float32'/'bfloat16'/"
                f"'int8', got {self.SAMPLER_MATMUL_DTYPE!r}"
            )
        if self.PT_BETAS is not None:
            b = tuple(float(x) for x in self.PT_BETAS)
            if len(b) < 2 or any(
                b2 <= b1 for b1, b2 in zip(b, b[1:])
            ) or b[0] <= 0 or abs(b[-1] - 1.0) > 1e-6:
                raise ValueError(
                    "PT_BETAS must be an ascending ladder of ≥2 positive "
                    f"rungs ending at 1.0, got {self.PT_BETAS!r}"
                )
            object.__setattr__(self, "PT_BETAS", b)
            # chain shapes everywhere key off PT_NUM_BETAS — keep it the
            # single source of ladder size
            object.__setattr__(self, "PT_NUM_BETAS", len(b))
        v = self.PT_NUM_BETAS
        if isinstance(v, str):
            if v != "auto":
                raise ValueError(
                    f"PT_NUM_BETAS must be an int ≥ 2 or 'auto', got {v!r}"
                )
        elif not isinstance(v, int) or v < 2:
            raise ValueError(
                f"PT_NUM_BETAS must be an int ≥ 2 or 'auto', got {v!r}"
            )
        if isinstance(self.PT_ADAPT, bool):  # YAML 1.1 'off' parses as False
            object.__setattr__(self, "PT_ADAPT", "epoch" if self.PT_ADAPT else "off")
        if self.PT_ADAPT not in ("off", "epoch"):
            raise ValueError(
                f"PT_ADAPT must be 'off' or 'epoch', got {self.PT_ADAPT!r}"
            )

    def initial_pt_betas(self):
        """The INITIAL parallel-tempering ladder as a float64 numpy array:
        the explicit/tuned ``PT_BETAS`` if set, else geometric spacing over
        [PT_BETA_MIN, 1.0].  Single source of truth — consumed by the fused
        step's ``betas0`` (training/step.py), the PTSampler backend
        (training/trainer.py) and the ``tune-pt`` CLI (app/cli.py)."""
        import numpy as np

        if self.PT_BETAS is not None:
            return np.asarray(self.PT_BETAS, np.float64)
        if self.PT_NUM_BETAS == "auto":
            raise RuntimeError(
                "PT_NUM_BETAS='auto' has not been resolved yet — the "
                "Trainer sizes the ladder at train_init/load (or pass an "
                "explicit PT_BETAS ladder)"
            )
        return np.geomspace(self.PT_BETA_MIN, 1.0, self.PT_NUM_BETAS)

    def for_serving(self, n_latents: int) -> "TrainingConfig":
        """Generation/serving-surface config resolution: under the default
        ``SAMPLER_MATMUL_DTYPE="auto"``, at-scale models (n_latents ≥ 2048
        — the same threshold every other auto gate uses) serve from the
        int8-QUANTIZED sampler instead of bf16: the measured +71%
        request-rate lever (12.3 → 7.18 ms/request at the 5640-spin config,
        BENCHMARKS.md / runs/sampler_bench.json) that the generated-image
        quality A/B showed is metric-neutral (runs/serving_quality_ab.json:
        image-MMD deltas inside the estimator's own 2σ round-to-round
        noise; the int8 rounding of max|J|/127 is also tighter than the
        analog h/J control error of the annealer the reference serves
        from).  TRAINING surfaces never call this — the training negative
        phase keeps exact-dtype semantics; an explicit "float32"/
        "bfloat16"/"int8" is always honored unchanged.

        Gate semantics: this gate fires on the checkpoint's UNPADDED
        ``n_latents`` (all parameters.json records pre-build), while the
        other auto gates (resolved_sampler_matmul_dtype,
        resolved_block_sparse) use the plan's padded ``n_pad`` — deriving
        n_pad here would need the full fabric build (~a minute cold,
        utils/graph_cache.py).  Since padding only rounds UP, the
        divergence is strictly conservative: a borderline model
        (n_latents < 2048 ≤ n_pad) keeps exact bf16 serving rather than
        wrongly quantizing; it can opt in with an explicit
        ``SAMPLER_MATMUL_DTYPE="int8"``.

        Called by the serving surfaces only — both through the single
        ``for_serving_dir`` spelling below: ``WarmGenerator._trainer_for``
        (app/warm.py — /api/generate + /api/generate_now) and the CLI
        ``generate`` command (app/cli.py)."""
        if (
            self.SAMPLER_MATMUL_DTYPE == "auto"
            and n_latents >= SERVING_INT8_MIN_LATENTS
        ):
            return self.replace(SAMPLER_MATMUL_DTYPE="int8")
        return self

    def for_serving_dir(self, model_dir) -> "TrainingConfig":
        """``for_serving`` resolved from a checkpoint directory: peeks the
        scale out of the checkpoint's own ``parameters.json`` (falling back
        to this config's N_LATENTS).  The one spelling both serving
        surfaces share — WarmGenerator._trainer_for (app/warm.py) and the
        CLI ``generate`` command (app/cli.py) must resolve the SAME sampler
        precision for the same checkpoint."""
        from image_generation_tpu.io.checkpoint import read_parameters

        return self.for_serving(
            int(read_parameters(model_dir).get("n_latents", self.N_LATENTS))
        )

    def resolved_sampler_matmul_dtype(self, n_pad: int):
        """The sweep-matmul cast dtype for a graph padded to ``n_pad``:
        jnp.bfloat16 under "auto" for large graphs (n_pad ≥ 2048), an
        explicit jnp dtype, or None for f32 and for "int8" (int8 is carried
        by the QuantCoupling the cached sampler model stores — consumers
        branch on its type, no cast dtype is threaded).  Single source of
        truth for make_train_fns (training/step.py) and the ``tune-pt``
        CLI, which must measure the SAME model training samples."""
        import jax.numpy as jnp

        if self.SAMPLER_MATMUL_DTYPE == "auto":
            return jnp.bfloat16 if n_pad >= 2048 else None
        if self.SAMPLER_MATMUL_DTYPE in ("float32", "int8"):
            return None
        return jnp.dtype(self.SAMPLER_MATMUL_DTYPE)

    def resolved_block_sparse(self, plan) -> bool:
        """Whether the packed block-sparse coupling (ops/block_sparse.py)
        applies to ``plan`` under this config — before the impl-specific
        gates make_train_fns adds (VMEM-kernel veto; in GRAPH_SHARDED mode
        the shard-local fit and padded-occupancy gates of
        ops/block_sparse_sharded.py).  Single source of truth for
        training/step.py and the ``tune-pt`` CLI, which must measure the
        SAME packed model training samples."""
        if self.SWEEP_BLOCK_SPARSE == "off":
            return False
        if self.SWEEP_BLOCK_SPARSE == "on":
            return True
        from image_generation_tpu.ops.block_sparse import chunk_occupancy

        return (
            plan.n_pad >= 2048
            and chunk_occupancy(plan, self.SWEEP_BS_CHUNK) <= 0.75
        )

    @classmethod
    def from_yaml(cls, path, **overrides) -> "TrainingConfig":
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in raw.items() if k in known}
        kwargs.update(overrides)
        return cls(**kwargs)

    @classmethod
    def parse_overrides(cls, pairs) -> dict:
        """``--override KEY=VAL`` CLI strings → constructor-kwargs dict with
        YAML-typed values (``PT_NUM_BETAS=32`` → int, ``PT_BETAS=[0.5,1]``
        → list) — the one parser shared by every script that grows an
        ``--override`` flag (scripts/serving_quality_ab.py,
        scripts/load_test_warm.py).  Unknown keys and a missing '=' fail
        loudly here instead of as a late TypeError/None inside the run."""
        known = {f.name for f in dataclasses.fields(cls)}
        out = {}
        for ov in pairs or []:
            k, sep, v = ov.partition("=")
            if not sep or not k:
                raise SystemExit(f"--override must be KEY=VAL, got {ov!r}")
            if k not in known:
                raise SystemExit(
                    f"--override: {k!r} is not a TrainingConfig field"
                )
            out[k] = yaml.safe_load(v)
        return out

    def to_yaml(self, path) -> None:
        d = dataclasses.asdict(self)
        d["H_RANGE"] = list(self.H_RANGE)
        d["J_RANGE"] = list(self.J_RANGE)
        if self.PT_BETAS is not None:
            d["PT_BETAS"] = list(self.PT_BETAS)
        Path(path).write_text(yaml.safe_dump(d, sort_keys=False))

    def replace(self, **kw) -> "TrainingConfig":
        return dataclasses.replace(self, **kw)
