"""Native (orbax) checkpointing: exact training resume.

The reference can only save/load model weights (two torch state dicts), so a
run cannot resume mid-training with its optimizer state, LR position, RNG or
sampler chains — SURVEY.md §5 notes "mid-epoch resume is impossible"
(reference save: src/model_wrapper.py:148-162).  This module adds what
production training needs: the ``TrainState`` (parameters, BatchNorm stats,
both Adam states, persistent Gibbs/PT chains + their carried ladder
energies, step counter, RNG key) serialized with orbax-checkpoint, giving
bit-exact resume.

Only NON-DERIVABLE state is written: the cached sampler model
(``sampler_h``, ``sampler_coupling``) is a deterministic function of
``grbm_params`` (training/step.py build_sampler_model) and is the state's
largest buffer by far — n_pad² (72-145 MB at 5640 spins, gigabytes in the
graph-sharded beyond-HBM regime, where serializing it would also force the
never-materialize-whole matrix through one host).  ``restore_train_state``
rebuilds it via the bundle's jitted ``rebuild_cache`` (bit-exact, and
row-sharded under the graph-sharded constraint).  Checkpoint bytes are
therefore ∝ params + optimizer moments + chains.

The torch-format directory (io/checkpoint.py) remains the interchange format
with the reference app; native checkpoints are the fault-tolerance format.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional


__all__ = ["save_train_state", "restore_train_state", "latest_step"]

# leaves excluded from serialization — derived from grbm_params
_DERIVED = {"sampler_h": None, "sampler_coupling": None}


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _strip(state) -> dict:
    """Fields to drop before serialization: the derived sampler cache, plus
    the non-PT (0,)-shaped placeholders (chain_energies, pt_betas — orbax
    refuses zero-size arrays; they are recreated verbatim on restore).
    In PT mode pt_betas IS saved: once PT_ADAPT has re-spaced the ladder it
    is no longer derivable from the config."""
    drop = dict(_DERIVED)
    for field in ("chain_energies", "pt_betas"):
        if getattr(getattr(state, field), "size", 1) == 0:
            drop[field] = None
    return drop


def save_train_state(directory, state, step: Optional[int] = None) -> Path:
    """Write the non-derivable TrainState under ``directory/step_<k>``."""
    directory = Path(directory).resolve()
    directory.mkdir(parents=True, exist_ok=True)
    if step is None:
        step = int(state.opt_step)
    path = directory / f"step_{step:08d}"
    # None leaves are empty pytree nodes: the derived cache is simply absent
    # from the file (and from the bytes written)
    _ckptr().save(path, state.replace(**_strip(state)), force=True)
    return path


def latest_step(directory) -> Optional[int]:
    directory = Path(directory)
    if not directory.exists():
        return None
    steps = sorted(
        int(p.name.split("_")[1]) for p in directory.glob("step_*") if p.is_dir()
    )
    return steps[-1] if steps else None


def restore_train_state(directory, template, step: Optional[int] = None,
                        rebuild_cache=None):
    """Restore a TrainState; ``template`` is a same-structure state (e.g. a
    fresh ``fns.init(...)`` result) providing the pytree/shape/sharding spec.

    ``rebuild_cache``: the bundle's ``TrainStepFns.rebuild_cache`` — rebuilds
    the stripped (sampler_h, sampler_coupling) from the restored grbm_params
    (bit-exact: the cache is a deterministic jitted function of the params).
    When omitted, the returned state carries ``None`` in those fields and the
    caller must rebuild before stepping.

    Restoration is **topology-independent**: every leaf is restored directly
    into the TEMPLATE's sharding (the current process's mesh placement), not
    the sharding recorded in the checkpoint file — a state saved on an
    8-device mesh restores on one chip (serving) and vice versa, because the
    file's device list is never consulted.
    """
    import orbax.checkpoint as ocp

    directory = Path(directory).resolve()
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = directory / f"step_{step:08d}"
    drop = _strip(template)

    try:
        restored = _ckptr().restore(
            path, item=template.replace(**drop),
            restore_args=ocp.checkpoint_utils.construct_restore_args(
                template.replace(**drop)
            ),
        )
    except (ValueError, KeyError) as e:
        # structure mismatch: the checkpoint was written by an incompatible
        # TrainState schema (e.g. a pre-energy-carry build, or a different
        # sampler mode than the template's config) — surface it rather than
        # guessing at a partial restore
        raise ValueError(
            f"checkpoint {path} does not match the current TrainState "
            f"schema (saved by an older build, or a different SAMPLER "
            f"mode than the restoring config?): {e}"
        ) from e
    for field in ("chain_energies", "pt_betas"):
        if field in drop:
            # recreate the non-PT placeholder the save dropped (orbax cannot
            # hold zero-size arrays)
            restored = restored.replace(**{field: getattr(template, field)})
    if rebuild_cache is not None:
        restored = rebuild_cache(restored)
    return restored
