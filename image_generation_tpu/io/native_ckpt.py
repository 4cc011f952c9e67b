"""Native (orbax) checkpointing: exact training resume.

The reference can only save/load model weights (two torch state dicts), so a
run cannot resume mid-training with its optimizer state, LR position, RNG or
sampler chains — SURVEY.md §5 notes "mid-epoch resume is impossible".  This
module adds what production training needs: the FULL ``TrainState``
(parameters, BatchNorm stats, both Adam states, persistent Gibbs/PT chains,
the cached sampler model, step counter, RNG key) serialized with
orbax-checkpoint, giving bit-exact resume.

The torch-format directory (io/checkpoint.py) remains the interchange format
with the reference app; native checkpoints are the fault-tolerance format.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional


__all__ = ["save_train_state", "restore_train_state", "latest_step"]


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(directory, state, step: Optional[int] = None) -> Path:
    """Write the full TrainState under ``directory/step_<k>``."""
    import orbax.checkpoint as ocp

    directory = Path(directory).resolve()
    directory.mkdir(parents=True, exist_ok=True)
    if step is None:
        step = int(state.opt_step)
    path = directory / f"step_{step:08d}"
    _ckptr().save(path, state, force=True)
    return path


def latest_step(directory) -> Optional[int]:
    directory = Path(directory)
    if not directory.exists():
        return None
    steps = sorted(
        int(p.name.split("_")[1]) for p in directory.glob("step_*") if p.is_dir()
    )
    return steps[-1] if steps else None


def restore_train_state(directory, template, step: Optional[int] = None):
    """Restore a TrainState; ``template`` is a same-structure state (e.g. a
    fresh ``fns.init(...)`` result) providing the pytree/shape/sharding spec."""
    directory = Path(directory).resolve()
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = directory / f"step_{step:08d}"
    restored = _ckptr().restore(path, item=template)
    return restored
