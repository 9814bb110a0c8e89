"""Checkpoint / resume via orbax (a strict superset of the reference).

The reference only ``torch.save``s the model state dict at end of training
(``chkpt/`` in oskopek/mvae [UNVERIFIED], SURVEY.md §5); here the full
training state — params, optimizer state, PRNG key, step — round-trips
through orbax, enabling true mid-training resume (``--resume`` in the CLI).
"""
from __future__ import annotations

from pathlib import Path

import jax
import orbax.checkpoint as ocp


def save(ckpt_dir: str, step: int, state: dict):
    """state: pytree dict, e.g. {'params', 'opt_state', 'key', 'step'}."""
    path = Path(ckpt_dir).absolute() / f"step_{step:08d}"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return str(path)


def latest_step(ckpt_dir: str) -> int | None:
    p = Path(ckpt_dir)
    if not p.exists():
        return None
    steps = [int(d.name.split("_")[1]) for d in p.iterdir()
             if d.is_dir() and d.name.startswith("step_")]
    return max(steps) if steps else None


def restore(ckpt_dir: str, abstract_state: dict, step: int | None = None):
    """Restore the training state saved by :func:`save`.

    abstract_state: a pytree of the same structure (e.g. a freshly
    initialized state) used as the shape/dtype/sharding template.
    """
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = Path(ckpt_dir).absolute() / f"step_{step:08d}"
    ckptr = ocp.StandardCheckpointer()
    template = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
    return ckptr.restore(path, template)
