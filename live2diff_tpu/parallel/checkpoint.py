"""Training checkpoint/resume for the motion-module trainer.

The reference is inference-only (its "checkpointing" is model ingest;
SURVEY §5.4), so this is free design space done the TPU way: orbax
async-capable checkpointing of the full :class:`~.train.TrainState`
(params + AdamW moments + step + PRNG key) with sharding-aware restore —
on a mesh, leaves come back with the shardings of the template state, so
resume works under the same (dp, tp) layout the step was compiled for.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from .train import TrainState


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.Checkpointer(ocp.PyTreeCheckpointHandler())


def save_train_state(path: str, state: TrainState, force: bool = True) -> str:
    """Write ``state`` to ``path`` (a directory). Returns the path."""
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    ckpt.save(path, jax.device_get(state), force=force)
    return path


def restore_train_state(path: str, template: TrainState) -> TrainState:
    """Restore a TrainState saved by :func:`save_train_state`.

    ``template`` supplies the tree structure, dtypes, AND placement: every
    restored leaf is device_put with the template leaf's sharding, so a
    checkpoint written from a single chip restores correctly onto a (dp, tp)
    mesh and vice versa.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = _checkpointer()
    restored = ckpt.restore(path, item=jax.device_get(template))

    def place(t, r):
        sharding = getattr(t, "sharding", None)
        return jax.device_put(r, sharding) if sharding is not None else r

    return jax.tree_util.tree_map(place, template, restored)


def latest_step_dir(root: str) -> Optional[str]:
    """Newest ``step_<N>`` checkpoint directory under ``root`` (or None)."""
    if not os.path.isdir(root):
        return None
    steps = []
    for name in os.listdir(root):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(root, max(steps)[1])
