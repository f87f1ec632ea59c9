"""Checkpoint save / load / resume (orbax).

The reference only *loads* torch state dicts (SURVEY.md §5: prediction.py:
94-99, raft_model.py:78-90; no saving, no resume). This module adds the
framework-native side: orbax checkpoints of parameter pytrees and full
TrainStates, plus the torch converters in utils/torch_convert.py for
importing the released reference checkpoints.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_params(path: str, params: Any) -> None:
    """Save a parameter pytree (atomic; overwrites)."""
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    params = jax.device_get(params)
    ckpt.save(path, params, force=True)


def load_params(path: str) -> Any:
    """Load a parameter pytree saved by :func:`save_params`."""
    return _checkpointer().restore(os.path.abspath(path))


def save_train_state(path: str, state) -> None:
    """Save a training.TrainState (step, params, opt_state)."""
    save_params(path, {'step': np.asarray(state.step),
                       'params': jax.device_get(state.params),
                       'opt_state': jax.device_get(state.opt_state)})


def restore_train_state(path: str, template):
    """Restore a TrainState; ``template`` supplies the structure (e.g. a
    freshly initialized state) so optimizer pytrees rebuild correctly.
    Only the template's STRUCTURE is used: leaves are passed as
    shape/dtype stubs, not device_get copies — materializing host copies
    of params + both Adam moments just to describe the tree would double
    peak host memory at resume."""
    def as_stub(a):
        a = np.asarray(a) if np.isscalar(a) else a
        return jax.ShapeDtypeStruct(np.shape(a), np.result_type(a))

    restored = _checkpointer().restore(
        os.path.abspath(path),
        item=jax.tree_util.tree_map(
            as_stub, {'step': np.asarray(template.step),
                      'params': template.params,
                      'opt_state': template.opt_state}))
    from ..training.train import TrainState
    return TrainState(restored['step'], restored['params'],
                      jax.tree_util.tree_map(
                          lambda t, r: r, template.opt_state,
                          restored['opt_state']))


class CheckpointManager:
    """Rolling checkpoint directory with step-indexed saves and resume."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.max_to_keep = max_to_keep
        os.makedirs(self.directory, exist_ok=True)

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f'step_{step:09d}')

    def all_steps(self):
        steps = []
        for name in os.listdir(self.directory):
            if not name.startswith('step_'):
                continue
            try:
                steps.append(int(name.split('_')[1]))
            except ValueError:
                # e.g. an interrupted save's orbax temp dir
                # (step_000000123.orbax-checkpoint-tmp-<ts>): not a
                # restorable step; must not break resume/save forever
                continue
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def save(self, step: int, state) -> None:
        save_train_state(self._step_dir(step), state)
        steps = self.all_steps()
        import shutil
        # steps[:-0] would be the FULL list reversed into keep-everything;
        # keep at least the checkpoint just written
        drop = steps[:-self.max_to_keep] if self.max_to_keep > 0 else \
            steps[:-1]
        for old in drop:
            shutil.rmtree(self._step_dir(old), ignore_errors=True)

    def restore_latest(self, template):
        step = self.latest_step()
        if step is None:
            return None
        return restore_train_state(self._step_dir(step), template)
