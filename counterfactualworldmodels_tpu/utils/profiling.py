"""Tracing & profiling utilities.

The reference has no profiling story beyond ad-hoc time.time() deltas
(SURVEY.md §5). This module provides: XLA profiler traces viewable in
TensorBoard/Perfetto, per-stage wall-clock timers that force device
completion (the axon TPU platform's block_until_ready does not actually
block, so timers sync via a scalar fetch), and a simple metrics logger.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def device_sync(x=None) -> None:
    """Force completion of pending device work (axon-safe).

    Syncs by FETCHING a scalar to host: the fetch blocks on every
    backend, and on a single stream-ordered device queue its completion
    implies all previously-enqueued work finished. With ``x`` given,
    every leaf is folded into the fetched scalar (fetching only the
    first leaf would not wait for sibling dispatches). The no-argument
    form enqueues a fresh trivial op and fetches it — on the axon
    platform block_until_ready does NOT block, so a fetch is the only
    reliable barrier."""
    if x is not None:
        leaves = jax.tree_util.tree_leaves(x)
        if leaves:
            acc = 0.0
            for leaf in leaves:
                acc = acc + jnp.sum(jnp.abs(jnp.asarray(
                    leaf).astype(jnp.float32)))
            float(acc)
            return
    float(jax.device_get(jnp.zeros(()) + 0.0))


@contextlib.contextmanager
def trace(log_dir: str = '/tmp/cwm_tpu_trace'):
    """XLA profiler trace: view with TensorBoard or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTraceWindow:
    """XLA-trace a window of training steps (the train CLIs'
    ``--profile-dir``): starts after ``warm_steps`` post-resume steps
    (past compilation) and stops ``num_steps`` later. ``tick(step)``
    once per loop iteration; no-op when log_dir is falsy."""

    def __init__(self, log_dir: Optional[str], first_step: int,
                 warm_steps: int = 3, num_steps: int = 3):
        self.log_dir = log_dir
        self.start_at = first_step + warm_steps
        self.stop_at = self.start_at + num_steps
        self._active = False

    def tick(self, step: int) -> None:
        if not self.log_dir:
            return
        if not self._active and step == self.start_at:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif self._active and step >= self.stop_at:
            jax.profiler.stop_trace()
            self._active = False
            print(f'profile trace written to {self.log_dir}', flush=True)

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class StageTimer:
    """Accumulating per-stage wall-clock timer with device sync."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        # sync at ENTRY too, or work enqueued before the stage is billed
        # to it (the stream drains inside this stage's window)
        device_sync()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            device_sync(sync_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {'total_s': round(self.totals[k], 4),
                    'count': self.counts[k],
                    'mean_s': round(self.totals[k] / max(self.counts[k], 1), 4)}
                for k in self.totals}

    def report(self) -> str:
        lines = ['%-32s %8s %10s %10s' % ('stage', 'count', 'total(s)',
                                          'mean(s)')]
        for k, v in sorted(self.summary().items(),
                           key=lambda kv: -kv[1]['total_s']):
            lines.append('%-32s %8d %10.3f %10.4f'
                         % (k, v['count'], v['total_s'], v['mean_s']))
        return '\n'.join(lines)


class MetricsLogger:
    """Append-only JSONL metrics log (step, wall time, values)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.history = []

    def log(self, step: int, **metrics):
        rec = {'step': int(step), 'time': time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        self.history.append(rec)
        if self.path:
            with open(self.path, 'a') as f:
                f.write(json.dumps(rec) + '\n')
        return rec
