"""Guard against a dead TPU relay hanging the process forever.

On the axon platform, backend registration retries a dead relay socket
indefinitely, so the FIRST jax touch never returns (observed for a full
build round after a remote-compile-server crash). Entry-point scripts call
:func:`ensure_live_backend` BEFORE importing jax: it probes ``jax.devices``
in a throwaway subprocess (nothing compiles there, so killing it cannot
wedge the remote compile queue) and re-execs the script on CPU when the
TPU is unreachable — a degraded but valid run instead of a silent hang.
"""
from __future__ import annotations

import os
import subprocess
import sys

_MARK = 'CWM_BACKEND_CHECKED'


def ensure_live_backend(script_path: str, timeout_s: int = 240) -> None:
    """Probe the configured jax backend; re-exec ``script_path`` on CPU if
    it hangs or fails. No-op when already checked or already on CPU."""
    if os.environ.get(_MARK):
        return
    os.environ[_MARK] = '1'
    # The axon relay can be active with JAX_PLATFORMS unset (the
    # sitecustomize keys off PALLAS_AXON_POOL_IPS), so only skip the probe
    # when no TPU-ish backend can possibly be reached.
    if (os.environ.get('JAX_PLATFORMS', '') in ('', 'cpu')
            and not os.environ.get('PALLAS_AXON_POOL_IPS')):
        return
    try:
        probe = subprocess.run(
            [sys.executable, '-c', 'import jax; jax.devices()'],
            capture_output=True, timeout=timeout_s)
        if probe.returncode == 0:
            return
    except subprocess.TimeoutExpired:
        pass
    print(f'{os.path.basename(script_path)}: TPU backend unreachable; '
          're-running on CPU', file=sys.stderr)
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    os.execve(sys.executable,
              [sys.executable, os.path.abspath(script_path)] + sys.argv[1:],
              env)
