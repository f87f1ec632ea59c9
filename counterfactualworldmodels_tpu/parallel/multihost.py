"""Multi-host (pod-slice) support: distributed init, hybrid meshes, and
host-local batch feeding.

The reference is single-process (SURVEY.md §2.3). Everything in
``parallel/`` already works on the global device set once JAX's
distributed runtime is up — this module adds the three pod-scale pieces:

- :func:`initialize_distributed` — bring up ``jax.distributed`` from the
  standard TPU env (auto-detected on Cloud TPU) or explicit coordinator
  args; a no-op when single-process.
- :func:`make_hybrid_mesh` — a mesh whose outer axes span hosts (slow
  DCN links) and inner axes stay within a host's chips (fast ICI), the
  standard dp-over-DCN x tp/sp-over-ICI layout. Collectives for the
  inner axes then ride ICI only.
- :func:`host_local_batch_to_global` — assemble a globally-sharded batch
  from each process's local shard without materializing the global array
  on any single host (``jax.make_array_from_process_local_data``).

Typical pod training loop:

    multihost.initialize_distributed()
    mesh = multihost.make_hybrid_mesh({'dp': jax.process_count()},
                                      {'tp': jax.local_device_count()})
    ...
    x_global = multihost.host_local_batch_to_global(mesh, P('dp'), x_local)
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Bring up the JAX distributed runtime; returns True if initialized.

    With no arguments this relies on jax.distributed's environment
    auto-detection (Cloud TPU metadata / JAX_COORDINATOR_ADDRESS etc.).
    A no-op (returns False) when nothing indicates a multi-process run —
    so CLIs can call it unconditionally.
    """
    import os
    from jax._src import distributed as _dist
    already = getattr(getattr(_dist, 'global_state', None), 'client', None)
    if already is not None:
        return True
    explicit = coordinator_address is not None
    # plain GCE TPU pods advertise multi-host only via the metadata
    # server (jax's GceTpuCluster), which this env gate cannot see —
    # set CWM_MULTIHOST=1 there (or pass coordinator args) to force the
    # jax.distributed auto-detection path
    env_hints = any(os.environ.get(k) for k in
                    ('CWM_MULTIHOST',
                     'JAX_COORDINATOR_ADDRESS', 'COORDINATOR_ADDRESS',
                     'MEGASCALE_COORDINATOR_ADDRESS',
                     'CLOUD_TPU_TASK_ID'))
    # TPU_WORKER_HOSTNAMES is only a multi-process hint when it actually
    # lists MORE THAN ONE worker: single-chip relay/bench environments set
    # it to one hostname (e.g. "localhost"), where initialize() would die
    # with "coordinator_address should be defined"
    workers = [w for w in
               os.environ.get('TPU_WORKER_HOSTNAMES', '').split(',')
               if w.strip()]
    if not explicit and not env_hints and len(workers) <= 1:
        return False
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError) as e:
        if explicit:
            raise
        # auto-detection misfired (e.g. stale env from a relay harness):
        # degrade to single-process rather than killing the CLI
        import warnings
        warnings.warn(
            f'jax.distributed.initialize() failed ({e}); continuing '
            'single-process. Pass coordinator_address explicitly for a '
            'real multi-host run.', RuntimeWarning, stacklevel=2)
        return False
    return True


def make_hybrid_mesh(dcn_axes: Dict[str, int],
                     ici_axes: Dict[str, int]) -> Mesh:
    """Mesh with ``dcn_axes`` spanning hosts and ``ici_axes`` within them.

    Uses mesh_utils.create_hybrid_device_mesh so inner-axis neighbors are
    ICI neighbors (their psums/all-gathers never cross DCN). Falls back
    to a plain mesh when single-process (CPU tests, one host) — the axis
    names and sizes are identical either way.
    """
    names = tuple(dcn_axes.keys()) + tuple(ici_axes.keys())
    dcn_shape = tuple(dcn_axes.values())
    ici_shape = tuple(ici_axes.values())
    if jax.process_count() == 1:
        return make_mesh(dict(zip(names, dcn_shape + ici_shape)))
    from jax.experimental import mesh_utils
    # per-granule shape: DCN axes are 1 inside a host, ICI axes are 1
    # across hosts. process_is_granule: the DCN axes span HOSTS (what the
    # docstring promises) — without it mesh_utils groups by slice_index
    # and a single multi-host slice raises
    mesh_shape = (1,) * len(dcn_shape) + ici_shape
    dcn_mesh_shape = dcn_shape + (1,) * len(ici_shape)
    devices = mesh_utils.create_hybrid_device_mesh(
        mesh_shape, dcn_mesh_shape, devices=jax.devices(),
        process_is_granule=True)
    return Mesh(devices, names)


def host_local_batch_to_global(mesh: Mesh, pspec: P, local_batch):
    """Assemble a global sharded array from per-process local batches.

    ``local_batch`` is this process's slice (e.g. its data-loader output);
    the result is a jax.Array sharded per ``pspec`` over ``mesh`` whose
    global shape stitches all processes' slices along the sharded axes.
    Single-process this is just a device_put with the sharding.
    """
    sharding = NamedSharding(mesh, pspec)
    if jax.process_count() == 1:
        # device arrays pass straight through (no host round-trip — the
        # train CLIs feed jitted-warp outputs here every step)
        return jax.device_put(local_batch, sharding)
    # multi-process: make_array_from_process_local_data wants host data;
    # device-array inputs pay one device->host->device round trip here.
    # Data loaders hand numpy in (free); producers that already computed
    # the local shard ON device should assemble with
    # jax.make_array_from_single_device_arrays instead.
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_batch))


def process_local_batch_size(global_batch_size: int) -> int:
    """This process's share of a batch sharded over all processes."""
    n = jax.process_count()
    assert global_batch_size % n == 0, (global_batch_size, n)
    return global_batch_size // n
