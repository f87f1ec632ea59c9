"""Multi-host layer (parallel/multihost.py): single-process behavior.

Real pod-slice behavior needs multiple processes; these tests pin the
single-process degenerate semantics every CLI relies on (no-op init,
hybrid-mesh fallback, put == device_put) so the multi-host path composes
with everything tested on the virtual 8-device mesh.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from counterfactualworldmodels_tpu import parallel


def test_initialize_distributed_noop(monkeypatch):
    for k in ('JAX_COORDINATOR_ADDRESS', 'COORDINATOR_ADDRESS',
              'MEGASCALE_COORDINATOR_ADDRESS', 'TPU_WORKER_HOSTNAMES',
              'CLOUD_TPU_TASK_ID'):
        monkeypatch.delenv(k, raising=False)
    assert parallel.initialize_distributed() is False
    assert jax.process_count() == 1


def test_initialize_distributed_single_worker_hostname(monkeypatch):
    """A single-entry TPU_WORKER_HOSTNAMES (the bench relay env sets
    'localhost') is NOT a multi-process hint — init must no-op instead of
    raising 'coordinator_address should be defined' (VERDICT r03 #2)."""
    for k in ('JAX_COORDINATOR_ADDRESS', 'COORDINATOR_ADDRESS',
              'MEGASCALE_COORDINATOR_ADDRESS', 'CLOUD_TPU_TASK_ID',
              'CWM_MULTIHOST'):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv('TPU_WORKER_HOSTNAMES', 'localhost')
    assert parallel.initialize_distributed() is False
    monkeypatch.setenv('TPU_WORKER_HOSTNAMES', 'localhost,')
    assert parallel.initialize_distributed() is False
    assert jax.process_count() == 1


def test_make_hybrid_mesh_single_process_fallback():
    mesh = parallel.make_hybrid_mesh({'dp': 2}, {'tp': 4})
    assert mesh.axis_names == ('dp', 'tp')
    assert mesh.devices.shape == (2, 4)


def test_host_local_batch_to_global_matches_device_put():
    mesh = parallel.make_mesh({'dp': 4})
    x = np.arange(4 * 3, dtype=np.float32).reshape(4, 3)
    a = parallel.host_local_batch_to_global(mesh, P('dp'), x)
    b = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P('dp')))
    assert a.sharding == b.sharding
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and it feeds a jitted reduction over the mesh
    total = jax.jit(lambda v: v.sum())(a)
    assert float(total) == float(x.sum())


def test_process_local_batch_size():
    assert parallel.process_local_batch_size(32) == 32  # 1 process