"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests use xla_force_host_platform_device_count, per the
strategy in SURVEY.md §4. Must run before jax initializes its backend.
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')
