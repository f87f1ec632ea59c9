"""Test configuration: run everything on a virtual 8-device CPU mesh.

The ambient environment preloads jax with the axon TPU backend via
sitecustomize (PYTHONPATH=/root/.axon_site), so env vars alone can't switch
platforms — use jax.config.update before any backend is touched. CPU gives
exact f32 matmuls (TPU defaults to bf16 passes), which the golden parity
tests rely on. Multi-chip sharding tests use the 8 virtual CPU devices,
per SURVEY.md §4.
"""
import os

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                           ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

if os.environ.get('CWM_TEST_TPU') == '1':
    # hardware pass (VERDICT r03 #5): run the kernel-parity subset on the
    # real chip — `CWM_TEST_TPU=1 pytest tests/test_flash_attention.py ...`.
    # f32 golden tolerances rely on exact matmuls; on the MXU that means
    # forcing the 3-pass bf16 (highest) precision for f32 dots.
    jax.config.update('jax_default_matmul_precision', 'highest')
else:
    jax.config.update('jax_platforms', 'cpu')

# persistent compile cache: the suite is compile-bound (dozens of multi-device
# CPU programs); reruns after the first are several times faster
from counterfactualworldmodels_tpu.utils.cache import (  # noqa: E402
    enable_persistent_cache)

enable_persistent_cache(os.environ.get('CWM_TEST_CACHE_DIR',
                                       '/root/.cache/cwm_tpu_xla_tests'),
                        min_compile_secs=0.5)
