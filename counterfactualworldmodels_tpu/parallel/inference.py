"""Multi-chip counterfactual inference: shard the sample axis.

The counterfactual workload is embarrassingly parallel over the S sampled
(mask, shift) variants (SURVEY.md §2.3). Here the flattened B*S batch of the
fused pipeline (pipelines/segmentation.py) is sharded over a 1-D device
mesh: each chip runs its slice of samples; the only cross-chip traffic is
the all-gather XLA inserts when the caller reduces over samples (mean motion
map / covariance).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipelines.segmentation import (counterfactual_videos_and_flows,
                                      counterfactual_videos_and_flows_fast)


def shard_counterfactual_batch(mesh: Mesh, *arrays, axis: int = 0,
                               axis_name: str = 'samples'):
    """device_put arrays with the given axis sharded over the mesh."""
    out = []
    for a in arrays:
        spec = [None] * a.ndim
        spec[axis] = axis_name
        out.append(jax.device_put(a, NamedSharding(mesh, P(*spec))))
    return tuple(out)


def sharded_counterfactuals(mesh: Mesh, vmae_model, vmae_params, raft_model,
                            raft_params, x, passive, active, shifts, keys,
                            n_vis: int, normalize: bool, raft_iters: int,
                            fix_passive: bool = True):
    """Run the fused counterfactual step with samples sharded across chips.

    Same signature/semantics as
    pipelines.segmentation.counterfactual_videos_and_flows, but passive /
    active [B, N, S], shifts/keys [B, S, ...] are placed with S sharded over
    the mesh ('samples' axis) and parameters replicated. S must be divisible
    by the mesh size.
    """
    repl = NamedSharding(mesh, P())
    vmae_params = jax.device_put(vmae_params, repl)
    raft_params = jax.device_put(raft_params, repl)
    x = jax.device_put(x, repl)
    passive, active = shard_counterfactual_batch(mesh, passive, active,
                                                 axis=2)
    shifts, keys = shard_counterfactual_batch(mesh, shifts, keys, axis=1)
    return counterfactual_videos_and_flows(
        vmae_model, vmae_params, raft_model, raft_params, x, passive, active,
        shifts, keys, n_vis, normalize, raft_iters, fix_passive)


def sharded_counterfactuals_fast(mesh: Mesh, vmae_model, fast_params,
                                 raft_model, raft_params, x, passive, active,
                                 shifts, keys, n_vis: int, normalize: bool,
                                 raft_iters: int, use_flash: bool = False,
                                 two_source: bool = False):
    """Sample-sharded shared-prefix engine (models/fast_vmae.py).

    The frame-0 prefix pass is sample-independent: its inputs (x, params)
    are replicated, so GSPMD keeps the whole prefix encoder/decoder
    replicated — each chip computes it once locally, zero cross-chip
    traffic. The per-sample suffix work (motion-prompt construction, frame-1
    encode/decode, RAFT probes) shards over the 'samples' mesh axis because
    its operands carry the sharded S axis. Same signature/returns as
    pipelines.segmentation.counterfactual_videos_and_flows_fast; S must be
    divisible by the mesh size.
    """
    repl = NamedSharding(mesh, P())
    fast_params = jax.device_put(fast_params, repl)
    raft_params = jax.device_put(raft_params, repl)
    x = jax.device_put(x, repl)
    passive, active = shard_counterfactual_batch(mesh, passive, active,
                                                 axis=2)
    shifts, keys = shard_counterfactual_batch(mesh, shifts, keys, axis=1)
    return counterfactual_videos_and_flows_fast(
        vmae_model, fast_params, raft_model, raft_params, x, passive,
        active, shifts, keys, n_vis, normalize, raft_iters, True, use_flash,
        two_source)


def sharded_counterfactuals_fast_multi(mesh: Mesh, vmae_model, fast_params,
                                       raft_model, raft_params, x, passive,
                                       active, shifts, keys, n_vis: int,
                                       normalize: bool, raft_iters: int,
                                       use_flash: bool = False,
                                       two_source: bool = False,
                                       prefix_cache=None):
    """Sample-sharded MULTI-SCENE shared-prefix engine
    (segmentation.counterfactual_videos_and_flows_fast_multi): every
    per-sample operand INCLUDING the stacked prefix cache shards over the
    'samples' axis, so each chip holds only its own scenes' prefix KV
    (the stacked-cache HBM cost divides by the mesh) and runs its slice
    of the suffix + RAFT work — pod-scale serving of concurrent prompts
    on different images. x [S, T, C, H, W]; passive/active [S, N];
    shifts [S, 2]; keys [S]; prefix_cache a REQUIRED stacked cache
    (fast_vmae.stack_prefix_caches, leaf batch axis 1). S must be
    divisible by the mesh size.
    """
    if prefix_cache is None:
        # without the stacked cache the core would silently encode sample
        # 0's frame 0 once and apply scene 0's prefix to every scene
        raise ValueError(
            'sharded_counterfactuals_fast_multi requires the stacked '
            'prefix_cache (fast_vmae.stack_prefix_caches over the S '
            "scenes' caches); for a single shared scene use "
            'sharded_counterfactuals_fast')
    from ..pipelines.segmentation import (
        counterfactual_videos_and_flows_fast_multi)

    repl = NamedSharding(mesh, P())
    fast_params = jax.device_put(fast_params, repl)
    raft_params = jax.device_put(raft_params, repl)
    x, passive, active, shifts, keys = shard_counterfactual_batch(
        mesh, x, passive, active, shifts, keys, axis=0)
    cache = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(
            mesh, P(*([None, 'samples'] + [None] * (a.ndim - 2))))),
        prefix_cache)
    return counterfactual_videos_and_flows_fast_multi(
        vmae_model, fast_params, raft_model, raft_params, x, passive,
        active, shifts, n_vis, normalize, raft_iters, True, use_flash,
        two_source, keys, cache)


def sharded_imu_counterfactuals_fast(mesh: Mesh, wrapper, params, raft_model,
                                     raft_params, x, passive, active, shifts,
                                     keys, x_context, mask_context,
                                     n_vis: int, normalize: bool,
                                     raft_iters: int, use_flash: bool = False,
                                     two_source: bool = False,
                                     prefix_cache=None):
    """Sample-sharded conjoined (IMU-conditioned) shared-prefix engine
    (models/fast_conjoined.py).

    Same replication logic as sharded_counterfactuals_fast: the scene, the
    IMU context, and the prefix cache are replicated (each chip computes or
    holds the scene-level prefix locally — zero cross-chip traffic); the
    per-sample suffix work, including the exact per-sample context streams,
    shards over the 'samples' axis. Same signature/returns as
    pipelines.imu._imu_counterfactual_step_fast; S must be divisible by the
    mesh size.
    """
    from ..pipelines.imu import _imu_counterfactual_step_fast

    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, repl)
    raft_params = jax.device_put(raft_params, repl)
    x = jax.device_put(x, repl)
    x_context = jax.device_put(x_context, repl)
    mask_context = jax.device_put(mask_context, repl)
    if prefix_cache is not None:
        prefix_cache = jax.device_put(prefix_cache, repl)
    passive, active = shard_counterfactual_batch(mesh, passive, active,
                                                 axis=2)
    shifts, keys = shard_counterfactual_batch(mesh, shifts, keys, axis=1)
    return _imu_counterfactual_step_fast(
        wrapper, params, raft_model, raft_params, x, passive, active,
        shifts, keys, x_context, mask_context, n_vis, normalize, raft_iters,
        use_flash, two_source, prefix_cache)


def sharded_imu_counterfactuals(mesh: Mesh, wrapper, params, raft_model,
                                raft_params, x, passive, active, shifts,
                                keys, x_context, mask_context, n_vis: int,
                                n_vis_c: int, normalize: bool,
                                raft_iters: int, fix_passive: bool = True,
                                shared0_ok: bool = False):
    """Sample-sharded EXACT conjoined (IMU-conditioned) counterfactual
    step — S full conjoined forwards distributed over the 'samples' mesh
    axis (the fallback/reference-numerics companion of
    sharded_imu_counterfactuals_fast).

    Same signature/returns as pipelines.imu._imu_counterfactual_step with
    B=1: x_context/mask_context are the PER-SAMPLE tiled [S, ...] streams
    (sharded over the mesh alongside the prompts); the scene and all
    parameters replicate. S must be divisible by the mesh size.
    """
    from ..pipelines.imu import _imu_counterfactual_step

    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, repl)
    raft_params = jax.device_put(raft_params, repl)
    x = jax.device_put(x, repl)
    passive, active = shard_counterfactual_batch(mesh, passive, active,
                                                 axis=2)
    shifts, keys = shard_counterfactual_batch(mesh, shifts, keys, axis=1)
    x_context, mask_context = shard_counterfactual_batch(
        mesh, x_context, mask_context, axis=0)
    return _imu_counterfactual_step(
        wrapper, params, raft_model, raft_params, x, passive, active,
        shifts, keys, x_context, mask_context, n_vis, n_vis_c, normalize,
        raft_iters, fix_passive, shared0_ok)
