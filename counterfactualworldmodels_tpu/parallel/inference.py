"""Multi-chip counterfactual inference: shard the sample axis.

The counterfactual workload is embarrassingly parallel over the S sampled
(mask, shift) variants (SURVEY.md §2.3). Each wrapper here runs the fused
pipeline INSIDE shard_map over a 1-D 'samples' mesh axis: every chip
executes its own slice of samples with local shapes, so the Pallas kernels
(flash attention, RAFT lookup) run per-chip on local shards — GSPMD cannot
partition a custom call, so relying on sharding propagation would silently
all-gather the operands and replicate the dominant compute on every chip.
Scene-level inputs (params, the shared frame 0, the IMU context) are
replicated: each chip computes the prefix locally, zero cross-chip
traffic; the only collective is the all-gather XLA inserts when the caller
reduces over samples (mean motion map / covariance).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import fast_vmae
from ..pipelines.segmentation import (counterfactual_videos_and_flows,
                                      counterfactual_videos_and_flows_fast)
from .pipeline import _shard_map, _SHARD_MAP_KW

# every wrapper returns (videos, flows, masks) with samples leading
_OUT3 = (P('samples'), P('samples'), P('samples'))


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
    pipelines.segmentation.counterfactual_videos_and_flows with B=1:
    passive / active [1, N, S], shifts/keys [1, S, ...] shard their S axis
    over the mesh ('samples'); x and parameters replicate. S must be
    divisible by the mesh size.
    """
    assert x.shape[0] == 1, 'sample sharding assumes B=1'

    def local(vp, rp, xl, p, a, sh, k):
        return counterfactual_videos_and_flows(
            vmae_model, vp, raft_model, rp, xl, p, a, sh, k, n_vis,
            normalize, raft_iters, fix_passive)

    f = _shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), P(), P(None, None, 'samples'),
                             P(None, None, 'samples'), P(None, 'samples'),
                             P(None, 'samples')),
                   out_specs=_OUT3, **_SHARD_MAP_KW)
    return f(vmae_params, raft_params, x, passive, active, shifts, keys)


def sharded_counterfactuals_fast(mesh: Mesh, vmae_model, fast_params,
                                 raft_model, raft_params, x, passive, active,
                                 shifts, keys, n_vis: int, normalize: bool,
                                 raft_iters: int, use_flash: bool = False,
                                 two_source: bool = False,
                                 prefix_cache=None,
                                 prefix_pool: int = 1,
                                 suffix_pool: int = 1,
                                 gelu: str = 'erf'):
    """Sample-sharded shared-prefix engine (models/fast_vmae.py).

    The frame-0 prefix pass is sample-independent: its inputs (x, params)
    replicate, so each chip computes the prefix once locally (or reuses
    the replicated ``prefix_cache`` — the warm-serving path — skipping it
    entirely); the per-sample suffix work (motion-prompt construction,
    frame-1 encode/decode, RAFT probes) runs on each chip's local sample
    slice. Same signature/returns as
    pipelines.segmentation.counterfactual_videos_and_flows_fast; S must be
    divisible by the mesh size.
    """
    n0 = vmae_model.num_patches_per_frame
    n_sfx_pad = fast_vmae.sfx_bucket(n_vis - n0, vmae_model.num_patches - n0)

    def local(fp, rp, xl, p, a, sh, k, *cache):
        return counterfactual_videos_and_flows_fast(
            vmae_model, fp, raft_model, rp, xl, p, a, sh, k, n_sfx_pad,
            normalize, raft_iters, True, use_flash, two_source,
            prefix_cache=cache[0] if cache else None,
            prefix_pool=prefix_pool, suffix_pool=suffix_pool, gelu=gelu,
            n_vis=n_vis)

    in_specs = [P(), P(), P(), P(None, None, 'samples'),
                P(None, None, 'samples'), P(None, 'samples'),
                P(None, 'samples')]
    args = [fast_params, raft_params, x, passive, active, shifts, keys]
    if prefix_cache is not None:
        in_specs.append(P())
        args.append(prefix_cache)
    f = _shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                   out_specs=_OUT3, **_SHARD_MAP_KW)
    return f(*args)


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

    n0 = vmae_model.num_patches_per_frame
    n_sfx_pad = fast_vmae.sfx_bucket(n_vis - n0, vmae_model.num_patches - n0)

    def local(fp, rp, xl, p, a, sh, k, cache):
        return counterfactual_videos_and_flows_fast_multi(
            vmae_model, fp, raft_model, rp, xl, p, a, sh, n_sfx_pad,
            normalize, raft_iters, True, use_flash, two_source, k, cache,
            n_vis=n_vis)

    f = _shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), P('samples'), P('samples'),
                             P('samples'), P('samples'), P('samples'),
                             P(None, 'samples')),
                   out_specs=_OUT3, **_SHARD_MAP_KW)
    return f(fast_params, raft_params, x, passive, active, shifts, keys,
             prefix_cache)


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
    IMU context, and the prefix cache replicate (each chip computes or
    holds the scene-level prefix locally — zero cross-chip traffic); the
    per-sample suffix work, including the exact per-sample context streams,
    runs on each chip's local sample slice. Same signature/returns as
    pipelines.imu._imu_counterfactual_step_fast; S must be divisible by the
    mesh size.
    """
    from ..pipelines.imu import _imu_counterfactual_step_fast

    def local(pp, rp, xl, p, a, sh, k, xc, mc, *cache):
        return _imu_counterfactual_step_fast(
            wrapper, pp, raft_model, rp, xl, p, a, sh, k, xc, mc, n_vis,
            normalize, raft_iters, use_flash, two_source,
            cache[0] if cache else None)

    in_specs = [P(), P(), P(), P(None, None, 'samples'),
                P(None, None, 'samples'), P(None, 'samples'),
                P(None, 'samples'), P(), P()]
    args = [params, raft_params, x, passive, active, shifts, keys,
            x_context, mask_context]
    if prefix_cache is not None:
        in_specs.append(P())
        args.append(prefix_cache)
    f = _shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                   out_specs=_OUT3, **_SHARD_MAP_KW)
    return f(*args)


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

    def local(pp, rp, xl, p, a, sh, k, xc, mc):
        return _imu_counterfactual_step(
            wrapper, pp, raft_model, rp, xl, p, a, sh, k, xc, mc, n_vis,
            n_vis_c, normalize, raft_iters, fix_passive, shared0_ok)

    f = _shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), P(), P(None, None, 'samples'),
                             P(None, None, 'samples'), P(None, 'samples'),
                             P(None, 'samples'), P('samples'),
                             P('samples')),
                   out_specs=_OUT3, **_SHARD_MAP_KW)
    return f(params, raft_params, x, passive, active, shifts, keys,
             x_context, mask_context)
