"""Benchmark the conjoined (IMU-conditioned) counterfactual workload.

The reference's flagship movability demo drives the IMU-conditioned
conjoined predictor (cwm/models/VideoMAE/conjoined_vmae.py:1230-1243,
ViT-B 4x4 main stream + IMU context) through the counterfactual loop
(cwm/models/segmentation.py:931-963). This script times that workload on
one chip through BOTH engines —

* exact:  pipelines.imu._imu_counterfactual_step (S full conjoined
  forwards per dispatch), and
* fast:   pipelines.imu._imu_counterfactual_step_fast (the conjoined
  shared-prefix engine, models/fast_conjoined.py)

— and reports sims/sec/chip for each plus the speedup. Writes
BENCH_CONJ_r{N}.json and prints one JSON line.

Env knobs: CWM_BENCH_S (default 16), CWM_BENCH_RAFT_ITERS (default 24),
CWM_BENCH_MODEL=small for an off-TPU plumbing dryrun; CWM_BENCH_MESH=N
shards the S samples over an N-chip 'samples' mesh (both engines;
per-chip sims/s — dryrun off-TPU with JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='BENCH_CONJ_r03.json')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--skip-exact', action='store_true',
                    help='only time the fast engine (the exact ViT-B S=16 '
                         'dispatch is ~5x the FLOPs)')
    args = ap.parse_args()

    from counterfactualworldmodels_tpu.utils.backend_guard import (
        ensure_live_backend)
    ensure_live_backend(__file__)
    import jax
    import jax.numpy as jnp
    from counterfactualworldmodels_tpu.utils.cache import (
        enable_persistent_cache)
    enable_persistent_cache()
    from counterfactualworldmodels_tpu.models import conjoined as conj
    from counterfactualworldmodels_tpu.models import fast_conjoined as fc
    from counterfactualworldmodels_tpu.models.raft.raft import (
        RAFT, init_raft_params)
    from counterfactualworldmodels_tpu.pipelines.imu import (
        _imu_counterfactual_step, _imu_counterfactual_step_fast)

    on_tpu = jax.default_backend() == 'tpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    attn = 'flash' if on_tpu else 'dense'
    small = os.environ.get('CWM_BENCH_MODEL') == 'small' or not on_tpu
    if small:
        from _bench_common import small_conjoined_model
        model, hw = small_conjoined_model(dtype, attn)
        cfg = 'small'
    else:
        model = conj.imu400_base_4x4patch_2frames_1tube(dtype=dtype,
                                                        attn_impl=attn)
        hw, cfg = 224, 'imu400_base_4x4 (flagship)'
    params = conj.init_conjoined_params(model, jax.random.PRNGKey(0))
    w = conj.ConjoinedPredictorWrapper(model, params=params,
                                       main_input='rgb01',
                                       context_input='imu')
    # the engine's compute dtype rides the param leaves (bf16 on TPU)
    fast_params = (params if dtype == jnp.float32
                   else fc.cast_params(params, dtype))
    raft_iters = int(os.environ.get('CWM_BENCH_RAFT_ITERS', 24))
    raft = RAFT(iters=raft_iters, dtype=dtype)
    raft_params = init_raft_params(raft, jax.random.PRNGKey(1), hw=64)

    s = int(os.environ.get('CWM_BENCH_S', 16 if on_tpu else 2))
    n_mesh = int(os.environ.get('CWM_BENCH_MESH', 0) or 0)
    mesh = None
    if n_mesh > 1:
        from counterfactualworldmodels_tpu.parallel.mesh import (
            sample_parallel_mesh)
        from counterfactualworldmodels_tpu.parallel.inference import (
            sharded_imu_counterfactuals, sharded_imu_counterfactuals_fast)
        if n_mesh > len(jax.devices()):
            raise SystemExit(
                f'CWM_BENCH_MESH={n_mesh} > {len(jax.devices())} devices')
        mesh = sample_parallel_mesh(n_mesh)
        if s % n_mesh:
            s = max(n_mesh, s - s % n_mesh)
    n = model.main.num_patches
    n0 = n // 2
    rng = np.random.RandomState(args.seed)

    from _bench_common import demo_prompts, demo_static_movie
    x = demo_static_movie(hw, rng)
    imu = jnp.asarray((rng.randn(1, 6, model.context.sequence_length)
                       * 0.1).astype(np.float32))
    mask_c = jnp.zeros((1, model.context.num_patches), bool)
    # demo mask policy shared with bench.py (scripts/_bench_common.py)
    passive, active, shifts, keys, n_vis = demo_prompts(rng, n, s)

    two_source = fc.resolve_two_source(on_tpu)
    n_vis_c = w._static_n_vis(np.asarray(mask_c), model.context)
    if model.context.concat_dummy_token:
        n_vis_c += 1

    def fast():
        if mesh is not None:
            _, flows, _ = sharded_imu_counterfactuals_fast(
                mesh, w, fast_params, raft, raft_params, x, passive,
                active, shifts, keys, imu, mask_c, n_vis, True, raft_iters,
                on_tpu, two_source)
        else:
            _, flows, _ = _imu_counterfactual_step_fast(
                w, fast_params, raft, raft_params, x, passive, active,
                shifts, keys, imu, mask_c, n_vis, True, raft_iters, on_tpu,
                two_source)
        return jnp.sum(jnp.abs(flows).astype(jnp.float32))

    def exact():
        # bench prompts are flagship-shaped (one scene, fix_passive,
        # frame 0 fully visible) -> shared frame-0 RAFT passes are valid
        if mesh is not None:
            _, flows, _ = sharded_imu_counterfactuals(
                mesh, w, params, raft, raft_params, x, passive, active,
                shifts, keys, jnp.repeat(imu, s, 0),
                jnp.repeat(mask_c, s, 0), n_vis, n_vis_c, True, raft_iters,
                True, shared0_ok=True)
        else:
            _, flows, _ = _imu_counterfactual_step(
                w, params, raft, raft_params, x, passive, active, shifts,
                keys, jnp.repeat(imu, s, 0), jnp.repeat(mask_c, s, 0),
                n_vis, n_vis_c, True, raft_iters, True, True)
        return jnp.sum(jnp.abs(flows).astype(jnp.float32))

    n_chips = n_mesh if mesh is not None else 1

    def rate(fn):
        float(fn())  # compile + warm (sync via scalar fetch — axon-safe)
        iters = 6 if on_tpu else 1
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            acc = jnp.float32(0)
            for _ in range(iters):
                acc = acc + fn()
            float(acc)
            best = min(best, (time.perf_counter() - t0) / iters)
        return s / best / n_chips

    # degrade chain + incremental artifact writes: the unattended driver
    # must get a JSON artifact with whatever was measured, even if a later
    # section (the ~5x-FLOPs exact dispatch, the stage timers) fails
    import traceback

    rec = {
        'metric': 'conjoined (IMU-conditioned) counterfactual sims/sec/chip',
        'unit': 'sims/sec/chip',
        'config': {'model': cfg, 's': s, 'hw': hw, 'raft_iters': raft_iters,
                   'two_source': two_source,
                   'backend': jax.default_backend(),
                   'mesh': n_mesh if mesh is not None else 1},
    }

    def persist():
        with open(args.out, 'w') as f:
            json.dump(rec, f, indent=1)

    engine_label = 'conjoined shared-prefix'
    try:
        fast_rate = rate(fast)
    except Exception:
        traceback.print_exc()
        print('fast (two-source) failed; degrading to the concat kernel',
              file=sys.stderr)
        jax.clear_caches()
        two_source = False
        rec['config']['two_source'] = False
        try:
            fast_rate = rate(fast)
            engine_label += '/no-two-source'
        except Exception as e:
            traceback.print_exc()
            fast_rate = None
            rec['fast_error'] = f'{type(e).__name__}: {e}'[:300]
            engine_label = 'unavailable'
            jax.clear_caches()
    rec['value'] = None if fast_rate is None else round(fast_rate, 3)
    rec['config']['engine'] = engine_label
    persist()

    exact_rate = None
    if not args.skip_exact:
        try:
            exact_rate = rate(exact)
        except Exception as e:
            traceback.print_exc()
            rec['exact_error'] = f'{type(e).__name__}: {e}'[:300]
            jax.clear_caches()
    rec['exact_sims_per_sec'] = (None if exact_rate is None
                                 else round(exact_rate, 3))
    rec['speedup_vs_exact'] = (
        None if exact_rate is None or fast_rate is None
        else round(fast_rate / exact_rate, 2))
    persist()

    # per-stage breakdown (separate dispatches; small overhead each)
    stages = {}
    if on_tpu and fast_rate is not None:
        import jax.numpy as _jnp
        from counterfactualworldmodels_tpu.models.raft.raft import (
            apply_raft_shared0)
        from counterfactualworldmodels_tpu.ops.normalization import (
            imagenet_normalize)
        xm = imagenet_normalize(
            _jnp.broadcast_to(x, (s,) + x.shape[1:]), temporal_dim=1)
        x_m = _jnp.swapaxes(xm, 1, 2)
        vis1 = _jnp.asarray(np.stack([
            rng.choice(n0, 33, replace=False) for _ in range(s)]), np.int32)
        yv = _jnp.asarray(rng.rand(s, 2, 3, hw, hw).astype(np.float32))

        def t_of(fn, iters=6):
            leaves = jax.tree_util.tree_leaves(fn())
            float(_jnp.sum(_jnp.abs(leaves[0]).astype(_jnp.float32)))
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                accs = [fn() for _ in range(iters)]
                float(sum(_jnp.sum(_jnp.abs(
                    jax.tree_util.tree_leaves(a)[0]).astype(_jnp.float32))
                    for a in accs))
                best = min(best, (time.perf_counter() - t0) / iters)
            return round(best * 1e3, 2)

        try:
            cache = fc.encode_conjoined_prefix(model, fast_params,
                                               x_m[0:1, :, 0], imu, True)
            stages['prefix_ms'] = t_of(lambda: fc.encode_conjoined_prefix(
                model, fast_params, x_m[0:1, :, 0], imu, True))
            stages['suffix_ms'] = t_of(lambda: fc.predict_frame1_conjoined(
                model, fast_params, cache, x_m[:, :, 1], vis1, True,
                two_source))
            stages['raft_ms'] = t_of(lambda: apply_raft_shared0(
                raft, raft_params, yv, raft_iters, True))
        except Exception as e:
            traceback.print_exc()
            stages['error'] = f'{type(e).__name__}: {e}'[:300]
    rec['stages'] = stages
    persist()
    print(json.dumps(rec))


if __name__ == '__main__':
    main()
