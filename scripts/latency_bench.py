#!/usr/bin/env python
"""p50 / p99 single-prediction latency (the BASELINE.md north-star metric).

Times one factual prediction (ViT-L 4x4 @ 224px masked forward + scatter,
batch 1) end to end from the host, including dispatch. Prints one JSON line
with p50/p90/p99 over --iters timed calls.

Usage: python scripts/latency_bench.py [--iters 50] [--model large|base]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=50)
    ap.add_argument('--model', default='large', choices=['large', 'base'])
    ap.add_argument('--imu', action='store_true',
                    help='also time the IMU-conditioned warm-prefix click '
                         'path off-TPU (small config; on TPU it always '
                         'runs at the imu400 flagship config)')
    args = ap.parse_args()

    from counterfactualworldmodels_tpu.utils.backend_guard import (
        ensure_live_backend)
    ensure_live_backend(__file__)
    import numpy as np
    import jax
    import jax.numpy as jnp
    from counterfactualworldmodels_tpu.utils.cache import (
        enable_persistent_cache)
    enable_persistent_cache()
    from counterfactualworldmodels_tpu.models import vmae
    from counterfactualworldmodels_tpu.pipelines.prediction import (
        predict_video)

    on_tpu = jax.default_backend() == 'tpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    factory = (vmae.large_4x4patch_2frames_1tube if args.model == 'large'
               else vmae.base_8x8patch_2frames_1tube)
    model = factory(dtype=dtype, attn_impl='flash' if on_tpu else 'dense')
    params = vmae.init_params(model, jax.random.PRNGKey(0))

    n = model.num_patches
    npf = n // 2
    mask = np.ones((1, n), dtype=bool)
    mask[0, :npf] = False
    mask[0, npf:npf + 32] = False
    mask = jnp.asarray(mask)
    n_vis = npf + 32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 2, 3, 224, 224).astype(np.float32))

    # ONE dispatch + one scalar fetch per iteration: the |y|-sum rides
    # inside the jitted program. Eager jnp.abs/astype/sum after the core
    # call would add 3 host round-trips per iteration — on the axon relay
    # each is a network hop with its own jitter, which inflated the r04
    # warm-prefix p99 (113.7 ms vs p50 64.9; VERDICT r04 weak #6). The
    # production click path fetches the predicted array once, so the
    # fused-reduction program is the honest proxy.
    @jax.jit
    def _cold_core(params_, x_, mask_):
        y = predict_video(model, params_, x_, mask_, n_vis, True, 1)
        return jnp.sum(jnp.abs(y).astype(jnp.float32))

    def run():
        # axon's block_until_ready does not block; sync via scalar fetch
        return float(_cold_core(params, x, mask))

    def timed(fn):
        fn(); fn()  # compile + warm
        lats = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fn()
            lats.append((time.perf_counter() - t0) * 1e3)
        raw = [round(v, 2) for v in lats]   # chronological, for tail diag
        lats.sort()

        def pct(p):
            return round(
                lats[min(len(lats) - 1, int(p / 100 * len(lats)))], 2)
        return {'p50_ms': pct(50), 'p90_ms': pct(90), 'p99_ms': pct(99),
                'lats_ms': raw}

    rec = {
        'metric': f'single-prediction latency (ViT-{args.model[0].upper()}, '
                  '224px, batch 1)',
        'iters': args.iters, 'unit': 'ms',
    }
    rec.update(timed(run))

    # the sections below (warm-prefix click path, IMU click path) exercise
    # the fast-engine kernels; a failure there must not discard the
    # already-measured headline — record the error and keep going
    import traceback

    def optional(section, fn):
        try:
            fn()
        except Exception as e:
            traceback.print_exc()
            rec[section] = {'error': f'{type(e).__name__}: {e}'[:300]}

    # interactive click-to-prediction latency with a warm per-image prefix
    # (the interface event-loop workload: PrefixLru hit -> only the S=1
    # frame-1 suffix pass runs)
    from counterfactualworldmodels_tpu.models.fast_vmae import (
        encode_prefix, predict_frame1_from_prefix, resolve_two_source,
        stack_vmae_params)
    from counterfactualworldmodels_tpu.ops.normalization import (
        imagenet_normalize)
    two_source = resolve_two_source(on_tpu)

    def warm_prefix_section():
        fp = stack_vmae_params(model, params)
        xm = imagenet_normalize(x, temporal_dim=1)
        cache = encode_prefix(model, fp, on_tpu, xm[0:1, 0])
        vis1 = jnp.asarray(rng.choice(npf, 33, replace=False)[None],
                           jnp.int32)

        @jax.jit
        def _warm_core(fp_, cache_, x1_, vis1_):
            y1 = predict_frame1_from_prefix(model, fp_, on_tpu, cache_,
                                            x1_, vis1_,
                                            two_source=two_source)
            return jnp.sum(jnp.abs(y1).astype(jnp.float32))

        x1 = xm[:, 1]

        def run_warm():
            return float(_warm_core(fp, cache, x1, vis1))

        rec['warm_prefix'] = timed(run_warm)
        rec['warm_prefix']['note'] = ('S=1 suffix pass against a cached '
                                      'frame-0 prefix (PrefixLru hit); '
                                      'fused |y|-sum, single dispatch per '
                                      'iteration')

    optional('warm_prefix', warm_prefix_section)

    # IMU-conditioned click path (the flagship movability interface):
    # warm ConjoinedPrefixLru hit -> S=1 conjoined suffix. TPU-only by
    # default (the flagship conjoined model is too slow to time on the
    # 1-core CPU box); --imu forces it with a small config off-TPU.
    def warm_prefix_imu_section():
        from counterfactualworldmodels_tpu.models import conjoined as conj
        from counterfactualworldmodels_tpu.models import fast_conjoined as fc
        if on_tpu:
            cmodel = conj.imu400_base_4x4patch_2frames_1tube(
                dtype=dtype, attn_impl='flash')
            chw = 224
        else:
            # small config shared with bench_conjoined.py
            from _bench_common import small_conjoined_model
            cmodel, chw = small_conjoined_model(dtype, 'dense')
        cparams = conj.init_conjoined_params(cmodel, jax.random.PRNGKey(2))
        cfp = (cparams if dtype == jnp.float32
               else fc.cast_params(cparams, dtype))
        cn0 = cmodel.main.num_patches // 2
        cx = jnp.asarray(rng.rand(1, 2, 3, chw, chw).astype(np.float32))
        cimu = jnp.asarray((rng.randn(1, 6, cmodel.context.sequence_length)
                            * 0.1).astype(np.float32))
        cxm = jnp.swapaxes(imagenet_normalize(cx, temporal_dim=1), 1, 2)
        ccache = fc.encode_conjoined_prefix(cmodel, cfp, cxm[0:1, :, 0],
                                            cimu, on_tpu)
        cvis1 = jnp.asarray(rng.choice(cn0, 33, replace=False)[None],
                            jnp.int32)

        # the interactive path runs this inside a jitted core
        # (imu.py -> predict_videos_conjoined_prefix); time the same
        # compiled program, not the eager trace (each eager op is a host
        # round-trip on the axon relay — measured 3.8 s of pure dispatch)
        @jax.jit
        def f_imu(cfp_, ccache_, x1_, vis1_):
            y1 = fc.predict_frame1_conjoined(cmodel, cfp_, ccache_, x1_,
                                             vis1_, use_flash=on_tpu,
                                             two_source=two_source)
            return jnp.sum(jnp.abs(y1).astype(jnp.float32))

        cx1 = cxm[:, :, 1]

        def run_warm_imu():
            return float(f_imu(cfp, ccache, cx1, cvis1))

        rec['warm_prefix_imu'] = timed(run_warm_imu)
        rec['warm_prefix_imu']['note'] = (
            'S=1 conjoined suffix against a cached scene prefix '
            '(ConjoinedPrefixLru hit; '
            + ('imu400 flagship' if on_tpu else 'small config') + ')')

    if on_tpu or args.imu:
        optional('warm_prefix_imu', warm_prefix_imu_section)
    print(json.dumps(rec))


if __name__ == '__main__':
    main()
