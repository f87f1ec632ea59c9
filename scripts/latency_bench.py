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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=50)
    ap.add_argument('--model', default='large', choices=['large', 'base'])
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

    def run():
        y = predict_video(model, params, x, mask, n_vis, True, 1)
        # axon's block_until_ready does not block; sync via scalar fetch
        return float(jnp.sum(jnp.abs(y)))

    def timed(fn):
        fn(); fn()  # compile + warm
        lats = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fn()
            lats.append((time.perf_counter() - t0) * 1e3)
        lats.sort()

        def pct(p):
            return round(
                lats[min(len(lats) - 1, int(p / 100 * len(lats)))], 2)
        return {'p50_ms': pct(50), 'p90_ms': pct(90), 'p99_ms': pct(99)}

    rec = {
        'metric': f'single-prediction latency (ViT-{args.model[0].upper()}, '
                  '224px, batch 1)',
        'iters': args.iters, 'unit': 'ms',
    }
    rec.update(timed(run))

    # interactive click-to-prediction latency with a warm per-image prefix
    # (the interface event-loop workload: PrefixLru hit -> only the S=1
    # frame-1 suffix pass runs)
    from counterfactualworldmodels_tpu.models.fast_vmae import (
        encode_prefix, predict_frame1_from_prefix, resolve_two_source,
        stack_vmae_params)
    from counterfactualworldmodels_tpu.ops.normalization import (
        imagenet_normalize)
    fp = stack_vmae_params(model, params)
    xm = imagenet_normalize(x, temporal_dim=1)
    cache = encode_prefix(model, fp, on_tpu, xm[0:1, 0])
    vis1 = jnp.asarray(rng.choice(npf, 33, replace=False)[None], jnp.int32)
    two_source = resolve_two_source(on_tpu)

    def run_warm():
        y1 = predict_frame1_from_prefix(model, fp, on_tpu, cache,
                                        xm[:, 1], vis1,
                                        two_source=two_source)
        return float(jnp.sum(jnp.abs(y1).astype(jnp.float32)))

    rec['warm_prefix'] = timed(run_warm)
    rec['warm_prefix']['note'] = ('S=1 suffix pass against a cached '
                                  'frame-0 prefix (PrefixLru hit)')
    print(json.dumps(rec))


if __name__ == '__main__':
    main()
