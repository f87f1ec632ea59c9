#!/usr/bin/env python
"""Time the FULL suffix stage (predict_frame1_from_prefix) on TPU at the
flagship config: pooled vs unpooled, real ViT-L params (random init).

Separates the decoder-blocks time (known from exp_suffix_profile) from
the rest of the stage (patchify/embed, encoder suffix, scatter, head) and
quantifies what pooled-prefix buys end-to-end.

Usage: python scripts/exp_suffix_stage.py [--s 256] [--pools 1,2,4]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--s', type=int, default=256)
    ap.add_argument('--pools', default='1,2,4')
    ap.add_argument('--iters', type=int, default=4)
    args = ap.parse_args()

    from counterfactualworldmodels_tpu.utils.cache import (
        enable_persistent_cache)
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from counterfactualworldmodels_tpu.models import vmae
    from counterfactualworldmodels_tpu.models import fast_vmae as fv
    from counterfactualworldmodels_tpu.ops.normalization import (
        imagenet_normalize)

    on_tpu = jax.default_backend() == 'tpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = vmae.large_4x4patch_2frames_1tube(
        dtype=dtype, attn_impl='flash' if on_tpu else 'dense')
    params = vmae.init_params(model, jax.random.PRNGKey(0))
    fp = fv.stack_vmae_params(model, params)

    s = args.s
    npf = model.num_patches_per_frame
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 2, 3, 224, 224).astype(np.float32))
    xm = imagenet_normalize(jnp.broadcast_to(x, (s,) + x.shape[1:]),
                            temporal_dim=1)
    vis1 = jnp.asarray(np.stack([
        rng.choice(npf, 33, replace=False) for _ in range(s)]), jnp.int32)
    cache = fv.encode_prefix(model, fp, on_tpu, xm[0:1, 0])

    def timeit(fn):
        out = fn()
        float(jnp.sum(jnp.abs(jnp.ravel(out)[:8].astype(jnp.float32))))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            last = None
            for _ in range(args.iters):
                last = fn()
            float(jnp.sum(jnp.abs(jnp.ravel(last)[:8]
                                  .astype(jnp.float32))))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best

    rows = {}
    for cfg in args.pools.split(','):
        if not cfg:
            continue
        parts = cfg.split(':')
        pool = int(parts[0])
        spool = int(parts[1]) if len(parts) > 1 and parts[1] else 1
        gelu = parts[2] if len(parts) > 2 else 'erf'
        key = f'suffix_pool{pool}'
        if spool > 1:
            key += f'_s{spool}'
        if gelu != 'erf':
            key += f'_{gelu}'
        rows[key + '_ms'] = round(timeit(
            lambda: fv.predict_frame1_from_prefix(
                model, fp, on_tpu, cache, xm[:, 1], vis1,
                two_source=on_tpu, prefix_pool=pool, suffix_pool=spool,
                gelu=gelu)) * 1e3, 1)
        print(key, rows[key + '_ms'], file=sys.stderr)
    print(json.dumps({'s': s, 'backend': jax.default_backend(), **rows}))


if __name__ == '__main__':
    main()
