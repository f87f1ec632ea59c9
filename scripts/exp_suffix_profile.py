#!/usr/bin/env python
"""Decompose the suffix-decode stage's time on TPU.

The S=256 flagship dispatch spends ~3.3 s in the suffix ViT stage
(BENCH_r04_local.json). The attention kernel's measured ceiling accounts
for ~2.4 s; this script separates the remainder (qkv/proj/mlp/layernorm/
transposes) by timing the suffix decoder blocks with:

- full       the real thing (two-source flash)
- no-attn    attention output replaced by q (same shapes/layouts, no
             kernel): everything EXCEPT the attention kernel
- no-ln      full, but layernorms replaced by a cast (VPU cost probe)
- attn-only  the attention kernel alone at the same shapes

Usage: python scripts/exp_suffix_profile.py [--s 256] [--layers 12]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--s', type=int, default=256)
    ap.add_argument('--layers', type=int, default=12)
    ap.add_argument('--iters', type=int, default=4)
    args = ap.parse_args()

    from counterfactualworldmodels_tpu.utils.cache import (
        enable_persistent_cache)
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from counterfactualworldmodels_tpu.models import fast_vmae as fv

    S, L, N, D, H = args.s, args.layers, 3136, 512, 8
    d = D // H
    dtype = jnp.bfloat16 if jax.default_backend() == 'tpu' else jnp.float32
    rng = np.random.RandomState(0)

    def mk(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.03,
                           dtype)

    def mkf(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.03)

    stacked = {
        'norm1': {'scale': mkf(L, D) + 1, 'bias': mkf(L, D)},
        'attn': {'qkv_kernel': mk(L, D, 3, D),
                 'q_bias': mk(L, D), 'v_bias': mk(L, D),
                 'proj': {'kernel': mk(L, D, D), 'bias': mk(L, D)}},
        'norm2': {'scale': mkf(L, D) + 1, 'bias': mkf(L, D)},
        'mlp': {'fc1': {'kernel': mk(L, D, 4 * D), 'bias': mk(L, 4 * D)},
                'fc2': {'kernel': mk(L, 4 * D, D), 'bias': mk(L, D)}},
    }
    kvs = (mk(L, 1, H, N, d), mk(L, 1, H, N, d))
    hs = mk(S, N, D)

    def timeit(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        float(jnp.sum(jnp.abs(jnp.ravel(out)[:8].astype(jnp.float32))))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            last = None
            for _ in range(args.iters):
                last = fn(*a)
            float(jnp.sum(jnp.abs(jnp.ravel(last)[:8].astype(jnp.float32))))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best

    rows = {}

    f_full = jax.jit(functools.partial(
        fv._suffix_blocks, num_heads=H, use_flash=True, two_source=True))
    rows['full'] = timeit(f_full, stacked, kvs, hs)

    # no-attn: swap the kernel for identity-on-q via monkeypatch inside a
    # traced wrapper (same qkv/transpose/proj work, zero attention)
    real_fap = fv.flash_attention_prefix

    def stub_fap(q, k0, v0, k1, v1, **kw):
        return q

    def no_attn(stacked_, kvs_, hs_):
        fv.flash_attention_prefix = stub_fap
        try:
            return fv._suffix_blocks(stacked_, kvs_, hs_, num_heads=H,
                                     use_flash=True, two_source=True)
        finally:
            fv.flash_attention_prefix = real_fap

    rows['no-attn'] = timeit(jax.jit(no_attn), stacked, kvs, hs)

    real_ln = fv._ln

    def stub_ln(x, p, eps=1e-6):
        return x * p['scale'].astype(x.dtype)

    def no_ln(stacked_, kvs_, hs_):
        fv._ln = stub_ln
        try:
            return fv._suffix_blocks(stacked_, kvs_, hs_, num_heads=H,
                                     use_flash=True, two_source=True)
        finally:
            fv._ln = real_ln

    rows['full-but-cheap-ln'] = timeit(jax.jit(no_ln), stacked, kvs, hs)

    real_mlp = fv._mlp

    def tanh_mlp(p_mlp, x):
        h = (jnp.dot(x, p_mlp['fc1']['kernel'],
                     preferred_element_type=jnp.float32).astype(x.dtype)
             + p_mlp['fc1']['bias'])
        h = jax.nn.gelu(h, approximate=True)
        return (jnp.dot(h, p_mlp['fc2']['kernel'],
                        preferred_element_type=jnp.float32).astype(h.dtype)
                + p_mlp['fc2']['bias'])

    def cheap_gelu(stacked_, kvs_, hs_):
        fv._mlp = tanh_mlp
        try:
            return fv._suffix_blocks(stacked_, kvs_, hs_, num_heads=H,
                                     use_flash=True, two_source=True)
        finally:
            fv._mlp = real_mlp

    rows['full-but-tanh-gelu'] = timeit(jax.jit(cheap_gelu), stacked, kvs,
                                        hs)

    # attention alone at the same shapes (kernel ceiling check in situ)
    q = mk(S, H, N, d)
    k1 = mk(S, H, N, d)
    v1 = mk(S, H, N, d)
    k0, v0 = kvs[0][0], kvs[1][0]

    def attn_only(q_, k0_, v0_, k1_, v1_):
        def body(h, _):
            return fv.flash_attention_prefix(h, k0_, v0_, k1_, v1_), None
        return jax.lax.scan(body, q_, None, length=L)[0]

    rows['attn-only-x12'] = timeit(jax.jit(attn_only), q, k0, v0, k1, v1)

    flops_nonattn = 12.0 * S * N * (2 * D * 3 * D + 2 * D * D
                                    + 4 * D * 4 * D)
    flops_attn = 12.0 * S * H * 4 * N * (2 * N) * d
    report = {
        's': S, 'backend': jax.default_backend(),
        'ms': {k: round(v * 1e3, 1) for k, v in rows.items()},
        'nonattn_tf': round(flops_nonattn / 1e12, 1),
        'attn_tf': round(flops_attn / 1e12, 1),
        'nonattn_tflops_per_s': round(
            flops_nonattn / rows['no-attn'] / 1e12, 1),
        'attn_only_tflops_per_s': round(
            flops_attn / rows['attn-only-x12'] / 1e12, 1),
    }
    import json
    print(json.dumps(report))


if __name__ == '__main__':
    main()
