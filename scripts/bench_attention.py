#!/usr/bin/env python
"""Micro-benchmark of decoder-suffix attention kernel candidates on TPU.

The decoder suffix attention (per-sample frame-1 queries over
[shared prefix ; own suffix] keys) is 91% of a counterfactual dispatch at
S=256 (BENCH_r03_local.json), so the headline throughput is a direct
function of this one kernel's rate. This script times every available
implementation at the bench shapes and archives the table; if a stock
kernel beats the in-repo one, `ops/flash_attention.py` can route to it.

Candidates:
- ours            in-repo Pallas online-softmax kernel (tuned blocks)
- ours-two-source in-repo prefix/suffix split kernel (no K/V concat)
- stock-flash     jax.experimental.pallas.ops.tpu.flash_attention
- splash          jax.experimental.pallas.ops.tpu.splash_attention (full mask)
- xla-dpa         jax.nn.dot_product_attention (compiler-scheduled)

Usage: python scripts/bench_attention.py [--out ATTN_KERNELS_r03.json]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default=None)
    ap.add_argument('--s', type=int, default=16, help='sample batch B')
    ap.add_argument('--iters', type=int, default=8)
    args = ap.parse_args()

    from counterfactualworldmodels_tpu.utils.backend_guard import (
        ensure_live_backend)
    ensure_live_backend(__file__)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from counterfactualworldmodels_tpu.utils.cache import (
        enable_persistent_cache)
    enable_persistent_cache()
    from counterfactualworldmodels_tpu.ops.flash_attention import (
        flash_attention, flash_attention_prefix)

    on_tpu = jax.default_backend() == 'tpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    # dec_suffix bench shape: S samples x 8 heads, 3136 frame-1 queries,
    # keys = 3136 shared prefix + 3136 own suffix (ViT-L 4x4 @ 224px)
    B, H, NQ, NP, D = args.s, 8, 3136, 3136, 64
    NK = NP + NQ
    rng = np.random.RandomState(0)

    def mk(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.05,
                           dtype)

    q = mk(B, H, NQ, D)
    k = mk(B, H, NK, D)
    v = mk(B, H, NK, D)
    # the prefix rows are SHARED across samples (that is the workload):
    # make the dense candidates see the same keys the two-source kernel
    # reads, so error columns compare like against like
    k = k.at[:, :, :NP].set(k[:1, :, :NP])
    v = v.at[:, :, :NP].set(v[:1, :, :NP])
    k0, v0 = k[:1, :, :NP], v[:1, :, :NP]      # shared prefix panels
    k1, v1 = k[:, :, NP:], v[:, :, NP:]        # per-sample suffix panels

    flops = 4.0 * B * H * NQ * NK * D

    def timeit(fn):
        out = fn()
        jax.block_until_ready(out)
        float(jnp.sum(jnp.abs(out).astype(jnp.float32)))  # axon sync
        best = 1e9
        for _ in range(3):
            # enqueue iters dispatches, then ONE tiny reduction to force a
            # real host round-trip (block_until_ready alone is not a full
            # sync on the axon relay) — sync cost amortizes over iters
            # instead of inflating every iteration
            t0 = time.perf_counter()
            last = None
            for _ in range(args.iters):
                last = fn()
            float(jnp.sum(jnp.abs(last).astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best

    rows = {}

    def record(name, fn, ref=None, flops_scale=1.0):
        try:
            dt = timeit(fn)
            row = {'ms': round(dt * 1e3, 3),
                   'tflops_per_s': round(flops * flops_scale / dt / 1e12,
                                         1)}
            out = fn()
            if ref is not None:
                err = float(jnp.max(jnp.abs(
                    out.astype(jnp.float32) - ref.astype(jnp.float32))))
                row['max_abs_err_vs_ours'] = round(err, 5)
            if flops_scale != 1.0:
                row['flops_scale'] = flops_scale  # padded-query credit
            rows[name] = row
            print(f'{name}: {row}', file=sys.stderr)
            return out
        except Exception as e:
            rows[name] = {'error': f'{type(e).__name__}: {e}'[:300]}
            print(f'{name}: FAILED {type(e).__name__}: {e}',
                  file=sys.stderr)
            jax.clear_caches()
            return None

    f_ours = jax.jit(flash_attention)
    ref = record('ours', lambda: f_ours(q, k, v))

    f_two = jax.jit(flash_attention_prefix)
    record('ours-two-source', lambda: f_two(q, k0, v0, k1, v1), ref)

    f_ours16 = jax.jit(functools.partial(flash_attention,
                                         score_dtype='bfloat16'))
    record('ours/bf16-scores', lambda: f_ours16(q, k, v), ref)
    f_two16 = jax.jit(functools.partial(flash_attention_prefix,
                                        score_dtype='bfloat16'))
    record('ours-two-source/bf16-scores',
           lambda: f_two16(q, k0, v0, k1, v1), ref)

    try:
        from jax.experimental.pallas.ops.tpu import (
            flash_attention as stock)

        f_stock = jax.jit(lambda q_, k_, v_: stock.flash_attention(
            q_, k_, v_, sm_scale=1.0))
        record('stock-flash', lambda: f_stock(q, k, v), ref)

        # 448 divides both NQ=3136 (x7) and NK=6272 (x14)
        bs = stock.BlockSizes(
            block_q=448, block_k_major=448, block_k=448, block_b=1,
            block_q_major_dkv=448, block_k_major_dkv=448,
            block_k_dkv=448, block_q_dkv=448,
            block_k_major_dq=448, block_k_dq=448, block_q_dq=448)
        f_stock_b = jax.jit(lambda q_, k_, v_: stock.flash_attention(
            q_, k_, v_, sm_scale=1.0, block_sizes=bs))
        record('stock-flash/448', lambda: f_stock_b(q, k, v), ref)
    except Exception as e:
        # setdefault: a BlockSizes construction failure must not clobber a
        # successfully recorded plain stock-flash row (ADVICE r03)
        rows.setdefault('stock-flash/setup',
                        {'error': f'{type(e).__name__}: {e}'[:200]})

    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm)

        # splash requires q_seq % 128 == 0: pad 3136 -> 3200 queries and
        # slice the pad rows off (keys are already 128-aligned)
        NQP = -(-NQ // 128) * 128
        mask = sm.MultiHeadMask(
            [sm.FullMask((NQP, NK)) for _ in range(H)])
        kern = sk.make_splash_mha_single_device(mask=mask)
        vkern = jax.vmap(kern)

        def splash_call(q_, k_, v_):
            qp = jnp.pad(q_, ((0, 0), (0, 0), (0, NQP - NQ), (0, 0)))
            return vkern(qp, k_, v_)[:, :, :NQ]

        f_splash = jax.jit(splash_call)
        # the kernel really computes NQP padded query rows — credit them
        record('splash', lambda: f_splash(q, k, v), ref,
               flops_scale=NQP / NQ)
    except Exception as e:
        rows.setdefault('splash',
                        {'error': f'{type(e).__name__}: {e}'[:200]})

    f_xla = jax.jit(lambda q_, k_, v_: jax.nn.dot_product_attention(
        jnp.swapaxes(q_, 1, 2), jnp.swapaxes(k_, 1, 2),
        jnp.swapaxes(v_, 1, 2), scale=1.0).swapaxes(1, 2))
    record('xla-dpa', lambda: f_xla(q, k, v), ref)

    report = {
        'workload': f'decoder suffix attention B={B} H={H} '
                    f'NQ={NQ} NK={NK} D={D} {np.dtype(dtype.dtype).name}',
        'backend': jax.default_backend(),
        'flops_per_call_tf': round(flops / 1e12, 3),
        'rows': rows,
    }
    line = json.dumps(report)
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=1)
    print(line)


if __name__ == '__main__':
    main()
