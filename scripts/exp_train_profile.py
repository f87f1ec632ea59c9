#!/usr/bin/env python
"""ViT-L train-step stage breakdown (VERDICT r04 weak #8 / next #7).

Times the pieces of one masked-pretrain train step as separately jitted
programs so the 0.17-0.20 MFU has an attribution: forward loss only,
value_and_grad (fwd+bwd), grad + optimizer update (the full step), and
— for the attention share — the same grad program with attention stubbed
to a single v-passthrough (its FLOPs removed). Per-program times overlap
(each later program contains the earlier), so stage costs are the
deltas. Synthetic data; donation mirrors the real step.

Usage: python scripts/exp_train_profile.py [--model large] [--steps 8]
Writes one JSON line; archived into PERF.md's training roofline section.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

V5E_PEAK_FLOPS = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default='large')
    ap.add_argument('--steps', type=int, default=8)
    ap.add_argument('--remat', default='dots')
    ap.add_argument('--out', default=None)
    args = ap.parse_args()

    from counterfactualworldmodels_tpu.utils.backend_guard import (
        ensure_live_backend)
    ensure_live_backend(__file__)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from counterfactualworldmodels_tpu.models import vmae
    from counterfactualworldmodels_tpu.training import train as T
    from counterfactualworldmodels_tpu.utils.cache import (
        enable_persistent_cache)
    from scripts.bench_train import vmae_train_flops
    enable_persistent_cache()

    on_tpu = jax.default_backend() == 'tpu'
    kw = dict(dtype=jnp.bfloat16 if on_tpu else jnp.float32,
              attn_impl='flash' if on_tpu else 'dense')
    model = (vmae.large_4x4patch_2frames_1tube(**kw)
             if args.model == 'large'
             else vmae.base_8x8patch_2frames_1tube(**kw))
    batch = (4 if args.model == 'large' else 8) if on_tpu else 1
    remat = {'True': True, 'False': False}.get(args.remat, args.remat)

    opt = T.make_optimizer()
    key = jax.random.PRNGKey(0)
    mask, n_vis = T.make_batch_masks(key, model, batch, 0.9)
    state = T.init_train_state(model, opt, key, n_vis=n_vis)
    x = jnp.asarray(np.random.RandomState(0).rand(
        batch, 2, 3, 224, 224), jnp.float32)

    import functools
    loss_fn = T.apply_remat(functools.partial(
        T.masked_prediction_loss, model, n_vis=n_vis), remat)

    def sync(v):
        return float(jnp.sum(v))

    def timeit(fn, *a):
        jfn = jax.jit(fn)
        o = jfn(*a)
        sync(jax.tree_util.tree_leaves(o)[0])
        o = jfn(*a)   # second warm call: layout settle
        sync(jax.tree_util.tree_leaves(o)[0])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            o = jfn(*a)
        sync(jax.tree_util.tree_leaves(o)[0])
        return (time.perf_counter() - t0) / args.steps

    def timeit_step(step_fn, st):
        """The full train step, donated and state-threaded like the
        real loop (donation changes the update's in-placeness)."""
        jfn = jax.jit(step_fn, donate_argnums=(0,))
        for _ in range(2):
            st, m = jfn(st, x, mask)
        sync(m['loss'])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            st, m = jfn(st, x, mask)
        sync(m['loss'])
        return (time.perf_counter() - t0) / args.steps

    rows = {}
    # 1. forward loss only
    rows['fwd_loss'] = timeit(lambda p: loss_fn(p, x, mask), state.params)
    # 2. fwd+bwd
    grad_fn = jax.value_and_grad(lambda p: loss_fn(p, x, mask))
    rows['fwd_bwd'] = timeit(grad_fn, state.params)

    # 3. full step (grad + clip + adamw + apply); donated like the bench
    step = T.make_train_step(model, opt, n_vis, remat=remat)
    rows['full_step'] = timeit_step(step, state)
    # state was donated away; rebuild for the stubbed leg
    state = T.init_train_state(model, opt, key, n_vis=n_vis)

    # 4. fwd+bwd with the attention softmax-einsum stubbed to a
    #    v-passthrough: removes the N^2 attend FLOPs but keeps qkv/proj
    #    matmuls, MLPs, norms — the delta is the attend share
    from counterfactualworldmodels_tpu.models import layers as L
    from counterfactualworldmodels_tpu.ops import flash_attention as FA

    def stub_dense(q, k, v, dtype=jnp.float32):
        return v

    def stub_flash(q, k, v, **kwargs):
        return v

    orig_dense, orig_flash = L.dense_attention, FA.flash_attention
    L.dense_attention, FA.flash_attention = stub_dense, stub_flash
    try:
        loss_stub = T.apply_remat(functools.partial(
            T.masked_prediction_loss, model, n_vis=n_vis), remat)
        gf = jax.value_and_grad(lambda p: loss_stub(p, x, mask))
        stubbed = timeit(gf, state.params)
    finally:
        L.dense_attention, FA.flash_attention = orig_dense, orig_flash
    rows['fwd_bwd_no_attend'] = stubbed

    flops = vmae_train_flops(model, batch, n_vis)
    out = {
        'model': args.model, 'batch': batch, 'remat': str(remat),
        'backend': jax.default_backend(),
        'flash_bwd': os.environ.get('CWM_FLASH_BWD', 'auto'),
        'stages_sec': {k: round(v, 4) for k, v in rows.items()},
        'deltas_sec': {
            'bwd_over_fwd': round(rows['fwd_bwd'] - rows['fwd_loss'], 4),
            'optimizer': round(rows['full_step'] - rows['fwd_bwd'], 4),
            **({'attend_share_of_fwd_bwd':
                round(1 - stubbed / rows['fwd_bwd'], 4)}
               if stubbed else {}),
        },
        'mfu_full_step': round(flops / rows['full_step'] / V5E_PEAK_FLOPS,
                               4),
    }
    line = json.dumps(out)
    print(line, flush=True)
    if args.out:
        with open(args.out, 'w') as f:
            f.write(line + '\n')


if __name__ == '__main__':
    main()
