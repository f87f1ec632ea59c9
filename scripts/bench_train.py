#!/usr/bin/env python
"""Training-throughput bench: steps/s, clips/s and MFU per model family.

The reference publishes no training code or numbers; this measures the
TPU-native training steps (training/train.py, training/raft.py) at
realistic configs so training performance is archived alongside the
inference benches (scripts/collect_artifacts.sh runs it each round).

Per family: a few warmup steps (compile + donation settle), then a timed
window. MFU uses an analytic fwd-FLOP count x3 (fwd + bwd ~ 2x fwd) over
the v5e bf16 peak. Synthetic data — the measurement is the step program,
not the input pipeline (the native loader's throughput is measured by its
own harness).

Env knobs: CWM_TRAIN_BENCH_FAMILIES=vmae,cmae,conjoined,raft (subset),
CWM_TRAIN_BENCH_STEPS (timed steps, default 8),
CWM_TRAIN_BENCH_MODEL=base|large (vmae config, default base).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

V5E_PEAK_FLOPS = 197e12


def _sync(x):
    """Fetch a scalar: block_until_ready does not block on axon."""
    import jax.numpy as jnp
    return float(jnp.sum(x if hasattr(x, 'dtype') else list(x.values())[0]))


def vmae_train_flops(model, batch, n_vis):
    """fwd MACs*2 of one masked-prediction step (encoder over n_vis,
    decoder over all tokens), x3 for backward."""
    n = model.num_patches
    de, dd = model.encoder_embed_dim, model.decoder_embed_dim
    Le, Ld = model.encoder_depth, model.decoder_depth

    def block(nq, nk, d, mlp=4):
        return 2 * nq * d * d * (3 + 1 + 2 * mlp) + 4 * nq * nk * d

    pt, ph, pw = model.full_patch_size
    fwd = (Le * block(n_vis, n_vis, de) + Ld * block(n, n, dd)
           + n_vis * 2 * (pt * ph * pw * 3) * de + 2 * n_vis * de * dd
           + (n - n_vis) * 2 * dd * model.out_dim)
    return 3 * fwd * batch


def bench_vmae(steps, model_name, accum_steps: int = 1, remat=True,
               mu_dtype=None):
    """remat: False / True('full') / 'dots' — training/train.py
    apply_remat. 'full' recomputes the whole forward in the backward
    (~+1/3 FLOPs, minimum memory); 'dots' saves the MXU outputs and
    recomputes only elementwise, trading a few GB of activations for
    the remat FLOPs back (VERDICT r04 weak #8: 0.175 MFU at 'full')."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from counterfactualworldmodels_tpu.models import vmae
    from counterfactualworldmodels_tpu.training import train as T
    on_tpu = jax.default_backend() == 'tpu'
    kw = dict(dtype=jnp.bfloat16 if on_tpu else jnp.float32,
              attn_impl='flash' if on_tpu else 'dense')
    model = (vmae.large_4x4patch_2frames_1tube(**kw) if model_name == 'large'
             else vmae.base_8x8patch_2frames_1tube(**kw))
    # ViT-L at batch 8 exceeds v5e HBM (18.4G vs 15.75G measured r04):
    # the 6272-token decoder dominates; batch 4 fits with remat.
    batch = (4 if model_name == 'large' else 8) if on_tpu else 1
    batch = max(batch, accum_steps)
    opt = T.make_optimizer(mu_dtype=mu_dtype)
    key = jax.random.PRNGKey(0)
    _, n_vis = T.make_batch_masks(key, model, batch, 0.9)
    state = T.init_train_state(model, opt, key, n_vis=n_vis)

    def mask_fn(k, b):
        return T.make_batch_masks(k, model, b, 0.9)[0]

    step = jax.jit(T.make_train_step(model, opt, n_vis, mask_fn=mask_fn,
                                     accum_steps=accum_steps, remat=remat),
                   donate_argnums=(0,))
    x = jnp.asarray(np.random.RandomState(0).rand(
        batch, 2, 3, 224, 224), jnp.float32)
    for i in range(2):
        state, m = step(state, x, jax.random.fold_in(key, i))
    _sync(m['loss'])
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = step(state, x, jax.random.fold_in(key, 10 + i))
    _sync(m['loss'])
    dt = (time.perf_counter() - t0) / steps
    flops = vmae_train_flops(model, batch, n_vis)
    name = f'vmae_{model_name}' + (f'_accum{accum_steps}'
                                   if accum_steps > 1 else '')
    if remat != True:  # noqa: E712 — remat may be a string
        name += f'_remat_{remat}'.replace('False', 'off')
    if mu_dtype is not None:
        name += '_mu_bf16'
    import os as _os
    return {'family': name, 'batch': batch, 'accum_steps': accum_steps,
            'remat': str(remat),
            'flash_bwd': _os.environ.get('CWM_FLASH_BWD', 'auto'),
            'sec_per_step': round(dt, 4),
            'clips_per_sec': round(batch / dt, 2),
            'mfu': round(flops / dt / V5E_PEAK_FLOPS, 4)}


def bench_loader_in_loop(steps):
    """The native loader feeding the real ViT-B train step on device:
    quantifies the input pipeline's share of a training step (VERDICT r03
    #6 — if input wait is a small fraction of step time, loader
    throughput is not the binding constraint at this config)."""
    import tempfile
    import jax
    import jax.numpy as jnp
    import numpy as np
    from counterfactualworldmodels_tpu.data import shards as D
    from counterfactualworldmodels_tpu.models import vmae
    from counterfactualworldmodels_tpu.training import train as T
    on_tpu = jax.default_backend() == 'tpu'
    kw = dict(dtype=jnp.bfloat16 if on_tpu else jnp.float32,
              attn_impl='flash' if on_tpu else 'dense')
    hw = 224 if on_tpu else 32
    model = (vmae.base_8x8patch_2frames_1tube(**kw) if on_tpu else
             vmae.PretrainVisionTransformer(
                 img_size=(hw, hw), patch_size=(8, 8),
                 encoder_embed_dim=48, encoder_depth=2,
                 encoder_num_heads=4, decoder_embed_dim=32,
                 decoder_depth=1, decoder_num_heads=2, num_frames=2))
    batch = 8 if on_tpu else 2
    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, 'bench.clips')
        D.write_shard(path, (rng.rand(64, 2, hw, hw, 3) * 255)
                      .astype(np.uint8))
        opt = T.make_optimizer()
        key = jax.random.PRNGKey(0)
        _, n_vis = T.make_batch_masks(key, model, batch, 0.9)
        state = T.init_train_state(model, opt, key, n_vis=n_vis)

        def mask_fn(k, b):
            return T.make_batch_masks(k, model, b, 0.9)[0]

        step = jax.jit(T.make_train_step(model, opt, n_vis,
                                         mask_fn=mask_fn),
                       donate_argnums=(0,))
        loader = D.NativeClipLoader(path, batch_size=batch, num_threads=2,
                                    out_dtype='u8', zero_copy=True)
        try:
            def loader_step(state, i):
                xb = D.u8_to_chw_01(jnp.asarray(loader.next_batch()))
                return step(state, xb, jax.random.fold_in(key, i))

            state, m = loader_step(state, 0)   # compile + warm
            _sync(m['loss'])
            t0 = time.perf_counter()
            for i in range(steps):
                state, m = loader_step(state, 10 + i)
            _sync(m['loss'])
            dt_loader = (time.perf_counter() - t0) / steps

            # same step count on a resident synthetic batch = step-only
            x = jnp.asarray(rng.rand(batch, 2, 3, hw, hw), jnp.float32)
            state, m = step(state, x, jax.random.fold_in(key, 5000))
            _sync(m['loss'])
            t0 = time.perf_counter()
            for i in range(steps):
                state, m = step(state, x, jax.random.fold_in(key, 600 + i))
            _sync(m['loss'])
            dt_synth = (time.perf_counter() - t0) / steps
        finally:
            loader.close()
    return {'family': 'vmae_base_loader_in_loop', 'batch': batch,
            'img': hw,
            'sec_per_step': round(dt_loader, 4),
            'sec_per_step_synthetic': round(dt_synth, 4),
            'clips_per_sec': round(batch / dt_loader, 2),
            'input_share': round(max(0.0, 1 - dt_synth / dt_loader), 4)}


def bench_raft(steps):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from counterfactualworldmodels_tpu.models.raft.raft import RAFT
    from counterfactualworldmodels_tpu.training import raft as R
    from counterfactualworldmodels_tpu.training import train as T
    on_tpu = jax.default_backend() == 'tpu'
    batch, hw, iters = (6, 224, 12) if on_tpu else (1, 64, 2)
    model = RAFT(small=not on_tpu, iters=iters,
                 dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    opt = T.make_optimizer(learning_rate=4e-4)
    state = R.init_raft_train_state(model, opt, jax.random.PRNGKey(0),
                                    hw=min(hw, 64))
    step = jax.jit(R.make_raft_train_step(model, opt, iters=iters),
                   donate_argnums=(0,))
    ims = jnp.asarray(np.random.RandomState(0).rand(
        batch, 3, hw, hw).astype(np.float32) * 255)
    im1, im2, gt, valid = R.synthetic_flow_batch(jax.random.PRNGKey(1), ims)
    for _ in range(2):
        state, m = step(state, im1, im2, gt, valid)
    _sync(m['loss'])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, im1, im2, gt, valid)
    _sync(m['loss'])
    dt = (time.perf_counter() - t0) / steps
    return {'family': 'raft', 'batch': batch, 'img': hw, 'iters': iters,
            'sec_per_step': round(dt, 4),
            'pairs_per_sec': round(batch / dt, 2)}


def bench_conjoined(steps):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from counterfactualworldmodels_tpu.models import conjoined as jc
    from counterfactualworldmodels_tpu.training import train as T
    on_tpu = jax.default_backend() == 'tpu'
    if on_tpu:
        model = jc.imu400_base_4x4patch_2frames_1tube(
            dtype=jnp.bfloat16, attn_impl='flash')
        batch, img = 4, 224
    else:
        from counterfactualworldmodels_tpu.models.conjoined import (
            ConjoinedVMAE, StreamSpec)
        model = ConjoinedVMAE(
            main=StreamSpec(img_size=(32, 32), patch_size=(8, 8),
                            encoder_embed_dim=48, encoder_depth=2,
                            encoder_num_heads=4, decoder_embed_dim=32,
                            decoder_depth=1, decoder_num_heads=4,
                            mlp_ratio=2.0, padded=True,
                            max_padding_tokens=8),
            context=StreamSpec(is_imu=True, in_chans=6, sequence_length=32,
                               imu_tubelet=8, encoder_embed_dim=32,
                               encoder_depth=2, encoder_num_heads=4,
                               decoder_embed_dim=24, decoder_depth=1,
                               decoder_num_heads=4, decoder_num_classes=48,
                               mlp_ratio=2.0, concat_dummy_token=False,
                               padded=True, max_padding_tokens=4),
            conjoin_encoder_layers=((0, 0), (1, 1)),
            conjoin_decoder_layers=((0, 0),))
        batch, img = 1, 32
    params = jc.init_conjoined_params(model, jax.random.PRNGKey(0))
    opt = T.make_optimizer()
    state = T.TrainState(jnp.zeros((), jnp.int32), params,
                         opt.init(params))
    n = model.main.num_patches
    n_vis = n // 2 + 2
    n_vis_c = model.context.num_patches
    step = jax.jit(T.make_conjoined_train_step(model, opt, n_vis, n_vis_c),
                   donate_argnums=(0,))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 3, 2, img, img), jnp.float32)
    mask = np.ones((batch, n), bool)
    mask[:, :n_vis] = False
    mask = jnp.asarray(mask)
    seq = model.context.sequence_length
    xc = jnp.asarray(rng.rand(batch, 6, seq, 1, 1), jnp.float32)
    mc = jnp.zeros((batch, n_vis_c), bool)
    for _ in range(2):
        state, m = step(state, x, mask, xc, mc)
    _sync(m['loss'])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, x, mask, xc, mc)
    _sync(m['loss'])
    dt = (time.perf_counter() - t0) / steps
    return {'family': 'conjoined_imu', 'batch': batch, 'img': img,
            'sec_per_step': round(dt, 4),
            'clips_per_sec': round(batch / dt, 2)}


def main():
    from counterfactualworldmodels_tpu.utils.backend_guard import (
        ensure_live_backend)
    ensure_live_backend(__file__)
    import jax
    from counterfactualworldmodels_tpu.utils.cache import (
        enable_persistent_cache)
    enable_persistent_cache()
    steps = int(os.environ.get('CWM_TRAIN_BENCH_STEPS', '8'))
    fams = os.environ.get(
        'CWM_TRAIN_BENCH_FAMILIES',
        'vmae,vmae_large,vmae_large_dots,vmae_large_dots_mu_bf16,'
        'vmae_large_noremat,vmae_large_accum,loader,conjoined,raft'
    ).split(',')
    model_name = os.environ.get('CWM_TRAIN_BENCH_MODEL',
                                'base')
    out = {'backend': jax.default_backend(),
           'devices': jax.device_count(), 'steps': steps, 'results': []}
    path = None
    if len(sys.argv) > 2 and sys.argv[1] == '--out':
        path = sys.argv[2]

    def persist():
        if path:
            with open(path, 'w') as f:
                json.dump(out, f, indent=1)

    import traceback
    for fam in fams:
        t0 = time.time()
        try:
            if fam == 'vmae':
                r = bench_vmae(steps, model_name)
            elif fam == 'vmae_large':
                r = bench_vmae(steps, 'large')
            elif fam == 'vmae_large_accum':
                r = bench_vmae(steps, 'large', accum_steps=2)
            elif fam == 'vmae_large_dots':
                r = bench_vmae(steps, 'large', remat='dots')
            elif fam == 'vmae_large_noremat':
                r = bench_vmae(steps, 'large', remat=False)
            elif fam == 'vmae_large_dots_mu_bf16':
                import jax.numpy as _jnp
                r = bench_vmae(steps, 'large', remat='dots',
                               mu_dtype=_jnp.bfloat16)
            elif fam == 'loader':
                r = bench_loader_in_loop(steps)
            elif fam == 'raft':
                r = bench_raft(steps)
            elif fam == 'conjoined':
                r = bench_conjoined(steps)
            else:
                continue
        except Exception as e:  # keep the families already measured
            traceback.print_exc()
            r = {'family': fam, 'error': f'{type(e).__name__}: {e}'[:300]}
            jax.clear_caches()
        r['total_sec'] = round(time.time() - t0, 1)
        out['results'].append(r)
        print(json.dumps(r), flush=True)
        persist()   # incremental: a later family crash keeps earlier rows
    if path:
        print(f'wrote {path}')
    r0 = next((r for r in out['results'] if 'error' not in r), {})
    print(json.dumps({'metric': 'train_clips_per_sec',
                      'value': r0.get('clips_per_sec',
                                      r0.get('pairs_per_sec', 0)),
                      'unit': 'clips/s', 'backend': out['backend']}))


if __name__ == '__main__':
    main()
