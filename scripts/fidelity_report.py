"""Quantify shared-prefix engine fidelity vs the exact per-sample path.

Runs the full counterfactual pipeline (mask -> perturbation -> VMAE predict
-> RAFT flow) twice on real demo images — once through the exact model
(pipelines.segmentation.counterfactual_videos_and_flows) and once through
the shared-prefix engine (counterfactual_videos_and_flows_fast) — and
reports agreement statistics of the predicted videos and flow fields.

Writes FIDELITY_r{N}.json at the repo root (one JSON object) and prints it.

Usage: python scripts/fidelity_report.py [--samples 8] [--out FIDELITY.json]
"""
import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def conjoined_fidelity(paths, mode, args, on_tpu, dtype):
    """Fast-vs-exact agreement for the conjoined (IMU-conditioned) engine
    (models/fast_conjoined.py) on the movability workload shape.

    mode='flagship' uses the released imu400 ViT-B/4x4 config
    (reference conjoined_vmae.py:1230-1243); 'small' a reduced config that
    fits CPU smoke runs. Weights random-init either way (see
    PARITY_CHECKPOINTS.md); the IMU context is a fixed random embedding
    standing in for the predicted static-scene IMU.
    """
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from counterfactualworldmodels_tpu.models import conjoined as conj
    from counterfactualworldmodels_tpu.models.raft.raft import (
        RAFT, init_raft_params)
    from counterfactualworldmodels_tpu.pipelines.imu import (
        ImuConditionedFlowGenerator)

    attn = 'flash' if on_tpu else 'dense'
    if mode == 'flagship':
        model = conj.imu400_base_4x4patch_2frames_1tube(dtype=dtype,
                                                        attn_impl=attn)
        hw = 224
    else:
        ctx = conj.StreamSpec(
            is_imu=True, in_chans=6, sequence_length=400, imu_tubelet=16,
            encoder_embed_dim=64, encoder_depth=4, encoder_num_heads=4,
            decoder_embed_dim=32, decoder_depth=2, decoder_num_heads=4,
            decoder_num_classes=96, mlp_ratio=2.0, concat_dummy_token=False,
            padded=True, max_padding_tokens=25)
        main = conj.StreamSpec(
            img_size=(112, 112), patch_size=(8, 8), in_chans=3, num_frames=2,
            encoder_embed_dim=96, encoder_depth=4, encoder_num_heads=4,
            decoder_embed_dim=64, decoder_depth=2, decoder_num_heads=4,
            mlp_ratio=2.0, padded=True, max_padding_tokens=64)
        model = conj.ConjoinedVMAE(
            main=main, context=ctx,
            conjoin_encoder_layers=((0, 0), (2, 2)),
            conjoin_decoder_layers=((0, 0), (1, 1)),
            dtype=dtype, attn_impl=attn)
        hw = 112
    params = conj.init_conjoined_params(model, jax.random.PRNGKey(0))
    w = conj.ConjoinedPredictorWrapper(model, params=params,
                                       main_input='rgb01',
                                       context_input='imu')
    raft = RAFT(iters=args.raft_iters, dtype=dtype)
    rp = init_raft_params(raft, jax.random.PRNGKey(1), hw=64)

    n = w.num_patches
    n0 = model.main.num_patches // model.main.num_frames
    s = args.samples
    rng = np.random.RandomState(args.seed + 7)
    head = (rng.randn(1, model.context.num_patches,
                      model.context.imu_tubelet * model.context.in_chans)
            * 0.1).astype(np.float32)

    per_image = []
    for path in paths:
        img = Image.open(path).convert('RGB').resize((hw, hw))
        fr = np.asarray(img, np.float32).transpose(2, 0, 1) / 255.
        x = np.stack([fr, fr], axis=0)[None]

        active = np.ones((1, n, s), dtype=bool)
        active[:, :n0] = False
        for i in range(s):
            active[0, n0 + rng.randint(n0), i] = False
        shifts = [tuple(v) for v in rng.randint(-3, 4, size=(s, 2))]

        outs = {}
        for engine in ('exact', 'fast'):
            g = ImuConditionedFlowGenerator(
                predictor=w, head_motion_predictor=w, flow_model=raft,
                flow_params=rp, raft_iters=args.raft_iters,
                imagenet_normalize_inputs=True, seed=args.seed,
                engine=engine)
            y, f = g.predict_counterfactual_videos_and_flows(
                jnp.asarray(x), active_patches=jnp.asarray(active),
                shifts=shifts, num_samples=s, sample_batch_size=s,
                head_motion=jnp.asarray(head))
            outs[engine] = (np.asarray(y, np.float32),
                            np.asarray(f, np.float32))
        ye, fe = outs['exact']
        yf, ff = outs['fast']
        per_image.append({
            'image': os.path.basename(path),
            'video_corr': round(float(np.corrcoef(ye.ravel(),
                                                  yf.ravel())[0, 1]), 5),
            'flow_corr': round(float(np.corrcoef(fe.ravel(),
                                                 ff.ravel())[0, 1]), 5),
            'flow_mean_rel_dev': round(float(
                np.abs(fe - ff).mean() / (np.abs(fe).mean() + 1e-8)), 5),
        })
    return {
        'engine': 'conjoined shared-prefix (models/fast_conjoined.py)',
        'config': mode,
        'per_image': per_image,
        'min_flow_corr': min(r['flow_corr'] for r in per_image),
        'min_video_corr': min(r['video_corr'] for r in per_image),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--samples', type=int, default=8)
    ap.add_argument('--images', default='/root/reference/demo/images/*.png')
    ap.add_argument('--max-images', type=int, default=3)
    ap.add_argument('--out', default='FIDELITY_r02.json')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--model', default='large', choices=['large', 'base'],
                    help='base is light enough for CPU smoke runs')
    ap.add_argument('--raft-iters', type=int, default=24)
    ap.add_argument('--prefix-pools', default='2:1,2:2,2:2:tanh',
                    help='comma-separated prefix[:suffix[:gelu]] pool '
                         'configs to also measure vs exact (empty = '
                         'none), e.g. "2:1,2:2,2:2:tanh"')
    ap.add_argument('--conjoined', default='auto',
                    choices=['auto', 'flagship', 'small', 'off'],
                    help='also measure the conjoined (IMU) engine: '
                         "'flagship' = the released imu400 ViT-B/4x4 "
                         "config, 'small' = a reduced config for CPU, "
                         "'auto' = flagship on TPU / small on CPU")
    args = ap.parse_args()

    from counterfactualworldmodels_tpu.utils.backend_guard import (
        ensure_live_backend)
    ensure_live_backend(__file__)
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from counterfactualworldmodels_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from counterfactualworldmodels_tpu.models import vmae
    from counterfactualworldmodels_tpu.models.fast_vmae import (
        resolve_two_source, stack_vmae_params)
    from counterfactualworldmodels_tpu.models.raft.raft import (
        RAFT, init_raft_params)
    from counterfactualworldmodels_tpu.pipelines.segmentation import (
        counterfactual_videos_and_flows, counterfactual_videos_and_flows_fast)

    on_tpu = jax.default_backend() == 'tpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    factory = (vmae.large_4x4patch_2frames_1tube if args.model == 'large'
               else vmae.base_8x8patch_2frames_1tube)
    model = factory(dtype=dtype, attn_impl='flash' if on_tpu else 'dense')
    params = vmae.init_params(model, jax.random.PRNGKey(0))
    fp = stack_vmae_params(model, params)
    raft = RAFT(iters=args.raft_iters, dtype=dtype)
    raft_params = init_raft_params(raft, jax.random.PRNGKey(1), hw=64)

    n = model.num_patches
    npf = n // 2
    s = args.samples
    n_vis = npf + 32 + 1
    rng = np.random.RandomState(args.seed)

    paths = sorted(glob.glob(args.images))[:args.max_images]
    per_image = []
    # unattended robustness: a two-source kernel failure degrades to the
    # concat kernel for the rest of the run instead of crashing without
    # an artifact (mirrors bench.py's degrade chain)
    import traceback
    two_source = resolve_two_source(on_tpu)
    pools = []
    for v in args.prefix_pools.split(','):
        if not v.strip():
            continue
        parts = v.split(':')
        pools.append((int(parts[0]),
                      int(parts[1]) if len(parts) > 1 and parts[1] else 1,
                      parts[2] if len(parts) > 2 else 'erf'))
    for path in paths:
        img = Image.open(path).convert('RGB').resize((224, 224))
        x = jnp.asarray(np.asarray(img), jnp.float32).transpose(2, 0, 1)[None] / 255.
        x = jnp.stack([x, x], 1)[0][None]

        passive = np.ones((1, n, s), dtype=bool)
        passive[:, :npf] = False
        active = np.ones((1, n, s), dtype=bool)
        active[:, :npf] = False
        for i in range(s):
            passive[0, npf + rng.choice(npf, 32, replace=False), i] = False
            active[0, npf + rng.randint(npf), i] = False
        passive = jnp.asarray(passive)
        active = jnp.asarray(active)
        shifts = jnp.asarray(rng.randint(-3, 4, size=(1, s, 2)), jnp.int32)
        keys = jax.random.split(jax.random.PRNGKey(args.seed + 1),
                                s).reshape(1, s, 2)

        y_e, f_e, _ = counterfactual_videos_and_flows(
            model, params, raft, raft_params, x, passive, active, shifts,
            keys, n_vis, True, args.raft_iters, True)
        try:
            y_f, f_f, _ = jax.block_until_ready(
                counterfactual_videos_and_flows_fast(
                    model, fp, raft, raft_params, x, passive, active,
                    shifts, keys, n_vis, True, args.raft_iters, True,
                    on_tpu, two_source))
        except Exception:
            if not two_source:
                raise
            traceback.print_exc()
            print('two-source kernel failed; degrading to the concat '
                  'kernel', file=sys.stderr)
            jax.clear_caches()
            two_source = False
            y_f, f_f, _ = counterfactual_videos_and_flows_fast(
                model, fp, raft, raft_params, x, passive, active, shifts,
                keys, n_vis, True, args.raft_iters, True, on_tpu,
                two_source)

        def vs_exact(y_x, f_x):
            yx = np.asarray(y_x.reshape(s, -1), np.float32)
            ye_ = np.asarray(y_e.reshape(s, -1), np.float32)
            fe_ = np.asarray(f_e.reshape(-1), np.float32)
            fx = np.asarray(f_x.reshape(-1), np.float32)
            return {
                'video_corr': round(float(np.corrcoef(
                    ye_.reshape(-1), yx.reshape(-1))[0, 1]), 5),
                'flow_corr': round(float(np.corrcoef(fe_, fx)[0, 1]), 5),
                'flow_mean_rel_dev': round(float(
                    np.abs(fe_ - fx).mean()
                    / (np.abs(fe_).mean() + 1e-8)), 5),
            }

        row = {'image': os.path.basename(path), **vs_exact(y_f, f_f)}
        # pooled-prefix/suffix fidelity (same prompts, vs the SAME exact
        # run)
        for pool, spool, gelu in pools:
            key_ = f'pool{pool}'
            if spool > 1:
                key_ += f'_suffix{spool}'
            if gelu != 'erf':
                key_ += f'_{gelu}'
            try:
                y_p, f_p, _ = jax.block_until_ready(
                    counterfactual_videos_and_flows_fast(
                        model, fp, raft, raft_params, x, passive, active,
                        shifts, keys, n_vis, True, args.raft_iters, True,
                        on_tpu, two_source, prefix_pool=pool,
                        suffix_pool=spool, gelu=gelu))
                row[key_] = vs_exact(y_p, f_p)
            except Exception as e:
                traceback.print_exc()
                row[key_] = {'error': f'{type(e).__name__}: {e}'[:200]}
        per_image.append(row)

    conjoined = None
    if args.conjoined != 'off':
        mode = args.conjoined
        if mode == 'auto':
            mode = 'flagship' if on_tpu else 'small'
        try:
            conjoined = conjoined_fidelity(paths, mode, args, on_tpu, dtype)
        except Exception as e:  # keep the plain-engine results
            traceback.print_exc()
            conjoined = {'error': f'{type(e).__name__}: {e}'[:300]}

    report = {
        'engine': 'shared-prefix (models/fast_vmae.py)',
        'weights': 'random-init (no released checkpoints reachable — '
                   'see PARITY_CHECKPOINTS.md)',
        'samples_per_image': s,
        'model': args.model,
        'raft_iters': args.raft_iters,
        'two_source': two_source,
        'backend': jax.default_backend(),
        'per_image': per_image,
        'min_flow_corr': min(r['flow_corr'] for r in per_image),
        'min_video_corr': min(r['video_corr'] for r in per_image),
    }
    if conjoined is not None:
        report['conjoined'] = conjoined
    with open(args.out, 'w') as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == '__main__':
    main()
