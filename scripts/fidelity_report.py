"""Quantify shared-prefix engine fidelity vs the exact per-sample path.

Runs the full counterfactual pipeline (mask -> perturbation -> VMAE predict
-> RAFT flow) twice on real demo images — once through the exact model
(pipelines.segmentation.counterfactual_videos_and_flows) and once through
the shared-prefix engine (counterfactual_videos_and_flows_fast) — and
reports agreement statistics of (a) the predicted videos and flow fields
(incl. MAX per-pixel error, the BASELINE.md tolerance metric) and (b) the
END PRODUCTS users actually consume: the covariance-probe Spelke segment
map (reference cwm/models/segmentation.py:478-547) and the movability
mean-motion map (reference cwm/models/movability.py:299-360 /
segmentation.py:257-276), per approximation rung.

On a bf16 backend it additionally runs exact and fast legs in f32 on the
first image to DECOMPOSE the measured deviation into bf16-numerics vs
prefix-isolation vs pooling (VERDICT r04 weak #5).

Writes FIDELITY_r{N}.json at the repo root (one JSON object) and prints it.

Usage: python scripts/fidelity_report.py [--samples 8] [--out FIDELITY.json]
"""
import argparse
import dataclasses
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def _pair_stats(ye, fe, yx, fx):
    """Agreement of (video, flow) pairs: correlation, mean relative
    deviation, and max per-pixel absolute error (videos are [0,1]-scaled
    pixels, so video_max_abs_err compares directly against the BASELINE.md
    <=1e-2 tolerance; flow is in pixels of displacement)."""
    ye = np.asarray(ye, np.float32).ravel()
    yx = np.asarray(yx, np.float32).ravel()
    fe = np.asarray(fe, np.float32).ravel()
    fx = np.asarray(fx, np.float32).ravel()
    return {
        'video_corr': round(float(np.corrcoef(ye, yx)[0, 1]), 5),
        'flow_corr': round(float(np.corrcoef(fe, fx)[0, 1]), 5),
        'flow_mean_rel_dev': round(float(
            np.abs(fe - fx).mean() / (np.abs(fe).mean() + 1e-8)), 5),
        'video_max_abs_err': round(float(np.abs(ye - yx).max()), 5),
        'flow_max_abs_err': round(float(np.abs(fe - fx).max()), 5),
    }


def _end_products(flows, probe_yx, ds=2):
    """(segment map, movability map) from one batch of counterfactual
    flows [S, 1, 2, H, W].

    segment = the probe row of the pixelxpixel flow-magnitude covariance
    (reference segmentation.py:478-547; computed directly as one row
    instead of the full [hw x hw] matrix), probed at pixel ``probe_yx``
    (the active patch). movability = minmax-normalized mean flow
    magnitude over samples (reference segmentation.py:257-276)."""
    fs = np.asarray(flows, np.float32)[:, 0]            # [S, 2, H, W]
    mags = np.sqrt((fs ** 2).mean(1))                   # [S, H, W] (RMS
    # over flow channels — reference ChannelMSE, utils.py:510-513)
    s, h, w = mags.shape
    mov = mags.mean(0)
    mov = (mov - mov.min()) / max(float(mov.max() - mov.min()), 1e-8)
    m_ds = mags.reshape(s, h // ds, ds, w // ds, ds).mean((2, 4))
    mc = m_ds - m_ds.mean(0)
    probe = mc[:, probe_yx[0] // ds, probe_yx[1] // ds]
    seg = (mc * probe[:, None, None]).mean(0)           # covariance row
    return seg, mov


def _map_agreement(a, b, top_q=0.9):
    """Agreement of two spatial maps: Pearson + Spearman rank correlation
    and IoU of the top-decile pixel sets (the thresholded segment /
    movability masks a user would extract)."""
    from scipy.stats import spearmanr
    av, bv = np.asarray(a).ravel(), np.asarray(b).ravel()
    ta, tb = np.quantile(av, top_q), np.quantile(bv, top_q)
    ma, mb = av >= ta, bv >= tb
    inter, union = (ma & mb).sum(), (ma | mb).sum()
    return {
        'pearson': round(float(np.corrcoef(av, bv)[0, 1]), 5),
        'spearman': round(float(spearmanr(av, bv).statistic), 5),
        'iou_top10pct': round(float(inter) / max(int(union), 1), 5),
    }


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
    ap.add_argument('--prefix-pools', default='2:1,2:2,2:2:tanh,4:4,4:4:tanh',
                    help='comma-separated prefix[:suffix[:gelu]] pool '
                         'configs to also measure vs exact (empty = '
                         'none), e.g. "2:1,2:2,4:4:tanh"')
    ap.add_argument('--no-decompose', action='store_true',
                    help='skip the f32 bf16-vs-isolation decomposition '
                         'legs (they re-run exact+fast+pooled in f32 on '
                         'the first image)')
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
    from counterfactualworldmodels_tpu.models.fast_vmae import sfx_bucket
    n_sfx_pad = sfx_bucket(n_vis - npf, n - npf)
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
    psz = model.full_patch_size[-1]
    grid = 224 // psz
    decompose = None
    for path in paths:
        img = Image.open(path).convert('RGB').resize((224, 224))
        x = jnp.asarray(np.asarray(img), jnp.float32).transpose(2, 0, 1)[None] / 255.
        x = jnp.stack([x, x], 1)[0][None]

        passive = np.ones((1, n, s), dtype=bool)
        passive[:, :npf] = False
        active = np.ones((1, n, s), dtype=bool)
        active[:, :npf] = False
        a_idx = []
        for i in range(s):
            passive[0, npf + rng.choice(npf, 32, replace=False), i] = False
            ai = rng.randint(npf)
            a_idx.append(ai)
            active[0, npf + ai, i] = False
        passive = jnp.asarray(passive)
        active = jnp.asarray(active)
        shifts = jnp.asarray(rng.randint(-3, 4, size=(1, s, 2)), jnp.int32)
        keys = jax.random.split(jax.random.PRNGKey(args.seed + 1),
                                s).reshape(1, s, 2)
        # covariance probe pixel = sample 0's active patch center (the
        # interface's 'X' key probes the clicked patch)
        probe_yx = ((a_idx[0] // grid) * psz + psz // 2,
                    (a_idx[0] % grid) * psz + psz // 2)

        y_e, f_e, _ = counterfactual_videos_and_flows(
            model, params, raft, raft_params, x, passive, active, shifts,
            keys, n_vis, True, args.raft_iters, True)
        seg_e, mov_e = _end_products(f_e, probe_yx)
        try:
            y_f, f_f, _ = jax.block_until_ready(
                counterfactual_videos_and_flows_fast(
                    model, fp, raft, raft_params, x, passive, active,
                    shifts, keys, n_sfx_pad, True, args.raft_iters, True,
                    on_tpu, two_source, n_vis=n_vis))
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
                keys, n_sfx_pad, True, args.raft_iters, True, on_tpu,
                two_source, n_vis=n_vis)

        def vs_exact(y_x, f_x):
            stats = _pair_stats(y_e, f_e, y_x, f_x)
            seg_x, mov_x = _end_products(f_x, probe_yx)
            stats['segment'] = _map_agreement(seg_e, seg_x)
            stats['movability'] = _map_agreement(mov_e, mov_x)
            return stats

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
                        shifts, keys, n_sfx_pad, True, args.raft_iters, True,
                        on_tpu, two_source, prefix_pool=pool,
                        suffix_pool=spool, gelu=gelu, n_vis=n_vis))
                row[key_] = vs_exact(y_p, f_p)
            except Exception as e:
                traceback.print_exc()
                row[key_] = {'error': f'{type(e).__name__}: {e}'[:200]}
        per_image.append(row)

        # --- bf16-vs-isolation-vs-pooling decomposition (first image):
        # every leg re-run in f32 against the same prompts (VERDICT r04
        # weak #5 — without an f32 exact leg on this backend, the bf16
        # contribution to the measured deviation is unattributable)
        if (decompose is None and dtype != jnp.float32
                and not args.no_decompose):
            try:
                model32 = dataclasses.replace(model, dtype=jnp.float32)
                raft32 = RAFT(iters=args.raft_iters, dtype=jnp.float32)
                fp32 = stack_vmae_params(model32, params,
                                         dtype=jnp.float32)
                y_e32, f_e32, _ = jax.block_until_ready(
                    counterfactual_videos_and_flows(
                        model32, params, raft32, raft_params, x, passive,
                        active, shifts, keys, n_vis, True, args.raft_iters,
                        True))
                y_f32, f_f32, _ = jax.block_until_ready(
                    counterfactual_videos_and_flows_fast(
                        model32, fp32, raft32, raft_params, x, passive,
                        active, shifts, keys, n_sfx_pad, True,
                        args.raft_iters, True, on_tpu, two_source,
                        n_vis=n_vis))
                decompose = {
                    'image': os.path.basename(path),
                    'note': 'flow_mean_rel_dev attribution: isolation = '
                            'fast_f32 vs exact_f32; bf16 = each engine '
                            'f32 vs bf16; total = fast_bf16 vs exact_bf16',
                    'exact_bf16_vs_exact_f32':
                        _pair_stats(y_e32, f_e32, y_e, f_e),
                    'fast_bf16_vs_fast_f32':
                        _pair_stats(y_f32, f_f32, y_f, f_f),
                    'fast_f32_vs_exact_f32_isolation':
                        _pair_stats(y_e32, f_e32, y_f32, f_f32),
                    'fast_bf16_vs_exact_bf16_total':
                        _pair_stats(y_e, f_e, y_f, f_f),
                }
                for pool, spool, gelu in pools:
                    if (pool, spool) == (1, 1):
                        continue
                    key_ = f'pool{pool}_suffix{spool}_{gelu}'
                    y_p32, f_p32, _ = jax.block_until_ready(
                        counterfactual_videos_and_flows_fast(
                            model32, fp32, raft32, raft_params, x, passive,
                            active, shifts, keys, n_sfx_pad, True,
                            args.raft_iters, True, on_tpu, two_source,
                            prefix_pool=pool, suffix_pool=spool,
                            gelu=gelu, n_vis=n_vis))
                    decompose[f'{key_}_f32_vs_exact_f32'] = _pair_stats(
                        y_e32, f_e32, y_p32, f_p32)
                    decompose[f'{key_}_f32_vs_fast_f32_pooling_only'] = \
                        _pair_stats(y_f32, f_f32, y_p32, f_p32)
            except Exception as e:
                traceback.print_exc()
                decompose = {'error': f'{type(e).__name__}: {e}'[:300]}
            finally:
                jax.clear_caches()   # free the f32 programs' HBM

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
        'min_segment_spearman': min(r['segment']['spearman']
                                    for r in per_image),
        'min_movability_pearson': min(r['movability']['pearson']
                                      for r in per_image),
        'max_video_abs_err': max(r['video_max_abs_err'] for r in per_image),
    }
    if decompose is not None:
        report['bf16_vs_isolation_decomposition'] = decompose
    if conjoined is not None:
        report['conjoined'] = conjoined
    with open(args.out, 'w') as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == '__main__':
    main()
