#!/usr/bin/env python
"""Train RAFT: supervised optical flow, or keypoint-head distillation.

Training entry point for the fourth model family. The reference vendors
RAFT inference-only and downloads trained weights
(cwm/models/raft/download_raft_checkpoints.sh); its keypoint predictor is
"RAFT retrained with output_dim=1" (raft_model.py:152-159) with the
training unpublished. Two modes:

- ``--mode flow``: gamma-weighted sequence L1 against ground-truth flow
  from smooth synthetic warps of real frames (shard clips or the demo
  images) — self-contained supervision with exact labels for
  locally-constant fields.
- ``--mode keypoint``: BCE distillation of the output_dim=1 head against
  dense target maps — either precomputed (.npz with arrays ``images``
  [N,3,H,W] 0-255 and ``targets`` [N,1,H,W] 0-1) or produced on the fly
  by the counterfactual movability teacher (``--teacher movability``,
  slow: one movability estimate per image per epoch; this is the
  distillation the released keypoint checkpoint implies).

Examples:
    python scripts/train_raft.py --mode flow --synthetic --small \
        --img-size 64 --steps 20
    python scripts/train_raft.py --mode flow --shard /data/clips.shard \
        --steps 100000 --checkpoint-dir /ckpt/raft
    python scripts/train_raft.py --mode keypoint --targets maps.npz \
        --steps 5000
"""
import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

DEMO_IMAGES = '/root/reference/demo/images'


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument('--mode', default='flow', choices=['flow', 'keypoint'])
    ap.add_argument('--shard', default=None, help='CWMSHARD file path')
    ap.add_argument('--images', default=None,
                    help='directory of images to warp (flow) or distill '
                         'on (keypoint+--teacher)')
    ap.add_argument('--synthetic', action='store_true',
                    help='train on synthetic noise images (pipeline smoke)')
    ap.add_argument('--targets', default=None,
                    help='npz with images/targets for keypoint mode')
    ap.add_argument('--teacher', default=None, choices=[None, 'movability'],
                    help='generate keypoint targets on the fly from the '
                         'counterfactual movability pipeline')
    ap.add_argument('--teacher-model', default='base',
                    choices=['tiny', 'base'],
                    help='movability-teacher predictor size (tiny = smoke)')
    ap.add_argument('--teacher-samples', type=int, default=8,
                    help='counterfactual samples per teacher estimate')
    ap.add_argument('--small', action='store_true')
    ap.add_argument('--iters', type=int, default=12,
                    help='GRU iterations during training (reference '
                         'inference default is 24; RAFT training '
                         'conventionally uses 12)')
    ap.add_argument('--img-size', type=int, default=224)
    ap.add_argument('--pool-size', type=int, default=256,
                    help='frames drawn from --shard into the warp pool')
    ap.add_argument('--batch-size', type=int, default=8)
    ap.add_argument('--steps', type=int, default=1000)
    ap.add_argument('--warmup-steps', type=int, default=100)
    ap.add_argument('--lr', type=float, default=4e-4)
    ap.add_argument('--weight-decay', type=float, default=1e-4)
    ap.add_argument('--gamma', type=float, default=0.8)
    ap.add_argument('--max-mag', type=float, default=8.0,
                    help='max synthetic warp magnitude in pixels')
    ap.add_argument('--cells', type=int, default=4,
                    help='synthetic warp field resolution')
    ap.add_argument('--checkpoint-dir', default=None)
    ap.add_argument('--checkpoint-every', type=int, default=500)
    ap.add_argument('--log-every', type=int, default=10)
    ap.add_argument('--metrics', default=None, help='JSONL metrics path')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--no-remat', action='store_true')
    ap.add_argument('--profile-dir', default=None,
                    help='XLA-trace a 3-step window after warmup '
                         '(view with TensorBoard/Perfetto)')
    ap.add_argument('--accum-steps', type=int, default=1,
                    help='gradient-accumulation microbatches per step '
                         '(flow mode)')
    ap.add_argument('--dp', type=int, default=0,
                    help='data-parallel mesh size (0 = all devices)')
    return ap.parse_args()


def load_image_pool(args):
    """[N, 3, H, W] float32 in [0, 255] from shard / dir / synthetic."""
    import numpy as np
    size = args.img_size
    if args.synthetic:
        rng = np.random.RandomState(args.seed)
        return rng.rand(max(args.batch_size, 8), 3, size, size) \
            .astype(np.float32) * 255.0
    if args.shard:
        from counterfactualworldmodels_tpu.data.shards import \
            PythonClipLoader
        loader = PythonClipLoader(args.shard, batch_size=args.batch_size,
                                  crop_size=(size, size), seed=args.seed)
        it = iter(loader)
        frames = []
        while sum(f.shape[0] for f in frames) < args.pool_size:
            clips = next(it)  # [B, T, C, H, W] in [0, 1]
            frames.append(np.asarray(clips[:, 0], np.float32) * 255.0)
        pool = np.concatenate(frames)[:args.pool_size]
        print(f'warp pool: {pool.shape[0]} frames from {args.shard}',
              flush=True)
        return pool
    from PIL import Image
    src = args.images or DEMO_IMAGES
    paths = sorted(glob.glob(os.path.join(src, '*.png')) +
                   glob.glob(os.path.join(src, '*.jpg')))
    if not paths:
        raise SystemExit(f'no images under {src}')
    ims = [np.asarray(Image.open(p).convert('RGB').resize((size, size)),
                      np.float32).transpose(2, 0, 1) for p in paths]
    return np.stack(ims)


def movability_targets(images, args):
    """Distillation targets from the counterfactual movability teacher.

    One MovabilityPredictor estimate per image (random-weight predictor
    unless CWM_TEACHER_PARAMS points at a converted checkpoint); returns
    [N, 1, H, W] maps in [0, 1].
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from counterfactualworldmodels_tpu.models import vmae as jvmae
    from counterfactualworldmodels_tpu.pipelines.movability import \
        MovabilityPredictor
    size = args.img_size
    if args.teacher_model == 'tiny':
        model = jvmae.PretrainVisionTransformer(
            img_size=(size, size), patch_size=(8, 8),
            encoder_embed_dim=64, encoder_depth=2, encoder_num_heads=4,
            decoder_embed_dim=48, decoder_depth=1, decoder_num_heads=4,
            mlp_ratio=2.0, qkv_bias=True, num_frames=2, tubelet_size=1)
    else:
        model = jvmae.base_8x8patch_2frames_1tube(img_size=(size, size))
    params_path = os.environ.get('CWM_TEACHER_PARAMS')
    if params_path:
        from counterfactualworldmodels_tpu.utils.torch_convert import \
            load_vmae_checkpoint
        params = load_vmae_checkpoint(params_path)
    else:
        params = jvmae.init_params(model, jax.random.PRNGKey(args.seed))
        print('teacher: RANDOM-INIT predictor (set CWM_TEACHER_PARAMS '
              'for a real teacher)', flush=True)
    psi = MovabilityPredictor(predictor=model, params=params,
                              seed=args.seed, raft_iters=12,
                              imagenet_normalize_inputs=True)
    raft_path = os.environ.get('CWM_TEACHER_RAFT')
    if raft_path:
        from counterfactualworldmodels_tpu.utils.torch_convert import \
            load_raft_checkpoint
        psi.flow_params = load_raft_checkpoint(raft_path,
                                               small=psi.flow_model.small)
    if psi.flow_params is None:
        from counterfactualworldmodels_tpu.models.raft.raft import \
            init_raft_params
        psi.flow_params = init_raft_params(psi.flow_model,
                                           jax.random.PRNGKey(args.seed + 1),
                                           hw=64)
    # no keypoint predictor in the distillation bootstrap: seed patches
    # uniformly instead of from the (not-yet-trained) keypoint head
    psi.initialize_from_keypoints = False
    psi.iterate_from_keypoints = False
    outs = []
    for i in range(images.shape[0]):
        x = jnp.asarray(images[i:i + 1], jnp.float32) / 255.0
        video = jnp.stack([x, x], 1)
        m = psi(video, num_initial_samples=args.teacher_samples,
                num_samples_per_iteration=max(args.teacher_samples // 2, 2),
                num_iters=1)
        m = np.asarray(m, np.float32).reshape(1, 1, *m.shape[-2:])
        lo, hi = m.min(), m.max()
        outs.append((m - lo) / max(hi - lo, 1e-6))
        print(f'teacher map {i + 1}/{images.shape[0]}', flush=True)
    return np.concatenate(outs)


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from counterfactualworldmodels_tpu import parallel
    from counterfactualworldmodels_tpu.models.raft.raft import RAFT
    from counterfactualworldmodels_tpu.training import raft as R
    from counterfactualworldmodels_tpu.training import train as T
    from counterfactualworldmodels_tpu.utils.cache import \
        enable_persistent_cache
    from counterfactualworldmodels_tpu.utils.checkpoint import \
        CheckpointManager
    from counterfactualworldmodels_tpu.utils.profiling import MetricsLogger

    enable_persistent_cache()
    # multi-host (pod-slice) runs: bring up jax.distributed when the
    # TPU env indicates one. Mesh/dp sizing below uses the GLOBAL
    # batch; the data path switches to the process-local share just
    # before the loaders are built (see below).
    parallel.initialize_distributed()
    global_bs = args.batch_size
    keypoint = args.mode == 'keypoint'
    on_tpu = jax.default_backend() == 'tpu'
    model = RAFT(small=args.small, iters=args.iters,
                 output_dim=1 if keypoint else None,
                 dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    optimizer = T.make_optimizer(learning_rate=args.lr,
                                 weight_decay=args.weight_decay,
                                 warmup_steps=args.warmup_steps,
                                 total_steps=args.steps)

    n_dev = jax.device_count()
    if args.dp:
        dp = args.dp
        if args.batch_size % dp:
            raise SystemExit(f'--dp {dp} must divide --batch-size '
                             f'{args.batch_size}')
    else:
        dp = max(d for d in range(1, n_dev + 1)
                 if args.batch_size % d == 0 and n_dev % d == 0)
    if jax.process_count() > 1 and dp != n_dev:
        raise SystemExit(
            f'multi-host runs must span every device: dp must '
            f'equal {n_dev} (got {dp}); adjust --dp/--batch-size')
    print(f'devices={n_dev} dp={dp} mode={args.mode} '
          f'backend={jax.default_backend()}', flush=True)

    key = jax.random.PRNGKey(args.seed)
    key, init_key = jax.random.split(key)
    state = R.init_raft_train_state(model, optimizer, init_key,
                                    hw=min(args.img_size, 64))

    ckpt = CheckpointManager(args.checkpoint_dir) if args.checkpoint_dir \
        else None
    start_step = 0
    if ckpt is not None and ckpt.latest_step() is not None:
        state = ckpt.restore_latest(state)
        start_step = int(state.step)
        print(f'resumed from step {start_step}')

    step_kwargs = (dict(iters=args.iters) if keypoint else
                   dict(gamma=args.gamma, iters=args.iters,
                        accum_steps=args.accum_steps))
    if n_dev > 1 and dp > 1:
        mesh = parallel.make_mesh({'dp': dp})
        step_fn, shard_state, data_sharding = R.make_sharded_raft_train_step(
            model, optimizer, mesh, keypoint=keypoint,
            remat=not args.no_remat, **step_kwargs)
        state = shard_state(state)

        def put(x):
            return parallel.host_local_batch_to_global(
                mesh, data_sharding.spec, x)
    else:
        mk = (R.make_keypoint_distill_step if keypoint
              else R.make_raft_train_step)
        step_fn = jax.jit(mk(model, optimizer, remat=not args.no_remat,
                             **step_kwargs), donate_argnums=(0,))

        def put(x):
            return jnp.asarray(x)

    # ---- data -------------------------------------------------------
    if jax.process_count() > 1:
        # each process feeds its LOCAL share of the global batch (put()
        # stitches the global array) from a DISTINCT data stream; model
        # init and in-program mask keys above derived from the original
        # seed and stay replicated across processes
        args.batch_size = parallel.process_local_batch_size(global_bs)
        args.seed = args.seed + 100003 * jax.process_index()
        key = jax.random.fold_in(key, jax.process_index())  # warp stream
    if keypoint:
        if args.targets:
            data = np.load(args.targets)
            pool_img = np.asarray(data['images'], np.float32)
            pool_tgt = np.asarray(data['targets'], np.float32)
        elif args.teacher == 'movability':
            pool_img = load_image_pool(args)
            pool_tgt = movability_targets(pool_img, args)
        else:
            raise SystemExit('keypoint mode needs --targets or '
                             '--teacher movability')
        assert pool_img.shape[0] == pool_tgt.shape[0]
    else:
        pool_img = load_image_pool(args)

    # resume-deterministic streams: fold the restored step into both RNGs
    # so a resumed run continues the sample sequence instead of replaying
    # the beginning
    rng = np.random.RandomState(args.seed + 1 + start_step)
    key = jax.random.fold_in(key, start_step)
    # in-program warp sampling would also work; host-side keeps the data
    # path identical for the npz/teacher modes
    warp = jax.jit(R.synthetic_flow_batch,
                   static_argnames=('cells', 'translation_only'))

    metrics_log = MetricsLogger(args.metrics) if args.metrics else None
    t0 = time.time()
    last_log = start_step
    from counterfactualworldmodels_tpu.utils.profiling import \
        StepTraceWindow
    tracer = StepTraceWindow(args.profile_dir, start_step)
    for step in range(start_step, args.steps):
        tracer.tick(step)
        idx = rng.randint(0, pool_img.shape[0], args.batch_size)
        if keypoint:
            state, metrics = step_fn(state, put(pool_img[idx]),
                                     put(pool_tgt[idx]))
        else:
            key, wk = jax.random.split(key)
            im1, im2, gt, valid = warp(wk, jnp.asarray(pool_img[idx]),
                                       cells=args.cells,
                                       max_mag=args.max_mag)
            state, metrics = step_fn(state, put(im1), put(im2), put(gt),
                                     put(valid))
        if (step + 1) % args.log_every == 0 or step + 1 == args.steps:
            loss = float(metrics['loss'])  # host sync
            dt = (time.time() - t0) / max(step + 1 - last_log, 1)
            t0 = time.time()
            last_log = step + 1
            rec = {'step': step + 1, 'loss': round(loss, 5),
                   'grad_norm': float(metrics['grad_norm']),
                   'sec_per_step': round(dt, 4)}
            if 'epe' in metrics:
                rec['epe'] = round(float(metrics['epe']), 4)
            print(json.dumps(rec), flush=True)
            if metrics_log:
                metrics_log.log(**rec)
        if ckpt is not None and (step + 1) % args.checkpoint_every == 0:
            ckpt.save(step + 1, jax.device_get(state))
    if ckpt is not None:
        ckpt.save(args.steps, jax.device_get(state))
    tracer.close()
    print('done')


if __name__ == '__main__':
    main()
