#!/usr/bin/env python
"""Pretrain a conjoined (IMU-conditioned) VMAE.

The reference ships no conjoined training code ("Coming Soon",
/root/reference/README.md:83) — this CLI trains the two-stream masked
predictor its IMU-conditioned checkpoints imply: masked-prediction MSE on
the main (RGB) stream with the IMU context fully visible
(training.train.conjoined_prediction_loss), mirroring scripts/
train_vmae.py's loop (synthetic or shard data, rolling orbax checkpoints
+ resume, JSONL metrics).

Usage:
    python scripts/train_conjoined.py --synthetic --steps 100
    python scripts/train_conjoined.py --synthetic --model imu400 --steps N
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument('--shard', default=None, help='CWMSHARD file path '
                    '(video stream; IMU is synthesized unless the shard '
                    'carries it)')
    ap.add_argument('--synthetic', action='store_true',
                    help='train on synthetic video+IMU (pipeline smoke)')
    ap.add_argument('--model', default='small',
                    choices=['small', 'imu400'],
                    help='imu400 = the released IMU-conditioned ViT-B/4x4 '
                         'config (conjoined_vmae.py:1230-1243)')
    ap.add_argument('--img-size', type=int, default=112)
    ap.add_argument('--batch-size', type=int, default=8)
    ap.add_argument('--steps', type=int, default=1000)
    ap.add_argument('--warmup-steps', type=int, default=100)
    ap.add_argument('--lr', type=float, default=1.5e-4)
    ap.add_argument('--mask-ratio', type=float, default=0.9)
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
                    help='gradient-accumulation microbatches per step')
    ap.add_argument('--dp', type=int, default=0,
                    help='data-parallel mesh size (0 = all devices / tp)')
    ap.add_argument('--tp', type=int, default=1,
                    help='tensor-parallel mesh size')
    return ap.parse_args()


def build_model(args):
    import jax.numpy as jnp
    import jax
    from counterfactualworldmodels_tpu.models import conjoined as conj
    on_tpu = jax.default_backend() == 'tpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    attn = 'flash' if on_tpu else 'dense'
    if args.model == 'imu400':
        if args.img_size != 224:
            raise SystemExit('--model imu400 requires --img-size 224')
        return conj.imu400_base_4x4patch_2frames_1tube(dtype=dtype,
                                                       attn_impl=attn)
    sz = args.img_size
    ctx = conj.StreamSpec(
        is_imu=True, in_chans=6, sequence_length=400, imu_tubelet=16,
        encoder_embed_dim=64, encoder_depth=4, encoder_num_heads=4,
        decoder_embed_dim=32, decoder_depth=2, decoder_num_heads=4,
        decoder_num_classes=96, mlp_ratio=2.0, concat_dummy_token=False,
        padded=True, max_padding_tokens=25)
    main = conj.StreamSpec(
        img_size=(sz, sz), patch_size=(8, 8), in_chans=3, num_frames=2,
        encoder_embed_dim=96, encoder_depth=4, encoder_num_heads=4,
        decoder_embed_dim=64, decoder_depth=2, decoder_num_heads=4,
        mlp_ratio=2.0, padded=True, max_padding_tokens=64)
    return conj.ConjoinedVMAE(
        main=main, context=ctx,
        conjoin_encoder_layers=((0, 0), (2, 2)),
        conjoin_decoder_layers=((0, 0), (1, 1)),
        dtype=dtype, attn_impl=attn)


def make_data(args, model):
    """Yield (video [B,C,T,H,W], imu [B,C,L,1,1]) batches."""
    import numpy as np
    sz = args.img_size
    L = model.context.sequence_length
    if args.synthetic:
        rng = np.random.RandomState(args.seed + 1)

        def gen():
            while True:
                coarse = rng.rand(args.batch_size, 3, 8, 8)
                import jax
                import jax.numpy as jnp
                img = np.asarray(jax.image.resize(
                    jnp.asarray(coarse, jnp.float32),
                    (args.batch_size, 3, sz, sz), 'bilinear'))
                f2 = np.roll(img, rng.randint(1, 5), axis=-1)
                video = np.stack([img, f2], axis=2)  # [B,C,T,H,W]
                imu = (rng.randn(args.batch_size, 6, L) * 0.1
                       ).astype(np.float32)[..., None, None]
                yield video.astype(np.float32), imu
        return gen()
    from counterfactualworldmodels_tpu.data.shards import (
        NativeClipLoader, PythonClipLoader, read_imu_sidecar)
    crop = (sz, sz)
    try:
        loader = NativeClipLoader(args.shard, batch_size=args.batch_size,
                                  crop_size=crop,
                                  seed=args.seed)
    except Exception as e:
        print(f'native loader unavailable ({e}); python fallback')
        loader = PythonClipLoader(args.shard, batch_size=args.batch_size,
                                  crop_size=crop,
                                  seed=args.seed)
    # real per-clip IMU when the shard carries the sidecar (<shard>.imu,
    # data/shards.write_imu_sidecar); synthesized placeholder otherwise
    sidecar = read_imu_sidecar(args.shard)
    if sidecar is not None:
        if sidecar.shape[2] != L:
            raise SystemExit(
                f'IMU sidecar length {sidecar.shape[2]} != the model '
                f'context sequence_length {L}')
        print(f'imu sidecar: {sidecar.shape[0]} clips x '
              f'{sidecar.shape[1]}ch x {sidecar.shape[2]}')
    rng = np.random.RandomState(args.seed + 1)

    def gen():
        for clips in iter(loader):  # [B, T, C, H, W]
            video = np.moveaxis(np.asarray(clips, np.float32), 1, 2)
            if sidecar is not None:
                imu = np.asarray(sidecar[loader.last_indices],
                                 np.float32)[..., None, None]
            else:
                imu = (rng.randn(video.shape[0], 6, L) * 0.1
                       ).astype(np.float32)[..., None, None]
            yield video, imu
    return gen()


def main():
    args = parse_args()
    if not args.synthetic and not args.shard:
        raise SystemExit('pass --shard PATH or --synthetic')

    import numpy as np
    import jax
    import jax.numpy as jnp
    from counterfactualworldmodels_tpu.models.conjoined import (
        init_conjoined_params)
    from counterfactualworldmodels_tpu.training import train as T
    from counterfactualworldmodels_tpu.training.train import TrainState
    from counterfactualworldmodels_tpu.utils.cache import (
        enable_persistent_cache)
    from counterfactualworldmodels_tpu.utils.checkpoint import (
        CheckpointManager)
    from counterfactualworldmodels_tpu.utils.profiling import MetricsLogger

    enable_persistent_cache()
    from counterfactualworldmodels_tpu import parallel
    # multi-host (pod-slice) runs: bring up jax.distributed when the
    # TPU env indicates one. Mesh/dp sizing below uses the GLOBAL
    # batch; the data path switches to the process-local share just
    # before the loaders are built (see below).
    parallel.initialize_distributed()
    global_bs = args.batch_size
    model = build_model(args)
    optimizer = T.make_optimizer(learning_rate=args.lr,
                                 warmup_steps=args.warmup_steps,
                                 total_steps=args.steps)

    m = model.main
    n = m.num_patches
    n_vis = max(1, int(round(n * (1 - args.mask_ratio))))
    n_vis_c = model.context.num_patches + int(
        model.context.concat_dummy_token)
    print(f'main tokens={n} n_vis={n_vis} ctx n_vis={n_vis_c} '
          f'backend={jax.default_backend()}')

    key = jax.random.PRNGKey(args.seed)
    key, init_key = jax.random.split(key)
    params = init_conjoined_params(model, init_key)
    state = TrainState(jnp.int32(0), params, optimizer.init(params))

    ckpt = CheckpointManager(args.checkpoint_dir) if args.checkpoint_dir \
        else None
    start_step = 0
    if ckpt is not None and ckpt.latest_step() is not None:
        state = ckpt.restore_latest(state)
        start_step = int(state.step)
        print(f'resumed from step {start_step}')

    n_dev = jax.device_count()
    if args.dp:
        dp = args.dp
        if args.batch_size % dp:
            raise SystemExit(f'--dp {dp} must divide --batch-size '
                             f'{args.batch_size}')
    else:
        # largest divisor of the batch that fits the devices left over
        # after tp (dp=1 with tp=1 -> plain single-device path)
        dp = max(d for d in range(1, max(1, n_dev // args.tp) + 1)
                 if args.batch_size % d == 0)
    def make_masks(mk, b):
        # uniform fixed-popcount masks over the main stream; IMU fully
        # visible (the IMU-conditioned training regime). Runs INSIDE the
        # jitted step (mask_fn), one XLA dispatch per step.
        scores = jax.random.uniform(mk, (b, n))
        order = jnp.argsort(scores, axis=-1)
        mask = jnp.ones((b, n), bool)
        mask = jax.vmap(lambda mm, o: mm.at[o[:n_vis]].set(False))(mask,
                                                                   order)
        mask_c = jnp.zeros((b, model.context.num_patches), bool)
        return mask, mask_c

    if dp * args.tp > 1:
        from counterfactualworldmodels_tpu import parallel
        if jax.process_count() > 1 and dp * args.tp != n_dev:
            # a mesh over a device subset leaves whole hosts without
            # addressable shards in a multi-controller run
            raise SystemExit(
                f'multi-host runs must span every device: dp*tp must '
                f'equal {n_dev} (got dp={dp}, tp={args.tp}); adjust '
                f'--dp/--tp/--batch-size')
        mesh = parallel.make_mesh({'dp': dp, 'tp': args.tp})
        print(f'devices={n_dev} mesh=dp{dp} x tp{args.tp}')
        step_fn, shard_state, data_sharding = \
            T.make_sharded_conjoined_train_step(model, optimizer, mesh,
                                                n_vis, n_vis_c,
                                                remat=not args.no_remat,
                                                mask_fn=make_masks,
                                                accum_steps=args.accum_steps)
        state = shard_state(state)

        def put(x):
            return parallel.host_local_batch_to_global(
                mesh, data_sharding.spec, x)
    else:
        step_fn = jax.jit(
            T.make_conjoined_train_step(model, optimizer, n_vis, n_vis_c,
                                        remat=not args.no_remat,
                                        mask_fn=make_masks,
                                        accum_steps=args.accum_steps),
            donate_argnums=(0,))

        def put(x):
            return jnp.asarray(x)

    metrics_log = MetricsLogger(args.metrics) if args.metrics else None
    if jax.process_count() > 1:
        # each process feeds its LOCAL share of the global batch (put()
        # stitches the global array) from a DISTINCT data stream; model
        # init and in-program mask keys above derived from the original
        # seed and stay replicated across processes
        args.batch_size = parallel.process_local_batch_size(global_bs)
        args.seed = args.seed + 100003 * jax.process_index()
    data = make_data(args, model)
    # resume-deterministic mask stream: continue the key sequence
    # from the restored step instead of replaying the beginning
    key = jax.random.fold_in(key, start_step)
    t0 = time.time()
    from counterfactualworldmodels_tpu.utils.profiling import \
        StepTraceWindow
    tracer = StepTraceWindow(args.profile_dir, start_step)
    for step in range(start_step, args.steps):
        tracer.tick(step)
        video, imu = next(data)
        key, mk = jax.random.split(key)
        state, metrics = step_fn(state, put(video), put(imu), mk)
        if (step + 1) % args.log_every == 0 or step + 1 == args.steps:
            loss = float(metrics['loss'])  # host sync
            dt = (time.time() - t0) / args.log_every
            t0 = time.time()
            rec = {'step': step + 1, 'loss': loss,
                   'grad_norm': float(metrics['grad_norm']),
                   'sec_per_step': round(dt, 4),
                   'clips_per_sec': round(global_bs / dt, 2)}
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
