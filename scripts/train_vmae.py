#!/usr/bin/env python
"""Train a VMAE with the temporally-factored masking policy.

End-to-end training entry point (the reference publishes none — its README
lists "Model training code" under Coming Soon). Wires together the shard
data loader (native C++ loader with a Python fallback), the rotated-table
masking policy, the masked-prediction objective, dp x tp sharding over a
device mesh, rolling checkpoints, and JSONL metrics.

Examples:
    # smoke run on synthetic data (any backend)
    python scripts/train_vmae.py --synthetic --steps 10 --batch-size 4 \
        --img-size 64 --patch-size 8 --model tiny

    # real run from a CWMSHARD file on a TPU pod slice
    python scripts/train_vmae.py --shard /data/clips.cwmshard \
        --model base --steps 100000 --dp 8 --tp 1 \
        --checkpoint-dir /ckpt/vmae_base
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument('--shard', default=None, help='CWMSHARD file path')
    ap.add_argument('--synthetic', action='store_true',
                    help='train on synthetic noise clips (smoke test)')
    ap.add_argument('--model', default='base',
                    choices=['tiny', 'base', 'large'])
    ap.add_argument('--img-size', type=int, default=224)
    ap.add_argument('--patch-size', type=int, default=8)
    ap.add_argument('--batch-size', type=int, default=32)
    ap.add_argument('--steps', type=int, default=1000)
    ap.add_argument('--warmup-steps', type=int, default=100)
    ap.add_argument('--lr', type=float, default=1.5e-4)
    ap.add_argument('--mask-ratio', type=float, default=0.99)
    ap.add_argument('--dp', type=int, default=0,
                    help='data-parallel mesh size (0 = all devices)')
    ap.add_argument('--tp', type=int, default=1,
                    help='tensor-parallel mesh size')
    ap.add_argument('--checkpoint-dir', default=None)
    ap.add_argument('--checkpoint-every', type=int, default=500)
    ap.add_argument('--log-every', type=int, default=10)
    ap.add_argument('--metrics', default=None, help='JSONL metrics path')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--no-remat', action='store_true')
    ap.add_argument('--input-mode', default='u8', choices=['u8', 'f32'],
                    help='shard loader output: u8 ships raw uint8 THWC '
                         'batches and normalizes on device (default, 4x '
                         'less host traffic); f32 is the legacy host-'
                         'normalized path')
    ap.add_argument('--profile-dir', default=None,
                    help='XLA-trace a 3-step window after warmup '
                         '(view with TensorBoard/Perfetto)')
    ap.add_argument('--accum-steps', type=int, default=1,
                    help='gradient-accumulation microbatches per step')
    return ap.parse_args()


def build_model(args):
    import jax.numpy as jnp
    from counterfactualworldmodels_tpu.models import vmae
    on_tpu = __import__('jax').default_backend() == 'tpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    attn = 'flash' if on_tpu else 'dense'
    if args.model == 'tiny':
        return vmae.PretrainVisionTransformer(
            img_size=(args.img_size, args.img_size),
            patch_size=(args.patch_size, args.patch_size),
            encoder_embed_dim=96, encoder_depth=2, encoder_num_heads=2,
            decoder_embed_dim=64, decoder_depth=1, decoder_num_heads=2,
            mlp_ratio=2.0, qkv_bias=True, num_frames=2, tubelet_size=1,
            dtype=dtype)
    if args.model == 'base':
        return vmae.base_8x8patch_2frames_1tube(dtype=dtype, attn_impl=attn)
    return vmae.large_4x4patch_2frames_1tube(dtype=dtype, attn_impl=attn)


def make_data(args):
    """Yields [B, T=2, C, H, W] float32 clips in [0, 1]."""
    import numpy as np
    if args.synthetic:
        rng = np.random.RandomState(args.seed)

        def gen():
            base = rng.rand(args.batch_size, 1, 3, args.img_size,
                            args.img_size).astype(np.float32)
            while True:
                shiftpx = rng.randint(-8, 9, 2)
                f1 = np.roll(base, tuple(shiftpx), axis=(-2, -1))
                yield np.concatenate([base, f1], 1)
        return gen()

    from counterfactualworldmodels_tpu.data.shards import (NativeClipLoader,
                                                           PythonClipLoader)
    crop = (args.img_size, args.img_size)
    try:
        loader = NativeClipLoader(args.shard, batch_size=args.batch_size,
                                  crop_size=crop, seed=args.seed,
                                  out_dtype=args.input_mode)
    except Exception as e:
        print(f'native loader unavailable ({e}); python fallback')
        loader = PythonClipLoader(args.shard, batch_size=args.batch_size,
                                  crop_size=crop, seed=args.seed,
                                  out_dtype=args.input_mode)
    return iter(loader)


def main():
    args = parse_args()
    if not args.synthetic and not args.shard:
        raise SystemExit('pass --shard PATH or --synthetic')

    import jax
    import jax.numpy as jnp
    import numpy as np
    from counterfactualworldmodels_tpu import parallel
    from counterfactualworldmodels_tpu.training import train as T
    from counterfactualworldmodels_tpu.utils.cache import (
        enable_persistent_cache)
    from counterfactualworldmodels_tpu.utils.checkpoint import (
        CheckpointManager)
    from counterfactualworldmodels_tpu.utils.profiling import MetricsLogger

    enable_persistent_cache()
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

    n_dev = jax.device_count()
    if args.dp:
        dp = args.dp
        if args.batch_size % dp:
            raise SystemExit(f'--dp {dp} must divide --batch-size '
                             f'{args.batch_size}')
    else:
        # largest divisor of the batch that fits the devices left over
        dp = max(d for d in range(1, max(1, n_dev // args.tp) + 1)
                 if args.batch_size % d == 0)
    if jax.process_count() > 1 and dp * args.tp != n_dev:
        # a mesh over a device subset leaves whole hosts without
        # addressable shards in a multi-controller run
        raise SystemExit(
            f'multi-host runs must span every device: dp*tp must '
            f'equal {n_dev} (got dp={dp}, tp={args.tp}); adjust '
            f'--dp/--tp/--batch-size')
    mesh = parallel.make_mesh({'dp': dp, 'tp': args.tp})
    print(f'devices={n_dev} mesh=dp{dp} x tp{args.tp} '
          f'backend={jax.default_backend()}')

    key = jax.random.PRNGKey(args.seed)
    key, init_key, mask_key = jax.random.split(key, 3)
    _, n_vis = T.make_batch_masks(mask_key, model, args.batch_size,
                                  args.mask_ratio)
    state = T.init_train_state(model, optimizer, init_key, n_vis=n_vis)

    ckpt = CheckpointManager(args.checkpoint_dir) if args.checkpoint_dir \
        else None
    start_step = 0
    if ckpt is not None and ckpt.latest_step() is not None:
        state = ckpt.restore_latest(state)
        start_step = int(state.step)
        print(f'resumed from step {start_step}')

    # sample the mask INSIDE the jitted step (one XLA dispatch per step;
    # eager mask ops each pay a host round-trip on the axon TPU path)
    def mask_fn(k, b):
        return T.make_batch_masks(k, model, b, args.mask_ratio)[0]

    if n_dev > 1:
        step_fn, shard_state, data_sharding = T.make_sharded_train_step(
            model, optimizer, mesh, n_vis, remat=not args.no_remat,
            mask_fn=mask_fn, accum_steps=args.accum_steps)
        state = shard_state(state)

        def put(x):
            return parallel.host_local_batch_to_global(
                mesh, data_sharding.spec, x)
    else:
        step_fn = jax.jit(T.make_train_step(model, optimizer, n_vis,
                                            remat=not args.no_remat,
                                            mask_fn=mask_fn,
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
    data = make_data(args)
    # resume-deterministic mask stream: continue the key sequence
    # from the restored step instead of replaying the beginning
    key = jax.random.fold_in(key, start_step)
    t0 = time.time()
    from counterfactualworldmodels_tpu.utils.profiling import \
        StepTraceWindow
    tracer = StepTraceWindow(args.profile_dir, start_step)
    for step in range(start_step, args.steps):
        tracer.tick(step)
        # u8 batches stay uint8 end-to-end; the jitted step normalizes
        batch = np.asarray(next(data))
        batch = put(batch if batch.dtype == np.uint8
                    else batch.astype(np.float32, copy=False))
        key, mk = jax.random.split(key)
        state, metrics = step_fn(state, batch, mk)
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
                metrics_log.log(**{k: v for k, v in rec.items()})
        if ckpt is not None and (step + 1) % args.checkpoint_every == 0:
            ckpt.save(step + 1, jax.device_get(state))
    if ckpt is not None:
        ckpt.save(args.steps, jax.device_get(state))
    tracer.close()
    print('done')


if __name__ == '__main__':
    main()
