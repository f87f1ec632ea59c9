#!/usr/bin/env python
"""Train a ChannelMAE (masked channel-group reconstruction).

Training entry point for the third model family (the reference publishes
no training code — "Coming Soon", /root/reference/README.md:83; the
objective matches its compute_train_loss, cwm/models/ChannelMAE/
cmae.py:526-547): per-group uniform masking
(ChannelGroupMaskingGenerator semantics), MSE over masked patches summed
over channel groups, AdamW + cosine schedule, rolling orbax checkpoints,
JSONL metrics — mirroring scripts/train_vmae.py's loop.

Data comes from clip shards (one frame per clip; with ``--with-flow`` the
clip's 2-frame RAFT flow joins the input as an extra 2-channel group —
the rgb+flow composition of the reference's counterfactual-keypoint
stack) or from synthetic images for pipeline smoke.

Examples:
    python scripts/train_cmae.py --synthetic --steps 10 --model tiny \
        --img-size 64 --patch-size 16
    python scripts/train_cmae.py --shard /data/clips.shard --model base \
        --with-flow --raft-params /ckpt/raft --steps 100000
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
                    help='train on synthetic images (pipeline smoke)')
    ap.add_argument('--model', default='base', choices=['tiny', 'base'])
    ap.add_argument('--img-size', type=int, default=224)
    ap.add_argument('--patch-size', type=int, default=32,
                    help='ChannelMae default 32x32 patches')
    ap.add_argument('--partition', default='3',
                    help='comma-separated channel-group sizes of the '
                         'image channels (e.g. "3" or "1,1,1")')
    ap.add_argument('--with-flow', action='store_true',
                    help='append a 2-channel RAFT flow group computed '
                         'from each clip frame pair')
    ap.add_argument('--raft-params', default=None,
                    help='orbax checkpoint for the flow RAFT '
                         '(--with-flow; random init otherwise)')
    ap.add_argument('--raft-iters', type=int, default=12)
    ap.add_argument('--batch-size', type=int, default=32)
    ap.add_argument('--steps', type=int, default=1000)
    ap.add_argument('--warmup-steps', type=int, default=100)
    ap.add_argument('--lr', type=float, default=1.5e-4)
    ap.add_argument('--mask-ratio', type=float, default=0.75)
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


def build_model(args, partition):
    import jax
    import jax.numpy as jnp
    from counterfactualworldmodels_tpu.models import cmae
    on_tpu = jax.default_backend() == 'tpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    attn = 'flash' if on_tpu else 'dense'
    kw = dict(image_size=(args.img_size, args.img_size),
              patch_size=(args.patch_size, args.patch_size),
              in_channels=sum(partition), channel_partition=partition,
              dtype=dtype, attn_impl=attn)
    if args.model == 'tiny':
        return cmae.ChannelMae(
            encoder_embed_dim=96, encoder_depth=2, encoder_num_heads=2,
            decoder_embed_dim=64, decoder_depth=1, decoder_num_heads=2,
            mlp_ratio=2.0, **kw)
    return cmae.ChannelMae(**kw)  # ViT-B defaults (cmae.py:153)


def make_flow_fn(args):
    """(frame0, frame1) [B, 3, H, W] -> flow [B, 2, H, W]."""
    import jax
    import jax.numpy as jnp
    from counterfactualworldmodels_tpu.models.raft.raft import (
        RAFT, init_raft_params)
    raft = RAFT(iters=args.raft_iters)
    if args.raft_params:
        from counterfactualworldmodels_tpu.utils.checkpoint import (
            load_params)
        rp = load_params(os.path.abspath(args.raft_params))
    else:
        print('WARNING: --with-flow without --raft-params uses a '
              'random-init RAFT (smoke only)', file=sys.stderr)
        rp = init_raft_params(raft, jax.random.PRNGKey(7),
                              hw=max(64, args.img_size))

    @jax.jit
    def flow_fn(f0, f1):
        return raft.apply({'params': rp}, f0 * 255.0, f1 * 255.0,
                          args.raft_iters)[1]
    return flow_fn


def make_data(args, partition):
    """Yield [B, C_total, H, W] channel-group batches in [0, 1] (flow
    channels raw)."""
    import numpy as np
    sz = args.img_size
    flow_fn = make_flow_fn(args) if args.with_flow else None
    if args.synthetic:
        rng = np.random.RandomState(args.seed + 1)

        def gen():
            import jax
            import jax.numpy as jnp
            while True:
                coarse = rng.rand(args.batch_size, 3, 8, 8)
                img = np.asarray(jax.image.resize(
                    jnp.asarray(coarse, jnp.float32),
                    (args.batch_size, 3, sz, sz), 'bilinear'))
                if flow_fn is not None:
                    f1 = np.roll(img, 2, axis=-1)
                    fl = np.asarray(flow_fn(img, f1), np.float32)
                    img = np.concatenate([img, fl], axis=1)
                yield img.astype(np.float32)
        return gen()
    from counterfactualworldmodels_tpu.data.shards import (NativeClipLoader,
                                                           PythonClipLoader)
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

    def gen():
        import numpy as np
        for clips in iter(loader):  # [B, T, C, H, W]
            clips = np.asarray(clips, np.float32)
            img = clips[:, 0]
            if flow_fn is not None:
                f1 = clips[:, 1] if clips.shape[1] > 1 else clips[:, 0]
                fl = np.asarray(flow_fn(img, f1), np.float32)
                img = np.concatenate([img, fl], axis=1)
            yield img
    return gen()


def main():
    args = parse_args()
    if not args.synthetic and not args.shard:
        raise SystemExit('pass --shard PATH or --synthetic')
    partition = tuple(int(v) for v in args.partition.split(',') if v)
    if args.with_flow:
        partition = partition + (2,)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from counterfactualworldmodels_tpu.models.cmae import group_uniform_mask
    from counterfactualworldmodels_tpu.training import train as T
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
    model = build_model(args, partition)
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
        # (same policy as train_conjoined.py)
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
    print(f'partition={partition} mask_size={model.mask_size} '
          f'devices={n_dev} mesh=dp{dp} x tp{args.tp} '
          f'backend={jax.default_backend()}')

    key = jax.random.PRNGKey(args.seed)
    key, init_key, mask_key = jax.random.split(key, 3)
    mask0, counts = group_uniform_mask(mask_key, model.mask_size,
                                       args.mask_ratio, args.batch_size)
    n_vis = mask0.shape[1] - sum(counts)
    x_shape = (args.batch_size, sum(partition), args.img_size,
               args.img_size)
    state = T.init_cmae_train_state(model, optimizer, init_key, x_shape,
                                    mask0, n_vis, counts)

    ckpt = CheckpointManager(args.checkpoint_dir) if args.checkpoint_dir \
        else None
    start_step = 0
    if ckpt is not None and ckpt.latest_step() is not None:
        state = ckpt.restore_latest(state)
        start_step = int(state.step)
        print(f'resumed from step {start_step}')

    # sample the group-uniform mask INSIDE the jitted step (the popcounts
    # are static functions of the ratio, so `counts` stays valid)
    def mask_fn(k, b):
        return group_uniform_mask(k, model.mask_size, args.mask_ratio, b)[0]

    if n_dev > 1:
        step_fn, shard_state, data_sharding = T.make_sharded_cmae_train_step(
            model, optimizer, mesh, n_vis, counts,
            remat=not args.no_remat, mask_fn=mask_fn,
            accum_steps=args.accum_steps)
        state = shard_state(state)

        def put(x):
            return parallel.host_local_batch_to_global(
                mesh, data_sharding.spec, x)
    else:
        step_fn = jax.jit(T.make_cmae_train_step(model, optimizer, n_vis,
                                                 counts,
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
    data = make_data(args, partition)
    # resume-deterministic mask stream: continue the key sequence
    # from the restored step instead of replaying the beginning
    key = jax.random.fold_in(key, start_step)
    t0 = time.time()
    from counterfactualworldmodels_tpu.utils.profiling import \
        StepTraceWindow
    tracer = StepTraceWindow(args.profile_dir, start_step)
    for step in range(start_step, args.steps):
        tracer.tick(step)
        batch = put(np.asarray(next(data), np.float32))
        key, mk = jax.random.split(key)
        state, metrics = step_fn(state, batch, mk)
        if (step + 1) % args.log_every == 0 or step + 1 == args.steps:
            loss = float(metrics['loss'])  # host sync
            dt = (time.time() - t0) / args.log_every
            t0 = time.time()
            rec = {'step': step + 1, 'loss': loss,
                   'grad_norm': float(metrics['grad_norm']),
                   'sec_per_step': round(dt, 4),
                   'imgs_per_sec': round(global_bs / dt, 2)}
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
