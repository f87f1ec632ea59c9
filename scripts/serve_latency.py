#!/usr/bin/env python
"""First-request latency per prompt size through the real serving surface.

Builds the CwmService (fast engine), runs the startup warmup (which
compiles one counterfactual program per suffix-width bucket —
fast_vmae.sfx_bucket), then sends ONE counterfactual request per prompt
size 1..--max-prompt and times it. With bucketing, every size in a warmed
bucket must run at steady-state latency (no first-compile stall); the
VERDICT r04 #5 done-criterion is first-request < 1 s for sizes 1-16 on
TPU hardware.

Prints one JSON object:
  {"serve_first_request_by_prompt_size": {...}}  — merge into LATENCY_rNN.

Usage: python scripts/serve_latency.py [--model large] [--img-size 224]
       [--num-samples 4] [--max-prompt 16] [--out FILE]
Off-TPU, --model tiny --img-size 32 keeps it tractable (plumbing dryrun).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default=None,
                    help='tiny|base|large (default: large on TPU, tiny off)')
    ap.add_argument('--img-size', type=int, default=None)
    ap.add_argument('--num-samples', type=int, default=4)
    ap.add_argument('--max-prompt', type=int, default=16)
    ap.add_argument('--raft-iters', type=int, default=24)
    ap.add_argument('--out', default=None)
    args = ap.parse_args()

    from counterfactualworldmodels_tpu.utils.backend_guard import (
        ensure_live_backend)
    ensure_live_backend(__file__)
    import numpy as np
    import jax
    import serve

    on_tpu = jax.default_backend() == 'tpu'
    model = args.model or ('large' if on_tpu else 'tiny')
    img_size = args.img_size or (224 if on_tpu else 32)
    raft_iters = args.raft_iters if on_tpu else 1

    def log(msg):
        print(f'[serve_latency] {msg}', file=sys.stderr, flush=True)

    log(f'building {model}/{img_size}px service...')
    t0 = time.perf_counter()
    gargs = serve.argparse.Namespace(
        model=model, img_size=img_size, params=None, raft_params=None,
        raft_iters=raft_iters, port=0, host='127.0.0.1', seed=0,
        engine='fast', prefix_cache_size=4)
    G = serve.build_generator(gargs)
    svc = serve.CwmService(G, img_size, engine='fast', batch_window_ms=0,
                           seed=0, max_batch_samples=max(args.num_samples,
                                                         16))
    build_sec = time.perf_counter() - t0

    log(f'build {time.perf_counter() - t0:.1f}s; warming up...')
    t0 = time.perf_counter()
    warmed = svc.warmup(buckets=(args.num_samples,), log=log)
    warmup_sec = time.perf_counter() - t0
    log(f'warmup {warmup_sec:.1f}s ({len(warmed)} programs)')

    grid = G.mask_shape[-1]
    rng = np.random.RandomState(3)
    img = rng.rand(img_size, img_size, 3).astype(np.float32)
    img = img.round(3).tolist()

    per_size = {}
    for k in range(1, args.max_prompt + 1):
        # k distinct patch coordinates (row-major over the grid)
        coords = [[j // grid, j % grid] for j in range(k)]
        req = {'image': img, 'active': coords, 'shift': [0, 1],
               'num_samples': args.num_samples}
        t0 = time.perf_counter()
        out = svc.counterfactual(dict(req))
        dt = time.perf_counter() - t0
        per_size[k] = round(dt, 3)
        log(f'prompt size {k}: first request {dt:.3f}s')
        assert 'segment_raw' in out, out.keys()
    worst = max(per_size.values())

    rec = {'serve_first_request_by_prompt_size': {
        'model': model, 'img_size': img_size, 'engine': 'fast',
        'num_samples': args.num_samples,
        'build_sec': round(build_sec, 2),
        'warmup_sec': round(warmup_sec, 2),
        'warmup_programs': len(warmed),
        'first_request_sec_by_prompt_size': per_size,
        'worst_first_request_sec': worst,
        'target_met_lt_1s': bool(worst < 1.0) if on_tpu else None,
        'note': ('one counterfactual request per prompt size after the '
                 'bucket warmup (fast_vmae.sfx_bucket: sizes 1-4 / 5-8 / '
                 '9-16 share the width-4/8/16 programs); first request at '
                 'every size must hit an already-compiled program'),
    }}
    line = json.dumps(rec)
    print(line)
    if args.out:
        with open(args.out, 'w') as f:
            f.write(line + '\n')


if __name__ == '__main__':
    main()
