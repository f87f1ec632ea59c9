#!/usr/bin/env python
"""Data-loader throughput: native C++ thread-pool loader vs Python fallback.

The reference has no data pipeline at all; this measures ours
(data/native/clip_loader.cpp vs data/shards.py PythonClipLoader) on a
generated shard — clips/s and GB/s of decoded float32 output, per thread
count. Host-side only (no TPU needed): this bounds the input side of the
training loop that bench_train.py's synthetic batches deliberately
exclude.

Usage:
    python scripts/bench_loader.py [--clips 512] [--hw 224] [--batch 32] \
        [--seconds 5] [--out BENCH_LOADER.json]
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def measure(loader, batch_shape, seconds):
    it = iter(loader)
    next(it)  # warm (thread pool spin-up, page cache)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        next(it)
        n += 1
    dt = time.perf_counter() - t0
    clips = n * batch_shape[0]
    out_bytes = n * 4
    for d in batch_shape:
        out_bytes *= d
    return {'batches': n, 'clips_per_sec': round(clips / dt, 1),
            'decoded_gb_per_sec': round(out_bytes / dt / 1e9, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--clips', type=int, default=512)
    ap.add_argument('--hw', type=int, default=224)
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--crop', type=int, default=224)
    ap.add_argument('--seconds', type=float, default=5.0)
    ap.add_argument('--threads', default='1,2,4',
                    help='native thread counts to sweep')
    ap.add_argument('--shard', default=None,
                    help='existing shard (default: generate a synthetic one)')
    ap.add_argument('--out', default=None)
    args = ap.parse_args()

    import numpy as np
    from counterfactualworldmodels_tpu.data.shards import (
        NativeClipLoader, PythonClipLoader, write_shard)

    if args.shard:
        shard = args.shard
        tmp = None
    else:
        tmp = tempfile.NamedTemporaryFile(suffix='.shard', delete=False)
        rng = np.random.RandomState(0)
        write_shard(tmp.name, rng.randint(
            0, 256, (args.clips, 2, args.hw, args.hw, 3), np.uint8))
        shard = tmp.name
    crop = (min(args.crop, args.hw),) * 2
    bshape = (args.batch, 2, 3, *crop)

    results = {'shard_clips': args.clips, 'hw': args.hw,
               'batch': args.batch, 'seconds': args.seconds, 'loaders': {}}

    py = PythonClipLoader(shard, batch_size=args.batch, crop_size=crop)
    results['loaders']['python'] = measure(py, bshape, args.seconds)
    print('python:', json.dumps(results['loaders']['python']), flush=True)

    for t in (int(v) for v in args.threads.split(',') if v):
        try:
            nat = NativeClipLoader(shard, batch_size=args.batch,
                                   crop_size=crop, num_threads=t)
        except Exception as e:
            print(f'native unavailable ({e})', file=sys.stderr)
            break
        key = f'native_t{t}'
        results['loaders'][key] = measure(nat, bshape, args.seconds)
        print(f'{key}:', json.dumps(results['loaders'][key]), flush=True)
        nat.close()

    base = results['loaders']['python']['clips_per_sec']
    best = max(v['clips_per_sec'] for v in results['loaders'].values())
    results['native_speedup_vs_python'] = round(best / max(base, 1e-9), 2)
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(results, f, indent=1)
        print(f'wrote {args.out}')
    print(json.dumps({'metric': 'loader_clips_per_sec', 'value': best,
                      'unit': 'clips/s',
                      'speedup_vs_python': results[
                          'native_speedup_vs_python']}))
    if tmp is not None:
        os.unlink(tmp.name)


if __name__ == '__main__':
    main()
