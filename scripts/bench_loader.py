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


def measure(loader, batch_shape, seconds, itemsize=4):
    it = iter(loader)
    next(it)  # warm (thread pool spin-up, page cache)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        next(it)
        n += 1
    dt = time.perf_counter() - t0
    clips = n * batch_shape[0]
    out_bytes = n * itemsize
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

    # u8 mode: crop/flip only, normalize on device (the training default)
    py8 = PythonClipLoader(shard, batch_size=args.batch, crop_size=crop,
                           out_dtype='u8')
    results['loaders']['python_u8'] = measure(py8, bshape, args.seconds,
                                              itemsize=1)
    print('python_u8:', json.dumps(results['loaders']['python_u8']),
          flush=True)

    for t in (int(v) for v in args.threads.split(',') if v):
        for mode, zc in (('f32', False), ('u8', False), ('u8', True)):
            try:
                nat = NativeClipLoader(shard, batch_size=args.batch,
                                       crop_size=crop, num_threads=t,
                                       out_dtype=mode, zero_copy=zc)
            except Exception as e:
                print(f'native unavailable ({e})', file=sys.stderr)
                break
            key = f'native_{mode}{"zc" if zc else ""}_t{t}'
            results['loaders'][key] = measure(
                nat, bshape, args.seconds, itemsize=4 if mode == 'f32' else 1)
            print(f'{key}:', json.dumps(results['loaders'][key]), flush=True)
            nat.close()

    base = results['loaders']['python']['clips_per_sec']
    best = max(v['clips_per_sec'] for v in results['loaders'].values())
    # mode-fair ratios: native vs the python loader with the SAME output
    # contract, plus the headline best-vs-legacy-python number
    nat_f32 = [v['clips_per_sec'] for k, v in results['loaders'].items()
               if k.startswith('native_f32')]
    nat_u8 = [v['clips_per_sec'] for k, v in results['loaders'].items()
              if k.startswith('native_u8')]
    if nat_f32:
        results['native_f32_speedup_vs_python_f32'] = round(
            max(nat_f32) / max(base, 1e-9), 2)
    if nat_u8:
        results['native_u8_speedup_vs_python_u8'] = round(
            max(nat_u8) / max(
                results['loaders']['python_u8']['clips_per_sec'], 1e-9), 2)
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
