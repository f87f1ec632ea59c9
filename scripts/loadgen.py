"""Serving load generator: counterfactual requests/sec under concurrency.

Drives scripts/serve.py's service surface in-process (no HTTP overhead)
with N concurrent client threads issuing counterfactual requests on a
small pool of scenes, with micro-batching ON vs OFF, and prints one JSON
line with the throughput of each and the merge counters. The reference
has no serving layer; this quantifies the TPU-native batching win
(concurrent same-scene prompts concatenate along the fast engine's S
axis — utils/batching.py).

Usage:
  python scripts/loadgen.py [--clients 8] [--requests 64] [--scenes 2]
                            [--model tiny|base|large] [--img-size 224]
                            [--samples 4] [--out SERVING_rNN.json]
"""
import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def run_trial(service, reqs, clients):
    """Issue reqs round-robin from `clients` threads; returns elapsed s."""
    errors = []
    idx = {'i': 0}
    lock = threading.Lock()

    def worker():
        while True:
            with lock:
                if idx['i'] >= len(reqs):
                    return
                my = reqs[idx['i']]
                idx['i'] += 1
            try:
                service.counterfactual(my)
            except Exception as e:    # pragma: no cover
                errors.append(e)
                return

    t0 = time.perf_counter()
    ts = [threading.Thread(target=worker) for _ in range(clients)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    dt = time.perf_counter() - t0
    if errors:
        raise errors[0]
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--clients', type=int, default=8)
    ap.add_argument('--requests', type=int, default=64)
    ap.add_argument('--scenes', type=int, default=2)
    ap.add_argument('--samples', type=int, default=4,
                    help='num_samples per request')
    ap.add_argument('--model', default=None,
                    help='tiny|base|large (default: base on TPU, tiny off)')
    ap.add_argument('--img-size', type=int, default=0,
                    help='default: 224 on TPU, 32 off')
    ap.add_argument('--batch-window-ms', type=float, default=5.0)
    ap.add_argument('--max-scene-batch', type=int, default=8,
                    help='cap per MIXED-scene dispatch (see serve.py)')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--out', default=None)
    args = ap.parse_args()

    from counterfactualworldmodels_tpu.utils.backend_guard import (
        ensure_live_backend)
    ensure_live_backend(__file__)
    import numpy as np
    import jax
    from counterfactualworldmodels_tpu.utils.cache import (
        enable_persistent_cache)
    enable_persistent_cache()
    import serve

    on_tpu = jax.default_backend() == 'tpu'
    model = args.model or ('base' if on_tpu else 'tiny')
    img_size = args.img_size or (224 if on_tpu else 32)
    gargs = serve.argparse.Namespace(
        model=model, img_size=img_size, params=None, raft_params=None,
        raft_iters=24 if on_tpu else 1, port=0, host='127.0.0.1',
        seed=args.seed)
    G = serve.build_generator(gargs)

    rng = np.random.RandomState(args.seed)
    grid = G.mask_shape[-1]
    scenes = [rng.rand(img_size, img_size, 3).round(3).tolist()
              for _ in range(args.scenes)]
    reqs = []
    for i in range(args.requests):
        reqs.append({'image': scenes[i % args.scenes],
                     'active': [[int(rng.randint(grid)),
                                 int(rng.randint(grid))]],
                     'shift': [0, 2], 'num_samples': args.samples})

    results = {}
    for label, window in (('batched', args.batch_window_ms), ('serial', 0)):
        service = serve.CwmService(
            G, img_size, engine='fast', batch_window_ms=window,
            prefix_cache_size=max(4, args.scenes), seed=args.seed,
            max_scene_batch=args.max_scene_batch)
        # warm every compile shape out of the timed region
        run_trial(service, reqs[:2 * args.clients], args.clients)
        dt = run_trial(service, reqs, args.clients)
        b = service._batcher
        results[label] = {
            'requests_per_sec': round(len(reqs) / dt, 3),
            'sims_per_sec': round(len(reqs) * args.samples / dt, 3),
            # the service auto-degrades to 'exact' on a fast-engine
            # failure; record what actually served the trial
            'engine': service.engine,
            'micro_batching': (None if b is None else
                               {'dispatches': b.batches,
                                'requests_batched': b.batched_items,
                                'scene_batches': service.scene_batches}),
        }

    rec = {
        'metric': 'serving counterfactual requests/sec '
                  f'({args.clients} clients, {args.scenes} scenes)',
        'value': results['batched']['requests_per_sec'],
        'unit': 'requests/sec',
        'speedup_vs_serial':
            round(results['batched']['requests_per_sec'] /
                  max(results['serial']['requests_per_sec'], 1e-9), 2),
        'config': {'model': model, 'img_size': img_size,
                   'samples': args.samples, 'requests': args.requests,
                   'clients': args.clients,
                   'batch_window_ms': args.batch_window_ms,
                   'backend': jax.default_backend()},
        'trials': results,
    }
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == '__main__':
    main()
