"""End-to-end test of the HTTP serving entry point (scripts/serve.py)."""
import json
import sys
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'scripts'))


@pytest.fixture(scope='module', params=['exact', 'fast'])
def server(request):
    import serve
    from http.server import ThreadingHTTPServer

    args = serve.argparse.Namespace(
        model='tiny', img_size=32, params=None, raft_params=None,
        raft_iters=1, port=0, host='127.0.0.1', seed=0)
    G = serve.build_generator(args)
    service = serve.CwmService(G, args.img_size, engine=request.param)
    httpd = ThreadingHTTPServer(('127.0.0.1', 0),
                                serve.make_handler(service, 'cpu'))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f'http://127.0.0.1:{port}', request.param, service
    httpd.shutdown()


def _post(base, path, payload, timeout=600):
    req = urllib.request.Request(base + path, json.dumps(payload).encode(),
                                 {'Content-Type': 'application/json'})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


@pytest.mark.slow
def test_serve_end_to_end(server):
    base, engine, service = server
    with urllib.request.urlopen(base + '/health', timeout=30) as r:
        assert json.loads(r.read())['status'] == 'ok'
    with urllib.request.urlopen(base + '/stats', timeout=30) as r:
        stats = json.loads(r.read())
        assert stats['engine'] == engine and stats['requests'] == 0

    rng = np.random.RandomState(0)
    img = rng.rand(32, 32, 3).round(3).tolist()

    code, out = _post(base, '/predict', {'image': img})
    assert code == 200 and 'prediction' in out

    code, out = _post(base, '/counterfactual',
                      {'image': img, 'active': [[2, 2]], 'shift': [0, 1],
                       'num_samples': 1})
    assert code == 200
    expect = {'simulation', 'flow_rgb', 'segment', 'segment_raw'}
    if engine == 'fast':
        expect |= {'prefix_cache_hit', 'engine', 'batched_samples'}
        assert out['prefix_cache_hit'] is False
        assert out['engine'] == 'fast'
    assert set(out) == expect
    seg = np.asarray(out['segment_raw'])
    assert seg.shape == (32, 32) and np.isfinite(seg).all()

    if engine == 'fast':
        # repeat request on the same image must hit the PrefixCache LRU
        code, out2 = _post(base, '/counterfactual',
                           {'image': img, 'active': [[2, 2]],
                            'shift': [0, 1], 'num_samples': 1})
        assert code == 200 and out2['prefix_cache_hit'] is True
        assert service.prefix_hits == 1 and service.prefix_misses == 1
        # different image -> miss
        img2 = rng.rand(32, 32, 3).round(3).tolist()
        code, out3 = _post(base, '/counterfactual',
                           {'image': img2, 'active': [[2, 2]],
                            'shift': [0, 1], 'num_samples': 1})
        assert code == 200 and out3['prefix_cache_hit'] is False

    # error paths
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, '/counterfactual', {'image': img})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, '/predict', {'image': [[0.1]]})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, '/nope', {})
    assert e.value.code == 404


@pytest.mark.slow
@pytest.mark.parametrize('engine', ['fast'])
def test_serve_imu_conditioned(engine):
    """--imu-conditioned mode: /counterfactual through the conjoined
    generator and /movability run end-to-end; engine='fast' engages the
    ConjoinedPrefixLru across repeat requests on the same image."""
    import serve
    import threading
    from http.server import ThreadingHTTPServer

    args = serve.argparse.Namespace(
        model='tiny', img_size=32, params=None, raft_params=None,
        flow2imu_params=None, raft_iters=1, port=0, host='127.0.0.1',
        seed=0, engine=engine, movability_samples=2, movability_iters=1)
    G = serve.build_imu_generator(args)
    service = serve.ImuCwmService(G, args.img_size, engine=engine)
    httpd = ThreadingHTTPServer(('127.0.0.1', 0),
                                serve.make_handler(service, 'cpu'))
    base = f'http://127.0.0.1:{httpd.server_address[1]}'
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        rng = np.random.RandomState(1)
        img = rng.rand(32, 32, 3).round(3).tolist()

        code, out = _post(base, '/counterfactual',
                          {'image': img, 'active': [[2, 2]],
                           'shift': [0, 1], 'num_samples': 2})
        assert code == 200
        assert out['imu_conditioned'] is True and out['engine'] == engine
        seg = np.asarray(out['segment_raw'])
        assert seg.shape == (32, 32) and np.isfinite(seg).all()
        if engine == 'fast':
            assert service.prefix_misses >= 1
            hits0 = service.prefix_hits
            code, _ = _post(base, '/counterfactual',
                            {'image': img, 'active': [[3, 3]],
                             'shift': [1, 0], 'num_samples': 2})
            assert code == 200 and service.prefix_hits > hits0

        code, out = _post(base, '/movability', {'image': img})
        assert code == 200
        m = np.asarray(out['movability_raw'])
        assert m.shape == (32, 32) and np.isfinite(m).all()
    finally:
        httpd.shutdown()


@pytest.mark.slow
def test_serve_fast_engine_failure_degrades(monkeypatch):
    """A fast-engine failure at request time (e.g. a kernel that fails to
    compile on this hardware) must warn, flip the service AND its
    generator to the exact engine, and still serve the request — never a
    permanent 500. Bad requests keep raising (400), not degrading."""
    import serve
    from counterfactualworldmodels_tpu.pipelines import segmentation as seg

    args = serve.argparse.Namespace(
        model='tiny', img_size=32, params=None, raft_params=None,
        raft_iters=1, port=0, host='127.0.0.1', seed=0)
    G = serve.build_generator(args)
    svc = serve.CwmService(G, 32, engine='fast', batch_window_ms=0)

    rng = np.random.RandomState(2)
    img = rng.rand(32, 32, 3).astype(np.float32).round(3).tolist()
    req = {'image': img, 'active': [[2, 2]], 'shift': [0, 1],
           'num_samples': 1}

    # a malformed request surfaces as ValueError (-> 400), engine untouched
    with pytest.raises(ValueError):
        svc.counterfactual({'image': [[0.0]], 'active': [[0, 0]]})
    assert svc.engine == 'fast'
    # parsing runs OUTSIDE the degrade try: a TypeError-shaped bad request
    # (num_samples: null) must not flip the engine either
    with pytest.raises(TypeError):
        svc.counterfactual({'image': img, 'active': [[2, 2]],
                            'num_samples': None})
    assert svc.engine == 'fast'

    def boom(*a, **k):
        raise RuntimeError('simulated mosaic compile failure')
    monkeypatch.setattr(seg, 'counterfactual_videos_and_flows_fast', boom)

    with pytest.warns(RuntimeWarning, match='degrades to the exact'):
        out = svc.counterfactual(dict(req))
    assert svc.engine == 'exact'
    assert getattr(G, '_fast_disabled', False)
    assert {'simulation', 'flow_rgb', 'segment'} <= set(out)

    # subsequent requests stay on the exact path, no further warnings
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter('error')
        out2 = svc.counterfactual(dict(req))
    assert 'segment' in out2


def test_serve_engine_label_syncs_with_generator_degrade():
    """When the GENERATOR degrades its fast engine internally (it swallows
    the failure and serves exact), the service label must follow on the
    next request so responses and /stats report the engine actually
    computing."""
    import serve

    args = serve.argparse.Namespace(
        model='tiny', img_size=32, params=None, raft_params=None,
        raft_iters=1, port=0, host='127.0.0.1', seed=0)
    G = serve.build_generator(args)
    svc = serve.CwmService(G, 32, engine='fast', batch_window_ms=0)
    G._fast_disabled = True   # as set by FlowGenerator._disable_fast_engine

    rng = np.random.RandomState(3)
    img = rng.rand(32, 32, 3).astype(np.float32).round(3).tolist()
    with pytest.warns(RuntimeWarning, match='label follows to exact'):
        out = svc.counterfactual({'image': img, 'active': [[2, 2]],
                                  'shift': [0, 1], 'num_samples': 1})
    assert svc.engine == 'exact'
    assert 'segment' in out


@pytest.mark.slow
def test_serve_micro_batching():
    """Micro-batching of concurrent same-scene counterfactuals:

    1. padding parity — a single request through a batching service
       matches the unbatched service to float tolerance (keys split by
       s_total so pad columns don't perturb sampling; XLA may still
       re-vectorize reductions for the padded batch shape);
    2. concurrent requests merge into ONE dispatch and every caller gets
       a well-formed response."""
    import serve

    args = serve.argparse.Namespace(
        model='tiny', img_size=32, params=None, raft_params=None,
        raft_iters=1, port=0, host='127.0.0.1', seed=0)
    G = serve.build_generator(args)

    rng = np.random.RandomState(1)
    img = rng.rand(32, 32, 3).astype(np.float32).round(3).tolist()
    req = {'image': img, 'active': [[2, 2]], 'shift': [0, 1],
           'num_samples': 3}

    plain = serve.CwmService(G, 32, engine='fast', batch_window_ms=0)
    batched = serve.CwmService(G, 32, engine='fast', batch_window_ms=1)
    out_plain = plain.counterfactual(dict(req))
    out_batched = batched.counterfactual(dict(req))   # padded 3 -> 4
    assert out_batched['batched_samples'] == 4
    assert 'batched_samples' not in out_plain
    np.testing.assert_allclose(np.asarray(out_plain['segment_raw']),
                               np.asarray(out_batched['segment_raw']),
                               atol=2e-3)

    # concurrent same-image requests merge into one dispatch
    svc = serve.CwmService(G, 32, engine='fast', batch_window_ms=1000)
    outs, errors = {}, []

    def worker(i):
        try:
            outs[i] = svc.counterfactual(
                {'image': img, 'active': [[i, i]], 'shift': [0, 1],
                 'num_samples': 2})
        except Exception as e:       # pragma: no cover
            errors.append(e)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in ts:
        t.start()
        import time
        time.sleep(0.05)
    for t in ts:
        t.join()
    assert not errors
    assert svc._batcher.batches == 1 and svc._batcher.batched_items == 3
    for i in range(3):
        assert outs[i]['batched_samples'] == 8   # 3*2 -> bucket 8
        seg = np.asarray(outs[i]['segment_raw'])
        assert seg.shape == (32, 32) and np.isfinite(seg).all()


@pytest.mark.slow
def test_serve_imu_micro_batching():
    """IMU-conditioned service: concurrent same-scene requests merge into
    ONE generator call (per-sample prompt columns through the public
    API), each caller gets a well-formed IMU-conditioned response."""
    import serve
    import time

    args = serve.argparse.Namespace(
        model='tiny', img_size=32, params=None, raft_params=None,
        flow2imu_params=None, raft_iters=1, port=0, host='127.0.0.1',
        seed=0, engine='fast', movability_samples=2, movability_iters=1)
    G = serve.build_imu_generator(args)
    svc = serve.ImuCwmService(G, 32, engine='fast', batch_window_ms=1000)
    rng = np.random.RandomState(3)
    img = rng.rand(32, 32, 3).astype(np.float32).round(3).tolist()
    outs, errors = {}, []

    def worker(i):
        try:
            outs[i] = svc.counterfactual(
                {'image': img, 'active': [[i, i]], 'shift': [0, 1],
                 'num_samples': 2})
        except Exception as e:       # pragma: no cover
            errors.append(e)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in ts:
        t.start()
        time.sleep(0.05)
    for t in ts:
        t.join()
    assert not errors, errors
    assert svc._batcher.batches == 1 and svc._batcher.batched_items == 3
    for i in range(3):
        assert outs[i]['imu_conditioned'] is True
        assert outs[i]['batched_samples'] == 8   # 3*2 -> bucket 8
        seg = np.asarray(outs[i]['segment_raw'])
        assert seg.shape == (32, 32) and np.isfinite(seg).all()
    # the conjoined prefix LRU was built once for the shared scene
    assert svc.prefix_misses == 1

    # mixed-image IMU requests merge into ONE stacked-cache dispatch
    imgs = [rng.rand(32, 32, 3).astype(np.float32).round(3).tolist()
            for _ in range(2)]
    outs2, errors2 = {}, []

    def worker2(i):
        try:
            outs2[i] = svc.counterfactual(
                {'image': imgs[i], 'active': [[2, 2]], 'shift': [0, 1],
                 'num_samples': 1})
        except Exception as e:       # pragma: no cover
            errors2.append(e)

    ts = [threading.Thread(target=worker2, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
        time.sleep(0.05)
    for t in ts:
        t.join()
    assert not errors2, errors2
    assert svc.scene_batches == 1
    for i in range(2):
        assert outs2[i]['imu_conditioned'] is True
        assert outs2[i]['scene_batched'] == 2
        seg = np.asarray(outs2[i]['segment_raw'])
        assert seg.shape == (32, 32) and np.isfinite(seg).all()


@pytest.mark.slow
def test_serve_mixed_scene_batching():
    """Concurrent counterfactuals on DIFFERENT images merge into ONE
    multi-scene dispatch (stacked per-sample prefix caches), and each
    response matches the same request served unbatched."""
    import serve
    import time

    args = serve.argparse.Namespace(
        model='tiny', img_size=32, params=None, raft_params=None,
        raft_iters=1, port=0, host='127.0.0.1', seed=0)
    G = serve.build_generator(args)
    rng = np.random.RandomState(2)
    imgs = [rng.rand(32, 32, 3).astype(np.float32).round(3).tolist()
            for _ in range(3)]
    reqs = [{'image': imgs[i], 'active': [[2, 2]], 'shift': [0, 1],
             'num_samples': 1} for i in range(3)]

    plain = serve.CwmService(G, 32, engine='fast', batch_window_ms=0,
                             seed=0)
    ref = [plain.counterfactual(dict(r)) for r in reqs]

    svc = serve.CwmService(G, 32, engine='fast', batch_window_ms=1000,
                           seed=0, max_scene_batch=8)
    outs, errors = {}, []

    def worker(i):
        try:
            outs[i] = svc.counterfactual(dict(reqs[i]))
        except Exception as e:       # pragma: no cover
            errors.append(e)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in ts:
        t.start()
        time.sleep(0.05)
    for t in ts:
        t.join()
    assert not errors, errors
    assert svc._batcher.batches == 1 and svc.scene_batches == 1
    for i in range(3):
        assert outs[i]['scene_batched'] == 3
        assert outs[i]['batched_samples'] == 4   # 3 samples -> bucket 4
        # the mixed-scene dispatch re-seeds per batch (req_counter=1 like
        # the plain service's first call), so sample i's response should
        # track its unbatched counterpart's SHAPE and finiteness; seg
        # values differ only by per-sample PRNG stream assignment
        seg = np.asarray(outs[i]['segment_raw'])
        assert seg.shape == (32, 32) and np.isfinite(seg).all()
    # request 0 consumed key row 0 in both services -> exact match
    np.testing.assert_allclose(np.asarray(outs[0]['segment_raw']),
                               np.asarray(ref[0]['segment_raw']),
                               atol=2e-3)


@pytest.mark.slow
def test_loadgen_smoke():
    """scripts/loadgen.py runs the batched-vs-serial serving trial and
    emits the JSON artifact line."""
    import subprocess
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env.update({'JAX_PLATFORMS': 'cpu', 'CWM_BACKEND_CHECKED': '1'})
    out = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), '..', 'scripts',
                      'loadgen.py'),
         '--clients', '3', '--requests', '9', '--scenes', '2',
         '--samples', '2'],
        env=env, capture_output=True, text=True, timeout=900)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith('{')]
    assert lines, out.stderr[-2000:]
    rec = json.loads(lines[-1])
    assert rec['value'] > 0 and rec['unit'] == 'requests/sec'
    assert rec['trials']['batched']['micro_batching']['dispatches'] > 0
    assert rec['trials']['serial']['micro_batching'] is None

def test_scene_buckets_include_cap():
    """_scene_buckets must contain max_scene_batch itself: mixed-scene
    chunks are built up to the cap, and a non-power-of-two cap (e.g. 3)
    must never pad a full chunk BELOW its own size (regression: a
    3-sample chunk was padded down to bucket 2, truncating a request)."""
    import serve
    svc = object.__new__(serve.CwmService)
    svc._s_buckets = (1, 2, 4, 8, 16, 32, 64)
    svc.max_scene_batch = 3
    assert svc._scene_buckets() == [1, 2, 3]
    svc.max_scene_batch = 8
    assert svc._scene_buckets() == [1, 2, 4, 8]
    svc.max_scene_batch = 1
    assert svc._scene_buckets() == [1]
    # sample buckets likewise include the cap itself
    assert serve.CwmService._pow2_buckets(64) == (1, 2, 4, 8, 16, 32, 64)
    assert serve.CwmService._pow2_buckets(100) == (
        1, 2, 4, 8, 16, 32, 64, 100)
    assert serve.CwmService._pow2_buckets(1) == (1,)


@pytest.mark.slow
def test_serve_mixed_scene_nonpow2_cap():
    """End-to-end: concurrent different-image requests with
    --max-scene-batch=3 merge into ONE mixed-scene dispatch padded to
    exactly 3 samples (the cap bucket), for both the plain and the
    IMU-conditioned services."""
    import serve
    import time

    rng = np.random.RandomState(7)
    imgs = [rng.rand(32, 32, 3).astype(np.float32).round(3).tolist()
            for _ in range(3)]

    def run(svc):
        outs, errors = {}, []

        def worker(i):
            try:
                outs[i] = svc.counterfactual(
                    {'image': imgs[i], 'active': [[2, 2]],
                     'shift': [0, 1], 'num_samples': 1})
            except Exception as e:   # pragma: no cover
                errors.append((i, e))

        ts = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
        for t in ts:
            t.start()
            time.sleep(0.05)
        for t in ts:
            t.join()
        assert not errors, errors
        assert svc.scene_batches == 1
        for i in range(3):
            assert outs[i]['scene_batched'] == 3
            assert outs[i]['batched_samples'] == 3   # cap bucket, no down-pad
            seg = np.asarray(outs[i]['segment_raw'])
            assert seg.shape == (32, 32) and np.isfinite(seg).all()

    args = serve.argparse.Namespace(
        model='tiny', img_size=32, params=None, raft_params=None,
        raft_iters=1, port=0, host='127.0.0.1', seed=0)
    run(serve.CwmService(serve.build_generator(args), 32, engine='fast',
                         batch_window_ms=1500, seed=0, max_scene_batch=3))

    args = serve.argparse.Namespace(
        model='tiny', img_size=32, params=None, raft_params=None,
        flow2imu_params=None, raft_iters=1, port=0, host='127.0.0.1',
        seed=0, engine='fast', movability_samples=2, movability_iters=1)
    run(serve.ImuCwmService(serve.build_imu_generator(args), 32,
                            engine='fast', batch_window_ms=1500, seed=0,
                            max_scene_batch=3))

def test_serve_warmup():
    """warmup() pre-runs one dispatch per route x bucket, then restores
    all counters and clears the prefix cache: a warmed server is
    indistinguishable from a cold one except its programs are already
    compiled (request numerics must match an un-warmed server)."""
    import serve

    args = serve.argparse.Namespace(
        model='tiny', img_size=32, params=None, raft_params=None,
        raft_iters=1, port=0, host='127.0.0.1', seed=0)
    G = serve.build_generator(args)
    svc = serve.CwmService(G, 32, engine='fast', batch_window_ms=5,
                           seed=0, max_scene_batch=4)
    warmed = svc.warmup(buckets=(1, 2), active_counts=(1, 2), log=None)
    routes = [r for (r, _, _) in warmed]
    assert routes.count('predict') == 1
    # buckets (1, 2) x prompt-patch counts (1, 2): one warmup dispatch per
    # pair (sizes 1 and 2 share the width-4 bucketed program — the second
    # dispatch is a compile-cache hit, but warmup still runs it)
    assert routes.count('counterfactual[fast]') == 4
    assert routes.count('mixed-scene') == 1              # scene bucket 2
    assert all(dt >= 0 for (_, _, dt) in warmed)
    # counters restored, caches cleared -> cold-server semantics
    assert svc._req_counter == 0 and svc.scene_batches == 0
    assert svc._batcher.batches == 0 and svc._batcher.batched_items == 0
    assert svc.prefix_hits == 0 and svc.prefix_misses == 0
    assert not svc._lru._entries
    # a real request after warmup behaves exactly like on a cold server
    rng = np.random.RandomState(11)
    img = rng.rand(32, 32, 3).astype(np.float32).round(3).tolist()
    out = svc.counterfactual({'image': img, 'active': [[2, 2]],
                              'shift': [0, 1], 'num_samples': 1})
    assert out['prefix_cache_hit'] is False and svc.prefix_misses == 1
    seg = np.asarray(out['segment_raw'])
    assert seg.shape == (32, 32) and np.isfinite(seg).all()
    # the generator's own fast routes are wired (engine flows through
    # build_generator) and over-cap sample counts are rejected up front
    assert svc.G.engine == 'fast'
    with pytest.raises(ValueError, match='num_samples'):
        svc.counterfactual({'image': img, 'active': [[2, 2]],
                            'shift': [0, 1],
                            'num_samples': svc.max_batch_samples + 1})
    with pytest.raises(ValueError, match='num_samples'):
        svc.counterfactual({'image': img, 'active': [[2, 2]],
                            'shift': [0, 1], 'num_samples': 0})


@pytest.mark.slow
def test_serve_imu_warmup():
    """ImuCwmService.warmup: warms the IMU-conditioned dispatch per
    bucket and the stacked-conjoined-cache mixed-scene route, then
    restores counters and clears the conjoined prefix LRU + the
    static-IMU cache."""
    import serve

    args = serve.argparse.Namespace(
        model='tiny', img_size=32, params=None, raft_params=None,
        flow2imu_params=None, raft_iters=1, port=0, host='127.0.0.1',
        seed=0, engine='fast', movability_samples=2, movability_iters=1)
    svc = serve.ImuCwmService(serve.build_imu_generator(args), 32,
                              engine='fast', batch_window_ms=5, seed=0,
                              max_scene_batch=4)
    # pin active_counts: warmup runs one dispatch per (S bucket,
    # prompt-size) pair, so the default (1, 5, 9) would run 2x3 = 6
    warmed = svc.warmup(buckets=(1, 2), active_counts=(1,), log=None)
    routes = [r for (r, _, _) in warmed]
    assert routes.count('counterfactual[fast]') == 2
    assert routes.count('mixed-scene') == 1
    assert svc._req_counter == 0 and svc.scene_batches == 0
    assert svc.prefix_hits == 0 and svc.prefix_misses == 0
    assert not getattr(svc, '_imu_cache', {})
    # warmed server still serves a real IMU-conditioned request
    rng = np.random.RandomState(13)
    img = rng.rand(32, 32, 3).astype(np.float32).round(3).tolist()
    out = svc.counterfactual({'image': img, 'active': [[2, 2]],
                              'shift': [0, 1], 'num_samples': 1})
    assert out['imu_conditioned'] is True and svc.prefix_misses == 1
