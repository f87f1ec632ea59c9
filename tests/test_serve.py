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


@pytest.fixture(scope='module')
def server():
    import serve
    from http.server import ThreadingHTTPServer

    args = serve.argparse.Namespace(
        model='tiny', img_size=32, params=None, raft_params=None,
        raft_iters=1, port=0, host='127.0.0.1', seed=0)
    G = serve.build_generator(args)
    service = serve.CwmService(G, args.img_size)
    httpd = ThreadingHTTPServer(('127.0.0.1', 0),
                                serve.make_handler(service, 'cpu'))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f'http://127.0.0.1:{port}'
    httpd.shutdown()


def _post(base, path, payload, timeout=600):
    req = urllib.request.Request(base + path, json.dumps(payload).encode(),
                                 {'Content-Type': 'application/json'})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


@pytest.mark.slow
def test_serve_end_to_end(server):
    with urllib.request.urlopen(server + '/health', timeout=30) as r:
        assert json.loads(r.read())['status'] == 'ok'

    rng = np.random.RandomState(0)
    img = rng.rand(32, 32, 3).round(3).tolist()

    code, out = _post(server, '/predict', {'image': img})
    assert code == 200 and 'prediction' in out

    code, out = _post(server, '/counterfactual',
                      {'image': img, 'active': [[2, 2]], 'shift': [0, 1],
                       'num_samples': 1})
    assert code == 200
    assert set(out) == {'simulation', 'flow_rgb', 'segment', 'segment_raw'}
    seg = np.asarray(out['segment_raw'])
    assert seg.shape == (32, 32) and np.isfinite(seg).all()

    # error paths
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, '/counterfactual', {'image': img})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, '/predict', {'image': [[0.1]]})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, '/nope', {})
    assert e.value.code == 404
