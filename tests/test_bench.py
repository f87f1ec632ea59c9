"""bench.py plumbing dryruns (tiny model; the headline config needs TPU)."""
import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.join(os.path.dirname(__file__), '..')


def _run_bench(extra_env):
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env.update({'JAX_PLATFORMS': 'cpu', 'CWM_BACKEND_CHECKED': '1',
                'CWM_BENCH_MODEL': 'tiny', 'CWM_BENCH_RAFT_ITERS': '1',
                'CWM_BENCH_S': '4'})
    env.update(extra_env)
    out = subprocess.run([sys.executable, os.path.join(_REPO, 'bench.py')],
                         env=env, capture_output=True, text=True,
                         timeout=900)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith('{')]
    assert lines, out.stderr[-2000:]
    return json.loads(lines[-1])


@pytest.mark.slow
def test_bench_single_chip_dryrun():
    rec = _run_bench({})
    assert rec['value'] > 0 and rec['config']['mesh'] == 1
    assert rec['config']['engine'].startswith('shared-prefix')


@pytest.mark.slow
def test_bench_mesh_dryrun():
    """CWM_BENCH_MESH shards samples over a virtual device mesh and
    reports per-chip throughput."""
    rec = _run_bench({
        'CWM_BENCH_MESH': '4',
        'XLA_FLAGS': '--xla_force_host_platform_device_count=8'})
    assert rec['value'] > 0
    assert rec['config']['mesh'] == 4 and rec['config']['s'] == 4


@pytest.mark.slow
def test_bench_conjoined_mesh_dryrun():
    """bench_conjoined.py CWM_BENCH_MESH: samples shard over a virtual
    mesh through sharded_imu_counterfactuals_fast; per-chip sims/s."""
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env.update({'JAX_PLATFORMS': 'cpu', 'CWM_BACKEND_CHECKED': '1',
                'CWM_BENCH_MODEL': 'small', 'CWM_BENCH_RAFT_ITERS': '1',
                'CWM_BENCH_MESH': '2',
                'XLA_FLAGS': '--xla_force_host_platform_device_count=8'})
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, 'scripts',
                                      'bench_conjoined.py'),
         '--out', '/dev/null'],
        env=env, capture_output=True, text=True, timeout=900)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith('{')]
    assert lines, out.stderr[-2000:]
    rec = json.loads(lines[-1])
    assert rec['value'] > 0 and rec['config']['mesh'] == 2
    assert rec['exact_sims_per_sec'] > 0


@pytest.mark.slow
def test_train_conjoined_cli_mesh_smoke():
    """train_conjoined.py --tp routes through the sharded step on a
    virtual dp x tp mesh."""
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env.update({'JAX_PLATFORMS': 'cpu', 'CWM_BACKEND_CHECKED': '1',
                'XLA_FLAGS': '--xla_force_host_platform_device_count=4'})
    cmd = [sys.executable, os.path.join(_REPO, 'scripts',
                                        'train_conjoined.py'),
           '--synthetic', '--steps', '4', '--log-every', '2',
           '--batch-size', '4', '--img-size', '32', '--warmup-steps', '2',
           '--tp', '2']
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'mesh=dp2 x tp2' in out.stdout, out.stdout[-500:]
    recs = [json.loads(ln) for ln in out.stdout.splitlines()
            if ln.startswith('{')]
    assert recs and recs[-1]['loss'] < recs[0]['loss']


@pytest.mark.slow
def test_train_conjoined_cli_smoke(tmp_path):
    """train_conjoined.py runs on synthetic video+IMU, loss decreases,
    checkpoints + resume work."""
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    # the driver's bench env sets a single-entry worker list; the CLIs
    # must start cleanly under it (VERDICT r03 #2)
    env.update({'JAX_PLATFORMS': 'cpu', 'CWM_BACKEND_CHECKED': '1',
                'TPU_WORKER_HOSTNAMES': 'localhost'})
    ckdir = str(tmp_path / 'ck')
    cmd = [sys.executable, os.path.join(_REPO, 'scripts',
                                        'train_conjoined.py'),
           '--synthetic', '--steps', '4', '--log-every', '2',
           '--batch-size', '2', '--img-size', '64', '--warmup-steps', '2',
           '--checkpoint-dir', ckdir, '--checkpoint-every', '2']
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    recs = [json.loads(ln) for ln in out.stdout.splitlines()
            if ln.startswith('{')]
    assert recs and recs[-1]['loss'] < recs[0]['loss']
    # resume from the checkpoint
    out2 = subprocess.run(cmd[:-4] + ['--checkpoint-dir', ckdir,
                                      '--steps', '6'],
                          env=env, capture_output=True, text=True,
                          timeout=900)
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert 'resumed from step 4' in out2.stdout, out2.stdout[-500:]


@pytest.mark.slow
def test_train_cmae_cli_smoke(tmp_path):
    """train_cmae.py: synthetic smoke with checkpoints + resume, and the
    shard + RAFT-flow channel-group path."""
    import numpy as np
    from counterfactualworldmodels_tpu.data.shards import write_shard
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    # the driver's bench env sets a single-entry worker list; the CLIs
    # must start cleanly under it (VERDICT r03 #2)
    env.update({'JAX_PLATFORMS': 'cpu', 'CWM_BACKEND_CHECKED': '1',
                'TPU_WORKER_HOSTNAMES': 'localhost'})
    ckdir = str(tmp_path / 'ck')
    cmd = [sys.executable, os.path.join(_REPO, 'scripts', 'train_cmae.py'),
           '--synthetic', '--steps', '4', '--log-every', '2',
           '--batch-size', '2', '--img-size', '64', '--patch-size', '16',
           '--model', 'tiny', '--warmup-steps', '2',
           '--checkpoint-dir', ckdir, '--checkpoint-every', '2']
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    recs = [json.loads(ln) for ln in out.stdout.splitlines()
            if ln.startswith('{')]
    assert recs and recs[-1]['loss'] < recs[0]['loss']
    out2 = subprocess.run(cmd[:-4] + ['--checkpoint-dir', ckdir,
                                      '--steps', '6'],
                          env=env, capture_output=True, text=True,
                          timeout=900)
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert 'resumed from step 4' in out2.stdout, out2.stdout[-500:]

    # shard + flow group: partition gains the 2 flow channels
    rng = np.random.RandomState(0)
    shard = str(tmp_path / 'clips.shard')
    write_shard(shard, rng.randint(0, 256, (4, 2, 32, 32, 3), np.uint8))
    out3 = subprocess.run(
        [sys.executable, os.path.join(_REPO, 'scripts', 'train_cmae.py'),
         '--shard', shard, '--steps', '2', '--log-every', '1',
         '--batch-size', '2', '--img-size', '32', '--patch-size', '16',
         '--model', 'tiny', '--warmup-steps', '1', '--with-flow',
         '--raft-iters', '2'],
        env=env, capture_output=True, text=True, timeout=900)
    assert out3.returncode == 0, out3.stderr[-2000:]
    assert 'partition=(3, 2)' in out3.stdout, out3.stdout[-500:]
    recs3 = [json.loads(ln) for ln in out3.stdout.splitlines()
             if ln.startswith('{')]
    assert recs3 and all(np.isfinite(r['loss']) for r in recs3)


@pytest.mark.slow
def test_train_raft_cli_smoke(tmp_path):
    """train_raft.py: flow mode with checkpoints + resume, keypoint mode
    via npz targets."""
    import numpy as np
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    # the driver's bench env sets a single-entry worker list; the CLIs
    # must start cleanly under it (VERDICT r03 #2)
    env.update({'JAX_PLATFORMS': 'cpu', 'CWM_BACKEND_CHECKED': '1',
                'TPU_WORKER_HOSTNAMES': 'localhost'})
    ckdir = str(tmp_path / 'ck')
    cmd = [sys.executable, os.path.join(_REPO, 'scripts', 'train_raft.py'),
           '--mode', 'flow', '--synthetic', '--small', '--img-size', '64',
           '--batch-size', '2', '--iters', '2', '--steps', '4',
           '--log-every', '2', '--lr', '5e-5', '--warmup-steps', '1',
           '--checkpoint-dir', ckdir, '--checkpoint-every', '2']
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    recs = [json.loads(ln) for ln in out.stdout.splitlines()
            if ln.startswith('{')]
    assert recs and np.isfinite(recs[-1]['loss'])
    assert 'epe' in recs[-1]
    out2 = subprocess.run(cmd + ['--steps', '6'], env=env,
                          capture_output=True, text=True, timeout=900)
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert 'resumed from step 4' in out2.stdout, out2.stdout[-500:]

    npz = str(tmp_path / 'kp.npz')
    rng = np.random.RandomState(0)
    np.savez(npz, images=rng.rand(4, 3, 64, 64).astype(np.float32) * 255,
             targets=(rng.rand(4, 1, 64, 64) > 0.5).astype(np.float32))
    out3 = subprocess.run(
        [sys.executable, os.path.join(_REPO, 'scripts', 'train_raft.py'),
         '--mode', 'keypoint', '--targets', npz, '--small',
         '--img-size', '64', '--batch-size', '2', '--iters', '2',
         '--steps', '2', '--log-every', '1', '--warmup-steps', '1'],
        env=env, capture_output=True, text=True, timeout=900)
    assert out3.returncode == 0, out3.stderr[-2000:]


@pytest.mark.slow
def test_bench_train_smoke():
    """bench_train.py emits per-family records and the driver JSON line."""
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env.update({'JAX_PLATFORMS': 'cpu', 'CWM_BACKEND_CHECKED': '1',
                'CWM_TRAIN_BENCH_STEPS': '1',
                'CWM_TRAIN_BENCH_FAMILIES': 'raft'})
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, 'scripts', 'bench_train.py')],
        env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    recs = [json.loads(ln) for ln in out.stdout.splitlines()
            if ln.startswith('{')]
    fams = [r for r in recs if r.get('family') == 'raft']
    head = [r for r in recs if r.get('metric') == 'train_clips_per_sec']
    assert fams and fams[0]['pairs_per_sec'] > 0
    assert head and head[0]['value'] == fams[0]['pairs_per_sec']


@pytest.mark.slow
def test_bench_loader_smoke(tmp_path):
    """bench_loader.py measures both loaders and emits the summary line."""
    env = dict(os.environ)
    out_json = str(tmp_path / 'bl.json')
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, 'scripts', 'bench_loader.py'),
         '--clips', '32', '--hw', '64', '--batch', '8', '--seconds', '1',
         '--threads', '1', '--out', out_json],
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.load(open(out_json))
    assert rec['loaders']['python']['clips_per_sec'] > 0
    assert 'native_speedup_vs_python' in rec
