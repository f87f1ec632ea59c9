"""Native clip loader + flow RGB inverse tests."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from counterfactualworldmodels_tpu.data import (write_shard,
                                                read_shard_header,
                                                build_native,
                                                NativeClipLoader,
                                                PythonClipLoader)
from counterfactualworldmodels_tpu.data.utils import rgb_to_xy_flows
from counterfactualworldmodels_tpu.ops.flow_viz import flow_to_rgb


def _shard(tmp_path, n=6, t=2, h=16, w=16, c=3, seed=0):
    rng = np.random.RandomState(seed)
    clips = rng.randint(0, 256, size=(n, t, h, w, c), dtype=np.uint8)
    path = str(tmp_path / 'clips.shard')
    write_shard(path, clips)
    return path, clips


def test_shard_roundtrip(tmp_path):
    path, clips = _shard(tmp_path)
    assert read_shard_header(path) == clips.shape


def test_native_loader_matches_content(tmp_path):
    if build_native() is None:
        pytest.skip('no g++')
    path, clips = _shard(tmp_path)
    loader = NativeClipLoader(path, batch_size=4, num_threads=2, prefetch=2,
                              seed=0, shuffle=False)
    assert loader.num_clips == 6
    batch = loader.next_batch()
    assert batch.shape == (4, 2, 3, 16, 16)
    # unshuffled, uncropped: batch i == clip i / 255 in CHW
    for i in range(4):
        expect = clips[i].transpose(0, 3, 1, 2).astype(np.float32) / 255.0
        np.testing.assert_allclose(batch[i], expect, atol=1e-6)
    loader.close()


def test_native_loader_crop_and_prefetch(tmp_path):
    if build_native() is None:
        pytest.skip('no g++')
    path, clips = _shard(tmp_path, h=20, w=20)
    loader = NativeClipLoader(path, batch_size=2, crop_size=(16, 16),
                              num_threads=2, prefetch=3, seed=1,
                              hflip=True, shuffle=True)
    seen = [loader.next_batch() for _ in range(5)]
    for b in seen:
        assert b.shape == (2, 2, 3, 16, 16)
        assert b.min() >= 0 and b.max() <= 1
    # batches are deterministic per index given a seed: values are crops of
    # real clips, so every 16x16 frame must appear somewhere in some clip
    loader.close()


def test_u8_mode_matches_f32_after_device_normalize(tmp_path):
    """out_dtype='u8' + on-device u8_to_chw_01 == the f32 host path, for
    both loaders, and the native zero-copy view matches the copy path."""
    from counterfactualworldmodels_tpu.data.shards import u8_to_chw_01
    path, clips = _shard(tmp_path)
    kw = dict(batch_size=3, seed=0, shuffle=False)
    py_f = PythonClipLoader(path, out_dtype='f32', **kw)
    py_u = PythonClipLoader(path, out_dtype='u8', **kw)
    bf, bu = py_f.next_batch(), py_u.next_batch()
    assert bu.dtype == np.uint8 and bu.shape == (3, 2, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(u8_to_chw_01(bu)), bf, atol=1e-6)

    if build_native() is None:
        pytest.skip('no g++')
    nat_u = NativeClipLoader(path, num_threads=1, out_dtype='u8', **kw)
    nat_zc = NativeClipLoader(path, num_threads=1, out_dtype='u8',
                              zero_copy=True, **kw)
    nu, nz = nat_u.next_batch(), nat_zc.next_batch()
    np.testing.assert_array_equal(nu, bu)        # same unshuffled content
    np.testing.assert_array_equal(np.asarray(nz), nu)
    np.testing.assert_array_equal(nat_zc.last_indices, nat_u.last_indices)
    nz2 = nat_zc.next_batch()                    # view rotation stays valid
    np.testing.assert_array_equal(np.asarray(nz2), nat_u.next_batch())
    nat_u.close()
    nat_zc.close()


def test_u8_mode_crop_flip_matches_f32_native(tmp_path):
    """Native u8 crop+flip rows equal the native f32 decode of the same
    seed (the two decoders share RNG/crop logic exactly)."""
    if build_native() is None:
        pytest.skip('no g++')
    from counterfactualworldmodels_tpu.data.shards import u8_to_chw_01
    path, clips = _shard(tmp_path, h=20, w=20)
    kw = dict(batch_size=2, crop_size=(16, 16), num_threads=1, seed=5,
              hflip=True, shuffle=True)
    a = NativeClipLoader(path, out_dtype='f32', **kw)
    b = NativeClipLoader(path, out_dtype='u8', **kw)
    for _ in range(3):
        xf, xu = a.next_batch(), b.next_batch()
        np.testing.assert_array_equal(a.last_indices, b.last_indices)
        np.testing.assert_allclose(np.asarray(u8_to_chw_01(xu)), xf,
                                   atol=1e-6)
    a.close()
    b.close()


def test_python_loader_fallback(tmp_path):
    path, clips = _shard(tmp_path)
    loader = PythonClipLoader(path, batch_size=3, seed=0, shuffle=False)
    batch = loader.next_batch()
    assert batch.shape == (3, 2, 3, 16, 16)
    np.testing.assert_allclose(
        batch[0], clips[0].transpose(0, 3, 1, 2) / 255.0, atol=1e-6)


def test_imu_sidecar_roundtrip_and_alignment(tmp_path):
    """Sidecar rows follow the shuffle via loader.last_indices."""
    from counterfactualworldmodels_tpu.data.shards import (
        write_imu_sidecar, read_imu_sidecar)
    path, clips = _shard(tmp_path, n=6)
    assert read_imu_sidecar(path) is None
    rng = np.random.RandomState(3)
    imu = rng.randn(6, 6, 8).astype(np.float32)
    write_imu_sidecar(path, imu)
    back = read_imu_sidecar(path)
    np.testing.assert_array_equal(np.asarray(back), imu)

    loader = PythonClipLoader(path, batch_size=4, seed=0, shuffle=True)
    batch = loader.next_batch()
    ids = loader.last_indices
    assert ids.shape == (4,) and ids.max() < 6
    # each batch row's sidecar row is the IMU of its source clip
    np.testing.assert_array_equal(np.asarray(back[ids]), imu[ids])
    # row content really comes from clip ids[i] (full-frame, no crop)
    for i in range(4):
        expect = clips[ids[i]].transpose(0, 3, 1, 2).astype(np.float32) / 255.0
        np.testing.assert_allclose(batch[i], expect, atol=1e-6)


def test_imu_sidecar_length_mismatch(tmp_path):
    from counterfactualworldmodels_tpu.data.shards import write_imu_sidecar
    path, _ = _shard(tmp_path, n=6)
    with pytest.raises(AssertionError):
        write_imu_sidecar(path, np.zeros((6, 6), np.float32))  # 2-D
    # wrong clip count caught at read time
    write_imu_sidecar(path, np.zeros((5, 6, 8), np.float32))
    from counterfactualworldmodels_tpu.data.shards import read_imu_sidecar
    with pytest.raises(AssertionError):
        read_imu_sidecar(path)


def test_native_loader_ids_match_rows(tmp_path):
    if build_native() is None:
        pytest.skip('no g++')
    path, clips = _shard(tmp_path, n=6)
    loader = NativeClipLoader(path, batch_size=3, num_threads=2, prefetch=2,
                              seed=7, shuffle=True)
    for _ in range(4):
        batch = loader.next_batch()
        ids = loader.last_indices
        assert ids.shape == (3,) and ids.max() < 6
        for i in range(3):
            expect = (clips[ids[i]].transpose(0, 3, 1, 2)
                      .astype(np.float32) / 255.0)
            np.testing.assert_allclose(batch[i], expect, atol=1e-6)
    loader.close()


def test_make_shards_cli(tmp_path):
    """scripts/make_shards.py: frame-dir + npy sources -> loadable shard
    with an aligned IMU sidecar (real stream for the dir, zeros for the
    IMU-less npy rows)."""
    import subprocess
    import sys as _sys
    from PIL import Image
    from counterfactualworldmodels_tpu.data.shards import read_imu_sidecar
    rng = np.random.RandomState(0)
    fdir = tmp_path / 'framesA'
    fdir.mkdir()
    for i in range(20):
        Image.fromarray(rng.randint(0, 256, (40, 48, 3), np.uint8)).save(
            str(fdir / f'f{i:03d}.png'))
    np.save(str(tmp_path / 'framesA.imu.npy'),
            rng.randn(6, 900).astype(np.float32))
    np.save(str(tmp_path / 'clips.npy'),
            rng.randint(0, 256, (3, 2, 36, 36, 3), np.uint8))
    out = tmp_path / 'out'
    script = os.path.join(os.path.dirname(__file__), '..', 'scripts',
                          'make_shards.py')
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    env.pop('PALLAS_AXON_POOL_IPS', None)
    r = subprocess.run(
        [_sys.executable, script, str(fdir), str(tmp_path / 'clips.npy'),
         '--out-dir', str(out), '--size', '32', '--clips-per-video', '4',
         '--imu-suffix', '.imu.npy'], capture_output=True, text=True,
        env=env)
    assert r.returncode == 0, r.stderr
    shard = str(out / 'clips-00000.shard')
    assert read_shard_header(shard) == (7, 2, 32, 32, 3)
    imu = read_imu_sidecar(shard)
    assert imu.shape == (7, 6, 400)
    # frame-dir rows carry the real stream, npy rows the zero fallback
    assert np.abs(np.asarray(imu[:4])).sum() > 0
    np.testing.assert_array_equal(np.asarray(imu[4:]), 0)
    loader = PythonClipLoader(shard, batch_size=3, seed=0)
    assert loader.next_batch().shape == (3, 2, 3, 32, 32)


def test_flow_rgb_inverse():
    rng = np.random.RandomState(0)
    flow = jnp.asarray((rng.rand(2, 8, 8).astype(np.float32) - 0.5) * 2)
    rgb = flow_to_rgb(flow, max_speed=2.0)
    back = rgb_to_xy_flows(rgb, to_image_coordinates=False,
                           to_sampling_grid=True, max_speed=2.0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(flow), atol=1e-4)


@pytest.mark.slow
def test_loader_feeds_training_step(tmp_path):
    """Integration: packed shard -> (native or fallback) loader -> masked
    pretraining step; loss finite and decreasing over a few steps."""
    import jax
    import jax.numpy as jnp
    from counterfactualworldmodels_tpu.models import vmae as jvmae
    from counterfactualworldmodels_tpu.training import train as jtrain

    rng = np.random.RandomState(0)
    clips = rng.randint(0, 256, size=(8, 2, 32, 32, 3), dtype=np.uint8)
    path = str(tmp_path / 'train.shard')
    write_shard(path, clips)
    loader_cls = NativeClipLoader if build_native() else PythonClipLoader
    loader = loader_cls(path, batch_size=2, seed=0, shuffle=True)

    model = jvmae.PretrainVisionTransformer(
        img_size=(32, 32), patch_size=(8, 8), encoder_embed_dim=64,
        encoder_depth=2, encoder_num_heads=4, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2, num_frames=2)
    opt = jtrain.make_optimizer(learning_rate=1e-3, warmup_steps=1,
                                total_steps=20)
    state = jtrain.init_train_state(model, opt, jax.random.PRNGKey(0))
    mask, n_vis = jtrain.make_batch_masks(jax.random.PRNGKey(1), model,
                                          batch_size=2, mask_ratio=0.5)
    step = jax.jit(jtrain.make_train_step(model, opt, n_vis))
    losses = []
    for _ in range(6):
        batch = jnp.asarray(loader.next_batch())  # [B,T,C,H,W]
        state, metrics = step(state, batch, mask)
        losses.append(float(metrics['loss']))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
