"""Native clip loader + flow RGB inverse tests."""
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


def test_python_loader_fallback(tmp_path):
    path, clips = _shard(tmp_path)
    loader = PythonClipLoader(path, batch_size=3, seed=0, shuffle=False)
    batch = loader.next_batch()
    assert batch.shape == (3, 2, 3, 16, 16)
    np.testing.assert_allclose(
        batch[0], clips[0].transpose(0, 3, 1, 2) / 255.0, atol=1e-6)


def test_flow_rgb_inverse():
    rng = np.random.RandomState(0)
    flow = jnp.asarray((rng.rand(2, 8, 8).astype(np.float32) - 0.5) * 2)
    rgb = flow_to_rgb(flow, max_speed=2.0)
    back = rgb_to_xy_flows(rgb, to_image_coordinates=False,
                           to_sampling_grid=True, max_speed=2.0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(flow), atol=1e-4)
