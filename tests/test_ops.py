"""Unit + golden tests for the core tensor ops layer."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from counterfactualworldmodels_tpu import ops

from reference_shims import install as install_reference
install_reference()


def test_patchify_roundtrip_video():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 2, 3, 16, 16).astype(np.float32))
    for ps in [(1, 8, 8), (1, 4, 4), (2, 8, 8)]:
        p = ops.patchify(x, ps, temporal_dim=1)
        n = ops.num_patches(x.shape, ps)
        assert p.shape == (2, n, np.prod(ps) * 3)
        x2 = ops.unpatchify(p, ps, x.shape, temporal_dim=1)
        np.testing.assert_array_equal(np.asarray(x2), np.asarray(x))


def test_patchify_roundtrip_image():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(3, 3, 32, 32).astype(np.float32))
    p = ops.patchify(x, (1, 8, 8))
    x2 = ops.unpatchify(p, (1, 8, 8), x.shape)
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(x))


def test_patchify_matches_reference():
    import torch
    from cwm.models.patches import Patchify

    rng = np.random.RandomState(2)
    x = rng.rand(2, 2, 3, 16, 16).astype(np.float32)
    for ps in [(1, 4, 4), (2, 8, 8)]:
        ref = Patchify(patch_size=ps, temporal_dim=1, squeeze_channel_dim=True)
        ref_patches = ref(torch.tensor(x)).numpy()
        mine = np.asarray(ops.patchify(jnp.asarray(x), ps, temporal_dim=1))
        np.testing.assert_allclose(mine, ref_patches, atol=0)
        # inverse
        ref_vid = ref(torch.tensor(ref_patches), to_video=True).numpy()
        mine_vid = np.asarray(ops.unpatchify(jnp.asarray(mine), ps, x.shape))
        np.testing.assert_allclose(mine_vid, ref_vid, atol=0)


def test_sinusoid_table_matches_reference():
    install_reference()
    from cwm.models.VideoMAE.utils import get_sinusoid_encoding_table
    ref = get_sinusoid_encoding_table(50, 64).numpy()
    mine = np.asarray(ops.sinusoid_encoding_table(50, 64))
    np.testing.assert_allclose(mine, ref, atol=1e-6)
    # arbitrary position list
    ref2 = get_sinusoid_encoding_table([3, 7, 11], 32).numpy()
    mine2 = np.asarray(ops.sinusoid_encoding_table([3, 7, 11], 32))
    np.testing.assert_allclose(mine2, ref2, atol=1e-6)


def test_imagenet_normalize_matches_reference():
    import torch
    from cwm.models.utils import imagenet_normalize, imagenet_unnormalize
    rng = np.random.RandomState(3)
    x = rng.rand(2, 2, 3, 8, 8).astype(np.float32)
    ref = imagenet_normalize(torch.tensor(x), temporal_dim=1).numpy()
    mine = np.asarray(ops.imagenet_normalize(jnp.asarray(x), temporal_dim=1))
    np.testing.assert_allclose(mine, ref, atol=1e-6)
    # temporal_dim=2: channels first
    xc = x.transpose(0, 2, 1, 3, 4)
    ref2 = imagenet_unnormalize(torch.tensor(xc), temporal_dim=2).numpy()
    mine2 = np.asarray(ops.imagenet_unnormalize(jnp.asarray(xc), temporal_dim=2))
    np.testing.assert_allclose(mine2, ref2, atol=1e-6)


def test_coordinate_ims_matches_reference():
    from cwm.models.utils import coordinate_ims
    ref = coordinate_ims(2, 3, [5, 7], normalize=True).numpy()
    mine = np.asarray(ops.coordinate_ims(2, 3, [5, 7], normalize=True))
    np.testing.assert_allclose(mine, ref, atol=1e-6)
    ref0 = coordinate_ims(1, 0, [4, 4], normalize=False).numpy()
    mine0 = np.asarray(ops.coordinate_ims(1, 0, [4, 4], normalize=False))
    np.testing.assert_allclose(mine0, ref0, atol=1e-6)


def test_flow_to_rgb_matches_reference():
    import torch
    from cwm.data.utils import FlowToRgb
    rng = np.random.RandomState(4)
    flow = (rng.rand(2, 2, 8, 8).astype(np.float32) - 0.5) * 4
    ref = FlowToRgb(max_speed=2.0)(torch.tensor(flow)).numpy()
    mine = np.asarray(ops.flow_to_rgb(jnp.asarray(flow), max_speed=2.0))
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_boltzmann_matches_reference():
    import torch
    from cwm.models.utils import boltzmann
    rng = np.random.RandomState(5)
    x = rng.rand(2, 1, 6, 6).astype(np.float32)
    ref = boltzmann(torch.tensor(x), beta=3.0).numpy()
    mine = np.asarray(ops.boltzmann(jnp.asarray(x), beta=3.0))
    np.testing.assert_allclose(mine, ref, atol=1e-5)
    # beta=None passthrough
    np.testing.assert_array_equal(np.asarray(ops.boltzmann(jnp.asarray(x), None)), x)


def test_sample_image_inds_distribution():
    # peaked distribution: nearly all samples land on the peak
    probs = np.full((1, 8, 8), 1e-6, dtype=np.float32)
    probs[0, 3, 5] = 1.0
    inds = ops.sample_image_inds_from_probs(
        jax.random.PRNGKey(0), jnp.asarray(probs), num_points=64)
    inds = np.asarray(inds)
    frac = np.mean((inds[0, :, 0] == 3) & (inds[0, :, 1] == 5))
    assert frac > 0.95


def test_sample_from_energy_shapes_and_support():
    probs = np.zeros((2, 1, 8, 8), dtype=np.float32)
    probs[:, 0, 2, 2] = 1.0
    probs[:, 0, 5, 5] = 1.0
    out = ops.sample_from_energy(jax.random.PRNGKey(1), jnp.asarray(probs),
                                 num_points=3, num_samples=4, binarize=True)
    out = np.asarray(out)
    assert out.shape == (8, 1, 8, 8)
    nz = np.stack(np.nonzero(out.reshape(8, 64)), -1)
    for _, lin in nz:
        assert lin in (2 * 8 + 2, 5 * 8 + 5)


def test_index_into_images():
    import torch
    from cwm.models.utils import index_into_images
    rng = np.random.RandomState(6)
    imgs = rng.rand(2, 3, 8, 8).astype(np.float32)
    inds = rng.randint(0, 8, size=(2, 5, 2)).astype(np.int64)
    ref = index_into_images(torch.tensor(imgs), torch.tensor(inds)).numpy()
    mine = np.asarray(ops.index_into_images(jnp.asarray(imgs), jnp.asarray(inds)))
    np.testing.assert_allclose(mine, ref, atol=1e-6)
