"""Golden parity of JAX RAFT against the reference torch implementation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reference_shims import install as install_reference
install_reference()

import torch  # noqa: E402

from counterfactualworldmodels_tpu.models.raft.raft import (  # noqa: E402
    RAFT, apply_raft_video, coords_grid, convex_upsample)
from counterfactualworldmodels_tpu.models.raft import corr as jcorr  # noqa: E402
from counterfactualworldmodels_tpu.utils.torch_convert import convert_raft  # noqa: E402


def _torch_raft(output_dim=None, small=False):
    from cwm.models.raft.raft_model import RAFT as TorchRAFT, get_args
    args = get_args('')
    args.multiframe = False
    args.scale_inputs = False
    args.small = small
    args.output_dim = output_dim
    args.mixed_precision = False
    torch.manual_seed(0)
    model = TorchRAFT(args).eval()
    return model


def test_coords_grid_matches_reference():
    from cwm.models.raft.utils import coords_grid as ref_grid
    ref = ref_grid(2, 5, 7, device='cpu').numpy()  # [B,2,H,W] (x,y)
    mine = np.asarray(coords_grid(2, 5, 7))       # [B,H,W,2]
    np.testing.assert_array_equal(mine.transpose(0, 3, 1, 2), ref)


def test_bilinear_sampler_matches_grid_sample():
    torch.manual_seed(1)
    img = torch.randn(4, 1, 9, 9)
    coords = (torch.rand(4, 3, 5, 2) * 12.0) - 1.5  # includes out-of-bounds
    from cwm.models.raft.utils import bilinear_sampler
    ref = bilinear_sampler(img, coords).numpy()[:, 0]  # [4,3,5]
    mine = np.asarray(jcorr.bilinear_sample(
        jnp.asarray(img.numpy()[:, 0]),
        jnp.asarray(coords.numpy()[..., 0]),
        jnp.asarray(coords.numpy()[..., 1])))
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_corr_block_matches_reference():
    from cwm.models.raft.corr import CorrBlock
    torch.manual_seed(2)
    f1 = torch.randn(2, 16, 8, 8)
    f2 = torch.randn(2, 16, 8, 8)
    block = CorrBlock(f1, f2, num_levels=3, radius=2)
    coords = torch.rand(2, 2, 8, 8) * 7  # [B,2,H,W] (x,y)
    ref = block(coords).numpy()  # [B, L*(2r+1)^2, H, W]

    pyr = jcorr.build_pyramid(
        jcorr.all_pairs_correlation(
            jnp.asarray(f1.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(f2.numpy().transpose(0, 2, 3, 1))), 3)
    mine = np.asarray(jcorr.lookup_pyramid(
        pyr, jnp.asarray(coords.numpy().transpose(0, 2, 3, 1)), radius=2))
    np.testing.assert_allclose(mine.transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_convex_upsample_matches_reference():
    tmodel = _torch_raft()
    torch.manual_seed(3)
    flow = torch.randn(2, 2, 4, 4)
    mask = torch.randn(2, 64 * 9, 4, 4)
    ref = tmodel.upsample_flow(flow, mask).numpy()
    mine = np.asarray(convex_upsample(
        jnp.asarray(flow.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(mask.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(mine.transpose(0, 3, 1, 2), ref, atol=1e-4)


@pytest.mark.parametrize(
    'iters', [2, pytest.param(8, marks=pytest.mark.slow)])
def test_raft_forward_matches_reference(iters):
    tmodel = _torch_raft()
    jmodel = RAFT(iters=iters)
    params = convert_raft(tmodel.state_dict())

    rng = np.random.RandomState(0)
    img1 = (rng.rand(1, 3, 128, 128) * 255).astype(np.float32)
    img2 = np.roll(img1, shift=5, axis=-1) + rng.rand(1, 3, 128, 128).astype(
        np.float32)
    with torch.no_grad():
        _, ref = tmodel._forward_two_images(torch.tensor(img1),
                                            torch.tensor(img2), iters=iters,
                                            test_mode=True)
    lr, up = jmodel.apply({'params': params}, jnp.asarray(img1),
                          jnp.asarray(img2), iters)
    up = np.asarray(up)
    assert up.shape == ref.numpy().shape
    err = np.abs(up - ref.numpy()).max()
    assert err < 5e-3, err


def test_raft_keypoint_head_matches_reference():
    tmodel = _torch_raft(output_dim=1)
    jmodel = RAFT(iters=4, output_dim=1)
    params = convert_raft(tmodel.state_dict())
    rng = np.random.RandomState(1)
    img = (rng.rand(1, 3, 128, 128) * 255).astype(np.float32)
    with torch.no_grad():
        _, ref = tmodel._forward_two_images(torch.tensor(img),
                                            torch.tensor(img), iters=4,
                                            test_mode=True)
    _, up = jmodel.apply({'params': params}, jnp.asarray(img),
                         jnp.asarray(img), 4)
    assert up.shape == (1, 1, 128, 128)
    np.testing.assert_allclose(np.asarray(up), ref.numpy(), atol=5e-3)


@pytest.mark.slow
def test_raft_multiframe_video_matches_reference():
    from cwm.models.raft.raft_model import RAFT as TorchRAFT, get_args
    args = get_args('')
    args.multiframe = True
    args.scale_inputs = True
    args.small = False
    args.output_dim = None
    args.mixed_precision = False
    torch.manual_seed(0)
    tmodel = TorchRAFT(args).eval()
    tmodel.iters = 3

    jmodel = RAFT(iters=3)
    params = convert_raft(tmodel.state_dict())
    rng = np.random.RandomState(2)
    video = rng.rand(1, 3, 3, 128, 128).astype(np.float32)  # [B,T,C,H,W] in [0,1]
    with torch.no_grad():
        ref = tmodel(torch.tensor(video)).numpy()
    mine = np.asarray(apply_raft_video(jmodel, params, jnp.asarray(video),
                                       False, 3, True))
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, atol=5e-3)
    # backward flow ordering
    with torch.no_grad():
        ref_b = tmodel(torch.tensor(video), backward=True).numpy()
    mine_b = np.asarray(apply_raft_video(jmodel, params, jnp.asarray(video),
                                         True, 3, True))
    np.testing.assert_allclose(mine_b, ref_b, atol=5e-3)


def test_pallas_window_lookup_matches_gather():
    """The Pallas TPU lookup kernel (interpret mode) vs the XLA gather path."""
    from counterfactualworldmodels_tpu.models.raft import corr as jcorr
    rng = np.random.RandomState(5)
    n, h, w, r = 64, 28, 28, 4
    level = jnp.asarray(rng.randn(n, h, w).astype(np.float32))
    lp = jcorr.pad_pyramid([level], r)[0]
    x = jnp.asarray((rng.rand(n) * 40 - 6).astype(np.float32))
    y = jnp.asarray((rng.rand(n) * 40 - 6).astype(np.float32))
    ref = jcorr._window_lookup(lp, x, y, r, h, w)
    out = jcorr._window_lookup_tpu(lp, x, y, r, h, w, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_lanes_window_lookup_matches_gather():
    """The lane-parallel one-hot lookup kernel (interpret mode) vs the XLA
    gather path, including out-of-bounds windows (grid_sample zero pad)."""
    from counterfactualworldmodels_tpu.models.raft import corr as jcorr
    rng = np.random.RandomState(6)
    n, h, w, r = 96, 28, 28, 4
    level = jnp.asarray(rng.randn(n, h, w).astype(np.float32))
    lp = jcorr.pad_pyramid([level], r)[0]
    x = jnp.asarray((rng.rand(n) * 44 - 8).astype(np.float32))
    y = jnp.asarray((rng.rand(n) * 44 - 8).astype(np.float32))
    ref = jcorr._window_lookup(lp, x, y, r, h, w)
    out = jcorr._window_lookup_lanes(jnp.transpose(level, (1, 2, 0)), x, y,
                                     r, nb=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow  # composition check; the kernel itself is covered by
def test_lanes_pyramid_matches_standard():  # test_lanes_window_lookup_…
    from counterfactualworldmodels_tpu.models.raft import corr as jcorr
    rng = np.random.RandomState(7)
    corr5 = jnp.asarray(rng.randn(2, 4, 4, 7, 9).astype(np.float32))
    coords = jnp.asarray((rng.rand(2, 4, 4, 2) * 10 - 2).astype(np.float32))
    a = jcorr.lookup_pyramid(jcorr.build_pyramid(corr5, 3), coords, 3)
    b = jcorr.lookup_pyramid_lanes(jcorr.build_pyramid_lanes(corr5, 3),
                                   coords, 3, force_kernel=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # off-TPU the public API takes the equivalent gather path
    c = jcorr.lookup_pyramid_lanes(jcorr.build_pyramid_lanes(corr5, 3),
                                   coords, 3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)


def test_lookup_kernels_flagship_resolution():
    """Both TPU lookup kernels at the FLAGSHIP RAFT geometry: 224px ->
    28x28 eighth-res grid, n = 784 query pixels (the full per-sample
    correlation lookup), r=4. Tiny-n tests cannot catch grid/blocking
    bugs at the real pixel count."""
    from counterfactualworldmodels_tpu.models.raft import corr as jcorr
    rng = np.random.RandomState(8)
    n, h, w, r = 784, 28, 28, 4
    level = jnp.asarray(rng.randn(n, h, w).astype(np.float32))
    lp = jcorr.pad_pyramid([level], r)[0]
    x = jnp.asarray((rng.rand(n) * 44 - 8).astype(np.float32))
    y = jnp.asarray((rng.rand(n) * 44 - 8).astype(np.float32))
    ref = jcorr._window_lookup(lp, x, y, r, h, w)
    out_w = jcorr._window_lookup_tpu(lp, x, y, r, h, w, interpret=True)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(ref),
                               atol=1e-5)
    out_l = jcorr._window_lookup_lanes(jnp.transpose(level, (1, 2, 0)),
                                       x, y, r, nb=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(ref),
                               atol=1e-5)


def test_raft_small_forward_matches_reference():
    """Golden parity for the SMALL RAFT variant (reference forces
    corr_radius=3 when small, raft_model.py:123-127 — the port now
    resolves the same default; this path was previously untested and
    silently built a different architecture). Also covers upflow8's
    align_corners=True sampling, which only the small model uses."""
    tmodel = _torch_raft(small=True)
    jmodel = RAFT(small=True, iters=4)
    assert jmodel.radius == 3
    params = convert_raft(tmodel.state_dict(), small=True)

    rng = np.random.RandomState(1)
    # 128px minimum: smaller inputs give an 8x8 eighth-res map whose
    # 4-level pyramid bottoms out at 1x1, where the REFERENCE's grid
    # normalization divides by (size-1)=0 and goes NaN
    img1 = (rng.rand(1, 3, 128, 128) * 255).astype(np.float32)
    img2 = np.roll(img1, shift=3, axis=-1) + rng.rand(1, 3, 128, 128).astype(
        np.float32)
    with torch.no_grad():
        _, ref = tmodel._forward_two_images(torch.tensor(img1),
                                            torch.tensor(img2), iters=4,
                                            test_mode=True)
    _, up = jmodel.apply({'params': params}, jnp.asarray(img1),
                         jnp.asarray(img2), 4)
    up = np.asarray(up)
    assert up.shape == ref.numpy().shape
    err = np.abs(up - ref.numpy()).max()
    assert err < 5e-3, err
