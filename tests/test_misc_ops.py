"""Golden tests for ops/misc.py against cwm/models/utils.py."""
import numpy as np
import jax.numpy as jnp
import pytest

from reference_shims import install as install_reference
install_reference()

import torch  # noqa: E402
from cwm.models import utils as ref_utils  # noqa: E402

from counterfactualworldmodels_tpu.ops import misc  # noqa: E402


def test_spatial_moments_from_local_dist():
    rng = np.random.RandomState(0)
    d = rng.rand(2, 9, 6, 5).astype(np.float32)
    ref = ref_utils.spatial_moments_from_local_dist(torch.tensor(d)).numpy()
    mine = np.asarray(misc.spatial_moments_from_local_dist(jnp.asarray(d)))
    np.testing.assert_allclose(mine, ref, atol=1e-5)

    d5 = rng.rand(2, 3, 16, 4, 4).astype(np.float32)
    ref5 = ref_utils.spatial_moments_from_local_dist(torch.tensor(d5)).numpy()
    mine5 = np.asarray(misc.spatial_moments_from_local_dist(jnp.asarray(d5)))
    np.testing.assert_allclose(mine5, ref5, atol=1e-5)


@pytest.mark.parametrize('normalize', [True, False])
def test_get_distribution_centroid(normalize):
    rng = np.random.RandomState(1)
    d = rng.rand(2, 3, 1, 8, 7).astype(np.float32)
    ref = ref_utils.get_distribution_centroid(torch.tensor(d),
                                              normalize=normalize).numpy()
    mine = np.asarray(misc.get_distribution_centroid(jnp.asarray(d),
                                                     normalize=normalize))
    np.testing.assert_allclose(mine, ref, atol=1e-5)


@pytest.mark.parametrize('scale', [True, False])
def test_soft_index(scale):
    rng = np.random.RandomState(2)
    ims = rng.rand(2, 3, 10, 12).astype(np.float32)
    if scale:
        inds = rng.uniform(-1, 1, (2, 5, 2)).astype(np.float32)
    else:
        inds = np.stack([rng.uniform(0, 9, (2, 5)),
                         rng.uniform(0, 11, (2, 5))], -1).astype(np.float32)
    ref = ref_utils.soft_index(torch.tensor(ims), torch.tensor(inds),
                               scale_by_imsize=scale).numpy()
    mine = np.asarray(misc.soft_index(jnp.asarray(ims), jnp.asarray(inds),
                                      scale_by_imsize=scale))
    np.testing.assert_allclose(mine, ref, atol=1e-4)


def test_channel_errors():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 3, 4, 4).astype(np.float32)
    y = rng.randn(2, 3, 4, 4).astype(np.float32)
    tx, ty = torch.tensor(x), torch.tensor(y)
    jx, jy = jnp.asarray(x), jnp.asarray(y)
    np.testing.assert_allclose(np.asarray(misc.channel_mse(jx, jy)),
                               ref_utils.channel_mse(tx, ty).numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(misc.channel_l1error(jx, jy)),
                               ref_utils.channel_l1error(tx, ty).numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(misc.channel_l2error(jx, jy)),
                               ref_utils.ChannelL2Error()(tx, ty).numpy(),
                               atol=1e-6)
    for backward in (False, True):
        np.testing.assert_allclose(
            np.asarray(misc.max_delta_error(jx, jy, backward=backward)),
            ref_utils.max_delta_error(tx, ty, backward=backward).numpy(),
            atol=1e-6)


def test_masked_per_pixel_and_charbonnier():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 3, 6, 6).astype(np.float32)
    y = rng.randn(2, 3, 6, 6).astype(np.float32)
    m = (rng.rand(2, 1, 6, 6) > 0.4).astype(np.float32)
    tx, ty, tm = torch.tensor(x), torch.tensor(y), torch.tensor(m)
    jx, jy, jm = jnp.asarray(x), jnp.asarray(y), jnp.asarray(m)

    ref = ref_utils.MaskedPerPixelLoss(ref_utils.l2_loss)(tx, ty, tm).item()
    mine = float(misc.masked_per_pixel_loss(jx, jy, jm, misc.l2_loss))
    np.testing.assert_allclose(mine, ref, atol=1e-6)

    ref_c = ref_utils.CharbonnierLoss()(tx, ty).numpy()
    mine_c = np.asarray(misc.charbonnier_loss(jx, jy))
    np.testing.assert_allclose(mine_c, ref_c, atol=1e-5)

    # mask=None path
    ref_n = ref_utils.MaskedPerPixelLoss(ref_utils.l1_loss)(
        tx, ty, None).item()
    mine_n = float(misc.masked_per_pixel_loss(jx, jy, None, misc.l1_loss))
    np.testing.assert_allclose(mine_n, ref_n, atol=1e-6)


def test_masked_bce_loss():
    rng = np.random.RandomState(5)
    p = rng.rand(2, 1, 5, 5).astype(np.float32)
    labels = (rng.rand(2, 1, 5, 5) > 0.5).astype(np.float32)
    m = (rng.rand(2, 1, 5, 5) > 0.3).astype(np.float32)
    ref = ref_utils.MaskedBCELoss()(torch.tensor(p), torch.tensor(labels),
                                    torch.tensor(m)).numpy()
    mine = np.asarray(misc.masked_bce_loss(jnp.asarray(p),
                                           jnp.asarray(labels),
                                           jnp.asarray(m)))
    np.testing.assert_allclose(mine, ref, atol=1e-5)

    logits = rng.randn(2, 1, 5, 5).astype(np.float32)
    ref_l = ref_utils.MaskedBCELoss(with_logits=True)(
        torch.tensor(logits), torch.tensor(labels), torch.tensor(m)).numpy()
    mine_l = np.asarray(misc.masked_bce_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(m),
        with_logits=True))
    np.testing.assert_allclose(mine_l, ref_l, atol=1e-5)


def test_weighted_softmax_and_masked_kl():
    rng = np.random.RandomState(6)
    x = rng.randn(2, 7, 10).astype(np.float32)
    m = (rng.rand(2, 7, 10) > 0.3).astype(np.float32)
    ref = ref_utils.weighted_softmax(torch.tensor(x), torch.tensor(m)).numpy()
    mine = np.asarray(misc.weighted_softmax(jnp.asarray(x), jnp.asarray(m)))
    np.testing.assert_allclose(mine, ref, atol=1e-6)

    logits = rng.randn(2, 4, 6, 6).astype(np.float32)
    labels = rng.rand(2, 4, 6, 6).astype(np.float32)
    mk = (rng.rand(2, 4, 6, 6) > 0.3).astype(np.float32)
    ref_kl = ref_utils.MaskedKLDivLoss()(
        torch.tensor(logits), torch.tensor(labels), torch.tensor(mk)).numpy()
    mine_kl = np.asarray(misc.masked_kl_div_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mk)))
    np.testing.assert_allclose(mine_kl, ref_kl, atol=1e-5)


def test_masked_sequence_loss_and_confidence():
    rng = np.random.RandomState(7)
    seq = [rng.randn(1, 3, 4, 4).astype(np.float32) for _ in range(3)]
    labels = rng.randn(1, 3, 4, 4).astype(np.float32)
    m = np.ones((1, 1, 4, 4), np.float32)
    ref = ref_utils.MaskedSequenceLoss(loss_func=ref_utils.MaskedL1Loss)(
        [torch.tensor(s) for s in seq], torch.tensor(labels),
        torch.tensor(m)).item()
    mine = float(misc.masked_sequence_loss(
        [jnp.asarray(s) for s in seq], jnp.asarray(labels), jnp.asarray(m),
        loss_func=lambda a, b, c: misc.masked_per_pixel_loss(
            a, b, c, misc.l1_loss)))
    np.testing.assert_allclose(mine, ref, atol=1e-5)

    x = rng.randn(2, 5, 8).astype(np.float32)
    ref_c = ref_utils.confidence_thresh_samples(torch.tensor(x)).numpy()
    mine_c = np.asarray(misc.confidence_thresh_samples(jnp.asarray(x)))
    np.testing.assert_array_equal(mine_c, ref_c)


def test_get_local_neighbors_and_patches():
    rng = np.random.RandomState(8)
    im = rng.randn(2, 3, 6, 7).astype(np.float32)
    for r, inv in ((1, -1.0), (2, 0.0)):
        ref = ref_utils.get_local_neighbors(torch.tensor(im), radius=r,
                                            invalid=inv,
                                            to_image=True).numpy()
        mine = np.asarray(misc.get_local_neighbors(jnp.asarray(im), radius=r,
                                                   invalid=inv,
                                                   to_image=True))
        np.testing.assert_allclose(mine, ref, atol=1e-6)
    # flat input forms
    flat = im[:, 0].reshape(2, 42)
    ref = ref_utils.get_local_neighbors(torch.tensor(flat), size=[6, 7],
                                        radius=1).numpy()
    mine = np.asarray(misc.get_local_neighbors(jnp.asarray(flat),
                                               size=(6, 7), radius=1))
    np.testing.assert_allclose(mine, ref, atol=1e-6)

    ref_p = ref_utils.get_patches(torch.tensor(im), radius=1).numpy()
    mine_p = np.asarray(misc.get_patches(jnp.asarray(im), radius=1))
    np.testing.assert_allclose(mine_p, ref_p, atol=1e-6)


def test_circular_targets():
    rng = np.random.RandomState(9)
    m = rng.randn(2, 2, 4, 4).astype(np.float32)
    for beta in (10.0, None):
        ref = ref_utils.spatial_moments_to_circular_target(
            torch.tensor(m), beta=beta).numpy()
        mine = np.asarray(misc.spatial_moments_to_circular_target(
            jnp.asarray(m), beta=beta))
        np.testing.assert_allclose(mine, ref, atol=1e-5)
    t = rng.rand(2, 8, 4, 4).astype(np.float32)
    ref = ref_utils.circular_target_to_spatial_moment(torch.tensor(t)).numpy()
    mine = np.asarray(misc.circular_target_to_spatial_moment(jnp.asarray(t)))
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_boundary_orientations_and_local_effects():
    rng = np.random.RandomState(10)
    bounds = (rng.rand(1, 1, 8, 8) > 0.7).astype(np.float32)
    energy = rng.rand(1, 1, 8, 8).astype(np.float32)
    for to_circle in (False, True):
        ref = ref_utils.estimate_boundary_orientations(
            torch.tensor(bounds), torch.tensor(energy), radius=2,
            to_circle=to_circle).numpy()
        mine = np.asarray(misc.estimate_boundary_orientations(
            jnp.asarray(bounds), jnp.asarray(energy), radius=2,
            to_circle=to_circle))
        np.testing.assert_allclose(mine, ref, atol=1e-5)

    src = rng.randn(2, 3, 6, 6).astype(np.float32)
    adj = rng.rand(2, 9, 6, 6).astype(np.float32)
    ref = ref_utils.compute_local_effects(torch.tensor(src),
                                          torch.tensor(adj)).numpy()
    mine = np.asarray(misc.compute_local_effects(jnp.asarray(src),
                                                 jnp.asarray(adj)))
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_local_average_and_mask_boundaries():
    rng = np.random.RandomState(11)
    vals = rng.randn(1, 2, 6, 6).astype(np.float32)
    excl = (rng.rand(1, 1, 6, 6) > 0.6).astype(np.float32)
    ref = ref_utils.local_average(torch.tensor(vals), torch.tensor(excl),
                                  radius=1).numpy()
    mine = np.asarray(misc.local_average(jnp.asarray(vals),
                                         jnp.asarray(excl), radius=1))
    np.testing.assert_allclose(mine, ref, atol=1e-5)

    masks = (rng.rand(1, 2, 8, 8) > 0.5).astype(np.float32)
    ref_b, _ = ref_utils.get_mask_boundaries(torch.tensor(masks))
    mine_b = np.asarray(misc.get_mask_boundaries(jnp.asarray(masks)))
    np.testing.assert_allclose(mine_b, ref_b.numpy(), atol=1e-6)
