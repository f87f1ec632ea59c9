"""Golden parity for perturbations and the prediction pipeline."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reference_shims import install as install_reference
install_reference()

import torch  # noqa: E402

from counterfactualworldmodels_tpu.models import vmae as jvmae  # noqa: E402
from counterfactualworldmodels_tpu.pipelines import perturbation as jperturb  # noqa: E402
from counterfactualworldmodels_tpu.pipelines.prediction import (  # noqa: E402
    PredictorBasedGenerator, predict_video, scatter_pred_patches)
from counterfactualworldmodels_tpu.utils.torch_convert import convert_vmae  # noqa: E402


PS = (1, 4, 4)


def _video(b=1, t=2, c=3, hw=16, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(b, t, c, hw, hw).astype(np.float32)


def _mask(rng, b, n, n_vis):
    m = np.ones((b, n), dtype=bool)
    for i in range(b):
        m[i, rng.choice(n, n_vis, replace=False)] = False
    return m


def test_translate2d():
    x = jnp.arange(16.0).reshape(4, 4)
    out = np.asarray(jperturb.translate2d(x, (1, 2), fill=0.0))
    assert out[0, 0] == 0 and out[0, 1] == 0
    assert out[1, 2] == 0.0  # row 0 shifted down, cols shifted right by 2
    np.testing.assert_array_equal(out[1, 2:], np.asarray([0., 1.]))
    # negative shift
    out2 = np.asarray(jperturb.translate2d(x, (-1, 0), fill=7.0))
    np.testing.assert_array_equal(out2[3], np.asarray([7., 7., 7., 7.]))
    np.testing.assert_array_equal(out2[0], np.asarray([4., 5., 6., 7.]))


def test_make_static_matches_reference():
    from cwm.models.perturbation import MakeStatic
    x = _video(2, 2, 3, 16)
    rng = np.random.RandomState(0)
    mask = _mask(rng, 2, 2 * 16, 6)  # (T=2)*(4x4 grid)=32 patches
    ref_op = MakeStatic(patch_size=PS)
    x_ref, m_ref = ref_op(torch.tensor(x), torch.tensor(mask))
    mine = np.asarray(jperturb.make_static(jnp.asarray(x), jnp.asarray(mask), PS))
    np.testing.assert_allclose(mine, x_ref.numpy(), atol=1e-6)
    np.testing.assert_array_equal(mask, m_ref.numpy())


@pytest.mark.parametrize('shift', [(1, 2), (-2, 1), (0, -3)])
def test_shift_matches_reference(shift):
    from cwm.models.perturbation import ShiftPatchesAndMask
    x = _video(1, 2, 3, 16, seed=1)
    rng = np.random.RandomState(1)
    # active mask: a few visible patches in frame 1
    mask = np.ones((1, 32), dtype=bool)
    mask[0, [16 + 5, 16 + 9]] = False

    ref_op = ShiftPatchesAndMask(patch_size=PS, padding_mode='constant',
                                 allow_fractional_shifts=False)
    ref_op.set_shapes(torch.tensor(x), torch.tensor(mask))
    x_ref, m_ref = ref_op.perturb(torch.tensor(x), torch.tensor(mask),
                                  mask_shift=shift, frame=-1)

    mask_f1 = jnp.asarray(mask.reshape(2, 4, 4)[1])
    x_out, m_shift = jperturb.shift_frame_and_mask(
        jnp.asarray(x[0]), mask_f1, jnp.asarray(shift), PS, frame=1)
    np.testing.assert_allclose(np.asarray(x_out), x_ref.numpy()[0], atol=1e-6)
    ref_m = m_ref.numpy().reshape(2, 4, 4)
    np.testing.assert_array_equal(np.asarray(m_shift), ref_m[1])
    np.testing.assert_array_equal(mask.reshape(2, 4, 4)[0], ref_m[0])


def test_motion_counterfactual_matches_reference():
    """Full counterfactual construction vs the reference forward() chain,
    with a shift that doesn't clip (rectangularization is then a no-op)."""
    from cwm.models.perturbation import ShiftPatchesAndMask
    x = _video(1, 2, 3, 16, seed=2)
    passive = np.ones((1, 32), dtype=bool)
    passive[0, 16 + 2] = False
    active = np.ones((1, 32), dtype=bool)
    active[0, 16 + 5] = False  # patch (1,1) in frame 1
    shift = (1, 1)

    ref_op = ShiftPatchesAndMask(patch_size=PS, padding_mode='constant',
                                 allow_fractional_shifts=False)
    ref_op.set_shapes(torch.tensor(x), torch.tensor(passive))
    x_ref, m_ref = ref_op(
        torch.tensor(x),
        mask=torch.minimum(torch.tensor(passive), torch.tensor(active)),
        perturbation_points=torch.logical_not(torch.tensor(active)),
        mask_shift=shift, frame=1)

    x_mine, m_mine = jperturb.make_motion_counterfactual(
        jnp.asarray(x[0]), jnp.asarray(passive[0]), jnp.asarray(active[0]),
        jnp.asarray(shift), jax.random.PRNGKey(0), PS,
        n_vis_target=None, fix_passive=False)
    np.testing.assert_allclose(np.asarray(x_mine), x_ref.numpy()[0], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m_mine), m_ref.numpy()[0])
    # with matching n_vis target the mask is unchanged (no clipping)
    x2, m2 = jperturb.make_motion_counterfactual(
        jnp.asarray(x[0]), jnp.asarray(passive[0]), jnp.asarray(active[0]),
        jnp.asarray(shift), jax.random.PRNGKey(0), PS,
        n_vis_target=int((~np.asarray(m_mine)).sum()), fix_passive=False)
    np.testing.assert_array_equal(np.asarray(m2), m_ref.numpy()[0])


def _wrapped_pair(img_size=16, patch=4):
    """(reference generator, my generator) with identical weights."""
    from cwm.models.VideoMAE.vmae import PretrainVisionTransformer as TorchPVT
    from cwm.models.prediction import PredictorBasedGenerator as RefGen
    torch.manual_seed(0)
    tmodel = TorchPVT(
        img_size=img_size, patch_size=(patch, patch), encoder_embed_dim=48,
        encoder_depth=2, encoder_num_heads=4, encoder_num_classes=0,
        decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
        mlp_ratio=2, qkv_bias=True, num_frames=2, tubelet_size=1,
        decoder_num_classes=3 * patch * patch,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6)).eval()
    ref = RefGen(predictor=tmodel, imagenet_normalize_inputs=True,
                 temporal_dim=2, seed=0)
    jmodel = jvmae.PretrainVisionTransformer(
        img_size=(img_size, img_size), patch_size=(patch, patch),
        encoder_embed_dim=48, encoder_depth=2, encoder_num_heads=4,
        decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
        mlp_ratio=2.0, qkv_bias=True, num_frames=2, tubelet_size=1)
    mine = PredictorBasedGenerator(predictor=jmodel,
                                   params=convert_vmae(tmodel.state_dict()),
                                   imagenet_normalize_inputs=True, seed=0)
    return ref, mine


def test_predict_matches_reference():
    ref, mine = _wrapped_pair()
    x = _video(1, 2, 3, 16, seed=3)
    rng = np.random.RandomState(4)
    mask = _mask(rng, 1, 32, 12)
    with torch.no_grad():
        y_ref = ref.predict(torch.tensor(x), torch.tensor(mask),
                            frame=-1).numpy()
    y = np.asarray(mine.predict(jnp.asarray(x), jnp.asarray(mask), frame=-1))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=5e-4)


def test_predict_per_sample_matches_reference():
    ref, mine = _wrapped_pair()
    x = _video(1, 2, 3, 16, seed=5)
    rng = np.random.RandomState(6)
    masks = np.stack([_mask(rng, 1, 32, 10)[0] for _ in range(3)], -1)[None][0]
    masks = masks[None]  # [1, 32, 3]
    with torch.no_grad():
        y_ref = ref.predict_per_sample(torch.tensor(x), torch.tensor(masks),
                                       frame=None, split_samples=True).numpy()
    y = np.asarray(mine.predict_per_sample(jnp.asarray(x), jnp.asarray(masks),
                                           frame=None, split_samples=True))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=5e-4)


def test_counterfactual_prediction_matches_reference():
    ref, mine = _wrapped_pair()
    x = _video(1, 1, 3, 16, seed=7)  # single frame -> static movie
    # passive mask: all masked in frame 1; active: one patch
    mask = np.ones((1, 32), dtype=bool)
    mask[0, :16] = False
    active = np.ones((1, 32), dtype=bool)
    active[0, 16 + 5] = False
    shift = (1, 1)
    with torch.no_grad():
        y_ref = ref.get_counterfactual_prediction(
            torch.tensor(x), mask=torch.tensor(mask),
            active_patches=torch.tensor(active), shift=shift,
            fix_passive=True).numpy()
    y = np.asarray(mine.get_counterfactual_prediction(
        jnp.asarray(x), mask=jnp.asarray(mask),
        active_patches=jnp.asarray(active), shift=shift, fix_passive=True))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=5e-4)


def test_predict_ragged_masks_equalized():
    _, mine = _wrapped_pair()
    x = _video(2, 2, 3, 16, seed=8)
    rng = np.random.RandomState(9)
    mask = np.ones((2, 32), dtype=bool)
    mask[0, rng.choice(32, 8, replace=False)] = False
    mask[1, rng.choice(32, 12, replace=False)] = False
    y = mine.predict(jnp.asarray(x), jnp.asarray(mask), frame=-1)
    assert y.shape == (2, 1, 3, 16, 16)
    assert np.isfinite(np.asarray(y)).all()


def test_shift_patches_content_only_matches_reference():
    from cwm.models.perturbation import ShiftPatches
    x = _video(1, 2, 3, 16, seed=11)
    mask = np.ones((1, 32), dtype=bool)
    mask[0, 16 + 5] = False
    mask[0, 16 + 9] = False
    ref_op = ShiftPatches(patch_size=PS, padding_mode='constant')
    ref_op.set_shapes(torch.tensor(x), torch.tensor(mask))
    x_ref, m_ref = ref_op.perturb(torch.tensor(x), torch.tensor(mask),
                                  mask_shift=(1, 1), frame=-1)
    x_mine, m_mine = jperturb.shift_patches(jnp.asarray(x), jnp.asarray(mask),
                                            (1, 1), PS, frame=1)
    np.testing.assert_allclose(np.asarray(x_mine), x_ref.numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m_mine), m_ref.numpy())


def test_shuffle_perturbations_invariants():
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.rand(2, 2, 3, 16, 16).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, 32) > 0.5)
    key = jax.random.PRNGKey(0)

    # shuffle_visible: multiset of frame-1 patches preserved; masked patches
    # keep their exact content
    y, m = jperturb.shuffle_visible(key, x, mask, PS, frame=-1)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(mask))
    from counterfactualworldmodels_tpu.ops.patches import patchify
    p_in = np.asarray(patchify(x, PS, temporal_dim=1))[:, 16:]
    p_out = np.asarray(patchify(y, PS, temporal_dim=1))[:, 16:]
    for b in range(2):
        np.testing.assert_allclose(np.sort(p_out[b].ravel()),
                                   np.sort(p_in[b].ravel()), atol=1e-6)
        mk = np.asarray(mask).reshape(2, 2, 16)[b, 1]
        np.testing.assert_allclose(p_out[b][mk], p_in[b][mk], atol=1e-6)

    # shuffle_all: masked keep content, visible may change but values come
    # from the frame's own patches
    y2, _ = jperturb.shuffle_all(key, x, mask, PS, frame=-1)
    p_out2 = np.asarray(patchify(y2, PS, temporal_dim=1))[:, 16:]
    for b in range(2):
        mk = np.asarray(mask).reshape(2, 2, 16)[b, 1]
        np.testing.assert_allclose(p_out2[b][mk], p_in[b][mk], atol=1e-6)
        in_set = {tuple(np.round(v, 5)) for v in p_in[b]}
        for v in p_out2[b]:
            assert tuple(np.round(v, 5)) in in_set

    # shuffle_invisible: visible patches replaced by invisible content
    y3, _ = jperturb.shuffle_invisible(key, x, mask, PS, frame=-1)
    p_out3 = np.asarray(patchify(y3, PS, temporal_dim=1))[:, 16:]
    for b in range(2):
        mk = np.asarray(mask).reshape(2, 2, 16)[b, 1]
        np.testing.assert_allclose(p_out3[b][mk], p_in[b][mk], atol=1e-6)
        invis_set = {tuple(np.round(v, 5)) for v in p_in[b][mk]}
        for v in p_out3[b][~mk]:
            assert tuple(np.round(v, 5)) in invis_set


def test_add_markers():
    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.rand(1, 2, 3, 16, 16).astype(np.float32))
    y, mask = jperturb.add_markers(x, [(0, 1, 1, 2)], PS,
                                   marker_color=(1, 0, 0))
    y = np.asarray(y)
    np.testing.assert_allclose(y[0, 1, 0, 4:8, 8:12], 1.0)
    np.testing.assert_allclose(y[0, 1, 1, 4:8, 8:12], 0.0)
    assert not np.asarray(mask)[0, 16 + 1 * 4 + 2]
    # everything else untouched
    y_rest = y.copy(); y_rest[0, 1, :, 4:8, 8:12] = np.asarray(x)[0, 1, :, 4:8, 8:12]
    np.testing.assert_allclose(y_rest, np.asarray(x), atol=1e-6)


def test_multi_shift_matches_reference():
    """Sequential per-group pixel shifts (reference MultiShiftPatchesAndMask,
    perturbation.py:644-779)."""
    from cwm.models.perturbation import MultiShiftPatchesAndMask
    x = _video(1, 2, 3, 16, seed=4)
    n = 32
    # two shift groups, each moving one frame-1 patch
    pp = np.ones((1, n, 2), dtype=bool)
    pp[0, 16 + 5, 0] = False
    pp[0, 16 + 10, 1] = False
    base = np.ones((1, n), dtype=bool)
    base[0, :16] = False
    masks = np.tile(base[..., None], (1, 1, 2))
    shifts_px = np.asarray([[4, 4], [-4, 8]])  # pixel units (patch = 4)

    class _FixedMultiShift(MultiShiftPatchesAndMask):
        # reference bug: _check_shapes (perturbation.py:666-682) assigns to
        # the read-only property num_shifts and crashes with an explicit
        # mask_sequence; route through set_num_shifts instead
        def _check_shapes(self, x, mask_sequence):
            if mask_sequence is None:
                return self.set_num_shifts(1)
            if isinstance(mask_sequence, (list, tuple)):
                mask_sequence = torch.stack(mask_sequence, -1)
            if mask_sequence.dim() == 2:
                self.inp_mask_shape = mask_sequence.shape
                self.set_num_shifts(1)
            else:
                self.inp_mask_shape = mask_sequence.shape[:-1]
                self.set_num_shifts(mask_sequence.size(-1))

    ref_op = _FixedMultiShift(patch_size=PS, padding_mode='constant',
                              allow_fractional_shifts=True)
    x_ref, m_ref = ref_op(
        torch.tensor(x), mask_sequence=torch.tensor(masks),
        perturbation_points_sequence=torch.tensor(pp),
        shift_sequence=[list(s) for s in shifts_px], frame=1)

    x_mine, m_mine = jperturb.multi_shift_patches_and_mask(
        jnp.asarray(x), jnp.asarray(masks), jnp.asarray(pp),
        jnp.asarray(shifts_px), PS, frame=1)
    np.testing.assert_allclose(np.asarray(x_mine), x_ref.numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m_mine), m_ref.numpy())


def test_predict_counterfactuals_matches_fused_step():
    """The standalone jitted counterfactual-prediction API (no RAFT)
    produces the same videos and masks as the fused
    segmentation.counterfactual_videos_and_flows step given identical
    prompts and keys."""
    from counterfactualworldmodels_tpu.models.raft.raft import (
        RAFT, init_raft_params)
    from counterfactualworldmodels_tpu.pipelines.prediction import (
        predict_counterfactuals)
    from counterfactualworldmodels_tpu.pipelines.segmentation import (
        counterfactual_videos_and_flows)

    model = jvmae.PretrainVisionTransformer(
        img_size=(16, 16), patch_size=(4, 4), encoder_embed_dim=48,
        encoder_depth=2, encoder_num_heads=2, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2, num_frames=2)
    params = jvmae.init_params(model, jax.random.PRNGKey(0))
    rng = np.random.RandomState(4)
    x = jnp.asarray(_video(b=1, hw=16, seed=4))
    n = model.num_patches
    s = 2
    passive = np.ones((1, n, s), bool)
    active = np.ones((1, n, s), bool)
    passive[:, :n // 2] = False
    active[:, :n // 2] = False
    for j in range(s):
        active[0, n // 2 + rng.choice(n // 2, 2, replace=False), j] = False
    shifts = jnp.asarray(rng.randint(-1, 2, (1, s, 2)), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(7), s)[None]
    n_vis = n // 2 + 2

    vids, x_mocos, masks = predict_counterfactuals(
        model, params, x, jnp.asarray(passive), n_vis, True, None,
        jnp.asarray(active), shifts, s, keys=keys)

    raft = RAFT(iters=1)
    raft_params = init_raft_params(raft, jax.random.PRNGKey(1), hw=64)
    y_ref, _, masks_ref = counterfactual_videos_and_flows(
        model, params, raft, raft_params, x, jnp.asarray(passive),
        jnp.asarray(active), shifts, keys, n_vis, True, 1, True)
    np.testing.assert_array_equal(np.asarray(masks), np.asarray(masks_ref))
    np.testing.assert_allclose(np.asarray(vids), np.asarray(y_ref),
                               atol=1e-5)


# ---------------------------------------------------------------------------
# wrapper-method parity (reference prediction.py:75-214, 245-259, 372-701)
# ---------------------------------------------------------------------------

def test_temporal_dim_properties_match_reference():
    ref, mine = _wrapped_pair()
    assert (ref.t_dim, ref.c_dim) == (mine.t_dim, mine.c_dim) == (2, 1)
    ref.set_temporal_dim(1)
    mine.set_temporal_dim(1)
    assert (ref.t_dim, ref.c_dim) == (mine.t_dim, mine.c_dim) == (1, 2)
    mine.set_temporal_dim(2)
    with pytest.raises(ValueError):
        mine.set_temporal_dim(3)


def test_set_and_load_predictor():
    _, mine = _wrapped_pair()
    old_params = mine.params
    model2 = jvmae.PretrainVisionTransformer(
        img_size=(16, 16), patch_size=(4, 4), encoder_embed_dim=48,
        encoder_depth=2, encoder_num_heads=4, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2, mlp_ratio=2.0, qkv_bias=True,
        num_frames=2, tubelet_size=1)
    mine.set_input(jnp.asarray(_video(1, 2, 3, 16)))
    mine.set_predictor(model2)           # no path -> weights kept
    assert mine.predictor is model2
    assert mine.params is old_params     # reference's no-path branch
    assert mine.x is None and mine.mask is None
    mine.load_predictor(None)            # explicit no-op
    assert mine.params is old_params
    # reset_padding_masks is a documented no-op (in-program padding)
    mine.reset_padding_masks()


def test_set_image_size_static_shapes():
    _, mine = _wrapped_pair()
    mine.set_image_size((16, 16))        # matches the build size
    with pytest.raises(ValueError):
        mine.set_image_size((32, 32))    # static XLA shapes


def test_pred_patches_to_video_matches_reference():
    ref, mine = _wrapped_pair()
    x = _video(1, 2, 3, 16, seed=11)
    rng = np.random.RandomState(11)
    mask = _mask(rng, 1, 32, 12)
    n_masked = 32 - 12
    y = rng.rand(1, n_masked, 3 * 4 * 4).astype(np.float32)
    ref_v = ref.pred_patches_to_video(torch.tensor(y), torch.tensor(x),
                                      torch.tensor(mask)).numpy()
    mine_v = np.asarray(mine.pred_patches_to_video(
        jnp.asarray(y), jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(mine_v, ref_v, atol=1e-6)


def test_predict_and_error_with_mask_match_reference():
    ref, mine = _wrapped_pair()
    x = _video(1, 2, 3, 16, seed=12)
    rng = np.random.RandomState(12)
    mask = _mask(rng, 1, 32, 12)
    ref.set_input(torch.tensor(x))
    mine.set_input(jnp.asarray(x))
    with torch.no_grad():
        y_ref = ref.predict_with_mask(torch.tensor(mask)).numpy()
        e_ref = ref.error_with_mask(torch.tensor(mask)).numpy()
    y = np.asarray(mine.predict_with_mask(jnp.asarray(mask)))
    e = np.asarray(mine.error_with_mask(jnp.asarray(mask)))
    np.testing.assert_allclose(y, y_ref, atol=5e-4)
    np.testing.assert_allclose(e, e_ref, atol=5e-4)
    with pytest.raises(NotImplementedError):
        mine.get_initial_mask(x)
    # single-frame prediction + intermediate frame: the reference raises
    # (jnp would silently clamp the index — guard restores the error)
    with pytest.raises(IndexError):
        mine.error_with_mask(jnp.asarray(mask), frame=1)


def test_invert_mask_frame_matches_reference():
    ref, mine = _wrapped_pair()
    rng = np.random.RandomState(13)
    mask = _mask(rng, 2, 32, 9)
    ref_m = ref.invert_mask_frame(torch.tensor(mask), (4, 4),
                                  frame=-1).numpy()
    my_m = np.asarray(mine.invert_mask_frame(mask, (4, 4), frame=-1))
    np.testing.assert_array_equal(my_m, ref_m)


def test_patch_idx_list_roundtrip_matches_reference():
    ref, mine = _wrapped_pair()
    rng = np.random.RandomState(14)
    mask4 = _mask(rng, 1, 32, 5).reshape(1, 2, 4, 4)
    ref_list = ref.patch_idx_list_from_mask(torch.tensor(mask4))
    my_list = mine.patch_idx_list_from_mask(mask4)
    assert [list(map(int, p)) for p in my_list] == \
        [list(map(int, p)) for p in ref_list]
    full = np.ones((1, 2, 4, 4), dtype=bool)
    ref_vis = ref.make_visible_from_patch_idx_list(
        torch.tensor(full.copy()), ref_list).numpy()
    my_vis = np.asarray(mine.make_visible_from_patch_idx_list(
        jnp.asarray(full), my_list))
    np.testing.assert_array_equal(my_vis, ref_vis)
    # revealing exactly the visible positions from a full mask reproduces it
    np.testing.assert_array_equal(my_vis, mask4)


def test_generate_and_cutout_mask_match_reference():
    ref, mine = _wrapped_pair()
    x = _video(1, 2, 3, 16, seed=15)
    ref.set_input(torch.tensor(x))
    mine.set_input(jnp.asarray(x))
    pts = [[1, 1], [2, 3]]  # patch coordinates; stride=1
    ref_m = ref.generate_mask_from_patch_idx_list(pts, stride=1).numpy()
    my_m = np.asarray(mine.generate_mask_from_patch_idx_list(pts, stride=1))
    np.testing.assert_array_equal(my_m, ref_m)
    # pixel coordinates with the default (reference-computed) stride
    ref_px = ref.generate_mask_from_patch_idx_list([[5, 9]]).numpy()
    my_px = np.asarray(mine.generate_mask_from_patch_idx_list([[5, 9]]))
    np.testing.assert_array_equal(my_px, ref_px)
    # the reference's generate_cutout_mask crashes at its own default
    # frame=-1 (`mask[:, -1:0]` is an empty slice, prediction.py:655) —
    # golden-compare at frame=1 and check our modulo fix makes the
    # default equivalent
    ref_c = ref.generate_cutout_mask(pts, radius=1, stride=1,
                                     frame=1).numpy()
    my_c = np.asarray(mine.generate_cutout_mask(pts, radius=1, stride=1,
                                                frame=1))
    np.testing.assert_array_equal(my_c, ref_c)
    my_default = np.asarray(mine.generate_cutout_mask(pts, radius=1,
                                                      stride=1))
    np.testing.assert_array_equal(my_default, my_c)


def test_shift_patches_and_mask_matches_reference():
    ref, mine = _wrapped_pair()
    x = _video(1, 2, 3, 16, seed=16)
    rng = np.random.RandomState(16)
    mask = _mask(rng, 1, 32, 8)
    # identical host RNG -> identical quantized random shift
    ref.rng = np.random.RandomState(99)
    mine.rng = np.random.RandomState(99)
    x_ref, m_ref = ref.shift_patches_and_mask(
        torch.tensor(x), torch.tensor(mask), max_shift_fraction=0.3)
    x_my, m_my = mine.shift_patches_and_mask(
        jnp.asarray(x), jnp.asarray(mask), max_shift_fraction=0.3)
    np.testing.assert_allclose(np.asarray(x_my), x_ref.numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m_my), m_ref.numpy())


def test_get_frame_pairs_matches_reference():
    ref, mine = _wrapped_pair()
    x = _video(1, 4, 3, 16, seed=17)
    ref_pairs = ref.get_frame_pairs(torch.tensor(x))
    my_pairs = mine.get_frame_pairs(jnp.asarray(x))
    assert len(my_pairs) == len(ref_pairs) == 3
    assert mine.num_frame_pairs == ref.num_frame_pairs
    assert mine.target_frame == ref.target_frame
    for mp, rp in zip(my_pairs, ref_pairs):
        np.testing.assert_allclose(np.asarray(mp), rp.numpy(), atol=1e-6)


def test_sample_tile_all_tensors():
    _, mine = _wrapped_pair()
    x = jnp.asarray(_video(2, 2, 3, 16))
    out = mine.sample_tile_all_tensors(3, x=x, flag=True)
    assert out['x'].shape == (6, 2, 3, 16, 16)
    assert out['flag'] is True
    np.testing.assert_allclose(np.asarray(out['x'][0]),
                               np.asarray(out['x'][1]))


def test_maskshow_and_forward_alias():
    import matplotlib
    matplotlib.use('Agg')
    ref, mine = _wrapped_pair()
    x = _video(1, 2, 3, 16, seed=18)
    rng = np.random.RandomState(18)
    mask = _mask(rng, 1, 32, 12)
    mine.maskshow(jnp.asarray(mask))
    with torch.no_grad():
        y_ref = ref.forward(torch.tensor(x), torch.tensor(mask)).numpy()
    y = np.asarray(mine.forward(jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(y, y_ref, atol=5e-4)


def test_mae_wrapper_normalize_roundtrip():
    from counterfactualworldmodels_tpu.pipelines.prediction import MaeWrapper
    w = MaeWrapper(predictor=None)
    rng = np.random.RandomState(19)
    x = jnp.asarray(rng.rand(2, 3, 8, 8).astype(np.float32))
    xn = w.imagenet_normalize(x)
    np.testing.assert_allclose(np.asarray(w.imagenet_unnormalize(xn)),
                               np.asarray(x), atol=1e-6)
    assert abs(float(xn.mean())) > 0.1  # actually normalized
