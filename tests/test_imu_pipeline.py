"""End-to-end golden parity for the IMU-conditioned two-model pipeline."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reference_shims import install as install_reference
install_reference()

import torch  # noqa: E402

from counterfactualworldmodels_tpu.models import conjoined as jconj  # noqa: E402
from counterfactualworldmodels_tpu.models.conjoined import (  # noqa: E402
    ConjoinedVMAE, ConjoinedPredictorWrapper, StreamSpec)
from counterfactualworldmodels_tpu.models.raft.raft import RAFT  # noqa: E402
from counterfactualworldmodels_tpu.pipelines.imu import (  # noqa: E402
    ImuConditionedFlowGenerator)
from counterfactualworldmodels_tpu.utils.torch_convert import (  # noqa: E402
    convert_conjoined, convert_raft)

IMG = 128
GRID = IMG // 8        # 16x16 patches per frame
N = 2 * GRID * GRID
IMU_LEN = 32
IMU_TOKENS = 4


def _torch_raft():
    from cwm.models.raft.raft_model import RAFT as TorchRAFT, get_args
    args = get_args('')
    args.multiframe = True
    args.scale_inputs = True
    args.small = False
    args.output_dim = None
    args.mixed_precision = False
    torch.manual_seed(7)
    m = TorchRAFT(args).eval()
    m.iters = 2
    return m


def _common(depth=2):
    return dict(
        img_size=IMG, patch_size=(8, 8), num_frames=2,
        conjoin_encoder_layers=[0, -1], conjoin_decoder_layers=True,
        encoder_embed_dim=48, encoder_depth=depth, encoder_num_heads=4,
        encoder_num_classes=0, decoder_embed_dim=32, decoder_depth=2,
        decoder_num_heads=4, mlp_ratio=2, qkv_bias=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6))


def _ref_pipeline(traft):
    from cwm.models.VideoMAE.conjoined_vmae import (
        ConjoinedPretrainVisionTransformer, ConjoinedPaddedVisionTransformer,
        ImuEncoder, PaddedVisionTransformer)
    from cwm.models.VideoMAE.vmae import (PretrainVisionTransformer,
                                          PretrainVisionTransformerEncoder)
    from cwm.models import preprocessor as ref_preproc
    from cwm.models.segmentation import (
        ImuConditionedFlowGenerator as RefImuGen)

    # route the in-forward RAFT to our random-weight torch model
    ref_preproc.FramePairFlow.load_flow_model = \
        lambda self, ckpt: setattr(self, 'flow_model', traft)

    ctx_kwargs = {'encoder_func': ImuEncoder, 'tubelet_size': 8,
                  'sequence_length': IMU_LEN, 'encoder_embed_dim': 32,
                  'decoder_embed_dim': 24, 'decoder_num_classes': 48,
                  'concat_dummy_token': True}
    torch.manual_seed(0)
    flow2imu = ConjoinedPretrainVisionTransformer(
        main_input='flowback_rgb01',
        main_input_kwargs={'unnormalize': True, 'iters': 2},
        context_input='imu',
        context_input_kwargs={'sequence_length': IMU_LEN},
        main_model_kwargs={'encoder_func': PretrainVisionTransformerEncoder,
                           'tubelet_size': 1, 'decoder_num_classes': None},
        context_model_kwargs=dict(ctx_kwargs),
        **_common()).eval()

    padded_ctx = dict(ctx_kwargs)
    padded_ctx.update({'concat_dummy_token': False, 'min_padding_tokens': 0,
                       'max_padding_tokens': IMU_TOKENS})
    torch.manual_seed(1)
    imu_cond = ConjoinedPaddedVisionTransformer(
        main_model_func=PaddedVisionTransformer,
        context_model_func=PaddedVisionTransformer,
        main_input='rgb01', main_input_kwargs={'unnormalize': False},
        context_input='imu',
        context_input_kwargs={'sequence_length': IMU_LEN},
        main_model_kwargs={'encoder_func': PretrainVisionTransformerEncoder,
                           'tubelet_size': 1, 'decoder_num_classes': None,
                           'min_padding_tokens': 0, 'max_padding_tokens': 8},
        context_model_kwargs=padded_ctx,
        **_common()).eval()

    # NOTE: head_motion_kwargs must pin raft_iters too — the reference's
    # nested ImuGenerator ctor re-runs set_raft_iters(24) (its default) on
    # the *shared* RAFT module, silently overriding the parent's raft_iters.
    from cwm.models import masking as ref_masking
    gen = RefImuGen(predictor=imu_cond, head_motion_predictor=flow2imu,
                    flow_model=traft, raft_iters=2,
                    head_motion_kwargs={'head_mask_ratio': 1,
                                        'raft_iters': 2},
                    mask_generator=ref_masking.MaskingGenerator(
                        input_size=(2, GRID, GRID), mask_ratio=0,
                        always_batch=True, create_on_cpu=False),
                    imagenet_normalize_inputs=True, temporal_dim=2, seed=0)
    return gen, flow2imu, imu_cond


def _my_pipeline(flow2imu_sd, imu_cond_sd, traft_sd):
    jraft = RAFT(iters=2)
    raft_params = convert_raft(traft_sd)

    ctx = StreamSpec(is_imu=True, in_chans=6, sequence_length=IMU_LEN,
                     imu_tubelet=8, encoder_embed_dim=32, encoder_depth=2,
                     encoder_num_heads=4, decoder_embed_dim=24,
                     decoder_depth=2, decoder_num_heads=4,
                     decoder_num_classes=48, mlp_ratio=2.0,
                     concat_dummy_token=True)
    flow2imu_main = StreamSpec(
        img_size=(IMG, IMG), patch_size=(8, 8), in_chans=7, num_frames=1,
        encoder_embed_dim=48, encoder_depth=2, encoder_num_heads=4,
        decoder_embed_dim=32, decoder_depth=2, decoder_num_heads=4,
        mlp_ratio=2.0, decoder_num_classes=448)
    flow2imu = ConjoinedVMAE(
        main=flow2imu_main, context=ctx,
        conjoin_encoder_layers=((0, 0), (-1, -1)),
        conjoin_decoder_layers=((0, 0), (1, 1)))
    flow2imu_w = ConjoinedPredictorWrapper(
        flow2imu, params=convert_conjoined(flow2imu_sd),
        main_input='flowback_rgb01',
        main_input_kwargs={'unnormalize': True, 'iters': 2,
                           'flow_model': jraft, 'flow_params': raft_params},
        context_input='imu')

    padded_ctx = StreamSpec(
        is_imu=True, in_chans=6, sequence_length=IMU_LEN, imu_tubelet=8,
        encoder_embed_dim=32, encoder_depth=2, encoder_num_heads=4,
        decoder_embed_dim=24, decoder_depth=2, decoder_num_heads=4,
        decoder_num_classes=48, mlp_ratio=2.0, concat_dummy_token=False,
        padded=True, max_padding_tokens=IMU_TOKENS)
    imu_main = StreamSpec(
        img_size=(IMG, IMG), patch_size=(8, 8), in_chans=3, num_frames=2,
        encoder_embed_dim=48, encoder_depth=2, encoder_num_heads=4,
        decoder_embed_dim=32, decoder_depth=2, decoder_num_heads=4,
        mlp_ratio=2.0, padded=True, max_padding_tokens=8)
    imu_cond = ConjoinedVMAE(
        main=imu_main, context=padded_ctx,
        conjoin_encoder_layers=((0, 0), (-1, -1)),
        conjoin_decoder_layers=((0, 0), (1, 1)))
    imu_cond_w = ConjoinedPredictorWrapper(
        imu_cond, params=convert_conjoined(imu_cond_sd),
        main_input='rgb01', main_input_kwargs={'unnormalize': False},
        context_input='imu')

    from counterfactualworldmodels_tpu.masking import generators as jmask
    gen = ImuConditionedFlowGenerator(
        predictor=imu_cond_w, head_motion_predictor=flow2imu_w,
        flow_model=RAFT(iters=2), flow_params=raft_params, raft_iters=2,
        mask_generator=jmask.MaskingGenerator(
            input_size=(2, GRID, GRID), mask_ratio=0, always_batch=True),
        imagenet_normalize_inputs=True, seed=0, engine='exact')
    return gen



def _smooth_video(rng, b=1):
    """Well-conditioned frames: smooth image + small shift (RAFT on pure
    noise is chaotic and defeats cross-framework comparison)."""
    import jax
    import jax.numpy as jnp
    coarse = rng.rand(b, 3, 8, 8).astype(np.float32)
    img = np.asarray(jax.image.resize(jnp.asarray(coarse),
                                      (b, 3, IMG, IMG), 'bilinear'))
    f2 = np.roll(img, shift=3, axis=-1)
    return np.stack([img, f2], axis=1)  # [B,2,3,H,W]

@pytest.fixture(scope='module')
def pipelines():
    traft = _torch_raft()
    ref, flow2imu_t, imu_cond_t = _ref_pipeline(traft)
    mine = _my_pipeline(flow2imu_t.state_dict(), imu_cond_t.state_dict(),
                        traft.state_dict())
    return ref, mine


@pytest.mark.slow
def test_predict_imu_from_video_matches_reference(pipelines):
    ref, mine = pipelines
    rng = np.random.RandomState(0)
    x = _smooth_video(rng)
    with torch.no_grad():
        h_ref = ref.predict_imu_from_video(torch.tensor(x))
    h = mine.predict_imu_from_video(jnp.asarray(x))
    assert h.shape == tuple(h_ref.shape), (h.shape, h_ref.shape)
    np.testing.assert_allclose(np.asarray(h), h_ref.numpy(), atol=5e-3)


def test_static_imu_matches_reference(pipelines):
    ref, mine = pipelines
    rng = np.random.RandomState(1)
    x = _smooth_video(rng)
    ref.set_input(torch.tensor(x))
    mine.set_input(jnp.asarray(x))
    with torch.no_grad():
        h_ref = ref.get_static_imu()
    h = mine.get_static_imu()
    np.testing.assert_allclose(np.asarray(h), h_ref.numpy(), atol=5e-3)


@pytest.mark.slow
def test_imu_conditioned_counterfactuals_match_reference(pipelines):
    ref, mine = pipelines
    rng = np.random.RandomState(2)
    x = _smooth_video(rng)
    active = np.ones((1, N), dtype=bool)
    active[0, :N // 2] = False
    active[0, N // 2 + 5 * GRID + 5] = False
    shifts = [(1, 1)]
    with torch.no_grad():
        y_ref, f_ref = ref.predict_counterfactual_videos_and_flows(
            torch.tensor(x), active_patches=torch.tensor(active),
            shifts=shifts, num_samples=1, sample_batch_size=1,
            static_head_motion=True)
    y, f = mine.predict_counterfactual_videos_and_flows(
        jnp.asarray(x), active_patches=jnp.asarray(active), shifts=shifts,
        num_samples=1, sample_batch_size=1, static_head_motion=True)
    assert y.shape == tuple(y_ref.shape)
    assert f.shape == tuple(f_ref.shape)
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=5e-3)
    np.testing.assert_allclose(np.asarray(f), f_ref.numpy(), atol=5e-2)


@pytest.mark.slow
def test_imu_movability_runs(pipelines):
    _, mine = pipelines
    from counterfactualworldmodels_tpu.pipelines.movability import (
        make_imu_conditioned_movability_predictor)
    cls = make_imu_conditioned_movability_predictor()
    m = cls(predictor=mine.predictor,
            head_motion_predictor=mine.head_motion_generator.predictor,
            flow_model=mine.flow_model, flow_params=mine.flow_params,
            raft_iters=2, imagenet_normalize_inputs=True, seed=0,
            initialize_from_keypoints=False, num_initial_samples=2,
            num_samples_per_iteration=2, num_iters=1, sample_batch_size=2)
    rng = np.random.RandomState(3)
    x = _smooth_video(rng)
    out = m(jnp.asarray(x), static_head_motion=True)
    assert out.shape == (1, 1, IMG, IMG)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_get_imu_input_matches_reference(pipelines):
    """get_imu_input unpack (reference segmentation.py:612-639) and the
    set_head_mask_generator rebuild (reference segmentation.py:586-594)."""
    ref, mine = pipelines
    rg, mg = ref.head_motion_generator, mine.head_motion_generator
    rng = np.random.RandomState(23)
    # datasets hold video time-first (the reference's transpose pair at
    # segmentation.py:625 adapts this layout to its channel-first
    # unnormalize and transposes straight back)
    video = rng.rand(1, 2, 3, IMG, IMG).astype(np.float32)  # [B,T,C,H,W]
    imu = rng.rand(1, IMU_LEN, 6).astype(np.float32)
    missing = np.zeros((1, IMU_LEN, 6), dtype=bool)
    missing[0, :IMU_LEN // IMU_TOKENS] = True  # token 0 fully missing
    ts = np.asarray([[0.0, 0.5]], np.float32)

    ref_out = rg.get_imu_input({'video': torch.tensor(video),
                                'imu': torch.tensor(imu),
                                'imu_missing_data': torch.tensor(missing),
                                'video_ts': torch.tensor(ts)})
    my_out = mg.get_imu_input({'video': jnp.asarray(video),
                               'imu': jnp.asarray(imu),
                               'imu_missing_data': jnp.asarray(missing),
                               'video_ts': jnp.asarray(ts)})
    assert len(my_out) == len(ref_out) == 5
    for r, m in zip(ref_out, my_out):
        np.testing.assert_allclose(np.asarray(m), r.numpy(), atol=1e-5)
    # 'input' mode: only the missing token is masked
    np.testing.assert_array_equal(np.asarray(my_out[3]),
                                  [[True] + [False] * (IMU_TOKENS - 1)])

    # rebuild resets any tweaked params to the reference defaults
    mg.set_head_mask_params(mask_ratio=0.7, full_mask_prob=0.3)
    mg.set_head_mask_generator()
    g = mg.head_mask_generator
    assert (g.mask_ratio, g.full_mask_prob, g.full_vis_prob) == (0, 0, 0)
    mg.output_mode()
    assert mg.head_mask_generator.mask_ratio == 1.0
    mg.input_mode()
    assert mg.head_mask_generator.mask_ratio == 0.0
    # unknown modes raise like the reference (segmentation.py:604-605)
    with pytest.raises(ValueError):
        mg.set_mode('Output')
