"""Golden parity for the conjoined (two-stream) VMAE models."""
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
from counterfactualworldmodels_tpu.utils.torch_convert import (  # noqa: E402
    convert_conjoined)


def _ref_conjoined(padded=False, max_pad_main=8, max_pad_ctx=4,
                   dummy=True, self_attn=False):
    """Small reference conjoined model: rgb01 main + IMU context."""
    from cwm.models.VideoMAE.conjoined_vmae import (
        ConjoinedPretrainVisionTransformer, ConjoinedPaddedVisionTransformer,
        ImuEncoder, PaddedVisionTransformer)
    from cwm.models.VideoMAE.vmae import (PretrainVisionTransformer,
                                          PretrainVisionTransformerEncoder)
    torch.manual_seed(0)
    main_kwargs = {'encoder_func': PretrainVisionTransformerEncoder,
                   'tubelet_size': 1, 'decoder_num_classes': None}
    ctx_kwargs = {'encoder_func': ImuEncoder, 'tubelet_size': 8,
                  'sequence_length': 32, 'encoder_embed_dim': 32,
                  'decoder_embed_dim': 24, 'decoder_num_classes': 6 * 8,
                  'concat_dummy_token': dummy}
    common = dict(
        img_size=32, patch_size=(8, 8), num_frames=2,
        main_input='rgb01', main_input_kwargs={'unnormalize': False},
        context_input='imu', context_input_kwargs={'sequence_length': 32},
        conjoin_encoder_layers=[0, -1], conjoin_decoder_layers=True,
        encoder_cross_block_kwargs={
            'num_heads': 4, 'mlp_ratio': 2.0, 'shared_similarity': False,
            'with_self_attention': self_attn},
        decoder_cross_block_kwargs={
            'num_heads': 4, 'mlp_ratio': 2.0, 'shared_similarity': False,
            'with_self_attention': self_attn},
        encoder_embed_dim=48, encoder_depth=2, encoder_num_heads=4,
        encoder_num_classes=0, decoder_embed_dim=32, decoder_depth=2,
        decoder_num_heads=4, mlp_ratio=2, qkv_bias=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6))
    if padded:
        main_kwargs.update({'min_padding_tokens': 0,
                            'max_padding_tokens': max_pad_main})
        ctx_kwargs.update({'min_padding_tokens': 0,
                           'max_padding_tokens': max_pad_ctx,
                           'concat_dummy_token': False})
        model = ConjoinedPaddedVisionTransformer(
            main_model_func=PaddedVisionTransformer,
            context_model_func=PaddedVisionTransformer,
            main_model_kwargs=main_kwargs, context_model_kwargs=ctx_kwargs,
            **common)
    else:
        model = ConjoinedPretrainVisionTransformer(
            main_model_func=PretrainVisionTransformer,
            context_model_func=PretrainVisionTransformer,
            main_model_kwargs=main_kwargs, context_model_kwargs=ctx_kwargs,
            **common)
    return model.eval()


def _my_conjoined(padded=False, max_pad_main=8, max_pad_ctx=4, dummy=True,
                  self_attn=False):
    main = StreamSpec(
        img_size=(32, 32), patch_size=(8, 8), in_chans=3, num_frames=2,
        encoder_embed_dim=48, encoder_depth=2, encoder_num_heads=4,
        decoder_embed_dim=32, decoder_depth=2, decoder_num_heads=4,
        mlp_ratio=2.0, padded=padded, max_padding_tokens=max_pad_main)
    context = StreamSpec(
        is_imu=True, in_chans=6, sequence_length=32, imu_tubelet=8,
        encoder_embed_dim=32, encoder_depth=2, encoder_num_heads=4,
        decoder_embed_dim=24, decoder_depth=2, decoder_num_heads=4,
        decoder_num_classes=48, mlp_ratio=2.0,
        concat_dummy_token=(dummy and not padded), padded=padded,
        max_padding_tokens=max_pad_ctx)
    model = ConjoinedVMAE(
        main=main, context=context,
        conjoin_encoder_layers=((0, 0), (-1, -1)),
        conjoin_decoder_layers=((0, 0), (1, 1)),
        with_self_attention=self_attn)
    return ConjoinedPredictorWrapper(
        model, params=None, main_input='rgb01',
        main_input_kwargs={'unnormalize': False}, context_input='imu')


def _inputs(rng, b=2, vis_per_row=None):
    x = rng.rand(b, 3, 2, 32, 32).astype(np.float32)
    imu = rng.randn(b, 6, 32).astype(np.float32)
    n = 32  # 2 frames x 16 patches
    mask = np.ones((b, n), dtype=bool)
    mask[:, :16] = False
    for i in range(b):
        k = vis_per_row[i] if vis_per_row else 2
        vis = rng.choice(16, k, replace=False)
        mask[i, 16 + vis] = False
    mask_c = np.zeros((b, 4), dtype=bool)  # IMU fully visible
    return x, imu, mask, mask_c


@pytest.mark.slow
def test_conjoined_imu_forward_matches_reference():
    ref = _ref_conjoined(padded=False)
    mine = _my_conjoined(padded=False)
    mine.params = convert_conjoined(ref.state_dict(), context_is_imu=True)

    rng = np.random.RandomState(0)
    x, imu, mask, mask_c = _inputs(rng)
    with torch.no_grad():
        y_ref, yc_ref = ref(torch.tensor(x), torch.tensor(mask),
                            x_context=torch.tensor(imu),
                            mask_context=torch.tensor(mask_c),
                            output_main=True, output_context=True)
    y, y_c = mine(jnp.asarray(x), jnp.asarray(mask),
                  x_context=jnp.asarray(imu),
                  mask_context=jnp.asarray(mask_c),
                  output_main=True, output_context=True)
    assert y.shape == tuple(y_ref.shape), (y.shape, y_ref.shape)
    assert y_c.shape == tuple(yc_ref.shape)
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(y_c), yc_ref.numpy(), atol=5e-4)


@pytest.mark.slow
def test_conjoined_imu_missing_context():
    """IMU=None path: fully-masked context with only the dummy visible."""
    ref = _ref_conjoined(padded=False)
    mine = _my_conjoined(padded=False)
    mine.params = convert_conjoined(ref.state_dict(), context_is_imu=True)
    rng = np.random.RandomState(1)
    x, imu, mask, mask_c = _inputs(rng)
    mask_c_full = np.ones_like(mask_c)
    with torch.no_grad():
        y_ref = ref(torch.tensor(x), torch.tensor(mask),
                    x_context=torch.tensor(imu),
                    mask_context=torch.tensor(mask_c_full),
                    output_main=True, output_context=False)
    y = mine(jnp.asarray(x), jnp.asarray(mask),
             x_context=jnp.asarray(imu),
             mask_context=jnp.asarray(mask_c_full),
             output_main=True, output_context=False)
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=5e-4)


def test_conjoined_padded_matches_reference():
    """Ragged visible counts through the null-token padding scheme."""
    ref = _ref_conjoined(padded=True)
    mine = _my_conjoined(padded=True)
    mine.params = convert_conjoined(ref.state_dict(), context_is_imu=True)

    rng = np.random.RandomState(2)
    x, imu, mask, mask_c = _inputs(rng, b=3, vis_per_row=[1, 3, 2])
    with torch.no_grad():
        y_ref, yc_ref = ref(torch.tensor(x), torch.tensor(mask),
                            x_context=torch.tensor(imu),
                            mask_context=torch.tensor(mask_c),
                            output_main=True, output_context=True)
    y, y_c = mine(jnp.asarray(x), jnp.asarray(mask),
                  x_context=jnp.asarray(imu),
                  mask_context=jnp.asarray(mask_c),
                  output_main=True, output_context=True)
    assert y.shape == tuple(y_ref.shape), (y.shape, y_ref.shape)
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(y_c), yc_ref.numpy(), atol=5e-4)


def test_factories_build_and_run_tiny():
    """Full-size factory configs build; run only param counting."""
    m = jconj.imu400_base_4x4patch_2frames_1tube()
    assert m.main.num_patches == 2 * 56 * 56
    assert m.context.num_patches == 25
    assert m.main.padded and m.context.padded
    m2 = jconj.imu400_8x8patch_2frames_1tube_flowbackrgb01()
    assert m2.main.in_chans == 7 and m2.main.num_frames == 1
    assert m2.context.concat_dummy_token


@pytest.mark.slow
def test_conjoined_train_step_decreases_loss():
    """IMU-conditioned masked-prediction training: loss finite and
    decreasing on a fixed batch (no reference training code exists)."""
    from counterfactualworldmodels_tpu.training.train import (
        make_conjoined_train_step, make_optimizer, TrainState)

    wrapper = _my_conjoined(padded=False)
    model = wrapper.model
    rng = np.random.RandomState(0)
    x, imu, mask, mask_c = _inputs(rng, b=2, vis_per_row=[2, 2])
    n_vis = 16 + 2
    n_vis_c = 4  # IMU fully visible (+ dummy handled inside)

    imu5 = jnp.asarray(imu)[..., None, None]
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.asarray(x), jnp.asarray(mask), imu5,
                        jnp.asarray(mask_c), n_vis, n_vis_c)['params']
    opt = make_optimizer(learning_rate=1e-3, warmup_steps=1, total_steps=50)
    state = TrainState(jnp.zeros((), jnp.int32), params, opt.init(params))

    step = jax.jit(make_conjoined_train_step(model, opt, n_vis, n_vis_c))
    losses = []
    for _ in range(5):
        state, metrics = step(state, jnp.asarray(x), jnp.asarray(mask),
                              imu5, jnp.asarray(mask_c))
        losses.append(float(metrics['loss']))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_conjoined_self_attention_matches_reference():
    """with_self_attention=True cross blocks: the converter must carry
    the self_attention.{trg,src} weights and norm1/norm1_src (previously
    dropped silently). The reference's self-attn path has a latent
    NameError (transformer.py:164 uses `time` without importing it) —
    patched here so the oracle can run at all."""
    import time as _time
    import cwm.models.transformer as ref_transformer
    if not hasattr(ref_transformer, 'time'):
        ref_transformer.time = _time   # reference latent bug (SURVEY 2.5)

    ref = _ref_conjoined(padded=False, self_attn=True)
    mine = _my_conjoined(padded=False, self_attn=True)
    params = convert_conjoined(ref.state_dict(), context_is_imu=True)
    # the self-attention branches actually converted
    assert 'self_attention_trg' in params['encoder_cross_blocks_0']
    assert 'norm1_src' in params['encoder_cross_blocks_0']
    mine.params = params

    rng = np.random.RandomState(2)
    x, imu, mask, mask_c = _inputs(rng)
    with torch.no_grad():
        y_ref = ref(torch.tensor(x), torch.tensor(mask),
                    x_context=torch.tensor(imu),
                    mask_context=torch.tensor(mask_c),
                    output_main=True, output_context=False)
    y = mine(jnp.asarray(x), jnp.asarray(mask),
             x_context=jnp.asarray(imu),
             mask_context=jnp.asarray(mask_c),
             output_main=True, output_context=False)
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=5e-4)
