"""Golden parity of the flax VMAE against the reference PyTorch model."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reference_shims import install as install_reference
install_reference()

import torch  # noqa: E402

from counterfactualworldmodels_tpu.models import vmae as jvmae  # noqa: E402
from counterfactualworldmodels_tpu.utils.torch_convert import convert_vmae  # noqa: E402


def _make_pair(img_size=32, patch=8, enc_dim=64, enc_depth=2, enc_heads=4,
               dec_dim=48, dec_depth=2, dec_heads=4, frames=2):
    from cwm.models.VideoMAE.vmae import PretrainVisionTransformer as TorchPVT
    torch.manual_seed(0)
    tmodel = TorchPVT(
        img_size=img_size, patch_size=(patch, patch),
        encoder_embed_dim=enc_dim, encoder_depth=enc_depth,
        encoder_num_heads=enc_heads, encoder_num_classes=0,
        decoder_embed_dim=dec_dim, decoder_depth=dec_depth,
        decoder_num_heads=dec_heads, mlp_ratio=4, qkv_bias=True,
        num_frames=frames, tubelet_size=1,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6)).eval()
    jmodel = jvmae.PretrainVisionTransformer(
        img_size=(img_size, img_size), patch_size=(patch, patch),
        encoder_embed_dim=enc_dim, encoder_depth=enc_depth,
        encoder_num_heads=enc_heads, decoder_embed_dim=dec_dim,
        decoder_depth=dec_depth, decoder_num_heads=dec_heads,
        mlp_ratio=4.0, qkv_bias=True, num_frames=frames, tubelet_size=1)
    params = convert_vmae(tmodel.state_dict())
    return tmodel, jmodel, params


def _rand_mask(rng, b, n, n_vis):
    mask = np.ones((b, n), dtype=bool)
    for i in range(b):
        vis = rng.choice(n, size=n_vis, replace=False)
        mask[i, vis] = False
    return mask


def test_vmae_forward_matches_reference():
    tmodel, jmodel, params = _make_pair()
    rng = np.random.RandomState(0)
    b, n = 2, jmodel.num_patches
    n_vis = 10
    x = rng.randn(b, 3, 2, 32, 32).astype(np.float32)
    mask = _rand_mask(rng, b, n, n_vis)

    with torch.no_grad():
        ref = tmodel(torch.tensor(x), torch.tensor(mask)).numpy()
    out = np.asarray(jvmae.apply_vmae(
        jmodel, params, jnp.asarray(x), jnp.asarray(mask), n_vis))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_vmae_encoder_matches_reference():
    tmodel, jmodel, params = _make_pair()
    rng = np.random.RandomState(1)
    b, n = 2, jmodel.num_patches
    n_vis = 16
    x = rng.randn(b, 3, 2, 32, 32).astype(np.float32)
    mask = _rand_mask(rng, b, n, n_vis)
    with torch.no_grad():
        ref = tmodel.encoder(torch.tensor(x), torch.tensor(mask)).numpy()
    out = np.asarray(jmodel.apply({'params': params}, jnp.asarray(x),
                                  jnp.asarray(mask), n_vis,
                                  method=jmodel.encode))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_vmae_layerscale_and_tubelet():
    """gamma layerscale path + tubelet_size=2 patch embed conversion."""
    from cwm.models.VideoMAE.vmae import PretrainVisionTransformer as TorchPVT
    torch.manual_seed(1)
    tmodel = TorchPVT(
        img_size=16, patch_size=(4, 4), encoder_embed_dim=32,
        encoder_depth=1, encoder_num_heads=2, encoder_num_classes=0,
        decoder_embed_dim=24, decoder_depth=1, decoder_num_heads=2,
        mlp_ratio=2, qkv_bias=True, num_frames=2, tubelet_size=2,
        init_values=0.5,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6)).eval()
    jmodel = jvmae.PretrainVisionTransformer(
        img_size=(16, 16), patch_size=(4, 4), encoder_embed_dim=32,
        encoder_depth=1, encoder_num_heads=2, decoder_embed_dim=24,
        decoder_depth=1, decoder_num_heads=2, mlp_ratio=2.0, qkv_bias=True,
        num_frames=2, tubelet_size=2, init_values=0.5)
    params = convert_vmae(tmodel.state_dict())
    rng = np.random.RandomState(2)
    n = jmodel.num_patches
    n_vis = 5
    x = rng.randn(1, 3, 2, 16, 16).astype(np.float32)
    mask = _rand_mask(rng, 1, n, n_vis)
    with torch.no_grad():
        ref = tmodel(torch.tensor(x), torch.tensor(mask)).numpy()
    out = np.asarray(jvmae.apply_vmae(
        jmodel, params, jnp.asarray(x), jnp.asarray(mask), n_vis))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_factory_configs():
    m = jvmae.base_8x8patch_2frames_1tube()
    assert m.num_patches == 2 * 28 * 28
    assert m.mask_size == (2, 28, 28)
    assert m.out_dim == 3 * 8 * 8
    ml = jvmae.large_4x4patch_2frames_1tube()
    assert ml.num_patches == 2 * 56 * 56
    assert ml.encoder_embed_dim == 1024 and ml.decoder_depth == 12


def test_mask_order_matches_boolean_gather():
    rng = np.random.RandomState(3)
    mask = _rand_mask(rng, 3, 20, 8)
    tokens = rng.randn(3, 20, 5).astype(np.float32)
    order = np.asarray(jvmae.mask_order(jnp.asarray(mask)))
    vis = np.asarray(jvmae.take_tokens(jnp.asarray(tokens),
                                       jnp.asarray(order[:, :8])))
    ref_vis = torch.tensor(tokens)[~torch.tensor(mask)].reshape(3, -1, 5).numpy()
    np.testing.assert_array_equal(vis, ref_vis)
    msk = np.asarray(jvmae.take_tokens(jnp.asarray(tokens),
                                       jnp.asarray(order[:, 8:])))
    ref_msk = torch.tensor(tokens)[torch.tensor(mask)].reshape(3, -1, 5).numpy()
    np.testing.assert_array_equal(msk, ref_msk)


def test_masked_targets_match_reference():
    """Training target extraction == reference get_masked_targets
    (vmae.py:483-513): same patch vectorization and masked-token order."""
    from counterfactualworldmodels_tpu.ops.patches import patchify
    from counterfactualworldmodels_tpu.models.vmae import (mask_order,
                                                           take_tokens)
    tmodel, jmodel, params = _make_pair()
    rng = np.random.RandomState(3)
    x = rng.randn(2, 3, 2, 32, 32).astype(np.float32)  # [B,C,T,H,W]
    n = jmodel.num_patches
    mask = np.ones((2, n), dtype=bool)
    mask[:, :n // 2] = False
    for b in range(2):
        mask[b, n // 2 + rng.choice(n // 2, 3, replace=False)] = False
    n_vis = n // 2 + 3

    ref = tmodel.get_masked_targets(torch.tensor(x),
                                    torch.tensor(mask)).numpy()

    xt = jnp.swapaxes(jnp.asarray(x), 1, 2)  # [B,T,C,H,W]
    target = patchify(xt, jmodel.full_patch_size, temporal_dim=1)
    order = mask_order(jnp.asarray(mask))
    mine = np.asarray(take_tokens(target, order[:, n_vis:]))
    np.testing.assert_allclose(mine, ref, atol=1e-6)
