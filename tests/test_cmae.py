"""ChannelMAE golden parity + Soft variant invariants."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reference_shims import install as install_reference
install_reference()

import torch  # noqa: E402

from counterfactualworldmodels_tpu.models import cmae as jcmae  # noqa: E402
from counterfactualworldmodels_tpu.utils import torch_convert as tc  # noqa: E402


def _pair(img=32, patch=8, partition=(1, 2)):
    from cwm.models.VideoMAE.cmae import ChannelMae as TorchCMae
    torch.manual_seed(0)
    enc = dict(image_size=img, patch_size=(patch, patch),
               in_channels=sum(partition), channel_partition=partition,
               embed_dim=48, depth=2, num_heads=4, mlp_ratio=2.0,
               qkv_bias=True)
    dec = dict(embed_dim=32, depth=1, num_heads=4, mlp_ratio=2.0,
               qkv_bias=True)
    tmodel = TorchCMae(encoder_params=enc, decoder_params=dec).eval()

    jmodel = jcmae.ChannelMae(
        image_size=(img, img), patch_size=(patch, patch),
        in_channels=sum(partition), channel_partition=partition,
        encoder_embed_dim=48, encoder_depth=2, encoder_num_heads=4,
        decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=4,
        mlp_ratio=2.0, qkv_bias=True)
    return tmodel, jmodel


def _group_mask(rng, b, groups, n_per, vis_per_group):
    mask = np.ones((b, groups * n_per), dtype=bool)
    for i in range(b):
        for g in range(groups):
            vis = rng.choice(n_per, vis_per_group[g], replace=False)
            mask[i, g * n_per + vis] = False
    return mask


def test_channel_mae_matches_reference():
    # NOTE: B=1 only — the reference forward boolean-indexes a [1,N,C] pos
    # table with a [B,N,C] mask and breaks for B>1 (cmae.py:479-484)
    partition = (1, 2)
    tmodel, jmodel = _pair(partition=partition)
    params = tc.convert_channel_mae(tmodel.state_dict())
    rng = np.random.RandomState(0)
    x = rng.rand(1, 3, 32, 32).astype(np.float32)
    n_per = jmodel.patches_per_group
    vis = [5, 7]
    mask = _group_mask(rng, 1, 2, n_per, vis)
    n_vis = sum(vis)
    counts = tuple(n_per - v for v in vis)

    with torch.no_grad():
        ys_ref = tmodel(torch.tensor(x), torch.tensor(mask))
    ys = jcmae.apply_channel_mae(jmodel, params, jnp.asarray(x),
                                 jnp.asarray(mask), n_vis, counts)
    assert len(ys) == len(ys_ref)
    for y, y_ref in zip(ys, ys_ref):
        assert y.shape == tuple(y_ref.shape)
        np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=5e-4)


def test_channel_mae_labels_and_loss_match_reference():
    partition = (1, 2)
    tmodel, jmodel = _pair(partition=partition)
    params = tc.convert_channel_mae(tmodel.state_dict())
    rng = np.random.RandomState(1)
    x = rng.rand(1, 3, 32, 32).astype(np.float32)
    n_per = jmodel.patches_per_group
    vis = [4, 6]
    mask = _group_mask(rng, 1, 2, n_per, vis)
    counts = tuple(n_per - v for v in vis)
    n_vis = sum(vis)

    with torch.no_grad():
        labels_ref = tmodel.compute_labels(torch.tensor(x), torch.tensor(mask))
        loss_ref = tmodel.compute_train_loss(torch.tensor(x),
                                             torch.tensor(mask))
    labels = jmodel.apply({'params': params}, jnp.asarray(x),
                          jnp.asarray(mask), counts,
                          method=jmodel.compute_labels)
    for l, l_ref in zip(labels, labels_ref):
        np.testing.assert_allclose(np.asarray(l), l_ref.numpy(), atol=1e-6)
    loss = jcmae.channel_mae_train_loss(jmodel, params, jnp.asarray(x),
                                        jnp.asarray(mask), n_vis, counts)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-4)


def test_channel_mae_predict_image_matches_reference():
    partition = (1, 2)
    tmodel, jmodel = _pair(partition=partition)
    params = tc.convert_channel_mae(tmodel.state_dict())
    rng = np.random.RandomState(2)
    x = rng.rand(1, 3, 32, 32).astype(np.float32)
    n_per = jmodel.patches_per_group
    vis = [6, 6]
    mask = _group_mask(rng, 1, 2, n_per, vis)
    counts = tuple(n_per - v for v in vis)
    with torch.no_grad():
        img_ref = tmodel.predict_image(torch.tensor(x), torch.tensor(mask))
    img = jcmae.channel_mae_predict_image(jmodel, params, jnp.asarray(x),
                                          jnp.asarray(mask), sum(vis), counts)
    assert img.shape == tuple(img_ref.shape)
    np.testing.assert_allclose(np.asarray(img), img_ref.numpy(), atol=5e-4)


def test_group_uniform_mask():
    mask, counts = jcmae.group_uniform_mask(jax.random.PRNGKey(0),
                                            (3, 4, 4), 0.75, batch_size=2)
    m = np.asarray(mask).reshape(2, 3, 16)
    assert (m.sum(-1) == 12).all()
    assert counts == (12, 12, 12)


@pytest.mark.slow
def test_soft_channel_mae_differentiable():
    model = jcmae.SoftChannelMae(
        image_size=(32, 32), patch_size=(8, 8), in_channels=3,
        channel_partition=(1, 2), encoder_embed_dim=48, encoder_depth=1,
        encoder_num_heads=4, decoder_embed_dim=32, decoder_depth=1,
        decoder_num_heads=4, mlp_ratio=2.0)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 3, 32, 32).astype(np.float32))
    soft = jnp.full((1, model.num_patches), 0.5)
    params = model.init(jax.random.PRNGKey(0), x, soft)['params']
    ys = model.apply({'params': params}, x, soft)
    assert len(ys) == 2
    assert ys[0].shape == (1, 16, 64) and ys[1].shape == (1, 16, 128)

    def loss(s):
        outs = model.apply({'params': params}, x, s)
        return sum(jnp.sum(o ** 2) for o in outs)

    g = jax.grad(loss)(soft)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0  # gradients flow through the mask


@pytest.mark.slow
def test_cmae_train_step_decreases_loss():
    """End-to-end ChannelMae training step: loss finite and decreasing on a
    fixed batch."""
    from counterfactualworldmodels_tpu.models.cmae import group_uniform_mask
    from counterfactualworldmodels_tpu.training.train import (
        make_cmae_train_step, init_cmae_train_state, make_optimizer)

    _, model = _pair(partition=(1, 2))
    key = jax.random.PRNGKey(0)
    b = 2
    g = len(model.partition)
    h = model.image_size[0] // model.patch_size[0]
    mask, counts = group_uniform_mask(
        jax.random.PRNGKey(1), (g, h, h), mask_ratio=0.5, batch_size=b)
    n_vis = mask.shape[1] - sum(counts)
    x = jnp.asarray(np.random.RandomState(0).rand(
        b, model.in_channels, *model.image_size).astype(np.float32))

    opt = make_optimizer(learning_rate=1e-3, warmup_steps=1, total_steps=50)
    state = init_cmae_train_state(model, opt, key, x.shape, mask, n_vis,
                                  counts)
    step = jax.jit(make_cmae_train_step(model, opt, n_vis, counts))
    losses = []
    for _ in range(5):
        state, metrics = step(state, x, mask)
        losses.append(float(metrics['loss']))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def _soft_pair(cls_name, img=32, patch=8, partition=(1, 2)):
    import cwm.models.VideoMAE.cmae as tcmae
    torch.manual_seed(0)
    enc = dict(image_size=img, patch_size=(patch, patch),
               in_channels=sum(partition), channel_partition=partition,
               embed_dim=48, depth=2, num_heads=4, mlp_ratio=2.0,
               qkv_bias=True)
    dec = dict(embed_dim=32, depth=1, num_heads=4, mlp_ratio=2.0,
               qkv_bias=True)
    tmodel = getattr(tcmae, cls_name)(encoder_params=enc,
                                      decoder_params=dec).eval()
    jcls = getattr(jcmae, cls_name)
    jmodel = jcls(
        image_size=(img, img), patch_size=(patch, patch),
        in_channels=sum(partition), channel_partition=partition,
        encoder_embed_dim=48, encoder_depth=2, encoder_num_heads=4,
        decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=4,
        mlp_ratio=2.0, qkv_bias=True)
    return tmodel, jmodel


def test_soft_input_channel_mae_matches_reference():
    """Golden: SoftInputChannelMae forward, recombine, and train loss
    (reference cmae.py:1004-1059).

    B=1 only: the reference's _decode torch.cat's a [1,N,C] mask-token
    tensor against [B,N,C] inputs and breaks for B>1 (cmae.py:1043); the
    rebuild broadcasts."""
    tmodel, jmodel = _soft_pair('SoftInputChannelMae')
    params = tc.convert_channel_mae(tmodel.state_dict())
    rng = np.random.RandomState(4)
    x = rng.rand(1, 3, 32, 32).astype(np.float32)
    soft = rng.rand(1, jmodel.num_patches).astype(np.float32)

    with torch.no_grad():
        ys_ref = tmodel(torch.tensor(x), torch.tensor(soft),
                        recombine_channel_groups=False)
        yr_ref = tmodel(torch.tensor(x), torch.tensor(soft),
                        recombine_channel_groups=True)
        loss_ref = tmodel.compute_train_loss(torch.tensor(x),
                                             torch.tensor(soft))
    ys = jmodel.apply({'params': params}, jnp.asarray(x), jnp.asarray(soft))
    assert len(ys) == len(ys_ref)
    for y, y_ref in zip(ys, ys_ref):
        assert y.shape == tuple(y_ref.shape)
        np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=5e-4)
    yr = jcmae.soft_channel_mae_recombine(jmodel, ys)
    np.testing.assert_allclose(np.asarray(yr), yr_ref.numpy(), atol=5e-4)
    loss = jcmae.soft_channel_mae_train_loss(jmodel, params, jnp.asarray(x),
                                             jnp.asarray(soft))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-4)


def test_soft_channel_mae_matches_reference_fixed_decode():
    """Golden: SoftChannelMae. The reference's _decode raises NameError on
    an undefined `mask` (cmae.py:858); patch in the minimal fix (the kwarg
    was unused under filter_to_masked=False) and compare."""
    tmodel, jmodel = _soft_pair('SoftChannelMae')

    def fixed_decode(self, x):
        dec_pos_embed = self.pos_embed.type_as(x).to(x.device).detach()
        if self.decode_mask is not None:
            dec_pos_embed = dec_pos_embed.expand(
                x.size(0), -1, -1)[self.decode_mask].reshape(*x.shape)
        return self.decoder(x + dec_pos_embed, mask=None,
                            filter_to_masked=False)

    import types
    tmodel._decode = types.MethodType(fixed_decode, tmodel)

    params = tc.convert_channel_mae(tmodel.state_dict())
    rng = np.random.RandomState(5)
    x = rng.rand(2, 3, 32, 32).astype(np.float32)
    soft = rng.rand(2, jmodel.num_patches).astype(np.float32)
    with torch.no_grad():
        ys_ref = tmodel(torch.tensor(x), torch.tensor(soft),
                        recombine_channel_groups=False)
    ys = jmodel.apply({'params': params}, jnp.asarray(x), jnp.asarray(soft))
    for y, y_ref in zip(ys, ys_ref):
        np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=5e-4)


def test_soft_channel_mae_predict_image():
    """Golden (single group, where the reference's group-minor mask
    reshape at cmae.py:999 is harmless) + multi-group invariants for
    soft_channel_mae_predict_image."""
    soft_predict = jcmae.soft_channel_mae_predict_image
    tmodel, jmodel = _soft_pair('SoftChannelMae', partition=(3,))

    # the reference's _decode NameErrors on its unused `mask` kwarg
    # (cmae.py:859) — same minimal patch as the forward golden above
    def fixed_decode(self, x):
        dec_pos_embed = self.pos_embed.type_as(x).to(x.device).detach()
        if self.decode_mask is not None:
            dec_pos_embed = dec_pos_embed.expand(
                x.size(0), -1, -1)[self.decode_mask].reshape(*x.shape)
        return self.decoder(x + dec_pos_embed, mask=None,
                            filter_to_masked=False)

    import types
    tmodel._decode = types.MethodType(fixed_decode, tmodel)
    params = tc.convert_channel_mae(tmodel.state_dict())
    rng = np.random.RandomState(6)
    x = rng.rand(2, 3, 32, 32).astype(np.float32)
    soft = rng.rand(2, jmodel.num_patches).astype(np.float32)
    with torch.no_grad():
        y_ref = tmodel.predict_image(torch.tensor(x), torch.tensor(soft))
    y = soft_predict(jmodel, params, jnp.asarray(x), jnp.asarray(soft))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=5e-4)

    # multi-group: a fully revealed mask returns the input exactly
    _, jm2 = _soft_pair('SoftChannelMae')  # partition (1, 2)
    import jax
    p2 = jm2.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)),
                  jnp.zeros((1, jm2.num_patches)))['params']
    x2 = jnp.asarray(rng.rand(1, 3, 32, 32).astype(np.float32))
    y2 = soft_predict(jm2, p2, x2, jnp.zeros((1, jm2.num_patches)))
    np.testing.assert_allclose(np.asarray(y2), np.asarray(x2), atol=1e-5)
    # fully masked = raw recombined prediction (no input content)
    y3 = soft_predict(jm2, p2, x2, jnp.ones((1, jm2.num_patches)))
    y3_raw = soft_predict(jm2, p2, x2, jnp.ones((1, jm2.num_patches)),
                          replace_visible_patches_with_input=False)
    np.testing.assert_allclose(np.asarray(y3), np.asarray(y3_raw),
                               atol=1e-6)


@pytest.mark.slow
def test_extract_structure_script_runs(tmp_path):
    """The differentiable structure-extraction demo drives visibility down
    under the sparsity penalty (tiny config, synthetic image)."""
    import json
    import subprocess
    import sys
    import os
    script = os.path.join(os.path.dirname(__file__), '..', 'scripts',
                          'extract_structure.py')
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    env.pop('PALLAS_AXON_POOL_IPS', None)
    out = subprocess.run(
        [sys.executable, script, '--image', 'nonexistent', '--img-size',
         '64', '--patch-size', '32', '--steps', '15', '--out',
         str(tmp_path)], env=env, capture_output=True, text=True,
        timeout=500)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads([l for l in out.stdout.splitlines()
                      if l.startswith('{')][-1])
    assert rec['final']['visibility'] < rec['initial']['visibility']
    assert (tmp_path / 'structure_mask.png').exists()
    assert (tmp_path / 'structure_recon.png').exists()
