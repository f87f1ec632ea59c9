"""Checkpoint-format parity: the released `.pth` files cannot be fetched in
this environment (zero egress — see PARITY_CHECKPOINTS.md), so these tests
prove the next-strongest statement: the converters handle the EXACT on-disk
layout of the released checkpoints — torch.save'd files with the `'model'`
wrapper key and training extras (reference cwm/models/prediction.py:94-99
unwraps `weights['model']`), DDP `'module.'` prefixes and strict=False
extra keys for RAFT (cwm/models/raft/raft_model.py:78-91), and the full
released model configurations' key/shape layouts (README.md:69-78 model
table: base 8x8 / large 4x4, 224px, 2 frames).
"""
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reference_shims import install as install_reference
install_reference()

import torch  # noqa: E402

from counterfactualworldmodels_tpu.models import vmae as jvmae  # noqa: E402
from counterfactualworldmodels_tpu.models.raft.raft import (  # noqa: E402
    RAFT, apply_raft_video)
from counterfactualworldmodels_tpu.utils.torch_convert import (  # noqa: E402
    convert_vmae, load_raft_checkpoint, load_vmae_checkpoint)


def _tree_spec(tree, prefix=''):
    """Flatten a params tree to {path: shape}."""
    out = {}
    for k, v in tree.items():
        p = f'{prefix}/{k}' if prefix else k
        if isinstance(v, dict):
            out.update(_tree_spec(v, p))
        else:
            out[p] = tuple(np.shape(v))
    return out


def test_vmae_pth_file_roundtrip():
    """torch.save({'model': sd, ...extras}) -> load_vmae_checkpoint -> golden
    forward parity. This is the exact released format incl. the wrapper key
    the reference loader unwraps (prediction.py:96-97)."""
    from test_vmae import _make_pair, _rand_mask
    tmodel, jmodel, _ = _make_pair()

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 'cwm_ckpt.pth')
        torch.save({'model': tmodel.state_dict(),
                    'optimizer': {'state': {}, 'param_groups': []},
                    'epoch': 800,
                    'scaler': None,
                    'args': {'batch_size': 64}}, path)
        params = load_vmae_checkpoint(path)

    rng = np.random.RandomState(0)
    b, n = 2, jmodel.num_patches
    x = rng.randn(b, 3, 2, 32, 32).astype(np.float32)
    mask = _rand_mask(rng, b, n, 10)
    with torch.no_grad():
        ref = tmodel(torch.tensor(x), torch.tensor(mask)).numpy()
    out = np.asarray(jvmae.apply_vmae(
        jmodel, params, jnp.asarray(x), jnp.asarray(mask), 10))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_vmae_pth_ddp_prefixes():
    """A checkpoint saved from a DDP model ('module.' prefixes) converts to
    the identical tree."""
    from test_vmae import _make_pair
    tmodel, _, base_params = _make_pair()
    sd = {'module.' + k: v for k, v in tmodel.state_dict().items()}
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 'ddp_ckpt.pth')
        torch.save({'model': sd}, path)
        params = load_vmae_checkpoint(path)
    a, b = _tree_spec(base_params), _tree_spec(params)
    assert a == b
    for k in a:
        pass  # shapes identical; spot-check one leaf value
    np.testing.assert_array_equal(
        base_params['encoder']['norm']['scale'],
        params['encoder']['norm']['scale'])


@pytest.mark.slow
def test_raft_pth_file_roundtrip_strict_false_extras():
    """RAFT released layout: 'module.' DDP prefixes plus extra keys the
    reference tolerates via strict=False (raft_model.py:91). Golden forward
    parity after file round-trip."""
    from test_raft import _torch_raft
    tmodel = _torch_raft()
    sd = {'module.' + k: v for k, v in tmodel.state_dict().items()}
    sd['module.extra_unused_buffer'] = torch.zeros(3)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 'raft-large.pth')
        torch.save(sd, path)
        params = load_raft_checkpoint(path)

    rng = np.random.RandomState(0)
    # 128px: the random-weight torch reference emits NaN at 64px (unstable
    # instance-norm statistics on 8x8 feature maps), so match test_raft's size
    video = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
    with torch.no_grad():
        x = torch.tensor(video) * 255.0
        _, ref = tmodel(x[:, 0], x[:, 1], iters=6, test_mode=True)
    model = RAFT(iters=6)
    out = apply_raft_video(model, params, jnp.asarray(video), False, 6, True)
    np.testing.assert_allclose(np.asarray(out[:, 0]), ref.numpy(),
                               atol=5e-3, rtol=1e-3)


@pytest.mark.slow
def test_released_base_8x8_layout_converts():
    """Full released configuration (cwm_baseVMAE_224px_8x8patches_2frames):
    the real key layout and shapes convert to exactly the tree
    vmae.init_params builds for the matching factory."""
    from cwm.models.VideoMAE.vmae import pretrain_videomae_base_224_scaffold
    tmodel = pretrain_videomae_base_224_scaffold(
        patch_size=(8, 8), num_frames=2, tubelet_size=1)
    params = convert_vmae(tmodel.state_dict())

    jmodel = jvmae.base_8x8patch_2frames_1tube()
    ref_tree = jvmae.init_params(jmodel, jax.random.PRNGKey(0))
    a, b = _tree_spec(ref_tree), _tree_spec(params)
    missing = sorted(set(a) - set(b))
    extra = sorted(set(b) - set(a))
    assert not missing and not extra, (missing, extra)
    mismatched = {k: (a[k], b[k]) for k in a if a[k] != b[k]}
    assert not mismatched, mismatched


@pytest.mark.slow
def test_released_large_4x4_layout_converts():
    """Full released configuration (cwm_largeVMAE_224px_4x4patches_2frames)."""
    from cwm.models.VideoMAE.vmae import pretrain_videomae_large_224_scaffold
    tmodel = pretrain_videomae_large_224_scaffold(
        patch_size=(4, 4), num_frames=2, tubelet_size=1)
    params = convert_vmae(tmodel.state_dict())

    jmodel = jvmae.large_4x4patch_2frames_1tube()
    ref_tree = jvmae.init_params(jmodel, jax.random.PRNGKey(0))
    a, b = _tree_spec(ref_tree), _tree_spec(params)
    assert set(a) == set(b), (sorted(set(a) - set(b)), sorted(set(b) - set(a)))
    mismatched = {k: (a[k], b[k]) for k in a if a[k] != b[k]}
    assert not mismatched, mismatched


@pytest.mark.slow
def test_released_base_8x8_export_roundtrip():
    """Export direction at the RELEASED base_8x8 configuration: the full
    key layout round-trips convert -> export bitwise, covers every
    trainable param, and loads back into the reference scaffold."""
    import numpy as np
    from counterfactualworldmodels_tpu.utils import torch_export as tx
    from cwm.models.VideoMAE.vmae import pretrain_videomae_base_224_scaffold
    tmodel = pretrain_videomae_base_224_scaffold(
        patch_size=(8, 8), num_frames=2, tubelet_size=1)
    sd = tmodel.state_dict()
    params = convert_vmae(sd)
    out = tx.export_vmae(params, in_chans=3, patch_size=(1, 8, 8))
    for k, v in out.items():
        assert k in sd, k
        np.testing.assert_array_equal(np.asarray(v), sd[k].numpy(),
                                      err_msg=k)
    missing = {n for n, _ in tmodel.named_parameters()} - set(out)
    assert not missing, sorted(missing)[:8]
    import torch
    res = tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in out.items()}, strict=False)
    assert not res.unexpected_keys, res.unexpected_keys
