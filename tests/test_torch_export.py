"""Bidirectional checkpoint interop: flax -> reference torch state dicts.

convert(sd) -> export == sd bitwise for every exported key, exported keys
cover all reference trainable parameters, and the exported dict loads back
into the reference torch module — so checkpoints trained here
(scripts/train_*.py) are loadable by the reference (its load path:
cwm/models/prediction.py:94-99).
"""
import numpy as np
import pytest

from reference_shims import install as install_reference
install_reference()

import torch  # noqa: E402

from counterfactualworldmodels_tpu.utils import torch_convert as tc  # noqa: E402
from counterfactualworldmodels_tpu.utils import torch_export as tx  # noqa: E402


def _roundtrip_check(sd, out, model=None, ignore_missing=()):
    """Every exported key matches the original bitwise; every reference
    trainable param (minus ignore_missing) is exported; optionally load
    the exported dict back into the torch module."""
    sd = {k: v for k, v in sd.items()}
    for k, v in out.items():
        assert k in sd, f'exported unknown key {k}'
        np.testing.assert_array_equal(
            np.asarray(v, dtype=np.asarray(sd[k].numpy()).dtype),
            sd[k].numpy(), err_msg=k)
    if model is not None:
        param_names = {n for n, _ in model.named_parameters()}
        missing = param_names - set(out) - set(ignore_missing)
        assert not missing, f'params not exported: {sorted(missing)[:8]}'
        tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
                   for k, v in out.items()}
        res = model.load_state_dict(tensors, strict=False)
        assert not res.unexpected_keys, res.unexpected_keys


def test_vmae_export_roundtrip():
    from cwm.models.VideoMAE import vmae as tvmae
    torch.manual_seed(0)
    patch = 4
    tmodel = tvmae.PretrainVisionTransformer(
        img_size=16, patch_size=(patch, patch), encoder_embed_dim=48,
        encoder_depth=2, encoder_num_heads=4, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2, encoder_num_classes=0,
        mlp_ratio=2, qkv_bias=True, num_frames=2, tubelet_size=1,
        decoder_num_classes=3 * patch * patch,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6)).eval()
    sd = tmodel.state_dict()
    params = tc.convert_vmae(sd)
    out = tx.export_vmae(params, in_chans=3, patch_size=(1, patch, patch))
    _roundtrip_check(sd, out, tmodel)


def test_raft_export_roundtrip_both_sizes():
    from cwm.models.raft import raft_model as traft
    for small, output_dim in ((False, None), (True, None), (False, 1)):
        args = traft.get_args('')
        args.multiframe = False
        args.scale_inputs = False
        args.small = small
        args.output_dim = output_dim
        args.mixed_precision = False
        torch.manual_seed(1)
        tmodel = traft.RAFT(args).eval()
        sd = tmodel.state_dict()
        params = tc.convert_raft(sd, small=small)
        out = tx.export_raft(params, small=small)
        _roundtrip_check(sd, out, tmodel)
        res = tmodel.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in out.items()}, strict=True)
        assert not res.missing_keys and not res.unexpected_keys


def test_channel_mae_export_roundtrip():
    import cwm.models.VideoMAE.cmae as tcmae
    torch.manual_seed(2)
    partition = (1, 2)
    enc = dict(image_size=16, patch_size=(4, 4), in_channels=3,
               channel_partition=partition, embed_dim=48, depth=2,
               num_heads=4, mlp_ratio=2.0, qkv_bias=True)
    dec = dict(embed_dim=32, depth=1, num_heads=4, mlp_ratio=2.0,
               qkv_bias=True)
    tmodel = tcmae.ChannelMae(encoder_params=enc, decoder_params=dec).eval()
    sd = tmodel.state_dict()
    params = tc.convert_channel_mae(sd)
    out = tx.export_channel_mae(params, partition, (4, 4))
    _roundtrip_check(sd, out, tmodel)


@pytest.mark.slow
def test_conjoined_export_roundtrip():
    """Round-trip the IMU-conditioned conjoined layout (the
    imu400_base_4x4patch_2frames_1tube family, reference
    conjoined_vmae.py:1230-1243, scaled down)."""
    from test_conjoined import _ref_conjoined, _my_conjoined
    tmodel = _ref_conjoined(padded=False)
    wrapper = _my_conjoined(padded=False)
    sd = tmodel.state_dict()
    params = tc.convert_conjoined(sd)
    out = tx.export_conjoined(wrapper.model, params)
    _roundtrip_check(sd, out, tmodel,
                     ignore_missing={k for k, _ in
                                     tmodel.named_parameters()
                                     if 'pos_embed' in k})


@pytest.mark.slow
def test_conjoined_padded_export_roundtrip():
    """Padded variant: the learnable null tokens
    (PaddedVisionTransformer, conjoined_vmae.py:24-210) round-trip too."""
    from test_conjoined import _ref_conjoined, _my_conjoined
    tmodel = _ref_conjoined(padded=True)
    wrapper = _my_conjoined(padded=True)
    sd = tmodel.state_dict()
    params = tc.convert_conjoined(sd)
    out = tx.export_conjoined(wrapper.model, params)
    assert any(k.endswith('null_token_enc') for k in out)
    _roundtrip_check(sd, out, tmodel,
                     ignore_missing={k for k, _ in
                                     tmodel.named_parameters()
                                     if 'pos_embed' in k})


def test_save_torch_checkpoint(tmp_path):
    from cwm.models.raft import raft_model as traft
    args = traft.get_args('')
    args.multiframe = False
    args.scale_inputs = False
    args.small = True
    args.output_dim = None
    args.mixed_precision = False
    torch.manual_seed(3)
    tmodel = traft.RAFT(args).eval()
    sd = tmodel.state_dict()
    out = tx.export_raft(tc.convert_raft(sd, small=True), small=True)
    p = str(tmp_path / 'raft.pth')
    tx.save_torch_checkpoint(out, p)
    loaded = torch.load(p, map_location='cpu', weights_only=False)['model']
    assert set(loaded) == set(out)
    # and it converts straight back (the reference load path shape)
    again = tc.convert_raft({k: v for k, v in loaded.items()}, small=True)
    flat1 = sorted(map(str, torch.utils._pytree.tree_leaves(again)))
    assert flat1  # structural smoke; exact values checked above
