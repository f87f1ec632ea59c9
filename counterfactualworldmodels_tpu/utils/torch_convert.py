"""Convert reference PyTorch checkpoints to flax parameter pytrees.

Handles the VMAE family (cwm/models/VideoMAE/vmae.py state dicts, including
the released checkpoints cwm_baseVMAE_224px_8x8patches_2frames.pth /
cwm_largeVMAE_224px_4x4patches_2frames.pth, loaded as
``torch.load(path)['model']`` per reference cwm/models/prediction.py:94-99)
and the RAFT checkpoints (raft-large / keypoint predictor, with DDP
'module.' prefixes stripped per reference raft_model.py:78-90).

Rules:
* torch Linear weight [out, in]  -> flax Dense kernel [in, out] (transpose)
* torch Conv   weight [out, in, *k] -> flax kernel [*k, in, out]
* the VMAE Conv3d patch embed     -> our matmul patch embed: weight
  [E, C, pt, ph, pw] -> kernel [(pt ph pw c), E] matching the
  ops.patches.patchify intra-patch layout.
* LayerNorm/BatchNorm weight/bias -> scale/bias.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _np(v):
    if hasattr(v, 'detach'):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _set(tree: Dict, path: str, value):
    parts = path.split('/')
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _linear(tree, flax_path, sd, torch_prefix, bias=True):
    _set(tree, flax_path + '/kernel', _np(sd[torch_prefix + '.weight']).T)
    if bias and (torch_prefix + '.bias') in sd:
        _set(tree, flax_path + '/bias', _np(sd[torch_prefix + '.bias']))


def _layernorm(tree, flax_path, sd, torch_prefix):
    _set(tree, flax_path + '/scale', _np(sd[torch_prefix + '.weight']))
    _set(tree, flax_path + '/bias', _np(sd[torch_prefix + '.bias']))


def _block(tree, flax_path, sd, torch_prefix):
    _layernorm(tree, flax_path + '/norm1', sd, torch_prefix + '.norm1')
    _layernorm(tree, flax_path + '/norm2', sd, torch_prefix + '.norm2')
    w = _np(sd[torch_prefix + '.attn.qkv.weight']).T  # [D, 3A]
    _set(tree, flax_path + '/attn/qkv_kernel',
         w.reshape(w.shape[0], 3, w.shape[1] // 3))
    for b in ('q_bias', 'v_bias'):
        k = f'{torch_prefix}.attn.{b}'
        if k in sd:
            _set(tree, f'{flax_path}/attn/{b}', _np(sd[k]))
    _linear(tree, flax_path + '/attn/proj', sd, torch_prefix + '.attn.proj')
    _linear(tree, flax_path + '/mlp/fc1', sd, torch_prefix + '.mlp.fc1')
    _linear(tree, flax_path + '/mlp/fc2', sd, torch_prefix + '.mlp.fc2')
    for g in ('gamma_1', 'gamma_2'):
        k = f'{torch_prefix}.{g}'
        if k in sd:
            _set(tree, f'{flax_path}/{g}', _np(sd[k]))


def _patch_embed(tree, flax_path, sd, torch_prefix):
    w = _np(sd[torch_prefix + '.proj.weight'])  # [E, C, pt, ph, pw] or [E,C,ph,pw]
    if w.ndim == 4:
        w = w[:, :, None]
    e = w.shape[0]
    kernel = w.transpose(2, 3, 4, 1, 0).reshape(-1, e)  # [(pt ph pw c), E]
    _set(tree, flax_path + '/proj/kernel', kernel)
    _set(tree, flax_path + '/proj/bias', _np(sd[torch_prefix + '.proj.bias']))


def strip_prefixes(sd: Dict, prefixes=('module.',)) -> Dict:
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
        out[k] = v
    return out


def convert_vmae(sd: Dict) -> Dict:
    """Reference PretrainVisionTransformer state dict -> flax params tree."""
    sd = strip_prefixes(sd)
    if 'model' in sd and hasattr(sd['model'], 'keys'):
        sd = strip_prefixes(sd['model'])
    tree: Dict = {}

    enc_depth = max((int(k.split('.')[2]) for k in sd
                     if k.startswith('encoder.blocks.')), default=-1) + 1
    dec_depth = max((int(k.split('.')[2]) for k in sd
                     if k.startswith('decoder.blocks.')), default=-1) + 1

    _patch_embed(tree, 'encoder/patch_embed', sd, 'encoder.patch_embed')
    for i in range(enc_depth):
        _block(tree, f'encoder/blocks_{i}', sd, f'encoder.blocks.{i}')
    _layernorm(tree, 'encoder/norm', sd, 'encoder.norm')
    if 'encoder.pos_embed' in sd:
        _set(tree, 'encoder/pos_embed', _np(sd['encoder.pos_embed']))

    if dec_depth > 0:
        for i in range(dec_depth):
            _block(tree, f'decoder/blocks_{i}', sd, f'decoder.blocks.{i}')
        _layernorm(tree, 'decoder/norm', sd, 'decoder.norm')
        _linear(tree, 'decoder/head', sd, 'decoder.head')
        _linear(tree, 'encoder_to_decoder', sd, 'encoder_to_decoder',
                bias=False)
    if 'mask_token' in sd:
        _set(tree, 'mask_token', _np(sd['mask_token']))
    return tree


def load_vmae_checkpoint(path: str) -> Dict:
    """torch.load a reference VMAE checkpoint and convert to flax params."""
    import torch
    weights = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(weights, dict) and 'model' in weights:
        weights = weights['model']
    return convert_vmae(weights)


# ---------------------------------------------------------------------------
# RAFT (reference cwm/models/raft/*)
# ---------------------------------------------------------------------------

def _conv2d(tree, flax_path, sd, torch_prefix):
    w = _np(sd[torch_prefix + '.weight'])  # [O, I, kh, kw]
    _set(tree, flax_path + '/kernel', w.transpose(2, 3, 1, 0))
    bk = torch_prefix + '.bias'
    if bk in sd and sd[bk] is not None:
        _set(tree, flax_path + '/bias', _np(sd[bk]))


def _bn(tree, flax_path, sd, torch_prefix):
    _set(tree, flax_path + '/scale', _np(sd[torch_prefix + '.weight']))
    _set(tree, flax_path + '/bias', _np(sd[torch_prefix + '.bias']))
    _set(tree, flax_path + '/mean', _np(sd[torch_prefix + '.running_mean']))
    _set(tree, flax_path + '/var', _np(sd[torch_prefix + '.running_var']))


def _res_block(tree, flax_path, sd, torch_prefix, norm_fn, bottleneck=False):
    n_convs = 3 if bottleneck else 2
    for i in range(1, n_convs + 1):
        _conv2d(tree, f'{flax_path}/conv{i}', sd, f'{torch_prefix}.conv{i}')
        if norm_fn == 'batch':
            _bn(tree, f'{flax_path}/norm{i}', sd, f'{torch_prefix}.norm{i}')
    ds = f'{torch_prefix}.downsample.0'
    if ds + '.weight' in sd:
        _conv2d(tree, f'{flax_path}/downsample_conv', sd, ds)
        norm_i = n_convs + 1
        if norm_fn == 'batch':
            _bn(tree, f'{flax_path}/norm{norm_i}', sd,
                f'{torch_prefix}.downsample.1')


def _encoder(tree, flax_path, sd, torch_prefix, norm_fn, bottleneck=False):
    _conv2d(tree, f'{flax_path}/conv1', sd, f'{torch_prefix}.conv1')
    if norm_fn == 'batch':
        _bn(tree, f'{flax_path}/norm1', sd, f'{torch_prefix}.norm1')
    for layer in (1, 2, 3):
        for blk in (0, 1):
            _res_block(tree, f'{flax_path}/layer{layer}_{blk}', sd,
                       f'{torch_prefix}.layer{layer}.{blk}', norm_fn,
                       bottleneck)
    _conv2d(tree, f'{flax_path}/conv2', sd, f'{torch_prefix}.conv2')


def convert_raft(sd: Dict, small: bool = False) -> Dict:
    """Reference RAFT state dict -> flax params tree for models.raft.RAFT."""
    sd = strip_prefixes(sd)
    tree: Dict = {}
    bottleneck = small
    _encoder(tree, 'fnet', sd, 'fnet', 'instance', bottleneck)
    _encoder(tree, 'cnet', sd, 'cnet', 'batch' if not small else 'none',
             bottleneck)

    ub = 'update_step/update_block'
    for c in (['convc1', 'convc2', 'convf1', 'convf2', 'conv'] if not small
              else ['convc1', 'convf1', 'convf2', 'conv']):
        _conv2d(tree, f'{ub}/encoder/{c}', sd, f'update_block.encoder.{c}')
    gru_convs = (['convz1', 'convr1', 'convq1', 'convz2', 'convr2', 'convq2']
                 if not small else ['convz', 'convr', 'convq'])
    for c in gru_convs:
        _conv2d(tree, f'{ub}/gru/{c}', sd, f'update_block.gru.{c}')
    _conv2d(tree, f'{ub}/flow_head/conv1', sd, 'update_block.flow_head.conv1')
    _conv2d(tree, f'{ub}/flow_head/conv2', sd, 'update_block.flow_head.conv2')
    if 'update_block.mask.0.weight' in sd:
        _conv2d(tree, f'{ub}/mask_0', sd, 'update_block.mask.0')
        _conv2d(tree, f'{ub}/mask_2', sd, 'update_block.mask.2')
    if 'output_block.0.weight' in sd:
        _conv2d(tree, 'output_block_0', sd, 'output_block.0')
        _conv2d(tree, 'output_block_2', sd, 'output_block.2')
    return tree


def load_raft_checkpoint(path: str, small: bool = False) -> Dict:
    import torch
    weights = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(weights, dict) and 'model' in weights:
        weights = weights['model']
    return convert_raft(weights, small=small)


# ---------------------------------------------------------------------------
# Conjoined VMAE (reference cwm/models/VideoMAE/conjoined_vmae.py)
# ---------------------------------------------------------------------------

def _imu_patch_embed(tree, flax_path, sd, torch_prefix):
    w = _np(sd[torch_prefix + '.proj.weight'])  # [E, C, pt, 1, 1]
    e = w.shape[0]
    kernel = w[:, :, :, 0, 0].transpose(2, 1, 0).reshape(-1, e)  # [(pt c), E]
    _set(tree, flax_path + '/kernel', kernel)
    _set(tree, flax_path + '/bias', _np(sd[torch_prefix + '.proj.bias']))


def _cross_block(tree, flax_path, sd, torch_prefix):
    _layernorm(tree, f'{flax_path}/norm1_cross', sd, f'{torch_prefix}.norm1_cross')
    _layernorm(tree, f'{flax_path}/norm1_src_cross', sd,
               f'{torch_prefix}.norm1_src_cross')
    for lin in ('qk', 'qk_src', 'v', 'v_src'):
        _linear(tree, f'{flax_path}/cross_attention/{lin}', sd,
                f'{torch_prefix}.cross_attention.{lin}')
    _linear(tree, f'{flax_path}/cross_attention/projection', sd,
            f'{torch_prefix}.cross_attention.projection')
    _linear(tree, f'{flax_path}/cross_attention/projection_src', sd,
            f'{torch_prefix}.cross_attention.projection_src')
    if f'{torch_prefix}.norm2.weight' in sd:
        _layernorm(tree, f'{flax_path}/norm2', sd, f'{torch_prefix}.norm2')
        _linear(tree, f'{flax_path}/mlp_trg/layers_0', sd,
                f'{torch_prefix}.mlp.trg.layers.0')
        _linear(tree, f'{flax_path}/mlp_trg/layers_2', sd,
                f'{torch_prefix}.mlp.trg.layers.2')
    if f'{torch_prefix}.norm2_src.weight' in sd:
        _layernorm(tree, f'{flax_path}/norm2_src', sd,
                   f'{torch_prefix}.norm2_src')
        _linear(tree, f'{flax_path}/mlp_src/layers_0', sd,
                f'{torch_prefix}.mlp.src.layers.0')
        _linear(tree, f'{flax_path}/mlp_src/layers_2', sd,
                f'{torch_prefix}.mlp.src.layers.2')
    # self-attention branch (with_self_attention configs): reference keys
    # {prefix}.self_attention.{trg,src}.* + norm1 / norm1_src
    # (transformer.py:469-478) — previously dropped silently
    for side, flax_name in (('trg', 'self_attention_trg'),
                            ('src', 'self_attention_src')):
        tq = f'{torch_prefix}.self_attention.{side}.qkv.weight'
        if tq not in sd:
            continue
        w = _np(sd[tq]).T
        _set(tree, f'{flax_path}/{flax_name}/qkv_kernel',
             w.reshape(w.shape[0], 3, w.shape[1] // 3))
        for b in ('q_bias', 'v_bias'):
            k = f'{torch_prefix}.self_attention.{side}.{b}'
            if k in sd:
                _set(tree, f'{flax_path}/{flax_name}/{b}', _np(sd[k]))
        _linear(tree, f'{flax_path}/{flax_name}/projection', sd,
                f'{torch_prefix}.self_attention.{side}.projection')
    if f'{torch_prefix}.norm1.weight' in sd:
        _layernorm(tree, f'{flax_path}/norm1', sd, f'{torch_prefix}.norm1')
    if f'{torch_prefix}.norm1_src.weight' in sd:
        _layernorm(tree, f'{flax_path}/norm1_src', sd,
                   f'{torch_prefix}.norm1_src')
    for g in ('gamma_1', 'gamma_1_cross', 'gamma_1_src', 'gamma_1_src_cross',
              'gamma_2', 'gamma_2_src'):
        k = f'{torch_prefix}.{g}'
        if k in sd:
            _set(tree, f'{flax_path}/{g}', _np(sd[k]))


def _stream(tree, prefix_flax, sd, prefix_torch, is_imu=False):
    enc_depth = max((int(k.split('.')[3]) for k in sd
                     if k.startswith(f'{prefix_torch}.encoder.blocks.')),
                    default=-1) + 1
    dec_depth = max((int(k.split('.')[3]) for k in sd
                     if k.startswith(f'{prefix_torch}.decoder.blocks.')),
                    default=-1) + 1
    if is_imu:
        _imu_patch_embed(tree, f'{prefix_flax}_encoder/proj', sd,
                         f'{prefix_torch}.encoder.patch_embed')
        dk = f'{prefix_torch}.encoder.dummy_token'
        if dk in sd:
            _set(tree, f'{prefix_flax}_encoder/dummy_token', _np(sd[dk]))
    else:
        _patch_embed(tree, f'{prefix_flax}_encoder/patch_embed', sd,
                     f'{prefix_torch}.encoder.patch_embed')
    for i in range(enc_depth):
        _block(tree, f'{prefix_flax}_encoder/blocks_{i}', sd,
               f'{prefix_torch}.encoder.blocks.{i}')
    _layernorm(tree, f'{prefix_flax}_encoder/norm', sd,
               f'{prefix_torch}.encoder.norm')
    for i in range(dec_depth):
        _block(tree, f'{prefix_flax}_decoder/blocks_{i}', sd,
               f'{prefix_torch}.decoder.blocks.{i}')
    _layernorm(tree, f'{prefix_flax}_decoder/norm', sd,
               f'{prefix_torch}.decoder.norm')
    _linear(tree, f'{prefix_flax}_decoder/head', sd,
            f'{prefix_torch}.decoder.head')
    _linear(tree, f'{prefix_flax}_e2d', sd,
            f'{prefix_torch}.encoder_to_decoder', bias=False)
    _set(tree, f'{prefix_flax}_mask_token', _np(sd[f'{prefix_torch}.mask_token']))
    for tname, fname in (('null_token_enc', 'null_enc'),
                         ('null_token_dec', 'null_dec')):
        k = f'{prefix_torch}.{tname}'
        if k in sd:
            _set(tree, f'{prefix_flax}_{fname}', _np(sd[k]))


def convert_conjoined(sd: Dict, context_is_imu: bool = True) -> Dict:
    """Reference Conjoined(Padded)PretrainVisionTransformer state dict ->
    flax params for models.conjoined.ConjoinedVMAE."""
    sd = strip_prefixes(sd)
    tree: Dict = {}
    _stream(tree, 'main', sd, 'main_stream', is_imu=False)
    _stream(tree, 'context', sd, 'context_stream', is_imu=context_is_imu)

    # full (i, j) sort key: ties on the main-layer index alone would take
    # an arbitrary set order and permute cross-block weights
    def _ij(s):
        return tuple(int(v) for v in s.split('-'))

    enc_keys = sorted({k.split('.')[1] for k in sd
                       if k.startswith('encoder_conjoining_blocks.')},
                      key=_ij)
    dec_keys = sorted({k.split('.')[1] for k in sd
                       if k.startswith('decoder_conjoining_blocks.')},
                      key=_ij)
    for idx, key in enumerate(enc_keys):
        _cross_block(tree, f'encoder_cross_blocks_{idx}', sd,
                     f'encoder_conjoining_blocks.{key}')
    for idx, key in enumerate(dec_keys):
        _cross_block(tree, f'decoder_cross_blocks_{idx}', sd,
                     f'decoder_conjoining_blocks.{key}')
    return tree


def load_conjoined_checkpoint(path: str, context_is_imu: bool = True) -> Dict:
    import torch
    weights = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(weights, dict) and 'model' in weights:
        weights = weights['model']
    return convert_conjoined(weights, context_is_imu=context_is_imu)


# ---------------------------------------------------------------------------
# ChannelMAE (reference cwm/models/VideoMAE/cmae.py)
# ---------------------------------------------------------------------------

def convert_channel_mae(sd: Dict) -> Dict:
    """Reference ChannelMae state dict -> flax params for models.cmae."""
    sd = strip_prefixes(sd)
    tree: Dict = {}
    groups = sorted({int(k.split('.')[2]) for k in sd
                     if k.startswith('encoder.patch_embed.')})
    for g in groups:
        w = _np(sd[f'encoder.patch_embed.{g}.proj.weight'])  # [E,C,ph,pw]
        e = w.shape[0]
        # ImagePatchEmbed conv -> matmul on (ph pw c)-ordered patch vectors
        _set(tree, f'encoder/patch_embeds_{g}/kernel',
             w.transpose(2, 3, 1, 0).reshape(-1, e))
        _set(tree, f'encoder/patch_embeds_{g}/bias',
             _np(sd[f'encoder.patch_embed.{g}.proj.bias']))
    enc_depth = max((int(k.split('.')[2]) for k in sd
                     if k.startswith('encoder.blocks.')), default=-1) + 1
    dec_depth = max((int(k.split('.')[2]) for k in sd
                     if k.startswith('decoder.blocks.')), default=-1) + 1
    for i in range(enc_depth):
        _block(tree, f'encoder/blocks_{i}', sd, f'encoder.blocks.{i}')
    _layernorm(tree, 'encoder/norm', sd, 'encoder.norm')
    for i in range(dec_depth):
        _block(tree, f'decoder/blocks_{i}', sd, f'decoder.blocks.{i}')
    _layernorm(tree, 'decoder/norm', sd, 'decoder.norm')
    _linear(tree, 'encoder_to_decoder', sd, 'encoder_to_decoder', bias=False)
    if 'mask_token' in sd:
        _set(tree, 'mask_token', _np(sd['mask_token']))
    if 'decoder_mask_token' in sd:  # SoftInputChannelMae
        _set(tree, 'decoder_mask_token', _np(sd['decoder_mask_token']))
    heads = sorted({int(k.split('.')[1]) for k in sd
                    if k.startswith('channel_heads.')})
    for g in heads:
        _linear(tree, f'channel_heads_{g}', sd, f'channel_heads.{g}')
    return tree
