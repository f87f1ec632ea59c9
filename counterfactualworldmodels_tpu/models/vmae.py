"""VideoMAE-style masked predictor, TPU-native.

Re-design of the reference PretrainVisionTransformer
(cwm/models/VideoMAE/vmae.py:31-560) around XLA's static-shape model:

* The reference gathers visible tokens with ``x[~mask].reshape(B,-1,C)`` —
  a dynamic-shape op. Here the mask's visible count ``n_vis`` is a static
  argument and the gather is a stable argsort + take_along_axis: booleans
  sort False-first, so visible tokens appear in original row-major order,
  exactly matching the reference's boolean-gather ordering.
* Position tables are computed (sincos) rather than stored, like the
  reference's non-learnable default.
* Everything is a pure function of (params, x, mask): jit/vmap/pjit-ready.

Forward signature: x [B, C, T, H, W] (temporal_dim=2, predictor convention),
mask bool [B, N] True=masked with exactly ``num_patches - n_vis`` True per
row; returns predicted patch vectors for the masked positions
[B, N - n_vis, pt*ph*pw*C].
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.pos_embed import sinusoid_encoding_table
from .layers import Block, PatchEmbed

Dtype = jnp.dtype


def mask_order(mask: jnp.ndarray) -> jnp.ndarray:
    """Stable ordering of token indices, visible first.

    Returns int32 [B, N]; the first n_vis entries index the visible tokens in
    original order, the rest the masked tokens in original order.
    """
    return jnp.argsort(mask.astype(jnp.uint8), axis=-1, stable=True)


def take_tokens(tokens: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather [B, K, C] token rows by [B, K] indices."""
    return jnp.take_along_axis(tokens, idx[..., None], axis=1)


class VMAEEncoder(nn.Module):
    """ViT encoder over the visible tokens only (reference vmae.py:31-182)."""
    img_size: Tuple[int, int] = (224, 224)
    patch_size: Tuple[int, int] = (8, 8)
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    init_values: float = 0.0
    tubelet_size: int = 1
    num_frames: int = 2
    use_learnable_pos_emb: bool = False
    dtype: Dtype = jnp.float32
    attn_impl: str = 'dense'

    @property
    def full_patch_size(self):
        return (self.tubelet_size,) + tuple(self.patch_size)

    @property
    def num_patches(self):
        h, w = self.img_size
        return ((h // self.patch_size[0]) * (w // self.patch_size[1]) *
                (self.num_frames // self.tubelet_size))

    def setup(self):
        self.patch_embed = PatchEmbed(self.full_patch_size, self.embed_dim,
                                      dtype=self.dtype)
        if self.use_learnable_pos_emb:
            # trunc_normal(std=.02) like the reference (vmae.py:88) —
            # zeros would alter from-scratch training dynamics
            self.pos_embed = self.param(
                'pos_embed', nn.initializers.truncated_normal(0.02),
                (1, self.num_patches, self.embed_dim), jnp.float32)
        self.blocks = [
            Block(self.embed_dim, self.num_heads, self.mlp_ratio,
                  self.qkv_bias, self.qk_scale, self.init_values,
                  dtype=self.dtype, attn_impl=self.attn_impl)
            for i in range(self.depth)]
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)

    def _pos(self, n):
        if self.use_learnable_pos_emb:
            return self.pos_embed
        return sinusoid_encoding_table(n, self.embed_dim)

    def tokenize(self, x):
        tokens = self.patch_embed(x)
        pos = self._pos(tokens.shape[1]).astype(tokens.dtype)
        return tokens + pos

    def __call__(self, x, mask, n_vis: int):
        tokens = self.tokenize(x)
        order = mask_order(mask)
        x_vis = take_tokens(tokens, order[:, :n_vis])
        for blk in self.blocks:
            x_vis = blk(x_vis)
        return self.norm(x_vis)


class VMAEDecoder(nn.Module):
    """Narrow decoder over visible + mask tokens (reference vmae.py:184-255)."""
    embed_dim: int = 384
    depth: int = 4
    num_heads: int = 6
    num_classes: int = 192
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    init_values: float = 0.0
    dtype: Dtype = jnp.float32
    attn_impl: str = 'dense'

    def setup(self):
        self.blocks = [
            Block(self.embed_dim, self.num_heads, self.mlp_ratio,
                  self.qkv_bias, self.qk_scale, self.init_values,
                  dtype=self.dtype, attn_impl=self.attn_impl)
            for _ in range(self.depth)]
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.head = nn.Dense(self.num_classes, dtype=self.dtype)

    def get_last_tokens(self, x, return_token_num: int):
        """Head over the trailing (masked) tokens (reference vmae.py:238-244).

        0 -> empty output; negative -> all tokens, matching the reference.
        """
        if return_token_num > 0:
            x = x[:, -return_token_num:]
        elif return_token_num == 0:
            x = x[:, :0]
        return self.head(self.norm(x))

    def __call__(self, x, return_token_num: int):
        for blk in self.blocks:
            x = blk(x)
        return self.get_last_tokens(x, return_token_num)


class PretrainVisionTransformer(nn.Module):
    """Full masked video predictor (reference vmae.py:257-560)."""
    img_size: Tuple[int, int] = (224, 224)
    patch_size: Tuple[int, int] = (8, 8)
    encoder_in_chans: int = 3
    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
    decoder_embed_dim: int = 384
    decoder_depth: int = 4
    decoder_num_heads: int = 6
    decoder_num_classes: Optional[int] = None
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    init_values: float = 0.0
    tubelet_size: int = 1
    num_frames: int = 2
    use_learnable_pos_emb: bool = False
    dtype: Dtype = jnp.float32
    attn_impl: str = 'dense'

    @property
    def full_patch_size(self):
        return (self.tubelet_size,) + tuple(self.patch_size)

    @property
    def num_patches(self):
        h, w = self.img_size
        return ((h // self.patch_size[0]) * (w // self.patch_size[1]) *
                (self.num_frames // self.tubelet_size))

    @property
    def num_patches_per_frame(self):
        return self.num_patches // self.num_frames

    @property
    def mask_size(self):
        return (self.num_frames // self.tubelet_size,
                self.img_size[0] // self.patch_size[0],
                self.img_size[1] // self.patch_size[1])

    # alias used throughout the reference wrappers
    mask_shape = mask_size

    @property
    def out_dim(self):
        if self.decoder_num_classes is not None:
            return self.decoder_num_classes
        return (self.encoder_in_chans * self.tubelet_size *
                self.patch_size[0] * self.patch_size[1])

    def setup(self):
        self.encoder = VMAEEncoder(
            img_size=self.img_size, patch_size=self.patch_size,
            in_chans=self.encoder_in_chans, embed_dim=self.encoder_embed_dim,
            depth=self.encoder_depth, num_heads=self.encoder_num_heads,
            mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, init_values=self.init_values,
            tubelet_size=self.tubelet_size, num_frames=self.num_frames,
            use_learnable_pos_emb=self.use_learnable_pos_emb,
            dtype=self.dtype, attn_impl=self.attn_impl)
        self.decoder = VMAEDecoder(
            embed_dim=self.decoder_embed_dim, depth=self.decoder_depth,
            num_heads=self.decoder_num_heads, num_classes=self.out_dim,
            mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, init_values=self.init_values,
            dtype=self.dtype, attn_impl=self.attn_impl)
        self.encoder_to_decoder = nn.Dense(self.decoder_embed_dim,
                                           use_bias=False, dtype=self.dtype)
        # trunc_normal(std=.02) like the reference (vmae.py:360,371)
        self.mask_token = self.param(
            'mask_token', nn.initializers.truncated_normal(0.02),
            (1, 1, self.decoder_embed_dim), jnp.float32)

    def __call__(self, x, mask, n_vis: int):
        """x [B,C,T,H,W]; mask bool [B,N]; returns [B, N-n_vis, out_dim]."""
        b = x.shape[0]
        x_vis = self.encoder(x, mask, n_vis)
        x_vis = self.encoder_to_decoder(x_vis)
        c = x_vis.shape[-1]

        pos = sinusoid_encoding_table(self.num_patches, self.decoder_embed_dim)
        pos = jnp.broadcast_to(pos, (b, self.num_patches, c)).astype(x_vis.dtype)
        order = mask_order(mask)
        pos_vis = take_tokens(pos, order[:, :n_vis])
        pos_mask = take_tokens(pos, order[:, n_vis:])

        mask_tok = self.mask_token.astype(x_vis.dtype)
        x_full = jnp.concatenate(
            [x_vis + pos_vis, mask_tok + pos_mask], axis=1)
        return self.decoder(x_full, pos_mask.shape[1])

    def encode(self, x, mask, n_vis: int):
        return self.encoder(x, mask, n_vis)


# ---------------------------------------------------------------------------
# Factories mirroring reference vmae.py:563-619.
# ---------------------------------------------------------------------------

def pretrain_videomae_base_224_scaffold(**kwargs):
    return PretrainVisionTransformer(
        img_size=(224, 224), encoder_embed_dim=768, encoder_depth=12,
        encoder_num_heads=12, decoder_embed_dim=384, decoder_num_heads=6,
        decoder_depth=4, mlp_ratio=4.0, qkv_bias=True, **kwargs)


def pretrain_videomae_large_224_scaffold(**kwargs):
    return PretrainVisionTransformer(
        img_size=(224, 224), encoder_embed_dim=1024, encoder_depth=24,
        encoder_num_heads=16, decoder_embed_dim=512, decoder_num_heads=8,
        decoder_depth=12, mlp_ratio=4.0, qkv_bias=True, **kwargs)


def base_16x16patch_2frames_1tube(**kwargs):
    return pretrain_videomae_base_224_scaffold(
        patch_size=(16, 16), num_frames=2, tubelet_size=1, **kwargs)


def base_8x8patch_2frames_1tube(**kwargs):
    """ViT-B/8x8 2-frame config (checkpoint cwm_baseVMAE_224px_8x8patches)."""
    return pretrain_videomae_base_224_scaffold(
        patch_size=(8, 8), num_frames=2, tubelet_size=1, **kwargs)


def large_4x4patch_2frames_1tube(**kwargs):
    """ViT-L/4x4 2-frame config (checkpoint cwm_largeVMAE_224px_4x4patches)."""
    return pretrain_videomae_large_224_scaffold(
        patch_size=(4, 4), num_frames=2, tubelet_size=1, **kwargs)


def init_params(model: PretrainVisionTransformer, key=None, n_vis: Optional[int] = None):
    """Initialize parameters with a minimal dummy batch."""
    key = key if key is not None else jax.random.PRNGKey(0)
    h, w = model.img_size
    x = jnp.zeros((1, model.encoder_in_chans, model.num_frames, h, w),
                  jnp.float32)
    n = model.num_patches
    if n_vis is None:
        n_vis = n // model.num_frames
    mask = jnp.arange(n)[None] >= n_vis
    return model.init(key, x, mask, n_vis)['params']


@functools.partial(jax.jit, static_argnums=(0, 4))
def apply_vmae(model: PretrainVisionTransformer, params, x, mask, n_vis: int):
    """Jitted forward; model and n_vis are static."""
    return model.apply({'params': params}, x, mask, n_vis)
