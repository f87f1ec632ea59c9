"""Transformer building blocks for the VMAE family (flax.linen).

TPU-native re-design of reference cwm/models/VideoMAE/utils.py:37-245:

* patch embedding is a reshape + one big matmul (stride == kernel makes the
  reference Conv3d exactly a linear map on patch vectors) — lands on the MXU
  with no conv lowering;
* attention takes a pluggable implementation ('dense' einsum softmax or the
  Pallas flash kernel in ops/flash_attention.py);
* parameters are laid out so the torch->flax converter in
  utils/torch_convert.py is a pure name/transpose mapping.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.patches import patchify

Dtype = jnp.dtype


class Mlp(nn.Module):
    hidden_features: int
    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name='fc1')(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_features, dtype=self.dtype, name='fc2')(x)
        return x


def dense_attention(q, k, v, dtype=jnp.float32):
    """Plain softmax attention; q is pre-scaled. [B,H,N,D] each."""
    attn = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(dtype)
    return jnp.einsum('bhqk,bhkd->bhqd', attn, v,
                      preferred_element_type=jnp.float32).astype(dtype)


class Attention(nn.Module):
    """Multi-head self-attention with the reference's split q/v bias layout
    (cwm/models/VideoMAE/utils.py:57-121): fused qkv weight without bias plus
    separate q_bias / v_bias parameters (k bias fixed at zero).
    """
    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_head_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    attn_impl: str = 'dense'  # 'dense' | 'flash'

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        head_dim = self.attn_head_dim or self.dim // self.num_heads
        all_head_dim = head_dim * self.num_heads
        scale = self.qk_scale or head_dim ** -0.5

        # qkv kernel is stored [D, 3, A] (not the reference's fused [3A, D])
        # so tensor parallelism can shard the head axis A without crossing
        # the q/k/v boundary (head-aligned whenever tp divides num_heads).
        qkv_kernel = self.param(
            'qkv_kernel', nn.initializers.xavier_uniform(),
            (self.dim, 3, all_head_dim), jnp.float32)
        qkv = jnp.einsum('bnd,dta->bnta', x, qkv_kernel.astype(self.dtype),
                         preferred_element_type=jnp.float32).astype(self.dtype)
        if self.qkv_bias:
            q_bias = self.param('q_bias', nn.initializers.zeros,
                                (all_head_dim,), jnp.float32)
            v_bias = self.param('v_bias', nn.initializers.zeros,
                                (all_head_dim,), jnp.float32)
            bias = jnp.stack([q_bias, jnp.zeros_like(q_bias), v_bias])
            qkv = qkv + bias.astype(self.dtype)

        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B,N,H,D]
        q = jnp.swapaxes(q, 1, 2) * scale                   # [B,H,N,D]
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)

        if self.attn_impl == 'flash':
            from ..ops.flash_attention import flash_attention
            out = flash_attention(q, k, v)
        else:
            out = dense_attention(q, k, v, dtype=self.dtype)

        out = jnp.swapaxes(out, 1, 2).reshape(b, n, all_head_dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name='proj')(out)
        return out


class Block(nn.Module):
    """Pre-norm transformer block with optional layerscale gammas
    (reference VideoMAE/utils.py:124-153)."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    init_values: Optional[float] = None
    attn_head_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    attn_impl: str = 'dense'
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        attn = Attention(self.dim, self.num_heads, self.qkv_bias,
                         self.qk_scale, self.attn_head_dim,
                         dtype=self.dtype, attn_impl=self.attn_impl,
                         name='attn')
        mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                  name='mlp')
        norm1 = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                             name='norm1')
        norm2 = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                             name='norm2')
        use_gamma = (self.init_values or 0) > 0
        if use_gamma:
            gamma_1 = self.param('gamma_1',
                                 nn.initializers.constant(self.init_values),
                                 (self.dim,), jnp.float32)
            gamma_2 = self.param('gamma_2',
                                 nn.initializers.constant(self.init_values),
                                 (self.dim,), jnp.float32)
            x = x + gamma_1.astype(self.dtype) * attn(norm1(x))
            x = x + gamma_2.astype(self.dtype) * mlp(norm2(x))
        else:
            x = x + attn(norm1(x))
            x = x + mlp(norm2(x))
        return x


class PatchEmbed(nn.Module):
    """Tubelet patch embedding as patchify + matmul.

    Equivalent to the reference's strided Conv3d
    (cwm/models/VideoMAE/utils.py:156-198) because stride == kernel; a single
    [D*C, E] matmul maps straight onto the MXU. Input [B, C, T, H, W].
    """
    patch_size: tuple  # (pt, ph, pw)
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        patches = patchify(x, self.patch_size, temporal_dim=2,
                           squeeze_channel_dim=True)  # [B,N,(pt ph pw) c]
        out = nn.Dense(self.embed_dim, dtype=self.dtype, name='proj')(patches)
        return out


class ImagePatchEmbed(nn.Module):
    """2-D patch embedding for image inputs (reference VideoMAE/utils.py:200-245)."""
    patch_size: tuple  # (ph, pw)
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if x.ndim == 5:
            assert x.shape[2] == 1, x.shape
            x = x[:, :, 0]
        patches = patchify(x, (1,) + tuple(self.patch_size))
        return nn.Dense(self.embed_dim, dtype=self.dtype, name='proj')(patches)


def interpolate_with_mask_token(x, mask, mask_token, invert: bool = True):
    """Soft lerp between tokens and a mask token (reference utils.py:270-289)."""
    b, n, c = x.shape
    m = jnp.clip(mask.astype(x.dtype), 0.0, 1.0)
    if invert:
        m = 1.0 - m
    m = m[..., None]
    token = jnp.broadcast_to(mask_token.reshape(1, 1, c), (b, n, c))
    return token + m * (x - token)
