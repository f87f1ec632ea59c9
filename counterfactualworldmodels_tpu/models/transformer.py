"""Cross-attention transformer blocks for conjoined (two-stream) models.

Re-design of reference cwm/models/transformer.py:77-583. Notes:

* The reference's in-block self-attention path is dead code (it calls
  ``time.time()`` without importing time, transformer.py:164); here it is
  implemented working.
* The reference's BidirectionalCrossAttention "qkv_bias" is a torch.cat of
  unregistered Parameters — a constant zero tensor that never trains or
  serializes (transformer.py:286-290), so it is omitted entirely.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import dense_attention

Dtype = jnp.dtype


class GenericMlp(nn.Module):
    """Mlp with configurable hidden dims (reference transformer.py:77-110)."""
    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torch names: layers.0 (Linear), layers.1 (act), layers.2 (Linear)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name='layers_0')(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name='layers_2')(x)
        return x


class CrossSelfAttention(nn.Module):
    """Self-attention with head_dim/out_dim overrides
    (reference transformer.py:112-185, with the time-import bug fixed)."""
    in_dim: int
    num_heads: int = 8
    head_dim: Optional[int] = None
    out_dim: Optional[int] = None
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        if self.out_dim is None:
            head_dim = self.head_dim or self.in_dim // self.num_heads
            out_dim = head_dim * self.num_heads
        else:
            out_dim = self.out_dim
            head_dim = self.head_dim or out_dim // self.num_heads
        scale = self.qk_scale or head_dim ** -0.5
        inner = head_dim * self.num_heads

        # [D, 3, A] layout for head-aligned tensor parallelism (see
        # models/layers.py Attention)
        qkv_kernel = self.param('qkv_kernel', nn.initializers.xavier_uniform(),
                                (self.in_dim, 3, inner), jnp.float32)
        qkv = jnp.einsum('bnd,dta->bnta', x, qkv_kernel.astype(self.dtype),
                         preferred_element_type=jnp.float32).astype(self.dtype)
        if self.qkv_bias:
            q_bias = self.param('q_bias', nn.initializers.zeros, (inner,),
                                jnp.float32)
            v_bias = self.param('v_bias', nn.initializers.zeros, (inner,),
                                jnp.float32)
            qkv = qkv + jnp.stack(
                [q_bias, jnp.zeros_like(q_bias), v_bias]).astype(self.dtype)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q = jnp.swapaxes(qkv[:, :, 0], 1, 2) * scale
        k = jnp.swapaxes(qkv[:, :, 1], 1, 2)
        v = jnp.swapaxes(qkv[:, :, 2], 1, 2)
        y = dense_attention(q, k, v, dtype=self.dtype)
        y = jnp.swapaxes(y, 1, 2).reshape(b, n, inner)
        return nn.Dense(out_dim, dtype=self.dtype, name='projection')(y)


class UnidirectionalCrossAttention(nn.Module):
    """src -> target information flow (reference transformer.py:187-251).

    Returns (y, None): the src stream passes through unchanged.
    """
    in_dim: int
    num_heads: int
    in_dim_src: Optional[int] = None
    head_dim: Optional[int] = None
    out_dim: Optional[int] = None
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, src):
        in_dim_src = self.in_dim_src or self.in_dim
        head_dim = self.head_dim or self.in_dim // self.num_heads
        out_dim = self.out_dim or self.in_dim
        scale = self.qk_scale or head_dim ** -0.5
        inner = head_dim * self.num_heads
        b, n, _ = x.shape
        m = src.shape[1]

        qv_kernel = self.param('qv_kernel', nn.initializers.xavier_uniform(),
                               (in_dim_src, inner * 2), jnp.float32)
        qv = jnp.dot(src, qv_kernel.astype(self.dtype))
        if self.qkv_bias:
            q_bias = self.param('q_bias', nn.initializers.zeros, (inner,),
                                jnp.float32)
            v_bias = self.param('v_bias', nn.initializers.zeros, (inner,),
                                jnp.float32)
            qv = qv + jnp.concatenate([q_bias, v_bias]).astype(self.dtype)
        qv = qv.reshape(b, m, 2, self.num_heads, head_dim)
        q = jnp.swapaxes(qv[:, :, 0], 1, 2)          # [B,H,M,D]
        v = jnp.swapaxes(qv[:, :, 1], 1, 2)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name='k')(x)
        k = jnp.swapaxes(k.reshape(b, n, self.num_heads, head_dim), 1, 2)
        k = k * scale

        # reference: attn = (q @ k^T)^T softmaxed over M -> [B,H,N,M]
        attn = jax.nn.softmax(
            jnp.einsum('bhmd,bhnd->bhnm', q, k,
                       preferred_element_type=jnp.float32), -1)
        y = jnp.einsum('bhnm,bhmd->bhnd', attn.astype(self.dtype), v,
                       preferred_element_type=jnp.float32).astype(self.dtype)
        y = jnp.swapaxes(y, 1, 2).reshape(b, n, inner)
        y = nn.Dense(out_dim, dtype=self.dtype, name='projection')(y)
        return y, None


class BidirectionalCrossAttention(nn.Module):
    """Two-way token exchange (reference transformer.py:253-378)."""
    in_dim: int
    num_heads: int
    shared_similarity: bool = False
    in_dim_src: Optional[int] = None
    head_dim: Optional[int] = None
    out_dim: Optional[int] = None
    out_dim_src: Optional[int] = None
    qk_scale: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, src):
        in_dim_src = self.in_dim_src or self.in_dim
        head_dim = self.head_dim or self.in_dim // self.num_heads
        out_dim = self.out_dim or self.in_dim
        out_dim_src = self.out_dim_src or in_dim_src
        scale = self.qk_scale or head_dim ** -0.5
        h = self.num_heads
        inner = head_dim * h
        b, n, _ = x.shape
        m = src.shape[1]

        qk = nn.Dense(2 * inner, use_bias=False, dtype=self.dtype,
                      name='qk')(x)
        qk_src = nn.Dense(2 * inner, use_bias=False, dtype=self.dtype,
                          name='qk_src')(src)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name='v')(x)
        v_src = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name='v_src')(src)

        # 'b n (h d) -> b h n d' with d = 2*head_dim for qk
        qk = jnp.swapaxes(qk.reshape(b, n, h, 2 * head_dim), 1, 2)
        qk_src = jnp.swapaxes(qk_src.reshape(b, m, h, 2 * head_dim), 1, 2)
        v = jnp.swapaxes(v.reshape(b, n, h, head_dim), 1, 2)
        v_src = jnp.swapaxes(v_src.reshape(b, m, h, head_dim), 1, 2)

        if self.shared_similarity:
            sim = jnp.einsum('bhnd,bhmd->bhnm', qk * scale, qk_src,
                             preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(sim, -1)
            attn_src = jax.nn.softmax(jnp.swapaxes(sim, -2, -1), -1)
        else:
            attn = jax.nn.softmax(
                jnp.einsum('bhnd,bhmd->bhnm',
                           qk[..., :head_dim] * scale,
                           qk_src[..., :head_dim],
                           preferred_element_type=jnp.float32), -1)
            attn_src = jax.nn.softmax(
                jnp.einsum('bhnd,bhmd->bhmn',
                           qk[..., head_dim:] * scale,
                           qk_src[..., head_dim:],
                           preferred_element_type=jnp.float32), -1)

        y = jnp.einsum('bhnm,bhmd->bhnd', attn.astype(self.dtype), v_src,
                       preferred_element_type=jnp.float32).astype(self.dtype)
        y_src = jnp.einsum('bhmn,bhnd->bhmd', attn_src.astype(self.dtype), v,
                           preferred_element_type=jnp.float32).astype(self.dtype)
        y = jnp.swapaxes(y, 1, 2).reshape(b, n, inner)
        y_src = jnp.swapaxes(y_src, 1, 2).reshape(b, m, inner)
        y = nn.Dense(out_dim, dtype=self.dtype, name='projection')(y)
        y_src = nn.Dense(out_dim_src, dtype=self.dtype,
                         name='projection_src')(y_src)
        return y, y_src


class TransformerBlock(nn.Module):
    """Pre-norm block with in/out dim change support
    (reference transformer.py:380-440)."""
    in_dim: int
    num_heads: int = 8
    head_dim: Optional[int] = None
    out_dim: Optional[int] = None
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    init_values: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        attn = CrossSelfAttention(self.in_dim, self.num_heads, self.head_dim,
                                  self.out_dim, self.qkv_bias, self.qk_scale,
                                  dtype=self.dtype, name='attention')
        out_dim = self.out_dim or (
            (self.head_dim or self.in_dim // self.num_heads) * self.num_heads)
        norm1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name='norm1')
        norm2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name='norm2')
        y = attn(norm1(x))
        if self.in_dim == out_dim:
            sc = x
        else:
            sc = nn.Dense(out_dim, use_bias=False, dtype=self.dtype,
                          name='shortcut')(x)
        if (self.init_values or 0) > 0:
            g1 = self.param('gamma_1',
                            nn.initializers.constant(self.init_values),
                            (out_dim,), jnp.float32).astype(self.dtype)
            g2 = self.param('gamma_2',
                            nn.initializers.constant(self.init_values),
                            (out_dim,), jnp.float32).astype(self.dtype)
        else:
            g1 = g2 = 1.0
        x = sc + g1 * y
        if self.mlp_ratio > 0:
            mlp = GenericMlp(int(out_dim * self.mlp_ratio), out_dim,
                             dtype=self.dtype, name='mlp')
            x = x + g2 * mlp(norm2(x))
        return x


class CrossAttentionTransformerBlock(nn.Module):
    """Self+cross+MLP block over two streams
    (reference transformer.py:442-583)."""
    in_dim: int
    num_heads: int
    in_dim_src: Optional[int] = None
    head_dim: Optional[int] = None
    out_dim: Optional[int] = None
    out_dim_src: Optional[int] = None
    mlp_ratio: float = 4.0
    init_values: Optional[float] = None
    with_self_attention: bool = True
    shared_similarity: bool = False
    unidirectional: bool = False
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, src):
        in_dim_src = self.in_dim_src or self.in_dim
        out_dim = self.out_dim or self.in_dim
        out_dim_src = self.out_dim_src or in_dim_src

        norm1_cross = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                   name='norm1_cross')
        norm1_src_cross = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                       name='norm1_src_cross')
        if self.unidirectional:
            cross = UnidirectionalCrossAttention(
                self.in_dim, self.num_heads, in_dim_src, self.head_dim,
                out_dim, self.qkv_bias, self.qk_scale, dtype=self.dtype,
                name='cross_attention')
        else:
            cross = BidirectionalCrossAttention(
                self.in_dim, self.num_heads, self.shared_similarity,
                in_dim_src, self.head_dim, out_dim, out_dim_src,
                self.qk_scale, dtype=self.dtype, name='cross_attention')
        y_cross, y_src_cross = cross(norm1_cross(x), norm1_src_cross(src))
        passthrough_src = y_src_cross is None

        gammas = {}
        if (self.init_values or 0) > 0:
            for name, dim in (('gamma_1', out_dim),
                              ('gamma_1_cross', out_dim),
                              ('gamma_1_src', out_dim_src),
                              ('gamma_1_src_cross', out_dim_src),
                              ('gamma_2', out_dim),
                              ('gamma_2_src', out_dim_src)):
                gammas[name] = self.param(
                    name, nn.initializers.constant(self.init_values),
                    (dim,), jnp.float32).astype(self.dtype)
        else:
            for name in ('gamma_1', 'gamma_1_cross', 'gamma_1_src',
                         'gamma_1_src_cross', 'gamma_2', 'gamma_2_src'):
                gammas[name] = 1.0
        if not self.with_self_attention:
            gammas['gamma_1'] = 0.0
            gammas['gamma_1_src'] = 0.0

        def shortcut(z, d_in, d_out, name):
            if d_in == d_out:
                return z
            return nn.Dense(d_out, use_bias=False, dtype=self.dtype,
                            name=name)(z)

        if self.with_self_attention:
            norm1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name='norm1')
            norm1_src = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                     name='norm1_src')
            sa_trg = CrossSelfAttention(self.in_dim, self.num_heads,
                                        self.head_dim, out_dim,
                                        self.qkv_bias, self.qk_scale,
                                        dtype=self.dtype,
                                        name='self_attention_trg')
            sa_src = CrossSelfAttention(in_dim_src, self.num_heads,
                                        self.head_dim, out_dim_src,
                                        self.qkv_bias, self.qk_scale,
                                        dtype=self.dtype,
                                        name='self_attention_src')
            sa_trg_out = gammas['gamma_1'] * sa_trg(norm1(x))
            sa_src_out = gammas['gamma_1_src'] * sa_src(norm1_src(src))
        else:
            sa_trg_out = 0.0
            sa_src_out = 0.0

        x = shortcut(x, self.in_dim, out_dim, 'shortcut_trg') + sa_trg_out \
            + gammas['gamma_1_cross'] * y_cross
        if not passthrough_src:
            src = shortcut(src, in_dim_src, out_dim_src, 'shortcut_src') \
                + sa_src_out + gammas['gamma_1_src_cross'] * y_src_cross

        if self.mlp_ratio > 0:
            norm2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name='norm2')
            mlp_trg = GenericMlp(int(out_dim * self.mlp_ratio), out_dim,
                                 dtype=self.dtype, name='mlp_trg')
            x = x + gammas['gamma_2'] * mlp_trg(norm2(x))
            if not passthrough_src:
                norm2_src = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                         name='norm2_src')
                mlp_src = GenericMlp(int(out_dim_src * self.mlp_ratio),
                                     out_dim_src, dtype=self.dtype,
                                     name='mlp_src')
                src = src + gammas['gamma_2_src'] * mlp_src(norm2_src(src))
        return x, src
