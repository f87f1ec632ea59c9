"""Sequence parallelism for the VMAE transformer stack.

Shards the token axis over a named mesh axis: layernorm, the qkv/proj
projections, and the MLP are per-token (fully local); attention all-gathers
K and V over the axis so each device attends its local queries against the
full sequence. Activation memory per device drops by the axis size — the
enabler for high-resolution / long-video inputs where the 224px token count
(6272 for ViT-L 4x4) already strains a single chip's HBM at large sample
batches. No reference equivalent (single-GPU).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .pipeline import _shard_map, _SHARD_MAP_KW, stack_block_params


def _layernorm(x, scale, bias, eps=1e-6):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _block_sp(p, x_local, axis: str, num_heads: int, scale=None):
    """One pre-norm transformer block with the token axis sharded.

    p: one block's param tree (attn/mlp/norm1/norm2); x_local [B, N/sp, D].
    """
    b, n_loc, d = x_local.shape

    # --- attention: local queries, gathered keys/values
    h = _layernorm(x_local, p['norm1']['scale'], p['norm1']['bias'])
    qkv = jnp.einsum('bnd,dta->bnta', h, p['attn']['qkv_kernel'])
    if 'q_bias' in p['attn']:
        q_bias = p['attn']['q_bias']
        qkv = qkv + jnp.stack([q_bias, jnp.zeros_like(q_bias),
                               p['attn']['v_bias']])
    qkv = qkv.reshape(b, n_loc, 3, num_heads, d // num_heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]   # [B, N/sp, H, Dh]
    head_dim = d // num_heads
    q = jnp.swapaxes(q, 1, 2) * (
        head_dim ** -0.5 if scale is None else scale)    # [B, H, N/sp, Dh]
    # gather the full sequence of keys/values over the sp axis
    k = jax.lax.all_gather(jnp.swapaxes(k, 1, 2), axis, axis=2,
                           tiled=True)                   # [B, H, N, Dh]
    v = jax.lax.all_gather(jnp.swapaxes(v, 1, 2), axis, axis=2, tiled=True)
    attn = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(x_local.dtype)
    out = jnp.einsum('bhqk,bhkd->bhqd', attn, v,
                     preferred_element_type=jnp.float32).astype(x_local.dtype)
    out = jnp.swapaxes(out, 1, 2).reshape(b, n_loc, d)
    out = jnp.dot(out, p['attn']['proj']['kernel']) + p['attn']['proj']['bias']
    if 'gamma_1' in p:            # layerscale (init_values > 0 models)
        out = p['gamma_1'] * out
    x_local = x_local + out

    # --- MLP: fully local
    h = _layernorm(x_local, p['norm2']['scale'], p['norm2']['bias'])
    h = jnp.dot(h, p['mlp']['fc1']['kernel']) + p['mlp']['fc1']['bias']
    h = jax.nn.gelu(h, approximate=False)
    h = jnp.dot(h, p['mlp']['fc2']['kernel']) + p['mlp']['fc2']['bias']
    if 'gamma_2' in p:
        h = p['gamma_2'] * h
    return x_local + h


def sequence_parallel_blocks(stacked_params: Any, x: jnp.ndarray, mesh: Mesh,
                             num_heads: int, axis: str = 'sp',
                             qk_scale=None):
    """Run a stacked block stack over ``x`` [B, N, D] with the token axis
    sharded over ``axis``. N must be divisible by the axis size. Output is
    numerically identical to the sequential stack (incl. layerscale
    gammas and a custom qk_scale when the model has them).
    """
    s = mesh.shape[axis]
    b, n, d = x.shape
    assert n % s == 0, (n, s)

    def fn(params, x_local):
        def body(h, p_layer):
            return _block_sp(p_layer, h, axis, num_heads, qk_scale), None
        return jax.lax.scan(body, x_local, params)[0]

    f = _shard_map(fn, mesh=mesh, in_specs=(P(), P(None, axis, None)),
                   out_specs=P(None, axis, None), **_SHARD_MAP_KW)
    return f(stacked_params, x)


def make_sp_encoder_forward(model, mesh: Mesh, axis: str = 'sp'):
    """Returns (forward(stacked_params, tokens), shard_params(enc_params))
    for a sequence-parallel encoder block stack."""
    depth = model.encoder_depth
    num_heads = model.encoder_num_heads

    def shard_params(encoder_params):
        stacked = stack_block_params(encoder_params, depth)
        return jax.tree_util.tree_map(
            lambda p: jax.device_put(p, NamedSharding(mesh, P())), stacked)

    def forward(stacked_params, tokens):
        return sequence_parallel_blocks(stacked_params, tokens, mesh,
                                        num_heads, axis,
                                        getattr(model, 'qk_scale', None))

    return forward, shard_params
