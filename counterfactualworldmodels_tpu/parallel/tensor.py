"""Tensor parallelism for the VMAE transformer stack (explicit shard_map).

Head-parallel attention + column/row-parallel MLP, the Megatron recipe
mapped to a TPU mesh axis: every device holds a head-aligned shard of the
qkv / proj / fc kernels ([D, 3, A] qkv layout, see models/layers.py), runs
attention over its local heads with zero communication, and the only
collectives are one `psum` after the attention out-projection and one after
fc2 — both riding ICI. Unlike the jit+sharding path (parallel/mesh.py),
nothing here can silently fall back to replication: the shard_map specs are
explicit, and head counts that don't divide the axis are a hard error.

No reference equivalent (the reference is single-GPU, SURVEY.md §2.3).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .pipeline import _shard_map, _SHARD_MAP_KW, stack_block_params
from .sequence import _layernorm


def _block_specs_stacked(stacked_params: Any, axis: str):
    """PartitionSpecs for a stacked ([L, ...]) block param tree: the
    single source of truth is mesh.VMAE_PARTITION_RULES — each unstacked
    spec gains a leading None for the layer axis (renamed to ``axis``),
    so the jit and shard_map paths can never shard differently."""
    from .mesh import VMAE_PARTITION_RULES, partition_spec_for

    def spec(path):
        base = partition_spec_for(path, VMAE_PARTITION_RULES)
        return P(None, *(axis if a == 'tp' else a for a in base))

    def walk(tree, prefix=''):
        out = {}
        for k, v in tree.items():
            path = f'{prefix}/{k}' if prefix else k
            out[k] = walk(v, path) if isinstance(v, dict) else spec(path)
        return out

    return walk(stacked_params)


def _block_tp(p: Any, x: jnp.ndarray, axis: str, head_dim: int,
              scale=None):
    """One pre-norm block; p holds this device's kernel shards, x is the
    full (replicated) [B, N, D] sequence."""
    b, n, d = x.shape

    h = _layernorm(x, p['norm1']['scale'], p['norm1']['bias'])
    qkv = jnp.einsum('bnd,dta->bnta', h, p['attn']['qkv_kernel'])
    if 'q_bias' in p['attn']:
        q_bias = p['attn']['q_bias']
        qkv = qkv + jnp.stack([q_bias, jnp.zeros_like(q_bias),
                               p['attn']['v_bias']])
    a_loc = qkv.shape[-1]
    h_loc = a_loc // head_dim
    qkv = qkv.reshape(b, n, 3, h_loc, head_dim)
    q = jnp.swapaxes(qkv[:, :, 0], 1, 2) * (
        head_dim ** -0.5 if scale is None else scale)
    k = jnp.swapaxes(qkv[:, :, 1], 1, 2)
    v = jnp.swapaxes(qkv[:, :, 2], 1, 2)
    attn = jax.nn.softmax(
        jnp.einsum('bhqd,bhkd->bhqk', q, k,
                   preferred_element_type=jnp.float32), -1)
    out = jnp.einsum('bhqk,bhkd->bhqd', attn.astype(x.dtype), v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = jnp.swapaxes(out, 1, 2).reshape(b, n, a_loc)
    out = jnp.dot(out, p['attn']['proj']['kernel'])
    out = jax.lax.psum(out, axis) + p['attn']['proj']['bias']
    if 'gamma_1' in p:
        out = p['gamma_1'] * out
    x = x + out

    h = _layernorm(x, p['norm2']['scale'], p['norm2']['bias'])
    h = jnp.dot(h, p['mlp']['fc1']['kernel']) + p['mlp']['fc1']['bias']
    h = jax.nn.gelu(h, approximate=False)
    h = jnp.dot(h, p['mlp']['fc2']['kernel'])
    h = jax.lax.psum(h, axis) + p['mlp']['fc2']['bias']
    if 'gamma_2' in p:
        h = p['gamma_2'] * h
    return x + h


def tensor_parallel_blocks(stacked_params: Any, x: jnp.ndarray, mesh: Mesh,
                           num_heads: int, axis: str = 'tp',
                           qk_scale=None):
    """Run a stacked block stack over ``x`` [B, N, D] with attention heads
    and MLP hidden units sharded over ``axis``. num_heads must be divisible
    by the axis size (head-aligned shards). Numerically identical to the
    sequential stack.
    """
    tp = mesh.shape[axis]
    d = x.shape[-1]
    head_dim = d // num_heads
    if num_heads % tp:
        raise ValueError(f'num_heads={num_heads} not divisible by '
                         f'{axis}={tp}: cannot head-align the shards')
    specs = _block_specs_stacked(stacked_params, axis)

    def fn(params, xf):
        def body(h, p_layer):
            return _block_tp(p_layer, h, axis, head_dim, qk_scale), None
        return jax.lax.scan(body, xf, params)[0]

    f = _shard_map(fn, mesh=mesh, in_specs=(specs, P()), out_specs=P(),
                   **_SHARD_MAP_KW)
    return f(stacked_params, x)


def make_tp_encoder_forward(model, mesh: Mesh, axis: str = 'tp'):
    """Returns (forward(stacked_params, tokens), shard_params(enc_params))
    for a head-parallel encoder block stack."""
    depth = model.encoder_depth
    num_heads = model.encoder_num_heads

    def shard_params(encoder_params):
        stacked = stack_block_params(encoder_params, depth)
        specs = _block_specs_stacked(stacked, axis)
        return jax.tree_util.tree_map(
            lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
            stacked, specs)

    def forward(stacked_params, tokens):
        return tensor_parallel_blocks(stacked_params, tokens, mesh,
                                      num_heads, axis,
                                      getattr(model, 'qk_scale', None))

    return forward, shard_params
