"""Pipeline parallelism for the VMAE transformer stack.

GPipe-style microbatch pipelining over a named mesh axis: the L encoder
blocks are split into S = mesh.shape[axis] contiguous stages (params stacked
on a leading layer axis and sharded over the stage axis), activations flow
stage-to-stage with `ppermute` over ICI, and M microbatches keep all stages
busy after an S-1 step fill. This is the standard JAX pp recipe (shard_map +
collective rotation) — no reference equivalent (the reference is
single-GPU); it exists so 24-layer ViT-L forwards scale past what tp alone
gives on a pod slice.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax.experimental.shard_map import shard_map as _shard_map
    _SHARD_MAP_KW = {'check_rep': False}
except ImportError:  # experimental alias removed in newer jax
    from jax import shard_map as _shard_map
    _SHARD_MAP_KW = {'check_vma': False}

from ..models.layers import Block


def stack_block_params(encoder_params: dict, depth: int) -> Any:
    """Stack `blocks_0..blocks_{L-1}` param trees into [L, ...] arrays."""
    blocks = [encoder_params[f'blocks_{i}'] for i in range(depth)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *blocks)


def unstack_block_params(stacked: Any, depth: int) -> dict:
    """Inverse of stack_block_params."""
    return {f'blocks_{i}': jax.tree_util.tree_map(lambda x: x[i], stacked)
            for i in range(depth)}


def _run_stage(block: Block, params_local: Any, x: jnp.ndarray):
    """Apply this stage's local layers (scan over the leading layer axis)."""
    def body(h, p_layer):
        return block.apply({'params': p_layer}, h), None
    return jax.lax.scan(body, x, params_local)[0]


def pipelined_blocks(stacked_params: Any, x: jnp.ndarray, mesh: Mesh,
                     block: Block, num_microbatches: int, axis: str = 'pp'):
    """Run a stacked transformer block stack over ``x`` [B, N, D] with
    pipeline parallelism.

    stacked_params: pytree of [L, ...] arrays (see stack_block_params);
    L must be divisible by the pp axis size, B by num_microbatches.
    Returns [B, N, D], numerically identical to applying the blocks
    sequentially.
    """
    s = mesh.shape[axis]
    b, n, d = x.shape
    m = num_microbatches
    assert b % m == 0, (b, m)
    xs = x.reshape(m, b // m, n, d)

    def stage_fn(params_local, xs_local):
        # params_local: [L/S, ...] (this stage's layers); xs_local: all
        # microbatches, replicated
        rank = jax.lax.axis_index(axis)
        mb = xs_local.shape[0]
        zero = jnp.zeros_like(xs_local[0])
        outputs = jnp.zeros_like(xs_local)

        def step(t, carry):
            recv, outputs = carry
            # stage 0 feeds microbatch t; others consume what arrived
            feed = jax.lax.dynamic_index_in_dim(
                xs_local, jnp.clip(t, 0, mb - 1), 0, keepdims=False)
            h = jnp.where(rank == 0, jnp.where(t < mb, feed, zero), recv)
            y = _run_stage(block, params_local, h)
            # last stage banks microbatch (t - (S-1)) once the fill is done
            out_idx = jnp.clip(t - (s - 1), 0, mb - 1)
            bank = (rank == s - 1) & (t >= s - 1)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs,
                jnp.where(bank,
                          jax.lax.dynamic_index_in_dim(
                              outputs, out_idx, 0, keepdims=False) + y,
                          jax.lax.dynamic_index_in_dim(
                              outputs, out_idx, 0, keepdims=False)),
                out_idx, 0)
            # rotate activations one stage forward over ICI
            recv = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % s) for i in range(s)])
            return recv, outputs

        recv = zero
        recv, outputs = jax.lax.fori_loop(0, mb + s - 1, step,
                                          (recv, outputs))
        # outputs live on the last stage only; replicate via psum
        return jax.lax.psum(
            jnp.where(rank == s - 1, outputs, jnp.zeros_like(outputs)), axis)

    f = _shard_map(stage_fn, mesh=mesh,
                   in_specs=(P(axis), P()), out_specs=P(),
                   **_SHARD_MAP_KW)
    out = f(stacked_params, xs)
    return out.reshape(b, n, d)


def make_pp_encoder_forward(model, mesh: Mesh, num_microbatches: int = 4,
                            axis: str = 'pp'):
    """Returns (forward(params, x_tokens) -> tokens, shard_params(params)).

    ``forward`` runs the encoder block stack pipeline-parallel on
    pre-embedded visible tokens [B, N_vis, D]; patch-embedding, masking, and
    the decoder stay outside (they are cheap relative to the 24-block
    stack). ``shard_params`` places the stacked block params over the pp
    axis.
    """
    block = Block(dim=model.encoder_embed_dim,
                  num_heads=model.encoder_num_heads,
                  mlp_ratio=model.mlp_ratio, qkv_bias=model.qkv_bias,
                  qk_scale=model.qk_scale, init_values=model.init_values,
                  dtype=model.dtype, attn_impl=model.attn_impl)
    depth = model.encoder_depth

    def shard_params(encoder_params):
        stacked = stack_block_params(encoder_params, depth)
        sh = NamedSharding(mesh, P(axis))
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh), stacked)

    def forward(stacked_params, tokens):
        return pipelined_blocks(stacked_params, tokens, mesh, block,
                                num_microbatches, axis)

    return forward, shard_params
